"""Text-analysis operators over the `documents` table — the
training-data-pipeline extensions (SURVEY.md §7 beyond-reference;
BASELINE.json north star).

All hot-path expressions are built-in column functions (JVM-side,
codegen'd): tokenization via split, ratios via regexp counts, document
fingerprints via md5 — no Python UDFs. Each has an exact DuckDB oracle.

Scale notes: every query here is embarrassingly parallel (per-row
projections + one optional aggregate); no shuffle except final small
aggs. At 100 TB the only cost is the scan itself.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import memoized_build
from ..registry import register
from ..tables import load_table, widen_small_scan


def _tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


# Token counting: whitespace tokens, distinct tokens, avg token length.
@memoized_build("documents")
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )


register(
    "doc_token_stats",
    sql="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text), ' '), '\\s+') AS toks
      FROM documents
    )
    SELECT doc_id, len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           round(list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks), 6)
             AS avg_token_len
    FROM t
    """,
)(doc_token_stats)


# Quality scoring: char/token lengths, stopword ratio, type-token ratio.
_STOPWORDS = ["the", "a", "and", "of", "to"]


def passes_quality_expr(toks) -> Column:
    """The rule-based quality predicate over a document row's `text`
    column and its token array — ONE definition shared by quality_frame
    and the fused confusion report (r13 ADVICE: the three sites that
    encode this heuristic — two Spark builders and the SQL oracles —
    must not be able to drift; the SQL stays textual by design, the two
    Spark sites now share this builder)."""
    return (
        (F.length("text") >= 100)
        & (F.size(toks) >= 20)
        & ((F.size(F.array_distinct(toks)) / F.size(toks)) >= 0.3)
    )


def quality_frame(docs: DataFrame) -> DataFrame:
    """The quality projection over an arbitrary documents frame — pure
    column expressions, so it runs unchanged over a batch scan or a
    structured stream (streaming.pipeline.quality_gate_stream)."""
    toks = _tokens(F.lower(F.col("text")))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
    return docs.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(stop_hits / F.size(toks), 6).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
        passes_quality_expr(toks).alias("passes_quality"),
    )


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_frame(load_table(spark, sf_dir, "documents"))


_STOP_SQL = "['the', 'a', 'and', 'of', 'to']"

register(
    "doc_quality",
    sql=f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(trim(lower(text), ' '), '\\s+') AS toks
      FROM documents
    )
    SELECT doc_id, length(text) AS len_chars, len(toks) AS n_tokens,
           round(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
                 * 1.0 / len(toks), 6) AS stopword_ratio,
           round(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS ttr,
           (length(text) >= 100 AND len(toks) >= 20
            AND len(list_distinct(toks)) * 1.0 / len(toks) >= 0.3) AS passes_quality
    FROM t
    """,
)(doc_quality)


# Language-ID heuristic: stopword-hit ratio → 'en' vs 'und'. (The testdata
# text is synthetic word soup, so the honest n-gram heuristic reduces to a
# deterministic stopword test; structure matches a real lang-ID pass.)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.lower(F.col("text")))
    ratio = F.size(F.filter(toks, lambda t: t.isin(["the", "a"]))) / F.size(toks)
    return docs.select(
        "doc_id",
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("und")).alias("pred_lang"),
    )


register(
    "doc_lang_id",
    sql="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text), ' '), '\\s+') AS toks
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(list_filter(toks, x -> x IN ('the', 'a')))
                     * 1.0 / len(toks) >= 0.05
                THEN 'en' ELSE 'und' END AS pred_lang
    FROM t
    """,
)(doc_lang_id)


# Document fingerprinting: md5 over whitespace-normalized lowercase text
# (the exact-dedup key) + a coarse length bucket.
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        (F.floor(F.length("text") / 100) * 100).cast("long").alias("len_bucket"),
    )


register(
    "doc_fingerprint",
    sql="""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text), ' '), '\\s+', ' ', 'g')) AS fingerprint,
           CAST(floor(length(text) / 100) * 100 AS BIGINT) AS len_bucket
    FROM documents
    """,
)(doc_fingerprint)


# BPE-ish subword token counting: a GPT-2-style pretokenizer regex
# (contraction suffixes, letter runs, short digit runs, punctuation runs)
# via regexp_extract_all — JVM regex in Spark, RE2 in DuckDB; the pattern
# avoids lookaheads so both dialects agree exactly.
_BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)|[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9']+"


def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(pieces).alias("n_bpe_tokens"),
        F.size(F.array_distinct(pieces)).alias("n_distinct_pieces"),
        # tokens-per-whitespace-word: a subword fertility proxy used for
        # tokenizer-cost estimates over a corpus
        F.round(
            F.size(pieces) / F.size(_tokens(F.col("text"))), 6
        ).alias("fertility"),
    )


_BPE_SQL = _BPE_PATTERN.replace("'", "''")  # escape for SQL string literal

register(
    "doc_bpe_tokens",
    sql=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_SQL}')) AS n_bpe_tokens,
           len(list_distinct(regexp_extract_all(text, '{_BPE_SQL}')))
             AS n_distinct_pieces,
           round(len(regexp_extract_all(text, '{_BPE_SQL}')) * 1.0
                 / len(string_split_regex(trim(text, ' '), '\\s+')), 6) AS fertility
    FROM documents
    """,
)(doc_bpe_tokens)


# Karp-Rabin polynomial rolling hash over the raw character stream —
# the incremental-fingerprint primitive (winnowing/Rabin chunking use the
# same recurrence). acc = (acc*B + code(ch)) mod M, folded with a single
# array aggregate: one pass, no Python, identical arithmetic in DuckDB.
_RH_B, _RH_M = 31, 1_000_000_007


def doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chars = F.split(F.col("text"), "")
    rh = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * _RH_B + F.ascii(ch)) % _RH_M,
    )
    return docs.select("doc_id", rh.alias("rolling_hash"))


register(
    "doc_rolling_hash",
    sql=f"""
    SELECT doc_id,
           -- CASE preserves NULL for NULL text (list_prepend(0, NULL) is
           -- [0] in DuckDB, which would hash a missing doc to 0 while
           -- Spark's aggregate over a NULL array stays NULL)
           CASE WHEN text IS NULL THEN NULL
                ELSE list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                               list_transform(string_split(text, ''),
                                              ch -> CAST(ascii(ch) AS BIGINT))),
                  (acc, c) -> (acc * {_RH_B} + c) % {_RH_M}
                ) END AS rolling_hash
    FROM documents
    """,
)(doc_rolling_hash)


# Corpus vocabulary: top-k terms per language by document frequency (tie
# broken by term). explode → two-tier count agg → per-lang rank. At scale
# the term count shuffles on (lang, term) — high cardinality, no skew
# beyond stopwords, which WindowGroupLimit truncates early.
TOP_TERMS_K = 10


def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.lower(F.col("text")))
    terms = docs.select(
        "lang", F.explode(F.array_distinct(toks)).alias("term")
    ).filter(F.length("term") >= 3)
    counts = terms.groupBy("lang", "term").agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("lang").orderBy(F.desc("n_docs"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS_K)
        .select("lang", "rank", "term", "n_docs")
    )


register(
    "doc_top_terms",
    sql=f"""
    WITH terms AS (
      SELECT lang, unnest(list_distinct(
               string_split_regex(trim(lower(text), ' '), '\\s+'))) AS term
      FROM documents
    ),
    counts AS (
      SELECT lang, term, count(*) AS n_docs
      FROM terms WHERE length(term) >= 3
      GROUP BY lang, term
    )
    SELECT lang,
           CAST(row_number() OVER (PARTITION BY lang
                              ORDER BY n_docs DESC, term) AS INTEGER) AS rank,
           term, n_docs
    FROM counts
    QUALIFY rank <= {TOP_TERMS_K}
    """,
)(doc_top_terms)


# Benchmark-contamination check: corpus documents sharing >= K distinct
# 3-token shingles with any "benchmark" document (here: doc_id < 20 —
# the stand-in for a held-out eval set shipped alongside the corpus).
# The decisive LLM-curation op: train/test overlap silently inflates
# evals, and at 100 TB the benchmark side is tiny — so it broadcasts,
# and the corpus side is one scan + one shuffle on (doc, bench).
CONTAM_BENCH_MAX_ID = 20
CONTAM_MIN_SHARED = 3


def doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(corpus doc, benchmark doc, shared-shingle count, overlap frac)
    for every pair with >= CONTAM_MIN_SHARED shared distinct shingles.

    Plan shape: the exploded benchmark shingle set (20 docs) broadcasts;
    the corpus explodes once and equi-joins on the shingle string; the
    (doc_id, bench_id) rollup is the only shuffle. Per-doc shingles are
    already distinct (array_distinct in the shingler), so count(*) after
    the join IS the distinct shared count.
    """
    from .dedup import doc_shingles

    # r13: both sides now slice the session-cached corpus shingle table
    # (doc_shingles) instead of running their own Arrow UDF passes —
    # zero Python in this query's plan once the shared artifact exists,
    # and the one corpus pass that builds it is amortized across the
    # whole shingle family (minhash, ngram jaccard, contamination).
    sh = doc_shingles(spark, sf_dir)
    bench = sh.filter(F.col("doc_id") < CONTAM_BENCH_MAX_ID).select(
        F.col("doc_id").alias("bench_id"), F.explode("shingles").alias("s")
    )
    corp = sh.filter(F.col("doc_id") >= CONTAM_BENCH_MAX_ID).select(
        "doc_id", F.size("shingles").alias("n_shingles"),
        F.explode("shingles").alias("s"),
    )
    return (
        corp.join(F.broadcast(bench), "s")
        .groupBy("doc_id", "bench_id", "n_shingles")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= CONTAM_MIN_SHARED)
        .select(
            "doc_id",
            "bench_id",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias(
                "overlap_frac"
            ),
        )
    )


register(
    "doc_contamination",
    sql=f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
             )) AS shingles
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text), ' '), '\\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    ),
    bench AS (
      SELECT doc_id AS bench_id, unnest(shingles) AS s FROM sh
      WHERE doc_id < {CONTAM_BENCH_MAX_ID}
    ),
    corp AS (
      SELECT doc_id, len(shingles) AS n_shingles, unnest(shingles) AS s
      FROM sh WHERE doc_id >= {CONTAM_BENCH_MAX_ID}
    )
    SELECT c.doc_id, b.bench_id, count(*) AS n_shared,
           round(count(*) * 1.0 / c.n_shingles, 6) AS overlap_frac
    FROM corp c JOIN bench b USING (s)
    GROUP BY c.doc_id, b.bench_id, c.n_shingles
    HAVING count(*) >= {CONTAM_MIN_SHARED}
    """,
)(doc_contamination)


# Gopher-style repetition scoring: the fraction of bigrams taken by the
# single most common bigram, plus the duplicate-token fraction — the
# standard "remove boilerplate/spam" quality rule for training corpora.
REPETITION_FLAG_FRAC = 0.1


def _py_repetition(text: "pd.Series") -> "pd.DataFrame":
    """Vectorized per-doc repetition stats (tokens, distinct tokens, top
    bigram count). Tokenization follows the proven `_py_shingles` parity
    chain: lower → strip spaces only → ASCII \\s+ split — identical to
    the JVM `_tokens` and the oracle's string_split_regex."""
    import re
    from collections import Counter

    ws = re.compile(r"\s+", re.ASCII)
    n_tok, n_dist, top = [], [], []
    for t in text:
        if t is None:  # NULL text: filtered upstream; defensive guard
            n_tok.append(0)
            n_dist.append(0)
            top.append(0)
            continue
        toks = ws.split(t.lower().strip(" "))
        n_tok.append(len(toks))
        n_dist.append(len(set(toks)))
        if len(toks) >= 2:
            top.append(max(Counter(zip(toks, toks[1:])).values()))
        else:
            top.append(0)
    return pd.DataFrame(
        {"n_tokens": n_tok, "n_distinct": n_dist, "top_bigram_n": top}
    )


@memoized_build("documents")
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition metrics over ALL bigram occurrences (not
    distinct — repetition is the point).

    Shape: ONE Arrow-vectorized pass per doc (map-only, zero shuffle) —
    a per-doc mode count has no cross-row dependency, so the earlier
    explode → groupBy(doc, gram) → groupBy(doc) form shuffled ~1.25M
    bigram strings twice (and paid the interpreted zip_with HOF tax to
    build them) for work a Counter does per batch: measured 2.9 s →
    ~0.6 s at sf0.1. At 100 TB this is scan-bound, like every other
    textops query.

    (r13: widen_small_scan was A/B'd here — interleaved 6×-each in one
    session — and REJECTED: median 0.72 s widened vs 0.55 s single-task.
    The per-doc Counter is cheap enough that the keyless round-robin
    exchange of the text payload, plus its sort-before-repartition, costs
    more than the parallelism buys; at real scale the multi-row-group
    scan parallelizes without any exchange.)"""
    docs = load_table(spark, sf_dir, "documents")
    rep = F.pandas_udf(
        _py_repetition, "n_tokens int, n_distinct int, top_bigram_n long"
    )
    stats = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", rep(F.col("text")).alias("r")
    ).select("doc_id", "r.*").filter(F.col("n_tokens") >= 2)
    n_bigrams = F.col("n_tokens") - 1
    return stats.select(
        "doc_id",
        n_bigrams.alias("n_bigrams"),
        "top_bigram_n",
        F.round(F.col("top_bigram_n") / n_bigrams, 6).alias("top_bigram_frac"),
        F.round(1 - F.col("n_distinct") / F.col("n_tokens"), 6).alias(
            "dup_token_frac"
        ),
        (F.col("top_bigram_n") / n_bigrams > REPETITION_FLAG_FRAC).alias(
            "is_repetitive"
        ),
    )


register(
    "doc_repetition",
    sql=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text), ' '), '\\s+') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             toks[i] || ' ' || toks[i + 1] AS g
      FROM t, unnest(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2
    ),
    cnt AS (
      SELECT doc_id, n_tokens, n_distinct, g, count(*) AS c
      FROM bg GROUP BY 1, 2, 3, 4
    )
    SELECT doc_id,
           CAST(n_tokens - 1 AS INTEGER) AS n_bigrams,
           max(c) AS top_bigram_n,
           round(max(c) * 1.0 / (n_tokens - 1), 6) AS top_bigram_frac,
           round(1 - n_distinct * 1.0 / n_tokens, 6) AS dup_token_frac,
           max(c) * 1.0 / (n_tokens - 1) > {REPETITION_FLAG_FRAC}
             AS is_repetitive
    FROM cnt GROUP BY doc_id, n_tokens, n_distinct
    """,
)(doc_repetition)


# --- exact duplicated-span detection (substring dedup) ---------------------
#
# "Deduplicating Training Data Makes Language Models Better" (Lee et al.,
# 2022) removes EXACT repeated token spans across the corpus, not just
# whole-document near-dups. The specialized tool is a suffix array; the
# Spark-native form is windowed span hashing: explode every W-token
# window, hash it, and keep windows whose hash occurs more than once.
# Output is the actionable span list — (doc_id, pos, span_id, total
# occurrences) — i.e. exactly the spans a scrubber would cut.
#
# Scale shape: the exploded index is W x corpus tokens (bounded blowup,
# streamable), ONE exchange on span hash, and the occurrence count comes
# from a count(*) OVER (PARTITION BY hash) window on that same exchange —
# no self-join, no second pass over the text. Spans are identified by
# md5 (128-bit; collisions negligible and would only merge two span
# groups, never drop one).

SPAN_W = 8  # tokens per window — Lee et al. use 50 BPE tokens at web scale


@memoized_build("documents")
def doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # widen: the span explode md5-hashes ~250 spans/doc — on the tiny
    # single-file scan that whole map stage ran in ONE task (r13 stage
    # profile); pass-through at real scale
    docs = widen_small_scan(
        load_table(spark, sf_dir, "documents"),
        path=f"{sf_dir}/documents.parquet",
    )
    toks = _tokens(F.lower(F.col("text")))
    t = docs.select("doc_id", toks.alias("t"))
    # positions are 1-based; guard short docs (sequence(1,0) would count
    # DOWN in Spark, not produce an empty array)
    span_structs = F.expr(
        f"""
        CASE WHEN size(t) >= {SPAN_W} THEN
          transform(sequence(1, size(t) - {SPAN_W} + 1),
                    i -> struct(i AS pos,
                                array_join(slice(t, i, {SPAN_W}), ' ') AS span))
        ELSE array() END
        """
    )
    spans = t.select(
        "doc_id", F.explode(span_structs).alias("s")
    ).select("doc_id", F.col("s.pos").alias("pos"), F.md5("s.span").alias("span_id"))
    w = Window.partitionBy("span_id")
    return spans.withColumn("n_occurrences", F.count("*").over(w)).filter(
        F.col("n_occurrences") > 1
    )


register(
    "doc_dup_spans",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text), ' '), '\\s+') AS t
      FROM documents
    ),
    spans AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos,
             md5(array_to_string(list_slice(t, i, i + {SPAN_W} - 1), ' ')) AS span_id
      FROM toks, unnest(range(1, len(t) - {SPAN_W} + 2)) AS u(i)
      WHERE len(t) >= {SPAN_W}
    )
    SELECT doc_id, pos, span_id,
           count(*) OVER (PARTITION BY span_id) AS n_occurrences
    FROM spans
    QUALIFY n_occurrences > 1
    """,
)(doc_dup_spans)


# --- per-document TF-IDF keywords ------------------------------------------

TFIDF_K = 3  # keywords kept per document


@memoized_build("documents")
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the classic
    keyword extraction step of a curation/indexing pipeline.

    Scale shape: term frequencies are one exchange on (doc_id, term);
    document frequencies re-aggregate the SAME frame on term (no second
    text scan); the corpus size N is a 1-row broadcast cross join (a
    literal collected on the driver would hard-code the corpus into the
    plan); ranking is a per-doc window. idf = ln((N+1)/(df+1)) (smoothed),
    scores rounded to 6 dp on both engines (single multiply of two
    singly-derived doubles — no summation-order divergence)."""
    from pyspark.sql import Window

    from ..cache import session_get, stamp_key

    # r13: tf fed BOTH the document-frequency aggregate and the scored
    # join, and Spark has no subtree reuse — the tokenize+explode+count
    # pipeline (the expensive part) ran twice per execution. The term
    # frequency table is THE stored artifact of an indexing pipeline, so
    # materialize it once per (session, documents stamp) and let both
    # consumers read the checkpoint.
    def _build_tf() -> DataFrame:
        # widen: the term explode + partial tf aggregation otherwise runs
        # single-task on the one-file scan (pass-through at real scale)
        docs = widen_small_scan(
            load_table(spark, sf_dir, "documents"),
            path=f"{sf_dir}/documents.parquet",
        )
        toks = _tokens(F.lower(F.col("text")))
        terms = docs.select(
            "doc_id", F.explode(toks).alias("term")
        ).filter(F.length("term") >= 3)
        return (
            terms.groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
            .localCheckpoint()
        )

    tf = session_get(
        "doc_term_tf", stamp_key(spark, sf_dir, "documents"), _build_tf
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus size straight off the unwidened scan (the widen exchange
    # bought nothing for a count)
    n = load_table(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_docs")
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_K)
        .select("doc_id", "rank", "term", "tf", "tfidf")
    )


register(
    "doc_tfidf_top_terms",
    sql=f"""
    WITH terms AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text), ' '), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM terms
      WHERE length(term) >= 3 GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, term) AS INTEGER) AS rank,
           term, tf, tfidf
    FROM scored
    QUALIFY rank <= {TFIDF_K}
    """,
)(doc_tfidf_top_terms)


# --- span scrubber (applies the doc_dup_spans cut list) --------------------


def doc_scrub_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scrubber stage of substring dedup: remove every token covered
    by a cross-corpus duplicated W-token span (doc_dup_spans' cut list)
    and reassemble the cleaned text — corpus out, not just telemetry.

    Scale shape: the cut list is grouped per doc (poses arrays are small
    — only duplicated windows survive) and joined back on doc_id (one
    shuffle; Spark broadcasts it when small). Token filtering is an
    index-aware array HOF — per-token cost O(|doc cut list|), no
    explode of the corpus tokens a second time."""
    docs = load_table(spark, sf_dir, "documents")
    cuts = (
        doc_dup_spans(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("poses"))
    )
    toks = _tokens(F.lower(F.col("text")))
    joined = docs.select("doc_id", toks.alias("t")).join(
        cuts, "doc_id", "left"
    ).select("doc_id", "t", F.coalesce("poses", F.array()).alias("poses"))
    # F.filter's 2-arg lambda index is 0-based; span positions are 1-based
    kept = F.filter(
        "t",
        lambda x, i: F.size(
            F.filter(
                F.col("poses"),
                lambda p: ((i + 1) >= p) & ((i + 1) < p + F.lit(SPAN_W)),
            )
        )
        == 0,
    )
    return joined.select(
        "doc_id",
        (F.size("t") - F.size(kept)).alias("n_removed"),
        # NULL text: array_join(NULL) is NULL but the oracle's COALESCE
        # yields '' — pin both engines to '' (n_removed stays NULL on
        # both sides: size(NULL) - size(NULL)).
        F.coalesce(F.array_join(kept, " "), F.lit("")).alias("text_clean"),
    )


register(
    "doc_scrub_spans",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text), ' '), '\\s+') AS t
      FROM documents
    ),
    spans AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos,
             md5(array_to_string(list_slice(t, i, i + {SPAN_W} - 1), ' ')) AS span_id
      FROM toks, unnest(range(1, len(t) - {SPAN_W} + 2)) AS u(i)
      WHERE len(t) >= {SPAN_W}
    ),
    dup AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos, count(*) OVER (PARTITION BY span_id) AS n
        FROM spans
      ) WHERE n > 1
    ),
    cuts AS (SELECT doc_id, list(pos) AS poses FROM dup GROUP BY doc_id),
    kept AS (
      SELECT toks.doc_id, t, COALESCE(cuts.poses, []) AS poses,
             list_filter(range(1, len(t) + 1),
                         i -> len(list_filter(COALESCE(cuts.poses, []),
                                              p -> i >= p AND i < p + {SPAN_W})) = 0
                        ) AS ki
      FROM toks LEFT JOIN cuts ON toks.doc_id = cuts.doc_id
    )
    SELECT doc_id,
           CAST(len(t) - len(ki) AS INTEGER) AS n_removed,
           -- DuckDB's array_to_string([]) is NULL; Spark's array_join([])
           -- is '' — a fully-scrubbed doc is empty text, not NULL
           COALESCE(array_to_string(list_transform(ki, i -> t[i]), ' '), '')
             AS text_clean
    FROM kept
    """,
)(doc_scrub_spans)


# --- PII detection / scrubbing ---------------------------------------------
# A training-data pipeline redacts contact/identifier strings before a
# corpus ships (the reference has no analogue — this is LLM-pipeline
# surface, like the dedup family). Patterns are chosen to behave
# identically under Java regex (Spark, JVM-side regexp_count /
# regexp_replace — no Python in the hot path) and RE2 (DuckDB): no
# lookarounds, no backreferences. Scale: pure projections inside
# whole-stage codegen, one scan, no shuffle for the scan query; the
# scrub emits an md5 instead of the rewritten text so the oracle
# compare stays narrow.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_CARD16 = r"\b\d{16}\b"


@memoized_build("documents")
def doc_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc PII hit counts (email / IPv4 / 16-digit number) + flag.
    NULL text propagates NULL counts (cross-engine NULL parity)."""
    docs = load_table(spark, sf_dir, "documents")
    n_email = F.regexp_count("text", F.lit(PII_EMAIL))
    n_ip = F.regexp_count("text", F.lit(PII_IPV4))
    n_card = F.regexp_count("text", F.lit(PII_CARD16))
    return docs.select(
        "doc_id",
        n_email.alias("n_emails"),
        n_ip.alias("n_ipv4"),
        n_card.alias("n_card16"),
        ((n_email + n_ip + n_card) > 0).alias("has_pii"),
    )


register(
    "doc_pii_scan",
    sql=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INTEGER)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS INTEGER)
             AS n_ipv4,
           CAST(len(regexp_extract_all(text, '{PII_CARD16}')) AS INTEGER)
             AS n_card16,
           len(regexp_extract_all(text, '{PII_EMAIL}'))
             + len(regexp_extract_all(text, '{PII_IPV4}'))
             + len(regexp_extract_all(text, '{PII_CARD16}')) > 0 AS has_pii
    FROM documents
    """,
)(doc_pii_scan)


# The scrub expression pair, defined ONCE for the batch query AND the
# streaming ingest gate (pii_scrub_stream) — pattern ORDER matters where
# patterns overlap (an email whose domain embeds an IPv4 is scrubbed as
# one email, not an email + an IP), so the chain must never fork.
def pii_scrub_col(col) -> "F.Column":
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, F.lit(PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(PII_IPV4),
            F.lit("<IP>"),
        ),
        F.lit(PII_CARD16),
        F.lit("<NUM>"),
    )


def pii_redaction_count_col(col) -> "F.Column":
    """Replacements actually PERFORMED by the sequential scrub: each
    stage counts on the previous stage's output, so overlapping PII
    (e.g. an IPv4 inside an already-scrubbed email domain) is not
    double-counted — this is the scrub's telemetry, distinct from
    doc_pii_scan's per-type hit counts on the original text."""
    t1 = F.regexp_replace(col, F.lit(PII_EMAIL), F.lit("<EMAIL>"))
    t2 = F.regexp_replace(t1, F.lit(PII_IPV4), F.lit("<IP>"))
    return (
        F.regexp_count(col, F.lit(PII_EMAIL))
        + F.regexp_count(t1, F.lit(PII_IPV4))
        + F.regexp_count(t2, F.lit(PII_CARD16))
    )


def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redacted-corpus projection: emails → <EMAIL>, IPv4 → <IP>,
    16-digit runs → <NUM>, applied in that fixed order on both engines
    (order matters where patterns overlap; determinism, not taste).
    Emits md5(scrubbed) + performed-redaction count, not the text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        pii_redaction_count_col(F.col("text")).alias("n_redactions"),
        F.md5(pii_scrub_col(F.col("text"))).alias("scrub_hash"),
    )


register(
    "doc_pii_scrub",
    sql=f"""
    WITH staged AS (
      SELECT doc_id, text,
             regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1
      FROM documents
    ),
    staged2 AS (
      SELECT *, regexp_replace(t1, '{PII_IPV4}', '<IP>', 'g') AS t2
      FROM staged
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL}'))
              + len(regexp_extract_all(t1, '{PII_IPV4}'))
              + len(regexp_extract_all(t2, '{PII_CARD16}')) AS INTEGER)
             AS n_redactions,
           md5(regexp_replace(t2, '{PII_CARD16}', '<NUM>', 'g')) AS scrub_hash
    FROM staged2
    """,
)(doc_pii_scrub)


# --- URL / domain provenance ------------------------------------------------
URL_DOMAIN = r"https?://([A-Za-z0-9.-]+)"


def doc_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus provenance histogram: domains of in-text URLs, most
    frequent first. Extraction is a codegen projection; the rollup is
    one hash-agg on a domain-sized key space; top-k compiles to
    TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    doms = F.regexp_extract_all(F.lower("text"), F.lit(URL_DOMAIN), 1)
    return (
        docs.select(F.explode(doms).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_urls"))
        .orderBy(F.desc("n_urls"), F.asc("domain"))
        .limit(50)
    )


register(
    "doc_url_domains",
    sql=f"""
    SELECT u.domain AS domain, count(*) AS n_urls
    FROM documents d,
         unnest(regexp_extract_all(lower(d.text), '{URL_DOMAIN}', 1)) AS u(domain)
    GROUP BY 1 ORDER BY n_urls DESC, domain LIMIT 50
    """,
)(doc_url_domains)


# --- BM25 keyword search ----------------------------------------------------
# Full-text relevance ranking over the corpus — the retrieval half of a
# RAG/data-curation stack (the reference has no search surface; this is
# LLM-pipeline class like the dedup family). Okapi BM25 with the
# standard k1/b; idf is the +1 ("BM25+") form so it is always positive.
#
# Determinism contract: tf/df/dl/N are integers, and avgdl — the only
# float statistic — is 6-dp-quantized in BOTH engines before it enters
# the formula, so each per-(doc,term) score is a fixed arithmetic
# expression over integers; the final 6-dp round absorbs the ≤3-term
# sum's fold-order eps.
#
# Scale shape: TWO corpus passes, not four — dl rides the exploded term
# stream into the tf aggregate (first("dl") — constant within a
# (doc, term) group), so no separate doc-length join; the df rollup
# re-aggregates tf's output (its (doc_id, term) exchange is reused, not
# recomputed); the only other pass is the (N, avgdl) corpus-stats
# aggregate, which broadcasts as one row. The query-term filter sits
# BELOW the tf aggregate (the tf frame is |Q|·matching-docs, never
# corpus-sized) and the top-k compiles to TakeOrderedAndProject.
BM25_QUERY_TERMS = ["hash", "join", "vector"]
BM25_K1 = 1.2
BM25_B = 0.75


@memoized_build("documents")
def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select("doc_id", _tokens(F.lower(F.col("text"))).alias("t"))
    tf = (
        toks.select("doc_id", F.size("t").alias("dl"), F.explode("t").alias("term"))
        .filter(F.col("term").isin(BM25_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    stats = toks.select(F.size("t").alias("dl")).agg(
        F.count("*").alias("n_docs"), F.round(F.avg("dl"), 6).alias("avgdl")
    )
    dfq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    score = idf * F.col("tf") * (BM25_K1 + 1) / denom
    return (
        tf.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(score), 6).alias("bm25"),
            F.count("*").alias("n_matched"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

register(
    "doc_bm25_search",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text), ' '), '\\s+') AS t
      FROM documents WHERE text IS NOT NULL
    ),
    lens AS (SELECT doc_id, len(t) AS dl FROM toks),
    stats AS (SELECT count(*) AS n_docs, round(avg(dl), 6) AS avgdl
              FROM lens),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest(t) AS term FROM toks
      ) WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2
    ),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                    + {BM25_B} * l.dl / s.avgdl)) AS sc
      FROM tf
      JOIN dfq d USING (term)
      JOIN lens l ON l.doc_id = tf.doc_id
      CROSS JOIN stats s
    )
    SELECT doc_id, round(sum(sc), 6) AS bm25,
           count(*) AS n_matched
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)(doc_bm25_search)


# --- Unicode normalization ----------------------------------------------------
# Canonicalization staple of a training-data pipeline: byte-different but
# canonically-equal texts (NFD vs NFC accents, stray control chars,
# irregular whitespace) must collide BEFORE any hash-based dedup sees
# them, or near-identical docs slip every exact/MinHash/SimHash stage.
# Pipeline (identical order on both engines — order matters because the
# whitespace collapse must see control chars already gone):
#   1. Unicode NFC (Python unicodedata / DuckDB nfc_normalize — both
#      implement UAX #15 canonical composition),
#   2. strip control chars except \t \n \r,
#   3. collapse [ \t\r\n]+ runs to one space,
#   4. trim.
# Only step 1 needs Python (Spark has no builtin normalizer) — it runs
# as an Arrow-batched pandas_udf; steps 2-4 are codegen'd JVM regexes.
# Emits md5(norm) + length + changed-flag, not the text (hash-stable
# across engines, and the projection is what a 100 TB scrub would
# persist anyway). Embarrassingly parallel: no shuffle at all.
_CTRL_RX = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"  # control chars minus \t \n \r
_WS_RX = r"[ \t\r\n]+"


def _py_nfc(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if isinstance(x, str) else x
    )


def normalize_col(col: Column) -> Column:
    """trim(collapse_ws(strip_ctrl(nfc(col)))) — shared by the batch query
    and the streaming ingest gate. The pandas_udf wrap happens here (call
    time, session live), never at import — module scope has no session."""
    nfc = F.pandas_udf(_py_nfc, "string")
    stripped = F.regexp_replace(nfc(col), F.lit(_CTRL_RX), F.lit(""))
    return F.trim(F.regexp_replace(stripped, F.lit(_WS_RX), F.lit(" ")))


@memoized_build("documents")
def doc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length(norm).alias("n_chars_norm"),
        (norm != F.col("text")).alias("changed"),
    ).orderBy("doc_id")


register(
    "doc_normalize",
    sql=r"""
    WITH n AS (
      SELECT doc_id, text,
             trim(regexp_replace(regexp_replace(nfc_normalize(text),
                  '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
                  '[ \t\r\n]+', ' ', 'g'), ' ') AS norm
      FROM documents
    )
    SELECT doc_id, md5(norm) AS norm_hash,
           CAST(len(norm) AS INTEGER) AS n_chars_norm,
           norm <> text AS changed
    FROM n ORDER BY doc_id
    """,
)(doc_normalize)
