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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


def _tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


# Token counting: whitespace tokens, distinct tokens, avg token length.
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
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
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


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.lower(F.col("text")))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
    return docs.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(stop_hits / F.size(toks), 6).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
        (
            (F.length("text") >= 100)
            & (F.size(toks) >= 20)
            & ((F.size(F.array_distinct(toks)) / F.size(toks)) >= 0.3)
        ).alias("passes_quality"),
    )


_STOP_SQL = "['the', 'a', 'and', 'of', 'to']"

register(
    "doc_quality",
    sql=f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
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
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
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
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint,
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
                 / len(string_split_regex(trim(text), '\\s+')), 6) AS fertility
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
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
                          list_transform(string_split(text, ''),
                                         ch -> CAST(ascii(ch) AS BIGINT))),
             (acc, c) -> (acc * {_RH_B} + c) % {_RH_M}
           ) AS rolling_hash
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
               string_split_regex(trim(lower(text)), '\\s+'))) AS term
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
