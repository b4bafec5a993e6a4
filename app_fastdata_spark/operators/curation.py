"""Corpus-curation planners over `documents` — the operators that sit
between a raw scrape and training batches in an LLM data pipeline
(SURVEY.md §7 beyond-reference; BASELINE.json north star):

* deterministic train/eval split (hash-bucket assignment),
* character-entropy quality scoring,
* shard-local sequence packing (context-length planning),
* language/source mixture re-weighting.

Scale notes: split and entropy are map-only projections (scan-bound at
100 TB). Packing uses a running sum windowed PER (lang, source) shard —
the shard-local form real pipelines use (each worker packs its own
shard), never a single global ordering, so parallelism is the shard
count, not 1. Mixture weights aggregate to ~|langs|x|sources| rows
before any window touches them.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import memoized_build
from ..registry import register
from ..tables import load_table

# --- deterministic train/eval split ---------------------------------------

SPLIT_TRAIN_PCT = 90  # md5 bucket < 90 → train, else eval

# The ONE definition of the split hash, shared (Spark + SQL) by the
# train/eval split and everything that rides it (dedup_incremental_shard's
# "arriving shard" = the eval slice) — a drift here would silently
# desynchronize them.
SPLIT_BUCKET_SQL = "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100"


def split_bucket_col():
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )


def doc_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable hash-bucket split: bucket = 32 bits of md5(doc_id) mod 100.
    Deterministic across runs/engines (no RNG), uncorrelated with any
    corpus ordering — the standard way to keep a held-out slice stable
    as the corpus grows. Pure codegen projection."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = split_bucket_col()
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )


register(
    "doc_train_eval_split",
    sql=f"""
    SELECT doc_id,
           {SPLIT_BUCKET_SQL} AS bucket,
           CASE WHEN {SPLIT_BUCKET_SQL} < {SPLIT_TRAIN_PCT}
                THEN 'train' ELSE 'eval' END AS split
    FROM documents
    """,
)(doc_train_eval_split)


# --- character-entropy quality score --------------------------------------


def _py_char_entropy(text: pd.Series) -> pd.Series:
    """Shannon entropy (bits) of each doc's character distribution —
    low-entropy docs are repeated-character spam / boilerplate. numpy
    per batch; DuckDB's entropy() aggregate is the oracle twin (both
    log2; 6-dp rounding absorbs the ~1e-16 summation-order noise)."""
    from collections import Counter

    import numpy as np

    out = []
    for t in text:
        cnt = np.fromiter(Counter(t).values(), dtype=np.float64)
        p = cnt / cnt.sum()
        # + 0.0 folds IEEE -0.0 (single-character-class docs) to 0.0,
        # matching DuckDB's entropy() rendering under the type-tagged hash
        out.append(round(float(-(p * np.log2(p)).sum()), 6) + 0.0)
    return pd.Series(out)


def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    ent = F.pandas_udf(_py_char_entropy, "double")
    return docs.select(
        "doc_id", F.length("text").alias("n_chars"),
        ent(F.col("text")).alias("char_entropy"),
    )


register(
    "doc_char_entropy",
    sql="""
    SELECT doc_id, any_value(n_chars) AS n_chars,
           round(entropy(c), 6) AS char_entropy
    FROM (SELECT doc_id, length(text) AS n_chars,
                 unnest(string_split(text, '')) AS c
          FROM documents WHERE text IS NOT NULL AND length(text) > 0)
    GROUP BY doc_id
    """,
)(doc_char_entropy)


# --- shard-local sequence packing -----------------------------------------

SEQ_LEN = 512  # tokens per packed training sequence


def doc_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each doc a packed-sequence id within its (lang, source)
    shard: seq_id = floor(start_offset / SEQ_LEN) where start_offset is
    the running token count of preceding docs (doc_id order). This is
    the planning half of context-length packing; shard-local windows
    keep it parallel at corpus scale (real pipelines pack per input
    shard — a global ordering would serialize the whole corpus through
    one partition)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    n_tokens = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    base = docs.select("doc_id", "lang", "source", n_tokens.alias("n_tokens"))
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        "doc_id", "lang", "source", "n_tokens",
        F.floor(start / SEQ_LEN).alias("seq_id"),
    )


register(
    "doc_seq_packing",
    sql=f"""
    SELECT doc_id, lang, source, n_tokens,
           CAST(floor((sum(n_tokens) OVER (PARTITION BY lang, source
                                           ORDER BY doc_id)
                       - n_tokens) / {SEQ_LEN}) AS BIGINT) AS seq_id
    FROM (SELECT doc_id, lang, source,
                 len(string_split_regex(trim(lower(text), ' '), '\\s+'))
                   AS n_tokens
          FROM documents WHERE text IS NOT NULL)
    """,
)(doc_seq_packing)


# --- language/source mixture re-weighting ---------------------------------

LANG_TARGET_FRAC = 0.2  # uniform target over the corpus's 5 languages


def doc_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (lang, source) cell: doc/token counts, the cell's token share
    of the corpus, and the resampling weight that would rebalance
    languages to a uniform target mix (weight = target / actual lang
    share — the "data mixing" knob of corpus assembly). Aggregates
    first; windows only touch the ~|langs|x|sources| rollup."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    n_tokens = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    cells = (
        docs.select("lang", "source", n_tokens.alias("n_tokens"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("cell_tokens"),
        )
    )
    total = Window.partitionBy()
    per_lang = Window.partitionBy("lang")
    lang_frac = F.sum("cell_tokens").over(per_lang) / F.sum("cell_tokens").over(
        total
    )
    return cells.select(
        "lang", "source", "n_docs",
        F.col("cell_tokens").alias("n_tokens"),
        F.round(
            F.col("cell_tokens") / F.sum("cell_tokens").over(total), 6
        ).alias("token_frac"),
        F.round(F.lit(LANG_TARGET_FRAC) / lang_frac, 6).alias(
            "resample_weight"
        ),
    )


register(
    "doc_mixture_weights",
    sql=f"""
    WITH cells AS (
      SELECT lang, source, count(*) AS n_docs,
             CAST(sum(len(string_split_regex(trim(lower(text), ' '), '\\s+')))
                  AS BIGINT) AS cell_tokens
      FROM documents WHERE text IS NOT NULL
      GROUP BY lang, source
    )
    SELECT lang, source, n_docs, cell_tokens AS n_tokens,
           round(cell_tokens / sum(cell_tokens) OVER (), 6) AS token_frac,
           round({LANG_TARGET_FRAC}
                 / (sum(cell_tokens) OVER (PARTITION BY lang)
                    / sum(cell_tokens) OVER ()), 6) AS resample_weight
    FROM cells
    """,
)(doc_mixture_weights)


# --- temperature-scaled source sampling -------------------------------------
# The OTHER standard mixing knob next to doc_mixture_weights' uniform
# target: raise each source's token share p_i to alpha < 1 and
# renormalize (p_i^alpha / sum p_j^alpha) — upsamples the tail without
# flattening the head, the exponentiated-smoothing schedule multilingual
# LM training uses for language/source balancing. alpha is fixed at 0.5
# so the power IS sqrt: correctly-rounded IEEE on both engines (a
# general pow() has no such guarantee), and p_i^0.5 / sum p_j^0.5
# reduces to sqrt(tokens_i) / sum sqrt(tokens_j) — the corpus total
# cancels, so every per-row value derives from one exact BIGINT count.
# The cross-source sums fold a dim-sized handful of doubles; the 6-dp
# output rounding absorbs fold-order noise (the embedding_dim_stats
# contract).


@memoized_build("documents")
def doc_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: doc/token counts, raw token share, the alpha=0.5
    temperature share, and the resulting sampling boost
    (temp_frac / token_frac — >1 means the source is upsampled).
    Aggregates first; the windows only touch the source-sized rollup,
    so at 100 TB this is one map-side-combined hash agg over the scan
    plus arithmetic on a handful of rows."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    n_tokens = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    cells = (
        docs.select("source", n_tokens.alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
    total = Window.partitionBy()
    tok_frac = F.col("n_tokens") / F.sum("n_tokens").over(total)
    s = F.sqrt(F.col("n_tokens").cast("double"))
    # Accepted-risk note (r10 ADVICE, adjudicated acceptable): the
    # sqrt-sum denominator is an unpartitioned double fold whose
    # accumulation ORDER is not pinned against DuckDB's, so a value
    # sitting within ~1e-16 of a 5e-7 rounding boundary could in
    # principle round differently across engines. With
    # source-cardinality-sized sums (a handful of terms) the risk is
    # documented, not observed — the query passed every gate and sweep
    # since registration. If a parity flake EVER appears here: compute
    # the denominator via a deterministic fold over a sorted collected
    # list (source-sized, driver-safe) or quantize before the divide.
    temp_frac = s / F.sum(s).over(total)
    return cells.select(
        "source", "n_docs", "n_tokens",
        F.round(tok_frac, 6).alias("token_frac"),
        F.round(temp_frac, 6).alias("temp_frac"),
        F.round(temp_frac / tok_frac, 6).alias("boost"),
    ).orderBy("source")


register(
    "doc_temperature_mixture",
    sql="""
    WITH cells AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(string_split_regex(trim(lower(text), ' '), '\\s+')))
                  AS BIGINT) AS n_tokens
      FROM documents WHERE text IS NOT NULL
      GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           round(n_tokens / sum(n_tokens) OVER (), 6) AS token_frac,
           round(sqrt(CAST(n_tokens AS DOUBLE))
                 / sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER (), 6)
             AS temp_frac,
           round((sqrt(CAST(n_tokens AS DOUBLE))
                  / sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER ())
                 / (n_tokens / sum(n_tokens) OVER ()), 6) AS boost
    FROM cells
    ORDER BY source
    """,
)(doc_temperature_mixture)


# --- bigram-LM cross-entropy quality score --------------------------------


def _py_bigram_rows(batches):
    """mapInPandas: (doc_id, w1, w2) for every bigram OCCURRENCE.
    Tokenization = the `_py_shingles` parity chain (lower → strip
    spaces → ASCII \\s+ split)."""
    import re

    import numpy as np

    ws = re.compile(r"\s+", re.ASCII)
    for pdf in batches:
        ids, w1s, w2s = [], [], []
        for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
            if t is None:  # defensive: callers filter NULL text upstream
                continue
            toks = ws.split(t.lower().strip(" "))
            if len(toks) < 2:
                continue
            ids.append(np.full(len(toks) - 1, doc_id, dtype=np.int64))
            w1s.extend(toks[:-1])
            w2s.extend(toks[1:])
        if ids:
            yield pd.DataFrame(
                {"doc_id": np.concatenate(ids), "w1": w1s, "w2": w2s}
            )


def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-entropy (bits/bigram) under the corpus's own bigram
    LM — the classic perplexity-style quality filter (CCNet/Gopher
    lineage): templated/boilerplate docs score low, line noise scores
    high. P(w2|w1) = c(w1 w2) / c(w1 ·), both counted over the full
    corpus, so every doc bigram has nonzero probability (it contributed
    to the counts) and no smoothing is needed.

    Shape: one Arrow pass emits bigram occurrences; the LM is two hash
    aggregates over them; scoring re-joins occurrences to the LM on the
    bigram key (auto-broadcast at small vocab, shuffle join at web-scale
    vocab — no forced hint) and averages per doc. The occurrence frame
    is recomputed for the scoring side rather than pinned in executor
    memory — two map passes beat caching 100 TB of bigrams."""
    from ..tables import widen_small_scan

    docs = widen_small_scan(
        load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull()),
        path=f"{sf_dir}/documents.parquet",
    )
    occ = docs.select("doc_id", "text").mapInPandas(
        _py_bigram_rows, "doc_id long, w1 string, w2 string"
    )
    bi = occ.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    pre = bi.groupBy("w1").agg(F.sum("c2").alias("c1"))
    lm = bi.join(pre, "w1")
    return (
        occ.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log2(F.col("c1") / F.col("c2"))), 6).alias(
                "lm_bits"
            ),
        )
    )


register(
    "doc_lm_score",
    sql="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text), ' '), '\\s+') AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    occ AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM t, unnest(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2
    ),
    bi AS (SELECT w1, w2, count(*) AS c2 FROM occ GROUP BY 1, 2),
    pre AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM bi GROUP BY 1)
    SELECT doc_id, count(*) AS n_bigrams,
           round(avg(log2(c1 / c2)), 6) AS lm_bits
    FROM occ JOIN bi USING (w1, w2) JOIN pre USING (w1)
    GROUP BY doc_id
    """,
)(doc_lm_score)


# --- per-group budget capping ---------------------------------------------

GROUP_BUDGET = 3  # max docs each (lang, source) cell may contribute


def doc_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each (lang, source) cell's contribution at GROUP_BUDGET docs,
    chosen by md5-hash order (deterministic, uncorrelated with doc_id
    order, stable across engines) — the "no single source dominates the
    mix" guard of corpus assembly. One window per cell over a hash sort;
    at scale the rank is per-shard parallel like doc_seq_packing."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GROUP_BUDGET)
        .select("doc_id", "lang", "source")
    )


register(
    "doc_budget_sample",
    sql=f"""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      FROM documents
    ) WHERE rk <= {GROUP_BUDGET}
    """,
)(doc_budget_sample)


# --- corpus length histogram ----------------------------------------------

HIST_BIN = 100  # chars per bin


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length distribution: fixed-width bins over n_chars with count
    and total chars per bin — the distribution diagnostic behind length
    cutoffs. Pure two-column hash agg; scan-bound at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    bin_lo = (F.floor(F.col("n_chars") / HIST_BIN) * HIST_BIN).cast("long")
    return (
        docs.groupBy(bin_lo.alias("bin_lo"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("bin_lo")
    )


register(
    "doc_length_histogram",
    sql=f"""
    SELECT CAST(floor(n_chars / {HIST_BIN}) * {HIST_BIN} AS BIGINT) AS bin_lo,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
)(doc_length_histogram)


# --- adaptive quality thresholds ------------------------------------------

QUALITY_DROP_PCT = 0.1  # drop the shortest decile


def doc_quality_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate with corpus-derived thresholds instead of fixed
    constants: keep docs whose length clears their LANGUAGE's 10th
    percentile (per-language because languages have different length
    distributions — a fixed global cutoff over-filters terse languages).
    Two-phase: a tiny per-language percentile aggregate broadcasts back
    onto the scan; the fact side never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    cuts = docs.groupBy("lang").agg(
        F.expr(f"percentile(n_chars, {QUALITY_DROP_PCT})").alias("min_chars")
    )
    return (
        docs.join(F.broadcast(cuts), "lang")
        .filter(F.col("n_chars") > F.col("min_chars"))
        .select("doc_id", "lang", "n_chars", F.round("min_chars", 4).alias("lang_cutoff"))
    )


register(
    "doc_quality_adaptive",
    sql=f"""
    WITH cuts AS (
      SELECT lang, quantile_cont(n_chars, {QUALITY_DROP_PCT}) AS min_chars
      FROM documents GROUP BY lang
    )
    SELECT doc_id, d.lang, n_chars, round(min_chars, 4) AS lang_cutoff
    FROM documents d JOIN cuts USING (lang)
    WHERE n_chars > min_chars
    """,
)(doc_quality_adaptive)


# --- deterministic global shuffle (training-shard assignment) --------------

N_SHUFFLE_SHARDS = 16


@memoized_build("documents")
def doc_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training: every doc gets a
    (shard, pos) — shard by md5 bucket, position by md5 order within the
    shard — so a trainer streams shard files in pos order and sees a
    reproducible pseudo-random permutation of the corpus, with no RNG
    state to coordinate across workers.

    Scale shape: this is how a 100 TB corpus is actually shuffled — a
    GLOBAL row_number() would funnel everything through one task, while
    hash-sharding + per-shard ordering is one exchange on shard and a
    per-partition sort (each shard ~N/n_shards docs; shard count scales
    with the corpus). Same md5 arithmetic as the split/sample planners,
    shared textually with the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    h32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = Window.partitionBy("shard").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", (h32 % N_SHUFFLE_SHARDS).alias("shard"))
        .withColumn("pos", F.row_number().over(w))
    )


register(
    "doc_global_shuffle",
    sql=f"""
    SELECT doc_id,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
             % {N_SHUFFLE_SHARDS} AS shard,
           CAST(row_number() OVER (
                  PARTITION BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                               % {N_SHUFFLE_SHARDS}
                  ORDER BY md5(doc_id::VARCHAR), doc_id) AS INTEGER) AS pos
    FROM documents
    """,
)(doc_global_shuffle)


# --- length-bucketed inference batching ------------------------------------

PAD_BUCKET = 32  # lengths padded up to the next multiple of this


def doc_batch_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference-batching planner: bucket documents by padded token
    length (next multiple of PAD_BUCKET) and report, per bucket, the
    batch size, padded length, real token total, and the padding waste
    a naive single-bucket batcher would pay. This is the standard
    length-bucketing step before batched model inference — the waste
    column IS the telemetry that justifies it.

    One exchange on the bucket key; everything else is a projection.
    token counts are whitespace tokens (shared with doc_token_stats)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    b = (F.ceil(n_tok / PAD_BUCKET) * PAD_BUCKET).cast("long")
    return (
        docs.select(n_tok.alias("n_tokens"), b.alias("padded_len"))
        .groupBy("padded_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("real_tokens"),
            (F.count("*") * F.first("padded_len") - F.sum("n_tokens")).alias(
                "padding_waste"
            ),
        )
        .select("padded_len", "n_docs", "real_tokens", "padding_waste")
    )


register(
    "doc_batch_padding",
    sql=f"""
    WITH t AS (
      SELECT len(string_split_regex(trim(lower(text), ' '), '\\s+')) AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT n_tokens,
             CAST(ceil(n_tokens * 1.0 / {PAD_BUCKET}) * {PAD_BUCKET} AS BIGINT)
               AS padded_len
      FROM t
    )
    SELECT padded_len, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS real_tokens,
           CAST(count(*) * padded_len - sum(n_tokens) AS BIGINT)
             AS padding_waste
    FROM b GROUP BY padded_len
    """,
)(doc_batch_padding)


# --- cluster-balanced diversity sampling (D4-style) ------------------------

# Cap each embedding cluster's contribution to the training mix. Semantic
# clustering + per-cluster budget is the diversity-sampling step of
# SemDeDup/D4-style curation: over-represented regions of embedding space
# get truncated instead of dominating the mix. Assignment reuses the
# oracled Lloyd seed-centroid math (ml/kmeans.py); the per-cluster pick
# is md5-hash order — deterministic, uncorrelated with vec_id order, and
# identical across engines (same idiom as doc_budget_sample).
CLUSTER_SAMPLE_CAP = 40


@memoized_build("embeddings")
def doc_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster_id): up to CLUSTER_SAMPLE_CAP vectors per seed
    cluster. Scale shape: the K-way assignment is a broadcast of K
    centroids over the scan (no shuffle), and the per-cluster window
    shuffles on cluster_id — K partitions of capped rank work; at real
    scale the rank runs per-shard like doc_seq_packing (each shard caps
    at CAP/shards) so no single reducer sees a whole cluster."""
    from ..ml.kmeans import assign_to_seed_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = assign_to_seed_centroids(emb).select("vec_id", "cluster_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        assigned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= CLUSTER_SAMPLE_CAP)
        .select("vec_id", "cluster_id")
        .orderBy("cluster_id", "vec_id")
    )


def _register_cluster_balanced_sample() -> None:
    from ..ml.kmeans import seed_assign_sql

    register(
        "doc_cluster_balanced_sample",
        sql="WITH "
        + seed_assign_sql()
        + f"""
    SELECT vec_id, cluster_id FROM (
      SELECT vec_id, cluster_id,
             row_number() OVER (
               PARTITION BY cluster_id
               ORDER BY md5(vec_id::VARCHAR), vec_id
             ) AS rk
      FROM assigned
    ) WHERE rk <= {CLUSTER_SAMPLE_CAP}
    ORDER BY cluster_id, vec_id
    """,
    )(doc_cluster_balanced_sample)


_register_cluster_balanced_sample()


# --- corpus health snapshot ------------------------------------------------


@memoized_build("documents")
def corpus_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus dashboard: sizes, mix breadth, token volume, the
    quality-gate pass rate, and the exact-duplicate overhang — the first
    query a curation team runs against a new crawl. One scan, one
    all-map-side partial aggregate into a single-row reduce (the two
    COUNT DISTINCTs expand to a partial-distinct Expand, still one
    exchange); scan-bound at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    ntok = F.size(toks)
    passes = (
        (F.length("text") >= 100)
        & (ntok >= 20)
        & ((F.size(F.array_distinct(toks)) / ntok) >= 0.3)
    )
    proj = docs.select(
        "lang",
        "source",
        F.length("text").alias("chars"),
        ntok.alias("ntok"),
        F.md5(norm).alias("fp"),
        # NULL text yields a NULL pass flag, which Spark's avg would SKIP
        # while the oracle's CASE maps it to 0.0 and keeps it in the
        # denominator — coalesce so both engines count unreadable docs
        # as failing the gate.
        F.coalesce(passes.cast("double"), F.lit(0.0)).alias("q"),
    )
    return proj.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("ntok").alias("total_tokens"),
        F.round(F.avg("chars"), 6).alias("avg_doc_chars"),
        F.round(F.avg("q"), 6).alias("quality_pass_rate"),
        (F.count("*") - F.countDistinct("fp")).alias("exact_dup_docs"),
    )


register(
    "corpus_health",
    sql="""
    WITH t AS (
      SELECT lang, source, length(text) AS chars,
             len(string_split_regex(trim(lower(text), ' '), '\\s+')) AS ntok,
             len(list_distinct(string_split_regex(trim(lower(text), ' '), '\\s+')))
               AS ndistinct,
             md5(regexp_replace(trim(lower(text), ' '), '\\s+', ' ', 'g')) AS fp
      FROM documents
    )
    SELECT count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           count(DISTINCT source) AS n_sources,
           CAST(sum(ntok) AS BIGINT) AS total_tokens,
           round(avg(chars), 6) AS avg_doc_chars,
           round(avg(CASE WHEN chars >= 100 AND ntok >= 20
                           AND ndistinct * 1.0 / ntok >= 0.3
                     THEN 1.0 ELSE 0.0 END), 6) AS quality_pass_rate,
           count(*) - count(DISTINCT fp) AS exact_dup_docs
    FROM t
    """,
)(corpus_health)


# --- DSIR-style importance weights -----------------------------------------

# Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
# fit two bag-of-hashed-ngrams unigram models — one on the TARGET slice
# (here: docs passing the quality gate, standing in for "looks like the
# domain you want"), one on the RAW pool — and weight each raw doc by its
# log-likelihood ratio. High-weight docs look like the target; sampling
# proportional to the weight tilts the mix toward it.
DSIR_BUCKETS = 256  # hashed-feature space (md5(token) mod B)


def _dsir_feat(col):
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % DSIR_BUCKETS
    )


def _dsir_toks():
    return F.split(F.trim(F.lower(F.col("text"))), r"\s+")


def fit_dsir_model(docs: DataFrame) -> list[float]:
    """Fit the DSIR ratio table over a documents frame: one token pass
    tags each occurrence with its md5-hash feature bucket and reduces to
    ONE B-row aggregate (target = quality-passing docs, counted as a
    conditional sum). Returns the 256-entry log2 likelihood-ratio table,
    Laplace-smoothed; unseen buckets get the zero-count ratio."""
    toks = _dsir_toks()
    is_target = (
        (F.length("text") >= 100)
        & (F.size(toks) >= 20)
        & ((F.size(F.array_distinct(toks)) / F.size(toks)) >= 0.3)
    )
    fc = (
        docs.select(
            is_target.alias("is_target"), F.explode(toks).alias("tok")
        )
        .select("is_target", _dsir_feat(F.col("tok")).alias("f"))
        .groupBy("f")
        .agg(
            F.count("*").alias("rc"),
            F.sum(F.col("is_target").cast("long")).alias("tc"),
        )
        .collect()
    )
    rtot = sum(r.rc for r in fc)
    ttot = sum(r.tc for r in fc)
    lrs = [
        math.log2((1 * (rtot + DSIR_BUCKETS)) / (1 * (ttot + DSIR_BUCKETS)))
    ] * DSIR_BUCKETS
    for r in fc:
        lrs[r.f] = math.log2(
            ((r.tc + 1) * (rtot + DSIR_BUCKETS))
            / ((r.rc + 1) * (ttot + DSIR_BUCKETS))
        )
    return lrs


def dsir_score_frame(docs: DataFrame, lrs: list[float]) -> DataFrame:
    """Stateless DSIR scoring projection over an arbitrary documents
    frame — batch scan or structured STREAM (the model ships as a
    256-double literal in the plan, the ST7 hot-model pattern applied to
    curation). Per doc: fold the token array through element_at on the
    inlined ratio literal — NO join, NO explode, NO doc-keyed exchange
    (the with_cluster J4 idiom applied to model stats)."""
    toks = _dsir_toks()
    # one parsed literal array, not 256 py4j F.lit round trips (r13:
    # ~0.2 s of driver-side build per invocation; guide §7.3)
    lr_lit = F.expr(
        "array(" + ", ".join(f"{x!r}D" for x in lrs) + ")"
    )
    score = F.aggregate(
        F.transform(
            toks, lambda t: F.element_at(lr_lit, (_dsir_feat(t) + 1).cast("int"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(score, 6).alias("log_importance"),
    )


@memoized_build("documents")
def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, log_importance): per-doc log2 likelihood ratio
    between the target and raw hashed-unigram models, Laplace-smoothed.

    Fit pass + scoring pass, both linear; every token's bucket occurred
    in the fit pass over the same corpus, so the literal covers every
    probe. widen_small_scan re-splits the tiny-testdata single-partition
    scan for map parallelism (pass-through at real scale)."""
    from ..cache import session_get, stamp_key
    from ..tables import widen_small_scan

    docs = widen_small_scan(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        ),
        path=f"{sf_dir}/documents.parquet",
    )
    # The fitted ratio table is the MODEL (a 256-double list): fit once
    # per (session, corpus stamp) like _centroid_broadcast — each
    # invocation was re-running the fit collect (~0.7 s Spark job) to
    # derive the identical literals. Scoring always recomputes from the
    # parquet scan.
    lrs = session_get(
        "dsir_model",
        stamp_key(spark, sf_dir, "documents"),
        lambda: fit_dsir_model(docs),
    )
    return dsir_score_frame(docs, lrs)


_DSIR_SQL = f"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text), ' '), '\\s+') AS toks,
             length(text) AS chars
      FROM documents WHERE text IS NOT NULL
    ),
    tagged AS (
      SELECT doc_id, toks,
             (chars >= 100 AND len(toks) >= 20
              AND len(list_distinct(toks)) * 1.0 / len(toks) >= 0.3)
               AS is_target
      FROM t
    ),
    occ AS (
      SELECT doc_id, is_target,
             ('0x' || substr(md5(toks[i]), 1, 8))::BIGINT % {DSIR_BUCKETS} AS f
      FROM tagged, unnest(range(1, len(toks) + 1)) AS u(i)
    ),
    fc AS (
      SELECT f, count(*) AS rc,
             CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tc
      FROM occ GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(rc) AS BIGINT) AS rtot, CAST(sum(tc) AS BIGINT) AS ttot
      FROM fc
    ),
    lm AS (
      SELECT f,
             log2(((tc + 1) * (rtot + {DSIR_BUCKETS}) * 1.0)
                  / ((rc + 1) * (ttot + {DSIR_BUCKETS}))) AS lr
      FROM fc, tot
    )
    SELECT doc_id, count(*) AS n_tokens,
           round(sum(lr), 6) AS log_importance
    FROM occ JOIN lm USING (f)
    GROUP BY doc_id
    """

register("doc_dsir_weights", sql=_DSIR_SQL)(doc_dsir_weights)


# --- DSIR top-quantile selection -------------------------------------------

DSIR_KEEP_FRAC = 0.25  # keep the top quarter by importance weight


def doc_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selection step of importance resampling: keep docs whose
    log-importance is at or above the corpus's (1 - KEEP_FRAC)
    percentile. The cutoff is one scalar aggregate over the weights
    frame, broadcast back onto it (cross join of a 1-row frame — no
    collect in the plan); weights ride the already-linear
    doc_dsir_weights. Cutoff is 6-dp-quantized on both engines so the
    boundary cannot straddle a rounding difference."""
    w = doc_dsir_weights(spark, sf_dir)
    cut = w.agg(
        F.round(
            F.expr(f"percentile(log_importance, {1 - DSIR_KEEP_FRAC})"), 6
        ).alias("cutoff")
    )
    return (
        w.crossJoin(F.broadcast(cut))
        .filter(F.col("log_importance") >= F.col("cutoff"))
        .select("doc_id", "n_tokens", "log_importance")
        .orderBy("doc_id")
    )


register(
    "doc_dsir_sample",
    sql="WITH w AS ("
    + _DSIR_SQL
    + f"""),
    cut AS (
      SELECT round(quantile_cont(log_importance, {1 - DSIR_KEEP_FRAC}), 6)
               AS cutoff
      FROM w
    )
    SELECT doc_id, n_tokens, log_importance
    FROM w, cut
    WHERE log_importance >= cutoff
    ORDER BY doc_id
    """,
)(doc_dsir_sample)


# --- per-source scorecard --------------------------------------------------


def source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation scorecard: volume, quality-gate pass rate,
    mean type-token ratio, and the within-source exact-duplicate rate —
    the table a curation team reads to decide which sources to keep,
    cap, or drop. Same single-scan projection as corpus_health, grouped
    by source; one partial->final aggregate, scan-bound at scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    ntok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / ntok
    passes = (F.length("text") >= 100) & (ntok >= 20) & (ttr >= 0.3)
    proj = docs.select(
        "source",
        ntok.alias("ntok"),
        F.round(ttr, 6).alias("ttr"),
        F.coalesce(passes.cast("double"), F.lit(0.0)).alias("q"),
        F.md5(norm).alias("fp"),
    )
    return (
        proj.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
            F.round(F.avg("q"), 6).alias("quality_pass_rate"),
            F.round(F.avg("ttr"), 6).alias("mean_ttr"),
            (F.count("*") - F.countDistinct("fp")).alias("exact_dup_docs"),
        )
        .orderBy("source")
    )


register(
    "source_scorecard",
    sql="""
    WITH t AS (
      SELECT source,
             len(string_split_regex(trim(lower(text), ' '), '\\s+')) AS ntok,
             round(len(list_distinct(string_split_regex(trim(lower(text), ' '), '\\s+')))
                   * 1.0
                   / len(string_split_regex(trim(lower(text), ' '), '\\s+')), 6) AS ttr,
             CASE WHEN length(text) >= 100
                   AND len(string_split_regex(trim(lower(text), ' '), '\\s+')) >= 20
                   AND len(list_distinct(string_split_regex(trim(lower(text), ' '), '\\s+')))
                       * 1.0
                       / len(string_split_regex(trim(lower(text), ' '), '\\s+')) >= 0.3
                  THEN 1.0 ELSE 0.0 END AS q,
             md5(regexp_replace(trim(lower(text), ' '), '\\s+', ' ', 'g')) AS fp
      FROM documents
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS total_tokens,
           round(avg(q), 6) AS quality_pass_rate,
           round(avg(ttr), 6) AS mean_ttr,
           count(*) - count(DISTINCT fp) AS exact_dup_docs
    FROM t GROUP BY source ORDER BY source
    """,
)(source_scorecard)


# --- Zipf vocabulary-health check ------------------------------------------


def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row log-log least-squares fit of the token frequency spectrum
    (count vs rank): natural text sits near slope -1 (Zipf); synthetic,
    templated, or degenerate corpora drift far off — a cheap
    whole-corpus health telemetry. The term count is the usual
    explode->hash-agg (shuffles on the token, high cardinality, no
    skew); the rank window runs over the VOCABULARY (|V| << corpus —
    at web scale fit a top-K sample instead of the full spectrum), and
    the fit is a closed-form single-row aggregate."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    counts = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    w = Window.orderBy(F.desc("c"), F.asc("tok"))
    xy = counts.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    agg = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
    )


register(
    "corpus_zipf_slope",
    sql="""
    WITH counts AS (
      SELECT tok, count(*) AS c
      FROM (SELECT unnest(string_split_regex(trim(lower(text), ' '), '\\s+')) AS tok
            FROM documents WHERE text IS NOT NULL)
      GROUP BY tok
    ),
    xy AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, tok) AS DOUBLE)) AS x,
             ln(CAST(c AS DOUBLE)) AS y
      FROM counts
    )
    SELECT count(*) AS n_terms,
           round((count(*) * sum(x * y) - sum(x) * sum(y))
                 / (count(*) * sum(x * x) - sum(x) * sum(x)), 6) AS zipf_slope
    FROM xy
    """,
)(corpus_zipf_slope)


# --- per-source distributional novelty -------------------------------------


def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source ‖ corpus) in bits over the hashed-unigram feature space
    — which sources are distributionally anomalous relative to the pool
    (the complement of source_scorecard: a source can pass every quality
    gate and still be word-soup from another planet). Laplace-smoothed
    over all B buckets so unseen features contribute mass on both sides.

    Shape: one token pass into a (source, bucket) aggregate, densified
    against the tiny |sources| x B grid, per-source sum — the grid and
    rollup are |sources| x 256 rows, so everything after the scan is
    dim-sized."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    occ = docs.select(
        "source", F.explode(toks).alias("tok")
    ).select("source", _dsir_feat(F.col("tok")).alias("f"))
    sc = occ.groupBy("source", "f").agg(F.count("*").alias("c"))
    grid = (
        sc.select("source").distinct()
        .crossJoin(
            spark.range(DSIR_BUCKETS).select(F.col("id").alias("f"))
        )
    )
    dense = grid.join(sc, ["source", "f"], "left").select(
        "source", "f", F.coalesce("c", F.lit(0)).alias("c")
    )
    ws = Window.partitionBy("source")
    wf = Window.partitionBy("f")
    wall = Window.partitionBy(F.lit(1))
    p_s = (F.col("c") + 1) / (F.sum("c").over(ws) + DSIR_BUCKETS)
    p_c = (F.sum("c").over(wf) + 1) / (F.sum("c").over(wall) + DSIR_BUCKETS)
    term = p_s * F.log2(p_s / p_c)
    return (
        dense.select("source", F.col("c").alias("c"), term.alias("t"))
        .groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(F.sum("t"), 6).alias("kl_bits"),
        )
        .orderBy("source")
    )


register(
    "source_kl_divergence",
    sql=f"""
    WITH occ AS (
      SELECT source,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % {DSIR_BUCKETS} AS f
      FROM (SELECT source,
                   unnest(string_split_regex(trim(lower(text), ' '), '\\s+')) AS tok
            FROM documents WHERE text IS NOT NULL)
    ),
    sc AS (SELECT source, f, count(*) AS c FROM occ GROUP BY 1, 2),
    grid AS (
      SELECT s.source, g.f
      FROM (SELECT DISTINCT source FROM sc) s
      CROSS JOIN (SELECT unnest(range(0, {DSIR_BUCKETS})) AS f) g
    ),
    dense AS (
      SELECT grid.source, grid.f, COALESCE(sc.c, 0) AS c
      FROM grid LEFT JOIN sc ON sc.source = grid.source AND sc.f = grid.f
    ),
    terms AS (
      SELECT source, c,
             ((c + 1.0) / (sum(c) OVER (PARTITION BY source) + {DSIR_BUCKETS}))
             * log2(((c + 1.0)
                     / (sum(c) OVER (PARTITION BY source) + {DSIR_BUCKETS}))
                    / ((sum(c) OVER (PARTITION BY f) + 1.0)
                       / (sum(c) OVER () + {DSIR_BUCKETS}))) AS t
      FROM dense
    )
    SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
           round(sum(t), 6) AS kl_bits
    FROM terms GROUP BY source ORDER BY source
    """,
)(source_kl_divergence)


# --- corpus snapshot diff ---------------------------------------------------
# Crawl-to-crawl change accounting: which documents were added, removed,
# edited, or untouched between two corpus snapshots — the bookkeeping
# every recurring-ingest pipeline needs before deciding what to
# re-embed / re-dedup. The "previous" snapshot is derived
# deterministically from the corpus (doc_id residue classes drop some
# docs from each side and truncate some texts) so the operator has a
# full value-hash oracle without a second testdata table; with a real
# lake the two sides are just two scans.
@memoized_build("documents")
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two snapshot fingerprint frames on doc_id →
    per-status counts. Scale shape: both sides project to (doc_id, fp)
    at scan time (fingerprints, not text, go through the exchange), the
    join is a plain sort-merge on the key both lakes are laid out by,
    and the rollup output is 4 rows. At 100 TB this is one co-partitioned
    join; with bucketed snapshot tables the exchange disappears
    (plans/bucketing.py shows that form)."""
    docs = load_table(spark, sf_dir, "documents")
    prev = docs.where(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.md5(
            F.coalesce(
                F.when(
                    F.col("doc_id") % 7 == 3, F.substring("text", 1, 10)
                ).otherwise(F.col("text")),
                F.lit(""),
            )
        ).alias("fp_prev"),
    )
    curr = docs.where(F.col("doc_id") % 11 != 5).select(
        "doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("fp_curr")
    )
    status = (
        F.when(F.col("fp_prev").isNull(), F.lit("added"))
        .when(F.col("fp_curr").isNull(), F.lit("removed"))
        .when(F.col("fp_prev") != F.col("fp_curr"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        prev.join(curr, "doc_id", "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("status")
    )


register(
    "corpus_snapshot_diff",
    sql="""
    WITH prev AS (
      SELECT doc_id,
             md5(coalesce(CASE WHEN doc_id % 7 = 3 THEN substr(text, 1, 10)
                               ELSE text END, '')) AS fp_prev
      FROM documents WHERE doc_id % 10 <> 0
    ),
    curr AS (
      SELECT doc_id, md5(coalesce(text, '')) AS fp_curr
      FROM documents WHERE doc_id % 11 <> 5
    )
    SELECT CASE WHEN fp_prev IS NULL THEN 'added'
                WHEN fp_curr IS NULL THEN 'removed'
                WHEN fp_prev <> fp_curr THEN 'changed'
                ELSE 'unchanged' END AS status,
           count(*) AS n_docs
    FROM prev FULL OUTER JOIN curr USING (doc_id)
    GROUP BY 1 ORDER BY 1
    """,
)(corpus_snapshot_diff)


# --- quality-weighted Bernoulli sampling ------------------------------------
# The remaining sampling class after the fixed-rate (stratified-hash)
# and cap-based (budget) planners: PER-DOC inclusion probability
# proportional to a quality signal — soft filtering (docs kept with
# probability ttr) instead of the hard doc_quality threshold, the
# "sample high-quality data more often" knob of a mixture pipeline.
# Deterministic: the uniform draw is 32 bits of md5 over a SALTED key
# ('ws:'||doc_id — independent of the split/shard hashes that also draw
# from doc_id), u = k/2^32 exact in a double, compared to the 6-dp ttr.
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep doc with probability = its type-token ratio. Pure codegen
    projection + filter (one md5, one compare) — zero shuffles; at
    100 TB the sample materializes in the same pass that scores it."""
    from .textops import quality_frame

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_frame(docs).select("doc_id", F.col("ttr").alias("keep_prob"))
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    return (
        scored.withColumn("u", F.round(u, 6))
        .where(u < F.col("keep_prob"))
        .select("doc_id", "keep_prob", "u")
        .orderBy("doc_id")
    )


register(
    "doc_weighted_sample",
    sql="""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text), ' '), '\\s+') AS toks
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             round(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS keep_prob,
             ('0x' || substr(md5('ws:' || doc_id::VARCHAR), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM t
    )
    SELECT doc_id, keep_prob, round(u, 6) AS u
    FROM scored WHERE u < keep_prob ORDER BY doc_id
    """,
)(doc_weighted_sample)
