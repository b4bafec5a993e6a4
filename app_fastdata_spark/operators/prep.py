"""Training-prep operators: RAG chunking, learned-filter scoring, and
tokenizer-training (BPE) building blocks over the `documents` table —
the stages between a curated corpus and a training run (beyond-reference
per SURVEY.md §7 / BASELINE.json north star; reference analogue: the
per-event scoring projections of procedures/NewEvent.java, applied to
document prep instead of event scoring).

All hot paths are built-in column expressions (JVM codegen, no Python),
embarrassingly parallel scans with at most one dim-sized aggregate —
the 100 TB cost is the corpus scan itself. Cross-engine determinism
follows the house idioms: md5-derived hashing, integer-exact folds,
one float op at the end rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .textops import _tokens

# --- RAG chunking -----------------------------------------------------------
# Sliding character windows with overlap — the standard retrieval-corpus
# prep step. Deterministic chunk ids (doc_id, chunk_idx); md5 of each
# chunk so the output is join-able with an embedding/dedup stage.
CHUNK_WIDTH = 200
CHUNK_STRIDE = 150  # overlap = WIDTH - STRIDE = 50 chars


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping char-window chunks: start offsets 0, S, 2S, … while
    < len(text); chunk = substring(start, WIDTH). Plan: scan → filter →
    Generate(explode(sequence)) → project — zero shuffles; at 100 TB
    this is a pure map over the corpus scan, output ~len/S rows per doc."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    chunked = (
        docs.where(F.col("text").isNotNull() & (n > 0))
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.floor((n - F.lit(1)) / F.lit(CHUNK_STRIDE)),
                )
            ).alias("chunk_idx"),
            F.col("text"),
        )
    )
    chunk = F.expr(
        f"substring(text, cast(chunk_idx * {CHUNK_STRIDE} + 1 as int), {CHUNK_WIDTH})"
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        (F.col("chunk_idx") * CHUNK_STRIDE + 1).alias("chunk_start"),
        F.length(chunk).alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


register(
    "doc_chunks",
    sql=f"""
    WITH idx AS (
      SELECT doc_id, text,
             unnest(generate_series(0,
               CAST(floor((length(text) - 1) * 1.0
                          / {CHUNK_STRIDE}) AS BIGINT))) AS i
      FROM documents WHERE text IS NOT NULL AND length(text) > 0
    )
    SELECT doc_id, i AS chunk_idx, i * {CHUNK_STRIDE} + 1 AS chunk_start,
           length(substr(text, CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT),
                         {CHUNK_WIDTH})) AS chunk_len,
           md5(substr(text, CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT),
                      {CHUNK_WIDTH})) AS chunk_md5
    FROM idx
    """,
)(doc_chunks)


# --- Learned quality-filter scoring ----------------------------------------
# fastText-style linear classifier over hashed bag-of-words features
# (the CCNet/fastText quality-filter stage): bucket = md5-hash of the
# token mod B, fixed per-bucket weight derived by integer arithmetic
# (a frozen "trained" model both engines reproduce bit-for-bit), score
# = sigmoid(mean token weight). The fold is integer-exact — weights are
# kept in integer units (0..996) and the single float division +
# sigmoid happen once per doc, rounded to 6 dp (house float contract).
CLS_BUCKETS = 64
_CLS_MULT = 2654435761  # Knuth multiplicative-hash constant
_CLS_MOD = 997          # prime → near-uniform weight units
_CLS_SCALE = 499.0      # unit → weight in ~[-1, 1): u/499 - 1


def doc_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc classifier score. Plan: scan → codegen projection (md5 +
    integer fold over the token array) — zero shuffles, no UDFs; model
    weights are inlined arithmetic so there is no join and nothing to
    broadcast. At 100 TB: a pure map, same shape as doc_dsir_weights."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(_tokens(F.lower(F.col("text"))), lambda t: t != F.lit(""))
    # integer weight units: ((bucket32(t) % B) * MULT) % MOD   (0..996)
    unit = (
        lambda t: (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
            % CLS_BUCKETS
            * _CLS_MULT
        )
        % _CLS_MOD
    )
    base = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + unit(t)
        ).alias("unit_sum"),
    ).where(F.col("n_tokens") > 0)
    x = (F.col("unit_sum") / F.col("n_tokens")) / _CLS_SCALE - 1.0
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), 6)
    return base.select(
        "doc_id",
        "n_tokens",
        score.alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


register(
    "doc_classifier_score",
    sql=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    u AS (
      SELECT doc_id, len(toks) AS n_tokens,
             CAST(list_sum(list_transform(toks,
               x -> (('0x' || substr(md5(x), 1, 8))::BIGINT % {CLS_BUCKETS}
                     * {_CLS_MULT}) % {_CLS_MOD})) AS BIGINT) AS unit_sum
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, n_tokens,
           round(1.0 / (1.0 + exp(-((unit_sum * 1.0 / n_tokens)
                                    / {_CLS_SCALE} - 1.0))), 6)
             AS quality_score,
           round(1.0 / (1.0 + exp(-((unit_sum * 1.0 / n_tokens)
                                    / {_CLS_SCALE} - 1.0))), 6) >= 0.5
             AS keep
    FROM u
    """,
)(doc_classifier_score)


# --- BPE tokenizer training: one merge-selection step -----------------------
# Distributed byte-pair-encoding training is a driver loop of exactly
# this step (mirror of the kmeans_lloyd_step pattern: the inner
# iteration under the full value-hash oracle, the loop in the driver):
# build the word-frequency table, count adjacent symbol pairs weighted
# by word frequency, rank pairs. The top pair is the merge a BPE trainer
# would apply; top-20 returned so the oracle pins the whole head of the
# distribution, ties broken lexicographically.
BPE_TOP_PAIRS = 20


def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge-selection step over the corpus.

    Scale shape: the pair space collapses to the VOCABULARY first
    (groupBy word — one shuffle whose reduce side is |vocab| ≪ corpus),
    pairs explode from distinct words only (weighted by frequency), and
    the final rank is a TakeOrderedAndProject over ≤ |alphabet|² rows.
    A full training run is a driver loop over this step with the merge
    applied to the vocab frame between iterations (vocab-sized, cheap)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.where(F.col("text").isNotNull()).select(
        F.explode(
            F.filter(_tokens(F.lower(F.col("text"))), lambda t: t != F.lit(""))
        ).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count("*").alias("freq"))
    pairs = vocab.where(F.length("w") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> struct(substring(w, i, 1) AS l,"
                "             substring(w, i + 1, 1) AS r))"
            )
        ).alias("p"),
        "freq",
    )
    return (
        pairs.groupBy(
            F.col("p.l").alias("pair_left"), F.col("p.r").alias("pair_right")
        )
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair_left", "pair_right")
        .limit(BPE_TOP_PAIRS)
    )


register(
    "bpe_merge_step",
    sql=f"""
    WITH w AS (
      SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                x -> x <> '')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    v AS (SELECT w, count(*) AS freq FROM w GROUP BY w),
    vi AS (
      SELECT w, freq, unnest(generate_series(1, length(w) - 1)) AS i
      FROM v WHERE length(w) >= 2
    ),
    p AS (
      SELECT substr(w, CAST(i AS BIGINT), 1) AS pair_left,
             substr(w, CAST(i + 1 AS BIGINT), 1) AS pair_right, freq
      FROM vi
    )
    SELECT pair_left, pair_right, CAST(sum(freq) AS BIGINT) AS pair_count
    FROM p GROUP BY pair_left, pair_right
    ORDER BY pair_count DESC, pair_left, pair_right
    LIMIT {BPE_TOP_PAIRS}
    """,
)(bpe_merge_step)
