"""End-to-end training-data curation pipeline (the composition showcase).

The realistic LLM-corpus pass over `documents`, as ONE declarative plan:

  1. quality gate      — length/token/type-token thresholds (doc_quality)
  2. exact dedup       — keep the min doc_id per normalized fingerprint
  3. near-dup removal  — SKEW-CAPPED 3-gram Jaccard >= 0.5 pairs; greedy
                         keep-lowest (every doc_b of a pair is dropped —
                         deterministic anti-join, no iterative components).
                         The capped source bounds stop-shingle buckets, so
                         the composition inherits the 100 TB skew guarantee
                         (the uncapped index was the one quadratic chain
                         still reachable from this query)
  4. survivor stats    — the curated corpus with its token counts

Fully oracle-checked: each stage reuses the SQL fragments of its
standalone operator, so the composition is verified end-to-end, not just
stage-by-stage.

Scale: stages 1-2 are a scan + one hash-agg; stage 3 reuses the
capped bucket pair generator (one shuffle on shingle hash, one on
pairs, bucket size bounded);
stage 4 is a broadcast-able anti-join (pair set ≪ corpus). Nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .dedup import CAPPED_JACCARD_SQL, dedup_ngram_jaccard_capped

PIPE_JACCARD = 0.5


def doc_pipeline_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    quality = docs.select("doc_id", "text", toks.alias("toks")).filter(
        (F.length("text") >= 100)
        & (F.size("toks") >= 20)
        & ((F.size(F.array_distinct("toks")) / F.size("toks")) >= 0.3)
    )
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    exact_kept = (
        quality.withColumn("fp", F.md5(norm))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    near_pairs = dedup_ngram_jaccard_capped(spark, sf_dir).filter(
        F.col("jaccard_lb") >= PIPE_JACCARD
    )
    dropped = near_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = exact_kept.join(dropped, "doc_id", "left_anti")
    return (
        survivors.join(docs, "doc_id")
        .select(
            "doc_id",
            F.length("text").alias("len_chars"),
            F.size(toks).alias("n_tokens"),
        )
    )


register(
    "doc_pipeline_survivors",
    sql=f"""
    WITH q AS (
      SELECT doc_id, text,
             string_split_regex(trim(lower(text), ' '), '\\s+') AS toks
      FROM documents
      WHERE length(text) >= 100
    ),
    quality AS (
      SELECT doc_id, text FROM q
      WHERE len(toks) >= 20
        AND len(list_distinct(toks)) * 1.0 / len(toks) >= 0.3
    ),
    exact_kept AS (
      SELECT min(doc_id) AS doc_id
      FROM (SELECT doc_id,
                   md5(regexp_replace(trim(lower(text), ' '), '\\s+', ' ', 'g')) AS fp
            FROM quality)
      GROUP BY fp
    ),
    capped AS MATERIALIZED ({CAPPED_JACCARD_SQL}),
    dropped AS (
      SELECT DISTINCT doc_b AS doc_id FROM capped
      WHERE jaccard_lb >= {PIPE_JACCARD}
    )
    SELECT d.doc_id, length(d.text) AS len_chars,
           len(string_split_regex(trim(lower(d.text), ' '), '\\s+')) AS n_tokens
    FROM exact_kept k
    JOIN documents d ON d.doc_id = k.doc_id
    WHERE k.doc_id NOT IN (SELECT doc_id FROM dropped)
    """,
)(doc_pipeline_survivors)
