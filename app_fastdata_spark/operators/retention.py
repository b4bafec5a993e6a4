"""Retention semantics (ST5: nibbler loop, SURVEY.md §3.4) as pure
transformations.

The reference's chunked delete picks the Nth-oldest timestamp via
OFFSET/LIMIT (T5, DeleteAfterDate.java:50-51) then range-deletes
`ts <= ?` (P5). In Spark retention is storage-level (drop time
partitions / DELETE WHERE on a table format) — these queries verify the
*selection* semantics the delete relies on.

Scale note: ORDER BY + OFFSET n + LIMIT 1 for small n compiles to a
TakeOrderedAndProject (top-(n+1) per partition, merge on driver) — no
global sort even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..params import NTH_OLDEST, RETENTION_CUTOFF
from ..registry import register
from ..tables import load_table


# T5 — Nth-oldest timestamp (chunk boundary pick).
def retention_nth_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("ts").orderBy("ts").offset(NTH_OLDEST).limit(1)


register(
    "retention_nth_ts",
    sql=f"SELECT ts FROM events ORDER BY ts OFFSET {NTH_OLDEST} LIMIT 1",
)(retention_nth_ts)


# P5 + A10 — candidate count for a ranged delete (DeleteAfterDate.java:47-48).
def retention_expired_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") <= F.lit(RETENTION_CUTOFF).cast("timestamp"))
        .agg(F.count("*").alias("expired"))
    )


register(
    "retention_expired_count",
    sql=f"""
    SELECT count(*) AS expired FROM events
    WHERE ts <= TIMESTAMP '{RETENTION_CUTOFF}'
    """,
)(retention_expired_count)


# The surviving hot set after an age-based delete: per-src counts of rows
# newer than the cutoff (what the A1 view would hold post-nibble).
def retention_survivors_by_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") > F.lit(RETENTION_CUTOFF).cast("timestamp"))
        .groupBy(F.col("user_id").alias("src"))
        .agg(F.count("*").alias("n_live"))
    )


register(
    "retention_survivors_by_src",
    sql=f"""
    SELECT user_id AS src, count(*) AS n_live FROM events
    WHERE ts > TIMESTAMP '{RETENTION_CUTOFF}'
    GROUP BY user_id
    """,
)(retention_survivors_by_src)
