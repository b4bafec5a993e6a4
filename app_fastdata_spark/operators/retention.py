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


# --- storage-level retention (the nibbler rebuilt, SURVEY.md §3.4) --------
#
# VoltDB needed chunked DELETE transactions (DeleteAfterDate.java:65-95)
# because the hot store was row-mutable. Spark-side, the hot store is a
# time-partitioned parquet layout and retention is O(partitions): drop the
# directories entirely older than the cutoff — no row rewrite, no chunking,
# no Nth-ts probe. At 100 TB this is a metadata operation.

def write_time_partitioned(ev: DataFrame, path: str) -> None:
    """Lay out events partitioned by day (the partition-by-time storage
    from SURVEY.md §2.9 ST5)."""
    (
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(path)
    )


def drop_expired_partitions(spark: SparkSession, path: str, cutoff_day: str) -> int:
    """Age-based retention: remove day-partitions strictly older than
    `cutoff_day`. Whole-partition drops only — rows inside the cutoff day
    survive (the reference's ranged delete has the same ts <= ? boundary
    semantics at second granularity, DeleteAfterDate.java:53-54).
    Returns the number of partitions dropped."""
    import shutil
    from pathlib import Path

    dropped = 0
    for p in sorted(Path(path).glob("day=*")):
        if p.name.split("=", 1)[1] < cutoff_day:
            shutil.rmtree(p)
            dropped += 1
    return dropped
