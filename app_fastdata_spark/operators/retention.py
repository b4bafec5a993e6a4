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


# T5 — Nth-oldest timestamp (chunk boundary pick). NULL-ts rows have no
# age and are excluded on BOTH engines (Spark sorts NULLs FIRST, DuckDB
# LAST — either way the Nth element would shift; an age-based delete
# can't target them anyway).
def retention_nth_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return ev.select("ts").orderBy("ts").offset(NTH_OLDEST).limit(1)


register(
    "retention_nth_ts",
    sql=f"SELECT ts FROM events WHERE ts IS NOT NULL"
    f" ORDER BY ts OFFSET {NTH_OLDEST} LIMIT 1",
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


# --- size-based retention (DeleteOldestToTarget.java:47-116) --------------
#
# The reference's row-count-target mode: count the table; if over the
# target, pick the Nth-oldest timestamp (N = min(excess, chunk target),
# the chunk cap bounds per-transaction work) and delete everything at or
# below it. Ties may delete more than N — the boundary is a ts VALUE, and
# the value at sorted index N is deterministic even with duplicate
# timestamps, so both engines agree exactly.

MAX_TOTAL_ROWS = 600        # desired table size (maxTotalRows)
TARGET_MAX_DELETE = 250     # per-chunk delete cap (targetMaxRowsToDelete)


def retention_delete_oldest_to_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection semantics of the size-based nibble as one row:
    (cutoff_ts, n_deleted, n_remaining).

    Mirrors the reference procedure's shape: a scalar COUNT (one
    aggregate job — the same count the reference issues), then the
    Nth-oldest pick as TakeOrderedAndProject (bounded by the chunk cap,
    no global sort), then one pass counting the would-be-deleted rows
    against the broadcast 1-row cutoff."""
    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    if total < MAX_TOTAL_ROWS:
        return spark.createDataFrame(
            [(None, 0, total)],
            "cutoff_ts timestamp, n_deleted bigint, n_remaining bigint",
        )
    n_consider = min(total - MAX_TOTAL_ROWS, TARGET_MAX_DELETE)
    cutoff = (
        ev.select("ts").orderBy("ts").offset(n_consider).limit(1)
        .select(F.col("ts").alias("cutoff_ts"))
    )
    return (
        ev.crossJoin(F.broadcast(cutoff))
        .agg(
            F.first("cutoff_ts").alias("cutoff_ts"),
            F.sum(
                F.when(F.col("ts") <= F.col("cutoff_ts"), 1).otherwise(0)
            ).alias("n_deleted"),
        )
        .withColumn("n_remaining", F.lit(total) - F.col("n_deleted"))
    )


register(
    "retention_delete_oldest_to_target",
    sql=f"""
    WITH c AS (SELECT count(*) AS total FROM events),
    k AS (
      SELECT least(total - {MAX_TOTAL_ROWS}, {TARGET_MAX_DELETE}) AS n_consider,
             total
      FROM c WHERE total >= {MAX_TOTAL_ROWS}
    ),
    ranked AS (
      SELECT ts, row_number() OVER (ORDER BY ts) AS rn FROM events
    ),
    cutoff AS (
      SELECT r.ts AS cutoff_ts FROM ranked r JOIN k ON r.rn = k.n_consider + 1
    )
    SELECT cutoff.cutoff_ts AS cutoff_ts,
           CAST(count(*) FILTER (e.ts <= cutoff.cutoff_ts) AS BIGINT) AS n_deleted,
           CAST(count(*) FILTER (e.ts > cutoff.cutoff_ts) AS BIGINT) AS n_remaining
    FROM events e CROSS JOIN cutoff
    GROUP BY cutoff.cutoff_ts
    UNION ALL
    SELECT CAST(NULL AS TIMESTAMP), CAST(0 AS BIGINT), CAST(total AS BIGINT)
    FROM c WHERE total < {MAX_TOTAL_ROWS}
    """,
)(retention_delete_oldest_to_target)


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


def drop_oldest_partitions_to_target(
    spark: SparkSession, path: str, max_total_rows: int
) -> int:
    """Size-based retention at the storage level (the partition-drop twin
    of DeleteOldestToTarget.java:47-116): drop whole OLDEST day-partitions
    while the remaining row count exceeds `max_total_rows`. Whole-
    partition drops never split a day, so like the reference ("a target,
    not always a perfect max" — ties there, day granularity here) this
    may delete past the target; it is guaranteed to make progress. Row
    counts come from one footer-stats count job (count(*) by partition —
    Spark's scan reads row-group metadata, not column data, but it IS a
    distributed job, bounded by the day count collected to the driver).
    Returns partitions dropped."""
    import shutil
    from pathlib import Path

    sizes = {
        r["day"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(sizes.values())
    dropped = 0
    for day in sorted(sizes):
        if total <= max_total_rows:
            break
        shutil.rmtree(Path(path) / f"day={day}")
        total -= sizes[day]
        dropped += 1
    return dropped
