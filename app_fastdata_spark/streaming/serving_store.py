"""Ever-green pre-aggregate serving store (ST4, SURVEY.md §4 "serving
reads cost O(window), not O(events)").

The reference's dashboards never scan base `events` — they read
incrementally-maintained views (demo.js:3-34). Here the A4 per-second
aggregate streams into a day-partitioned parquet store via a foreachBatch
upsert (read-merge-write of ONLY the partitions a micro-batch touches —
parquet's version of a Delta MERGE), and serving queries read the store.

Scale notes: update-mode emits only changed (second, src) groups per
micro-batch; the upsert rewrites only the day partitions containing those
groups (O(recent partitions), not O(history)). Retention = dropping old
day directories (operators/retention.drop_expired_partitions). A serving
read is a partition-pruned scan of pre-aggregates + a tiny re-agg —
O(window), independent of total event history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import RETENTION, per_second_counts


def start_per_second_store(
    events: DataFrame, store_path: str, retention: str = RETENTION
):
    """Maintain the A4 view in a day-partitioned parquet store. Update-mode
    groups upsert by (second_ts, src): existing rows for other keys in the
    touched partitions are kept, updated keys are replaced — idempotent
    under micro-batch replay (last write wins with the same values)."""
    agg = per_second_counts(events, retention)

    def upsert(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        updates = batch.withColumn(
            "day", F.date_format("second_ts", "yyyy-MM-dd")
        )
        days = [r.day for r in updates.select("day").distinct().collect()]
        try:
            existing = (
                spark.read.parquet(store_path)
                .filter(F.col("day").isin(days))
                .select("second_ts", "src", "count_values", "day")
            )
            keep = existing.join(
                updates.select("second_ts", "src"), ["second_ts", "src"], "left_anti"
            )
            merged = keep.unionByName(updates)
        except Exception:  # first batch: store does not exist yet
            merged = updates
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.mode("overwrite").partitionBy("day").parquet(store_path)

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )


def top_users_from_store(
    spark: SparkSession, store_path: str, as_of: str, window: int, k: int = 10
) -> DataFrame:
    """GetTopUsers served from the store: day-partition pruning + recency
    filter on the pre-aggregates + re-agg + top-k — never touches raw
    events."""
    cutoff = F.timestamp_seconds(
        F.unix_timestamp(F.lit(as_of).cast("timestamp")) - F.lit(window)
    )
    return (
        spark.read.parquet(store_path)
        .filter(F.col("second_ts") >= cutoff)
        .groupBy("src")
        .agg(F.sum("count_values").alias("counts"))
        .orderBy(F.desc("counts"), F.asc("src"))
        .limit(k)
    )


def compact_store_partition(
    spark: SparkSession, store_path: str, day: str, target_files: int = 1
) -> int:
    """Small-file compaction for one day partition — micro-batch upserts
    accumulate a file per batch; periodic compaction rewrites the
    partition to `target_files` files with identical contents. Returns
    the number of files before compaction.

    Scale: compaction is per-partition (parallel across days, touches
    only closed/old partitions), and the rewrite is an atomic
    dynamic-partition overwrite — readers never see a partial state."""
    import glob as _glob

    part_dir = f"{store_path}/day={day}"
    before = len(_glob.glob(f"{part_dir}/*.parquet"))
    if before <= target_files:
        return before
    rows = (
        spark.read.parquet(store_path)
        .filter(F.col("day") == day)
        .select("second_ts", "src", "count_values", "day")
        .coalesce(target_files)
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    rows.write.mode("overwrite").partitionBy("day").parquet(store_path)
    return before
