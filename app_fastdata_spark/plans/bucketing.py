"""Bucketed (pre-partitioned) storage for shuffle-free co-located joins.

The reference co-locates everything about one `src` on one VoltDB
partition (PARTITION TABLE events ON COLUMN src, db/ddl.sql:73) so
per-src work never crosses nodes. Spark's durable equivalent is a
BUCKETED table: `bucketBy(n, key)` fixes the hash partitioning in the
file layout, so every later join/aggregation on the key reads
pre-shuffled data — the exchange disappears from the plan.

At 100 TB this is the difference between shuffling the fact table on
every join vs once at write time. Bucket count should be sized to the
cluster (buckets ≈ target parallelism; each bucket ≲ a few hundred MB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, num_buckets: int = 8
) -> None:
    """Persist df as a parquet-backed bucketed table (catalog-managed —
    bucketing metadata lives in the session catalog)."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def colocated_join(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Spark plans a SortMergeJoin with NO Exchange on either
    side (verified in tests)."""
    return spark.table(left).join(spark.table(right), key)
