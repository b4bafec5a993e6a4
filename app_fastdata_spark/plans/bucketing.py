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

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


def write_bucketed(
    df: DataFrame, table: str, key: str, num_buckets: int = 8
) -> None:
    """Persist df as a parquet-backed bucketed table (catalog-managed —
    bucketing metadata lives in the session catalog).

    A managed location left behind by an earlier session (warehouse dir
    outlives the catalog) blocks saveAsTable with
    LOCATION_ALREADY_EXISTS, so stale state is cleared first. The rmtree
    is guarded: the resolved location must live strictly inside the
    warehouse root. NOT safe under concurrent sessions sharing one
    warehouse dir (the DROP + rmtree + write sequence races); give each
    session its own spark.sql.warehouse.dir for parallel runs.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    loc = os.path.join(warehouse, table.lower()) if warehouse else ""
    if loc and os.path.isdir(loc):
        root = os.path.realpath(warehouse)
        resolved = os.path.realpath(loc)
        if resolved.startswith(root + os.sep) and resolved != root:
            shutil.rmtree(resolved)
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


def colocated_fact_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write-once/join-shuffle-free pattern as a live join: events
    fact and a per-user dim both bucketed on user_id, joined with zero
    exchange on either side (plan-gated in tests/test_scale_plans.py).
    Bucketing is this engine's durable stand-in for the reference's
    PARTITION TABLE … ON COLUMN src co-location (db/ddl.sql:73)."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    fact_tbl, dim_tbl = f"ev_fact_{tag}", f"user_dim_{tag}"
    ev = load_table(spark, sf_dir, "events")
    write_bucketed(ev.select("event_id", "user_id", "value"), fact_tbl, "user_id")
    dim = ev.groupBy("user_id").agg(F.min("event_type").alias("fav_type"))
    write_bucketed(dim, dim_tbl, "user_id")
    return colocated_join(spark, fact_tbl, dim_tbl, "user_id")


def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface: the co-located fact⋈dim rolled up by the dim
    attribute. Only the dim-sized final rollup shuffles; the fact table
    was shuffled once, at write time, for every future join on its key."""
    return (
        colocated_fact_dim(spark, sf_dir)
        .groupBy("fav_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("fav_type")
    )


register(
    "bucketed_colocated_join",
    sql="""
    WITH dim AS (
      SELECT user_id, min(event_type) AS fav_type FROM events GROUP BY user_id
    )
    SELECT d.fav_type,
           count(*) AS n_events,
           round(sum(e.value), 4) AS sum_value
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY d.fav_type
    ORDER BY d.fav_type
    """,
)(bucketed_colocated_join)
