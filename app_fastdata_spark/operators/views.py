"""The reference's 6 incrementally-maintained materialized views (A1-A6,
db/ddl.sql:92-143) as batch aggregations.

In the streaming layer the same expressions run as Structured Streaming
aggregations (update mode, state keyed by the GROUP BY columns) — see
``app_fastdata_spark.streaming``. Batch and streaming share these
builders so parity is by construction.

Scale notes: every view is a single hash-aggregate with map-side partial
aggregation (Spark's partial→final HashAggregate pair); grouping keys are
the reference's partition key (`src`→user_id) so the shuffle is the
minimal one. No Python in the hot path — all whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# A1 — events_by_src_view (db/ddl.sql:92-95): count by src over the stream.
def events_by_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events(spark, sf_dir)
        .groupBy(F.col("user_id").alias("src"))
        .agg(F.count("*").alias("total_visits"))
    )


register(
    "events_by_src",
    sql="""
    SELECT user_id AS src, count(*) AS total_visits
    FROM events GROUP BY user_id
    """,
)(events_by_src)


# A2 — events_by_src_dest_view (db/ddl.sql:97-101): count by (src, dest).
def events_by_src_dest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events(spark, sf_dir)
        .groupBy(F.col("user_id").alias("src"), F.col("event_type").alias("dest"))
        .agg(F.count("*").alias("counts"))
    )


register(
    "events_by_src_dest",
    sql="""
    SELECT user_id AS src, event_type AS dest, count(*) AS counts
    FROM events GROUP BY user_id, event_type
    """,
)(events_by_src_dest)


# A3 — events_sessions (db/ddl.sql:103-112): count + MAX(ts) by (src, dest);
# the session-recency tracker the ingest path probes (NewEvent.java:40-42).
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events(spark, sf_dir)
        .groupBy(F.col("user_id").alias("src"), F.col("event_type").alias("dest"))
        .agg(F.count("*").alias("counts"), F.max("ts").alias("last_ts"))
    )


register(
    "events_sessions",
    sql="""
    SELECT user_id AS src, event_type AS dest,
           count(*) AS counts, max(ts) AS last_ts
    FROM events GROUP BY user_id, event_type
    """,
)(events_sessions)


# A4 — events_by_second (db/ddl.sql:114-122): tumbling 1-s window count by src.
# TRUNCATE(SECOND, ts) ≡ date_trunc('second', ts) (F1). `ev` lets serving
# queries pass a scan-pruned events frame (recency pushdown).
def events_by_second(
    spark: SparkSession, sf_dir: str, ev: DataFrame | None = None
) -> DataFrame:
    return (
        (ev if ev is not None else events(spark, sf_dir))
        .groupBy(
            F.date_trunc("second", "ts").alias("second_ts"),
            F.col("user_id").alias("src"),
        )
        .agg(F.count("*").alias("count_values"))
    )


register(
    "events_by_second",
    sql="""
    SELECT date_trunc('second', ts) AS second_ts, user_id AS src,
           count(*) AS count_values
    FROM events GROUP BY 1, 2
    """,
)(events_by_second)


# A5 — dests_by_second (db/ddl.sql:124-132): same shape keyed by dest.
def dests_by_second(
    spark: SparkSession, sf_dir: str, ev: DataFrame | None = None
) -> DataFrame:
    return (
        (ev if ev is not None else events(spark, sf_dir))
        .groupBy(
            F.date_trunc("second", "ts").alias("second_ts"),
            F.col("event_type").alias("dest"),
        )
        .agg(F.count("*").alias("count_values"))
    )


register(
    "dests_by_second",
    sql="""
    SELECT date_trunc('second', ts) AS second_ts, event_type AS dest,
           count(*) AS count_values
    FROM events GROUP BY 1, 2
    """,
)(dests_by_second)
