"""Sessionization / session-start export (ST2/J5).

Reference semantics (NewEvent.java:40-42, 70-75 + db/ddl.sql:103-112): an
event is exported iff no prior event shares its (src, dest) within the
inactivity gap of the event's own timestamp — i.e. exported rows are
session *starts* under a gap rule.

Batch form: `lag(ts) OVER (PARTITION BY src, dest ORDER BY ts)`; export
where the gap is null or exceeds the threshold (SURVEY.md §2.9 ST2). The
streaming form uses `session_window` — see app_fastdata_spark.streaming;
batch/streaming parity is asserted in tests.

Scale notes: one shuffle on (src,dest) — the reference's own partition
key — then a within-partition sort; no Python, no state on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..params import SESSION_GAP_SECONDS
from ..registry import register
from ..tables import load_table


def session_starts_df(ev: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    # Gap math in integer microseconds (unix_micros / epoch_us) so Spark and
    # the DuckDB oracle agree exactly at the boundary — `unix_timestamp`
    # truncates subseconds while DuckDB's epoch() keeps them.
    w = Window.partitionBy("user_id", "event_type").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn("prev_gap", gap)
        .filter(F.col("prev_gap").isNull() | (F.col("prev_gap") > gap_seconds * 1_000_000))
        .drop("prev_gap")
    )


# events_export contents (db/ddl.sql:78-89): session-start events, all
# event columns minus `cluster` (FIXTURES.md §1).
def session_starts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_starts_df(ev).select(
        "event_id",
        F.col("user_id").alias("src"),
        F.col("event_type").alias("dest"),
        "ts",
        "value",
    )


register(
    "session_starts",
    sql=f"""
    WITH g AS (
      SELECT event_id, user_id AS src, event_type AS dest, ts, value,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts)) AS prev_gap
      FROM events
    )
    SELECT event_id, src, dest, ts, value
    FROM g WHERE prev_gap IS NULL OR prev_gap > {SESSION_GAP_SECONDS} * 1000000
    """,
)(session_starts)


# Session count per (src, dest): how many gap-rule sessions each pair had.
def session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        session_starts_df(ev)
        .groupBy(F.col("user_id").alias("src"), F.col("event_type").alias("dest"))
        .agg(F.count("*").alias("n_sessions"))
    )


register(
    "session_counts",
    sql=f"""
    WITH g AS (
      SELECT user_id, event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts)) AS prev_gap
      FROM events
    )
    SELECT user_id AS src, event_type AS dest, count(*) AS n_sessions
    FROM g WHERE prev_gap IS NULL OR prev_gap > {SESSION_GAP_SECONDS} * 1000000
    GROUP BY 1, 2
    """,
)(session_counts)
