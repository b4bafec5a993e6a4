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
from ..cache import memoized_build
from ..registry import register
from ..tables import load_table


def session_starts_df(ev: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    # Gap math in integer microseconds (unix_micros / epoch_us) so Spark and
    # the DuckDB oracle agree exactly at the boundary — `unix_timestamp`
    # truncates subseconds while DuckDB's epoch() keeps them.
    # NULL-ts events cannot be sessionized (no position under the gap
    # rule) and are excluded on BOTH engines — window ORDER BY ts places
    # NULLs differently (Spark FIRST, DuckDB LAST), so an unfiltered
    # NULL row silently shifts its neighbors' gaps on one engine.
    ev = ev.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn("prev_gap", gap)
        .filter(F.col("prev_gap").isNull() | (F.col("prev_gap") > gap_seconds * 1_000_000))
        .drop("prev_gap")
    )


# events_export contents (db/ddl.sql:78-89): session-start events, all
# event columns minus `cluster` (FIXTURES.md §1).
@memoized_build("events")
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
      FROM events WHERE ts IS NOT NULL
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


# Full session aggregate (batch twin of streaming session_window, ST2):
# cumulative-sum session ids → per-session start + event count. This is
# what the streaming layer's session_start_stream must reproduce.
def session_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same NULL-ts exclusion as session_starts_df (and the stateful twin)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_start = (
        F.when(gap.isNull() | (gap > SESSION_GAP_SECONDS * 1_000_000), 1).otherwise(0)
    )
    sess = ev.withColumn(
        "sess_id",
        F.sum(is_start).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy(
            F.col("user_id").alias("src"), F.col("event_type").alias("dest"), "sess_id"
        )
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_events"))
        .drop("sess_id")
        .select("src", "dest", "session_start", "n_events")
    )


SESSION_AGGREGATE_SQL = f"""
    WITH g AS (
      SELECT user_id, event_type, ts,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id, event_type ORDER BY ts))
                  > {SESSION_GAP_SECONDS} * 1000000
                  OR lag(ts) OVER (
                    PARTITION BY user_id, event_type ORDER BY ts) IS NULL
             THEN 1 ELSE 0 END AS is_start
      FROM events WHERE ts IS NOT NULL
    ),
    s AS (
      SELECT user_id, event_type, ts,
             sum(is_start) OVER (PARTITION BY user_id, event_type ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM g
    )
    SELECT user_id AS src, event_type AS dest,
           min(ts) AS session_start, count(*) AS n_events
    FROM s GROUP BY user_id, event_type, sess_id
    """

register("session_aggregate", sql=SESSION_AGGREGATE_SQL)(session_aggregate)


register(
    "session_counts",
    sql=f"""
    WITH g AS (
      SELECT user_id, event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts)) AS prev_gap
      FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id AS src, event_type AS dest, count(*) AS n_sessions
    FROM g WHERE prev_gap IS NULL OR prev_gap > {SESSION_GAP_SECONDS} * 1000000
    GROUP BY 1, 2
    """,
)(session_counts)
