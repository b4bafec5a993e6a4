"""Views over the export stream (A1/A2 proper).

In the reference, `events_by_src_view` and `events_by_src_dest_view` are
defined ON `events_export` (db/ddl.sql:92-101) — they count *exported*
events, i.e. the session-start subset (NewEvent.java:70-75), not the full
events table. These queries compose the ST2 gap rule with the running
counts, completing the §2 A1/A2 rows exactly; views.py keeps the
table-side equivalents used by the serving reads.

Scale: one lag-window shuffle on (src, dest) — the partition key — then a
map-side-combined re-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..params import SESSION_GAP_SECONDS
from ..registry import register
from ..tables import load_table
from .sessions import session_starts_df

_EXPORT_CTE = f"""
    WITH g AS (
      SELECT user_id, event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts)) AS prev_gap
      FROM events
      WHERE ts IS NOT NULL
    ),
    exported AS (
      SELECT user_id, event_type FROM g
      WHERE prev_gap IS NULL OR prev_gap > {SESSION_GAP_SECONDS} * 1000000
    )
"""


# A1 — events_by_src_view on the export stream (db/ddl.sql:92-95).
def export_by_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        session_starts_df(ev)
        .groupBy(F.col("user_id").alias("src"))
        .agg(F.count("*").alias("total_visits"))
    )


register(
    "export_by_src",
    sql=_EXPORT_CTE
    + """
    SELECT user_id AS src, count(*) AS total_visits
    FROM exported GROUP BY user_id
    """,
)(export_by_src)


# A2 — events_by_src_dest_view on the export stream (db/ddl.sql:97-101).
def export_by_src_dest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        session_starts_df(ev)
        .groupBy(F.col("user_id").alias("src"), F.col("event_type").alias("dest"))
        .agg(F.count("*").alias("counts"))
    )


register(
    "export_by_src_dest",
    sql=_EXPORT_CTE
    + """
    SELECT user_id AS src, event_type AS dest, count(*) AS counts
    FROM exported GROUP BY user_id, event_type
    """,
)(export_by_src_dest)


# GetTopSources as the reference defines it — top-k over the EXPORT-side
# A1 view (GetTopSources.java:24-33), tiebreak added for determinism.
def top_sources_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        export_by_src(spark, sf_dir)
        .select(F.col("src").alias("sources"), F.col("total_visits").alias("counts"))
        .orderBy(F.desc("counts"), F.asc("sources"))
        .limit(10)
    )


register(
    "top_sources_export",
    sql=_EXPORT_CTE
    + """
    SELECT user_id AS sources, count(*) AS counts
    FROM exported GROUP BY user_id
    ORDER BY counts DESC, sources LIMIT 10
    """,
)(top_sources_export)
