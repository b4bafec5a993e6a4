"""Distinct-count and exact-percentile analytics.

The reference uses only COUNT/SUM/MAX (SURVEY.md §2.4 note: "No DISTINCT
... or approximate aggregates appear"); a complete engine needs the
distinct-aggregation and order-statistics classes too, so they are added
here as first-class oracle-checked operators over the driver's generic
tables.

Scale notes:
- Multi-distinct aggregation plans through Spark's Expand operator (one
  row replicated per distinct column set) + two-tier hash agg — the
  standard distributed distinct shape; no driver-side collection.
- Exact percentiles use the built-in `percentile` aggregate (JVM-side
  QuantileSummaries-style accumulation, linear interpolation — same
  continuous-quantile semantics as DuckDB's quantile_cont). At 100 TB
  prefer `approx_percentile` for the hot path; the exact form is kept
  because it is oracle-comparable, and the swap is a one-word change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


# Distinct-user / active-day rollup per event type. Two DISTINCT aggregates
# with different keys in one GROUP BY — the Expand-based multi-distinct plan.
def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(F.to_date("ts")).alias("n_active_days"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


register(
    "events_distinct_users",
    sql="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT CAST(ts AS DATE)) AS n_active_days,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)(events_distinct_users)


# Exact length percentiles per language — order statistics over the corpus
# (the quality-gate thresholds in doc_quality come from exactly this query).
def doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50_chars"),
            F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90_chars"),
            F.round(F.expr("percentile(n_chars, 0.99)"), 4).alias("p99_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


register(
    "doc_length_percentiles",
    sql="""
    SELECT lang,
           count(*) AS n_docs,
           min(n_chars) AS min_chars,
           round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
           round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
           round(quantile_cont(n_chars, 0.99), 4) AS p99_chars,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)(doc_length_percentiles)
