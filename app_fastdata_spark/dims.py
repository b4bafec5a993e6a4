"""Replicated dimension tables as deterministic literals.

The reference keeps small dims (`dests`, `agents`, `clusters`) as
replicated tables joined on every ingest (db/ddl.sql:3-59,
client LogGenerator.java:98-124). Here they are fixed Python literals so
the Spark side and the DuckDB oracle SQL are generated from the SAME
source of truth (FIXTURES.md §3: dims are inlined, no files).

Spark-scale note: these are dim-sized (≤100 rows) and every join against
them goes through `F.broadcast` — no shuffle at any data scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --- dests dim (reference db/ddl.sql:45-51; event_type plays `url`) -------
# id assignment = alphabetical order of the 5 event types, sentinel row for
# "no referral" encoded as empty url with the max id (LogGenerator.java:105-110).
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
DESTS: list[tuple[int, str, str]] = [
    (i, et, f"http://example.com/{et}") for i, et in enumerate(EVENT_TYPES)
] + [(len(EVENT_TYPES), "", "")]  # sentinel: no-referral row

# --- agents dim (reference db/ddl.sql:53-59) ------------------------------
AGENTS: list[tuple[int, str]] = [(i, f"agent/{i}.0 (synthetic)") for i in range(75)]

# --- clusters model table (reference db/ddl.sql:3-11) ---------------------
# k=20 centers over the 2-d feature space (user_id mod 100, value) — the
# testdata stand-in for the reference's 4-d int centroids
# (KMeansReferral.scala:51-54). Grid: u in {5,15,..,95} × v in {120, 360}.
CLUSTERS: list[tuple[int, float, float]] = [
    (i, float(5 + 10 * (i % 10)), 120.0 if i < 10 else 360.0) for i in range(20)
]


# Arrow-backed literal frames (r13): createDataFrame over a plain list
# parallelizes PICKLED rows into defaultParallelism slices, so every
# consumption — including each broadcast build these dims exist for —
# round-trips a Python worker per slice (~32 near-idle tasks for a
# 6-row dim, stage-profiled). A pandas source goes through Arrow: the
# batches live in the JVM and reads never touch Python.
def _lit_df(spark: SparkSession, rows: list, cols: list, schema: str):
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(rows, columns=cols), schema)


def dests_df(spark: SparkSession) -> DataFrame:
    return _lit_df(
        spark, DESTS, ["id", "event_type", "url"],
        "id int, event_type string, url string",
    )


def agents_df(spark: SparkSession) -> DataFrame:
    return _lit_df(spark, AGENTS, ["id", "name"], "id int, name string")


def clusters_df(spark: SparkSession) -> DataFrame:
    return _lit_df(
        spark, CLUSTERS, ["id", "cu", "cv"], "id int, cu double, cv double"
    )


# --- DuckDB oracle fragments (same literals, rendered as VALUES CTEs) -----

def dests_values_sql(alias: str = "d") -> str:
    rows = ", ".join(f"({i}, '{et}', '{url}')" for i, et, url in DESTS)
    return f"(VALUES {rows}) AS {alias}(id, event_type, url)"


def clusters_values_sql(alias: str = "c") -> str:
    rows = ", ".join(f"({i}, {cu!r}, {cv!r})" for i, cu, cv in CLUSTERS)
    return f"(VALUES {rows}) AS {alias}(id, cu, cv)"
