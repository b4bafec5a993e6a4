"""U5 — system-procedure parity (SURVEY.md §2.10).

The reference exposes engine introspection through system procedures:
`@Statistics TABLE/PROCEDUREPROFILE` (PartitionDataTracker.java:70-71,
web dashboards), `@GetPartitionKeys` (partition routing for the
nibbler), `@SystemCatalog` (schema listing, voltdb.js:271-277),
`@AdHoc` (raw SQL, voltdb.js:244-245) and `@ExplainProc` (plan dump).

Spark equivalents, in order: per-table stats from the DataFrame itself,
partition layout from the scan, `spark.catalog`, `spark.sql`, and
Catalyst's explain output. Streaming metrics (`@Statistics
PROCEDUREPROFILE`'s throughput role) come from StreamingQuery
`lastProgress` — surfaced by streaming_progress().
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .catalog import queries
from .tables import TABLE_NAMES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so @AdHoc-style SQL
    (adhoc()) can reference them by name — the catalog the reference
    compiles from DDL (run.sh:102-107), recreated per session."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def adhoc(spark: SparkSession, sql: str) -> DataFrame:
    """@AdHoc (voltdb.js:244-245): raw SQL against the registered views."""
    return spark.sql(sql)


def table_statistics(spark: SparkSession, sf_dir: str) -> list[dict[str, Any]]:
    """@Statistics TABLE (PartitionDataTracker.java:64-127): per-table
    tuple counts and partition layout."""
    out = []
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        out.append(
            {
                "table": name,
                "tuple_count": df.count(),
                "partitions": df.rdd.getNumPartitions(),
                "columns": len(df.columns),
            }
        )
    return out


def partition_keys(spark: SparkSession, sf_dir: str, name: str = "events") -> dict:
    """@GetPartitionKeys: the engine's routing info. Spark's equivalent is
    the scan's split count (hash routing is implicit in every shuffle)."""
    df = load_table(spark, sf_dir, name)
    return {"table": name, "num_partitions": df.rdd.getNumPartitions()}


def system_catalog(spark: SparkSession) -> list[dict[str, str]]:
    """@SystemCatalog TABLES (voltdb.js:271-277) via spark.catalog."""
    return [
        {"name": t.name, "type": t.tableType, "isTemporary": str(t.isTemporary)}
        for t in spark.catalog.listTables()
    ]


def explain_query(spark: SparkSession, sf_dir: str, name: str) -> str:
    """@ExplainProc (voltdb.js:316): the compiled plan of a registered
    query, formatted — what `statement-plans/` held in the reference."""
    df = queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def streaming_progress(query) -> dict[str, Any]:
    """@Statistics PROCEDUREPROFILE's throughput role for streams: the
    latest micro-batch metrics (rows/s, batch duration, state rows)."""
    # the final AvailableNow micro-batch is often empty — report the last
    # batch that actually processed rows.
    progresses = [p for p in query.recentProgress if p.get("numInputRows")]
    p = progresses[-1] if progresses else query.lastProgress
    if p is None:
        return {}
    return {
        "inputRowsPerSecond": p.get("inputRowsPerSecond"),
        "processedRowsPerSecond": p.get("processedRowsPerSecond"),
        "numInputRows": p.get("numInputRows"),
        "batchDuration": p.get("batchDuration"),
        "stateRows": sum(
            op.get("numRowsTotal", 0) for op in p.get("stateOperators", [])
        ),
    }
