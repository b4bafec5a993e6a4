"""Table loading with explicit schemas (never inferred — SURVEY.md §1.3).

The driver testdata is a TPC-H-ish star schema plus a generic ``events``
stream table, ``documents`` and ``embeddings`` (TESTDATA.md). Reference
columns map onto ``events`` per FIXTURES.md §3:
src→user_id, dest→event_type, ts→ts, size→value.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Explicit schemas (mirrors the reference's compiled-DDL catalog discipline,
# db/ddl.sql:62-73 via run.sh:102-107 — schemas are declared, not inferred).
SCHEMAS: dict[str, T.StructType] = {
    # ts is physically TIMESTAMP(NANOS) — no Spark type for that, so it is
    # read as long (nanosAsLong) and converted to a µs timestamp in
    # load_table. The testdata carries µs-precision values, so the
    # ns→µs integer division is lossless.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.LongType(), False),
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), False),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver supplies its own SparkSession; timestamp semantics (naive
    # parquet values vs the DuckDB oracle) are only correct under UTC, so
    # RE-pin on every load (idempotent — conf.set to the current value is
    # a no-op): a harness that flips the session tz between query builds
    # would otherwise shift string→timestamp literal casts (e.g. TPC-H
    # date filters) relative to the oracle. Instant-based predicates
    # (recency, ts_ns prunes) are additionally tz-independent by
    # construction.
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    if name in SCHEMAS:
        df = spark.read.schema(SCHEMAS[name]).parquet(path)
        if name == "events":
            from pyspark.sql import functions as F

            # Keep the raw nanos value as ts_ns: predicates on the
            # converted timestamp can't reach the parquet reader (the
            # ns→µs conversion wraps the column), but a plain long
            # comparison on ts_ns pushes down to row-group pruning —
            # recency filters use it (serving.events_in_window).
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
