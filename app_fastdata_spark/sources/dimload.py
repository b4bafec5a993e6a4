"""S2/S3 — dimension bulk load and CSV range scan.

The reference's client bulk-loads two line files into replicated dims —
ids assigned by line number, plus a sentinel empty-url row for "no
referral" (client LogGenerator.java:98-124) — and parses `ips.csv`
(start,end,netmask dotted-quads) into int pairs for source-IP synthesis
(LogGenerator.java:82-96).

Spark-first: ``spark.read.text`` keeps line order per file split only,
so line-number ids use a zipWithIndex-free, shuffle-light
``row_number() over (order by file line offset)`` via the input file
metadata — at dim scale (≤100s of rows) this is a single-partition
window, which is exactly right for a replicated dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.ip import ip_to_int

IP_RANGES_SCHEMA = T.StructType(
    [
        T.StructField("start_ip", T.StringType(), False),
        T.StructField("end_ip", T.StringType(), False),
        T.StructField("netmask", T.IntegerType(), True),
    ]
)


def load_line_dim(
    spark: SparkSession,
    path: str,
    value_col: str,
    sentinel: str | None = None,
) -> DataFrame:
    """S2: line file → (id, value) dim, ids = 0-based line numbers
    (LogGenerator.java:113-124). With ``sentinel`` set, appends one extra
    row holding that value with id = line count — the reference's
    "no referral" empty-url row (LogGenerator.java:105-110).
    """
    lines = spark.read.text(path)
    # dims are replicated/small (49 urls, 75 agents): a single-partition
    # global window is the correct plan, not a distributed sort.
    w = Window.orderBy(F.monotonically_increasing_id())
    dim = lines.coalesce(1).select(
        (F.row_number().over(w) - 1).alias("id"),
        F.col("value").alias(value_col),
    )
    if sentinel is not None:
        n = dim.count()
        extra = spark.createDataFrame([(n, sentinel)], f"id int, {value_col} string")
        dim = dim.unionByName(extra.select(F.col("id").cast("int"), value_col))
    return dim.select(F.col("id").cast("int"), value_col)


def load_ip_ranges(spark: SparkSession, path: str) -> DataFrame:
    """S3: ips.csv (start,end,netmask dotted-quads) → int range pairs
    (LogGenerator.java:82-96), via the F6 ip→int column function — stays
    entirely in whole-stage codegen, no Python.
    """
    raw = spark.read.schema(IP_RANGES_SCHEMA).csv(path)
    return raw.select(
        ip_to_int(F.col("start_ip")).alias("start_int"),
        ip_to_int(F.col("end_ip")).alias("end_int"),
        "netmask",
    )
