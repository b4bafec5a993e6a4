"""int32 ↔ IPv4 dotted-quad conversion (F6).

The reference models source IPs as int32 with Java/JS helpers
(db/procedures/events/Utils.java:25-42, web/js/demo.js:121-123). Here
they are pure column expressions — JVM-side, codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


def int_to_ip(col: Column) -> Column:
    """uint32 → 'a.b.c.d' (Utils.java:25-33 semantics, unsigned).

    NULL in → NULL out: concat_ws SKIPS null args (a NULL int would
    otherwise format as '' — and '' later feeds an ANSI cast in
    ip_to_int, which throws), so the NULL case is made explicit to
    match SQL || concatenation semantics."""
    return F.when(
        col.isNotNull(),
        F.concat_ws(
            ".",
            (F.shiftrightunsigned(col, 24) % 256).cast("string"),
            (F.shiftrightunsigned(col, 16) % 256).cast("string"),
            (F.shiftrightunsigned(col, 8) % 256).cast("string"),
            (col % 256).cast("string"),
        ),
    )


def ip_to_int(col: Column) -> Column:
    """'a.b.c.d' → uint32 as bigint (Utils.java:35-42 semantics)."""
    parts = F.split(col, r"\.")
    return (
        parts.getItem(0).cast("long") * 16777216
        + parts.getItem(1).cast("long") * 65536
        + parts.getItem(2).cast("long") * 256
        + parts.getItem(3).cast("long")
    )


# Round-trip query: synthesize a uint32 "src ip" from user_id (Knuth hash,
# fits bigint), format it, parse it back — oracle checks both directions.
def ip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ip_int = (F.col("user_id") * 2654435761) % F.lit(4294967296).cast("long")
    df = ev.select("event_id", ip_int.alias("ip_int"))
    df = df.withColumn("ip_str", int_to_ip(F.col("ip_int")))
    return df.withColumn("ip_back", ip_to_int(F.col("ip_str")))


register(
    "ip_roundtrip",
    sql="""
    WITH base AS (
      SELECT event_id, (user_id * 2654435761) % 4294967296 AS ip_int
      FROM events
    ),
    fmt AS (
      SELECT event_id, ip_int,
             CAST((ip_int // 16777216) % 256 AS VARCHAR) || '.' ||
             CAST((ip_int // 65536) % 256 AS VARCHAR) || '.' ||
             CAST((ip_int // 256) % 256 AS VARCHAR) || '.' ||
             CAST(ip_int % 256 AS VARCHAR) AS ip_str
      FROM base
    )
    SELECT event_id, ip_int, ip_str,
           CAST(string_split(ip_str, '.')[1] AS BIGINT) * 16777216
         + CAST(string_split(ip_str, '.')[2] AS BIGINT) * 65536
         + CAST(string_split(ip_str, '.')[3] AS BIGINT) * 256
         + CAST(string_split(ip_str, '.')[4] AS BIGINT) AS ip_back
    FROM fmt
    """,
)(ip_roundtrip)
