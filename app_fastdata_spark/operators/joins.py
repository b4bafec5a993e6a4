"""As-of and range (interval) joins — join classes the reference never
uses (SURVEY.md §2.3 "Absent join classes" note) but that a complete
analytics engine must offer; both are built from shuffle-friendly
primitives rather than inequality nested loops.

Scale notes:
- The as-of join is ONE shuffle on the partition key + an in-partition
  ordered window — the standard distributed as-of shape (no per-row probe
  of a sorted build side, no nested loop). State per key is O(1).
- The range join quantizes the value domain into fixed-width buckets,
  explodes each interval to the buckets it covers (bounded fan-out =
  interval_width / bucket_width), equi-joins on the bucket key, then
  refines with the exact BETWEEN predicate. At 100 TB this is a hash
  join on a well-distributed synthetic key; the naive formulation Spark
  would otherwise pick is a BroadcastNestedLoopJoin whose probe cost is
  rows × intervals (a plan test pins the good shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


# --- as-of join -----------------------------------------------------------

def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the most recent purchase (ts' <= ts) by the same
    user, plus the running purchase count. Both sides come from the same
    stream, so the tagged-union degenerates to a conditional column; the
    default RANGE window frame includes ts-peers, matching the oracle's
    `p.ts <= e.ts` exactly even on timestamp ties."""
    ev = load_table(spark, sf_dir, "events")
    p_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.max(p_ts).over(w).alias("last_purchase_ts"),
        F.count(p_ts).over(w).alias("purchases_so_far"),
    )


register(
    "asof_last_purchase",
    sql="""
    SELECT event_id, user_id, event_type,
           max(CASE WHEN event_type = 'purchase' THEN ts END)
             OVER (PARTITION BY user_id ORDER BY ts) AS last_purchase_ts,
           count(CASE WHEN event_type = 'purchase' THEN ts END)
             OVER (PARTITION BY user_id ORDER BY ts) AS purchases_so_far
    FROM events
    """,
)(asof_last_purchase)


# --- range (interval) join ------------------------------------------------

# Uneven price bands: (band_id, lo, hi) half-open [lo, hi).
PRICE_BANDS = [
    (0, 0.0, 5000.0),
    (1, 5000.0, 20000.0),
    (2, 20000.0, 50000.0),
    (3, 50000.0, 110000.0),
]
BUCKET_W = 5000.0


def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem ⋈ price-band intervals via bucket quantization + equi-join
    + exact refine; per-band count and total price."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    band_rows = [
        (band_id, lo, hi, list(range(int(lo // BUCKET_W), int((hi - 1e-9) // BUCKET_W) + 1)))
        for band_id, lo, hi in PRICE_BANDS
    ]
    bands = spark.createDataFrame(
        band_rows, "band_id int, lo double, hi double, buckets array<int>"
    ).select("band_id", "lo", "hi", F.explode("buckets").alias("bucket"))
    probe = li.withColumn(
        "bucket", F.floor(F.col("l_extendedprice") / F.lit(BUCKET_W)).cast("int")
    )
    return (
        probe.join(F.broadcast(bands), "bucket")
        .filter(
            (F.col("l_extendedprice") >= F.col("lo"))
            & (F.col("l_extendedprice") < F.col("hi"))
        )
        .groupBy("band_id", "lo", "hi")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("band_id")
    )


_BANDS_VALUES = ", ".join(f"({b}, {lo!r}, {hi!r})" for b, lo, hi in PRICE_BANDS)

register(
    "range_join_price_bands",
    sql=f"""
    SELECT band_id, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi,
           count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem
    JOIN (VALUES {_BANDS_VALUES}) AS b(band_id, lo, hi)
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band_id, lo, hi
    ORDER BY band_id
    """,
)(range_join_price_bands)


# --- interval self-join (click → purchase attribution) --------------------

ATTRIBUTION_WINDOW = "1 hour"


def click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (click, purchase) pair by the same user with the purchase in
    the hour after the click — the batch twin of the stream-stream
    interval join in streaming/pipeline.py. Shape: equi-join on user_id
    (one shuffle pair) + range refine; never a time-only theta join."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return clicks.join(purchases, "user_id").filter(
        (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"))
    ).select("user_id", "click_id", "click_ts", "purchase_id", "purchase_ts")


register(
    "click_purchase_attribution",
    sql="""
    SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)(click_purchase_attribution)
