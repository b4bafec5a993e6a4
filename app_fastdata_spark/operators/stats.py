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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_ratio, sql_round_ratio
from ..cache import memoized_build
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
            F.countDistinct(F.date_trunc("day", "ts")).alias("n_active_days"),
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


MID_TS = "2024-01-16 00:00:00"  # testdata midpoint (events span Jan 2024)


# Hierarchical subtotal rollup: (event_type, day) → per-type → grand total.
# ROLLUP plans through one Expand + single agg pass — subtotals cost one
# extra replicated row per level, not one extra scan per level.
@memoized_build("events")
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("day", F.date_trunc("day", "ts"))
        .rollup("event_type", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy(
            F.col("event_type").asc_nulls_first(), F.col("day").asc_nulls_first()
        )
    )


register(
    "events_rollup",
    sql="""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events
    GROUP BY ROLLUP(event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
    -- empty-input parity: standard SQL (DuckDB) emits the grand-total
    -- row with count 0 over an EMPTY table; Spark's rollup emits no
    -- rows. On non-empty input every rollup group has count >= 1, so
    -- this filter is a no-op there and aligns only the empty case.
    HAVING count(*) > 0
    ORDER BY event_type NULLS FIRST, day NULLS FIRST
    """,
)(events_rollup)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# Pivot: daily activity matrix, one column per event type. The explicit
# value list keeps the output schema static (a pivot with discovered
# values needs an extra distinct pass and breaks schema stability).
def events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pivoted = (
        events.withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("day")
        .pivot("event_type", EVENT_TYPES)
        .count()
    )
    return pivoted.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    ).orderBy("day")


register(
    "events_pivot_daily",
    sql="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)(events_pivot_daily)


# Set operations (absent from the reference, SURVEY.md §2.7): cohort
# retention via INTERSECT / EXCEPT of the distinct-user sets of the two
# month halves. Each set op is a distinct-agg + hash join shape in Spark;
# counts are unioned into one 3-row result.
def users_cohort_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    mid = F.lit(MID_TS).cast("timestamp")
    h1 = events.filter(F.col("ts") < mid).select("user_id").distinct()
    h2 = events.filter(F.col("ts") >= mid).select("user_id").distinct()

    def tagged(label: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(label).alias("cohort"), F.count("*").alias("n_users")
        )

    return (
        tagged("both_halves", h1.intersect(h2))
        .unionByName(tagged("only_first_half", h1.subtract(h2)))
        .unionByName(tagged("only_second_half", h2.subtract(h1)))
        .orderBy("cohort")
    )


register(
    "users_cohort_setops",
    sql=f"""
    WITH h1 AS (SELECT DISTINCT user_id FROM events
                WHERE ts < TIMESTAMP '{MID_TS}'),
         h2 AS (SELECT DISTINCT user_id FROM events
                WHERE ts >= TIMESTAMP '{MID_TS}')
    SELECT 'both_halves' AS cohort, count(*) AS n_users
    FROM (SELECT user_id FROM h1 INTERSECT SELECT user_id FROM h2)
    UNION ALL
    SELECT 'only_first_half', count(*)
    FROM (SELECT user_id FROM h1 EXCEPT SELECT user_id FROM h2)
    UNION ALL
    SELECT 'only_second_half', count(*)
    FROM (SELECT user_id FROM h2 EXCEPT SELECT user_id FROM h1)
    ORDER BY cohort
    """,
)(users_cohort_setops)


# Exact length percentiles per language — order statistics over the corpus
# (the quality-gate thresholds in doc_quality come from exactly this query).
def doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # r14: ONE array-percentile buffer per group instead of three
    # independent buffers over the same column (the r13 winsorize/
    # approx-stats fold) — identical interpolation, identical values.
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.percentile(
                F.col("n_chars"),
                F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
            ).alias("ps"),
            F.max("n_chars").alias("max_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "min_chars",
            F.round(F.col("ps")[0], 4).alias("p50_chars"),
            F.round(F.col("ps")[1], 4).alias("p90_chars"),
            F.round(F.col("ps")[2], 4).alias("p99_chars"),
            "max_chars",
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


# Per-group argmin with full-row recovery (TPC-H Q2's correlated-min shape,
# decorrelated): cheapest part per type. min(struct(price, key)) is the
# distributed argmin — one partial/final agg, deterministic via the key
# tiebreak, no window sort and no correlated re-scan. NULL price/key rows
# are excluded on BOTH engines: a part with no price cannot be
# "cheapest", and the engines place NULLs differently in the argmin
# (Spark's struct comparison sorts a NULL field FIRST, DuckDB's
# row_number ORDER BY sorts it LAST — the degenerate TPC-H sweep plants
# the divergent row).
def part_cheapest_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_retailprice").isNotNull() & F.col("p_partkey").isNotNull()
    )
    best = (
        part.groupBy("p_type")
        .agg(F.min(F.struct("p_retailprice", "p_partkey")).alias("m"))
        .select(
            "p_type",
            F.col("m.p_partkey").alias("p_partkey"),
            F.col("m.p_retailprice").alias("p_retailprice"),
        )
    )
    return best.orderBy("p_type")


register(
    "part_cheapest_by_type",
    sql="""
    SELECT p_type, p_partkey, p_retailprice FROM (
      SELECT p_type, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_type
                                ORDER BY p_retailprice, p_partkey) AS rn
      FROM part
      WHERE p_retailprice IS NOT NULL AND p_partkey IS NOT NULL
    ) WHERE rn = 1
    ORDER BY p_type
    """,
)(part_cheapest_by_type)


# Stratified corpus sampling — the training-data subsampling stage (e.g.
# downweight an over-represented language). sampleBy is a per-row
# Bernoulli draw keyed on a seeded hash: embarrassingly parallel, no
# shuffle, deterministic for a fixed seed. Not SQL-expressible (the
# draw is Spark's RNG) → rows-only check + property tests.
SAMPLE_FRACTIONS = {"en": 0.5, "de": 1.0, "fr": 1.0, "es": 0.25, "it": 1.0}
SAMPLE_SEED = 42


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.sampleBy("lang", SAMPLE_FRACTIONS, seed=SAMPLE_SEED).select(
        "doc_id", "lang", "source", "n_chars"
    )


register("doc_stratified_sample")(doc_stratified_sample)


# Deterministic twin: hash-bucket stratified sampling. Spark's sampleBy
# is RNG-seeded (engine-specific draw order -> rows-only above), but the
# md5-bucket form is pure arithmetic on the row key, so the SAME sample
# falls out of any engine — and it is stable under corpus growth (a
# doc's in/out decision never changes as neighbors arrive), which is
# what production pipelines actually want from a stratified sample.
def doc_stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10000
    )
    rate = None
    for lang, frac in SAMPLE_FRACTIONS.items():
        cond = F.when(F.col("lang") == lang, F.lit(int(frac * 10000)))
        rate = cond if rate is None else rate.when(
            F.col("lang") == lang, F.lit(int(frac * 10000))
        )
    rate = rate.otherwise(F.lit(0))
    return docs.filter(bucket < rate).select(
        "doc_id", "lang", "source", "n_chars"
    )


_SAMPLE_RATE_SQL = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {int(frac * 10000)}"
    for lang, frac in SAMPLE_FRACTIONS.items()
) + " ELSE 0 END"

register(
    "doc_stratified_sample_hash",
    sql=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000
          < {_SAMPLE_RATE_SQL}
    """,
)(doc_stratified_sample_hash)


# Frame-spec window: 7-calendar-day trailing moving average over the
# daily revenue series. The reference has no frame windows (SURVEY.md
# §2.5); this adds the sliding-frame class with an exact oracle. The
# frame is a RANGE over epoch seconds (not ROWS): on a series with gap
# days, a 7-ROW frame would silently span more than 7 calendar days.
# Scale: daily pre-agg first (shuffle on day — tiny), then ONE window
# pass over the small series; never a frame over raw events.
def events_daily_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("day")
        .agg(F.round(F.sum("value"), 4).alias("day_value"))
        .withColumn("day_s", F.unix_timestamp("day"))
    )
    w = Window.orderBy("day_s").rangeBetween(-6 * 86400, 0)
    return daily.select(
        "day",
        "day_value",
        F.round(F.avg("day_value").over(w), 6).alias("ma7"),
        F.count("*").over(w).alias("n_days_in_frame"),
    ).orderBy("day")


register(
    "events_daily_moving_avg",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             round(sum(value), 4) AS day_value
      FROM events GROUP BY 1
    )
    SELECT day, day_value,
           round(avg(day_value) OVER (ORDER BY CAST(epoch(day) AS BIGINT)
                 RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW), 6) AS ma7,
           count(*) OVER (ORDER BY CAST(epoch(day) AS BIGINT)
                 RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW) AS n_days_in_frame
    FROM daily ORDER BY day
    """,
)(events_daily_moving_avg)


# The percentile columns screen non-finite values to NULL (excluded
# like NULL — r10 NaN plant: engines place NaN differently inside a
# quantile sort) while the distinct-user count keeps every row.
def _finite_or_null(col):
    return F.when(~F.isnan(col) & (F.abs(col) != F.lit(float("inf"))), col)


# Approximate aggregates — the actual 100 TB hot path for distinct counts
# and percentiles (HLL++ / QuantileSummaries sketches: mergeable partials,
# bounded memory, one pass). Deterministic for fixed input but not
# SQL-reproducible in DuckDB → rows-only check here; the error-bound
# property vs the exact twins is asserted in tests.
def events_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    fin = _finite_or_null(F.col("value"))
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
            F.percentile_approx(fin, 0.5, 10000).alias("p50_value_approx"),
            F.percentile_approx(fin, 0.99, 10000).alias("p99_value_approx"),
        )
        .orderBy("event_type")
    )


register("events_approx_stats")(events_approx_stats)


# The hash-checkable twin of events_approx_stats: the SAME report shape
# (per-type distinct users + value percentiles) computed exactly, so the
# approx family contributes a full value-hash driver row while the
# sketch columns stay rows-only-gated. The error-bound link between the
# two (|approx - exact| within rsd/accuracy) is asserted in tests.
@memoized_build("events")
def events_approx_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: mixing countDistinct with percentile forced the distinct-agg
    # Expand rewrite, whose first-level aggregate keys on (event_type,
    # user_id) — so the percentile partials were buffered and merged PER
    # USER (~100k interpreted buffers), not per type. Split the two
    # aggregations into independent branches (each scan column-pruned to
    # its own pair) and broadcast-join the dim-sized results; the two
    # percentiles share ONE buffer via the array form (identical
    # interpolation, identical values).
    events = load_table(spark, sf_dir, "events")
    fin = _finite_or_null(F.col("value"))
    d = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    p = (
        events.groupBy("event_type")
        .agg(
            F.percentile(fin, F.array(F.lit(0.5), F.lit(0.99))).alias("ps")
        )
        .select(
            "event_type",
            F.round(F.col("ps")[0], 6).alias("p50_value"),
            F.round(F.col("ps")[1], 6).alias("p99_value"),
        )
    )
    return d.join(F.broadcast(p), "event_type").orderBy("event_type")


register(
    "events_approx_stats_exact",
    sql="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           round(quantile_cont(CASE WHEN isfinite(value) THEN value END,
                               0.5), 6) AS p50_value,
           round(quantile_cont(CASE WHEN isfinite(value) THEN value END,
                               0.99), 6) AS p99_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)(events_approx_stats_exact)


# --- per-type winsorization (feature clipping) ------------------------------
# The standard numeric-feature preprocessing step next to the MAD
# SCREEN: instead of flagging outliers, CLIP them to the per-group
# [p05, p95] band and emit the transformed column — what a training
# pipeline actually feeds downstream. Scale shape: one dim-sized
# event_type reduce (exact percentiles collapse map-side per group)
# broadcast back onto the scan; the fact table never shuffles.
# Parity: boundaries are 6-dp-rounded on BOTH engines before the clip
# (a last-bit boundary difference would clip a boundary-exact value
# differently), Spark's exact `percentile` and DuckDB's quantile_cont
# are both linear-interpolation, and non-finite values are screened
# like NULLs (the r10 NaN-plant contract — an unscreened NaN would
# poison its group's percentile on one engine and not the other).
WINSOR_LO, WINSOR_HI = 0.05, 0.95


def _finite_events(ev: DataFrame) -> DataFrame:
    return ev.filter(
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") != F.lit(float("inf")))
    ).select("event_id", "event_type", "value")


def winsorize_bounds(ev: DataFrame) -> DataFrame:
    """Per-type [lo, hi] clip boundaries over a (finite-screened)
    events frame — the offline FIT half, shared by the batch query and
    the fit-offline/apply-at-ingest streaming twin."""
    # r13: one array-percentile buffer per group instead of two
    # independent buffers over the same column (identical interpolation,
    # identical values).
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile(
                F.col("value"), F.array(F.lit(WINSOR_LO), F.lit(WINSOR_HI))
            ).alias("ps")
        )
        .select(
            "event_type",
            F.round(F.col("ps")[0], 6).alias("lo"),
            F.round(F.col("ps")[1], 6).alias("hi"),
        )
    )


def winsorize_apply(ev: DataFrame, bounds: DataFrame) -> DataFrame:
    """The APPLY half: broadcast the dim-sized boundary table onto the
    frame and clip — a stateless projection, identical for a batch scan
    and a stream."""
    return ev.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.round(
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 6
        ).alias("value_winsorized"),
    )


@memoized_build("events")
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, event_type, value, value_winsorized): the value
    column clipped to its event_type's [p05, p95] band."""
    ev = _finite_events(load_table(spark, sf_dir, "events"))
    return winsorize_apply(ev, winsorize_bounds(ev)).orderBy("event_id")


register(
    "events_value_winsorized",
    sql=f"""
    WITH ev AS (
      SELECT event_id, event_type, value FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
        AND isfinite(value)
    ),
    b AS (
      SELECT event_type,
             round(quantile_cont(value, {WINSOR_LO}), 6) AS lo,
             round(quantile_cont(value, {WINSOR_HI}), 6) AS hi
      FROM ev GROUP BY 1
    )
    SELECT e.event_id, e.event_type, e.value,
           round(least(greatest(e.value, b.lo), b.hi), 6)
             AS value_winsorized
    FROM ev e JOIN b USING (event_type)
    ORDER BY event_id
    """,
)(events_value_winsorized)


# Semi-structured metadata extraction (the props column carries JSON):
# schema-enforced from_json parse → typed field → bucketed aggregate.
# A training pipeline filters on exactly this kind of sidecar metadata.
# Scale: from_json is JVM-side (Jackson inside codegen), the parse output
# is pruned to the referenced field, and the bucket agg is the usual
# partial→final shape. Malformed JSON yields NULL (PERMISSIVE) and lands
# in the NULL bucket rather than failing the scan. Spark's
# from_json('k int') is strictly integral — a string-typed '"7"' AND a
# double-typed 2.7/30.0 both parse to NULL — so the oracle's json_type
# allowlist admits only UBIGINT/BIGINT (DuckDB types 30.0 as DOUBLE and
# TRY_CAST would round it to 30, a cross-engine break).
def events_props_k_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k int")["k"]
    return (
        events.select((F.floor(k / 10) * 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("k_bucket")
    )


register(
    "events_props_k_buckets",
    sql="""
    SELECT CAST(floor(TRY_CAST(CASE WHEN json_valid(props)
                                     AND json_type(props, '$.k')
                                         IN ('UBIGINT', 'BIGINT')
                                    THEN json_extract_string(props, '$.k')
                               END AS INTEGER) / 10) * 10
                AS BIGINT) AS k_bucket,
           count(*) AS n_events,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)(events_props_k_buckets)


# Ordered-sequence funnel: view -> click -> purchase conversion, the
# product-analytics class absent from both the reference and the earlier
# rounds. Uses the simplified first-touch funnel (a user converts a step
# if their FIRST event of that type occurs after their first event of
# the previous step): one hash aggregate per user (min ts per type via
# conditional min - no joins, no explode), then a conditional rollup.
# Scale: two-tier agg on user_id then a 1-row reduce; scan-bound.
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = events.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_view"))
    s3 = (
        s2
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") > F.col("t_click"))
    )
    counts = per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(s1.cast("long")).alias("viewed"),
        F.sum(s2.cast("long")).alias("clicked_after_view"),
        F.sum(s3.cast("long")).alias("purchased_after_click"),
    )
    return counts.select(
        "n_users", "viewed", "clicked_after_view", "purchased_after_click",
        F.round(F.col("clicked_after_view") / F.col("viewed"), 6).alias(
            "view_to_click"
        ),
        F.round(
            F.col("purchased_after_click") / F.col("clicked_after_view"), 6
        ).alias("click_to_purchase"),
    )


register(
    "events_funnel",
    sql="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    flags AS (
      SELECT t_view IS NOT NULL AS s1,
             t_view IS NOT NULL AND t_click IS NOT NULL
               AND t_click > t_view AS s2,
             t_view IS NOT NULL AND t_click IS NOT NULL
               AND t_click > t_view AND t_purchase IS NOT NULL
               AND t_purchase > t_click AS s3
      FROM per_user
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
           CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT)
             AS clicked_after_view,
           CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT)
             AS purchased_after_click,
           round(sum(CASE WHEN s2 THEN 1 ELSE 0 END) * 1.0
                 / sum(CASE WHEN s1 THEN 1 ELSE 0 END), 6) AS view_to_click,
           round(sum(CASE WHEN s3 THEN 1 ELSE 0 END) * 1.0
                 / sum(CASE WHEN s2 THEN 1 ELSE 0 END), 6)
             AS click_to_purchase
    FROM flags
    """,
)(events_funnel)


# --- streaming-rate anomaly telemetry --------------------------------------

ANOMALY_BASELINE_BUCKETS = 24  # trailing baseline buckets (excl. current)
ANOMALY_MIN_FRAME = 10         # need this many baseline buckets to score
ANOMALY_Z = 3.0


def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-rate anomalies: z-score of each hour's event count
    against the trailing 24-hour baseline (mean/stddev), flagged at
    |z| >= 3 — the ops-telemetry query a streaming ingest dashboard runs
    (traffic spikes, dead sources). Bucket granularity is hourly because
    the testdata's events are sparse (~1/second with multi-minute gaps);
    the same shape applies per second on a dense stream.

    Scale note: the window is GLOBAL over time, but it runs on the
    already-aggregated per-hour series (O(buckets), not O(events)) —
    the same reduced-series shape as events_daily_moving_avg.
    z is computed from 6-dp-rounded mean/sd on both engines so the flag
    boundary cannot straddle a cross-engine rounding difference.
    NULL-ts events have no hour bucket and are excluded on BOTH engines
    (a NULL bucket row would sort FIRST in Spark's series window but
    LAST in DuckDB's, shifting every trailing frame by one)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    per_h = (
        events.withColumn("hour_ts", F.date_trunc("hour", "ts"))
        .groupBy("hour_ts")
        .agg(F.count("*").alias("c"))
        .withColumn("s", F.unix_timestamp("hour_ts"))
    )
    w = Window.orderBy("s").rowsBetween(-ANOMALY_BASELINE_BUCKETS, -1)
    mean = F.round(F.avg("c").over(w), 6)
    sd = F.round(F.stddev_samp("c").over(w), 6)
    n = F.count("*").over(w)
    z = F.when(
        (n >= ANOMALY_MIN_FRAME) & (sd > 0), F.round((F.col("c") - mean) / sd, 6)
    )
    return per_h.select(
        "hour_ts",
        "c",
        n.alias("n_frame"),
        z.alias("z"),
        (F.abs(z) >= ANOMALY_Z).alias("is_anomaly"),
    )


register(
    "events_rate_anomaly",
    sql=f"""
    WITH per_h AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
             count(*) AS c, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS s
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 3
    ),
    scored AS (
      SELECT hour_ts, c,
             count(*) OVER w AS n_frame,
             round(avg(c) OVER w, 6) AS mean,
             round(stddev_samp(c) OVER w, 6) AS sd
      FROM per_h
      WINDOW w AS (ORDER BY s ROWS BETWEEN {ANOMALY_BASELINE_BUCKETS} PRECEDING
                   AND 1 PRECEDING)
    )
    SELECT hour_ts, c, n_frame,
           CASE WHEN n_frame >= {ANOMALY_MIN_FRAME} AND sd > 0
                THEN round((c - mean) / sd, 6) END AS z,
           abs(CASE WHEN n_frame >= {ANOMALY_MIN_FRAME} AND sd > 0
                    THEN round((c - mean) / sd, 6) END) >= {ANOMALY_Z}
             AS is_anomaly
    FROM scored
    """,
)(events_rate_anomaly)


# --- per-user running stats (cumulative windows + lag) ---------------------
@memoized_build("events")
def events_user_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event cumulative count/sum and inter-event gap within each
    user's ordered stream — the W-class beyond plain ROW_NUMBER
    (cumulative frames, LAG). Window order is (ts, event_id) so the
    running-sum FOLD ORDER is identical on both engines (float parity
    by construction, 6-dp rounding as belt); the gap compares integer
    microseconds. NULL-ts events have no position in the stream and are
    excluded on BOTH engines (Spark sorts window NULLs FIRST, DuckDB
    LAST — every cumulative value after the NULL would diverge).
    One shuffle on user_id, sort within partitions —
    exactly the scale shape of a sessionizing pass."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(cum).alias("running_n"),
        F.round(F.sum("value").over(cum), 6).alias("running_sum"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


register(
    "events_user_running_stats",
    sql="""
    SELECT event_id, user_id,
           count(*) OVER cum AS running_n,
           round(sum(value) OVER cum, 6) AS running_sum,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           cum AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)(events_user_running_stats)


# --- interval merge (gaps-and-islands) -------------------------------------
MERGE_GAP_US = 60_000_000  # events within 60 s of the previous interval merge


@memoized_build("events")
def events_merged_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge each user's overlapping activity intervals ([ts, ts+60 s))
    into maximal sessions — the classic gaps-and-islands shape (running
    MAX of interval end, island breaks where the next start exceeds it,
    running SUM of breaks numbers the islands) that plain windowed aggs
    can't express and the reference's sessionizer special-cases.

    All timestamp math is integer microseconds (cross-engine exact).
    NULL-ts events are excluded on BOTH engines — an interval needs a
    start, and window ORDER BY ts places NULLs differently across
    engines (Spark NULLS FIRST vs DuckDB NULLS LAST), so an unfiltered
    NULL row yields a phantom NULL-bounded session on one engine and
    silently inflates the last session's n_events on the other (the
    same exclusion every sibling windowed events operator applies).
    Scale shape: ONE hash exchange on user_id feeds both window passes
    AND the final group-by (same key → Spark reuses the partitioning);
    per-user data sorts once within partitions. Skewed users are bounded
    by their own event counts — no global sort anywhere."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    s = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_end = F.max(F.col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    base = ev.select("event_id", "user_id", "ts", s.alias("s"), (s + MERGE_GAP_US).alias("e"))
    islanded = base.select(
        "user_id",
        "ts",
        "event_id",
        "s",
        "e",
        F.when(prev_end.isNull() | (F.col("s") > prev_end), 1)
        .otherwise(0)
        .alias("brk"),
    ).select(
        "user_id",
        "s",
        "e",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return (
        islanded.groupBy("user_id", "session_seq")
        .agg(
            F.min("s").alias("session_start_us"),
            F.max("e").alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
    )


register(
    "events_merged_sessions",
    sql=f"""
    WITH base AS (
      SELECT user_id, ts, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + {MERGE_GAP_US} AS e
      FROM events
      WHERE ts IS NOT NULL
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) IS NULL
                       OR s > max(e) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS brk,
             ts, event_id
      FROM base
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           min(s) AS session_start_us, max(e) AS session_end_us,
           count(*) AS n_events
    FROM islands GROUP BY user_id, session_seq
    """,
)(events_merged_sessions)


# --- global rank distribution (NTILE / PERCENT_RANK / CUME_DIST) -----------
def events_user_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity ranked into quartiles with the full
    rank-distribution window family (NTILE, PERCENT_RANK, CUME_DIST) —
    the remaining OVER() classes beyond ROW_NUMBER/frames/LAG. Total
    order (cnt DESC, user_id) makes every rank deterministic — no peer
    groups, so percent_rank/cume_dist reduce to pure rank arithmetic,
    computed explicitly as exact-integer ratios ((i-1)/(n-1), i/n)
    through the half-up identity in functions/rounding.py rather than
    the builtins, whose double rounding diverges across engines at
    binary-inexact 6-dp half-way points (the
    customer_spend_distribution precedent). A single-user frame defines
    pct_rank = 0 (the builtins' n=1 convention), guarding the (n-1)
    denominator.

    Scale note: the global-ORDER window runs over the POST-AGGREGATE
    frame (one row per user — dim-sized, ~1e6 rows at 100 TB, one
    partition is fine); the corpus-sized side only pays the group-by
    exchange. This is the house pattern for global ranks: reduce first,
    rank the reduction."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.orderBy(F.desc("n_events"), F.asc("user_id"))
    ranked = per_user.select(
        "user_id",
        "n_events",
        F.ntile(4).over(w).alias("quartile"),
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return ranked.select(
        "user_id",
        "n_events",
        "quartile",
        F.when(F.col("n") > 1, round_ratio("i - 1", "n - 1", 6))
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
        round_ratio("i", "n", 6).alias("cume"),
    )


register(
    "events_user_quartiles",
    sql="""
    WITH per_user AS (
      SELECT user_id, count(*) AS n_events
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    ranked AS (
      SELECT user_id, n_events,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             row_number() OVER w AS i,
             count(*) OVER () AS n
      FROM per_user
      WINDOW w AS (ORDER BY n_events DESC, user_id)
    )
    SELECT user_id, n_events, quartile,
           CASE WHEN n > 1 THEN {pr} ELSE 0.0 END AS pct_rank,
           {cd} AS cume
    FROM ranked
    """.format(
        pr=sql_round_ratio("i - 1", "n - 1", 6),
        cd=sql_round_ratio("i", "n", 6),
    ),
)(events_user_quartiles)


# --- CUBE / grouping sets ---------------------------------------------------
def events_cube_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day): all four grouping sets — per
    (type, day), per type, per day, grand total — in ONE aggregation
    pass (the grouping-sets class; events_rollup covers the
    hierarchical prefix form, this is the full lattice). Grouping
    flags are emitted as separate 0/1 columns rather than a combined
    grouping_id so the cross-engine bit order cannot diverge.

    Scale shape: Spark plans CUBE as one Expand (4 rows per input) +
    two-tier hash agg — the reduce side is |types| × |days|-bounded;
    at 100 TB the Expand multiplier is the documented cost and a
    partial aggregate still combines map-side."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")  # TIMESTAMP both engines
    return (
        ev.select(F.col("event_type"), day, F.col("value"))
        .cube("event_type", "day")
        .agg(
            # grouping() must be computed IN the aggregate (it reads the
            # Expand's grouping-id column, gone after the agg)
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("day").cast("int").alias("g_day"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "event_type", "day", "g_type", "g_day", "n_events", "total_value"
        )
        .orderBy("g_type", "g_day", "event_type", "day")
    )


register(
    "events_cube_daily",
    sql="""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(GROUPING(event_type) AS INTEGER) AS g_type,
           CAST(GROUPING(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS INTEGER)
             AS g_day,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY CUBE (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
    -- empty-input parity: like ROLLUP above, standard SQL emits the
    -- grand-total row over an EMPTY table where Spark emits none
    HAVING count(*) > 0
    ORDER BY g_type, g_day, event_type, day
    """,
)(events_cube_daily)


# --- Mergeable HLL sketch rollup ----------------------------------------------
# The re-aggregatable distinct-count pattern that makes 100 TB cubes
# cheap: per-(type, day) HLL sketch binaries are small (~2^14 registers at the configured lgK),
# persistable, and union to ANY coarser grain without rescanning the
# fact table — the sketch analogue of the reference's partial->final
# re-agg views (SURVEY.md A7). Here: day-grain sketches, unioned to a
# per-type global distinct-user estimate. Both tiers are declarative
# aggregates, so Spark runs partial sketch-merge map-side inside
# ObjectHashAggregate; nothing touches Python.
#
# rows-only by design: the estimate comes from the DataSketches HLL
# register state, which no other engine reproduces bit-for-bit (and the
# union estimate is composite, not HIP, so even Spark's own single-pass
# sketch can legitimately differ by a hair from the day-rollup).
# Accuracy and mergeability are pytest-gated instead: estimate within
# 5% of exact countDistinct at lgK=14 (rsd ~0.8%), day-rollup within
# 1e-6 of the single-pass union.
HLL_LG_K = 14


@memoized_build("events")
def events_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(HLL_LG_K)).alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").alias("n_day_sketches"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        )
        .orderBy("event_type")
    )


register("events_hll_users_by_type")(events_hll_users_by_type)


# --- Heavy hitters -------------------------------------------------------------
# Frequent-items telemetry (who dominates the event stream): the exact
# form is a HAVING-over-scalar-total — one hash agg plus a 1-row
# broadcast threshold, fine at any scale because the reduce side is
# |distinct users|. The Misra-Gries twin below is the bounded-memory
# form for when even the distinct-key space is too big to reduce.
HH_PHI = 0.005  # frequency threshold: > 0.5% of all events


@memoized_build("events")
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    # total from the REDUCED frame, not a second fact scan: both branches
    # share the per-user aggregate, so AQE reuses the exchange and the
    # events table is read once (plan-gated: one FileScan).
    total = counts.agg(F.sum("n_events").alias("n_total"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("n_events") > F.col("n_total") * F.lit(HH_PHI))
        .select("user_id", "n_events")
        .orderBy(F.desc("n_events"), F.asc("user_id"))
    )


register(
    "events_heavy_hitters",
    sql=f"""
    SELECT user_id, count(*) AS n_events
    FROM events
    GROUP BY user_id
    HAVING count(*) > (SELECT count(*) FROM events) * {HH_PHI}
    ORDER BY n_events DESC, user_id
    """,
)(events_heavy_hitters)


# Misra-Gries mergeable summary (Agarwal et al., "Mergeable Summaries",
# PODS 2012): each partition keeps at most MG_K weighted counters —
# batch value_counts merged in, then the (K+1)-th largest weight
# subtracted from all and non-positives dropped (the batched MG
# reduction). Per-partition undercount is <= n_p/(MG_K+1); summing
# summaries across partitions keeps the total undercount <= N/(MG_K+1),
# so EVERY item with true frequency > N/(MG_K+1) survives the merge —
# the guarantee the pytest gate asserts. Memory is O(MG_K) per
# partition and the shuffle carries <= MG_K rows per partition
# regardless of input size or key-space width: this is the operator
# you run when the per-key hash agg itself is the bottleneck.
# rows-only by design (the summary's surviving tail below the
# guarantee line is arrival-order-dependent); NULL items are dropped
# (the exact twin keeps the NULL group — documented divergence).
MG_K = 64


def mg_merge(acc, weighted):
    """One batched MG reduction step (SHARED by the per-partition
    summarizer, the streaming store merge, and the guarantee test — the
    bound argument must never fork): add the weighted counts, and if
    more than MG_K counters survive, subtract the (K+1)-th largest
    weight from all and drop non-positives. Every subtracted unit of
    mass is matched by >= MG_K+1 units subtracted simultaneously, so
    the TOTAL undercount across any sequence of merges stays
    <= N/(MG_K+1)."""
    acc = acc.add(weighted, fill_value=0)
    if len(acc) > MG_K:
        cut = acc.nlargest(MG_K + 1).iloc[-1]
        acc = acc - cut
        acc = acc[acc > 0]
    return acc


def mg_summary_partition(batches):
    """Per-partition batched Misra-Gries reduction over an `item` column.
    Callers MUST pre-filter NULL items Spark-side: a nullable long
    column reaches pandas as float64, which silently rounds ids beyond
    2^53 — exactly the hashed-id range this operator targets at scale.
    The dropna here is only belt-and-braces for the no-NULL batches that
    arrive as exact int64."""
    import pandas as pd

    acc = pd.Series(dtype="float64")
    for pdf in batches:
        vc = pdf["item"].dropna().value_counts()
        if vc.empty:
            continue
        acc = mg_merge(acc, vc)
    if len(acc):
        yield pd.DataFrame(
            {
                "item": acc.index.astype("int64"),
                "weight": acc.values.astype("int64"),
            }
        )


@memoized_build("events")
def events_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("item"))
        # NULLs dropped HERE, not in pandas: null-free int64 batches
        # cross Arrow exactly; a single NULL would widen the whole
        # batch to float64 and corrupt ids >= 2^53
        .filter(F.col("item").isNotNull())
    )
    summ = ev.mapInPandas(mg_summary_partition, "item long, weight long")
    return (
        summ.groupBy("item")
        .agg(F.sum("weight").alias("weight_lb"))
        .orderBy(F.desc("weight_lb"), F.asc("item"))
        .limit(MG_K)
    )


register("events_heavy_hitters_mg")(events_heavy_hitters_mg)


# --- Time-based RANGE window frame --------------------------------------------
# The remaining OVER() frame class: a trailing-INTERVAL window (RANGE
# BETWEEN 3600s PRECEDING AND CURRENT ROW) — unlike the ROWS frame of
# events_daily_moving_avg, the frame edge is a VALUE bound, so ties
# share a frame and gaps shrink it. Both engines order by integer
# MICROSECOND epoch (Spark unix_micros / DuckDB epoch_us), so the
# bound arithmetic is exact and identical. One user_id exchange carries
# the whole query; the running frame is computed in a single pass per
# partition (no self-join against the trailing hour).
TRAILING_US = 3_600_000_000  # one hour


@memoized_build("events")
def events_user_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"))
        .rangeBetween(-TRAILING_US, 0)
    )
    return (
        events.withColumn("us", F.unix_micros(F.col("ts")))
        .select(
            "event_id",
            "user_id",
            F.count("*").over(w).alias("n_trailing_1h"),
            F.round(F.sum("value").over(w), 4).alias("value_trailing_1h"),
        )
        .orderBy("event_id")
    )


register(
    "events_user_trailing_hour",
    sql=f"""
    SELECT event_id, user_id,
           count(*) OVER w AS n_trailing_1h,
           round(sum(value) OVER w, 4) AS value_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {TRAILING_US} PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)(events_user_trailing_hour)


# --- Data-quality constraint reports ------------------------------------------
# The Deequ-style audit-as-a-query: every constraint a pipeline would
# assert (uniqueness, completeness, domain membership, range, invariant
# consistency) evaluated in ONE scan as conditional aggregates, emitted
# as a single report row. At 100 TB this is the operator you run before
# trusting a new drop of a table — one pass, no shuffle beyond the
# (Expand-based) distinct count, dim-sized output. Violation COUNTS,
# not booleans, so the report localizes severity; the runtime assert
# combinators (functions/asserts.py, U9) can gate on any column of it.
VALID_LANGS = ["de", "en", "es", "fr", "zh"]


@memoized_build("events")
def events_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    in_window = (F.col("ts") >= F.lit("2024-01-01").cast("timestamp")) & (
        F.col("ts") < F.lit("2024-02-01").cast("timestamp")
    )
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # count(col) not count(*): NULL ids are a completeness violation
        # (n_null_event_id below), not a uniqueness one — count(*) would
        # double-report every NULL id as a duplicate
        (F.count("event_id") - F.count_distinct("event_id")).alias(
            "n_dup_event_ids"
        ),
        F.count(F.when(F.col("event_id").isNull(), 1)).alias("n_null_event_id"),
        F.count(F.when(F.col("ts").isNull(), 1)).alias("n_null_ts"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("n_null_user"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_null_value"),
        # NULL-safe domain check: NULL is a violation (completeness), so
        # the predicate must not let isin's NULL propagation skip it
        F.count(
            F.when(
                F.col("event_type").isNull()
                | ~F.col("event_type").isin(EVENT_TYPES),
                1,
            )
        ).alias("n_bad_type"),
        F.count(F.when(F.col("value") < 0, 1)).alias("n_negative_value"),
        F.count(F.when(F.col("ts").isNotNull() & ~in_window, 1)).alias(
            "n_ts_out_of_window"
        ),
    )


register(
    "events_quality_report",
    sql=f"""
    SELECT count(*) AS n_rows,
           count(event_id) - count(DISTINCT event_id) AS n_dup_event_ids,
           count(CASE WHEN event_id IS NULL THEN 1 END) AS n_null_event_id,
           count(CASE WHEN ts IS NULL THEN 1 END) AS n_null_ts,
           count(CASE WHEN user_id IS NULL THEN 1 END) AS n_null_user,
           count(CASE WHEN value IS NULL THEN 1 END) AS n_null_value,
           count(CASE WHEN event_type IS NULL OR event_type NOT IN
                 ({", ".join(f"'{t}'" for t in EVENT_TYPES)})
                 THEN 1 END) AS n_bad_type,
           count(CASE WHEN value < 0 THEN 1 END) AS n_negative_value,
           count(CASE WHEN ts IS NOT NULL AND NOT
                 (ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01')
                 THEN 1 END) AS n_ts_out_of_window
    FROM events
    """,
)(events_quality_report)


def doc_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count("doc_id") - F.count_distinct("doc_id")).alias("n_dup_doc_ids"),
        F.count(F.when(F.col("text").isNull(), 1)).alias("n_null_text"),
        F.count(
            F.when(F.col("text").isNotNull() & (F.length("text") == 0), 1)
        ).alias("n_empty_text"),
        # the documents invariant every gate relies on: n_chars must
        # equal length(text) (NULL-safe: a mismatch only where both sides
        # are comparable)
        F.count(
            F.when(
                F.col("text").isNotNull()
                & F.col("n_chars").isNotNull()
                & (F.col("n_chars") != F.length("text")),
                1,
            )
        ).alias("n_chars_mismatch"),
        F.count(
            F.when(
                F.col("lang").isNull() | ~F.col("lang").isin(VALID_LANGS), 1
            )
        ).alias("n_bad_lang"),
        F.count(F.when(F.col("source").isNull(), 1)).alias("n_null_source"),
    )


register(
    "doc_quality_report",
    sql=f"""
    SELECT count(*) AS n_rows,
           count(doc_id) - count(DISTINCT doc_id) AS n_dup_doc_ids,
           count(CASE WHEN text IS NULL THEN 1 END) AS n_null_text,
           count(CASE WHEN text IS NOT NULL AND len(text) = 0 THEN 1 END)
             AS n_empty_text,
           count(CASE WHEN text IS NOT NULL AND n_chars IS NOT NULL
                       AND n_chars <> len(text) THEN 1 END)
             AS n_chars_mismatch,
           count(CASE WHEN lang IS NULL OR lang NOT IN
                 ({", ".join(f"'{x}'" for x in VALID_LANGS)})
                 THEN 1 END) AS n_bad_lang,
           count(CASE WHEN source IS NULL THEN 1 END) AS n_null_source
    FROM documents
    """,
)(doc_quality_report)


# --- SCD2 change-interval compression -----------------------------------------
# The slowly-changing-dimension type-2 build: compress a per-day
# attribute series (each user's dominant event_type per active day) into
# validity intervals [valid_from, valid_to], valid_to NULL while the
# run is still current — the history-table shape every warehouse keeps
# for dimensions that drift. Pure windowing: change rows survive a
# lag()-inequality, the interval close is lead()-1. Rows with NULL
# ts/user/type are excluded up front on BOTH engines — their window
# PEER ORDERING differs between Spark (NULLS FIRST) and DuckDB (NULLS
# LAST), the classic silent-parity trap. Scale: one (user, day, type)
# agg exchange then user-keyed window exchanges; state per user is one
# row lookback, never the whole history.
@memoized_build("events")
def user_type_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    # day as a day-truncated TIMESTAMP, the repo's date convention
    # (DuckDB's pandas bridge has no date dtype, so DATE columns would
    # come back as datetime64 and hash-mismatch a Spark date)
    daily = ev.groupBy(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
    ).agg(F.count("*").alias("n"))
    # (r13 note: a min_by-aggregate mode was A/B'd — argmin by struct
    # (-n, event_type) — and REJECTED: max/min over struct buffers
    # compiles to interpreted SortAggregate, not HashAggregate; the
    # probe measured 2.36 s vs 0.95 s for the rank-window form that
    # preceded today's shape. That rank window is itself gone now —
    # r13's single-exchange rewrite below detects the per-day mode as
    # the first row of each day-block, and test_scd2_single_window_
    # exchange asserts WindowGroupLimit is ABSENT — but the rejection
    # stands a fortiori: the aggregate form lost to a shape this one
    # then beat.)
    #
    # ONE window exchange (r13, guide §2.4 "two operations keyed the
    # same way can share one exchange"): the old shape re-partitioned
    # three times — (user_id, day) for the per-day mode rank, then
    # user_id for the run-start lag, then the output range sort. All
    # three windows only need user_id clustering: sorting each user's
    # daily rows by (day ASC, n DESC, event_type ASC) makes the per-day
    # mode THE FIRST ROW OF EACH day-block (row_number()=1 under
    # (n DESC, event_type ASC) within a day ⟺ first row of the block —
    # (n, event_type) is unique per (user, day) since event_type is a
    # grouping key), detected with lag(day) in the SAME user_id window;
    # the two run windows then reuse both the partitioning and the
    # (user_id, day)-prefix ordering, so the plan carries a single hash
    # exchange, one sort, three Window nodes with no re-sort, and the
    # output range exchange (4 exchanges + 2 window sorts → 2 + 1).
    w_day = Window.partitionBy("user_id").orderBy(
        "day", F.desc("n"), F.asc("event_type")
    )
    mode = (
        daily.withColumn("prev_day", F.lag("day").over(w_day))
        .filter(
            F.col("prev_day").isNull() | (F.col("prev_day") != F.col("day"))
        )
        .select("user_id", "day", "event_type")
    )
    w_user = Window.partitionBy("user_id").orderBy("day")
    runs = (
        mode.withColumn("prev", F.lag("event_type").over(w_user))
        .filter(
            F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
        )
        .select("user_id", "event_type", F.col("day").alias("valid_from"))
    )
    w_run = Window.partitionBy("user_id").orderBy("valid_from")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        (
            F.lead("valid_from").over(w_run) - F.expr("INTERVAL 1 DAY")
        ).alias("valid_to"),
    ).orderBy("user_id", "valid_from")


register(
    "user_type_scd2",
    sql="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             event_type, count(*) AS n
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    mode AS (
      SELECT user_id, day, event_type FROM (
        SELECT user_id, day, event_type,
               row_number() OVER (
                 PARTITION BY user_id, day
                 ORDER BY n DESC, event_type) AS rn
        FROM daily
      ) WHERE rn = 1
    ),
    runs AS (
      SELECT user_id, event_type, day AS valid_from
      FROM (
        SELECT user_id, day, event_type,
               lag(event_type) OVER (
                 PARTITION BY user_id ORDER BY day) AS prev
        FROM mode
      )
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (
             PARTITION BY user_id ORDER BY valid_from)
             - INTERVAL 1 DAY AS valid_to
    FROM runs
    ORDER BY user_id, valid_from
    """,
)(user_type_scd2)


# --- Mergeable quantile summary -----------------------------------------------
# The third mergeable sketch (alongside the HLL distinct rollup and the
# Misra-Gries heavy hitters): a Manku-style one-level quantile summary.
# Each partition compresses its sorted values into at most QS_K
# equally-weighted order statistics (exact passthrough when n_p <= QS_K),
# so the shuffle carries <= QS_K rows per partition regardless of input
# size; the merge is a weighted cumulative scan over the union of
# summaries (<= QS_K * partitions rows — a single-task window over a
# dim-sized frame, like the centroid collects). Rank guarantee: each
# partition's compression moves any rank by <= n_p/QS_K, so the summed
# error is <= N/QS_K and the returned value's true rank lies within
# q*N +- N/QS_K (+1 for the discrete step) — the bound the pytest gate
# asserts, and the reason both an 8-way and a 1-partition layout must
# agree to within it. rows-only by design: which order statistics
# survive depends on the partition layout, so no SQL oracle reproduces
# the exact values (the 1-partition layout IS exact and is tested
# against DuckDB's quantile_disc).
QS_K = 256
QS_TARGETS = [0.25, 0.5, 0.75, 0.9, 0.99]


def qs_compress(v, w, k: int = QS_K):
    """One weighted quantile-summary compression (SHARED by the
    per-partition summarizer and the streaming buffer compaction — the
    bound argument must never fork): sort by value, then keep the k
    order statistics at cumulative-weight targets (i+0.5)*W/k, each
    re-weighted W/k (passthrough when <= k points). Any rank moves by
    at most W/k per compression — the additive error every caller
    accounts for. For unit weights this reduces to picking the
    floor((i+0.5)*n/k)-th sorted values exactly."""
    import numpy as np

    if len(v) <= k:
        order = np.argsort(v, kind="stable")
        return v[order].astype("float64"), w[order].astype("float64")
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1]
    targets = (np.arange(k) + 0.5) * total / k
    idx = np.searchsorted(cum, targets, side="right")
    idx = np.minimum(idx, len(v) - 1)
    return v[idx].astype("float64"), np.full(k, total / k)


def _qs_summary_partition(batches):
    """Per-partition quantile summary over a `v` column via the shared
    qs_compress (unit weights). Callers pre-filter NULLs Spark-side
    (Arrow int64/NULL trap)."""
    import numpy as np
    import pandas as pd

    vals = []
    for pdf in batches:
        if len(pdf):
            vals.append(pdf["v"].to_numpy())
    if not vals:
        return
    v = np.concatenate(vals)
    cv, cw = qs_compress(v, np.ones(len(v)))
    yield pd.DataFrame({"v": cv, "w": cw})


@memoized_build("documents")
def doc_length_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    src = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("n_chars").cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    summ = src.mapInPandas(_qs_summary_partition, "v double, w double")
    # the cumulative scan is a GLOBAL window — legal only because the
    # input is the bounded summary union, never the corpus
    cum = summ.withColumn(
        "cum",
        F.sum("w").over(
            Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    total = summ.agg(F.sum("w").alias("n_total"))
    targets = F.explode(
        F.array(*[F.lit(q) for q in QS_TARGETS])
    ).alias("q")
    return (
        cum.join(F.broadcast(total))
        .select("v", "cum", "n_total", targets)
        .filter(F.col("cum") >= F.col("q") * F.col("n_total"))
        .groupBy("q")
        .agg(F.min("v").alias("est_n_chars"))
        .orderBy("q")
    )


register("doc_length_quantiles_sketch")(doc_length_quantiles_sketch)


# Conversion windows: 24 h view->click, 7 d click->purchase.
FUNNEL_CLICK_WINDOW_US = 24 * 3600 * 1_000_000
FUNNEL_PURCHASE_WINDOW_US = 7 * 24 * 3600 * 1_000_000


@memoized_build("events")
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-CONSTRAINED funnel (events_funnel above is the lifetime
    form): a click converts only within 24 h of the user's first view,
    a purchase only within 7 d of that first qualifying click.

    One user_id exchange serves everything: the "first view so far" and
    "first qualifying click so far" are prefix-frame conditional mins
    over the SAME (ts, event_id) sort — Spark plans them as two chained
    WindowExec on the one exchange (the second depends on the first's
    output, but the partitioning/sort carries through, so there is no
    second shuffle and no self-join back to the facts; the naive
    formulation joins events to per-user firsts twice). Timestamps compare as integer microseconds (strict >, so a
    click sharing its ts with the view does not convert), the per-user
    rollup rides the existing partitioning, and the final frame is one
    row. NULL ts/user/type rows are excluded on both engines."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t_us = F.unix_micros("ts")
    view_so_far = F.min(
        F.when(F.col("event_type") == "view", t_us)
    ).over(w)
    click_ok = F.when(
        (F.col("event_type") == "click")
        & view_so_far.isNotNull()
        & (t_us > view_so_far)
        & (t_us <= view_so_far + F.lit(FUNNEL_CLICK_WINDOW_US)),
        t_us,
    )
    click_so_far = F.min(click_ok).over(w)
    purchase_ok = F.when(
        (F.col("event_type") == "purchase")
        & click_so_far.isNotNull()
        & (t_us > click_so_far)
        & (t_us <= click_so_far + F.lit(FUNNEL_PURCHASE_WINDOW_US)),
        t_us,
    )
    per_user = (
        ev.select(
            "user_id",
            view_so_far.alias("v"),
            click_ok.alias("c"),
            purchase_ok.alias("p"),
        )
        .groupBy("user_id")
        .agg(
            F.min("v").alias("t_view"),
            F.min("c").alias("t_click"),
            F.min("p").alias("t_purchase"),
        )
    )
    # rates are NULL when the denominator step has no users — ANSI
    # division by zero on an empty corpus, caught by the empty-table
    # parity sweep; the 4-dp rounding is the exact integer half-up
    # identity (functions/rounding.py), portable at half-way inputs
    # like 1 click / 32 views
    agg = per_user.agg(
        F.count(F.col("t_view")).alias("n_view_users"),
        F.count(F.col("t_click")).alias("n_click_24h"),
        F.count(F.col("t_purchase")).alias("n_purchase_7d"),
    )
    return agg.select(
        "n_view_users",
        "n_click_24h",
        "n_purchase_7d",
        F.when(
            F.col("n_view_users") > 0,
            round_ratio("n_click_24h", "n_view_users", 4),
        ).alias("click_rate"),
        F.when(
            F.col("n_click_24h") > 0,
            round_ratio("n_purchase_7d", "n_click_24h", 4),
        ).alias("purchase_rate"),
    )


register(
    "events_funnel_windowed",
    sql=f"""
    WITH s AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               OVER w AS v
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s2 AS (
      SELECT user_id, event_id, event_type, t_us, v,
             CASE WHEN event_type = 'click' AND v IS NOT NULL
                   AND t_us > v AND t_us <= v + {FUNNEL_CLICK_WINDOW_US}
                  THEN t_us END AS c_ok
      FROM s
    ),
    s3 AS (
      SELECT user_id, event_type, t_us, v, c_ok,
             min(c_ok) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM s2
    ),
    per_user AS (
      SELECT user_id,
             min(v) AS t_view,
             min(c_ok) AS t_click,
             min(CASE WHEN event_type = 'purchase' AND c IS NOT NULL
                       AND t_us > c
                       AND t_us <= c + {FUNNEL_PURCHASE_WINDOW_US}
                      THEN t_us END) AS t_purchase
      FROM s3 GROUP BY 1
    )
    , f AS (
      SELECT count(t_view) AS n_view_users,
             count(t_click) AS n_click_24h,
             count(t_purchase) AS n_purchase_7d
      FROM per_user
    )
    SELECT n_view_users, n_click_24h, n_purchase_7d,
           CASE WHEN n_view_users > 0
                THEN {sql_round_ratio("n_click_24h", "n_view_users", 4)}
           END AS click_rate,
           CASE WHEN n_click_24h > 0
                THEN {sql_round_ratio("n_purchase_7d", "n_click_24h", 4)}
           END AS purchase_rate
    FROM f
    """,
)(events_funnel_windowed)


@memoized_build("events")
def events_key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew telemetry over the user_id distribution: Gini
    coefficient plus top-1/top-10 key shares — the diagnostic that says
    whether a user-keyed shuffle needs salting (top_users_salted is the
    cure; this is the thermometer).

    Gini from the standard rank identity over counts sorted ascending:
    G = 2·Σ(i·cᵢ)/(n·Σc) − (n+1)/n. The rank product sum is exact
    integer arithmetic (BIGINT on both engines) so the only float is
    the final division. One user_id hash-agg reduces the facts; the
    rank window runs over the key-sized aggregate (the dim-sized-frame
    justification, same as the ABC classifier — at a key count too big
    for one window partition, the two-pass band-bucketing fix applies).
    NULL user_id is excluded (it is not a shuffle key)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    counts = ev.groupBy("user_id").agg(F.count("*").alias("c"))
    w = Window.orderBy("c", "user_id")
    ranked = counts.select(
        "c",
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    # single-ratio form of the rank identity: G = (2S - (n+1)T)/(nT),
    # nonnegative by the Chebyshev sum inequality on ascending counts —
    # rounded via the exact integer half-up identity
    # (functions/rounding.py; round() on a double diverges across
    # engines at half-way points). Spark-side int64 bound: the identity
    # multiplies S = Σ i·cᵢ ≤ n_keys·n_rows by 2e6, so n_keys·n_rows
    # must stay < ~4.6e12 (ANSI errors loudly beyond); for a corpus
    # past that, split the identity two-stage (whole + remainder) —
    # the DuckDB oracle side is HUGEINT-exact regardless
    g = ranked.agg(
        F.count("*").alias("nk"),
        F.sum("c").alias("t"),
        F.sum(F.col("i") * F.col("c")).alias("s"),
        F.max("c").alias("maxc"),
        F.sum(
            F.when(F.col("i") > F.col("n") - 10, F.col("c")).otherwise(0)
        ).alias("s10"),
    )
    return g.select(
        F.col("nk").alias("n_keys"),
        F.col("t").alias("n_rows"),
        round_ratio("2 * s - (nk + 1) * t", "nk * t", 6).alias("gini"),
        round_ratio("maxc", "t", 6).alias("top1_share"),
        round_ratio("s10", "t", 6).alias("top10_share"),
    )


register(
    "events_key_skew_gini",
    sql="""
    WITH counts AS (
      SELECT user_id, count(*) AS c
      FROM events WHERE user_id IS NOT NULL
      GROUP BY 1
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c, user_id) AS i,
             count(*) OVER () AS n
      FROM counts
    )
    , g AS (
      -- sums stay un-downcast (HUGEINT) so the 2e6 multiply inside the
      -- half-up identity cannot overflow on the oracle side; only the
      -- OUTPUT columns cast to BIGINT for type parity with Spark
      SELECT count(*) AS nk,
             sum(c) AS t,
             sum(i * c) AS s,
             max(c) AS maxc,
             sum(CASE WHEN i > n - 10 THEN c ELSE 0 END) AS s10
      FROM ranked
    )
    SELECT CAST(nk AS BIGINT) AS n_keys, CAST(t AS BIGINT) AS n_rows,
           {gini} AS gini,
           {t1} AS top1_share,
           {t10} AS top10_share
    FROM g
    """.format(
        gini=sql_round_ratio("2 * s - (nk + 1) * t", "nk * t", 6),
        t1=sql_round_ratio("maxc", "t", 6),
        t10=sql_round_ratio("s10", "t", 6),
    ),
)(events_key_skew_gini)


@memoized_build("events")
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day — the EXACT form of the
    sliding-distinct problem (a distinct count cannot be merged across
    sliding windows without a sketch; events_hll_users_by_type is the
    mergeable-sketch path, this is its exact twin at a bounded factor).

    Shape: dedup to (user, day) pairs FIRST (one exchange, output
    bounded by active pairs, not events), then each pair contributes to
    exactly the 7 window anchors that include it — a bounded explode —
    and the per-anchor distinct is a standard two-tier Expand agg.
    Anchors outside the corpus day span are clipped by a 1-row
    broadcast of the bounds, so partial windows at the leading edge are
    reported (they exist in production too) and no phantom trailing
    anchors appear. At 100 TB the explode factor stays 7 regardless of
    volume; the distinct agg is the only shuffle that grows."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    # bounds from the RAW filtered rows, not from ud (r13): min/max of
    # the distinct (user, day) pairs' days equals min/max of the days
    # themselves, but Spark has no subtree reuse — deriving bounds from
    # ud re-executed the whole scan→distinct pipeline a second time per
    # execution, where this form is one map-side-partial min/max agg
    # over the same scan.
    bounds = ev.select(F.date_trunc("day", "ts").alias("day")).agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    x = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("anchor"),
    )
    return (
        x.crossJoin(F.broadcast(bounds))
        .filter(F.col("anchor").between(F.col("lo"), F.col("hi")))
        .groupBy(F.col("anchor").alias("day"))
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .orderBy("day")
    )


register(
    "events_sliding_distinct_users",
    sql="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
    x AS (
      SELECT user_id,
             unnest(generate_series(
               day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS anchor
      FROM ud
    )
    SELECT anchor AS day, count(DISTINCT user_id) AS users_7d
    FROM x, b
    WHERE anchor BETWEEN lo AND hi
    GROUP BY 1 ORDER BY 1
    """,
)(events_sliding_distinct_users)
