"""User-behavior analytics and CDC-style merge over the events stream.

Three operator families the reference's dashboard queries stop short of
(SURVEY.md §2 covers per-second counts, sessions, and top-k; a complete
engine also needs longitudinal user analytics and snapshot maintenance):

- cohort retention: the week-over-week "of the users first seen in week
  W, how many came back in week W+k" matrix every product-analytics
  stack computes (reference analogue: the sessionized export stream,
  db/ddl.sql sessions view, is the per-user raw material for this).
- Markov transition matrix: event-type bigram counts per user ordered
  by time — the sequence-mining primitive behind funnel discovery.
- upsert merge: latest-wins MERGE of a delta window into a base
  snapshot with per-row provenance — the Delta/Iceberg MERGE INTO
  shape expressed as a co-partitioned full-outer join, which is exactly
  the physical plan those table formats lower MERGE to.

Scale notes (100 TB):
- cohort retention does ONE user_id exchange over the fact table with a
  map-side partial `collect_set` bounded by the retention horizon (a
  user contributes at most #weeks-in-horizon entries, not #events);
  everything after the explode is horizon² rows — dim-sized.
- transitions do one user_id window exchange, then a 25-key rollup;
  the per-from_type probability window runs over ≤ |types|² rows.
- upsert merge prunes each side's scan by the time predicate (partition
  pruning on a date-partitioned lake), windows each side on user_id,
  and joins co-partitioned — AQE reuses the user_id exchanges for the
  SMJ, so the merge costs two pruned scans + two shuffles total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import memoized_build
from ..functions.rounding import round_ratio, sql_round_ratio
from ..registry import register
from ..tables import load_table

# Testdata events span Jan 2024; the midpoint splits base/delta for the
# merge. Imported from stats so a midpoint change there moves this
# module's upsert-merge/incremental-view split with it (each module is
# internally drift-safe either way — the f-string oracles and Spark
# predicates both read this name — but the corpus midpoint is ONE fact).
from .stats import MID_TS  # noqa: E402


# --- Weekly cohort retention ---------------------------------------------------
@memoized_build("events")
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen ISO week,
    retention = share of the cohort active k weeks later.

    Single-scan shape: one groupBy(user_id) with min(week) + a partial-
    aggregated collect_set(week) (bounded by the horizon, so the shuffle
    carries ≤ #weeks values per user), explode, then a (cohort, offset)
    rollup. The offset-0 cell is by construction the cohort size, so the
    denominator is a first_value window over the dim-sized matrix — the
    fact table is never joined back to itself.

    NULL ts/user rows are excluded on both engines (cohort membership is
    undefined for them)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    weekly = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    )
    per_user = weekly.groupBy("user_id").agg(
        F.min("wk").alias("cohort_week"),
        F.collect_set("wk").alias("wks"),
    )
    act = per_user.select(
        "user_id", "cohort_week", F.explode("wks").alias("wk")
    ).withColumn(
        "week_offset",
        (F.datediff("wk", "cohort_week") / 7).cast("int"),
    )
    mat = act.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_active")
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset")
    return (
        mat.withColumn("first_n", F.first("n_active").over(w))
        .withColumn(
            # integer half-up identity: round(a/b, k) on doubles is not
            # engine-portable at half-way points (functions/rounding.py)
            "retention_pct",
            round_ratio("n_active", "first_n", 4),
        )
        .drop("first_n")
        .orderBy("cohort_week", "week_offset")
    )


register(
    "events_cohort_retention",
    sql="""
    WITH g AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
      GROUP BY 1, 2
    ),
    fu AS (SELECT user_id, min(wk) AS cohort_week FROM g GROUP BY 1),
    act AS (
      SELECT g.user_id, fu.cohort_week, g.wk,
             CAST(date_diff('day', fu.cohort_week, g.wk) // 7 AS INT)
               AS week_offset
      FROM g JOIN fu USING (user_id)
    ),
    mat AS (
      SELECT cohort_week, week_offset, count(*) AS n_active
      FROM act GROUP BY 1, 2
    )
    , m2 AS (
      SELECT cohort_week, week_offset, n_active,
             first_value(n_active) OVER (
               PARTITION BY cohort_week ORDER BY week_offset) AS first_n
      FROM mat
    )
    SELECT cohort_week, week_offset, n_active,
           {rr} AS retention_pct
    FROM m2
    ORDER BY cohort_week, week_offset
    """.format(rr=sql_round_ratio("n_active", "first_n", 4)),
)(events_cohort_retention)


# --- Event-type transition matrix ---------------------------------------------
@memoized_build("events")
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type bigrams → Markov transition matrix with
    row-normalized probabilities.

    lag() over (user_id ORDER BY ts, event_id) — the event_id tiebreak
    makes the sequence deterministic under equal timestamps on both
    engines. One user_id window exchange over the facts, then the
    transition rollup is ≤ |types|² rows and the probability
    normalization is a window over that dim-sized frame.

    NULL ts/user/type rows are excluded up front on BOTH engines —
    window peer ordering of NULLs differs between Spark and DuckDB
    (NULLS FIRST vs LAST), the silent-parity trap the SCD2 operator
    documents."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("from_type", F.lag("event_type").over(w)).filter(
        F.col("from_type").isNotNull()
    )
    c = seq.groupBy(
        "from_type", F.col("event_type").alias("to_type")
    ).agg(F.count("*").alias("n_transitions"))
    wp = Window.partitionBy("from_type")
    return (
        c.withColumn("row_total", F.sum("n_transitions").over(wp))
        .withColumn(
            "transition_prob",
            round_ratio("n_transitions", "row_total", 4),
        )
        .drop("row_total")
        .orderBy("from_type", "to_type")
    )


register(
    "events_type_transitions",
    sql="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
    ),
    c AS (
      SELECT from_type, event_type AS to_type, count(*) AS n_transitions
      FROM seq WHERE from_type IS NOT NULL
      GROUP BY 1, 2
    )
    , c2 AS (
      SELECT from_type, to_type, n_transitions,
             sum(n_transitions) OVER (PARTITION BY from_type) AS row_total
      FROM c
    )
    SELECT from_type, to_type, n_transitions,
           {rr} AS transition_prob
    FROM c2
    ORDER BY from_type, to_type
    """.format(rr=sql_round_ratio("n_transitions", "row_total", 4)),
)(events_type_transitions)


# --- CDC latest-wins upsert merge ---------------------------------------------
@memoized_build("events")
def events_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a delta window (events ≥ MID_TS, latest per user) into a
    base snapshot (events < MID_TS, latest per user), latest-wins, with
    per-row provenance: 'insert' (delta-only user), 'update' (both),
    'keep' (base-only).

    This is the physical plan Delta/Iceberg lower MERGE INTO to: each
    side's scan is pruned by the time predicate (partition pruning on a
    date-partitioned lake), reduced to one row per key by a user_id
    window, then full-outer sort-merge joined co-partitioned on the
    key. Delta presence is tested via its non-null ts (both sides
    filter ts IS NOT NULL), never via payload columns — value may be
    legitimately NULL and must not flip provenance."""
    # ONE aggregation pass (r13): the windowed-dedup-per-side +
    # full-outer-join formulation scanned events twice and shuffled
    # every per-user row twice (plan: 2 scans, 3 exchanges, 2 window
    # sorts, SMJ). "Latest row per user per side" is max-of-struct with
    # the window's exact ordering key leading — (ts, event_id) is
    # verified unique over non-null-ts rows, so lexicographic struct
    # max ≡ row_number(ORDER BY ts DESC, event_id DESC) = 1 — and the
    # full-outer join by the shared grouping key is the same aggregate
    # with each side's struct NULL when that side has no row (max
    # ignores NULLs; a present side always has non-null ts). One scan,
    # map-side partial agg collapses to ≤2 structs per user before the
    # single exchange — the shape that survives 100 TB. Provenance
    # semantics unchanged: presence is the side's aggregate being
    # non-NULL, never a payload column.
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    mid = F.lit(MID_TS).cast("timestamp")
    row = F.struct("ts", "event_id", "event_type", "value")
    b = F.col("b")
    d = F.col("d")
    in_delta = d.isNotNull()
    return (
        ev.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("ts") < mid, row)).alias("b"),
            F.max(F.when(F.col("ts") >= mid, row)).alias("d"),
        )
        .select(
            "user_id",
            F.when(in_delta, d["ts"]).otherwise(b["ts"]).alias("last_ts"),
            F.when(in_delta, d["event_type"])
            .otherwise(b["event_type"])
            .alias("last_type"),
            F.when(in_delta, d["value"])
            .otherwise(b["value"])
            .alias("last_value"),
            F.when(b.isNull(), F.lit("insert"))
            .when(d.isNull(), F.lit("keep"))
            .otherwise(F.lit("update"))
            .alias("merge_action"),
        )
        .orderBy("user_id")
    )


register(
    "events_upsert_merge",
    sql=f"""
    WITH ev AS (
      SELECT * FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    b AS (
      SELECT user_id, ts, event_type, value FROM (
        SELECT user_id, ts, event_type, value,
               row_number() OVER (
                 PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM ev WHERE ts < TIMESTAMP '{MID_TS}'
      ) WHERE rn = 1
    ),
    d AS (
      SELECT user_id, ts, event_type, value FROM (
        SELECT user_id, ts, event_type, value,
               row_number() OVER (
                 PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM ev WHERE ts >= TIMESTAMP '{MID_TS}'
      ) WHERE rn = 1
    )
    SELECT coalesce(b.user_id, d.user_id) AS user_id,
           CASE WHEN d.ts IS NOT NULL THEN d.ts ELSE b.ts END AS last_ts,
           CASE WHEN d.ts IS NOT NULL THEN d.event_type
                ELSE b.event_type END AS last_type,
           CASE WHEN d.ts IS NOT NULL THEN d.value
                ELSE b.value END AS last_value,
           CASE WHEN b.ts IS NULL THEN 'insert'
                WHEN d.ts IS NULL THEN 'keep'
                ELSE 'update' END AS merge_action
    FROM b FULL OUTER JOIN d ON b.user_id = d.user_id
    ORDER BY user_id
    """,
)(events_upsert_merge)


# --- GROUPING SETS with grouping_id -------------------------------------------
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((event_type), (day), ()) with a
    grouping_id discriminator — the third member of the grouping-lattice
    family (ROLLUP and CUBE are registered in stats.py); unlike those,
    the set list here is non-hierarchical, which only GROUPING SETS can
    express. Plans through the same single-pass Expand + two-tier agg:
    subtotal rows cost one replicated row per set, never a second scan.

    grouping_id() disambiguates a genuine NULL key from a subtotal NULL
    — both engines use the same bit order (first listed key = high bit),
    which the oracle cross-checks bit-for-bit."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    return (
        ev.groupingSets(
            [["event_type"], ["day"], []], "event_type", "day"
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy(
            "gid",
            F.col("event_type").asc_nulls_first(),
            F.col("day").asc_nulls_first(),
        )
    )


register(
    "events_grouping_sets",
    sql="""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           GROUPING(event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
             AS gid,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type),
                            (CAST(date_trunc('day', ts) AS TIMESTAMP)),
                            ())
    -- empty-input parity: standard SQL emits the () row with count 0
    -- over an empty table, Spark emits nothing (same alignment as the
    -- registered ROLLUP/CUBE oracles)
    HAVING count(*) > 0
    ORDER BY gid, event_type NULLS FIRST, day NULLS FIRST
    """,
)(events_grouping_sets)


# --- Per-user time-weighted average -------------------------------------------
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted mean value per user over an IRREGULAR event series:
    each value is weighted by how long it remained current (seconds
    until the user's next event, lead() - ts), the standard treatment
    for sensor/price series where plain AVG over-counts bursts.

    EVERYTHING sums in exact integers — weights as microseconds
    (unix_micros/epoch_us) and values as cents (the column is 2-dp
    money-like; round(value*100) is integral) — because float summation
    order is engine- and partition-dependent: at sf0.1 one user's
    plain_avg landed exactly on a 4-dp round boundary and the two
    engines' last bits disagreed (caught by the cross-scale gate; the
    sf0.01 driver gate never hit a boundary). Integer sums are exact on
    both engines (Spark long, DuckDB HUGEINT) and the final divisions
    convert the SAME integers, so the doubles match bit-for-bit.
    Even the 4-dp ROUNDING is integer: round(x, 4) on a double is not
    engine-portable at half-way points (Spark rounds the shortest
    decimal rendering via BigDecimal.valueOf — 44.94875 → 44.9488 —
    where DuckDB rounds the binary value → 44.9487; user 212 at sf0.1
    IS such a half-way case), so both engines compute
    the identity in functions/rounding.py — explicit half-up in exact
    integers, one final double division.

    WEIGHTS are millisecond-quantized (dt_us div 1000) for the weighted
    mean — the weight RATIO is what matters and ms quantization bounds
    the numerator: 2·10^4 · max_cents · span_ms stays inside int64 for
    $13k values over a full YEAR (≈8.1e18 < 9.2e18); µs weights would
    overflow at ~$460 average over a month (review-measured headroom at
    sf0.001 was only 2.8×). observed_sec still reports exact µs.
    plain_avg's numerator bound is 2·10^4 · max_cents · n_intervals —
    ~3.5e8 max-value events per user before overflow; Spark runs under
    ANSI so an exceeded bound ERRORS rather than silently wrapping.
    The last event of each user has no holding period and is excluded,
    as are single-event users (zero total weight). One user_id window
    exchange, then a per-user rollup on the already-partitioned
    frame.

    Non-finite values are excluded like NULLs (r10 NaN plant): a NaN or
    ±Inf measurement is garbage, and unscreened it ABORTS the integer
    cents cast on BOTH engines (Spark ANSI CAST_OVERFLOW, DuckDB cast
    error) — the r9 embedding-gate lesson applied to the scalar money
    column."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") != F.lit(float("inf")))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.withColumn("t_us", F.unix_micros("ts"))
        .withColumn(
            "cents", F.round(F.col("value") * 100).cast("long")
        )
        .withColumn("dt_us", F.lead("t_us").over(w) - F.col("t_us"))
        .filter(F.col("dt_us").isNotNull())
        .withColumn("dt_ms", F.expr("dt_us div 1000"))
    )
    g = t.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum("dt_us").alias("w_us"),
        F.sum("dt_ms").alias("w_ms"),
        F.sum("cents").alias("s_cents"),
        F.sum(F.col("cents") * F.col("dt_ms")).alias("swc_ms"),
    )
    return g.select(
        "user_id",
        "n_intervals",
        F.round(F.col("w_us") / F.lit(1e6), 6).alias("observed_sec"),
        round_ratio("s_cents", "100 * n_intervals", 4).alias("plain_avg"),
        # w_ms is 0 when EVERY inter-event gap is under 1 ms (duplicate
        # timestamps are legal input — the event_id tiebreak exists for
        # them): the time-weighted mean is undefined there, and an
        # unguarded ratio ABORTS the whole query under ANSI
        # (DIVIDE_BY_ZERO) where DuckDB's // 0 returns NULL — report
        # NULL on both engines instead.
        F.when(
            F.col("w_ms") > 0, round_ratio("swc_ms", "100 * w_ms", 4)
        ).alias("time_weighted_avg"),
    ).orderBy("user_id")


register(
    "events_time_weighted_avg",
    sql="""
    WITH t AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             lead(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
              - epoch_us(ts) AS dt_us
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
        AND isfinite(value)
    ),
    g AS (
      SELECT user_id,
             count(*) AS n_intervals,
             CAST(sum(dt_us) AS BIGINT) AS w_us,
             CAST(sum(dt_us // 1000) AS BIGINT) AS w_ms,
             CAST(sum(cents) AS BIGINT) AS s_cents,
             CAST(sum(cents * (dt_us // 1000)) AS BIGINT) AS swc_ms
      FROM t
      WHERE dt_us IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id, n_intervals,
           round(w_us / 1e6, 6) AS observed_sec,
           {pa} AS plain_avg,
           CASE WHEN w_ms > 0 THEN {twa} END AS time_weighted_avg
    FROM g
    ORDER BY user_id
    """.format(
        pa=sql_round_ratio("s_cents", "100 * n_intervals", 4),
        twa=sql_round_ratio("swc_ms", "100 * w_ms", 4),
    ),
)(events_time_weighted_avg)


# --- Incremental materialized-view maintenance --------------------------------
def events_by_src_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the events_by_src materialized view:
    the base window's aggregate is MERGED with the delta window's
    aggregate (full-outer on the group key, counts summed) instead of
    recomputing over all facts — the partial-aggregate-merge identity
    that makes COUNT/SUM views incrementally maintainable. The oracle
    is the single-pass recompute with FILTER subtotals, so the driver
    hash proves merge == recompute on every run.

    Scale shape: each side aggregates its pruned scan with map-side
    partial agg (the shuffle carries one row per key per side), and the
    merge joins two key-sized aggregate frames — the fact table is
    scanned once per side and never re-shuffled whole. NULL-ts rows
    belong to neither window and are excluded on both engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    mid = F.lit(MID_TS).cast("timestamp")

    def counts(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("user_id").alias("src")).agg(
            F.count("*").alias("n")
        )

    b = counts(ev.filter(F.col("ts") < mid)).alias("b")
    d = counts(ev.filter(F.col("ts") >= mid)).alias("d")
    return (
        b.join(d, F.col("b.src").eqNullSafe(F.col("d.src")), "full_outer")
        .select(
            F.coalesce(F.col("b.src"), F.col("d.src")).alias("src"),
            F.coalesce(F.col("b.n"), F.lit(0)).alias("base_visits"),
            F.coalesce(F.col("d.n"), F.lit(0)).alias("delta_visits"),
            (
                F.coalesce(F.col("b.n"), F.lit(0))
                + F.coalesce(F.col("d.n"), F.lit(0))
            ).alias("total_visits"),
        )
        .orderBy(F.col("src").asc_nulls_first())
    )


register(
    "events_by_src_incremental",
    sql=f"""
    SELECT user_id AS src,
           count(*) FILTER (WHERE ts < TIMESTAMP '{MID_TS}')
             AS base_visits,
           count(*) FILTER (WHERE ts >= TIMESTAMP '{MID_TS}')
             AS delta_visits,
           count(*) AS total_visits
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY user_id
    ORDER BY src NULLS FIRST
    """,
)(events_by_src_incremental)


# --- RFM quartile segmentation --------------------------------------------------
@memoized_build("orders")
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation over orders: per-customer Recency (days since
    last order, relative to the corpus max date — the pinned-NOW idiom
    params.py uses for the serving views), Frequency (#orders), Monetary
    (revenue), each scored 1-4 by comparing against the metric's exact
    quartile boundaries, concatenated into the classic 'R4F2M1' segment.

    Deliberately NOT NTILE: a global NTILE is a total sort (one-partition
    window — the scale killer), and its tie-splitting is row-order-
    dependent so two engines can't agree on it. Boundary-bucketing is
    the distributed formulation: quartiles come from one `percentile`
    aggregate over the customer-sized frame, broadcast as three scalars
    per metric, and scoring is a stateless projection — ties at a
    boundary go to the lower bucket on both engines by the shared
    strict-> comparison. One o_custkey shuffle total; everything after
    is dim-sized.

    NULL custkey/orderdate/totalprice rows are excluded on both engines
    (a NULL key has no RFM identity; a NULL price would make monetary
    NULL, and Spark's format_string renders a NULL segment component as
    the TEXT 'null' while DuckDB's printf propagates NULL — a value-hash
    parity break found by review, now also covered by the orders
    degenerate sweep). Deliberate semantics: ALL THREE letters score
    over the same priced-order set — the alternative (count NULL-price
    orders for R/F but not M) scores the letters over different order
    populations, which is the more surprising contract; Recency compares calendar DATEs so the engines'
    differing timestamp-difference conventions never enter."""
    # r13: the quartile frame and the scoring projection both consume
    # the per-customer reduce, and Spark has no subtree reuse — the
    # orders scan + o_custkey exchange ran TWICE per execution (plus a
    # third scan for the corpus max date). Materialize the reduce once
    # per (session, orders stamp) — it is the customer-sized derived
    # frame a real RFM pipeline stores — derive `now` from its last_d
    # (max of per-customer maxes ≡ corpus max), and fold the 9 separate
    # percentile buffers into 3 array-percentiles (one buffer per
    # metric; identical interpolation, identical values).
    from ..cache import session_get, stamp_key

    def _build() -> DataFrame:
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        return (
            orders.groupBy("o_custkey")
            .agg(
                F.max(F.to_date("o_orderdate")).alias("last_d"),
                F.count("*").alias("frequency"),
                # exact cents, one final double division — round(sum, 2)
                # on a double is the half-way trap (functions/rounding.py)
                (
                    F.sum(
                        F.round(F.col("o_totalprice") * 100).cast("long")
                    ).cast("double")
                    / 100
                ).alias("monetary"),
            )
            .localCheckpoint()
        )

    per0 = session_get(
        "rfm_per_customer", stamp_key(spark, sf_dir, "orders"), _build
    )
    now = per0.agg(F.max("last_d").alias("now_d"))
    per = per0.crossJoin(F.broadcast(now)).withColumn(
        "recency_days", F.datediff("now_d", "last_d")
    )
    qs = "array(0.25, 0.5, 0.75)"
    bounds = per.agg(
        *[
            F.expr(f"percentile({m}, {qs})").alias(f"{m[0]}a")
            for m in ("recency_days", "frequency", "monetary")
        ]
    ).select(
        *[
            F.col(f"{m[0]}a")[i].alias(f"{m[0]}{i + 1}")
            for m in ("recency_days", "frequency", "monetary")
            for i in range(3)
        ]
    )

    def score(metric: str, letter: str, invert: bool) -> Column:
        hits = sum(
            (F.col(metric) > F.col(f"{letter}{i}")).cast("int")
            for i in (1, 2, 3)
        )
        return (F.lit(4) - hits if invert else F.lit(1) + hits).alias(
            f"{letter}_score"
        )

    return (
        per.crossJoin(F.broadcast(bounds))
        .select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary",
            score("recency_days", "r", invert=True),
            score("frequency", "f", invert=False),
            score("monetary", "m", invert=False),
        )
        .withColumn(
            "segment",
            F.format_string(
                "R%dF%dM%d",
                F.col("r_score"),
                F.col("f_score"),
                F.col("m_score"),
            ),
        )
        .orderBy("o_custkey")
    )


register(
    "customer_rfm_segments",
    sql="""
    WITH o AS (
      SELECT * FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        AND o_totalprice IS NOT NULL
    ),
    now_t AS (SELECT max(CAST(o_orderdate AS DATE)) AS now_d FROM o),
    per AS (
      SELECT o_custkey,
             date_diff('day', max(CAST(o_orderdate AS DATE)),
                       (SELECT now_d FROM now_t)) AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / 100 AS monetary
      FROM o GROUP BY 1
    ),
    b AS (
      SELECT quantile_cont(recency_days, 0.25) AS r1,
             quantile_cont(recency_days, 0.5)  AS r2,
             quantile_cont(recency_days, 0.75) AS r3,
             quantile_cont(frequency, 0.25)    AS f1,
             quantile_cont(frequency, 0.5)     AS f2,
             quantile_cont(frequency, 0.75)    AS f3,
             quantile_cont(monetary, 0.25)     AS m1,
             quantile_cont(monetary, 0.5)      AS m2,
             quantile_cont(monetary, 0.75)     AS m3
      FROM per
    ),
    s AS (
      SELECT o_custkey, recency_days, frequency, monetary,
             4 - ((recency_days > r1)::INT + (recency_days > r2)::INT
                  + (recency_days > r3)::INT) AS r_score,
             1 + ((frequency > f1)::INT + (frequency > f2)::INT
                  + (frequency > f3)::INT) AS f_score,
             1 + ((monetary > m1)::INT + (monetary > m2)::INT
                  + (monetary > m3)::INT) AS m_score
      FROM per, b
    )
    SELECT *, printf('R%dF%dM%d', r_score, f_score, m_score) AS segment
    FROM s ORDER BY o_custkey
    """,
)(customer_rfm_segments)


# --- Pareto / ABC revenue classification ----------------------------------------
@memoized_build("orders")
def customer_revenue_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification: customers ranked by revenue, running
    cumulative revenue share, class A while the running share ≤ 80%,
    B to 95%, C for the tail — the inventory-analysis classic.

    The running sum is a global ROWS window, but it runs over the
    per-customer AGGREGATE (one o_custkey shuffle reduces the facts to a
    customer-sized frame first) — the same dim-sized-matrix justification
    as the cohort denominator above. At a customer count where even that
    frame is too big for one window partition, the two-pass fix is
    revenue-band bucketing + per-band offsets (the distributed
    row_number trick); the facts never see the window either way.

    All arithmetic is exact-integer CENTS (o_totalprice is 2-dp): the
    running sum, the total, and the 6-dp share rounding (the integer
    half-up identity, functions/rounding.py — round() on a double
    diverges across engines at half-way points). The share RATIO is
    taken over whole DOLLARS (cents div 100 on both operands): the
    identity multiplies the numerator by 2e6, so the dollar scale
    bounds the corpus at ~$4.6e12 total revenue before int64 overflow
    (cents would cap it at $46B — review-measured headroom of only ~2×
    at 10× driver scale); Spark runs under ANSI, so an exceeded bound
    errors loudly rather than wrapping. The explicit ROWS
    frame stays — RANGE (the default) would put revenue ties in one
    peer group and diverge. NULL-revenue orders are excluded up front:
    Spark and DuckDB disagree on DESC NULL placement, the trap the SCD2
    docstring records."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    rev = orders.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("rev_cents")
    )
    tot = rev.agg(F.sum("rev_cents").alias("total_cents"))
    w = (
        Window.orderBy(F.desc("rev_cents"), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.crossJoin(F.broadcast(tot))
        .withColumn("cum_cents", F.sum("rev_cents").over(w))
        .withColumn(
            "cum_share",
            # total under one whole dollar (every order 0-priced, say)
            # makes the dollar-scale denominator 0 — legal input that
            # would ABORT under ANSI where DuckDB's // 0 yields NULL;
            # report NULL share (class falls through to 'C', both
            # engines' CASE treats NULL the same way)
            F.when(
                F.expr("total_cents div 100") > 0,
                round_ratio("cum_cents div 100", "total_cents div 100", 6),
            ),
        )
        .select(
            "o_custkey",
            (F.col("rev_cents").cast("double") / 100).alias("revenue"),
            "cum_share",
            F.when(F.col("cum_share") <= 0.8, "A")
            .when(F.col("cum_share") <= 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        .orderBy(F.desc("revenue"), "o_custkey")
    )


register(
    "customer_revenue_abc",
    sql="""
    WITH rev AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
      GROUP BY 1
    ),
    c AS (
      SELECT o_custkey, rev_cents,
             sum(rev_cents) OVER (
               ORDER BY rev_cents DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_cents,
             (SELECT sum(rev_cents) FROM rev) AS total_cents
      FROM rev
    ),
    s AS (
      SELECT o_custkey, CAST(rev_cents AS DOUBLE) / 100 AS revenue,
             CASE WHEN total_cents // 100 > 0 THEN {rr} END AS cum_share
      FROM c
    )
    SELECT o_custkey, revenue, cum_share,
           CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM s ORDER BY revenue DESC, o_custkey
    """.format(
        rr=sql_round_ratio(
            "cum_cents // 100", "total_cents // 100", 6
        )
    ),
)(customer_revenue_abc)


# --- Top event-type trigram paths ------------------------------------------------
@memoized_build("events")
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 length-3 event-type paths across all user sequences — the
    n-gram extension of the transition matrix above (funnel DISCOVERY,
    where events_funnel MEASURES one known path).

    Two lags over the same (user_id ORDER BY ts, event_id) window — one
    exchange, one WindowExec; the path rollup is ≤ |types|³ rows, so the
    share denominator is an empty-frame window over a dim-sized frame
    and the top-k is a TakeOrdered over it. Same NULL exclusions as the
    transition matrix, same event_id tiebreak for determinism."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.withColumn("p1", F.lag("event_type", 2).over(w))
        .withColumn("p2", F.lag("event_type", 1).over(w))
        .filter(F.col("p1").isNotNull() & F.col("p2").isNotNull())
    )
    paths = t.groupBy(
        F.concat_ws(" > ", "p1", "p2", "event_type").alias("path")
    ).agg(F.count("*").alias("n_paths"))
    return (
        paths.withColumn(
            "total", F.sum("n_paths").over(Window.partitionBy())
        )
        .withColumn("share", round_ratio("n_paths", "total", 4))
        .drop("total")
        .orderBy(F.desc("n_paths"), "path")
        .limit(20)
    )


register(
    "events_top_paths",
    sql="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS p1,
             lag(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS p2
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
    ),
    p AS (
      SELECT p1 || ' > ' || p2 || ' > ' || event_type AS path,
             count(*) AS n_paths
      FROM s WHERE p1 IS NOT NULL AND p2 IS NOT NULL
      GROUP BY 1
    )
    , p2 AS (
      SELECT path, n_paths, sum(n_paths) OVER () AS total FROM p
    )
    SELECT path, n_paths, {rr} AS share
    FROM p2
    ORDER BY n_paths DESC, path
    LIMIT 20
    """.format(rr=sql_round_ratio("n_paths", "total", 4)),
)(events_top_paths)


# --- Near-duplicate event suppression (debounce) --------------------------------
# 6 hours: drops ~10% of the synthetic events at sf0.01 — enough signal
# to prove the filter bites, small enough that the output is still the
# stream (measured via the gap CDF, not guessed).
DEBOUNCE_GAP_S = 21600


@memoized_build("events")
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppress near-duplicate events: drop any event within
    DEBOUNCE_GAP_S of the PREVIOUS event of the same (user_id,
    event_type) — the standard retry/jitter dedupe for at-least-once
    delivery (gap-to-previous-raw-event semantics, deliberately not the
    chained keep-anchored debounce, which is inherently sequential).

    One (user_id, event_type) window exchange; the gap is integer
    microsecond arithmetic (unix_micros/epoch_us) so both engines derive
    the same longs, and the survivor set is a stateless filter — at
    scale this is one shuffle and the filter runs map-side after it.
    Boundary rule: gap == DEBOUNCE_GAP_S drops (strict > survives)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.withColumn("gap_us", gap)
        .filter(
            F.col("gap_us").isNull()
            | (
                F.col("gap_us")
                > F.lit(DEBOUNCE_GAP_S * 1_000_000).cast("long")
            )
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            F.round(F.col("gap_us") / 1e6, 6).alias("prev_gap_s"),
        )
        .orderBy("event_id")
    )


# Shared with the streaming stateful twin (streaming/stateful.py), which
# registers under the SAME oracle — a full value-hash parity check on a
# custom stateful streaming operator (the session_aggregate_stateful
# precedent).
DEBOUNCE_SQL = f"""
    WITH t AS (
      SELECT event_id, user_id, event_type, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS gap_us
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
    )
    SELECT event_id, user_id, event_type, ts,
           round(gap_us / 1e6, 6) AS prev_gap_s
    FROM t
    WHERE gap_us IS NULL OR gap_us > {DEBOUNCE_GAP_S}::BIGINT * 1000000
    ORDER BY event_id
    """

register("events_debounce", sql=DEBOUNCE_SQL)(events_debounce)


# --- Spend distribution (percent_rank / cume_dist) -------------------------------
@memoized_build("orders")
def customer_spend_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's position in the revenue distribution:
    percent_rank (share of OTHER customers strictly below) and cume_dist
    (share at-or-below) — the two rank-normalizing window functions the
    RFM/ABC operators above deliberately avoid for scoring, exposed
    directly for when the caller wants the raw percentile position.

    Deterministic across engines because the (rev_cents, o_custkey)
    ordering is unique — no peer groups, so both functions reduce to
    pure rank arithmetic, computed here explicitly as exact-integer
    ratios ((i-1)/(n-1) and i/n through the half-up identity in
    functions/rounding.py) rather than the builtins, whose double
    rounding diverges at half-way points. Revenue sums as exact cents.
    Same dim-sized-aggregate window justification as the ABC
    classifier; same NULL exclusions (DESC NULL placement divergence).
    A single-customer frame defines pct_rank = 0 (the builtins' n=1
    convention), guarding the (n-1) denominator."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    rev = orders.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("rev_cents")
    )
    w = Window.orderBy("rev_cents", "o_custkey")
    ranked = rev.select(
        "o_custkey",
        "rev_cents",
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return ranked.select(
        "o_custkey",
        (F.col("rev_cents").cast("double") / 100).alias("revenue"),
        F.when(F.col("n") > 1, round_ratio("i - 1", "n - 1", 6))
        .otherwise(F.lit(0.0))
        .alias("spend_pct_rank"),
        round_ratio("i", "n", 6).alias("spend_cume_dist"),
    ).orderBy("o_custkey")


register(
    "customer_spend_distribution",
    sql="""
    WITH rev AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
      GROUP BY 1
    ),
    ranked AS (
      SELECT o_custkey, rev_cents,
             row_number() OVER (ORDER BY rev_cents, o_custkey) AS i,
             count(*) OVER () AS n
      FROM rev
    )
    SELECT o_custkey, CAST(rev_cents AS DOUBLE) / 100 AS revenue,
           CASE WHEN n > 1 THEN {pr} ELSE 0.0 END AS spend_pct_rank,
           {cd} AS spend_cume_dist
    FROM ranked ORDER BY o_custkey
    """.format(
        pr=sql_round_ratio("i - 1", "n - 1", 6),
        cd=sql_round_ratio("i", "n", 6),
    ),
)(customer_spend_distribution)


# --- Robust outlier detection (median / MAD) -------------------------------------
@memoized_build("events")
def events_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier screen on the value column: exact median,
    MAD (median absolute deviation), and the count of modified-z
    outliers (|0.6745 * dev / MAD| > 3.5, Iglewicz-Hoaglin) — the screen
    a training pipeline runs on numeric features where mean/stddev are
    themselves corrupted by the outliers being hunted.

    Inherently multi-pass (MAD is a median OF deviations FROM a median),
    but every reduce is dim-sized and broadcast back: pass 1 reduces the
    facts to one median per type, pass 2 reduces the deviations to one
    MAD per type, pass 3 counts threshold crossers — three event_type
    hash-aggs, stateless projections between, nothing but |types|-row
    frames ever broadcast. The med/mad frames are localCheckpoint'ed
    (the dedup_graph_stats precedent): each fans into 2+ plan positions
    and would otherwise re-run its whole upstream fact scan per
    position — with the checkpoint the plan is exactly three fact
    scans (gated in test_plans); persisting the deviation frame would
    make it two. Zero-MAD types (constant
    or >50% one value) report zero outliers rather than dividing by
    zero; NULL and NON-FINITE values are excluded on both engines (no
    deviation — and a NaN inside a median's sort diverges across
    engines' quantile placements, the r10 NaN-plant find).
    All arithmetic is double-precision in identical expression order,
    so the 3.5 threshold comparison is bit-deterministic across
    engines."""
    # memoized_build: the build runs two eager percentile jobs (med,
    # then mad/count) to produce the literal maps below — per-stamp-
    # identical, so rebuilding per invocation was pure waste (the
    # centroid_bc precedent; the returned plan still EXECUTES per
    # invocation).
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") != F.lit(float("inf")))
    )
    # r13: the med/mad frames used to be localCheckpoint'ed and
    # broadcast-JOINED back into the fact — 13 Spark jobs end to end
    # (each eager checkpoint spawns its own AQE job chain). They are
    # dim-sized (one row per event_type, the same bound the broadcast
    # relied on), so collect them to the driver and re-attach as
    # literal CASE expressions instead (the centroid/DSIR/bloom
    # precedent): 3 jobs total, and the FINAL plan is one fact scan
    # with zero joins. The collected doubles round-trip py4j as exact
    # IEEE values, so `value - med` / the 3.5 threshold comparison are
    # bit-identical to the join form. At a type cardinality where the
    # CASE would bloat, the broadcast join is the right form again —
    # the bound here is |event_type|, which is dim-like by schema.
    def _case(mapping: dict, dtype: str):
        expr = F.lit(None).cast(dtype)
        for k in sorted(mapping, reverse=True):
            expr = F.when(F.col("event_type") == F.lit(k), F.lit(mapping[k])).otherwise(expr)
        return expr

    med_rows = (
        ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("med"))
        .collect()
    )
    med_map = {r["event_type"]: r["med"] for r in med_rows}
    adev = F.abs(F.col("value") - _case(med_map, "double"))
    stat_rows = (
        ev.select("event_type", adev.alias("adev"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_values"),
            F.expr("percentile(adev, 0.5)").alias("mad"),
        )
        .collect()
    )
    n_map = {r["event_type"]: r["n_values"] for r in stat_rows}
    mad_map = {r["event_type"]: r["mad"] for r in stat_rows}
    mad_c = _case(mad_map, "double")
    return (
        ev.select("event_type", adev.alias("adev"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    (mad_c > 0)
                    & (F.lit(0.6745) * F.col("adev") / mad_c > F.lit(3.5)),
                    1,
                )
                .otherwise(0)
            ).alias("n_outliers")
        )
        .select(
            "event_type",
            _case(n_map, "long").alias("n_values"),
            F.round(_case(med_map, "double"), 6).alias("median_value"),
            F.round(_case(mad_map, "double"), 6).alias("mad"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


register(
    "events_value_mad",
    sql="""
    WITH ev AS (
      SELECT event_type, value FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
        AND isfinite(value)
    ),
    med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM ev GROUP BY 1
    ),
    dev AS (
      SELECT ev.event_type, ev.value, m.med,
             abs(ev.value - m.med) AS adev
      FROM ev JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, count(*) AS n_values, any_value(med) AS med,
             quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.event_type, any_value(m.n_values) AS n_values,
           round(any_value(m.med), 6) AS median_value,
           round(any_value(m.mad), 6) AS mad,
           CAST(sum(CASE WHEN m.mad > 0
                          AND 0.6745 * d.adev / m.mad > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1
    ORDER BY 1
    """,
)(events_value_mad)


# --- Sliding-window incremental view (insert + RETRACT maintenance) -------------
# The 7-day serving window slides one day: [Jan 22, Jan 29) -> [Jan 23, Jan 30).
SLIDE_NEW_END = "2024-01-30 00:00:00"
SLIDE_NEW_START = "2024-01-23 00:00:00"
SLIDE_OLD_START = "2024-01-22 00:00:00"
SLIDE_OLD_END = "2024-01-29 00:00:00"


@memoized_build("events")
def events_by_src_sliding_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sliding-window view maintenance with RETRACTIONS:
    counts[new window] = counts[old window] − expired + arrived, where
    expired is the day that slid out and arrived the day that slid in —
    the delta identity behind every sliding dashboard window
    (events_by_src_incremental above is the insert-only half; TTL
    retention handles the storage side; this maintains the AGGREGATE).

    The oracle recomputes the new window directly, so the driver hash
    proves merge-with-retraction == recompute on every run. Scale shape:
    expired and arrived each aggregate ONE day's partition-pruned scan
    (the old-window aggregate is state, not a scan, in a real pipeline —
    here it is recomputed so the identity is checkable end-to-end), the
    three key-sized frames merge by full-outer joins, and keys whose
    count reaches zero are RETRACTED (dropped), matching the recompute
    exactly. NULL ts excluded; NULL src kept via null-safe join keys."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())

    def counts(lo: str, hi: str) -> DataFrame:
        return (
            ev.filter(
                (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(hi).cast("timestamp"))
            )
            .groupBy(F.col("user_id").alias("src"))
            .agg(F.count("*").alias("n"))
        )

    old = counts(SLIDE_OLD_START, SLIDE_OLD_END).alias("o")
    exp = counts(SLIDE_OLD_START, SLIDE_NEW_START).alias("e")
    arr = counts(SLIDE_OLD_END, SLIDE_NEW_END).alias("a")
    merged = (
        old.join(exp, F.col("o.src").eqNullSafe(F.col("e.src")), "full_outer")
        .select(
            F.coalesce(F.col("o.src"), F.col("e.src")).alias("src"),
            (
                F.coalesce(F.col("o.n"), F.lit(0))
                - F.coalesce(F.col("e.n"), F.lit(0))
            ).alias("n_kept"),
        )
        .alias("m")
    )
    return (
        merged.join(
            arr, F.col("m.src").eqNullSafe(F.col("a.src")), "full_outer"
        )
        .select(
            F.coalesce(F.col("m.src"), F.col("a.src")).alias("src"),
            (
                F.coalesce(F.col("m.n_kept"), F.lit(0))
                + F.coalesce(F.col("a.n"), F.lit(0))
            ).alias("window_visits"),
        )
        .filter(F.col("window_visits") > 0)  # retraction: zero rows drop out
        .orderBy(F.col("src").asc_nulls_first())
    )


register(
    "events_by_src_sliding_incremental",
    sql=f"""
    SELECT user_id AS src, count(*) AS window_visits
    FROM events
    WHERE ts >= TIMESTAMP '{SLIDE_NEW_START}'
      AND ts < TIMESTAMP '{SLIDE_NEW_END}'
    GROUP BY user_id
    ORDER BY src NULLS FIRST
    """,
)(events_by_src_sliding_incremental)
