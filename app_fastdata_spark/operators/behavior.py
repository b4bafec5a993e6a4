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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# Testdata events span Jan 2024; the midpoint splits base/delta for the
# merge (same constant as stats.MID_TS — kept literal so the oracle SQL
# string and the Spark predicate can't drift apart).
MID_TS = "2024-01-16 00:00:00"


# --- Weekly cohort retention ---------------------------------------------------
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
        mat.withColumn(
            "retention_pct",
            F.round(
                F.col("n_active") / F.first("n_active").over(w), 4
            ),
        )
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
    SELECT cohort_week, week_offset, n_active,
           round(n_active * 1.0 / first_value(n_active) OVER (
             PARTITION BY cohort_week ORDER BY week_offset), 4)
             AS retention_pct
    FROM mat
    ORDER BY cohort_week, week_offset
    """,
)(events_cohort_retention)


# --- Event-type transition matrix ---------------------------------------------
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
        c.withColumn(
            "transition_prob",
            F.round(
                F.col("n_transitions") / F.sum("n_transitions").over(wp), 4
            ),
        )
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
    SELECT from_type, to_type, n_transitions,
           round(n_transitions * 1.0 / sum(n_transitions) OVER (
             PARTITION BY from_type), 4) AS transition_prob
    FROM c
    ORDER BY from_type, to_type
    """,
)(events_type_transitions)


# --- CDC latest-wins upsert merge ---------------------------------------------
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
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )

    def latest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "ts", "event_type", "value")
        )

    base = latest(ev.filter(F.col("ts") < F.lit(MID_TS).cast("timestamp")))
    delta = latest(ev.filter(F.col("ts") >= F.lit(MID_TS).cast("timestamp")))
    b, d = base.alias("b"), delta.alias("d")
    in_delta = F.col("d.ts").isNotNull()
    return (
        b.join(d, F.col("b.user_id") == F.col("d.user_id"), "full_outer")
        .select(
            F.coalesce(F.col("b.user_id"), F.col("d.user_id")).alias(
                "user_id"
            ),
            F.when(in_delta, F.col("d.ts")).otherwise(F.col("b.ts")).alias(
                "last_ts"
            ),
            F.when(in_delta, F.col("d.event_type"))
            .otherwise(F.col("b.event_type"))
            .alias("last_type"),
            F.when(in_delta, F.col("d.value"))
            .otherwise(F.col("b.value"))
            .alias("last_value"),
            F.when(F.col("b.ts").isNull(), F.lit("insert"))
            .when(F.col("d.ts").isNull(), F.lit("keep"))
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

    Weights come from integer microsecond arithmetic (unix_micros /
    epoch_us) so both engines derive bit-identical doubles; the last
    event of each user has no holding period and is excluded, as are
    single-event users (zero total weight). One user_id window exchange,
    then a per-user rollup on the already-partitioned frame."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.withColumn("t_us", F.unix_micros("ts")).withColumn(
        "dt_s",
        (F.lead("t_us").over(w) - F.col("t_us")) / F.lit(1e6),
    ).filter(F.col("dt_s").isNotNull())
    return (
        t.groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.round(F.sum("dt_s"), 6).alias("observed_sec"),
            F.round(F.avg("value"), 4).alias("plain_avg"),
            F.round(
                F.sum(F.col("value") * F.col("dt_s")) / F.sum("dt_s"), 4
            ).alias("time_weighted_avg"),
        )
        .orderBy("user_id")
    )


register(
    "events_time_weighted_avg",
    sql="""
    WITH t AS (
      SELECT user_id, value,
             (lead(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
              - epoch_us(ts)) / 1e6 AS dt_s
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
    )
    SELECT user_id,
           count(*) AS n_intervals,
           round(sum(dt_s), 6) AS observed_sec,
           round(avg(value), 4) AS plain_avg,
           round(sum(value * dt_s) / sum(dt_s), 4) AS time_weighted_avg
    FROM t
    WHERE dt_s IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
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
