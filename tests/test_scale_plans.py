"""Scale-technique tests: salted aggregation equivalence + plan shape,
bucketed co-located joins eliminating the exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from app_fastdata_spark.catalog import queries
from app_fastdata_spark.plans.bucketing import colocated_join, write_bucketed
from app_fastdata_spark.plans.skew import salted_sum
from app_fastdata_spark.tables import load_table


def test_salted_top_users_matches_direct(spark, sf_dir):
    qs = queries()
    direct = qs["top_users"](spark, sf_dir).collect()
    salted = qs["top_users_salted"](spark, sf_dir).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in salted]


def test_salted_sum_two_phase_plan(spark, sf_dir):
    """The salted rewrite must actually shuffle on (key, salt) first."""
    ev = load_table(spark, sf_dir, "events").withColumn("one", F.lit(1))
    df = salted_sum(ev, "user_id", "one", salt_from="event_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    assert plan.count("Exchange hashpartitioning") == 2  # partial + final


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    write_bucketed(
        ev.select("event_id", "user_id", "value"), "ev_bucketed_a", "user_id"
    )
    write_bucketed(
        ev.select("user_id", "event_type"), "ev_bucketed_b", "user_id"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "ev_bucketed_a", "ev_bucketed_b", "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan
        # and it actually computes
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS ev_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS ev_bucketed_b")


def test_registered_bucketed_join_is_exchange_free(spark, sf_dir):
    """The driver-visible bucketed_colocated_join: the fact-dim join
    itself must carry NO Exchange on either side (the shuffle happened
    once, at bucketed-write time); only the dim-sized final rollup may
    shuffle."""
    from app_fastdata_spark.plans.bucketing import colocated_fact_dim

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_fact_dim(spark, sf_dir)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_query_matches_unbucketed(spark, sf_dir):
    """Bucketing is a physical layout choice, never a semantic one: the
    registered rollup equals the same plan over plain (unbucketed)
    reads."""
    from app_fastdata_spark.catalog import queries
    from app_fastdata_spark.tables import load_table

    got = [tuple(r) for r in queries()["bucketed_colocated_join"](spark, sf_dir).collect()]
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.min("event_type").alias("fav_type"))
    want = [
        tuple(r)
        for r in ev.join(dim, "user_id")
        .groupBy("fav_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("fav_type")
        .collect()
    ]
    assert got == want


def test_bloom_filter_prunes_probe_side(spark, sf_dir):
    """The runtime Bloom filter must reach the probe (lineitem) side of
    the shuffle join, and pruning must not change the result."""
    from app_fastdata_spark.plans.runtime_filters import bloom_pruned_join
    from app_fastdata_spark.tables import load_table

    joined = bloom_pruned_join(spark, sf_dir)
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan, plan
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == want
