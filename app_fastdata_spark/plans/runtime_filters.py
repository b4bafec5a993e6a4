"""Runtime Bloom-filter join pruning — the 100 TB fact⋈filtered-fact
technique.

When a shuffle join's build side is selective (a filtered orders slice)
and the probe side is a huge scan (lineitem), Spark can inject a Bloom
filter built from the build side's join keys into the probe side's scan
(`might_contain(...)` under an ObjectHashAggregate of bloom_filter_agg)
— probe rows that cannot match are dropped at the scan, before the
shuffle. At 100 TB this turns a full-fact shuffle into a
selectivity-sized one without any manual pre-join.

Spark enables this by default
(spark.sql.optimizer.runtime.bloomFilter.enabled) but only injects when
the probe side's estimated scan exceeds
`applicationSideScanSizeThreshold` (10 GB default) — correct at cluster
scale, never true at test SF. `bloom_pruned_join` scopes the threshold
down so the mechanism itself is exercised and plan-gated at test scale
(tests/test_scale_plans.py asserts `might_contain` reaches the probe
plan and that results equal the plain join).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table


@contextmanager
def _scoped_conf(spark: SparkSession, **confs: str):
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ urgent-orders as a shuffle join with a runtime Bloom
    filter injected into the lineitem probe side. Returns the joined
    frame; the plan carries might_contain(...) on the probe scan.

    The conf scope only lowers the probe-size threshold (a test-scale
    stand-in for a 10 GB+ scan) and disables auto-broadcast so the join
    actually shuffles — no semantic knobs change, and results are
    identical to the plain join (asserted in tests)."""
    with _scoped_conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold": "0",
        },
    ):
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        # force plan resolution inside the conf scope (rule injection
        # happens at optimization time)
        joined._jdf.queryExecution().optimizedPlan()
        return joined
