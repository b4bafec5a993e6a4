"""Property-based tests (hypothesis): operator semantics hold for ALL
inputs, not just the fixture distributions. Few examples, small frames —
each example runs real Spark jobs."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(ips=st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=50))
@settings(**SETTINGS)
def test_ip_roundtrip_any_uint32(spark, ips):
    from app_fastdata_spark.functions.ip import int_to_ip, ip_to_int

    df = spark.createDataFrame([(i,) for i in ips], "ip long")
    out = df.select(
        "ip", ip_to_int(int_to_ip(F.col("ip"))).alias("back")
    ).collect()
    assert all(r.ip == r.back for r in out)


@given(
    gaps=st.lists(st.integers(0, 120), min_size=1, max_size=40),
    gap_rule=st.integers(1, 60),
)
@settings(**SETTINGS)
def test_session_starts_match_python_reference(spark, gaps, gap_rule):
    """The lag-window sessionizer equals a sequential fold for any
    inter-arrival sequence and any gap threshold."""
    from app_fastdata_spark.operators.sessions import session_starts_df

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    ts, t = [], base
    for g in gaps:
        t = t + timedelta(seconds=g)
        ts.append(t)
    rows = [(i, t.replace(tzinfo=None), 1, "x", 0.0, None) for i, t in enumerate(ts)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    got = sorted(
        r.event_id for r in session_starts_df(df, gap_seconds=gap_rule).collect()
    )
    # python reference: first event starts a session; later events start one
    # iff the gap from the previous event exceeds the rule
    want = [0] + [i for i in range(1, len(ts)) if gaps[i] > gap_rule]
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-1000, 1000)),
        min_size=1,
        max_size=60,
    ),
    n_salts=st.integers(2, 8),
)
@settings(**SETTINGS)
def test_salted_sum_equals_direct(spark, rows, n_salts):
    from app_fastdata_spark.plans.skew import salted_sum

    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "k int, v long, rid long"
    )
    direct = {
        r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    salted = {
        r.k: r.v
        for r in salted_sum(df, "k", "v", salt_from="rid", n_salts=n_salts).collect()
    }
    assert direct == salted
