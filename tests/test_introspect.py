"""U5 system-procedure parity tests."""

from __future__ import annotations

from app_fastdata_spark import introspect as I


def test_adhoc_over_registered_views(spark, sf_dir):
    I.register_views(spark, sf_dir)
    n = I.adhoc(spark, "SELECT count(*) AS n FROM events").collect()[0].n
    assert n > 0
    joined = I.adhoc(
        spark,
        """
        SELECT r_name, count(*) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """,
    ).collect()
    assert len(joined) == 5


def test_table_statistics(spark, sf_dir):
    stats = I.table_statistics(spark, sf_dir)
    by_name = {s["table"]: s for s in stats}
    assert set(by_name) == set(I.TABLE_NAMES)
    assert all(s["tuple_count"] > 0 for s in stats)
    assert by_name["events"]["partitions"] >= 1


def test_partition_keys(spark, sf_dir):
    info = I.partition_keys(spark, sf_dir)
    assert info["table"] == "events" and info["num_partitions"] >= 1


def test_system_catalog_lists_views(spark, sf_dir):
    I.register_views(spark, sf_dir)
    names = {t["name"] for t in I.system_catalog(spark)}
    assert {"events", "lineitem", "documents"} <= names


def test_explain_query_formatted(spark, sf_dir):
    txt = I.explain_query(spark, sf_dir, "top_users")
    assert "Physical Plan" in txt and "Scan parquet" in txt


def test_streaming_progress_shape(spark, sf_dir):
    from app_fastdata_spark.streaming import pipeline as P

    q = (
        P.per_second_counts(P.events_stream(spark, sf_dir))
        .writeStream.format("noop")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    prog = I.streaming_progress(q)
    assert prog["numInputRows"] > 0
    assert prog["stateRows"] > 0


def test_procedure_profile_accumulates(spark, sf_dir):
    """U5 @Statistics PROCEDUREPROFILE: profiled invocations accumulate
    per-procedure wall stats (voltdb-dashboard.js:100-160 polls the same
    shape: name, invocations, avg/min/max latency)."""
    I.profiled_call(spark, sf_dir, "top_users")
    I.profiled_call(spark, sf_dir, "top_users")
    I.profiled_call(spark, sf_dir, "top_sources")
    rows = {r["procedure"]: r for r in I.procedure_profile()}
    assert rows["top_users"]["invocations"] >= 2
    assert rows["top_sources"]["invocations"] >= 1
    for r in rows.values():
        assert r["min_ms"] <= r["avg_ms"] <= r["max_ms"]
        assert r["total_ms"] >= r["max_ms"]
    # heaviest-first ordering
    totals = [r["total_ms"] for r in I.procedure_profile()]
    assert totals == sorted(totals, reverse=True)


def test_procedure_profile_registered_query(spark, sf_dir):
    """The registered rows-only entry executes and returns stable schema."""
    from app_fastdata_spark.catalog import queries

    df = queries()["procedure_profile"](spark, sf_dir)
    assert df.columns == [
        "procedure", "invocations", "avg_ms", "min_ms", "max_ms", "total_ms",
    ]
    got = {r.procedure for r in df.collect()}
    assert {"top_users", "events_by_second"} <= got


def test_procedure_profile_concurrent_invocations(spark, sf_dir):
    """The accumulator update is lock-guarded: concurrent profiled_call
    invocations from multiple driver threads must not lose counts (the
    modeled dashboard polls while procedures run)."""
    import threading

    before = {r["procedure"]: r["invocations"] for r in I.procedure_profile()}
    base = before.get("events_by_second", 0)
    per_thread, n_threads = 2, 4

    def worker():
        for _ in range(per_thread):
            I.profiled_call(spark, sf_dir, "events_by_second")

    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    rows = {r["procedure"]: r for r in I.procedure_profile()}
    assert rows["events_by_second"]["invocations"] == base + per_thread * n_threads
