"""Oracle parity: every registered query with an oracle must match DuckDB
on row count, column names, and order-insensitive value hash — the same
gate the driver runs (t2). Mirrors tools/check_oracle.py at sf0.001 for
speed (driver runs sf0.01).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from app_fastdata_spark.catalog import oracles, queries
from app_fastdata_spark.tables import TABLE_NAMES

from tools.check_oracle import normalize


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    # Pin DuckDB's budget: its default limit derives from SYSTEM memory,
    # which the long-lived Spark JVM is also claiming during a full-suite
    # run — under pressure that intermittently OOM'd a batch of parity
    # tests. 8 GB is ~20x what the heaviest oracle needs at sf0.001.
    con.execute("SET memory_limit='8GB'")
    con.execute("SET threads=8")
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con




def _parity_failures(spark, con, d, names):
    """The one compare loop all sweeps share: run each named query on
    Spark (at dir `d`) and its oracle on `con`, collect mismatches and
    exceptions instead of stopping at the first."""
    qs, os_ = queries(), oracles()
    failures = []
    for n in sorted(names):
        try:
            sdf = qs[n](spark, d)
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(os_[n])
            dcols = [c[0] for c in res.description]
            drows = res.fetchall()
            if not (
                len(srows) == len(drows)
                and sorted(sdf.columns) == sorted(dcols)
                and normalize(srows, sdf.columns) == normalize(drows, dcols)
            ):
                failures.append(f"{n}: rows {len(srows)}/{len(drows)}")
        except Exception as e:  # noqa: BLE001 — collect all failures
            failures.append(f"{n}: {type(e).__name__}: {str(e)[:120]}")
    return failures



_oracle_names = sorted(oracles().keys())


@pytest.mark.parametrize("name", _oracle_names)
def test_query_matches_oracle(name, spark, sf_dir, ddb):
    sdf = queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(oracles()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    assert sorted(sdf.columns) == sorted(dcols)
    assert normalize(srows, sdf.columns) == normalize(drows, dcols)


def test_rows_only_queries_run(spark, sf_dir):
    qs, os_ = queries(), oracles()
    for name in sorted(set(qs) - set(os_)):
        rows = qs[name](spark, sf_dir).collect()
        assert len(rows) >= 0  # must at least execute with a stable schema


def test_degenerate_text_parity_all_doc_oracles(spark, sf_dir, tmp_path):
    """Every documents-table oracle must agree across engines on a corpus
    containing the degenerate rows the schema allows: NULL text, empty
    text, whitespace-only text, and a single-token doc. Round 5 found
    and fixed real divergences here (shingle UDF crash on NULL, CASE vs
    skipped-NULL averaging, -0.0 entropy, NULL vs 0 rolling hash, NULL
    multimodal payloads) — this pins all of them."""
    import duckdb as _ddb

    from app_fastdata_spark.tables import load_table

    d = str(tmp_path / "degen")
    base = load_table(spark, sf_dir, "documents").limit(20)
    extra = spark.createDataFrame(
        [
            (999_991, None, "en", "srcX", 0),
            (999_992, "", "en", "srcX", 0),
            (999_993, "   ", "de", "srcX", 3),
            (999_994, "solitary", "es", "srcX", 8),
            # PII-laden doc: exercises the scan/scrub/url oracles on
            # actual hits (the synthetic corpus has none)
            (
                999_995,
                "mail a@b.co or x.y_z%q@sub.example.org ip 10.0.0.1 "
                "card 1234567890123456 see https://Sub.Example.COM/p and "
                "http://a-b.io plus overlapping e@10.0.0.1.com",
                "en",
                "srcX",
                120,
            ),
            # Unicode stress: NBSP (U+00A0 — Java \\s does NOT match it,
            # RE2/DuckDB agreement must be checked), sharp-s ß (whose
            # uppercase is SS — lower() casing tables differ across
            # libs), CJK run with no spaces (single giant token),
            # combining accent (e + U+0301 vs precomposed é), emoji
            (
                999_996,
                "café café STRAẞE straße"
                " A B 中文文本😀 end",
                "de",
                "srcX",
                60,
            ),
            # LEADING/TRAILING Unicode space (r9 fuzzer find): DuckDB's
            # bare trim() strips NBSP/em-space where Spark's trim (and
            # the UDF's strip(' ')) are ASCII-space-only -- every oracle
            # now pins trim(x, ' '); this doc keeps them honest
            (
                999_997,
                "\xa0edge doc with unicode margins and tokens\u2003",
                "en",
                "srcX",
                44,
            ),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    base.unionByName(extra).coalesce(1).write.parquet(f"{d}/documents.parquet")
    import shutil as _sh

    _sh.copy(f"{sf_dir}/embeddings.parquet", f"{d}/embeddings.parquet")

    con = _ddb.connect()
    con.execute("SET memory_limit='8GB'")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    qs, os_ = queries(), oracles()
    doc_qs = [
        n for n, sql in os_.items() if "documents" in sql and "events" not in sql
    ]
    assert len(doc_qs) >= 40
    failures = _parity_failures(spark, con, d, doc_qs)
    assert not failures, failures


@pytest.mark.slow
def test_adversarial_second_corpus_parity_doc_oracles(
    spark, sf_dir, tmp_path
):
    """Every documents-table oracle must agree across engines on the
    ADVERSARIAL second corpus (tools/second_corpus.py — r12 judge
    Next #8): real-ish URLs, heavy unicode (astral emoji, combining
    marks, RTL, zero-width), exact/near-dup clusters, boilerplate,
    PII, extreme lengths. The text operators' constants were tuned on
    the one driver corpus; this sweep catches distribution-coupled
    parity breaks (regex unit mismatches, codepoint-vs-UTF-16 lengths,
    casing tables) before a driver round can."""
    import duckdb as _ddb

    from tools.second_corpus import generate

    d = generate(str(tmp_path / "adv"), sf_dir)
    con = _ddb.connect()
    con.execute("SET memory_limit='8GB'")
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    os_ = oracles()
    doc_qs = [
        n for n, sql in os_.items() if "documents" in sql and "events" not in sql
    ]
    assert len(doc_qs) >= 40
    failures = _parity_failures(spark, con, d, doc_qs)
    assert not failures, failures


def test_degenerate_events_parity_all_event_oracles(spark, sf_dir, tmp_path):
    """Every events-table oracle must agree across engines on a corpus
    with the degenerate rows the schema allows — NULL value, NULL props,
    malformed JSON props — written as a Spark DIRECTORY table with
    legacy INT96 timestamps (the layout any existing lake contains).
    Round 5 found real gaps here: the raw-long read path crashing on
    INT96, the file-stream glob matching nothing under directory
    layouts, strict-vs-permissive JSON, and NULLS-LAST crowning cluster
    0 on NULL scores."""
    import os as _os

    import duckdb as _ddb

    from app_fastdata_spark.tables import load_table

    d = str(tmp_path / "degen_ev")
    _os.makedirs(d)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    base = load_table(spark, sf_dir, "events").select(*cols).limit(200)
    extra = spark.createDataFrame(
        [
            # INSIDE the AS_OF recency window (params.AS_OF minus minutes)
            # so the windowed serving oracles exercise the NULLs too
            (888_881, "2024-01-30 23:59:01", 7, "click", None, None),
            (888_882, "2024-01-30 23:59:02", 8, "view", 1.5, "{not json"),
            (888_883, "2024-01-30 23:59:03", 9, "purchase", None, '{"k":"z9"}'),
            # string-typed JSON number: Spark's from_json('k int') is
            # strict (NULL); the oracle must not coerce it either
            (888_884, "2024-01-30 23:59:04", 10, "click", 2.0, '{"k":"7"}'),
            # double-typed JSON numbers: from_json('k int') is strictly
            # integral (NULL for 2.7 AND 30.0); DuckDB json_type says
            # DOUBLE for both and TRY_CAST would round — the oracle must
            # not admit DOUBLE
            (888_885, "2024-01-30 23:59:05", 11, "view", 4.0, '{"k": 2.7}'),
            (888_886, "2024-01-30 23:59:06", 12, "click", 5.0, '{"k": 30.0}'),
            # NULL user_id with non-NULL value: every score input NULLs
            # the argmin, so cluster views must drop it in BOTH engines
            # (NULLS-LAST rn would crown cluster 0 in the oracle)
            (888_887, "2024-01-30 23:59:07", None, "view", 6.0, '{"k": 3}'),
            # NULL ts: window ORDER BY ts places NULLs differently
            # (Spark NULLS FIRST vs DuckDB NULLS LAST) — every
            # interval/sequence operator must exclude it explicitly on
            # BOTH engines (the r8 events_merged_sessions phantom-session
            # break lived exactly here)
            (888_888, None, 14, "view", 1.0, None),
            # NaN value INSIDE the recency window (r9 verdict #8): a NaN
            # in a RANKING column floats to the top on both engines
            # (IEEE total order sorts NaN greatest — Spark and DuckDB
            # agree), poisons every sum/avg it joins, and ABORTS any
            # ANSI cast to integer it reaches (both engines reject
            # CAST(NaN AS BIGINT), but only if the operator lets it
            # get there). One plant in the serving window + one in the
            # interval-math region pins placement, propagation, and the
            # cast guards across every value-consuming events oracle.
            (888_889, "2024-01-30 23:59:08", 15, "purchase",
             float("nan"), None),
            (888_890, "2024-01-05 03:00:00", 888_953, "purchase",
             float("nan"), '{"k": 1}'),
            (888_891, "2024-01-05 03:01:00", 888_953, "view", 2.5, None),
            (888_892, "2024-01-05 03:02:00", 888_953, "click",
             float("inf"), None),
        ]
        + [
            # duplicate-timestamp user: every inter-event gap is 0 (and
            # one sub-millisecond), so the ms-quantized weight sum is 0 —
            # an unguarded weighted-average ratio ABORTS under ANSI
            # (DIVIDE_BY_ZERO) where DuckDB's // 0 returns NULL
            (888_940, "2024-01-05 01:00:00", 888_951, "click", 2.0, None),
            (888_941, "2024-01-05 01:00:00", 888_951, "click", 4.0, None),
            (888_942, "2024-01-05 01:00:00.000400", 888_951, "view", 6.0, None),
        ]
        + [
            # NEGATIVE values (refunds): integer-ratio numerators go
            # negative, where the half-up identity's `div` changes
            # meaning — BOTH engines truncate toward zero (measured:
            # DuckDB -7 // 2 = -3, not floor's -4; see
            # functions/rounding.py), so a negative numerator yields
            # round-half-TOWARD-ZERO on both sides with parity intact.
            # These rows pin that agreement (a regression on either
            # engine's div semantics would hash-mismatch here)
            (888_960, "2024-01-05 02:00:00", 888_952, "purchase", -3.5, None),
            (888_961, "2024-01-05 02:01:00", 888_952, "purchase", -1.25, None),
            (888_962, "2024-01-05 02:02:00", 888_952, "view", 2.0, None),
        ]
        + [
            # crafted round-boundary user: 32 transitions out of 'click'
            # with EXACTLY one going to 'view' -> probability 1/32 =
            # 0.03125, a half-way point at 4 dp (binary-EXACT, so both
            # engines' builtin round happens to agree here — the
            # binary-INEXACT divergent case, 3/20000, is pinned by
            # tests/test_rounding.py; every ratio oracle uses the
            # integer half-up identity in functions/rounding.py so
            # both flavors land on the same value)
            (
                888_900 + i,
                f"2024-01-05 00:{i:02d}:00",
                888_950,
                "click" if i < 32 else "view",
                None,
                None,
            )
            for i in range(33)
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    # INT96: the deprecated layout this test exists to cover
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        base.unionByName(extra).coalesce(1).write.parquet(f"{d}/events.parquet")
    finally:
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
    import shutil as _sh

    for t in TABLE_NAMES:
        if t != "events" and _os.path.exists(f"{sf_dir}/{t}.parquet"):
            _sh.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")

    con = _ddb.connect()
    con.execute("SET memory_limit='8GB'")
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    for t in TABLE_NAMES:
        if t != "events" and _os.path.exists(f"{d}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    qs, os_ = queries(), oracles()
    ev_qs = [n for n, sql in os_.items() if "events" in sql]
    assert len(ev_qs) >= 30
    failures = _parity_failures(spark, con, d, ev_qs)
    assert not failures, failures


def test_empty_tables_parity_all_oracles(spark, sf_dir, tmp_path):
    """Every oracle must agree across engines — and not crash — when
    every input table is EMPTY (schema-preserving 0-row parquet). "The
    arriving shard is empty" is a routine pipeline event, and empty
    aggregates are a classic cross-engine divergence nest (empty avg,
    empty windows, empty argmin, collect-on-empty driver paths)."""
    import duckdb as _ddb

    from app_fastdata_spark.tables import load_table

    d = str(tmp_path / "empty")
    for t in TABLE_NAMES:
        src = load_table(spark, sf_dir, t).limit(0)
        if t == "events":
            # write the PRODUCTION events schema — load_table derives
            # ts_ns, which a real shard does not contain
            src = src.drop("ts_ns")
        src.coalesce(1).write.parquet(f"{d}/{t}.parquet")

    con = _ddb.connect()
    con.execute("SET memory_limit='8GB'")
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'"
        )
    qs, os_ = queries(), oracles()
    failures = _parity_failures(spark, con, d, list(os_))
    # rows-only queries get a crash-only pass — the blind spot that let a
    # KMeans.fit-on-empty crash through the first version of this sweep
    for n in sorted(set(qs) - set(os_)):
        try:
            qs[n](spark, d).collect()
        except Exception as e:  # noqa: BLE001 — collect all failures
            failures.append(f"{n} (rows-only): {type(e).__name__}: {str(e)[:120]}")
    assert not failures, failures


def test_degenerate_orders_parity_all_order_oracles(spark, sf_dir, tmp_path):
    """Every orders-table oracle must agree across engines on a corpus
    with the degenerate rows the schema allows — NULL custkey, NULL
    orderdate, NULL totalprice, NULL status/priority, a zero price, and
    a customer whose EVERY order has a NULL price. Added after review
    found the RFM segment diverging on exactly that last shape (Spark
    format_string renders a NULL component as the text 'null'; DuckDB
    printf propagates NULL) — the documents/events sweeps could never
    see it because no sweep planted degenerate ORDERS rows."""
    import os as _os
    import shutil as _sh

    import duckdb as _ddb

    from app_fastdata_spark.tables import load_table

    d = str(tmp_path / "degen_ord")
    _os.makedirs(d)
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    base = load_table(spark, sf_dir, "orders").select(*cols).limit(200)
    extra = spark.createDataFrame(
        [
            # new customer whose every order has NULL price: monetary is
            # NULL end-to-end (the review-found RFM parity shape)
            (900_001, 777_777, "O", None, "2024-01-10", "1-URGENT"),
            (900_002, 777_777, "F", None, "2024-01-12", None),
            (900_003, None, "O", 123.45, "2024-01-11", "2-HIGH"),
            (900_004, 1, "F", 234.56, None, "3-MEDIUM"),
            (900_005, 2, None, 0.0, "2024-01-13", "4-NOT SPECIFIED"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    )
    # INT96 like the events sweep: a Spark µs-UTC write reads back as
    # TIMESTAMPTZ in DuckDB (tz-aware vs naive mismatch on every row);
    # the legacy layout is naive on both engines AND extends INT96
    # coverage to the orders read path
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        base.unionByName(extra).coalesce(1).write.parquet(
            f"{d}/orders.parquet"
        )
    finally:
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
    for t in TABLE_NAMES:
        if t != "orders" and _os.path.exists(f"{sf_dir}/{t}.parquet"):
            _sh.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")

    con = _ddb.connect()
    con.execute("SET memory_limit='8GB'")
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet/*.parquet'"
    )
    for t in TABLE_NAMES:
        if t != "orders" and _os.path.exists(f"{d}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    os_ = oracles()
    ord_qs = [n for n, sql in os_.items() if "orders" in sql]
    assert len(ord_qs) >= 15
    failures = _parity_failures(spark, con, d, ord_qs)
    assert not failures, failures


def test_zero_revenue_orders_parity(spark, sf_dir, tmp_path):
    """Every orders oracle must agree — and not crash — on a corpus
    whose TOTAL revenue rounds to less than one dollar (every price
    0.00 or NULL). Legal input that zeroes the dollar-scale share
    denominator in customer_revenue_abc: unguarded, Spark under ANSI
    aborts with DIVIDE_BY_ZERO while DuckDB's // 0 returns NULL."""
    import os as _os
    import shutil as _sh

    import duckdb as _ddb

    d = str(tmp_path / "zero_rev")
    _os.makedirs(d)
    rows = [
        (1, 10, "O", 0.0, "2024-01-10", "1-URGENT"),
        (2, 10, "F", 0.0, "2024-01-12", "2-HIGH"),
        (3, 11, "O", 0.0, "2024-01-11", "3-MEDIUM"),
        (4, 12, "F", None, "2024-01-09", None),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    )
    # INT96 like the sibling sweeps: a Spark µs-UTC write reads back as
    # TIMESTAMPTZ in DuckDB and every timestamp cell would mismatch
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        df.coalesce(1).write.parquet(f"{d}/orders.parquet")
    finally:
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
    for t in TABLE_NAMES:
        if t != "orders" and _os.path.exists(f"{sf_dir}/{t}.parquet"):
            _sh.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")

    con = _ddb.connect()
    con.execute("SET memory_limit='8GB'")
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet/*.parquet'"
    )
    for t in TABLE_NAMES:
        if t != "orders" and _os.path.exists(f"{d}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    os_ = oracles()
    ord_qs = [n for n, sql in os_.items() if "orders" in sql]
    failures = _parity_failures(spark, con, d, ord_qs)
    assert not failures, failures


def test_degenerate_tpch_parity_all_tpch_oracles(spark, sf_dir, tmp_path):
    """Every lineitem/part/supplier/customer oracle must agree across
    engines on tables with the degenerate rows the schema allows — NULL
    join keys, NULL filter columns, NULL measures, NULL group keys —
    written INT96 like the sibling sweeps. The marquee plant is a NULL
    s_suppkey on a NEGATIVE-balance supplier: SQL `NOT IN (subquery)`
    with a NULL in the list is three-valued-logic poison (every
    comparison UNKNOWN → zero rows survive) while a left-anti join just
    never matches the NULL — the q16 rewrite must pin ONE semantics on
    both engines."""
    import os as _os
    import shutil as _sh

    import duckdb as _ddb

    from app_fastdata_spark.tables import load_table

    d = str(tmp_path / "degen_tpch")
    _os.makedirs(d)
    plants = {
        "lineitem": (
            [
                # NULL date (range filters), NULL measures (sums/avgs),
                # NULL group keys (flag/status), NULL join keys
                (910_001, 1, 1, 9, 5.0, 100.0, 0.05, 0.01, "N", "O", None),
                (910_002, 1, 1, 9, None, None, None, None, "R", "F", "2024-01-05"),
                (910_003, 1, 1, 9, 3.0, 50.0, 0.0, 0.0, None, None, "2024-01-06"),
                (None, None, None, 9, 2.0, 25.0, 0.1, 0.02, "A", "F", "2024-01-07"),
            ],
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate string",
            ["l_shipdate"],
        ),
        "customer": (
            [
                (920_001, "Customer#degen1", None, None, None),
                (None, "Customer#degen2", 1, 10.0, "BUILDING"),
            ],
            "c_custkey long, c_name string, c_nationkey int,"
            " c_acctbal double, c_mktsegment string",
            [],
        ),
        "supplier": (
            [
                # the NOT-IN poison: negative balance, NULL key
                (None, "Supplier#degen1", 1, -5.0),
                (930_001, "Supplier#degen2", None, None),
            ],
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
            [],
        ),
        "part": (
            [
                (940_001, "degen part", None, None, None, None),
                (None, "degen part2", "Brand#11", "STANDARD BRUSHED TIN", 7, 901.0),
                # NULL price inside a POPULATED type group: the per-group
                # argmin must place the NULL identically on both engines
                # (min(struct) vs row_number ORDER BY price)
                (940_002, "degen part3", "Brand#12", "STANDARD BRUSHED TIN", 9, None),
            ],
            "p_partkey long, p_name string, p_brand string, p_type string,"
            " p_size int, p_retailprice double",
            [],
        ),
    }
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        for t, (rows, schema, ts_cols) in plants.items():
            base = load_table(spark, sf_dir, t).limit(300)
            extra = spark.createDataFrame(rows, schema)
            for c in ts_cols:
                extra = extra.withColumn(c, F.col(c).cast("timestamp"))
            base.unionByName(extra).coalesce(1).write.parquet(
                f"{d}/{t}.parquet"
            )
    finally:
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
    for t in TABLE_NAMES:
        if t not in plants and _os.path.exists(f"{sf_dir}/{t}.parquet"):
            _sh.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")

    con = _ddb.connect()
    con.execute("SET memory_limit='8GB'")
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        if t in plants:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'"
            )
        elif _os.path.exists(f"{d}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    import re as _re

    os_ = oracles()
    tq = [
        n
        for n, sql in os_.items()
        if _re.search(r"\b(lineitem|supplier|part)\b|\bcustomer\b", sql)
    ]
    assert len(tq) >= 25
    failures = _parity_failures(spark, con, d, tq)
    assert not failures, failures


def test_degenerate_embeddings_parity_all_embedding_oracles(
    spark, sf_dir, tmp_path
):
    """Every embeddings-table oracle must agree across engines on a
    corpus with the degenerate vectors the schema allows — NULL
    embedding, wrong-length vector, NULL component, NULL vec_id, the
    all-zero vector (norm 0 → 0/0 cosine), and an exact duplicate of a
    real vector (cosine-1.0 ties exercise every tiebreak). The doc/
    events/orders/tpch sweeps each found real bugs on day one; this
    closes the last unswept table."""
    import os as _os
    import shutil as _sh

    import duckdb as _ddb

    from app_fastdata_spark.operators.similarity import DIM
    from app_fastdata_spark.tables import load_table

    d = str(tmp_path / "degen_emb")
    _os.makedirs(d)
    base = load_table(spark, sf_dir, "embeddings").limit(200)
    dup = base.limit(1).collect()[0]
    rows = [
        (970_001, None, 0),                                  # NULL vector
        (970_002, [float(i) for i in range(DIM - 1)], 0),    # wrong length
        (970_003, [None] + [1.0] * (DIM - 1), 0),            # NULL component
        (None, [1.0] * DIM, 0),                              # NULL id
        (970_004, [0.0] * DIM, 0),                           # zero vector
        (970_005, [float(x) for x in dup.embedding], int(dup.label or 0)),
        # NaN / ±Inf components (r8 ADVICE): NaN != 0 is TRUE on both
        # engines, so these pass the vec_nonzero gate and flow into
        # norms, cosines, GEMM partials, and top-k rank ordering — the
        # plant proves the engines agree end-to-end on where non-finite
        # values land (IEEE total order: NaN greatest on both)
        (970_006, [float("nan")] + [1.0] * (DIM - 1), 0),
        (970_007, [float("inf")] + [1.0] * (DIM - 1), 0),
        (970_008, [float("-inf")] + [1.0] * (DIM - 1), 0),
    ]
    extra = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    base.unionByName(extra).coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    for t in TABLE_NAMES:
        if t != "embeddings" and _os.path.exists(f"{sf_dir}/{t}.parquet"):
            _sh.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")

    con = _ddb.connect()
    con.execute("SET memory_limit='8GB'")
    con.execute("SET TimeZone='UTC'")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM"
        f" '{d}/embeddings.parquet/*.parquet'"
    )
    for t in TABLE_NAMES:
        if t != "embeddings" and _os.path.exists(f"{d}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    os_ = oracles()
    emb_qs = [n for n, sql in os_.items() if "embeddings" in sql]
    assert len(emb_qs) >= 8
    failures = _parity_failures(spark, con, d, emb_qs)
    assert not failures, failures


def test_degenerate_dims_parity_nation_region(spark, sf_dir, tmp_path):
    """The last unswept tables: nation/region dim-side degeneracy. A
    real dim load carries NULL surrogate keys, NULL names, dangling
    region pointers, and duplicate names — each stresses a different
    join property of the 8 TPC-H oracles that broadcast these dims
    (NULL keys never equi-match on either engine; a dangling
    n_regionkey must drop through the inner join identically; duplicate
    n_name values multiply join fan-out the same way on both sides)."""
    import os as _os
    import shutil as _sh

    import duckdb as _ddb

    from app_fastdata_spark.tables import load_table

    d = str(tmp_path / "degen_dims")
    _os.makedirs(d)
    plants = {
        "nation": (
            [
                (None, "NULLKEYLAND", 1),        # NULL surrogate key
                (97, None, 1),                   # NULL name
                (98, "DANGLING", 99),            # dangling region pointer
                (96, "GERMANY", 3),              # duplicate name, real region
            ],
            "n_nationkey int, n_name string, n_regionkey int",
        ),
        "region": (
            [
                (None, "NULLREGION"),            # NULL surrogate key
                (97, None),                      # NULL name
            ],
            "r_regionkey int, r_name string",
        ),
    }
    for t, (rows, schema) in plants.items():
        base = load_table(spark, sf_dir, t)
        extra = spark.createDataFrame(rows, schema)
        base.unionByName(extra).coalesce(1).write.parquet(f"{d}/{t}.parquet")
    for t in TABLE_NAMES:
        if t not in plants and _os.path.exists(f"{sf_dir}/{t}.parquet"):
            _sh.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")

    con = _ddb.connect()
    con.execute("SET memory_limit='8GB'")
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        if t in plants:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'"
            )
        elif _os.path.exists(f"{d}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    import re as _re

    os_ = oracles()
    dim_qs = [
        n
        for n, sql in os_.items()
        if _re.search(r"\bnation\b|\bregion\b", sql)
    ]
    assert len(dim_qs) >= 8
    failures = _parity_failures(spark, con, d, dim_qs)
    assert not failures, failures


def test_r9_oom_victim_oracles_run_under_tight_memory_cap():
    """Adjacency reproduction of the r9 driver failure: the five rows
    CORRECTNESS_r09 lost to oracle-side DuckDB OOM ("failed to allocate
    16-32 KB") ran CONSECUTIVELY in one connection while the Spark JVM
    held most of the cgroup. Pin the fix (shared-norm `en` CTE, merged
    recall chain — similarity.py): all five oracles, back-to-back in ONE
    connection at the DRIVER's scale factor (sf0.01), must fit under a
    1 GB memory_limit — ~2x their measured 500 MB floor and ~8x below
    the envelope the r9 driver still had free. No Spark session needed:
    this is purely the DuckDB side."""
    con = duckdb.connect()
    con.execute("SET memory_limit='1GB'")
    con.execute("SET threads=8")
    sf_dir = "/root/testdata/sf0.01"
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    os_ = oracles()
    victims = [
        "dedup_components_embedding",
        "sim_ann_lsh",
        "sim_ann_ivf",
        "sim_ann_int8",
        "sim_ann_recall",
        # not r9 victims — the round-10 PQ/IVF-PQ oracles join the
        # same-connection envelope pin because they are the heaviest
        # additions since (per-subspace codeword assignment joins)
        "sim_ann_pq",
        "sim_ann_pq_recall",
        "sim_ann_ivfpq",
        "sim_ann_ivfpq_recall",
        "sim_semantic_survivors",
    ]
    for name in victims:
        rows = con.execute(os_[name]).fetchdf()
        assert len(rows) > 0, f"{name}: oracle returned no rows"
    con.close()


def test_known_duckdb_casing_divergences_documented(spark):
    """The r9 casing probe: Python str.lower() and Spark lower() agree
    on FULL Unicode case mapping including the final-sigma context rule
    — the engine-internal consistency every UDF↔JVM twin relies on —
    while DuckDB's utf8proc lower() diverges on exactly two known
    classes: U+0130 İ (full mapping emits i + combining dot; utf8proc
    emits bare i) and Greek capital sigma in final position (context
    rule → ς; utf8proc simple map → σ). These are VERIFICATION-TOOL
    limits, not engine bugs: oracle comparisons are exact only for text
    avoiding the two classes, so sweep plants and generated testdata
    must avoid them (and do). This test pins all three behaviors — if
    any engine shifts, the documented boundary moves and we want to
    know."""
    import duckdb

    from pyspark.sql import functions as F

    probes = ["İstanbul", "ΑΣ", "STRAẞE", "ﬁx", "Σς"]
    py = [p.lower() for p in probes]
    sp = [
        r[0]
        for r in spark.createDataFrame([(p,) for p in probes], "t string")
        .select(F.lower("t"))
        .collect()
    ]
    assert py == sp, "engine self-consistency broke: Python != Spark lower()"
    con = duckdb.connect()
    ddb = [con.execute("SELECT lower(?)", [p]).fetchone()[0] for p in probes]
    # the two documented divergence classes...
    assert ddb[0] == "istanbul" and py[0] == "i̇stanbul"
    assert ddb[1] == "ασ" and py[1] == "ας"
    # ...and agreement everywhere else probed (sharp-s, ligature,
    # already-final sigma)
    assert ddb[2:] == py[2:]


def test_pq_family_parity_fuzz_random_tie_corpora(spark, tmp_path):
    """Randomized cross-engine fuzz for the PQ parity contract (the
    tokenizer-fuzzer precedent): three seeded corpora engineered to
    stress the quantized-argmin boundaries — an exact duplicate of a
    codeword-source vector (distance-0 TIE in every subspace → the
    code_id tiebreak decides), the same direction at 1e-6 and 1e6
    magnitude (normalization must collapse them onto the duplicate's
    codewords exactly), and a vector equidistant-ish between two
    near-identical codeword sources (assignment-score near-ties at the
    6-dp half-up quantizer). sim_ann_pq, its recall, and the IVF-PQ
    composition must all value-hash-match DuckDB on every corpus."""
    import numpy as np

    for seed in (11, 12, 13):
        rng = np.random.default_rng(seed)
        n = 60  # stride = 7 → codeword sources are vec_id % 7 == 0
        X = rng.normal(size=(n, 64)).astype(np.float32)
        X[10] = X[0]                      # exact dup of codeword source 0
        X[11] = X[0] * np.float32(1e-6)   # same direction, tiny magnitude
        X[12] = X[0] * np.float32(1e6)    # same direction, huge magnitude
        # near-identical pair of codeword SOURCES (7 and 14): candidate
        # assignment scores between them quantize onto the same 6-dp
        # grid cell for many subspaces → code_id tiebreak exercised
        X[14] = X[7] + rng.normal(scale=1e-7, size=64).astype(np.float32)
        d = str(tmp_path / f"pqfuzz{seed}")
        spark.createDataFrame(
            [(i, X[i].tolist(), None) for i in range(n)],
            "vec_id long, embedding array<float>, label int",
        ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")

        con = duckdb.connect()
        con.execute("SET memory_limit='2GB'")
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM"
            f" '{d}/embeddings.parquet/*.parquet'"
        )
        failures = _parity_failures(
            spark, con, d,
            ["sim_ann_pq", "sim_ann_pq_recall", "sim_ann_ivfpq"],
        )
        con.close()
        assert not failures, (seed, failures)
