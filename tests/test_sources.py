"""Tests for the §2.1 sources layer: S1 generator, S2 dim bulk load,
S3 CSV range scan, S4/S11 export sink + harvest handoff."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from app_fastdata_spark.sources.dimload import load_ip_ranges, load_line_dim
from app_fastdata_spark.sources.export import export_format, harvest, write_export
from app_fastdata_spark.sources.generator import (
    N_AGENTS,
    N_EVENTS,
    N_URLS,
    SENTINEL,
    gen_events,
)


def test_gen_events_shape_and_domains(spark, sf_dir):
    ev = gen_events(spark, sf_dir, n=5000)
    assert ev.columns == [
        "event_id",
        "src",
        "dest",
        "method",
        "ts",
        "size",
        "referral",
        "agent",
    ]
    stats = ev.agg(
        F.count("*").alias("n"),
        F.min("dest").alias("dmin"),
        F.max("dest").alias("dmax"),
        F.min("agent").alias("amin"),
        F.max("agent").alias("amax"),
        F.max("referral").alias("rmax"),
        F.min("size").alias("smin"),
        F.sum(F.when(F.col("referral") == SENTINEL, 1).otherwise(0)).alias(
            "n_sentinel"
        ),
        F.count(F.when(F.col("method") != "GET", 1)).alias("bad_method"),
    ).collect()[0]
    assert stats.n == 5000
    assert 0 <= stats.dmin and stats.dmax < N_URLS
    assert 0 <= stats.amin and stats.amax < N_AGENTS
    assert stats.rmax <= SENTINEL
    assert stats.smin >= 0
    # referral sentinel is drawn with p=0.5 (LogGenerator.java:245)
    assert 0.4 < stats.n_sentinel / 5000 < 0.6
    assert stats.bad_method == 0


def test_gen_events_deterministic_and_monotone_ts(spark, sf_dir):
    a = gen_events(spark, sf_dir, n=200).collect()
    b = gen_events(spark, sf_dir, n=200).collect()
    assert a == b
    ts = [r.ts for r in sorted(a, key=lambda r: r.event_id)]
    assert ts == sorted(ts) and len(set(ts)) == 200


def test_gen_events_default_n(spark, sf_dir):
    assert gen_events(spark, sf_dir).count() == N_EVENTS


def test_load_line_dim_with_sentinel(spark, tmp_path):
    p = tmp_path / "urls.txt"
    urls = [f"http://example.com/page{i}" for i in range(7)]
    p.write_text("\n".join(urls) + "\n")
    dim = load_line_dim(spark, str(p), "url", sentinel="")
    rows = {r.id: r.url for r in dim.collect()}
    # ids are 0-based line numbers; sentinel gets id = line count
    # (LogGenerator.java:105-124)
    assert rows == {**{i: u for i, u in enumerate(urls)}, 7: ""}


def test_load_ip_ranges(spark, tmp_path):
    p = tmp_path / "ips.csv"
    p.write_text("10.0.0.0,10.0.0.255,24\n192.168.1.0,192.168.1.127,25\n")
    rows = sorted(load_ip_ranges(spark, str(p)).collect())
    assert rows[0].start_int == 10 * 16777216
    assert rows[0].end_int == 10 * 16777216 + 255
    assert rows[1].start_int == 192 * 16777216 + 168 * 65536 + 256
    assert rows[1].end_int - rows[1].start_int == 127


def test_export_write_and_harvest_handoff(spark, sf_dir, tmp_path):
    export_dir = str(tmp_path / "export")
    process_dir = str(tmp_path / "process")
    out = str(tmp_path / "features.parquet")
    ev = gen_events(spark, sf_dir, n=1000)
    fmt = write_export(ev, export_dir, generation=0)
    assert fmt == export_format(spark)
    assert os.path.isdir(f"{export_dir}/generation=0")
    feats = harvest(spark, export_dir, process_dir, out)
    # export dir handed off atomically; a fresh one can start accumulating
    assert not os.path.exists(export_dir)
    assert os.path.isdir(process_dir)
    assert feats.columns == ["src", "dest", "referral", "agent"]
    assert feats.count() == 1000
    # harvest output is readable parquet with only the 4 feature ints (P1)
    assert spark.read.parquet(out).count() == 1000


def test_avro_codec_round_trip(spark, sf_dir, tmp_path):
    """S4/S6 without the spark-avro jar: the pure-Python Avro OCF writer
    and the distributed reader round-trip a mixed-type frame exactly,
    including nullable fields and timestamps."""
    from pyspark.sql import functions as F

    from app_fastdata_spark.sources.avro_codec import (
        read_avro,
        read_schema,
        spark_schema_of,
        write_avro,
    )
    from app_fastdata_spark.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id", "ts", "user_id", "event_type", "value",
            F.when(F.col("event_id") % 3 == 0, F.col("props")).alias("props"),
        )
        .limit(1000)
    )
    out = str(tmp_path / "avro_out")
    paths = write_avro(ev, out)
    assert paths and all(p.endswith(".avro") for p in paths)

    schema = spark_schema_of(read_schema(paths[0]))
    assert [f.name for f in schema.fields] == ev.columns
    back = read_avro(spark, paths, schema)
    want = sorted(map(tuple, ev.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_export_harvest_via_python_avro(spark, sf_dir, tmp_path):
    """The full S4->S11->S6 loop on the jar-free Avro path: export writes
    real .avro container files, the atomic rename hands them off, and
    harvest glob-decodes them distributedly."""
    import glob

    from app_fastdata_spark.sources.export import harvest, write_export
    from app_fastdata_spark.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "user_id AS src",
            "event_type AS dest",
            "CAST(user_id % 7 AS LONG) AS referral",
            "CAST(user_id % 11 AS LONG) AS agent",
        )
        .limit(500)
    )
    export_dir = str(tmp_path / "export")
    fmt = write_export(ev, export_dir, generation=0)
    assert fmt == "avro-py"
    assert glob.glob(f"{export_dir}/generation=0/*.avro")
    feats = harvest(
        spark, export_dir, str(tmp_path / "process"), str(tmp_path / "f.parquet")
    )
    assert feats.count() == 500
    assert set(feats.columns) == {"src", "dest", "referral", "agent"}


def test_harvest_parquet_export(spark, sf_dir, tmp_path):
    """A fmt="parquet" export (advertised in the module docstring) must
    harvest: the on-disk format drives the read path, never the session's
    avro probe result ("avro-py" is not a spark.read format)."""
    from app_fastdata_spark.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "user_id AS src",
            "CAST(user_id % 5 AS LONG) AS dest",
            "CAST(user_id % 7 AS LONG) AS referral",
            "CAST(user_id % 11 AS LONG) AS agent",
        )
        .limit(300)
    )
    export_dir = str(tmp_path / "export_pq")
    fmt = write_export(ev, export_dir, generation=0, fmt="parquet")
    assert fmt == "parquet"
    feats = harvest(
        spark, export_dir, str(tmp_path / "process_pq"), str(tmp_path / "f_pq.parquet")
    )
    assert feats.count() == 300
    assert set(feats.columns) == {"src", "dest", "referral", "agent"}


def test_harvest_empty_export(spark, sf_dir, tmp_path):
    """An export dir with no data files (write_avro emits nothing for empty
    partitions) harvests to an empty feature frame instead of raising —
    a quiet interval must not fail the batch loop."""
    from app_fastdata_spark.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "user_id AS src", "user_id AS dest",
            "user_id AS referral", "user_id AS agent",
        )
        .filter("src < 0")  # empty
    )
    export_dir = str(tmp_path / "export_empty")
    write_export(ev, export_dir, generation=0)
    feats = harvest(
        spark,
        export_dir,
        str(tmp_path / "process_empty"),
        str(tmp_path / "f_empty.parquet"),
    )
    assert feats.count() == 0
    assert feats.columns == ["src", "dest", "referral", "agent"]


def test_avro_container_deflate_roundtrip(tmp_path):
    """Deflate-codec containers round-trip bit-identically (Avro deflate
    is a raw RFC 1951 stream, no zlib header/checksum)."""
    from app_fastdata_spark.sources.avro_codec import read_container, write_container

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
        ],
    }
    rows = [(i, None if i % 3 == 0 else f"v{i}") for i in range(10_000)]
    p_null = str(tmp_path / "null.avro")
    p_defl = str(tmp_path / "defl.avro")
    write_container(p_null, schema, rows, codec="null")
    write_container(p_defl, schema, rows, codec="deflate")
    assert os.path.getsize(p_defl) < os.path.getsize(p_null)
    for p in (p_null, p_defl):
        got_schema, got = read_container(p)
        assert got_schema == schema
        assert got == rows


def test_avro_int64_beyond_2p53_exact(spark, tmp_path):
    """Nullable long columns must not round-trip through float64: int64
    values above 2^53 (where float64 loses integer precision) survive
    the distributed write+read exactly, alongside explicit nulls."""
    from app_fastdata_spark.sources.avro_codec import (
        read_avro,
        read_schema,
        spark_schema_of,
        write_avro,
    )

    big = [(1, 2**53 + 1), (2, 9_007_199_254_740_993), (3, None), (4, -(2**62) - 7)]
    df = spark.createDataFrame(big, "id long, v long")
    out = str(tmp_path / "big_avro")
    paths = write_avro(df, out)
    back = read_avro(spark, paths, spark_schema_of(read_schema(paths[0])))
    got = sorted([(r.id, r.v) for r in back.collect()])
    assert got == big


def test_avro_fuzz_roundtrip(tmp_path):
    """Property-style fuzz: random flat schemas and values round-trip
    through the container codec (both codecs) without loss."""
    import math
    import random

    from app_fastdata_spark.sources.avro_codec import read_container, write_container

    rng = random.Random(0xA7C0)
    type_pool = ["long", "int", "double", "string", "boolean", "bytes"]
    for trial in range(20):
        n_fields = rng.randint(1, 6)
        types = [rng.choice(type_pool) for _ in range(n_fields)]
        nullable = [rng.random() < 0.5 for _ in range(n_fields)]
        schema = {
            "type": "record",
            "name": f"fuzz{trial}",
            "fields": [
                {"name": f"f{i}", "type": ["null", t] if nl else t}
                for i, (t, nl) in enumerate(zip(types, nullable))
            ],
        }

        def val(t, nl):
            if nl and rng.random() < 0.2:
                return None
            if t == "long":
                return rng.randint(-(2**63), 2**63 - 1)
            if t == "int":
                return rng.randint(-(2**31), 2**31 - 1)
            if t == "double":
                return rng.choice([0.0, -1.5, math.pi, 1e308, -1e-308])
            if t == "string":
                return "".join(
                    rng.choice("abcé中\U0001f600 ")
                    for _ in range(rng.randint(0, 12))
                )
            if t == "boolean":
                return rng.random() < 0.5
            return bytes(rng.randrange(256) for _ in range(rng.randint(0, 16)))

        rows = [
            tuple(val(t, nl) for t, nl in zip(types, nullable))
            for _ in range(rng.randint(0, 300))
        ]
        codec = rng.choice(["null", "deflate"])
        p = str(tmp_path / f"fuzz{trial}.avro")
        write_container(p, schema, rows, codec=codec)
        got_schema, got = read_container(p)
        assert got_schema == schema
        assert got == rows


def test_avro_malformed_container_rejected(tmp_path):
    """Corrupt headers fail loudly, never silently mis-decode: wrong
    magic, truncated header, unknown codec."""
    import pytest

    from app_fastdata_spark.sources.avro_codec import read_container, write_container

    schema = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    good = str(tmp_path / "good.avro")
    write_container(good, schema, [(1,), (2,)])
    raw = open(good, "rb").read()

    bad_magic = str(tmp_path / "bad_magic.avro")
    open(bad_magic, "wb").write(b"PAR1" + raw[4:])
    with pytest.raises(ValueError, match="not an Avro"):
        read_container(bad_magic)

    truncated = str(tmp_path / "trunc.avro")
    open(truncated, "wb").write(raw[:10])
    with pytest.raises((ValueError, IndexError)):
        read_container(truncated)

    bad_codec = str(tmp_path / "bad_codec.avro")
    open(bad_codec, "wb").write(raw.replace(b"null", b"zstd", 1))
    with pytest.raises(ValueError, match="unsupported avro codec"):
        read_container(bad_codec)


def test_load_table_handles_both_ts_layouts(spark, sf_dir, tmp_path):
    """The events load path must produce identical frames over BOTH
    physical layouts the driver has shipped: native timestamp[us]
    (current testdata) and int64 TIMESTAMP(NANOS) (rounds 1-3). The ns
    branch is dormant while the testdata is µs — this canary keeps it
    honest by rewriting the same rows in the ns layout and comparing
    full load_table output."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from app_fastdata_spark.tables import events_ts_unit, load_table

    cur = load_table(spark, sf_dir, "events")
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    i = tbl.schema.get_field_index("ts")
    ns_col = tbl.column("ts").cast(pa.timestamp("ns"))
    ns_tbl = tbl.set_column(i, pa.field("ts", pa.timestamp("ns")), ns_col)
    d = tmp_path / "ns_layout"
    d.mkdir()
    pq.write_table(ns_tbl, str(d / "events.parquet"), store_schema=False)
    assert events_ts_unit(str(d / "events.parquet")) == "ns"
    ns = load_table(spark, str(d), "events")
    assert ns.schema == cur.schema
    a = sorted(cur.collect(), key=lambda r: r.event_id)
    b = sorted(ns.collect(), key=lambda r: r.event_id)
    assert a == b


def test_events_ts_unit_probe_contract(spark, sf_dir, tmp_path):
    """The ts-unit probe must (a) default 'ns' ONLY for genuinely absent
    paths, (b) raise loudly for a file that exists but has an unreadable
    footer (a silent 'ns' guess divides µs by 1000 downstream → 1970-era
    timestamps), and (c) probe part-files inside a directory layout."""
    import pytest as _pytest

    from app_fastdata_spark.tables import events_ts_unit

    # (a) absent → default
    assert events_ts_unit(str(tmp_path / "nope" / "events.parquet")) == "ns"
    # (b) present-but-garbage → raise
    bad = tmp_path / "events.parquet"
    bad.write_bytes(b"this is not parquet")
    with _pytest.raises(RuntimeError, match="could not be probed"):
        events_ts_unit(str(bad))
    # (c) directory layout: probe the part file inside (a µs part-file,
    # as a Spark writer configured with outputTimestampType=TIMESTAMP_MICROS
    # would produce; note Spark's INT96 default reads back as ns)
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "dirlayout" / "evdir"
    d.mkdir(parents=True)
    pq.write_table(
        pa.table({"ts": pa.array([0], type=pa.timestamp("us"))}),
        str(d / "part-00000.parquet"),
    )
    assert events_ts_unit(str(d)) == "us"
    # nested (partitioned) layout: day=.../part-*.parquet found recursively
    nested = tmp_path / "dirlayout" / "partitioned" / "day=2024-01-01"
    nested.mkdir(parents=True)
    pq.write_table(
        pa.table({"ts": pa.array([0], type=pa.timestamp("us"))}),
        str(nested / "part-00000.parquet"),
    )
    assert events_ts_unit(str(tmp_path / "dirlayout" / "partitioned")) == "us"
    # a dir that exists but holds no parquet yet (streaming source before
    # its first drop) is the genuinely-absent default case
    empty = tmp_path / "dirlayout" / "empty"
    empty.mkdir()
    assert events_ts_unit(str(empty)) == "ns"


def test_uncapped_jaccard_input_gate(spark, sf_dir):
    """The uncapped recall-baseline twins must refuse oversized corpora
    unless explicitly opted in (quadratic stop-shingle pair risk)."""
    import pytest as _pytest

    from app_fastdata_spark.operators.dedup import dedup_ngram_jaccard

    with _pytest.raises(ValueError, match="BASELINE"):
        dedup_ngram_jaccard(spark, sf_dir, max_docs=1)
    # explicit opt-in still runs
    assert dedup_ngram_jaccard(spark, sf_dir, max_docs=None).count() >= 0


def test_brute_force_cosine_input_gate(spark, sf_dir):
    """The all-pairs cosine anchor must refuse oversized embedding tables
    unless explicitly opted in (nested-loop N²/2 dot products)."""
    import pytest as _pytest

    from app_fastdata_spark.operators.similarity import dedup_embedding_cosine

    with _pytest.raises(ValueError, match="ANCHOR"):
        dedup_embedding_cosine(spark, sf_dir, max_vecs=1)
    # explicit opt-in still runs
    assert dedup_embedding_cosine(spark, sf_dir, max_vecs=None).count() >= 0


def test_jdbc_export_end_to_end(spark, sf_dir, tmp_path):
    """S5/U7 executed, not just plan-constructed: stream events through
    the foreachBatch JDBC writer into embedded Derby (ships inside
    Spark), read the table back over JDBC, and check content parity
    with the batch load. Gated on driver availability."""
    import pytest as _pytest

    from app_fastdata_spark.sources.export import jdbc_available, jdbc_export_writer
    from app_fastdata_spark.streaming.pipeline import events_stream
    from app_fastdata_spark.tables import load_table

    if not jdbc_available(spark):
        _pytest.skip("no JDBC driver on the classpath")
    url = f"jdbc:derby:memory:exp_{os.getpid()};create=true"
    writer = jdbc_export_writer(url, "events_export")
    stream = events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(writer)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.jdbc(url, "events_export")
    batch = load_table(spark, sf_dir, "events")
    got = back.agg(
        F.count("*").alias("n"), F.sum("event_id").alias("s")
    ).first()
    want = batch.agg(
        F.count("*").alias("n"), F.sum("event_id").alias("s")
    ).first()
    assert (got.n, got.s) == (want.n, want.s)
    # append semantics: a second micro-batch adds rows, never truncates
    writer(batch.select("event_id", "user_id", "value").limit(5), 1)
    assert spark.read.jdbc(url, "events_export").count() == want.n + 5


def test_serving_store_query_matches_batch(spark, sf_dir):
    """ST4 under local test: GetTopUsers served from the streamed
    per-second store must equal the batch top_users over raw events —
    the maintained-view parity claim, end to end."""
    from app_fastdata_spark.operators.serving import top_users
    from app_fastdata_spark.streaming.serving_store import top_users_from_store_query

    got = top_users_from_store_query(spark, sf_dir).collect()
    want = top_users(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_schema_evolution_old_queries_still_run(spark, sf_dir, tmp_path):
    """Live schema update (the reference's `voltadmin update` flow,
    run.sh:131-134): after a table gains a column, previously-written
    queries must run unchanged. Declared schemas make this hold by
    construction — load_table selects the declared columns, so extra
    file columns are pruned, and queries never see them."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from app_fastdata_spark.operators.textops import doc_lang_id
    from app_fastdata_spark.tables import load_table

    newdir = tmp_path / "evolved"
    newdir.mkdir()
    for t in ("documents",):
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        tbl = tbl.append_column("added_col", pc.multiply(tbl["doc_id"], 2))
        pq.write_table(tbl, str(newdir / f"{t}.parquet"))
    evolved = load_table(spark, str(newdir), "documents")
    assert "added_col" not in evolved.columns  # declared schema prunes
    got = doc_lang_id(spark, str(newdir)).collect()
    want = doc_lang_id(spark, sf_dir).collect()
    assert got == want


def test_write_training_shards_layout_and_order(spark, sf_dir, tmp_path):
    """Shard writer emits shard=K dirs whose doc sets match the
    deterministic doc_global_shuffle assignment, with rows inside each
    shard file in pos order (the trainer's streaming contract)."""
    from app_fastdata_spark.operators.curation import doc_global_shuffle
    from app_fastdata_spark.sources.export import write_training_shards

    out = str(tmp_path / "shards")
    written = write_training_shards(spark, sf_dir, out)
    assign = {}
    for r in doc_global_shuffle(spark, sf_dir).collect():
        assign.setdefault(r.shard, []).append((r.pos, r.doc_id))
    assert written == sorted(assign)
    import glob as _glob

    import pyarrow.parquet as _pq

    for shard, want in assign.items():
        files = sorted(_glob.glob(f"{out}/shard={shard}/*.parquet"))
        assert files, shard
        got = []
        for f in files:
            t = _pq.read_table(f, columns=["pos", "doc_id"])
            got.extend(zip(t["pos"].to_pylist(), t["doc_id"].to_pylist()))
        assert got == sorted(want), shard
    # read-back through Spark sees every doc exactly once
    back = spark.read.parquet(out)
    assert back.count() == sum(len(v) for v in assign.values())


def test_write_training_shards_counts_written_shards(spark, sf_dir, tmp_path):
    """With a narrowing doc_source the returned ids are the shards
    actually WRITTEN (md5 buckets, possibly sparse), never the
    full-corpus assignment."""
    import glob as _glob

    from app_fastdata_spark.sources.export import write_training_shards
    from app_fastdata_spark.tables import load_table

    def narrow(spark_, sf):
        return load_table(spark_, sf, "documents").limit(3)

    out = str(tmp_path / "narrow_shards")
    written = write_training_shards(spark, sf_dir, out, doc_source=narrow)
    dirs = _glob.glob(f"{out}/shard=*")
    assert len(written) == len(dirs) and 0 < len(written) <= 3
    assert written == sorted(
        int(d.rsplit("=", 1)[1]) for d in dirs
    )


def test_ts_unit_probe_handles_tz_annotated_us(spark, sf_dir, tmp_path):
    """Spark writes µs timestamps with isAdjustedToUTC=true (pyarrow
    renders 'timestamp[us, tz=UTC]'); the unit probe must classify that
    as 'us' — a string-compare miss here routed Spark-written event
    dirs to the ns divide-by-1000 path and silently produced 1970-era
    timestamps."""
    from app_fastdata_spark.tables import events_ts_unit, load_table

    d = str(tmp_path / "tzus")
    load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    assert events_ts_unit(f"{d}/events.parquet") == "us"
    # and a round-trip read through load_table preserves the instants
    a = sorted(
        r.ts for r in load_table(spark, sf_dir, "events").select("ts").collect()
    )
    b = sorted(r.ts for r in load_table(spark, d, "events").select("ts").collect())
    assert a == b


def test_jsonl_round_trip_and_cross_engine(spark, sf_dir, tmp_path):
    """parquet → JSONL → read must be value-exact (µs timestamps
    included), the explicit-schema reader must quarantine malformed
    lines as _corrupt_record instead of failing the scan, and DuckDB's
    read_json must agree with Spark on the SAME file (the cross-engine
    property every other source format gets)."""
    import duckdb

    from app_fastdata_spark.sources.formats import (
        read_events_jsonl,
        write_events_jsonl,
    )
    from app_fastdata_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").drop("ts_ns").limit(500)
    p = str(tmp_path / "events_jsonl")
    write_events_jsonl(ev, p)
    # cache: Spark refuses a query pruned to ONLY _corrupt_record
    back = read_events_jsonl(spark, p).cache()
    assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
    a = sorted(map(str, (tuple(r) for r in ev.collect())))
    b = sorted(
        map(
            str,
            (
                tuple(r)
                for r in back.select(
                    "event_id", "ts", "user_id", "event_type", "value", "props"
                ).collect()
            ),
        )
    )
    assert a == b

    # corrupt line lands in _corrupt_record, good lines still parse
    # (as its own shard: Spark pins listed file lengths, so appending
    # to an existing part file fails the read outright)
    with open(f"{p}/part-99999-bad.json", "w") as f:
        f.write('{"event_id": not json at all\n')
    # drop the first read's cache: an identical plan would be served
    # from it and never see the appended line
    back.unpersist(blocking=True)
    back2 = read_events_jsonl(spark, p).cache()
    assert back2.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    assert (
        back2.filter(F.col("_corrupt_record").isNull()).count() == ev.count()
    )

    # cross-engine: DuckDB parses the same (pre-corruption) rows to the
    # same per-type counts and value sums
    con = duckdb.connect()
    got = dict(
        (r.event_type, (r.n, r.sv))
        for r in read_events_jsonl(spark, p)
        .filter(F.col("_corrupt_record").isNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
        .collect()
    )
    want = {
        t: (n, sv)
        for t, n, sv in con.execute(
            f"""
            SELECT event_type, count(*),
                   round(sum(value), 4)
            -- clean shards only: DuckDB's ignore_errors NULL-fills the
            -- corrupt line where Spark quarantines it
            FROM read_json('{p}/part-0*.json',
                           format='newline_delimited',
                           columns={{'event_id': 'BIGINT', 'ts': 'VARCHAR',
                                     'user_id': 'BIGINT',
                                     'event_type': 'VARCHAR',
                                     'value': 'DOUBLE', 'props': 'VARCHAR'}},
                           ignore_errors=true)
            GROUP BY event_type
            """
        ).fetchall()
    }
    assert got == want


def test_orc_round_trip_and_pushdown(spark, sf_dir, tmp_path):
    """parquet → ORC → read must be schema- and value-exact, and a
    predicate on the ORC scan must reach the reader as a pushed filter
    (same columnar contract as parquet)."""
    from app_fastdata_spark.sources.formats import (
        read_events_orc,
        write_events_orc,
    )
    from app_fastdata_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").limit(500)
    p = str(tmp_path / "events_orc")
    write_events_orc(ev, p)
    back = read_events_orc(spark, p)
    assert back.schema == ev.drop("ts_ns").schema
    a = sorted(map(str, (tuple(r) for r in ev.drop("ts_ns").collect())))
    b = sorted(map(str, (tuple(r) for r in back.collect())))
    assert a == b
    plan = (
        back.filter(F.col("event_type") == "click")
        .select("event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FileScan orc" in plan and "PushedFilters: [" in plan, plan
    assert "EqualTo(event_type,click)" in plan, plan


def test_jsonl_stream_matches_batch(spark, sf_dir, tmp_path):
    """The streaming JSONL reader (Trigger.AvailableNow) must produce
    exactly the batch reader's rows — the same batch/stream parity
    contract every other source gets — and a downstream aggregate over
    the stream must equal the same aggregate over the batch frame."""
    from app_fastdata_spark.sources.formats import (
        events_jsonl_stream,
        read_events_jsonl,
        write_events_jsonl,
    )
    from app_fastdata_spark.streaming.pipeline import run_to_memory
    from app_fastdata_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").drop("ts_ns").limit(400)
    p = str(tmp_path / "jsonl_stream")
    write_events_jsonl(ev, p)
    got = run_to_memory(
        events_jsonl_stream(spark, p), "jsonl_stream_parity"
    )
    batch = read_events_jsonl(spark, p)
    a = sorted(map(str, (tuple(r) for r in batch.collect())))
    b = sorted(map(str, (tuple(r) for r in got.collect())))
    assert a == b
    agg_s = sorted(
        tuple(r)
        for r in got.groupBy("event_type").count().collect()
    )
    agg_b = sorted(
        tuple(r)
        for r in ev.groupBy("event_type").count().collect()
    )
    assert agg_s == agg_b


def test_schema_drift_missing_column_reads_null(spark, sf_dir, tmp_path):
    """A shard written by an OLDER producer (missing a later column)
    must read through load_table as NULLs in that column, not fail the
    scan — the explicit-schema contract's schema-evolution half. Mixed
    directories (old shard + new shard) must serve both."""
    import os as _os

    from app_fastdata_spark.tables import load_table

    d = str(tmp_path / "drift")
    _os.makedirs(d)
    ev = load_table(spark, sf_dir, "events").drop("ts_ns").limit(100)
    new_dir = f"{d}/events.parquet"
    # one shard with the full schema, one missing `props`
    ev.limit(50).coalesce(1).write.parquet(new_dir)
    ev.drop("props").limit(50).coalesce(1).write.mode("append").parquet(
        new_dir
    )
    back = load_table(spark, d, "events")
    assert back.count() == 100
    # the old shard's rows surface with NULL props; the scan never fails
    assert back.filter(F.col("props").isNull()).count() >= 50
    # every other column is intact and typed
    assert back.filter(F.col("event_id").isNull()).count() == 0
    assert dict(back.dtypes)["ts"] == "timestamp"


def test_jsonl_unparseable_ts_quarantined_not_abort(spark, sf_dir, tmp_path):
    """ANSI-mode trap (r8 ADVICE, medium): a syntactically-VALID JSON
    line whose `ts` string doesn't parse is NOT JSON-corruption, so
    PERMISSIVE mode won't quarantine it — and under the session's
    pinned spark.sql.ansi.enabled=true, to_timestamp would THROW
    (CANNOT_PARSE_TIMESTAMP) and abort the whole scan on one bad shard.
    The readers use try_to_timestamp: the row must surface with NULL ts
    and an `unparseable ts:` quarantine marker, every other row must
    parse normally, and the STREAMING reader must survive the same file
    (a throw there wedges the checkpoint permanently)."""
    from app_fastdata_spark.sources.formats import (
        events_jsonl_stream,
        read_events_jsonl,
        write_events_jsonl,
    )
    from app_fastdata_spark.streaming.pipeline import run_to_memory
    from app_fastdata_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").drop("ts_ns").limit(100)
    p = str(tmp_path / "jsonl_bad_ts")
    write_events_jsonl(ev, p)
    with open(f"{p}/part-99999-badts.json", "w") as f:
        # valid JSON, garbage timestamp — the exact line PERMISSIVE lets
        # through; plus a NULL-ts line (legal: stays NULL, no marker)
        f.write(
            '{"ts": "not-a-timestamp", "event_id": 999901, "user_id": 7,'
            ' "event_type": "click", "value": 1.5, "props": null}\n'
            '{"ts": null, "event_id": 999902, "user_id": 8,'
            ' "event_type": "view", "value": 2.5, "props": null}\n'
        )
    back = read_events_jsonl(spark, p).cache()
    # the scan completes — no DateTimeException — with all rows present
    assert back.count() == 102
    bad = back.filter(F.col("event_id") == 999901).collect()
    assert len(bad) == 1
    assert bad[0].ts is None
    assert bad[0]._corrupt_record == "unparseable ts: not-a-timestamp"
    # NULL raw ts is legal input, not quarantine material
    nul = back.filter(F.col("event_id") == 999902).first()
    assert nul.ts is None and nul._corrupt_record is None
    # good rows still parse to non-NULL timestamps with no marker
    assert (
        back.filter(
            F.col("ts").isNotNull() & F.col("_corrupt_record").isNull()
        ).count()
        == 100
    )
    back.unpersist(blocking=True)
    # the streaming twin survives the same directory (no wedged reader)
    got = run_to_memory(events_jsonl_stream(spark, p), "jsonl_badts_stream")
    assert got.count() == 102
    assert (
        got.filter(
            F.col("_corrupt_record") == "unparseable ts: not-a-timestamp"
        ).count()
        == 1
    )


def test_jsonl_mixed_schema_shards(spark, sf_dir, tmp_path):
    """JSONL schema-evolution sweep (r8 verdict item 7): a directory
    mixing an OLD-producer shard (missing `props`), a NEW-producer
    shard (extra unknown field), and a current shard must read as one
    frame — missing fields NULL-fill, unknown fields are dropped by the
    explicit schema, nothing quarantines, nothing aborts."""
    from app_fastdata_spark.sources.formats import (
        read_events_jsonl,
        write_events_jsonl,
    )
    from app_fastdata_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").drop("ts_ns").limit(60)
    p = str(tmp_path / "jsonl_mixed")
    write_events_jsonl(ev, p)
    with open(f"{p}/part-99998-old.json", "w") as f:
        f.write(
            '{"ts": "2024-01-05 00:00:00.000000", "event_id": 999801,'
            ' "user_id": 5, "event_type": "click", "value": 0.5}\n'
        )
    with open(f"{p}/part-99997-new.json", "w") as f:
        f.write(
            '{"ts": "2024-01-05 00:00:01.000000", "event_id": 999802,'
            ' "user_id": 6, "event_type": "view", "value": 1.0,'
            ' "props": "{}", "brand_new_field": [1, 2, 3]}\n'
        )
    back = read_events_jsonl(spark, p).cache()
    assert back.count() == 62
    assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
    old = back.filter(F.col("event_id") == 999801).first()
    assert old.props is None and old.ts is not None
    new = back.filter(F.col("event_id") == 999802).first()
    assert new.props == "{}" and "brand_new_field" not in back.columns
    back.unpersist(blocking=True)
