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
