"""Oracle parity: every registered query with an oracle must match DuckDB
on row count, column names, and order-insensitive value hash — the same
gate the driver runs (t2). Mirrors tools/check_oracle.py at sf0.001 for
speed (driver runs sf0.01).
"""

from __future__ import annotations

import duckdb
import pytest

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


def test_null_text_parity_corpus_health_and_scrubber(spark, sf_dir, tmp_path):
    """The schema allows NULL text; both engines must agree on it.
    corpus_health counts a NULL-text doc as failing the quality gate
    (not skipped from the denominator); doc_scrub_spans emits '' for
    its text_clean on both sides."""
    import duckdb as _ddb

    from app_fastdata_spark.operators.curation import corpus_health
    from app_fastdata_spark.operators.textops import doc_scrub_spans
    from app_fastdata_spark.registry import oracles as _oracles
    from app_fastdata_spark.tables import load_table

    d = str(tmp_path / "nulldocs")
    base = load_table(spark, sf_dir, "documents").limit(20)
    nul = spark.createDataFrame(
        [(999_991, None, "en", "srcX", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    base.unionByName(nul).coalesce(1).write.parquet(f"{d}/documents.parquet")

    con = _ddb.connect()
    # Spark writes the table as a directory of part files; glob them
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name, sdf in [
        ("corpus_health", corpus_health(spark, d)),
        ("doc_scrub_spans", doc_scrub_spans(spark, d)),
    ]:
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(_oracles()[name])
        dcols = [c[0] for c in res.description]
        drows = res.fetchall()
        assert len(srows) == len(drows), name
        assert normalize(srows, sdf.columns) == normalize(drows, dcols), name
