"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the same scale factor, compare row count, column names, and an
order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from app_fastdata_spark.catalog import oracles, queries
from app_fastdata_spark.session import get_spark
from app_fastdata_spark.tables import TABLE_NAMES


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            elif hasattr(v, "isoformat"):
                try:
                    v = v.isoformat(sep=" ")
                except TypeError:  # datetime.date
                    v = v.isoformat()
            elif isinstance(v, bool):
                v = str(int(v))
            else:
                v = str(v)
            vals.append(v)
        out.append("\x1f".join(vals))
    out.sort()
    return hashlib.md5("\n".join(out).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, os_ = queries(), oracles()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"rows  {name}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(os_[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            h1, h2 = normalize(srows, scols), normalize(drows, dcols)
            if h1 != h2:
                problems.append("value-hash mismatch")
                # show first differing rows for debugging
                s_set = {normalize([r], scols) for r in srows}
                d_set = {normalize([r], dcols) for r in drows}
                sd = [r for r in srows if normalize([r], scols) not in d_set][:3]
                dd = [r for r in drows if normalize([r], dcols) not in s_set][:3]
                problems.append(f"spark-only={sd} duckdb-only={dd}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(str(p) for p in problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
