"""Per-query optimization profiler (guide §1): for each named query,
warm at sf0.001, then at the target SF measure DataFrame BUILD time
(py4j construction + analysis) and two noop-sink EXECUTIONS separately
— the split that tells whether a slow bench entry is paying driver-side
plan construction or actual execution. Jobs are labeled (§1.5).

Usage: python tools/profile_queries.py [sf_dir] [query ...]
       (no query names = the bench HEADLINE list)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from app_fastdata_spark.catalog import queries
from app_fastdata_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    warm_dir = "/root/testdata/sf0.001"
    rows = []
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        # second invocation: rebuild + re-execute (bench's min-of-2 shape)
        t3 = time.time()
        df2 = fn(spark, sf_dir)
        t4 = time.time()
        df2.write.format("noop").mode("overwrite").save()
        t5 = time.time()
        rows.append((name, t1 - t0, t2 - t1, t4 - t3, t5 - t4))
    spark.sparkContext.setJobDescription(None)
    total_b1 = sum(r[1] for r in rows)
    total_e1 = sum(r[2] for r in rows)
    total_b2 = sum(r[3] for r in rows)
    total_e2 = sum(r[4] for r in rows)
    print(f"{'query':36s} {'build1':>7s} {'exec1':>7s} {'build2':>7s} "
          f"{'exec2':>7s} {'min_total':>9s}")
    for name, b1, e1, b2, e2 in sorted(
        rows, key=lambda r: -min(r[1] + r[2], r[3] + r[4])
    ):
        print(f"{name:36s} {b1:7.3f} {e1:7.3f} {b2:7.3f} {e2:7.3f} "
              f"{min(b1 + e1, b2 + e2):9.3f}")
    print(f"{'TOTAL':36s} {total_b1:7.2f} {total_e1:7.2f} {total_b2:7.2f} "
          f"{total_e2:7.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
