"""Contention JVM for window pre-flights: a SECOND Spark driver with a
large heap looping shuffle-heavy jobs in the same cgroup, reproducing
the memory-pressure regime that cost the r9 driver round 5 correctness
rows (DuckDB allocator-ceiling cascade across adjacent heavy oracles).

Protocol (applied before freezing each round's DRIVER_PRIORITY window,
first in r10, formalized here for r11+):

    python tools/contention_jvm.py &          # this script
    python tools/check_oracle.py /root/testdata/sf0.01 --window
    kill %1

The window replica must come back `N pass, 0 fail` WHILE this loop
runs; ORACLE_RSS_LAST.json then records the per-query peaks under
contention. Runs until killed (SIGTERM/SIGINT) or --seconds elapses.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 3600.0
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("contention-jvm")
        .config("spark.driver.memory", "20g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    t0 = time.time()
    i = 0
    while time.time() - t0 < seconds:
        # ~200M-row wide shuffle + agg: sustained executor-heap churn,
        # the same pressure shape as the r9 failure reproduction.
        n = (
            spark.range(0, 200_000_000, 1, 64)
            .withColumn("k", F.hash("id") % 1_000_000)
            .withColumn("v", F.col("id") % 9973)
            .groupBy("k")
            .agg(F.sum("v").alias("s"), F.max("v").alias("m"))
            .count()
        )
        i += 1
        print(f"contention iter {i}: {n} groups, {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
