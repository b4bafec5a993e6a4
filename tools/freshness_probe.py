"""Freshness probe runner: measure event→servable store staleness in a
DEDICATED process and print ONE JSON line.

bench.py invokes this as a subprocess BEFORE creating its own
SparkSession: the 20 s streaming probe (rate source → full ingest →
per-second upsert store → polled reads) leaves a JVM with state-store
and GC debris that measurably taxed the bench's timed loop (~7-9 s over
105 queries in the in-process A/B), and stopping the stream mid-batch
flushes an async stderr stack trace that must never land near the
bench's final parseable line. A subprocess isolates both: the probe
JVM dies with the process, and its stderr is captured by the parent.

Usage: python tools/freshness_probe.py [duration_s] [rows_per_second]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    rps = int(sys.argv[2]) if len(sys.argv) > 2 else 20000

    from app_fastdata_spark.session import get_spark
    from app_fastdata_spark.streaming.serving_store import (
        measure_freshness_lag,
    )

    spark = get_spark("freshness-probe")
    spark.sparkContext.setLogLevel("FATAL")
    with tempfile.TemporaryDirectory() as d:
        out = measure_freshness_lag(
            spark, f"{d}/store", duration_s=duration, rows_per_second=rps
        )
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
