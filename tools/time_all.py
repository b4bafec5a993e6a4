"""Warm-time every registered query at a given SF — the landmine sweep.

bench.py times the curated HEADLINE set; this tool times EVERYTHING
registered (skip-list aside) so a scale blowup in an unbenched query
can't hide (dedup_simhash sat at 255 s at sf0.1 for two rounds because
nothing timed it). Each query is warmed at sf0.001 first, then timed
once at the target SF with the noop sink (full plan, no collect).

Usage: python tools/time_all.py [sf_dir] [slow_threshold_sec]
Prints one line per query (slowest first) and exits 1 if any query
exceeds the threshold (default 10 s) — usable as a perf regression gate.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from app_fastdata_spark.catalog import queries
from app_fastdata_spark.session import get_spark

# Deliberate small-SF anchors: quadratic by design, documented, benched-out.
SKIP = {
    "dedup_embedding_cosine",  # all-pairs nested-loop anchor
    "dedup_ngram_jaccard",  # uncapped stop-shingle anchor
    "dedup_components_uncapped",  # rides the uncapped anchor
    "dedup_survivors_uncapped",  # rides the uncapped anchor
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    spark = get_spark("time_all")
    qs = queries()
    warm_dir = "/root/testdata/sf0.001"
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in qs.items():
        if name in SKIP:
            continue
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 2)
        except Exception as ex:  # noqa: BLE001 — streaming-only wrappers etc.
            failures[name] = str(ex).split("\n")[0][:120]
    slow = {k: v for k, v in timings.items() if v > threshold}
    for k, v in sorted(timings.items(), key=lambda kv: -kv[1]):
        flag = "  <-- SLOW" if k in slow else ""
        print(f"{v:8.2f}s  {k}{flag}")
    for k, v in failures.items():
        print(f"   ERROR   {k}: {v}")
    print(
        f"\n{len(timings)} timed, {len(slow)} over {threshold:.0f}s, "
        f"{len(failures)} errored, total {sum(timings.values()):.1f}s"
    )
    sys.exit(1 if slow else 0)


if __name__ == "__main__":
    main()
