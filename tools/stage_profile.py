"""Stage-level attribution for slow queries (guide §7.1 without the
browser): run each named query with the UI enabled, then pull
/api/v1 job+stage metrics per query via the jobGroup, and report where
the wall went — task time vs scheduling gaps, shuffle bytes, #jobs,
#stages, GC.

Usage: python tools/stage_profile.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "1")

from pyspark.sql import SparkSession

from app_fastdata_spark.catalog import queries


def get_spark_ui():
    """session.py's config with the UI forced on (port 4055)."""
    from app_fastdata_spark import session as s

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stage_profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "20g")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4055")
    )
    return b.getOrCreate()


def api(app: str, path: str):
    url = f"http://localhost:4055/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    app = spark.sparkContext.applicationId
    warm = "/root/testdata/sf0.001"
    for name in names:
        qs[name](spark, warm).write.format("noop").mode("overwrite").save()
    for name in names:
        sc = spark.sparkContext
        sc.setJobGroup(f"g:{name}", name)
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        sc.setJobGroup(None, None)
        jobs = [j for j in api(app, "/jobs") if j.get("jobGroup") == f"g:{name}"]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in api(app, f"/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        tot_task = sum(s.get("executorRunTime", 0) for s in stages) / 1000.0
        tot_gc = sum(s.get("jvmGcTime", 0) for s in stages) / 1000.0
        sh_r = sum(s.get("shuffleReadBytes", 0) for s in stages)
        sh_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        n_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
        print(
            f"{name:34s} build={t1 - t0:6.3f} exec={t2 - t1:6.3f} "
            f"jobs={len(jobs):3d} stages={len(stages):3d} tasks={n_tasks:4d} "
            f"taskTime={tot_task:7.2f}s gc={tot_gc:5.2f}s "
            f"shufR={sh_r // 1024}K shufW={sh_w // 1024}K"
        )
        # per-stage detail, slowest first
        for s in sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:6]:
            d = (s.get("completionTime") and s.get("firstTaskLaunchedTime"))
            print(
                f"    stage {s['stageId']:4d} tasks={s.get('numCompleteTasks', 0):4d} "
                f"run={s.get('executorRunTime', 0) / 1000.0:6.2f}s "
                f"cpu={s.get('executorCpuTime', 0) / 1e9:6.2f}s "
                f"gc={s.get('jvmGcTime', 0) / 1000.0:5.2f}s "
                f"shufR={s.get('shuffleReadBytes', 0) // 1024}K "
                f"shufW={s.get('shuffleWriteBytes', 0) // 1024}K  "
                f"{(s.get('description') or s.get('name', ''))[:60]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
