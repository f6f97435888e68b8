"""Job/stage/task inventory per benched query (r14 verdict ask #7):
load-independent evidence for the overhead-floor claims — a query whose
wall is dominated by fixed per-job driver cost shows it as a high
job count over tiny task counts, not as data-plane work.

Usage: python scripts/count_jobs.py <query> [query ...]
Prints one JSON line: {query: {jobs, stages, tasks, sec}} (query run
once untimed to warm codegen, then once counted+timed with cleared
artifact caches — the bench's own per-repeat protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from quick_stream_spark.plans._util import clear_session_caches
    from quick_stream_spark.plans.registry import REGISTRY, queries

    queries()
    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        fn = REGISTRY[name].fn
        clear_session_caches()
        fn(spark, sf_dir).count()  # warm pass (codegen + page cache)
        clear_session_caches()
        before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        sec = round(time.perf_counter() - t0, 3)
        new_jobs = sorted(set(tracker.getJobIdsForGroup(None) or []) - before)
        stages = 0
        tasks = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            stages += len(info.stageIds)
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is not None:
                    tasks += sinfo.numTasks
        out[name] = {
            "jobs": len(new_jobs),
            "stages": stages,
            "tasks": tasks,
            "sec": sec,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"metric": "job_inventory", "sf_dir": sf_dir,
                      "cpus": int(cpus), "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
