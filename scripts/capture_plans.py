"""Capture ``.explain("formatted")`` for the benched queries into
``plans/$QSS_PLAN_ROUND/<query>_<tag>.txt`` (the optimization-round
evidence files; QSS_PLAN_ROUND defaults to r15).

Usage: python scripts/capture_plans.py <tag> [query ...]
  tag      suffix for the output files (before/after)
  query    optional subset; default = the full benched set
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    subset = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("QSS_PLAN_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("quick-stream-spark-plan-capture")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from quick_stream_spark.plans._util import clear_session_caches
    from quick_stream_spark.plans.registry import REGISTRY, queries

    queries()
    names = subset or sorted(n for n, s in REGISTRY.items() if s.bench) + [
        n for n in ("r_upsert_endstate", "r_stream_upsert_endstate")
        if n not in {m for m, s in REGISTRY.items() if s.bench}
    ]
    # QSS_CAPTURE_EXECUTED=1: run the query first so the capture shows
    # the FINAL AQE plan (AQEShuffleRead / ReusedExchange / runtime join
    # strategy changes), not the initial isFinalPlan=false plan
    executed = os.environ.get("QSS_CAPTURE_EXECUTED") == "1"
    for name in names:
        clear_session_caches()
        spark.sparkContext.setJobDescription(f"plan-capture:{name}")
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            if executed:
                # collect() (NOT count()) executes df's OWN QueryExecution,
                # so the AQE final plan lands on the frame we explain;
                # count() would build and execute a different plan on top
                df.collect()
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as exc:  # capture must not die on one query
            plan = f"ERROR capturing plan: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
