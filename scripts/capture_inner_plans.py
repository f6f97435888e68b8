"""Capture the INNER ``.explain("formatted")`` plans of queries whose
outer plan is hidden behind ``localCheckpoint(eager=True)`` scans.

``DataFrame.localCheckpoint`` is wrapped so that every call records the
formatted plan of the frame being checkpointed (in call order) before
delegating; running a query then yields ``<query>_inner<k>_<tag>.txt``
for each checkpoint boundary under ``plans/$QSS_PLAN_ROUND``.  Also
records the Spark job count per query (statusTracker) — the
load-independent pass-count evidence the optimization rounds use.

Usage: python scripts/capture_inner_plans.py <tag> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
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
        .appName("quick-stream-spark-inner-plan-capture")
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

    def fmt(df: DataFrame) -> str:
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    # Spark 4: concrete frames are pyspark.sql.classic.dataframe.DataFrame,
    # which OVERRIDES localCheckpoint — patching the abstract parent
    # (pyspark.sql.DataFrame) never fires
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF
    except ImportError:  # Spark 3.x
        _CDF = DataFrame

    captured: list[str] = []
    orig = _CDF.localCheckpoint

    def spying(self, eager: bool = True, *a, **kw):  # noqa: ANN001
        try:
            captured.append(fmt(self))
        except Exception as exc:  # capture must never break the query
            captured.append(f"ERROR capturing inner plan: {exc}")
        return orig(self, eager, *a, **kw)

    _CDF.localCheckpoint = spying
    job_counts = {}
    try:
        for name in names:
            clear_session_caches()
            captured.clear()
            spark.sparkContext.setJobDescription(f"inner-plan-capture:{name}")
            tracker = spark.sparkContext.statusTracker()
            before_jobs = len(tracker.getJobIdsForGroup(None) or [])
            try:
                REGISTRY[name].fn(spark, sf_dir).count()
            except Exception as exc:
                captured.append(f"ERROR running query: {exc}")
            job_counts[name] = len(tracker.getJobIdsForGroup(None) or []) - before_jobs
            for k, plan in enumerate(captured):
                path = os.path.join(out_dir, f"{name}_inner{k}_{tag}.txt")
                with open(path, "w") as fh:
                    fh.write(plan)
                print(f"wrote {path} ({len(plan)} chars)")
    finally:
        _CDF.localCheckpoint = orig
    print("job counts:", json.dumps(job_counts))
    spark.stop()


if __name__ == "__main__":
    main()
