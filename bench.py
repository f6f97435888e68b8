"""Benchmark harness: runs the headline queries (REGISTRY entries with
bench=True, plus the end-to-end ingestion pipeline) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Timing = full query wall-clock including the action (count/collect of
aggregates), which is what a user experiences.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402


def build_session(cpus: str) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("quick-stream-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F  # noqa: E402

    # Session warmup (untimed): first-job executor spin-up, JIT and the
    # janino/Arrow code paths cost ~3s that would otherwise land on
    # whichever query runs first — that's harness noise, not query cost.
    (
        spark.range(20_000)
        .withColumn("s", F.md5(F.col("id").cast("string")))
        .withColumn("a", F.transform(F.split(F.col("s"), ""), lambda x: F.conv(x, 16, 10)))
        .repartition(8, "id")
        .groupBy((F.col("id") % 7).alias("g"))
        .count()
        .count()
    )

    # Per-session calibration constant (r11 verdict ask #4): the driver
    # trend drifted four rounds in a row on box-load alone, each time
    # adjudicated by an out-of-band checkout A/B.  Two fixed probes —
    # a single-thread Python loop (per-core scalar envelope) and a
    # fixed pure-JVM scan-agg (aggregate JVM throughput, the shape
    # every benched query bottoms out on) — run before AND after the
    # query loop; cross-round ratios can then be load-corrected by the
    # probe ratio without re-checking out the previous round's code.
    def calibrate() -> dict:
        py, jvm = [], []
        for _ in range(2):  # best-of-2: the first pass may pay JIT
            t0 = time.perf_counter()
            acc = 0
            for i in range(2_000_000):
                acc += i * i
            py.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            spark.range(20_000_000).select(
                # top halves: 20M 32-bit terms can't overflow ANSI long
                F.sum(F.shiftrightunsigned(F.xxhash64("id"), 32)).alias("s")
            ).collect()
            jvm.append(time.perf_counter() - t0)
        return {
            "py_sec": round(min(py), 3),
            "jvm_sec": round(min(jvm), 3),
            "loadavg_1min": loadavg(),
        }

    from quick_stream_spark.plans._util import clear_session_caches
    from quick_stream_spark.plans.registry import REGISTRY, queries

    queries()  # populate
    names = sorted(n for n, s in REGISTRY.items() if s.bench)
    # the ingestion pipeline is the reference's core — always bench it
    for core in ("r_upsert_endstate", "r_stream_upsert_endstate"):
        if core not in names:
            names.append(core)

    # Plan-shape warmup (untimed): run each benched query once at the
    # smallest scale factor IMMEDIATELY before its timed run.  Identical
    # plan shapes hit the codegen (janino) cache, so the timed run
    # measures the data path at the target SF — the figure that projects
    # to a long-lived cluster — not one-time Catalyst/JIT compilation of
    # the year's largest expression trees.  The warmup is interleaved
    # per-query rather than batched up front: Spark's generated-class
    # cache is bounded, so warming all plans first lets later warmups
    # evict earlier queries' classes and the first timed queries pay
    # full recompilation again (measured: 2x on the minhash/CC family).
    # Per-(session, sf_dir) caches inside the queries key on the sf dir,
    # so nothing computed in a warmup is reused by the timed runs.
    warm_sf = "/root/testdata/sf0.001"
    do_warm = os.path.isdir(warm_sf) and os.path.abspath(warm_sf) != os.path.abspath(
        sf_dir
    )

    # Variance-aware timing (r4 verdict ask #2): one measured run per
    # round cannot distinguish a real regression from driver-machine
    # load — r4's 34.5s driver run vs the builder's 25.2s on identical
    # code was unadjudicable.  Each query therefore runs REPEATS times;
    # the canonical figure is the MEDIAN (robust to a single noisy
    # run), and the JSON carries every run plus the relative spread
    # (max-min)/median so the next round can tell noise from change.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

    # In-band load capture (r10 verdict ask #2): every drift
    # adjudication so far (r6, r9, r10) needed out-of-band archaeology
    # to separate box load from code change.  Record /proc/loadavg
    # (1-min figure) immediately before EVERY repeat, per query, so the
    # emitted JSON itself carries the evidence — a round whose elevated
    # medians coincide with elevated recorded loads is self-adjudicating.
    def loadavg() -> float | None:
        try:
            with open("/proc/loadavg") as fh:
                return float(fh.read().split()[0])
        except (OSError, ValueError, IndexError):  # non-Linux: omit
            return None

    calib_before = calibrate()
    timings: dict[str, float] = {}
    runs_all: dict[str, list[float]] = {}
    loads_all: dict[str, list[float | None]] = {}
    # minimum alongside median (r6 verdict ask #8): under environmental
    # load the MIN is the load-robust floor — two rounds whose mins agree
    # but medians drift point at machine noise, not a plan change.
    mins: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        if do_warm:
            try:
                fn(spark, warm_sf).count()
            except Exception as exc:  # warmup must never fail the bench
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        # Discarded cold pass at the TARGET sf (r5 verdict ask #6): the
        # first post-cache-clear execution pays one-time costs that
        # survive the sf0.001 plan warmup — OS page cache for the
        # target-SF parquet, file-footer reads, JIT of data-dependent
        # paths.  pipeline_training_data's monotone 8.3→5.2→3.4s decay
        # showed those costs landing inside the timed window and
        # inflating its spread to 0.95; one untimed pass moves them out
        # without changing what the timed runs measure (each still
        # starts from a cleared artifact cache).
        try:
            clear_session_caches()
            fn(spark, sf_dir).count()
        except Exception as exc:
            # A query broken at the target SF would also raise in every
            # timed run below, crashing the bench mid-loop and losing
            # every other query's numbers — skip its timed runs instead
            # and leave it absent from the JSON (absent == failed).
            print(f"# cold pass {name} failed, skipping: {exc}", file=sys.stderr)
            continue
        runs: list[float] = []
        loads: list[float | None] = []
        n = -1
        for _ in range(repeats):
            # Independent attribution: clear every shared artifact cache
            # (pair sets, codebooks, corpora, counts) so each timed run
            # computes its own shared stages — per-query lines are then
            # reproducible under reordering, instead of billing a shared
            # stage to whichever consumer happens to run first.  The JVM
            # codegen cache warmed above is unaffected (that's harness
            # noise we DO want excluded).
            clear_session_caches()
            loads.append(loadavg())
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()  # force full execution
            runs.append(round(time.perf_counter() - start, 3))
        med = sorted(runs)[len(runs) // 2]
        timings[name] = med
        runs_all[name] = runs
        loads_all[name] = loads
        mins[name] = min(runs)
        spread[name] = round((max(runs) - min(runs)) / med, 3) if med else 0.0
        print(
            f"# {name}: {med}s median of {runs} ({n} rows)", file=sys.stderr
        )

    calib_after = calibrate()
    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # ingestion throughput: the end-state replays push every events row
    # through real merges (the reference's core loop), so rows/s is the
    # comparable single-node ingest figure
    from quick_stream_spark.sources.readers import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    extras = {}
    for key, qname in (
        ("ingest_rows_per_sec", "r_upsert_endstate"),
        ("stream_ingest_rows_per_sec", "r_stream_upsert_endstate"),
    ):
        if timings.get(qname):
            extras[key] = round(n_events / timings[qname])
    print(
        json.dumps(
            {
                "metric": "bench_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else sf_dir,
                "repeats": repeats,
                "runs": runs_all,
                "min": mins,
                "spread": spread,
                # 1-min /proc/loadavg read before each repeat (r10
                # verdict ask #2): drift adjudication data, in-band
                "loadavg": loads_all,
                # fixed-probe calibration before/after the query loop
                # (r11 verdict ask #4): correct cross-round ratios by
                # the probe ratio instead of a checkout A/B
                "calibration": {
                    "before": calib_before,
                    "after": calib_after,
                    "cpu_count": os.cpu_count(),
                },
                # methodology marker (r6 ADVICE): since r6 an untimed
                # cold pass at the target SF precedes the timed runs, so
                # medians are not comparable to r5-and-earlier numbers
                "cold_pass": True,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
