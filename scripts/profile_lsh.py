"""Stage-level decomposition of the MinHash-LSH pairs path (the shared
stage behind dedup_minhash_lsh / dedup_connected_components /
pipeline_training_data) and of the CC fixpoint — guide §1: measure
first, isolate with the noop sink.

Usage: python scripts/profile_lsh.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:<46s} {dt:7.3f}s")
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lsh-profile")
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

    from quick_stream_spark.functions import minhash as mh
    from quick_stream_spark.plans._util import clear_session_caches
    from quick_stream_spark.plans import text as txt
    from quick_stream_spark.plans.registry import REGISTRY, queries

    queries()

    # warm codegen with one full pass at sf0.001
    warm = "/root/testdata/sf0.001"
    sc = spark.sparkContext
    sc.setJobDescription("warmup")
    REGISTRY["dedup_connected_components"].fn(spark, warm).count()
    clear_session_caches()

    for rep in range(2):
        print(f"--- repeat {rep} ---")
        clear_session_caches()
        sc.setJobDescription("corpus-count(_corpus_parts)")
        timed("corpus parts (doc count)", lambda: txt._corpus_parts(spark, sf_dir))
        sc.setJobDescription("corpus materialize+count")
        corpus = timed(
            "corpus persist+count", lambda: (txt._corpus(spark, sf_dir).count(), txt._corpus(spark, sf_dir))
        )[1]
        corpus = corpus.select("id", "sh")
        sc.setJobDescription("candidate pairs")
        cand = mh.candidate_pairs_lsh(corpus, "id", "sh", prehashed=True)
        j = mh.jaccard(F.col("shingles_a"), F.col("shingles_b"))
        pairs = (
            cand.withColumn("jaccard", j)
            .filter(F.col("jaccard") >= txt.JACCARD_THRESHOLD)
            .select("id_a", "id_b", "jaccard")
        )
        with txt._scoped_shuffle(spark, txt._corpus_parts(spark, sf_dir)):
            ckpt = timed("pairs job (cand+verify+ckpt)", lambda: pairs.localCheckpoint(eager=True))
        n_pairs = ckpt.count()
        print(f"  n_pairs = {n_pairs}")

        # CC fixpoint on top of the cached pairs
        from quick_stream_spark.functions.graph import min_label_components

        sc.setJobDescription("cc-fixpoint")
        with txt._scoped_shuffle(spark, txt._corpus_parts(spark, sf_dir)):
            timed("cc fixpoint", lambda: noop(min_label_components(spark, ckpt.select("id_a", "id_b"))))

        # full-query timings for reference (bench methodology)
        for name in ("dedup_minhash_lsh", "dedup_connected_components", "pipeline_training_data"):
            clear_session_caches()
            sc.setJobDescription(f"full:{name}")
            fn = REGISTRY[name].fn
            timed(f"full {name}", lambda: fn(spark, sf_dir).count())

    spark.stop()


if __name__ == "__main__":
    main()
