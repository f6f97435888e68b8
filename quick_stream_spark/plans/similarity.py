"""Similarity search over the ``embeddings`` table (``array<float>``,
64-dim): brute-force cosine top-k (verified baseline), label centroids,
and hyperplane-LSH bucketing (the approximate scale path).

Determinism: all float math is float->double casts followed by the same
left-to-right fold in both engines (Spark ``zip_with``+``aggregate`` vs
DuckDB ``list_transform``+``list_sum``), so scores are bit-identical
before the final rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_stream_spark.functions import vectors as vec
from quick_stream_spark.plans._util import pin_session
from quick_stream_spark.plans.registry import register
from quick_stream_spark.sources.readers import load_table

NUM_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 5
DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session(spark)
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", vec.to_double(F.col("embedding")).alias("v"), "label"
    )


_COS = vec.cosine_sql("q.v", "c.v", DIM)

@register(
    "emb_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < {NUM_QUERIES}),
    c AS (SELECT * FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS} AS cos_sim
      FROM q JOIN c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    tags=("similarity",),
    bench=True,
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against
    the corpus — one corpus scan, no shuffle until the per-query top-k.
    This is the exact baseline the LSH/IVF variants are measured
    against."""
    e = _emb(spark, sf_dir)
    q = F.broadcast(
        e.filter(F.col("vec_id") < NUM_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            vec.cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


@register(
    "emb_centroid_by_label",
    oracle=f"""
    WITH ex AS (
      SELECT label,
             unnest(range(0, {DIM})) AS pos,
             unnest(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    )
    SELECT label, pos,
           round(CAST(SUM(CAST(round(val * 1000000) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 1000000, 6) AS centroid
    FROM ex GROUP BY label, pos
    """,
    tags=("similarity", "agg"),
)
def emb_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids (the building block for IVF cells).
    Components are scaled to integers before summing so the aggregation
    is exact and order-independent — float sums would differ between
    engines/partitionings."""
    e = _emb(spark, sf_dir)
    ex = e.select("label", F.posexplode("v").alias("pos", "val"))
    scaled = F.round(F.col("val") * 1_000_000).cast("long")
    return (
        ex.groupBy("label", "pos")
        .agg(F.sum(scaled).alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("s").cast("double") / F.col("n") / 1_000_000, 6).alias("centroid"),
        )
    )


def _sig_sql(v: str) -> str:
    return vec.hyperplane_signature_sql(v, vec.NUM_PLANES, DIM)


@register(
    "emb_lsh_signatures",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT vec_id, {_sig_sql('v')} AS sig FROM e
    """,
    tags=("similarity", "lsh"),
)
def emb_lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane sign-LSH signatures ({vec.NUM_PLANES} deterministic
    md5-parity planes).  Vectors sharing a signature are ANN candidates;
    bucketing is an equi-join, so candidate generation never does the
    O(n^2) scan."""
    e = _emb(spark, sf_dir)
    return e.select("vec_id", vec.hyperplane_signature(F.col("v")).alias("sig"))


@register(
    "emb_lsh_ann_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, v, {_sig_sql('v')} AS sig FROM e),
    q AS (SELECT * FROM s WHERE vec_id < {NUM_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cos_sim
      FROM q JOIN s c ON q.sig = c.sig AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "lsh", "approx"),
)
def emb_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k through the LSH buckets: candidates share the full
    signature (equi-join), then exact cosine + top-k within the bucket.
    Approximate by design (recall < 1 versus emb_cosine_topk) but both
    engines compute the identical bucketed result."""
    e = _emb(spark, sf_dir)
    s = e.select("vec_id", "v", vec.hyperplane_signature(F.col("v")).alias("sig"))
    q = s.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "sig"
    )
    c = s.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "sig")
    scored = (
        q.join(c, "sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", vec.cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )
