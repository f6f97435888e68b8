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
from quick_stream_spark.plans._util import pin_session, rows_sized_parts, scoped_shuffle, shared_cache
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


_EMB_COUNT_CACHE: dict = shared_cache({})


def _emb_count(spark: SparkSession, sf_dir: str) -> int:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EMB_COUNT_CACHE:
        # parquet count() is metadata-only
        _EMB_COUNT_CACHE[key] = load_table(spark, sf_dir, "embeddings").count()
    return _EMB_COUNT_CACHE[key]


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
    "emb_quantize_int8",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (
      SELECT vec_id, v,
             127.0 / list_max(list_transform(v, x -> abs(x))) AS scale
      FROM e WHERE list_max(list_transform(v, x -> abs(x))) > 0
    ),
    q AS (
      SELECT vec_id, v, scale,
             list_transform(v, x -> greatest(least(round(x * scale), 127.0), -127.0)) AS qv
      FROM s
    )
    SELECT vec_id,
           round(scale, 6) AS scale,
           CAST(list_sum(qv) AS BIGINT) AS q_checksum,
           CAST(list_min(qv) AS INT) AS q_min,
           CAST(list_max(qv) AS INT) AS q_max,
           round(sqrt(list_sum(list_transform(range(1, {DIM + 1}),
                 j -> (v[j] - qv[j] / scale) * (v[j] - qv[j] / scale)))), 6) AS l2_error
    FROM q
    """,
    tags=("similarity", "quantize"),
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of embeddings (the 4x storage
    compression step of a vector pipeline): per-vector scale 127/max|x|,
    clamped rounding, plus reconstruction L2 error.  All element math is
    the same left-to-right fold in both engines; round() is
    half-away-from-zero in both."""
    e = _emb(spark, sf_dir)
    absmax = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    s = e.filter(absmax > 0).withColumn("scale", F.lit(127.0) / absmax)
    qv = F.transform(
        F.col("v"),
        lambda x: F.greatest(F.least(F.round(x * F.col("scale")), F.lit(127.0)), F.lit(-127.0)),
    )
    q = s.withColumn("qv", qv)
    err = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("v"),
                F.col("qv"),
                lambda x, qx: (x - qx / F.col("scale")) * (x - qx / F.col("scale")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.aggregate(F.col("qv"), F.lit(0.0), lambda a, x: a + x).cast("long").alias("q_checksum"),
        F.array_min("qv").cast("int").alias("q_min"),
        F.array_max("qv").cast("int").alias("q_max"),
        F.round(err, 6).alias("l2_error"),
    )


# ---------------------------------------------------------------- k-means

KMEANS_K = 8
KMEANS_ITERS = 3


def _exact_mean_sql(val: str) -> str:
    """Exact order-independent mean via scaled integers (same
    construction as the centroid query)."""
    return (
        f"round(CAST(SUM(CAST(round({val} * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / COUNT(*) / 1000000, 6)"
    )


def _kmeans_ctes() -> list:
    """CTE layers of the unrolled Lloyd's iterations (shared by the
    k-means oracle and the trained-codebook IVF oracle)."""
    sq = _sqdist_sql("e.v", "c.c")
    parts = [
        f"e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""cents_0 AS (
          SELECT vec_id AS cell, v AS c FROM e WHERE vec_id < {KMEANS_K}
        )""",
    ]
    for i in range(1, KMEANS_ITERS + 1):
        parts.append(
            f"""asg_{i} AS (
              SELECT vec_id, v, cell FROM (
                SELECT e.vec_id, e.v, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {sq} ASC, c.cell ASC) AS rn
                FROM e CROSS JOIN cents_{i - 1} c
              ) WHERE rn = 1
            )"""
        )
        parts.append(
            f"""cr_{i} AS (
              SELECT cell, pos, {_exact_mean_sql('val')} AS cv
              FROM (
                SELECT cell, unnest(range(0, {DIM})) AS pos, unnest(v) AS val
                FROM asg_{i}
              ) GROUP BY cell, pos
            )"""
        )
        if i < KMEANS_ITERS:
            parts.append(
                f"""cents_{i} AS (
                  SELECT cell, list(cv ORDER BY pos) AS c FROM cr_{i} GROUP BY cell
                )"""
            )
    return parts


def _kmeans_oracle() -> str:
    ctes = ",\n".join(_kmeans_ctes())
    return f"""
    WITH {ctes}
    SELECT cell, CAST(pos AS BIGINT) AS pos, cv AS centroid FROM cr_{KMEANS_ITERS}
    """


# Trained models are session artifacts: the scorecard, SemDeDup, IVF
# and the centroid query all (re)train the same codebook — cache the
# checkpointed result per (session, sf_dir) so training runs once, the
# way a production pipeline trains offline and reuses the model.
_KMEANS_CACHE: dict = shared_cache({})


def emb_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means codebook training (K={KMEANS_K}, {KMEANS_ITERS} Lloyd
    iterations, deterministic first-K init) — the offline step that
    produces a real IVF codebook.  Iterative ML on Spark: each round
    assigns vectors to their nearest centroid (one transform over the
    broadcast-sized literal centroid array — the model crosses the
    driver, never the data) and recomputes exact scaled-integer means.
    Fixed iteration count keeps it SQL-expressible: the oracle unrolls
    the same three rounds as CTE layers.  Trained once per
    (session, sf_dir) — see _KMEANS_CACHE."""
    from quick_stream_spark.plans._util import session_cached

    return session_cached(
        _KMEANS_CACHE, spark, sf_dir, lambda: _kmeans_train_impl(spark, sf_dir)
    )


def _kmeans_train_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select("vec_id", "v")
    init = e.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cell"), F.posexplode("v").alias("pos", "cv")
    )
    cent_rows = init.collect()

    def to_lists(rows):
        by_cell: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cell.setdefault(r.cell, {})[r.pos] = float(r.cv)
        return [(cell, [by_cell[cell][p] for p in range(DIM)]) for cell in sorted(by_cell)]

    cents = to_lists(cent_rows)
    cr = None
    # each Lloyd round shuffles (n_vectors x DIM) scalar rows and ends
    # in a bounded collect (K x DIM floats) — size the shuffle to that
    # row count, not the static conf (see _util.scoped_shuffle); the
    # loop's collects execute inside the scope, so the width is live
    n_rows = _emb_count(spark, sf_dir) * DIM
    with scoped_shuffle(spark, rows_sized_parts(n_rows, 500_000)):
        cents, cr = _lloyd_rounds(spark, e, cents, to_lists)
        out = cr.select("cell", "pos", F.col("cv").alias("centroid")).localCheckpoint(
            eager=True
        )
    return out


def _lloyd_rounds(spark: SparkSession, e: DataFrame, cents, to_lists):
    """Lloyd iterations with ROW-LOCAL nearest-cell math: the centroids
    cross the driver as literal arrays (bounded: K x DIM floats), so
    assignment is one transform per row with NO shuffle and no join —
    the right trade at cluster scale (a per-centroid join would shuffle
    n_vectors x K rows per round).  The changing literals do re-pay
    plan compilation each round; a one-row broadcast frame was measured
    SLOWER (LocalRelation data embeds in the plan anyway, plus a
    broadcast exchange per round).  Tie-break: array_position takes the
    FIRST minimum and cells are sorted ascending, so the lowest cell id
    wins — the oracle's (distance, cell) row_number order."""
    cr = None
    for _ in range(KMEANS_ITERS):
        cells_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for _, c in cents])
        cell_ids_lit = F.array(*[F.lit(cid) for cid, _ in cents])

        def sqdist(c):
            return F.aggregate(
                F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        dist_arr = F.transform(cells_lit, sqdist)
        best = F.array_position(dist_arr, F.array_min(dist_arr)).cast("int")
        assigned = e.select(
            "vec_id", "v", F.element_at(cell_ids_lit, best).alias("cell")
        )
        scaled = F.round(F.col("val") * 1_000_000).cast("long")
        cr = (
            assigned.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum(scaled).alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cell",
                F.col("pos").cast("long").alias("pos"),
                F.round(F.col("s").cast("double") / F.col("n") / 1_000_000, 6).alias("cv"),
            )
        )
        cents = to_lists(cr.collect())
    return cents, cr


@register(
    "emb_centroids",
    oracle=None,  # set at module end (kmeans side is generated, unrolled)
    tags=("similarity", "agg", "ivf", "iterative", "ml"),
)
def emb_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both codebook constructions, tagged by method:

    - ``label`` — per-label centroids (the supervised building block
      for IVF cells), exact scaled-integer means so the aggregation is
      order-independent;
    - ``kmeans`` — the trained codebook: K={KMEANS_K} Lloyd iterations
      ({KMEANS_ITERS} rounds, deterministic first-K init).  Iterative ML
      on Spark: each round assigns vectors to their nearest centroid via
      one transform over a broadcast-sized literal centroid array (the
      model crosses the driver, never the data) and recomputes exact
      means; the oracle unrolls the same rounds as CTE layers.
    """
    lab = emb_centroid_by_label(spark, sf_dir).select(
        F.lit("label").alias("method"),
        F.col("label").cast("long").alias("cell"),
        "pos",
        "centroid",
    )
    km = emb_kmeans_train(spark, sf_dir).select(
        F.lit("kmeans").alias("method"),
        F.col("cell").cast("long").alias("cell"),
        "pos",
        "centroid",
    )
    return lab.unionByName(km)


# ------------------------------------------------------------------- IVF

N_PROBE = 2  # cells probed per query

# exact order-independent centroids, shared by the IVF Spark query and
# its SQL oracle (same scaled-integer construction as
# emb_centroid_by_label, pivoted to one row per cell)
_CENTROIDS_CTE = f"""
    cent_rows AS (
      SELECT label AS cell, pos,
             round(CAST(SUM(CAST(round(val * 1000000) AS BIGINT)) AS DOUBLE)
                   / COUNT(*) / 1000000, 6) AS cv
      FROM (
        SELECT label, unnest(range(0, {DIM})) AS pos,
               unnest(CAST(embedding AS DOUBLE[])) AS val
        FROM embeddings
      ) GROUP BY label, pos
    ),
    cents AS (
      SELECT cell, list(cv ORDER BY pos) AS c FROM cent_rows GROUP BY cell
    )
"""


def _sqdist_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {DIM + 1}), "
        f"j -> (({a})[j] - ({b})[j]) * (({a})[j] - ({b})[j])))"
    )


def _centroid_literals(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[float]]]:
    """Collect the (bounded: one per label) exact centroids to the
    driver — a model artifact, not data; at scale this is the k-means
    codebook trained offline."""
    rows = emb_centroid_by_label(spark, sf_dir).collect()
    by_cell: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cell.setdefault(r.label, {})[r.pos] = r.centroid
    return [
        (cell, [by_cell[cell][p] for p in range(DIM)]) for cell in sorted(by_cell)
    ]


@register(
    "emb_ivf_ann_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
    {_CENTROIDS_CTE},
    dists AS (
      SELECT e.vec_id, e.v, cents.cell, {_sqdist_sql('e.v', 'cents.c')} AS d
      FROM e CROSS JOIN cents
    ),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id, v, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        FROM dists
      ) WHERE rn <= {N_PROBE} AND vec_id < {NUM_QUERIES}
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {vec.cosine_sql('q.v', 'c.v', DIM)} AS cos_sim
      FROM probes q JOIN assigned c ON q.cell = c.cell AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM (SELECT DISTINCT query_id, neighbor_id, cos_sim FROM scored) s
    ) WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "ivf", "approx"),
    # (trained codebook, better recall) is the driver-checked one
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def emb_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: vectors are inverted-file-indexed by their nearest
    coarse centroid (the label centroids as the codebook); each query
    probes its {N_PROBE} nearest cells and runs exact cosine top-k only
    inside them.  At 100 TB: partition the corpus BY cell so a probe
    reads only its cells' partitions; the codebook is a broadcast-sized
    model artifact.  Distances to all cells are one `transform` over a
    literal centroid array (one small expression tree, no per-cell
    expansion)."""
    e = _emb(spark, sf_dir)
    cents = _centroid_literals(spark, sf_dir)
    cells_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for _, c in cents])
    cell_ids = [cell for cell, _ in cents]

    def sqdist(c):
        return F.aggregate(
            F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dist_arr = F.transform(cells_lit, sqdist)
    # first argmin (ties -> lowest cell id, like the oracle's rn=1)
    best = F.array_position(dist_arr, F.array_min(dist_arr)).cast("int") - 1
    assigned = e.select(
        F.col("vec_id"), F.col("v"), F.element_at(F.array(*map(F.lit, cell_ids)), best + 1).alias("cell")
    )
    # queries probe their N_PROBE nearest cells
    qd = (
        e.filter(F.col("vec_id") < NUM_QUERIES)
        .select("vec_id", "v", F.posexplode(dist_arr).alias("pos", "d"))
        .select(
            "vec_id",
            "v",
            F.element_at(F.array(*map(F.lit, cell_ids)), F.col("pos") + 1).alias("cell"),
            "d",
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cell"))
    probes = (
        qd.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cell")
    )
    scored = (
        probes.join(assigned.withColumnRenamed("vec_id", "neighbor_id"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            vec.cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
        .distinct()
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


@register(
    "emb_lsh_signatures",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT vec_id, {_sig_sql('v')} AS sig FROM e
    """,
    tags=("similarity", "lsh"),
    # r10: rotated INTO the driver window (first-time driver check)
    # wider (24-plane) signature for retrieval
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def emb_lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane sign-LSH signatures ({vec.NUM_PLANES} deterministic
    md5-parity planes).  Vectors sharing a signature are ANN candidates;
    bucketing is an equi-join, so candidate generation never does the
    O(n^2) scan."""
    e = _emb(spark, sf_dir)
    return e.select("vec_id", vec.hyperplane_signature(F.col("v")).alias("sig"))


# Confusable-pair banding (24 planes / 6 OR-bands of 4 bits): the
# geometry behind hard-negative MINING and the streaming vector index,
# where "shares any band" is the desired loose filter (~34% of random
# pairs collide — deliberately broad: a confusability net, not a
# retrieval index).
ANN_PLANES = 24
ANN_BAND_BITS = 4
ANN_BANDS = ANN_PLANES // ANN_BAND_BITS

# RETRIEVAL banding (r4): pure OR-amplification cannot be selective on
# this adversarially near-random corpus (exact top-5 cosines 0.25-0.49
# -> per-plane agreement only 0.58-0.66 vs 0.50 random; the r3 design
# measured recall 0.65 at the cost of touching ~34% of the corpus).
# The fix is collision-COUNT thresholding: band the signature into
# MANY narrow bands and keep only candidate pairs sharing >= T bands —
# statistically a Hamming test on the full 192-bit sketch, but
# computed as an ids-only equi-join + count (never all-pairs, vectors
# fetched only for survivors).  Parameters from the binomial model
# sweep-measured at sf0.01 (see /tmp-sweep in the r4 changelog): with
# 48 bands x 4 bits, T=7 measures recall@5 = 0.625 at candidate
# fraction 0.060; T=6 measured 0.725 / 0.130 and fails the fraction
# gate (the binomial model under-predicts the fraction ~1.7x because
# somewhat-similar non-top-5 pairs also clear the count — which is the
# filter working as intended).  tests/test_ann_recall.py holds BOTH
# gates: recall >= 0.6 AND re-ranked fraction <= 0.10.
LSH_ANN_PLANES = 192
LSH_ANN_BAND_BITS = 4
LSH_ANN_BANDS = LSH_ANN_PLANES // LSH_ANN_BAND_BITS
LSH_ANN_MIN_BANDS = 7  # T: min shared bands for a pair to be re-ranked


_LSH_CAND_SQL = f"""
    {vec.banded_sig_ctes_sql('e', LSH_ANN_PLANES, LSH_ANN_BAND_BITS, DIM)},
    cand AS (
      SELECT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
      FROM bands qb JOIN bands cb ON qb.b = cb.b AND qb.bits = cb.bits
      WHERE qb.vec_id < {NUM_QUERIES} AND qb.vec_id <> cb.vec_id
      GROUP BY 1, 2
      HAVING count(*) >= {LSH_ANN_MIN_BANDS}
    )
"""


def _lsh_candidates(e: DataFrame) -> DataFrame:
    """Collision-count candidate generation: (query_id, neighbor_id)
    pairs sharing >= {LSH_ANN_MIN_BANDS} of the {LSH_ANN_BANDS} 4-bit
    bands.  Ids-only throughout — the band join and the count shuffle
    carry (band, bits, id) rows; vectors are fetched downstream, only
    for survivors."""
    # the small-SF embeddings table is ONE parquet file -> one input
    # split — spread the CPU-bound signature across the cores (tiny
    # rows; the round-robin shuffle is noise next to the math), and
    # compute it with the Arrow-batched matmul twin (~40x the
    # interpreted 192-fold expression; bit-identical, see
    # hyperplane_signature_fast).
    e = e.repartition(e.sparkSession.sparkContext.defaultParallelism)
    s = e.select(
        "vec_id",
        vec.hyperplane_signature_fast(F.col("v"), LSH_ANN_PLANES).alias("sig"),
    )
    bands = s.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.substring(
                        "sig", b * LSH_ANN_BAND_BITS + 1, LSH_ANN_BAND_BITS
                    )
                    for b in range(LSH_ANN_BANDS)
                ]
            )
        ).alias("band", "bits"),
    )
    qb = bands.filter(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band", "bits"
    )
    cb = bands.select(F.col("vec_id").alias("neighbor_id"), "band", "bits")
    return (
        qb.join(cb, ["band", "bits"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        .filter(F.col("n_shared_bands") >= LSH_ANN_MIN_BANDS)
        .select("query_id", "neighbor_id")
    )


@register(
    "emb_lsh_ann_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    {_LSH_CAND_SQL},
    scored AS (
      SELECT t.query_id, t.neighbor_id, {vec.cosine_sql('q.v', 'c.v', DIM)} AS cos_sim
      FROM cand t
      JOIN e q ON q.vec_id = t.query_id
      JOIN e c ON c.vec_id = t.neighbor_id
    )
    SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    # 'arrow': declared Arrow-batched seam — hyperplane_signature_fast is a
    # vectorized pandas_udf (ArrowEvalPython), pinned bit-identical to the
    # JVM fold by tests/test_ann_recall.py; the plan-purity guard allows
    # ArrowEvalPython only under this tag (BatchEvalPython is always banned).
    tags=("similarity", "lsh", "approx", "arrow"),
    bench=True,  # LLM-pipeline tier benched at sf0.1 (r4),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def emb_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN by collision-count thresholding: each vector's
    {LSH_ANN_PLANES}-plane signature splits into {LSH_ANN_BANDS} bands
    of {LSH_ANN_BAND_BITS} bits; a corpus vector is a candidate when
    it shares >= {LSH_ANN_MIN_BANDS} bands with the query (equi-join
    on (band, bits) + per-pair count — statistically a Hamming-
    similarity test on the whole sketch, but never an all-pairs
    comparison), then exact cosine re-ranks survivors to top-{TOP_K}.

    Scale design: candidate generation is one ids-only equi-join of
    two band-exploded frames + a map-combinable pair count; full
    vectors are fetched only for count survivors (measured 6.0% of
    the corpus per query at recall@5 = 0.625 on this adversarially
    near-random corpus — see emb_ann_quality_eval's cand_frac column;
    the r3 OR-amplified design touched ~34%).  The count threshold is the
    selectivity dial: on real clustered embeddings the same machinery
    runs with wider bands for a sub-1% fraction.  The band join emits
    ~{LSH_ANN_BANDS}/2^{LSH_ANN_BAND_BITS} narrow rows per (query,
    corpus vector) — linear in corpus size with a tiny constant, the
    standard cost shape of batch LSH retrieval; per-query sublinear
    serving would move the same index into a key-value store."""
    e = _emb(spark, sf_dir)
    cand = _lsh_candidates(e)
    q = F.broadcast(
        e.filter(F.col("vec_id") < NUM_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    scored = (
        cand.join(c, "neighbor_id")
        .join(q, "query_id")
        .select("query_id", "neighbor_id", vec.cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )



_IVF_PROBE_CTES = f"""
    dists AS (
      SELECT e.vec_id, e.v, cents.cell, {_sqdist_sql('e.v', 'cents.c')} AS d
      FROM e CROSS JOIN cents
    ),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id, v, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        FROM dists
      ) WHERE rn <= {N_PROBE} AND vec_id < {NUM_QUERIES}
    )
"""

_IVF_TAIL_SQL = f"""
    {_IVF_PROBE_CTES},
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {vec.cosine_sql('q.v', 'c.v', DIM)} AS cos_sim
      FROM probes q JOIN assigned c ON q.cell = c.cell AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM (SELECT DISTINCT query_id, neighbor_id, cos_sim FROM scored) s
    ) WHERE rank <= {TOP_K}
"""


def _ivf_probe_frames(e: DataFrame, cents: list) -> tuple[DataFrame, DataFrame]:
    """Shared IVF probe frames: ``(probes, assigned)`` — the query
    probe list (query_id, qv, cell) over the N_PROBE nearest cells and
    the corpus cell assignment (vec_id, v, cell).  Their cell equi-join
    IS the candidate set; both the top-k and the quality eval's
    candidate-fraction measurement derive from these same frames."""
    cells_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for _, c in cents])
    cell_ids = [cell for cell, _ in cents]

    def sqdist(c):
        return F.aggregate(
            F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dist_arr = F.transform(cells_lit, sqdist)
    best = F.array_position(dist_arr, F.array_min(dist_arr)).cast("int")
    assigned = e.select(
        "vec_id", "v", F.element_at(F.array(*map(F.lit, cell_ids)), best).alias("cell")
    )
    qd = (
        e.filter(F.col("vec_id") < NUM_QUERIES)
        .select("vec_id", "v", F.posexplode(dist_arr).alias("pos", "d"))
        .select(
            "vec_id",
            "v",
            F.element_at(F.array(*map(F.lit, cell_ids)), F.col("pos") + 1).alias("cell"),
            "d",
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cell"))
    probes = (
        qd.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cell")
    )
    return probes, assigned


def _ivf_candidates(e: DataFrame, cents: list) -> DataFrame:
    """Distinct (query_id, neighbor_id) pairs the IVF probe re-ranks —
    the corpus vectors living in each query's probed cells."""
    probes, assigned = _ivf_probe_frames(e, cents)
    return (
        probes.select("query_id", "cell")
        .join(
            assigned.select(F.col("vec_id").alias("neighbor_id"), "cell"),
            "cell",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )


def _ivf_probe_topk(e: DataFrame, cents: list) -> DataFrame:
    """Shared IVF probe: assign corpus to nearest cell, probe N_PROBE
    nearest cells per query, exact cosine top-k within them."""
    probes, assigned = _ivf_probe_frames(e, cents)
    scored = (
        probes.join(assigned.withColumnRenamed("vec_id", "neighbor_id"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            vec.cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
        .distinct()
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def _trained_ivf_oracle() -> str:
    ctes = ",\n".join(_kmeans_ctes())
    return f"""
    WITH {ctes},
    cents AS (SELECT cell, list(cv ORDER BY pos) AS c
              FROM cr_{KMEANS_ITERS} GROUP BY cell),
    {_IVF_TAIL_SQL}
    """


def _trained_ivf_cand_sql() -> str:
    """Per-query candidate COUNTS of the trained IVF probe (same CTE
    stack as the top-k oracle, counting the probe join instead of
    ranking it) — feeds emb_ann_quality_eval's cand_frac column."""
    ctes = ",\n".join(_kmeans_ctes())
    return f"""
    WITH {ctes},
    cents AS (SELECT cell, list(cv ORDER BY pos) AS c
              FROM cr_{KMEANS_ITERS} GROUP BY cell),
    {_IVF_PROBE_CTES}
    SELECT query_id, count(*) AS n_cand FROM (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM probes q JOIN assigned c ON q.cell = c.cell AND q.vec_id <> c.vec_id
    ) GROUP BY query_id
    """


@register(
    "emb_ivf_trained_topk",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle=None,  # assigned below from the generated CTE stack
    tags=("similarity", "ivf", "approx", "ml"),
)
def emb_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete ANN story end-to-end: TRAIN the coarse codebook
    (k-means, emb_kmeans_train) -> INDEX the corpus by nearest trained
    centroid -> PROBE the nearest cells per query with exact cosine
    top-k.  Same probe machinery as emb_ivf_ann_topk but with the
    trained codebook instead of label centroids."""
    e = _emb(spark, sf_dir).select("vec_id", "v")
    km = emb_kmeans_train(spark, sf_dir)
    by_cell = {}
    for r in km.collect():
        by_cell.setdefault(r.cell, {})[r.pos] = float(r.centroid)
    cents = [(cell, [by_cell[cell][p] for p in range(DIM)]) for cell in sorted(by_cell)]
    return _ivf_probe_topk(e, cents)


EMB_DUP_OFFSET = 100_000
EMB_DUP_THRESHOLD = 0.99

# Banding for the NEAR-DUP detector: at the dedup threshold (cosine
# ~0.997 -> per-plane agreement ~0.975) WIDE bands of MANY planes give
# both high recall and high selectivity: P(12-bit band agrees) ~ 0.74
# per band, >=1 of 4 bands ~ 0.995 — vs 0.65 measured for the round-2
# full-12-bit signature match — while a 2^12 band space keeps random
# collisions ~ n/4096 per band.  (The ANN retrieval banding above uses
# NARROW 4-bit bands instead because its targets sit at cosine
# 0.25-0.49 where per-plane agreement is only ~0.65.)
DUP_PLANES = 48
DUP_BAND_BITS = 12
DUP_BANDS = DUP_PLANES // DUP_BAND_BITS

def _dup_vec_corpus(e: DataFrame) -> DataFrame:
    """The doubled near-dup corpus every embedding-dedup query, its
    quality eval and the streaming twin share: originals plus one
    deterministic affine perturbation per vector (x*1.02 + 0.01,
    cosine ~0.997 to its original — identical IEEE ops in both
    engines).  One definition so detector, eval and streaming twin can
    never measure different corpora."""
    pert = e.select(
        (F.col("vec_id") + EMB_DUP_OFFSET).alias("vec_id"),
        F.transform(F.col("v"), lambda x: x * 1.02 + 0.01).alias("v"),
    )
    return e.unionByName(pert)


def _band_explode(df: DataFrame, planes: int, band_bits: int) -> DataFrame:
    """(vec_id, band, bits) rows of the banded sign-LSH signature —
    the candidate-generation primitive shared by the retrieval index,
    the near-dup detector and hard-negative mining (and mirrored by
    streaming/ann_index.StreamingAnnIndex._banded)."""
    n_bands = planes // band_bits
    # Arrow-batched matmul signature (bit-identical to the fold form,
    # pinned by test) + core spread: the small-SF corpus is one input
    # split and the signature is the CPU-heavy stage
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sig = vec.hyperplane_signature_fast(F.col("v"), planes)
    return df.select("vec_id", sig.alias("sig")).select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.substring("sig", b * band_bits + 1, band_bits)
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bits"),
    )


# NOTE (r14 optimization round): the band self-join below used to
# duplicate the banded-signature subtree, so the ArrowEvalPython
# signature pass ran once PER JOIN SIDE (the planner broadcast one
# side, and a broadcast build side is a full independent subtree).
# Two single-pass variants were built and A/B-measured in r14 (persist
# corpus+bands with an eager fill; checkpoint bands only): BOTH
# measured slower at bench scale (min 2.05–2.67 s vs 1.75–2.45 s
# inline under matched load), because a cache/checkpoint fill
# SERIALIZES fill -> consume (one extra synchronization barrier > one
# saved 4k-row Arrow pass).
#
# r15 (verdict ask #6): the barrier-free shape — repartition the
# banded frame by the JOIN key (band, bits) and self-join THAT.  Both
# join children then require the exact same hash partitioning, the
# planner keeps ONE Exchange and replaces the other side with a
# ReusedExchange reading the same shuffle files, and the signature
# subtree (Union -> repartition -> ArrowEvalPython -> Generate) runs
# exactly ONCE with no fill barrier: the map stage materializes the
# shuffle, both join sides consume it within the same job.  The join
# becomes SortMergeJoin/ShuffledHashJoin over the shared exchange
# instead of BroadcastHashJoin over a duplicated subtree — the
# broadcast saved no shuffle anyway since the build side had to be
# fully computed (incl. the second Arrow pass) before broadcasting.
# At 100 TB this halves the signature compute (the dominant CPU term)
# and the band shuffle replaces a broadcast whose build side grows
# with the corpus (guide §3.1: broadcasting a corpus-sized side is the
# wrong strategy at scale).  A/B evidence in OPTIMIZATION_r15.md.


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    corpus AS (
      SELECT vec_id, v FROM e
      UNION ALL
      SELECT vec_id + {EMB_DUP_OFFSET} AS vec_id,
             list_transform(v, x -> x * 1.02 + 0.01) AS v
      FROM e
    ),
    {vec.banded_sig_ctes_sql('corpus', DUP_PLANES, DUP_BAND_BITS, DIM)},
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, bb.vec_id AS id_b
      FROM bands a JOIN bands bb ON a.b = bb.b AND a.bits = bb.bits
      WHERE a.vec_id < bb.vec_id
    ),
    scored AS (
      SELECT c.id_a, c.id_b, {vec.cosine_sql('x.v', 'y.v', DIM)} AS cos_sim
      FROM cand c JOIN corpus x ON x.vec_id = c.id_a
                  JOIN corpus y ON y.vec_id = c.id_b
    )
    SELECT id_a, id_b, round(cos_sim, 6) AS cos_sim
    FROM scored WHERE cos_sim >= {EMB_DUP_THRESHOLD}
    """,
    # 'arrow': declared Arrow seam (fast hyperplane signature) — see
    # emb_lsh_ann_topk's tag note.
    tags=("similarity", "dedup", "lsh", "approx", "arrow"),
    bench=True,  # LLM-pipeline tier benched at sf0.1 (r4),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection — the semantic-dedup
    flavor of the pipeline: candidate pairs from BANDED hyperplane-LSH
    ({DUP_BANDS} bands of {DUP_BAND_BITS} bits over {DUP_PLANES}
    planes; a pair is a candidate when ANY band matches — equi-join on
    (band, bits), never the O(n²) scan), verified by exact cosine
    ≥ {EMB_DUP_THRESHOLD}.  The corpus doubles every vector with a
    deterministic affine perturbation (x·1.02 + 0.01 per component,
    cosine ≈ 0.997 to its original — identical IEEE ops in both
    engines) so the detector has true near-dups to find.  Measured by
    dedup_embedding_quality_eval at sf0.01: recall 0.984, precision
    1.0 — up from 0.654 for the round-2 full-signature match; the
    wide-band geometry works because dedup targets sit at ~0.997
    cosine where per-plane agreement is ~0.975 (see the constant
    block).  Zero false positives by construction (exact verify)."""
    e = _emb(spark, sf_dir).select("vec_id", "v")
    corpus = _dup_vec_corpus(e)
    # one shuffle by the join key; the self-join consumes this single
    # exchange from both sides (ReusedExchange) so the Arrow signature
    # pass runs once — see the r15 note above _band_explode
    bands = _band_explode(corpus, DUP_PLANES, DUP_BAND_BITS).repartition(
        "band", "bits"
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bits"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b"))
        .distinct()
    )
    va = corpus.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    vb = corpus.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", vec.cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= EMB_DUP_THRESHOLD)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def _centroids_oracle() -> str:
    """Label-centroid rows UNION the unrolled-k-means rows, tagged."""
    ctes = ",\n".join(_kmeans_ctes())
    return f"""
    WITH {ctes},
    label_ex AS (
      SELECT label, unnest(range(0, {DIM})) AS pos,
             unnest(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    )
    SELECT 'label' AS method, CAST(label AS BIGINT) AS cell,
           CAST(pos AS BIGINT) AS pos, {_exact_mean_sql('val')} AS centroid
    FROM label_ex GROUP BY label, pos
    UNION ALL
    SELECT 'kmeans' AS method, CAST(cell AS BIGINT) AS cell,
           CAST(pos AS BIGINT) AS pos, cv AS centroid
    FROM cr_{KMEANS_ITERS}
    """


from quick_stream_spark.plans.registry import REGISTRY as _SIMREG  # noqa: E402

# assigned at module end: _kmeans_ctes needs _sqdist_sql (defined in the
# IVF section below the k-means block)
_SIMREG["emb_centroids"].oracle = " ".join(_centroids_oracle().split())
_SIMREG["emb_ivf_trained_topk"].oracle = " ".join(_trained_ivf_oracle().split())


# ------------------------------------------------------------ PQ (ADC)

PQ_M = 4  # subspaces
PQ_SUBDIM = DIM // PQ_M  # 16 dims each
PQ_K = 16  # codewords per subspace
# ADC shortlist size for the exact re-rank stage (FAISS refine
# pattern): PQ distances PRUNE to this many candidates per query, the
# exact vectors re-rank only those.  Chosen by measurement at sf0.01:
# pure 16-bit ADC ranking tops out at recall@5 ~ 0.33 on the
# near-random synthetic embeddings NO MATTER the training budget
# (extra Lloyd rounds and even 8x more subspaces measured flat — it is
# a quantization-error ceiling, not a training deficit), while
# re-ranking the top-50 shortlist lifts recall@5 to 0.78 at ~10% of
# the exact scan's distance evaluations.
PQ_SHORTLIST = 50


def _sub_slice(col, s: int):
    return F.slice(col, s * PQ_SUBDIM + 1, PQ_SUBDIM)


def _sub_sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_PQ_BOOK_CACHE: dict = shared_cache({})


def _pq_codebooks(spark: SparkSession, sf_dir: str) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace PQ codebooks: deterministic first-K init, ONE Lloyd
    refinement round (exact scaled-integer means), collected to the
    driver as bounded model artifacts (PQ_M x PQ_K x PQ_SUBDIM floats).
    One refinement round keeps the unrolled SQL oracle tractable; the
    iteration count is a constant, not a structural limit.  Trained
    once per (session, sf_dir)."""
    from quick_stream_spark.plans._util import session_cached

    return session_cached(
        _PQ_BOOK_CACHE, spark, sf_dir, lambda: _pq_codebooks_impl(spark, sf_dir)
    )


def _pq_codebooks_impl(spark: SparkSession, sf_dir: str) -> list:
    e = _emb(spark, sf_dir).select("vec_id", "v")
    books: list[list[tuple[int, list[float]]]] = []
    with scoped_shuffle(
        spark, rows_sized_parts(_emb_count(spark, sf_dir) * PQ_SUBDIM, 500_000)
    ):
        for s in range(PQ_M):
            sub = e.select("vec_id", _sub_slice(F.col("v"), s).alias("sv"))
            init_rows = (
                sub.filter(F.col("vec_id") < PQ_K)
                .select(F.col("vec_id").alias("cell"), F.posexplode("sv").alias("pos", "cv"))
                .collect()
            )
            by_cell: dict[int, dict[int, float]] = {}
            for r in init_rows:
                by_cell.setdefault(r.cell, {})[r.pos] = float(r.cv)
            cents = [
                (cell, [by_cell[cell][p] for p in range(PQ_SUBDIM)])
                for cell in sorted(by_cell)
            ]
            cells_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for _, c in cents])
            ids_lit = F.array(*[F.lit(cid) for cid, _ in cents])
            dist_arr = F.transform(cells_lit, lambda c: _sub_sqdist(F.col("sv"), c))
            best = F.array_position(dist_arr, F.array_min(dist_arr)).cast("int")
            assigned = sub.select("sv", F.element_at(ids_lit, best).alias("cell"))
            scaled = F.round(F.col("val") * 1_000_000).cast("long")
            cr = (
                assigned.select("cell", F.posexplode("sv").alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.sum(scaled).alias("s"), F.count(F.lit(1)).alias("n"))
                .select(
                    "cell",
                    "pos",
                    F.round(
                        F.col("s").cast("double") / F.col("n") / 1_000_000, 6
                    ).alias("cv"),
                )
                .collect()
            )
            by_cell = {}
            for r in cr:
                by_cell.setdefault(r.cell, {})[r.pos] = float(r.cv)
            books.append(
                [
                    (cell, [by_cell[cell][p] for p in range(PQ_SUBDIM)])
                    for cell in sorted(by_cell)
                ]
            )
    return books


@register(
    "emb_pq_topk",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle=None,  # set at module end (unrolled per-subspace training)
    tags=("similarity", "pq", "ann", "ml"),
)
def emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-rank (the FAISS
    IndexPQ + refine pattern): train PQ_M per-subspace codebooks,
    encode every vector as PQ_M small codes (4 x 4 bits — a ~100x
    compression of the 64-dim float corpus), SHORTLIST the top
    {PQ_SHORTLIST} per query by ASYMMETRIC distance (query stays
    exact; corpus distance is the sum of query-subvector -> codeword
    distances), then re-rank only the shortlist with exact cosine.
    Encoding and ADC distance are ROW-LOCAL literal-array math (the
    codebook crosses the driver, the corpus never moves); per-subspace
    terms are scaled to integers before summing so the 4-term total is
    order-independent and hash-matches the oracle; the shortlist
    boundary is deterministic (integer distance, neighbor-id
    tie-break).  Measured recall@5 vs exact cosine at sf0.01: 0.78 —
    up from 0.33 for pure ADC ranking, which is the quantization-error
    ceiling of 16-bit codes on near-random data (extra Lloyd rounds
    measured flat).  At 100 TB the shortlist stage reads only the
    16-bit codes (the compressed index), and the refine join fetches
    full vectors for shortlist ids only."""
    books = _pq_codebooks(spark, sf_dir)
    e = _emb(spark, sf_dir).select("vec_id", "v")

    def _dist_to(sv):
        # closure, NOT a default-arg lambda: a two-parameter lambda is
        # interpreted as the (element, index) HOF form
        return lambda c: _sub_sqdist(sv, c)

    code_cols = []
    for s, book in enumerate(books):
        cells_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for _, c in book])
        ids_lit = F.array(*[F.lit(cid) for cid, _ in book])
        dist_arr = F.transform(cells_lit, _dist_to(_sub_slice(F.col("v"), s)))
        best = F.array_position(dist_arr, F.array_min(dist_arr)).cast("int")
        code_cols.append(F.element_at(ids_lit, best).alias(f"code_{s}"))
    coded = e.select(F.col("vec_id").alias("neighbor_id"), *code_cols)

    q = F.broadcast(
        e.filter(F.col("vec_id") < NUM_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    joined = q.join(coded, F.col("query_id") != F.col("neighbor_id"))
    terms = []
    for s, book in enumerate(books):
        cells_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for _, c in book])
        ids_lit = F.array(*[F.lit(cid) for cid, _ in book])
        qsub = _sub_slice(F.col("qv"), s)
        cent = F.element_at(
            cells_lit, F.array_position(ids_lit, F.col(f"code_{s}")).cast("int")
        )
        terms.append(F.round(_sub_sqdist(qsub, cent) * 1_000_000).cast("long"))
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    scored = joined.select(
        "query_id",
        "qv",
        "neighbor_id",
        (total.cast("double") / 1_000_000).alias("approx_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist"), F.asc("neighbor_id"))
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_SHORTLIST)
        .select("query_id", "qv", "neighbor_id")
    )
    cvec = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    rescored = short.join(cvec, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        vec.cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def _pq_sub_sqdist_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {PQ_SUBDIM + 1}), "
        f"j -> (({a})[j] - ({b})[j]) * (({a})[j] - ({b})[j])))"
    )


def _pq_oracle() -> str:
    """Unrolled per-subspace training + encode + ADC top-k."""
    parts = ["e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"]
    for s in range(PQ_M):
        lo = s * PQ_SUBDIM + 1
        hi = (s + 1) * PQ_SUBDIM
        parts.append(
            f"sub_{s} AS (SELECT vec_id, v[{lo}:{hi}] AS sv FROM e)"
        )
        parts.append(
            f"init_{s} AS (SELECT vec_id AS cell, sv AS c FROM sub_{s} WHERE vec_id < {PQ_K})"
        )
        sq = _pq_sub_sqdist_sql("s.sv", "c.c")
        parts.append(
            f"""asg_{s} AS (
              SELECT vec_id, sv, cell FROM (
                SELECT s.vec_id, s.sv, c.cell,
                       row_number() OVER (PARTITION BY s.vec_id
                         ORDER BY {sq} ASC, c.cell ASC) AS rn
                FROM sub_{s} s CROSS JOIN init_{s} c
              ) WHERE rn = 1
            )"""
        )
        parts.append(
            f"""cb_{s} AS (
              SELECT cell, list(cv ORDER BY pos) AS c FROM (
                SELECT cell, pos, {_exact_mean_sql('val')} AS cv
                FROM (
                  SELECT cell, unnest(range(0, {PQ_SUBDIM})) AS pos, unnest(sv) AS val
                  FROM asg_{s}
                ) GROUP BY cell, pos
              ) GROUP BY cell
            )"""
        )
        sq2 = _pq_sub_sqdist_sql("s.sv", "c.c")
        parts.append(
            f"""code_{s} AS (
              SELECT vec_id, cell AS code FROM (
                SELECT s.vec_id, c.cell,
                       row_number() OVER (PARTITION BY s.vec_id
                         ORDER BY {sq2} ASC, c.cell ASC) AS rn
                FROM sub_{s} s CROSS JOIN cb_{s} c
              ) WHERE rn = 1
            )"""
        )
    term_selects = []
    for s in range(PQ_M):
        lo = s * PQ_SUBDIM + 1
        hi = (s + 1) * PQ_SUBDIM
        qsub = f"q.v[{lo}:{hi}]"
        term = _pq_sub_sqdist_sql(qsub, "cb.c")
        term_selects.append(
            f"""SELECT q.vec_id AS query_id, co.vec_id AS neighbor_id,
                   CAST(round(({term}) * 1000000) AS BIGINT) AS t
            FROM e q
            JOIN code_{s} co ON q.vec_id <> co.vec_id
            JOIN cb_{s} cb ON cb.cell = co.code
            WHERE q.vec_id < {NUM_QUERIES}"""
        )
    union = " UNION ALL ".join(term_selects)
    parts.append(
        f"""dists AS (
          SELECT query_id, neighbor_id,
                 CAST(SUM(t) AS DOUBLE) / 1000000 AS approx_dist
          FROM ({union}) GROUP BY query_id, neighbor_id
        )"""
    )
    parts.append(
        f"""short AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY approx_dist ASC, neighbor_id ASC) AS rn
            FROM dists
          ) WHERE rn <= {PQ_SHORTLIST}
        )"""
    )
    parts.append(
        f"""rescored AS (
          SELECT s.query_id, s.neighbor_id,
                 {vec.cosine_sql('q.v', 'c.v', DIM)} AS cos_sim
          FROM short s
          JOIN e q ON q.vec_id = s.query_id
          JOIN e c ON c.vec_id = s.neighbor_id
        )"""
    )
    ctes = ",\n".join(parts)
    return f"""
    WITH {ctes}
    SELECT query_id, neighbor_id, rank, round(cos_sim, 6) AS cos_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM rescored
    ) WHERE rank <= {TOP_K}
    """


_SIMREG["emb_pq_topk"].oracle = " ".join(_pq_oracle().split())


# ------------------------------------------------------------- MIPS

_AUG_C = "list_concat(c.v, [sqrt(mx.m2 - " + vec.dot_sql("c.v", "c.v", DIM) + ")])"
_AUG_Q = "list_concat(q.v, [0.0])"


@register(
    "emb_mips_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    mx AS (SELECT max({vec.dot_sql('v', 'v', DIM)}) AS m2 FROM e),
    q AS (SELECT * FROM e WHERE vec_id < {NUM_QUERIES}),
    c AS (SELECT * FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {vec.dot_sql('q.v', 'c.v', DIM)} AS ip,
             {vec.cosine_sql(_AUG_Q, _AUG_C, DIM + 1)} AS aug_cos
      FROM q JOIN c ON q.vec_id <> c.vec_id, mx
    )
    SELECT query_id, neighbor_id, rank, rank_aug,
           rank = rank_aug AS ranks_agree, round(ip, 6) AS ip
    FROM (
      SELECT *,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY ip DESC, neighbor_id ASC) AS rank,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY aug_cos DESC, neighbor_id ASC) AS rank_aug
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "mips"),
    # r10: rotated INTO the driver window (first-time driver check)
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def emb_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search (the recommendation-scoring flavor
    of similarity search) with the norm-augmentation reduction to
    cosine (Bachrach et al., RecSys 2014): corpus vectors gain one
    component sqrt(M^2 - |x|^2) with M the max corpus norm, queries
    gain 0 — augmented norms are constant, so augmented-cosine ranking
    equals inner-product ranking, which is what lets the LSH/IVF cosine
    indexes in this module serve MIPS workloads unchanged.  The query
    returns BOTH rankings (and their agreement) so the reduction is
    oracle-verified, not asserted.

    Scale design: identical to emb_cosine_topk — broadcast query set,
    one corpus scan, per-query top-k; M^2 is the one scalar that
    crosses the driver (the bounded model artifact), computed by an
    order-independent max."""
    e = _emb(spark, sf_dir)
    m2 = e.agg(F.max(vec.dot(F.col("v"), F.col("v"))).alias("m2")).collect()[0].m2
    q = F.broadcast(
        e.filter(F.col("vec_id") < NUM_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.concat(F.col("v"), F.array(F.lit(0.0))).alias("qa"),
            F.col("v").alias("qv"),
        )
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.concat(
            F.col("v"),
            F.array(F.sqrt(F.lit(m2) - vec.dot(F.col("v"), F.col("v")))),
        ).alias("ca"),
    )
    scored = q.join(c, F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        vec.dot(F.col("qv"), F.col("cv")).alias("ip"),
        vec.cosine(F.col("qa"), F.col("ca")).alias("aug_cos"),
    )
    w_ip = Window.partitionBy("query_id").orderBy(F.desc("ip"), F.asc("neighbor_id"))
    w_aug = Window.partitionBy("query_id").orderBy(
        F.desc("aug_cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_ip))
        .withColumn("rank_aug", F.row_number().over(w_aug))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "rank_aug",
            (F.col("rank") == F.col("rank_aug")).alias("ranks_agree"),
            F.round("ip", 6).alias("ip"),
        )
    )


# ------------------------------------------------------- SemDeDup

SEMDEDUP_THRESHOLD = 0.99


def _semdedup_oracle() -> str:
    ctes = ",\n".join(_kmeans_ctes())
    sq = _sqdist_sql("co.v", "c.c")
    return f"""
    WITH {ctes},
    cents AS (SELECT cell, list(cv ORDER BY pos) AS c
              FROM cr_{KMEANS_ITERS} GROUP BY cell),
    corpus AS (
      SELECT vec_id, v FROM e
      UNION ALL
      SELECT vec_id + {EMB_DUP_OFFSET} AS vec_id,
             list_transform(v, x -> x * 1.02 + 0.01) AS v
      FROM e
    ),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT co.vec_id, co.v, c.cell,
               row_number() OVER (PARTITION BY co.vec_id
                 ORDER BY {sq} ASC, c.cell ASC) AS rn
        FROM corpus co CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {vec.cosine_sql('a.v', 'b.v', DIM)} >= {SEMDEDUP_THRESHOLD}
    )
    SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
           s.vec_id NOT IN (SELECT vec_id FROM dup) AS kept
    FROM assigned s
    """


@register(
    "dedup_semantic_kmeans",
    oracle=None,  # set below: unrolled-k-means CTEs + within-cell verdicts
    tags=("similarity", "dedup", "ml", "iterative"),
    # r10: rotated INTO the driver window (first-time driver check)
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering — cluster the embedding space,
    then search for near-duplicates ONLY within each cluster, keeping
    per duplicate group one exemplar.  The published recipe exactly:
    pairwise similarity is confined to cluster cells, never the full
    corpus, which is what makes it tractable (SemDeDup ran 50k clusters
    over LAION; here K={KMEANS_K} over the test embeddings — K scales
    with n so the per-cell pair volume stays bounded).

    Deterministic verdict: a vector is PRUNED iff some same-cell vector
    with a lower id has cosine >= {SEMDEDUP_THRESHOLD} to it (the
    fixed-order greedy scan of the paper, restated set-wise so both
    engines replay it).  The corpus doubles every vector with the same
    affine perturbation as dedup_embedding_cosine, so true semantic
    dups exist; the codebook is trained on the ORIGINAL vectors only
    (train-on-sample, assign-all — the production shape).

    Scale design: training is emb_kmeans_train (model over driver,
    bounded K x DIM artifact); assignment is row-local literal-array
    math (no shuffle, no join); the only shuffle is the within-cell
    equi-join on cell id.  Compare dedup_embedding_cosine: same verify
    math, LSH buckets instead of trained cells as the blocking key."""
    e = _emb(spark, sf_dir).select("vec_id", "v")
    pert = e.select(
        (F.col("vec_id") + EMB_DUP_OFFSET).alias("vec_id"),
        F.transform(F.col("v"), lambda x: x * 1.02 + 0.01).alias("v"),
    )
    corpus = e.unionByName(pert)

    km = emb_kmeans_train(spark, sf_dir)
    by_cell: dict[int, dict[int, float]] = {}
    for r in km.collect():
        by_cell.setdefault(r.cell, {})[r.pos] = float(r.centroid)
    cents = [(cell, [by_cell[cell][p] for p in range(DIM)]) for cell in sorted(by_cell)]

    cells_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for _, c in cents])
    ids_lit = F.array(*[F.lit(cid) for cid, _ in cents])

    def sqdist(c):
        return F.aggregate(
            F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dist_arr = F.transform(cells_lit, sqdist)
    best = F.array_position(dist_arr, F.array_min(dist_arr)).cast("int")
    # materialize the assignment once: three consumers (both join sides
    # and the verdict output) would otherwise recompute the row-local
    # argmin; the frame is (id, vec, cell) — same order as the corpus
    assigned = corpus.select(
        "vec_id", "v", F.element_at(ids_lit, best).cast("long").alias("cell")
    ).localCheckpoint(eager=True)

    a = assigned.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "cell")
    b = assigned.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "cell")
    dup = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(vec.cosine(F.col("va"), F.col("vb")) >= SEMDEDUP_THRESHOLD)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__qss_dup", F.lit(True))
    )
    return (
        assigned.join(dup, "vec_id", "left")
        .select("vec_id", "cell", F.col("__qss_dup").isNull().alias("kept"))
    )


_SIMREG["dedup_semantic_kmeans"].oracle = " ".join(_semdedup_oracle().split())


# ---------------------------------------------- ANN quality evaluation


@register(
    "emb_ann_quality_eval",
    oracle=None,  # composed below from the exact/LSH/IVF/PQ oracles
    tags=("similarity", "ann", "evaluation", "arrow"),
)
def emb_ann_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} AND candidate fraction of every approximate
    index against the exact cosine top-k — the index-quality
    scorecard, computed as DATA and oracle-checked rather than
    asserted in prose (the similarity twin of dedup_lsh_quality_eval).
    One row per (method, query): hits, recall, n_cand (vectors the
    exact re-rank fetches) and cand_frac (n_cand / corpus) for the
    count-thresholded sign-LSH index, the trained IVF probe, and the
    PQ ADC shortlist.  Exact result and per-method top-k are each
    computed once; overlap is an equi-join on (query, neighbor) — at
    scale this is the standing eval job every ANN deployment runs
    after re-indexing.  Measured at sf0.01: IVF recall 0.90, PQ 0.78,
    LSH 0.625 at cand_frac 0.060 (the r3 OR-banded LSH touched ~34% —
    cand_frac is the column that exposed it; the round-2 evals are
    what exposed full-signature LSH at recall 0.00 and pure-ADC PQ at
    0.30).  tests/test_ann_recall.py gates recall >= 0.6 for all
    three AND lsh cand_frac <= 0.10."""
    exact = emb_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    exact = exact.localCheckpoint(eager=True)  # three method joins read it
    ex_n = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    n_corpus = _emb_count(spark, sf_dir)
    e = _emb(spark, sf_dir).select("vec_id", "v")
    km = emb_kmeans_train(spark, sf_dir)
    by_cell: dict = {}
    for r in km.collect():
        by_cell.setdefault(r.cell, {})[r.pos] = float(r.centroid)
    cents = [(cell, [by_cell[cell][p] for p in range(DIM)]) for cell in sorted(by_cell)]
    # per-method candidate counts: what the exact re-rank actually
    # touches (full-vector fetches) — PQ's ADC stage scans codes (a
    # ~100x-compressed sketch, like LSH's band rows), so its re-rank
    # candidate count is the shortlist size by construction
    pq_cands = ex_n.select(
        "query_id",
        F.least(F.lit(PQ_SHORTLIST), F.lit(n_corpus - 1))
        .cast("long")
        .alias("n_cand"),
    )
    methods = [
        ("ivf", emb_ivf_trained_topk,
         _ivf_candidates(e, cents).groupBy("query_id").agg(
             F.count(F.lit(1)).alias("n_cand"))),
        ("lsh", emb_lsh_ann_topk,
         _lsh_candidates(e).groupBy("query_id").agg(
             F.count(F.lit(1)).alias("n_cand"))),
        ("pq", emb_pq_topk, pq_cands),
    ]
    out = None
    for name, fn, cands in methods:
        approx = fn(spark, sf_dir).select("query_id", "neighbor_id")
        hits = (
            exact.join(approx, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        part = (
            ex_n.join(hits, "query_id", "left")
            .join(cands, "query_id", "left")
            .select(
                F.lit(name).alias("method"),
                "query_id",
                F.coalesce(F.col("hits"), F.lit(0).cast("long")).alias("hits"),
                F.round(
                    F.coalesce(F.col("hits"), F.lit(0).cast("long")).cast("double")
                    / F.col("n_exact"),
                    4,
                ).alias("recall"),
                F.coalesce(F.col("n_cand"), F.lit(0).cast("long")).alias("n_cand"),
                F.round(
                    F.coalesce(F.col("n_cand"), F.lit(0).cast("long")).cast("double")
                    / F.lit(n_corpus),
                    4,
                ).alias("cand_frac"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out


def _ann_eval_oracle() -> str:
    exact_sql = _SIMREG["emb_cosine_topk"].oracle
    lsh_cand_sql = f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        {_LSH_CAND_SQL}
        SELECT query_id, count(*) AS n_cand FROM cand GROUP BY query_id
    """
    pq_cand_sql = f"""
        SELECT DISTINCT query_id,
               least({PQ_SHORTLIST}, (SELECT count(*) FROM embeddings) - 1) AS n_cand
        FROM exact
    """
    method_sql = {
        "ivf": (_SIMREG["emb_ivf_trained_topk"].oracle, _trained_ivf_cand_sql()),
        "lsh": (_SIMREG["emb_lsh_ann_topk"].oracle, lsh_cand_sql),
        "pq": (_SIMREG["emb_pq_topk"].oracle, pq_cand_sql),
    }
    arms = []
    for name, (sql, cand_sql) in method_sql.items():
        arms.append(
            f"""SELECT '{name}' AS method, e.query_id,
                   CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
                   round(CAST(coalesce(h.hits, 0) AS DOUBLE) / e.n_exact, 4) AS recall,
                   CAST(coalesce(cc.n_cand, 0) AS BIGINT) AS n_cand,
                   round(CAST(coalesce(cc.n_cand, 0) AS DOUBLE)
                         / (SELECT count(*) FROM embeddings), 4) AS cand_frac
            FROM ex_n e LEFT JOIN (
              SELECT x.query_id, count(*) AS hits
              FROM exact x JOIN (SELECT query_id, neighbor_id FROM ({sql}) m) a
                USING (query_id, neighbor_id)
              GROUP BY x.query_id
            ) h USING (query_id)
            LEFT JOIN ({cand_sql}) cc USING (query_id)"""
        )
    union = " UNION ALL ".join(arms)
    return f"""
    WITH exact AS (SELECT query_id, neighbor_id FROM ({exact_sql}) t),
    ex_n AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id)
    {union}
    """


_SIMREG["emb_ann_quality_eval"].oracle = " ".join(_ann_eval_oracle().split())


# --------------------------------------------- dimension-truncation eval

MRL_DIMS = (8, 16, 32, 64)


def _mrl_oracle() -> str:
    """Per-truncation top-k CTEs + recall vs the full-dim exact top-k."""
    parts = [f"e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"]
    for d in MRL_DIMS:
        cos = vec.cosine_sql(f"q.v[1:{d}]", f"c.v[1:{d}]", d)
        parts.append(
            f"""top_{d} AS (
              SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                         PARTITION BY q.vec_id
                         ORDER BY {cos} DESC, c.vec_id ASC) AS rank
                FROM e q JOIN e c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < {NUM_QUERIES}
              ) WHERE rank <= {TOP_K}
            )"""
        )
    arms = []
    for d in MRL_DIMS:
        arms.append(
            f"""SELECT {d} AS trunc_dim, f.query_id,
                   CAST(count(t.neighbor_id) AS BIGINT) AS hits,
                   round(CAST(count(t.neighbor_id) AS DOUBLE) / {TOP_K}, 4) AS recall
            FROM top_{MRL_DIMS[-1]} f
            LEFT JOIN top_{d} t
              ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
            GROUP BY f.query_id"""
        )
    ctes = ",\n".join(parts)
    union = " UNION ALL ".join(arms)
    return f"WITH {ctes} SELECT CAST(trunc_dim AS BIGINT) AS trunc_dim, query_id, hits, recall FROM ({union}) u"


@register(
    "emb_matryoshka_eval",
    oracle=None,  # set below (generated per truncation width)
    tags=("similarity", "evaluation", "mrl"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def emb_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation evaluation (Kusupati et al. 2022,
    arXiv:2205.13147): recall@{TOP_K} of brute-force cosine retrieval
    over the FIRST d components (d in {MRL_DIMS}) against the full
    {DIM}-dim exact top-k, per (truncation, query) — the measurement
    that tells a pipeline how far it can shrink stored vectors before
    retrieval degrades (MRL-trained embeddings keep recall high at
    small d; these synthetic near-random vectors show the opposite,
    which is exactly what the eval should reveal).  One corpus scan
    per truncation with the query set broadcast — the same plan shape
    as emb_cosine_topk; truncation is a row-local slice, so at 100 TB
    the d-dim tier reads d/{DIM} of the vector bytes."""
    e = _emb(spark, sf_dir).select("vec_id", "v")
    q_all = F.broadcast(
        e.filter(F.col("vec_id") < NUM_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    c_all = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))

    def top_for(d: int) -> DataFrame:
        scored = q_all.join(c_all, F.col("query_id") != F.col("neighbor_id")).select(
            "query_id",
            "neighbor_id",
            vec.cosine(F.slice(F.col("qv"), 1, d), F.slice(F.col("cv"), 1, d)).alias(
                "cos_sim"
            ),
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

    full = top_for(MRL_DIMS[-1]).localCheckpoint(eager=True)
    out = None
    for d in MRL_DIMS:
        # the full-dim arm IS the reference — reuse the checkpointed
        # frame instead of re-running the most expensive corpus scan
        # (its recall is 1.0 by construction)
        approx = full if d == MRL_DIMS[-1] else top_for(d)
        t = full.alias("f").join(
            approx.alias("t"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        part = (
            full.join(
                t.withColumn("__hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
            )
            .groupBy("query_id")
            .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("hits"))
            .select(
                F.lit(d).cast("long").alias("trunc_dim"),
                "query_id",
                F.col("hits").cast("long").alias("hits"),
                F.round(F.col("hits").cast("double") / TOP_K, 4).alias("recall"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out


_SIMREG["emb_matryoshka_eval"].oracle = " ".join(_mrl_oracle().split())


# -------------------------------------- embedding-dedup quality eval


@register(
    "dedup_embedding_quality_eval",
    oracle=None,  # set below (exact brute pairs vs the LSH-blocked set)
    # 'arrow': inherits the fast-signature Arrow seam via its call into
    # dedup_embedding_cosine's registered plan.
    tags=("similarity", "dedup", "evaluation", "arrow"),
    # r10: rotated INTO the driver window (first-time driver check)
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def dedup_embedding_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision of the LSH-blocked embedding near-dup detector
    against the EXACT thresholded pair set — the similarity twin of
    dedup_lsh_quality_eval, computed as data and oracle-checked rather
    than asserted in prose.  The exact side is the O(n^2) cosine sweep
    over the doubled corpus (the eval tier can afford it; the detector
    exists so production never runs it); one full-outer join on the
    pair key classifies each pair as found/missed/spurious.  The
    verify step makes precision exactly 1.0 by construction (every
    emitted pair re-checked with exact cosine) — the eval PROVES that
    and measures the blocking recall the docstrings claim."""
    e = _emb(spark, sf_dir).select("vec_id", "v")
    corpus = _dup_vec_corpus(e)
    a = corpus.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = corpus.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    exact_pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", vec.cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= EMB_DUP_THRESHOLD)
        .select("id_a", "id_b")
    )
    from quick_stream_spark.plans.registry import REGISTRY as _R

    blocked = _R["dedup_embedding_cosine"].fn(spark, sf_dir).select("id_a", "id_b")
    ex = exact_pairs.withColumn("__e", F.lit(1))
    bl = blocked.withColumn("__b", F.lit(1))
    joined = ex.join(bl, ["id_a", "id_b"], "full_outer")
    joined_agg = joined.agg(
        F.sum(F.when(F.col("__e").isNotNull() & F.col("__b").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("found"),
        F.sum(F.when(F.col("__e").isNotNull() & F.col("__b").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("missed"),
        F.sum(F.when(F.col("__e").isNull() & F.col("__b").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("spurious"),
    )

    def ppm(num, den):
        d = F.greatest(den, F.lit(1))
        return ((num * 1_000_000 - F.pmod(num * 1_000_000, d)) / d).cast("long")

    return joined_agg.select(
        "found",
        "missed",
        "spurious",
        ppm(F.col("found"), F.col("found") + F.col("missed")).alias("recall_ppm"),
        ppm(F.col("found"), F.col("found") + F.col("spurious")).alias("precision_ppm"),
    )


def _emb_quality_oracle() -> str:
    blocked_sql = _SIMREG["dedup_embedding_cosine"].oracle
    cos = vec.cosine_sql("a.v", "b.v", DIM)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    corpus AS (
      SELECT vec_id, v FROM e
      UNION ALL
      SELECT vec_id + {EMB_DUP_OFFSET} AS vec_id,
             list_transform(v, x -> x * 1.02 + 0.01) AS v
      FROM e
    ),
    exact AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE {cos} >= {EMB_DUP_THRESHOLD}
    ),
    blocked AS (SELECT id_a, id_b FROM ({blocked_sql}) t),
    j AS (
      SELECT coalesce(e.id_a, bl.id_a) AS id_a,
             e.id_a IS NOT NULL AS in_exact,
             bl.id_a IS NOT NULL AS in_blocked
      FROM exact e FULL OUTER JOIN blocked bl
        ON e.id_a = bl.id_a AND e.id_b = bl.id_b
    ),
    c AS (
      SELECT CAST(SUM(CASE WHEN in_exact AND in_blocked THEN 1 ELSE 0 END) AS BIGINT) AS found,
             CAST(SUM(CASE WHEN in_exact AND NOT in_blocked THEN 1 ELSE 0 END) AS BIGINT) AS missed,
             CAST(SUM(CASE WHEN NOT in_exact AND in_blocked THEN 1 ELSE 0 END) AS BIGINT) AS spurious
      FROM j
    )
    SELECT found, missed, spurious,
           CAST(found * 1000000 // greatest(found + missed, 1) AS BIGINT) AS recall_ppm,
           CAST(found * 1000000 // greatest(found + spurious, 1) AS BIGINT) AS precision_ppm
    FROM c
    """


_SIMREG["dedup_embedding_quality_eval"].oracle = " ".join(_emb_quality_oracle().split())


# ------------------------------------------------ hard-negative mining

HN_LO = 0.25  # hard-negative band: similar enough to be confusable...
HN_HI = 0.95  # ...but below the near-duplicate threshold
HN_PER_ANCHOR = 3


@register(
    "emb_hard_negatives",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    {vec.banded_sig_ctes_sql('e', ANN_PLANES, ANN_BAND_BITS, DIM)},
    cand AS (
      SELECT DISTINCT a.vec_id AS anchor_id, bb.vec_id AS negative_id
      FROM bands a JOIN bands bb ON a.b = bb.b AND a.bits = bb.bits
      WHERE a.vec_id <> bb.vec_id
    ),
    scored AS (
      SELECT c.anchor_id, c.negative_id,
             {vec.cosine_sql('x.v', 'y.v', DIM)} AS cos_sim
      FROM cand c JOIN e x ON x.vec_id = c.anchor_id
                  JOIN e y ON y.vec_id = c.negative_id
    ),
    banded_hard AS (
      SELECT * FROM scored WHERE cos_sim >= {HN_LO} AND cos_sim < {HN_HI}
    )
    SELECT anchor_id, negative_id, rank, round(cos_sim, 6) AS cos_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY anchor_id ORDER BY cos_sim DESC, negative_id ASC) AS rank
      FROM banded_hard
    ) WHERE rank <= {HN_PER_ANCHOR}
    """,
    tags=("similarity", "mining", "training-pairs", "arrow"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — the contrastive-training companion of
    the dedup/retrieval family: for EVERY vector (not just a query
    set), the top {HN_PER_ANCHOR} most-similar OTHER vectors inside
    the confusable band [{HN_LO}, {HN_HI}) — similar enough that a
    model must learn to separate them, but below the near-duplicate
    threshold (a dup as a negative would poison training).  Candidates
    come from the banded sign-LSH index (the retrieval geometry: the
    band join IS the 'confusably similar' filter — uncollided pairs
    are easy negatives not worth mining), exact cosine scores the
    band, the per-anchor window keeps the hardest.

    Scale design: all-pairs never materializes — only band collisions
    are scored; the per-anchor top-k partitions by anchor (no global
    sort).  At 100 TB this is the standing mining job between
    re-trainings, over the same index the retrieval tier maintains."""
    e = _emb(spark, sf_dir).select("vec_id", "v")
    bands = _band_explode(e, ANN_PLANES, ANN_BAND_BITS)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bits"])
        .filter(F.col("x.vec_id") != F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("anchor_id"),
            F.col("y.vec_id").alias("negative_id"),
        )
        .distinct()
    )
    va = e.select(F.col("vec_id").alias("anchor_id"), F.col("v").alias("av"))
    vb = e.select(F.col("vec_id").alias("negative_id"), F.col("v").alias("nv"))
    scored = (
        cand.join(va, "anchor_id")
        .join(vb, "negative_id")
        .select(
            "anchor_id",
            "negative_id",
            vec.cosine(F.col("av"), F.col("nv")).alias("cos_sim"),
        )
        .filter((F.col("cos_sim") >= HN_LO) & (F.col("cos_sim") < HN_HI))
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos_sim"), F.asc("negative_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HN_PER_ANCHOR)
        .select("anchor_id", "negative_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )
