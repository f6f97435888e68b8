"""ANN index quality floor (plans/similarity.py): every approximate
index must actually retrieve — mean recall@5 vs the exact cosine top-5
at sf0.01 must clear 0.6 for ALL three methods.  This is the regression
gate for the round-2 finding that a correct-per-contract index can
still be decorative (full-signature LSH measured recall 0.00, pure-ADC
PQ 0.30); the banded-LSH and shortlist-re-rank designs are held to the
measured bar, not to prose."""

from pyspark.sql import functions as F

from quick_stream_spark.plans.similarity import emb_ann_quality_eval

SF_EVAL = "/root/testdata/sf0.01"


def test_fast_signature_is_bit_identical_to_the_fold_form(spark):
    """hyperplane_signature_fast (numpy matmul, pairwise summation)
    must produce the exact bits of hyperplane_signature (pinned
    left-to-right fold) on the real test embeddings — the safety net
    for the documented sign-margin argument (min |dot| ~ 3.8e-6 >>
    double rounding).  A regenerated corpus that violates the margin
    fails here instead of silently mis-bucketing."""
    from pyspark.sql import functions as F

    from quick_stream_spark.functions import vectors as vec
    from quick_stream_spark.plans.similarity import _emb
    from tests.conftest import SF_SMOKE

    e = _emb(spark, SF_SMOKE).select("vec_id", "v")
    for planes in (48, 192):
        diff = e.select(
            vec.hyperplane_signature(F.col("v"), planes).alias("a"),
            vec.hyperplane_signature_fast(F.col("v"), planes).alias("b"),
        ).filter(F.col("a") != F.col("b"))
        assert diff.count() == 0, f"bit mismatch at {planes} planes"


def test_every_ann_index_clears_the_recall_floor(spark):
    rows = (
        emb_ann_quality_eval(spark, SF_EVAL)
        .groupBy("method")
        .agg(
            F.avg("recall").alias("mean_recall"),
            F.avg("cand_frac").alias("mean_cand_frac"),
        )
        .collect()
    )
    got = {r.method: (r.mean_recall, r.mean_cand_frac) for r in rows}
    assert set(got) == {"ivf", "lsh", "pq"}
    for method, (recall, frac) in got.items():
        assert recall >= 0.6, f"{method} mean recall@5 = {recall:.2f} < 0.6"
    # the r4 selectivity gate: an index must not be a disguised scan —
    # the LSH re-rank may touch at most 10% of the corpus per query
    # (r3's OR-banded design measured ~34%)
    assert got["lsh"][1] <= 0.10, (
        f"lsh mean cand_frac = {got['lsh'][1]:.3f} > 0.10"
    )
    assert got["pq"][1] <= 0.10 + 1e-9, f"pq cand_frac {got['pq'][1]}"


@__import__("pytest").mark.slow
def test_ann_gates_hold_at_sf01(spark):
    """r4 verdict ask #7: the recall + selectivity gates re-run at
    sf0.1 (10x the gate corpus) — a selectivity regression must not be
    able to hide behind the small sf0.01 corpus.  Marked slow; runs in
    the full suite, skippable with -m 'not slow' while iterating."""
    rows = (
        emb_ann_quality_eval(spark, "/root/testdata/sf0.1")
        .groupBy("method")
        .agg(
            F.avg("recall").alias("mean_recall"),
            F.avg("cand_frac").alias("mean_cand_frac"),
        )
        .collect()
    )
    got = {r.method: (r.mean_recall, r.mean_cand_frac) for r in rows}
    assert set(got) == {"ivf", "lsh", "pq"}
    for method, (recall, frac) in got.items():
        assert recall >= 0.6, f"{method} mean recall@5 = {recall:.2f} < 0.6 at sf0.1"
    assert got["lsh"][1] <= 0.10, (
        f"lsh mean cand_frac = {got['lsh'][1]:.3f} > 0.10 at sf0.1"
    )
    assert got["pq"][1] <= 0.10 + 1e-9, f"pq cand_frac {got['pq'][1]} at sf0.1"


@__import__("pytest").mark.slow
def test_lsh_selectivity_stable_on_10x_synthetic_corpus(spark):
    """r4 verdict ask #6: the collision-count banding must hold its
    selectivity on a 10x (sf1-equivalent, 20k-vector) synthetic
    expansion of the sf0.1 corpus — cand_frac is the scale dial that
    proves the band join isn't a disguised scan.  (Wall numbers for
    the same run are recorded in COVERAGE.md: 2.3s -> 3.9s median for
    10x the corpus, i.e. ~1.7x, strongly sub-linear.)"""
    from quick_stream_spark.plans.similarity import (
        NUM_QUERIES,
        TOP_K,
        _emb,
        _lsh_candidates,
    )

    base = _emb(spark, "/root/testdata/sf0.1").select("vec_id", "v")
    n_base = base.count()
    parts = [base]
    for i in range(1, 10):
        parts.append(
            base.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                F.transform(
                    F.col("v"), lambda x, i=i: x * (1.0 + 0.003 * i) + 0.001 * i
                ).alias("v"),
            )
        )
    e = parts[0]
    for p in parts[1:]:
        e = e.unionByName(p)
    n = n_base * 10
    n_cand = _lsh_candidates(e).count()
    frac = n_cand / (NUM_QUERIES * n)
    assert frac <= 0.10, f"cand_frac {frac:.3f} > 0.10 on the 10x corpus"
