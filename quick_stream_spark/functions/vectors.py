"""Vector similarity over embedding columns (``array<float>``).

Brute-force cosine is the verified baseline; hyperplane-LSH bucketing is
the approximate scale path.  All math is JVM-side (``zip_with`` +
``aggregate``): element-wise ops fold left-to-right, so the doubles are
bit-identical to the DuckDB oracle's ``list_transform``/``list_sum``
twins (same IEEE operation sequence).

Scale notes (100 TB posture):
  - brute-force top-k broadcasts the (small) query set against the
    corpus: one scan, no shuffle except the final per-query top-k;
  - the LSH variant buckets by hyperplane-sign signature so candidate
    generation is a bucket-equi-join (same pattern as minhash LSH);
    recall/latency tunes via number of planes;
  - for real ANN at cluster scale, partition the corpus into IVF cells
    (k-means centroids trained offline) and prune cells by centroid
    distance — same top-k code per cell.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NUM_PLANES = 12  # hyperplanes for sign-LSH


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def dot_sql(a: str, b: str, dim: int = 64) -> str:
    return f"list_sum(list_transform(range(1, {dim + 1}), i -> ({a})[i] * ({b})[i]))"


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def norm_sql(a: str, dim: int = 64) -> str:
    return f"sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> ({a})[i] * ({a})[i])))"


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs must already be double arrays."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str, dim: int = 64) -> str:
    return f"{dot_sql(a, b, dim)} / ({norm_sql(a, dim)} * {norm_sql(b, dim)})"


def plane_weights(num_planes: int = NUM_PLANES, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes: weight[p][j] from the
    parity of the first hex digit of md5('p<p>:<j>').  Computed once in
    Python and embedded as literals on BOTH the Spark and SQL sides, so
    signatures match the oracle bit-for-bit and cost nothing per row."""
    import hashlib

    even = set("02468ace")
    return [
        [
            1.0 if hashlib.md5(f"p{p}:{j}".encode()).hexdigest()[0] in even else -1.0
            for j in range(dim)
        ]
        for p in range(num_planes)
    ]


def hyperplane_signature(vec: Column, num_planes: int = NUM_PLANES, dim: int = 64) -> Column:
    """Sign-LSH signature: bit per hyperplane = (Σ_j w[p,j]·v[j]) > 0,
    rendered as a '0'/'1' string usable as a bucket join key.

    Built as ONE transform over a literal weight MATRIX rather than
    ``num_planes`` separate fold expressions: the per-plane arithmetic
    is identical (same left-to-right zip_with/aggregate fold, so the
    bits match the per-plane SQL twin exactly), but the expression tree
    is ~num_planes x smaller — measured 2x faster end-to-end at 24-48
    planes (codegen size dominates, not the arithmetic)."""
    weights = plane_weights(num_planes, dim)
    wmat = F.array(*[F.array(*[F.lit(x) for x in row]) for row in weights])
    bits = F.transform(
        wmat,
        lambda w: F.when(
            F.aggregate(
                F.zip_with(vec, w, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")


def hyperplane_signature_sql(v: str, num_planes: int = NUM_PLANES, dim: int = 64) -> str:
    """DuckDB twin of :func:`hyperplane_signature` from the same
    literal weights (same left-to-right accumulation order)."""
    weights = plane_weights(num_planes, dim)
    bits = []
    for p in range(num_planes):
        warr = "[" + ", ".join(str(w) for w in weights[p]) + "]"
        s = f"list_sum(list_transform(range(1, {dim + 1}), j -> ({v})[j] * ({warr})[j]))"
        bits.append(f"CASE WHEN {s} > 0 THEN '1' ELSE '0' END")
    # varargs concat, not a `||` chain: DuckDB binds a || b || c as a
    # left-nested binary tree and hits its 128-deep binder recursion
    # limit near 128 planes; concat(...) is one node with n children
    return "concat(" + ", ".join(bits) + ")"


_FAST_SIG_UDFS: dict = {}


def hyperplane_signature_fast(
    vec: Column, num_planes: int = NUM_PLANES, dim: int = 64
) -> Column:
    """Arrow-batched twin of :func:`hyperplane_signature`: one numpy
    matmul per batch instead of num_planes interpreted zip_with/
    aggregate folds — measured ~40x at 192 planes (higher-order
    function lambdas run interpreted, ~1.7us per element step).

    Determinism: numpy's pairwise summation can order additions
    differently from the pinned left-to-right fold, which matters only
    when a dot product sits within float rounding of zero.  Measured on
    the test embeddings, min |dot| across every (vector, plane) is
    3.8e-6 — ten orders of magnitude above double rounding — so the
    signs (and therefore every bit) are identical; tests pin fast ==
    fold on real data so a future corpus that violates the margin is
    caught, not silently mis-bucketed."""
    key = (num_planes, dim)
    if key not in _FAST_SIG_UDFS:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        rows = plane_weights(num_planes, dim)

        def sig(v):
            import numpy as np

            if len(v) == 0:
                return pd.Series([], dtype="object")
            M = np.array(rows)
            A = np.array(v.tolist(), dtype="float64")
            bits = ((A @ M.T) > 0).astype(np.uint8) + ord("0")
            return pd.Series([bytes(row).decode("ascii") for row in bits])

        # real type objects, not strings: this module uses postponed
        # annotation evaluation, under which inline hints reach
        # pandas_udf's eval-type inference as unresolvable literals
        sig.__annotations__ = {"v": pd.Series, "return": pd.Series}
        _FAST_SIG_UDFS[key] = pandas_udf("string")(sig)
    return _FAST_SIG_UDFS[key](vec)


def plane_weights_values_sql(num_planes: int = NUM_PLANES, dim: int = 64) -> str:
    """``(p, wv)`` VALUES rows for a hyperplane-weights CTE table —
    the fast DuckDB twin for LARGE plane counts.  Indexing a literal
    list inside the per-plane lambda (hyperplane_signature_sql's
    shape) rebuilds the list per element — measured 400x slower at 192
    planes than joining a weights table and indexing its column list:

        lshw(p, wv) AS (VALUES {...}),
        pbits AS (SELECT vec_id, p, CASE WHEN list_sum(list_transform(
          range(1, dim+1), j -> v[j] * wv[j])) > 0 THEN '1' ELSE '0'
          END AS bit FROM e CROSS JOIN lshw)

    The per-bit arithmetic (same left-to-right list_sum fold over
    v[j] * w[j]) is identical to hyperplane_signature_sql, so bits
    match the Spark side bit-for-bit either way."""
    weights = plane_weights(num_planes, dim)
    return ", ".join(
        f"({p}, [{', '.join(str(w) for w in row)}])"
        for p, row in enumerate(weights)
    )


def banded_sig_ctes_sql(
    src: str, num_planes: int, band_bits: int, dim: int = 64
) -> str:
    """CTE stack ending in ``bands(vec_id, b, bits)`` — the banded
    sign-LSH signature of CTE ``src`` (vec_id, v) in the fast
    weights-table formulation (see plane_weights_values_sql).  Splice
    after a WITH list; downstream CTEs join ``bands`` on (b, bits).
    Bit and band order match the Spark side exactly: bit p = the same
    list_sum fold, band b = planes [b*band_bits, (b+1)*band_bits)."""
    return f"""
    sigw(p, wv) AS (VALUES {plane_weights_values_sql(num_planes, dim)}),
    sigbits AS (
      SELECT vec_id, p,
             CASE WHEN list_sum(list_transform(range(1, {dim + 1}),
               j -> v[j] * wv[j])) > 0 THEN '1' ELSE '0' END AS bit
      FROM {src} CROSS JOIN sigw
    ),
    bands AS (
      SELECT vec_id, p // {band_bits} AS b,
             string_agg(bit, '' ORDER BY p) AS bits
      FROM sigbits GROUP BY vec_id, p // {band_bits}
    )"""
