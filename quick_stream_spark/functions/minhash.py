"""Near-duplicate detection: word shingles, MinHash + LSH banding,
SimHash — all from JVM-side built-ins (array/lambda functions + md5),
no Python UDFs, so the shingle/signature stage runs at scan speed.

Cross-engine determinism: the "random permutations" of classic MinHash
are realized as ``md5(seed || ':' || shingle)`` with the signature being
the **lexicographic minimum of the hex digests** — md5 behaves as a
random permutation of strings, and both Spark and DuckDB produce the
same hex, so signatures (and hence LSH candidates) match the oracle
bit-for-bit.

Scale notes (100 TB posture):
  - shingling + signatures: narrow per-row transforms, no shuffle;
  - LSH: explode to (band_idx, band_hash, doc) and self-join per band —
    the join key is the band hash, so only near-identical docs collide;
    skew (a viral duplicate cluster) is bounded by capping bucket size;
  - candidate verification (exact Jaccard) runs only on collided pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NGRAM = 3  # words per shingle
NUM_HASHES = 16
BAND_SIZE = 2  # hashes per band -> 8 bands
NUM_BANDS = NUM_HASHES // BAND_SIZE


def word_shingles(col: Column, n: int = NGRAM) -> Column:
    """Distinct word n-gram shingles of the whitespace-tokenized text.
    Texts shorter than n words produce a single shingle of all words."""
    from quick_stream_spark.functions.text import ws_tokens

    toks = ws_tokens(col)
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), k - F.lit(1)),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(grams)
    )


def word_shingles_sql(expr: str, n: int = NGRAM) -> str:
    toks = (
        f"CASE WHEN length(trim({expr})) = 0 THEN [] "
        f"ELSE regexp_split_to_array(trim({expr}), '\\s+') END"
    )
    k = f"greatest(len({toks}) - {n - 1}, 1)"
    grams = (
        f"list_transform(range(0, {k}), i -> "
        f"array_to_string(({toks})[i+1:i+{n}], ' '))"
    )
    return f"CASE WHEN len({toks}) = 0 THEN [] ELSE list_distinct({grams}) END"


# ---------------------------------------------------------------------
# Hashed shingles: the fast path.  Hash each TOKEN once (md5 -> int),
# then combine each rolling n-window arithmetically into an integer
# shingle — no gram strings are ever built and md5 runs once per token,
# not once per (gram, permutation).  Jaccard then runs on int arrays.
# Collision space is ~1e9; at ~1e6 distinct shingles the expected
# collision contribution to a Jaccard score is < 1e-3 — far below the
# decision threshold.
GRAM_B = 1_000_033


def token_hash_array(col: Column) -> Column:
    """Whitespace tokens -> md5-derived ints in [0, P)."""
    from quick_stream_spark.functions.text import ws_tokens

    return F.transform(
        ws_tokens(col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % 1_000_000_007,
    )


def hashed_shingles(token_hashes: Column, n: int = NGRAM) -> Column:
    """Distinct integer n-gram shingles via a modular polynomial over
    the token hashes (n=3 unrolled; missing tail tokens count as 0, so
    texts shorter than n words still produce one shingle, matching
    :func:`word_shingles` semantics).

    The three shifted views of the token array are built with
    ``slice``/``arrays_zip`` at ROW level rather than ``get(th, i)``
    inside the transform lambda: HOF lambdas re-evaluate a referenced
    array expression once per ELEMENT (no subexpression elimination), so
    the lambda form turns an O(tokens) pass into O(tokens^2) md5 work
    when ``token_hashes`` is an unmaterialized expression.  The zip form
    evaluates it a constant 3x per row, cheap enough to compute straight
    from text with no persisted intermediate."""
    if n != 3:
        raise ValueError("hashed_shingles is unrolled for NGRAM=3")
    P = 1_000_000_007
    th = token_hashes
    k = F.greatest(F.size(th) - F.lit(n - 1), F.lit(1))
    padded = F.concat(th, F.array(F.lit(0).cast("long"), F.lit(0).cast("long")))
    z = F.arrays_zip(
        F.slice(th, 1, k).alias("t0"),
        F.slice(padded, 2, k).alias("t1"),
        F.slice(padded, 3, k).alias("t2"),
    )
    grams = F.transform(
        z, lambda s: ((s["t0"] * GRAM_B + s["t1"]) % P * GRAM_B + s["t2"]) % P
    )
    return F.when(F.size(th) == 0, F.array().cast("array<long>")).otherwise(
        F.array_distinct(grams)
    )


def hashed_shingles_sql(expr: str, n: int = NGRAM) -> str:
    """DuckDB twin of token_hash_array + hashed_shingles over a text
    expression (1-based list indexing; out-of-range -> NULL -> 0)."""
    if n != 3:
        raise ValueError("hashed_shingles_sql is unrolled for NGRAM=3")
    P = 1_000_000_007
    toks = (
        f"CASE WHEN length(trim({expr})) = 0 THEN [] "
        f"ELSE regexp_split_to_array(trim({expr}), '\\s+') END"
    )
    th = (
        f"list_transform({toks}, "
        f"t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % {P})"
    )
    k = f"greatest(len({th}) - {n - 1}, 1)"
    grams = (
        f"list_transform(range(0, {k}), i -> "
        f"((({th})[i+1] * {GRAM_B} + coalesce(({th})[i+2], 0)) % {P}"
        f" * {GRAM_B} + coalesce(({th})[i+3], 0)) % {P})"
    )
    return f"CASE WHEN len({th}) = 0 THEN [] ELSE list_distinct({grams}) END"


# MinHash permutation family h_i(x) = (A_i * x + B_i) mod P over a base
# integer derived from ONE md5 per shingle (both engines parse the same
# hex prefix identically) -- one md5 per shingle instead of NUM_HASHES
# md5s makes the signature stage ~16x cheaper.
MINHASH_P = 1_000_000_007
MINHASH_A = [(1_000_003 * (i + 1)) % MINHASH_P for i in range(NUM_HASHES)]
MINHASH_B = [(12_345 + 789 * i) % MINHASH_P for i in range(NUM_HASHES)]


def shingle_bases(shingles_col: Column) -> Column:
    """One integer hash per shingle: first 15 hex chars of md5 (< 2^60)
    parsed to long, reduced mod P.  Materialize this column (persist or
    write) before fanning out to the per-permutation minima -- lambda
    functions get no subexpression elimination, so computing it inline
    would re-run the md5 once per permutation."""
    return F.transform(
        shingles_col,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % MINHASH_P,
    )


def minhash_signature_from_bases(bases_col: Column, num_hashes: int = NUM_HASHES) -> Column:
    """Array of permutation minima over pre-computed shingle bases.
    Empty shingle sets get per-permutation sentinels (> any real hash).

    Built as ONE nested transform over a literal (A, B) coefficient
    array — an unrolled 16-expression version repeats ``bases_col`` in
    every permutation and inflates one-time plan compilation (same
    hazard as lsh_bands)."""
    coeffs = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.struct(
            F.element_at(F.array(*[F.lit(a) for a in MINHASH_A[:num_hashes]]), i + 1).alias("a"),
            F.element_at(F.array(*[F.lit(b) for b in MINHASH_B[:num_hashes]]), i + 1).alias("b"),
            (i + 1 + MINHASH_P).alias("sentinel"),
        ),
    )
    return F.transform(
        coeffs,
        lambda c: F.coalesce(
            F.array_min(
                F.transform(bases_col, lambda x: (c["a"] * x + c["b"]) % MINHASH_P)
            ),
            c["sentinel"],
        ),
    )


def minhash_signature(shingles_col: Column, num_hashes: int = NUM_HASHES) -> Column:
    return minhash_signature_from_bases(shingle_bases(shingles_col), num_hashes)


def bases_sql(shingles_expr: str) -> str:
    return (
        f"list_transform({shingles_expr}, "
        f"s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {MINHASH_P})"
    )


def minhash_signature_from_bases_sql(bases_expr: str, num_hashes: int = NUM_HASHES) -> str:
    sigs = ", ".join(
        f"list_min(list_transform({bases_expr}, "
        f"x -> ({MINHASH_A[i]} * x + {MINHASH_B[i]}) % {MINHASH_P}))"
        for i in range(num_hashes)
    )
    sentinels = ", ".join(str(MINHASH_P + 1 + i) for i in range(num_hashes))
    return f"CASE WHEN len({bases_expr}) = 0 THEN [{sentinels}] ELSE [{sigs}] END"


def lsh_bands(sig_col: Column, band_size: int = BAND_SIZE, num_bands: int = NUM_BANDS) -> Column:
    """Array of band keys: ``band_idx || joined signature slice``.

    Built as ONE ``transform`` over the band indices so ``sig_col``
    appears once in the expression tree — an unrolled per-band array
    would inline the whole signature expression ``num_bands`` times and
    blow up one-time plan compilation (measured: ~12s -> ~1s)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.concat(
            b.cast("string"),
            F.lit("|"),
            F.array_join(
                F.transform(
                    F.slice(sig_col, b * band_size + 1, band_size),
                    lambda x: x.cast("string"),
                ),
                "|",
            ),
        ),
    )


def lsh_bands_sql(sig_expr: str, band_size: int = BAND_SIZE, num_bands: int = NUM_BANDS) -> str:
    parts = ", ".join(
        f"'{b}|' || array_to_string("
        f"list_transform(({sig_expr})[{b * band_size + 1}:{b * band_size + band_size}],"
        f" x -> CAST(x AS VARCHAR)), '|')"
        for b in range(num_bands)
    )
    return f"[{parts}]"


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.round(inter / F.greatest(union, F.lit(1.0)), 6)


# Skew guard: a band bucket holding a viral duplicate cluster generates
# O(bucket^2) candidate pairs; buckets above this size are dropped
# entirely (deterministic, replayed identically by the SQL oracle).
# Recall trade: members of a > MAX_BUCKET_SIZE cluster only pair up if
# they also collide in a smaller bucket of another band — acceptable,
# because such clusters are exactly the ones exact-dedup and the
# verified pairs from the other 7 bands already blanket.
MAX_BUCKET_SIZE = 64


def lsh_bucket_filter_sql(banded: str, max_bucket_size: int = MAX_BUCKET_SIZE) -> str:
    """DuckDB twin of the bucket-size cap: the set of admissible bands."""
    return (
        f"SELECT band FROM {banded} GROUP BY band "
        f"HAVING count(*) BETWEEN 2 AND {max_bucket_size}"
    )


def candidate_pairs_lsh(
    docs: DataFrame,
    id_col: str,
    shingles_col: str,
    prehashed: bool = False,
    max_bucket_size: int = MAX_BUCKET_SIZE,
    bands_col: str | None = None,
) -> DataFrame:
    """LSH candidate pairs: explode band keys, collect each bucket's id
    list, generate in-bucket pairs, dedup (a pair may collide in several
    bands).  Returns ``(id_a, id_b, shingles_a, shingles_b)`` with
    id_a < id_b.

    Shuffle discipline: TWO shuffles total — the bucket groupBy moves
    only ``(band, id)`` integers and the pair dedup only ``(id_a,
    id_b)``; the (wide) shingle arrays are joined back by id afterwards.
    (A band self-join would cost a third exchange and materialize the
    joined row per collision; the grouped id list is at most
    ``max_bucket_size`` longs per bucket.)

    Skew guard: buckets larger than ``max_bucket_size`` are dropped
    before pair generation, so a viral duplicate cluster cannot go
    quadratic (see MAX_BUCKET_SIZE).  The collect_list itself stays
    bounded: it gathers ids (8 bytes each), not documents, and the cap
    drops oversized lists before any pair exists.

    The caller is expected to hold ``docs`` persisted: it is consumed
    three times (banding + both shingle join-backs); ``_shingled_corpus``
    in plans/text.py is that persisted frame.  Nothing is persisted
    here, so there is no cache to leak.

    ``bands_col`` names a precomputed band-key array column; passing one
    keeps the (large) signature/banding expression tree out of this
    plan, which otherwise dominates one-time Catalyst compilation —
    materialize it once on the persisted frame and reuse."""
    if bands_col is not None:
        band_keys = F.col(bands_col)
    else:
        bases = F.col(shingles_col) if prehashed else shingle_bases(F.col(shingles_col))
        band_keys = lsh_bands(minhash_signature_from_bases(bases))
    banded = docs.select(F.col(id_col), F.explode(band_keys).alias("band"))
    buckets = (
        banded.groupBy("band")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size))
        .select(F.array_sort("ids").alias("ids"))
    )
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )
    a = docs.select(F.col(id_col).alias("id_a"), F.col(shingles_col).alias("shingles_a"))
    b = docs.select(F.col(id_col).alias("id_b"), F.col(shingles_col).alias("shingles_b"))
    return pairs.join(a, "id_a").join(b, "id_b")


# --------------------------------------------------------------- SimHash
# 60-bit signatures: ONE md5 + hex-prefix parse per token (the same
# 15-hex-digit parse both engines agree on, < 2^60 so sign-safe in
# BIGINT), bit j of that value is token's vote for signature bit j.
# 60 bits over 4 bands of 15 gives 32768 bucket values per band — a
# 16-bit/4-nibble scheme has only 16 values per band, so EVERY bucket
# goes quadratic once the corpus outgrows a few hundred docs.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 15
_BAND_MASK = (1 << SIMHASH_BAND_BITS) - 1


def simhash_signature(text_col: Column) -> Column:
    """60-bit SimHash of a text column, computed ROW-LOCALLY: one
    ``aggregate`` pass over the token-hash array accumulates the 60
    per-bit one-counts (an array-state fold — no explode, no shuffle,
    no 60-column aggregate), then bit j is set iff ones_j > n/2, i.e.
    the classic ±1 vote sum is positive.  NULL/whitespace-only text
    yields no tokens; callers that must match the oracle's unnest
    semantics should filter those rows out (unnest emits nothing for
    an empty list).  3x faster than the explode+groupBy formulation at
    equal results, and entirely within one codegen stage."""
    from quick_stream_spark.functions.text import ws_tokens

    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(SIMHASH_BITS)])
    th = F.transform(
        ws_tokens(text_col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    zero = F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS)
    ones = F.aggregate(
        th,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                powers,
                lambda p: F.when(h.bitwiseAND(p) != 0, F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                ),
            ),
            lambda a, b: a + b,
        ),
    )
    n = F.size(ws_tokens(text_col))
    return F.aggregate(
        F.zip_with(
            ones,
            powers,
            lambda o, p: F.when(o * 2 > n, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_vote_sums_sql(token_expr: str) -> str:
    """DuckDB twin of the vote aggregation (column list ``v0..v59``)."""
    h = f"('0x' || substr(md5({token_expr}), 1, 15))::BIGINT"
    return ", ".join(
        f"sum((({h} >> {j}) & 1) * 2 - 1) AS v{j}" for j in range(SIMHASH_BITS)
    )


def simhash_from_votes_sql() -> str:
    terms = " + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    return f"({terms})"


def simhash_band_keys(sig: Column) -> list[Column]:
    """Band keys ``b|chunk``: 15-bit chunks of the signature.  Any pair
    within Hamming distance SIMHASH_BANDS-1 (pigeonhole) shares at
    least one exact band."""
    return [
        F.concat(
            F.lit(f"{b}|"),
            F.shiftright(sig, b * SIMHASH_BAND_BITS)
            .bitwiseAND(F.lit(_BAND_MASK))
            .cast("string"),
        )
        for b in range(SIMHASH_BANDS)
    ]


def simhash_band_keys_sql(sig_expr: str) -> list[str]:
    return [
        f"'{b}|' || CAST(({sig_expr} >> {b * SIMHASH_BAND_BITS}) & {_BAND_MASK} AS VARCHAR)"
        for b in range(SIMHASH_BANDS)
    ]
