"""Golden vectors for the sketch/hash kernels — the same
circularity-break as tests/test_codec_golden_vectors.py, applied to the
sketch family: every registered sketch query is verified Spark-vs-DuckDB,
but BOTH sides replay the same documented formula, so a shared
misreading of the algorithm (a wrong modulus, an off-by-one in the rank
width, a swapped coefficient) would survive the oracle gate.  These
tests pin the formulas to literals derived OUTSIDE both engines:
Python's hashlib (an independent RFC 1321 implementation) supplies the
md5 digests — quoted in full next to each literal — and the register /
signature / counter arithmetic is then carried out by hand on those
digests.  Both the Spark kernels AND the DuckDB oracle twins must
reproduce the identical literals.

Derivations (md5 digests from hashlib, arithmetic on paper):

- md5("a")     = 0cc175b9c0f1b6a831c399e269772661
  token hash   = 0x0cc175b9c0f1b6a % 1000000007 = 74546323
- md5("abc")   = 900150983cd24fb0d6963f7d28e17f72
  token hash   = 0x900150983cd24fb % 1000000007 = 411709723
- shingle("a abc") [2 tokens < n=3 -> one zero-padded gram]:
  ((74546323*1000033 + 411709723) % P * 1000033 + 0) % P = 946786233
- md5("a abc") = e1dd1c4eede02ac144ac85f7d2dda871
  string-path shingle base = 0xe1dd1c4eede02ac % P = 486524323
- HLL (p=7, tag "golden", rmax = 48-7+1 = 42):
  md5("hll:golden:a")[:12] = 000f63765c7a -> h=66093210746,
    bucket = h%128 = 122, w = h>>7 (30 bits) -> rho = 42-30 = 13
  md5("hll:golden:b")[:12] = dbbaf3e9882e -> bucket 46, rho 1
  md5("hll:golden:c")[:12] = eeca72642384 -> bucket 4,  rho 1
  estimate: filled=3 -> linear counting round(-128*ln(125/128)) = 3
- CMS row hashes for key 42 (W=256):
  md5("0:42")[:15]=a9a14c524890795 -> 149;  md5("1:42") -> 73;
  md5("2:42") -> 96;                        md5("3:42") -> 117
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from quick_stream_spark.functions import hll
from quick_stream_spark.functions import minhash as mh

P = 1_000_000_007

TOKEN_HASH_A = 74546323
TOKEN_HASH_ABC = 411709723
SHINGLE_A_ABC = 946786233
STRING_BASE_A_ABC = 486524323

# (A_i * base + B_i) % P over the documented coefficient family,
# computed by hand for base = SHINGLE_A_ABC (the hashed-shingle path,
# where the bases ARE the shingle ints)
SIG_HASHED = [
    66743521, 133475486, 200207451, 266939416, 333671381, 400403346,
    467135311, 533867276, 600599241, 667331206, 734063171, 800795136,
    867527101, 934259066, 991024, 67722989,
]
SENTINELS = [P + 1 + i for i in range(mh.NUM_HASHES)]

HLL_REGS = [(4, 1), (46, 1), (122, 13)]  # (bucket, rho) sorted
CMS_IDX_42 = [149, 73, 96, 117]


def test_coefficient_family_is_the_documented_one():
    """The (A, B) permutation family must stay the documented closed
    form — the signature literals below assume it."""
    assert mh.MINHASH_A[:3] == [1000003, 2000006, 3000009]
    assert mh.MINHASH_B[:3] == [12345, 13134, 13923]
    assert mh.MINHASH_P == P


def test_spark_token_hash_and_shingle_golden(spark):
    row = (
        spark.createDataFrame([("a abc",)], "text string")
        .select(
            mh.token_hash_array(F.col("text")).alias("th"),
            mh.hashed_shingles(mh.token_hash_array(F.col("text"))).alias("sh"),
        )
        .collect()[0]
    )
    assert row.th == [TOKEN_HASH_A, TOKEN_HASH_ABC]
    assert row.sh == [SHINGLE_A_ABC]


def test_spark_minhash_signature_golden(spark):
    rows = (
        spark.createDataFrame([("a abc",), ("",)], "text string")
        .select(
            F.col("text"),
            mh.minhash_signature_from_bases(
                mh.hashed_shingles(mh.token_hash_array(F.col("text")))
            ).alias("sig"),
            mh.minhash_signature(mh.word_shingles(F.col("text"))).alias(
                "sig_str"
            ),
        )
        .collect()
    )
    by_text = {r.text: r for r in rows}
    assert by_text["a abc"].sig == SIG_HASHED
    # string-shingle path: one gram "a abc", base 486524323
    assert by_text["a abc"].sig_str == [
        (a * STRING_BASE_A_ABC + b) % P
        for a, b in zip(mh.MINHASH_A, mh.MINHASH_B)
    ]
    assert by_text[""].sig == SENTINELS  # empty doc -> per-perm sentinels


def test_duckdb_shingle_and_signature_golden():
    con = duckdb.connect()
    shingles_expr = mh.hashed_shingles_sql("'a abc'")
    sh = con.execute(f"SELECT {shingles_expr} AS sh").fetchone()[0]
    assert sh == [SHINGLE_A_ABC]
    sig = con.execute(
        "SELECT "
        + mh.minhash_signature_from_bases_sql(mh.hashed_shingles_sql("'a abc'"))
    ).fetchone()[0]
    assert sig == SIG_HASHED
    empty = con.execute(
        "SELECT " + mh.minhash_signature_from_bases_sql("CAST([] AS BIGINT[])")
    ).fetchone()[0]
    assert empty == SENTINELS


def test_spark_hll_register_golden(spark):
    keys = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    regs = sorted(
        (r.bucket, r.r)
        for r in hll.register_table(keys, "golden", F.col("k"), 7).collect()
    )
    assert regs == HLL_REGS
    est = hll.estimate(
        spark.createDataFrame(HLL_REGS, "bucket long, r int"), 7
    ).collect()[0]
    assert (est.filled, est.est_distinct) == (3, 3)
    # the raw harmonic estimate on these registers, by hand:
    # s = 2^(42-13) + 2*2^(42-1) + 125*2^42 = 554,154,397,270,016
    # alpha(7)*128^2*2^42 / s = 93.007... -> 93 (discarded by the
    # small-range correction, but its arithmetic is still pinned)
    assert est.raw_est == 93


def test_duckdb_hll_golden():
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(['a','b','c']) AS k")
    regs = sorted(
        con.execute(
            f"SELECT {hll.hash48_sql('golden', 'k')} % 128 AS bucket, "
            f"MAX({hll.rho_sql(7, hll.hash48_sql('golden', 'k'))}) AS r "
            "FROM t GROUP BY 1"
        ).fetchall()
    )
    assert [(int(b), int(r)) for b, r in regs] == HLL_REGS
    est = con.execute(hll.estimate_sql(7, "golden", "k", "t")).fetchone()
    assert (int(est[0]), int(est[1]), int(est[2])) == (3, 93, 3)


def test_cms_row_hashes_golden(spark):
    from quick_stream_spark.plans.sketches import CMS_D, _cms_idx, _cms_idx_sql

    assert CMS_D == 4
    row = (
        spark.createDataFrame([(42,)], "key long")
        .select(*[_cms_idx(j, F.col("key")).alias(f"i{j}") for j in range(4)])
        .collect()[0]
    )
    assert list(row) == CMS_IDX_42
    con = duckdb.connect()
    duck = [
        con.execute(f"SELECT {_cms_idx_sql(j, '42')}").fetchone()[0]
        for j in range(4)
    ]
    assert [int(v) for v in duck] == CMS_IDX_42


SIMHASH_A = 57446577476672362  # 0x0cc175b9c0f1b6a — md5("a")[:15] as int
SIMHASH_ABC = 648541476951500027  # 0x900150983cd24fb — md5("abc")[:15]


def test_spark_simhash_golden(spark):
    """SimHash majority votes carried out by hand on the two 60-bit
    token hashes above:

    - "abc" (one token): every bit's vote is the token's own bit ->
      signature == the token hash;
    - "a abc a" (n=3): ones_j = 2*bit_a + bit_abc, and 2*ones > 3 iff
      bit_a = 1 -> signature == hash("a");
    - "a abc" (n=2): 2*ones > 2 iff BOTH bits set -> signature ==
      hash("a") & hash("abc") = 0x1509800d006a = 23130547224682."""
    rows = (
        spark.createDataFrame(
            [("abc",), ("a abc a",), ("a abc",)], "text string"
        )
        .select("text", mh.simhash_signature(F.col("text")).alias("s"))
        .collect()
    )
    got = {r.text: r.s for r in rows}
    assert got == {
        "abc": SIMHASH_ABC,
        "a abc a": SIMHASH_A,
        "a abc": 23130547224682,
    }


def test_duckdb_simhash_golden():
    con = duckdb.connect()
    for toks, expected in [
        ("['abc']", SIMHASH_ABC),
        ("['a','abc','a']", SIMHASH_A),
        ("['a','abc']", 23130547224682),
    ]:
        q = (
            f"WITH toks AS (SELECT unnest({toks}) AS t), "
            f"votes AS (SELECT {mh.simhash_vote_sums_sql('t')} FROM toks) "
            f"SELECT {mh.simhash_from_votes_sql()} FROM votes"
        )
        assert con.execute(q).fetchone()[0] == expected, toks


def test_fingerprint_normalization_golden(spark):
    """The exact-dedup fingerprint = md5 of the canonical form
    (lowercase, strip non-alnum, collapse whitespace).  By hand:
    "  Hello,   WORLD!!  42 " -> "hello world 42", whose md5 (hashlib)
    is f13e2f734fe3d0d38e0bd70d9890e353 — pinned on both engines so a
    normalization drift (regex class, trim order) cannot hide behind
    the dual implementation."""
    from quick_stream_spark.functions import text as tx

    raw = "  Hello,   WORLD!!  42 "
    expected = "f13e2f734fe3d0d38e0bd70d9890e353"
    row = (
        spark.createDataFrame([(raw,)], "t string")
        .select(
            tx.normalize_text(F.col("t")).alias("n"),
            tx.fingerprint(F.col("t")).alias("fp"),
        )
        .collect()[0]
    )
    assert row.n == "hello world 42"
    assert row.fp == expected
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {tx.normalize_text_sql('t')}, {tx.fingerprint_sql('t')} "
        f"FROM (SELECT '{raw}' AS t)"
    ).fetchone()
    assert got == ("hello world 42", expected)


def test_hll_rho_zero_remainder_branch_golden(spark):
    """The w = h >> p == 0 branch (all remainder bits zero) yields the
    maximum rank rmax = 48 - p + 1 — a ~2^-41 natural event at p=7, so
    it is pinned on crafted h literals through both engines' rho
    implementations: h = 100 (< 2^7) -> rho = 42; h = 128 (w = 1, one
    binary digit) -> rho = 41; h = 2^47 (w at full width) -> rho = 1."""
    cases = [(100, 42), (128, 41), (1 << 47, 1)]
    df_rho = (
        spark.createDataFrame([(h,) for h, _ in cases], "h long")
        .select("h", hll.rho(F.col("h"), 7).alias("r"))
        .collect()
    )
    assert {r.h: r.r for r in df_rho} == dict(cases)
    con = duckdb.connect()
    for h, expected in cases:
        got = con.execute(
            f"SELECT {hll.rho_sql(7)} FROM (SELECT CAST({h} AS BIGINT) AS h)"
        ).fetchone()[0]
        assert got == expected, (h, got)
