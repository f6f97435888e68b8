"""Hand-derived golden vectors for the BPE trainer — the iterative
tokenizer is dual-implemented (a Spark loop and the unrolled DuckDB CTE
stack), so like the codec and sketch kernels a shared misreading of the
algorithm would survive the oracle gate.  Two tiny corpora whose merge
tables are derived on paper pin the two semantics that make BPE BPE:

1. greedy-left NON-OVERLAP: word "aaa" (x2) + "b" —
   round 1 counts pair (a,a) twice per word -> cnt 4, merge "aa";
   applying it to (a,a,a) left-to-right consumes the FIRST pair only,
   leaving (aa, a), NOT (a, aa) and not a double merge;
   round 2 then merges (aa, a) with cnt 2; round 3 finds no pairs.
2. the deterministic tie-break (cnt DESC, a ASC, b ASC):
   corpus "ab cd ab cd" has (a,b) and (c,d) tied at 2 —
   (a,b) must win round 1, (c,d) round 2.

Both the Spark trainer and the DuckDB oracle must produce the same
literal merge tables.
"""

import os
import tempfile

import duckdb
import pytest


def _corpus_dir(spark, texts):
    work = tempfile.mkdtemp(prefix="qss-bpe-golden-")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).coalesce(1).write.parquet(work + "/documents.parquet")
    return work


def _spark_merges(spark, sf_dir):
    from quick_stream_spark.plans.registry import REGISTRY, queries

    queries()
    return [
        tuple(r)
        for r in REGISTRY["text_bpe_train"].fn(spark, sf_dir)
        .orderBy("round")
        .collect()
    ]


def _duck_merges(sf_dir):
    from quick_stream_spark.plans.registry import REGISTRY, queries

    queries()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    rows = con.execute(
        REGISTRY["text_bpe_train"].oracle + " ORDER BY round"
    ).fetchall()
    return [(int(r[0]), r[1], r[2], r[3], int(r[4])) for r in rows]


def test_bpe_greedy_left_nonoverlap_golden(spark):
    work = _corpus_dir(spark, ["aaa aaa b"])
    expected = [
        (1, "a", "a", "aa", 4),   # (a,a) appears twice in each "aaa"
        (2, "aa", "a", "aaa", 2)  # greedy-left left (aa, a), not (a, aa)
    ]
    assert _spark_merges(spark, work) == expected
    assert _duck_merges(work) == expected


def test_bpe_tiebreak_golden(spark):
    work = _corpus_dir(spark, ["ab cd ab cd"])
    expected = [
        (1, "a", "b", "ab", 2),  # tied with (c,d): a ASC wins
        (2, "c", "d", "cd", 2),
    ]
    assert _spark_merges(spark, work) == expected
    assert _duck_merges(work) == expected
