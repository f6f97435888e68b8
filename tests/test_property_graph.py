"""Property-based check for the distributed connected-components loop:
min_label_components on random edge sets must agree with a plain
union-find ground truth — every vertex labeled with the minimum id
reachable from it.  Random graphs cover shapes the near-dup corpus
never produces (long chains that trigger pointer jumping, dense blobs,
many singleton edges)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quick_stream_spark.functions.graph import min_label_components

# small vertex space forces collisions/cycles; up to 24 edges
edge = st.tuples(
    st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)
)
edges_strategy = st.lists(edge, min_size=1, max_size=24)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_strategy)
def test_components_match_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.id: r.component for r in min_label_components(spark, pairs).collect()
    }
    assert got == _union_find(edges)


def test_all_isolated_edges_peel_without_loop(spark):
    # every component is a single degree-1/degree-1 edge: the r15 peel
    # labels them directly and the fixpoint loop never runs (empty
    # tangled core) — the result must still be the exact component map
    pairs = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(20)], "id_a long, id_b long"
    )
    got = {r.id: r.component for r in min_label_components(spark, pairs).collect()}
    assert got == {j: (j // 2) * 2 for j in range(40)}


def test_peel_mixed_with_core_and_hanging_leaf(spark):
    # isolated pairs + a star + a chain whose leaf is degree-1 but whose
    # partner is NOT (the leaf must go to the core, not be peeled)
    edges = [
        (100, 101),  # isolated pair
        (200, 201),  # isolated pair
        (1, 2), (1, 3), (1, 4),  # star centered at 1
        (10, 11), (11, 12), (12, 13),  # chain; 10 and 13 are degree-1
    ]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component for r in min_label_components(spark, pairs).collect()}
    assert got == _union_find(edges)


def test_duplicates_reversals_and_self_loops(spark):
    # duplicate edges, reversed duplicates and self-loops must not
    # corrupt degree counting (edges are deduplicated in setup) or
    # produce duplicate result rows
    edges = [(5, 6), (6, 5), (5, 6), (7, 7), (8, 9), (9, 8)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = min_label_components(spark, pairs).collect()
    assert len(rows) == len({r.id for r in rows})  # one row per vertex
    got = {r.id: r.component for r in rows}
    assert got == _union_find(edges)


def test_long_chain_exercises_pointer_jumping(spark):
    # plain one-hop propagation needs one round per hop, so a
    # 120-vertex chain cannot converge inside max_rounds=50 without
    # the per-round pointer-jumping shortcut
    n = 120
    chain = [(i, i + 1) for i in range(n)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    got = {r.id: r.component for r in min_label_components(spark, pairs).collect()}
    assert got == {i: 0 for i in range(n + 1)}
