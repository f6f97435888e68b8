"""Distributed graph primitives over edge DataFrames.

``min_label_components`` is the engine behind
``dedup_connected_components`` (plans/text.py) — factored out so the
algorithm can be driven with arbitrary edge sets (property-based tests
compare it against a union-find ground truth on random graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SELF = "__qss_self"


def min_label_components(
    spark: SparkSession, pairs: DataFrame, max_rounds: int = 50
) -> DataFrame:
    """Connected components by iterative min-label propagation with
    per-round pointer jumping: label every vertex of the undirected
    edge set ``pairs`` (columns id_a, id_b) with the minimum vertex id
    reachable from it — the distributed CC loop (GraphFrames/Pregel
    shape) with the label-doubling shortcut folded into every round, so
    deep chains converge in O(log diameter) rounds instead of
    O(diameter).

    r15 structure (guide §2.3 shuffle fewer bytes, §2.4 remove passes):

    1. **Degree-1 peeling.**  The setup job annotates every edge with
       both endpoints' degree and min-neighbor (one aggregation over
       the deduplicated edge list + two V-sized joins).  An edge whose
       endpoints BOTH have degree 1 is an entire component — its two
       vertices are labeled ``min(u, v)`` directly and never enter the
       loop.  On near-dup graphs (components are mostly single
       original/perturbed pairs) this removes ~90% of the edges from
       every fixpoint round: the loop's join/aggregate shuffles scale
       with the tangled CORE, not the full edge set.
    2. **Two-hop init.**  Core labels start at
       ``min(u, nmin(u), v, nmin(v))`` aggregated over the vertex's
       edges — exactly the label state after one propagation round from
       the one-hop init (the r14 fold), at no extra pass: the degree
       annotation already carries both endpoints' min-neighbor.  Star
       and diameter-≤2 components (the typical near-dup family) are
       final immediately, so the loop usually runs ONE confirming
       round.
    3. Per-round plan (one eager job, two shuffles over the core):
       neighbor labels (core edges join labels) UNION self labels →
       ONE groupBy computing the new min label and the previous label
       → pointer jump through the PREVIOUS round's checkpointed labels
       (adopt the grandparent when smaller — safe because labels are
       always in-component vertex ids and only ever decrease) →
       ``localCheckpoint(eager=True)``; the fixpoint probe is a narrow
       ``limit(1).count`` over the CHECKPOINTED frame.  (An
       ``Observation`` folded into the checkpoint job was measured
       faster on average but occasionally blocked multi-seconds on a
       lagging listener bus, so the deterministic probe wins.)  An
       empty core needs no special-case probe: round 0 over empty
       cached frames is two near-free jobs and exits immediately.

    The edge list is deduplicated in the setup checkpoint (one
    E-sized exchange, once): callers may pass duplicate / reversed /
    self-loop edges (the property tests do), and degree counting is
    only meaningful over distinct neighbors.  Self-loop-only vertices
    peel as degree-1 components of themselves.

    NOTE (r15 optimization round, measured and REJECTED): skipping the
    dedup exchange when the input is already canonical (DISTINCT with
    ``id_a < id_b`` — candidate_pairs_lsh's contract, so forward and
    reversed edges cannot collide and the mirrored union is distinct by
    construction) measured ~25% SLOWER at bench scale (9 alternating
    noop-timed passes over one checkpointed pair artifact: OLD min
    1.722 s / NEW min 2.236 s, every adjacent pair ordered the same
    way; jobs 28 vs 27).  The "redundant" exchange doubles as the
    union's REBALANCE: AQE coalesces its output to size (1 partition
    here), while the raw union checkpoints 2x the source's partitions
    (64 tiny ones) and every downstream job and fixpoint round pays
    their scheduling.  At cluster scale a mirrored union wants exactly
    such a width-sizing exchange anyway, and map-side partial dedup
    only shrinks its bytes — so the distinct is the right shape at
    both scales, not an accidental shuffle (guide §2.4 checked, §1.1
    empirical loop decides).

    NOTE (r15 optimization round, measured and REJECTED): a variant
    fusing the whole annotation into two window passes (count/min over
    ``partitionBy(v)`` then ``partitionBy(u)``, two-hop init folded
    into the u-window, no degree join-backs, ONE setup checkpoint
    instead of two) cut the job count 39 -> 36 but measured ~5% SLOWER
    at bench scale across six load-gated alternating A/B passes (both
    orderings; OLD min-median 3.30 s vs NEW 3.48 s).  Root cause:
    locally the V-sized degree table broadcast-joins back (AQE), while
    unbounded-frame windows pay two full sorts of E.  At cluster scale
    the join-backs become sort-merge joins paying the SAME sorts, so
    the window shape's only real edge is one fewer barrier — not worth
    a measured local regression (guide §1.1: the empirical loop
    decides).  Revisit only with a cluster-scale profile.

    Only vertices that appear in an edge are labeled (singletons are
    trivially their own component and never enter the loop)."""
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Degree + min-neighbor per vertex, attached to BOTH edge endpoints
    # (edges carry both directions, so every vertex appears as ``u``).
    deg = edges.groupBy(F.col("u").alias("id")).agg(
        F.min("v").alias("nmin"), F.count(F.lit(1)).alias("d")
    )
    du = deg.select(
        F.col("id").alias("u"), F.col("nmin").alias("nmin_u"), F.col("d").alias("du")
    )
    dv = deg.select(
        F.col("id").alias("v"), F.col("nmin").alias("nmin_v"), F.col("d").alias("dv")
    )
    ea = edges.join(du, "u").join(dv, "v").localCheckpoint(eager=True)
    iso = (F.col("du") == 1) & (F.col("dv") == 1)
    # Isolated edges ARE their component: one row per vertex (edges are
    # distinct and bidirectional, so each degree-1 vertex of an
    # isolated edge appears exactly once as ``u``).
    solved = ea.filter(iso).select(
        F.col("u").alias("id"), F.least("u", "v").alias("component")
    )
    core = ea.filter(~iso)
    cedges = core.select("u", "v")
    # Two-hop initial labels over the core: min over {u, min-neighbor
    # of u, each neighbor v, v's min-neighbor} — the exact output of
    # one propagation round from the one-hop init (pointer jump through
    # one-hop labels of a min-chain is absorbed by the min), computed
    # inside the SAME aggregation that would have built the one-hop
    # init.  Any label state whose values are in-component vertex ids
    # >= the component min is admissible for the loop below.
    labels = (
        core.groupBy(F.col("u").alias("id"))
        .agg(F.min(F.least("u", "nmin_u", "v", "nmin_v")).alias("component"))
        .localCheckpoint(eager=True)
    )
    # An empty tangled core (all components are isolated edges) needs
    # no special probe: round 0 runs over empty cached frames (two
    # near-free jobs), reports changed=0 and exits — cheaper in the
    # common non-empty case than an always-paid emptiness probe.
    for it in range(max_rounds):
        nbr = cedges.join(labels, cedges.v == labels.id).select(
            F.col("u").alias("id"), "component", F.lit(0).alias(_SELF)
        )
        slf = labels.select("id", "component", F.lit(1).alias(_SELF))
        updated = (
            nbr.unionByName(slf)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.max(F.when(F.col(_SELF) == 1, F.col("component"))).alias(
                    "old_component"
                ),
            )
        )
        # pointer jumping via the PREVIOUS (checkpointed) labels: the
        # lookup side is materialized, so this join does not recompute
        # the aggregation — component ids ARE vertex ids, so the self-
        # join resolves label -> label's label
        lbl = labels.select(
            F.col("id").alias("component"), F.col("component").alias("comp2")
        )
        updated = updated.join(lbl, "component", "left").select(
            "id",
            "old_component",
            F.least(F.coalesce("comp2", F.col("component")), F.col("component")).alias(
                "component"
            ),
        )
        new_labels = updated.localCheckpoint(eager=True)
        labels = new_labels.drop("old_component")
        changed = (
            new_labels.filter(F.col("component") != F.col("old_component"))
            .limit(1)
            .count()
        )
        if changed == 0:
            break
    return labels.select("id", "component").unionByName(solved)
