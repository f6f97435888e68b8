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

    Per-round plan (one eager job, two shuffles):
      1. neighbor labels (edges join labels) UNION self labels, tagged;
      2. ONE groupBy computing both the new min label and the previous
         label (the self row carries it) — no separate old-label join;
      3. pointer jump: shortcut each new label through the PREVIOUS
         round's checkpointed labels (``labels[label]``), i.e. adopt
         the grandparent when it is smaller — safe because labels are
         always in-component vertex ids and only ever decrease;
      4. ``localCheckpoint(eager=True)`` truncates lineage so round N's
         plan does not contain rounds 1..N-1; the fixpoint probe is a
         narrow ``limit(1).count`` over the CHECKPOINTED frame (cached
         partitions, short-circuits on the first changed row).  An
         ``Observation`` folded into the checkpoint job was measured
         faster on average but occasionally blocked multi-seconds on a
         lagging listener bus (``obs.get`` waits for the async
         QueryExecution event), so the deterministic probe wins.

    Only vertices that appear in an edge are labeled (singletons are
    trivially their own component and never enter the loop)."""
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .localCheckpoint(eager=True)
    )
    # Initial labels = min(id, min neighbor) — exactly what round 1 of
    # the loop would compute from identity labels (the pointer jump
    # through identity labels is a no-op), folded into ONE aggregation
    # over the edge list.  Replaces the identity-label distinct at the
    # same cost and saves a full loop round (a join + groupBy + jump +
    # checkpoint + fixpoint probe = two synchronization barriers); on
    # near-dup graphs, where most components are single edges, the loop
    # then usually terminates at its first (confirming) round.  Every
    # edge vertex appears as ``u`` (edges carry both directions), so the
    # labeled vertex set is unchanged.
    labels = (
        edges.groupBy(F.col("u").alias("id"))
        .agg(F.min("v").alias("nmin"))
        .select("id", F.least(F.col("id"), F.col("nmin")).alias("component"))
        .localCheckpoint(eager=True)
    )
    for it in range(max_rounds):
        nbr = edges.join(labels, edges.v == labels.id).select(
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
    return labels.select("id", "component")
