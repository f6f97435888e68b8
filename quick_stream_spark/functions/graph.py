"""Distributed graph primitives over edge DataFrames.

``min_label_components`` is the engine behind
``dedup_connected_components`` (plans/text.py) — factored out so the
algorithm can be driven with arbitrary edge sets (property-based tests
compare it against a union-find ground truth on random graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# After this many plain propagation rounds, add pointer jumping: near-dup
# clusters are shallow (2-3 hops) so the lean round wins early, but a
# deep-chain graph needs the O(log diameter) shortcut.
JUMP_AFTER = 8


def min_label_components(
    spark: SparkSession, pairs: DataFrame, max_rounds: int = 50
) -> DataFrame:
    """Connected components by iterative min-label propagation: label
    every vertex of the undirected edge set ``pairs`` (columns id_a,
    id_b) with the minimum vertex id reachable from it — the standard
    distributed CC loop (GraphFrames/Pregel shape, O(diameter) rounds,
    pointer jumping past :data:`JUMP_AFTER` restores O(log diameter)).

    Scale notes: each round is a join + groupBy-min at the caller's
    shuffle width; ``localCheckpoint`` truncates lineage so round N's
    plan does not contain rounds 1..N-1 (analysis time would otherwise
    grow superlinearly); the fixpoint probe reads the checkpointed
    frame only and is a narrow ``limit(1).count``.  Only vertices that
    appear in an edge are labeled (singletons are trivially their own
    component and never enter the loop)."""
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .localCheckpoint(eager=True)
    )
    labels = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for it in range(max_rounds):
        msgs = (
            edges.join(labels, edges.v == labels.id)
            .select(F.col("u").alias("id"), "component")
            .unionByName(labels.select("id", "component"))
        )
        updated = (
            msgs.groupBy("id")
            .agg(F.min("component").alias("new_component"))
            .join(labels, "id")
            .select(
                "id",
                F.col("component").alias("old_component"),
                F.col("new_component").alias("component"),
            )
        )
        if it >= JUMP_AFTER:
            # pointer jumping: shortcut each label to its label's label
            # (component ids ARE node ids, so the self-join resolves)
            lbl = updated.select(
                F.col("id").alias("component"), F.col("component").alias("comp2")
            )
            updated = updated.join(lbl, "component", "left").select(
                "id",
                "old_component",
                F.coalesce("comp2", F.col("component")).alias("component"),
            )
        new_labels = updated.localCheckpoint(eager=True)
        labels = new_labels.drop("old_component")
        if it == 0:
            continue  # every non-singleton component changes in round 1
        changed = (
            new_labels.filter(F.col("component") != F.col("old_component"))
            .limit(1)
            .count()
        )
        if changed == 0:
            break
    return labels.select("id", "component")
