"""Connected components over a pair table — the step that turns near-dup
PAIRS into dedup GROUPS (pick one canonical doc per cluster).

The reference stops at pair detection; a training-data pipeline needs the
transitive closure: if A~B and B~C, exactly one of {A,B,C} survives. This
is the classic iterative min-label propagation (the dense-graph special
case of Pregel large-star/small-star): every vertex repeatedly takes the
minimum label over itself and its neighbors until a fixpoint. Labels only
ever decrease, and after O(component diameter) rounds every vertex holds
its component's minimum id — a deterministic canonical group id.

Scale shape: each round is one shuffle join (edges ⋈ labels on the
neighbor key) plus one aggregate — no collect of anything but the scalar
convergence counter. Near-dup graphs have tiny diameters (clusters are
cliques-ish), so rounds stay in the low single digits; for adversarial
chain graphs the standard fix is the large-star/small-star variant that
halves long paths per round (doubling convergence speed), which slots in
here without changing the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "a_id", dst: str = "b_id", max_rounds: int = 50
) -> DataFrame:
    """(id, component) for every vertex in ``pairs``; component = min id
    reachable. Deterministic — no randomness, no order dependence."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    sym = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v"))).persist()
    try:
        return _propagate(sym, max_rounds)
    finally:
        # unpersist on every exit path — the non-convergence raise must not
        # leave the symmetrized edge table pinned in executor storage
        sym.unpersist()


def _propagate(sym: DataFrame, max_rounds: int) -> DataFrame:
    # localCheckpoint (not persist) each round: iterative plans nest the
    # whole previous lineage otherwise, and Catalyst re-analysis grows
    # superlinearly with rounds — the classic iterative-algorithm trap.
    # Checkpointing truncates the plan to the materialized partitions.
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_rounds):
        nbr_min = (
            sym.join(labels, sym["v"] == labels["id"])
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(nbr_min, labels["id"] == nbr_min["u"], "left")
            # least() skips nulls, so isolated rounds keep the own label
            .select(labels["id"], F.least("label", "nbr_label").alias("label"))
        )
        # Pointer doubling (path compression): label ← label(label). Every
        # label is a component-member id, so the lookup stays in-component
        # and only decreases; combined with the neighbor-min step this
        # halves remaining chain length per round — O(log diameter) rounds
        # instead of O(diameter), the property that makes the operator
        # usable on adversarial path graphs at scale.
        new_labels = (
            stepped.alias("l1")
            .join(stepped.alias("l2"), F.col("l1.label") == F.col("l2.id"), "left")
            .select(
                F.col("l1.id").alias("id"),
                F.coalesce(F.col("l2.label"), F.col("l1.label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        # labels only decrease — converged when no row shrank this round
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.label") < F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # Never return silently-wrong labels: min-label moves the minimum
        # one hop per round, so a component with diameter > max_rounds
        # would come back fractured (and hash-mismatch the fixpoint
        # oracle). Adversarial-diameter graphs need the
        # large-star/small-star variant, not a bigger round budget.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"({changed} labels still shrinking); component diameter exceeds "
            "the round budget"
        )
    return labels.select(F.col("id"), F.col("label").alias("component"))
