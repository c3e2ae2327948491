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

Size dispatch (LOCAL_MAX_EDGES): a well-deduped corpus yields a pair
table orders of magnitude smaller than the corpus, and the fixpoint's
per-round scheduling overhead dwarfs the data work there — below the
threshold the closure runs as driver-side union-find on one collected
edge list; above it (real 100 TB near-dup graphs) the propagation is
the only shape that fits. Same deterministic labeling either way,
pinned in tests with the threshold forced to 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Size dispatch (the ntile_quartiles precedent): at or below this many
#: edges the transitive closure runs as driver-side union-find — one
#: Arrow transfer of two long columns (~16 MB at the cap), zero
#: iterative jobs. The fixpoint's per-round cost is ~4 Spark jobs of
#: pure scheduling overhead, which DOMINATES on the near-dup graphs real
#: corpora produce (measured at sf0.1: 256 edges → 7.7 s through the
#: fixpoint, <0.3 s local); above the cap — billions of pairs at
#: 100 TB — the distributed propagation is the only shape that fits, and
#: the threshold probe is one count over the (persisted) pair table
#: either way. The cap is set where the DRIVER-side cost is known-small
#: (a 1M-iteration python loop is well under a second; the transfer is
#: Arrow-columnar, never per-row Row objects), not at the point the
#: driver heap would struggle. Both paths are deterministic min-label
#: components and are pinned identical in tests (threshold forced to 0
#: to exercise the fixpoint on the same graphs).
LOCAL_MAX_EDGES = 1_000_000


def connected_components(
    pairs: DataFrame, src: str = "a_id", dst: str = "b_id", max_rounds: int = 50
) -> DataFrame:
    """(id, component) for every vertex in ``pairs``; component = min id
    reachable. Deterministic — no randomness, no order dependence."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    p = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).persist()
    try:
        if p.count() <= LOCAL_MAX_EDGES:
            return _local_union_find(p)
        sym = p.union(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
        return _propagate(sym, max_rounds)
    finally:
        # unpersist on every exit path — the non-convergence raise must not
        # leave the edge table pinned in executor storage (both results are
        # independent of it: the local path is driver-built, the fixpoint's
        # labels are localCheckpointed every round)
        p.unpersist()


def _local_union_find(p: DataFrame) -> DataFrame:
    """Driver-side union-find over a collected edge list — the small-graph
    half of the size dispatch. Path-compressed, min-id roots, so the
    labeling is exactly the fixpoint's (component = min reachable id).
    The edges land as TWO ARROW COLUMNS (toPandas), never per-row Row
    objects — at the 1M-edge cap that is ~16 MB of driver memory, not the
    hundreds of MB a Row-list collect of the same table costs."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pdf = p.toPandas()
    for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
        ra, rb = find(u), find(v)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(x, find(x)) for x in parent]
    schema = p.schema["u"].dataType.simpleString()
    return p.sparkSession.createDataFrame(rows, f"id {schema}, component {schema}")


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
