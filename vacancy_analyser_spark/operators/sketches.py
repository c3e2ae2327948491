"""Bounded-memory frequency sketches (SURVEY §2.11 [ext] — the "novel
sketch" custom-operator tier).

heavy_hitters answers "which items occur in more than φ·n rows?" without
ever shuffling the full vocabulary: a per-partition Misra-Gries summary
(≤ k counters each, Arrow-batched) proposes candidates, and one exact
filtered aggregate verifies them. The output is therefore EXACT — the
sketch only bounds the candidate set, never the reported counts — which
is what makes the operator oracle-checkable (the DuckDB twin is a plain
HAVING count > φ·n) and deterministic despite the approximate first pass.

Guarantee: Misra-Gries with k counters undercounts any item by at most
n_p/(k+1) per partition (each decrement retires k+1 occurrences), so with
k ≥ ⌈2/φ⌉ every item with global frequency > φ·n survives summary merge
with a positive count. The candidate set is ≤ k·partitions rows — the only
data that ever leaves a partition before the exact verify.

At 100 TB: pass 1 is a scan with map-side-bounded state (no shuffle of
anything vocabulary-sized); the merged candidates broadcast back for the
exact pass, whose aggregate only carries candidate rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_compress(counters: dict, k: int) -> None:
    """Keep ≤ k counters by subtracting the (k+1)-th largest count from all
    and dropping the non-positive — the Misra-Gries reduction (uniform
    subtraction preserves the undercount bound)."""
    if len(counters) <= k:
        return
    pivot = sorted(counters.values(), reverse=True)[k]
    for key in list(counters):
        counters[key] -= pivot
        if counters[key] <= 0:
            del counters[key]


def _mg_partition(k: int, col: str):
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # dropna=False + None-normalization: NULL is a countable value
            # here, matching the SQL GROUP BY (which keeps the NULL group).
            # pd.isna → None normalization matters because two float NaNs
            # are not equal, so they'd fragment into separate dict keys.
            for item, cnt in pdf[col].value_counts(dropna=False).items():
                key = None if pd.isna(item) else item
                counters[key] = counters.get(key, 0) + int(cnt)
            # compress lazily at 4k so per-batch work stays amortized O(1)
            if len(counters) > 4 * k:
                _mg_compress(counters, k)
        _mg_compress(counters, k)
        yield pd.DataFrame({col: list(counters), "mg_count": list(counters.values())})

    return summarize


def heavy_hitters(items: DataFrame, col: str, threshold_frac: float) -> DataFrame:
    """Exact items with frequency > threshold_frac · count(items), found
    via a Misra-Gries candidate pass + one exact verify aggregate.
    Returns (col, freq) — freq is the true count, never the sketch's.

    Float NaN counts as NULL: the pandas pass normalizes NaN→None (two
    NaNs are unequal as dict keys), so the Spark side must agree — the
    column is NaN→NULL-normalized up front, otherwise the eqNullSafe
    verify join (NULL ≠ NaN in Spark) would silently drop a NaN-valued
    heavy hitter. The projected single-column input is persisted so the
    three consumers (sketch pass, total count, exact verify) share ONE
    materialization — without it the upstream lineage (tokenize/explode
    for the registered query) would execute three times."""
    k = max(1, int(2.0 / threshold_frac))
    dt = items.schema[col].dataType
    dtype = dt.simpleString()
    projected = items.select(col)
    if dtype in ("float", "double"):
        projected = projected.select(
            F.when(F.isnan(F.col(col)), F.lit(None)).otherwise(F.col(col)).alias(col)
        )
    projected = projected.persist()
    sketch = projected.mapInPandas(
        _mg_partition(k, col), schema=f"{col} {dtype}, mg_count long"
    )
    candidates = (
        sketch.groupBy(col)
        .agg(F.sum("mg_count").alias("mg_total"))
        .filter(F.col("mg_total") > 0)
        .select(col)
    )
    total = projected.count()  # also materializes the shared cache
    # eqNullSafe: a NULL exceeding the threshold is a real heavy hitter —
    # the SQL twin's GROUP BY keeps the NULL group, so the join must too
    # (a plain equi-join would silently drop NULL keys).
    return (
        projected.join(F.broadcast(candidates), projected[col].eqNullSafe(candidates[col]))
        .drop(candidates[col])
        .groupBy(col)
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") > threshold_frac * total)
    )
