"""Skew mitigation for joins whose build side is too big to broadcast.

AQE's skew-join splitting (on by default in session.py) handles most skew by
subdividing oversized *partitions* of a sort-merge join. It cannot help when
a single join KEY is hot — all rows of one key hash to one partition and one
task streams them alone. The classic fix is salting:

  fact side:  add a uniform salt in [0, n_salts)        → key spreads over
  dim  side:  replicate each row once per salt value      n_salts partitions
  join on (key, salt), drop the salt.

This trades an n_salts× blow-up of the dimension side for n_salts-way
parallelism on the hot keys — worth it exactly when the dimension is much
smaller than the fact but above the broadcast threshold, which is the only
regime where salting beats both broadcast (dim too big) and plain shuffle
(key too hot). The reference never hits this (its joins are dict lookups,
notebook cell 27), but a 100 TB vacancy fact table joined to a million-row
employer dimension on a power-law employer_id is this regime precisely.

Determinism note: the salt is ``pmod(xxhash64(monotonically_increasing_id,
seed), n_salts)`` — pseudo-random spread, but *stable within a task retry*
is not required since any salt value joins correctly (the dim side carries
all salts); correctness never depends on the salt distribution, only
balance does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    strategy: str | None = None,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim on fact[on] == dim[on]`` with key salting.

    ``how`` supports inner/left (the fact side must keep its multiplicity;
    right/full variants would need dim-side de-salting and are not what
    salting is for).

    ``strategy`` optionally pins the join implementation via a dim-side
    hint (``"merge"`` / ``"shuffle_hash"``). Salting is for the regime
    where the dim is too big to broadcast, so production callers leave it
    None; at test/demo scale every dim fits under the broadcast threshold
    and AQE would promote it, hiding the salted Exchange the operator
    exists to create — pinning ``"merge"`` makes the small-scale plan the
    same distributed shape the 100 TB run would execute.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    dim_rep = dim.withColumn(_SALT, salts)
    if strategy is not None:
        dim_rep = dim_rep.hint(strategy)
    fact_s = fact.withColumn(
        _SALT,
        F.pmod(F.xxhash64(F.monotonically_increasing_id(), F.lit(42)), F.lit(n_salts)).cast("int"),
    )
    joined = fact_s.join(dim_rep, [on, _SALT], how)
    return joined.drop(_SALT)


def top_keys(df: DataFrame, key: str | Column, n: int = 20) -> DataFrame:
    """Skew diagnosis: the n heaviest keys with their row counts and share.
    Run this before deciding broadcast vs salt vs AQE-only."""
    k = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(k.alias("key")).count()
    total = counts.agg(F.sum("count").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select("key", "count", (F.col("count") / F.col("t")).alias("share"))
        .orderBy(F.col("count").desc())
        .limit(n)
    )
