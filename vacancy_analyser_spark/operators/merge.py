"""D1: snapshot merge with SCD2-lite lifecycle dates (SURVEY.md §2.7).

Re-expresses the reference's row-at-a-time Postgres merge
(feeder_postgres.py:111-194) as ONE full-outer join + column algebra over
the whole snapshot — the only formulation that survives 100 TB (the
reference does a point SELECT + per-column UPDATE per row).

Faithful semantics, cited to the reference:
- archived snapshot rows are treated as absent (":131-134") — they can
  therefore trigger removal of an existing row.
- new key → added_at = updated_at = snapshot_date (":144-150").
- matched key → added_at = min(state.added_at, snapshot_date) (":154");
  change detection compares the *string forms* of every data column
  (":162" — ``str(csv) != str(db)``), and only a non-added_at change bumps
  updated_at (":173-177").
- key absent from snapshot → removed_at = snapshot_date, but only when
  added_at < snapshot_date and the row is not already removed (":181-187").
- out-of-order snapshot (state.updated_at NULL or > snapshot_date on any
  matched row) → raise (":156-159").
- quirk preserved: a removed key that *reappears* keeps its removed_at —
  the reference's update path never touches removed_at because the CSV has
  no lifecycle columns. ``clear_removed_on_reappear=True`` opts into the
  saner behavior.

Scale design:
- change detection is a single xxhash64 over a sentinel-joined concat of
  string forms — one 64-bit compare per row instead of |columns| compares;
  collisions (~2⁻⁶⁴) err toward "unchanged", the same direction as the
  reference's string compare being lossy for type-formatting differences.
- the join shuffles both sides by the key once; with state stored bucketed
  by key (io.write_parquet + bucketBy in a real deployment) repeat merges
  shuffle only the (much smaller) snapshot.
- the monotonicity guard is a cheap pre-aggregate over lifecycle columns
  only (parquet column pruning: reads 2 columns).
"""

from __future__ import annotations

import datetime as dt
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Sentinel mirroring Python's ``str(None)`` so NULL == NULL in the diff,
#: exactly like the reference's string compare (feeder_postgres.py:162).
_NULL_FORM = "None"
#: Field separator for the row hash — a control char that cannot appear in
#: the reference's data, preventing concat-boundary collisions
#: ("ab"+"c" vs "a"+"bc").
_SEP = "\x01"

LIFECYCLE_COLUMNS = ("added_at", "updated_at", "removed_at")


class MergeOrderError(Exception):
    """Snapshot is older than state — replay detected (feeder_postgres.py:156-159)."""


def _str_form(c: Column) -> Column:
    return F.coalesce(c.cast("string"), F.lit(_NULL_FORM))


def _row_hash(prefix: str, data_columns: list[str]) -> Column:
    return F.xxhash64(F.concat_ws(_SEP, *[_str_form(F.col(f"{prefix}.{c}")) for c in data_columns]))


def merge_snapshot(
    state: DataFrame,
    snapshot: DataFrame,
    snapshot_date: dt.date,
    key: str = "id",
    archived_col: str | None = "archived",
    strict: bool = True,
    clear_removed_on_reappear: bool = False,
) -> DataFrame:
    """Fold a full snapshot dated ``snapshot_date`` into ``state``.

    ``state`` carries the data columns plus added_at/updated_at/removed_at;
    ``snapshot`` carries data columns only. Returns the new state with the
    same schema as ``state``. Pure transformation apart from the ``strict``
    precondition, which runs one small aggregate.
    """
    data_columns = [c for c in snapshot.columns if c != key]
    if archived_col and archived_col in snapshot.columns:
        snapshot = snapshot.filter(~F.coalesce(F.col(archived_col), F.lit(False)))
    d = F.lit(snapshot_date).cast("date")

    if strict:
        # Any matched row with updated_at NULL or in the future of this
        # snapshot means we are replaying history → refuse, like the
        # reference. Column-pruned scan: key + updated_at only.
        bad = (
            state.select(key, "updated_at")
            .join(snapshot.select(key), key, "left_semi")
            .filter(F.col("updated_at").isNull() | (F.col("updated_at") > d))
            .limit(1)
            .count()
        )
        if bad:
            raise MergeOrderError(
                f"snapshot {snapshot_date} is not newer than existing state (replay?)"
            )

    s = state.alias("s")
    n = snapshot.alias("n")
    joined = s.join(n, F.col(f"s.{key}") == F.col(f"n.{key}"), "full_outer")

    in_state = F.col(f"s.{key}").isNotNull()
    in_snap = F.col(f"n.{key}").isNotNull()
    changed = _row_hash("s", data_columns) != _row_hash("n", data_columns)

    out_key = F.coalesce(F.col(f"s.{key}"), F.col(f"n.{key}")).alias(key)
    out_data = [
        F.when(in_snap, F.col(f"n.{c}")).otherwise(F.col(f"s.{c}")).alias(c) for c in data_columns
    ]
    added_at = (
        F.when(in_state & in_snap, F.least(F.col("s.added_at"), d))
        .when(in_snap, d)
        .otherwise(F.col("s.added_at"))
        .alias("added_at")
    )
    updated_at = (
        F.when(in_state & in_snap, F.when(changed, d).otherwise(F.col("s.updated_at")))
        .when(in_snap, d)
        .otherwise(F.col("s.updated_at"))
        .alias("updated_at")
    )
    removable = (
        F.col("s.added_at") < d
    ) & (F.col("s.removed_at").isNull() | (F.col("s.removed_at") > d))
    removed_at = (
        F.when(~in_snap & in_state, F.when(removable, d).otherwise(F.col("s.removed_at")))
        .when(
            in_snap & in_state,
            F.lit(None).cast("date") if clear_removed_on_reappear else F.col("s.removed_at"),
        )
        .otherwise(F.lit(None).cast("date"))
        .alias("removed_at")
    )
    result = joined.select(out_key, *out_data, added_at, updated_at, removed_at)
    # Preserve the caller's column order (state schema).
    return result.select(*state.columns)


def bootstrap_state(snapshot: DataFrame, snapshot_date: dt.date, key: str = "id",
                    archived_col: str | None = "archived") -> DataFrame:
    """First-ever snapshot → initial state (every row freshly added)."""
    if archived_col and archived_col in snapshot.columns:
        snapshot = snapshot.filter(~F.coalesce(F.col(archived_col), F.lit(False)))
    d = F.lit(snapshot_date).cast("date")
    return snapshot.select(
        "*",
        d.alias("added_at"),
        d.alias("updated_at"),
        F.lit(None).cast("date").alias("removed_at"),
    )


def state_max_date(state: DataFrame) -> dt.date | None:
    """High-water mark over lifecycle dates (feeder_postgres.py:197-209,
    duplicated at feeder_hadoop.py:29-41) — one column-pruned aggregate."""
    row = state.agg(
        F.greatest(F.max("added_at"), F.max("updated_at"), F.max("removed_at")).alias("m")
    ).collect()[0]
    return row["m"]


def merge_snapshots(
    state: DataFrame | None,
    snapshots: list[tuple[dt.date, DataFrame]],
    key: str = "id",
    archived_col: str | None = "archived",
    high_water_mark: dt.date | None = None,
) -> DataFrame:
    """D2: fold a sequence of dated snapshots, oldest first, skipping any
    at-or-below the high-water mark (feeder_postgres.py:224-231's
    incremental trigger). The streaming twin is
    streaming/snapshot_stream.py."""
    for snap_date, snap in sorted(snapshots, key=lambda t: t[0]):
        if high_water_mark is not None and snap_date <= high_water_mark:
            continue
        if state is None:
            state = bootstrap_state(snap, snap_date, key=key, archived_col=archived_col)
        else:
            state = merge_snapshot(state, snap, snap_date, key=key, archived_col=archived_col)
    if state is None:
        raise ValueError("no snapshots to merge and no initial state")
    return state
