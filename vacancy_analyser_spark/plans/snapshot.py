"""D1 snapshot-merge as a relational query (SURVEY.md §2.7).

The reference's most intricate operator (feeder_postgres.py:111-194) folds a
dated snapshot into current state row-by-row over a Postgres connection. The
engine version is one full-outer join + column algebra — the row-level
implementation with lifecycle dates lives in operators/merge.py; this module
registers the oracle-checkable *shape* of it over two `events`-derived
snapshots:

  snapshot A = per-user state from the first half of the event range
  snapshot B = per-user state from days 8..30 (overlapping window)

and classifies every user exactly as the feeder would: inserted (only in B,
feeder_postgres.py:144-150), removed (only in A, :181-192), updated (payload
diff, :162-177), unchanged (no diff → no updated_at bump, :173-177).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

_A_LO, _A_HI = "2024-01-01 00:00:00", "2024-01-16 00:00:00"
_B_LO, _B_HI = "2024-01-08 00:00:00", "2024-01-31 00:00:00"


def _snap_sql(lo: str, hi: str) -> str:
    return f"""
        SELECT user_id, COUNT(*) AS n_events
        FROM events
        WHERE ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}'
        GROUP BY user_id
    """


@register(
    "snapshot_merge",
    oracle=f"""
        WITH a AS ({_snap_sql(_A_LO, _A_HI)}),
             b AS ({_snap_sql(_B_LO, _B_HI)})
        SELECT COALESCE(a.user_id, b.user_id) AS user_id,
               a.n_events AS n_a,
               b.n_events AS n_b,
               CASE WHEN a.user_id IS NULL THEN 'inserted'
                    WHEN b.user_id IS NULL THEN 'removed'
                    WHEN a.n_events <> b.n_events THEN 'updated'
                    ELSE 'unchanged' END AS status
        FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
    tags=("D1",),
)
def snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 merge shape: full-outer join of two snapshots on the key +
    when/otherwise lifecycle classification. One shuffle on the key; at
    100 TB both sides are bucketed on the key so even that shuffle
    disappears on repeat merges."""
    def snap(lo: str, hi: str, alias: str) -> DataFrame:
        # Time bounds go through load_table's ts_filters so they reach the
        # parquet scan in the raw nanos domain (row-group/partition pruning)
        # instead of sitting above the timestamp conversion.
        return (
            load_table(spark, sf_dir, "events", ts_filters=[("ts", ">=", lo), ("ts", "<", hi)])
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"))
            .alias(alias)
        )

    a = snap(_A_LO, _A_HI, "a")
    b = snap(_B_LO, _B_HI, "b")
    status = (
        F.when(F.col("a.user_id").isNull(), "inserted")
        .when(F.col("b.user_id").isNull(), "removed")
        .when(F.col("a.n_events") != F.col("b.n_events"), "updated")
        .otherwise("unchanged")
    )
    return a.join(b, F.col("a.user_id") == F.col("b.user_id"), "full_outer").select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        F.col("a.n_events").alias("n_a"),
        F.col("b.n_events").alias("n_b"),
        status.alias("status"),
    )


#: Changeset predicate for the partitioned-merge key: a sparse,
#: deterministic, SQL-expressible subset of users so the changeset touches
#: only SOME id-bucket partitions at the driver's correctness SF — the
#: regime the partition-scoped rewrite exists for.
_CS_MOD, _CS_REM = 20, 3


def _partstate_paths(sf_dir: str) -> tuple[str, str]:
    import os

    from ..operators.partitioned_state import N_STATE_BUCKETS

    tag = (os.path.basename(os.path.normpath(sf_dir)) or "sf").replace(".", "_")
    warehouse = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "spark-warehouse"
    )
    # The build recipe is part of the store's identity (the _ivf_index_path
    # rule): a changed bucket count or snapshot/changeset window must
    # produce a NEW store directory — pruning a mod-32 layout with mod-16
    # bucket ids would silently merge against the wrong partitions.
    recipe = f"b{N_STATE_BUCKETS}_{_A_LO[:10]}_{_A_HI[:10]}_m{_CS_MOD}r{_CS_REM}".replace(
        "-", ""
    )
    base = os.path.join(warehouse, f"partstate_{tag}_{recipe}")
    return os.path.join(base, "state_a"), os.path.join(base, "merged")


@register(
    "snapshot_merge_partitioned",
    oracle=f"""
        WITH a AS ({_snap_sql(_A_LO, _A_HI)}),
             b AS (
                SELECT user_id, COUNT(*) AS n_events
                FROM events
                WHERE ts >= TIMESTAMP '{_B_LO}' AND ts < TIMESTAMP '{_B_HI}'
                  AND user_id % {_CS_MOD} = {_CS_REM}
                GROUP BY user_id
             )
        SELECT COALESCE(a.user_id, b.user_id) AS user_id,
               a.n_events AS n_a,
               b.n_events AS n_b,
               CASE WHEN a.user_id IS NULL THEN 'inserted'
                    WHEN b.user_id IS NULL THEN 'retained'
                    WHEN a.n_events <> b.n_events THEN 'updated'
                    ELSE 'unchanged' END AS status
        FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
    tags=("D1", "S10", "opt-partitioned"),
)
def snapshot_merge_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1's write side, partition-scoped (operators/partitioned_state.py):
    state lives partitioned by pmod(xxhash64(user_id), 32); folding a
    sparse changeset in rewrites ONLY the buckets holding changed users —
    dynamic partition overwrite, with the old state read through a
    partition-pruned scan of the same buckets. The reference rewrites one
    id-bucket file at a time for exactly this reason
    (get_hist_vacancies.py:15-16,191-216); at 100 TB a merge must scale
    with the changeset, not the state.

    The returned frame is the WHOLE post-merge state read back from the
    store, so the driver hash proves both halves at once: the touched
    buckets hold the classified merge (inserted/updated/unchanged) and
    the untouched buckets still hold their initial rows byte-for-byte
    ('retained' — their files were never rewritten;
    tests/test_partitioned_state.py asserts file identity directly)."""
    import os
    import shutil

    from ..io import materialization_is_fresh
    from ..operators.partitioned_state import merge_changeset_partitioned, write_state

    state_a, merged = _partstate_paths(sf_dir)
    src = os.path.join(sf_dir, "events.parquet")
    if not materialization_is_fresh(state_a, src):
        shutil.rmtree(state_a, ignore_errors=True)
        init = (
            load_table(
                spark, sf_dir, "events", ts_filters=[("ts", ">=", _A_LO), ("ts", "<", _A_HI)]
            )
            .groupBy("user_id")
            .agg(F.count("*").alias("n_a"))
            .select(
                "user_id",
                "n_a",
                F.lit(None).cast("long").alias("n_b"),
                F.lit("retained").alias("status"),
            )
        )
        write_state(init, state_a, key="user_id")
    shutil.rmtree(merged, ignore_errors=True)
    shutil.copytree(state_a, merged)

    changeset = (
        load_table(
            spark, sf_dir, "events", ts_filters=[("ts", ">=", _B_LO), ("ts", "<", _B_HI)]
        )
        .filter(F.col("user_id") % _CS_MOD == _CS_REM)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_b_new"))
    )

    def classify(old: DataFrame, ch: DataFrame) -> DataFrame:
        o, c = old.alias("o"), ch.alias("c")
        status = (
            F.when(F.col("o.user_id").isNull(), "inserted")
            .when(F.col("c.user_id").isNull(), F.col("o.status"))
            .when(F.col("o.n_a") != F.col("c.n_b_new"), "updated")
            .otherwise("unchanged")
        )
        return o.join(c, F.col("o.user_id") == F.col("c.user_id"), "full_outer").select(
            F.coalesce(F.col("o.user_id"), F.col("c.user_id")).alias("user_id"),
            F.col("o.n_a").alias("n_a"),
            F.coalesce(F.col("c.n_b_new"), F.col("o.n_b")).alias("n_b"),
            status.alias("status"),
        )

    merge_changeset_partitioned(spark, merged, changeset, classify, key="user_id")
    # Explicit schema: an empty corpus writes a store with zero data files
    # (partitionBy on an empty frame), which parquet cannot infer from.
    store_schema = "user_id bigint, n_a bigint, n_b bigint, status string, id_bucket int"
    return spark.read.schema(store_schema).parquet(merged).select(
        "user_id", "n_a", "n_b", "status"
    )


@register(
    "state_store_compact",
    oracle=f"""
        WITH a AS ({_snap_sql(_A_LO, _A_HI)}),
             b AS (
                SELECT user_id, COUNT(*) AS n_events
                FROM events
                WHERE ts >= TIMESTAMP '{_B_LO}' AND ts < TIMESTAMP '{_B_HI}'
                  AND user_id % {_CS_MOD} = {_CS_REM}
                GROUP BY user_id
             )
        SELECT COALESCE(a.user_id, b.user_id) AS user_id,
               a.n_events AS n_a,
               b.n_events AS n_b,
               CASE WHEN a.user_id IS NULL THEN 'inserted'
                    WHEN b.user_id IS NULL THEN 'retained'
                    WHEN a.n_events <> b.n_events THEN 'updated'
                    ELSE 'unchanged' END AS status
        FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
    tags=("D1", "opt-partitioned"),
)
def state_store_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction driver-checked on the PARTITIONED STATE STORE: every
    merge_changeset_partitioned rewrites its touched id-buckets through an
    unclustered shuffle (one file per task per bucket), so a store folding
    a changeset stream fragments like every other partitioned layout
    here. Fixture: the snapshot_merge_partitioned recipe with the
    changeset folded in as TWO disjoint half-merges (split on
    (user_id / mod) parity — the fragmenting workload; the halves are
    user-disjoint, so the folded result is provably identical to the
    one-shot merge), then compact_state (the shared compact_partitions
    keyed on id_bucket).

    The returned frame is the WHOLE post-compact state read back from
    disk; the oracle is the single-merge statement itself — compaction
    must change file boundaries and nothing else, on top of the merge
    equivalence the base key already pins. File-census shrink and
    logical-content identity are additionally pinned in
    tests/test_compaction.py::test_compact_state_store."""
    import os
    import shutil

    from ..io import materialization_is_fresh
    from ..operators.partitioned_state import (
        N_STATE_BUCKETS,
        compact_state,
        merge_changeset_partitioned,
        write_state,
    )

    tag = (os.path.basename(os.path.normpath(sf_dir)) or "sf").replace(".", "_")
    warehouse = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "spark-warehouse"
    )
    recipe = (
        f"b{N_STATE_BUCKETS}_{_A_LO[:10]}_{_A_HI[:10]}_m{_CS_MOD}r{_CS_REM}_cmp"
    ).replace("-", "")
    store = os.path.join(warehouse, f"partstate_{tag}_{recipe}", "state")
    src = os.path.join(sf_dir, "events.parquet")
    if not materialization_is_fresh(store, src):
        shutil.rmtree(store, ignore_errors=True)
        init = (
            load_table(
                spark, sf_dir, "events", ts_filters=[("ts", ">=", _A_LO), ("ts", "<", _A_HI)]
            )
            .groupBy("user_id")
            .agg(F.count("*").alias("n_a"))
            .select(
                "user_id",
                "n_a",
                F.lit(None).cast("long").alias("n_b"),
                F.lit("retained").alias("status"),
            )
        )
        write_state(init, store, key="user_id")

        changeset = (
            load_table(
                spark, sf_dir, "events", ts_filters=[("ts", ">=", _B_LO), ("ts", "<", _B_HI)]
            )
            .filter(F.col("user_id") % _CS_MOD == _CS_REM)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_b_new"))
        )

        def classify(old: DataFrame, ch: DataFrame) -> DataFrame:
            o, c = old.alias("o"), ch.alias("c")
            status = (
                F.when(F.col("o.user_id").isNull(), "inserted")
                .when(F.col("c.user_id").isNull(), F.col("o.status"))
                .when(F.col("o.n_a") != F.col("c.n_b_new"), "updated")
                .otherwise("unchanged")
            )
            return o.join(
                c, F.col("o.user_id") == F.col("c.user_id"), "full_outer"
            ).select(
                F.coalesce(F.col("o.user_id"), F.col("c.user_id")).alias("user_id"),
                F.col("o.n_a").alias("n_a"),
                F.coalesce(F.col("c.n_b_new"), F.col("o.n_b")).alias("n_b"),
                status.alias("status"),
            )

        half = F.floor(F.col("user_id") / _CS_MOD) % 2
        for parity in (0, 1):
            merge_changeset_partitioned(
                spark, store, changeset.filter(half == parity), classify, key="user_id"
            )
        compact_state(spark, store)
    store_schema = "user_id bigint, n_a bigint, n_b bigint, status string, id_bucket int"
    return spark.read.schema(store_schema).parquet(store).select(
        "user_id", "n_a", "n_b", "status"
    )


#: D2 fixture windows: the target state was fed through Jan 15 (its
#: stored high-water-mark), and the re-delivered feed re-offers days
#: 10..30 — days 10..15 are ALREADY FED and must be skipped by the gate.
_HWM_CUT = "2024-01-16 00:00:00"
_FEED_LO = "2024-01-10 00:00:00"


@register(
    "incremental_merge_hwm",
    oracle=f"""
        WITH t AS (
            SELECT user_id, COUNT(*) AS n
            FROM events WHERE ts < TIMESTAMP '{_HWM_CUT}'
            GROUP BY user_id
        ),
        h AS (
            SELECT MAX(date_trunc('day', ts)) AS d
            FROM events WHERE ts < TIMESTAMP '{_HWM_CUT}'
        ),
        f AS (
            SELECT user_id, COUNT(*) AS n
            FROM events, h
            WHERE ts >= TIMESTAMP '{_FEED_LO}'
              AND ts >= h.d + INTERVAL 1 DAY
            GROUP BY user_id
        )
        SELECT COALESCE(t.user_id, f.user_id) AS user_id,
               COALESCE(t.n, 0) AS n_before,
               COALESCE(f.n, 0) AS n_fed,
               COALESCE(t.n, 0) + COALESCE(f.n, 0) AS n_after,
               (SELECT d FROM h) AS hwm_day
        FROM t FULL OUTER JOIN f ON t.user_id = f.user_id
    """,
    tags=("D2",),
)
def incremental_merge_hwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 high-water-mark incremental trigger (feeder_postgres.py:203-231
    ``get_db_max_date`` + the ``csv_dir_date <= max_date_so_far: continue``
    gate, scheduled by periodic_run.py:31-35): the stored state knows its
    max fed date; a re-delivered feed that overlaps already-fed days is
    consumed ONLY above that mark, so nothing double-counts.

    Engine shape: the hwm is ONE control scalar (the reference's
    ``select max(added_at)...`` — a bounded ``.first()``, not a data-path
    collect), and the gate becomes a LITERAL pushed into the feed scan via
    the nanos-domain ts_filters. At 100 TB with a date-partitioned feed
    that literal is partition pruning — the trigger reads the unfed days,
    never the feed history. The merge itself is the D1 full-outer fold on
    the state key."""
    target = (
        load_table(spark, sf_dir, "events", ts_filters=[("ts", "<", _HWM_CUT)])
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .alias("t")
    )
    hwm_day = (
        load_table(spark, sf_dir, "events", ts_filters=[("ts", "<", _HWM_CUT)])
        .agg(F.max(F.date_trunc("day", F.col("ts"))))
        .first()[0]
    )
    from datetime import timedelta

    # Empty state ⇒ hwm is NULL ⇒ the oracle's `ts >= h.d + INTERVAL 1 DAY`
    # comparison is NULL and admits no fed rows. Mirror that: skip the gate
    # literal and filter the fed side to nothing instead of crashing on
    # None + timedelta.
    if hwm_day is None:
        gate_filters = [("ts", ">=", _FEED_LO)]
    else:
        gate = (hwm_day + timedelta(days=1)).strftime("%Y-%m-%d %H:%M:%S")
        gate_filters = [("ts", ">=", _FEED_LO), ("ts", ">=", gate)]
    fed = (
        load_table(spark, sf_dir, "events", ts_filters=gate_filters)
        .filter(F.lit(hwm_day is not None))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .alias("f")
    )
    return target.join(
        fed, F.col("t.user_id") == F.col("f.user_id"), "full_outer"
    ).select(
        F.coalesce(F.col("t.user_id"), F.col("f.user_id")).alias("user_id"),
        F.coalesce(F.col("t.n"), F.lit(0)).alias("n_before"),
        F.coalesce(F.col("f.n"), F.lit(0)).alias("n_fed"),
        (F.coalesce(F.col("t.n"), F.lit(0)) + F.coalesce(F.col("f.n"), F.lit(0))).alias(
            "n_after"
        ),
        F.lit(hwm_day).cast("timestamp").alias("hwm_day"),
    )
