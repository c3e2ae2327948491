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
