"""Relational-spine scale-stress: the join/agg counterpart of
tools/scale_stress.py (testdata ships no sf1, so the 10× corpus is a
deterministic surrogate).

Builds ×REPLICAS copies of lineitem/orders/customer with replica-shifted
keys (key + r·10⁹ — joins stay consistent WITHIN a replica, never across,
so join fan-out and group counts scale exactly ×N) and measures the
headline relational queries at ×1 vs ×N:

- pricing_summary  — scan + partial agg: the purest near-linearity probe.
- star_join_3way   — fact⋈fact⋈dims: does AQE keep the right join
  strategy when orders outgrows the broadcast threshold?
- flagship_region_share — the full spine (two fact joins, dims, windowed
  share over the aggregate).

nation/region stay unreplicated (true dimensions — every replica shares
them, exactly like production). Run:

    python tools/relational_stress.py 2>/dev/null
    REPLICAS=4 python tools/relational_stress.py 2>/dev/null
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("REPLICAS", "10"))
STRESS_DIR = os.environ.get("STRESS_DIR", "/tmp/relational_stress")
QUERIES = ("pricing_summary", "star_join_3way", "flagship_region_share")
SHIFT = 1_000_000_000
#: key columns to replica-shift per table; other columns copy through.
KEYED = {
    "lineitem": ("l_orderkey", "l_suppkey", "l_partkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
}
UNREPLICATED = ("nation", "region", "events", "documents", "embeddings")


def build(spark) -> str:
    out = os.path.join(STRESS_DIR, f"x{REPLICAS}")
    # completeness marker written LAST (a per-table _SUCCESS would declare
    # an interrupted build complete); staleness vs the base corpus rides
    # the same mtime check the engine's materializations use
    from vacancy_analyser_spark.io import materialization_is_fresh

    done = os.path.join(out, "_BUILD_DONE")
    if os.path.exists(done) and materialization_is_fresh(
        os.path.join(out, "lineitem.parquet"), os.path.join(BASE_SF, "lineitem.parquet")
    ):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    reps = spark.range(REPLICAS).select(F.col("id").cast("long").alias("_r"))
    for table, keys in KEYED.items():
        src = spark.read.parquet(os.path.join(BASE_SF, f"{table}.parquet"))
        scaled = src.crossJoin(F.broadcast(reps)).select(
            *[
                (F.col(c) + F.col("_r") * SHIFT).alias(c) if c in keys else F.col(c)
                for c in src.columns
            ]
        )
        scaled.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{table}.parquet")
        )
    for table in UNREPLICATED:
        src_path = os.path.join(BASE_SF, f"{table}.parquet")
        if os.path.exists(src_path):
            spark.read.parquet(src_path).write.mode("overwrite").parquet(
                os.path.join(out, f"{table}.parquet")
            )
    with open(os.path.join(out, "_BUILD_DONE"), "w") as fh:
        fh.write("")
    return out


def run(spark, qs, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def collect(spark) -> dict:
    """The stress report as a dict — importable by bench.py (see
    scale_stress.collect)."""
    from vacancy_analyser_spark.plans.registry import queries

    qs = queries()
    stress_dir = build(spark)

    report: dict[str, object] = {"replicas": REPLICAS}
    for q in QUERIES:
        base = run(spark, qs, q, BASE_SF)
        scaled = run(spark, qs, q, stress_dir)
        ratio = scaled / (REPLICAS * base)
        report[q] = {
            "base_sec": base,
            "scaled_sec": scaled,
            "vs_linear": round(ratio, 2),
            "within_2x_linear": ratio <= 2.0,
        }
    # plan-choice probe: what join strategy does AQE pick for
    # lineitem⋈orders at the scaled size, and does it flip to sort-merge
    # when the broadcast budget shrinks below the orders side (the
    # graceful-degradation contract — no hint is hard-coded on orders)?
    def star_plan() -> str:
        df = qs["star_join_3way"](spark, stress_dir)
        # execute through the Dataset's OWN QueryExecution (collect, not a
        # noop write — the write spawns a separate execution and the
        # Dataset's plan would still read `isFinalPlan=false` with the
        # static pre-AQE strategy); output is aggregate-sized
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # keep only the final section — the string appends "== Initial
        # Plan ==", which would double every operator count
        return plan.split("== Initial Plan ==")[0]

    plan = star_plan()
    default_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1 * 1024 * 1024))
    try:
        tight = star_plan()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", default_threshold)
    report["star_join_scaled_plan"] = {
        "sort_merge_join": "SortMergeJoin" in plan,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "smj_under_1mb_budget": "SortMergeJoin" in tight,
        "dims_still_broadcast_under_1mb": tight.count("BroadcastHashJoin"),
    }
    return report


def main() -> None:
    from vacancy_analyser_spark.session import get_spark

    print(json.dumps(collect(get_spark("relational-stress"))))


if __name__ == "__main__":
    main()
