"""×30 exact-tier probe, round 2 (quiet host, one config at a time).

Round-1 findings (2026-08-15, contended host — relative signal only):
- _jaccard_ppjoin at ×30 (PERTURB=all) DIED ON DISK: its verification
  stage joins candidate pairs to the full shingle table on a_id alone —
  a fan-out of |cand|·n̄ rows — and at ×30 that wrote >60 GB of shuffle
  temp before ENOSPC. PPJoin is the frequent-HEAD regime's plan (where
  it never *builds* head candidates); it is NOT the constant-density
  scale fix, and the dispatcher must not send big uniform corpora to it.
- ppjoin base (sf0.1) ≈ 2× countjoin base — consistent with r1/r5
  measurements (rank window + df join overhead with no head to prune).

Remaining hypothesis for the count-join's 2.0×-of-linear drift at ×30
(PLANS.md "r5 late probe"): SHUFFLE-WIDTH starvation — 30× the rows
through the same 32 sort buckets turns in-memory hash aggregation into
multi-pass spill. This probe measures the same plan at 32 vs 256
shuffle partitions, base and ×30.

Run:  REPLICAS=30 python tools/x30_probe.py 2>/dev/null
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scale_stress  # noqa: E402  (tools/ sibling)

REPLICAS = int(os.environ.get("REPLICAS", "30"))
BASE_SF = scale_stress.BASE_SF
WIDTHS = tuple(int(w) for w in os.environ.get("WIDTHS", "32,256").split(","))


def _run_once(plan, g) -> float:
    t0 = time.monotonic()
    plan(g).write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 2)


def main() -> None:
    os.environ["REPLICAS"] = str(REPLICAS)
    scale_stress.REPLICAS = REPLICAS

    from vacancy_analyser_spark.plans import dedup
    from vacancy_analyser_spark.session import get_spark

    spark = get_spark("x30-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    stress_dir = scale_stress.build_corpus(spark)
    report: dict[str, object] = {"replicas": REPLICAS}

    for sf_label, sf_dir, n_runs in (("base", BASE_SF, 2), ("scaled", stress_dir, 1)):
        g = dedup._doc_bigrams(spark, sf_dir).persist()
        g.count()
        for width in WIDTHS:
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", str(width))
            try:
                best = min(_run_once(dedup._jaccard_countjoin, g) for _ in range(n_runs))
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
            report.setdefault(f"countjoin_w{width}", {})[f"{sf_label}_sec"] = best
            print(f"# countjoin_w{width} {sf_label}: {best}s", file=sys.stderr, flush=True)
        g.unpersist()

    for name, row in report.items():
        if isinstance(row, dict) and "base_sec" in row and "scaled_sec" in row:
            row["vs_linear"] = round(row["scaled_sec"] / (REPLICAS * row["base_sec"]), 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
