"""×30 exact-tier probe: count-join vs PPJoin on the constant-density
surrogate (PERTURB=all — the regime the r5 ×30 probe measured at 2.0× of
linear for both exact tiers, PLANS.md "r5 late probe").

Measures, at ×1 (sf0.1 base) and ×REPLICAS, each sparse exact plan
DIRECTLY (no dispatcher) over one persisted shingle table:

- _jaccard_countjoin / _jaccard_ppjoin
- _containment_countjoin / _containment_ppjoin
- _jaccard_countjoin with shuffle.partitions temporarily raised ×8
  (isolates whether the ×30 superlinearity is partition starvation —
  30× rows through 32 sort buckets — rather than candidate volume)

Output: one JSON line with per-plan {base_sec, scaled_sec, vs_linear}.
Informs the corpus-mass branch of plans.dedup._sparse_plan_for.

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

    plans = {
        "jaccard_countjoin": dedup._jaccard_countjoin,
        "jaccard_ppjoin": dedup._jaccard_ppjoin,
        "containment_countjoin": dedup._containment_countjoin,
        "containment_ppjoin": dedup._containment_ppjoin,
    }

    for sf_label, sf_dir, n_runs in (("base", BASE_SF, 2), ("scaled", stress_dir, 1)):
        g = dedup._doc_bigrams(spark, sf_dir).persist()
        g.count()
        for name, plan in plans.items():
            best = min(_run_once(plan, g) for _ in range(n_runs))
            report.setdefault(name, {})[f"{sf_label}_sec"] = best
            print(f"# {name} {sf_label}: {best}s", file=sys.stderr, flush=True)
        # partition-starvation isolate: same count-join, 8× sort buckets
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(int(prev) * 8))
        try:
            best = min(_run_once(dedup._jaccard_countjoin, g) for _ in range(n_runs))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        report.setdefault("jaccard_countjoin_8x_parts", {})[f"{sf_label}_sec"] = best
        print(f"# countjoin_8x_parts {sf_label}: {best}s", file=sys.stderr, flush=True)
        g.unpersist()

    for name, row in report.items():
        if isinstance(row, dict) and "base_sec" in row and "scaled_sec" in row:
            row["vs_linear"] = round(row["scaled_sec"] / (REPLICAS * row["base_sec"]), 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
