"""Re-pin the ext regression gates from fresh min-of-N timings (r11
verdict item 1: the 12 r11 gate breaches all traced to single-sample
pins recorded under a different host state — a gate firing on pin error
is noise, and noise hides the two REAL defects the round found).

Runs every named key at $SPARK_GRAFT_SF_DIR (sf0.1 — the scale the pins
are defined at) with the bench's exact protocol (same session factory,
clearCache between runs, noop sink, min as the estimator): min-of-2 for
the cohort, min-of-3 for keys breached in the previous round (their old
pins are the ones being adjudicated, so they get the extra sample).
Prints one JSON object {key: sec} to paste into bench.py
EXT_BASELINE_R12. Keys with a BENCH_VARIANTS production variant are
timed through the variant, matching what the bench will time.

Usage:  python tools/repin.py [key ...]     (default: the full r12 set)
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (EXT_BASELINE_* blocks + BENCH_VARIANTS)

#: The r11 breach set — min-of-3.
BREACHED = frozenset(
    {
        "approx_distinct",
        "repetition_ngram_ratio",
        "dedup_keep_best",
        "nation_trade_volume",
        "small_qty_revenue",
        "pq_encode",
        "potential_part_promotion",
        "simhash",
        "order_priority_check",
        "semantic_tau_sweep",
        "dataset_card_stats",
        "filtered_ann_topk",
    }
)

#: The r11 cold cohort graduating into the gated block this round.
R11_COLD_GRADS = (
    "ann_global_retrain",
    "ann_retrain_serve_topk",
    "ann_ivf2_index_delete_lookup",
    "ann_split_index_delete_lookup",
    "ann_lookup_compact",
    "state_store_compact",
    "ann_ivf2_global_retrain",
    "ann_stream_delete_ivf2",
    "ann_apply_log_replay",
    "ann_apply_log_ivf2",
)


def default_keys() -> list[str]:
    ks = (
        list(bench.EXT_BASELINE_R11_DEFER_GRAD)
        + list(bench.EXT_BASELINE_R11_COLD)
        + list(R11_COLD_GRADS)
        + sorted(BREACHED)
    )
    seen: set[str] = set()
    return [k for k in ks if not (k in seen or seen.add(k))]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from vacancy_analyser_spark.plans import queries
    from vacancy_analyser_spark.session import get_spark

    spark = get_spark("vacancy-analyser-repin")
    qs = queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    keys = sys.argv[1:] or default_keys()
    pins: dict[str, float] = {}
    for name in keys:
        if name in bench.BENCH_VARIANTS:
            _tag, mod, attr = bench.BENCH_VARIANTS[name]
            fn = getattr(importlib.import_module(mod), attr)
        else:
            fn = qs[name]
        n = 3 if name in BREACHED else 2
        runs: list[float] = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        pins[name] = round(min(runs), 3)
        print(f"  {name}: {pins[name]} {[round(r, 3) for r in runs]}", file=sys.stderr)
    print(json.dumps(pins, indent=1))


if __name__ == "__main__":
    main()
