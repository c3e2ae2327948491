"""Dump `.explain("formatted")` (+ the AQE-final executed plan) per query
into per-query files — the r12 optimization round's plan evidence.

Usage:
    python tools/plan_dump.py OUTDIR SUFFIX [sf_dir] [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt containing:
  1. the static `explain("formatted")` output (PushedFilters / ReadSchema /
     codegen spans — what the optimizer promises before AQE), and
  2. the executed physical plan after a real collect() (what AQE actually
     ran: final join strategies, coalesced exchanges).

Unlike tools/explain.py (stdout, PLANS.md source), this writes one file per
query so before/after diffs are reviewable per plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    names = rest[1:] if rest and os.path.isdir(rest[0]) else rest

    from bench import HEADLINE
    from vacancy_analyser_spark.plans import queries
    from vacancy_analyser_spark.session import get_spark

    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-dump")
    qs = queries()
    for name in names or HEADLINE:
        df = qs[name](spark, sf_dir)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} @ {sf_dir} ==\n\n")
            fh.write("---- explain(formatted) ----\n")
            fh.write(formatted)
            fh.write("\n---- executed plan (AQE final) ----\n")
            fh.write(executed)
            fh.write("\n")
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
