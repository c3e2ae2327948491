"""Dump executed physical plans for registered queries.

Usage:
    python tools/explain.py [sf_dir] [query ...]      # default: headline set

Each query is executed via collect() FIRST — through the Dataset's own
QueryExecution — so AQE finalizes its runtime decisions (broadcast
promotion, partition coalescing) on the plan that gets printed. (A sink
write would run a separate QueryExecution and leave the Dataset's plan at
isFinalPlan=false: the static, pre-AQE strategy — probed.) This is the
tool behind PLANS.md — rerun it after changing a query and diff the
shapes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    from bench import HEADLINE
    from vacancy_analyser_spark.plans import queries
    from vacancy_analyser_spark.session import get_spark

    spark = get_spark("explain-audit")
    qs = queries()
    for name in names or HEADLINE:
        df = qs[name](spark, sf_dir)
        df.collect()
        print(f"===== {name} =====")
        print(df._jdf.queryExecution().executedPlan().toString())


if __name__ == "__main__":
    main()
