"""Command-line surface: the scriptable twin of workspace.py, for the
reference's script-oriented users (every reference component is `python3
somescript.py`; this gives the engine the same ergonomics):

    python -m vacancy_analyser_spark list
    python -m vacancy_analyser_spark run skill_freq /root/testdata/sf0.01
    python -m vacancy_analyser_spark sql "SELECT lang, count(*) FROM documents GROUP BY lang" /root/testdata/sf0.01

`run` resolves the same registry the driver grades; `sql` binds the
testdata tables as views first. Output is `show()` (up to --limit rows) on
stdout; Spark noise stays on stderr.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m vacancy_analyser_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="catalog of registered operators")
    p_list.add_argument("--tag", help="filter by tag substring")

    p_run = sub.add_parser("run", help="run one registered operator")
    p_run.add_argument("query")
    p_run.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)

    p_sql = sub.add_parser("sql", help="ad-hoc SQL over the bound tables")
    p_sql.add_argument("statement")
    p_sql.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    p_sql.add_argument("--limit", type=int, default=20)

    args = ap.parse_args(argv)

    if args.cmd == "list":
        from .plans import all_specs

        for name, spec in sorted(all_specs().items()):
            if args.tag and not any(args.tag in t for t in spec.tags):
                continue
            first = spec.doc.splitlines()[0] if spec.doc else ""
            print(f"{name:<32} {first}")
        return 0

    from .session import get_spark
    from .workspace import bind, run

    spark = get_spark("vacancy-analyser-cli")
    if args.cmd == "run":
        df = run(spark, args.sf_dir, args.query)
    else:
        bind(spark, args.sf_dir)
        df = spark.sql(args.statement)
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
