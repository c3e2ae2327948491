"""Self-check harness that mimics the driver's DuckDB-oracle compare.

For every registered query with an oracle: run the Spark DataFrame and the
DuckDB SQL on the same sf dir, then compare row count, column-name schema,
and an order-insensitive value digest. Strict by design — exact equality on
every value (floats included): queries are written so both engines compute
bit-identical numbers (see functions/numeric.py); any drift is a bug here,
not noise to tolerate.

Usage:
    python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys
from decimal import Decimal

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from vacancy_analyser_spark.schemas import TESTDATA_TABLES  # noqa: E402

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_value(v) -> str:
    """Canonical string form of one cell, identical across engines."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)  # full precision — engines must match bitwise
    if isinstance(v, Decimal):
        # The external driver's value hasher rejects decimal-typed output
        # columns (r8: shard_manifest produced value-identical rows yet a
        # red driver hash). This harness must be at least as strict as the
        # driver, so a Decimal reaching a final output cell is a FAILURE
        # here too — cast to BIGINT (counts/fingerprints) or DOUBLE
        # (ratios) on BOTH the Spark and oracle sides before emitting.
        raise TypeError(
            "decimal-typed output cell: the driver hash rejects Decimal; "
            "cast to BIGINT or DOUBLE on both engines"
        )
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_norm_value(x) for x in seq) + "]"
    return str(v)


def digest(df: pd.DataFrame) -> tuple[int, tuple[str, ...], list[tuple[str, ...]]]:
    """(row_count, sorted column names, sorted normalized rows)."""
    cols = sorted(df.columns)
    out = df[cols] if cols else df
    rows = sorted(tuple(_norm_value(v) for v in row) for row in out.itertuples(index=False, name=None))
    return len(df), tuple(cols), rows


def compare_query(spark, con, name: str, fn, sql: str, sf_dir: str) -> dict:
    spark_pd = fn(spark, sf_dir).toPandas()
    duck_pd = con.execute(sql).fetchdf()
    n_s, cols_s, rows_s = digest(spark_pd)
    n_d, cols_d, rows_d = digest(duck_pd)
    result = {
        "name": name,
        "rows_spark": n_s,
        "rows_duck": n_d,
        "cols_match": cols_s == cols_d,
        "rows_match": rows_s == rows_d,
    }
    if not result["cols_match"]:
        result["cols"] = {"spark": cols_s, "duck": cols_d}
    elif not result["rows_match"]:
        diff_s = [r for r in rows_s if r not in set(rows_d)][:3]
        diff_d = [r for r in rows_d if r not in set(rows_s)][:3]
        result["sample_only_spark"] = diff_s
        result["sample_only_duck"] = diff_d
    result["ok"] = result["cols_match"] and result["rows_match"] and n_s == n_d
    return result


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    only = set(sys.argv[2:])

    from vacancy_analyser_spark.plans import all_specs
    from vacancy_analyser_spark.session import get_spark

    if os.environ.get("PARITY_VANILLA"):
        # The driver's environment: a stock SparkSession with none of the
        # repo session's configs (200 shuffle partitions, no AQE tuning).
        # Queries must pass under ANY partitioning — this is the sweep
        # that catches partition-sensitive contract bugs.
        from pyspark.sql import SparkSession

        # timeZone is pinned because the axis under test is PARTITIONING:
        # the driver's host runs UTC, so a stock session there resolves
        # date_trunc/to_date in UTC; on a non-UTC dev host the same stock
        # session would shift day boundaries and drown the sweep in
        # timezone noise unrelated to the driver environment.
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
    else:
        spark = get_spark("parity-check", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    specs = all_specs()
    failures = []
    checked = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        checked += 1
        if spec.oracle is None:
            try:
                n = spec.fn(spark, sf_dir).count()
                print(f"  {name:<28} rows-only ({n} rows)")
            except Exception as e:  # noqa: BLE001
                print(f"✗ {name:<28} ERROR: {type(e).__name__}: {e}")
                failures.append(name)
            continue
        try:
            r = compare_query(spark, con, name, spec.fn, spec.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name:<28} ERROR: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        mark = "✓" if r["ok"] else "✗"
        print(f"{mark} {name:<28} spark={r['rows_spark']} duck={r['rows_duck']}")
        if not r["ok"]:
            failures.append(name)
            for k in ("cols", "sample_only_spark", "sample_only_duck"):
                if k in r:
                    print(f"    {k}: {r[k]}")
    print(f"\n{checked - len(failures)}/{checked} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
