"""Regenerate the registry's confirmed-key set from CORRECTNESS_r*.json.

The external driver checks roughly the first 50 entries of queries(); the
registry front-loads not-yet-confirmed keys (plans/registry.py). After a
round's CORRECTNESS file lands, run

    python tools/rotate_window.py CORRECTNESS_r01.json CORRECTNESS_r02.json

to print (a) the union of keys with a fully green row (rows+schema+hash,
or a clean rows-only check for oracle-less keys) formatted as the
``_CONFIRMED`` frozenset literal, and (b) which registered keys remain
unconfirmed — front-load those, and re-front-load any key whose
implementation changed since its last green row.
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def green_keys(path: str) -> set[str]:
    out = set()
    for key, row in json.load(open(path)).items():
        if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
            out.add(key)
        elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
            out.add(key)  # rows-only by design (e.g. approx_distinct)
    return out


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: rotate_window.py CORRECTNESS_r*.json ...")
    confirmed: set[str] = set()
    for path in sys.argv[1:]:
        got = green_keys(path)
        print(f"# {path}: {len(got)} green keys")
        confirmed |= got

    from vacancy_analyser_spark.plans.registry import all_specs

    registered = set(all_specs())
    unknown = confirmed - registered
    unconfirmed = sorted(registered - confirmed)
    print(f"# confirmed {len(confirmed & registered)}/{len(registered)} registered keys")
    if unknown:
        print(f"# WARNING: green keys no longer registered: {sorted(unknown)}")
    print(f"# still unconfirmed ({len(unconfirmed)}): {unconfirmed}")
    body = ", ".join(f'"{k}"' for k in sorted(confirmed & registered))
    print("_CONFIRMED = frozenset({")
    print(textwrap.fill(body, width=76, initial_indent="    ", subsequent_indent="    "))
    print("})")


if __name__ == "__main__":
    main()
