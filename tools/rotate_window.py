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


# Keys allowed to count as confirmed on a rows-only check. Everything else
# needs a full rows+schema+hash pass: "the query returned rows" is zero
# correctness evidence, and auto-confirming it would rotate the key out of
# all future driver checks. Additions here are a reviewed decision.
# (Empty since r4: approx_distinct was rewritten as an error-bound query —
# exact NDV + |HLL−exact| ≤ 4·rsd·exact booleans — with a full oracle.)
ROWS_ONLY_ALLOWLIST = frozenset()


def green_keys(path: str) -> set[str]:
    out = set()
    rows_only_seen: list[str] = []
    for key, row in json.load(open(path)).items():
        if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
            out.add(key)
        elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
            rows_only_seen.append(key)
            if key in ROWS_ONLY_ALLOWLIST:
                out.add(key)
    if rows_only_seen:
        allowed = sorted(k for k in rows_only_seen if k in ROWS_ONLY_ALLOWLIST)
        denied = sorted(k for k in rows_only_seen if k not in ROWS_ONLY_ALLOWLIST)
        print(f"# {path}: rows-only keys confirmed via allowlist: {allowed}")
        if denied:
            print(f"# {path}: rows-only keys NOT confirmed (no allowlist entry): {denied}")
    return out


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(
            "usage: rotate_window.py [--drop key1,key2] CORRECTNESS_r*.json ...\n"
            "  --drop: keys whose implementation changed since their green row —\n"
            "          a driver pass belongs to the code that earned it, so a\n"
            "          rewritten key must re-enter the unconfirmed window."
        )
    argv = sys.argv[1:]
    dropped: set[str] = set()
    if argv and argv[0] == "--drop":
        dropped = set(argv[1].split(","))
        argv = argv[2:]
    confirmed: set[str] = set()
    for path in argv:
        got = green_keys(path)
        print(f"# {path}: {len(got)} green keys")
        confirmed |= got
    if dropped:
        print(f"# dropped as rewritten-since-pass: {sorted(confirmed & dropped)}")
        confirmed -= dropped

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
