"""Determinism gate: every queries() entry must return value-identical
results on repeated runs (fresh plans, same session) — unstable orderings
feeding limit cuts, race-prone aggregations, or driver-side randomness
would all surface here as run-to-run diffs.

Usage: python scripts/check_determinism.py [query ...]   (default: all)
Runs at sf0.001 for speed; streaming-only helpers are exercised through
their batch query form like everywhere else in the driver contract.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from reader_spark.spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def normalize(df):
    cols = sorted(df.columns)
    rows = [tuple(row[c] for c in cols) for row in df.collect()]
    # repr-keyed sort: None-safe and type-stable (we only need a stable
    # comparable order for equality, not a semantic one)
    return sorted(rows, key=repr)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("determinism_check")
    failures = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            first = normalize(fn(spark, SF_DIR))
            second = normalize(fn(spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"ERR   {name}: {str(exc)[:120]}")
            continue
        if first == second:
            print(f"OK    {name}: {len(first)} rows stable")
        else:
            failures.append(name)
            diff = [
                (a, b) for a, b in zip(first, second) if a != b
            ][:2]
            print(f"FAIL  {name}: run-to-run diff, e.g. {diff}")
    print(f"\n{'FAILURES: ' + str(failures) if failures else 'ALL DETERMINISTIC'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
