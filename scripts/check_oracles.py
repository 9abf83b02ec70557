"""Local replica of the driver's correctness gate: run each queries() entry
on Spark at sf0.01 and its oracle_sql() in DuckDB, compare row count, schema
arity, and order-insensitive values (columns sorted by name, rows sorted).

Usage: python scripts/check_oracles.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from reader_spark.spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Driver-hash HUGEINT trap (bit in r1 and r4): the round driver hashes
# the *serialized* value, so a DuckDB HUGEINT column (what un-cast
# sum(<integer>) types as, plain or windowed) hash-fails even when every
# value is equal — our value-level compare below stays green and masks
# it.  So the gate type-checks every paired column: HUGEINT (or an
# integer paired with a non-integer) is fatal.  Same-family width skew
# (Spark INT vs DuckDB BIGINT) is driver-proven harmless (e.g.
# curation_shortlist was hash-green in r4 with token_count int/BIGINT),
# so it only warns.
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}


def type_trap(spark_fields, duck_cols, duck_types):
    """Return (fatal, warn) lists of (col, spark_type, duck_type)."""
    spark_by_name = {f.name: f.dataType.simpleString() for f in spark_fields}
    fatal, warn = [], []
    for col, dtype in zip(duck_cols, (str(t).upper() for t in duck_types)):
        stype = spark_by_name.get(col, "")
        if dtype in ("HUGEINT", "UHUGEINT"):
            fatal.append((col, stype, dtype))
        elif (dtype in _DUCK_INT) != (stype in _SPARK_INT):
            # integer on one side only (e.g. DuckDB DECIMAL vs Spark long)
            fatal.append((col, stype, dtype))
        elif dtype in _DUCK_INT and stype in _SPARK_INT and (
            (dtype == "BIGINT") != (stype == "bigint")
        ):
            warn.append((col, stype, dtype))
    return fatal, warn


def norm(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return round(value, 6)
    if hasattr(value, "isoformat"):
        return value.isoformat()
    return value


def norm_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        (tuple(norm(row[i]) for i in order) for row in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def main() -> int:
    # Accept names positionally, via --only, and/or comma-separated. Any
    # name that matches NO registry entry is a hard error: a typo'd
    # selection that silently checks nothing prints a vacuous ALL OK —
    # exactly the stale-green-claim failure mode this script exists to
    # prevent (it bit once: "--only a,b" matched nothing and passed).
    raw = [t for a in sys.argv[1:] if a != "--only" for t in a.split(",") if t]
    only = set(raw)
    unknown = only - set(entrymod.queries())
    if unknown:
        print(f"FAIL  unknown query names: {sorted(unknown)}")
        return 2
    spark = get_spark("oracle_check", master="local[8]")
    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM '{SF_DIR}/{table}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    checked = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        checked += 1
        try:
            sdf = fn(spark, SF_DIR)
            spark_rows = sdf.collect()
            spark_cols = sdf.columns
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(spark_cols)} vs {sorted(duck_cols)}")
            continue
        fatal, warn = type_trap(sdf.schema.fields, duck_cols, rel.types)
        if warn:
            print(f"warn  {name}: int-width skew (harmless to driver) {warn}")
        if fatal:
            failures.append(name)
            print(f"FAIL  {name}: driver-hash HUGEINT trap {fatal}")
            continue
        s = norm_rows(spark_cols, [tuple(r) for r in spark_rows])
        d = norm_rows(duck_cols, duck_rows)
        if len(s) != len(d):
            failures.append(name)
            print(f"FAIL  {name}: row count {len(s)} vs {len(d)}")
            continue
        if s != d:
            failures.append(name)
            diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            continue
        print(f"OK    {name}: {len(s)} rows match")
    spark.stop()
    if checked == 0:
        print("\nFAIL: selection matched zero queries")
        return 2
    verdict = f"ALL OK ({checked} checked)" if not failures else f"FAILURES: {failures}"
    print("\n" + verdict)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
