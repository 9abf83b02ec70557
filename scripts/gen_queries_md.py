"""Regenerate QUERIES.md from the driver contract.

Usage: python scripts/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    qs, oracles = entry.queries(), entry.oracle_sql()
    lines = [
        "# QUERIES — driver-contract index",
        "",
        "Auto-generated (`python scripts/gen_queries_md.py`) from",
        "`__spark_entry__.py`: every `queries()` entry; oracle = value-level",
        "DuckDB comparison at sf0.01 via `scripts/check_oracles.py`.",
        "",
        f"**{len(qs)} queries, {len(oracles)} oracle-checked.** Rows-only",
        "entries are hash-sketch production twins of oracle-checked md5",
        "variants, or fixture-driven paths pinned by golden pytest assertions.",
        "",
        "| query | oracle | what |",
        "|---|---|---|",
    ]
    for name, fn in qs.items():
        doc = (fn.__doc__ or "").strip().split("\n")[0].rstrip(".")
        mark = "✓" if name in oracles else "rows-only"
        lines.append(f"| `{name}` | {mark} | {doc} |")
    with open(os.path.join(REPO, "QUERIES.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {len(qs)} queries, {len(oracles)} oracles")


if __name__ == "__main__":
    main()
