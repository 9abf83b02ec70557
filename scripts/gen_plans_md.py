"""Generate docs/PLANS.md: formatted physical plans of headline queries,
with the scale-relevant properties called out per plan.

    python scripts/gen_plans_md.py

The point is reviewable evidence that each operator compiles to the plan
you'd WANT at 100 TB — pushed filters, pruned scans, broadcast dims,
key-bounded exchanges, no cartesian products — not just a plan that
happens to pass tests at sf0.01.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

# query -> the property the reader should check in the plan
HEADLINE = {
    "extract_documents_spans": "one fused ArrowEvalPython (the single "
    "sanctioned Python boundary); scan -> JVM payload assembly -> UDF -> "
    "project, no shuffle before the Python stage",
    "pricing_summary": "partial_ aggregates before the exchange (map-side "
    "combine); scan reads only the aggregated columns (ReadSchema)",
    "top_revenue_orders": "BroadcastHashJoin on the dim side, TakeOrderedAndProject "
    "instead of a global Sort",
    "dedup_exact": "hash-partitioned exchange on the 64-bit content hash only",
    "minhash_lsh_candidates": "equi-join on (band_id, band_hash) — no "
    "CartesianProduct anywhere",
    "semdedup": "cell equi-join (SortMergeJoin/ShuffledHashJoin on cell), "
    "never BroadcastNestedLoopJoin",
    "dsir_weights": "256-row model dim enters scoring as BroadcastHashJoin",
    "quality_logit": "no Exchange, no Python — whole plan is scan + project "
    "(WholeStageCodegen)",
    "winnow_fingerprints": "window partitioned by doc (hashpartitioning), "
    "no SinglePartition exchange",
    "asof_clicks": "ONE exchange: union + window merge, not a join cascade",
    "numeric_profile": "exact percentile twin — the approx production path "
    "(numeric_profile(exact=False)) compiles without Sort",
    "graph_triangles": "three equi-joins on node keys; no cartesian",
}


def main() -> int:
    from reader_spark.spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("gen_plans", master="local[4]")
    qs = entrymod.queries()
    out = [
        "# PLANS — physical-plan audit of headline operators",
        "",
        "Auto-generated (`python scripts/gen_plans_md.py`) at sf0.001.",
        "Each section states the scale property the plan must show, then the",
        "formatted plan tree (detail codegen sections trimmed). The pinned",
        "assertions live in tests/test_plans.py; this file is the readable",
        "evidence.",
        "",
    ]
    for name, claim in HEADLINE.items():
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        # strip per-node ids' trailing whitespace noise
        tree = "\n".join(line.rstrip() for line in tree.splitlines())
        out += [f"## {name}", "", f"**Must show:** {claim}", "", "```"]
        out += [tree, "```", ""]
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    n = len(HEADLINE)
    print(f"docs/PLANS.md: {n} plans")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
