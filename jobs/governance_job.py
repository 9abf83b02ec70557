"""spark-submit entrypoint running the pre-export governance gate:

    spark-submit --py-files reader_spark.zip jobs/governance_job.py \
        --input /path/to/documents_table --output /path/to/gov \
        [--optout-regex PATTERN]  # doc_id regex marking opted-out copies
        [--k 5]                   # k-anonymity threshold
        [--quasi lang,source]     # quasi-identifier columns
        [--master local[32]] [--deadline 3600]

The three checks an export must pass before it ships, composed from
individually-oracled operators in dependency order:

1. contamination — ops/contamination.synthetic_text_scan: flag docs
   carrying chat-template tokens, AI self-reference boilerplate, or
   refusal strings (model output leaking back into training data).
2. policy        — exact-duplicate clusters (md5 groupBy, min-id
   exemplar convention) + ops/governance.propagate_cluster_policy:
   an opt-out flag on ANY copy purges every copy, so dedup cannot
   launder opted-out text into the export.
3. k-anonymity   — ops/privacy.k_anonymity_summary over the quasi
   columns: exports that would isolate < k rows per combination are
   reported (n_rows_at_risk gates the release).

Outputs: ``<output>/purge_manifest`` (doc_id, reason) parquet and
``<output>/clean`` (the surviving docs). Last stdout line is a JSON
summary with per-stage lineage counts; exit code 4 when the
k-anonymity gate fails (n_rows_at_risk > 0) so schedulers can block
the release while still finding the manifest on disk.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark governance gate")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--optout-regex", default=None)
    parser.add_argument("--k", type=int, default=5)
    parser.add_argument("--quasi", default="lang,source")
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_governance", master=args.master)
    ctl = AbortController(
        spark, "governance", deadline_seconds=args.deadline
    ).install()
    try:
        t0 = time.monotonic()
        from reader_spark.ops.contamination import synthetic_text_scan
        from reader_spark.ops.governance import propagate_cluster_policy
        from reader_spark.ops.privacy import k_anonymity_summary

        docs = spark.read.parquet(args.input)
        n_docs = docs.count()

        scan = synthetic_text_scan(docs).localCheckpoint()
        n_contaminated = scan.where("contaminated").count()

        h = docs.select("doc_id", F.md5("text").alias("__h"))
        members = h.join(
            h.groupBy("__h").agg(F.min("doc_id").alias("cluster_id")), "__h"
        ).select("cluster_id", "doc_id")
        if args.optout_regex:
            flags = docs.select(
                "doc_id",
                F.col("doc_id")
                .cast("string")
                .rlike(args.optout_regex)
                .alias("flagged"),
            )
        else:
            flags = docs.select("doc_id", F.lit(False).alias("flagged"))
        policy = propagate_cluster_policy(members, flags).localCheckpoint()
        n_optout_purged = policy.where("purge").count()

        purge = (
            scan.where("contaminated")
            .select("doc_id", F.lit("contamination").alias("reason"))
            .unionByName(
                policy.where("purge").select(
                    "doc_id", F.lit("optout_cluster").alias("reason")
                )
            )
            .groupBy("doc_id")
            .agg(F.array_sort(F.collect_set("reason")).alias("reasons"))
        )
        purge.write.mode("overwrite").parquet(
            f"{args.output}/purge_manifest"
        )
        n_purged = spark.read.parquet(
            f"{args.output}/purge_manifest"
        ).count()

        clean = docs.join(purge.select("doc_id"), "doc_id", "left_anti")
        clean.write.mode("overwrite").parquet(f"{args.output}/clean")
        n_clean = spark.read.parquet(f"{args.output}/clean").count()

        quasi = [c.strip() for c in args.quasi.split(",") if c.strip()]
        krow = k_anonymity_summary(clean, quasi, k=args.k).head()

        summary = {
            "n_docs": n_docs,
            "n_contaminated": n_contaminated,
            "n_optout_purged": n_optout_purged,
            "n_purged": n_purged,
            "n_clean": n_clean,
            "k": args.k,
            "k_anonymity": {
                "n_groups": krow["n_groups"],
                "n_violating_groups": krow["n_violating_groups"],
                "n_rows_at_risk": krow["n_rows_at_risk"],
                "min_group_size": krow["min_group_size"],
            },
            "wall_s": round(time.monotonic() - t0, 3),
        }
        print(json.dumps(summary))
        return 4 if krow["n_rows_at_risk"] > 0 else 0
    except Exception:
        if ctl.aborted:
            print(json.dumps({"error": ctl.aborted}))
            return 3
        raise
    finally:
        ctl.close()
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
