"""spark-submit entrypoint for the crawl-refresh lifecycle:

    spark-submit --py-files reader_spark.zip jobs/refresh_job.py \
        --old /path/prev_snapshot --new /path/curr_snapshot \
        --warehouse /path/wh --run-id r7 [--master local[32]]

The recurring production run between full crawls: diff the new snapshot
against the previous one (ops/delta.crawl_delta — digests-only
shuffle), record the per-doc verdicts to a ``refresh_delta`` sidecar
table (downstream consumers tombstone status='removed'), then push ONLY
the added+changed documents through the extraction pipeline
(spark/job.run_extraction: skew handling, resume anti-join, lineage).
Unchanged documents never re-extract — at a typical 5-15% churn rate
that is the difference between a nightly job and an impossible one.

Content equality is md5 over the serialized spans payload, the same
128-bit digest family the dedup stack uses. The delta summary and the
extraction metrics print as ONE JSON line for the scheduler.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark refresh job")
    parser.add_argument("--old", required=True, help="previous docs snapshot")
    parser.add_argument("--new", required=True, help="current docs snapshot")
    parser.add_argument("--warehouse", required=True)
    parser.add_argument("--run-id", required=True)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--partitions", type=int, default=None)
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from reader_spark.ops.delta import ADDED, CHANGED, crawl_delta
    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.io import Warehouse
    from reader_spark.spark.job import run_extraction
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_refresh", master=args.master)
    ctl = AbortController(
        spark, args.run_id, deadline_seconds=args.deadline
    ).install()
    try:
        t0 = time.monotonic()
        try:
            old = spark.read.parquet(args.old)
            new = spark.read.parquet(args.new)

            def digestable(df):
                return df.select(
                    "doc_id", F.to_json(F.col("spans")).alias("content")
                )

            delta = crawl_delta(
                digestable(old), digestable(new), text_col="content"
            )
            warehouse = Warehouse(spark, args.warehouse)
            warehouse.write(
                delta.withColumn("run_id", F.lit(args.run_id)),
                "refresh_delta",
                mode="append",
            )
            committed = warehouse.read("refresh_delta").where(
                F.col("run_id") == args.run_id
            )
            counts = {
                r["status"]: r["n"]
                for r in committed.groupBy("status")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }

            frontier_ids = committed.where(
                F.col("status").isin(ADDED, CHANGED)
            ).select("doc_id")
            work = new.join(frontier_ids, "doc_id")
            metrics = run_extraction(
                spark,
                work,
                warehouse,
                run_id=args.run_id,
                resume=not args.no_resume,
                num_partitions=args.partitions,
            )
        except Exception:
            if ctl.aborted:
                print(json.dumps({"error": ctl.aborted}))
                return 3
            raise
        print(
            json.dumps(
                {
                    "run_id": args.run_id,
                    "delta": {
                        k: counts.get(k, 0)
                        for k in ("added", "changed", "removed", "unchanged")
                    },
                    "extracted": metrics,
                    "wall_s": round(time.monotonic() - t0, 3),
                }
            )
        )
        return 0
    finally:
        ctl.close()
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
