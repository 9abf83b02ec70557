"""spark-submit entrypoint for crawl scheduling:

    spark-submit --py-files reader_spark.zip jobs/schedule_job.py \
        --sitemaps /path/sitemap_files --history /path/crawl_history \
        --warehouse /path/wh --run-id s1 --as-of 2026-06-15 [--top 100000]

The frontier-planning run between crawls: parse fetched sitemap XML
(ops/sitemaps.parse_sitemaps — urlset leaves AND sitemapindex rows, so
the job also emits the child sitemaps still to fetch), estimate per-URL
change rates from the crawl delta history (ops/delta.change_rate, Cho &
Garcia-Molina 2003), and combine them into a recrawl schedule
(ops/sitemaps.recrawl_schedule: observation > publisher hint > default).
Due URLs are ranked (priority desc, staleness desc) and capped with a
distributed TakeOrdered top-K — never a global window — into the
``crawl_frontier`` table; child sitemaps land in ``sitemap_frontier``;
per-stage counts go to ``schedule_lineage``. One JSON line for the
scheduler.

``--as-of`` is mandatory: schedules must replay, so "now" is an
argument, not a clock read.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark schedule job")
    parser.add_argument("--sitemaps", required=True,
                        help="parquet of (sitemap_url, xml) fetched files")
    parser.add_argument("--history", default=None,
                        help="parquet of (url, round, status) crawl deltas")
    parser.add_argument("--robots", default=None,
                        help="parquet of (host, content) robots.txt files")
    parser.add_argument("--as-of", required=True, dest="as_of")
    parser.add_argument("--warehouse", required=True)
    parser.add_argument("--run-id", required=True)
    parser.add_argument("--top", type=int, default=100000)
    parser.add_argument("--default-hours", type=int, default=168)
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from reader_spark.ops.delta import change_rate
    from reader_spark.ops.sitemaps import parse_sitemaps, recrawl_schedule
    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.io import Warehouse
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_schedule", master=args.master)
    ctl = AbortController(
        spark, args.run_id, deadline_seconds=args.deadline
    ).install()
    try:
        t0 = time.monotonic()
        try:
            files = spark.read.parquet(args.sitemaps)
            parsed = parse_sitemaps(files).localCheckpoint()
            entries = parsed.where(
                (F.col("kind") == "url") & F.col("loc").isNotNull()
            )
            children = parsed.where(
                (F.col("kind") == "sitemap") & F.col("loc").isNotNull()
            )

            rates = None
            if args.history:
                hist = spark.read.parquet(args.history)
                rates = change_rate(hist, id_col="url").select(
                    F.col("url").alias("loc"), "rate_cho"
                )

            sched = recrawl_schedule(
                entries,
                as_of=args.as_of,
                rates=rates,
                default_hours=args.default_hours,
            )
            due = sched.where(F.col("is_due") == 1)
            # distributed top-K (TakeOrderedAndProject), never a window:
            # most-important first = priority desc, stalest first within
            frontier = due.orderBy(
                F.desc("priority_milli"),
                F.desc_nulls_first("days_since"),
                F.asc("loc"),
            ).limit(args.top)

            warehouse = Warehouse(spark, args.warehouse)
            rid = F.lit(args.run_id)
            warehouse.write(
                frontier.withColumn("run_id", rid), "crawl_frontier"
            )
            warehouse.write(
                children.select("sitemap_url", "loc", "lastmod")
                .withColumn("run_id", rid),
                "sitemap_frontier",
            )

            max_makespan_ms = None
            if args.robots:
                from reader_spark.ops.robotstxt import (
                    robots_host_dim,
                    robots_parse,
                )
                from reader_spark.ops.sitemaps import politeness_slots

                dims = robots_host_dim(
                    robots_parse(spark.read.parquet(args.robots))
                ).select("host", "crawl_delay_ms")
                hosted = warehouse.read("crawl_frontier").where(
                    F.col("run_id") == args.run_id
                ).withColumn(
                    "host", F.regexp_extract(F.col("loc"), "://([^/]+)", 1)
                )
                slots = politeness_slots(hosted, dims)
                warehouse.write(
                    slots.withColumn("run_id", rid), "fetch_slots"
                )
                max_makespan_ms = (
                    slots.agg(F.max("host_makespan_ms")).head()[0]
                )

            n_entries = entries.count()
            n_due = due.count()
            n_frontier = warehouse.read("crawl_frontier").where(
                F.col("run_id") == args.run_id
            ).count()
            n_children = children.count()
            n_observed = (
                sched.where(F.col("hours_obs").isNotNull()).count()
            )
            lineage = {
                "run_id": args.run_id,
                "as_of": args.as_of,
                "n_url_entries": n_entries,
                "n_index_entries": n_children,
                "n_with_observation": n_observed,
                "n_due": n_due,
                "n_frontier": n_frontier,
                "top": args.top,
            }
            if max_makespan_ms is not None:
                lineage["max_host_makespan_ms"] = max_makespan_ms
            warehouse.write(
                spark.createDataFrame([lineage]), "schedule_lineage"
            )
        except Exception:
            if ctl.aborted:
                print(json.dumps({"error": ctl.aborted}))
                return 3
            raise
        lineage["wall_s"] = round(time.monotonic() - t0, 3)
        print(json.dumps(lineage))
        return 0
    finally:
        ctl.close()
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
