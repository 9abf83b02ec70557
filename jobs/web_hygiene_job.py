"""spark-submit entrypoint for web-graph hygiene: one pass that turns a
raw crawl page table into an index-ready page set with the standard
web-lifecycle gates applied:

    spark-submit --py-files reader_spark.zip jobs/web_hygiene_job.py \
        --pages /path/to/pages_table --warehouse /path/to/wh \
        [--shards 4] [--master local[32]] [--deadline 3600]

Input `pages` schema: (url, host, robots, canonical) — host the page's
hostname, robots the raw <meta name=robots> content (nullable),
canonical the raw rel=canonical href (nullable, may chain or cycle).

Stages (each individually oracle-certified in the registry):
1. **PLD assignment** (ops/psl.registrable_domain) — per-domain stats
   key on the registrable domain, not the raw host.
2. **robots meta gate** (ops/robotstxt.robots_meta_gate) — noindex
   pages drop out of the index-side table (they stay in the report).
3. **canonical resolution** (ops/canonical.resolve_canonical_chains) —
   chains resolve to terminals, cycles surface flagged.
4. **LPT shard plan** (ops/lpt.lpt_shard_assignment) — the indexable
   pages' PLD masses balanced over --shards.

Writes `page_hygiene` (url, host, registrable_domain, indexable,
noindex, nofollow, canonical_url, canonical_status, canonical_depth),
`pld_shards` (registrable_domain, size, shard, load_after) and a
`hygiene_lineage` row; the last stdout line is the summary JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark web hygiene")
    parser.add_argument("--pages", required=True)
    parser.add_argument("--warehouse", required=True)
    parser.add_argument("--shards", type=int, default=4)
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.io import Warehouse
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_web_hygiene", master=args.master)
    ctl = AbortController(
        spark, "web_hygiene", deadline_seconds=args.deadline
    ).install()
    try:
        t0 = time.monotonic()
        try:
            from reader_spark.ops.canonical import resolve_canonical_chains
            from reader_spark.ops.lpt import lpt_shard_assignment
            from reader_spark.ops.psl import registrable_domain
            from reader_spark.ops.robotstxt import robots_meta_gate

            warehouse = Warehouse(spark, args.warehouse)
            pages = spark.read.parquet(args.pages)

            pld = registrable_domain(pages, host_col="host")
            gated = robots_meta_gate(pld, robots_col="robots")
            canon = resolve_canonical_chains(
                pages.select("url", "canonical")
            ).select(
                "url",
                "canonical_url",
                F.col("status").alias("canonical_status"),
                F.col("depth").alias("canonical_depth"),
            )
            hygiene = gated.join(canon, "url").select(
                "url",
                "host",
                "registrable_domain",
                "indexable",
                "noindex",
                "nofollow",
                "canonical_url",
                "canonical_status",
                "canonical_depth",
            )
            warehouse.write(hygiene, "page_hygiene", mode="overwrite")

            idx = warehouse.read("page_hygiene").where("indexable")
            masses = idx.groupBy("registrable_domain").agg(
                F.count(F.lit(1)).cast("long").alias("size")
            ).where(F.col("registrable_domain").isNotNull())
            shards = lpt_shard_assignment(
                masses,
                group_col="registrable_domain",
                size_col="size",
                shards=args.shards,
            )
            warehouse.write(shards, "pld_shards", mode="overwrite")

            h = warehouse.read("page_hygiene")
            # One aggregate pass instead of five separate scans — the
            # conditional sums and countDistinct produce the same ints.
            hrow = h.agg(
                F.count(F.lit(1)).alias("n_pages"),
                F.sum(F.col("indexable").cast("long")).alias("n_indexable"),
                F.sum(F.col("noindex").cast("long")).alias("n_noindex"),
                F.sum(
                    (F.col("canonical_status") == "cycle").cast("long")
                ).alias("n_cycles"),
                F.countDistinct("registrable_domain").alias("n_plds"),
            ).head()
            summary = {
                "n_pages": int(hrow["n_pages"]),
                "n_indexable": int(hrow["n_indexable"] or 0),
                "n_noindex": int(hrow["n_noindex"] or 0),
                "n_canonical_cycles": int(hrow["n_cycles"] or 0),
                "n_plds": int(hrow["n_plds"]),
                "max_shard_load": int(
                    warehouse.read("pld_shards")
                    .agg(F.max("load_after").alias("m"))
                    .head()["m"]
                    or 0
                ),
                "wall_s": round(time.monotonic() - t0, 3),
            }
            lineage = spark.createDataFrame(
                [tuple(summary.values())],
                "n_pages long, n_indexable long, n_noindex long, "
                "n_canonical_cycles long, n_plds long, "
                "max_shard_load long, wall_s double",
            )
            warehouse.write(lineage, "hygiene_lineage", mode="overwrite")
        except Exception:
            if ctl.aborted:
                print(json.dumps({"error": ctl.aborted}))
                return 3
            raise
        print(json.dumps(summary))
        return 0
    finally:
        ctl.close()
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
