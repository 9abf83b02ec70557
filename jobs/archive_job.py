"""spark-submit entrypoint for the archive lifecycle:

    spark-submit --py-files reader_spark.zip jobs/archive_job.py \
        --input /path/to/warcs --warehouse /path/wh --run-id a1 \
        [--merge-index] [--clean-archive] [--master local[32]]

One pass over a crawl's WARC files closes the whole archive loop:

1. read_warc (binaryFile scan -> Arrow-batched record splitter);
2. a CDX revisit index sidecar (ops/cdx: SURT urlkey + SHA-256 digest,
   per-(urlkey, digest) first_ts/n_captures) — with --merge-index the
   new captures roll into the existing ``cdx`` table via cdx_merge
   (counters-only shuffle, old payloads never re-read);
3. latest-capture extraction through the real pipeline
   (warc_to_docs -> run_extraction: skew handling, resume anti-join,
   lineage);
4. optionally (--clean-archive) the extracted markdown re-archived as
   a deterministic sharded WARC (sources/warc.write_warc) — the
   "cleaned corpus as an archive artifact" hand-off.

The summary prints as ONE JSON line: capture/revisit counts, index
size, extraction metrics, wall seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark archive job")
    parser.add_argument("--input", required=True, help="WARC files dir/glob")
    parser.add_argument("--warehouse", required=True)
    parser.add_argument("--run-id", required=True)
    parser.add_argument("--merge-index", action="store_true",
                        help="roll captures into the existing cdx table")
    parser.add_argument("--wet", action="store_true",
                        help="write the extracted text as a sharded WET "
                             "(WARC conversion-record) sidecar")
    parser.add_argument("--clean-archive", action="store_true",
                        help="re-archive extracted markdown as WARC shards")
    parser.add_argument("--shards", type=int, default=8)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--partitions", type=int, default=None)
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from reader_spark.ops.cdx import cdx_dedup_captures, cdx_index, cdx_merge
    from reader_spark.sources.warc import (
        read_warc,
        warc_to_docs,
        write_warc,
        write_wet,
    )
    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.io import Warehouse
    from reader_spark.spark.job import run_extraction
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_archive", master=args.master)
    ctl = AbortController(
        spark, args.run_id, deadline_seconds=args.deadline
    ).install()
    try:
        t0 = time.monotonic()
        try:
            captures = read_warc(spark, args.input).localCheckpoint()
            n_captures = captures.count()

            idx = cdx_index(
                captures.withColumn(
                    "ts", F.coalesce(F.col("capture_ts"), F.lit(""))
                ).withColumn("mime", F.lit("text/html")),
                url_col="doc_id",
                ts_col="ts",
                status_col="status",
                payload_col="payload",
            )
            revisits = cdx_dedup_captures(idx)
            warehouse = Warehouse(spark, args.warehouse)
            if args.merge_index and warehouse.exists("cdx"):
                merged = cdx_merge(warehouse.read("cdx"), revisits)
                warehouse.write(merged, "cdx", mode="overwrite")
            else:
                warehouse.write(revisits, "cdx", mode="overwrite")
            n_index = warehouse.read("cdx").count()

            docs = warc_to_docs(captures)
            metrics = run_extraction(
                spark,
                docs,
                warehouse,
                run_id=args.run_id,
                resume=not args.no_resume,
                num_partitions=args.partitions,
            )

            wet_path = None
            if args.wet:
                wet_rows = warehouse.read("extracted").where(
                    F.col("run_id") == args.run_id
                ).select("doc_id", F.col("markdown").alias("text"))
                wet_path = os.path.join(args.warehouse, "wet")
                write_wet(wet_rows, wet_path, shards=args.shards)

            cleaned_path = None
            if args.clean_archive:
                cleaned = warehouse.read("extracted").where(
                    F.col("run_id") == args.run_id
                ).select(
                    "doc_id",
                    F.col("markdown").alias("payload"),
                    F.lit(200).alias("status"),
                    F.lit(None).cast("string").alias("capture_ts"),
                )
                cleaned_path = os.path.join(args.warehouse, "clean_warc")
                write_warc(cleaned, cleaned_path, shards=args.shards)
        except Exception:
            if ctl.aborted:
                print(json.dumps({"error": ctl.aborted}))
                return 3
            raise
        print(
            json.dumps(
                {
                    "run_id": args.run_id,
                    "n_captures": n_captures,
                    "n_index_rows": n_index,
                    "extracted": metrics,
                    "clean_warc": cleaned_path,
                    "wet": wet_path,
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
