"""spark-submit entrypoint for the extraction job (S5/S4 analogue —
the reference's CLI/daemon becomes a batch job submission, SURVEY.md §3.3):

    spark-submit --py-files reader_spark.zip jobs/extract_job.py \
        --input  /path/to/docs_table \
        --warehouse /path/to/warehouse \
        --run-id run-2026-08-16 \
        [--no-resume] [--base-url-prefix https://corpus/] \
        [--exclude-tags .ads,.promo] [--full-page] [--partitions N]

Reads docs(doc_id, spans), writes `extracted` + `lineage` into the
warehouse, resumes from committed doc_ids unless --no-resume.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Allow running without --py-files when invoked from the repo checkout.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark extraction job")
    parser.add_argument("--input", required=True, help="docs table path (parquet)")
    parser.add_argument(
        "--input-format",
        choices=("docs", "warc", "jsonl"),
        default="docs",
        help="docs = parquet docs(doc_id, spans); warc = web-archive files; "
        "jsonl = newline-delimited JSON (doc_id, text, source)",
    )
    parser.add_argument("--warehouse", required=True, help="output warehouse dir")
    parser.add_argument("--run-id", required=True)
    parser.add_argument("--base-url-prefix", default="https://fixtures.test/")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--partitions", type=int, default=None)
    parser.add_argument(
        "--full-page",
        action="store_true",
        help="disable onlyMainContent (keep nav/footer)",
    )
    parser.add_argument("--exclude-tags", default="", help="comma-separated selectors")
    parser.add_argument("--include-tags", default="")
    parser.add_argument("--readability", action="store_true", help="opt-in scoring mode")
    parser.add_argument("--master", default=None)
    parser.add_argument(
        "--deadline",
        type=float,
        default=None,
        help="hard run deadline in seconds (W5 batch-deadline analogue); "
        "the run's job group is cancelled once it passes",
    )
    args = parser.parse_args(argv)

    from reader_spark.config import ExtractorConfig
    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.io import Warehouse
    from reader_spark.spark.job import run_extraction
    from reader_spark.spark.session import get_spark

    cfg = ExtractorConfig(
        only_main_content=not args.full_page,
        exclude_tags=tuple(t for t in args.exclude_tags.split(",") if t),
        include_tags=tuple(t for t in args.include_tags.split(",") if t),
        readability_scoring=args.readability,
    )

    spark = get_spark("reader_spark_extract", master=args.master)
    # T4 abort-on-disconnect + W5 batch deadline: SIGTERM/SIGINT or the
    # deadline watchdog cancels this run's job group; parquet/Iceberg job
    # commits are atomic, so an aborted run leaves no partial table and the
    # next run resumes from the last fully-committed state.
    ctl = AbortController(spark, args.run_id, deadline_seconds=args.deadline)
    ctl.install()
    try:
        try:
            if args.input_format == "warc":
                from reader_spark.sources.warc import read_warc, warc_to_docs

                docs = warc_to_docs(read_warc(spark, args.input))
                args.base_url_prefix = ""  # capture URI is the base URL
            elif args.input_format == "jsonl":
                from reader_spark.sources.jsonl import jsonl_to_docs, read_jsonl_docs

                parsed = read_jsonl_docs(spark, args.input)
                n_bad = parsed.where(parsed["error"].isNotNull()).count()
                if n_bad:
                    print(
                        f"jsonl: skipping {n_bad} unparseable/incomplete lines",
                        file=sys.stderr,
                    )
                docs = jsonl_to_docs(parsed)
            else:
                docs = spark.read.parquet(args.input)
            warehouse = Warehouse(spark, args.warehouse)
            metrics = run_extraction(
                spark,
                docs,
                warehouse,
                run_id=args.run_id,
                cfg=cfg,
                base_url_prefix=args.base_url_prefix,
                resume=not args.no_resume,
                num_partitions=args.partitions,
            )
        except Exception:
            # any Spark job this run submits (including read-side schema
            # inference) dies with the cancelled job group — report the
            # abort reason, not the cancellation stack
            if ctl.aborted:
                print(json.dumps({"run_id": args.run_id, "error": ctl.aborted}))
                return 3
            raise
        print(json.dumps(metrics))
    finally:
        ctl.close()
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
