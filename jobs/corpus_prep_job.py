"""spark-submit entrypoint for the training-data corpus-prep composite:

    spark-submit --py-files reader_spark.zip jobs/corpus_prep_job.py \
        --input  /path/to/docs_table \
        --output /path/to/clean_corpus \
        [--input-format docs|warc] \
        [--min-tokens 20] [--max-punct-ratio 0.3] \
        [--bands 16] [--rows-per-band 4] [--master local[32]]

Pipeline: extraction -> quality gate -> exact dedup -> MinHash-LSH near-dup
clustering -> keeper corpus (see reader_spark/spark/corpus_prep.py for the
shuffle budget: dedup decisions on narrow projections; full-width rows cross
exactly one exchange). --input-format warc reads WARC-style archive files
(reader_spark/sources/warc.py) instead of a docs(doc_id, spans) table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark corpus prep job")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--input-format", choices=("docs", "warc"), default="docs")
    parser.add_argument("--base-url-prefix", default="https://fixtures.test/")
    parser.add_argument("--min-tokens", type=int, default=20)
    parser.add_argument("--max-punct-ratio", type=float, default=0.3)
    parser.add_argument("--bands", type=int, default=16)
    parser.add_argument("--rows-per-band", type=int, default=4)
    parser.add_argument("--master", default=None)
    parser.add_argument(
        "--deadline",
        type=float,
        default=None,
        help="hard run deadline in seconds; the job group is cancelled once "
        "it passes (W5 analogue, same contract as extract_job)",
    )
    args = parser.parse_args(argv)

    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.corpus_prep import CorpusPrepConfig, prepare_corpus
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_corpus_prep", master=args.master)
    ctl = AbortController(
        spark, "corpus_prep", deadline_seconds=args.deadline
    ).install()
    try:
        t0 = time.monotonic()
        try:
            if args.input_format == "warc":
                from reader_spark.sources.warc import read_warc, warc_to_docs

                docs = warc_to_docs(read_warc(spark, args.input))
                base_url_prefix = ""
            else:
                docs = spark.read.parquet(args.input)
                base_url_prefix = args.base_url_prefix

            prep = CorpusPrepConfig(
                min_tokens=args.min_tokens,
                max_punct_ratio=args.max_punct_ratio,
                lsh_bands=args.bands,
                lsh_rows_per_band=args.rows_per_band,
            )
            clean = prepare_corpus(docs, prep=prep, base_url_prefix=base_url_prefix)
            clean.write.mode("overwrite").parquet(args.output)
            kept = spark.read.parquet(args.output).count()
            total = docs.count()
        except Exception:
            # any job this run submits (including read-side schema
            # inference) dies with the cancelled group — report the abort
            if ctl.aborted:
                print(json.dumps({"error": ctl.aborted}))
                return 3
            raise
        print(
            json.dumps(
                {
                    "input_docs": total,
                    "kept_docs": kept,
                    "dropped_docs": total - kept,
                    "wall_s": round(time.monotonic() - t0, 3),
                }
            )
        )
    finally:
        ctl.close()
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
