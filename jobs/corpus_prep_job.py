"""spark-submit entrypoint for the training-data corpus-prep composite:

    spark-submit --py-files reader_spark.zip jobs/corpus_prep_job.py \
        --input  /path/to/docs_table \
        --output /path/to/clean_corpus \
        [--input-format docs|warc] \
        [--min-tokens 20] [--max-punct-ratio 0.3] \
        [--bands 16] [--rows-per-band 4] [--master local[32]] \
        [--dedup-index /path/prev_index] [--write-dedup-index /path/next_index]

Incremental ingest: --dedup-index points at the persisted band index
(reader_spark.ops.dedup.build_band_index) of everything already ingested;
this batch's near-dups of the old corpus are dropped without re-sketching
the corpus. --write-dedup-index emits the rolled-forward index (old index
UNION this batch's keepers) for the next batch.

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
    parser.add_argument(
        "--dedup-index",
        default=None,
        help="path to a persisted band index (build_band_index parquet) of "
        "the already-ingested corpus; new docs near-duplicating it are "
        "dropped WITHOUT re-sketching the old corpus",
    )
    parser.add_argument(
        "--write-dedup-index",
        default=None,
        help="write the band index covering this batch's kept docs "
        "(unioned with --dedup-index if given) for the NEXT batch to read; "
        "must differ from --dedup-index (immutable per-batch artifact)",
    )
    parser.add_argument("--index-threshold", type=float, default=0.8)
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

            if args.write_dedup_index and args.write_dedup_index == args.dedup_index:
                raise ValueError(
                    "--write-dedup-index must differ from --dedup-index"
                )
            prep = CorpusPrepConfig(
                min_tokens=args.min_tokens,
                max_punct_ratio=args.max_punct_ratio,
                lsh_bands=args.bands,
                lsh_rows_per_band=args.rows_per_band,
            )
            clean = prepare_corpus(docs, prep=prep, base_url_prefix=base_url_prefix)

            dropped_incremental = 0
            num_hashes = args.bands * args.rows_per_band
            if args.dedup_index:
                from pyspark.sql import functions as F

                from reader_spark.ops.dedup import incremental_near_dups

                index = spark.read.parquet(args.dedup_index)
                dup_new = (
                    incremental_near_dups(
                        None,
                        clean,
                        "doc_id",
                        "markdown",
                        num_hashes=num_hashes,
                        bands=args.bands,
                        rows_per_band=args.rows_per_band,
                        threshold=args.index_threshold,
                        index=index,
                    )
                    .select(F.col("new_doc").alias("doc_id"))
                    .distinct()
                )
                dropped_incremental = dup_new.count()
                clean = clean.join(dup_new, "doc_id", "left_anti")

            clean.write.mode("overwrite").parquet(args.output)
            kept_df = spark.read.parquet(args.output)
            kept = kept_df.count()
            total = docs.count()

            if args.write_dedup_index:
                from reader_spark.ops.dedup import build_band_index

                batch_index = build_band_index(
                    kept_df.withColumnRenamed("markdown", "text"),
                    "doc_id",
                    "text",
                    num_hashes=num_hashes,
                    bands=args.bands,
                    rows_per_band=args.rows_per_band,
                )
                if args.dedup_index:
                    batch_index = spark.read.parquet(args.dedup_index).unionByName(
                        batch_index
                    )
                batch_index.write.mode("overwrite").parquet(
                    args.write_dedup_index
                )
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
                    "dropped_incremental": dropped_incremental,
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
