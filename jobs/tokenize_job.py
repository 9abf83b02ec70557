"""spark-submit entrypoint for the tokenize-and-pack pass:

    spark-submit --py-files reader_spark.zip jobs/tokenize_job.py \
        --input  /path/to/documents_table      # (doc_id, text, ...)
        --output /path/to/tokenized \
        [--learn 24]          # learn N merges from THIS corpus
                              # (default: ship the literal DEFAULT_MERGES)
        [--merges /path/to/merges.parquet]     # or reuse a learned table
        [--seq-len 2048] [--shards 32]
        [--mode nextfit|concat]  # no-split next-fit bins vs
                                 # concat-then-chunk sequences
        [--master local[32]] [--deadline 3600]

Composes the exact-BPE layer (ops/bpe.py) into the job a pretraining
data pipeline actually runs, with the tokenizer as a persisted artifact:

1. merges   — learn_bpe_merges on the corpus (--learn), or reload a
              prior run's table (--merges), or the literal default;
              always WRITTEN to <output>/merges.parquet +
              <output>/merges.json so downstream runs and the serving
              side consume the identical table.
2. counts   — bpe_token_counts with that table -> <output>/counts
              (doc_id, n_words, bpe_tokens, fertility).
3. packing  — per-shard (doc_id % --shards):
              --mode concat: pack_by_cost concat-then-chunk segments;
              --mode nextfit: sample-level no-split bins.
              -> <output>/packed.

The last stdout line is a JSON summary with per-stage lineage (docs,
merges used, total tokens, sequences/bins, padding/fill accounting).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark tokenize job")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--learn", type=int, default=None)
    parser.add_argument("--merges", default=None)
    parser.add_argument("--seq-len", type=int, default=2048)
    parser.add_argument("--shards", type=int, default=32)
    parser.add_argument("--mode", choices=("concat", "nextfit"), default="concat")
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)
    if args.learn is not None and args.merges:
        parser.error("--learn and --merges are mutually exclusive")

    from pyspark.sql import functions as F

    from reader_spark.ops.bpe import (
        DEFAULT_MERGES,
        bpe_token_counts,
        learn_bpe_merges,
    )
    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_tokenize", master=args.master)
    ctl = AbortController(spark, "tokenize", deadline_seconds=args.deadline).install()
    try:
        t0 = time.monotonic()
        try:
            docs = spark.read.parquet(args.input)
            n_docs = docs.count()
            summary: dict = {"input_docs": n_docs, "mode": args.mode}

            # -- stage 1: the merge table (learned, reloaded, or literal)
            if args.learn is not None:
                mdf = learn_bpe_merges(docs, n_merges=args.learn)
                summary["merges_source"] = "learned"
            elif args.merges:
                mdf = spark.read.parquet(args.merges).select(
                    "merge_rank", "lhs", "rhs", "pair_count"
                )
                summary["merges_source"] = "reloaded"
            else:
                mdf = spark.createDataFrame(
                    [
                        (i, l, r, None)
                        for i, (l, r) in enumerate(DEFAULT_MERGES)
                    ],
                    "merge_rank long, lhs string, rhs string, pair_count long",
                )
                summary["merges_source"] = "default"
            mrows = mdf.orderBy("merge_rank").collect()  # bounded: the table
            merges = tuple((r["lhs"], r["rhs"]) for r in mrows)
            summary["n_merges"] = len(merges)
            mdf.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(args.output, "merges.parquet")
            )
            os.makedirs(args.output, exist_ok=True)
            with open(os.path.join(args.output, "merges.json"), "w") as fh:
                json.dump([list(m) for m in merges], fh)

            # -- stage 2: exact token counts
            counts = bpe_token_counts(docs, merges=merges).withColumn(
                "shard",
                F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(args.shards)).cast("long"),
            )
            counts.write.mode("overwrite").parquet(
                os.path.join(args.output, "counts")
            )
            counts = spark.read.parquet(os.path.join(args.output, "counts"))
            agg = counts.agg(
                F.coalesce(F.sum("bpe_tokens"), F.lit(0)).alias("t"),
                F.coalesce(F.sum("n_words"), F.lit(0)).alias("w"),
            ).head()
            summary["total_tokens"] = int(agg["t"])
            summary["total_words"] = int(agg["w"])

            # -- stage 3: packing
            if args.mode == "concat":
                from reader_spark.ops.packing import pack_by_cost

                packed = pack_by_cost(
                    counts,
                    "doc_id",
                    "bpe_tokens",
                    args.seq_len,
                    partition_cols=["shard"],
                )
                packed.write.mode("overwrite").parquet(
                    os.path.join(args.output, "packed")
                )
                packed = spark.read.parquet(os.path.join(args.output, "packed"))
                summary["sequences"] = packed.select(
                    "shard", "seq_id"
                ).distinct().count()
                summary["packed_tokens"] = int(
                    packed.agg(F.coalesce(F.sum("n_tokens"), F.lit(0))).head()[0]
                )
            else:
                from reader_spark.ops.packing import pack_next_fit

                packed = pack_next_fit(
                    counts,
                    "doc_id",
                    "bpe_tokens",
                    args.seq_len,
                    partition_cols=["shard"],
                )
                packed.write.mode("overwrite").parquet(
                    os.path.join(args.output, "packed")
                )
                packed = spark.read.parquet(os.path.join(args.output, "packed"))
                bins = packed.groupBy("shard", "bin_id").agg(
                    F.sum("cost").alias("fill")
                )
                summary["bins"] = bins.count()
                summary["oversize_docs"] = packed.where("oversize").count()
                summary["mean_fill_frac"] = round(
                    (
                        bins.agg(F.avg(F.least(F.col("fill"), F.lit(args.seq_len))))
                        .head()[0]
                        or 0.0
                    )
                    / args.seq_len,
                    4,
                )
        except Exception:
            if ctl.aborted:
                print(json.dumps({"error": ctl.aborted}))
                return 3
            raise
        summary["wall_s"] = round(time.monotonic() - t0, 3)
        print(json.dumps(summary))
    finally:
        ctl.close()
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
