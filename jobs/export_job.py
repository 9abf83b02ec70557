"""spark-submit entrypoint for the JSONL export sink:

    spark-submit --py-files reader_spark.zip jobs/export_job.py \
        --input  /path/to/table.parquet \
        --output /path/to/export \
        [--shards 8] [--by doc_id] \
        [--master local[32]] [--deadline 3600]

The result-sink counterpart of sources/jsonl.py (the reference emits
JSON/markdown result documents; at pipeline scale the interchange format
downstream trainers and labelers actually consume is sharded JSONL):

- every row serializes to one JSON line (JVM-side to_json over the full
  struct — no Python in the write path);
- rows land in --shards deterministic shards by md5 of --by (portable:
  re-running the export on the same input reproduces the same shard
  membership bit-for-bit);
- the writer partitions output by the shard column (shard=NN/ dirs, the
  layout both Spark and non-Spark consumers can list cheaply);
- a manifest.json lands beside the shards: per-shard row counts plus an
  order-insensitive content fingerprint (sum of xxhash64(line) in
  decimal(38,0) — BIGINT sums overflow under ANSI, the compact_job
  discipline), so a consumer can verify a transfer without re-reading
  through Spark.

Round-trips through sources/jsonl.read_jsonl_docs (pinned by test).
The last stdout line is the manifest summary JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark JSONL export job")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--shards", type=int, default=8)
    parser.add_argument("--by", default="doc_id")
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    if args.shards < 1:
        parser.error("--shards must be >= 1")

    from pyspark.sql import functions as F

    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_export", master=args.master)
    ctl = AbortController(spark, "export", deadline_seconds=args.deadline).install()
    try:
        t0 = time.monotonic()
        try:
            df = spark.read.parquet(args.input)
            if args.by not in df.columns:
                raise ValueError(f"--by column {args.by!r} not in input")
            cols = df.columns
            shard = F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("exp:"), F.col(args.by).cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(args.shards),
            ).cast("int")
            lines = df.select(
                shard.alias("shard"),
                F.to_json(F.struct(*cols)).alias("value"),
            )
            data_dir = os.path.join(args.output, "data")
            lines.write.mode("overwrite").partitionBy("shard").text(data_dir)

            # shard dirs are hive-partitioned; basePath lets the text scan
            # resolve the `shard` column from the directory names
            back = spark.read.option("basePath", data_dir).text(
                os.path.join(data_dir, "shard=*")
            )
            per_shard = (
                back.groupBy("shard")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("rows"),
                    F.sum(
                        F.xxhash64("value").cast("decimal(38,0)")
                    ).alias("fingerprint"),
                )
                .orderBy("shard")
                .collect()
            )
            manifest = {
                "rows": int(sum(r["rows"] for r in per_shard)),
                "shards": {
                    str(int(r["shard"])): {
                        "rows": int(r["rows"]),
                        "fingerprint": str(r["fingerprint"]),
                    }
                    for r in per_shard
                },
                "by": args.by,
                "n_shards": args.shards,
            }
            with open(os.path.join(args.output, "manifest.json"), "w") as fh:
                json.dump(manifest, fh, indent=1, sort_keys=True)
        except Exception:
            if ctl.aborted:
                print(json.dumps({"error": ctl.aborted}))
                return 3
            raise
        print(
            json.dumps(
                {
                    "rows": manifest["rows"],
                    "n_shards": args.shards,
                    "nonempty_shards": len(manifest["shards"]),
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
