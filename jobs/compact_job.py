"""spark-submit entrypoint for small-file compaction / re-clustering:

    spark-submit --py-files reader_spark.zip jobs/compact_job.py \
        --input /path/frag_table --output /path/compacted \
        [--target-mb 128] [--sort-by doc_id] [--master local[32]]

The table-maintenance pass every long-lived warehouse needs: streaming
ingest and per-batch writes leave thousands of KB-scale files whose open/
footer cost dominates scans. This job rewrites the table into
ceil(bytes / target) evenly-sized files; with --sort-by it additionally
RANGE-CLUSTERS rows (repartitionByRange + sortWithinPartitions), giving
each output file a disjoint key range so engines prune whole files from
footer min/max stats — the parquet-native equivalent of OPTIMIZE ...
ZORDER's single-column case (the multi-column interleave lives in
ops/zorder.py).

Correctness is verified by the job itself before it reports success: row
count and an order-independent content hash (sum of per-row xxhash64)
must match input exactly — a compaction that loses or duplicates a row
aborts with exit 4.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _content_fingerprint(df):
    from pyspark.sql import functions as F

    # sum in decimal(38,0): 2^63-magnitude row hashes overflow BIGINT sums
    # under ANSI mode long before 38 digits do
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in sorted(df.columns)])
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(row_hash.cast("decimal(38,0)")).alias("h"),
    ).head()
    return int(r["n"]), int(r["h"] or 0)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark compaction job")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--target-mb", type=int, default=128)
    parser.add_argument("--sort-by", default=None)
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_compact", master=args.master)
    ctl = AbortController(spark, "compact", deadline_seconds=args.deadline).install()
    try:
        t0 = time.monotonic()
        try:
            df = spark.read.parquet(args.input)
            in_bytes = _dir_bytes(args.input)
            in_files = sum(
                1
                for _root, _d, files in os.walk(args.input)
                for f in files
                if f.endswith(".parquet")
            )
            n_out = max(1, math.ceil(in_bytes / (args.target_mb * 1024 * 1024)))
            if args.sort_by:
                out = df.repartitionByRange(n_out, args.sort_by).sortWithinPartitions(
                    args.sort_by
                )
            else:
                out = df.repartition(n_out)
            out.write.mode("overwrite").parquet(args.output)

            n_in, h_in = _content_fingerprint(df)
            back = spark.read.parquet(args.output)
            n_out_rows, h_out = _content_fingerprint(back)
            if (n_in, h_in) != (n_out_rows, h_out):
                print(
                    json.dumps(
                        {
                            "error": "content_mismatch",
                            "in": [n_in, h_in],
                            "out": [n_out_rows, h_out],
                        }
                    )
                )
                return 4
            out_files = sum(
                1
                for _root, _d, files in os.walk(args.output)
                for f in files
                if f.endswith(".parquet")
            )
        except Exception:
            if ctl.aborted:
                print(json.dumps({"error": ctl.aborted}))
                return 3
            raise
        print(
            json.dumps(
                {
                    "rows": n_in,
                    "in_files": in_files,
                    "out_files": out_files,
                    "in_bytes": in_bytes,
                    "sorted_by": args.sort_by,
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
