"""spark-submit entrypoint for the persisted IVF-PQ (IVFADC) ANN index —
the index-build / query split for similarity search at corpus scale
(Jégou/Douze/Schmid TPAMI'11), mirroring the persisted-index discipline of
the dedup band index (jobs/corpus_prep_job.py --write-dedup-index).

Build (once at ingest):

    spark-submit --py-files reader_spark.zip jobs/ann_index_job.py build \
        --embeddings /path/embeddings.parquet --index /path/ann_index \
        [--cells 8] [--m 8] [--k 16] [--iters 2] [--master local[32]]

writes:
    <index>/codes/      parquet (corpus_id, codes) PARTITIONED BY cell —
                        a probe reads ~nprobe/cells of it (partition
                        pruning pinned by tests/test_plans.py)
    <index>/model.json  centroids + PQ codebooks (cells*dim +
                        m*k*(dim/m) floats — a driver-sized artifact)

Query (every search, touching only the index):

    spark-submit ... jobs/ann_index_job.py query \
        --index /path/ann_index --queries /path/queries.parquet \
        --output /path/results [--topk 10] [--nprobe 2]

The raw float corpus is NEVER read at query time: candidates come from the
probed cells' code rows (a few bytes/vector) and scoring is m table
lookups per candidate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_binary(args, spark) -> dict:
    """--kind binary: sign-bit codes, dim/8 bytes per vector, no
    partitioning (a Hamming probe scans every code — that IS the design;
    the compression is the win, 16 bytes/vec at dim=64)."""
    from reader_spark.ops.ann import binary_index_encode

    emb = spark.read.parquet(args.embeddings)
    codes = binary_index_encode(
        emb, dim=args.dim, id_col=args.id_col, vec_col=args.vec_col
    )
    codes_path = os.path.join(args.index, "codes")
    codes.write.mode("overwrite").parquet(codes_path)
    os.makedirs(args.index, exist_ok=True)
    with open(os.path.join(args.index, "model.json"), "w") as fh:
        json.dump({"kind": "binary", "dim": args.dim}, fh)
    n = spark.read.parquet(codes_path).count()
    return {"kind": "binary", "indexed_vectors": n, "index": args.index}


def _build(args) -> dict:
    from pyspark.sql import functions as F

    from reader_spark.ops.ann import (
        ivfadc_encode,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from reader_spark.spark.session import get_spark

    spark = get_spark("ann_index_build", master=args.master)
    try:
        if args.kind == "binary":
            return _build_binary(args, spark)
        emb = spark.read.parquet(args.embeddings)
        centroids = train_ivf_centroids(
            emb, n_cells=args.cells, iters=args.iters,
            id_col=args.id_col, vec_col=args.vec_col,
        )
        codebooks = train_pq_codebooks(
            emb, m=args.m, k=args.k, iters=args.iters,
            id_col=args.id_col, vec_col=args.vec_col,
        )
        encoded = ivfadc_encode(
            emb, centroids, codebooks, id_col=args.id_col, vec_col=args.vec_col
        )
        codes_path = os.path.join(args.index, "codes")
        encoded.write.mode("overwrite").partitionBy("cell").parquet(codes_path)
        os.makedirs(args.index, exist_ok=True)
        with open(os.path.join(args.index, "model.json"), "w") as fh:
            json.dump(
                {
                    "centroids": centroids,
                    "codebooks": codebooks,
                    "m": args.m,
                    "k": args.k,
                },
                fh,
            )
        n = spark.read.parquet(codes_path).count()
        cells = (
            spark.read.parquet(codes_path)
            .agg(F.countDistinct("cell").alias("c"))
            .head()["c"]
        )
        return {"indexed_vectors": n, "cells": cells, "index": args.index}
    finally:
        spark.stop()


def _query(args) -> dict:
    from reader_spark.ops.ann import ivfadc_search
    from reader_spark.spark.session import get_spark

    spark = get_spark("ann_index_query", master=args.master)
    try:
        with open(os.path.join(args.index, "model.json")) as fh:
            model = json.load(fh)
        encoded = spark.read.parquet(os.path.join(args.index, "codes"))
        queries = spark.read.parquet(args.queries)
        if model.get("kind") == "binary":
            from reader_spark.ops.ann import binary_index_search

            if not args.embeddings:
                raise ValueError(
                    "--kind binary query needs --embeddings for the "
                    "candidate-only exact rerank"
                )
            hits = binary_index_search(
                encoded,
                queries,
                spark.read.parquet(args.embeddings),
                dim=model["dim"],
                k=args.topk,
                candidates=args.candidates,
                id_col=args.id_col,
                vec_col=args.vec_col,
            )
            hits.write.mode("overwrite").parquet(args.output)
            out = spark.read.parquet(args.output)
            n_queries = out.select("query_id").distinct().count()
            return {
                "kind": "binary",
                "queries": n_queries,
                "result_rows": out.count(),
                "output": args.output,
            }
        hits = ivfadc_search(
            encoded,
            queries,
            model["centroids"],
            model["codebooks"],
            k=args.topk,
            nprobe=args.nprobe,
            id_col=args.id_col,
            vec_col=args.vec_col,
        )
        hits.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
        n_queries = out.select("query_id").distinct().count()
        return {"queries": n_queries, "result_rows": out.count(), "output": args.output}
    finally:
        spark.stop()


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark ANN index job")
    sub = parser.add_subparsers(dest="mode", required=True)

    b = sub.add_parser("build")
    b.add_argument("--embeddings", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--cells", type=int, default=8)
    b.add_argument("--m", type=int, default=8)
    b.add_argument("--k", type=int, default=16)
    b.add_argument("--iters", type=int, default=2)

    b.add_argument("--dim", type=int, default=64, help="--kind binary only")

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True)
    q.add_argument("--output", required=True)
    q.add_argument("--topk", type=int, default=10)
    q.add_argument("--nprobe", type=int, default=2)
    q.add_argument(
        "--embeddings",
        default=None,
        help="--kind binary only: embedding store for the candidate-only "
        "exact rerank",
    )
    q.add_argument("--candidates", type=int, default=50)

    for p in (b, q):
        p.add_argument("--kind", choices=("ivfpq", "binary"), default="ivfpq")
        p.add_argument("--id-col", default="vec_id")
        p.add_argument("--vec-col", default="embedding")
        p.add_argument("--master", default=None)

    args = parser.parse_args(argv)
    t0 = time.monotonic()
    summary = _build(args) if args.mode == "build" else _query(args)
    summary["wall_s"] = round(time.monotonic() - t0, 3)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
