"""spark-submit entrypoint for the training-data curation pass:

    spark-submit --py-files reader_spark.zip jobs/curation_job.py \
        --input  /path/to/documents_table \
        --output /path/to/curated_corpus \
        [--min-score 0.5]                     # quality-logit gate
        [--target-lang en --dsir-quantile 0.2]  # DSIR: drop bottom 20% log_w
        [--embeddings /path/to/embeddings --tau 0.35 --cells 8]  # SemDeDup
        [--master local[32]] [--deadline 3600]

Composes this repo's curation operators into one job, in the order a real
pipeline runs them (cheap scan-local gates first, the embedding join last):

1. quality gate  — distilled linear classifier inference, pure native
   columns (ops.textstats.quality_logit_score), scan-bound.
2. DSIR          — hashed-n-gram importance weights against the
   --target-lang subset (ops.dsir.dsir_log_weights); the cut threshold is
   ONE approx_percentile aggregate, never a global sort.
3. SemDeDup      — k-means-cell + within-cell cosine prune over the
   embeddings table (ops.semdedup), joined back on doc_id == vec_id.

Output: kept docs with (score, log_w) provenance columns; the last stdout
line is a JSON summary with per-stage drop counts (lineage accounting).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark curation job")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--min-score", type=float, default=0.5)
    parser.add_argument("--target-lang", default=None)
    parser.add_argument(
        "--dsir-quantile",
        type=float,
        default=0.2,
        help="drop docs below this quantile of DSIR log_w (only with "
        "--target-lang); threshold = one approx_percentile aggregate",
    )
    parser.add_argument("--embeddings", default=None)
    parser.add_argument("--tau", type=float, default=0.35)
    parser.add_argument("--cells", type=int, default=8)
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_curation", master=args.master)
    ctl = AbortController(spark, "curation", deadline_seconds=args.deadline).install()
    try:
        t0 = time.monotonic()
        try:
            docs = spark.read.parquet(args.input)
            total = docs.count()
            stages = {}

            from reader_spark.ops.textstats import quality_logit_score

            scored = quality_logit_score(docs).select("doc_id", "score")
            # Materialization boundary after each gate (guide §5): the
            # per-stage lineage counts and the final write otherwise
            # re-run every upstream gate (quality scoring executed 4x in
            # the un-checkpointed form — once per downstream count plus
            # the write).
            kept = docs.join(scored, "doc_id").where(
                F.col("score") >= args.min_score
            ).localCheckpoint(eager=True)
            n_quality = kept.count()
            stages["dropped_quality"] = total - n_quality

            if args.target_lang:
                if "lang" not in docs.columns:
                    raise ValueError("--target-lang needs a lang column")
                from reader_spark.ops.dsir import dsir_log_weights

                weights = dsir_log_weights(
                    docs, "doc_id", "text", target=F.col("lang") == args.target_lang
                ).select("doc_id", "log_w").localCheckpoint(eager=True)
                cut = weights.agg(
                    F.expr(
                        f"approx_percentile(log_w, {args.dsir_quantile})"
                    ).alias("c")
                ).head()["c"]
                kept = kept.join(weights, "doc_id").where(
                    F.col("log_w") >= cut
                ).localCheckpoint(eager=True)
                n_dsir = kept.count()
                stages["dropped_dsir"] = n_quality - n_dsir
                stages["dsir_cut"] = round(float(cut), 6)
            else:
                kept = kept.withColumn("log_w", F.lit(None).cast("double"))
                n_dsir = n_quality

            if args.embeddings:
                from reader_spark.ops.ann import train_ivf_centroids
                from reader_spark.ops.semdedup import semdedup

                emb = spark.read.parquet(args.embeddings)
                cents = train_ivf_centroids(emb, n_cells=args.cells, iters=2)
                verdict = semdedup(emb, cents, tau=args.tau).select(
                    F.col("vec_id").alias("doc_id"), "keep"
                )
                # docs without an embedding pass through (no evidence they
                # duplicate anything) — left join, keep != 0
                kept = (
                    kept.join(verdict, "doc_id", "left")
                    .where(F.coalesce(F.col("keep"), F.lit(1)) == 1)
                    .drop("keep")
                    .localCheckpoint(eager=True)
                )
                n_sem = kept.count()
                stages["dropped_semdedup"] = n_dsir - n_sem

            kept.write.mode("overwrite").parquet(args.output)
            final = spark.read.parquet(args.output).count()
        except Exception:
            if ctl.aborted:
                print(json.dumps({"error": ctl.aborted}))
                return 3
            raise
        print(
            json.dumps(
                {
                    "input_docs": total,
                    "kept_docs": final,
                    **stages,
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
