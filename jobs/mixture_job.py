"""spark-submit entrypoint planning a training mixture end-to-end:

    spark-submit --py-files reader_spark.zip jobs/mixture_job.py \
        --input /path/to/documents_table --output /path/to/mix \
        [--method doremi|unimax]   # weight derivation (default doremi)
        [--budget-tokens 150000]   # epoch-audit training budget
        [--steps 2000]             # batch-schedule length
        [--master local[32]] [--deadline 3600]

Composes the mixture layer into the run a pretraining launch actually
needs, in dependency order — every stage an already-oracled operator:

1. stats    — per-source domain dim (docs, whitespace tokens): one
              map-side-combined groupBy; corpus rows never shuffle
              after this stage.
2. weights  — `doremi`: per-domain mean bigram-LM surprisal
              (ops/textstats.bigram_lm_scores) against the corpus mean
              as the reference loss, through
              ops/allocate.doremi_reweight's fixed-point exp — domains
              the corpus's own LM finds surprising (underrepresented
              style) get upweighted. `unimax`: budget water-filling
              (ops/allocate.unimax_allocation), weights from the
              closed-form allocation.
3. audit    — ops/allocate.epoch_schedule: what the chosen mix costs
              each domain in repetition against the 4-epoch cap.
4. schedule — ops/interleave.mix_schedule: the first --steps of the
              deterministic stride batch order (the reproducible
              data-loader manifest).

Outputs: ``<output>/weights``, ``<output>/epochs``,
``<output>/schedule`` parquet tables. Last stdout line is a JSON
summary with per-stage lineage counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark mixture plan")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--method", choices=("doremi", "unimax"),
                        default="doremi")
    parser.add_argument("--budget-tokens", type=int, default=150_000)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_mixture", master=args.master)
    ctl = AbortController(
        spark, "mixture", deadline_seconds=args.deadline
    ).install()
    try:
        t0 = time.monotonic()
        from reader_spark.ops.allocate import (
            doremi_reweight,
            epoch_schedule,
            unimax_allocation,
        )
        from reader_spark.ops.interleave import mix_schedule
        from reader_spark.ops.textstats import bigram_lm_scores

        docs = spark.read.parquet(args.input)
        stats = (
            docs.groupBy(F.col("source").alias("domain"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(F.size(F.split("text", " ")))
                .cast("long")
                .alias("available_tokens"),
            )
            .localCheckpoint()
        )
        n_domains = stats.count()

        if args.method == "doremi":
            # Materialize per-doc LM scores once: the per-domain losses
            # and the global reference loss both aggregate this frame,
            # and without the boundary the bigram scoring ran twice.
            # (The proxy-loss milli values round a double avg whose
            # partition summation order is not fixed, so the derived
            # schedule length wobbles by a few steps run-to-run — it
            # did before this boundary too.)
            per_doc = bigram_lm_scores(docs).join(
                docs.select("doc_id", F.col("source").alias("domain")),
                "doc_id",
            ).localCheckpoint()
            losses = per_doc.groupBy("domain").agg(
                F.round(F.avg("avg_nll_bits") * 1000)
                .cast("long")
                .alias("proxy_loss_milli")
            )
            ref = per_doc.agg(
                F.round(F.avg("avg_nll_bits") * 1000)
                .cast("long")
                .alias("ref_loss_milli")
            )
            weights = doremi_reweight(
                losses.join(F.broadcast(ref))
            ).localCheckpoint()
        else:
            alloc = unimax_allocation(
                stats,
                key_col="domain",
                size_col="available_tokens",
                budget=float(args.budget_tokens),
            )
            tot = alloc.agg(F.sum("alloc").alias("__t"))
            weights = (
                alloc.join(F.broadcast(tot))
                .select(
                    "domain",
                    F.greatest(
                        F.lit(1),
                        F.round(F.col("alloc") * 1000 / F.col("__t")).cast(
                            "long"
                        ),
                    ).alias("weight_milli"),
                )
                .localCheckpoint()
            )

        weights.write.mode("overwrite").parquet(f"{args.output}/weights")

        audit = epoch_schedule(
            stats.join(
                weights.select(
                    "domain", F.col("weight_milli").alias("weight")
                ),
                "domain",
            ).select("domain", "available_tokens", "weight"),
            budget_tokens=args.budget_tokens,
        )
        audit.write.mode("overwrite").parquet(f"{args.output}/epochs")
        over_cap = audit.where("over_cap").count()

        sched = mix_schedule(weights, n_steps=args.steps)
        sched.write.mode("overwrite").parquet(f"{args.output}/schedule")
        sched_n = spark.read.parquet(f"{args.output}/schedule").count()

        summary = {
            "method": args.method,
            "n_domains": n_domains,
            "budget_tokens": args.budget_tokens,
            "domains_over_cap": over_cap,
            "schedule_steps": sched_n,
            "wall_s": round(time.monotonic() - t0, 3),
        }
        print(json.dumps(summary))
        return 0
    except Exception:
        if ctl.aborted:
            print(json.dumps({"error": ctl.aborted}))
            return 3
        raise
    finally:
        ctl.close()
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
