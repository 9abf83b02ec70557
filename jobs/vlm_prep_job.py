"""spark-submit entrypoint for VLM training-sample preparation over
interleaved text+media documents:

    spark-submit --py-files reader_spark.zip jobs/vlm_prep_job.py \
        --input  /path/to/raw_docs            # DOCS_SCHEMA (doc_id, spans)
        --output /path/to/samples \
        [--domains /path/to/doc_domains]      # (doc_id, domain) -> enables
                                              # span-level boilerplate strip
        [--align-threshold 0.3]               # drop misaligned image spans
        [--redact]                            # PII-mask prose spans
        [--budget 2048 --media-cost 576]      # context-window truncation
        [--resume]                            # anti-join committed doc_ids,
                                              # append only the remainder
        [--master local[32]] [--deadline 3600]

Composes the interleaved (axis-B) operator layer into the pipeline a
multimodal pretraining corpus actually runs, in dependency order:

1. extract      — raw payloads through the fused extraction engine
                  (spark.job.extract_dataframe); error rows quarantined.
2. boilerplate  — span-level C4 furniture rule per domain
                  (ops.lines.boilerplate_spans / strip_boilerplate_spans),
                  only with --domains.
3. alignment    — CLIP-score-shaped caption alignment
                  (ops.multimodal.caption_alignment_scores); image spans
                  whose score falls below --align-threshold are deleted
                  from the span array (LAION-style pair filtering), text
                  is never touched.
4. redact       — in-place PII masking of prose spans
                  (ops.multimodal.redact_spans), with --redact.
5. truncate     — span-boundary context-budget cut
                  (ops.multimodal.truncate_spans_to_budget).
6. render       — LLaVA/OBELICS sample shape: <image_k> placeholders +
                  media_refs in placeholder order
                  (ops.multimodal.render_interleaved_sample).

Output: (doc_id, sample, media_refs, n_media, n_spans_kept,
n_spans_dropped, cost_kept). The last stdout line is a JSON summary with
per-stage lineage counts. Every stage is the already-oracled operator —
this job is composition + accounting, not new semantics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark VLM prep job")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--domains", default=None)
    parser.add_argument("--align-threshold", type=float, default=None)
    parser.add_argument("--redact", action="store_true")
    parser.add_argument("--budget", type=int, default=2048)
    parser.add_argument("--media-cost", type=int, default=576)
    parser.add_argument(
        "--resume",
        action="store_true",
        help="anti-join doc_ids already committed to --output and APPEND "
        "only the remainder (the extract_job checkpoint discipline: a "
        "killed run re-launches with --resume and pays only for "
        "unfinished docs)",
    )
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_vlm_prep", master=args.master)
    ctl = AbortController(spark, "vlm_prep", deadline_seconds=args.deadline).install()
    try:
        t0 = time.monotonic()
        try:
            from reader_spark.spark.job import extract_dataframe

            raw = spark.read.parquet(args.input)
            total = raw.count()
            stages: dict = {}

            write_mode = "overwrite"
            if args.resume:
                try:
                    committed = spark.read.parquet(args.output)
                except Exception:
                    committed = None
                if committed is not None:
                    raw = raw.join(
                        committed.select("doc_id").distinct(),
                        "doc_id",
                        "left_anti",
                    )
                    remaining = raw.count()
                    stages["resumed_skipped"] = total - remaining
                    total = remaining
                    write_mode = "append"

            extracted = extract_dataframe(raw).select(
                "doc_id", "spans", "error_kind"
            )
            docs = extracted.where(F.col("error_kind").isNull()).drop(
                "error_kind"
            )
            # one materialization boundary: every later stage re-reads the
            # extraction output instead of re-running the Python UDF per
            # downstream action
            docs = docs.localCheckpoint(eager=True)
            n_ok = docs.count()
            stages["quarantined"] = total - n_ok

            spans_before = docs.select(
                F.sum(F.coalesce(F.size("spans"), F.lit(0)))
            ).head()[0] or 0

            if args.domains:
                from reader_spark.ops.lines import (
                    boilerplate_spans,
                    strip_boilerplate_spans,
                )

                domains = spark.read.parquet(args.domains)
                with_dom = docs.join(domains, "doc_id")
                # The deletion list is a CORPUS statistic (>= min_frac of a
                # domain's docs): computing it over only the --resume
                # remainder would strip different spans than the first run
                # did, making the appended output irreproducible against a
                # fresh full run. So the first run persists its list to a
                # sidecar and resumed runs reload it; a resume without a
                # sidecar (output predates this job version) recomputes
                # over the remainder and says so in the summary.
                boiler_path = args.output.rstrip("/") + "_boilerplate"
                boiler = None
                if args.resume and write_mode == "append":
                    try:
                        boiler = spark.read.parquet(boiler_path)
                        stages["boilerplate_list"] = "reloaded"
                    except Exception:
                        stages["boilerplate_list"] = "recomputed_remainder_scope"
                if boiler is None:
                    boiler = boilerplate_spans(with_dom)
                    boiler.write.mode("overwrite").parquet(boiler_path)
                    stages.setdefault("boilerplate_list", "computed")
                    boiler = spark.read.parquet(boiler_path)
                stripped = strip_boilerplate_spans(with_dom, boiler)
                docs = stripped.select("doc_id", "spans").localCheckpoint(
                    eager=True
                )
                after = docs.select(
                    F.sum(F.coalesce(F.size("spans"), F.lit(0)))
                ).head()[0] or 0
                stages["boilerplate_spans_dropped"] = int(spans_before - after)
                spans_before = after

            if args.align_threshold is not None:
                from reader_spark.ops.multimodal import (
                    caption_alignment_scores,
                    caption_pairs,
                )

                rows = docs.select(
                    "doc_id", F.explode("spans").alias("s")
                ).select(
                    "doc_id",
                    F.col("s.order").alias("ord"),
                    F.col("s.kind").alias("kind"),
                    F.col("s.text").alias("text"),
                    F.col("s.media_ref").alias("media_ref"),
                )
                scored = caption_alignment_scores(
                    caption_pairs(rows), threshold=args.align_threshold
                )
                bad = (
                    scored.where(F.col("keep") == 0)
                    .groupBy("doc_id")
                    .agg(F.collect_set("ord").alias("bad_ords"))
                )
                docs = (
                    docs.join(bad, "doc_id", "left")
                    .withColumn(
                        "spans",
                        F.when(
                            F.col("bad_ords").isNull(), F.col("spans")
                        ).otherwise(
                            F.filter(
                                F.col("spans"),
                                lambda s: ~F.array_contains(
                                    F.col("bad_ords"), s.getField("order")
                                ),
                            )
                        ),
                    )
                    .drop("bad_ords")
                )
                docs = docs.localCheckpoint(eager=True)
                after = docs.select(
                    F.sum(F.coalesce(F.size("spans"), F.lit(0)))
                ).head()[0] or 0
                stages["misaligned_media_dropped"] = int(spans_before - after)
                spans_before = after

            if args.redact:
                from reader_spark.ops.multimodal import redact_spans

                docs = redact_spans(docs)

            from reader_spark.ops.multimodal import (
                render_interleaved_sample,
                truncate_spans_to_budget,
            )

            cut = truncate_spans_to_budget(
                docs, budget=args.budget, media_cost=args.media_cost
            )
            rendered = render_interleaved_sample(cut).select(
                "doc_id",
                "sample",
                "media_refs",
                "n_media",
                "n_spans_kept",
                "n_spans_dropped",
                "cost_kept",
            )
            rendered = rendered.localCheckpoint(eager=True)
            rendered.write.mode(write_mode).parquet(args.output)

            def _agg(frame):
                return frame.agg(
                    F.count(F.lit(1)).alias("samples"),
                    F.coalesce(F.sum("n_spans_dropped"), F.lit(0)).alias(
                        "truncated_spans"
                    ),
                    F.coalesce(F.sum("n_media"), F.lit(0)).alias("media_total"),
                    F.coalesce(F.sum("cost_kept"), F.lit(0)).alias("cost_total"),
                ).head()

            # Two explicit scopes (r4 advice: don't mix them in one flat
            # dict): the committed totals re-read from --output, and this
            # run's own rendered frame. On a non-resume run they coincide.
            summary = _agg(spark.read.parquet(args.output))
            this_run = _agg(rendered)
            stages["truncated_spans"] = int(summary["truncated_spans"])
            stages["this_run"] = {
                k: int(this_run[k])
                for k in ("samples", "truncated_spans", "media_total", "cost_total")
            }
        except Exception:
            if ctl.aborted:
                print(json.dumps({"error": ctl.aborted}))
                return 3
            raise
        print(
            json.dumps(
                {
                    "input_docs": total,  # docs processed THIS run
                    "samples": int(summary["samples"]),  # total committed
                    "media_total": int(summary["media_total"]),
                    "cost_total": int(summary["cost_total"]),
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
