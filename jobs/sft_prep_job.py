"""spark-submit entrypoint for SFT conversation-data preparation:

    spark-submit --py-files reader_spark.zip jobs/sft_prep_job.py \
        --input  /path/to/turns.parquet   # (conv_id, turn_idx, role, content)
        --output /path/to/sft \
        [--keep-malformed]    # skip the structural hygiene gate
        [--keep-duplicates]   # skip cross-conversation assistant dedup
        [--pack 2048]         # also emit a char-budget packing sidecar
        [--resume]            # anti-join committed conv_ids, append rest
        [--master local[32]] [--deadline 3600]

Composes the SFT/chat operator layer (ops/chat.py) into the pipeline a
post-training corpus actually runs, in dependency order:

1. hygiene  — chat_stats structural gate: keep conversations that start
              with a user turn, end with an assistant turn, alternate
              roles, and contain >= 1 assistant turn.
2. dedup    — assistant_turn_dedup: a conversation containing any
              NON-canonical assistant response (an exact duplicate of a
              response elected in another conversation) is dropped
              whole; the canonical conversation survives.
3. render   — render_chat + loss_mask_spans: one row per conversation
              with the training string and its TRAINABLE char spans
              (assistant content only) as array<struct<start,end>>.
4. pack     — optional: pack_by_cost over n_chars into --pack-sized
              training sequences, written to a `<output>_packs` sidecar.

Resume discipline: assistant dedup is a CORPUS statistic (the canon
election crosses conversations), so the first run persists its digest
index to a `<output>_dedup_index` sidecar; a --resume run drops new
conversations whose assistant digests hit the index (they duplicate
already-committed data), dedups within the remainder, and appends the
new digests — the incremental-dedup band-index discipline
(ops/dedup.py) applied to conversations. Output: interrupted+resumed ==
uninterrupted, proven by the e2e test.

The last stdout line is a JSON summary with per-stage lineage counts.
Every stage is an already-oracled operator — this job is composition +
accounting, not new semantics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark SFT prep job")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--keep-malformed", action="store_true")
    parser.add_argument("--keep-duplicates", action="store_true")
    parser.add_argument("--pack", type=int, default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    if args.pack is not None and args.pack < 1:
        parser.error("--pack must be >= 1")

    from pyspark.sql import functions as F

    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_sft_prep", master=args.master)
    ctl = AbortController(
        spark, "sft_prep", deadline_seconds=args.deadline
    ).install()
    try:
        t0 = time.monotonic()
        try:
            from reader_spark.ops.chat import (
                assistant_turn_dedup,
                chat_stats,
                loss_mask_spans,
                render_chat,
            )

            turns = spark.read.parquet(args.input)
            stages: dict = {}
            n_convs = turns.select("conv_id").distinct().count()
            stages["input_convs"] = n_convs

            write_mode = "overwrite"
            index_path = args.output.rstrip("/") + "_dedup_index"
            old_index = None
            if args.resume:
                try:
                    committed = spark.read.parquet(args.output)
                except Exception:
                    committed = None
                if committed is not None:
                    turns = turns.join(
                        committed.select("conv_id").distinct(),
                        "conv_id",
                        "left_anti",
                    )
                    remaining = turns.select("conv_id").distinct().count()
                    stages["resumed_skipped"] = n_convs - remaining
                    n_convs = remaining
                    write_mode = "append"
                    try:
                        old_index = spark.read.parquet(index_path)
                    except Exception:
                        old_index = None

            if not args.keep_malformed:
                good = chat_stats(turns).where(
                    F.col("starts_with_user")
                    & F.col("ends_with_assistant")
                    & F.col("alternates")
                    & (F.col("n_assistant") >= 1)
                )
                turns = turns.join(good.select("conv_id"), "conv_id")
                kept = good.count()
                stages["hygiene_dropped_convs"] = n_convs - kept
                n_convs = kept

            if not args.keep_duplicates:
                if old_index is not None:
                    # conversations duplicating ALREADY-COMMITTED
                    # responses are dropped before the within-run
                    # election (the incremental band-index discipline)
                    norm = F.trim(
                        F.regexp_replace(
                            F.lower(F.col("content")), r"\s+", " "
                        )
                    )
                    digests = turns.where(
                        F.col("role") == "assistant"
                    ).select("conv_id", F.md5(norm).alias("h"))
                    hit_old = (
                        digests.join(
                            old_index.select("h").distinct(), "h"
                        )
                        .select("conv_id")
                        .distinct()
                    )
                    turns = turns.join(hit_old, "conv_id", "left_anti")
                dup = assistant_turn_dedup(turns)
                drop = (
                    dup.where(~F.col("is_canonical"))
                    .select("conv_id")
                    .distinct()
                )
                turns = turns.join(drop, "conv_id", "left_anti")
                kept = turns.select("conv_id").distinct().count()
                stages["dup_dropped_convs"] = n_convs - kept
                n_convs = kept

            rendered = render_chat(turns)
            spans = (
                loss_mask_spans(turns)
                .where(F.col("trainable"))
                .groupBy("conv_id")
                .agg(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("start_char").alias("start"),
                                F.col("end_char").alias("end"),
                            )
                        )
                    ).alias("trainable_spans")
                )
            )
            out = rendered.join(spans, "conv_id").localCheckpoint(eager=True)
            out.write.mode(write_mode).parquet(args.output)

            if not args.keep_duplicates:
                norm = F.trim(
                    F.regexp_replace(F.lower(F.col("content")), r"\s+", " ")
                )
                idx_rows = (
                    turns.where(F.col("role") == "assistant")
                    .select(F.md5(norm).alias("h"))
                    .distinct()
                )
                idx_mode = "append" if old_index is not None else "overwrite"
                idx_rows.write.mode(idx_mode).parquet(index_path)

            if args.pack is not None:
                from reader_spark.ops.packing import pack_by_cost

                packs = pack_by_cost(
                    out.select("conv_id", "n_chars"),
                    id_col="conv_id",
                    cost_col="n_chars",
                    seq_len=args.pack,
                )
                packs.write.mode(write_mode).parquet(
                    args.output.rstrip("/") + "_packs"
                )
                stages["packed_sequences"] = (
                    packs.agg(F.countDistinct("seq_id")).head()[0] or 0
                )

            committed_total = spark.read.parquet(args.output).count()
            stages["this_run"] = {
                "convs_written": n_convs,
                "chars_written": int(
                    out.agg(F.coalesce(F.sum("n_chars"), F.lit(0))).head()[0]
                ),
            }
        except Exception:
            if ctl.aborted:
                print(json.dumps({"error": ctl.aborted}))
                return 3
            raise
        print(
            json.dumps(
                {
                    "convs": int(committed_total),  # total committed
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
