"""spark-submit entrypoint running the code-corpus prep pipeline:

    spark-submit --py-files reader_spark.zip jobs/code_prep_job.py \\
        --input /path/to/files_table --output /path/to/code_prep \\
        [--allow-families permissive]     # comma list of license families
        [--allow-licenses MIT,ISC]        # extra allow-listed license ids
        [--fim-pct 50] [--spm-pct 50]     # FIM sampling knobs
        [--master local[32]] [--deadline 3600]

The Stack/StarCoder-shaped prep for code training data, composed from
individually-oracled operators in dependency order:

1. license  — ops/license.license_detect: SPDX tag beats header
   fingerprints; only files whose family is allow-listed (or whose
   license id is explicitly allow-listed) may proceed — the BigCode
   compliance gate.
2. quality  — ops/code.code_quality_gate: StarCoder thresholds,
   first-fail reason names the drop.
3. dedup    — exact content dedup (md5 groupBy, min-doc_id exemplar —
   the file-level pass The Stack runs before near-dup).
4. fim      — ops/fim.fim_transform: deterministic PSM/SPM
   fill-in-the-middle renders over the surviving files.

Input parquet needs ``(doc_id, path, content)``.  Outputs:
``<output>/gate_manifest`` (every input file with license columns,
gate reason, dedup keeper and the final kept flag) and
``<output>/samples`` (the FIM-rendered training rows).  Last stdout
line is a JSON summary with per-stage lineage counts; exit 3 on
deadline/signal abort (atomic: outputs only appear complete).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="reader_spark code prep")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--allow-families", default="permissive")
    parser.add_argument("--allow-licenses", default="")
    parser.add_argument("--fim-pct", type=int, default=50)
    parser.add_argument("--spm-pct", type=int, default=50)
    parser.add_argument("--master", default=None)
    parser.add_argument("--deadline", type=float, default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from reader_spark.spark.abort import AbortController
    from reader_spark.spark.session import get_spark

    spark = get_spark("reader_spark_code_prep", master=args.master)
    ctl = AbortController(
        spark, "code_prep", deadline_seconds=args.deadline
    ).install()
    try:
        t0 = time.monotonic()
        from reader_spark.ops.code import code_quality_gate
        from reader_spark.ops.fim import fim_transform
        from reader_spark.ops.license import license_detect

        files = spark.read.parquet(args.input)
        n_files = files.count()

        fams = {f.strip() for f in args.allow_families.split(",") if f.strip()}
        lics = {l.strip() for l in args.allow_licenses.split(",") if l.strip()}
        lic = license_detect(files).localCheckpoint()
        lic_ok = lic.where(
            F.col("family").isin(*fams)
            | (F.col("license_id").isin(*lics) if lics else F.lit(False))
        ).select("doc_id")
        n_lic_ok = lic_ok.count()

        gated = code_quality_gate(
            files.join(lic_ok, "doc_id")
        ).localCheckpoint()
        q_ok = gated.where(F.col("reason") == "ok").select("doc_id")
        n_q_ok = q_ok.count()

        survivors = files.join(q_ok, "doc_id")
        keepers = (
            survivors.select("doc_id", F.md5("content").alias("__h"))
            .groupBy("__h")
            .agg(F.min("doc_id").alias("keeper_id"))
            .select(F.col("keeper_id").alias("doc_id"))
        )
        n_kept = keepers.count()

        kept_files = survivors.join(keepers, "doc_id")
        samples = fim_transform(
            kept_files,
            fim_pct=args.fim_pct,
            spm_pct=args.spm_pct,
            text_col="content",
        )
        samples.write.mode("overwrite").parquet(f"{args.output}/samples")
        n_samples = spark.read.parquet(f"{args.output}/samples").count()
        n_fim = (
            spark.read.parquet(f"{args.output}/samples")
            .where(F.col("mode") != "ar")
            .count()
        )

        manifest = (
            lic.join(
                gated.select("doc_id", F.col("reason").alias("gate_reason")),
                "doc_id",
                "left",
            )
            .join(
                keepers.withColumn("kept", F.lit(True)), "doc_id", "left"
            )
            .select(
                "doc_id",
                "license_id",
                "family",
                "via",
                F.coalesce("gate_reason", F.lit("license_blocked")).alias(
                    "gate_reason"
                ),
                F.coalesce("kept", F.lit(False)).alias("kept"),
            )
        )
        manifest.write.mode("overwrite").parquet(
            f"{args.output}/gate_manifest"
        )

        summary = {
            "n_files": n_files,
            "n_license_ok": n_lic_ok,
            "n_quality_ok": n_q_ok,
            "n_after_dedup": n_kept,
            "n_samples": n_samples,
            "n_fim_samples": n_fim,
            "allow_families": sorted(fams),
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
