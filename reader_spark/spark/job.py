"""The extraction job: docs(doc_id, spans) -> extracted + lineage.

Spark re-expression of the reference's imperative per-URL loop
(src/scraper.ts:68-418) as ONE lazy DataFrame chain (SURVEY.md §3.1):

    scan -> resume anti-join -> size-bucket salted repartition
         -> fused mapInPandas (C9, X*, C1-C8, C10, M1, M2, C11, C12, T5)
         -> write extracted -> aggregate lineage sidecar

Scale notes:
  * Payload reassembly (offset-sorted span concat) happens JVM-side with
    native array functions — the Python stage receives exactly two columns
    (doc_id, payload): column pruning reaches the scan.
  * The fused UDF is ONE Arrow round-trip per batch; the reference pays a
    Node->Rust NAPI hop per document (SURVEY.md §4.2).
  * Oversized-document skew (north_rule): extraction compute is ~linear in
    payload BYTES, so byte-split file scans (parquet/Iceberg
    maxPartitionBytes) are already compute-balanced — the default 'scan'
    mode adds NO shuffle (measured: a forced range-shuffle of payload bytes
    cost 2-5x wall). Memory skew is handled by the session factory's
    Arrow maxBytesPerBatch cap (a run of 2 MiB giants auto-shrinks its
    batches). For row-split sources (JDBC, createDataFrame) where one input
    partition can hold a byte-skewed clump, 'isolate' splits the heavy tail
    (payload > giant_threshold) into its own salted hash-repartition and
    unions the two branches after extraction — only giant bytes shuffle.
  * Checkpoint resume: anti-join against the committed doc_id set read from
    the output table (snapshot-isolated under Iceberg) — north_rule J5.
"""

from __future__ import annotations

import time
from typing import Iterator, Optional

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, ExtractorConfig
from ..extract.pipeline import extract_document
from ..fixtures import BASE_URL_PREFIX
from .fanout import fanout_scan
from .schemas import DOCS_SCHEMA, EXTRACTED_SCHEMA, LINEAGE_SCHEMA

# mapInPandas output: extraction result + per-row partition metrics
# (elapsed_ms is "ms since partition start" — max() per partition = wall).
_UDF_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,order:int>>, "
    "markdown string, "
    "metadata struct<title:string,description:string,author:string,"
    "language:string,charset:string,favicon:string,canonical:string,"
    "image:string,keywords:array<string>,robots:string,themeColor:string,"
    "openGraph:struct<title:string,description:string,type:string,url:string,"
    "image:string,siteName:string,locale:string>,"
    "twitter:struct<card:string,site:string,creator:string,title:string,"
    "description:string,image:string>>, "
    "error_kind string, error_msg string, "
    "partition_id int, bytes_in long, bytes_out long, elapsed_ms long"
)

PAYLOAD_EXPR = (
    "array_join(transform(array_sort(spans, (a, b) -> a.offset - b.offset), "
    "s -> s.text), '')"
)


def docs_from_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


def with_payload(docs: DataFrame, base_url_prefix: str = BASE_URL_PREFIX) -> DataFrame:
    """Reassemble the raw payload and derive base_url — all JVM-side.
    payload_kind (the first span's kind) routes pdf_text docs to the PDF
    layout parser inside the same fused UDF."""
    return docs.select(
        "doc_id",
        F.expr(PAYLOAD_EXPR).alias("payload"),
        F.concat(F.lit(base_url_prefix), F.col("doc_id")).alias("base_url"),
        F.coalesce(F.element_at("spans", 1)["kind"], F.lit("html")).alias(
            "payload_kind"
        ),
    )


GIANT_THRESHOLD = 256 * 1024  # bytes; ~0.1% heavy tail per FIXTURES.md


def isolate_giants(
    df: DataFrame,
    num_partitions: Optional[int] = None,
    giant_threshold: int = GIANT_THRESHOLD,
) -> tuple[DataFrame, DataFrame]:
    """Skew defense for row-split sources: split the heavy tail out so a
    clump of oversized docs in one input partition cannot become a straggler
    task. Giants are ROUND-ROBIN-spread (repartition without a key): a giant
    costs ~500x a typical doc, so max-giants-per-partition IS the tail
    latency, and hash-by-doc_id leaves Poisson clumps (e.g. 40 giants over 8
    partitions -> some partition draws 8+). Only giant bytes shuffle.
    Returns (small, giants)."""
    is_giant = F.length("payload") > giant_threshold
    small = df.where(~is_giant)
    giants = df.where(is_giant)
    if num_partitions is None:
        # 2x parallelism: giant tasks are the longest in the job, so halving
        # their size halves the last-wave tail when task count ~ core count.
        num_partitions = 2 * df.sparkSession.sparkContext.defaultParallelism
    giants = giants.repartition(num_partitions)
    return small, giants


def make_extract_batch(cfg: ExtractorConfig):
    """Build the fused mapInPandas callable closed over a (broadcastable)
    ExtractorConfig. One Python hop per Arrow batch."""

    def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        partition_id = ctx.partitionId() if ctx is not None else -1
        start = time.monotonic()
        for batch in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "spans": [],
                "markdown": [],
                "metadata": [],
                "error_kind": [],
                "error_msg": [],
                "partition_id": [],
                "bytes_in": [],
                "bytes_out": [],
                "elapsed_ms": [],
            }
            # .tolist() up front: iterating a pandas Series yields wrapped
            # scalars with per-item overhead; plain-list zip is measurably
            # cheaper on large batches.
            for doc_id, payload, base_url, payload_kind in zip(
                batch["doc_id"].tolist(),
                batch["payload"].tolist(),
                batch["base_url"].tolist(),
                batch["payload_kind"].tolist(),
            ):
                res = extract_document(
                    doc_id, payload or "", base_url, cfg, payload_kind or "html"
                )
                out["doc_id"].append(res.doc_id)
                # tuples in schema field order — Arrow accepts them for
                # structs and they build ~3x faster than per-span dicts
                out["spans"].append(
                    [
                        (s.kind, s.text, s.media_ref, i)
                        for i, s in enumerate(res.spans)
                    ]
                )
                out["markdown"].append(res.markdown)
                out["metadata"].append(res.metadata)
                out["error_kind"].append(res.error_kind)
                out["error_msg"].append(res.error_msg)
                out["partition_id"].append(partition_id)
                out["bytes_in"].append(len(payload or ""))
                out["bytes_out"].append(len(res.markdown))
                out["elapsed_ms"].append(int((time.monotonic() - start) * 1000))
            yield pd.DataFrame(out)

    return extract_batch


def extract_dataframe(
    docs: DataFrame,
    cfg: ExtractorConfig = DEFAULT_CONFIG,
    base_url_prefix: str = BASE_URL_PREFIX,
    num_partitions: Optional[int] = None,
    skew_mode: str = "scan",
) -> DataFrame:
    """docs(doc_id, spans) -> extracted rows (lazy; no I/O).

    skew_mode:
      'scan'    (default) no shuffle — byte-split file scans are already
                compute-balanced; num_partitions (if set) adds a plain
                hash repartition for row-split sources.
      'isolate' split giants into their own hash-shuffled branch, union
                after extraction (only giant bytes move).
    """
    payloads = with_payload(docs, base_url_prefix)
    udf = make_extract_batch(cfg)
    if skew_mode == "isolate":
        small, giants = isolate_giants(payloads, num_partitions)
        if num_partitions:
            small = small.repartition(num_partitions, "doc_id")
        return small.mapInPandas(udf, schema=_UDF_SCHEMA).unionByName(
            giants.mapInPandas(udf, schema=_UDF_SCHEMA)
        )
    if num_partitions:
        payloads = payloads.repartition(num_partitions, "doc_id")
    else:
        # Scan-starved guard: the per-doc Python extraction amplifies
        # per-row cost by orders of magnitude over the scan, so a small
        # corpus read from one parquet file (scan partitions < cores —
        # row-group granularity caps file splits) would pin most cores
        # idle. No-op whenever the scan already carries >= cores
        # partitions, i.e. always at production scale.
        payloads = fanout_scan(payloads)
    return payloads.mapInPandas(udf, schema=_UDF_SCHEMA)


def run_extraction(
    spark: SparkSession,
    docs: DataFrame,
    warehouse,
    run_id: str,
    cfg: ExtractorConfig = DEFAULT_CONFIG,
    base_url_prefix: str = BASE_URL_PREFIX,
    resume: bool = True,
    num_partitions: Optional[int] = None,
) -> dict:
    """Full job: resume anti-join -> extract -> write extracted + lineage.

    Returns driver-side run metrics (the ScrapeResult/BatchMetadata analogue,
    scraper.ts:390-418).
    """
    started = time.monotonic()

    if resume:
        committed = warehouse.read_or_none("extracted")
        if committed is not None:
            docs = docs.join(
                committed.select("doc_id").distinct(), "doc_id", "left_anti"
            )

    extracted = (
        extract_dataframe(docs, cfg, base_url_prefix, num_partitions)
        .withColumn("run_id", F.lit(run_id))
    )
    warehouse.write(
        extracted.select([f.name for f in EXTRACTED_SCHEMA.fields] + ["elapsed_ms"]),
        "extracted",
        mode="append",
    )

    written = warehouse.read("extracted").where(F.col("run_id") == run_id)
    lineage = (
        written.groupBy("run_id", "partition_id")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum(F.when(F.col("error_kind").isNull(), 1).otherwise(0)).alias("ok_count"),
            F.sum(F.when(F.col("error_kind").isNotNull(), 1).otherwise(0)).alias("err_count"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("bytes_out").alias("bytes_out"),
            F.max("elapsed_ms").alias("wall_ms"),
            F.current_timestamp().alias("ts"),
        )
        .select([f.name for f in LINEAGE_SCHEMA.fields])
    )
    warehouse.write(lineage, "lineage", mode="append")

    totals = written.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("error_kind").isNull(), 1).otherwise(0)).alias("ok"),
    ).collect()[0]
    wall = time.monotonic() - started
    return {
        "run_id": run_id,
        "totalDocs": totals["total"],
        "successfulDocs": totals["ok"] or 0,
        "failedDocs": totals["total"] - (totals["ok"] or 0),
        "totalDuration_s": round(wall, 3),
        "docs_per_sec": round(totals["total"] / wall, 2) if wall > 0 else None,
    }
