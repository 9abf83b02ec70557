"""Structured Streaming form of the extraction job.

The reference is a request/response daemon (SURVEY.md §2.8) — its streaming
analogue is a continuously-arriving docs table. Here: file-source readStream
over the docs directory -> the SAME fused mapInPandas extraction -> sink.
Exactly-once lands via checkpointLocation + idempotent doc_id keys; the
batch job's anti-join resume and the stream's checkpoint are the same
contract at two cadences.

Throttling analogue of the reference's rate limiter (T2, rate-limiter.ts):
maxFilesPerTrigger bounds per-microbatch intake.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..config import DEFAULT_CONFIG, ExtractorConfig
from ..fixtures import BASE_URL_PREFIX
from ..spark.job import _UDF_SCHEMA, make_extract_batch, with_payload
from ..spark.schemas import DOCS_SCHEMA


def extract_stream(
    spark: SparkSession,
    docs_dir: str,
    cfg: ExtractorConfig = DEFAULT_CONFIG,
    base_url_prefix: str = BASE_URL_PREFIX,
    max_files_per_trigger: Optional[int] = None,
    redact: bool = False,
) -> DataFrame:
    """Streaming docs(doc_id, spans) -> streaming extracted rows (lazy).

    redact=True scrubs PII from prose spans in-flight (ops.multimodal.
    redact_spans — a stateless per-row projection, so it adds no state
    store and composes with any output mode); byte-parity with the batch
    path's redact_spans is pinned by test_streaming_multimodal.
    """
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_dir)
    payloads = with_payload(docs, base_url_prefix)
    out = payloads.mapInPandas(make_extract_batch(cfg), schema=_UDF_SCHEMA)
    if redact:
        from ..ops.multimodal import redact_spans

        out = redact_spans(out)
    return out


def start_extraction_stream(
    spark: SparkSession,
    docs_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractorConfig = DEFAULT_CONFIG,
    available_now: bool = True,
    redact: bool = False,
):
    """Start the stream to a parquet sink. available_now=True drains what
    exists and stops (batch-over-stream semantics for tests/backfills)."""
    extracted = extract_stream(spark, docs_dir, cfg, redact=redact)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
