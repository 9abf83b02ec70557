"""JSONL corpus source: newline-delimited JSON documents -> docs frame.

Web corpora interchange as JSONL at least as often as WARC (one JSON
object per line: doc id, text, metadata). This source honors the same
tolerant contract as sources/warc.py: malformed input becomes ERROR
ROWS, never exceptions (reference analogue: the quality-gate taxonomy,
src/scraper.ts error tagging) — a single corrupt line in a 100 TB dump
must not kill a task, let alone the job.

Spark shape & scale:
  * ``spark.read.text`` — line-oriented, so files SPLIT on
    ``spark.sql.files.maxPartitionBytes`` (unlike binaryFile/WARC where
    the file is the task); a 1 TB JSONL shard fans out across tasks for
    free.
  * Parsing is ``from_json`` — JVM-side Jackson inside whole-stage
    codegen; no Python touches the hot path.
  * Schema drift is declarative: fields absent from a line parse as
    NULL, unknown extra fields are ignored; adding a column to the
    expected schema never requires re-reading old shards.
  * Corrupt lines surface via PERMISSIVE mode's corrupt-record column
    and are tagged ``MalformedJsonError``; structurally-valid lines
    missing required fields are tagged ``MissingFieldError``. Blank
    lines (a trailing newline is idiomatic JSONL) are skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt"


def jsonl_schema(extra_fields: dict[str, T.DataType] | None = None) -> T.StructType:
    """Expected-document schema: doc_id + text + source plus caller
    extras, with the PERMISSIVE corrupt-record column appended."""
    fields = [
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
    for name, dtype in (extra_fields or {}).items():
        fields.append(T.StructField(name, dtype))
    fields.append(T.StructField(_CORRUPT, T.StringType()))
    return T.StructType(fields)


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    extra_fields: dict[str, T.DataType] | None = None,
) -> DataFrame:
    """Read a JSONL directory/file into (doc_id, text, source, extras...,
    error): error is NULL for clean rows, 'MalformedJsonError' for
    unparseable lines, 'MissingFieldError' for parsed lines lacking
    doc_id or text."""
    schema = jsonl_schema(extra_fields)
    lines = spark.read.text(path).where(F.length(F.trim(F.col("value"))) > 0)
    parsed = lines.select(
        F.from_json(
            "value",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("r")
    )
    error = (
        F.when(F.col(f"r.{_CORRUPT}").isNotNull(), F.lit("MalformedJsonError"))
        .when(
            F.col("r.doc_id").isNull() | F.col("r.text").isNull(),
            F.lit("MissingFieldError"),
        )
        .otherwise(F.lit(None).cast("string"))
    ).alias("error")
    keep = [f.name for f in schema.fields if f.name != _CORRUPT]
    # a malformed line's partial fields are noise, not data: null them out
    cols = [
        F.when(F.col(f"r.{_CORRUPT}").isNull(), F.col(f"r.{name}"))
        .otherwise(F.lit(None).cast(dict((f.name, f.dataType) for f in schema.fields)[name]))
        .alias(name)
        for name in keep
    ]
    return parsed.select(*cols, error)


def jsonl_to_docs(jsonl_df: DataFrame) -> DataFrame:
    """Clean JSONL rows -> the engine's docs(doc_id, spans) shape,
    JVM-side (same contract as sources/warc.warc_to_docs). Error rows
    are EXCLUDED — surface them from the `error` column before calling
    this (the extract job counts and reports them); feeding them
    onward would mislabel parse failures as empty-document failures."""
    return jsonl_df.where(F.col("error").isNull()).select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
