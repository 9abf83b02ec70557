"""Explicit StructTypes — schemas are always declared, never inferred
(matching the reference's fixed TypeScript interfaces, SURVEY.md §1)."""

from __future__ import annotations

from pyspark.sql import types as T

# Input: docs(doc_id, spans) per BASELINE.json input_hint.
IN_SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(IN_SPAN_TYPE), True),
    ]
)

# Output spans carry `order` (dense 0-based document order) instead of offset.
OUT_SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("order", T.IntegerType(), True),
    ]
)

# WebsiteMetadata (src/types.ts:240-280): 11 scalar fields + keywords array
# + two nested structs that collapse to null when all-empty.
OPEN_GRAPH_TYPE = T.StructType(
    [
        T.StructField(name, T.StringType(), True)
        for name in ("title", "description", "type", "url", "image", "siteName", "locale")
    ]
)

TWITTER_TYPE = T.StructType(
    [
        T.StructField(name, T.StringType(), True)
        for name in ("card", "site", "creator", "title", "description", "image")
    ]
)

METADATA_TYPE = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("charset", T.StringType(), True),
        T.StructField("favicon", T.StringType(), True),
        T.StructField("canonical", T.StringType(), True),
        T.StructField("image", T.StringType(), True),
        T.StructField("keywords", T.ArrayType(T.StringType()), True),
        T.StructField("robots", T.StringType(), True),
        T.StructField("themeColor", T.StringType(), True),
        T.StructField("openGraph", OPEN_GRAPH_TYPE, True),
        T.StructField("twitter", TWITTER_TYPE, True),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(OUT_SPAN_TYPE), True),
        T.StructField("markdown", T.StringType(), True),
        T.StructField("metadata", METADATA_TYPE, True),
        T.StructField("error_kind", T.StringType(), True),
        T.StructField("error_msg", T.StringType(), True),
        T.StructField("run_id", T.StringType(), True),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("bytes_in", T.LongType(), True),
        T.StructField("bytes_out", T.LongType(), True),
    ]
)

# Sidecar: per-partition lineage/metrics (BatchMetadata analogue,
# src/types.ts:352-370).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("doc_count", T.LongType(), True),
        T.StructField("ok_count", T.LongType(), True),
        T.StructField("err_count", T.LongType(), True),
        T.StructField("bytes_in", T.LongType(), True),
        T.StructField("bytes_out", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)
