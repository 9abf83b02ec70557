"""WARC-style web-archive source: crawl capture files -> docs frame.

The reference fetches pages live (src/engines/playwright/index.ts); a batch
engine reads the crawl's ARCHIVE instead. This module implements the
ingestion path for WARC-shaped record streams (ISO 28500 structure,
simplified: version line, CRLF header block, Content-Length-framed payload,
CRLF CRLF record gap):

    WARC/1.0
    WARC-Type: response
    WARC-Target-URI: https://example.com/
    Content-Length: 123

    <html>...</html>

Spark shape: ``spark.read.format("binaryFile")`` scans the archive files
(one row per file), a mapInPandas stage splits records and emits
(doc_id=target URI, payload, status) — extraction-ready for
spark/job.extract_dataframe via docs rows.

Scale notes (100 TB of WARCs):
  * Real crawl archives are written as per-record gzip members precisely so
    readers can split INSIDE a file on member boundaries. binaryFile cannot
    split a file (one row per file); production WARCs are already sized
    ~1 GiB for this reason, so file-granularity IS the task granularity:
    100 TB / 1 GiB = ~100k tasks, a healthy wave count on 4k cores.
  * The splitter emits narrow rows (uri, payload) straight into the fused
    extraction UDF — archive bytes never cross a shuffle.
  * ``spark.sql.files.maxPartitionBytes`` does not apply to binaryFile
    (no splitting); bound memory with smaller archive files, not conf.

Synthesis is deterministic (fixtures + tests only; no external data).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CRLF = "\r\n"


def synth_warc_bytes(records: List[Tuple]) -> bytes:
    """Serialize (uri, html, status[, warc_date]) tuples into a WARC-style
    byte stream. warc_date (ISO-8601) marks the capture time — archives
    routinely hold multiple captures of one URI."""
    out: list[bytes] = []
    for rec in records:
        uri, html, status = rec[0], rec[1], rec[2]
        date = rec[3] if len(rec) > 3 else None
        payload = html.encode("utf-8")
        date_line = f"WARC-Date: {date}{_CRLF}" if date else ""
        head = (
            f"WARC/1.0{_CRLF}"
            f"WARC-Type: response{_CRLF}"
            f"WARC-Target-URI: {uri}{_CRLF}"
            f"{date_line}"
            f"WARC-Status: {status}{_CRLF}"
            f"Content-Length: {len(payload)}{_CRLF}"
            f"{_CRLF}"
        ).encode("utf-8")
        out.append(head + payload + _CRLF.encode() * 2)
    return b"".join(out)


def parse_warc_records(
    blob: bytes, record_type: str = "response"
) -> List[dict]:
    """Tolerant record splitter: Content-Length-framed, skips records with
    missing/invalid framing instead of raising (error rows, not exceptions,
    per the engine's T5 rule). Transparently inflates gzip input —
    production WARCs are concatenated per-record gzip members
    (.warc.gz), which zlib inflates as one stream."""
    if blob[:2] == b"\x1f\x8b":
        import zlib

        out: list[bytes] = []
        pos = 0
        while pos < len(blob) and blob[pos : pos + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)  # one gzip member
            try:
                out.append(d.decompress(blob[pos:]))
            except zlib.error:
                break  # corrupt member: keep what inflated so far
            consumed = len(blob) - pos - len(d.unused_data)
            if consumed <= 0:
                break
            pos += consumed
        blob = b"".join(out)
    records: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/", pos)
        if start == -1:
            break
        head_end = blob.find(b"\r\n\r\n", start)
        if head_end == -1:
            break
        headers: dict[str, str] = {}
        for line in blob[start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.strip().decode("utf-8", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        body_start = head_end + 4
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = body_start  # unframed record: resync on next magic
            continue
        body = blob[body_start : body_start + length]
        uri = headers.get("warc-target-uri")
        if uri and headers.get("warc-type", "response") == record_type:
            try:
                status = int(headers.get("warc-status", "200") or 200)
            except ValueError:
                # tolerant-splitter contract: a garbled status header makes
                # a default-status row, never a failed archive/task
                status = 200
            records.append(
                {
                    "doc_id": uri,
                    "payload": body.decode("utf-8", "replace"),
                    "status": status,
                    "capture_ts": headers.get("warc-date"),
                }
            )
        pos = body_start + length
    return records


WARC_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("capture_ts", T.StringType(), True),
        T.StructField("archive", T.StringType(), True),
    ]
)


def read_warc(
    spark: SparkSession, path: str, record_type: str = "response"
) -> DataFrame:
    """Archive files -> (doc_id, payload, status, archive) rows.

    binaryFile scan (one task per archive file) -> Arrow-batched splitter.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def split_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = {k.name: [] for k in WARC_DOCS_SCHEMA.fields}
            for path_, content in zip(batch["path"].tolist(), batch["content"].tolist()):
                for rec in parse_warc_records(bytes(content), record_type):
                    rows["doc_id"].append(rec["doc_id"])
                    rows["payload"].append(rec["payload"])
                    rows["status"].append(rec["status"])
                    rows["capture_ts"].append(rec["capture_ts"])
                    rows["archive"].append(path_)
            yield pd.DataFrame(rows)

    return files.mapInPandas(split_batch, schema=WARC_DOCS_SCHEMA)


def latest_captures(warc_df: DataFrame) -> DataFrame:
    """ONE row per URI: archives hold multiple captures of the same page;
    keep the newest by WARC-Date (ties/missing dates: archive path then
    payload as deterministic tie-breaks). Window + filter — the narrow
    (doc_id, ts) ranking shuffles with the rows once."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("doc_id").orderBy(
        F.col("capture_ts").desc_nulls_last(),
        F.col("archive").desc(),
        F.col("payload").desc(),
    )
    return (
        warc_df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def warc_to_docs(warc_df: DataFrame, dedup_captures: bool = True) -> DataFrame:
    """(doc_id, payload, ...) -> the engine's docs(doc_id, spans) shape,
    JVM-side (no Python). doc_id is the capture URI, which extract_dataframe
    then uses as the base URL for link/image absolutification
    (base_url_prefix=''). dedup_captures keeps only the latest capture per
    URI (duplicate doc_ids would silently survive id-keyed dedup joins
    downstream)."""
    from pyspark.sql import functions as F

    if dedup_captures:
        warc_df = latest_captures(warc_df)
    return warc_df.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.col("payload").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )


def warc_record_col(
    uri: "Column",
    payload: "Column",
    status: "Column",
    date: "Column | None" = None,
) -> "Column":
    """One capture -> its WARC/1.0 response record as a string column,
    JVM-side (CRLF framing, Content-Length in UTF-8 OCTETS via
    octet_length — char length corrupts framing on multibyte text)."""
    from pyspark.sql import functions as F

    p = F.coalesce(payload, F.lit(""))
    parts = [
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        uri,
        F.lit("\r\n"),
    ]
    if date is not None:
        # null-safe: a NULL date drops the header line, not the record
        parts += [
            F.when(
                date.isNotNull(),
                F.concat(F.lit("WARC-Date: "), date, F.lit("\r\n")),
            ).otherwise(F.lit(""))
        ]
    parts += [
        F.lit("WARC-Status: "),
        status.cast("string"),
        F.lit("\r\nContent-Length: "),
        F.octet_length(p).cast("string"),
        F.lit("\r\n\r\n"),
        p,
        F.lit("\r\n\r\n"),
    ]
    return F.concat(*parts)


def write_warc(
    df: DataFrame,
    path: str,
    shards: int = 8,
    uri_col: str = "doc_id",
    payload_col: str = "payload",
    status_col: str = "status",
    date_col: str | None = "capture_ts",
) -> None:
    """The archive SINK closing the WARC round-trip (read_warc is the
    source): rows -> WARC/1.0 response records -> shard=NN/ text files.

    Deterministic end to end: shard = xxhash64(uri) mod shards (re-runs
    reproduce shard membership), one task per shard via
    repartition(shard) + sortWithinPartitions(uri) (re-runs reproduce
    BYTES, pinned by test). The text writer's row separator adds one
    LF between records; parse_warc_records' magic-resync framing
    ignores it, so read_warc(write_warc(df)) == df record-for-record.
    No Python in the write path."""
    from pyspark.sql import functions as F

    date = F.col(date_col) if date_col else None
    rec = warc_record_col(
        F.col(uri_col), F.col(payload_col), F.col(status_col), date
    )
    shard = F.pmod(F.xxhash64(F.col(uri_col)), F.lit(shards)).cast("int")
    (
        df.select(shard.alias("shard"), F.col(uri_col).alias("__uri"),
                  rec.alias("value"))
        .repartition(shards, "shard")
        .sortWithinPartitions("shard", "__uri")
        .drop("__uri")
        .write.mode("overwrite")
        .partitionBy("shard")
        .text(path)
    )


def wet_record_col(
    uri: "Column",
    text: "Column",
    date: "Column | None" = None,
) -> "Column":
    """One extracted document -> its WET conversion record (the Common
    Crawl text-sidecar format: a WARC/1.0 record with WARC-Type:
    conversion and a text/plain body; iipc/warc-specifications
    "WARC-Type: conversion", Common Crawl's *.warc.wet.gz). The
    WARC-Refers-To urn is derived deterministically from the source URI
    (xxhash64) so a WET shard re-links to its response record without
    carrying state. Same CRLF/octet-length framing discipline as
    warc_record_col — char length corrupts framing on multibyte text."""
    from pyspark.sql import functions as F

    t = F.coalesce(text, F.lit(""))
    parts = [
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        uri,
        F.lit("\r\n"),
    ]
    if date is not None:
        parts += [
            F.when(
                date.isNotNull(),
                F.concat(F.lit("WARC-Date: "), date, F.lit("\r\n")),
            ).otherwise(F.lit(""))
        ]
    parts += [
        F.lit("WARC-Refers-To: urn:xxh64:"),
        F.lower(F.hex(F.xxhash64(uri))),
        F.lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.octet_length(t).cast("string"),
        F.lit("\r\n\r\n"),
        t,
        F.lit("\r\n\r\n"),
    ]
    return F.concat(*parts)


def write_wet(
    df: DataFrame,
    path: str,
    shards: int = 8,
    uri_col: str = "doc_id",
    text_col: str = "text",
    date_col: str | None = None,
) -> None:
    """The WET SINK: extracted text -> sharded conversion-record files,
    closing the Common Crawl trifecta next to write_warc (responses)
    and the CDX index (ops/cdx.py). Deterministic bytes end to end —
    same xxhash64 shard election + within-shard URI sort as write_warc,
    so re-runs reproduce files byte-for-byte (pinned by test). No
    Python in the write path; read_wet() round-trips the records."""
    from pyspark.sql import functions as F

    date = F.col(date_col) if date_col else None
    rec = wet_record_col(F.col(uri_col), F.col(text_col), date)
    shard = F.pmod(F.xxhash64(F.col(uri_col)), F.lit(shards)).cast("int")
    (
        df.select(shard.alias("shard"), F.col(uri_col).alias("__uri"),
                  rec.alias("value"))
        .repartition(shards, "shard")
        .sortWithinPartitions("shard", "__uri")
        .drop("__uri")
        .write.mode("overwrite")
        .partitionBy("shard")
        .text(path)
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET files -> (doc_id, payload, status, capture_ts, archive) rows
    (status defaults to 200 — conversion records carry none). The same
    tolerant magic-resync splitter as read_warc, filtered to
    WARC-Type: conversion."""
    return read_warc(spark, path, record_type="conversion")
