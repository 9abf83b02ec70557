"""Text-mining queries (session-8 family): TextTiling segmentation,
keyword extraction, OCR-garbage rules. Oracles live in
reader_spark/oracles.py under the same keys."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TILE_W, TILE_K = 8, 2


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _q_texttiling_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling per-gap score table (ops.tiling.texttiling_gaps,
    Hearst 1997): squared-cosine block similarity in integer micro-units
    (w=8-token blocks, k=2 comparison window), run-group climb-to-peak
    depth scores, and Hearst's mean - sd/2 boundary cutoff evaluated as
    a pure-integer inequality. Every shuffle is doc-keyed; per-gap state
    is bounded by w*k tokens per side."""
    from reader_spark.ops.tiling import texttiling_gaps

    docs = _read(spark, sf_dir, "documents")
    return texttiling_gaps(docs, w=TILE_W, k=TILE_K)


def _q_texttiling_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary gaps rolled into topical segments (ops.tiling.
    texttiling_segments): seg_id = running boundary count, per-segment
    gap span + max depth — the coherent-chunk spans ops/chunks.py
    multiplies by w for token offsets."""
    from reader_spark.ops.tiling import texttiling_gaps, texttiling_segments

    docs = _read(spark, sf_dir, "documents")
    return texttiling_segments(texttiling_gaps(docs, w=TILE_W, k=TILE_K))


QUERIES = {
    "texttiling_gaps": _q_texttiling_gaps,
    "texttiling_segments": _q_texttiling_segments,
}
