"""Text-mining queries (session-8/9 family): TextTiling segmentation,
keyword extraction, OCR-garbage rules, homoglyph/confusable spoof
detection. Oracles live in reader_spark/oracles.py under the same
keys."""

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


def _q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 RAKE keyphrases per document (ops.keywords.rake_keywords,
    Rose et al. 2010): stopword-delimited candidate phrases, integer
    milli-unit word scores deg*1000 div freq, phrase score = member-word
    sum, deterministic (score desc, phrase asc) election. Every shuffle
    doc-keyed; word stats group on (doc_id, word) — no corpus-global
    state."""
    from reader_spark.ops.keywords import rake_keywords

    docs = _read(spark, sf_dir, "documents")
    return rake_keywords(docs, k=10)


def _q_ocr_garbage_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OCR-garbage profile (ops.ocr.ocr_garbage_profile,
    Taghva garbage rules / Kulp-Kontostathis Rmgarbage): six per-token
    rules (overlong, symbol-heavy, repeated-glyph run, vowel-less,
    punctuation shrapnel, case alternation) aggregated in ONE doc-keyed
    map-side-combined groupBy. Docs with doc_id%4==0 get a deterministic
    planted damage suffix (one token per rule family); clean docs must
    profile zero."""
    from pyspark.sql import functions as F

    from reader_spark.ops.ocr import PLANT_SUFFIX, ocr_garbage_profile

    docs = _read(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(PLANT_SUFFIX)),
        ).otherwise(F.col("text")),
    )
    return ocr_garbage_profile(planted)


def _q_homoglyph_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document homoglyph spoof evidence (ops.confusables, UTS #39):
    mixed-script token counts, spoof suspects (mixed script AND
    confusable present), confusable char totals, and the md5 of the
    UTS-skeleton transform. Docs with doc_id%5==0 get a planted
    Cyrillic-spoof suffix; clean docs must profile zero. One token
    explode + ONE doc-keyed aggregate."""
    from pyspark.sql import functions as F

    from reader_spark.ops.confusables import (
        HOMOGLYPH_PLANT,
        homoglyph_profile,
    )

    docs = _read(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(HOMOGLYPH_PLANT)),
        ).otherwise(F.col("text")),
    )
    return homoglyph_profile(planted)


def _q_domain_spoof_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skeleton-collision spoof pairs (ops.confusables.spoof_pairs):
    every source domain gets a deterministic Cyrillic-s spoof twin; the
    pair table groups names BY SKELETON and joins within collision
    groups (equi-join, never all-pairs), recovering each (legit, spoof)
    pair exactly once."""
    from pyspark.sql import functions as F

    from reader_spark.ops.confusables import spoof_pairs

    docs = _read(spark, sf_dir, "documents")
    legit = docs.select(F.col("source").alias("name")).distinct()
    spoofed = legit.select(
        F.translate(F.col("name"), "s", "ѕ").alias("name")
    )
    return spoof_pairs(legit.unionByName(spoofed)).orderBy("skeleton")


def _planted_quotes(docs: DataFrame) -> DataFrame:
    """Deterministic quote plant: docs %3==0 get an attributed quote
    whose content varies per doc (md5 prefix); docs %9==0 additionally
    get a plain unattributed quote."""
    from pyspark.sql import functions as F

    d = F.col("doc_id")
    withsaid = F.when(
        d % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(' He said "'),
            F.substring(F.md5(d.cast("string")), 1, 8),
            F.lit(' quoted span" done.'),
        ),
    ).otherwise(F.col("text"))
    out = docs.withColumn("text", withsaid)
    return out.withColumn(
        "text",
        F.when(
            d % 9 == 0, F.concat(F.col("text"), F.lit(' "plain extra"'))
        ).otherwise(F.col("text")),
    )


def _q_quote_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document dialogue-density profile (ops.quotes.quote_profile):
    quote count, attributed-quote count (attribution verb within 40
    chars of the opening quote), quoted chars, and the quoted share in
    milli-units — pure per-row regex expressions, NO shuffle. Quotes
    are planted deterministically (md5-varying content); clean docs
    must profile zero."""
    from reader_spark.ops.quotes import quote_profile

    docs = _read(spark, sf_dir, "documents")
    return quote_profile(_planted_quotes(docs))


def _q_quote_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-quote corpus table (ops.quotes.quote_spans): every
    quoted span in document order with its word count — the attribution
    /fact-checking substrate. Bounded posexplode per document."""
    from reader_spark.ops.quotes import quote_spans

    docs = _read(spark, sf_dir, "documents")
    return quote_spans(_planted_quotes(docs))


def _q_rouge_l_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L near-duplicate pairs (ops/rouge.rouge_l_pairs — the
    self-instruct dedup criterion, Wang et al. ACL 2023 / Lin 2004):
    token-LCS via the Hunt-Szymanski match-list -> patience-LIS fold as
    pure Spark array expressions, candidates needing >= 2 shared rare
    3-grams under a df guard (the LSH multi-band-hit discipline), exact
    integer milli F scores at self-instruct's published 0.7 cut."""
    from reader_spark.ops.rouge import rouge_l_pairs

    docs = _read(spark, sf_dir, "documents")
    return rouge_l_pairs(docs, n=3, max_df=20, trunc=40, threshold_milli=700)


QUERIES = {
    "texttiling_gaps": _q_texttiling_gaps,
    "texttiling_segments": _q_texttiling_segments,
    "rake_keywords": _q_rake_keywords,
    "ocr_garbage_profile": _q_ocr_garbage_profile,
    "homoglyph_profile": _q_homoglyph_profile,
    "quote_profile": _q_quote_profile,
    "quote_spans": _q_quote_spans,
    "domain_spoof_pairs": _q_domain_spoof_pairs,
    "rouge_l_near_dups": _q_rouge_l_near_dups,
}
