"""Extraction-quality evaluation (CleanEval-style token scoring).

``extraction_eval`` measures WHAT the boilerplate-removal pipeline removes:
the C12 regex tag-strip (the naive arm every scraper starts from — the
reference's own fallback, src/formatters/markdown.ts:53) is scored against
the full readability pipeline's output as token-multiset precision /
recall / F1 per fixture page. This is the CleanEval evaluation protocol
(Baroni et al., "CleanEval: a competition for cleaning web pages", LREC
2008) with the pipeline output as the reference side: low naive PRECISION
on nav-heavy pages is the measured value of the DOM heuristics (the tokens
the pipeline refused to keep), and sub-1.0 RECALL is the markdown
serializer's added structure (link targets, image alts) that a bare
tag-strip can never produce.

Everything is JVM-side: tag-strip is the native regexp chain
(spark/columns.strip_tags_col), tokenization is split/explode, the multiset
intersection is one full-outer equi-join on (doc_id, token) — no Python in
the naive arm, and the pipeline arm reuses the fused Arrow-batch extractor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Content-ful HTML fixture classes (FIXTURES.md §3). Excludes: block pages
# (empty extraction by design), json-payload / pdf-* (not HTML), oversized
# (size-guard path, identical tokens at 1000x the eval cost), empty-page /
# scripts-only (both arms empty).
EVAL_DOC_IDS = (
    "simple-static",
    "generic-sample",
    "wikipedia-like",
    "saas-landing",
    "protected-content",
    "dialog-class-body",
    "kitchen-sink",
    "example-domain",
)


def _token_counts(df: DataFrame, text_col: Column) -> DataFrame:
    """(doc_id, token, n) multiset: lowercase alphanumeric runs."""
    toks = F.filter(
        F.split(F.lower(text_col), "[^a-z0-9]+"), lambda s: s != F.lit("")
    )
    return (
        df.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("n"))
    )


def _q_extraction_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fixture-page token P/R/F1 of naive tag-strip vs the pipeline.

    F1 uses the multiset identity 2*|A∩B| / (|A|+|B|), so it is exact even
    where the rounded precision/recall columns are displayed at 4 places.
    Golden-literal VALUES oracle (fixed fixture corpus, deterministic
    extractor) — the SQL form of a golden pytest assertion.
    """
    from reader_spark import fixtures
    from reader_spark.spark.columns import strip_tags_col
    from reader_spark.spark.job import docs_from_rows, extract_dataframe

    rows = [d for d in fixtures.fixture_docs() if d["doc_id"] in EVAL_DOC_IDS]
    docs = docs_from_rows(spark, rows)

    html = F.element_at(F.col("spans"), 1).getField("text")
    naive = _token_counts(
        docs.select("doc_id", strip_tags_col(html).alias("txt")), F.col("txt")
    ).withColumnRenamed("n", "nn")

    gold_txt = F.concat_ws(
        " ", F.transform("spans", lambda s: s.getField("text"))
    )
    gold = _token_counts(
        extract_dataframe(docs).select("doc_id", gold_txt.alias("txt")),
        F.col("txt"),
    ).withColumnRenamed("n", "ng")

    per_doc = (
        naive.join(gold, ["doc_id", "token"], "full_outer")
        .select(
            "doc_id",
            F.coalesce("nn", F.lit(0)).alias("nn"),
            F.coalesce("ng", F.lit(0)).alias("ng"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("nn").alias("n_naive"),
            F.sum("ng").alias("n_gold"),
            F.sum(F.least("nn", "ng")).alias("n_common"),
        )
    )
    safe = lambda num, den: F.when(  # noqa: E731 — one-expression ratio
        den > 0, F.round(num / den, 4)
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        "doc_id",
        F.col("n_naive").cast("long").alias("n_naive"),
        F.col("n_gold").cast("long").alias("n_gold"),
        F.col("n_common").cast("long").alias("n_common"),
        safe(F.col("n_common"), F.col("n_naive")).alias("precision"),
        safe(F.col("n_common"), F.col("n_gold")).alias("recall"),
        safe(
            F.lit(2) * F.col("n_common"), F.col("n_naive") + F.col("n_gold")
        ).alias("f1"),
    )


QUERIES = {
    "extraction_eval": _q_extraction_eval,
}
