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


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")

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


def _q_arm_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-arm extraction QA: run jusText (ops/justext.py) and
    Boilerpipe NumWordsRules (ops/boilerpipe.py) over the SAME block
    frame and report corpus-level agreement + Cohen's kappa — the
    monitoring metric a production extraction fleet tracks to catch one
    arm drifting (template change, threshold regression). Blocks are
    25-word chunks with a deterministic linked-fraction (0 / 0.5 / 1.0
    by (doc_id+3*blk_no)%5) feeding BOTH arms consistently (jusText
    takes it as chars, Boilerpipe as word density). The two window
    passes key on doc_id; the final fold is one partial-aggregated
    global row. Kappa stays engine-stable: every ratio is BIGINT/BIGINT
    and the expression order is identical in the oracle."""
    from reader_spark.ops.boilerpipe import boilerpipe_classify
    from reader_spark.ops.justext import justext_classify
    from reader_spark.ops.lines import chunk_lines

    docs = _read(spark, sf_dir, "documents")
    blocks = (
        chunk_lines(docs, words_per_line=25)
        .withColumnRenamed("line_no", "blk_no")
        .withColumnRenamed("line", "text")
    )
    m5 = (F.col("doc_id") + 3 * F.col("blk_no")) % 5
    ldf = F.when(m5 == 0, 0.5).when(m5 == 1, 1.0).otherwise(0.0)
    frame = (
        blocks.withColumn(
            "link_chars", F.floor(F.length("text") * ldf).cast("long")
        )
        .withColumn("num_words", F.size(F.split(F.col("text"), " ")))
        .withColumn("link_density", ldf)
    )
    j = justext_classify(
        frame,
        order_col="blk_no",
        stopwords=("a", "the", "table", "value"),
        length_low=70,
        length_high=120,
        stopwords_low=0.12,
        stopwords_high=0.18,
        max_link_density=0.2,
    ).select(
        "doc_id",
        "blk_no",
        (F.col("final_class") == "good").cast("long").alias("j_good"),
    )
    b = boilerpipe_classify(frame).select(
        "doc_id", "blk_no", F.col("is_content").cast("long").alias("b_good")
    )
    both = j.join(b, ["doc_id", "blk_no"])
    agg = both.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum((F.col("j_good") == F.col("b_good")).cast("long")).alias(
            "n_agree"
        ),
        F.sum("j_good").alias("n_good_justext"),
        F.sum("b_good").alias("n_good_boilerpipe"),
    )
    po = F.col("n_agree") / F.col("n_blocks")
    pa = F.col("n_good_justext") / F.col("n_blocks")
    pb = F.col("n_good_boilerpipe") / F.col("n_blocks")
    pe = pa * pb + (1 - pa) * (1 - pb)
    return agg.select(
        "n_blocks",
        "n_agree",
        "n_good_justext",
        "n_good_boilerpipe",
        F.round(po, 6).alias("agree_rate"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    )


def _q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier calibration (ops.evals.calibration_bins, Guo
    et al. 2017): the logit score (ops.textstats.quality_logit_score)
    binned against the Gopher rule battery's pass/fail as the label —
    how well the cheap continuous score predicts the expensive rule
    gate. Both score and label derive from one documents scan (co-keyed
    join); the reliability fold is a groupBy over the 10-bin dim. The
    companion one-row health number is ops.evals.
    expected_calibration_error (unit-tested; same fold)."""
    from reader_spark.ops.evals import calibration_bins
    from reader_spark.ops.textstats import (
        gopher_quality_columns,
        quality_logit_score,
    )

    docs = _read(spark, sf_dir, "documents")
    scored = quality_logit_score(docs).select("doc_id", "score")
    label = gopher_quality_columns(docs).select(
        "doc_id", F.when(F.col("gopher_pass"), 1).otherwise(0).alias("label")
    )
    return calibration_bins(scored.join(label, "doc_id"))


def _q_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR report card for a retrieval run (ops.evals.ranking_metrics):
    per-query MRR / NDCG@10 / Recall@10 over a deterministic 20-query
    run (ranks 1..10, doc = (q*31+7r)%200) against graded judgments
    (15 per query, rel = j%4, doc = (q*31+11j)%200) — overlap where
    7r ≡ 11j (mod 200). DCG/IDCG terms round to integer nanos before
    the order-free sum; qrels is the spine so zero-hit queries stay
    visible. Both folds key on the query id."""
    from reader_spark.ops.evals import ranking_metrics

    qs = (
        _read(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 20)
        .select(F.col("doc_id").alias("query_id"))
    )
    results = qs.select(
        "query_id", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("rank")
    ).withColumn(
        "doc_id", (F.col("query_id") * 31 + F.col("rank") * 7) % 200
    )
    qrels = qs.select(
        "query_id", F.explode(F.sequence(F.lit(0), F.lit(14))).alias("j")
    ).select(
        "query_id",
        ((F.col("query_id") * 31 + F.col("j") * 11) % 200).alias("doc_id"),
        (F.col("j") % 4).alias("rel"),
    )
    return ranking_metrics(results, qrels)


def _q_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic MinHash-LSH banding S-curve for the registry's default
    (b=16, r=4) banding (ops.evals.lsh_s_curve, MMDS §3.4): candidate
    probability per milli-unit Jaccard grid point in exact fixed-point
    integers — the design chart behind minhash_lsh_candidates; the
    empirical twin is lsh_quality_eval."""
    from reader_spark.ops.evals import lsh_s_curve

    return lsh_s_curve(spark, bands=16, rows_per_band=4, grid_milli=25)


def _q_conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal quality cutoff (ops.conformal.
    conformal_quality_threshold; Vovk 2005, Papadopoulos 2002): the
    same certified score/label pair as calibration_bins, split
    calibration/eval by md5 parity; threshold = the
    floor(alpha*(n+1))-th smallest good-doc calibration score selected
    via scalable_rank (NO single-partition window), audited as exact
    milli coverage/exclusion on the eval half — the distribution-free
    keep-rate guarantee at alpha=0.1."""
    from reader_spark.ops.conformal import conformal_quality_threshold
    from reader_spark.ops.textstats import (
        gopher_quality_columns,
        quality_logit_score,
    )

    docs = _read(spark, sf_dir, "documents")
    scored = quality_logit_score(docs).select("doc_id", "score")
    label = gopher_quality_columns(docs).select(
        "doc_id", F.when(F.col("gopher_pass"), 1).otherwise(0).alias("label")
    )
    return conformal_quality_threshold(scored.join(label, "doc_id"))


QUERIES = {
    "extraction_eval": _q_extraction_eval,
    "arm_agreement": _q_arm_agreement,
    "calibration_bins": _q_calibration_bins,
    "conformal_threshold": _q_conformal_threshold,
    "ranking_metrics": _q_ranking_metrics,
    "lsh_s_curve": _q_lsh_s_curve,
}
