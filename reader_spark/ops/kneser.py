"""Interpolated Kneser-Ney bigram LM scoring — the smoothing family the
CCNet pipeline's KenLM filter actually uses (Wenzek et al. 2020 score
with a KenLM 5-gram; Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.27).
The repo's add-1 bigram row (ops/textstats.bigram_lm_scores) is the
baseline sibling; KN replaces add-1's uniform vocabulary prior with the
CONTINUATION distribution — how many distinct left contexts a word
follows — which is what separates genuinely fluent text from text that
merely repeats frequent words ("san francisco" inflates c(francisco)
but not its continuation count).

Model, trained on the scored corpus itself (the CCNet shape: score with
a corpus-level model, route by score):

    p_kn(w2 | w1) = (c(w1,w2) - D) / c(w1.)
                  + (D * N1+(w1,.) / c(w1.)) * N1+(.,w2) / N1+(.,.)

with absolute discount D (default 0.75, Chen & Goodman's fixed-D
setting), N1+ the distinct-continuation / distinct-context type counts
and N1+(.,.) the total number of distinct bigram types. Every bigram
scored occurs in the training corpus, so c(w1,w2) >= 1 > D and the
discounted term is strictly positive.

Engine-stable math: with D = discount_milli/1000 the probability is the
exact integer ratio

    num = (1000*c12 - d) * T + d * t1 * n2
    den = 1000 * c1 * T

(c12, c1 exact counts; t1 = N1+(w1,.); n2 = N1+(.,w2); T = N1+(.,.)).
Both engines form the SAME two integers, take -log2(num/den) as one
double division + one log2, round the term to 9 dp, and sum per-doc in
NANO-UNIT integers with the 6 dp reduction done in integer division —
the dsir/bigram-LM float-parity discipline (order-sensitive float sums
provably diverge across engines at ~500 terms/doc).

Overflow bound: den = 1000*c1*T must fit a BIGINT, i.e. c1*T <
9.2e15 — comfortable for per-shard LMs up to ~1e7-type vocabularies
over ~1e8-token shards (CCNet trains per-language models, not one
global LM; the same sharding applies here). Past that, compute num/den
directly in DOUBLE; this integer form is the verifiable reference.

Shape at 100 TB: four map-side-combined groupBys over the bigram keys
(c12, c1+t1 fused in one agg, n2), scoring joins are key-bounded
equi-joins, and the type-count scalar T rides a 1-row broadcast dim.
No Python, no window, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kneser_ney_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount_milli: int = 750,
) -> DataFrame:
    """Per-document interpolated-KN bigram cross-entropy.

    Returns (id_col, n_bigrams, kn_nll_bits): avg_nll in bits at 6 dp,
    NULL (with n_bigrams = 0) for docs with fewer than 2 alphabetic
    tokens — a doc must never vanish from a quality-routing table.
    """
    if not 0 < discount_milli < 1000:
        raise ValueError(
            f"discount_milli must be in (0, 1000), got {discount_milli}"
        )
    d = F.lit(int(discount_milli)).cast("long")

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda x: x != ""
    )
    base = df.select(F.col(id_col), toks.alias("__l"))
    k = F.greatest(F.size("__l") - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(F.col("__l"), 1, k).alias("0"),
        F.slice(F.col("__l"), 2, k).alias("1"),
    )
    bigrams = base.select(id_col, F.explode(pairs).alias("p")).select(
        id_col,
        F.col("p").getField("0").alias("w1"),
        F.col("p").getField("1").alias("w2"),
    )

    c12 = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    # c(w1.) and N1+(w1,.) share the w1 key — ONE aggregate.
    left = bigrams.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("c1"),
        F.countDistinct("w2").cast("long").alias("t1"),
    )
    right = bigrams.groupBy("w2").agg(
        F.countDistinct("w1").cast("long").alias("n2")
    )
    types = c12.agg(F.count(F.lit(1)).cast("long").alias("tt"))

    num = (F.lit(1000).cast("long") * F.col("c12") - d) * F.col("tt") + (
        d * F.col("t1") * F.col("n2")
    )
    den = F.lit(1000).cast("long") * F.col("c1") * F.col("tt")
    term = -F.log2(num.cast("double") / den.cast("double"))

    scored = (
        bigrams.join(c12, ["w1", "w2"])
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(types))
        .withColumn("__u", F.round(term * F.lit(1e9), 0).cast("long"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("__u").alias("__s"),
    )
    avg = (
        F.expr("(__s + (n_bigrams * 1000) div 2) div (n_bigrams * 1000)")
        / F.lit(1e6)
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            F.when(F.col("n_bigrams") > 0, avg).alias("kn_nll_bits"),
        )
    )


def kneser_ney_by_source(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    discount_milli: int = 750,
) -> DataFrame:
    """Source-level KN fluency rollup — the per-feed drift monitor
    (a source whose mean cross-entropy jumps went template-spun or
    changed language; CCNet's head/middle/tail routing applies the same
    statistic per language).

    Mean is taken over DOCS (each doc weighs 1, the routing unit), in
    exact integers: kn_nll_bits is exactly 6 dp by construction, so
    round(kn * 1e6) recovers the integer the per-doc reduction emitted
    and the source mean is one more integer division. Unscorable docs
    are counted but excluded from the mean.
    """
    scores = kneser_ney_scores(df, id_col, text_col, discount_milli)
    joined = df.select(F.col(id_col), F.col(source_col)).join(
        scores, id_col
    )
    u = F.round(F.col("kn_nll_bits") * F.lit(1e6), 0).cast("long")
    return (
        joined.select(
            source_col,
            F.col("n_bigrams"),
            u.alias("__u"),
            F.when(F.col("kn_nll_bits").isNotNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("__ok"),
        )
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__ok").alias("n_scored"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            F.sum("__u").alias("__s"),
        )
        .select(
            source_col,
            "n_docs",
            "n_scored",
            "n_bigrams",
            F.when(
                F.col("n_scored") > 0,
                F.expr("((__s + n_scored div 2) div n_scored)") / F.lit(1e6),
            ).alias("mean_nll_bits"),
        )
    )
