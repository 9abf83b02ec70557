"""DSIR: Data Selection via Importance Resampling (Xie et al. 2023).

arXiv:2302.03169. Select pretraining documents that look like a small
high-quality TARGET distribution: fit bag-of-hashed-n-gram unigram models on
the target docs (p) and the raw corpus (q), score every raw doc with the
log importance weight  log w(d) = Σ_f c_{d,f} · (ln p_f − ln q_f), then
resample proportionally to w (here: `ops.sampling.weighted_sample` /
Efraimidis-Spirakis downstream; this module produces the deterministic
weights).

Scale shape — the reason DSIR works at 100 TB where a classifier per doc
may not: the model is a B-row table (B = hash buckets, constant), built by
two map-side-combined counts over the feature stream; scoring is a
broadcast join of that B-row dim against per-doc bucket counts. No global
sort, no Python, no all-pairs anything.

Engine-portable by construction: features are md5-head hash buckets (the
repo's standard portable hash), probabilities add-1 smoothed, log-ratio
rounded at 9 and the per-doc sum at 6 — the DuckDB oracle replays it
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hashed_ngram_features", "dsir_log_weights"]

_TOKEN_JUNK = "[^a-z0-9]+"


def _bucket(prefix: str, gram: Column, buckets: int) -> Column:
    h = F.conv(F.substring(F.md5(F.concat(F.lit(prefix), gram)), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(buckets))


def hashed_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 256,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """One row per (doc, feature-occurrence): hashed unigrams + bigrams.

    Unigrams and bigrams hash under distinct prefixes ('dsir1:'/'dsir2:')
    into the same bucket space — the paper's hashed n-gram trick that caps
    model size at `buckets` regardless of vocabulary.
    """
    toks = F.filter(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), _TOKEN_JUNK, " ")),
            " ",
        ),
        lambda t: t != "",
    )
    n = F.size(F.col("__toks"))
    base = df.select(
        F.col(id_col), *(keep_cols or []), toks.alias("__toks")
    ).localCheckpoint(eager=False)
    uni = base.select(
        id_col,
        *(keep_cols or []),
        F.explode("__toks").alias("__gram"),
    ).select(
        id_col,
        *(keep_cols or []),
        _bucket("dsir1:", F.col("__gram"), buckets).alias("bucket"),
    )
    pairs = F.arrays_zip(
        F.slice(F.col("__toks"), 1, F.greatest(n - 1, F.lit(0))).alias("a"),
        F.slice(F.col("__toks"), 2, F.greatest(n - 1, F.lit(0))).alias("b"),
    )
    bi = base.select(
        id_col,
        *(keep_cols or []),
        F.explode(pairs).alias("__p"),
    ).select(
        id_col,
        *(keep_cols or []),
        _bucket(
            "dsir2:",
            F.concat_ws(" ", F.col("__p.a"), F.col("__p.b")),
            buckets,
        ).alias("bucket"),
    )
    return uni.unionByName(bi)


def dsir_log_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    buckets: int = 256,
) -> DataFrame:
    """Per-document DSIR log importance weight against `target` docs.

    `target` is a boolean Column over `df`'s rows (e.g. lang == 'en', or a
    quality predicate) defining the distribution to match. Returns
    (id, n_feats, log_w); feed log_w (exp'd or rank-ordered) into
    weighted_sample for the actual resampling step.
    """
    feats = hashed_ngram_features(
        df.withColumn("__is_target", target),
        id_col,
        text_col,
        buckets,
        keep_cols=["__is_target"],
    ).localCheckpoint(eager=False)
    raw = feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_r"))
    tgt = (
        feats.where(F.col("__is_target"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    tot = raw.agg(
        F.sum("c_r").alias("n_r"),
    ).crossJoin(
        tgt.agg(F.sum("c_t").alias("n_t"))
    )
    dim = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log((F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                      / (F.col("n_t") + buckets))
                - F.log((F.col("c_r") + 1) / (F.col("n_r") + buckets)),
                9,
            ).alias("log_ratio"),
        )
    )
    doc_counts = feats.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("c_df")
    )
    # Terms go through INTEGER nano-units so the sum is order-independent
    # (float sums permute under shuffle; integer sums don't) — the same
    # trick ops.ratelimit uses for its sequential state. The final 6-dp
    # reduction ALSO stays in integers (half-away via abs+500 div 1000):
    # round(sum/1e9, 6) in floats is a decimal-boundary coin flip whenever
    # the nano sum lands on ±...500 (observed at sf0.001/sf0.1) — division
    # of the SAME integer by 1e6 afterwards is bit-identical everywhere.
    term_units = F.round(F.col("c_df") * F.col("log_ratio") * 1e9).cast("long")
    agg = (
        doc_counts.join(F.broadcast(dim), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c_df").cast("long").alias("n_feats"),
            F.sum(term_units).alias("__su"),
        )
    )
    micro = F.signum("__su").cast("long") * F.expr("(abs(__su) + 500) div 1000")
    return agg.select(
        id_col,
        "n_feats",
        (micro / F.lit(1e6)).alias("log_w"),
    )
