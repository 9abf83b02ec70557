"""Filter/classifier calibration over big tables — threshold sweeps.

A training-data pipeline gates on scores (quality logits, LM perplexity,
centroid distances); choosing the cut needs the precision/recall trade-off
AT EVERY THRESHOLD against a labeled sample. The sweep is one groupBy
(bounding the output to distinct rounded scores) + one cumulative window
over that SMALL aggregate — never a per-row sort of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pr_curve"]


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_dp: int = 3,
) -> DataFrame:
    """Precision/recall sweep: one row per distinct rounded score
    (descending thresholds; a row is predicted positive when its score
    >= the threshold). Returns (threshold, tp, fp, fn, precision,
    recall, f1) with exact integer counts and round-6 ratios.

    Scale shape: scores round to ``round_dp`` first, so the groupBy
    map-side-combines the corpus down to at most ~10^round_dp * range
    threshold rows; only that aggregate crosses the cumulative window
    (a single-partition sort of a few hundred rows, not of the data).
    """
    if round_dp < 0:
        raise ValueError(f"round_dp must be >= 0, got {round_dp}")
    agg = (
        df.select(
            F.round(F.col(score_col), round_dp).alias("threshold"),
            F.col(label_col).cast("long").alias("__y"),
        )
        .where(F.col("threshold").isNotNull())
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__y").alias("__p"),
        )
    )
    w = (
        Window.orderBy(F.col("threshold").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = agg.agg(F.sum("__p").alias("__tp_all"))
    cum = (
        agg.withColumn("tp", F.sum("__p").over(w).cast("long"))
        .withColumn("fp", (F.sum("__n").over(w) - F.col("tp")).cast("long"))
        .crossJoin(F.broadcast(totals))
    )
    fn = (F.col("__tp_all") - F.col("tp")).cast("long")
    return cum.select(
        "threshold",
        "tp",
        "fp",
        fn.alias("fn"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6).alias(
            "precision"
        ),
        F.round(F.try_divide(F.col("tp"), F.col("__tp_all")), 6).alias(
            "recall"
        ),
        F.round(
            F.try_divide(
                2 * F.col("tp"),
                2 * F.col("tp") + F.col("fp") + fn,
            ),
            6,
        ).alias("f1"),
    )


def matryoshka_eval(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix_dims: tuple[int, ...] = (8, 16, 32),
) -> DataFrame:
    """Matryoshka / prefix-truncation fidelity (Kusupati et al. 2022,
    "Matryoshka Representation Learning"): how much cosine similarity
    survives when vectors are cut to their first k dims — the readout
    for choosing a cheaper ANN index width. Pairs are deterministic
    adjacent ids (vec i vs i+1): one equi-join, no sampling RNG, n-1
    pairs streaming through a groupBy — never an all-pairs product.

    Returns one row per prefix dim: (prefix_dim, n_pairs, mean_cos_full,
    mean_cos_prefix, mean_abs_diff). Means use integer nano-unit sums;
    cosines can be negative, so the mean rides a +1 shift (values in
    [0,2]) because Spark's `div` truncates toward zero while DuckDB's
    `//` floors — identical only for non-negative sums."""
    for k in prefix_dims:
        if k < 1:
            raise ValueError(f"prefix dims must be >= 1, got {k}")

    def _dbl(c):
        return F.transform(c, lambda x: x.cast("double"))

    def _cos(a, b):
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        na = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
        nb = F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x)
        return F.round(F.try_divide(dot, F.sqrt(na) * F.sqrt(nb)), 9)

    emb = df.select(F.col(id_col).alias("__id"), _dbl(F.col(vec_col)).alias("__v"))
    nxt = emb.select((F.col("__id") - 1).alias("__id"), F.col("__v").alias("__w"))
    pairs = emb.join(nxt, "__id")
    a, b = F.col("__v"), F.col("__w")
    full = _cos(a, b)
    per_k = pairs.select(
        full.alias("__full"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        _cos(F.slice(a, 1, k), F.slice(b, 1, k)).alias("c"),
                    )
                    for k in prefix_dims
                ]
            )
        ).alias("p"),
    ).select(
        F.col("p.k").alias("prefix_dim"),
        F.round((F.col("__full") + 1.0) * 1e9, 0).cast("long").alias("__uf"),
        F.round((F.col("p.c") + 1.0) * 1e9, 0).cast("long").alias("__up"),
        F.round(F.abs(F.col("p.c") - F.col("__full")) * 1e9, 0)
        .cast("long")
        .alias("__ud"),
    )
    g = per_k.groupBy("prefix_dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("__uf").alias("__sf"),
        F.sum("__up").alias("__sp"),
        F.sum("__ud").alias("__sd"),
    )

    def _mean6(s, shift):
        m = F.expr(f"({s} + (n_pairs * 1000) div 2) div (n_pairs * 1000)")
        return m / F.lit(1e6) - F.lit(1.0 if shift else 0.0)

    return g.select(
        "prefix_dim",
        "n_pairs",
        _mean6("__sf", True).alias("mean_cos_full"),
        _mean6("__sp", True).alias("mean_cos_prefix"),
        _mean6("__sd", False).alias("mean_abs_diff"),
    )


def binary_recall_eval(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Recall@k of the binary sign-bit ANN path (ops.ann.
    binary_hamming_topk) against exact cosine ground truth, per query:
    (query_id, n_hit, recall). The index-quality dashboard row every
    vector deployment watches — run on a query SAMPLE (n_queries), never
    the corpus: the ground-truth leg is deliberately exact (query x
    corpus), which is the documented eval-sample shape, not a production
    join.

    Both legs order deterministically (round-4 cosine desc then id;
    hamming asc then id), so the whole result is value-oracled."""
    from reader_spark.ops.ann import cosine_col, sign_bit_words

    q = embeddings.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        sign_bit_words(F.col(vec_col).cast("array<double>"), dim).alias("qc"),
    )
    c = embeddings.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        sign_bit_words(F.col(vec_col).cast("array<double>"), dim).alias("cc"),
    )
    hamming = None
    for w in range((dim + 31) // 32):
        term = F.bit_count(
            F.element_at(F.col("qc"), w + 1).bitwiseXOR(
                F.element_at(F.col("cc"), w + 1)
            )
        ).cast("long")
        hamming = term if hamming is None else hamming + term
    pairs = q.crossJoin(c).select(
        "query_id",
        "corpus_id",
        F.round(cosine_col(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        hamming.alias("hamming"),
    )
    wq = Window.partitionBy("query_id")
    exact_rank = F.row_number().over(
        wq.orderBy(F.desc("cosine"), F.asc("corpus_id"))
    )
    ham_rank = F.row_number().over(
        wq.orderBy(F.asc("hamming"), F.asc("corpus_id"))
    )
    ranked = pairs.select(
        "query_id",
        "corpus_id",
        "cosine",
        exact_rank.alias("er"),
        ham_rank.alias("hr"),
    )
    exact_topk = ranked.where(F.col("er") <= k).select("query_id", "corpus_id")
    binary_topk = (
        ranked.where(F.col("hr") <= candidates)
        .select(
            "query_id",
            "corpus_id",
            F.row_number()
            .over(wq.orderBy(F.desc("cosine"), F.asc("corpus_id")))
            .alias("rr"),
        )
        .where(F.col("rr") <= k)
        .select("query_id", "corpus_id")
    )
    hits = exact_topk.join(binary_topk, ["query_id", "corpus_id"])
    return (
        q.select("query_id")
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.lit(float(k)), 6
            ).alias("recall"),
        )
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier
    (Guo et al. 2017 "On Calibration of Modern Neural Networks" §2):
    equal-width score bins, each reporting its size, mean confidence
    and empirical positive rate — a calibrated model has them equal per
    bin. One map-side-combined groupBy over the ≤n_bins dim; the gap is
    computed from the ROUNDED means so both engines agree bit-for-bit.
    """
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    agg = (
        scored.select(
            b.alias("bin"),
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("double").alias("_l"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("_s"), 6).alias("mean_score"),
            F.round(F.avg("_l"), 6).alias("frac_pos"),
        )
    )
    return agg.withColumn(
        "gap", F.round(F.abs(F.col("mean_score") - F.col("frac_pos")), 6)
    )


def expected_calibration_error(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """ECE (weighted mean per-bin |confidence − accuracy|) + MCE (max
    gap) as one row — the quality-classifier health number a curation
    pipeline alerts on. Folds the calibration_bins frame; the global
    aggregate sees ≤n_bins rows."""
    bins = calibration_bins(scored, score_col, label_col, n_bins)
    return bins.agg(
        F.sum("n_docs").alias("n_docs"),
        F.round(
            F.sum(F.col("n_docs") * F.col("gap")) / F.sum("n_docs"), 6
        ).alias("ece"),
        F.max("gap").alias("mce"),
    )


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Per-query IR metrics for a retrieval run (the BM25/ANN stack's
    report card): MRR, NDCG@k (exponential gain (2^rel - 1) /
    log2(rank+1), Järvelin & Kekäläinen 2002), Recall@k.

    Inputs: ``results`` (query, doc, rank 1..) and graded judgments
    ``qrels`` (query, doc, rel >= 0). Queries with no relevant
    judgments report 0s rather than vanishing (qrels is the spine).

    Float lockstep: every DCG/IDCG term is rounded to integer nanos
    then summed (groupBy float sums are order-nondeterministic;
    integer sums are not — the repo-wide discipline). IDCG folds the
    rel list sorted descending inside the aggregate, so both folds see
    a fixed order. One shuffle per side, both keyed on the query."""
    topk = results.where(F.col(rank_col) <= k)
    j = topk.join(qrels, [query_col, doc_col], "left").withColumn(
        "_rel", F.coalesce(F.col(rel_col), F.lit(0))
    )
    term = F.round(
        (F.pow(F.lit(2.0), F.col("_rel")) - 1)
        / F.log2(F.col(rank_col) + 1)
        * F.lit(1e9),
        0,
    ).cast("long")
    ret = j.groupBy(query_col).agg(
        F.sum(term).alias("_dcg_nanos"),
        F.min(F.when(F.col("_rel") > 0, F.col(rank_col))).alias("_first"),
        F.sum((F.col("_rel") > 0).cast("long")).alias("n_ret_rel"),
    )
    ideal_terms = F.transform(
        F.slice(
            F.reverse(F.array_sort(F.collect_list(F.col(rel_col)))), 1, k
        ),
        lambda x, i: F.round(
            (F.pow(F.lit(2.0), x) - 1)
            / F.log2(i + F.lit(2.0))
            * F.lit(1e9),
            0,
        ).cast("long"),
    )
    spine = qrels.groupBy(query_col).agg(
        F.sum((F.col(rel_col) > 0).cast("long")).alias("n_rel"),
        F.aggregate(
            ideal_terms, F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("_idcg_nanos"),
    )
    out = spine.join(ret, query_col, "left")
    return out.select(
        F.col(query_col),
        "n_rel",
        F.coalesce("n_ret_rel", F.lit(0)).alias("n_ret_rel"),
        F.when(F.col("_first").isNotNull(), F.round(1 / F.col("_first"), 6))
        .otherwise(F.lit(0.0))
        .alias("mrr"),
        F.when(
            F.col("n_rel") > 0,
            F.round(F.coalesce("n_ret_rel", F.lit(0)) / F.col("n_rel"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("recall_k"),
        F.when(
            F.col("_idcg_nanos") > 0,
            F.round(
                F.coalesce("_dcg_nanos", F.lit(0)) / F.col("_idcg_nanos"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("ndcg_k"),
    )


def lsh_s_curve(
    spark,
    bands: int = 16,
    rows_per_band: int = 4,
    grid_milli: int = 25,
) -> "DataFrame":
    """Analytic MinHash-LSH banding S-curve (Leskovec/Rajaraman/Ullman,
    "Mining of Massive Datasets" §3.4): for a pair at Jaccard
    similarity s, the candidate probability under (b bands, r rows) is

        P(s) = 1 - (1 - s^r)^b

    evaluated on a milli-unit similarity grid in EXACT fixed-point
    integer arithmetic — powers unroll as repeated
    ``x*y div 1000`` (milli) steps, so both engines compute identical
    values and the curve is oracle-able bit-for-bit. The design
    complement to the empirical ``lsh_quality_eval``: pick (b, r) by
    reading where the curve crosses 0.5 against the dedup threshold
    (the ``is_above_half`` flank; the analytic threshold is
    ~ (1/b)^(1/r)).

    Returns one row per grid point: ``(s_milli, p_and_milli,
    p_candidate_milli, is_above_half)`` where ``p_and`` = s^r (one
    band matches) and ``p_candidate`` = 1 - (1 - s^r)^b. Bounded-dim
    computation (<= 1000/grid_milli rows); rides a 1-row broadcast.
    """
    if not 1 <= rows_per_band <= 16 or not 1 <= bands <= 64:
        raise ValueError(
            f"need 1<=rows_per_band<=16 and 1<=bands<=64, got "
            f"({bands}, {rows_per_band})"
        )
    if not 1 <= grid_milli <= 500 or 1000 % grid_milli:
        raise ValueError(f"grid_milli must divide 1000, got {grid_milli}")
    grid = spark.range(0, 1000 // grid_milli + 1).select(
        (F.col("id") * grid_milli).cast("long").alias("s_milli")
    )
    # s^r in milli fixed point: fold r-1 multiply-rescale steps.
    p_and = "s_milli"
    for _ in range(rows_per_band - 1):
        p_and = f"(({p_and}) * s_milli) div 1000"
    grid = grid.withColumn("p_and_milli", F.expr(p_and).cast("long"))
    acc = "(1000 - p_and_milli)"
    for _ in range(bands - 1):
        acc = f"(({acc}) * (1000 - p_and_milli)) div 1000"
    grid = grid.withColumn(
        "p_candidate_milli", (1000 - F.expr(acc)).cast("long")
    )
    return grid.select(
        "s_milli",
        "p_and_milli",
        "p_candidate_milli",
        (F.col("p_candidate_milli") >= 500).alias("is_above_half"),
    )
