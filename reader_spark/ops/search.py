"""BM25 full-text ranking (Robertson/Sparck Jones probabilistic relevance,
Lucene-style idf = ln(1 + (N - df + 0.5)/(df + 0.5))) as pure DataFrame
algebra — no inverted index build, no explode, no UDF.

Shape for a LITERAL query of q terms over a 100 TB corpus:
  * per-document term frequencies come from `size(filter(tokens, = term))`
    — q JVM-side array scans inside the document's own task; the corpus is
    never exploded to one-row-per-token.
  * corpus statistics (N, avgdl, per-term df) reduce to ONE row via a
    single map-side-combined aggregate, then ride back on a broadcast
    (1-row cross join) — no second pass over the corpus, no driver
    collect().
  * top-k is TakeOrderedAndProject (per-partition heap + driver merge),
    never a global sort.

Scoring parity with the DuckDB oracle: each term's contribution is
rounded to 9 dp before the fixed-order sum, and the sum to 6 dp — the
same discipline the PQ/IVFADC oracles use to keep ieee-double engines
hash-identical.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reader_spark.ops.decontam import normalize_for_ngrams


def bm25_rank(
    docs: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 15,
) -> DataFrame:
    """Top-k (id, score) for a bag-of-words query, BM25-scored.

    Deterministic: ties break on ascending id. Terms are matched on the
    same normalization the dedup/decontamination operators use (lower,
    non-alphanumeric collapsed), so callers pass plain lowercase words.
    """
    terms = list(query_terms)
    if not terms:
        raise ValueError("query_terms must name at least one term")
    if any(not t or t != t.lower() or " " in t for t in terms):
        raise ValueError("query terms must be single normalized lowercase words")

    tokens = F.split(normalize_for_ngrams(F.col(text_col)), " ")

    def tf_of(term):
        # one-arg lambda: a second parameter would be read as the element
        # INDEX by F.filter, silently breaking the comparison
        return F.size(F.filter(tokens, lambda w: w == F.lit(term))).cast("double")

    per_doc = docs.select(
        F.col(id_col),
        F.size(tokens).cast("double").alias("dl"),
        *[tf_of(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )

    stats = per_doc.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )

    scored = per_doc.crossJoin(F.broadcast(stats))
    contribs = []
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        tf = F.col(f"tf_{i}")
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        contribs.append(F.round(idf * tf * F.lit(k1 + 1.0) / denom, 9))
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c

    return (
        scored.select(F.col(id_col), F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the corpus-keyword primitive
    (doc tagging, topic drift monitoring, per-source vocabulary audit).
    Returns (<id_col>, term, tf, score, rank), rank 1..k per doc by
    score desc with term as the deterministic tiebreak.

    Shape at 100 TB: one token explode feeds BOTH aggregations (tf per
    (doc, term) and doc-frequency per term — map-side combined); the
    corpus size and the per-term doc frequency join back as a 1-row
    broadcast dim and a term-keyed equi-join (term cardinality =
    vocabulary, tiny next to the corpus). Top-k is a doc-partitioned
    window — no global sort.

    Float parity: idf = ln(N / df_t) rounded at 9 before the tf multiply,
    score rounded at 6 (round-9-terms-then-round-6 contract).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.split(normalize_for_ngrams(F.col(text_col)), " ")
        ).alias("term"),
    ).where(F.col("term") != "")
    # localCheckpoint: tf feeds BOTH the score join and the doc-frequency
    # aggregate; without it Spark re-runs the corpus tokenize+explode for
    # each branch (no cross-branch CSE) — 2x the scan-dominated cost
    tf = (
        toks.groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).cast("double").alias("n_docs")
    )
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.round(F.log(F.col("n_docs") / F.col("df_t")), 9),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc").orderBy(F.desc("score"), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("doc").alias(id_col),
            "term",
            "tf",
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact positional phrase match — the positional-postings query
    classic IR builds next to BM25 (Manning/Raghavan/Schütze IIR §2.4:
    biword vs positional indexes; this is the positional form): a
    phrase of k terms matches at position p iff term i occurs at
    p + i for every i. BM25's bag-of-words ranking cannot express it;
    a regex over raw text can, but dies on tokenization mismatches
    (punctuation, case, runs of whitespace) — this matches in TOKEN
    space, the same space every other text op here uses.

    Shape at 100 TB: one posexplode over the scan, an equi-join
    against the k-row broadcast phrase dim (tok -> i), and ONE
    map-side-combined groupBy((doc, start)) needing countDistinct(i)
    == k — repeated words in the phrase stay correct because each
    position i must be matched independently. No self-joins over
    postings, no windows.

    Returns (id_col, n_matches, first_pos) for matching docs only;
    positions are 0-based token offsets.
    """
    terms = [w for w in phrase.lower().split() if w]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    spark = df.sparkSession
    k = len(terms)
    dim = spark.createDataFrame(
        [(w, i) for i, w in enumerate(terms)], "tok string, i int"
    )
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("pos", "tok"),
    )
    hits = (
        toks.join(F.broadcast(dim), "tok")
        .select(
            F.col(id_col),
            (F.col("pos") - F.col("i")).alias("start"),
            "i",
        )
        .where(F.col("start") >= 0)
        .distinct()
        .groupBy(id_col, "start")
        .agg(F.countDistinct("i").alias("__k"))
        .where(F.col("__k") == k)
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("start").cast("long").alias("first_pos"),
    )


def bm25f_rank(
    docs: DataFrame,
    query_terms: Sequence[str],
    fields: Sequence[tuple[str, float, float]] = (
        ("text", 1.0, 0.75),
        ("anchor", 2.5, 0.5),
    ),
    id_col: str = "doc_id",
    k1: float = 1.2,
    top_k: int = 15,
) -> DataFrame:
    """BM25F — the multi-FIELD extension (Robertson, Zaragoza & Taylor
    CIKM 2004, "Simple BM25 extension to multiple weighted fields"),
    the form web search actually runs: a term hit in inbound ANCHOR
    TEXT is worth more than one in the body (anchors are other sites'
    descriptions — the classic relevance signal the repo's anchor_corpus
    row aggregates), and the fields must be fused BEFORE tf saturation —
    naive per-field BM25 summing double-saturates and over-rewards a
    term that is mediocre in every field.

        tf~_f = tf_f / (1 + b_f * (dl_f / avgdl_f - 1))
        tf~   = sum_f w_f * tf~_f
        score = sum_t idf(t) * tf~ / (k1 + tf~)

    idf uses document frequency over ANY field. Same engine-parity and
    plan shape as bm25_rank: per-field tf via JVM array scans (no
    explode), ONE stats aggregate riding back on a 1-row broadcast,
    round-9 contributions + round-6 sum, TakeOrderedAndProject top-k.
    """
    terms = list(query_terms)
    if not terms:
        raise ValueError("query_terms must name at least one term")
    if any(not t or t != t.lower() or " " in t for t in terms):
        raise ValueError("query terms must be single normalized lowercase words")
    fields = list(fields)
    if not fields:
        raise ValueError("need at least one field")

    def toks_of(col):
        return F.split(normalize_for_ngrams(F.col(col)), " ")

    per_cols = [F.col(id_col)]
    for fi, (col, _w, _b) in enumerate(fields):
        tokens = toks_of(col)
        per_cols.append(F.size(tokens).cast("double").alias(f"dl_{fi}"))
        for ti, t in enumerate(terms):
            per_cols.append(
                F.size(F.filter(tokens, lambda w: w == F.lit(t)))
                .cast("double")
                .alias(f"tf_{fi}_{ti}")
            )
    per_doc = docs.select(*per_cols)

    aggs = [F.count("*").cast("double").alias("n_docs")]
    for fi in range(len(fields)):
        aggs.append(F.avg(f"dl_{fi}").alias(f"avgdl_{fi}"))
    for ti in range(len(terms)):
        any_tf = None
        for fi in range(len(fields)):
            c = F.col(f"tf_{fi}_{ti}") > 0
            any_tf = c if any_tf is None else (any_tf | c)
        aggs.append(F.sum(any_tf.cast("double")).alias(f"df_{ti}"))
    stats = per_doc.agg(*aggs)

    scored = per_doc.crossJoin(F.broadcast(stats))
    contribs = []
    for ti in range(len(terms)):
        tfw = None
        for fi, (_col, w, b) in enumerate(fields):
            norm = F.lit(1.0) + F.lit(b) * (
                F.col(f"dl_{fi}")
                / F.greatest(F.col(f"avgdl_{fi}"), F.lit(1e-9))
                - F.lit(1.0)
            )
            part = F.lit(w) * F.col(f"tf_{fi}_{ti}") / norm
            tfw = part if tfw is None else tfw + part
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{ti}") + 0.5)
            / (F.col(f"df_{ti}") + 0.5)
        )
        contribs.append(F.round(idf * tfw / (F.lit(k1) + tfw), 9))
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c

    return (
        scored.select(F.col(id_col), F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )
