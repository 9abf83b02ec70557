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

from pyspark.sql import DataFrame
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
