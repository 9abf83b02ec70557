"""ROUGE-L near-duplicate detection for instruction/short-document
corpora — the dedup criterion the self-instruct family publishes (Wang
et al. ACL 2023 §3.2 drop a generated instruction when its ROUGE-L
similarity to any pool instruction exceeds 0.7; Lin 2004 defines
ROUGE-L as the LCS-based F measure).  MinHash/SimHash (ops/dedup.py)
see bag-of-shingle overlap; ROUGE-L sees the longest common
SUBSEQUENCE, so it catches light paraphrases that keep word order
("rewrite X so that Y" vs "please rewrite X so that Y") that shingle
Jaccard under-scores, and ranks them by how much of both texts the
common skeleton covers.

LCS without a DP matrix: the Hunt–Szymanski reduction (CACM 1977) —
list the match positions (i, j) with a[i] == b[j] ordered by (i asc,
j desc), then LCS(a, b) = length of the longest strictly-increasing
subsequence of the j's.  LIS runs as ONE patience fold (Aldous &
Diaconis 1999): keep the sorted tails array, replace the first tail >=
j (or append).  Both the match list and the fold are Spark array
higher-order functions — `transform`/`filter`/`aggregate` — so the
whole similarity is a JVM-side expression: no UDF, no Python, no
shuffle beyond the candidate join.

Scale shape (10^9 short docs):
  * documents truncate to the first ``trunc`` tokens (instructions are
    short; the bound makes per-pair cost a constant, documented in the
    output as the truncated lengths the score used);
  * candidate pairs come from shared distinct word n-grams under a
    ``max_df`` stop-gram guard (the ops/winnow.py / ops/attribution.py
    discipline): per surviving gram at most C(max_df, 2) pairs, so the
    candidate set is key-bounded — no crossJoin anywhere (plan-tested);
  * per-pair LCS is O(matches * lcs) with both factors <= trunc; the
    |a| x |b| match scan is hoisted into a per-DOCUMENT word ->
    positions map (``pos_map``), so each pair pays |a| map lookups +
    the fold, not a quadratic scan.

The DuckDB oracle replays the identical reduction with
``list_reduce``; scores are exact integer milli (``2000 * lcs div
(m + n)``), so elections and thresholds are portable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["lcs_len", "rouge_l_pairs"]


def _lis_len(js: Column) -> Column:
    """Longest strictly-increasing subsequence length of an int array
    via ONE patience fold (sorted tails; replace first tail >= x)."""

    def step(acc: Column, x: Column) -> Column:
        pos = F.size(F.filter(acc, lambda t: t < x))
        return F.when(
            pos == F.size(acc), F.concat(acc, F.array(x))
        ).otherwise(
            F.concat(
                F.slice(acc, 1, pos),
                F.array(x),
                F.slice(acc, pos + 2, F.size(acc)),
            )
        )

    return F.size(F.aggregate(js, F.array().cast("array<int>"), step)).cast(
        "long"
    )


def pos_map(ws: Column) -> Column:
    """word -> positions-descending map of a token array — built ONCE
    per document so the per-pair match list is |a| map lookups instead
    of an |a| x |b| scan."""
    bpos = F.when(F.size(ws) > 0, F.sequence(F.lit(1), F.size(ws))).otherwise(
        F.array().cast("array<int>")
    )
    return F.map_from_entries(
        F.transform(
            F.array_distinct(ws),
            lambda w: F.struct(
                w.alias("k"),
                F.reverse(
                    F.filter(bpos, lambda j: F.element_at(ws, j) == w)
                ).alias("v"),
            ),
        )
    )


def _match_js(a: Column, bmap: Column) -> Column:
    """Hunt–Szymanski match positions (i asc, j desc) of a against the
    pos_map of b."""
    return F.flatten(
        F.transform(
            a,
            lambda w: F.coalesce(
                F.element_at(bmap, w), F.array().cast("array<int>")
            ),
        )
    )


def lcs_len(a: Column, b: Column) -> Column:
    """Token-LCS length of two string arrays, as a pure Spark
    expression (Hunt–Szymanski match list -> patience LIS fold)."""
    return _lis_len(_match_js(a, pos_map(b)))


def _toks(text: Column, trunc: int) -> Column:
    """Lowercase word tokens (the ops/attribution.py split), truncated
    to the first ``trunc`` — the bounded-DP contract."""
    words = F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda w: w != "")
    return F.slice(words, 1, trunc)


def rouge_l_pairs(
    docs: DataFrame,
    n: int = 3,
    max_df: int = 20,
    trunc: int = 40,
    threshold_milli: int = 700,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scored near-duplicate pairs by ROUGE-L over truncated tokens.

    Returns ``(doc_a, doc_b, len_a, len_b, lcs_len, rouge_l_milli)``
    with ``doc_a < doc_b`` and ``rouge_l_milli >= threshold_milli`` —
    ``rouge_l_milli = 2000 * lcs div (len_a + len_b)``, the integer
    milli form of the ROUGE-L F measure (precision/recall harmonic
    mean collapses to this when beta weighs them equally; 700 is
    self-instruct's published 0.7 cut).  Candidates are pairs sharing
    at least ``min_shared`` distinct word ``n``-grams each occurring
    in at most ``max_df`` documents (within the truncated prefix —
    candidate generation and scoring see the same text).
    ``min_shared`` is the LSH multi-band-hit discipline: at the 0.7
    threshold a pair sharing only ONE rare shingle never scores high
    enough to matter (sf0.1 measurement: max 518 milli), and requiring
    two cuts the candidate set ~19x; set ``min_shared=1`` for the
    exhaustive reference when auditing recall.
    """
    if n < 1 or max_df < 2 or trunc < n or threshold_milli < 0 \
            or min_shared < 1:
        raise ValueError(
            f"need n >= 1, max_df >= 2, trunc >= n, threshold >= 0, "
            f"min_shared >= 1; "
            f"got {(n, max_df, trunc, threshold_milli, min_shared)}"
        )
    # Lazy reuse barriers (ops/dsir.py discipline): toks feeds the gram
    # stream AND both score-side lookups (a, b); grams feeds the
    # df-guard aggregate AND both arms of the candidate self-join.
    # Without the barriers the corpus is re-tokenized three times and
    # re-shingled three times.
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        _toks(F.col(text_col), trunc).alias("ws"),
    ).localCheckpoint(eager=False)
    k = F.greatest(F.size("ws") - (n - 1), F.lit(0))
    grams = toks.select(
        "id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
                    lambda i: F.array_join(F.slice(F.col("ws"), i, n), " "),
                )
            )
        ).alias("g"),
    ).where(k > 0).localCheckpoint(eager=False)
    # stop-gram guard, inverted to the small hot set (ops/attribution.py)
    hot = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") > max_df)
        .select("g")
    )
    grams = grams.join(F.broadcast(hot), "g", "left_anti")
    cands = (
        grams.select("g", F.col("id").alias("doc_a"))
        .join(grams.select("g", F.col("id").alias("doc_b")), "g")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("__sh"))
        .where(F.col("__sh") >= min_shared)
        .select("doc_a", "doc_b")
    )
    a = toks.select(F.col("id").alias("doc_a"), F.col("ws").alias("wa"))
    b = toks.select(
        F.col("id").alias("doc_b"),
        F.size("ws").cast("long").alias("len_b"),
        pos_map(F.col("ws")).alias("bm"),
    )
    scored = (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size("wa").cast("long").alias("len_a"),
            F.col("len_b"),
            _lis_len(_match_js(F.col("wa"), F.col("bm"))).alias("lcs_len"),
        )
        .withColumn(
            "rouge_l_milli",
            F.expr("2000 * lcs_len div (len_a + len_b)").cast("long"),
        )
    )
    return scored.where(F.col("rouge_l_milli") >= threshold_milli).select(
        "doc_a", "doc_b", "len_a", "len_b", "lcs_len", "rouge_l_milli"
    )
