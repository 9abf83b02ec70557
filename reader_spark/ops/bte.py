"""Body Text Extraction (Finn, Kushmerick, Smyth: "Fact or fiction:
Content classification for digital libraries", DELOS 2001).

The fourth classic main-content arm next to Readability
(reader_spark/readability.py), jusText (ops/justext.py), Boilerpipe
(ops/boilerpipe.py) and CETR (ops/cetr.py): tokenize the page into a
single stream where every token is either a *tag* or a *word*, then
pick the contiguous window [i, j] maximizing

    T(i, j) = tags_before(i) + words_inside(i, j) + tags_after(j)

— boilerplate is tag-dense, body text is word-dense, so the optimal
window brackets the article. The paper evaluates all O(n^2) windows;
the objective is equivalent (up to the constant ``total_tags``) to
maximizing ``sum_{k in [i,j]} score_k`` with ``score_k = +1`` for a
word and ``-1`` for a tag, i.e. a maximum-subarray problem, solved
here in O(n) per document with the prefix-sum form of Kadane's
algorithm:

    best(j) = pre(j) - min_{i-1 < j} pre(i-1),   pre(-1) = 0

Tie-breaks are fixed so both engines elect the identical window: the
earliest minimizing prefix (longest window) and the smallest maximizing
end index.

Shape at 100 TB: ONE exchange on doc_id and ZERO joins — prefix sums,
the running minimum and the lag all share a window PARTITIONED BY
document (bounded by tokens-per-page; the 2 MiB pipeline size guard
bounds it further), and the per-document election is a single
``max_by`` whose running-min key carries (prefix, start index, word
prefix) packed into one long, so the elected row already knows its
window composition. Plan-pinned: 1 Exchange, 3 stacked WindowExecs,
0 joins.

vakra-dev/reader context: its readability fallback scores DOM blocks
(src/utils/readability.ts); BTE is the markup-free last resort for
pages whose DOM is too mangled to build blocks at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Packing base: the running minimum carries THREE fields in one long —
# (lag prefix + offset, start index, word-prefix at start) — so the
# election needs no join back into the token frame. 3 x 20 bits + the
# sign headroom = 61 bits; documents are capped at 2^20 = 1,048,576
# tokens (far beyond the pipeline's 2 MiB raw-payload guard).
_M = 1 << 20
_OFF = 1 << 20
_M2 = _M * _M


def bte_window(
    tokens: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "tok_no",
    is_tag_col: str = "is_tag",
) -> DataFrame:
    """Per-document optimal BTE window over a token stream.

    Input: one row per token — ``(id, tok_no, is_tag)`` with ``tok_no``
    dense from 0 and ``is_tag`` in {0, 1}. Output: one row per document
    ``(id, start_tok, end_tok, words_inside, tags_inside, bte_score)``
    where ``bte_score`` is the paper's T(i, j) objective
    (tags outside the window + words inside it).
    """
    w = Window.partitionBy(id_col).orderBy(order_col)
    acc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    score = 1 - 2 * F.col(is_tag_col)

    # Window functions cannot nest in one projection, so the prefix
    # sums, their lags, and the running minimum are three consecutive
    # projections — all over the SAME (doc_id, tok_no) window, so
    # Catalyst plans one Exchange with stacked WindowExecs. The tag
    # prefix needs no column of its own: pt = tok_no + 1 - pw.
    s1 = tokens.select(
        F.col(id_col),
        F.col(order_col),
        F.sum(score).over(acc).cast("long").alias("pre"),
        F.sum(1 - F.col(is_tag_col)).over(acc).cast("long").alias("pw"),
    )
    # lag(pre) with default 0 == pre(-1): the empty-prefix candidate.
    s2 = s1.select(
        "*",
        F.lag("pre", 1, 0).over(w).cast("long").alias("lag_pre"),
        F.lag("pw", 1, 0).over(w).cast("long").alias("lag_pw"),
    )
    # Packed (prefix, start_idx, word-prefix-at-start): the running min
    # orders on (prefix, start_idx) — minimum prefix first, then the
    # SMALLEST start index (earliest argmin -> longest window); the
    # word-prefix tail never decides (start_idx is unique) but rides
    # along so the election is join-free.
    # Enforce the packing cap: a token index at or beyond 2^20 would
    # silently corrupt the run_min ordering, so it errors instead.
    guarded_tok = F.expr(
        f"CASE WHEN {order_col} < {_M} THEN {order_col} "
        f"ELSE raise_error('bte_window: document exceeds the 2^20 "
        f"tokens-per-document packing cap') END"
    )
    s3 = s2.withColumn(
        "packed_lag",
        ((F.col("lag_pre") + _OFF) * _M + guarded_tok) * _M
        + F.col("lag_pw"),
    )
    frame = (
        s3.withColumn("run_min", F.min("packed_lag").over(acc))
        .withColumn(
            "best", F.col("pre") - (F.expr(f"run_min div {_M2}") - _OFF)
        )
    )

    # Election: max best, tie -> smallest end index; max_by carries the
    # elected row's run_min (start + its word prefix) and pw (word
    # prefix at end). total_tags = the max tag prefix (nondecreasing).
    elected = frame.groupBy(id_col).agg(
        F.max_by(
            F.struct("run_min", "pw", F.col(order_col).alias("end_tok")),
            (F.col("best") + _OFF) * _M + (_M - 1 - F.col(order_col)),
        ).alias("e"),
        F.max(F.col(order_col) + 1 - F.col("pw")).cast("long").alias(
            "total_tags"
        ),
    )
    start = (F.expr(f"e.run_min div {_M}") % _M).cast("long")
    pw_before = (F.col("e.run_min") % _M).cast("long")
    pt_before = start - pw_before
    pw_end = F.col("e.pw")
    pt_end = F.col("e.end_tok") + 1 - pw_end
    words_inside = pw_end - pw_before
    tags_inside = pt_end - pt_before
    return elected.select(
        F.col(id_col),
        start.alias("start_tok"),
        F.col("e.end_tok").cast("long").alias("end_tok"),
        words_inside.cast("long").alias("words_inside"),
        tags_inside.cast("long").alias("tags_inside"),
        (F.col("total_tags") - tags_inside + words_inside)
        .cast("long")
        .alias("bte_score"),
    )


def bte_extract(
    tokens: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "tok_no",
    is_tag_col: str = "is_tag",
    token_col: str = "token",
) -> DataFrame:
    """Extracted body text per document: the word tokens inside the
    elected BTE window, space-joined in stream order. The join keys on
    the document id, so it reuses the window stage's partitioning.
    Documents whose elected window holds zero words (all-tag pages)
    emit ``content = '', n_words = 0`` rather than vanishing — every
    input document gets exactly one output row."""
    win = bte_window(tokens, id_col=id_col, order_col=order_col,
                     is_tag_col=is_tag_col)
    inside = (
        tokens.join(win, [id_col])
        .where(
            (F.col(order_col) >= F.col("start_tok"))
            & (F.col(order_col) <= F.col("end_tok"))
            & (F.col(is_tag_col) == 0)
        )
    )
    agg = inside.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col), F.col(token_col)))
                ),
                lambda s: s[token_col],
            ),
            " ",
        ).alias("content"),
        F.count("*").cast("long").alias("n_words"),
    )
    return win.select(id_col).join(agg, [id_col], "left").select(
        id_col,
        F.coalesce(F.col("content"), F.lit("")).alias("content"),
        F.coalesce(F.col("n_words"), F.lit(0).cast("long")).alias("n_words"),
    )
