"""Exact substring-level deduplication: find every maximal token span that
appears (>= 2 times) anywhere in the corpus — the operation Lee et al.,
"Deduplicating Training Data Makes Language Models Better" (ACL'22),
perform with a corpus-wide suffix array.

Spark-first equivalence instead of a suffix array: a duplicated span of
length m >= L contains a duplicated L-token window at every offset, and
those windows sit at consecutive positions p..p+m-L — so hashing every
L-window, keeping the globally duplicated ones (one groupBy), and merging
each document's surviving windows back into intervals (one per-doc window
pass) reconstructs exactly the maximal duplicated extents. Overlapping
extents from DIFFERENT repeated substrings merge into one span — the right
behavior for span removal, the downstream use.

Shuffle shape at 100 TB: one row per token position, carrying an 8-byte
xxhash64 (never the window text) -> groupBy(gram) count (map-side
combined) -> semi-join survivors back (both sides hash-partitioned on the
same key) -> per-doc sort for interval merge. No all-pairs step anywhere;
cost is O(total tokens) rows through three key-bounded shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def positional_windows(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    length: int,
    hashed: bool = True,
) -> DataFrame:
    """(id, pos, gram) — every L-token window with its 1-based token
    position. Documents shorter than `length` tokens yield no rows (no
    short-text fallback here: a span shorter than L cannot be a >=L dup).
    Linear construction (arrays_zip of shifted slices), same as
    dedup.shingles — the transform(sequence, slice) form is O(len^2).

    `length` is capped at 1024: the expression tree carries one shifted
    slice per window token, so an absurd length builds an absurd plan
    (observed: length=100k wedges codegen) — and no published substring-
    dedup setup uses windows past a few hundred tokens (Lee et al. use
    50)."""
    if not 2 <= length <= 1024:
        raise ValueError(f"length must be in [2, 1024], got {length}")
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    size = F.size(words)
    k = size - (length - 1)
    shifts = [words] + [
        F.slice(words, i + 1, F.greatest(size - i, F.lit(0)))
        for i in range(1, length)
    ]
    joined = F.transform(
        F.arrays_zip(*shifts),
        lambda s: F.concat_ws(" ", *[s.getField(str(i)) for i in range(length)]),
    )
    windows = F.slice(joined, 1, F.greatest(k, F.lit(0)))
    out = docs.select(
        F.col(id_col),
        F.posexplode(windows).alias("pos0", "gram"),
    ).select(id_col, (F.col("pos0") + 1).cast("long").alias("pos"), "gram")
    if hashed:
        out = out.select(id_col, "pos", F.xxhash64("gram").alias("gram"))
    return out


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    hashed: bool = True,
) -> DataFrame:
    """Maximal duplicated token spans per document:
    (id, span_start, span_end, span_tokens, n_windows) with 1-based
    inclusive token bounds. A window counts as duplicated when its text
    occurs >= 2 times corpus-wide — across documents OR repeated inside
    one document (both are training-data duplication).

    `hashed=False` matches on raw window text (the SQL-oracle twin);
    production hashes to xxhash64 so shuffled rows carry 8 bytes.
    """
    grams = positional_windows(docs, id_col, text_col, min_tokens, hashed=hashed)
    dup = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n_occ"))
        .where(F.col("n_occ") >= 2)
        .select("gram")
    )
    marked = grams.join(dup, "gram", "left_semi")

    # Gaps-and-islands interval merge: windows [pos, pos+L-1] merge while
    # the next window starts at or before running_max_end + 1 (overlap or
    # exact adjacency both extend the duplicated extent).
    L = min_tokens
    w_order = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max(F.col("pos") + (L - 1)).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_span = F.when(
        prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1), 1
    ).otherwise(0)
    spans = marked.withColumn(
        "span_id",
        F.sum(new_span).over(
            w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        spans.groupBy(id_col, "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (L - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_windows",
        )
    )
