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

from reader_spark.spark.fanout import fanout_scan


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
    out = fanout_scan(docs).select(
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
    spans = _merge_extents(marked, id_col, min_tokens)
    return spans.select(
        id_col,
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        "n_windows",
    )


def _merge_extents(marked: DataFrame, id_col: str, L: int) -> DataFrame:
    """Gaps-and-islands interval merge over (id, pos) window rows: windows
    [pos, pos+L-1] merge while the next window starts at or before
    running_max_end + 1 (overlap or exact adjacency both extend the
    duplicated extent). Returns (id, span_start, span_end, n_windows)."""
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
    return spans.groupBy(id_col, "span_id").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (L - 1)).alias("span_end"),
        F.count("*").alias("n_windows"),
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    hashed: bool = True,
) -> DataFrame:
    """APPLY Lee et al.'s dedup: cut every LATER occurrence of a >= L-token
    repeated substring out of the text; the corpus-global first occurrence
    (lowest (id, pos) per window) survives, so exactly one copy of every
    duplicated passage remains in the corpus — the 'remove all but one'
    policy of the paper, not a drop-the-whole-doc filter.

    Returns (id, n_tokens, n_removed, clean_text): every doc stays in the
    output; untouched docs pass through verbatim.

    Shape at 100 TB: one extra key-bounded window over positional_windows
    output (row_number per gram picks the canonical first occurrence),
    the same islands merge per doc, then the extents — a FEW intervals
    per doc, not per-token rows — join back and drop tokens via one
    indexed array filter (O(tokens x extents) per row, extents are merged
    maximal spans).
    """
    grams = positional_windows(docs, id_col, text_col, min_tokens, hashed=hashed)
    w_first = Window.partitionBy("gram").orderBy(id_col, "pos")
    later = (
        grams.withColumn("__rn", F.row_number().over(w_first))
        .where(F.col("__rn") > 1)
        .select(id_col, "pos")
    )
    extents = _merge_extents(later, id_col, min_tokens)
    per_doc = extents.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"), F.col("span_end").alias("e")
                )
            )
        ).alias("__spans")
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(F.col(id_col), toks.alias("__t")).join(
        per_doc, id_col, "left"
    )
    spans_arr = F.coalesce(
        F.col("__spans"),
        F.array().cast("array<struct<s:bigint,e:bigint>>"),
    )
    keep = F.filter(
        F.col("__t"),
        lambda tok, i: ~F.exists(
            spans_arr, lambda sp: (sp["s"] <= i + 1) & (i + 1 <= sp["e"])
        ),
    )
    return base.select(
        id_col,
        F.size("__t").cast("long").alias("n_tokens"),
        (F.size("__t") - F.size(keep)).cast("long").alias("n_removed"),
        F.concat_ws(" ", keep).alias("clean_text"),
    )
