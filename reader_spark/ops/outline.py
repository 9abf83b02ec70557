"""Document outline extraction: heading-hierarchy edges.

Section-aware chunking, tables of contents, and heading-conditioned
training samples all need each heading's PARENT (the nearest preceding
heading of a shallower level), not just the flat heading list the
serializer emits (reader_spark/extract/serializer.py:239, ATX form
``#{level} text`` mirroring the reference's markdown formatter). This
op turns heading spans into outline edges.

Shape at 100 TB: heading level is a pure map (length of the leading
``#`` run). The parent search exploits that the level domain is
BOUNDED (ATX has exactly 6): for each level ℓ, ONE window column
``last ord where level == ℓ`` over the preceding frame, then
parent = greatest of the ℓ < my-level columns — six fixed columns,
one doc-partitioned window pass, no recursion, no per-row loop.
Partitions are bounded by headings-per-page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_LEVEL = 6


def outline_edges(
    spans: DataFrame,
    id_col: str = "doc_id",
    ord_col: str = "ord",
    text_col: str = "text",
) -> DataFrame:
    """(id, ord, level, title, parent_ord) for every ATX-heading span.

    ``level`` = leading-# count (1..6); ``title`` = the heading text
    without the marker; ``parent_ord`` = ord of the nearest PRECEDING
    heading with a strictly shallower level, NULL for roots. Non-ATX
    rows (no leading #) are ignored.
    """
    level = F.length(F.regexp_extract(F.col(text_col), r"^(#{1,6}) ", 1))
    hs = spans.where(level > 0).select(
        F.col(id_col),
        F.col(ord_col),
        level.alias("level"),
        F.regexp_replace(F.col(text_col), r"^#{1,6} ", "").alias("title"),
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy(ord_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lasts = [
        F.last(
            F.when(F.col("level") == lv, F.col(ord_col)), ignorenulls=True
        )
        .over(w_prev)
        .alias(f"_last{lv}")
        for lv in range(1, MAX_LEVEL + 1)
    ]
    withl = hs.select("*", *lasts)
    parent = F.greatest(
        *[
            F.when(F.col("level") > lv, F.col(f"_last{lv}"))
            for lv in range(1, MAX_LEVEL)
        ]
    )
    return withl.select(
        F.col(id_col),
        F.col(ord_col),
        "level",
        "title",
        parent.alias("parent_ord"),
    )


def section_of_spans(
    spans: DataFrame,
    id_col: str = "doc_id",
    ord_col: str = "ord",
    text_col: str = "text",
) -> DataFrame:
    """Label every NON-heading span with its governing heading — the
    nearest preceding heading span of any level (NULL in front matter
    before the first heading). The RAG-chunk product: each text/table/
    code span leaves with (section_ord, section_level, section_title)
    so retrieval chunks carry their section context; full ancestor
    paths come from joining ``outline_edges`` on section_ord.

    Same single doc-partitioned window as outline_edges; pure map
    otherwise."""
    level = F.length(F.regexp_extract(F.col(text_col), r"^(#{1,6}) ", 1))
    base = spans.withColumn("_lvl", level)
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy(ord_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    head_info = F.when(
        F.col("_lvl") > 0,
        F.struct(
            F.col(ord_col).alias("o"),
            F.col("_lvl").alias("l"),
            F.regexp_replace(F.col(text_col), r"^#{1,6} ", "").alias("t"),
        ),
    )
    # the window must run BEFORE the non-heading filter — it is the
    # heading rows themselves that carry the section labels forward
    labelled = base.withColumn(
        "_sec", F.last(head_info, ignorenulls=True).over(w_prev)
    )
    return labelled.where(F.col("_lvl") == 0).select(
        F.col(id_col),
        F.col(ord_col),
        F.col(text_col),
        F.col("_sec").getField("o").alias("section_ord"),
        F.col("_sec").getField("l").alias("section_level"),
        F.col("_sec").getField("t").alias("section_title"),
    )
