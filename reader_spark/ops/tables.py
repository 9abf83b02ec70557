"""GFM pipe-table → structured cells: the table-understanding feed.

Extraction (reader_spark/extract/serializer.py:309, mirroring the
reference's table handling in vakra-dev/reader
src/formatters/markdown.ts) renders every HTML table as a GFM pipe
table span. Table-QA / table-pretraining corpora need the CELLS, not
the markdown — this op re-structures table spans into
(doc, table, row_idx, col_idx, cell) rows.

Parsing contract (exactly what the serializer emits):
- one line per row: ``| a | b |``; row 2 is the ``| --- | --- |``
  separator and is skipped (header keeps row_idx 0, data rows 1..);
- cell pipes are escaped ``\\|`` and newlines collapsed to spaces, so
  the raw sequence space-pipe-space can ONLY be a cell delimiter
  (any pipe inside a cell carries a preceding backslash) — splitting
  on literal ``' | '`` is lossless; the escape is then undone;
- ragged rows were right-padded with empty cells at serialization,
  so every row of a table splits to the same width.

Shape at 100 TB: pure map — split lines, posexplode, split cells,
posexplode; no shuffle, no UDF, whole-stage codegen end to end. The
double explode multiplies rows by cells-per-table (bounded by page
size), never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP_ROW_RE = r"^\|( ---+ \|)+$"


def table_cells(
    spans: DataFrame,
    id_col: str = "doc_id",
    table_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Explode GFM pipe-table span text into cell rows.

    Input: one row per table span (``text_col`` holds the pipe-table
    markdown). Output: (id[, table_col], row_idx, col_idx, cell) with
    row_idx 0 = header, 1.. = data rows (the ``---`` separator line is
    dropped), cell text unescaped.
    """
    keys = [F.col(id_col)] + ([F.col(table_col)] if table_col else [])
    lines = spans.select(
        *keys,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_li", "_line"),
    ).where(~((F.col("_li") == 1) & F.col("_line").rlike(_SEP_ROW_RE)))
    row_idx = (
        F.when(F.col("_li") == 0, F.lit(0)).otherwise(F.col("_li") - 1)
    ).alias("row_idx")
    # strip the outer '| ' ... ' |', then split on the unescapable
    # delimiter; unescape cell pipes afterwards
    inner = F.regexp_replace(F.col("_line"), r"^\| | \|$", "")
    cells = F.split(inner, r" \| ")
    return lines.select(
        *keys,
        row_idx,
        F.posexplode(cells).alias("col_idx", "_cell"),
    ).withColumn("cell", F.replace(F.col("_cell"), F.lit("\\|"), F.lit("|"))).drop(
        "_cell"
    )
