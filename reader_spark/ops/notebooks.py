"""Jupyter-notebook-to-script conversion — The Stack's notebook prep
(Kocetkov et al. 2022 §2; StarCoder's "Jupyter-scripts" subset is built
exactly this way): parse the ``.ipynb`` JSON, keep cell order, render
markdown cells as comment blocks and code cells verbatim, join with
blank lines — so notebook corpora train as ordinary source files while
preserving the prose/code interleaving.

Spark-first shape: ``from_json`` with an explicit schema (JVM-side,
no Python), then pure array ``transform``/``array_join`` renders —
the whole conversion is a within-row projection that rides the ingest
scan at 10^9 notebooks; malformed JSON degrades to ``valid = false``
(from_json yields NULL), never an error row.

The DuckDB twin renders the same cells through ``json_transform`` /
list lambdas; scripts compare byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["NB_SCHEMA", "notebook_to_script"]

NB_SCHEMA = (
    "struct<cells: array<struct<cell_type: string, source: array<string>>>>"
)


def notebook_to_script(
    df: DataFrame,
    id_col: str = "doc_id",
    json_col: str = "notebook_json",
    comment_prefix: str = "# ",
) -> DataFrame:
    """Returns ``(doc_id, valid, n_cells, n_code_cells,
    n_markdown_cells, n_script_chars, script)``.

    ``script`` is the cell renders joined by blank lines: code cells'
    source lines joined verbatim, any other cell type (markdown, raw)
    prefixed line-by-line with ``comment_prefix``.  Invalid JSON (or
    JSON without a cells array) yields ``valid = false`` with NULL
    script and zero counts — quarantine rows, not job failures.
    """
    parsed = F.from_json(F.col(json_col), NB_SCHEMA)
    cells = parsed["cells"]
    valid = cells.isNotNull()
    rendered = F.transform(
        cells,
        lambda c: F.when(
            c["cell_type"] == "code", F.array_join(c["source"], "\n")
        ).otherwise(
            F.array_join(
                F.transform(
                    c["source"],
                    lambda l: F.concat(F.lit(comment_prefix), l),
                ),
                "\n",
            )
        ),
    )
    script = F.when(valid, F.array_join(rendered, "\n\n"))
    n_cells = F.when(valid, F.size(cells)).otherwise(0).cast("long")
    n_code = (
        F.when(
            valid,
            F.size(F.filter(cells, lambda c: c["cell_type"] == "code")),
        )
        .otherwise(0)
        .cast("long")
    )
    n_md = (
        F.when(
            valid,
            F.size(
                F.filter(cells, lambda c: c["cell_type"] == "markdown")
            ),
        )
        .otherwise(0)
        .cast("long")
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        valid.alias("valid"),
        n_cells.alias("n_cells"),
        n_code.alias("n_code_cells"),
        n_md.alias("n_markdown_cells"),
        F.coalesce(F.length(script), F.lit(0)).cast("long").alias(
            "n_script_chars"
        ),
        script.alias("script"),
    )
