"""Repository-context rendering for code models — the StarCoder2 /
DeepSeek-Coder training-sample shape (Lozhkov et al. 2024 §5 train on
repo-level concatenations: files of one repository, path-ordered,
joined with sentinel separators, so the model sees cross-file
context).  One training sample per repository:

    <|repo_name|>{repo}<|file_sep|>{path1}\\n{content1}<|file_sep|>...

with a character budget enforced by the PREFIX rule: files render in
path order until the first file that would overflow; that straddler
and everything after it are dropped (deterministic, order-respecting —
the ops/sampling.py budget-fill discipline, documented rather than
implicit).

Scale shape (10^8 repos, 10^10 files): ONE groupBy(repo) whose state
is the repo's own files — bounded by the ``max_files`` cap applied to
the path-sorted list BEFORE the render fold, so a pathological
monorepo cannot blow an aggregation buffer.  The render itself is a
within-row array fold (sort_array + slice + aggregate) — no window,
no second shuffle, no UDF.  The DuckDB twin replays the identical
fold via list_reduce (init rides as a prepended element of the same
struct type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["REPO_TOK", "FILE_TOK", "repo_context_render"]

REPO_TOK = "<|repo_name|>"
FILE_TOK = "<|file_sep|>"


def repo_context_render(
    files: DataFrame,
    budget_chars: int = 8000,
    max_files: int = 64,
    repo_col: str = "repo",
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """One rendered repo-context sample per repository.

    Returns ``(repo, n_files, n_files_rendered, n_chars, context)`` —
    ``n_files`` counts the repo's files (pre-cap), ``n_files_rendered``
    those that made the budget; ``context`` is the sentinel-joined
    render, ``n_chars`` its length.  Each file's budget cost is its
    separator + path + newline + content render length, so the budget
    bounds the ACTUAL sample size (minus the fixed repo header).
    """
    if budget_chars < 1 or max_files < 1:
        raise ValueError(
            f"budget_chars and max_files must be >= 1, got "
            f"{(budget_chars, max_files)}"
        )
    sorted_files = F.slice(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(path_col).alias("path"),
                    F.col(content_col).alias("content"),
                )
            )
        ),
        1,
        max_files,
    )
    pieces = F.transform(
        sorted_files,
        lambda f: F.struct(
            F.lit(False).alias("stopped"),
            F.length(
                F.concat(
                    F.lit(FILE_TOK), f["path"], F.lit("\n"), f["content"]
                )
            )
            .cast("long")
            .alias("chars"),
            F.concat(
                F.lit(FILE_TOK), f["path"], F.lit("\n"), f["content"]
            ).alias("ctx"),
            F.lit(1).cast("long").alias("n"),
        ),
    )
    init = F.struct(
        F.lit(False).alias("stopped"),
        F.lit(0).cast("long").alias("chars"),
        F.lit("").alias("ctx"),
        F.lit(0).cast("long").alias("n"),
    )

    def step(acc, x):
        fits = (~acc["stopped"]) & (
            acc["chars"] + x["chars"] <= F.lit(budget_chars)
        )
        return F.when(
            fits,
            F.struct(
                F.lit(False).alias("stopped"),
                (acc["chars"] + x["chars"]).alias("chars"),
                F.concat(acc["ctx"], x["ctx"]).alias("ctx"),
                (acc["n"] + 1).alias("n"),
            ),
        ).otherwise(
            F.struct(
                F.lit(True).alias("stopped"),
                acc["chars"].alias("chars"),
                acc["ctx"].alias("ctx"),
                acc["n"].alias("n"),
            )
        )

    agg = files.groupBy(F.col(repo_col).alias("repo")).agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.aggregate(pieces, init, step).alias("acc"),
    )
    context = F.concat(F.lit(REPO_TOK), F.col("repo"), F.col("acc.ctx"))
    return agg.select(
        "repo",
        "n_files",
        F.col("acc.n").alias("n_files_rendered"),
        F.length(context).cast("long").alias("n_chars"),
        context.alias("context"),
    )
