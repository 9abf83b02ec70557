"""Math-content detection — the rule-based prefilter stage of
math-corpus pipelines (OpenWebMath, Paster et al. 2023 §2.2, runs a
KaTeX/LaTeX pattern prefilter before its MathScore classifier;
Minerva/DeepSeekMath describe the same shape): cheap, deterministic
signals that a page contains mathematical notation, so the expensive
classifier (or a human allow-list) only sees plausible candidates.

Signals (all within-row regex counts — `regexp_count` is JVM-side,
no UDF, scan-bound at 10^12 docs):
  * ``n_display`` — ``$$...$$`` display-math blocks;
  * ``n_inline`` — ``$...$`` spans (each display block also produces
    exactly one faux-inline match, documented, so consumers wanting
    "pure inline" subtract);
  * ``n_tex_cmds`` — ``\\frac``-style TeX commands;
  * ``n_math_symbols`` — occurrences of the operator/symbol class
    ``+ = < > ^ _ × ÷ ± ∑ ∫ √ π ≈ ≠ ∞``;
  * ``math_score_milli`` — fixed-weight integer combination capped at
    1000 (a heuristic ranking score, NOT a probability), and the
    ``is_math`` flag at the 120-milli cut.

The DuckDB twin counts with ``len(regexp_extract_all(...))`` over the
identical RE2-compatible patterns; weights are integers so scores are
portable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["MATH_PATTERNS", "MATH_WEIGHTS", "math_signals"]

# RE2-compatible AND java.util.regex-compatible (no lookaround).
MATH_PATTERNS = {
    "n_display": r"\$\$[^$]+\$\$",
    "n_inline": r"\$[^$]+\$",
    "n_tex_cmds": r"\\[a-zA-Z]+",
    "n_math_symbols": r"[+=<>^_×÷±∑∫√π≈≠∞]",
}

MATH_WEIGHTS = {
    "n_display": 60,
    "n_inline": 40,
    "n_tex_cmds": 50,
    "n_math_symbols": 4,
}

SCORE_CAP = 1000
IS_MATH_CUT = 120


def math_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc math-notation signal table.

    Returns ``(doc_id, n_display, n_inline, n_tex_cmds,
    n_math_symbols, math_score_milli, is_math)``.
    """
    text = F.col(text_col)
    counts = {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat in MATH_PATTERNS.items()
    }
    score = F.lit(0)
    for name, w in MATH_WEIGHTS.items():
        score = score + F.lit(w) * counts[name]
    score = F.least(score, F.lit(SCORE_CAP)).cast("long")
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        *[counts[name].alias(name) for name in MATH_PATTERNS],
        score.alias("math_score_milli"),
        (score >= IS_MATH_CUT).alias("is_math"),
    )
