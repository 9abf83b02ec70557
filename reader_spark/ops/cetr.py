"""CETR — Content Extraction via Tag Ratios (Weninger, Hsu, Han:
"CETR: Content Extraction via Tag Ratios", WWW 2010).

The fourth main-content arm next to the Readability scorer
(reader_spark/readability.py), jusText (ops/justext.py) and Boilerpipe
(ops/boilerpipe.py). CETR's insight is purely lexical: per LINE of raw
HTML, the ratio of visible text characters to tag count spikes inside
the main content and collapses in nav/chrome. The pipeline is

    1. tag ratio  TR(i)   = text_chars(i) / max(tag_count(i), 1)
    2. smoothing  TR'(i)  = Gaussian-kernel smoothing of TR
    3. threshold          = per-document mean of TR'
       (the paper's 1-D "CETR-TM" cut; the 2-D k-means variant of §4.2
       clusters (TR', |dTR'|) — the derivative column is exposed here
       so callers can feed it to ops.vectorize.text_clusters-style
       seeded k-means, but the published 1-D mean cut is the arm's
       deterministic contract)

Determinism contract: ALL arithmetic is integer. Tag ratios are held in
micro-units (text_chars * 1_000_000 DIV tag_count); the discrete
Gaussian is the binomial kernel (1, 4, 6, 4, 1) with edge
renormalization over the PRESENT taps (integer numerator DIV integer
denominator); the mean cut compares smoothed * n_lines > sum(smoothed)
so no engine ever divides a float. This makes the Spark run and the
DuckDB oracle bit-identical.

Shape at 100 TB: features are a pure map over the scan (two regexes,
whole-stage codegen). The kernel taps are lag/lead over a window
PARTITIONED BY doc_id (bounded by lines-per-page) and the mean cut is
an unordered aggregate window over the SAME key, so the whole arm costs
ONE hash exchange on doc_id — no global window, no second shuffle
(pinned by tests/test_plans.py).

vakra-dev/reader context: its content cleaner is DOM-structural
(src/utils/content-cleaner.ts always-remove/nav heuristics); CETR is
the markup-free fallback for pages whose tag vocabulary gives no signal
(minified class names, div soup) — exactly the failure mode the paper
benchmarks against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Discrete Gaussian smoother: binomial row 4, radius 2 (paper §4.1 uses
# a Gaussian kernel; the binomial integer form keeps the contract exact).
BINOMIAL_KERNEL = (1, 4, 6, 4, 1)

_TAG_RE = "<[^>]*>"


def cetr_features(
    lines: DataFrame,
    html_col: str = "html",
) -> DataFrame:
    """Per-line CETR features from raw HTML: ``tag_count`` ('<' opener
    count — one per well-formed tag), ``text_chars`` (chars left after
    stripping tags) and ``tr_micro`` (tag ratio in exact micro-units).
    Pure map, rides the scan."""
    out = lines.withColumn(
        "tag_count",
        (
            F.length(F.col(html_col))
            - F.length(F.regexp_replace(F.col(html_col), "<", ""))
        ).cast("long"),
    ).withColumn(
        "text_chars",
        F.length(F.regexp_replace(F.col(html_col), _TAG_RE, "")).cast("long"),
    )
    return out.withColumn(
        "tr_micro",
        F.expr("text_chars * 1000000L DIV greatest(tag_count, 1L)"),
    )


def cetr_classify(
    lines: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "line_no",
    html_col: str = "html",
) -> DataFrame:
    """Classify each HTML line as content/boilerplate with the CETR
    mean cut. Input: (id, line_no, html) rows; output adds tag_count,
    text_chars, tr_micro, smoothed_micro, deriv_micro and
    ``is_content`` (1/0).

    deriv_micro is the paper's absolute smoothed-derivative axis
    (|TR'(i+1) - TR'(i)|, 0 at the last line) for callers composing the
    2-D variant; the 1-D mean cut here ignores it.
    """
    feats = cetr_features(lines, html_col)
    w = Window.partitionBy(id_col).orderBy(order_col)
    taps = [
        F.lag("tr_micro", 2).over(w),
        F.lag("tr_micro", 1).over(w),
        F.col("tr_micro"),
        F.lead("tr_micro", 1).over(w),
        F.lead("tr_micro", 2).over(w),
    ]
    num = None
    den = None
    for tap, wt in zip(taps, BINOMIAL_KERNEL):
        term = F.coalesce(tap, F.lit(0)) * F.lit(wt)
        present = F.when(tap.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = present if den is None else den + present
    sm = feats.withColumn("_num", num.cast("long")).withColumn(
        "_den", den.cast("long")
    )
    sm = sm.withColumn("smoothed_micro", F.expr("_num DIV _den")).drop(
        "_num", "_den"
    )
    # |dTR'|: forward difference over the SAME ordered window (no extra
    # exchange — Spark stacks window functions on one sort).
    sm = sm.withColumn(
        "deriv_micro",
        F.abs(
            F.coalesce(F.lead("smoothed_micro", 1).over(w), F.col("smoothed_micro"))
            - F.col("smoothed_micro")
        ).cast("long"),
    )
    # Mean cut without division: content iff TR' * n > sum(TR') over the
    # document. Unordered agg window over the same partitioning key.
    d = Window.partitionBy(id_col)
    return sm.withColumn(
        "is_content",
        F.when(
            F.col("smoothed_micro") * F.count(F.lit(1)).over(d)
            > F.sum("smoothed_micro").over(d),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )


def cetr_extract(
    lines: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "line_no",
    html_col: str = "html",
) -> DataFrame:
    """Applied pass: classify lines, strip tags from the survivors and
    report per document (id, n_lines, n_content, content_md5) — md5
    over the tag-stripped content lines in page order (md5('') when the
    page is all boilerplate). The summary groupBy keys on the doc_id
    the window already shuffled on."""
    cls = cetr_classify(lines, id_col, order_col, html_col)
    stripped = F.regexp_replace(F.col(html_col), _TAG_RE, "")
    return (
        cls.withColumn("_txt", stripped)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("is_content").cast("long")).alias("n_content"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("is_content") == 1,
                                    F.struct(F.col(order_col), F.col("_txt")),
                                )
                            )
                        ),
                        lambda x: x["_txt"],
                    ),
                )
            ).alias("content_md5"),
        )
    )
