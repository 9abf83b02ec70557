"""Ensemble main-content extraction: majority vote across arms.

Single-algorithm extractors fail in uncorrelated ways — jusText
(stopword/link ladders) over-strips listy technical prose, Boilerpipe
(shallow text features) misses link-dense but real navigation-like
content, CETR (tag ratios) is blind on markup-free payloads. Dragnet
(Peters & Lecocq, WWW 2013) showed that combining diverse extractor
features beats every individual extractor; the deterministic version of
that insight is a per-block majority vote, which is also the standard
production guard: a block is boilerplate only when most arms agree.

``ensemble_vote`` is arm-agnostic: give it one row per block with N
0/1 verdict columns and it adds ``votes`` + ``is_content``
(votes >= threshold). Pure map — the expensive part is the arms
themselves; the vote rides whichever exchange produced the verdicts.
The composed registry query (``ensemble_extract``) runs jusText,
Boilerpipe and CETR on ONE shared paragraph frame and votes 2-of-3;
all three arms window on doc_id, so the compose plan stays keyed on
the document throughout.

vakra-dev/reader context: its cleaner chains heuristics and falls back
along C11's empty-content arm (src/scraper.ts fallback chain); the
vote is that chain expressed as evidence aggregation instead of
first-match-wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensemble_vote(
    verdicts: DataFrame,
    vote_cols: tuple[str, ...],
    threshold: int = None,
    out_col: str = "is_content",
) -> DataFrame:
    """Add ``votes`` (sum of the 0/1 verdict columns) and ``out_col``
    (1 iff votes >= threshold; default = strict majority)."""
    if not vote_cols:
        raise ValueError("at least one verdict column required")
    if threshold is None:
        threshold = len(vote_cols) // 2 + 1
    votes = None
    for c in vote_cols:
        term = F.col(c).cast("int")
        votes = term if votes is None else votes + term
    return verdicts.withColumn("votes", votes).withColumn(
        out_col, (F.col("votes") >= threshold).cast("int")
    )
