"""Anchor-text corpus aggregation: the link-text dataset product.

Inbound anchor text is the classic free description of a page (the
signal behind anchor-text retrieval corpora like ORCAS and the DPR/
retrieval-pretraining recipes): aggregate every (target_url, anchor)
pair the crawl saw, drop no-signal generic anchors, and elect each
URL's dominant anchor. vakra-dev/reader surfaces per-page links
(src/utils/url-helpers.ts link extraction feeds the crawler); this op
turns the corpus-wide union of those link rows into a training-data
table.

Filtering (published anchor-corpus practice):
- empty / whitespace anchors and anchors longer than ``max_len`` chars
  (navigation blobs) are dropped;
- a literal generic-anchor blocklist ("click here", "read more", …)
  rides the scan as one lowercase IN — no join.

Election: the dominant anchor per URL is max by (n_refs, anchor) —
highest reference count, ties broken by lexicographically LARGEST
anchor, one deterministic struct-max in both engines.

Shape at 100 TB: two-level aggregation — groupBy(url, anchor) with
map-side combine absorbs mega-linked pages (each map task emits one
row per distinct pair), then groupBy(url) folds the per-anchor rows;
both exchanges key on the url prefix. Distinct source domains use the
same pair-level partial path. No window, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GENERIC_ANCHORS = (
    "click here",
    "here",
    "read more",
    "more",
    "link",
    "this",
    "home",
)


def anchor_corpus(
    links: DataFrame,
    url_col: str = "target_url",
    anchor_col: str = "anchor",
    source_col: str = "src_domain",
    max_len: int = 128,
    generic: tuple[str, ...] = GENERIC_ANCHORS,
) -> DataFrame:
    """Aggregate link rows into the per-URL anchor table:
    (url, n_refs, n_anchors, n_domains, top_anchor, top_anchor_refs).
    """
    a = F.trim(F.col(anchor_col))
    kept = links.where(
        (F.length(a) > 0)
        & (F.length(a) <= max_len)
        & ~F.lower(a).isin(*[g.lower() for g in generic])
    ).select(
        F.col(url_col).alias("url"),
        a.alias("anchor"),
        F.col(source_col).alias("src"),
    )
    pairs = kept.groupBy("url", "anchor").agg(
        F.count(F.lit(1)).alias("n_refs")
    )
    rollup = pairs.groupBy("url").agg(
        F.sum("n_refs").alias("n_refs"),
        F.count(F.lit(1)).alias("n_anchors"),
        F.max(F.struct(F.col("n_refs"), F.col("anchor"))).alias("_top"),
    )
    # exact distinct inbound domains per url — its own partial-agg path
    # (Spark plans count-distinct as expand+two-level agg); joined back
    # on the same url key, so no third partitioning appears
    doms = kept.groupBy("url").agg(
        F.countDistinct("src").alias("n_domains")
    )
    return rollup.join(doms, "url").select(
        "url",
        "n_refs",
        "n_anchors",
        "n_domains",
        F.col("_top").getField("anchor").alias("top_anchor"),
        F.col("_top").getField("n_refs").alias("top_anchor_refs"),
    )
