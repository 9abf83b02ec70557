"""hreflang language-edition resolution — the `rel="alternate"
hreflang` graph every multilingual site publishes (Google's
documented contract: annotations MUST be reciprocal; an edition that
does not link back is ignored). A corpus pipeline needs this for two
reasons: (1) near-dup deletion must NOT collapse language editions of
one page (they are translations, not duplicates — they belong in
bitext mining, ops/bitext.py), and (2) per-language routing wants one
elected URL per (cluster, language).

Three layers, all key-bounded:

* **audit** — every declared edge classified: `reciprocal` (the return
  annotation exists), `missing_return` (the classic hreflang
  misconfiguration; ignored by the clusterer exactly as search engines
  do), `self` (the spec's required self-referencing row).
* **clusters** — connected components (certified pointer-jumping CC)
  over the RECIPROCAL undirected edges only.
* **editions** — per (cluster, lang) the elected URL (deterministic
  min) with a `lang_conflict` flag when a cluster declares two
  different URLs for one language (the second classic
  misconfiguration; both rows surface, neither silently drops).

Shape at 100 TB: reciprocity is one self-equi-join on the (src, dst)
pair key; clustering is the linear-size CC; elections are
map-side-combined groupBys. Nothing driver-side, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hreflang_audit(
    links: DataFrame,
    url_col: str = "url",
    lang_col: str = "hreflang",
    href_col: str = "href",
) -> DataFrame:
    """(url, hreflang, href, status) for every declared annotation."""
    e = links.select(
        F.col(url_col).alias("u"),
        F.lower(F.col(lang_col)).alias("l"),
        F.col(href_col).alias("h"),
    )
    back = e.select(
        F.col("h").alias("u"), F.col("u").alias("h")
    ).distinct().withColumn("__back", F.lit(True))
    return (
        e.join(back, ["u", "h"], "left")
        .select(
            F.col("u").alias("url"),
            F.col("l").alias("hreflang"),
            F.col("h").alias("href"),
            F.when(F.col("u") == F.col("h"), F.lit("self"))
            .when(F.col("__back"), F.lit("reciprocal"))
            .otherwise(F.lit("missing_return"))
            .alias("status"),
        )
    )


def hreflang_editions(
    links: DataFrame,
    url_col: str = "url",
    lang_col: str = "hreflang",
    href_col: str = "href",
) -> DataFrame:
    """(cluster, lang, url, lang_conflict): language-edition table over
    reciprocal clusters. Membership comes from reciprocal edges ONLY
    (a page whose partners never link back stays unclustered, exactly
    as search engines treat it); each member's language is the minimum
    inbound annotation among reciprocal+self rows, and a cluster
    declaring two URLs for one language flags every row of the
    contested language."""
    from reader_spark.ops.dedup import connected_components

    audited = hreflang_audit(links, url_col, lang_col, href_col)
    recip = audited.where(F.col("status") == "reciprocal").select(
        F.col("url").alias("doc_a"), F.col("href").alias("doc_b")
    )
    comps = connected_components(recip)

    # a URL's language = what OTHERS declare for it, falling back to
    # its self-annotation (the spec's source of truth is the inbound
    # annotation set)
    declared = (
        hreflang_audit(links, url_col, lang_col, href_col)
        .where(F.col("status").isin("reciprocal", "self"))
        .select(
            F.col("href").alias("url"), F.col("hreflang").alias("lang")
        )
        .groupBy("url")
        .agg(F.min("lang").alias("lang"))
    )
    members = comps.select(F.col("doc").alias("url"), "component").join(
        declared, "url", "left"
    )
    per_lang = members.groupBy("component", "lang").agg(
        F.countDistinct("url").cast("long").alias("n_urls")
    )
    return (
        members.join(per_lang, ["component", "lang"], "left")
        .select(
            F.col("component").alias("cluster"),
            "lang",
            "url",
            (F.coalesce(F.col("n_urls"), F.lit(1)) > 1).alias(
                "lang_conflict"
            ),
        )
    )
