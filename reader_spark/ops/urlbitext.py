"""URL-matching parallel-document mining — the structural baseline the
ParaCrawl pipeline and the WMT16 bilingual document-alignment shared
task publish (Resnik & Smith 2003 "The Web as a Parallel Corpus"
originated it): two pages are translation candidates when their URLs
differ ONLY by a language marker — ``en.site.com/about`` vs
``fr.site.com/about``, or ``site.com/en/about`` vs
``site.com/fr/about``.  No content model at all, which is exactly why
it is the high-precision seed miner run before embedding-based
alignment (ops/bitext.py) — and why the two compose: URL pairs seed,
embedding mutual-NN verifies.

Mechanics (all within-row until one equi-join):
  * lowercase, strip scheme and ``www.``;
  * remove ONE language marker — a leading subdomain token or a
    leading path segment drawn from the marker dim — recording which
    language it was; URLs without a marker do not participate;
  * key = (host-without-marker, path-without-marker); candidates come
    from ONE groupBy on the key; within a key, each language keeps its
    smallest doc_id (deterministic), and every cross-language pair of
    elected docs is emitted.

Scale shape: the key groupBy is the only shuffle; per-key state is
bounded by the marker dim (|langs| elected docs per key).  The marker
list rides as literals (bounded, published-language-code sized).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["DEFAULT_LANG_MARKERS", "url_lang_key", "url_parallel_pairs"]

DEFAULT_LANG_MARKERS = (
    "en", "fr", "de", "es", "it", "pt", "nl", "ru", "zh", "ja", "ko",
)


def url_lang_key(url: Column, markers: Sequence[str]) -> Column:
    """struct(lang, key) — the detected language marker and the URL
    with that one marker removed; lang = '' when no marker matches."""
    u = F.regexp_replace(F.lower(url), r"^[a-z]+://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    host = F.regexp_extract(u, r"^([^/]*)", 1)
    path = F.substring(u, F.length(host) + 1, F.length(u))
    first_sub = F.regexp_extract(host, r"^([^.]+)\.", 1)
    first_seg = F.regexp_extract(path, r"^/([^/]+)", 1)
    marker_arr = F.array(*[F.lit(m) for m in markers])
    sub_is_lang = F.array_contains(marker_arr, first_sub) & (
        first_sub != ""
    )
    seg_is_lang = F.array_contains(marker_arr, first_seg) & (
        first_seg != ""
    )
    # subdomain marker wins when both appear (one marker removed only)
    lang = (
        F.when(sub_is_lang, first_sub)
        .when(seg_is_lang, first_seg)
        .otherwise("")
    )
    key = (
        F.when(
            sub_is_lang,
            F.concat(
                F.regexp_replace(host, r"^[^.]+\.", ""), path
            ),
        )
        .when(
            seg_is_lang,
            F.concat(host, F.regexp_replace(path, r"^/[^/]+", "")),
        )
        .otherwise(u)
    )
    return F.struct(lang.alias("lang"), key.alias("key"))


def url_parallel_pairs(
    docs: DataFrame,
    markers: Sequence[str] = DEFAULT_LANG_MARKERS,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Cross-language URL-twin pairs.

    Returns ``(key, lang_a, doc_a, lang_b, doc_b)`` with
    ``lang_a < lang_b`` — one row per unordered language pair per
    stripped-URL key; within (key, lang) the smallest doc_id is
    elected (URL duplicates collapse deterministically).  Docs whose
    URL carries no language marker never pair.
    """
    if not markers:
        raise ValueError("markers must be non-empty")
    lk = url_lang_key(F.col(url_col), markers)
    tagged = docs.select(
        F.col(id_col).cast("long").alias("doc"),
        lk["lang"].alias("lang"),
        lk["key"].alias("key"),
    ).where(F.col("lang") != "")
    elected = tagged.groupBy("key", "lang").agg(
        F.min("doc").alias("doc")
    )
    a = elected.select(
        "key", F.col("lang").alias("lang_a"), F.col("doc").alias("doc_a")
    )
    b = elected.select(
        "key", F.col("lang").alias("lang_b"), F.col("doc").alias("doc_b")
    )
    return a.join(b, "key").where(F.col("lang_a") < F.col("lang_b"))
