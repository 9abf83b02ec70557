"""Free-text date mining — the corpus RECENCY profile. Header metadata
(article:published_time, the metadata battery's X-columns) covers only
pages that declare it; most of a web corpus doesn't, and training-mix
recipes (and refresh planners) want "when is this text ABOUT / from"
at corpus scale. The standard cheap signal is date MENTIONS in the
body: ISO dates, US long-form dates, and slashed numerics, validated
by range rules so order ids and version numbers don't count.

Three patterns, all RE2-safe (no lookarounds; shared literals between
engines):

  ISO      2021-07-14           (\\b\\d{4}-\\d{2}-\\d{2}\\b)
  US long  March 4, 1999        (Month D?D, YYYY; full month names)
  slashed  7/14/2021            (D?D/D?D/YYYY, month-first reading)

Validation: year in [1900, 2099], month in [1, 12], day in [1, 31].
Engine parity is pure string/integer work: extraction via
regexp_extract_all, month names via a literal CASE, all counts exact.

Shape at 100 TB: per-doc columns ride the scan (no shuffle); the
recency rollup is one map-side-combined groupBy over the bounded year
dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MONTHS = (
    "january", "february", "march", "april", "may", "june",
    "july", "august", "september", "october", "november", "december",
)
ISO_RE = r"\b[0-9]{4}-[0-9]{2}-[0-9]{2}\b"
US_RE = (
    r"\b(?:January|February|March|April|May|June|July|August|"
    r"September|October|November|December) [0-9]{1,2}, [0-9]{4}\b"
)
SLASH_RE = r"\b[0-9]{1,2}/[0-9]{1,2}/[0-9]{4}\b"


def _valid_ymd(y: Column, m: Column, d: Column) -> Column:
    return (
        y.between(1900, 2099) & m.between(1, 12) & d.between(1, 31)
    )


def _month_num(name: Column) -> Column:
    out = None
    for i, mn in enumerate(MONTHS, start=1):
        cond = F.lower(name) == mn
        out = F.when(cond, i) if out is None else out.when(cond, i)
    return out.otherwise(0)


def date_mention_years(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append (n_dates, min_year, max_year): validated date mentions
    per document (zero-mention docs keep 0/NULL/NULL)."""
    text = F.col(text_col)
    iso = F.filter(
        F.transform(
            F.regexp_extract_all(text, F.lit(ISO_RE), F.lit(0)),
            lambda s: F.struct(
                F.substring(s, 1, 4).cast("int").alias("y"),
                F.substring(s, 6, 2).cast("int").alias("m"),
                F.substring(s, 9, 2).cast("int").alias("d"),
            ),
        ),
        lambda t: _valid_ymd(t.y, t.m, t.d),
    )
    us = F.filter(
        F.transform(
            F.regexp_extract_all(text, F.lit(US_RE), F.lit(0)),
            lambda s: F.struct(
                F.element_at(F.split(s, "[ ,]+"), 3).cast("int").alias("y"),
                _month_num(F.element_at(F.split(s, "[ ,]+"), 1)).alias("m"),
                F.element_at(F.split(s, "[ ,]+"), 2).cast("int").alias("d"),
            ),
        ),
        lambda t: _valid_ymd(t.y, t.m, t.d),
    )
    slash = F.filter(
        F.transform(
            F.regexp_extract_all(text, F.lit(SLASH_RE), F.lit(0)),
            lambda s: F.struct(
                F.element_at(F.split(s, "/"), 3).cast("int").alias("y"),
                F.element_at(F.split(s, "/"), 1).cast("int").alias("m"),
                F.element_at(F.split(s, "/"), 2).cast("int").alias("d"),
            ),
        ),
        lambda t: _valid_ymd(t.y, t.m, t.d),
    )
    all_dates = F.concat(iso, us, slash)
    years = F.transform(all_dates, lambda t: t.y)
    return df.select(
        "*",
        F.size(all_dates).cast("long").alias("n_dates"),
        F.when(F.size(years) > 0, F.array_min(years)).alias("min_year"),
        F.when(F.size(years) > 0, F.array_max(years)).alias("max_year"),
    )


def corpus_recency(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(year, n_mentions, n_docs): the corpus recency histogram over
    the bounded year dim — every VALIDATED date mention counted, docs
    counted once per year they mention."""
    # per-mention years by exploding (scan-local; date_mention_years'
    # per-doc columns are the cheap path, this is the histogram)
    text = F.col(text_col)
    years = F.concat(
        F.transform(
            F.regexp_extract_all(text, F.lit(ISO_RE), F.lit(0)),
            lambda s: F.struct(
                F.substring(s, 1, 4).cast("int").alias("y"),
                F.substring(s, 6, 2).cast("int").alias("m"),
                F.substring(s, 9, 2).cast("int").alias("d"),
            ),
        ),
        F.transform(
            F.regexp_extract_all(text, F.lit(US_RE), F.lit(0)),
            lambda s: F.struct(
                F.element_at(F.split(s, "[ ,]+"), 3).cast("int").alias("y"),
                _month_num(F.element_at(F.split(s, "[ ,]+"), 1)).alias("m"),
                F.element_at(F.split(s, "[ ,]+"), 2).cast("int").alias("d"),
            ),
        ),
        F.transform(
            F.regexp_extract_all(text, F.lit(SLASH_RE), F.lit(0)),
            lambda s: F.struct(
                F.element_at(F.split(s, "/"), 3).cast("int").alias("y"),
                F.element_at(F.split(s, "/"), 1).cast("int").alias("m"),
                F.element_at(F.split(s, "/"), 2).cast("int").alias("d"),
            ),
        ),
    )
    valid = F.filter(years, lambda t: _valid_ymd(t.y, t.m, t.d))
    exploded = df.select(
        F.col(id_col), F.explode(valid).alias("t")
    ).select(F.col(id_col), F.col("t.y").alias("year"))
    return exploded.groupBy("year").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
        F.countDistinct(id_col).cast("long").alias("n_docs"),
    )
