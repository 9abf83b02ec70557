"""Quoted-span extraction and dialogue-density profiling.

Quotation structure is a strong curation signal: interview transcripts,
fiction, and forum dialog carry high quoted-text density, while
reference/encyclopedic prose carries little — and attributed quotes
("X said ...") feed attribution corpora and fact-checking pipelines
(cf. the quote-extraction tasks around Quotebank, Vaucher et al. WSDM
2021; implementation here is original and regex-only).

Two surfaces, both native-column regex (scan-bound, zero Python):

* :func:`quote_spans` — the per-quote table: every double-quoted span
  of 1..400 non-newline characters, in document order.
* :func:`quote_profile` — the per-document rollup: quote count,
  attributed-quote count (an attribution verb within 40 chars before
  the opening quote), quoted-character total, and the quoted-text
  share in milli-units.

Patterns stay in the RE2-compatible subset (no lookarounds, no
backreferences) so the DuckDB oracle runs the literal same strings.

Shape at 100 TB: extraction is per-row expression work riding the
scan; the spans table is a bounded posexplode (quotes per doc); the
profile is computed from per-row columns with NO shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# a quoted span: 1..400 chars, no newline, no nested quote
QUOTE_RE = '"([^"\\n]{1,400})"'
ATTRIBUTION_VERBS = (
    "said|says|wrote|writes|told|tells|asked|asks|added|adds|replied|replies"
)
ATTRIBUTED_RE = f'(?:{ATTRIBUTION_VERBS})[^"\\n]{{0,40}}"[^"\\n]{{1,400}}"'


def quote_spans(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-quote rows in document order: (doc_id, quote_no, quote,
    n_words). quote_no is 0-based extraction order."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(QUOTE_RE), 1)
        ).alias("quote_no", "quote"),
    ).withColumn(
        "n_words",
        F.size(F.filter(F.split(F.col("quote"), r"\s+"), lambda x: x != "")),
    )


def quote_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document dialogue-density profile: (doc_id, n_quotes,
    n_attributed, quote_chars, quote_milli). quote_chars counts the
    inner span characters; quote_milli = quote_chars * 1000 div
    max(len(text), 1). Pure per-row expressions — no shuffle."""
    text = F.col("__text")
    quotes = F.regexp_extract_all(text, F.lit(QUOTE_RE), 1)
    quote_chars = F.aggregate(
        F.transform(quotes, lambda q: F.length(q).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    staged = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).select(
        "doc_id",
        "__text",
        F.size(quotes).cast("long").alias("n_quotes"),
        F.regexp_count(text, F.lit(ATTRIBUTED_RE))
        .cast("long")
        .alias("n_attributed"),
        quote_chars.alias("quote_chars"),
    )
    return staged.select(
        "doc_id",
        "n_quotes",
        "n_attributed",
        "quote_chars",
        F.expr("quote_chars * 1000 div greatest(length(__text), 1)")
        .cast("long")
        .alias("quote_milli"),
    )
