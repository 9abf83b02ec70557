"""C4 §2.2 page/line quality cleaning (Raffel et al. 2020, arXiv:1910.10683).

The rule battery C4 applies to every Common-Crawl page before admission
— the canonical FIRST quality pass downstream of extraction, distinct
from the three-sentence-span dedup (ops/lines.py:334) which is C4's
SECOND, corpus-global pass:

line rules (drop the line, keep the page):
  1. does not end in a terminal punctuation mark (``. ! ? "``)
  2. fewer than ``min_words_per_line`` words (C4: 5)
  3. contains the word "javascript" (case-insensitive, word-bounded —
     the "enable javascript to view" boilerplate signature)
page rules (drop the whole page):
  4. any blocklist word anywhere on the page (C4 uses the public
     LDNOOBW list; callers pass their own — same broadcast-free
     word-bounded regex compiled from a short literal list)
  5. the phrase "lorem ipsum" anywhere
  6. the character "{" anywhere (code, not prose)
  7. fewer than ``min_sentences`` sentences SURVIVING the line rules
     (C4: 3; a sentence = a ``. ! ?`` occurrence in a kept line)

Shape at 100 TB: every line flag is a PURE MAP over the exploded lines
(rlike / size(split) — whole-stage codegen, no Python); the page gates
and the per-page summary are ONE map-side-combined ``groupBy(doc_id)``
— booleans fold as max(int), sentence counts as sum, and the cleaned
text is reassembled inside the same aggregate via
sort_array(collect_list(struct)) bounded by document size. One shuffle
total, keyed on doc_id; no window function anywhere. Page-gate regexes
(badwords) compile to ONE alternation riding the scan — no join, no
broadcast needed for a list of this size.

Reference context: vakra-dev/reader ships extraction only
(src/scraper.ts stops at clean markdown); this is the first
corpus-prep gate its consumers run on extracted pages, same
LLM-pipeline battery as ops/lines.py and ops/textstats.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Terminal punctuation per the C4 reference implementation
# (tensorflow_datasets c4_utils: _END_MARKS = ('.', '?', '!', '"')).
_TERMINAL_RE = r'[.!?"]$'
_JS_RE = r"\bjavascript\b"
_SENTENCE_MARK_RE = r"[.!?]"


def _badword_regex(badwords: tuple[str, ...]) -> str:
    """Word-bounded alternation over a literal blocklist. RE2 (DuckDB)
    and Java regex (Spark) agree on \\b and plain alternation, which is
    why the oracle can run the identical pattern."""
    import re as _re

    return r"\b(" + "|".join(_re.escape(w.lower()) for w in badwords) + r")\b"


def c4_line_flags(
    lines: DataFrame,
    min_words_per_line: int = 5,
) -> DataFrame:
    """Annotate exploded (id, line_no, line) rows with the C4 line
    verdict: ``line_keep`` (rules 1-3) and ``n_sentence_marks`` (the
    rule-7 numerator, counted only when kept). Pure map — no shuffle."""
    n_words = F.size(F.split(F.col("line"), " "))
    keep = (
        F.col("line").rlike(_TERMINAL_RE)
        & (n_words >= min_words_per_line)
        & ~F.lower(F.col("line")).rlike(_JS_RE)
    )
    n_marks = F.size(F.regexp_extract_all(F.col("line"), F.lit(_SENTENCE_MARK_RE), 0))
    return lines.withColumn("line_keep", keep).withColumn(
        "n_sentence_marks", F.when(keep, n_marks).otherwise(F.lit(0))
    )


def _page_gate_cols(badwords: tuple[str, ...]) -> dict[str, Column]:
    low = F.lower(F.col("line"))
    gates = {
        "has_lorem": low.contains("lorem ipsum"),
        "has_curly": F.col("line").contains("{"),
    }
    if badwords:
        gates["has_badword"] = low.rlike(_badword_regex(badwords))
    else:
        gates["has_badword"] = F.lit(False)
    return gates


def c4_page_clean(
    lines: DataFrame,
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    badwords: tuple[str, ...] = (),
) -> DataFrame:
    """Per-page C4 §2.2 report over exploded (id, line_no, line) rows:

    (id, n_lines, n_kept_lines, n_sentences, page_kept, drop_reason,
    clean_md5) — drop_reason in {'badword','lorem_ipsum','curly_brace',
    'too_few_sentences'} with that precedence, NULL when the page is
    admitted; clean_md5 hashes the surviving lines in original order
    (space-joined; md5('') when nothing survives, so every input page
    stays visible in the report).

    Page gates (rules 4-6) scan ALL lines of the page, kept or not —
    C4 evaluates them on the raw page text."""
    flagged = c4_line_flags(lines, min_words_per_line)
    gates = _page_gate_cols(badwords)
    agg = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("line_keep").cast("long")).alias("n_kept_lines"),
        F.sum("n_sentence_marks").alias("n_sentences"),
        F.max(gates["has_badword"].cast("int")).alias("_bad"),
        F.max(gates["has_lorem"].cast("int")).alias("_lorem"),
        F.max(gates["has_curly"].cast("int")).alias("_curly"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("line_keep"), F.struct("line_no", "line")
                            )
                        )
                    ),
                    lambda x: x["line"],
                ),
            )
        ).alias("clean_md5"),
    )
    reason = (
        F.when(F.col("_bad") == 1, F.lit("badword"))
        .when(F.col("_lorem") == 1, F.lit("lorem_ipsum"))
        .when(F.col("_curly") == 1, F.lit("curly_brace"))
        .when(F.col("n_sentences") < min_sentences, F.lit("too_few_sentences"))
    )
    return agg.select(
        F.col(id_col),
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        reason.alias("drop_reason"),
        F.when(reason.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("page_kept"),
        "clean_md5",
    )


def c4_clean_lines(
    lines: DataFrame,
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    badwords: tuple[str, ...] = (),
) -> DataFrame:
    """The applied pass: (id, line_no, line) rows that survive BOTH the
    line rules and the page gates — the frame the next pipeline stage
    (span dedup, tokenization) consumes. The page verdict joins back on
    ``id_col``: same key as the gate aggregation, so AQE reuses the
    exchange; nothing re-shuffles on a second key."""
    flagged = c4_line_flags(lines, min_words_per_line)
    verdict = c4_page_clean(
        lines, id_col, min_words_per_line, min_sentences, badwords
    ).select(id_col, "page_kept")
    return (
        flagged.join(verdict, id_col)
        .where((F.col("page_kept") == 1) & F.col("line_keep"))
        .select(id_col, "line_no", "line")
    )
