"""OCR-garbage token detection (Taghva, Nartker, Condit & Borsack's
garbage-string rules, as consolidated in Kulp & Kontostathis 2007,
"Rmgarbage").

Scanned-book and PDF-derived corpora carry OCR noise: repeated-glyph
runs, punctuation shrapnel, case-mangled words, vowel-less consonant
strings. The classic defense is a per-token rule battery — cheap,
language-light, and deterministic — whose per-document hit profile both
gates documents (high garbage ratio => drop/requeue for re-OCR) and
localizes damage. This module is the rule set as native Spark column
expressions (zero Python in the hot path), with every regex written in
the RE2-compatible subset (no backreferences) so the DuckDB oracle runs
the literal same patterns.

The rules (per whitespace token, case preserved):

* ``L`` — longer than 40 characters.
* ``A`` — symbols outnumber alphanumerics: ``2 * alnum < len`` for
  tokens of length >= 2.
* ``R`` — four or more identical consecutive characters (alphanumerics
  plus ``-``/``.``/``_``), expanded to an explicit alternation because
  neither RE2 nor the repo discipline allows backreferences.
* ``V`` — all-alphabetic token of length >= 3 with zero vowels or zero
  consonants; ``y`` counts as a vowel so "myth"/"rhythm" survive.
* ``P`` — two or more punctuation characters strictly inside the token
  that are not all the same symbol ("e.g." and "3.14-ish" survive;
  "a#b%c" does not).
* ``C`` — a lowercase letter immediately followed by an uppercase one
  (case alternation inside a word; the paper's sandwich rule — flags
  camelCase identifiers too, documented).

Shape at 100 TB: one token explode per document followed by ONE
map-side-combined groupBy(doc_id) — no windows, no joins, no
corpus-level state; the profile is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Explicit-alternation form of "same char 4+ times" (no backreferences:
# Java regex has them, RE2/DuckDB does not — one pattern, two engines).
_RUN_CHARS = (
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [chr(c) for c in range(ord("A"), ord("Z") + 1)]
    + [str(d) for d in range(10)]
)
RUN_PATTERN = "|".join([f"{c}{{4,}}" for c in _RUN_CHARS])
RUN_PATTERN += r"|\-{4,}|\.{4,}|_{4,}"

VOWELS = "aeiouyAEIOUY"

# Deterministic OCR-damage plant for the corpus-scale certification
# query (the synthetic corpus is clean): one token per rule, no quote
# characters so the literal embeds verbatim in the DuckDB oracle.
PLANT_SUFFIX = (
    " zzzzqqq ---- a#b%c misSpelledCaSe bcdfg "
    + "verylongtoken" * 4
)


def _alnum_count(tok: Column) -> Column:
    return F.length(tok) - F.length(
        F.regexp_replace(tok, "[a-zA-Z0-9]", "")
    )


def garbage_rule_columns(tok: Column) -> dict[str, Column]:
    """The six boolean rule columns for one token column."""
    n = F.length(tok)
    alnum = _alnum_count(tok)
    is_alpha = tok.rlike("^[a-zA-Z]+$")
    vowels = n - F.length(F.regexp_replace(tok, f"[{VOWELS}]", ""))
    inside = F.substring(tok, 2, F.greatest(F.length(tok) - 2, F.lit(0)))
    inside_punct = F.regexp_replace(inside, "[a-zA-Z0-9]", "")
    np = F.length(inside_punct)
    return {
        "rule_l": n > 40,
        "rule_a": (n >= 2) & (alnum * 2 < n),
        "rule_r": tok.rlike(RUN_PATTERN),
        "rule_v": is_alpha
        & (n >= 3)
        & ((vowels == 0) | (vowels == n)),
        "rule_p": (np >= 2)
        & (
            inside_punct
            != F.repeat(F.substring(inside_punct, 1, 1), np)
        ),
        "rule_c": tok.rlike("[a-z][A-Z]"),
    }


RULE_NAMES = ("rule_l", "rule_a", "rule_r", "rule_v", "rule_p", "rule_c")


def ocr_garbage_tokens(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-token rule flags: (doc_id, pos, tok, rule_*, is_garbage).
    Case-preserving whitespace tokenizer — case is evidence here."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda x: x != ""
            )
        ).alias("pos", "tok"),
    )
    rules = garbage_rule_columns(F.col("tok"))
    out = toks
    for name in RULE_NAMES:
        out = out.withColumn(name, rules[name])
    any_rule = None
    for name in RULE_NAMES:
        c = F.col(name)
        any_rule = c if any_rule is None else (any_rule | c)
    return out.withColumn("is_garbage", any_rule)


def ocr_garbage_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document garbage profile: token count, per-rule hit counts,
    total garbage tokens, and ``garbage_milli`` (= garbage * 1000 div
    tokens, integer). ONE doc-keyed aggregate over the token explode."""
    flagged = ocr_garbage_tokens(docs, id_col=id_col, text_col=text_col)
    aggs = [F.count("*").alias("n_tokens")] + [
        F.sum(F.col(name).cast("long")).alias(f"n_{name}")
        for name in RULE_NAMES
    ]
    aggs.append(
        F.sum(F.col("is_garbage").cast("long")).alias("n_garbage")
    )
    return flagged.groupBy("doc_id").agg(*aggs).select(
        "doc_id",
        "n_tokens",
        *[f"n_{name}" for name in RULE_NAMES],
        "n_garbage",
        F.expr("n_garbage * 1000 div n_tokens")
        .cast("long")
        .alias("garbage_milli"),
    )
