"""Text-analysis operators over a document table — all native columns
(whole-stage codegen; zero Python in the hot path).

Language-ID, quality scoring, token counting, fingerprinting for
training-data pipelines. The heuristic implementations mirror
reader_spark.functions.text so the same semantics exist in both the
column world and the per-document UDF world.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import LANG_STOPWORDS


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


# GPT-2-style pretokenizer, simplified to the ASCII subset that Java regex
# (Spark) and RE2 (DuckDB oracle) treat identically: contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace
# leftovers. A calibrated stand-in for a real BPE vocab's piece count.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count_col(text: Column) -> Column:
    """Pretokenizer piece count — the budgeting proxy a training-data
    pipeline uses before a real tokenizer pass (whitespace counting
    underestimates code/punctuation-heavy text)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def punct_ratio_col(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\w\s]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    )


def stopword_ratio_col(text: Column, lang: str = "en") -> Column:
    stops = F.array(*[F.lit(w) for w in sorted(LANG_STOPWORDS[lang])])
    toks = tokens_col(F.lower(text))
    hits = F.size(F.array_intersect(F.array_distinct(toks), stops))
    # ratio over distinct tokens (set semantics, same as the UDF twin's vote)
    return hits / F.greatest(F.size(F.array_distinct(toks)), F.lit(1))


# Character-trigram signatures per language (public linguistic knowledge —
# high-frequency trigrams; all alternatives are the same length so Java
# regex (Spark) and RE2 (DuckDB) count identical non-overlapping matches).
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "de": ("sch", "der", "ein", "ich", "und", "ung"),
    "en": ("the", "ing", "ion", "and", " th", "ent"),
    "es": (" de", " la", "ión", "los", "que", "ado"),
    "fr": (" le", "ent", "les", "que", "eau", " ét"),
    "zh": ("[一-鿿]..",),  # CJK presence (3-char windows)
}


def trigram_lang_scores(text: Column) -> list[tuple[str, Column]]:
    lowered = F.lower(text)
    return [
        (lang, F.regexp_count(lowered, F.lit("|".join(f"({t})" for t in tris))))
        for lang, tris in sorted(LANG_TRIGRAMS.items())
    ]


def detect_language_trigram_col(text: Column) -> Column:
    """N-gram-heuristic language ID, fully JVM-side: per language, count
    signature character trigrams (regexp_count); argmax wins (ties ->
    lexicographically last language; zero hits -> 'und'). The companion to
    the stopword-vote detector — trigram profiles survive short texts and
    missing word boundaries (e.g. CJK)."""
    scored = F.array(
        *[
            F.struct(score.alias("score"), F.lit(lang).alias("lang"))
            for lang, score in trigram_lang_scores(text)
        ]
    )
    best = F.element_at(F.array_sort(scored), -1)
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


def detect_language_col(text: Column) -> Column:
    """Stopword-vote language ID as a native expression: per language count
    distinct-token intersection with its stopword set, take the argmax."""
    toks = F.array_distinct(tokens_col(F.lower(text)))
    scores = [
        F.struct(
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in sorted(stops)]))
            ).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, stops in sorted(LANG_STOPWORDS.items())
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach token_count / punct_ratio / stopword_ratio / detected_lang."""
    text = F.col(text_col)
    return (
        df.withColumn("token_count", token_count_col(text))
        .withColumn("punct_ratio", F.round(punct_ratio_col(text), 6))
        .withColumn("stopword_ratio", F.round(stopword_ratio_col(text), 6))
        .withColumn("detected_lang", detect_language_col(text))
    )


def repetition_ratio_col(text: Column, n: int = 3) -> Column:
    """Repeated-n-gram fraction: 1 - distinct_shingles/total_shingles.
    High values flag SEO spam, templated boilerplate, and generation loops
    — a standard pretraining-quality gate alongside length/punct/stopword
    signals. Native columns only (linear shingle windower)."""
    from .dedup import shingles

    total = F.greatest(
        F.size(tokens_col(text)) - (n - 1), F.lit(1)
    )
    distinct = F.size(shingles(text, n))
    return F.round(1.0 - distinct / total, 6)


def fingerprint_portable_col(text: Column, window: int = 8) -> Column:
    """md5-hex twin of fingerprint_col: min of md5 over the same rolling
    token windows (lexicographic min on fixed-width hex == numeric min),
    reproducible verbatim in ANSI SQL for the oracle gate."""
    from .dedup import shingles

    # shingles() is the LINEAR windower (arrays_zip of shifted copies); its
    # array_distinct is harmless under min. The transform(sequence, slice)
    # form is O(len^2) and stalls on multi-hundred-KB docs.
    return F.array_min(F.transform(shingles(text, window), F.md5))


def fingerprint_col(text: Column, window: int = 8) -> Column:
    """Winnowing-style document fingerprint: min of xxhash64 over a rolling
    token window (Schleimer et al., SIGMOD'03) — native arrays, no UDF;
    linear windower (see fingerprint_portable_col)."""
    from .dedup import shingles

    return F.array_min(
        F.transform(shingles(text, window), lambda s: F.xxhash64(s))
    )
