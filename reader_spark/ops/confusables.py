"""Unicode homoglyph / confusable-script detection (UTS #39 skeleton,
"Unicode Security Mechanisms", public Unicode TR 39).

Web corpora carry two kinds of confusable abuse: spoofed domains
(``раypal.com`` with Cyrillic ``р``/``а``) in link graphs and anchor
text, and script-mixing obfuscation inside body text (adversarial SEO,
filter evasion). The UTS #39 defense is the *skeleton* transform — map
every confusable code point to its canonical (Latin) prototype, then
compare skeletons: two names that differ raw but collide in skeleton
space are a spoof pair; a token that mixes Latin with Cyrillic/Greek
letters AND contains confusables is a spoof suspect.

This module carries a curated literal subset of the UTS #39 table (the
high-risk IDN homoglyphs: Cyrillic а е о р с х у і ѕ ј г ԛ ԝ, Greek
α ι κ ν ο ρ, plus the 0→o / 1→l digit confusions) — small enough to be
one ``translate()`` call, which both Spark and DuckDB evaluate
unicode-character-wise, so the oracle shares the literal table.

Shape at 100 TB: skeletons are per-row native expressions (scan-bound);
spoof-pair discovery groups names BY SKELETON and joins within groups —
an equi-join on the skeleton key, never an all-pairs comparison, so
candidate cost is bounded by collision-group sizes exactly like the
dedup stack's band buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (confusable, prototype) pairs — lowercase plane; skeleton lowers first.
CONFUSABLE_PAIRS: tuple[tuple[str, str], ...] = (
    ("а", "a"),  # Cyrillic а
    ("е", "e"),  # Cyrillic е
    ("о", "o"),  # Cyrillic о
    ("р", "p"),  # Cyrillic р
    ("с", "c"),  # Cyrillic с
    ("х", "x"),  # Cyrillic х
    ("у", "y"),  # Cyrillic у
    ("і", "i"),  # Cyrillic і
    ("ѕ", "s"),  # Cyrillic ѕ
    ("ј", "j"),  # Cyrillic ј
    ("г", "r"),  # Cyrillic г (r-shaped in sans fonts; UTS pair)
    ("ԛ", "q"),  # Cyrillic ԛ
    ("ԝ", "w"),  # Cyrillic ԝ
    ("α", "a"),  # Greek α
    ("ι", "i"),  # Greek ι
    ("κ", "k"),  # Greek κ
    ("ν", "v"),  # Greek ν
    ("ο", "o"),  # Greek ο
    ("ρ", "p"),  # Greek ρ
    ("0", "o"),
    ("1", "l"),
)
SRC_CHARS = "".join(p[0] for p in CONFUSABLE_PAIRS)
DST_CHARS = "".join(p[1] for p in CONFUSABLE_PAIRS)

# Deterministic spoof plant for the corpus-scale certification query:
# a mixed-script confusable token (spoof suspect), a pure-Cyrillic token
# (foreign but not mixed), and a digit-confusable Latin token (skeleton
# changes but no script mixing). No quote characters.
HOMOGLYPH_PLANT = " рaypal.com письмо bank0"

LATIN_CLASS = "[a-z]"
FOREIGN_CLASS = "[Ͱ-ϿЀ-ӿԀ-ԯ]"
# confusables minus the digit pair (digits are not script evidence)
CONFUSABLE_CLASS = "[" + "".join(
    p[0] for p in CONFUSABLE_PAIRS if not p[0].isdigit()
) + "]"


def skeleton_col(text: Column) -> Column:
    """UTS #39-style skeleton: lowercase, then map every confusable to
    its Latin prototype. Collision in skeleton space = visual
    confusability under this table."""
    return F.translate(F.lower(text), SRC_CHARS, DST_CHARS)


def confusable_count_col(text: Column) -> Column:
    lowered = F.lower(text)
    return F.length(lowered) - F.length(
        F.regexp_replace(lowered, CONFUSABLE_CLASS, "")
    )


def homoglyph_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document spoof-evidence profile: token counts of mixed-script
    tokens (Latin + Greek/Cyrillic letters in ONE token) and spoof
    suspects (mixed-script AND contains a confusable), total confusable
    chars, and the md5 of the document skeleton (the dedup/compare key).
    One token explode + ONE doc-keyed map-side-combined aggregate."""
    # token stats shuffle TOKENS ONLY; the doc-level columns (confusable
    # count, skeleton md5) ride the scan and join back — carrying the
    # full text through the token explode made the aggregate shuffle
    # O(doc_len * n_tokens) bytes (the 15s bench row at sf0.1).
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    mixed = F.col("tok").rlike(LATIN_CLASS) & F.col("tok").rlike(
        FOREIGN_CLASS
    )
    has_conf = F.col("tok").rlike(CONFUSABLE_CLASS)
    tok_stats = (
        toks.withColumn("mixed", mixed)
        .withColumn("suspect", mixed & has_conf)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.col("mixed").cast("long")).alias("n_mixed_script"),
            F.sum(F.col("suspect").cast("long")).alias("n_spoof_suspects"),
        )
    )
    doc_cols = docs.select(
        F.col(id_col).alias("doc_id"),
        confusable_count_col(F.col(text_col))
        .cast("long")
        .alias("n_confusable_chars"),
        F.md5(skeleton_col(F.col(text_col))).alias("skeleton_md5"),
    )
    return tok_stats.join(doc_cols, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_mixed_script",
        "n_spoof_suspects",
        "n_confusable_chars",
        "skeleton_md5",
    )


def spoof_pairs(
    names: DataFrame, name_col: str = "name"
) -> DataFrame:
    """Skeleton-collision pairs over a name table (domains, handles):
    two distinct raw names with equal skeletons, emitted once with the
    lexicographically smaller first. Grouped BY skeleton — an equi-join,
    no all-pairs scan; at web scale collision groups are tiny (a name
    and its spoofs)."""
    sk = names.select(
        F.col(name_col).alias("name"),
        skeleton_col(F.col(name_col)).alias("skeleton"),
    ).distinct()
    a = sk.alias("a")
    b = sk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.skeleton") == F.col("b.skeleton"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.skeleton").alias("skeleton"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
    )
