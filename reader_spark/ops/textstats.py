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

from reader_spark.spark.fanout import fanout_scan

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


def mean_word_length_col(text: Column) -> Column:
    """Mean characters per whitespace token: non-space char count / tokens."""
    non_space = F.length(F.regexp_replace(text, r"\s", ""))
    return F.round(non_space / F.greatest(token_count_col(text), F.lit(1)), 6)


def alpha_word_ratio_col(text: Column) -> Column:
    """Fraction of tokens containing at least one ASCII letter (Gopher's
    80%-alphabetic rule; strips numeric/symbol-soup documents)."""
    toks = tokens_col(text)
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    return F.round(alpha / F.greatest(F.size(toks), F.lit(1)), 6)


def _lines_col(text: Column) -> Column:
    return F.split(text, r"\n")


def bullet_line_ratio_col(text: Column) -> Column:
    """Fraction of lines starting with a bullet marker (Gopher: >90% bullet
    lines => listing page, drop)."""
    lines = _lines_col(text)
    bullets = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]"))
    )
    return F.round(bullets / F.greatest(F.size(lines), F.lit(1)), 6)


def ellipsis_line_ratio_col(text: Column) -> Column:
    """Fraction of lines ending in an ellipsis (Gopher: >30% => truncated
    teaser/snippet page)."""
    lines = _lines_col(text)
    ell = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$"))
    )
    return F.round(ell / F.greatest(F.size(lines), F.lit(1)), 6)


def duplicate_line_fraction_col(text: Column) -> Column:
    """1 - distinct_lines/total_lines: templated/boilerplate repetition at
    line granularity (complements the n-gram repetition_ratio)."""
    lines = _lines_col(text)
    total = F.greatest(F.size(lines), F.lit(1))
    return F.round(1.0 - F.size(F.array_distinct(lines)) / total, 6)


def symbol_word_ratio_col(text: Column) -> Column:
    """(# + ellipsis occurrences) / tokens (Gopher's symbol-to-word rule)."""
    symbols = F.regexp_count(text, F.lit(r"#|\.\.\.|…"))
    return F.round(symbols / F.greatest(token_count_col(text), F.lit(1)), 6)


def gopher_quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition/format rule battery (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", table A1 heuristics) as native
    columns, plus the combined `gopher_pass` gate with the published
    thresholds. All JVM-side (split/filter/regexp_count) — scan-bound at
    100 TB, no shuffle, no Python."""
    text = F.col(text_col)
    out = (
        df.withColumn("n_tokens", token_count_col(text))
        .withColumn("mean_word_len", mean_word_length_col(text))
        .withColumn("alpha_word_ratio", alpha_word_ratio_col(text))
        .withColumn("bullet_line_ratio", bullet_line_ratio_col(text))
        .withColumn("ellipsis_line_ratio", ellipsis_line_ratio_col(text))
        .withColumn("dup_line_fraction", duplicate_line_fraction_col(text))
        .withColumn("symbol_word_ratio", symbol_word_ratio_col(text))
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_tokens") >= 50)
        & (F.col("n_tokens") <= 100_000)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("alpha_word_ratio") >= 0.8)
        & (F.col("bullet_line_ratio") <= 0.9)
        & (F.col("ellipsis_line_ratio") <= 0.3)
        & (F.col("dup_line_fraction") <= 0.3)
        & (F.col("symbol_word_ratio") <= 0.1),
    )


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): no lookarounds, no backreferences, alternatives that can't
# produce leftmost-first vs leftmost-longest divergence.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9][0-9 ()-]{7,}[0-9]"


def pii_count_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII signal counts (emails / IPv4s / intl phone numbers)
    — the audit columns a training pipeline gates or routes on."""
    text = F.col(text_col)
    return (
        df.withColumn("n_emails", F.regexp_count(text, F.lit(PII_EMAIL)))
        .withColumn("n_ipv4", F.regexp_count(text, F.lit(PII_IPV4)))
        .withColumn("n_phones", F.regexp_count(text, F.lit(PII_PHONE)))
    )


def mask_pii_col(text: Column) -> Column:
    """PII-scrubbed text: emails -> <EMAIL>, IPv4 -> <IP>, intl phones ->
    <PHONE>. Email first (its local part may contain digits), then IP
    (before the phone rule can eat dotted digit runs), then phone."""
    masked = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    masked = F.regexp_replace(masked, PII_IPV4, "<IP>")
    return F.regexp_replace(masked, PII_PHONE, "<PHONE>")


def shard_by_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Pack documents into token-budgeted shards: deterministic order_col
    ordering, running token total, shard = exclusive-cumsum // budget —
    every shard holds the docs whose window STARTS inside one budget span,
    so shard sizes hover at ~budget (the straddling doc goes to the shard
    its first token lands in). The standard sharding step before writing
    training data.

    Scale note: with partition_cols=() the window is global (single-reducer
    sort) — fine for a manifest of millions of rows, wrong for 10^12. At
    scale pass partition_cols=("split",) or ("lang",): packing becomes
    embarrassingly parallel per partition and shard ids are
    (partition, shard) pairs.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cumsum = F.sum(token_col).over(w)
    return df.withColumn(
        "shard",
        ((cumsum - F.col(token_col)) / F.lit(budget)).cast("bigint"),
    )


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


def unigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_vocab: int | None = None,
) -> DataFrame:
    """CCNet-style LM quality scoring: train an add-1-smoothed unigram
    LM on the corpus itself, then score every document by average
    negative log-likelihood in bits per token (low = fluent/common
    phrasing, high = gibberish or unusual content — the standard
    perplexity filter for pre-training corpora, cf. CCNet, Wenzek et
    al. 2020, which buckets CommonCrawl by LM perplexity).

    p(w) = (count(w) + 1) / (N + V); score(d) = -mean(log2 p(w_i)).

    Shape at 100 TB: the LM is ONE token-count groupBy (map-side
    combined — 'the' collapses to a single row per map task, so token
    skew never crosses the wire as raw occurrences). The score join is
    exploded-tokens <-> vocab dim; with ``max_vocab`` set the dim is
    truncated to the top-K tokens (ties broken by token) and BROADCAST
    — out-of-vocab words smooth to count 0 — which removes the one
    skewed shuffle (every 'the' row hashing to the same reducer) from
    the plan. ``max_vocab=None`` is the oracle-exact full-vocabulary
    contract.

    Float parity: per-token terms rounded to 9 dp before the per-doc
    sum, the mean to 6 dp after — sums of rounded terms agree across
    engines at 6 dp regardless of accumulation order.

    Returns (id_col, n_tokens, avg_nll_bits).
    """
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("token"),
        )
        .where(F.col("token") != "")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    stats = counts.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("vocab")
    )
    if max_vocab is not None:
        if max_vocab < 1:
            raise ValueError(f"max_vocab must be >= 1, got {max_vocab}")
        # Top-K cut as orderBy().limit() -> TakeOrderedAndProject: each
        # partition keeps its local top-K and the driver merges K rows,
        # vs the previous global Window.orderBy + row_number which moved
        # the whole vocabulary (1e8-1e9 rows at corpus scale) to a
        # single partition.  The (c desc, token asc) total order makes
        # the selected row set identical to the ranked form.
        counts = counts.orderBy(
            F.col("c").desc(), F.col("token").asc()
        ).limit(max_vocab)
        scored = toks.join(F.broadcast(counts), "token", "left").withColumn(
            "c", F.coalesce(F.col("c"), F.lit(0))
        )
    else:
        scored = toks.join(counts, "token")
    nll = F.round(
        -F.log2((F.col("c") + F.lit(1.0)) / (F.col("n_total") + F.col("vocab"))),
        9,
    )
    return (
        scored.crossJoin(F.broadcast(stats))
        .withColumn("__nll", nll)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("__nll") / F.count(F.lit(1)), 6).alias("avg_nll_bits"),
        )
    )


def nfc_normalize_docs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode NFC normalization — the canonical-composition pass every
    multilingual corpus needs before hashing/dedup (the same logical
    text arrives as composed OR decomposed codepoints from different
    crawls; without normalization 'café' != 'café' and exact dedup
    silently misses). Spark has no built-in normalizer, so this is the
    sanctioned Python path: ONE Arrow-batched mapInPandas with a narrow
    (id, text) projection, vectorized over each batch — scan-shaped,
    no shuffle, linear at any scale.

    Returns (id_col, text_nfc, changed) where changed=1 iff
    normalization altered the string. unicodedata.normalize implements
    the same UAX#15 algorithm as ANSI engines' nfc_normalize, which is
    what makes this oracle-checkable cross-implementation."""
    import unicodedata

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_type}, `text_nfc` string, `changed` int"

    def norm(batches):
        for pdf in batches:
            out = pdf[[id_col]].copy()
            src = pdf[text_col]
            normed = src.map(
                lambda s: unicodedata.normalize("NFC", s) if s is not None else None
            )
            out["text_nfc"] = normed
            out["changed"] = (
                (normed != src) & src.notna()
            ).astype("int32")
            yield out

    return df.select(id_col, text_col).mapInPandas(norm, schema=out_schema)


QUALITY_LOGIT_WEIGHTS = {
    # Distilled linear quality model (fasttext-style classifier inference
    # reduced to its scoring form): hand-set literal weights over the
    # oracle-proven feature battery. Feature extraction + dot product +
    # sigmoid are all native columns — the 100 TB inference path for any
    # linear/distilled quality model (weights swap in via this dict).
    "intercept": -3.15,
    "stopword_ratio": 4.0,
    "punct_ratio": -3.0,
    "mean_word_length": 0.2,
    "alpha_word_ratio": 1.5,
    "log_tokens": 0.15,
}


def quality_logit_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: dict | None = None,
) -> DataFrame:
    """Per-doc quality score = sigmoid(w . features): (id, features...,
    score, keep). Engine-portable: round-6 features, round-9 logit,
    round-6 score (the fixed expression tree keeps addition order
    identical across engines)."""
    w = dict(QUALITY_LOGIT_WEIGHTS, **(weights or {}))
    text = F.col(text_col)
    feats = {
        "stopword_ratio": F.round(stopword_ratio_col(text), 6),
        "punct_ratio": F.round(punct_ratio_col(text), 6),
        "mean_word_length": mean_word_length_col(text),
        "alpha_word_ratio": alpha_word_ratio_col(text),
        "log_tokens": F.round(F.log(1.0 + token_count_col(text)), 6),
    }
    z = F.lit(float(w["intercept"]))
    for name, col in feats.items():
        z = z + F.lit(float(w[name])) * col
    z = F.round(z, 9)
    score = F.round(1.0 / (1.0 + F.exp(-z)), 6)
    return df.select(
        F.col(id_col),
        *[c.alias(n) for n, c in feats.items()],
        score.alias("score"),
        F.when(score >= 0.5, 1).otherwise(0).alias("keep"),
    )


# The classic UTF-8-bytes-read-as-CP1252 mojibake sequences (what ftfy
# calls "UTF-8 mixups" -- the dominant encoding artifact in web corpora).
# Keys are the corrupted form (escapes: U+009D etc. are control chars),
# values the intended character.
MOJIBAKE_MAP = {
    "\u00e2\u20ac\u2122": "\u2019",  # -> right single quote
    "\u00e2\u20ac\u0153": "\u201c",  # -> left double quote
    "\u00e2\u20ac\u009d": "\u201d",  # -> right double quote
    "\u00e2\u20ac\u201d": "\u2014",  # -> em dash
    "\u00c3\u00a9": "\u00e9",          # -> e-acute
    "\u00c3\u00a8": "\u00e8",          # -> e-grave
}


def mojibake_count_col(text: Column) -> Column:
    """Number of mojibake sequences present (sum of occurrences of each
    known corrupted form). Pure JVM string ops."""
    total = F.lit(0)
    for bad in MOJIBAKE_MAP:
        occ = (
            F.length(text) - F.length(F.replace(text, F.lit(bad), F.lit("")))
        ) / len(bad)
        total = total + occ.cast("long")
    return total.cast("long")


def mojibake_fix_col(text: Column) -> Column:
    """Repair the known double-encoding artifacts (longest-first so a
    3-char sequence never gets half-eaten by a 2-char rule). A chain of
    native replaces -- scan-bound at any scale."""
    fixed = text
    for bad, good in sorted(MOJIBAKE_MAP.items(), key=lambda kv: -len(kv[0])):
        fixed = F.replace(fixed, F.lit(bad), F.lit(good))
    return fixed


# Unicode script classes for routing/quality in multilingual corpora.
# Ranges are written once and compiled per engine: Java regex takes the
# \uXXXX escapes verbatim; the DuckDB (RE2) twin rewrites them as
# \x{XXXX} (see oracles module). Count = len(text) - len(text with the
# class deleted) — identical integer semantics in both engines.
SCRIPT_CLASSES: dict[str, str] = {
    "latin": "A-Za-zÀ-ɏ",
    "cjk": "一-鿿぀-ヿ가-힯",
    "cyrillic": "Ѐ-ӿ",
    "arabic": "؀-ۿ",
    "digit": "0-9",
}


def script_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document unicode-script histogram + dominant script.

    The routing signal a multilingual pipeline needs BEFORE language id:
    which tokenizer/normalizer family a doc belongs to (Latin vs CJK vs
    Cyrillic vs Arabic), mixed-script spam detection (e.g. Cyrillic
    look-alikes inside Latin text), and digit density. Pure native
    columns — one regexp_replace per class over the scan, no shuffle at
    all (the profile is a map; callers aggregate as needed).

    Counts are exact integers; ``main_script`` is the class with the
    strictly greatest count under the fixed priority order of
    SCRIPT_CLASSES (first listed wins ties), ``none`` when every class
    counts zero.
    """
    text = F.col(text_col)
    total = F.length(text)
    counts = {
        name: (
            total - F.length(F.regexp_replace(text, f"[{rng}]", ""))
        ).cast("long")
        for name, rng in SCRIPT_CLASSES.items()
    }
    out = df.select(
        F.col(id_col),
        total.cast("long").alias("n_chars_total"),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
    )
    names = list(SCRIPT_CLASSES)
    main = F.lit("none")
    # build the CASE chain back-to-front so earlier classes win ties
    for name in reversed(names):
        others = [F.col(f"n_{o}") for o in names if o != name]
        cond = (F.col(f"n_{name}") > 0) & (
            F.col(f"n_{name}") >= F.greatest(*others)
            if len(others) > 1
            else F.col(f"n_{name}") >= others[0]
        )
        main = F.when(cond, F.lit(name)).otherwise(main)
    return out.withColumn("main_script", main)


# Gopher's published repetition thresholds (Rae et al. 2021, table A1):
# max char-fraction of the single most frequent n-gram, and max
# char-fraction covered by duplicated n-grams.
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _ngrams_all(words: Column, n: int) -> Column:
    """All word n-grams WITH multiplicity (the repetition signal needs
    occurrence counts — dedup's `shingles` is distinct-only). Same linear
    arrays_zip-of-shifted-slices construction: the transform(sequence,
    slice) form is O(len^2) and stalls on multi-hundred-KB docs."""
    size = F.size(words)
    k = size - (n - 1)
    shifts = [words] + [
        F.slice(words, i + 1, F.greatest(size - i, F.lit(0)))
        for i in range(1, n)
    ]
    joined = F.transform(
        # arrays_zip names struct fields after source COLUMNS when given a
        # named column — alias each shift to its index explicitly
        F.arrays_zip(*[s.alias(str(i)) for i, s in enumerate(shifts)]),
        lambda s: F.concat_ws(" ", *[s.getField(str(i)) for i in range(n)]),
    )
    return F.when(k > 0, F.slice(joined, 1, k)).otherwise(
        F.array().cast("array<string>")
    )


def repetition_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5,),
) -> DataFrame:
    """Gopher-style n-gram repetition rules (Rae et al. 2021 table A1) —
    the half of the repetition battery gopher_quality_columns does NOT
    cover (it stops at duplicate LINES; templated spam repeats at n-gram
    granularity inside a single line).

    Per document: for each n in ``top_ns`` the most frequent word n-gram
    and the char fraction it covers (count * len(gram) / normalized
    chars, the standard overlap-naive form used by public curation
    pipelines); for each n in ``dup_ns`` the char fraction covered by all
    n-grams occurring >= 2 times. `rep_pass` applies Gopher's published
    thresholds for every requested n.

    Shape at 100 TB: explode n-grams once per n -> ONE key-bounded
    groupBy (doc, n, gram) with map-side combine -> per-doc rollup. No
    self-join, no window over the corpus (the row_number window is
    per-(doc, n) partition). Docs shorter than n tokens contribute no
    grams and report 0.0 fractions (left-joined spine keeps every doc).
    """
    from functools import reduce as _reduce

    for n in (*top_ns, *dup_ns):
        if n < 2:
            raise ValueError(f"n-gram sizes must be >= 2, got {n}")
    words = tokens_col(F.col(text_col))
    base = fanout_scan(df).select(
        F.col(id_col),
        words.alias("__w"),
        F.length(F.concat_ws(" ", words)).cast("long").alias("__total"),
    )
    ns = sorted(set(top_ns) | set(dup_ns))
    grams = _reduce(
        lambda a, b: a.unionByName(b),
        [
            base.select(
                id_col,
                "__total",
                F.lit(n).alias("n"),
                F.explode(_ngrams_all(F.col("__w"), n)).alias("gram"),
            )
            for n in ns
        ],
    )
    counts = grams.groupBy(id_col, "__total", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col, "n").orderBy(
        F.col("cnt").desc(), F.col("gram")
    )
    ranked = counts.withColumn("rn", F.row_number().over(w))
    per_doc = ranked.groupBy(id_col).agg(
        *[
            x
            for n in top_ns
            for x in (
                F.max(
                    F.when((F.col("n") == n) & (F.col("rn") == 1), F.col("gram"))
                ).alias(f"top{n}_gram"),
                F.coalesce(
                    F.max(
                        F.when(
                            (F.col("n") == n) & (F.col("rn") == 1),
                            F.round(
                                F.col("cnt") * F.length("gram") / F.col("__total"), 6
                            ),
                        )
                    ),
                    F.lit(0.0),
                ).alias(f"top{n}_char_frac"),
            )
        ],
        *[
            F.coalesce(
                F.round(
                    F.sum(
                        F.when(
                            (F.col("n") == n) & (F.col("cnt") >= 2),
                            F.col("cnt") * F.length("gram"),
                        )
                    )
                    / F.max("__total"),
                    6,
                ),
                F.lit(0.0),
            ).alias(f"dup{n}_char_frac")
            for n in dup_ns
        ],
    )
    out = base.select(id_col).join(per_doc, id_col, "left")
    fills = {f"top{n}_char_frac": 0.0 for n in top_ns}
    fills.update({f"dup{n}_char_frac": 0.0 for n in dup_ns})
    out = out.fillna(fills)
    gate = F.lit(True)
    for n in top_ns:
        gate = gate & (
            F.col(f"top{n}_char_frac") <= GOPHER_TOP_NGRAM_MAX.get(n, 1.0)
        )
    for n in dup_ns:
        gate = gate & (
            F.col(f"dup{n}_char_frac") <= GOPHER_DUP_NGRAM_MAX.get(n, 1.0)
        )
    return out.withColumn("rep_pass", gate)


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-trained BIGRAM LM scoring — the conditional sibling of
    unigram_lm_scores (CCNet-family perplexity filtering, Wenzek et al.
    2020; a bigram model separates fluent word ORDER from merely common
    words, catching shuffled/templated text the unigram score passes).

    p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)  (add-1 smoothing; c(w1) is
    w1's count as a bigram LHS, V the corpus token vocabulary), and each
    doc scores avg_nll_bits = -mean(log2 p) over its bigrams. Docs with
    fewer than 2 alphabetic tokens stay in the output with n_bigrams=0
    and a NULL score (a doc that silently vanishes from a quality table
    is a dropped doc downstream).

    Shape at 100 TB: bigram + LHS counts are two map-side-combined
    groupBys; scoring joins are key-bounded equi-joins on the n-gram
    keys; the vocabulary scalar rides a 1-row broadcast dim. Float
    parity: per-term integer NANO-UNIT sums with the 6-dp reduction done
    in integers — (s + d/2) div d with d = n*1000 — because round-9
    terms + round-6 float mean provably diverges across engines at
    ~500 terms/doc (dsir lesson, commit 66ecc6c).

    Returns (id_col, n_bigrams, avg_nll_bits).
    """
    l = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda x: x != ""
    )
    base = df.select(F.col(id_col), l.alias("__l"))
    size = F.size(F.col("__l"))
    k = F.greatest(size - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(F.col("__l"), 1, k).alias("0"),
        F.slice(F.col("__l"), 2, k).alias("1"),
    )
    bigrams = base.select(
        id_col, F.explode(pairs).alias("p")
    ).select(
        id_col,
        F.col("p").getField("0").alias("w1"),
        F.col("p").getField("1").alias("w2"),
    )
    c12 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        base.select(F.explode("__l").alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    term = -F.log2(
        (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
    )
    scored = (
        bigrams.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("__u", F.round(term * F.lit(1e9), 0).cast("long"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("__u").alias("__s"),
    )
    avg = (
        F.expr("(__s + (n_bigrams * 1000) div 2) div (n_bigrams * 1000)")
        / F.lit(1e6)
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.when(F.col("n_bigrams") > 0, avg).alias("avg_nll_bits"),
        )
    )


def ccnet_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet's per-language perplexity bucketing (Wenzek et al. 2020 §4.3:
    each language's corpus is split into head/middle/tail thirds by LM
    perplexity; training recipes then sample head-heavy). Buckets come
    from ntile over (lang) ordered by avg_nll_bits — low = fluent = head.

    Docs the LM cannot score (zero alphabetic tokens) sort NULLS LAST,
    i.e. into the tail — a doc must never vanish from a routing table.

    Shape at 100 TB: scoring is unigram_lm_scores (map-side-combined
    counts + key-bounded joins); the ntile window partitions by language
    — a per-lang global sort, the oracle-exact contract. At petabyte
    scale swap the exact ntile for approx_percentile cut points per lang
    (the numeric_profile exact/approx twin pattern); bucket EDGES differ
    by at most the sketch error while this form stays the verifiable
    reference."""
    from pyspark.sql import Window

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    scores = unigram_lm_scores(df, id_col, text_col)
    joined = df.select(F.col(id_col), F.col(lang_col)).join(
        scores, id_col, "left"
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("avg_nll_bits").asc_nulls_last(), F.col(id_col)
    )
    tile = F.ntile(n_buckets).over(w)
    name = (
        F.when(tile == 1, F.lit("head"))
        .when(tile == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return joined.select(
        id_col,
        lang_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        "avg_nll_bits",
        tile.cast("int").alias("bucket_id"),
        name.alias("bucket"),
    )


def blocklist_filter(
    df: DataFrame,
    words: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style blocklist filtering (Raffel et al. '20 §2.2 dropped any
    page containing a word from the public "List of Dirty, Naughty ..."
    blocklist): token-level exact matching against a word list, NOT a
    giant alternation regex — at 2k+ blocklist words a single regex is
    quadratic-ish per page and unreadable in EXPLAIN, while tokens
    joining a broadcast dim stay a hash lookup per token.

    Returns one row per input doc: (id, n_hits, n_distinct_bad, keep)
    with keep = 1 iff no blocklist token occurs. The word dim broadcasts
    (it is tiny by construction); the hit count groupBy and the spine
    left-join both key on the doc id.

    The production word list is loaded from a file and broadcast the
    same way; tests and the registry use a corpus-derived stand-in."""
    spark = df.sparkSession
    if not words:
        raise ValueError("blocklist must not be empty")
    bad = spark.createDataFrame([(w.lower(),) for w in sorted(set(words))], "tok string")
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(
                    F.trim(
                        F.regexp_replace(
                            F.lower(F.col(text_col)), "[^a-z0-9]+", " "
                        )
                    ),
                    " ",
                ),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    hits = (
        toks.join(F.broadcast(bad), "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.countDistinct("tok").cast("long").alias("n_distinct_bad"),
        )
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            F.coalesce("n_distinct_bad", F.lit(0).cast("long")).alias(
                "n_distinct_bad"
            ),
            F.when(F.col("n_hits").isNull(), 1).otherwise(0).alias("keep"),
        )
    )


def token_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits):
    -sum(p log2 p) over the doc's token histogram. Low entropy flags
    repetitive/templated/gibberish-loop text that length and stopword
    ratios miss; high entropy with near-zero stopword ratio flags
    encoded blobs — the composite gibberish signal in C4/Gopher-class
    quality batteries.

    Engine-stable math: per-term round-9 scaled to integer nano-units,
    the per-doc SUM in exact integers (float sums of hundreds of terms
    are order-sensitive and cross-engine unstable), and the final 6-dp
    reduction also in integers ((s+500) div 1000 / 1e6 — entropy terms
    are non-negative). Two map-side-combined aggregates keyed by
    (doc, token) then doc; the spine left-join keeps zero-token docs."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(
                    F.trim(
                        F.regexp_replace(
                            F.lower(F.col(text_col)), "[^a-z0-9]+", " "
                        )
                    ),
                    " ",
                ),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    counts = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    p = F.col("c") / F.col("n_tokens")
    units = F.round(-p * F.log2(p) * F.lit(1e9), 0).cast("long")
    per_doc = (
        counts.join(tot, id_col)
        .select(F.col(id_col), F.col("n_tokens"), F.col("n_distinct"), units.alias("u"))
        .groupBy(id_col, "n_tokens", "n_distinct")
        .agg(F.sum("u").alias("s"))
        .withColumn(
            "entropy_bits",
            F.expr("((s + 500) div 1000) / 1e6"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("n_distinct", F.lit(0).cast("long")).alias("n_distinct"),
            F.coalesce("entropy_bits", F.lit(0.0)).alias("entropy_bits"),
        )
    )


def source_diversity(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Cross-document n-gram diversity per source (the distinct-n /
    self-BLEU-style mode-collapse signal, Zhu et al. '18 "Texygen"; data
    curation uses it to catch template-collapsed or machine-spun sources
    that per-document repetition rules cannot see — every doc looks fine,
    the SOURCE repeats itself).

    For each (source, n): total = sum over docs of the doc's DISTINCT
    n-gram count, distinct = distinct n-grams across the whole source,
    distinct_ratio = distinct/total (1.0 = no two docs share a gram; low
    = the source recycles its text). Returns (source, n, total_grams,
    distinct_grams, distinct_ratio).

    Shape at 100 TB: one scan per n (explode of per-doc distinct
    shingles), ONE map-side-combined groupBy keyed (source, gram), then a
    source-keyed rollup. No self-join, no window."""
    from functools import reduce

    from reader_spark.ops.dedup import shingles

    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"n-gram sizes must be >= 1, got {ns}")
    spine = df.select(group_col).distinct()
    outs = []
    for n in ns:
        grams = df.select(
            F.col(group_col),
            F.explode(shingles(F.col(text_col), n=n)).alias("g"),
        ).where(F.col("g") != "")
        agg = (
            grams.groupBy(group_col, "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(group_col)
            .agg(
                F.sum("c").cast("long").alias("total_grams"),
                F.count(F.lit(1)).cast("long").alias("distinct_grams"),
            )
        )
        # a source whose docs are all empty produces no grams and would
        # vanish — spine left-join keeps it visible (zeros, NULL ratio)
        outs.append(
            spine.join(agg, group_col, "left").select(
                F.col(group_col),
                F.lit(n).cast("int").alias("n"),
                F.coalesce("total_grams", F.lit(0).cast("long")).alias(
                    "total_grams"
                ),
                F.coalesce("distinct_grams", F.lit(0).cast("long")).alias(
                    "distinct_grams"
                ),
                F.round(
                    F.try_divide(
                        F.col("distinct_grams"), F.col("total_grams")
                    ),
                    6,
                ).alias("distinct_ratio"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-language tokenizer-budget statistics (the fertility audit from
    multilingual tokenizer studies, e.g. Rust et al. ACL'21: how many
    units a language pays per unit of information): chars per whitespace
    token, bytes per char (multibyte scripts pay UTF-8 tax — zh runs
    ~3x en), tokens per doc. Drives per-language budget conversion when
    a corpus is priced in tokens but stored in bytes.

    One map-side-combined groupBy on the language dim; all sums are
    exact integers, each ratio is a single divide-then-round."""
    text = F.col(text_col)
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length(text)).cast("long").alias("chars"),
        F.sum(F.octet_length(text)).cast("long").alias("bytes"),
        F.sum(token_count_col(text)).cast("long").alias("tokens"),
    )
    return agg.select(
        group_col,
        "n_docs",
        "tokens",
        F.round(F.col("chars") / F.col("tokens"), 6).alias("chars_per_token"),
        F.round(F.col("bytes") / F.col("chars"), 6).alias("bytes_per_char"),
        F.round(F.col("tokens") / F.col("n_docs"), 6).alias("tokens_per_doc"),
    )


# Candidate card runs: 13-19 digits allowing space/dash grouping.
# RE2-safe (no lookarounds); both engines share the literal.
PII_CARD_CANDIDATE = r"\b[0-9][0-9 -]{11,22}[0-9]\b"


def luhn_valid_col(digits: Column) -> Column:
    """Luhn mod-10 checksum (ISO/IEC 7812) over a pure-digit string —
    TRUE iff the checksum validates. Exact integer fold: from the
    right, every second digit doubles (minus 9 when > 9); total % 10
    == 0. The reason this exists: a bare 13-19-digit regex flags phone
    numbers, order ids and timestamps; the checksum is the standard
    high-precision gate (typo'd or random digit runs fail it 90% of
    the time)."""
    rev = F.filter(F.split(F.reverse(digits), ""), lambda c: c != "")
    contrib = F.zip_with(
        rev,
        F.sequence(F.lit(0), F.greatest(F.size(rev) - 1, F.lit(0))),
        lambda c, i: F.when(
            i % 2 == 1,
            F.when(
                c.cast("int") * 2 > 9, c.cast("int") * 2 - 9
            ).otherwise(c.cast("int") * 2),
        ).otherwise(c.cast("int")),
    )
    total = F.aggregate(
        contrib, F.lit(0), lambda acc, x: acc + F.coalesce(x, F.lit(0))
    )
    return (F.length(digits) > 0) & (total % 10 == 0)


def card_count_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document payment-card audit: candidate digit runs (13-19
    digits with space/dash grouping) and the Luhn-VALID subset — the
    column a release gate blocks on (candidates alone are noise;
    validated numbers are reportable PII). Pure row expressions: one
    regexp_extract_all + a bounded per-candidate integer fold, riding
    the scan."""
    cands = F.regexp_extract_all(
        F.col(text_col), F.lit(PII_CARD_CANDIDATE), F.lit(0)
    )
    norm = F.transform(
        cands, lambda s: F.regexp_replace(s, "[ -]", "")
    )
    inlen = F.filter(
        norm,
        lambda s: (F.length(s) >= 13) & (F.length(s) <= 19),
    )
    valid = F.filter(inlen, lambda s: luhn_valid_col(s))
    return df.select(
        "*",
        F.size(inlen).cast("long").alias("n_card_candidates"),
        F.size(valid).cast("long").alias("n_cards_luhn_valid"),
    )


# A small category lexicon in the LIWC tradition (Pennebaker et al.;
# data curation uses category PROFILES where blocklist_filter uses one
# binary list): representative, swap for the full licensed lexicon in
# production — same broadcast-dim plan.
DEFAULT_LEXICON: dict[str, tuple[str, ...]] = {
    "negation": ("no", "not", "never", "none", "cannot", "neither"),
    "certainty": ("always", "definitely", "certainly", "must", "every"),
    "tentative": ("maybe", "perhaps", "possibly", "seems", "might"),
    "social": ("we", "you", "they", "people", "friend", "family"),
    "numeric": ("one", "two", "three", "first", "second", "half"),
}


def lexicon_category_profile(
    df: DataFrame,
    lexicon: dict[str, tuple[str, ...]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc, category) token-hit profile over a word-category
    lexicon — the multi-category generalization of blocklist_filter
    (same broadcast word-dim equi-join; a category is just a labeled
    list): n_hits, n_distinct and the hit share in exact milli units of
    the doc's token count. Every (doc, category) pair is emitted (zero
    rows included) so profile consumers never silently miss a category;
    docs with zero tokens emit share NULL.

    Shape at 100 TB: token explode rides the scan, ONE broadcast join
    against the (category, word) dim, one map-side-combined groupBy —
    the blocklist plan with a category column."""
    lex = lexicon or DEFAULT_LEXICON
    if not lex or any(not ws for ws in lex.values()):
        raise ValueError("lexicon must map categories to non-empty lists")
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(c, w.lower()) for c, ws in sorted(lex.items()) for w in sorted(set(ws))],
        "category string, tok string",
    )
    cats = spark.createDataFrame(
        [(c,) for c in sorted(lex)], "category string"
    )
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(
                    F.trim(
                        F.regexp_replace(
                            F.lower(F.col(text_col)), "[^a-z0-9]+", " "
                        )
                    ),
                    " ",
                ),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    totals = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    hits = (
        toks.join(F.broadcast(dim), "tok")
        .groupBy(id_col, "category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.countDistinct("tok").cast("long").alias("n_distinct"),
        )
    )
    spine = df.select(id_col).crossJoin(F.broadcast(cats))
    return (
        spine.join(hits, [id_col, "category"], "left")
        .join(totals, id_col, "left")
        .select(
            F.col(id_col),
            "category",
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            F.coalesce("n_distinct", F.lit(0).cast("long")).alias(
                "n_distinct"
            ),
            F.when(
                F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
                F.expr("(coalesce(n_hits, 0) * 1000) div n_tokens"),
            ).alias("share_milli"),
        )
    )
