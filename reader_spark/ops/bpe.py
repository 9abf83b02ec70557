"""Exact BPE tokenization as pure JVM-side string expressions.

Token counts elsewhere in the repo are whitespace or BPE-ish regex
proxies; the packing / budget-mix / fertility operators want the REAL
token count of a concrete tokenizer.  This module implements byte-pair
encoding with a literal merge table (the artifact a trained tokenizer
ships — cf. GPT-2's ``merges.txt``, Sennrich et al. 2016) entirely in
Spark built-ins, so the hot path is whole-stage-codegen string ops with
NO Python and NO shuffle (the per-doc count is a within-row fold).

Encoding trick: a word's symbol sequence is rendered as ``|s1||s2||s3|``
(every symbol wrapped in ``|`` on both sides; symbols are drawn from
``[a-z0-9]`` + the ``</w>`` end-of-word marker, so ``|`` can't collide).
Applying merge ``(l, r)`` is then the literal replacement
``|l||r| -> |lr|``:

* adjacent matches share NO characters (unlike a space-separated
  rendering, where the shared separator makes ``replace`` skip every
  second occurrence of an overlapping run), so one non-overlapping
  leftmost ``replace`` pass == BPE's "merge all occurrences, greedy
  left-to-right" exactly;
* a symbol can never match inside another (``|h||e|`` does not occur in
  ``|th||e|``), so no false merges.

Merges are applied once each, in rank order — the deterministic
fixed-pass contract (the order a correctly-learned table is consumed
in: a pair's constituents are produced by strictly earlier merges).
The token count is ``(len(s) - len(strip '|')) / 2``.

The SAME construction renders to DuckDB SQL (``regexp_replace`` with a
``g`` flag + a chain of ``replace`` calls), so the op is oracle-exact:
integer token counts, no float anywhere.

Reference behavior spec: the reference counts tokens for budgeting in
its formatter pipeline (/root/reference/src/formatters/markdown.ts
word-count accounting); this op supplies the trained-tokenizer-exact
equivalent a 100 TB curation run budgets with.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A mini merge table over lowercase English + digits, in rank order —
# the literal artifact a trained BPE ships. 40 merges chosen so common
# English function words and affixes compress (the interesting, branchy
# part of the algorithm actually fires on the fixture corpus).
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    # every pair's constituents exist before its rank (base chars, </w>,
    # or the product of a strictly earlier merge) — the invariant a
    # learned merges.txt carries
    ("t", "h"),
    ("th", "e"),
    ("the", "</w>"),
    ("i", "n"),
    ("in", "g"),
    ("ing", "</w>"),
    ("a", "n"),
    ("an", "d"),
    ("and", "</w>"),
    ("e", "r"),
    ("er", "</w>"),
    ("o", "n"),
    ("on", "</w>"),
    ("t", "i"),
    ("ti", "on</w>"),
    ("o", "u"),
    ("r", "e"),
    ("e", "n"),
    ("en", "t"),
    ("ent", "</w>"),
    ("s", "</w>"),
    ("e", "</w>"),
    ("d", "</w>"),
    ("t", "</w>"),
    ("y", "</w>"),
    ("o", "f"),
    ("of", "</w>"),
    ("t", "o"),
    ("to", "</w>"),
    ("i", "s</w>"),
    ("a", "</w>"),
    ("w", "i"),
    ("wi", "th"),
    ("with", "</w>"),
    ("o", "r"),
    ("f", "or"),
    ("for", "</w>"),
    ("a", "l"),
    ("l", "l"),
    ("n", "</w>"),
)

WORD_SPLIT = "[^a-z0-9]+"


def _check_merges(merges) -> None:
    for l, r in merges:
        if "|" in l or "|" in r:
            raise ValueError(f"merge symbols may not contain '|': {(l, r)}")


def bpe_symbols_expr(word: Column, merges=DEFAULT_MERGES) -> Column:
    """``|sym|``-rendered BPE symbol sequence of one lowercase word."""
    s = F.concat(
        F.regexp_replace(word, "(.)", r"|$1|"), F.lit("|</w>|")
    )
    for l, r in merges:
        s = F.replace(s, F.lit(f"|{l}||{r}|"), F.lit(f"|{l}{r}|"))
    return s


def bpe_word_tokens_expr(word: Column, merges=DEFAULT_MERGES) -> Column:
    """Exact BPE token count of one word (long)."""
    s = bpe_symbols_expr(word, merges)
    return (
        (F.length(s) - F.length(F.replace(s, F.lit("|"), F.lit(""))))
        / F.lit(2)
    ).cast("long")


def bpe_doc_tokens_expr(text: Column, merges=DEFAULT_MERGES) -> Column:
    """Exact BPE token count of a document (long) — a within-row fold:
    lowercase, split to words, encode each word, sum. No shuffle, no
    Python; the whole thing rides the parquet scan."""
    _check_merges(merges)
    words = F.filter(
        F.split(F.lower(text), WORD_SPLIT), lambda w: w != F.lit("")
    )
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + bpe_word_tokens_expr(w, merges),
    )


def bpe_token_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    merges=DEFAULT_MERGES,
) -> DataFrame:
    """Per-document exact BPE accounting: (id, n_words, bpe_tokens,
    fertility = tokens/word). The column packing / token_budget_mix /
    token_shards consume as their exact ``token_col``.

    Shape: the merge fold runs once per DISTINCT word (the
    wordpiece_doc_tokens memoization — at corpus scale the vocabulary
    is orders of magnitude smaller than the occurrence stream, so
    encoding distinct words + a word-keyed join-back beats re-folding
    every occurrence; the sf0.1 bench went ~3x faster).  Values are
    identical to the within-row fold (same expression per word), so
    the DuckDB oracle is unchanged.  ``bpe_doc_tokens_expr`` remains
    the within-row Column form for single-pass scans."""
    _check_merges(merges)
    occ = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), WORD_SPLIT),
                lambda w: w != F.lit(""),
            )
        ).alias("__w"),
    )
    # The rendered symbol string stages through a projection: the token
    # count reads it twice (length + stripped length), and an inline
    # bpe_word_tokens_expr would evaluate the 40-replace chain twice
    # per word.
    enc = (
        occ.select("__w")
        .distinct()
        .select("__w", bpe_symbols_expr(F.col("__w"), merges).alias("__s"))
        .select(
            "__w",
            (
                (
                    F.length("__s")
                    - F.length(F.replace(F.col("__s"), F.lit("|"), F.lit("")))
                )
                / F.lit(2)
            )
            .cast("long")
            .alias("__t"),
        )
    )
    counts = (
        occ.join(enc, "__w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("__t").cast("long").alias("bpe_tokens"),
        )
    )
    # left join back so zero-word documents keep their (0, 0, NULL) row
    return (
        df.select(id_col)
        .join(counts, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("bpe_tokens", F.lit(0))
            .cast("long")
            .alias("bpe_tokens"),
        )
        .withColumn(
            "fertility",
            F.when(
                F.col("n_words") > 0,
                F.round(F.col("bpe_tokens") / F.col("n_words"), 6),
            ),
        )
    )


def bpe_encode_words(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    merges=DEFAULT_MERGES,
) -> DataFrame:
    """Per-word encoded symbol arrays: (id, word, tokens array<string>)
    — the debugging/inspection surface of the tokenizer (and the form a
    downstream vocab-id lookup joins against)."""
    _check_merges(merges)
    words = F.filter(
        F.split(F.lower(F.col(text_col)), WORD_SPLIT),
        lambda w: w != F.lit(""),
    )
    out = df.select(F.col(id_col), F.explode(words).alias("word"))
    rendered = bpe_symbols_expr(F.col("word"), merges)
    toks = F.filter(
        F.split(rendered, r"\|\|"),
        lambda t: t != F.lit(""),
    )
    return out.select(
        F.col(id_col),
        "word",
        F.transform(
            toks, lambda t: F.replace(t, F.lit("|"), F.lit(""))
        ).alias("tokens"),
    )


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int = 12,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (Sennrich et al. 2016 learn
    step): iteratively count adjacent symbol pairs over the corpus and
    merge the most frequent, ``n_merges`` times. Returns the learned
    table as (merge_rank, lhs, rhs, pair_count) — the artifact
    :func:`bpe_token_counts` consumes as ``merges``.

    Scale shape (the classic map-reduce BPE learner): training runs on
    the DISTINCT-WORD frequency dim (one groupBy of the corpus — 1e8ish
    rows at 100 TB, not 1e12 token rows); each iteration is one
    map-side-combined pair count over that dim plus a TakeOrdered(1)
    argmax (a bounded 1-row collect, the PageRank-dangling-mass
    pattern), and the merge application is a pure map. The symbol state
    re-uses the |sym| string rendering, so applying a merge is one
    literal replace. Plans are re-checkpointed every 8 merges to bound
    lineage depth.

    Ties break (count desc, lhs asc, rhs asc) — deterministic and
    engine-portable. Pairs are counted at every adjacent index
    (overlapping runs count each occurrence), matching subword-nmt's
    get_stats.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = df.sparkSession
    cur = (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), WORD_SPLIT),
                    lambda w: w != F.lit(""),
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(
            F.concat(
                F.regexp_replace("word", "(.)", r"|$1|"), F.lit("|</w>|")
            ).alias("s"),
            "c",
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        syms = F.split(F.expr("substring(s, 2, length(s) - 2)"), r"\|\|")
        n = F.size(syms)
        pairs = F.arrays_zip(
            F.slice(syms, 1, F.greatest(n - 1, F.lit(0))).alias("l"),
            F.slice(syms, 2, F.greatest(n - 1, F.lit(0))).alias("r"),
        )
        best = (
            cur.select(F.explode(pairs).alias("p"), "c")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("c").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or int(best[0]["pair_count"]) < min_count:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["pair_count"])
        merges.append((rank, l, r, cnt))
        cur = cur.withColumn(
            "s", F.replace(F.col("s"), F.lit(f"|{l}||{r}|"), F.lit(f"|{l}{r}|"))
        )
        if (rank + 1) % 8 == 0:
            cur = cur.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank long, lhs string, rhs string, pair_count long"
    )
