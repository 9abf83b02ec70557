"""RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010,
"Automatic Keyword Extraction from Individual Documents").

A curation pipeline wants per-document keyphrases for dataset cards,
topic routing, and the include/exclude regex source (ops/sections.py
gives URL-path structure; this gives content structure). RAKE is the
canonical unsupervised extractor: split the token stream into candidate
phrases at stopwords/punctuation, score each content word by
``deg(w) / freq(w)`` where ``deg`` sums the lengths of every phrase
instance containing the word (co-occurrence degree, self included) and
``freq`` counts its occurrences, then score a phrase as the sum of its
member-word scores and take the top-k per document.

Engine-portable arithmetic (repo discipline): word scores are integer
milli-units ``deg * 1000 div freq`` (positive BIGINT truncating
division — identical in Spark and DuckDB), phrase scores are BIGINT
sums of those, and the top-k election orders by ``(score_milli DESC,
phrase ASC)`` so ties break on the phrase string — no float crosses an
engine boundary.

Shape at 100 TB: tokens explode per document; the phrase-bucket running
count, the phrase-length window, and the top-k row_number all partition
on doc_id; word statistics group on (doc_id, word). Every shuffle is
doc-keyed with map-side combine — no global window, no corpus-wide
state, so the plan scales with documents, not with any corpus-level
vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import LANG_STOPWORDS

TOKEN_SEP = "[^a-z0-9]+"

# RAKE delimiter lexicon: the repo's English stopword core plus the
# high-frequency function words the Fox stoplist adds; a literal so the
# DuckDB oracle can embed the exact same set (one lexicon, two engines).
RAKE_STOPWORDS: tuple[str, ...] = tuple(
    sorted(
        LANG_STOPWORDS["en"]
        | frozenset("a an at be by from has not or this was".split())
    )
)


def rake_keywords(
    docs: DataFrame,
    k: int = 10,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k RAKE keyphrases per document.

    Output: (doc_id, rank, phrase, score_milli, n_words) — ``rank`` is
    1-based by ``(score_milli DESC, phrase ASC)``; duplicate phrase
    instances inside one document collapse to one row (they score
    identically by construction). Documents whose tokens are all
    stopwords emit nothing.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SEP),
                lambda x: x != "",
            )
        ).alias("pos", "tok"),
    )
    # Phrase buckets: a stopword closes the current candidate phrase.
    # Running delimiter count is a doc-keyed window; content tokens in
    # the same bucket form one phrase instance.
    is_stop = F.col("tok").isin(*stopwords)
    doc_order = Window.partitionBy("doc_id").orderBy("pos")
    bucketed = toks.withColumn(
        "bucket",
        F.sum(is_stop.cast("long")).over(
            doc_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).where(~is_stop)
    # Each content token learns its phrase-instance length (doc-keyed
    # window — no join), then word stats aggregate per (doc, word).
    plen = F.count("*").over(Window.partitionBy("doc_id", "bucket"))
    member = bucketed.withColumn("plen", plen)
    words = member.groupBy("doc_id", "tok").agg(
        F.count("*").alias("freq"), F.sum("plen").alias("deg")
    )
    scored = words.select(
        "doc_id",
        "tok",
        F.expr("deg * 1000 div freq").cast("long").alias("word_milli"),
    )
    phrases = (
        member.join(scored, ["doc_id", "tok"])
        .groupBy("doc_id", "bucket")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.sum("word_milli").alias("score_milli"),
            F.count("*").alias("n_words"),
        )
        # identical phrase text => identical member words => identical
        # score; collapse instances before the election
        .groupBy("doc_id", "phrase")
        .agg(
            F.max("score_milli").alias("score_milli"),
            F.max("n_words").alias("n_words"),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.desc("score_milli"), F.asc("phrase")
        )
    )
    return (
        phrases.withColumn("rank", rank)
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "phrase", "score_milli", "n_words")
    )


def rake_word_scores(
    docs: DataFrame,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The per-(document, word) RAKE statistics table feeding
    :func:`rake_keywords`: (doc_id, tok, freq, deg, word_milli).
    Exposed separately so corpus-level keyword rollups can aggregate
    word evidence without re-deriving phrase structure."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SEP),
                lambda x: x != "",
            )
        ).alias("pos", "tok"),
    )
    is_stop = F.col("tok").isin(*stopwords)
    doc_order = Window.partitionBy("doc_id").orderBy("pos")
    bucketed = toks.withColumn(
        "bucket",
        F.sum(is_stop.cast("long")).over(
            doc_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).where(~is_stop)
    member = bucketed.withColumn(
        "plen", F.count("*").over(Window.partitionBy("doc_id", "bucket"))
    )
    return (
        member.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("deg"))
        .select(
            "doc_id",
            "tok",
            "freq",
            "deg",
            F.expr("deg * 1000 div freq").cast("long").alias("word_milli"),
        )
    )
