"""jusText boilerplate classification (Pomikálek 2011, "Removing
boilerplate and duplicate content from web corpora", §3.3).

The second canonical main-content arm next to Readability-style scoring
(reader_spark/readability.py): classify each paragraph of a page as
good / bad / short / neargood from link density, stopword density and
length (the CONTEXT-FREE pass), then let short and neargood paragraphs
inherit from their nearest decisively-classified neighbours (the
CONTEXT-SENSITIVE pass). vakra-dev/reader's content-cleaner
(src/utils/content-cleaner.ts) reaches the same goal with tag
heuristics; jusText is the language-statistics route its consumers use
when tag structure is unreliable (text dumps, templated spam).

Context-free rules (verbatim from the published algorithm):

    if link_density > max_link_density:            bad
    elif '©' in text (copyright symbol):           bad
    elif length < length_low:
        bad if link_density > 0 else               short
    elif stopword_density >= stopwords_high:
        good if length > length_high else          neargood
    elif stopword_density >= stopwords_low:        neargood
    else:                                          bad

Context-sensitive revision (two passes, exactly jusText's sequencing):
pass 1 relabels every ``short`` from the nearest non-short/neargood
neighbour on each side (both good → good; both bad → bad, UNLESS the
bad side's nearest any-class neighbour is neargood, which rescues it to
good; missing neighbours count as bad); pass 2 then relabels every
``neargood`` — bad only when both nearest decisive neighbours (in the
pass-1-revised labels, so rescued shorts count) are bad. Heading
promotion is intentionally omitted: it needs DOM heading flags the
paragraph frame does not carry; callers with span kinds can pre-promote.

Shape at 100 TB: the context-free pass is a PURE MAP (length / split /
array_contains against a literal stopword array — whole-stage codegen,
no UDF). The context passes are window functions PARTITIONED BY
document — partitions are bounded by paragraphs-per-page (hundreds),
never corpus-wide, so there is no single-partition window and the only
shuffle keys on doc_id; both passes share that one exchange. Stopwords
ride the plan as a literal array (the real lists are <1k words/lang —
expression-sized, no broadcast join needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GOOD, BAD, SHORT, NEARGOOD = "good", "bad", "short", "neargood"


def justext_classify(
    paragraphs: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "par_no",
    text_col: str = "text",
    link_chars_col: str = "link_chars",
    stopwords: tuple[str, ...] = (),
    length_low: int = 70,
    length_high: int = 200,
    stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
    max_link_density: float = 0.2,
    heading_col: str | None = None,
    max_heading_distance: int = 200,
    stopwords_by_lang: dict[str, tuple[str, ...]] | None = None,
    lang_col: str = "lang",
) -> DataFrame:
    """Classify (id, par_no, text, link_chars) paragraph rows.

    Returns (id, par_no, length, n_words, link_density,
    stopword_density, cf_class, final_class) — ``cf_class`` is the
    context-free verdict, ``final_class`` the context-revised one
    (in {good, bad}: short/neargood never survive revision).

    With ``heading_col`` (boolean) set, jusText's two heading passes
    run as published: BEFORE the short revision, a short heading
    becomes neargood when a context-free good paragraph follows within
    ``max_heading_distance`` chars (summed over the paragraphs in
    between); AFTER the neargood revision, a heading that stayed bad
    from a short context-free verdict becomes good when a final-good
    paragraph follows within the same budget. Distances are cumulative
    char offsets over the same doc-partitioned windows — the
    sequential in-place loop of the reference implementation only ever
    reads positions it has not yet mutated, so the snapshot form here
    is exactly equivalent.
    """
    length = F.length(F.col(text_col))
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    if stopwords_by_lang:
        # per-language stopword routing: jusText ships one list per
        # language; a multilingual corpus picks by the row's lang.
        # Each list rides the plan as a literal array behind a lang
        # CASE — still pure expressions, no join, no Python.
        stop_arr = None
        for lg, ws in stopwords_by_lang.items():
            arm = F.array(*[F.lit(w) for w in ws])
            stop_arr = (
                F.when(F.col(lang_col) == lg, arm)
                if stop_arr is None
                else stop_arr.when(F.col(lang_col) == lg, arm)
            )
        stop_arr = stop_arr.otherwise(F.array(*[F.lit(w) for w in stopwords]))
    else:
        stop_arr = F.array(*[F.lit(w) for w in stopwords])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    stop_density = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    link_density = F.col(link_chars_col) / F.greatest(length, F.lit(1))

    cf = (
        F.when(link_density > max_link_density, BAD)
        .when(F.col(text_col).contains("©"), BAD)
        .when(
            length < length_low,
            F.when(link_density > 0, BAD).otherwise(SHORT),
        )
        .when(
            stop_density >= stopwords_high,
            F.when(length > length_high, GOOD).otherwise(NEARGOOD),
        )
        .when(stop_density >= stopwords_low, NEARGOOD)
        .otherwise(BAD)
    )

    heading = F.col(heading_col) if heading_col else F.lit(False)
    base = paragraphs.select(
        F.col(id_col),
        F.col(order_col),
        length.alias("length"),
        n_words.alias("n_words"),
        F.round(link_density, 6).alias("link_density"),
        F.round(stop_density, 6).alias("stopword_density"),
        cf.alias("cf_class"),
        heading.alias("_heading"),
    )

    w_prev = (
        Window.partitionBy(id_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # "nearest following" frames run REVERSED: a (1, unboundedFollowing)
    # frame re-scans the partition tail for every row (O(n²) per page);
    # last() over the DESC order with a running (unboundedPreceding, -1)
    # frame selects the same row at O(n) (order_col is unique per page).
    w_next = (
        Window.partitionBy(id_col)
        .orderBy(F.desc(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def _first_next(col):
        return F.last(col, ignorenulls=True).over(w_next)

    def _decisive(col):  # nearest good/bad, skipping short AND neargood
        return F.when(col.isin(GOOD, BAD), col)

    def _nonshort(col):  # nearest anything-but-short (neargood counts)
        return F.when(col != SHORT, col)

    # char offset of each paragraph's start within its page; the gap
    # between paragraph i and a following j is start(j) - end(i)
    base = base.withColumn(
        "_off", F.coalesce(F.sum("length").over(w_prev), F.lit(0))
    )

    def _heading_promote(df, class_col, candidate, target, out_col):
        """One jusText heading pass: heading candidates whose nearest
        FOLLOWING ``class_col``-good paragraph starts within
        max_heading_distance chars of their end take ``target``. The
        reference loop checks the budget before each forward step, so
        nearest-good-within-budget is exactly its break condition."""
        c = F.col(class_col)
        next_good_off = _first_next(F.when(c == GOOD, F.col("_off")))
        promoted = F.when(
            F.col("_heading")
            & candidate
            & next_good_off.isNotNull()
            & (
                next_good_off - (F.col("_off") + F.col("length"))
                <= max_heading_distance
            ),
            F.lit(target),
        ).otherwise(c)
        return df.withColumn(out_col, promoted)

    # heading pass 1: short headings near a context-free good paragraph
    # start the revision as neargood (cf_class itself stays reported)
    base = _heading_promote(
        base, "cf_class", F.col("cf_class") == SHORT, NEARGOOD, "_c0"
    )
    cfc = F.col("_c0")
    p1 = (
        base.withColumn(
            "_prev_gb",
            F.coalesce(
                F.last(_decisive(cfc), ignorenulls=True).over(w_prev), F.lit(BAD)
            ),
        )
        .withColumn(
            "_next_gb",
            F.coalesce(
                _first_next(_decisive(cfc)), F.lit(BAD)
            ),
        )
        .withColumn(
            "_prev_any",
            F.coalesce(
                F.last(_nonshort(cfc), ignorenulls=True).over(w_prev), F.lit(BAD)
            ),
        )
        .withColumn(
            "_next_any",
            F.coalesce(
                _first_next(_nonshort(cfc)), F.lit(BAD)
            ),
        )
    )
    short_rev = (
        F.when((F.col("_prev_gb") == GOOD) & (F.col("_next_gb") == GOOD), GOOD)
        .when((F.col("_prev_gb") == BAD) & (F.col("_next_gb") == BAD), BAD)
        .when(
            ((F.col("_prev_gb") == BAD) & (F.col("_prev_any") == NEARGOOD))
            | ((F.col("_next_gb") == BAD) & (F.col("_next_any") == NEARGOOD)),
            GOOD,
        )
        .otherwise(BAD)
    )
    p1 = p1.withColumn(
        "_c1", F.when(cfc == SHORT, short_rev).otherwise(cfc)
    ).drop("_prev_gb", "_next_gb", "_prev_any", "_next_any")

    c1 = F.col("_c1")
    p2 = p1.withColumn(
        "_prev_gb2",
        F.coalesce(F.last(_decisive(c1), ignorenulls=True).over(w_prev), F.lit(BAD)),
    ).withColumn(
        "_next_gb2",
        F.coalesce(_first_next(_decisive(c1)), F.lit(BAD)),
    )
    neargood_rev = F.when(
        (F.col("_prev_gb2") == BAD) & (F.col("_next_gb2") == BAD), BAD
    ).otherwise(GOOD)
    p2 = p2.withColumn(
        "_c2", F.when(c1 == NEARGOOD, neargood_rev).otherwise(c1)
    ).drop("_c1", "_prev_gb2", "_next_gb2")

    # final heading pass: a heading that stayed bad from a SHORT
    # context-free verdict becomes good when a final-good paragraph
    # follows within the distance budget (reference: the second
    # "more good headings" loop)
    out = _heading_promote(
        p2,
        "_c2",
        (F.col("_c2") == BAD) & (F.col("cf_class") == SHORT),
        GOOD,
        "final_class",
    )
    return out.drop("_c0", "_c2", "_heading", "_off")


def justext_extract(
    paragraphs: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "par_no",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """The applied pass: reassemble each page from its ``good``
    paragraphs — (id, n_pars, n_good, content_md5), md5 over the
    surviving paragraph texts in page order (md5('') when boilerplate
    ate the whole page, so every input page stays visible). One further
    groupBy on the same doc_id key the windows already shuffled on."""
    cls = justext_classify(paragraphs, id_col, order_col, text_col, **kwargs)
    joined = cls.join(
        paragraphs.select(id_col, order_col, text_col), [id_col, order_col]
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_pars"),
        F.sum((F.col("final_class") == GOOD).cast("long")).alias("n_good"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("final_class") == GOOD,
                                F.struct(F.col(order_col), F.col(text_col)),
                            )
                        )
                    ),
                    lambda x: x[text_col],
                ),
            )
        ).alias("content_md5"),
    )
