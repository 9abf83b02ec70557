"""C4-style global line-level deduplication.

The C4 / RefinedWeb recipe the reference's corpus consumers expect
downstream of extraction: any exact line that occurs more than once in
the whole corpus keeps only its FIRST occurrence (ordered by
(doc_id, line_no)); every other occurrence is dropped, and each
document's text is reassembled from its surviving lines. This catches
residual boilerplate (nav strings, cookie banners, footer legalese)
that survives per-document cleaning because it is *correct* content on
any one page — it is only visible as boilerplate corpus-wide.

Shape at 100 TB:
- Re-lining is a PURE MAP: one `regexp_extract_all` per document, no
  shuffle. Natural-newline corpora pass ``pattern=None`` and split on
  '\\n' directly; the fixed-width token chunking exists because the
  synthetic fixture corpus has no newlines (bag-of-words docs), and a
  3-token chunk width is what makes the drop path non-vacuous there.
- First-occurrence election is ONE `groupBy(line)` with a map-side
  combined `min(struct(doc_id, line_no))`. A mega-duplicated
  boilerplate line (millions of copies) is absorbed by the partial
  aggregate: each map task emits one candidate row per distinct line,
  so the shuffle carries |distinct lines| rows, not |occurrences| —
  the skew never reaches a single reducer as raw copies.
- At production scale group on a 128-bit content hash
  (md5/xxhash pair) instead of the line string to bound shuffle bytes;
  the string form here is the oracle-exact contract (no collision
  caveat).
- Survivor marking is an equi-join back on the line value (same key,
  same partitioning — AQE reuses the exchange), and document
  reassembly is one `groupBy(doc_id)`. Nothing is quadratic; no
  window function sees an unbounded partition.

Reference context: vakra-dev/reader ships extraction only; this is one
of the corpus-prep operators layered on top (SURVEY.md LLM-pipeline
battery), same family as ops/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int | None = 3,
) -> DataFrame:
    """Explode each document into (id, line_no, line) rows.

    ``words_per_line=None`` splits on newlines (the natural-corpus
    path); an integer re-lines a newline-free corpus into fixed-width
    token chunks via ONE greedy regex — a narrow map, no shuffle, no
    per-element array slicing (the transform+slice form is O(len^2)).
    """
    if words_per_line is None:
        arr = F.split(F.col(text_col), "\n")
    else:
        if words_per_line < 1:
            raise ValueError("words_per_line must be >= 1 or None")
        pattern = r"\S+( \S+){0,%d}" % (words_per_line - 1)
        arr = F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
    return df.select(
        F.col(id_col),
        F.posexplode(arr).alias("line_no", "line"),
    ).withColumn("line_no", F.col("line_no").cast("long"))


def line_dedup(
    lines: DataFrame,
    id_col: str = "doc_id",
    min_words: int = 2,
) -> DataFrame:
    """Keep the globally-first occurrence of every dedupable line.

    Lines with fewer than ``min_words`` tokens are exempt (always
    kept): deduping trivial fragments ("the", a lone word at a chunk
    boundary) would delete real content for no boilerplate win — the
    same reason C4 only dedups 3-sentence spans. Exemption is a
    function of the line text itself, so exempt and dedupable rows
    never share a line value and the election partition stays pure.
    """
    occ = lines.withColumn("n_words", F.size(F.split(F.col("line"), " ")))
    dedupable = occ.where(F.col("n_words") >= min_words)
    firsts = dedupable.groupBy("line").agg(
        F.min(F.struct(F.col(id_col).alias("id"), F.col("line_no").alias("ln"))).alias(
            "first_occ"
        )
    )
    kept = (
        dedupable.join(firsts, "line")
        .where(
            (F.col("first_occ.id") == F.col(id_col))
            & (F.col("first_occ.ln") == F.col("line_no"))
        )
        .drop("first_occ")
    )
    return kept.unionByName(occ.where(F.col("n_words") < min_words)).drop("n_words")


def line_dedup_summary(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int | None = 3,
    min_words: int = 2,
) -> DataFrame:
    """Per-document dedup report:
    (id, n_lines, n_kept, n_dropped, dedup_md5) where dedup_md5 hashes
    the reassembled post-dedup text (surviving lines in original
    order, space-joined). A document that loses every line hashes the
    empty string rather than vanishing."""
    lines = chunk_lines(docs, id_col, text_col, words_per_line)
    kept = line_dedup(lines, id_col, min_words)
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    kept_agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                    lambda x: x["line"],
                ),
            )
        ).alias("dedup_md5"),
    )
    return (
        totals.join(kept_agg, id_col, "left")
        .select(
            F.col(id_col),
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_dropped"
            ),
            F.coalesce(F.col("dedup_md5"), F.md5(F.lit(""))).alias("dedup_md5"),
        )
    )


def domain_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    words_per_line: int = 2,
    min_frac: float = 0.2,
) -> DataFrame:
    """Per-domain boilerplate-line detection (the RefinedWeb/C4 site-level
    furniture rule: a line present on a large fraction of one domain's
    pages is template — nav, footer, cookie banner — not content; cf.
    Penedo et al. 2023 §3.2 line-wise filtering). Returns
    (domain, line, n_docs, doc_frac) for lines on >= min_frac of the
    domain's documents — the deletion list a cleaning pass anti-joins.

    Shape at 100 TB: presence (not frequency) per doc via array_distinct
    BEFORE the explode, so the aggregate is a plain map-side-combined
    count — no countDistinct expand. Both aggregates key on domain
    (+line), the natural partitioning of a by-site crawl; the per-domain
    doc-count dim joins on domain (left to AQE — domains are many at web
    scale, no forced broadcast). Mirrors the PDF extractor's repeated-
    furniture stripping (extract/pdf.py), same rule one level up.
    """
    if words_per_line < 1:
        raise ValueError("words_per_line must be >= 1")
    if not 0.0 < min_frac <= 1.0:
        raise ValueError(f"min_frac must be in (0, 1], got {min_frac}")
    pattern = r"\S+( \S+){0,%d}" % (words_per_line - 1)
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
            )
        ).alias("line"),
    )
    per_line = lines.groupBy("domain", "line").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    per_dom = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.countDistinct(F.col(id_col)).alias("dom_docs")
    )
    return (
        per_line.join(per_dom, "domain")
        .withColumn("doc_frac", F.round(F.col("n_docs") / F.col("dom_docs"), 6))
        .where(F.col("doc_frac") >= min_frac)
        .select("domain", "line", "n_docs", "doc_frac")
    )


PROSE_KINDS = ("text", "heading", "list", "blockquote")


def boilerplate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    domain_col: str = "domain",
    kinds: tuple = PROSE_KINDS,
    min_frac: float = 0.5,
    kind_field: str = "kind",
    text_field: str = "text",
) -> DataFrame:
    """Span-level deletion list for interleaved documents: (domain, text,
    n_docs, doc_frac) for prose spans whose exact text appears in
    >= min_frac of one domain's documents — domain_boilerplate's rule with
    the SPAN (the extractor's own unit) as the line, so what gets deleted
    is exactly what the serializer emitted, never a re-chunking of it.

    Shape at 100 TB: per-doc presence is computed INSIDE the row
    (filter -> transform -> array_distinct before the explode), so the
    groupBy(domain, text) is a plain map-side-combined count — a nav
    string on millions of pages shuffles one row per map task, not one
    per page. Media spans never enter the pipeline (kind filter precedes
    the explode).
    """
    if not 0.0 < min_frac <= 1.0:
        raise ValueError(f"min_frac must be in (0, 1], got {min_frac}")
    texts = F.array_distinct(
        F.transform(
            F.filter(
                F.col(spans_col),
                lambda s: s.getField(kind_field).isin(*kinds)
                & s.getField(text_field).isNotNull(),
            ),
            lambda s: s.getField(text_field),
        )
    )
    present = docs.select(
        F.col(domain_col).alias("domain"), F.explode(texts).alias("text")
    )
    per_span = present.groupBy("domain", "text").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    per_dom = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.countDistinct(F.col(id_col)).alias("dom_docs")
    )
    return (
        per_span.join(per_dom, "domain")
        .withColumn("doc_frac", F.round(F.col("n_docs") / F.col("dom_docs"), 6))
        .where(F.col("doc_frac") >= min_frac)
        .select("domain", "text", "n_docs", "doc_frac")
    )


def strip_boilerplate_spans(
    docs: DataFrame,
    boiler: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    domain_col: str = "domain",
    kinds: tuple = PROSE_KINDS,
    kind_field: str = "kind",
    text_field: str = "text",
    order_field: str = "order",
) -> DataFrame:
    """Remove the deletion-list spans from interleaved documents, keeping
    every media span and re-densifying span order: returns docs with the
    same (id, domain) rows and a rebuilt spans array where surviving spans
    are renumbered 0..n-1 in their original relative order. Only spans
    whose kind is in `kinds` can be dropped — a media span whose text is
    NULL (or a code span that happens to equal a deletion line) always
    survives.

    Shape at 100 TB: one posexplode, one equi-join keyed (domain, text)
    against the deletion list (bounded: only >= min_frac-of-domain lines;
    AQE broadcasts it while it fits), one groupBy(id) reassembly keyed by
    the document — the partitioning a by-site corpus already has. Docs
    whose spans were empty, NULL, or fully deleted come back with an
    empty array, never silently dropped.
    """
    span_type = docs.schema[spans_col].dataType.elementType
    names = [f.name for f in span_type.fields]
    for needed in (kind_field, text_field, order_field):
        if needed not in names:
            raise ValueError(f"span struct {names} lacks {needed!r}")

    mark = boiler.select(
        F.col("domain").alias("__bdom"),
        F.col("text").alias("__btext"),
        F.lit(True).alias("__boiler"),
    )
    pos = docs.select(
        F.col(id_col), F.col(domain_col), F.posexplode(spans_col)
    ).select(id_col, domain_col, "pos", F.col("col").alias("s"))
    kept = (
        pos.join(
            mark,
            (F.col(domain_col) == F.col("__bdom"))
            & (F.col("s").getField(text_field) == F.col("__btext")),
            "left",
        )
        .where(
            F.col("__boiler").isNull()
            | ~F.col("s").getField(kind_field).isin(*kinds)
        )
        .select(id_col, "pos", "s")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))),
            lambda x, i: F.struct(
                *[
                    (
                        i.cast(span_type[order_field].dataType.simpleString())
                        if name == order_field
                        else x.getField("s").getField(name)
                    ).alias(name)
                    for name in names
                ]
            ),
        ).alias("__spans")
    )
    empty = F.array().cast(docs.schema[spans_col].dataType.simpleString())
    return (
        docs.drop(spans_col)
        .join(rebuilt, id_col, "left")
        .withColumn(
            spans_col,
            F.when(F.col("__spans").isNotNull(), F.col("__spans")).otherwise(
                empty
            ),
        )
        .drop("__spans")
    )


SENTENCE_PATTERN = r"[^.!?]+[.!?]*"


def sentence_spans_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    pattern: str | None = None,
) -> DataFrame:
    """C4-style three-sentence-span duplicate detection (Raffel et al.
    2020 §2.2: "we discarded all but one of any three-sentence span
    occurring more than once in the data set"). This is the DETECTION
    list — (span_md5, n_occ, n_docs, first_doc) for every n-sentence
    window that occurs more than once corpus-wide; a cleaning pass
    anti-joins / first-occurrence-filters against it, exactly like
    ``domain_boilerplate``'s deletion list one granularity up.

    Sentence segmentation is a single ``regexp_extract_all`` with
    ``[^.!?]+[.!?]*`` — deliberately lookaround-free so the Spark (Java
    regex) and DuckDB (RE2) oracles segment identically. ``pattern``
    overrides the unit: the synthetic fixture corpus is punctuation-free
    bag-of-words (same reason ``line_dedup`` chunks by token count), so
    its query passes a fixed-width token-chunk pattern and the "span"
    becomes an n-chunk sliding window — the overlapping-window rule,
    which is C4's actual novelty over plain line dedup, is exercised
    either way. Windows are a within-row ``transform(sequence(...),
    slice(...))`` fold riding the scan: re-sentencing and window
    construction are a PURE MAP, no shuffle and no explode until the
    spans exist.

    Shape at 100 TB: the only shuffle is ONE groupBy on the 128-bit
    span hash (not the span text — shuffle bytes bounded at 32 hex
    chars/row regardless of sentence length), with map-side combine
    absorbing mega-duplicated boilerplate spans the same way
    ``line_dedup`` does: each map task emits one partial row per
    distinct span, so a million-copy cookie banner reaches the reducer
    as |map tasks| partials, never |occurrences| rows. ``n_docs`` uses
    count(DISTINCT id) — fine because the groupBy key is already the
    span hash (the expand is per-span, bounded by occurrence count;
    the pathological span is exactly the one you want counted).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    sents = _sentence_array(text_col, pattern)
    with_spans = (
        docs.select(F.col(id_col), sents.alias("__sents"))
        .where(F.size("__sents") >= n)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__sents") - (n - 1)),
                    lambda i: F.md5(
                        F.concat_ws("\n", F.slice("__sents", i, n))
                    ),
                )
            ).alias("span_md5"),
        )
    )
    return (
        with_spans.groupBy("span_md5")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct(F.col(id_col)).alias("n_docs"),
            F.min(F.col(id_col)).alias("first_doc"),
        )
        .where(F.col("n_occ") > 1)
    )


def _sentence_array(text_col: str, pattern: str | None):
    """Shared segmentation for the C4 span family: regexp_extract_all,
    trim, drop empties — a pure within-row expression."""
    return F.filter(
        F.transform(
            F.regexp_extract_all(
                F.col(text_col), F.lit(pattern or SENTENCE_PATTERN), F.lit(0)
            ),
            # unary lambda on purpose: a bare F.trim would accept
            # transform's (element, index) pair and become the
            # two-parameter TRIM(str, trimStr) — wrong and deprecated.
            lambda s: F.trim(s),
        ),
        lambda s: s != F.lit(""),
    )


def sentence_spans_apply(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    pattern: str | None = None,
) -> DataFrame:
    """The C4 §2.2 CLEANING pass that ``sentence_spans_dedup`` detects
    for: every n-sentence span occurring more than once corpus-wide
    keeps exactly its globally-first occurrence (ordered by
    (doc_id, start index)); the sentences covered by every OTHER
    occurrence are deleted and each document is reassembled from its
    surviving sentences. Overlap semantics are the natural ones: a
    sentence is dropped iff ANY removed window covers it, so
    overlapping duplicate windows union their coverage rather than
    double-deleting. Returns one row per input document —
    (id, n_sents, n_kept, n_dropped, out_md5) where out_md5 hashes the
    surviving sentences space-joined in original order (a doc that
    loses everything hashes '' rather than vanishing; a doc with
    < n sentences is untouched by construction).

    Shape at 100 TB, mirroring ``line_dedup`` one granularity up:
    window enumeration is a within-row fold riding the scan; the
    election is ONE groupBy on the 128-bit span hash with a map-side
    combined min(struct(doc, start)) — a million-copy boilerplate span
    reaches the reducer as |map tasks| partial rows; survivor marking
    re-joins on the same hash key (same partitioning — AQE reuses the
    exchange) and the filter to duplicated spans bounds the join's
    build side to actual duplicates; coverage expansion is a bounded
    explode (exactly n indices per removed occurrence); reassembly is
    one groupBy(doc) of integer indices, never of sentence text —
    the only strings shuffled anywhere are 32-hex-char hashes.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    base = docs.select(
        F.col(id_col), _sentence_array(text_col, pattern).alias("__sents")
    )
    wins = (
        base.where(F.size("__sents") >= n)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__sents") - (n - 1)),
                    lambda i: F.struct(
                        i.alias("start"),
                        F.md5(
                            F.concat_ws("\n", F.slice("__sents", i, n))
                        ).alias("span_md5"),
                    ),
                )
            ).alias("w"),
        )
        .select(id_col, F.col("w.start").alias("start"), "w.span_md5")
    )
    elect = wins.groupBy("span_md5").agg(
        F.count(F.lit(1)).alias("__n_occ"),
        F.min(
            F.struct(F.col(id_col).alias("d"), F.col("start").alias("i"))
        ).alias("__first"),
    ).where(F.col("__n_occ") > 1)
    dropped_idx = (
        wins.join(elect, "span_md5")
        .where(
            ~(
                (F.col("__first.d") == F.col(id_col))
                & (F.col("__first.i") == F.col("start"))
            )
        )
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (n - 1))
            ).alias("__di"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__di").alias("__drops"))
    )
    kept = F.filter(
        F.col("__sents"),
        # Spark's indexed lambda is 0-based; window starts are 1-based.
        lambda s, i: ~F.array_contains(
            F.coalesce(F.col("__drops"), F.array().cast("array<int>")),
            (i + F.lit(1)).cast("int"),
        ),
    )
    return (
        base.join(dropped_idx, id_col, "left")
        .select(
            F.col(id_col),
            F.size("__sents").cast("long").alias("n_sents"),
            F.size(kept).cast("long").alias("n_kept"),
            (F.size("__sents") - F.size(kept)).cast("long").alias("n_dropped"),
            F.md5(F.concat_ws(" ", kept)).alias("out_md5"),
        )
    )
