"""Interleaved text+media (axis-B) queries: span-level extraction
contracts, caption/alignment profiling, media near-dup, PII redaction,
VLM rendering, packing. Factored out of __spark_entry__.py verbatim
(VERDICT r4 #7: keep the entry file a reviewable registry); oracles
live in reader_spark/oracles.py under the same keys."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _interleaved_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared builder for the interleaved-media queries: wrap every corpus
    doc with a deterministically-placed image (doc_id%3==0: hero image
    between heading and body; %3==1: trailing image; %3==2: none), run the
    COMPLETE extraction engine, return the exploded span rows
    (doc_id, ord, kind, text, media_ref)."""
    from reader_spark.spark.job import extract_dataframe

    documents = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    hero = F.concat(
        F.lit('<img src="https://img.test/'), d,
        F.lit('/hero.png" alt="hero '), d, F.lit('">'),
    )
    tail = F.concat(
        F.lit('<img src="https://img.test/'), d,
        F.lit('/tail.png" alt="tail '), d, F.lit('">'),
    )
    payload = F.concat(
        F.lit("<html><body><main><article><h1>Document "), d, F.lit("</h1>"),
        F.when(F.col("doc_id") % 3 == 0, hero).otherwise(F.lit("")),
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        F.when(F.col("doc_id") % 3 == 1, tail).otherwise(F.lit("")),
        F.lit("</article></main></body></html>"),
    )
    docs = documents.select(
        d.alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                payload.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    return (
        extract_dataframe(docs)
        .select("doc_id", F.explode("spans").alias("s"))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("s.order").alias("ord"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )


def _q_interleaved_media_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interleaved text+media payload axis under a full value oracle:
    deterministically image-wrapped corpus docs through the COMPLETE
    extraction engine (see _interleaved_spans). The span sequence —
    heading/image/text kinds, media_ref capture, interleave ORDER — is
    SQL-predictable, so image-span handling gets a corpus-scale oracle
    row, not only golden fixtures."""
    return _interleaved_spans(spark, sf_dir)


def _q_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP/OBELICS-style image-text pair mining over the interleaved
    extraction (ops.multimodal.caption_pairs): each image span paired
    with its nearest preceding/following text spans in document order;
    caption prefers the following span. Per-doc windows — one key-bounded
    exchange, no media bytes in flight."""
    from reader_spark.ops.multimodal import caption_pairs

    return caption_pairs(_interleaved_spans(spark, sf_dir))


def _q_caption_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score-shaped image-text alignment filter over the interleaved
    extraction (ops.multimodal.caption_alignment_scores): every mined
    (image, caption) pair scored by cosine between an exact-integer
    feature-hash text tower and a deterministic md5 surrogate image tower
    (the documented stand-in for a Pandas-UDF CLIP encoder — identical
    plumbing, no vision model in the sandbox), keep = score >= 0.3 (78 of
    334 pairs at sf0.01); captions truncate to CLIP's 77-token context
    before hashing. One token-hash groupBy keyed by (doc, ord);
    media bytes never move."""
    from reader_spark.ops.multimodal import caption_alignment_scores, caption_pairs

    pairs = caption_pairs(_interleaved_spans(spark, sf_dir))
    return caption_alignment_scores(pairs, dim=8, threshold=0.3)


def _q_interleave_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document interleaving shape over the interleaved extraction
    (ops.multimodal.interleave_profile): span counts by class, text<->
    media switch count, first media position, media ratio — the packing
    and mix signal for multimodal training."""
    from reader_spark.ops.multimodal import interleave_profile

    return interleave_profile(_interleaved_spans(spark, sf_dir))


def _q_span_langid_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level language ID rolled into a per-doc code-switching profile
    over the interleaved extraction (ops.multimodal.span_language_profile):
    every heading scores en=fr=1 on the trigram battery (tie -> 'fr'), so
    non-French docs profile as 2-language with one switch — a non-vacuous
    mix/dominance/switch signal at corpus scale. Detection is scan-bound;
    both aggs and the adjacency window key on doc_id."""
    from reader_spark.ops.multimodal import span_language_profile

    return span_language_profile(_interleaved_spans(spark, sf_dir))


def _q_template_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-skeleton template detection over the interleaved extraction
    (ops.multimodal.template_clusters): docs grouped by the md5 of their
    ordered span-kind sequence — the boilerplate-site-template signal
    text dedup can't see. The fixture's three deterministic shapes
    (hero / trailing / no image) come back as exactly three clusters
    with doc_id%3 populations."""
    from reader_spark.ops.multimodal import template_clusters

    return template_clusters(_interleaved_spans(spark, sf_dir))


def _q_media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over decoded thumbnails (ops.multimodal.
    phash_neardup): average-hash halves + lossless 4x16 band equi-join at
    hamming <= 3. Fixture: the 64-dim embeddings stand in as 8x8 decoder
    output, with planted re-encode twins (every 20th vector, dim-0
    scaled 1.5x) — the oracle brute-forces all pairs, proving the banded
    path lossless."""
    from reader_spark.ops.multimodal import phash_neardup

    emb = _read(spark, sf_dir, "embeddings")
    orig = F.transform("embedding", lambda x: x.cast("double"))
    twin = F.transform(
        "embedding",
        lambda x, i: F.when(i == 0, x.cast("double") * 1.5).otherwise(
            x.cast("double")
        ),
    )
    # conditional explode instead of a union: Spark 4's Union constraint
    # rewrite trips over lambda-derived columns (key not found: thumb#N)
    variants = F.when(
        F.col("vec_id") % 20 == 0,
        F.array(
            F.struct(F.col("vec_id").alias("media_id"), orig.alias("thumb")),
            F.struct(
                (F.col("vec_id") + 100000).alias("media_id"),
                twin.alias("thumb"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(F.col("vec_id").alias("media_id"), orig.alias("thumb"))
        )
    )
    thumbs = emb.select(F.explode(variants).alias("v")).select(
        "v.media_id", "v.thumb"
    )
    return phash_neardup(thumbs, "media_id", "thumb", max_hamming=3)


def _q_interleaved_sample_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VLM training-sample serialization with a context budget
    (ops.multimodal.truncate_spans_to_budget -> render_interleaved_sample):
    spans are cut at span boundaries to a 600-token budget (media cost
    576 = CLIP ViT-L/14 @336 patches, so image docs usually shed their
    body), then rendered to the LLaVA/OBELICS sample shape — text joined
    by blank lines, media spans as indexed <image_k> placeholders, refs
    in placeholder order. Budget math, cut point, placeholder text, and
    ref list are all value-oracled."""
    from reader_spark.ops.multimodal import (
        render_interleaved_sample,
        truncate_spans_to_budget,
    )

    raw = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    nul = F.lit(None).cast("string")
    head = F.struct(
        F.lit("heading").alias("kind"),
        F.concat(F.lit("Doc "), d).alias("text"),
        nul.alias("media_ref"), F.lit(0).alias("order"),
    )
    img = F.struct(
        F.lit("image").alias("kind"), nul.alias("text"),
        F.concat(F.lit("https://img.test/"), d, F.lit("/x.png")).alias(
            "media_ref"
        ),
        F.lit(0).alias("order"),
    )
    body = F.struct(
        F.lit("text").alias("kind"), F.col("text").alias("text"),
        nul.alias("media_ref"), F.lit(0).alias("order"),
    )
    maybe_img = F.when(F.col("doc_id") % 3 == 0, F.array(img)).otherwise(
        F.slice(F.array(img), 1, 0)
    )
    spans = F.transform(
        F.concat(F.array(head), maybe_img, F.array(body)),
        lambda s, i: F.struct(
            s.getField("kind").alias("kind"),
            s.getField("text").alias("text"),
            s.getField("media_ref").alias("media_ref"),
            i.cast("int").alias("order"),
        ),
    )
    docs = raw.select(
        F.col("doc_id").cast("long").alias("doc_id"), spans.alias("spans")
    )
    out = render_interleaved_sample(
        truncate_spans_to_budget(docs, budget=600, media_cost=576)
    )
    return out.select(
        "doc_id", "n_spans_kept", "n_spans_dropped", "cost_kept", "sample",
        F.concat_ws("|", "media_refs").alias("refs"), "n_media",
    )


def _q_span_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level site-furniture removal on interleaved documents
    (ops.lines.boilerplate_spans -> strip_boilerplate_spans): a planted
    per-domain subscription span sits in 100% of each source's docs, the
    detector flags it at min_frac=0.5, the strip deletes it, keeps every
    media span, and re-densifies span order. The oracle states the exact
    expected surviving span sequence — detection, deletion, and
    renumbering are all value-checked at corpus scale."""
    from reader_spark.ops.lines import boilerplate_spans, strip_boilerplate_spans

    raw = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    nul = F.lit(None).cast("string")
    head = F.struct(
        F.lit("heading").alias("kind"),
        F.concat(F.lit("Doc "), d).alias("text"),
        nul.alias("media_ref"), F.lit(0).alias("order"),
    )
    boil = F.struct(
        F.lit("text").alias("kind"),
        F.concat(
            F.lit("Subscribe to the "), F.col("source"),
            F.lit(" weekly digest"),
        ).alias("text"),
        nul.alias("media_ref"), F.lit(0).alias("order"),
    )
    img = F.struct(
        F.lit("image").alias("kind"), nul.alias("text"),
        F.concat(F.lit("https://img.test/"), d, F.lit("/x.png")).alias(
            "media_ref"
        ),
        F.lit(0).alias("order"),
    )
    body = F.struct(
        F.lit("text").alias("kind"), F.col("text").alias("text"),
        nul.alias("media_ref"), F.lit(0).alias("order"),
    )
    maybe_img = F.when(F.col("doc_id") % 3 == 0, F.array(img)).otherwise(
        F.slice(F.array(img), 1, 0)
    )
    spans = F.transform(
        F.concat(F.array(head, boil), maybe_img, F.array(body)),
        lambda s, i: F.struct(
            s.getField("kind").alias("kind"),
            s.getField("text").alias("text"),
            s.getField("media_ref").alias("media_ref"),
            i.cast("int").alias("order"),
        ),
    )
    docs = raw.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source"),
        spans.alias("spans"),
    )
    boiler = boilerplate_spans(docs, domain_col="source", min_frac=0.5)
    stripped = strip_boilerplate_spans(docs, boiler, domain_col="source")
    return (
        stripped.select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.order").alias("ord"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )


def _q_interleaved_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level PII redaction on interleaved documents (ops.multimodal.
    redact_spans): prose spans are masked in place (<EMAIL>/<IP>/<PHONE>),
    image spans and span order pass through byte-identical — the array is
    never exploded inside the op (pure per-row transform, no shuffle).
    Fixture: corpus docs assembled into heading/[hero image]/text span
    arrays with planted email+IP in the text span."""
    from reader_spark.ops.multimodal import redact_spans

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    planted = F.concat(
        F.col("text"),
        F.lit(" Contact user"), d, F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".9 now"),
    )
    nul = F.lit(None).cast("string")
    head = F.struct(
        F.lit("heading").alias("kind"),
        F.concat(F.lit("Doc "), d).alias("text"),
        nul.alias("media_ref"), F.lit(0).alias("offset"),
    )
    img = F.struct(
        F.lit("image").alias("kind"), nul.alias("text"),
        F.concat(F.lit("https://img.test/"), d, F.lit("/hero.png")).alias(
            "media_ref"
        ),
        F.lit(0).alias("offset"),
    )
    body = F.struct(
        F.lit("text").alias("kind"), planted.alias("text"),
        nul.alias("media_ref"), F.lit(0).alias("offset"),
    )
    # typed empty array via zero-length slice (F.array() is untyped)
    maybe_img = F.when(F.col("doc_id") % 3 == 0, F.array(img)).otherwise(
        F.slice(F.array(img), 1, 0)
    )
    spans = F.transform(  # dense offsets after assembly
        F.concat(F.array(head), maybe_img, F.array(body)),
        lambda s, i: F.struct(
            s.getField("kind").alias("kind"),
            s.getField("text").alias("text"),
            s.getField("media_ref").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    assembled = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), spans.alias("spans")
    )
    return (
        redact_spans(assembled)
        .select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.offset").alias("ord"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )


def _q_audio_hk_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs over decoded band-energy frames (ops.audio.
    audio_neardup, Haitsma-Kalker ISMIR'02 fingerprint): sign-of-energy-
    difference bits -> per-frame hashes -> lossless pigeonhole band join
    at <=1 mismatching frame-hash. Fixture: the 64-dim embeddings stand in
    as 8 frames x 8 bands of decoder output, with planted re-encode twins
    (every 25th clip, E(0,0) shifted +7.5 — touches only frame-hash 0, so
    a twin is always within tolerance). The oracle brute-forces all pairs,
    proving the banded candidate path lossless."""
    from reader_spark.ops.audio import audio_neardup

    emb = _read(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    perturbed = F.transform(
        "embedding",
        lambda x, i: F.when(i == 0, x.cast("double") + 7.5).otherwise(
            x.cast("double")
        ),
    )
    variants = F.when(
        F.col("vec_id") % 25 == 0,
        F.array(
            F.struct(F.col("vec_id").alias("media_id"), as_double.alias("e")),
            F.struct(
                (F.col("vec_id") + 100000).alias("media_id"),
                perturbed.alias("e"),
            ),
        ),
    ).otherwise(
        F.array(F.struct(F.col("vec_id").alias("media_id"), as_double.alias("e")))
    )
    clips = emb.select(F.explode(variants).alias("v")).select(
        "v.media_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda f: F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda b: F.element_at(F.col("v.e"), (f * 8 + b + 1).cast("int")),
            ),
        ).alias("frames"),
    )
    return audio_neardup(
        clips, "media_id", "frames", n_frames=8, n_bands=8, max_mismatch=1
    )


def _q_remove_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al. substring dedup APPLIED (ops.substring.
    remove_duplicate_spans): every later occurrence of a >=20-token
    repeated substring is cut from the text, the corpus-global first
    copy survives, every doc stays in the output. hashed=False is the
    raw-text oracle twin (production hashes windows to xxhash64)."""
    from reader_spark.ops.substring import remove_duplicate_spans

    docs = _read(spark, sf_dir, "documents")
    return remove_duplicate_spans(
        docs, "doc_id", "text", min_tokens=20, hashed=False
    )


def _q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5 span corruption (ops.chunks.span_corruption,
    block=20/span=3 = 15% mask rate): every full 20-token window masks a
    3-token run at an md5(doc_id, window)-derived offset behind an
    <extra_id_N> sentinel; targets carry the masked spans. Pure per-row
    map, reproducible across executors and resumes with no RNG state."""
    from reader_spark.ops.chunks import span_corruption

    docs = _read(spark, sf_dir, "documents")
    return span_corruption(docs, "doc_id", "text", block=20, span=3)


def _q_multimodal_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing of INTERLEAVED docs (ops.packing.pack_by_cost
    over the interleaved extraction): each doc's footprint = text-span
    whitespace tokens + 64 visual tokens per image span (LLaVA-style
    fixed patch budget), packed concat-then-chunk into 512-token
    sequences. The multimodal twin of sequence_packing — images charge
    the budget without being whitespace-countable."""
    from reader_spark.ops.packing import pack_by_cost
    from reader_spark.ops.textstats import token_count_col

    spans = _interleaved_spans(spark, sf_dir)
    cost = spans.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("kind") == "image", F.lit(64)).otherwise(
                token_count_col(F.col("text"))
            )
        )
        .cast("long")
        .alias("cost")
    )
    return pack_by_cost(cost, "doc_id", "cost", seq_len=512)


def _q_span_kinds_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL M1 span-kind contract under one corpus-scale oracle:
    every doc wrapped with a deterministic page exercising heading, text,
    list_item (x2), code, table, and inline-link serialization — 7 spans
    per doc, every kind's markdown form and ORDER SQL-predictable. The
    golden fixtures pin edge cases; this pins the whole-kind surface at
    500 docs through the real engine."""
    from reader_spark.spark.job import extract_dataframe

    documents = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    payload = F.concat(
        F.lit("<html><body><main><article><h1>Document "), d, F.lit("</h1>"),
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        F.lit("<ul><li>item "), d, F.lit(" a</li><li>item "), d, F.lit(" b</li></ul>"),
        F.lit("<pre><code>call("), d, F.lit(")</code></pre>"),
        F.lit("<table><tr><th>k</th><th>v</th></tr><tr><td>"), d,
        F.lit("</td><td>"), F.col("source"), F.lit("</td></tr></table>"),
        F.lit('<p>See <a href="https://ref.test/'), d,
        F.lit('">spec '), d, F.lit("</a> end.</p>"),
        F.lit("</article></main></body></html>"),
    )
    docs = documents.select(
        d.alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                payload.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    return (
        extract_dataframe(docs)
        .select("doc_id", F.explode("spans").alias("s"))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("s.order").alias("ord"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
        )
    )

def _q_table_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML table → GFM markdown → structured cells, end to end through
    the real engine (extract_dataframe → table span → ops.tables.
    table_cells): every doc wrapped with one 3-column table whose last
    row is RAGGED (2 cells, padded at serialization) and whose first
    data cell contains a PIPE (escaped to \\| in markdown, unescaped by
    the cell parser) — cell-level certification of the table contract
    span_kinds_full pins only as one markdown blob. The oracle
    constructs the expected cells directly from the documents table.
    Both explodes are pure maps; no shuffle anywhere."""
    from reader_spark.ops.tables import table_cells
    from reader_spark.spark.job import extract_dataframe

    documents = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    payload = F.concat(
        F.lit("<html><body><article><table>"),
        F.lit("<tr><th>k</th><th>v</th><th>n</th></tr>"),
        F.lit("<tr><td>"), d,
        F.lit("</td><td>"), F.col("source"),
        F.lit("</td><td>"), F.col("lang"), F.lit("</td></tr>"),
        F.lit("<tr><td>p|q"), d,
        F.lit("</td><td>"), F.col("n_chars").cast("string"),
        F.lit("</td></tr>"),
        F.lit("</table></article></body></html>"),
    )
    docs = documents.select(
        d.alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                payload.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    tables = (
        extract_dataframe(docs)
        .select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "table")
        .select(F.col("doc_id"), F.col("s.text").alias("text"))
    )
    return table_cells(tables).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "row_idx",
        "col_idx",
        "cell",
    )

def _nested_heading_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared fixture for the outline family: every doc wrapped with a
    nested h1 > h2 > h3 / h2 page, run through the REAL engine
    (extract_dataframe), returned as (doc_id, ord, text) span rows."""
    from reader_spark.spark.job import extract_dataframe

    documents = _read(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    payload = F.concat(
        F.lit("<html><body><article><h1>Doc "), d, F.lit("</h1>"),
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        F.lit("<h2>Part A "), d, F.lit("</h2><p>alpha body</p>"),
        F.lit("<h3>Sub "), d, F.lit("</h3><p>beta body</p>"),
        F.lit("<h2>Part B "), d, F.lit("</h2><p>gamma body</p>"),
        F.lit("</article></body></html>"),
    )
    docs = documents.select(
        d.alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                payload.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    return (
        extract_dataframe(docs)
        .select("doc_id", F.explode("spans").alias("s"))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("s.order").alias("ord"),
            F.col("s.text").alias("text"),
        )
    )


def _q_outline_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document outline (ops.outline.outline_edges): heading-hierarchy
    edges from real extraction output over the nested-heading fixture.
    Parent search uses the bounded ATX level domain: six fixed
    last()-window columns per doc partition, greatest of the shallower
    ones — no recursion. The oracle constructs the expected edges
    directly."""
    from reader_spark.ops.outline import outline_edges

    return outline_edges(_nested_heading_spans(spark, sf_dir))


def _q_section_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Section-labelled chunks (ops.outline.section_of_spans): every
    non-heading span leaves with its governing heading's (ord, level,
    title) — the RAG-chunk product over the same nested-heading
    fixture; text is md5'd to keep rows bounded. One doc-partitioned
    window; the labels ride the heading rows the filter then drops."""
    from reader_spark.ops.outline import section_of_spans

    out = section_of_spans(_nested_heading_spans(spark, sf_dir))
    return out.select(
        "doc_id",
        "ord",
        "section_ord",
        "section_level",
        "section_title",
        F.md5(F.col("text")).alias("text_md5"),
    )

def _q_ligature_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF ligature folding (spark/columns.fold_ligatures_col): the
    seven Latin presentation-form ligatures (U+FB00..FB06) replaced by
    their letter sequences — the targeted slice of NFKC a PDF text
    pipeline wants without NFKC's other transforms. Every third doc is
    decorated with three ligature forms; the fold is a literal-replace
    chain riding the scan (no regex, no Python, no shuffle)."""
    from reader_spark.spark.columns import fold_ligatures_col

    docs = _read(spark, sf_dir, "documents")
    decorated = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit("ﬁrst "), F.col("text"), F.lit(" ﬂow ﬃx")),
    ).otherwise(F.col("text"))
    folded = fold_ligatures_col(decorated)
    return docs.select(
        "doc_id",
        F.length(decorated).cast("long").alias("len_raw"),
        F.length(folded).cast("long").alias("len_folded"),
        F.md5(folded).alias("folded_md5"),
    )

def _q_typography_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typographic normalization (spark/columns.fold_typography_col):
    curly quotes, en/em dashes, ellipsis and nbsp folded to ASCII —
    standard pre-dedup normalization so byte-different typography
    hashes together. Every second doc decorated with all eight forms;
    literal-replace chain, scan-bound."""
    from reader_spark.spark.columns import fold_typography_col

    docs = _read(spark, sf_dir, "documents")
    decorated = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("\u201cstart\u201d \u2018q\u2019 a\u2013b c\u2014d e\u2026 f\u00a0g "),
            F.col("text"),
        ),
    ).otherwise(F.col("text"))
    folded = fold_typography_col(decorated)
    return docs.select(
        "doc_id",
        F.length(decorated).cast("long").alias("len_raw"),
        F.length(folded).cast("long").alias("len_folded"),
        F.md5(folded).alias("folded_md5"),
    )
