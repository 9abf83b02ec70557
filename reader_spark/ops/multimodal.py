"""Multimodal columns: image/audio/video as opaque BINARY columns with typed
metadata, processed by Arrow-batched mapInPandas stages.

The Spark-side plumbing (schemas, batch shape, partitioning, UDF signatures)
is real and tested; the codec step itself is STUBBED — this container ships
no image/audio libraries — behind `_decode_image_stub`, a deterministic fake
that derives pixel statistics from the bytes. Swapping in Pillow/ffmpeg is a
one-function change per modality; nothing upstream or downstream moves.

Scale notes: media rows are orders of magnitude wider than text rows — the
same giant-handling rules apply (byte-capped Arrow batches from the session
factory; isolate-style splits for heavy tails). Feature extraction emits
NARROW rows (id + features), so the wide binary never crosses a shuffle:
decode -> featurize happens within one mapInPandas stage, and only features
flow on.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, sha256 string, n_bytes long, "
    "mean_byte double, entropy_proxy double, thumb_8x8 array<int>"
)


def _decode_image_stub(content: bytes) -> list[int]:
    """STUB decode: a real implementation would be
    `np.asarray(PIL.Image.open(io.BytesIO(content)).resize((8, 8)))`.
    The deterministic fake derives an 8x8 'thumbnail' from a SHA-256 stream
    over the bytes so tests pin exact values without a codec library."""
    digest = hashlib.sha256(content).digest()
    doubled = (digest * 2)[:64]
    return list(doubled)


def image_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: binary image column -> narrow feature rows."""
    for batch in batches:
        out = {
            "media_id": [],
            "sha256": [],
            "n_bytes": [],
            "mean_byte": [],
            "entropy_proxy": [],
            "thumb_8x8": [],
        }
        for media_id, content in zip(batch["media_id"], batch["content"]):
            data = bytes(content) if content is not None else b""
            thumb = _decode_image_stub(data)
            out["media_id"].append(media_id)
            out["sha256"].append(hashlib.sha256(data).hexdigest())
            out["n_bytes"].append(len(data))
            out["mean_byte"].append(
                round(sum(data) / len(data), 4) if data else 0.0
            )
            out["entropy_proxy"].append(
                round(len(set(data)) / 256.0, 4) if data else 0.0
            )
            out["thumb_8x8"].append(thumb)
        yield pd.DataFrame(out)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Featurize image rows: narrow projection BEFORE the UDF (only
    media_id + content cross into Python), narrow rows after."""
    images = media.where(F.col("kind") == "image").select("media_id", "content")
    return images.mapInPandas(image_features, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one row per (media_id, frame_ts_ms) from
    the typed metadata — fully native (sequence/explode), no decode. The
    decode of each planned frame is the stubbed modality step."""
    videos = media.where(F.col("kind") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)).cast("long"),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )


def decode_frame(content: bytes, ts_ms: int) -> bytes:
    """Video frame decode — genuinely unavailable in this container."""
    raise NotImplementedError(
        "frame decode requires an ffmpeg binding; wire it here — the "
        "surrounding plan/partitioning/feature plumbing is codec-agnostic"
    )


# magic-byte prefixes, checked longest-first (hex, uppercase)
MAGIC_PREFIXES = (
    ("png", "89504E470D0A1A0A"),
    ("jpeg", "FFD8FF"),
    ("gif", "47494638"),
    ("riff", "52494646"),  # WAV/AVI/WEBP container
    ("pdf", "25504446"),
)


def sniff_kind_col(content):
    """Content-type sniffing from magic bytes — the ingest-side guard a
    multimodal pipeline needs because extensions and Content-Type headers
    lie at web scale (cf. WHATWG MIME sniffing). Pure JVM expression:
    hex the first 16 bytes once, then prefix-match; ISO-BMFF (mp4/mov)
    matches 'ftyp' at byte offset 5. Returns a lowercase kind string,
    'unknown' when nothing matches."""
    from pyspark.sql import functions as F

    head = F.hex(F.substring(content, 1, 16))
    expr = F.when(
        F.substring(head, 9, 8) == "66747970", F.lit("mp4")  # ....ftyp
    )
    for kind, prefix in MAGIC_PREFIXES:
        expr = expr.when(head.startswith(prefix), F.lit(kind))
    return expr.otherwise(F.lit("unknown"))


def media_dedup(
    media,
    id_col: str = "media_id",
    content_col: str = "content",
    portable: bool = False,
):
    """Exact byte-level dedup of media blobs — the multimodal twin of
    ops.dedup.exact_dedup. The same image/audio payload recurs massively
    at web scale (logos, tracking pixels, CDN-mirrored assets); hashing
    the BYTES collapses them regardless of URL or surrounding document.

    One shuffle on the content digest (never the blobs themselves — the
    projection drops the binary before the exchange, so a 100 TB media
    column moves 16-byte digests). Returns one row per distinct payload:
    (content_hash, keeper_id, n_copies, n_bytes) with keeper = min id and
    kind sniffed from magic bytes (see sniff_kind_col).

    portable=True uses md5 hex (byte-identical in DuckDB over BLOBs) so
    the whole result is oracle-checkable; production uses xxhash64.
    """
    from pyspark.sql import functions as F

    content = F.col(content_col)
    # portable digest goes md5(hex(bytes)) because ANSI engines' md5 is
    # VARCHAR-only (DuckDB rejects BLOB); hex() is uppercase in both
    digest = (
        F.md5(F.hex(content))
        if portable
        else F.xxhash64(content).cast("string")
    )
    return (
        media.select(
            F.col(id_col).alias("__id"),
            digest.alias("content_hash"),
            F.octet_length(content).cast("long").alias("__bytes"),
            sniff_kind_col(content).alias("__kind"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("__id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.first("__bytes").alias("n_bytes"),
            F.first("__kind").alias("kind"),
        )
    )


def caption_pairs(
    spans: DataFrame,
    id_col: str = "doc_id",
    ord_col: str = "ord",
    kind_col: str = "kind",
    text_col: str = "text",
    ref_col: str = "media_ref",
    media_kind: str = "image",
    text_kinds: tuple[str, ...] = ("text", "heading"),
) -> DataFrame:
    """Image-text pair mining from interleaved span sequences (the
    CLIP/OBELICS prep step: every media span paired with its nearest
    textual neighbors in document order; cf. the reference's interleaved
    text+image span output, src/formatters/markdown span ordering).

    Returns one row per media span: (id, ord, media_ref, text_before,
    text_after, caption) where caption prefers the FOLLOWING text span
    (figure captions conventionally follow the figure) and falls back to
    the preceding one. Windows partition by document — the shuffle is
    one key-bounded exchange on doc id, nothing global, and only span
    TEXT moves (no media bytes)."""
    from pyspark.sql import Window

    txt = F.when(F.col(kind_col).isin(*text_kinds), F.col(text_col))
    w = Window.partitionBy(id_col).orderBy(ord_col)
    before = F.last(txt, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    # "first following" via a REVERSE-ordered running frame: a
    # (1, unboundedFollowing) frame is O(n²) per partition (the tail is
    # re-scanned for every row — 73 s of the vlm_prep bench wall on the
    # heavy-tail corpus), while a running (unboundedPreceding, -1)
    # frame is incremental O(n). Identical values: the last non-null
    # before the current row in DESC span order IS the first non-null
    # after it in ASC order (ord is unique per doc).
    w_rev = Window.partitionBy(id_col).orderBy(F.desc(ord_col))
    after = F.last(txt, ignorenulls=True).over(
        w_rev.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        spans.select(
            id_col,
            ord_col,
            kind_col,
            ref_col,
            before.alias("text_before"),
            after.alias("text_after"),
        )
        .where(F.col(kind_col) == media_kind)
        .select(
            id_col,
            ord_col,
            ref_col,
            "text_before",
            "text_after",
            F.coalesce(F.col("text_after"), F.col("text_before")).alias(
                "caption"
            ),
        )
    )


def interleave_profile(
    spans: DataFrame,
    id_col: str = "doc_id",
    ord_col: str = "ord",
    kind_col: str = "kind",
    media_kinds: tuple[str, ...] = ("image", "video", "audio"),
) -> DataFrame:
    """Per-document interleaving shape: span counts by class, modality
    switches (text<->media transitions in span order), and the first
    media position — the mix/packing signal for multimodal training
    (how media-dense a doc is, and whether media leads or trails).

    One pass: a per-doc lag window (key-bounded exchange on doc id) and
    one groupBy. media_ratio is exact (round-6 ratio of integers)."""
    from pyspark.sql import Window

    is_media = F.col(kind_col).isin(*media_kinds).cast("int")
    w = Window.partitionBy(id_col).orderBy(ord_col)
    prev = F.lag(is_media).over(w)
    tagged = spans.select(
        F.col(id_col),
        F.col(ord_col),
        is_media.alias("__m"),
        F.when(prev.isNull(), F.lit(0))
        .otherwise((is_media != prev).cast("int"))
        .alias("__switch"),
    )
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("__m").cast("long").alias("n_media"),
        (F.count(F.lit(1)) - F.sum("__m")).cast("long").alias("n_text"),
        F.sum("__switch").cast("long").alias("n_switches"),
        F.min(F.when(F.col("__m") == 1, F.col(ord_col)))
        .cast("long")
        .alias("first_media_ord"),
        F.round(F.sum("__m") / F.count(F.lit(1)), 6).alias("media_ratio"),
    )


def avg_hash_cols(pixels) -> "tuple[F.Column, F.Column]":
    """64-bit average perceptual hash of a 64-element (8x8 row-major)
    decoded-thumbnail array, as TWO 32-bit halves in longs — bit i is set
    when pixel i exceeds the thumbnail mean. Halves avoid the sign games
    of a packed 64-bit value (1<<63 overflows checked engines and
    arithmetic shifts sign-extend). Sequential left-fold mean keeps the
    threshold bit-identical across engines."""
    n = F.size(pixels)
    mu = F.aggregate(pixels, F.lit(0.0), lambda a, x: a + x) / n

    def _half(lo_bit: int) -> F.Column:
        # left fold acc*2 + bit builds the half MSB-first with no shift
        # (F.shiftleft takes only a literal bit count)
        return F.aggregate(
            F.sequence(F.lit(lo_bit), F.lit(lo_bit + 31)),
            F.lit(0).cast("long"),
            lambda acc, i: acc * 2
            + F.when(F.element_at(pixels, i + 1) > mu, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long"),
        )

    return _half(0), _half(32)


def phash_neardup(
    media: DataFrame,
    id_col: str = "media_id",
    pixels_col: str = "thumb_8x8",
    max_hamming: int = 3,
) -> DataFrame:
    """Perceptual near-duplicate pairs over decoded thumbnails — the
    post-decode half of image dedup (media_dedup catches byte-identical
    copies; re-encoded/resized variants need a perceptual hash; cf.
    average-hash/pHash practice in web-scale image pipelines). Input is
    the 8x8 pixel array a real decoder emits (extract_image_features'
    thumb_8x8 column).

    Candidates come from a 4x16-bit band equi-join — LOSSLESS for
    max_hamming <= 3 by pigeonhole (<=3 differing bits cannot touch all
    4 bands) — then the exact hamming check keeps true pairs. No
    all-pairs product anywhere; at 100 TB only (id, two longs) shuffle.

    Returns (id_a, id_b, hamming), id_a < id_b, one row per pair.
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming must be in [0, 3] (4x16 bands are lossless only "
            f"there), got {max_hamming}"
        )
    hi, lo = avg_hash_cols(F.col(pixels_col))
    hashes = media.select(
        F.col(id_col).alias("__id"), hi.alias("__hi"), lo.alias("__lo")
    )
    bands = hashes.select(
        "__id",
        "__hi",
        "__lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("bk"),
                        F.shiftright(c, s).bitwiseAND(F.lit(65535)).alias("bv"),
                    )
                    for k, (c, s) in enumerate(
                        [
                            (F.col("__hi"), 16),
                            (F.col("__hi"), 0),
                            (F.col("__lo"), 16),
                            (F.col("__lo"), 0),
                        ]
                    )
                ]
            )
        ).alias("b"),
    ).select("__id", "__hi", "__lo", "b.bk", "b.bv")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            (
                F.bit_count(F.col("a.__hi").bitwiseXOR(F.col("b.__hi")))
                + F.bit_count(F.col("a.__lo").bitwiseXOR(F.col("b.__lo")))
            ).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return cand


def redact_spans(
    docs: DataFrame,
    spans_col: str = "spans",
    kinds: tuple = ("text", "heading", "list", "blockquote"),
    kind_field: str = "kind",
    text_field: str = "text",
) -> DataFrame:
    """PII-redact the prose spans of interleaved documents IN PLACE: the
    span array keeps its exact length, order, and every non-text field
    (media_ref, offset/order), only the text of spans whose kind is in
    `kinds` is rewritten through textstats.mask_pii_col (<EMAIL>/<IP>/
    <PHONE>). Media/code spans pass through byte-identical, so
    span-sequence equality with the reference is preserved for everything
    the redaction doesn't own.

    Scale shape: a pure per-row transform over array<struct> — no explode,
    no shuffle, no Python; at 100 TB this rewrites the payload column
    during the scan it rides on. Schema-generic: the struct fields are
    read from the DataFrame schema, so it works on both the input span
    shape (offset) and the extracted shape (order).
    """
    from reader_spark.ops.textstats import mask_pii_col

    span_type = docs.schema[spans_col].dataType.elementType
    names = [f.name for f in span_type.fields]
    if kind_field not in names or text_field not in names:
        raise ValueError(
            f"span struct {names} lacks {kind_field!r}/{text_field!r}"
        )

    def rebuild(s):
        cols = []
        for name in names:
            c = s.getField(name)
            if name == text_field:
                c = F.when(
                    s.getField(kind_field).isin(*kinds), mask_pii_col(c)
                ).otherwise(c)
            cols.append(c.alias(name))
        return F.struct(*cols)

    return docs.withColumn(
        spans_col, F.transform(F.col(spans_col), rebuild)
    )


MEDIA_KINDS = ("image", "video", "audio")


def truncate_spans_to_budget(
    docs: DataFrame,
    budget: int,
    spans_col: str = "spans",
    media_cost: int = 576,
    media_kinds: tuple = MEDIA_KINDS,
    kind_field: str = "kind",
    text_field: str = "text",
) -> DataFrame:
    """Truncate each interleaved document to a context budget, cutting ONLY
    at span boundaries: a text span costs its whitespace token count, a
    media span costs `media_cost` (the vision-encoder patch count — 576 is
    CLIP ViT-L/14 @ 336px, the LLaVA default), and the document keeps the
    longest span PREFIX whose cumulative cost fits. Truncating mid-span
    would orphan media from captions and split sentences; span-boundary
    cuts preserve the (kind, text, media_ref, order) contract for
    everything kept.

    Adds n_spans_kept / n_spans_dropped / cost_kept and rewrites
    spans_col to the kept prefix. Pure per-row column math — ONE O(n)
    aggregate fold per document carries the running cost and the prefix
    cut; no explode, no shuffle, no Python.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    spans = F.col(spans_col)

    def cost(s):
        tokens = F.when(
            s.getField(text_field).isNull()
            | (F.length(F.trim(s.getField(text_field))) == 0),
            F.lit(0),
        ).otherwise(
            F.size(F.split(F.trim(s.getField(text_field)), r"\s+"))
        )
        return (
            F.when(s.getField(kind_field).isin(*media_kinds),
                   F.lit(media_cost))
            .otherwise(tokens)
            .cast("long")
        )

    # ONE O(n) fold carries (running cost, prefix length, cost at the
    # prefix cut) — costs are non-negative so the running sum is monotone
    # and "fits" can never flip back on, preserving the prefix property.
    # (The first version materialized per-index prefix sums via
    # slice+aggregate — O(n^2) lambda evaluations, measurably pathological
    # once real documents brought tens of spans through the VLM-prep job.)
    acc0 = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(0).cast("int").alias("keep"),
        F.lit(0).cast("long").alias("kept"),
    )

    def step(acc, s):
        new_cum = acc.getField("cum") + cost(s)
        fits = new_cum <= F.lit(budget)
        return F.struct(
            new_cum.alias("cum"),
            (acc.getField("keep") + F.when(fits, 1).otherwise(0)).alias("keep"),
            F.when(fits, new_cum).otherwise(acc.getField("kept")).alias("kept"),
        )

    folded = F.aggregate(spans, acc0, step)
    keep_n = folded.getField("keep")
    total_n = F.size(spans)
    kept_cost = folded.getField("kept")
    has = spans.isNotNull()
    return (
        docs.withColumn(
            "n_spans_kept", F.when(has, keep_n).otherwise(F.lit(0)).cast("int")
        )
        .withColumn(
            "n_spans_dropped",
            F.when(has, total_n - keep_n).otherwise(F.lit(0)).cast("int"),
        )
        .withColumn(
            "cost_kept", F.when(has, kept_cost).otherwise(F.lit(0).cast("long"))
        )
        .withColumn(
            spans_col, F.when(has, F.slice(spans, 1, keep_n)).otherwise(spans)
        )
    )


def render_interleaved_sample(
    docs: DataFrame,
    spans_col: str = "spans",
    media_kinds: tuple = MEDIA_KINDS,
    separator: str = "\n\n",
    kind_field: str = "kind",
    text_field: str = "text",
    ref_field: str = "media_ref",
) -> DataFrame:
    """Serialize an interleaved document to the training-sample shape
    VLM pipelines consume (LLaVA / OBELICS interleaved format): one
    `sample` string where each media span becomes an indexed placeholder
    `<image_k>` (k = 0-based media position) and text spans keep their
    text, joined by `separator`; plus the parallel `media_refs` array in
    placeholder order and `n_media`. Spans that are neither media nor
    carry text (null text) are skipped.

    Pure per-row column math — ONE O(n) aggregate fold per document
    threads the media ordinal and appends pieces; no explode, no shuffle,
    no Python.
    """
    spans = F.col(spans_col)
    is_media = lambda s: s.getField(kind_field).isin(*media_kinds)  # noqa: E731

    # ONE O(n) fold threads the running media ordinal through the span
    # walk and appends each rendered piece (placeholder, text, or nothing)
    # as it goes. (The first version recounted media_before(i) with a
    # slice+aggregate per index — O(n^2) lambda evaluations, pathological
    # at real per-document span counts.)
    acc0 = F.struct(
        F.lit(0).cast("int").alias("k"),
        F.array().cast("array<string>").alias("parts"),
    )

    def step(acc, s):
        placeholder = F.concat(
            F.lit("<image_"), acc.getField("k").cast("string"), F.lit(">")
        )
        return (
            F.when(
                is_media(s),
                F.struct(
                    (acc.getField("k") + 1).alias("k"),
                    F.concat(acc.getField("parts"), F.array(placeholder)).alias(
                        "parts"
                    ),
                ),
            )
            .when(
                s.getField(text_field).isNotNull(),
                F.struct(
                    acc.getField("k").alias("k"),
                    F.concat(
                        acc.getField("parts"), F.array(s.getField(text_field))
                    ).alias("parts"),
                ),
            )
            .otherwise(acc)
        )

    pieces = F.aggregate(spans, acc0, step).getField("parts")
    refs = F.transform(
        F.filter(spans, is_media), lambda s: s.getField(ref_field)
    )
    has = spans.isNotNull()
    return (
        docs.withColumn(
            "sample",
            F.when(has, F.concat_ws(separator, pieces)).otherwise(
                F.lit(None).cast("string")
            ),
        )
        .withColumn(
            "media_refs",
            F.when(has, refs).otherwise(
                F.lit(None).cast("array<string>")
            ),
        )
        .withColumn(
            "n_media",
            F.when(has, F.size(refs)).otherwise(F.lit(0)).cast("int"),
        )
    )


def caption_alignment_scores(
    pairs: DataFrame,
    id_col: str = "doc_id",
    ord_col: str = "ord",
    ref_col: str = "media_ref",
    caption_col: str = "caption",
    dim: int = 8,
    threshold: float = 0.3,
    max_tokens: int = 77,
) -> DataFrame:
    """CLIP-score-style image-text alignment filtering (Radford et al.
    '21; the LAION curation rule: drop pairs whose image/text embeddings
    disagree). Takes the output of :func:`caption_pairs` and returns
    (id, ord, media_ref, score, keep) with score = cosine(text_tower,
    image_tower) rounded 6 dp and keep = score >= threshold.

    Towers: the text tower is the signed feature-hash bag-of-words
    (exact integer counts, reuses ops.vectorize.feature_hash_vectors);
    the image tower is a DETERMINISTIC md5 surrogate over media_ref —
    the sandbox has no vision model, so this stands in for a
    Pandas-UDF CLIP image encoder with identical plumbing (per-row
    vector, no shuffle). Dot and squared norms are exact integers; the
    single divide-then-round is the only float op, so the score is
    bit-stable across engines.

    Scale shape: the only exchange is the text tower's token
    hash-groupBy keyed by (doc, ord); image vectors and the score are
    per-row. Media bytes never move — only refs and span text. Captions
    truncate to their first `max_tokens` whitespace tokens BEFORE
    hashing (CLIP's text tower reads 77 tokens; mined "captions" are
    often whole body spans, and hashing megabytes of body text per pair
    is wasted work the real encoder would never see)."""
    from reader_spark.ops.vectorize import _md5_head, feature_hash_vectors

    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    key = F.concat(
        F.col(id_col).cast("string"), F.lit(":"), F.col(ord_col).cast("string")
    )
    truncated = F.when(
        F.col(caption_col).isNotNull(),
        F.array_join(
            F.slice(F.split(F.col(caption_col), r"\s+"), 1, max_tokens), " "
        ),
    )
    base = pairs.select(
        F.col(id_col),
        F.col(ord_col),
        F.col(ref_col),
        truncated.alias(caption_col),
        key.alias("pair_key"),
    )
    tvec = feature_hash_vectors(
        base.select("pair_key", F.col(caption_col).alias("text")),
        id_col="pair_key",
        text_col="text",
        dim=dim,
        normalize=False,
    ).withColumnRenamed("vector", "tv")
    iv = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.pmod(
                _md5_head(
                    "im:",
                    F.concat(F.col(ref_col), F.lit(":"), i.cast("string")),
                ),
                F.lit(9),
            )
            - 4
        ).cast("double"),
    )
    joined = base.join(tvec, "pair_key").withColumn("iv", iv)
    dot = F.aggregate(
        F.zip_with(F.col("tv"), F.col("iv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nt = F.aggregate(F.col("tv"), F.lit(0.0), lambda acc, v: acc + v * v)
    nv = F.aggregate(F.col("iv"), F.lit(0.0), lambda acc, v: acc + v * v)
    score = F.round(F.try_divide(dot, F.sqrt(nt * nv)), 6)
    return joined.select(
        F.col(id_col),
        F.col(ord_col),
        F.col(ref_col),
        score.alias("score"),
        F.when(score >= F.lit(float(threshold)), 1).otherwise(0).alias("keep"),
    )


def span_language_profile(
    spans: DataFrame,
    id_col: str = "doc_id",
    ord_col: str = "ord",
    kind_col: str = "kind",
    text_col: str = "text",
    text_kinds: tuple[str, ...] = ("text", "heading"),
) -> DataFrame:
    """Per-document language-mix profile from SPAN-level language ID over
    an interleaved extraction: each textual span gets the trigram
    detector (ops.textstats.detect_language_trigram_col — survives short
    headings and missing word boundaries), then per doc: how many text
    spans, how many distinct span languages, the dominant language (most
    spans; ties break lexicographically last, the detector's own
    convention), and the code-switch count (adjacent text spans in
    document order whose languages differ). The multilingual curation
    signal for interleaved corpora — docs that flip language mid-body are
    routed differently from clean monolingual ones.

    Scale shape: detection is a per-row regexp battery (scan-bound); the
    two aggregations and the adjacency window all key on the doc id —
    key-bounded exchanges, nothing global."""
    from pyspark.sql import Window

    from reader_spark.ops.textstats import detect_language_trigram_col

    langs = spans.where(F.col(kind_col).isin(*text_kinds)).select(
        F.col(id_col),
        F.col(ord_col),
        detect_language_trigram_col(F.col(text_col)).alias("lang"),
    )
    w = Window.partitionBy(id_col).orderBy(ord_col)
    prev = F.lag("lang").over(w)
    switches = langs.select(
        F.col(id_col),
        F.when(prev.isNull(), 0).when(prev != F.col("lang"), 1).otherwise(0).alias("sw"),
    ).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_text_spans"),
        F.sum("sw").cast("long").alias("code_switches"),
    )
    counts = langs.groupBy(id_col, "lang").agg(F.count(F.lit(1)).alias("c"))
    dom = counts.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.max(F.struct(F.col("c"), F.col("lang"))).getField("lang").alias(
            "dominant_lang"
        ),
    )
    profiled = switches.join(dom, id_col)
    # a media-only document has no textual spans and would vanish from the
    # profile entirely; every input doc must yield a row (the lost-doc rule
    # every per-doc op here follows) — spine left-join, zeros + 'und'
    spine = spans.select(id_col).distinct()
    return spine.join(profiled, id_col, "left").select(
        id_col,
        F.coalesce("n_text_spans", F.lit(0).cast("long")).alias("n_text_spans"),
        F.coalesce("n_langs", F.lit(0).cast("long")).alias("n_langs"),
        F.coalesce("dominant_lang", F.lit("und")).alias("dominant_lang"),
        F.coalesce("code_switches", F.lit(0).cast("long")).alias(
            "code_switches"
        ),
    )


def template_clusters(
    spans: DataFrame,
    id_col: str = "doc_id",
    ord_col: str = "ord",
    kind_col: str = "kind",
) -> DataFrame:
    """Structural template detection over extracted span sequences: a
    document's layout skeleton is the ordered sequence of its span KINDS
    (heading>image>text, ...), and pages produced by the same site
    template share a skeleton even when every word differs — the
    boilerplate-site signal that text-level dedup cannot see (cf. the
    reference's DOM-shape heuristics, src/utils/readability).

    Returns one row per distinct skeleton: (template_id md5, skeleton,
    n_docs, example_doc) with example_doc = the smallest doc id, a
    deterministic exemplar for eyeballing. Scale shape: the skeleton is
    assembled inside the row group (sort the (ord, kind) structs, then
    join kinds) — ONE groupBy keyed by doc, one keyed by the skeleton
    hash; skeleton strings are tiny regardless of document size."""
    skel = F.concat_ws(
        ">",
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col(ord_col), F.col(kind_col)))
            ),
            lambda s: s.getField(kind_col),
        ),
    )
    per_doc = spans.groupBy(id_col).agg(skel.alias("skeleton"))
    return (
        per_doc.groupBy("skeleton")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(id_col).alias("example_doc"),
        )
        .select(
            F.md5(F.col("skeleton")).alias("template_id"),
            "skeleton",
            "n_docs",
            "example_doc",
        )
    )
