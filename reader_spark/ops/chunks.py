"""Overlapping passage chunking — the context-window prep step.

Long documents must become model-window-sized passages before embedding,
retrieval indexing, or sequence packing (cf. RAG passage splitting and
the fixed-stride chunking of retrieval corpora like MS MARCO/DPR prep).
This is a pure per-row map at any corpus size: tokens are split once,
chunk starts are an integer sequence, each chunk is one O(size) slice —
no shuffle, no window function, nothing quadratic (the
transform(sequence, i -> slice) idiom here is linear in OUTPUT tokens:
chunks x size, the size of the result itself).

Coverage contract: chunk starts run 1, 1+stride, 2*stride+1, ... and the
final start n-size+1 is always appended (deduplicated), so every token
of every document appears in at least one chunk and the last chunk is
always full-width (short docs yield exactly one chunk of the whole doc).
Integer starts and slices keep the op engine-exact for the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def passage_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Split each doc's whitespace tokens into overlapping passages.

    Returns (id, chunk_id, start_token, n_tokens, chunk_text) with
    chunk_id dense from 0 in start order. ``stride`` < ``size`` gives
    ``size - stride`` tokens of overlap between neighbors; stride ==
    size is exact tiling. Empty/whitespace-only docs yield one chunk of
    their single empty token (split semantics), never zero rows — a doc
    that vanishes here silently vanishes from retrieval.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if not 1 <= stride <= size:
        raise ValueError(
            f"stride must be in [1, size], got stride={stride} size={size}"
        )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    last = F.greatest(n - F.lit(size), F.lit(0)) + 1
    seq = F.sequence(F.lit(1), last, F.lit(stride))
    # the tail start n-size+1 is appended only when the stride grid
    # misses it, so starts stay strictly increasing with no dedup pass —
    # and chunk_id has the closed form ceil((start-1)/stride), identical
    # integer math in the SQL oracle (no ordinality needed)
    starts = F.when(
        (last - 1) % F.lit(stride) != 0,
        F.concat(seq, F.array(last)),
    ).otherwise(seq)
    start = F.col("start_token")
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            n.alias("__n"),
            F.explode(starts).alias("start_token"),
        )
        .select(
            id_col,
            F.expr(f"(start_token + {stride - 2}) div {stride}")
            .cast("long")
            .alias("chunk_id"),
            start.cast("long"),
            F.least(F.lit(size), F.col("__n") - start + 1)
            .cast("long")
            .alias("n_tokens"),
            F.concat_ws(
                " ", F.slice(F.col("__toks"), start, size)
            ).alias("chunk_text"),
        )
    )


def span_corruption(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: int = 20,
    span: int = 3,
) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4: mask ~15% of
    tokens in short spans; targets are the masked spans behind sentinel
    tokens) — made DETERMINISTIC for distributed reproducibility: token
    stream is cut into fixed ``block``-token windows, each full window
    masks one ``span``-token run whose offset is md5(doc_id, window) mod
    (block - span + 1). span/block = the corruption rate (default 3/20 =
    15%); sentinel ids number windows in order like T5's <extra_id_N>.

    A pure per-row map — per-window slices sum to O(tokens) per doc
    (never the quadratic transform+slice-over-positions form), no
    shuffle, no RNG state to coordinate across executors: any worker
    re-derives the same mask from (doc_id, window) alone, which is what
    makes checkpoint-resumed preprocessing emit identical examples.

    Returns (id, n_tokens, n_masked, input_text, target_text); docs
    shorter than one block pass through unmasked with empty target.
    """
    if span < 1:
        raise ValueError(f"span must be >= 1, got {span}")
    if block <= span:
        raise ValueError(
            f"block must exceed span, got block={block} span={span}"
        )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    nblocks = F.expr(f"size(__toks) div {block}")
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
    ).withColumn("__nb", nblocks)

    t = F.col("__toks")

    def _h(b):
        # window's mask offset in [0, block - span]
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("span:"),
                            F.col(id_col).cast("string"),
                            F.lit(":"),
                            b.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(block - span + 1),
        )

    def _sentinel(b):
        return F.concat(F.lit("<extra_id_"), b.cast("string"), F.lit(">"))

    blocks = F.sequence(F.lit(0), F.col("__nb") - 1)
    input_pieces = F.transform(
        blocks,
        lambda b: F.concat(
            F.slice(t, b * block + 1, _h(b)),
            F.array(_sentinel(b)),
            F.slice(t, b * block + _h(b) + span + 1, block - span - _h(b)),
        ),
    )
    target_pieces = F.transform(
        blocks,
        lambda b: F.concat_ws(
            " ",
            _sentinel(b),
            F.concat_ws(" ", F.slice(t, b * block + _h(b) + 1, span)),
        ),
    )
    tail = F.slice(
        t, F.col("__nb") * block + 1, F.col("__n") - F.col("__nb") * block
    )
    has_blocks = F.col("__nb") > 0
    return base.select(
        id_col,
        F.col("__n").cast("long").alias("n_tokens"),
        (F.col("__nb") * span).cast("long").alias("n_masked"),
        F.concat_ws(
            " ",
            F.when(has_blocks, F.array_join(F.flatten(input_pieces), " ")),
            # concat_ws treats '' as a joinable value (trailing space) but
            # skips NULL — emit the tail only when it has tokens
            F.when(F.size(tail) > 0, F.concat_ws(" ", tail)),
        ).alias("input_text"),
        F.coalesce(
            F.when(has_blocks, F.array_join(target_pieces, " ")), F.lit("")
        ).alias("target_text"),
    )
