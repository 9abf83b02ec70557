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
