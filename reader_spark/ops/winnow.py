"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003).

The MOSS local fingerprinting algorithm: hash every positional k-gram, slide
a window of w consecutive hashes, and select the minimum hash of each window
(rightmost on ties). Guarantee: any shared substring of length >= w + k - 1
between two documents yields at least one IDENTICAL selected fingerprint in
both — the property that makes fingerprint equi-joins a sound plagiarism /
near-copy candidate generator, at ~1/w the index size of full hashing.

Scale shape: one posexplode (linear), one doc-partitioned window of w rows
(no global sort), one distinct. The selected set is ~2/(w+1) of the shingle
stream, so the downstream fingerprint index is a bounded fraction of corpus
tokens.

Engine portability: the rightmost-min tie rule is encoded in a single
integer key  hash * 2^20 + (2^20 - 1 - pos)  — minimizing it picks the
smallest hash and, among ties, the LARGEST position, with every operand
exact below 2^53 in both engines. Documented cap: documents beyond 2^20
(~1M) k-grams would wrap the position field; split such documents upstream
(the extraction pipeline's 2 MiB guard already bounds this far lower).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from reader_spark.spark.fanout import fanout_scan

__all__ = ["positional_shingles", "winnow_fingerprints"]

_POS_FIELD = 1 << 20


def positional_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(id, pos, gram) rows of word k-grams in document order — the
    positional (non-distinct) sibling of ops.dedup.shingles, same linear
    arrays_zip-of-shifted-slices construction."""
    words = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    size = F.size(words)
    n_grams = size - (k - 1)
    shifts = [words] + [
        F.slice(words, i + 1, F.greatest(size - i, F.lit(0))) for i in range(1, k)
    ]
    joined = F.transform(
        F.arrays_zip(*shifts),
        lambda s: F.concat_ws(" ", *[s.getField(str(i)) for i in range(k)]),
    )
    grams = F.when(n_grams > 0, F.slice(joined, 1, n_grams)).otherwise(
        F.array(F.concat_ws(" ", words))
    )
    return fanout_scan(df).select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gram")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Selected (id, pos, gram_hash) winnowing fingerprints.

    gram_hash is the repo's portable md5-head 32-bit hash, so the selected
    set is identical in any engine that can md5 — the DuckDB oracle replays
    window selection bit-for-bit via the combined integer key.
    """
    grams = positional_shingles(df, id_col, text_col, k)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("win:"), F.col("gram"))), 1, 8), 16, 10
    ).cast("long")
    hashed = grams.select(
        F.col(id_col),
        F.col("pos"),
        (h * F.lit(_POS_FIELD) + (F.lit(_POS_FIELD - 1) - F.col("pos"))).alias(
            "combined"
        ),
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    # Only full windows select (standard winnowing: windows = n_grams-w+1);
    # short documents (< w grams) keep their single global minimum.
    n_grams = Window.partitionBy(id_col)
    sel = (
        hashed.select(
            F.col(id_col),
            F.col("pos"),
            F.min("combined").over(win).alias("sel"),
            F.count(F.lit(1)).over(n_grams).alias("n"),
        )
        .where((F.col("pos") <= F.col("n") - w) | ((F.col("n") < w) & (F.col("pos") == 0)))
        .select(
            F.col(id_col),
            F.expr(f"sel div {_POS_FIELD}").cast("long").alias("gram_hash"),
            (F.lit(_POS_FIELD - 1) - F.pmod(F.col("sel"), F.lit(_POS_FIELD)))
            .cast("long")
            .alias("sel_pos"),
        )
        .distinct()
    )
    return sel


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Near-copy candidate pairs: docs sharing >= min_shared selected
    fingerprints, via a fingerprint equi-join (the MOSS match step).

    `max_df` drops stop-fingerprints selected by more than that many
    documents BEFORE pairing — the same giant-bucket guard as the LSH
    star-edge fix: a boilerplate k-gram shared by B docs would otherwise
    emit B^2/2 pairs (quadratic hub). MOSS itself ignores over-common
    fingerprints for the same reason; the cut only removes candidates a
    human reviewer would reject as boilerplate anyway.
    """
    prints = winnow_fingerprints(df, id_col, text_col, k, w).select(
        F.col(id_col).alias("doc"), "gram_hash"
    ).distinct()
    rare = (
        prints.groupBy("gram_hash")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("gram_hash")
    )
    kept = prints.join(rare, "gram_hash")
    a = kept.select(F.col("doc").alias("a"), "gram_hash")
    b = kept.select(F.col("doc").alias("b"), "gram_hash")
    return (
        a.join(b, "gram_hash")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
