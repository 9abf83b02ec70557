"""Concat-then-chunk sequence packing — the LLM-pretraining batching step
(GPT-2/3 style: documents are concatenated in a fixed order and the token
stream is cut into fixed-length training sequences; cf. Brown et al. 2020
§2.2, and the reference's corpus-prep role of reader output as training
text). A document whose tokens straddle a cut produces one output row per
sequence it touches.

Shape at 100 TB: the running total is a prefix sum — a window over the
packing order. The oracle-checkable twin uses ONE global order (doc_id),
which Spark executes as a single-partition window: the documented
small-data form. The production path passes ``partition_cols`` (e.g. the
shard column token_shards assigns) so each shard packs independently —
the window partitions by shard, every partition packs in parallel, and
sequence ids are (shard, local_seq). Tokens are whitespace-split words,
matching token_shards/token_counts.

All arithmetic is integer (long): token offsets at 10^12-doc scale exceed
2^53, where double division silently loses exactness — divisions use
integer `div`, never float.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Assign every document's tokens to fixed-length training sequences.

    Returns one row per (document, sequence) segment:
      (<id_col>, seq_id, doc_offset, seq_offset, n_tokens)
    - seq_id: which sequence the segment lands in (0-based, per partition
      group when ``partition_cols`` is set)
    - doc_offset: first packed token's index within the document
    - seq_offset: where the segment starts inside the sequence
    - n_tokens: segment length; a doc's segments sum to its token count,
      and every sequence except the last is exactly ``seq_len`` full.
    """
    toks = df.select(
        *(partition_cols or []),
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("__n"),
    )
    return pack_by_cost(toks, id_col, "__n", seq_len, partition_cols)


def pack_by_cost(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    seq_len: int,
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """pack_sequences over a PRECOMPUTED per-item cost column — the
    multimodal form: an interleaved doc's context-window footprint is
    text tokens plus a fixed per-image patch budget (e.g. 64 or 576
    visual tokens per image in LLaVA-style encoders), and packing must
    budget that total, not the whitespace count. Same concat-then-chunk
    semantics and output shape as pack_sequences (items straddling a cut
    emit one row per sequence touched); items with cost 0 are dropped,
    negative costs raise at runtime via the ANSI sequence() bound check.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    parts = list(partition_cols or [])
    w = Window.partitionBy(*parts).orderBy(id_col) if parts else Window.orderBy(id_col)

    toks = df.select(
        *parts,
        F.col(id_col),
        F.col(cost_col).cast("long").alias("__n"),
    )
    cum = toks.select(
        *parts,
        id_col,
        "__n",
        (F.sum("__n").over(w) - F.col("__n")).alias("__start"),
        F.sum("__n").over(w).alias("__end"),
    )
    first_seq = F.expr(f"__start div {seq_len}")
    last_seq = F.expr(f"(__end - 1) div {seq_len}")
    seg = cum.where(F.col("__n") > 0).select(
        *parts,
        id_col,
        "__start",
        "__end",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seg_start = F.greatest(F.col("__start"), F.col("seq_id") * seq_len)
    seg_end = F.least(F.col("__end"), (F.col("seq_id") + 1) * seq_len)
    return seg.select(
        *parts,
        id_col,
        F.col("seq_id").cast("long").alias("seq_id"),
        (seg_start - F.col("__start")).cast("long").alias("doc_offset"),
        (seg_start - F.col("seq_id") * seq_len).cast("long").alias("seq_offset"),
        (seg_end - seg_start).cast("long").alias("n_tokens"),
    )


def packing_stats(
    packed: DataFrame,
    seq_len: int,
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Fragmentation report over a pack_sequences result: per-sequence
    fill and document-crossing counts, aggregated to one row —
    (n_sequences, n_segments, mean_fill, pct_docs_split). Diagnostic for
    choosing seq_len; one map-side-combined pass.

    Pass the same ``partition_cols`` given to pack_sequences: seq_id is
    only unique within a shard, so the per-sequence rollup must group by
    (*partition_cols, seq_id) — grouping by seq_id alone would merge
    same-numbered sequences across shards (mean_fill could exceed 1), and
    the id-column inference would mistake the shard column for the doc id.
    """
    parts = list(partition_cols or [])
    missing = [c for c in parts if c not in packed.columns]
    if missing:
        raise ValueError(f"partition_cols not in packed result: {missing}")
    per_seq = packed.groupBy(*parts, "seq_id").agg(
        F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("segs")
    )
    known = {"seq_id", "doc_offset", "seq_offset", "n_tokens", *parts}
    id_candidates = [c for c in packed.columns if c not in known]
    if len(id_candidates) != 1:
        raise ValueError(
            "could not infer the document id column: candidates "
            f"{id_candidates} — pass partition_cols matching pack_sequences"
        )
    id_col = id_candidates[0]
    per_doc = packed.groupBy(id_col).agg(F.count(F.lit(1)).alias("parts"))
    return per_seq.agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("segs").cast("long").alias("n_segments"),
        F.round(F.avg(F.col("fill") / seq_len), 6).alias("mean_fill"),
    ).crossJoin(
        per_doc.agg(
            F.round(
                F.sum((F.col("parts") > 1).cast("int")) / F.count(F.lit(1)), 6
            ).alias("pct_docs_split")
        )
    )


def length_grouped_batches(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    batch_size: int,
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Length-grouped batch assembly (the "sortish batching" every
    trainer uses to cut padding): within each shard, items sort by
    (cost desc, id asc) and chunk into fixed-count batches of
    ``batch_size``; a batch pads every item to its own max cost.

    Returns per-batch stats — (partition_cols..., batch_id, n_items,
    max_cost, sum_cost, padding_waste) with ``padding_waste =
    n_items * max_cost - sum_cost`` (the trailing partial batch pads to
    its actual size, not to ``batch_size``).

    Scale shape: one per-shard window (rank) + one keyed aggregate; no
    global ordering anywhere. Compare against id-ordered batching with
    :func:`batch_padding_compare` to quantify the win.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    parts = list(partition_cols or [])
    w = (
        Window.partitionBy(*parts).orderBy(F.desc("__c"), F.asc(id_col))
        if parts
        else Window.orderBy(F.desc("__c"), F.asc(id_col))
    )
    ranked = df.select(
        *parts,
        F.col(id_col),
        F.col(cost_col).cast("long").alias("__c"),
    ).withColumn(
        "batch_id",
        ((F.row_number().over(w) - 1) / batch_size).cast("long"),
    )
    return ranked.groupBy(*parts, "batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.max("__c").alias("max_cost"),
        F.sum("__c").alias("sum_cost"),
        (F.count(F.lit(1)) * F.max("__c") - F.sum("__c"))
        .cast("long")
        .alias("padding_waste"),
    )


def batch_padding_compare(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    batch_size: int,
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-row scorecard: total padded cost under length-grouped vs
    id-ordered batching (same shards, same batch size) — the artifact
    that justifies length bucketing in a training recipe.

    Returns (strategy, n_batches, sum_cost, padded_cost, waste_frac)."""
    parts = list(partition_cols or [])

    def stats(ranked_by: list) -> DataFrame:
        w = (
            Window.partitionBy(*parts).orderBy(*ranked_by)
            if parts
            else Window.orderBy(*ranked_by)
        )
        ranked = df.select(
            *parts, F.col(id_col), F.col(cost_col).cast("long").alias("__c")
        ).withColumn(
            "batch_id", ((F.row_number().over(w) - 1) / batch_size).cast("long")
        )
        return ranked.groupBy(*parts, "batch_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.max("__c").alias("m"),
            F.sum("__c").alias("s"),
        )

    out = []
    for name, order in (
        ("length_grouped", [F.desc("__c"), F.asc(id_col)]),
        ("id_ordered", [F.asc(id_col)]),
    ):
        b = stats(order)
        out.append(
            b.agg(
                F.lit(name).alias("strategy"),
                F.count(F.lit(1)).cast("long").alias("n_batches"),
                F.sum("s").cast("long").alias("sum_cost"),
                F.sum(F.col("n") * F.col("m")).cast("long").alias("padded_cost"),
                F.round(
                    (F.sum(F.col("n") * F.col("m")) - F.sum("s"))
                    / F.sum(F.col("n") * F.col("m")),
                    6,
                ).alias("waste_frac"),
            )
        )
    return out[0].unionByName(out[1])


def pack_next_fit(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    capacity: int,
    partition_cols: Sequence[str],
) -> DataFrame:
    """Sample-level (NO-split) next-fit packing — the other standard
    packing mode (T5/LLaMA-style "don't cross document boundaries"):
    items in id order per shard; the open bin closes when the next item
    doesn't fit; an item larger than ``capacity`` takes a bin alone
    (``oversize`` = true).

    The recurrence is inherently sequential, so it runs as an
    Arrow-batched applyInPandas per shard (state = one running fill).
    ``partition_cols`` is REQUIRED: shard granularity bounds both the
    pandas batch and the sequential span — at corpus scale pick shards
    so one shard's rows fit an executor (the same contract as
    pack_sequences' sharded mode). The oracle twin is a recursive CTE.

    Returns (partition_cols..., id, cost, bin_id, bin_fill, oversize).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if not partition_cols:
        raise ValueError("partition_cols is required (bounds the sequential span)")
    parts = list(partition_cols)

    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bin_id, fill = 0, 0
        bins, fills = [], []
        first = True
        for c in pdf["__c"]:
            c = int(c)
            if first:
                fill = c
                first = False
            elif fill + c <= capacity:
                fill += c
            else:
                bin_id += 1
                fill = c
            bins.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        pdf["oversize"] = pdf["__c"] > capacity
        return pdf

    src = df.select(
        *parts, F.col(id_col), F.col(cost_col).cast("long").alias("__c")
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
    ) + ", bin_id long, bin_fill long, oversize boolean"
    return (
        src.groupBy(*parts)
        .applyInPandas(pack, schema=schema)
        .withColumnRenamed("__c", "cost")
    )


def pack_leakage_audit(
    segments: DataFrame,
    flags: DataFrame,
    id_col: str = "doc_id",
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Audit packed sequences for flagged/clean co-residence.

    Packing concatenates documents into fixed windows, so a document
    flagged AFTER packing (decontamination hit, opt-out, PII verdict)
    contaminates every sequence it shares — causal attention does not
    stop at document boundaries unless the loader masks them, and most
    don't (the cross-document attention leak; Zhao et al. 2024
    "Analysing The Impact of Sequence Composition on Language Model
    Pre-training" measures the effect). This audit finds the mixed
    sequences a naive "drop the flagged docs" cleanup would miss.

    ``segments``: a pack_sequences/pack_by_cost result; ``flags``:
    ``(<id_col>, flagged)`` — absent docs count unflagged. Returns one
    row per sequence: ``(partition_cols..., seq_id, n_segments,
    n_docs, n_flagged_docs, flagged_tokens, total_tokens, mixed)`` —
    ``mixed`` marks sequences that must be re-packed (some but not all
    of their content is flagged).

    Scale shape: one equi-join on the doc id, one map-side-combined
    groupBy(sequence) carrying counters only.
    """
    parts = list(partition_cols or [])
    f = flags.select(
        F.col(id_col).alias("__fid"), F.col("flagged").alias("__fl")
    )
    j = segments.join(f, segments[id_col] == f["__fid"], "left").select(
        *parts,
        "seq_id",
        id_col,
        "n_tokens",
        F.coalesce(F.col("__fl"), F.lit(False)).cast("long").alias("__fl"),
    )
    return (
        j.groupBy(*parts, "seq_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.countDistinct(
                F.when(F.col("__fl") == 1, F.col(id_col))
            )
            .cast("long")
            .alias("n_flagged_docs"),
            F.sum(F.col("__fl") * F.col("n_tokens"))
            .cast("long")
            .alias("flagged_tokens"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            *parts,
            "seq_id",
            "n_segments",
            "n_docs",
            "n_flagged_docs",
            "flagged_tokens",
            "total_tokens",
            (
                (F.col("n_flagged_docs") > 0)
                & (F.col("n_flagged_docs") < F.col("n_docs"))
            ).alias("mixed"),
        )
    )
