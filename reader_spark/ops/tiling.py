"""TextTiling topic segmentation (Hearst 1997, CL 23(1)).

Long documents are not one topic: training-data chunkers that cut at a
fixed token stride split concepts mid-thought, and cut-and-stitch
dedup/packing both benefit from TOPICALLY coherent pieces. TextTiling
finds the topic boundaries lexically: slide a gap cursor between
fixed-size token blocks, score each gap by the lexical cosine between
the k blocks on its left and right, and cut where the similarity curve
dips into a valley deep enough against the document's own depth
distribution. This module is the Spark-native form of the algorithm's
block-comparison variant, feeding ops/chunks.py's passage assembly the
boundary set it currently lacks.

Engine-portable arithmetic (the repo discipline): similarity is the
SQUARED cosine in integer micro-units — ``sim2 = dot^2 * 1e6 div
(|L|^2 * |R|^2)`` over raw token counts, so no sqrt and no float ever
crosses an engine boundary; squaring is monotone on cosine >= 0, so
peaks, valleys, and depth ORDER are those of the real cosine. Depth
uses Hearst's climb-to-peak on each side, computed without any
sequential scan: a strict rise starts a new run-group (running sum of
an indicator), and the peak is the running max within the group —
two doc-keyed window passes. The boundary cutoff (depth > mean -
sd/2, Hearst's LC, strict like nltk's — a zero-variance document has
no boundaries) is evaluated as a pure-integer inequality:
``n*d > S  OR  n*Q - S^2 > 4*(S - n*d)^2`` over milli-unit depths
(S = sum d, Q = sum d^2) — milli so S^2 stays in BIGINT up to ~3e7
tokens per document.

Deviations from the paper, documented: no stopword removal (the corpus
is multilingual; the ASCII ``[^a-z0-9]+`` tokenizer is the repo-wide
idiom), and no minimum-distance merge between adjacent boundaries (the
output is the full per-gap score table; downstream choosers can apply
their own spacing rule).

Shape at 100 TB: every step is keyed by doc_id (token counts by
(doc_id, gap, side) — the side fan-out is a bounded 2k explode), so the
plan is a chain of doc-keyed shuffles with map-side combine; the
windows partition on doc_id, never globally. Per-gap state is bounded
by w*k tokens per side regardless of document size; oversized documents
cost O(n_tokens) rows, not O(n^2) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SEP = "[^a-z0-9]+"


def texttiling_gaps(
    docs: DataFrame,
    w: int = 20,
    k: int = 2,
    min_sep: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-gap TextTiling score table.

    Output: (doc_id, gap, sim2_micro, depth_micro, is_candidate,
    is_boundary) — one row per block gap (gap g separates token blocks
    < g from >= g); documents with fewer than two blocks emit nothing.
    ``w`` is the pseudo-sentence block size in tokens, ``k`` the
    comparison window in blocks; ``is_candidate`` is Hearst's raw LC
    cutoff, ``is_boundary`` additionally applies the minimum-separation
    rule (deeper candidate within ``min_sep - 1`` gaps suppresses its
    shoulders; ties resolve to the smaller gap).
    """
    d, g = F.col(id_col), F.col("gap")
    toks = docs.select(
        d.alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SEP),
                lambda x: x != "",
            )
        ).alias("pos", "tok"),
    ).select("doc_id", F.expr(f"pos div {w}").cast("long").alias("bid"), "tok")
    # Per-doc block count -> valid gap range 1..n_blocks-1.
    nblocks = toks.groupBy("doc_id").agg(
        (F.max("bid") + 1).alias("n_blocks")
    )
    counts = toks.groupBy("doc_id", "bid", "tok").agg(
        F.count("*").alias("c")
    )
    # Block b is the LEFT side of gaps b+1..b+k and the RIGHT side of
    # gaps b-k+1..b (right window = blocks g..g+k-1): a bounded 2k
    # fan-out per (block, token) row.
    sides = counts.select(
        "doc_id",
        "tok",
        "c",
        F.explode(
            F.concat(
                F.transform(
                    F.sequence(F.lit(1), F.lit(k)),
                    lambda j: F.struct(
                        (F.col("bid") + j).alias("gap"), F.lit("L").alias("side")
                    ),
                ),
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda j: F.struct(
                        (F.col("bid") - j).alias("gap"), F.lit("R").alias("side")
                    ),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "tok", "c", F.col("s.gap").alias("gap"), F.col("s.side").alias("side"))
    sides = sides.join(nblocks, "doc_id").where(
        (g >= 1) & (g <= F.col("n_blocks") - 1)
    )
    # Fused similarity: ONE (doc, gap, tok) pre-aggregate pivots the two
    # sides into (cl, cr) columns, then ONE (doc, gap) rollup computes
    # nl = Σcl², nr = Σcr², dot = Σcl·cr. Same values as the unfused
    # norms/left⋈right/dots chain (a token absent from a side has
    # count 0 and contributes 0 to every sum), but the per-side window
    # frame is scanned once instead of three times and the L⋈R
    # token join disappears (guide §2.3/§2.4).
    win = sides.groupBy("doc_id", "gap", "tok").agg(
        F.sum(F.when(F.col("side") == "L", F.col("c")).otherwise(0)).alias("cl"),
        F.sum(F.when(F.col("side") == "R", F.col("c")).otherwise(0)).alias("cr"),
    )
    sims = (
        win.groupBy("doc_id", "gap")
        .agg(
            F.sum(F.col("cl") * F.col("cl")).alias("nl"),
            F.sum(F.col("cr") * F.col("cr")).alias("nr"),
            F.sum(F.col("cl") * F.col("cr")).cast("long").alias("dot"),
        )
        .select(
            "doc_id",
            "gap",
            F.when(
                (F.col("nl") > 0) & (F.col("nr") > 0),
                F.expr("(dot * dot * CAST(1000000 AS BIGINT)) div (nl * nr)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("sim2_micro"),
        )
    )
    # Depth: climb to the nearest peak on each side. A strict rise
    # starts a new run-group; within a group the running max is the
    # group head (the sequence is non-increasing inside a group).
    fwd = Window.partitionBy("doc_id").orderBy("gap")
    bwd = Window.partitionBy("doc_id").orderBy(F.desc("gap"))
    s = F.col("sim2_micro")
    scored = (
        sims.withColumn(
            "lgrp",
            F.sum(
                F.when(s > F.lag(s, 1).over(fwd), 1).otherwise(0)
            ).over(fwd.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "rgrp",
            F.sum(
                F.when(s > F.lag(s, 1).over(bwd), 1).otherwise(0)
            ).over(bwd.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    lpk = Window.partitionBy("doc_id", "lgrp").orderBy("gap").rowsBetween(
        Window.unboundedPreceding, 0
    )
    rpk = Window.partitionBy("doc_id", "rgrp").orderBy(F.desc("gap")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    depth = scored.select(
        "doc_id",
        "gap",
        "sim2_micro",
        (F.max(s).over(lpk) - s + F.max(s).over(rpk) - s).alias("depth_micro"),
    )
    # Hearst LC cutoff (mean - sd/2) as a pure-integer inequality over
    # milli-unit depths.
    dm = F.expr("depth_micro div 1000")
    stats = depth.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.sum(dm).alias("s_milli"),
        F.sum(dm * dm).alias("q_milli"),
    )
    n, S, Q = F.col("n"), F.col("s_milli"), F.col("q_milli")
    flagged = depth.join(stats, "doc_id").select(
        "doc_id",
        "gap",
        "sim2_micro",
        "depth_micro",
        (
            (n * dm > S)
            | (n * Q - S * S > F.lit(4) * (S - n * dm) * (S - n * dm))
        ).alias("is_candidate"),
    )
    # Boundary spacing (Hearst's minimum-separation rule as deterministic
    # local non-max suppression): a candidate is a boundary iff it is the
    # (depth desc, gap asc) maximum among candidates within min_sep - 1
    # gaps on either side. One doc-keyed range window; the packed long
    # makes the election a single max.
    pack = F.when(
        F.col("is_candidate"),
        F.col("depth_micro") * F.lit(2_000_000_000)
        + (F.lit(2_000_000_000) - F.col("gap")),
    )
    nms = (
        Window.partitionBy("doc_id")
        .orderBy("gap")
        .rangeBetween(-(min_sep - 1), min_sep - 1)
    )
    return (
        flagged.withColumn("_pk", pack)
        .withColumn(
            "is_boundary",
            F.col("is_candidate") & (F.col("_pk") == F.max("_pk").over(nms)),
        )
        .drop("_pk")
    )


def texttiling_segments(gaps: DataFrame) -> DataFrame:
    """Roll the boundary gaps into segments: seg_id = running count of
    boundaries at or before the gap (segment 0 runs from the document
    start to the first boundary). Output: (doc_id, seg_id, start_gap,
    end_gap, n_gaps, max_depth_micro) — block-indexed segment spans a
    chunker multiplies by w to get token offsets. One doc-keyed window
    over the (already tiny) per-gap frame."""
    fwd = Window.partitionBy("doc_id").orderBy("gap")
    seg = gaps.withColumn(
        "seg_id",
        F.sum(F.when(F.col("is_boundary"), 1).otherwise(0)).over(
            fwd.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return seg.groupBy("doc_id", "seg_id").agg(
        F.min("gap").alias("start_gap"),
        F.max("gap").alias("end_gap"),
        F.count("*").alias("n_gaps"),
        F.max("depth_micro").alias("max_depth_micro"),
    )
