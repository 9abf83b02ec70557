"""Fellegi-Sunter record linkage with blocking (Fellegi & Sunter 1969
JASA "A theory for record linkage"; Newcombe et al. 1959) — the
probabilistic entity-resolution layer a multi-crawl corpus needs when
the SAME logical document arrives from two feeds with drifted metadata
(mirror hosts, retitled pages): exact-key dedup misses it, content
near-dup can't use the metadata evidence. The repo's fuzzy.py row does
blocked STRING matching; this is the decision-theoretic layer above it.

Model: candidate pairs come from an equi-join on a blocking key (never
all-pairs — the Newcombe blocking discipline; multi-pass blocking is a
union of such joins). Each field i contributes binary agreement
gamma_i, weighted

    w_i = log2(m_i / u_i)              if the field agrees
    w_i = log2((1-m_i) / (1-u_i))      if it disagrees

with m_i = P(agree | match) and u_i = P(agree | non-match) as model
parameters. The pair score is sum(w_i); two thresholds split
link / possible (clerical review) / non-link.

Engine parity: m/u live in MILLI units and the per-field weights are
rounded to integer milli-bits ONCE at import (`fs_weights`); scoring is
then pure integer addition, so both engines agree bit-for-bit and the
oracle injects the same literals. Shape at 100 TB: one equi-join per
blocking pass keyed by the block, per-field comparisons are native
column expressions riding the join, no windows, no driver state; skewed
blocks (a "none"-named block) are the classic hazard — cap them
upstream with max_block guards or salt the block key (ops/skew.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (m_milli, u_milli) per field: P(agree|match), P(agree|non-match).
DEFAULT_PARAMS: dict[str, tuple[int, int]] = {
    "name": (950, 10),
    "host": (900, 50),
    "len_bucket": (980, 300),
}
DEFAULT_UPPER_MILLI = 6000
DEFAULT_LOWER_MILLI = 0


def fs_weights(
    params: dict[str, tuple[int, int]] | None = None,
) -> dict[str, tuple[int, int]]:
    """(agree, disagree) integer milli-bit weights per field — the ONE
    place log2 runs, so Spark and the DuckDB twin share literals."""
    out = {}
    for field, (m, u) in (params or DEFAULT_PARAMS).items():
        if not (0 < u < m < 1000):
            raise ValueError(f"need 0 < u < m < 1000 for {field}, got {m=} {u=}")
        wa = round(math.log2(m / u) * 1000)
        wd = round(math.log2((1000 - m) / (1000 - u)) * 1000)
        out[field] = (int(wa), int(wd))
    return out


def fs_link_pairs(
    a: DataFrame,
    b: DataFrame,
    fields: tuple[str, ...] | None = None,
    block_col: str = "block",
    id_col: str = "rid",
    params: dict[str, tuple[int, int]] | None = None,
    upper_milli: int = DEFAULT_UPPER_MILLI,
    lower_milli: int = DEFAULT_LOWER_MILLI,
) -> DataFrame:
    """Score every blocked candidate pair.

    `a` and `b` each carry (id_col, block_col, *fields); NULL fields
    compare as disagreement (SQL NULL-safe equality). Returns
    (rid_a, rid_b, gamma, score_milli, decision) with gamma the
    '101'-style agreement pattern in field order.
    """
    if upper_milli < lower_milli:
        raise ValueError(
            f"upper_milli {upper_milli} < lower_milli {lower_milli}"
        )
    fields = tuple(fields or DEFAULT_PARAMS)
    w = fs_weights(params)
    missing = [f for f in fields if f not in w]
    if missing:
        raise ValueError(f"no m/u params for fields {missing}")

    left = a.select(
        F.col(id_col).alias("rid_a"),
        F.col(block_col).alias("__b"),
        *[F.col(f).alias(f"__a_{f}") for f in fields],
    )
    right = b.select(
        F.col(id_col).alias("rid_b"),
        F.col(block_col).alias("__b"),
        *[F.col(f).alias(f"__b_{f}") for f in fields],
    )
    pairs = left.join(right, "__b")

    agrees = [
        F.col(f"__a_{f}").eqNullSafe(F.col(f"__b_{f}")) for f in fields
    ]
    gamma = F.concat(
        *[F.when(ag, F.lit("1")).otherwise(F.lit("0")) for ag in agrees]
    )
    score = None
    for f, ag in zip(fields, agrees):
        wa, wd = w[f]
        term = F.when(ag, F.lit(wa)).otherwise(F.lit(wd)).cast("long")
        score = term if score is None else score + term
    decision = (
        F.when(F.col("score_milli") >= upper_milli, F.lit("link"))
        .when(F.col("score_milli") >= lower_milli, F.lit("possible"))
        .otherwise(F.lit("non_link"))
    )
    return (
        pairs.select(
            "rid_a",
            "rid_b",
            gamma.alias("gamma"),
            score.alias("score_milli"),
        )
        .withColumn("decision", decision)
    )


def fs_linkage_profile(pairs: DataFrame) -> DataFrame:
    """Agreement-pattern profile of a scored pair table: one row per
    (gamma, decision) with the pair count and the score (constant
    within a pattern by construction — min == max is asserted by the
    profile itself so a drifting weight table can't hide). The
    clerical-review workload estimate at corpus scale."""
    return pairs.groupBy("gamma", "decision").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("score_milli").cast("long").alias("score_milli"),
        (F.min("score_milli") == F.max("score_milli")).alias("uniform"),
    )
