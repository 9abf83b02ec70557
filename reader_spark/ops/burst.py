"""Kleinberg two-state burst detection (Kleinberg KDD 2002, "Bursty and
hierarchical structure in streams", the batch/enumerating variant) —
the principled "is this topic/error-type bursting NOW?" detector a
crawl/ingest pipeline runs over its event stream; unlike a z-score
threshold it pays an explicit state-transition cost, so isolated spiky
windows do not flap the detector.

Model: per key, the corpus timeline is discretized into windows with
(r_t = key events, d_t = all events). The base state q0 emits at the
key's corpus rate p0 = R/D; the burst state q1 at p1 = min(s*p0,
0.99999). Window cost in state q is the binomial NLL
-(r ln p_q + (d-r) ln(1-p_q)); entering the burst state costs
gamma * ln(T). The optimal labeling minimizes total cost. Rather than
Viterbi-with-backtracking, each window is labeled by the exact
forward/backward decomposition

    best_q(t) = fwd_q(t) + bwd_q(t) - cost_q(t);  burst = [best_1 < best_0]

(ties resolve to the base state), which labels every window from two
linear passes.

Engine parity: window costs and the transition cost are round-9 doubles
lifted to integer nano-units ONCE; both DP passes are then exact
integer min-plus folds, so Spark's within-row F.aggregate and the
DuckDB recursive-CTE twin agree bit-for-bit.

Shape at 100 TB: counts are map-side-combined groupBys; the corpus
window dim and per-key rates are key-bounded joins; each key's DP is a
WITHIN-ROW fold over its sorted window array (array-append
accumulator: O(T^2) bytes copied per key — bound T by coarsening the
window for multi-year streams, e.g. <= ~2k windows/key), then one
posexplode back to rows. No Python, no global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIG = 1 << 60


def kleinberg_bursts(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_expr: str = "date_trunc('hour', ts)",
    s_milli: int = 2000,
    gamma_milli: int = 1000,
) -> DataFrame:
    """Returns (key, win, r, d, burst): every (key, corpus window) row
    with its counts and the optimal-labeling burst flag."""
    if s_milli <= 1000:
        raise ValueError(f"s_milli must be > 1000 (p1 > p0), got {s_milli}")
    if gamma_milli <= 0:
        raise ValueError(f"gamma_milli must be positive, got {gamma_milli}")

    ev = events.select(
        F.col(key_col).alias("key"), F.expr(window_expr).alias("win")
    )
    kw = ev.groupBy("key", "win").agg(
        F.count(F.lit(1)).cast("long").alias("r")
    )
    wins = ev.groupBy("win").agg(F.count(F.lit(1)).cast("long").alias("d"))
    keys = ev.groupBy("key").agg(F.count(F.lit(1)).cast("long").alias("rr"))
    tot = wins.agg(
        F.sum("d").cast("long").alias("dd"),
        F.count(F.lit(1)).cast("long").alias("t"),
    )

    # full (key x corpus-window) grid with r = 0 fills
    grid = (
        keys.join(wins.select("win", "d"))
        .join(kw, ["key", "win"], "left")
        .select(
            "key",
            "win",
            "d",
            "rr",
            F.coalesce("r", F.lit(0).cast("long")).alias("r"),
        )
    )

    p0 = F.col("rr") / F.col("dd")
    p1 = F.least(F.lit(s_milli / 1000.0) * p0, F.lit(0.99999))
    cost = lambda p: F.round(  # noqa: E731
        -(
            F.col("r") * F.log(p)
            + (F.col("d") - F.col("r")) * F.log(1.0 - p)
        )
        * F.lit(1e9),
        0,
    ).cast("long")
    gam = F.round(
        F.lit(gamma_milli / 1000.0) * F.log(F.col("t")) * F.lit(1e9), 0
    ).cast("long")

    costed = grid.crossJoin(F.broadcast(tot)).select(
        "key",
        "win",
        "r",
        "d",
        cost(p0).alias("k0"),
        cost(p1).alias("k1"),
        gam.alias("g"),
    )

    arr = costed.groupBy("key", "g").agg(
        F.sort_array(
            F.collect_list(F.struct("win", "r", "d", "k0", "k1"))
        ).alias("ws")
    )

    def _fold(seq, init_c0, init_c1, step_c0, step_c1):
        init = F.struct(
            init_c0.alias("c0"),
            init_c1.alias("c1"),
            F.array().cast("array<struct<c0:long,c1:long>>").alias("acc"),
        )
        step = lambda a, x: F.struct(  # noqa: E731
            step_c0(a, x).alias("c0"),
            step_c1(a, x).alias("c1"),
            F.concat(
                a.acc,
                F.array(
                    F.struct(
                        step_c0(a, x).alias("c0"),
                        step_c1(a, x).alias("c1"),
                    )
                ),
            ).alias("acc"),
        )
        return F.aggregate(seq, init, step).getField("acc")

    def _pass(ws, g, forward: bool):
        """min-plus DP emitting per-step (c0, c1) arrays. Forward:
        fwd0 = min(f0, f1) + k0; fwd1 = min(f0 + g, f1) + k1 (entering
        the burst pays g; leaving is free; virtual start in state 0 via
        init (0, g)). Backward mirrors the transition DIRECTION:
        bwd0 = min(b0, b1 + g) + k0; bwd1 = min(b0, b1) + k1 with free
        init (0, 0) — the sequence end has no exit cost."""
        zero = F.lit(0).cast("long")
        if forward:
            return _fold(
                ws,
                zero,
                g,
                lambda a, x: F.least(a.c0, a.c1) + x.k0,
                lambda a, x: F.least(a.c0 + g, a.c1) + x.k1,
            )
        return F.reverse(
            _fold(
                F.reverse(ws),
                zero,
                zero,
                lambda a, x: F.least(a.c0, a.c1 + g) + x.k0,
                lambda a, x: F.least(a.c0, a.c1) + x.k1,
            )
        )

    labeled = arr.select(
        "key",
        "ws",
        _pass(F.col("ws"), F.col("g"), True).alias("fw"),
        _pass(F.col("ws"), F.col("g"), False).alias("bw"),
    ).select(
        "key",
        F.posexplode(
            F.zip_with(
                F.col("ws"),
                F.zip_with(
                    F.col("fw"),
                    F.col("bw"),
                    lambda f, b: F.struct(
                        f.getField("c0").alias("f0"),
                        f.getField("c1").alias("f1"),
                        b.getField("c0").alias("b0"),
                        b.getField("c1").alias("b1"),
                    ),
                ),
                lambda w, c: F.struct(
                    w.getField("win").alias("win"),
                    w.getField("r").alias("r"),
                    w.getField("d").alias("d"),
                    (
                        (c.getField("f1") + c.getField("b1") - w.getField("k1"))
                        < (c.getField("f0") + c.getField("b0") - w.getField("k0"))
                    )
                    .cast("int")
                    .alias("burst"),
                ),
            )
        ).alias("__i", "x"),
    )
    return labeled.select(
        F.col("key"),
        F.col("x.win").alias("win"),
        F.col("x.r").alias("r"),
        F.col("x.d").alias("d"),
        F.col("x.burst").alias("burst"),
    )
