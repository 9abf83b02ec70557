"""Distributed submodular subset selection: greedy facility-location
maximization in the two-round GreeDi shape (Mirzasoleiman et al. NeurIPS
2013, "Distributed Submodular Maximization"; Nemhauser et al. 1978 give
the greedy 1-1/e guarantee). The REPRESENTATIVE-subset selector for
training-data curation: facility location F(S) = sum_p max(0, max_{c in
S} cos(c, p)) rewards covering every corpus point with a similar
exemplar — the complement of k-center (ops/coreset.py, which maximizes
SPREAD) and of SemDeDup (which only prunes redundancy).

Exact greedy is O(n^2 k) — undeliverable at corpus scale — so GreeDi:

  round 1: hash-partition points into B buckets; run greedy-k INSIDE
           each bucket (the n_b^2 pair join is bucket-local — the
           SemDeDup within-cell discipline);
  round 2: the B*k local winners (a bounded driver-side literal list,
           the k-center/IVF-seed pattern) compete in exact greedy over
           the FULL corpus, with per-candidate scoring done by a
           literal-explode — no crossJoin, no window.

Engine parity: similarities are round-4 cosines lifted to exact
integer 1e-4 units, so marginal gains, the running coverage column and
the objective are all BIGINT sums; elections pack (gain desc, id asc).
The DuckDB twin replays both rounds as unrolled CTEs from the same
constants. Driver traffic: B rows per stage-1 round + one bounded
candidate list — the sanctioned k-center readback shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["facility_location_greedi"]


def _dot(u, v):
    return F.aggregate(
        F.zip_with(u, v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nrm(w):
    return F.sqrt(_dot(w, w))


def _sim_dm(u, v, nu, nv):
    """round-4 cosine in exact integer 1e-4 units, with the two norms
    PRECOMPUTED as columns — same doubles as computing them inline
    (identical expression tree per value), a third of the per-pair
    aggregate work (the 62s->20s bench finding at sf0.1)."""
    cos = F.try_divide(_dot(u, v), nu * nv)
    return F.coalesce(
        F.round(F.round(cos, 4) * 10000, 0).cast("long"), F.lit(0)
    )


def _cos_dm(u, v):
    """round-4 cosine in exact integer 1e-4 units (deci-milli)."""
    return _sim_dm(u, v, _nrm(u), _nrm(v))


def facility_location_greedi(
    embeddings: DataFrame,
    k: int = 4,
    buckets: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Returns (rank, vec_id, gain_dm, objective): the k selected
    exemplars in pick order with the exact-integer marginal gain and
    the facility-location objective (1e-4 units rendered as a double)
    AFTER each pick. Deterministic: (gain desc, id asc) elections over
    integer gains.
    """
    if k < 1 or buckets < 1:
        raise ValueError(f"k and buckets must be >= 1, got {k=} {buckets=}")
    spark = embeddings.sparkSession

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("flb:"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    pts = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(h, F.lit(buckets)).alias("bucket"),
    ).withColumn("nr", _nrm(F.col("v"))).localCheckpoint(eager=True)

    # ---- round 1: greedy-k inside every bucket, all buckets at once.
    # The bucket-local pair-similarity matrix is computed ONCE and
    # checkpointed (n_b^2 integer rows per bucket — the same order of
    # work ONE greedy round used to pay, and the SemDeDup within-cell
    # materialization bound); every round after is pure integer joins
    # against it, no vector dots.  Operand order in _sim_dm matches the
    # old per-round forms (candidate first, winner first) so every
    # double — and thus every rounded 1e-4 unit — is bit-identical.
    pairsim = (
        pts.select(
            "bucket",
            F.col("id").alias("cid"),
            F.col("v").alias("cv"),
            F.col("nr").alias("cnr"),
        )
        .join(
            pts.select(
                "bucket",
                F.col("id").alias("pid"),
                F.col("v").alias("pv"),
                F.col("nr").alias("pnr"),
            ),
            "bucket",
        )
        .select(
            "bucket",
            "cid",
            "pid",
            _sim_dm(
                F.col("cv"), F.col("pv"), F.col("cnr"), F.col("pnr")
            ).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    cur = pts.select(
        "bucket", "id", F.lit(0).cast("long").alias("cur")
    ).localCheckpoint(eager=True)
    picked: list[tuple[int, int]] = []  # (bucket, id)
    cand_vecs: dict[int, list[float]] = {}
    cand_norms: dict[int, float] = {}
    for _ in range(k):
        cand_sim = pairsim
        if picked:
            sel = spark.createDataFrame(picked, "bucket long, cid long")
            cand_sim = pairsim.join(
                F.broadcast(sel), ["bucket", "cid"], "left_anti"
            )
        gains = (
            cand_sim.join(
                cur.withColumnRenamed("id", "pid"), ["bucket", "pid"]
            )
            .select(
                "bucket",
                "cid",
                F.greatest(
                    F.col("s") - F.col("cur"), F.lit(0).cast("long")
                ).alias("t"),
            )
            .groupBy("bucket", "cid")
            .agg(F.sum("t").alias("g"))
        )
        winners = (
            gains.groupBy("bucket")
            .agg(F.max(F.struct(F.col("g"), (-F.col("cid")).alias("n"))).alias("m"))
            .select("bucket", (-F.col("m.n")).alias("id"))
            .join(pts.select("bucket", "id", "v", "nr"), ["bucket", "id"])
            .collect()
        )
        if not winners:
            break
        picked += [(int(r["bucket"]), int(r["id"])) for r in winners]
        for r in winners:
            cand_vecs[int(r["id"])] = list(r["v"])
            cand_norms[int(r["id"])] = float(r["nr"])
        wdf = spark.createDataFrame(
            [(int(r["bucket"]), int(r["id"])) for r in winners],
            "bucket long, wid long",
        )
        wsim = pairsim.join(
            F.broadcast(wdf),
            (pairsim["bucket"] == wdf["bucket"])
            & (pairsim["cid"] == wdf["wid"]),
        ).select(
            pairsim["bucket"],
            F.col("pid").alias("id"),
            F.col("s").alias("ws"),
        )
        # LEFT join: a bucket that ran out of candidates keeps its
        # points (with cur unchanged — the null winner-sim coalesces
        # to 0 and cur >= 0) instead of silently dropping them.
        cur = (
            cur.join(wsim, ["bucket", "id"], "left")
            .select(
                "bucket",
                "id",
                F.greatest(
                    F.col("cur"),
                    F.coalesce(F.col("ws"), F.lit(0).cast("long")),
                ).alias("cur"),
            )
            .localCheckpoint(eager=True)
        )

    # ---- round 2: exact greedy over the full corpus, candidates =
    # the bounded local-winner list.  The candidate x corpus similarity
    # frame is computed ONCE (one literal-explode job — the bounded
    # B*k literal list is the sanctioned k-center/IVF-seed shape) and
    # checkpointed; each pick is then an integer join + aggregate, so
    # k picks cost k small plans instead of k giant literal trees.
    # Operand order in _sim_dm is candidate-first, matching both old
    # per-round sites — every double is bit-identical.
    cand_ids = sorted(cand_vecs)
    out: list[tuple[int, int, int, int]] = []
    objective = 0
    if cand_ids:
        cand_arr = F.array(
            *[
                F.struct(
                    F.lit(c).cast("long").alias("cid"),
                    F.array(
                        *[F.lit(x) for x in cand_vecs[c]]
                    ).cast("array<double>").alias("cv"),
                    F.lit(cand_norms[c]).alias("cnr"),
                )
                for c in cand_ids
            ]
        )
        cs = (
            pts.select("id", "v", "nr", F.explode(cand_arr).alias("c"))
            .select(
                "id",
                F.col("c.cid").alias("cid"),
                _sim_dm(
                    F.col("c.cv"), F.col("v"), F.col("c.cnr"), F.col("nr")
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
        cur2 = pts.select(
            "id", F.lit(0).cast("long").alias("cur")
        ).localCheckpoint(eager=True)
        for rank in range(1, k + 1):
            chosen = {o[1] for o in out}
            remaining = [c for c in cand_ids if c not in chosen]
            if not remaining:
                break
            gains = (
                cs.where(F.col("cid").isin(remaining))
                .join(cur2, "id")
                .select(
                    "cid",
                    F.greatest(
                        F.col("s") - F.col("cur"), F.lit(0).cast("long")
                    ).alias("t"),
                )
                .groupBy("cid")
                .agg(F.sum("t").alias("g"))
            )
            win = (
                gains.agg(
                    F.max(
                        F.struct(F.col("g"), (-F.col("cid")).alias("n"))
                    ).alias("m")
                )
                .select((-F.col("m.n")).alias("id"), F.col("m.g").alias("g"))
                .head()
            )
            gain = int(win["g"])
            objective += gain
            out.append((rank, int(win["id"]), gain, objective))
            wsim2 = cs.where(F.col("cid") == int(win["id"])).select(
                "id", F.col("s").alias("ws")
            )
            cur2 = (
                cur2.join(wsim2, "id", "left")
                .select(
                    "id",
                    F.greatest(
                        F.col("cur"),
                        F.coalesce(F.col("ws"), F.lit(0).cast("long")),
                    ).alias("cur"),
                )
                .localCheckpoint(eager=True)
            )

    return spark.createDataFrame(
        [(r, i, g, o / 1e4) for r, i, g, o in out],
        "rank int, vec_id long, gain_dm long, objective double",
    )
