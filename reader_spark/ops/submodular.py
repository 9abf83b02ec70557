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


def _sim_from_dot(dot, nu, nv):
    """round-4 cosine in exact integer 1e-4 units from a PRECOMPUTED
    dot column — division and the HALF_UP rounding stay Spark
    expressions so the integers are bit-identical no matter where the
    dot itself was produced (fold or vectorized sequential sum)."""
    cos = F.try_divide(dot, nu * nv)
    return F.coalesce(
        F.round(F.round(cos, 4) * 10000, 0).cast("long"), F.lit(0)
    )


def _sim_dm(u, v, nu, nv):
    """round-4 cosine in exact integer 1e-4 units, with the two norms
    PRECOMPUTED as columns — same doubles as computing them inline
    (identical expression tree per value), a third of the per-pair
    aggregate work (the 62s->20s bench finding at sf0.1)."""
    return _sim_from_dot(_dot(u, v), nu, nv)


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
    def _bucket_pair_dots(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["id"].to_numpy()
        V = np.array(pdf["v"].tolist(), dtype=np.float64)
        nr = pdf["nr"].to_numpy()
        n_b, d = V.shape
        # Sequential accumulation over positions — the SAME IEEE op
        # order as the zip_with/aggregate fold (((0+u0·v0)+u1·v1)+…),
        # so every dot double is bit-identical; only vectorized across
        # the n_b² pairs (guide §4.2). Division + HALF_UP rounding stay
        # Spark expressions below.
        acc = np.zeros((n_b, n_b), dtype=np.float64)
        for j in range(d):
            acc += V[:, j, None] * V[None, :, j]
        return pd.DataFrame(
            {
                "bucket": pdf["bucket"].iloc[0],
                "cid": np.repeat(ids, n_b),
                "pid": np.tile(ids, n_b),
                "dot": acc.ravel(),
                "cnr": np.repeat(nr, n_b),
                "pnr": np.tile(nr, n_b),
            }
        )

    pairsim = (
        pts.groupBy("bucket")
        .applyInPandas(
            _bucket_pair_dots,
            "bucket long, cid long, pid long, dot double, "
            "cnr double, pnr double",
        )
        .select(
            "bucket",
            "cid",
            "pid",
            _sim_from_dot(
                F.col("dot"), F.col("cnr"), F.col("pnr")
            ).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    # Round 1 runs the bucket-local greedy WHERE the data is: one
    # applyInPandas task per bucket over the exact-integer pair sims —
    # literally GreeDi's "greedy on each machine" step (Mirzasoleiman
    # 2013 §3), with the k elections as pure int64 numpy over the SAME
    # pairsim longs the per-round join form consumed, so every gain,
    # tie-break and pick is bit-identical. This replaces ~3 driver-
    # synchronized jobs per pick (gains join, winners collect, cur
    # checkpoint — the dominant cost of the op at every scale: the
    # per-pick frames are tiny but each pays full job latency) with ONE
    # job total. Bucket state is n_b^2 longs — the same bound the
    # checkpointed pairsim already imposed.
    def _bucket_greedy(pdf):
        import numpy as np
        import pandas as pd

        cids = np.sort(pdf["cid"].unique())
        idx = {c: i for i, c in enumerate(cids)}
        n_b = len(cids)
        S = np.zeros((n_b, n_b), dtype=np.int64)
        S[
            pdf["cid"].map(idx).to_numpy(),
            pdf["pid"].map(idx).to_numpy(),
        ] = pdf["s"].to_numpy()
        cur = np.zeros(n_b, dtype=np.int64)
        taken = np.zeros(n_b, dtype=bool)
        out = []
        for _ in range(min(k, n_b)):
            gains = np.maximum(S - cur[None, :], 0).sum(axis=1)
            gains[taken] = -1  # picked cids never re-elected
            w = int(np.argmax(gains))  # first max = smallest cid (sorted)
            taken[w] = True
            out.append(int(cids[w]))
            cur = np.maximum(cur, S[w])
        return pd.DataFrame(
            {"bucket": pdf["bucket"].iloc[0], "id": out}
        )

    winners = (
        pairsim.groupBy("bucket")
        .applyInPandas(_bucket_greedy, "bucket long, id long")
        .join(pts.select("bucket", "id", "v", "nr"), ["bucket", "id"])
        .collect()
    )
    cand_vecs: dict[int, list[float]] = {}
    cand_norms: dict[int, float] = {}
    for r in winners:
        cand_vecs[int(r["id"])] = list(r["v"])
        cand_norms[int(r["id"])] = float(r["nr"])

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
            .localCheckpoint(eager=False)
        )
        cur2 = pts.select(
            "id", F.lit(0).cast("long").alias("cur")
        ).localCheckpoint(eager=False)
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
                .localCheckpoint(eager=False)
            )

    return spark.createDataFrame(
        [(r, i, g, o / 1e4) for r, i, g, o in out],
        "rank int, vec_id long, gain_dm long, objective double",
    )
