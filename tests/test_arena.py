"""Arena layer (ops/arena.py): integer Bradley-Terry MM vs a pure-Python
reference, judge position bias, and exact Fleiss' kappa."""

import random
from collections import defaultdict

from reader_spark.ops.arena import (
    bt_ratings,
    fleiss_kappa,
    position_bias,
    win_matrix,
)

MICRO = 10**6
S9 = 10**9


def _battles(seed=3, n=600, n_models=5):
    rng = random.Random(seed)
    models = [f"m{i}" for i in range(n_models)]
    skill = {m: 100 + 120 * i for i, m in enumerate(models)}
    rows = []
    for g in range(n):
        a, b = rng.sample(models, 2)
        win_a = 1 if rng.random() < skill[a] / (skill[a] + skill[b]) else 0
        rows.append((a, b, f"j{g % 4}", win_a))
    return models, rows


def _py_bt(rows, models, iters=3):
    """The same integer MM recurrence, in plain Python."""
    nij = defaultdict(int)
    games = defaultdict(int)
    dwins = defaultdict(int)
    for a, b, _, w in rows:
        lo, hi = min(a, b), max(a, b)
        nij[(lo, hi)] += 1
        games[a] += 1
        games[b] += 1
        dwins[a if w == 1 else b] += 1
    dir_n = defaultdict(int)
    for (lo, hi), n in nij.items():
        dir_n[(lo, hi)] += n
        dir_n[(hi, lo)] += n
    p = {m: MICRO for m in models}
    for _ in range(iters):
        p = {
            m: max(
                1,
                dwins[m]
                * S9
                // sum(
                    n * S9 // (p[m] + p[o])
                    for (mm, o), n in dir_n.items()
                    if mm == m
                ),
            )
            for m in models
        }
    anchor = p[min(models)]
    return {
        m: (games[m], dwins[m], p[m], p[m] * 1000 // anchor) for m in models
    }


def test_bt_ratings_match_python_reference(spark):
    models, rows = _battles()
    df = spark.createDataFrame(
        rows, "model_a string, model_b string, judge string, win_a int"
    )
    got = {
        r["model"]: (r["n_games"], r["wins"], r["p_micro"], r["rating_milli"])
        for r in bt_ratings(df, iters=3).collect()
    }
    assert got == _py_bt(rows, models)


def test_bt_ratings_recover_skill_order(spark):
    models, rows = _battles(seed=11, n=1500)
    df = spark.createDataFrame(
        rows, "model_a string, model_b string, judge string, win_a int"
    )
    got = {r["model"]: r["p_micro"] for r in bt_ratings(df).collect()}
    ordered = [got[m] for m in models]  # skill increases with index
    assert ordered == sorted(ordered)
    assert got["m0"] < got["m4"] // 3  # a real spread, not noise


def test_win_matrix_and_position_bias_counts(spark):
    rows = [
        ("a", "b", "j0", 1),
        ("a", "b", "j0", 0),
        ("b", "a", "j1", 1),
        ("a", "c", "j1", 1),
    ]
    df = spark.createDataFrame(
        rows, "model_a string, model_b string, judge string, win_a int"
    )
    wm = {
        (r["model"], r["opponent"]): (r["n_games"], r["wins"], r["win_rate_milli"])
        for r in win_matrix(df).collect()
    }
    # a beat b once of two as first, b beat a as first once -> a 1/3 vs b
    assert wm[("a", "b")] == (3, 1, 333)
    assert wm[("b", "a")] == (3, 2, 666)
    assert wm[("a", "c")] == (1, 1, 1000)
    assert wm[("c", "a")] == (1, 0, 0)
    pb = {
        r["judge"]: (r["n_games"], r["first_wins"], r["first_win_milli"])
        for r in position_bias(df).collect()
    }
    assert pb == {"j0": (2, 1, 500), "j1": (2, 2, 1000)}


def test_fleiss_kappa_exact_and_drops_variable_raters(spark):
    rows = []
    for it in range(60):
        for r in range(3):
            cat = (it % 4 + (1 if (it + r) % 5 == 0 else 0)) % 4
            rows.append((it, f"r{r}", f"c{cat}"))
    rows += [(100, "r0", "c0"), (101, "r0", "c1"), (101, "r1", "c2")]
    # an exact duplicate label row must collapse, not inflate a rater count
    df = spark.createDataFrame(
        rows + [rows[0]], "item_id long, rater_id string, category string"
    )
    out = fleiss_kappa(df, n_raters=3).collect()[0]

    cnt = defaultdict(lambda: defaultdict(int))
    for it, _, c in rows:
        cnt[it][c] += 1
    kept = {it: v for it, v in cnt.items() if sum(v.values()) == 3}
    n_items, n = len(kept), 3
    a_mom = sum(x * x for v in kept.values() for x in v.values())
    po_num, po_den = a_mom - n_items * n, n_items * n * (n - 1)
    ck = defaultdict(int)
    for v in kept.values():
        for c, x in v.items():
            ck[c] += x
    pe_num, pe_den = sum(x * x for x in ck.values()), (n_items * n) ** 2
    kappa = (po_num * pe_den - pe_num * po_den) / (
        po_den * (pe_den - pe_num)
    )
    assert out["n_items"] == n_items
    assert out["n_items_dropped"] == 2
    assert (out["po_num"], out["po_den"]) == (po_num, po_den)
    assert (out["pe_num"], out["pe_den"]) == (pe_num, pe_den)
    assert abs(out["kappa"] - kappa) < 1e-12


def test_fleiss_kappa_perfect_agreement_is_one(spark):
    rows = [
        (it, f"r{r}", f"c{it % 3}") for it in range(20) for r in range(3)
    ]
    df = spark.createDataFrame(
        rows, "item_id long, rater_id string, category string"
    )
    assert fleiss_kappa(df).collect()[0]["kappa"] == 1.0


def test_fleiss_kappa_single_category_is_null(spark):
    rows = [(it, f"r{r}", "c0") for it in range(5) for r in range(3)]
    df = spark.createDataFrame(
        rows, "item_id long, rater_id string, category string"
    )
    assert fleiss_kappa(df).collect()[0]["kappa"] is None


def test_bt_ratings_plan_broadcasts_ratings_dim(spark):
    rows = [("a", "b", "j0", 1), ("b", "c", "j0", 0), ("c", "a", "j1", 1)]
    df = spark.createDataFrame(
        rows, "model_a string, model_b string, judge string, win_a int"
    )
    plan = df.sparkSession._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        bt_ratings(df)._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan  # MM iterations join broadcast dims
    assert "CartesianProduct" not in plan
    # battle reduction is map-side combined
    assert plan.count("HashAggregate") >= 2


def test_krippendorff_alpha_matches_fractions_reference(spark):
    from fractions import Fraction

    from reader_spark.ops.arena import krippendorff_alpha

    rows = []
    for it in range(40):
        m = 2 + it % 3  # variable raters: 2, 3, 4 — all usable
        for r in range(m):
            cat = (it % 3 + (1 if (it + r) % 4 == 0 else 0)) % 3
            rows.append((it, f"r{r}", f"c{cat}"))
    rows.append((900, "r0", "c0"))  # single-rated -> dropped
    df = spark.createDataFrame(
        rows, "item_id long, rater_id string, category string"
    )
    out = krippendorff_alpha(df).collect()[0]

    cnt = defaultdict(lambda: defaultdict(int))
    for it, _, c in rows:
        cnt[it][c] += 1
    kept = {it: v for it, v in cnt.items() if sum(v.values()) >= 2}
    n = sum(sum(v.values()) for v in kept.values())
    d_o = sum(
        Fraction(
            sum(x * (sum(v.values()) - x) for x in v.values()),
            sum(v.values()) - 1,
        )
        for v in kept.values()
    ) / n
    pooled = defaultdict(int)
    for v in kept.values():
        for c, x in v.items():
            pooled[c] += x
    d_e = Fraction(n * n - sum(x * x for x in pooled.values()), n * (n - 1))
    alpha = 1 - d_o / d_e
    assert out["n_items_used"] == len(kept)
    assert out["n_items_single"] == 1
    assert out["n_pairable"] == n
    assert abs(out["alpha"] - float(alpha)) < 1e-12


def test_krippendorff_alpha_perfect_and_degenerate(spark):
    from reader_spark.ops.arena import krippendorff_alpha

    perfect = spark.createDataFrame(
        [(it, f"r{r}", f"c{it % 2}") for it in range(10) for r in range(3)],
        "item_id long, rater_id string, category string",
    )
    assert krippendorff_alpha(perfect).collect()[0]["alpha"] == 1.0
    one_cat = spark.createDataFrame(
        [(it, f"r{r}", "c0") for it in range(5) for r in range(2)],
        "item_id long, rater_id string, category string",
    )
    assert krippendorff_alpha(one_cat).collect()[0]["alpha"] is None
