"""Preference/RLHF layer (ops/preference.py): hand-checked pair
election with tie-breaks, DPO rendering, best-of-n ranks, and the
length-bias histogram math."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.preference import (
    best_of_n,
    dpo_render,
    pair_length_bias,
    preference_pairs,
)

pytestmark = pytest.mark.spark


def _responses(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                prompt_id=p,
                response_id=r,
                prompt=q,
                response=t,
                score_milli=s,
            )
            for p, r, q, t, s in rows
        ]
    )


def test_pairs_election_and_tie_breaks(spark):
    rows = [
        # prompt 1: clear winner/loser plus a tie at the top -> the
        # tied chosen must be the MIN response_id (1, not 2)
        (1, 0, "q1", "mid", 500),
        (1, 1, "q1", "best-a", 900),
        (1, 2, "q1", "best-b", 900),
        (1, 3, "q1", "worst", 100),
        # prompt 2: tie at the bottom -> rejected = min response_id
        (2, 0, "q2", "low-a", 100),
        (2, 1, "q2", "low-b", 100),
        (2, 2, "q2", "high", 700),
        # prompt 3: all scores equal -> no signal, dropped
        (3, 0, "q3", "same-a", 400),
        (3, 1, "q3", "same-b", 400),
    ]
    got = {r["prompt_id"]: r for r in
           preference_pairs(_responses(spark, rows)).collect()}
    assert set(got) == {1, 2}
    p1 = got[1]
    assert (p1["chosen_id"], p1["rejected_id"]) == (1, 3)
    assert (p1["chosen_score"], p1["rejected_score"]) == (900, 100)
    assert p1["margin_milli"] == 800
    p2 = got[2]
    assert (p2["chosen_id"], p2["rejected_id"]) == (2, 0)


def test_dpo_render_template_and_lens(spark):
    rows = [
        (1, 0, "why?", "because of reasons", 900),
        (1, 1, "why?", "no", 100),
    ]
    [r] = dpo_render(_responses(spark, rows)).collect()
    assert r["chosen_text"] == (
        "<|user|>why?<|end|><|assistant|>because of reasons<|end|>"
    )
    assert r["rejected_text"] == "<|user|>why?<|end|><|assistant|>no<|end|>"
    assert r["chosen_len"] == len("because of reasons")
    assert r["rejected_len"] == 2
    assert r["margin_milli"] == 800


def test_best_of_n_ranks(spark):
    rows = [
        (1, 0, "q", "a", 300),
        (1, 1, "q", "b", 900),
        (1, 2, "q", "c", 900),
        (1, 3, "q", "d", 100),
        (2, 0, "q", "e", 500),
    ]
    got = {(r["prompt_id"], r["response_id"]): r["rank"]
           for r in best_of_n(_responses(spark, rows), n=2).collect()}
    # ties rank by min response_id first
    assert got == {(1, 1): 1, (1, 2): 2, (2, 0): 1}


def test_length_bias_histogram(spark):
    rows = [
        # bucket 0 (margin 800 < 5000): chosen longer
        (1, 0, "q", "longer answer", 900),
        (1, 1, "q", "no", 100),
        # bucket 1 (margin 6000): chosen SHORTER
        (2, 0, "q", "yes", 7000),
        (2, 1, "q", "much longer rejected", 1000),
    ]
    pairs = dpo_render(_responses(spark, rows))
    got = {r["margin_bucket"]: r for r in pair_length_bias(pairs).collect()}
    assert got[0]["n_pairs"] == 1
    assert got[0]["n_chosen_longer"] == 1
    assert got[0]["chosen_longer_milli"] == 1000
    assert got[0]["mean_margin_milli"] == 800
    assert got[1]["n_chosen_longer"] == 0
    assert got[1]["chosen_longer_milli"] == 0
    assert got[1]["mean_margin_milli"] == 6000


def test_negative_or_oversized_ids_guarded(spark):
    """Rows violating the packing preconditions are excluded, not
    silently mis-elected."""
    rows = [
        (1, 0, "q", "ok-low", 100),
        (1, 1, "q", "ok-high", 900),
        (1, 2_000_000, "q", "overflow-id", 950),
        (1, -1, "q", "negative-id", 999),
    ]
    [p] = preference_pairs(_responses(spark, rows)).collect()
    assert (p["chosen_id"], p["rejected_id"]) == (1, 0)
