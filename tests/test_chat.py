"""SFT/chat layer (ops/chat.py): hand-checked template rendering,
loss-mask span geometry, assistant-turn dedup election, and hygiene
stats."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.chat import (
    assistant_turn_dedup,
    chat_stats,
    loss_mask_spans,
    render_chat,
)

pytestmark = pytest.mark.spark


def _turns(spark, rows):
    return spark.createDataFrame(
        [Row(conv_id=c, turn_idx=i, role=r, content=t) for c, i, r, t in rows]
    )


def test_render_hand_checked(spark):
    t = _turns(
        spark,
        [
            (1, 0, "user", "hi"),
            (1, 1, "assistant", "hello!"),
            (2, 0, "user", "x"),
        ],
    )
    got = {r["conv_id"]: r for r in render_chat(t).collect()}
    assert got[1]["chat_text"] == "<|user|>hi<|end|><|assistant|>hello!<|end|>"
    assert got[1]["n_chars"] == len(got[1]["chat_text"])
    assert got[1]["n_turns"] == 2
    assert got[2]["chat_text"] == "<|user|>x<|end|>"


def test_render_order_independent_of_input_order(spark):
    """Turns arriving shuffled still render in turn_idx order."""
    t = _turns(
        spark,
        [(1, 2, "user", "c"), (1, 0, "user", "a"), (1, 1, "assistant", "b")],
    )
    [row] = render_chat(t).collect()
    assert (
        row["chat_text"]
        == "<|user|>a<|end|><|assistant|>b<|end|><|user|>c<|end|>"
    )


def test_loss_mask_spans_slice_back(spark):
    """Each span sliced out of the rendered string recovers the content,
    and trainable marks exactly the assistant turns."""
    rows = [
        (1, 0, "user", "hi"),
        (1, 1, "assistant", "hello!"),
        (1, 2, "user", "more?"),
        (1, 3, "assistant", ""),
    ]
    t = _turns(spark, rows)
    text = render_chat(t).collect()[0]["chat_text"]
    spans = {r["turn_idx"]: r for r in loss_mask_spans(t).collect()}
    for _, i, role, content in rows:
        s = spans[i]
        assert text[s["start_char"] : s["end_char"]] == content
        assert s["trainable"] == (role == "assistant")
    # spans are disjoint and increasing
    ordered = [spans[i] for i in sorted(spans)]
    for a, b in zip(ordered, ordered[1:]):
        assert a["end_char"] <= b["start_char"]


def test_assistant_turn_dedup_election(spark):
    """Whitespace/case variants collapse; canonical = (conv, turn) min;
    user turns never appear."""
    t = _turns(
        spark,
        [
            (1, 0, "user", "q"),
            (1, 1, "assistant", "The  Answer"),
            (2, 1, "assistant", "the answer"),
            (2, 3, "assistant", "unique"),
            (3, 1, "assistant", " THE ANSWER "),
        ],
    )
    got = {(r["conv_id"], r["turn_idx"]): r for r in
           assistant_turn_dedup(t).collect()}
    assert set(got) == {(1, 1), (2, 1), (2, 3), (3, 1)}
    for k in [(1, 1), (2, 1), (3, 1)]:
        assert (got[k]["canon_conv"], got[k]["canon_turn"]) == (1, 1)
        assert got[k]["n_copies"] == 3
    assert got[(1, 1)]["is_canonical"]
    assert not got[(2, 1)]["is_canonical"]
    assert got[(2, 3)]["is_canonical"] and got[(2, 3)]["n_copies"] == 1


def test_chat_stats_flags(spark):
    t = _turns(
        spark,
        [
            # conv 1: well-formed
            (1, 0, "user", "aaaa"),
            (1, 1, "assistant", "bbbb"),
            # conv 2: starts with assistant, double-user, ends user
            (2, 0, "assistant", "x"),
            (2, 1, "user", "y"),
            (2, 2, "user", "z"),
        ],
    )
    got = {r["conv_id"]: r for r in chat_stats(t).collect()}
    c1 = got[1]
    assert (c1["n_turns"], c1["n_user"], c1["n_assistant"]) == (2, 1, 1)
    assert c1["starts_with_user"] and c1["ends_with_assistant"]
    assert c1["alternates"]
    assert c1["assistant_char_milli"] == 500
    c2 = got[2]
    assert not c2["starts_with_user"]
    assert not c2["ends_with_assistant"]
    assert not c2["alternates"]
    assert c2["assistant_char_milli"] == 333


def test_dedup_shuffles_digests_only(spark):
    """Plan check: the exchange before the groupBy carries the md5
    digest and packed id, not the content column."""
    t = _turns(spark, [(1, 1, "assistant", "some long content " * 50)])
    plan = assistant_turn_dedup(t)._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)", plan):
        assert "content" not in m.group(1)
