"""rel=canonical chain resolution (ops/canonical.py, pointer doubling
with cycle detection)."""

import pytest

from reader_spark.ops.canonical import resolve_canonical_chains


def _resolve(spark, pairs, rounds=4):
    df = spark.createDataFrame(pairs, "url string, canonical string")
    return {
        r["url"]: r
        for r in resolve_canonical_chains(df, rounds=rounds).collect()
    }


def test_chain_resolves_to_terminal_with_depth(spark):
    got = _resolve(
        spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", None)]
    )
    assert (got["a"]["canonical_url"], got["a"]["depth"]) == ("d", 3)
    assert (got["b"]["canonical_url"], got["b"]["depth"]) == ("d", 2)
    assert got["c"]["status"] == "resolved"
    assert (got["d"]["status"], got["d"]["depth"]) == ("root", 0)


def test_cycle_flags_and_never_self_elects(spark):
    got = _resolve(
        spark, [("a", "b"), ("b", "a"), ("lead", "a"), ("r", None)]
    )
    for u in ("a", "b", "lead"):
        assert got[u]["status"] == "cycle"
        assert got[u]["canonical_url"] is None
        assert got[u]["depth"] is None
    assert got["r"]["status"] == "root"


def test_dangling_target_resolves_as_uncrawled_terminal(spark):
    got = _resolve(spark, [("a", "ghost"), ("b", "a")])
    assert got["a"] ["canonical_url"] == "ghost"
    assert got["a"]["status"] == "resolved"
    assert (got["b"]["canonical_url"], got["b"]["depth"]) == ("ghost", 2)
    assert "ghost" not in got  # implicit roots stay internal


def test_self_pointer_is_root(spark):
    got = _resolve(spark, [("a", "a")])
    assert (got["a"]["status"], got["a"]["depth"]) == ("root", 0)


def test_depth_beyond_doubling_reach_flags_not_wrong(spark):
    # a 5-hop chain with rounds=2 (reach 4): the unreached row must
    # not claim a wrong terminal
    chain = [(f"n{i}", f"n{i+1}") for i in range(5)] + [("n5", None)]
    got = _resolve(spark, chain, rounds=2)
    assert got["n1"]["canonical_url"] == "n5"  # 4 hops: reached
    assert got["n0"]["status"] == "cycle"  # flagged unreachable, not wrong


def test_rounds_validated(spark):
    with pytest.raises(ValueError):
        resolve_canonical_chains(None, rounds=0)


def test_registry_and_oracle(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["canonical_chains"](
        spark, "/root/testdata/sf0.001"
    )
    assert df.columns == ["url", "canonical_url", "status", "depth"]
    assert "canonical_chains" in entrymod.oracle_sql()
