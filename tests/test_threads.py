"""Reply-forest flattening (ops/threads.py): pointer-doubling chains
vs hand-walked expectations, orphan and depth-cap truncation."""

from pyspark.sql import functions as F

from reader_spark.ops.threads import thread_chains

ROWS = [
    (0, None, "user", "t0"),
    (1, 0, "assistant", "t1"),
    (2, 0, "assistant", "t2"),
    (3, 1, "user", "t3"),
    (4, 3, "assistant", "t4"),
    (10, None, "user", "t10"),
    (20, 99, "user", "t20"),  # orphan: parent 99 missing
]
SCHEMA = "msg_id long, parent_id long, role string, text string"


def _chains(df, **kw):
    out = {}
    for r in thread_chains(df, **kw).collect():
        out.setdefault(r["chain_id"], []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r["pos"])
    return out


def test_thread_chains_full_paths(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _chains(df, max_depth=16)
    # leaves: 2, 4, 10, 20 (0, 1, 3 are parents)
    assert set(got) == {2, 4, 10, 20}
    assert [r["msg_id"] for r in got[4]] == [0, 1, 3, 4]
    assert [r["pos"] for r in got[4]] == [0, 1, 2, 3]
    assert all(r["root_id"] == 0 and r["depth"] == 4 for r in got[4])
    assert not got[4][0]["truncated"]
    assert [r["msg_id"] for r in got[2]] == [0, 2]
    assert [r["text"] for r in got[10]] == ["t10"]


def test_thread_chains_orphan_flagged_not_dropped(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _chains(df, max_depth=16)
    assert [r["msg_id"] for r in got[20]] == [20]
    assert got[20][0]["truncated"]
    assert got[20][0]["root_id"] == 20  # truncation point, not a root


def test_thread_chains_depth_cap_keeps_leaf_side(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _chains(df, max_depth=2)
    assert [r["msg_id"] for r in got[4]] == [3, 4]  # most recent two
    assert got[4][0]["truncated"] and got[4][0]["depth"] == 2
    assert got[4][0]["root_id"] == 3  # the truncation point
    assert not got[2][0]["truncated"]  # depth 2 fits exactly


def test_thread_chains_deep_chain_log_rounds(spark):
    # a 12-deep linked list resolves with ceil(log2(16)) = 4 doubling
    # rounds; verify the full path and that no truncation fires.
    rows = [(i, None if i == 0 else i - 1, "user", f"m{i}") for i in range(12)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = _chains(df, max_depth=16)
    assert set(got) == {11}
    assert [r["msg_id"] for r in got[11]] == list(range(12))
    assert not got[11][0]["truncated"]


def test_thread_chains_plan_no_cartesian(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = df.sparkSession._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        thread_chains(df)._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
