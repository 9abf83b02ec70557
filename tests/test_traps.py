"""Crawl-trap detection (ops/traps.py)."""

from pyspark.sql import Row

from reader_spark.ops.traps import trap_signals


def _ledger(spark):
    rows = []
    # trap.example: 4 calendar/session URLs, ONE digest
    for i in range(4):
        rows.append(
            Row(
                host="trap.example",
                url=f"https://trap.example/cal/2020-0{i + 1}/?sid=s{i}",
                digest="dup",
            )
        )
    # clean.example: 4 unique plain URLs, unique digests
    for i in range(4):
        rows.append(
            Row(
                host="clean.example",
                url=f"https://clean.example/p/{i}",
                digest=f"d{i}",
            )
        )
    # deep.example: unique content but 9-deep paths
    for i in range(2):
        rows.append(
            Row(
                host="deep.example",
                url="https://deep.example/" + "d/" * 9 + str(i),
                digest=f"x{i}",
            )
        )
    return spark.createDataFrame(rows)


def test_signals_hand_computed(spark):
    rows = {r["host"]: r for r in trap_signals(_ledger(spark)).collect()}
    t = rows["trap.example"]
    assert (t["n_urls"], t["n_digests"]) == (4, 1)
    assert t["dup_milli"] == 750
    assert t["query_milli"] == 1000
    assert t["date_milli"] == 1000
    # 500*750/1000 + 200*1000/1000 + 150*1000/1000 = 375+200+150 = 725
    assert t["trap_milli"] == 725
    assert t["trap_suspect"]

    c = rows["clean.example"]
    assert (c["dup_milli"], c["query_milli"], c["date_milli"]) == (0, 0, 0)
    assert c["trap_milli"] == 0
    assert not c["trap_suspect"]


def test_depth_rule_alone_is_not_enough(spark):
    rows = {r["host"]: r for r in trap_signals(_ledger(spark)).collect()}
    d = rows["deep.example"]
    assert d["depth_max"] >= 8
    # unique content, no queries, no dates: only the +150 depth term
    assert d["trap_milli"] == 150
    assert not d["trap_suspect"]


def test_registry_and_plan(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    assert "crawl_trap_signals" in qs
    assert "crawl_trap_signals" in entrymod.oracle_sql()
    df = qs["crawl_trap_signals"](spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan
    rows = {r["host"]: r for r in df.collect()}
    assert len(rows) == 20
    # even-numbered hosts are the planted traps
    for host, r in rows.items():
        if int(host[3:]) % 2 == 0:
            assert r["trap_suspect"], host
        else:
            assert not r["trap_suspect"], host


def test_crawl_priority_composition(spark):
    """The composed flagship joins the three certified layers; traps
    must zero out (or heavily damp) even-host priority."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    assert "crawl_priority" in qs
    assert "crawl_priority" in entrymod.oracle_sql()
    rows = {
        r["source"]: r
        for r in qs["crawl_priority"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert len(rows) == 20
    for source, r in rows.items():
        expected = (
            (r["shrunk_milli"] * r["lam_mean_milli"]) // 1000
            * (1000 - min(r["trap_milli"], 1000))
        ) // 1000
        assert r["priority_milli"] == expected, source
        if int(source[3:]) % 2 == 0:  # planted trap hosts
            assert r["trap_milli"] >= 400
            assert r["priority_milli"] <= expected  # damped
