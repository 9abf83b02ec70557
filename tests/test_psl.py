"""Public-suffix-list registrable-domain extraction (ops/psl.py,
publicsuffix.org algorithm)."""

from reader_spark.ops.psl import registrable_domain


def _run(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return {
        r["host"]: (r["public_suffix"], r["registrable_domain"])
        for r in registrable_domain(df).collect()
    }


def test_multi_label_suffix_beats_tld(spark):
    got = _run(spark, ["www.example.co.uk", "example.uk"])
    assert got["www.example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["example.uk"] == ("uk", "example.uk")


def test_bare_public_suffix_has_no_registrable_domain(spark):
    got = _run(spark, ["co.uk", "com"])
    assert got["co.uk"] == ("co.uk", None)
    assert got["com"] == ("com", None)


def test_wildcard_rule_consumes_one_extra_label(spark):
    got = _run(spark, ["a.b.zone.ck", "zone.ck"])
    # *.ck: 'zone.ck' is itself a public suffix
    assert got["zone.ck"] == ("zone.ck", None)
    assert got["a.b.zone.ck"] == ("zone.ck", "b.zone.ck")


def test_exception_rule_overrides_wildcard(spark):
    got = _run(spark, ["www.ck", "sub.www.ck"])
    # !www.ck: www.ck is its OWN registrable domain under suffix ck
    assert got["www.ck"] == ("ck", "www.ck")
    assert got["sub.www.ck"] == ("ck", "www.ck")


def test_private_section_entry(spark):
    got = _run(spark, ["alice.github.io", "github.io"])
    assert got["alice.github.io"] == ("github.io", "alice.github.io")
    assert got["github.io"] == ("github.io", None)


def test_default_rule_for_unknown_tld(spark):
    got = _run(spark, ["foo.bar.unknowntld", "localhost"])
    assert got["foo.bar.unknowntld"] == ("unknowntld", "bar.unknowntld")
    assert got["localhost"] == ("localhost", None)


def test_case_folding_and_degenerate_hosts(spark):
    got = _run(spark, ["WWW.Example.COM", ""])
    assert got["WWW.Example.COM"] == ("com", "example.com")
    assert got[""] == (None, None)


def test_input_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, "a.example.com")], "rid bigint, host string"
    )
    out = registrable_domain(df)
    assert out.columns == [
        "rid",
        "host",
        "public_suffix",
        "registrable_domain",
    ]


def test_registry_and_oracle(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["registrable_domains"](
        spark, "/root/testdata/sf0.001"
    )
    assert df.columns == [
        "doc_id",
        "host",
        "public_suffix",
        "registrable_domain",
    ]
    o = entrymod.oracle_sql()
    assert "registrable_domains" in o and "pld_rollup" in o


class TestRobotsMetaGate:
    """Page-level REP directive semantics (ops/robotstxt.
    robots_meta_gate)."""

    def _gate(self, spark, values):
        from pyspark.sql import Row

        from reader_spark.ops.robotstxt import robots_meta_gate

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(values)],
            "doc_id bigint, robots string",
        )
        return {
            r["doc_id"]: r for r in robots_meta_gate(df).collect()
        }

    def test_directive_vocabulary(self, spark):
        got = self._gate(
            spark,
            [
                "index, follow",       # 0: permissive
                "NOINDEX , NoFollow",  # 1: case + space noise
                "none",                # 2: expands to both
                "all",                 # 3: no-op token
                None,                  # 4: absent tag permits all
                "noarchive,max-snippet:-1",  # 5: unknown ignored
            ],
        )
        assert (got[0]["noindex"], got[0]["nofollow"]) == (False, False)
        assert (got[1]["noindex"], got[1]["nofollow"]) == (True, True)
        assert (got[2]["noindex"], got[2]["nofollow"]) == (True, True)
        assert (got[3]["noindex"], got[3]["indexable"]) == (False, True)
        assert (got[4]["noindex"], got[4]["indexable"]) == (False, True)
        assert (got[5]["noarchive"], got[5]["noindex"]) == (True, False)

    def test_indexable_is_the_negation(self, spark):
        got = self._gate(spark, ["noindex", "follow"])
        assert got[0]["indexable"] is False
        assert got[1]["indexable"] is True

    def test_registry_and_oracle(self, spark):
        import __spark_entry__ as entrymod

        df = entrymod.queries()["robots_meta_gate"](
            spark, "/root/testdata/sf0.001"
        )
        assert df.columns == [
            "doc_id",
            "robots",
            "noindex",
            "nofollow",
            "noarchive",
            "indexable",
        ]
        assert "robots_meta_gate" in entrymod.oracle_sql()
