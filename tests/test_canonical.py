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


class TestHreflang:
    """hreflang reciprocity audit + language-edition clusters
    (ops/hreflang.py)."""

    def _decl(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, hreflang string, href string"
        )

    def _trio(self, missing_return=False, wrong_label=False):
        # pages a(en) b(de) c(fr), full cross-annotation + selves
        rows = []
        langs = {"a": "en", "b": "de", "c": "fr"}
        for u in "abc":
            if missing_return and u == "c":
                rows.append((u, langs[u], u))  # fr declares only itself
                continue
            for h in "abc":
                lang = langs[h]
                if wrong_label and u == "a" and h == "c":
                    lang = "de"
                rows.append((u, lang, h))
        return rows

    def test_reciprocal_trio_clusters_with_languages(self, spark):
        from reader_spark.ops.hreflang import hreflang_editions

        got = {
            r["url"]: r
            for r in hreflang_editions(
                self._decl(spark, self._trio())
            ).collect()
        }
        assert {got[u]["cluster"] for u in "abc"} == {"a"}
        assert [got[u]["lang"] for u in "abc"] == ["en", "de", "fr"]
        assert not any(got[u]["lang_conflict"] for u in "abc")

    def test_missing_return_drops_member_and_is_reported(self, spark):
        from reader_spark.ops.hreflang import (
            hreflang_audit,
            hreflang_editions,
        )

        decl = self._decl(spark, self._trio(missing_return=True))
        audit = hreflang_audit(decl).collect()
        statuses = {
            (r["url"], r["href"]): r["status"] for r in audit
        }
        assert statuses[("a", "c")] == "missing_return"
        assert statuses[("b", "c")] == "missing_return"
        assert statuses[("a", "b")] == "reciprocal"
        assert statuses[("a", "a")] == "self"
        eds = hreflang_editions(decl).collect()
        assert {r["url"] for r in eds} == {"a", "b"}  # c unclustered

    def test_duplicate_language_conflict_flags_both_rows(self, spark):
        from reader_spark.ops.hreflang import hreflang_editions

        got = {
            r["url"]: r
            for r in hreflang_editions(
                self._decl(spark, self._trio(wrong_label=True))
            ).collect()
        }
        # c's inbound labels are {'de' (mislabeled), 'fr'}: min -> 'de'
        assert got["c"]["lang"] == "de"
        assert got["b"]["lang"] == "de"
        assert got["b"]["lang_conflict"] and got["c"]["lang_conflict"]
        assert not got["a"]["lang_conflict"]

    def test_registry_and_oracle(self, spark):
        import __spark_entry__ as entrymod

        o = entrymod.oracle_sql()
        q = entrymod.queries()
        for k in ("hreflang_audit", "hreflang_editions"):
            assert k in o and k in q


class TestPhraseSearch:
    """Positional phrase search (ops/search.phrase_search)."""

    def _search(self, spark, texts, phrase):
        from pyspark.sql import Row

        from reader_spark.ops.search import phrase_search

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        return {
            r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in phrase_search(df, phrase).collect()
        }

    def test_exact_offsets_and_counts(self, spark):
        got = self._search(
            spark,
            [
                "the quick brown fox",          # match at 1
                "quick brown fox quick brown fox",  # two matches
                "quick brown wolf",             # no
                "brown fox quick",              # wrong order: no
            ],
            "quick brown fox",
        )
        assert got == {0: (1, 1), 1: (2, 0)}

    def test_tokenization_beats_raw_regex(self, spark):
        # punctuation and case between tokens must not break the match
        got = self._search(
            spark, ["Quick, BROWN... fox!"], "quick brown fox"
        )
        assert got == {0: (1, 0)}

    def test_repeated_word_in_phrase(self, spark):
        got = self._search(
            spark,
            ["the cat the hat", "the cat cat hat"],
            "the cat the",
        )
        assert got == {0: (1, 0)}

    def test_empty_phrase_rejected(self, spark):
        import pytest as _pytest

        from reader_spark.ops.search import phrase_search

        with _pytest.raises(ValueError):
            phrase_search(None, "   ")

    def test_registry_and_oracle(self, spark):
        import __spark_entry__ as entrymod

        assert "phrase_search" in entrymod.queries()
        assert "phrase_search" in entrymod.oracle_sql()


class TestLptShards:
    """LPT shard balancing (ops/lpt.py, Graham 1969)."""

    def _lpt(self, spark, sizes, shards):
        from reader_spark.ops.lpt import lpt_shard_assignment

        df = spark.createDataFrame(
            list(sizes.items()), "group string, size long"
        )
        return {
            r["group"]: r
            for r in lpt_shard_assignment(df, shards=shards).collect()
        }

    def test_textbook_two_machine_schedule(self, spark):
        got = self._lpt(
            spark, {"a": 10, "b": 7, "c": 6, "d": 5, "e": 4}, 2
        )
        assert got["a"]["shard"] == 0 and got["a"]["load_after"] == 10
        assert got["b"]["shard"] == 1
        assert got["c"]["shard"] == 1  # lightest was s1 (7 < 10)
        assert got["d"]["shard"] == 0
        assert got["e"]["shard"] == 1
        # makespan 17 vs total/2 = 16: within the 4/3 bound
        loads = [0, 0]
        for r in got.values():
            loads[r["shard"]] += r["size"]
        assert max(loads) == 17

    def test_equal_sizes_tie_on_group_then_lowest_shard(self, spark):
        got = self._lpt(spark, {"x": 5, "y": 5, "z": 5}, 3)
        # LPT order x,y,z; each lands on the next empty (lowest) shard
        assert (got["x"]["shard"], got["y"]["shard"], got["z"]["shard"]) == (
            0,
            1,
            2,
        )

    def test_one_shard_serializes(self, spark):
        got = self._lpt(spark, {"a": 3, "b": 2}, 1)
        assert got["a"]["load_after"] == 3
        assert got["b"]["load_after"] == 5

    def test_shards_validated(self, spark):
        import pytest as _pytest

        from reader_spark.ops.lpt import lpt_shard_assignment

        with _pytest.raises(ValueError):
            lpt_shard_assignment(None, shards=0)

    def test_registry_and_oracle(self, spark):
        import __spark_entry__ as entrymod

        assert "lpt_shards" in entrymod.queries()
        assert "lpt_shards" in entrymod.oracle_sql()


class TestBm25f:
    """BM25F field-weighted ranking (ops/search.bm25f_rank,
    Robertson 2004)."""

    def _rank(self, spark, rows, terms, **kw):
        from reader_spark.ops.search import bm25f_rank

        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, anchor string"
        )
        return [
            (r["doc_id"], r["score"])
            for r in bm25f_rank(df, terms, **kw).collect()
        ]

    def test_anchor_hit_outranks_equal_body_hit(self, spark):
        rows = [
            (0, "stream in the body once", ""),
            (1, "nothing relevant here at all", "stream"),
            (2, "totally unrelated filler words", ""),
        ]
        got = self._rank(spark, rows, ["stream"])
        assert [i for i, _ in got] == [1, 0]  # anchor weight 2.5 wins

    def test_fusion_before_saturation(self, spark):
        # one term mediocre in BOTH fields must beat per-field-saturated
        # scoring's tendency to flatten: doc 0 (both fields) > doc 1
        # (body only, same body tf)
        rows = [
            (0, "query words query words", "query"),
            (1, "query words query words", ""),
            (2, "plain filler text here now", ""),
        ]
        got = self._rank(spark, rows, ["query"])
        assert got[0][0] == 0 and got[1][0] == 1
        assert got[0][1] > got[1][1]

    def test_empty_anchor_corpus_degrades_to_body_ranking(self, spark):
        from reader_spark.ops.search import bm25_rank, bm25f_rank

        rows = [
            (0, "stream window query mix", ""),
            (1, "stream stream stream stream", ""),
            (2, "window only text", ""),
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, anchor string"
        )
        f_ids = [
            r["doc_id"]
            for r in bm25f_rank(df, ["stream", "window"]).collect()
        ]
        b_ids = [
            r["doc_id"]
            for r in bm25_rank(df, ["stream", "window"]).collect()
        ]
        assert f_ids == b_ids  # same ORDER when anchors carry nothing

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.search import bm25f_rank

        with _pytest.raises(ValueError):
            bm25f_rank(None, [])
        with _pytest.raises(ValueError):
            bm25f_rank(None, ["Upper"])

    def test_registry_and_oracle(self, spark):
        import __spark_entry__ as entrymod

        assert "bm25f_search" in entrymod.queries()
        assert "bm25f_search" in entrymod.oracle_sql()
