"""Property-based robustness tests (hypothesis): the extractor must never
crash on arbitrary input — failed docs become error ROWS, not exceptions
(a thrown executor error would kill the batch, SURVEY.md §1.1)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from reader_spark.extract.pipeline import extract_document
from reader_spark.extract.postprocess import postprocess_markdown
from reader_spark.functions.urls import get_url_key, resolve_url
from reader_spark.htmlkit.dom import parse_html, parse_html_stdlib

text_ish = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)

html_ish = st.recursive(
    text_ish,
    lambda inner: st.builds(
        lambda tag, attrs, body: f"<{tag}{attrs}>{body}</{tag}>",
        st.sampled_from(["div", "p", "a", "ul", "li", "table", "tr", "td",
                         "script", "img", "h1", "main", "nav", "b"]),
        st.sampled_from(["", ' href="/x"', ' class="c"', " src='/i.png'",
                         ' data-x="<&>"', " broken='", ' id=x']),
        st.deferred(lambda: inner),
    ),
    max_leaves=12,
)


class TestParserNeverRaises:
    @given(html_ish)
    @settings(max_examples=300, deadline=None)
    def test_parse_any_markup(self, html):
        doc = parse_html(html)
        assert doc.tag == "#document"
        # Serialization round-trip must also never raise.
        doc.to_html()

    @given(text_ish)
    @settings(max_examples=200, deadline=None)
    def test_parse_arbitrary_text(self, text):
        assert parse_html(text) is not None

    @given(html_ish)
    @settings(max_examples=150, deadline=None)
    def test_fast_parser_text_agrees_with_stdlib(self, html):
        """Both builders must extract the same visible text (modulo
        whitespace) for well-formed-ish markup without stray '<'."""
        if "<" in html.replace("><", "|").split(">")[-1]:
            return
        fast = " ".join(parse_html(html).text_content().split())
        slow = " ".join(parse_html_stdlib(html).text_content().split())
        if fast != slow:
            # Divergence allowed only for pathological unclosed-attr inputs.
            assert "='" in html or '="' in html or "<" in fast or "<" in slow


class TestPipelineNeverRaises:
    @given(html_ish, st.sampled_from(["html", "json", "pdf_text"]))
    @settings(max_examples=150, deadline=None)
    def test_extract_document_total(self, payload, kind):
        res = extract_document("x", payload, "https://t.test/x", payload_kind=kind)
        assert res.doc_id == "x"
        assert isinstance(res.markdown, str)
        if res.error_kind is None:
            for i, span in enumerate(res.spans):
                assert span.text  # no empty spans survive postprocess


class TestUrlProperties:
    @given(st.text(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_url_key_total_and_idempotent(self, url):
        key = get_url_key(url)
        assert get_url_key(key) == key or key == key.lower()

    @given(st.text(max_size=100), st.sampled_from(
        ["https://a.com", "https://a.com/b/c", "http://x.y:8080/p?q=1"]
    ))
    @settings(max_examples=200, deadline=None)
    def test_resolve_never_raises(self, rel, base):
        assert isinstance(resolve_url(rel, base), str)


class TestPostprocessProperties:
    @given(st.text(max_size=400))
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, md):
        once = postprocess_markdown(md)
        assert postprocess_markdown(once) == once

    @given(st.text(max_size=400))
    @settings(max_examples=200, deadline=None)
    def test_no_triple_newlines_out(self, md):
        assert "\n\n\n" not in postprocess_markdown(md)


@pytest.mark.spark
class TestShingleProperties:
    @given(
        st.lists(
            st.text(alphabet="abcx yz\t\n", min_size=0, max_size=40), max_size=8
        )
    )
    @settings(max_examples=25, deadline=None)
    def test_linear_windower_matches_reference_definition(self, spark, texts):
        """The arrays_zip shingle construction must equal the obvious
        Python definition: distinct space-joined 3-token windows (or the
        whole text when shorter), tokens split on whitespace runs."""
        import re

        from pyspark.sql import functions as F

        from reader_spark.ops.dedup import shingles

        rows = [(i, t) for i, t in enumerate(texts)]
        if not rows:
            return
        df = spark.createDataFrame(rows, "id long, text string")
        got = {
            r["id"]: sorted(r["sh"])
            for r in df.select("id", shingles(F.col("text"), 3).alias("sh")).collect()
        }
        for i, t in rows:
            # Spark/DuckDB trim() strips SPACES only (not \n/\t) — mirror it.
            toks = re.split(r"\s+", t.strip(" "))
            if len(toks) >= 3:
                want = sorted(
                    {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
                )
            else:
                want = [" ".join(toks)]
            assert got[i] == want, (t, got[i], want)


class TestNewOpProperties:
    @given(
        st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=40),
        st.integers(min_value=1, max_value=2000),
    )
    @settings(max_examples=25, deadline=None)
    def test_token_shards_invariants(self, spark, token_counts, budget):
        """Shard ids are nondecreasing in pack order; a shard's token total
        never exceeds budget + the straddling doc's own tokens; shard 0
        always starts at the first doc."""
        from pyspark.sql import functions as F

        from reader_spark.ops.textstats import shard_by_token_budget

        rows = [(f"{i:04d}", n) for i, n in enumerate(token_counts)]
        df = spark.createDataFrame(rows, "doc_id string, n_tokens int")
        got = sorted(
            (r["doc_id"], r["n_tokens"], r["shard"])
            for r in shard_by_token_budget(df, budget=budget).collect()
        )
        shards = [s for _d, _n, s in got]
        assert shards[0] == 0
        assert all(a <= b for a, b in zip(shards, shards[1:]))
        totals: dict[int, int] = {}
        for _d, n, s in got:
            totals[s] = totals.get(s, 0) + n
        for s, total in totals.items():
            straddler = max(n for _d, n, sh in got if sh == s)
            assert total <= budget + straddler

    @given(st.text(max_size=300))
    @settings(max_examples=40, deadline=None)
    def test_pii_mask_idempotent_and_clean(self, spark, text):
        """Masking is idempotent (placeholders never rematch) and the
        masked output never contains an email-shaped token."""
        import re as _re

        from pyspark.sql import functions as F

        from reader_spark.ops.textstats import PII_EMAIL, mask_pii_col

        df = spark.createDataFrame([(text,)], "text string")
        once = df.select(mask_pii_col(F.col("text")).alias("m"))
        twice = once.select(mask_pii_col(F.col("m")).alias("m"))
        m1 = once.head()["m"]
        m2 = twice.head()["m"]
        assert m1 == m2
        assert _re.search(PII_EMAIL, m1) is None

    @given(st.text(max_size=400))
    @settings(max_examples=40, deadline=None)
    def test_gopher_ratios_bounded(self, spark, text):
        """Every Gopher ratio lands in [0, 1] for arbitrary input."""
        from pyspark.sql import functions as F

        from reader_spark.ops.textstats import gopher_quality_columns

        df = spark.createDataFrame([("d", text)], "doc_id string, text string")
        row = gopher_quality_columns(df).head()
        for col in (
            "alpha_word_ratio",
            "bullet_line_ratio",
            "ellipsis_line_ratio",
            "dup_line_fraction",
        ):
            assert 0.0 <= row[col] <= 1.0, (col, row[col], text)


class TestLineDedupProperties:
    @given(
        st.lists(
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=12
            ),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=12, deadline=None)
    def test_invariants(self, spark, word_lists):
        """Kept lines are a subset of original occurrences; every distinct
        dedupable line value survives EXACTLY once corpus-wide; exempt
        (short) lines all survive."""
        from pyspark.sql import Row

        from reader_spark.ops.lines import chunk_lines, line_dedup

        docs = spark.createDataFrame(
            [Row(doc_id=i, text=" ".join(ws)) for i, ws in enumerate(word_lists)]
        )
        lines = chunk_lines(docs, words_per_line=2)
        all_occ = [(r.doc_id, r.line_no, r.line) for r in lines.collect()]
        kept = [(r.doc_id, r.line_no, r.line) for r in line_dedup(lines).collect()]
        assert set(kept) <= set(all_occ)
        dedupable_vals = {l for _, _, l in all_occ if len(l.split(" ")) >= 2}
        for v in dedupable_vals:
            assert sum(1 for _, _, l in kept if l == v) == 1
        exempt = [(d, n, l) for d, n, l in all_occ if len(l.split(" ")) < 2]
        assert set(exempt) <= set(kept)


class TestFunnelProperties:
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 3),
                st.sampled_from(["view", "click", "buy"]),
                st.integers(0, 1000),
            ),
            min_size=1,
            max_size=30,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_stage_counts_monotone_nonincreasing(self, spark, events):
        import datetime as dt

        from pyspark.sql import Row

        from reader_spark.ops.funnel import funnel_summary

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                Row(
                    user_id=u,
                    event_type=t,
                    ts=t0 + dt.timedelta(seconds=s),
                )
                for u, t, s in events
            ]
        )
        rows = sorted(
            funnel_summary(df, steps=("view", "click", "buy")).collect(),
            key=lambda r: r.step_index,
        )
        users = [r.users for r in rows]
        assert users == sorted(users, reverse=True)


class TestZorderProperties:
    @given(
        st.lists(
            st.tuples(st.integers(0, 500), st.integers(-200, 200)),
            min_size=2,
            max_size=40,
            unique=True,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_key_in_range_and_bucket_pair_injective(self, spark, points):
        """z fits in 2*bits bits, and distinct bucket pairs map to distinct
        z values (Morton interleave is a bijection on bucket pairs)."""
        from pyspark.sql import Row

        from reader_spark.ops.zorder import zorder_key

        df = spark.createDataFrame(
            [Row(rid=i, a=a, b=b) for i, (a, b) in enumerate(points)]
        )
        rows = zorder_key(df, "a", "b", bits=6).collect()
        seen = {}
        for r in rows:
            assert 0 <= r.z < (1 << 12)
            pair = (r.a_bucket, r.b_bucket)
            if pair in seen:
                assert seen[pair] == r.z
            else:
                assert r.z not in set(seen.values())
                seen[pair] = r.z


class TestPagerankProperties:
    @given(
        st.lists(
            st.tuples(st.integers(0, 6), st.integers(0, 6)),
            min_size=1,
            max_size=15,
        )
    )
    @settings(max_examples=8, deadline=None)
    def test_rank_is_a_distribution(self, spark, edge_list):
        from pyspark.sql import Row

        from reader_spark.ops.graph import pagerank

        edges = spark.createDataFrame(
            [Row(src=f"n{a}", dst=f"n{b}", w=1.0) for a, b in edge_list]
        )
        rows = pagerank(edges, iterations=3).collect()
        total = sum(r.pr for r in rows)
        assert abs(total - 1.0) < 1e-6
        assert all(r.pr > 0 for r in rows)


class TestStreamMetadataParity:
    meta_ish = st.recursive(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
        ),
        lambda inner: st.builds(
            lambda tag, attrs, kids: f"<{tag}{attrs}>{''.join(kids)}</{tag}>",
            st.sampled_from(
                ["div", "p", "head", "body", "html", "title", "script", "style"]
            ),
            st.sampled_from(
                [
                    "",
                    " lang='en'",
                    ' name="description" content="d&amp;c"',
                    " property='og:title' content='t'",
                    ' rel="icon" href="/f.ico"',
                    " charset='utf-8'",
                ]
            ),
            st.lists(st.deferred(lambda: inner), max_size=3),
        ),
        max_leaves=12,
    ).map(
        # sprinkle metadata-bearing void tags between fragments
        lambda body: f"<meta name='a' content='1'>{body}"
        f"<link rel='canonical' href='/c'><title>T</title>"
    )

    @given(meta_ish)
    @settings(max_examples=60, deadline=None)
    def test_stream_equals_dom(self, html):
        from reader_spark.extract.metadata import (
            extract_metadata_dom,
            extract_metadata_stream,
        )
        from reader_spark.htmlkit.dom import parse_html

        assert extract_metadata_stream(html, "https://p.test/") == \
            extract_metadata_dom(parse_html(html), "https://p.test/")


class TestContainmentVsJaccard:
    docs_strategy = st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
            min_size=3, max_size=12,
        ).map(" ".join),
        min_size=2, max_size=5,
    )

    @pytest.mark.spark
    @given(docs_strategy)
    @settings(max_examples=15, deadline=None)
    def test_containment_dominates_jaccard(self, spark, texts):
        """|A∩B|/|A| >= |A∩B|/|A∪B| for every pair — containment at a
        threshold must be a SUPERSET of jaccard pairs at that threshold."""
        from pyspark.sql import Row

        from reader_spark.ops.dedup import containment_pairs, ngram_jaccard_pairs

        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        tau = 0.4
        jac = {(r.doc_a, r.doc_b) for r in
               ngram_jaccard_pairs(df, "doc_id", "text", threshold=tau).collect()}
        cont = {(min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)) for r in
                containment_pairs(df, "doc_id", "text", threshold=tau).collect()}
        assert jac <= cont


class TestPackingConservation:
    @pytest.mark.spark
    @given(
        st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=20),
        st.integers(min_value=1, max_value=32),
    )
    @settings(max_examples=15, deadline=None)
    def test_total_tokens_conserved_any_seq_len(self, spark, sizes, seq_len):
        from pyspark.sql import Row

        from reader_spark.ops.packing import pack_sequences

        df = spark.createDataFrame(
            [Row(doc_id=i, text=" ".join(f"t{j}" for j in range(n)))
             for i, n in enumerate(sizes)]
        )
        packed = pack_sequences(df, "doc_id", "text", seq_len).collect()
        assert sum(r.n_tokens for r in packed) == sum(sizes)
        # every segment fits inside its sequence
        assert all(r.seq_offset + r.n_tokens <= seq_len for r in packed)
        assert all(r.n_tokens >= 1 for r in packed)
