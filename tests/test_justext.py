"""jusText paragraph classification (reader_spark.ops.justext)."""

import hashlib

from pyspark.sql import functions as F

from pyspark.sql import Row

from reader_spark.ops.justext import justext_classify, justext_extract

STOPS = ("the", "and", "of", "to")

# ~80 chars, 50% stopwords — context-free 'neargood' (length_high 200)
NEARGOOD = "the cat and dog of the house went to the yard and the tree of the big park now"
# ~265 chars (> length_high 200), high stopword density -> 'good'
GOOD = " ".join(["the quick fox and the lazy dog of the old farm went to the river"] * 4)
# long, zero stopwords -> 'bad'
BAD = " ".join(["zebra quagga okapi tapir bongo eland kudu nyala"] * 3)
SHORT = "tiny fragment here"  # < 70 chars, no links


def _pars(spark, rows):
    """rows: (doc_id, par_no, text, link_chars)."""
    return spark.createDataFrame(
        [Row(doc_id=d, par_no=n, text=t, link_chars=lc) for d, n, t, lc in rows]
    )


def _classify(df, **kw):
    kw.setdefault("stopwords", STOPS)
    return justext_classify(df, **kw)


def _cf(spark, text, link_chars=0, **kw):
    df = _pars(spark, [(1, 0, text, link_chars)])
    return _classify(df, **kw).collect()[0].cf_class


class TestContextFree:
    def test_link_density_bad(self, spark):
        assert _cf(spark, GOOD, link_chars=len(GOOD) // 2) == "bad"

    def test_copyright_bad(self, spark):
        assert _cf(spark, GOOD + " ©") == "bad"

    def test_short_no_links(self, spark):
        assert _cf(spark, SHORT) == "short"

    def test_short_with_links_is_bad(self, spark):
        assert _cf(spark, SHORT, link_chars=2) == "bad"

    def test_good_neargood_bad_ladder(self, spark):
        assert _cf(spark, GOOD) == "good"
        assert _cf(spark, NEARGOOD) == "neargood"
        assert _cf(spark, BAD) == "bad"

    def test_densities_reported(self, spark):
        df = _pars(spark, [(1, 0, "the zebra", 3)])
        row = _classify(df).collect()[0]
        assert row.n_words == 2
        assert abs(row.stopword_density - 0.5) < 1e-9
        assert abs(row.link_density - 3 / 9) < 1e-6


class TestContextSensitive:
    def _final(self, spark, texts_links):
        df = _pars(
            spark, [(1, i, t, lc) for i, (t, lc) in enumerate(texts_links)]
        )
        rows = _classify(df).orderBy("par_no").collect()
        return [r.final_class for r in rows]

    def test_short_between_goods_becomes_good(self, spark):
        got = self._final(spark, [(GOOD, 0), (SHORT, 0), (GOOD, 0)])
        assert got == ["good", "good", "good"]

    def test_short_between_bads_becomes_bad(self, spark):
        got = self._final(spark, [(BAD, 0), (SHORT, 0), (BAD, 0)])
        assert got == ["bad", "bad", "bad"]

    def test_short_rescued_by_adjacent_neargood(self, spark):
        # decisive neighbours are good/bad (the mixed case), and the
        # bad side's nearest any-class neighbour is neargood -> rescued
        # to good; the neargood itself then turns good in pass 2 (its
        # prev neighbour is the rescued short). Both-bad neighbours do
        # NOT rescue — jusText assigns bad before the neargood check.
        got = self._final(spark, [(GOOD, 0), (SHORT, 0), (NEARGOOD, 0), (BAD, 0)])
        assert got[1] == "good"
        assert got[2] == "good"
        no_rescue = self._final(
            spark, [(BAD, 0), (NEARGOOD, 0), (SHORT, 0), (BAD, 0)]
        )
        assert no_rescue[2] == "bad"

    def test_neargood_between_bads_becomes_bad(self, spark):
        got = self._final(spark, [(BAD, 0), (NEARGOOD, 0), (BAD, 0)])
        assert got == ["bad", "bad", "bad"]

    def test_neargood_next_to_good_becomes_good(self, spark):
        got = self._final(spark, [(GOOD, 0), (NEARGOOD, 0), (BAD, 0)])
        assert got == ["good", "good", "bad"]

    def test_edge_paragraphs_missing_neighbour_counts_bad(self, spark):
        # lone short page: both neighbours missing -> bad/bad -> bad
        got = self._final(spark, [(SHORT, 0)])
        assert got == ["bad"]

    def test_docs_do_not_leak_into_each_other(self, spark):
        # doc 1 ends GOOD, doc 2 starts SHORT: doc 2's short must NOT
        # see doc 1's good as its prev neighbour
        df = _pars(spark, [(1, 0, GOOD, 0), (2, 0, SHORT, 0), (2, 1, GOOD, 0)])
        rows = {
            (r.doc_id, r.par_no): r.final_class
            for r in _classify(df).collect()
        }
        assert rows[(2, 0)] == "bad"  # prev=missing(bad), next=good -> bad


class TestExtract:
    def test_reassembles_good_paragraphs_in_order(self, spark):
        df = _pars(
            spark,
            [(1, 0, GOOD, 0), (1, 1, BAD, 0), (1, 2, GOOD, 0)],
        )
        row = justext_extract(df, stopwords=STOPS).collect()[0]
        assert row.n_pars == 3
        assert row.n_good == 2
        expect = hashlib.md5(" ".join([GOOD, GOOD]).encode()).hexdigest()
        assert row.content_md5 == expect

    def test_all_boilerplate_page_stays_visible(self, spark):
        df = _pars(spark, [(1, 0, BAD, 0)])
        row = justext_extract(df, stopwords=STOPS).collect()[0]
        assert row.n_good == 0
        assert row.content_md5 == hashlib.md5(b"").hexdigest()


class TestHeadingPromotion:
    """jusText's two heading passes (heading_col set)."""

    def _pars(self, spark, rows):
        return spark.createDataFrame(
            [
                Row(doc_id=1, par_no=i, text=t, link_chars=0, is_heading=h)
                for i, (t, h) in enumerate(rows)
            ]
        )

    def _final(self, spark, rows, dist=200):
        df = self._pars(spark, rows)
        out = justext_classify(
            df,
            stopwords=STOPS,
            heading_col="is_heading",
            max_heading_distance=dist,
        ).orderBy("par_no")
        return [r.final_class for r in out.collect()]

    def test_short_heading_before_good_is_promoted(self, spark):
        # short heading directly before a good paragraph: pass 1 makes
        # it neargood, the neargood revision then lifts it to good
        got = self._final(spark, [(SHORT, True), (GOOD, False)])
        assert got == ["good", "good"]
        # same page WITHOUT the heading flag: the short stays bad
        # (prev missing=bad, next good -> mixed -> bad)
        plain = self._final(spark, [(SHORT, False), (GOOD, False)])
        assert plain == ["bad", "good"]

    def test_distance_budget_respected(self, spark):
        # a long bad paragraph (> budget chars) sits between heading
        # and the good paragraph: no promotion
        far = self._final(
            spark, [(SHORT, True), (BAD, False), (GOOD, False)], dist=50
        )
        assert far[0] == "bad"
        # with a generous budget the same page promotes
        near = self._final(
            spark, [(SHORT, True), (BAD, False), (GOOD, False)], dist=10000
        )
        assert near[0] == "good"

    def test_heading_with_no_following_good_stays_bad(self, spark):
        got = self._final(spark, [(SHORT, True), (BAD, False)])
        assert got[0] == "bad"

    def test_cf_class_reporting_unchanged(self, spark):
        df = self._pars(spark, [(SHORT, True), (GOOD, False)])
        rows = (
            justext_classify(
                df, stopwords=STOPS, heading_col="is_heading"
            )
            .orderBy("par_no")
            .collect()
        )
        # the reported context-free class stays 'short' even though
        # the heading pass promoted the working copy
        assert rows[0].cf_class == "short"

    def test_no_heading_col_is_identity(self, spark):
        base = self._pars(spark, [(SHORT, True), (GOOD, False)])
        with_flag_off = justext_classify(
            base.withColumn("is_heading", F.lit(False)),
            stopwords=STOPS,
            heading_col="is_heading",
        )
        without = justext_classify(base, stopwords=STOPS)
        a = [(r.par_no, r.final_class) for r in with_flag_off.orderBy("par_no").collect()]
        b = [(r.par_no, r.final_class) for r in without.orderBy("par_no").collect()]
        assert a == b


class TestMultilangStopwords:
    def test_per_language_routing(self, spark):
        # the same text scores differently depending on the row's lang:
        # its words ARE stopwords under 'xx' but not under 'yy'
        txt = " ".join(["foo bar baz qux quux"] * 11)  # > 200 chars
        df = spark.createDataFrame(
            [
                Row(doc_id=1, par_no=0, text=txt, link_chars=0, lang="xx"),
                Row(doc_id=2, par_no=0, text=txt, link_chars=0, lang="yy"),
                Row(doc_id=3, par_no=0, text=txt, link_chars=0, lang="zz"),
            ]
        )
        out = justext_classify(
            df,
            stopwords=("fallback",),
            stopwords_by_lang={
                "xx": ("foo", "bar", "baz", "qux", "quux"),
                "yy": ("nothing",),
            },
        ).collect()
        got = {r.doc_id: (r.cf_class, r.stopword_density) for r in out}
        assert got[1][0] == "good"  # density 1.0 under xx's list
        assert abs(got[1][1] - 1.0) < 1e-9
        assert got[2][0] == "bad"  # zero hits under yy's list
        # unknown lang falls back to the flat stopwords tuple
        assert got[3][0] == "bad"
        assert got[3][1] == 0.0
