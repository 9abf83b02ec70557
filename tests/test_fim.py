"""Fill-in-the-middle transform (ops/fim.py): character conservation,
deterministic sampling rates, render grammar, edge docs."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.fim import MID_TOK, PRE_TOK, SUF_TOK, fim_transform

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=i, text=f"def f_{i}(x):\n    return x + {i}\n" * (i % 4))
        for i in range(60)
    ]
    rows.append(Row(doc_id=60, text=""))
    rows.append(Row(doc_id=61, text="a"))
    return spark.createDataFrame(rows)


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_character_conservation_and_render_grammar(spark, docs):
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in fim_transform(docs).collect():
        t = texts[r["doc_id"]]
        assert r["n_chars"] == len(t)
        if r["mode"] == "ar":
            assert r["sample"] == t
            assert r["cut_lo"] == r["cut_hi"] == 0
            continue
        lo, hi = r["cut_lo"], r["cut_hi"]
        assert 0 <= lo <= hi <= len(t)
        pfx, mid, sfx = t[:lo], t[lo:hi], t[hi:]
        if r["mode"] == "psm":
            assert r["sample"] == (
                PRE_TOK + pfx + SUF_TOK + sfx + MID_TOK + mid
            )
        else:
            assert r["sample"] == (
                PRE_TOK + SUF_TOK + sfx + MID_TOK + pfx + mid
            )


def test_rate_extremes(spark, docs):
    all_ar = _by_id(fim_transform(docs, fim_pct=0))
    assert all(r["mode"] == "ar" for r in all_ar.values())
    none_ar = _by_id(fim_transform(docs, fim_pct=100, spm_pct=0))
    assert all(r["mode"] == "psm" for r in none_ar.values())
    all_spm = _by_id(fim_transform(docs, fim_pct=100, spm_pct=100))
    assert all(r["mode"] == "spm" for r in all_spm.values())


def test_all_modes_appear_and_are_deterministic(spark, docs):
    a = _by_id(fim_transform(docs))
    modes = {r["mode"] for r in a.values()}
    assert modes == {"ar", "psm", "spm"}
    b = _by_id(fim_transform(docs))
    assert {k: tuple(v) for k, v in a.items()} == {
        k: tuple(v) for k, v in b.items()
    }


def test_empty_and_single_char_docs(spark, docs):
    got = _by_id(fim_transform(docs, fim_pct=100, spm_pct=0))
    r = got[60]
    assert r["n_chars"] == 0 and r["cut_lo"] == r["cut_hi"] == 0
    assert r["sample"] == PRE_TOK + SUF_TOK + MID_TOK
    r1 = got[61]
    assert r1["n_chars"] == 1
    assert r1["sample"].replace(PRE_TOK, "").replace(SUF_TOK, "").replace(
        MID_TOK, ""
    ) == "a"


def test_param_validation(spark, docs):
    with pytest.raises(ValueError):
        fim_transform(docs, fim_pct=101)
    with pytest.raises(ValueError):
        fim_transform(docs, spm_pct=-1)
