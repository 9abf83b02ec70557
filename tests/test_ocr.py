"""OCR garbage rules (ops/ocr.py, Taghva rules / Rmgarbage)."""

from pyspark.sql import Row

from reader_spark.ops.ocr import ocr_garbage_profile, ocr_garbage_tokens

RULES = ("rule_l", "rule_a", "rule_r", "rule_v", "rule_p", "rule_c")


def _flags(spark, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    out = {}
    for r in ocr_garbage_tokens(df).collect():
        out[r["tok"]] = tuple(name for name in RULES if r[name])
    return out


def test_each_rule_fires_on_its_token(spark):
    flags = _flags(
        spark,
        "zzzzqqq ---- a#b%c misSpelled bcdfg aeiou "
        + "verylongtoken" * 4
        + " !!!! ?!?!",
    )
    assert flags["zzzzqqq"] == ("rule_r", "rule_v")
    assert flags["----"] == ("rule_a", "rule_r")
    assert flags["a#b%c"] == ("rule_p",)
    assert flags["misSpelled"] == ("rule_c",)
    assert flags["bcdfg"] == ("rule_v",)  # no vowels
    assert flags["aeiou"] == ("rule_v",)  # no consonants
    assert flags["verylongtoken" * 4] == ("rule_l",)
    assert flags["!!!!"] == ("rule_a",)
    # repeated '?!' pairs: symbol-heavy AND mixed inside punctuation
    assert flags["?!?!"] == ("rule_a", "rule_p")


def test_clean_tokens_survive(spark):
    flags = _flags(spark, "normal words e.g. 3.14 x I myth rhythm a-b")
    for tok, hit in flags.items():
        assert hit == (), f"{tok} wrongly flagged: {hit}"


def test_same_symbol_inside_punct_is_not_shrapnel(spark):
    # "e..g" inside = "..g" -> punct ".." all identical -> rule_p off
    # (rule_r needs 4+), "a.b.c" inside = ".b." -> ".." identical
    flags = _flags(spark, "a.b.c U.S.A.")
    assert "rule_p" not in flags["a.b.c"]
    assert "rule_p" not in flags["U.S.A."]


def test_profile_aggregates(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="clean text only here"),
            Row(doc_id=2, text="good zzzzqqq ---- bad#in%side"),
        ]
    )
    rows = {r["doc_id"]: r for r in ocr_garbage_profile(df).collect()}
    assert rows[1]["n_garbage"] == 0
    assert rows[1]["garbage_milli"] == 0
    assert rows[1]["n_tokens"] == 4
    r2 = rows[2]
    assert r2["n_tokens"] == 4
    assert r2["n_rule_r"] == 2
    assert r2["n_rule_v"] == 1  # zzzzqqq
    assert r2["n_rule_p"] == 1  # bad#in%side ('bad' is clean)
    assert r2["n_garbage"] == 3
    assert r2["garbage_milli"] == 750


def test_short_token_edges(spark):
    # len-1 and len-2 tokens must not crash the inside-substring and
    # len-2 symbol pairs are rule_a garbage
    flags = _flags(spark, "x ## a1 -")
    assert flags["x"] == ()
    assert flags["##"] == ("rule_a",)
    assert flags["a1"] == ()
    assert flags["-"] == ()  # len 1: rule_a needs len >= 2


def test_registry_and_plan(spark):
    import __spark_entry__ as entrymod

    q = entrymod.queries()["ocr_garbage_profile"]
    df = q(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    # one doc-keyed hash aggregate, no window, no join, no
    # single-partition exchange
    assert "SinglePartition" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
    rows = df.limit(5).collect()
    assert rows and "garbage_milli" in df.columns
    assert "ocr_garbage_profile" in entrymod.oracle_sql()
