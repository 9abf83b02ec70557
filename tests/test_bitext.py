"""Bitext mutual-NN mining (ops/bitext.py): hand-built parallel pairs,
hub exclusion, tie determinism, bucketed-path recall and plan shape."""

import pytest
from pyspark.sql import Row

from reader_spark.ops.ann import md5_plane_weights
from reader_spark.ops.bitext import bitext_mine_brute, bitext_mine_bucketed

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def bilingual(spark):
    """en 0/2/4 and fr 1/3/5; (0,1) and (2,3) are true translations
    (near-identical vectors); 4 is a HUB near everything on the fr side
    but nothing elects it back; 5 sits alone."""
    rows = [
        Row(vec_id=0, lang="en", embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, lang="fr", embedding=[0.99, 0.01, 0.0]),
        Row(vec_id=2, lang="en", embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=3, lang="fr", embedding=[0.01, 0.99, 0.0]),
        Row(vec_id=4, lang="en", embedding=[0.5, 0.5, 0.1]),
        Row(vec_id=5, lang="fr", embedding=[-1.0, -1.0, 0.5]),
    ]
    return spark.createDataFrame(rows)


def test_mutual_pairs_and_hub_exclusion(bilingual):
    got = {
        (r["src_id"], r["tgt_id"])
        for r in bitext_mine_brute(bilingual, "en", "fr").collect()
    }
    # 4's nearest fr is 1 or 3, but their nearest en are 0 and 2 — the
    # hub never survives the intersection; 5 elects someone forward but
    # is nobody's best target.
    assert got == {(0, 1), (2, 3)}


def test_tie_breaks_smallest_id(spark):
    rows = [
        Row(vec_id=0, lang="en", embedding=[1.0, 0.0]),
        Row(vec_id=1, lang="fr", embedding=[1.0, 0.0]),
        Row(vec_id=3, lang="fr", embedding=[1.0, 0.0]),  # exact tie
    ]
    df = spark.createDataFrame(rows)
    got = bitext_mine_brute(df, "en", "fr").collect()
    assert [(r["src_id"], r["tgt_id"]) for r in got] == [(0, 1)]


def test_bucketed_subset_of_brute(spark):
    embeds = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).selectExpr(
        "vec_id",
        "embedding",
        "CASE WHEN vec_id % 2 = 0 THEN 'en' ELSE 'fr' END AS lang",
    )
    w = md5_plane_weights(dim=64, planes=4)
    brute = {
        (r["src_id"], r["tgt_id"], r["dot_micro2"])
        for r in bitext_mine_brute(embeds, "en", "fr").collect()
    }
    bucketed = {
        (r["src_id"], r["tgt_id"], r["dot_micro2"])
        for r in bitext_mine_bucketed(embeds, "en", "fr", weights=w).collect()
    }
    # A bucketed pair whose partners were each other's global best is in
    # brute too; recall must be substantial at 4 planes.
    assert bucketed
    true_hits = bucketed & brute
    # Identical election math: a decent slice of bucketed pairs are the
    # global mutual pairs (exact id+dot equality, not just overlap).
    assert len(true_hits) >= 10


def test_bucketed_plan_no_bnlj(bilingual):
    from tests.test_plans import plan_of

    w = md5_plane_weights(dim=3, planes=2)
    plan = plan_of(bitext_mine_bucketed(bilingual, "en", "fr", weights=w))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_csls_corrects_hub_absorption(spark):
    """A hub that is BOTH srcs' raw nearest steals src 2 from its true
    partner under raw mutual-NN; CSLS penalizes the hub's uniformly-hot
    neighborhood and src 2 recovers the true pair.

    Integer dots (e12 units): s0={hub: .90, t3: .75}, s2={hub: .99,
    t3: .972} -> raw fwd elects the hub for both, the hub elects s2,
    mutual = {(2, hub)} — the WRONG pair for s2. CSLS margins flip s2
    to t3 (hand-checked: (2,3) margin .204 vs (2,hub) .108)."""
    rows = [
        Row(vec_id=0, lang="en", embedding=[1.0, 0.0]),
        Row(vec_id=2, lang="en", embedding=[0.8, 0.6]),
        Row(vec_id=1, lang="fr", embedding=[0.9, 0.45]),   # hub
        Row(vec_id=3, lang="fr", embedding=[0.75, 0.62]),  # true partner
    ]
    df = spark.createDataFrame(rows)
    from reader_spark.ops.bitext import bitext_mine_brute, bitext_mine_csls

    raw = {(r["src_id"], r["tgt_id"])
           for r in bitext_mine_brute(df, "en", "fr").collect()}
    csls = {(r["src_id"], r["tgt_id"])
            for r in bitext_mine_csls(df, "en", "fr", knn=2).collect()}
    assert raw == {(2, 1)}          # hub absorbed src 2
    assert (2, 3) in csls           # CSLS recovers the true pair
    assert (2, 1) not in csls


def test_csls_margin_hand_math(spark):
    """2-vector-per-side case: margin == 2*k*dot - rx - ry exactly."""
    rows = [
        Row(vec_id=0, lang="en", embedding=[1.0]),
        Row(vec_id=1, lang="fr", embedding=[0.5]),
        Row(vec_id=3, lang="fr", embedding=[0.25]),
    ]
    df = spark.createDataFrame(rows)
    from reader_spark.ops.bitext import bitext_mine_csls

    got = {r["tgt_id"]: r for r in
           bitext_mine_csls(df, "en", "fr", knn=2).collect()}
    # dots: (0,1)=5e11, (0,3)=2.5e11; rx=7.5e11; ry1=5e11, ry3=2.5e11.
    # margins: (0,1): 2*2*5e11 - 7.5e11 - 5e11 = 7.5e11 -> elected.
    assert list(got) == [1]
    assert got[1]["dot_micro2"] == 500_000_000_000
    assert got[1]["margin_micro2"] == 750_000_000_000
