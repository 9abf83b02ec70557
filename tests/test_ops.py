"""Semantic tests for the corpus sketch operators: MinHash-LSH recall on
known near-duplicates, SimHash on identical/near docs, ANN self-recall.
(The value-level checks run against DuckDB oracles in __spark_entry__;
these pin the sketch-level guarantees that oracles can't express.)"""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "shuffles partitions and the arrow batches stream through the pipeline "
    "with deterministic seeded content for sketching tests"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("lazy", "sleepy")),  # near-dup of 0
        (3, "completely different text about databases and query optimizers "
            "with nothing shared beyond stopwords in any shingle window here"),
        (4, BASE + " plus a small suffix addition"),  # near-dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_groups_exact_dups(self, spark, corpus):
        from reader_spark.ops.dedup import exact_dedup

        groups = {r["keeper_id"]: r["dup_count"] for r in
                  exact_dedup(corpus, "doc_id", "text").collect()}
        assert groups[0] == 2  # docs 0 and 1 collapse, keeper = min id
        assert groups[2] == 1 and groups[3] == 1 and groups[4] == 1


class TestMinhashLSH:
    def test_candidates_cover_true_near_dups(self, spark, corpus):
        from reader_spark.ops.dedup import (
            minhash_lsh_candidates,
            minhash_signatures,
            ngram_jaccard_pairs,
        )

        sigs = minhash_signatures(corpus, "doc_id", "text", n=3, num_hashes=64)
        candidates = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_candidates(sigs, bands=16, rows_per_band=4).collect()
        }
        true_pairs = {
            (r["doc_a"], r["doc_b"])
            for r in ngram_jaccard_pairs(
                corpus, "doc_id", "text", n=3, threshold=0.7
            ).collect()
        }
        assert true_pairs  # the fixture really contains near-dups
        # LSH recall: every true near-dup pair must be a candidate.
        assert true_pairs <= candidates
        # The unrelated doc 3 should bucket with nothing.
        assert not any(3 in pair for pair in candidates)

    def test_portable_md5_variant_same_recall(self, spark, corpus):
        from reader_spark.ops.dedup import minhash_lsh_candidates_portable

        candidates = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_candidates_portable(
                corpus, "doc_id", "text", n=3, num_hashes=64,
                bands=16, rows_per_band=4,
            ).collect()
        }
        # Same sketch guarantees as the xxhash64 family: exact dup always
        # collides, unrelated doc never does.
        assert (0, 1) in candidates
        assert not any(3 in pair for pair in candidates)

    def test_star_edges_same_components_as_pairs(self, spark):
        """Star edges must produce EXACTLY the components of the all-pairs
        candidate form (any two bucket-mates connect through the hub) —
        checked on real sf0.001 documents."""
        from reader_spark.ops.dedup import (
            connected_components,
            minhash_lsh_candidates,
            minhash_lsh_star_edges,
            minhash_signatures,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where(
            F.col("doc_id") < 300
        )
        sigs = minhash_signatures(docs, "doc_id", "text").cache()
        try:
            via_pairs = {
                (r["doc"], r["component"])
                for r in connected_components(
                    minhash_lsh_candidates(sigs)
                ).collect()
            }
            via_star = {
                (r["doc"], r["component"])
                for r in connected_components(
                    minhash_lsh_star_edges(sigs)
                ).collect()
            }
            assert via_star == via_pairs
            assert via_pairs  # non-vacuous: the corpus has near-dups
        finally:
            sigs.unpersist()

    def test_star_edges_linear_on_degenerate_bucket(self, spark):
        """A boilerplate corpus (every doc nearly identical) must emit
        O(n) star edges, not O(n^2) pairs — the giant-bucket scale guard."""
        from reader_spark.ops.dedup import (
            minhash_lsh_star_edges,
            minhash_signatures,
        )

        n = 400
        body = " ".join(f"common boilerplate token {j}" for j in range(60))
        docs = spark.createDataFrame(
            [(i, f"doc {i} {body}") for i in range(n)], "doc_id long, text string"
        )
        sigs = minhash_signatures(docs, "doc_id", "text")
        edges = minhash_lsh_star_edges(sigs, bands=16, rows_per_band=4)
        n_edges = edges.count()
        assert 0 < n_edges <= 16 * n  # at most one hub edge per (doc, band)

    def test_connected_components_long_chain(self, spark):
        """Transitive-duplicate CHAINS (doc i ~ doc i+1) far longer than the
        round budget must still converge — pointer jumping covers diameter
        ~2^rounds, where plain one-hop propagation silently returned
        unconverged labels past `max_iterations` hops (regression)."""
        from reader_spark.ops.dedup import connected_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(999)], "doc_a long, doc_b long"
        )
        rows = connected_components(pairs, max_iterations=20).collect()
        assert len(rows) == 1000
        assert all(r["component"] == 0 for r in rows)

    def test_connected_components_raises_when_unconverged(self, spark):
        import pytest as _pytest

        from reader_spark.ops.dedup import connected_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(50)], "doc_a long, doc_b long"
        )
        with _pytest.raises(RuntimeError, match="did not converge"):
            connected_components(pairs, max_iterations=2)

    def test_identical_docs_identical_signatures(self, spark, corpus):
        from reader_spark.ops.dedup import minhash_signatures

        sigs = {r["doc"]: r["signature"] for r in
                minhash_signatures(corpus, "doc_id", "text").collect()}
        assert sigs[0] == sigs[1]
        assert sigs[0] != sigs[3]


class TestSimhash:
    def test_identical_zero_distance_near_small(self, spark, corpus):
        from reader_spark.ops.dedup import simhash, simhash_near_pairs

        fp = simhash(corpus, "doc_id", "text")
        values = {r["doc"]: r["simhash"] for r in fp.collect()}
        assert values[0] == values[1]
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_near_pairs(fp, max_hamming=6).collect()
        }
        assert pairs[(0, 1)] == 0
        assert (0, 2) in pairs  # one-word change stays within hamming 6
        assert (0, 3) not in pairs  # unrelated text is far

    def test_banded_equals_all_pairs(self, spark):
        """Block-pigeonhole guarantee: at max_hamming=3 with 4 blocks, every
        qualifying pair shares >=1 block, so the banded equi-join path must
        return EXACTLY the all-pairs result — on real sf0.001 documents, at
        several thresholds."""
        from reader_spark.ops.dedup import (
            simhash,
            simhash_banded_pairs,
            simhash_near_pairs,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        fp = simhash(docs, "doc_id", "text").cache()
        try:
            for max_h in (0, 3, 6):
                exact = {
                    (r["doc_a"], r["doc_b"], r["hamming"])
                    for r in simhash_near_pairs(fp, max_hamming=max_h).collect()
                }
                banded = {
                    (r["doc_a"], r["doc_b"], r["hamming"])
                    for r in simhash_banded_pairs(fp, max_hamming=max_h).collect()
                }
                assert banded == exact, f"max_hamming={max_h}"
            assert exact  # hamming<=6 on real docs yields pairs; not vacuous
        finally:
            fp.unpersist()

    def test_banded_equals_all_pairs_64bit(self, spark):
        """The production 64-bit fingerprint (docstring: 2^16 buckets per
        block at max_hamming=3) — including the SIGN bit — must also give
        banded == all-pairs."""
        from reader_spark.ops.dedup import (
            simhash,
            simhash_banded_pairs,
            simhash_near_pairs,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        fp = simhash(docs, "doc_id", "text", bits=64).cache()
        try:
            assert fp.agg(F.min("simhash")).head()[0] < 0  # sign bit in play
            exact = {
                (r["doc_a"], r["doc_b"], r["hamming"])
                for r in simhash_near_pairs(fp, max_hamming=3).collect()
            }
            banded = {
                (r["doc_a"], r["doc_b"], r["hamming"])
                for r in simhash_banded_pairs(fp, max_hamming=3, bits=64).collect()
            }
            assert banded == exact and exact
        finally:
            fp.unpersist()

    def test_banded_no_cartesian_in_plan(self, spark):
        """The banded path must plan as an equi-join on (block_id,
        block_val) — never a cartesian/broadcast-nested-loop product."""
        from reader_spark.ops.dedup import simhash, simhash_banded_pairs

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        pairs = simhash_banded_pairs(simhash(docs, "doc_id", "text"))
        plan = pairs._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_embedding_bucketed_subset_of_exact(self, spark):
        """Precision = 1.0 by construction: every bucketed pair must appear
        in the exact all-pairs result with the identical cosine."""
        from reader_spark.ops.ann import cosine_col
        from reader_spark.ops.dedup import embedding_near_pairs_bucketed

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where(
            F.col("vec_id") < 200
        )
        a = emb.select(F.col("vec_id").alias("doc_a"), F.col("embedding").cast("array<double>").alias("va"))
        b = emb.select(F.col("vec_id").alias("doc_b"), F.col("embedding").cast("array<double>").alias("vb"))
        exact = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
            .withColumn("cosine", F.round(cosine_col(F.col("va"), F.col("vb")), 4))
            .where(F.col("cosine") >= 0.35)
            .collect()
        }
        bucketed = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in embedding_near_pairs_bucketed(
                emb, threshold=0.35, planes=2, tables=3
            ).collect()
        }
        assert bucketed  # non-vacuous at 2 planes / 3 tables
        for pair, cos in bucketed.items():
            assert exact[pair] == cos

    def test_embedding_bucketed_recall_on_planted_dups(self, spark):
        """Planted near-duplicates (tiny deterministic perturbations,
        cosine > 0.999): the bucketed path must recover >= 90% of them, and
        EXACT duplicates (identical vectors -> identical sketches in every
        table) must be recovered at 100%."""
        import numpy as np

        from reader_spark.ops.dedup import embedding_near_pairs_bucketed

        rng = np.random.RandomState(7)
        base = rng.randn(40, 64)
        rows = []
        for i, v in enumerate(base):
            rows.append((i * 3, [float(x) for x in v]))  # original
            rows.append((i * 3 + 1, [float(x) for x in v]))  # exact dup
            noisy = v + rng.randn(64) * 0.001
            rows.append((i * 3 + 2, [float(x) for x in noisy]))  # near dup
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {
            (r["doc_a"], r["doc_b"])
            for r in embedding_near_pairs_bucketed(
                emb, threshold=0.99, planes=8, tables=4
            ).collect()
        }
        exact_pairs = {(i * 3, i * 3 + 1) for i in range(40)}
        assert exact_pairs <= got  # identical vectors: recall 1.0, always
        near_pairs = {(i * 3, i * 3 + 2) for i in range(40)} | {
            (i * 3 + 1, i * 3 + 2) for i in range(40)
        }
        recall = len(near_pairs & got) / len(near_pairs)
        assert recall >= 0.9, recall

    def test_banded_rejects_too_many_blocks(self, spark, corpus):
        from reader_spark.ops.dedup import simhash, simhash_banded_pairs

        fp = simhash(corpus, "doc_id", "text", bits=4)
        with pytest.raises(ValueError, match="blocks cannot exceed bits"):
            simhash_banded_pairs(fp, max_hamming=4, bits=4)


class TestBinaryHammingTopk:
    def test_sign_bit_packing_matches_hand_fold(self, spark):
        from reader_spark.ops.ann import sign_bit_words

        vec = [1.0 if i % 3 == 0 else -1.0 for i in range(40)]  # dim !% 32
        want = []
        for w in range(2):
            acc = 0
            for v in vec[w * 32 : w * 32 + 32]:
                acc = acc * 2 + (1 if v > 0 else 0)
            want.append(acc)
        df = spark.createDataFrame([(vec,)], "v array<double>")
        got = df.select(sign_bit_words(F.col("v"), 40).alias("c")).head()["c"]
        assert list(got) == want
        assert want[1] < (1 << 8)  # last word carries only 8 bits

    def test_self_is_top1_with_hamming_zero(self, spark):
        from reader_spark.ops.ann import binary_hamming_topk

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = emb.where(F.col("vec_id") == 5).head()["embedding"]
        top = binary_hamming_topk(emb, [float(v) for v in qv], k=3).collect()
        assert top[0]["vec_id"] == 5
        assert top[0]["hamming"] == 0
        assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-3)

    def test_recall_vs_exact_topk(self, spark):
        from reader_spark.ops.ann import binary_hamming_topk, brute_force_topk

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = [float(v) for v in emb.where(F.col("vec_id") == 7).head()["embedding"]]
        exact = {r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()}
        approx = {r["vec_id"] for r in binary_hamming_topk(emb, qv, k=10, candidates=50).collect()}
        assert len(exact & approx) >= 5  # sign bits keep most of the true top-10

    def test_candidate_stage_is_take_ordered_no_shuffle(self, spark):
        from reader_spark.ops.ann import binary_hamming_topk

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = [float(v) for v in emb.where(F.col("vec_id") == 0).head()["embedding"]]
        plan = binary_hamming_topk(emb, qv)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "hashpartitioning" not in plan  # scan -> partial top-C, no exchange


class TestTextClusters:
    def test_seeds_self_assign_and_zero_doc_routes_first(self, spark):
        from reader_spark.ops.vectorize import text_clusters

        rows = [
            (0, "alpha alpha bravo"),
            (1, "zulu yankee xray whiskey"),
            (2, "alpha bravo charlie"),   # closer to seed 0's vocab
            (3, "zulu yankee victor"),    # closer to seed 1's vocab
            (4, "!!! ???"),               # zero tokens -> zero vector
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in text_clusters(df, seed_ids=[0, 1]).collect()}
        assert got[0].cluster == 0 and got[0].cosine == pytest.approx(1.0)
        assert got[1].cluster == 1 and got[1].cosine == pytest.approx(1.0)
        assert got[2].cluster == 0
        assert got[3].cluster == 1
        assert got[4].cosine == -2.0 and got[4].cluster == 0  # deterministic

    def test_missing_seed_fails_loudly(self, spark):
        from reader_spark.ops.vectorize import text_clusters

        df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="seed ids not found"):
            text_clusters(df, seed_ids=[0, 99])
        with pytest.raises(ValueError, match="seed_ids"):
            text_clusters(df, seed_ids=[])


class TestBinaryRecallEval:
    def test_recall_bounds_and_self_hit(self, spark):
        from reader_spark.ops.evals import binary_recall_eval

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        got = {r.query_id: r for r in binary_recall_eval(emb, n_queries=4).collect()}
        assert set(got) == {0, 1, 2, 3}
        for r in got.values():
            assert 0 <= r.n_hit <= 10
            assert r.recall == pytest.approx(r.n_hit / 10.0)
        # the query itself is exact-top1 AND hamming-0 -> always a hit
        assert all(r.n_hit >= 1 for r in got.values())

    def test_full_candidate_set_gives_perfect_recall(self, spark):
        from reader_spark.ops.evals import binary_recall_eval

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        n = emb.count()
        got = binary_recall_eval(emb, n_queries=3, candidates=n).collect()
        assert all(r.recall == 1.0 for r in got)  # rerank sees everything


class TestAnnSelfRecall:
    def test_lsh_returns_self_first(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        from reader_spark.ops.ann import brute_force_topk, lsh_bucketed_topk

        queries = emb.where(F.col("vec_id") < 3)
        got = lsh_bucketed_topk(emb, queries, dim=64, k=3, planes=8).collect()
        by_query = {}
        for r in got:
            by_query.setdefault(r["query_id"], []).append(r)
        for qid, rows in by_query.items():
            best = min(rows, key=lambda r: r["rank"])
            assert best["corpus_id"] == qid  # self is always in its own bucket
            assert best["cosine"] == pytest.approx(1.0, abs=1e-3)

    def test_brute_force_self_first(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        from reader_spark.ops.ann import brute_force_topk

        qv = emb.where(F.col("vec_id") == 5).head()["embedding"]
        top = brute_force_topk(emb, [float(v) for v in qv], k=3).collect()
        assert top[0]["vec_id"] == 5

    def test_literal_planes_match_portable_weights(self, spark):
        """The literal-plane LSH twin: deterministic weights, self always in
        its own bucket, and the sketch is reproducible across calls."""
        from reader_spark.ops.ann import lsh_bucketed_topk_literal, md5_plane_weights

        w1 = md5_plane_weights(dim=64, planes=8)
        w2 = md5_plane_weights(dim=64, planes=8)
        assert w1 == w2
        assert all(-1.0 <= x < 1.0 for row in w1 for x in row)

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = emb.where(F.col("vec_id") < 3)
        got = lsh_bucketed_topk_literal(emb, queries, w1, k=3).collect()
        by_query = {}
        for r in got:
            by_query.setdefault(r["query_id"], []).append(r)
        for qid, rows in by_query.items():
            best = min(rows, key=lambda r: r["rank"])
            assert best["corpus_id"] == qid
            assert best["cosine"] == pytest.approx(1.0, abs=1e-3)

    def test_np_brute_force_string_ids_and_zero_norm(self, spark):
        """Non-long id columns round-trip (schema derived from the input),
        and zero-norm vectors yield NULL cosine — the same as the JVM
        brute_force_topk (non-ANSI 0.0/0.0 -> NULL) — not a crash."""
        from reader_spark.ops.ann import brute_force_topk, brute_force_topk_np

        emb = spark.createDataFrame(
            [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("z", [0.0, 0.0])],
            "doc string, embedding array<double>",
        )
        rows = brute_force_topk_np(emb, [1.0, 0.0], k=3, id_col="doc").collect()
        assert [r["doc"] for r in rows] == ["a", "b", "z"]
        assert rows[0]["cosine"] == pytest.approx(1.0)
        assert rows[2]["cosine"] is None
        jvm = brute_force_topk(emb, [1.0, 0.0], k=3, id_col="doc").collect()
        assert [(r["doc"], r["cosine"]) for r in jvm] == [
            (r["doc"], r["cosine"]) for r in rows
        ]


class TestNumpyBruteForce:
    def test_np_path_equals_jvm_path(self, spark):
        from reader_spark.ops.ann import brute_force_topk, brute_force_topk_np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = [float(v) for v in emb.where(F.col("vec_id") == 7).head()["embedding"]]
        jvm = [(r["vec_id"], r["cosine"]) for r in brute_force_topk(emb, qv, k=8).collect()]
        np_ = [(r["vec_id"], r["cosine"]) for r in brute_force_topk_np(emb, qv, k=8).collect()]
        assert jvm == np_
        assert jvm[0][0] == 7  # self first


class TestIvf:
    def test_centroids_deterministic_and_partition_corpus(self, spark):
        from reader_spark.ops.ann import ivf_assign, train_ivf_centroids

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        c1 = train_ivf_centroids(emb, n_cells=4, iters=2)
        c2 = train_ivf_centroids(emb, n_cells=4, iters=2)
        assert c1 == c2  # fully deterministic training
        assert len(c1) == 4 and len(c1[0]) == 64
        cells = ivf_assign(emb, c1).groupBy("cell").count().collect()
        # every vector lands in exactly one cell; >1 cell actually used
        assert sum(r["count"] for r in cells) == emb.count()
        assert len(cells) > 1

    def test_ivf_self_recall_and_brute_force_recall(self, spark):
        from reader_spark.ops.ann import (
            brute_force_topk,
            ivf_topk,
            train_ivf_centroids,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        centroids = train_ivf_centroids(emb, n_cells=4, iters=2)
        queries = emb.where(F.col("vec_id") < 5)
        got = ivf_topk(emb, queries, centroids, k=5, nprobe=2).collect()
        by_query = {}
        for r in got:
            by_query.setdefault(r["query_id"], []).append(r)
        assert set(by_query) == {0, 1, 2, 3, 4}
        hits = total = 0
        for qid, rows in by_query.items():
            # self is always in its own probed cell
            best = min(rows, key=lambda r: r["rank"])
            assert best["corpus_id"] == qid
            qv = emb.where(F.col("vec_id") == qid).head()["embedding"]
            exact = {
                r["vec_id"]
                for r in brute_force_topk(emb, [float(v) for v in qv], k=5).collect()
            }
            approx = {r["corpus_id"] for r in rows}
            hits += len(exact & approx)
            total += len(exact)
        # nprobe=2 of 4 cells: demand >=60% aggregate recall vs exact
        assert hits / total >= 0.6


class TestProductQuantization:
    def test_codes_shape_and_bounds(self, spark):
        from reader_spark.ops.ann import md5_pq_codebooks, pq_encode

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        books = md5_pq_codebooks(dim=64, m=8, k=16)
        rows = pq_encode(emb.where(F.col("vec_id") < 50), books).collect()
        assert len(rows) == 50
        for r in rows:
            assert len(r["codes"]) == 8
            assert all(0 <= c < 16 for c in r["codes"])

    def test_trained_adc_recall_vs_brute_force(self, spark):
        """With per-subspace Lloyd codebooks, ADC top-10 must recover a
        reasonable share of the true (exact-L2) top-10 — the quantizer is
        lossy by design, but trained books on this corpus are far above
        chance (10/500)."""
        from reader_spark.ops.ann import pq_adc_topk, pq_encode, train_pq_codebooks

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        books = train_pq_codebooks(emb, m=8, k=16, iters=2)
        qv = [float(v) for v in emb.where(F.col("vec_id") == 7).head()["embedding"]]
        got = {
            r["vec_id"]
            for r in pq_adc_topk(pq_encode(emb, books), books, qv, topk=10).collect()
        }
        # exact L2 top-10 via brute force on the driver (500 x 64 is tiny)
        import numpy as np

        mat = np.array(
            [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
        )
        d = ((mat - np.array(qv)) ** 2).sum(axis=1)
        true10 = set(np.argsort(d, kind="stable")[:10].tolist())
        assert 7 in got  # the query itself quantizes to itself
        # On synthetic Gaussian 64-dim data distances concentrate, so PQ
        # recall is inherently modest at m=8,k=16 — require well above
        # chance (E[|overlap|] = 10*10/500 = 0.2), not production recall.
        assert len(got & true10) >= 2, (got, true10)

    def test_ivfadc_scores_only_probed_cells(self, spark):
        """IVFADC candidates must come exclusively from the query's nprobe
        cells — the whole point of the coarse quantizer."""
        from reader_spark.ops.ann import (
            _cell_ranks,
            ivf_assign,
            ivfadc_topk,
            md5_pq_codebooks,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cents = [
            list(r["v"])
            for r in emb.where(F.col("vec_id") >= 100)
            .orderBy("vec_id")
            .limit(4)
            .select(F.col("embedding").cast("array<double>").alias("v"))
            .collect()
        ]
        books = md5_pq_codebooks(dim=64, m=8, k=16)
        queries = emb.where(F.col("vec_id") < 3)
        got = ivfadc_topk(emb, queries, cents, books, k=5, nprobe=2).collect()
        assert {r["query_id"] for r in got} == {0, 1, 2}
        for qid in (0, 1, 2):
            ranks = sorted(r["rank"] for r in got if r["query_id"] == qid)
            assert ranks == [1, 2, 3, 4, 5]

        cell_of = {
            r["corpus_id"]: r["cell"] for r in ivf_assign(emb, cents).collect()
        }
        probed = {
            r["vec_id"]: r["cells"]
            for r in queries.select(
                "vec_id",
                F.slice(
                    _cell_ranks(F.col("embedding").cast("array<double>"), cents), 1, 2
                ).alias("cells"),
            ).collect()
        }
        for r in got:
            assert cell_of[r["corpus_id"]] in probed[r["query_id"]]

    def test_adc_empty_corpus(self, spark):
        from reader_spark.ops.ann import md5_pq_codebooks, pq_adc_topk, pq_encode

        books = md5_pq_codebooks(dim=64, m=8, k=16)
        empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
        assert pq_adc_topk(pq_encode(empty, books), books, [0.0] * 64).count() == 0


class TestBlocklistFilter:
    def _docs(self, spark):
        rows = [
            (1, "The quick brown fox"),
            (2, "BADWORD in caps and badword again, badword!"),
            (3, "clean text with otherbad term"),
            (4, ""),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hits_and_keep(self, spark):
        from reader_spark.ops.textstats import blocklist_filter

        got = {
            r.doc_id: r
            for r in blocklist_filter(
                self._docs(spark), ("badword", "otherbad", "absent")
            ).collect()
        }
        assert got[1].n_hits == 0 and got[1].keep == 1
        assert got[2].n_hits == 3 and got[2].n_distinct_bad == 1
        assert got[2].keep == 0
        assert got[3].n_hits == 1 and got[3].keep == 0
        assert got[4].n_hits == 0 and got[4].keep == 1  # empty doc survives

    def test_empty_list_rejected(self, spark):
        from reader_spark.ops.textstats import blocklist_filter

        with pytest.raises(ValueError, match="blocklist"):
            blocklist_filter(self._docs(spark), ())

    def test_word_dim_broadcasts(self, spark):
        from reader_spark.ops.textstats import blocklist_filter

        plan = (
            blocklist_filter(self._docs(spark), ("badword",))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestTokenizerFertility:
    def test_multibyte_and_ratios(self, spark):
        from reader_spark.ops.textstats import tokenizer_fertility

        rows = [
            ("en", "four words right here"),   # 21 chars, 21 bytes, 4 tokens
            ("zh", "日本 語"),      # 4 chars, 10 bytes, 2 tokens
        ]
        df = spark.createDataFrame(rows, "lang string, text string")
        got = {r.lang: r for r in tokenizer_fertility(df).collect()}
        assert got["en"].tokens == 4
        assert got["en"].chars_per_token == pytest.approx(21 / 4)
        assert got["en"].bytes_per_char == 1.0
        assert got["zh"].bytes_per_char == pytest.approx(10 / 4)
        assert got["zh"].tokens_per_doc == 2.0


class TestSourceDiversity:
    def test_template_collapse_vs_unique(self, spark):
        from reader_spark.ops.textstats import source_diversity

        rows = [
            # 'tpl': three docs with IDENTICAL text -> distinct == per-doc
            ("tpl", "the same old line again"),
            ("tpl", "the same old line again"),
            ("tpl", "the same old line again"),
            # 'uni': three docs with disjoint vocab -> ratio 1.0
            ("uni", "alpha bravo charlie"),
            ("uni", "delta echo foxtrot"),
            ("uni", "golf hotel india"),
        ]
        df = spark.createDataFrame(rows, "source string, text string")
        got = {
            (r.source, r.n): r for r in source_diversity(df, ns=(1, 2)).collect()
        }
        assert got[("tpl", 1)].total_grams == 15  # 3 docs x 5 distinct words
        assert got[("tpl", 1)].distinct_grams == 5
        assert got[("tpl", 1)].distinct_ratio == pytest.approx(1 / 3)
        assert got[("uni", 1)].distinct_ratio == 1.0
        assert got[("uni", 2)].distinct_ratio == 1.0

    def test_short_doc_fallback_and_validation(self, spark):
        from reader_spark.ops.textstats import source_diversity

        df = spark.createDataFrame(
            [("s", "one two")], "source string, text string"
        )
        got = {r.n: r for r in source_diversity(df, ns=(3,)).collect()}
        # 2 tokens < n=3: the full sequence is the single gram
        assert got[3].total_grams == 1 and got[3].distinct_grams == 1
        with pytest.raises(ValueError, match="n-gram"):
            source_diversity(df, ns=(0,))

    def test_all_empty_source_stays_visible(self, spark):
        from reader_spark.ops.textstats import source_diversity

        df = spark.createDataFrame(
            [("live", "alpha bravo"), ("empty", "")],
            "source string, text string",
        )
        got = {
            (r.source, r.n): r for r in source_diversity(df, ns=(1,)).collect()
        }
        assert got[("empty", 1)].total_grams == 0
        assert got[("empty", 1)].distinct_ratio is None
        assert got[("live", 1)].distinct_ratio == 1.0


class TestCurriculumOrder:
    def test_positions_are_a_permutation_and_bucket_monotone(self, spark):
        from reader_spark.ops.sampling import curriculum_order

        df = spark.createDataFrame(
            [(i, (i % 5) * 300) for i in range(40)], "doc_id long, n_chars long"
        )
        rows = curriculum_order(df, buckets=4, width=300).collect()
        positions = sorted(r.position for r in rows)
        assert positions == list(range(1, 41))  # dense 1..n permutation
        # every doc in a lower bucket precedes every doc in a higher one
        by_bucket = {}
        for r in rows:
            by_bucket.setdefault(r.bucket, []).append(r.position)
        buckets = sorted(by_bucket)
        for lo, hi in zip(buckets, buckets[1:]):
            assert max(by_bucket[lo]) < min(by_bucket[hi])
        # width=300, buckets=4: cost 1200 (i%5==4) capped into bucket 3
        assert {r.bucket for r in rows} == {0, 1, 2, 3}

    def test_seed_changes_within_bucket_order_only(self, spark):
        from reader_spark.ops.sampling import curriculum_order

        df = spark.createDataFrame(
            [(i, 10) for i in range(30)], "doc_id long, n_chars long"
        )
        a = {r.doc_id: r.position for r in curriculum_order(df, seed=0).collect()}
        b = {r.doc_id: r.position for r in curriculum_order(df, seed=1).collect()}
        assert a != b  # different shuffle
        assert sorted(a.values()) == sorted(b.values())  # same slots
        # deterministic: same seed reproduces exactly
        a2 = {r.doc_id: r.position for r in curriculum_order(df, seed=0).collect()}
        assert a == a2

    def test_validation(self, spark):
        from reader_spark.ops.sampling import curriculum_order

        df = spark.createDataFrame([(1, 10)], "doc_id long, n_chars long")
        with pytest.raises(ValueError, match="buckets"):
            curriculum_order(df, buckets=0)


class TestTokenEntropy:
    def test_hand_computed_entropy(self, spark):
        import math

        from reader_spark.ops.textstats import token_entropy

        # "a a b b" -> p = 0.5/0.5 -> 1 bit; "a a a a" -> 0 bits
        df = spark.createDataFrame(
            [(1, "a a b b"), (2, "a a a a"), (3, "a b c d")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in token_entropy(df).collect()}
        assert got[1].entropy_bits == pytest.approx(1.0, abs=1e-6)
        assert got[1].n_tokens == 4 and got[1].n_distinct == 2
        assert got[2].entropy_bits == 0.0
        assert got[3].entropy_bits == pytest.approx(2.0, abs=1e-6)
        # uneven split: 3/4, 1/4
        df2 = spark.createDataFrame([(1, "x x x y")], "doc_id long, text string")
        want = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
        got2 = token_entropy(df2).collect()[0]
        assert got2.entropy_bits == pytest.approx(want, abs=1e-5)

    def test_zero_token_doc_survives(self, spark):
        from reader_spark.ops.textstats import token_entropy

        df = spark.createDataFrame(
            [(1, "!!! ..."), (2, None)], "doc_id long, text string"
        )
        got = {r.doc_id: r for r in token_entropy(df).collect()}
        assert got[1].n_tokens == 0 and got[1].entropy_bits == 0.0
        assert got[2].n_tokens == 0 and got[2].entropy_bits == 0.0


class TestGopherRules:
    def test_gate_behavior_on_crafted_docs(self, spark):
        from reader_spark.ops.textstats import gopher_quality_columns

        good = " ".join(f"sentence number {i} contains readable prose" for i in range(12))
        bullets = "\n".join(f"- item {i}" for i in range(20))
        teasers = "\n".join(f"read more about topic {i}..." for i in range(10))
        symbols = " ".join("#tag" for _ in range(60))
        df = spark.createDataFrame(
            [("good", good), ("bullets", bullets), ("teasers", teasers), ("symbols", symbols)],
            "doc_id string, text string",
        )
        rows = {r["doc_id"]: r for r in gopher_quality_columns(df).collect()}
        assert rows["good"]["gopher_pass"]
        assert rows["bullets"]["bullet_line_ratio"] == 1.0
        assert not rows["bullets"]["gopher_pass"]
        assert rows["teasers"]["ellipsis_line_ratio"] == 1.0
        assert not rows["teasers"]["gopher_pass"]
        assert rows["symbols"]["symbol_word_ratio"] >= 0.9
        assert not rows["symbols"]["gopher_pass"]

    def test_duplicate_line_fraction(self, spark):
        from reader_spark.ops.textstats import gopher_quality_columns

        df = spark.createDataFrame(
            [("dup", "same line\nsame line\nsame line\nother line")],
            "doc_id string, text string",
        )
        row = gopher_quality_columns(df).head()
        assert row["dup_line_fraction"] == 0.5


class TestPiiScrub:
    def test_mask_and_counts(self, spark):
        from reader_spark.ops.textstats import mask_pii_col, pii_count_columns

        text = (
            "Mail a.user+tag@sub.example.org or b@x.io, call +44 20 7946 0958, "
            "server at 192.168.0.1 and 8.8.8.8."
        )
        df = pii_count_columns(
            spark.createDataFrame([("d", text)], "doc_id string, text string")
        ).select("n_emails", "n_ipv4", "n_phones", mask_pii_col(F.col("text")).alias("m"))
        row = df.head()
        assert (row["n_emails"], row["n_ipv4"], row["n_phones"]) == (2, 2, 1)
        m = row["m"]
        assert "<EMAIL>" in m and "<IP>" in m and "<PHONE>" in m
        assert "example.org" not in m and "192.168" not in m and "7946" not in m

    def test_clean_text_untouched(self, spark):
        from reader_spark.ops.textstats import mask_pii_col

        df = spark.createDataFrame(
            [("d", "no pii here, just words and 3.14 constants")],
            "doc_id string, text string",
        )
        assert df.select(mask_pii_col(F.col("text")).alias("m")).head()["m"] == (
            "no pii here, just words and 3.14 constants"
        )


class TestTokenShards:
    def test_packing_boundaries(self, spark):
        from reader_spark.ops.textstats import shard_by_token_budget

        df = spark.createDataFrame(
            [("a", 400), ("b", 400), ("c", 400), ("d", 400)],
            "doc_id string, n_tokens int",
        )
        got = {
            r["doc_id"]: r["shard"]
            for r in shard_by_token_budget(df, budget=1000).collect()
        }
        # exclusive cumsum: a@0, b@400, c@800 -> shard 0; d@1200 -> shard 1
        assert got == {"a": 0, "b": 0, "c": 0, "d": 1}

    def test_partitioned_packing_is_per_partition(self, spark):
        from reader_spark.ops.textstats import shard_by_token_budget

        df = spark.createDataFrame(
            [("a", "en", 700), ("b", "en", 700), ("c", "de", 700), ("d", "de", 700)],
            "doc_id string, lang string, n_tokens int",
        )
        got = {
            (r["lang"], r["doc_id"]): r["shard"]
            for r in shard_by_token_budget(
                df, budget=1000, partition_cols=("lang",)
            ).collect()
        }
        assert got == {("en", "a"): 0, ("en", "b"): 0, ("de", "c"): 0, ("de", "d"): 0}


class TestDatasetSplits:
    def test_deterministic_stable_and_proportional(self, spark):
        from reader_spark.ops.sampling import split_column

        docs = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
        fr = {"train": 0.8, "val": 0.1, "test": 0.1}
        labeled = docs.select(
            "doc_id", split_column(F.col("doc_id"), fr).alias("split")
        )
        counts = {r["split"]: r["count"] for r in labeled.groupBy("split").count().collect()}
        assert set(counts) == {"train", "val", "test"}
        assert abs(counts["train"] / 5000 - 0.8) < 0.03  # hash-uniform carve

        # stability: a doc's split never changes when the corpus shrinks/grows
        subset = docs.where("doc_id % 3 = 0").select(
            "doc_id", split_column(F.col("doc_id"), fr).alias("split")
        )
        full = {r["doc_id"]: r["split"] for r in labeled.collect()}
        for r in subset.collect():
            assert full[r["doc_id"]] == r["split"]

    def test_portable_family_same_properties(self, spark):
        from reader_spark.ops.sampling import split_column

        docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        fr = {"train": 0.5, "rest_named": 0.5}
        labeled = docs.select(
            "doc_id",
            split_column(F.col("doc_id"), fr, portable=True).alias("split"),
        )
        counts = {r["split"]: r["count"] for r in labeled.groupBy("split").count().collect()}
        assert abs(counts["train"] / 2000 - 0.5) < 0.05

    def test_overcommitted_fractions_raise(self, spark):
        import pytest as _pytest

        from reader_spark.ops.sampling import split_column

        with _pytest.raises(ValueError):
            split_column(F.lit("x"), {"a": 0.9, "b": 0.2})

    def test_stratified_sample_rates_and_stability(self, spark):
        from reader_spark.ops.sampling import stratified_sample_flag

        docs = spark.range(0, 6000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, "en").otherwise("rare").alias("lang"),
        )
        flagged = docs.select(
            "doc_id",
            "lang",
            stratified_sample_flag(
                F.col("doc_id"), F.col("lang"), {"en": 0.2}, default_rate=1.0
            ).alias("kept"),
        )
        rates = {
            r["lang"]: r["rate"]
            for r in flagged.groupBy("lang")
            .agg(F.avg(F.col("kept").cast("double")).alias("rate"))
            .collect()
        }
        assert abs(rates["en"] - 0.2) < 0.04  # hash-uniform
        assert rates["rare"] == 1.0
        # stability: same key+stratum -> same decision on a shuffled subset
        sub = {
            r["doc_id"]: r["kept"]
            for r in flagged.where("doc_id % 7 = 0").collect()
        }
        full = {r["doc_id"]: r["kept"] for r in flagged.collect()}
        assert all(full[k] == v for k, v in sub.items())

    def test_stratified_sample_invalid_rate_raises(self, spark):
        import pytest as _pytest

        from reader_spark.ops.sampling import stratified_sample_flag

        with _pytest.raises(ValueError, match="outside"):
            stratified_sample_flag(F.lit("x"), F.lit("en"), {"en": 1.5})

    def test_empty_fractions_raise(self, spark):
        import pytest as _pytest

        from reader_spark.ops.sampling import split_column

        with _pytest.raises(ValueError, match="at least one split"):
            split_column(F.lit("x"), {})

    def test_temperature_mix_flattens_head(self, spark):
        """alpha=0.5 must sample the rare group at a HIGHER rate than the
        dominant one (that is the whole point of temperature mixing)."""
        from reader_spark.ops.sampling import temperature_mix_sample

        docs = spark.range(0, 5000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 == 0, "rare").otherwise("big").alias("lang"),
        )
        kept = temperature_mix_sample(
            docs, F.col("doc_id"), ["lang"], alpha=0.5, target_total=1000
        )
        rates = {r["lang"]: r["mix_rate"] for r in kept.select("lang", "mix_rate").distinct().collect()}
        assert rates["rare"] > rates["big"]
        # realized sample size lands near the target (hash-uniform noise)
        n = kept.count()
        assert abs(n - 1000) < 100
        # rates never exceed 1
        assert all(0.0 < r <= 1.0 for r in rates.values())

    def test_temperature_mix_deterministic_and_stable(self, spark):
        """A doc's keep decision is a pure function of (key, group counts):
        re-running yields the identical sample."""
        from reader_spark.ops.sampling import temperature_mix_sample

        docs = spark.range(0, 2000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("g"),
        )
        pick = lambda: sorted(
            r["doc_id"]
            for r in temperature_mix_sample(
                docs, F.col("doc_id"), ["g"], target_total=500, portable=True
            ).collect()
        )
        assert pick() == pick()

    def test_temperature_mix_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.sampling import temperature_mix_sample

        docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        with _pytest.raises(ValueError, match="alpha"):
            temperature_mix_sample(docs, F.col("doc_id"), ["doc_id"], alpha=0.0)
        with _pytest.raises(ValueError, match="target_total"):
            temperature_mix_sample(docs, F.col("doc_id"), ["doc_id"], target_total=0)
        with _pytest.raises(ValueError, match="at least one column"):
            temperature_mix_sample(docs, F.col("doc_id"), [])

    def test_bucket_never_negative(self, spark):
        """pmod, not abs+%: Long.MIN_VALUE-hashing keys must land in a real
        bucket, and every bucket must be in [0, BUCKETS)."""
        from reader_spark.ops.sampling import BUCKETS, _bucket

        docs = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
        stats = docs.select(
            _bucket(F.col("doc_id"), portable=False).alias("b")
        ).agg(F.min("b").alias("lo"), F.max("b").alias("hi")).head()
        assert 0 <= stats["lo"] and stats["hi"] < BUCKETS


class TestEventTransitions:
    def test_matrix_on_hand_sequence(self, spark):
        """Drive the registered query's logic on a tiny fixture written to
        a temp sf_dir-shaped directory."""
        import datetime as dt
        import tempfile

        from pyspark.sql import Row

        import __spark_entry__ as entry

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            # user 1: a -> b -> a ; user 2: a -> b
            Row(event_id=1, ts=t0, user_id=1, event_type="a", value=0.0, props="{}"),
            Row(event_id=2, ts=t0 + dt.timedelta(seconds=1), user_id=1, event_type="b", value=0.0, props="{}"),
            Row(event_id=3, ts=t0 + dt.timedelta(seconds=2), user_id=1, event_type="a", value=0.0, props="{}"),
            Row(event_id=4, ts=t0, user_id=2, event_type="a", value=0.0, props="{}"),
            Row(event_id=5, ts=t0 + dt.timedelta(seconds=1), user_id=2, event_type="b", value=0.0, props="{}"),
        ]
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(rows).write.parquet(f"{d}/events.parquet")
            got = {
                (r.from_type, r.to_type): (r.n, r.prob)
                for r in entry.queries()["event_transitions"](spark, d).collect()
            }
        # a->b twice (prob 1.0 from a), b->a once (prob 1.0 from b)
        assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}

    def test_tie_break_by_event_id(self, spark):
        """Two events at the SAME timestamp: sequence order (and hence the
        transition) is pinned by event_id, not partition luck."""
        import datetime as dt
        import tempfile

        from pyspark.sql import Row

        import __spark_entry__ as entry

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            Row(event_id=2, ts=t0, user_id=1, event_type="b", value=0.0, props="{}"),
            Row(event_id=1, ts=t0, user_id=1, event_type="a", value=0.0, props="{}"),
        ]
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(rows).write.parquet(f"{d}/events.parquet")
            got = [
                (r.from_type, r.to_type)
                for r in entry.queries()["event_transitions"](spark, d).collect()
            ]
        assert got == [("a", "b")]


class TestIncrementalDedup:
    def _batches(self, spark):
        from pyspark.sql import Row

        base = "the quick brown fox jumps over the lazy dog near the river bank today"
        old = [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text="completely different words about spark shuffles and joins here"),
            # old-old near-dup pair: must NOT appear in cross-batch output
            Row(doc_id=3, text="alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            Row(doc_id=4, text="alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        ]
        new = [
            Row(doc_id=10, text=base + " extra"),  # near-dup of old doc 1
            Row(doc_id=11, text="novel content with no overlap at all whatsoever in any way"),
            # new-new dup pair: must NOT appear either
            Row(doc_id=12, text="mu nu xi omicron pi rho sigma tau upsilon phi"),
            Row(doc_id=13, text="mu nu xi omicron pi rho sigma tau upsilon phi"),
        ]
        return spark.createDataFrame(old), spark.createDataFrame(new)

    def test_cross_batch_pairs_only(self, spark):
        from reader_spark.ops.dedup import incremental_near_dups

        old, new = self._batches(spark)
        got = incremental_near_dups(
            old, new, "doc_id", "text", threshold=0.5, portable=True
        ).collect()
        assert [(r.new_doc, r.old_doc) for r in got] == [(10, 1)]
        assert got[0].jaccard >= 0.5

    def test_production_hash_family_agrees(self, spark):
        from reader_spark.ops.dedup import incremental_near_dups

        old, new = self._batches(spark)
        port = incremental_near_dups(old, new, "doc_id", "text", threshold=0.5, portable=True)
        prod = incremental_near_dups(old, new, "doc_id", "text", threshold=0.5, portable=False)
        # verified pairs are hash-family independent at this recall
        assert sorted(map(tuple, port.collect())) == sorted(map(tuple, prod.collect()))

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.dedup import incremental_near_dups

        old, new = self._batches(spark)
        with _pytest.raises(ValueError, match="must equal"):
            incremental_near_dups(old, new, "doc_id", "text", bands=3)
        with _pytest.raises(ValueError, match="threshold"):
            incremental_near_dups(old, new, "doc_id", "text", threshold=0.0)
        with _pytest.raises(ValueError, match="old_df"):
            incremental_near_dups(None, new, "doc_id", "text")

    def test_prebuilt_index_geometry_mismatch_raises(self, spark):
        """A prebuilt index with the wrong band count or hash family must
        fail loudly, not silently report zero near-dups (ADVICE r3)."""
        import pytest as _pytest

        from reader_spark.ops.dedup import (
            build_band_index,
            incremental_near_dups,
        )

        old, new = self._batches(spark)
        idx8 = build_band_index(
            old, "doc_id", "text", num_hashes=32, bands=8, rows_per_band=4
        )
        with _pytest.raises(ValueError, match="band-geometry"):
            incremental_near_dups(
                None, new, "doc_id", "text", index=idx8
            )
        idx_md5 = build_band_index(old, "doc_id", "text", portable=True)
        with _pytest.raises(ValueError, match="hash-family"):
            incremental_near_dups(
                None, new, "doc_id", "text", portable=False, index=idx_md5
            )

    @pytest.mark.parametrize("portable", [True, False])
    def test_persisted_index_identical_to_inline(
        self, spark, tmp_path, portable
    ):
        """The on-disk band index must reproduce the inline result
        bit-for-bit: build_band_index -> parquet -> read back -> indexed
        query == one-shot query (VERDICT r2 #5)."""
        from reader_spark.ops.dedup import (
            build_band_index,
            incremental_near_dups,
        )

        old, new = self._batches(spark)
        inline = sorted(
            map(
                tuple,
                incremental_near_dups(
                    old, new, "doc_id", "text",
                    threshold=0.5, portable=portable,
                ).collect(),
            )
        )
        path = str(tmp_path / f"band_index_{portable}")
        build_band_index(
            old, "doc_id", "text", portable=portable
        ).write.parquet(path)
        indexed = sorted(
            map(
                tuple,
                incremental_near_dups(
                    None, new, "doc_id", "text",
                    threshold=0.5, portable=portable,
                    index=spark.read.parquet(path),
                ).collect(),
            )
        )
        assert indexed == inline and len(inline) == 1

    def test_index_schema_and_band_values_match_inline(self, spark):
        """band_hashes[band_id] in the index must equal the inline
        banding's band_hash for every (doc, band) — the index IS the
        banding, just pivoted per doc."""
        from reader_spark.ops.dedup import (
            _minhash_banded,
            build_band_index,
            minhash_signatures,
        )

        old, _ = self._batches(spark)
        idx = build_band_index(old, "doc_id", "text")
        assert set(idx.columns) == {"doc", "band_hashes", "shingle_set"}
        from_index = {
            (r.doc, b_id, h)
            for r in idx.collect()
            for b_id, h in enumerate(r.band_hashes)
        }
        inline = {
            (r.doc, r.band_id, r.band_hash)
            for r in _minhash_banded(
                minhash_signatures(old, "doc_id", "text"), 16, 4
            ).collect()
        }
        assert from_index == inline


class TestUnigramLM:
    def _docs(self, spark):
        from pyspark.sql import Row

        common = "the cat sat on the mat and the dog sat on the rug"
        return spark.createDataFrame(
            [
                Row(doc_id=1, text=common),
                Row(doc_id=2, text="the dog and the cat sat on the mat"),
                Row(doc_id=3, text="zyx qwv jkq xxz vvq plf"),  # gibberish
            ]
        )

    def test_gibberish_scores_worse(self, spark):
        from reader_spark.ops.textstats import unigram_lm_scores

        rows = {
            r.doc_id: r for r in unigram_lm_scores(self._docs(spark)).collect()
        }
        assert rows[3].avg_nll_bits > rows[1].avg_nll_bits
        assert rows[3].avg_nll_bits > rows[2].avg_nll_bits
        assert rows[1].n_tokens == 13

    def test_max_vocab_matches_full_when_uncapped(self, spark):
        from reader_spark.ops.textstats import unigram_lm_scores

        docs = self._docs(spark)
        full = sorted(map(tuple, unigram_lm_scores(docs).collect()))
        capped = sorted(
            map(tuple, unigram_lm_scores(docs, max_vocab=10_000).collect())
        )
        assert full == capped

    def test_oov_smoothing_under_tight_cap(self, spark):
        """With vocab truncated to the single most common token, every other
        word smooths to count 0 — scores stay finite and rank sanely."""
        from reader_spark.ops.textstats import unigram_lm_scores

        rows = {
            r.doc_id: r
            for r in unigram_lm_scores(self._docs(spark), max_vocab=1).collect()
        }
        assert all(r.avg_nll_bits > 0 for r in rows.values())
        # doc 3 has no 'the' at all -> every token OOV -> strictly worse
        assert rows[3].avg_nll_bits > rows[1].avg_nll_bits

    def test_invalid_cap_raises(self, spark):
        import pytest as _pytest

        from reader_spark.ops.textstats import unigram_lm_scores

        with _pytest.raises(ValueError, match="max_vocab"):
            unigram_lm_scores(self._docs(spark), max_vocab=0)


class TestLargeDocSketchLinearity:
    def test_giant_doc_sketches_finish(self, spark):
        """Regression: the windowers must be linear in doc length — the
        transform(sequence, slice) form was O(len^2) and a 300k-word doc
        (2 MiB, the C10 cap) never finished. Budget: seconds, not minutes."""
        import time

        from reader_spark.ops.dedup import shingles
        from reader_spark.ops.textstats import fingerprint_col

        big = " ".join(f"w{i % 997}" for i in range(300_000))
        df = spark.createDataFrame([(1, big)], "doc_id long, text string")
        t0 = time.monotonic()
        n_shingles = df.select(F.size(shingles(F.col("text"), 3)).alias("n")).head()["n"]
        fp = df.select(fingerprint_col(F.col("text")).alias("fp")).head()["fp"]
        assert n_shingles == 997  # 997 distinct trigram patterns by construction
        assert fp is not None
        assert time.monotonic() - t0 < 60  # quadratic form needed >300s


class TestTrigramLangId:
    def test_real_sentences(self, spark):
        from reader_spark.ops.textstats import detect_language_trigram_col

        rows = [
            (0, "the quick brown fox is jumping over the fence and doing the usual thing"),
            (1, "ich habe einen schönen Hund und der Hund ist schnell und einfach"),
            (2, "le chat est dans le jardin et il regarde les oiseaux pendant le matin"),
            (3, "la casa de mis padres y la de los vecinos quedan en la misma calle"),
            (4, "这是一个测试文档，用于检测中文文本的启发式方法。"),
            (5, "zzz qqq xxx"),  # no signal
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["lang"]
            for r in df.select(
                "doc_id", detect_language_trigram_col(F.col("text")).alias("lang")
            ).collect()
        }
        assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "zh", 5: "und"}


class TestTokenCounting:
    def test_bpe_ish_vs_whitespace(self, spark):
        from reader_spark.ops.textstats import bpe_token_count_col, token_count_col

        rows = [
            (0, "Hello, worlds 42 tests!"),      # 6 pieces vs 4 ws tokens
            (1, "plain words only here"),         # 4 vs 4
            (2, "x+=1; y*=2; z//=3"),             # punct-heavy: pieces >> ws
            (3, "it's"),                          # contraction splits
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["ws"], r["bpe"])
            for r in df.select(
                "doc_id",
                token_count_col(F.col("text")).alias("ws"),
                bpe_token_count_col(F.col("text")).alias("bpe"),
            ).collect()
        }
        assert got[0] == (4, 6)
        assert got[1] == (4, 4)
        assert got[2][1] > got[2][0]  # punctuation-heavy underestimated by ws
        assert got[3] == (1, 2)  # "it" + "'s"


class TestConnectedComponents:
    def test_clusters_merge_transitively(self, spark):
        from reader_spark.ops.dedup import connected_components

        # Two clusters: {1,2,3,4} chained, {10,11}; 20-21-22 chain via 21.
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
            "doc_a long, doc_b long",
        )
        got = {r["doc"]: r["component"] for r in connected_components(pairs).collect()}
        assert {got[1], got[2], got[3], got[4]} == {1}
        assert {got[10], got[11]} == {10}
        assert {got[20], got[21], got[22]} == {20}


class TestRepetitionRatio:
    def test_spam_vs_natural(self, spark):
        from reader_spark.ops.textstats import repetition_ratio_col

        rows = [
            (0, "buy cheap pills " * 50),                    # pure template
            (1, " ".join(f"unique{i} word{i*7%13} tok{i}" for i in range(50))),
            (2, "short text"),                                # sub-window
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["rr"]
            for r in df.select(
                "doc_id", repetition_ratio_col(F.col("text")).alias("rr")
            ).collect()
        }
        assert got[0] > 0.9   # 50x repeated trigram -> ~all windows repeat
        assert got[1] < 0.05  # natural text -> almost no repeats
        assert got[2] == 0.0  # shorter than a window


class TestCorpusScorecard:
    def test_shape_and_ranges(self, spark):
        import __spark_entry__ as entry

        rows = entry.queries()["corpus_scorecard"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert len(rows) >= 1
        for r in rows:
            assert r.n_docs > 0
            assert 0.0 <= r.pct_gopher_pass <= 1.0
            assert 0.0 <= r.dup_line_doc_rate <= 1.0
            assert r.mean_nll_bits > 0.0
            assert r.mean_tokens > 0.0


class TestSlidingWindows:
    def test_every_event_in_exactly_two_windows(self, spark):
        import __spark_entry__ as entry

        df = entry.queries()["events_sliding_windows"](
            spark, "/root/testdata/sf0.001"
        )
        total_events = spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        ).count()
        assert df.agg({"n": "sum"}).head()[0] == 2 * total_events

    def test_window_starts_are_half_hour_aligned(self, spark):
        import __spark_entry__ as entry
        from pyspark.sql import functions as F

        df = entry.queries()["events_sliding_windows"](
            spark, "/root/testdata/sf0.001"
        )
        misaligned = df.where(F.pmod("window_start_us", F.lit(1800000000)) != 0)
        assert misaligned.count() == 0


class TestTwapAndOutliers:
    def _events_dir(self, spark, tmp_path, rows):
        import datetime as dt

        from pyspark.sql import Row

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                Row(event_id=i, ts=t0 + dt.timedelta(seconds=s), user_id=u,
                    event_type=et, value=float(v), props="{}")
                for i, (u, s, et, v) in enumerate(rows)
            ]
        )
        d = str(tmp_path / "evt")
        df.write.parquet(f"{d}/events.parquet")
        return d

    def test_twap_differs_from_plain_avg(self, spark, tmp_path):
        import __spark_entry__ as entry

        # value 10 held 10s, then 20 held 30s, final obs carries no weight
        d = self._events_dir(
            spark, tmp_path,
            [(1, 0, "view", 10), (1, 10, "view", 20), (1, 40, "view", 99)],
        )
        r = entry.queries()["twap_user_value"](spark, d).head()
        assert r.n_intervals == 2
        assert r.span_s == 40.0
        assert r.twap == pytest.approx((10 * 10 + 20 * 30) / 40.0)
        assert r.plain_avg == pytest.approx(15.0)

    def test_single_event_user_excluded(self, spark, tmp_path):
        import __spark_entry__ as entry

        d = self._events_dir(spark, tmp_path, [(1, 0, "view", 5)])
        assert entry.queries()["twap_user_value"](spark, d).count() == 0

    def test_outlier_flagging(self, spark, tmp_path):
        import __spark_entry__ as entry

        # 40 values at 10 and one at 1000: only the spike exceeds |z|>2.5
        rows = [(1, s, "view", 10) for s in range(40)] + [(1, 99, "view", 1000)]
        d = self._events_dir(spark, tmp_path, rows)
        got = entry.queries()["value_outliers"](spark, d).collect()
        assert len(got) == 1
        assert got[0].value == 1000.0
        assert got[0].z > 2.5


class TestPrefixSimilarityJoin:
    def test_equals_brute_force(self, spark, corpus):
        from reader_spark.ops.dedup import ngram_jaccard_pairs, similarity_join_prefix

        got = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in similarity_join_prefix(
                corpus, "doc_id", "text", n=3, threshold=0.7
            ).collect()
        )
        brute = sorted(
            (r.doc_a, r.doc_b, round(r.jaccard, 6))
            for r in ngram_jaccard_pairs(
                corpus, "doc_id", "text", n=3, threshold=0.7
            ).collect()
        )
        assert got == brute
        assert got  # non-vacuous: the fixture has near-dups

    def test_prefix_is_a_strict_subset_of_tokens(self, spark, corpus):
        """The whole point: candidate generation joins on (1-tau)·m rarest
        tokens per doc, not all of them."""
        from pyspark.sql import Window

        from reader_spark.ops.dedup import shingles

        sets = corpus.select(
            F.col("doc_id").alias("doc"), shingles(F.col("text"), 3).alias("sh")
        )
        toks = sets.select("doc", F.explode("sh").alias("tok"))
        total = toks.count()
        m = F.count(F.lit(1)).over(Window.partitionBy("doc"))
        limit = m - F.ceil(F.lit(0.8) * m) + 1
        prefix_rows = (
            toks.withColumn(
                "r",
                F.row_number().over(Window.partitionBy("doc").orderBy("tok")),
            )
            .withColumn("lim", limit)
            .where(F.col("r") <= F.col("lim"))
            .count()
        )
        assert prefix_rows < total / 2

    def test_pairs_ordered_and_validated(self, spark, corpus):
        import pytest as _pytest

        from reader_spark.ops.dedup import similarity_join_prefix

        rows = similarity_join_prefix(corpus, "doc_id", "text", threshold=0.7).collect()
        assert all(r.doc_a < r.doc_b for r in rows)
        with _pytest.raises(ValueError, match="threshold"):
            similarity_join_prefix(corpus, "doc_id", "text", threshold=0.0)


class TestChiSquare:
    def _dir(self, spark, tmp_path, rows):
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(doc_id=i, text="t", lang=l, source=s, n_chars=1)
             for i, (l, s) in enumerate(rows)]
        )
        d = str(tmp_path / "docs")
        df.write.parquet(f"{d}/documents.parquet")
        return d

    def test_independent_uniform_table_is_zero(self, spark, tmp_path):
        import __spark_entry__ as entry

        # perfectly independent 2x2: chi2 == 0
        rows = [(l, s) for l in ("en", "de") for s in ("a", "b") for _ in range(5)]
        r = entry.queries()["lang_source_chi2"](spark, self._dir(spark, tmp_path, rows)).head()
        assert r.chi2 == 0.0 and r.dof == 1

    def test_perfect_dependence_with_zero_cells(self, spark, tmp_path):
        import __spark_entry__ as entry

        # en only in a, de only in b: chi2 = n (for 2x2 perfect association),
        # and the two EMPTY cells must contribute (missing them halves chi2)
        rows = [("en", "a")] * 10 + [("de", "b")] * 10
        r = entry.queries()["lang_source_chi2"](spark, self._dir(spark, tmp_path, rows)).head()
        assert r.chi2 == pytest.approx(20.0, abs=1e-6)
        assert r.dof == 1


class TestTopEventPaths:
    def test_paths_and_deterministic_cut(self, spark, tmp_path):
        import datetime as dt

        from pyspark.sql import Row

        import __spark_entry__ as entry

        t0 = dt.datetime(2024, 1, 1)
        # user 1: a b c a b c -> paths a>b>c x2, b>c>a x1, c>a>b x1
        seq = ["a", "b", "c", "a", "b", "c"]
        rows = [
            Row(event_id=i, ts=t0 + dt.timedelta(seconds=i), user_id=1,
                event_type=e, value=0.0, props="{}")
            for i, e in enumerate(seq)
        ]
        d = str(tmp_path / "evp")
        spark.createDataFrame(rows).write.parquet(f"{d}/events.parquet")
        got = [(r.path, r.n) for r in entry.queries()["top_event_paths"](spark, d).collect()]
        assert got[0] == ("a>b>c", 2)
        # equal-count paths ordered by path string: deterministic cut
        assert got[1:] == [("b>c>a", 1), ("c>a>b", 1)]


class TestTermPMI:
    def test_collocation_beats_independent_pair(self, spark, tmp_path):
        from pyspark.sql import Row

        import __spark_entry__ as entry

        # 'spark shuffle' always adjacent (collocation); 'foo'/'bar' random
        doc = ("spark shuffle foo bar " * 5) + ("bar foo spark shuffle " * 5)
        rows = [Row(doc_id=i, text=doc.strip(), lang="en", source="s", n_chars=1)
                for i in range(3)]
        d = str(tmp_path / "pmi")
        spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
        got = {(r.w1, r.w2): r.pmi for r in entry.queries()["term_pmi"](spark, d).collect()}
        assert ("spark", "shuffle") in got
        # the always-adjacent pair carries the highest PMI in the table
        assert got[("spark", "shuffle")] == max(got.values())

    def test_langid_confusion_covers_all_docs(self, spark):
        import __spark_entry__ as entry

        df = entry.queries()["langid_confusion"](spark, "/root/testdata/sf0.001")
        n_docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).count()
        assert df.agg({"n": "sum"}).head()[0] == n_docs


class TestNFCNormalize:
    def test_composition_and_flags(self, spark):
        import unicodedata

        from pyspark.sql import Row

        from reader_spark.ops.textstats import nfc_normalize_docs

        decomposed = "café and Åvocado"  # e+acute, A+ring
        df = spark.createDataFrame(
            [Row(doc_id=1, text=decomposed), Row(doc_id=2, text="plain ascii"),
             Row(doc_id=3, text=None)],
            schema="doc_id long, text string",
        )
        got = {r.doc_id: r for r in nfc_normalize_docs(df).collect()}
        assert got[1].changed == 1
        assert got[1].text_nfc == unicodedata.normalize("NFC", decomposed)
        assert "café" in got[1].text_nfc and "Åvocado" in got[1].text_nfc
        assert got[2].changed == 0 and got[2].text_nfc == "plain ascii"
        assert got[3].changed == 0 and got[3].text_nfc is None

    def test_idempotent(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.textstats import nfc_normalize_docs

        df = spark.createDataFrame([Row(doc_id=1, text="ligature ﬁ stays, é composes")])
        once = nfc_normalize_docs(df).head()
        again = nfc_normalize_docs(
            spark.createDataFrame([Row(doc_id=1, text=once.text_nfc)])
        ).head()
        assert again.changed == 0 and again.text_nfc == once.text_nfc


class TestLshQualityEval:
    def test_recall_is_one_at_reference_params(self, spark):
        import __spark_entry__ as entry

        r = entry.queries()["lsh_quality_eval"](spark, "/root/testdata/sf0.001").head()
        assert r.n_hit == r.n_true  # band-collision recall ~1 at J>=0.8
        assert r.recall == 1.0
        assert r.n_candidates >= r.n_hit
        assert 0.0 < r.precision <= 1.0


class TestSnapshotDiff:
    def test_change_taxonomy_counts(self, spark):
        import __spark_entry__ as entry

        rows = entry.queries()["snapshot_diff"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        by = {}
        for r in rows:
            by.setdefault(r.change, set()).add(r.doc_id)
        n_docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).count()
        # removed = multiples of 11 in [0, n_docs)
        assert by["removed"] == {i for i in range(n_docs) if i % 11 == 0}
        # changed = multiples of 7 that were NOT removed
        assert by["changed"] == {
            i for i in range(n_docs) if i % 7 == 0 and i % 11 != 0
        }
        # added = 25 fresh keys offset by 100000
        assert by["added"] == {100000 + i for i in range(min(25, n_docs))}
        # no overlap between classes
        assert not (by["removed"] & by["changed"])


class TestCdcChunks:
    def _chunks(self, spark, tmp_path, name, text):
        from pyspark.sql import Row

        d = str(tmp_path / name)
        spark.createDataFrame(
            [Row(doc_id=1, text=text, lang="en", source="s", n_chars=1)]
        ).write.parquet(f"{d}/documents.parquet")
        import __spark_entry__ as entry

        rows = sorted(
            entry.queries()["cdc_chunks"](spark, d).collect(),
            key=lambda r: r.chunk_id,
        )
        return [r.chunk_md5 for r in rows], [r.n_words for r in rows]

    def test_insertion_only_disturbs_local_chunks(self, spark, tmp_path):
        """THE content-defined property: prepending a word must leave every
        chunk after the first post-insertion boundary byte-identical —
        fixed-width chunking would shift and rewrite all of them."""
        import random

        rng = random.Random(7)
        words = " ".join(rng.choice("alpha beta gamma delta epsilon zeta eta theta".split())
                         for _ in range(400))
        base, _ = self._chunks(spark, tmp_path, "a", words)
        shifted, _ = self._chunks(spark, tmp_path, "b", "inserted " + words)
        assert len(base) > 20
        # all but the first chunk of the original reappear verbatim
        assert set(base[1:]) <= set(shifted)

    def test_chunks_cover_doc(self, spark, tmp_path):
        text = "one two three four five six seven eight nine ten"
        _, sizes = self._chunks(spark, tmp_path, "c", text)
        assert sum(sizes) == 10


class TestReadabilityAndHllIntersection:
    def test_fk_grade_on_real_sentences(self, spark, tmp_path):
        from pyspark.sql import Row

        import __spark_entry__ as entry

        simple = "The cat sat. The dog ran. We go now."
        complex_ = ("Extraordinarily sophisticated considerations "
                    "necessitate comprehensive organizational methodologies.")
        d = str(tmp_path / "fk")
        spark.createDataFrame(
            [Row(doc_id=1, text=simple, lang="en", source="s", n_chars=1),
             Row(doc_id=2, text=complex_, lang="en", source="s", n_chars=1)]
        ).write.parquet(f"{d}/documents.parquet")
        got = {r.doc_id: r for r in entry.queries()["readability_scores"](spark, d).collect()}
        assert got[1].n_sentences == 3
        assert got[2].fk_grade > got[1].fk_grade  # polysyllabic text reads harder

    def test_hll_intersection_close_to_exact(self, spark):
        import __spark_entry__ as entry

        r = entry.queries()["hll_intersection"](spark, "/root/testdata/sf0.001").head()
        assert r.exact_intersection > 0
        # inclusion-exclusion over m=64 sketches: generous relative band
        assert abs(r.est_intersection - r.exact_intersection) <= 0.5 * max(r.exact_intersection, 10)


class TestQuantileNorm:
    def test_uniformization_and_ties(self, spark, tmp_path):
        import datetime as dt

        from pyspark.sql import Row

        import __spark_entry__ as entry

        t0 = dt.datetime(2024, 1, 1)
        # values 1,2,2,3 -> avg ranks 1, 2.5, 2.5, 4 ; u = rank/5
        rows = [
            Row(event_id=i, ts=t0, user_id=1, event_type="a",
                value=float(v), props="{}")
            for i, v in enumerate([1, 2, 2, 3])
        ]
        d = str(tmp_path / "qn")
        spark.createDataFrame(rows).write.parquet(f"{d}/events.parquet")
        got = sorted(
            (r.value, r.u)
            for r in entry.queries()["value_quantile_norm"](spark, d).collect()
        )
        assert got == [(1.0, 0.2), (2.0, 0.5), (2.0, 0.5), (3.0, 0.8)]


class TestLabelCentroids:
    def test_tight_cluster_beats_loose(self, spark, tmp_path):
        import random

        from pyspark.sql import Row

        import __spark_entry__ as entry

        rng = random.Random(3)
        rows = []
        vid = 0
        # label 0: tight cluster around a fixed direction
        base = [rng.uniform(0.5, 1.0) for _ in range(8)]
        for _ in range(20):
            rows.append(Row(vec_id=vid, embedding=[v + rng.uniform(-0.01, 0.01) for v in base], label=0))
            vid += 1
        # label 1: scattered random directions
        for _ in range(20):
            rows.append(Row(vec_id=vid, embedding=[rng.uniform(-1, 1) for _ in range(8)], label=1))
            vid += 1
        d = str(tmp_path / "emb")
        spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").write.parquet(
            f"{d}/embeddings.parquet"
        )
        got = {r.label: r for r in entry.queries()["label_centroids"](spark, d).collect()}
        assert got[0].mean_cos > 0.999
        assert got[0].mean_cos > got[1].mean_cos
        assert got[0].n_vecs == 20 and got[1].n_vecs == 20


class TestAbTest:
    def test_known_split(self, spark, tmp_path):
        import datetime as dt

        from pyspark.sql import Row

        import __spark_entry__ as entry

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # variant A (even ids): 8/10 convert; variant B (odd): 2/10
        for u in range(20):
            rows.append(Row(event_id=u * 10, ts=t0, user_id=u,
                            event_type="view", value=0.0, props="{}"))
            converts = (u % 2 == 0 and u < 16) or (u % 2 == 1 and u < 4)
            if converts:
                rows.append(Row(event_id=u * 10 + 1, ts=t0, user_id=u,
                                event_type="purchase", value=95.0, props="{}"))
        d = str(tmp_path / "ab")
        spark.createDataFrame(rows).write.parquet(f"{d}/events.parquet")
        r = entry.queries()["ab_test_proportions"](spark, d).head()
        assert (r.n_a, r.n_b) == (10, 10)
        assert (r.c_a, r.c_b) == (8, 2)
        assert r.rate_a == 0.8 and r.rate_b == 0.2
        assert r.z > 1.96 and r.significant_05 == 1


class TestGiniAndEntropy:
    def test_gini_extremes(self, spark, tmp_path):
        import datetime as dt

        from pyspark.sql import Row

        import __spark_entry__ as entry

        def run(revenues, tag):
            d = str(tmp_path / tag)
            rows = [
                Row(o_orderkey=i, o_custkey=i, o_totalprice=float(v),
                    o_orderdate=dt.date(2024, 1, 1), o_orderstatus="O")
                for i, v in enumerate(revenues, 1)
            ]
            spark.createDataFrame(rows).write.parquet(f"{d}/orders.parquet")
            return entry.queries()["revenue_gini"](spark, d).head()

        equal = run([100.0] * 50, "eq")
        assert abs(equal.gini) < 0.01  # perfect equality -> ~0
        skew = run([1.0] * 49 + [100000.0], "sk")
        assert skew.gini > 0.9  # one customer holds everything -> ~1

    def test_entropy_extremes(self, spark, tmp_path):
        import datetime as dt

        from pyspark.sql import Row

        import __spark_entry__ as entry

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # user 1: all same type -> entropy 0; user 2: 4 types uniform -> 2 bits
        for i in range(8):
            rows.append(Row(event_id=i, ts=t0, user_id=1, event_type="a",
                            value=0.0, props="{}"))
        for i, et in enumerate(["a", "b", "c", "d"] * 2):
            rows.append(Row(event_id=100 + i, ts=t0, user_id=2, event_type=et,
                            value=0.0, props="{}"))
        d = str(tmp_path / "ent")
        spark.createDataFrame(rows).write.parquet(f"{d}/events.parquet")
        got = {r.user_id: r for r in entry.queries()["user_entropy"](spark, d).collect()}
        assert got[1].entropy_bits == 0.0 and got[1].n_types == 1
        assert got[2].entropy_bits == 2.0 and got[2].n_types == 4


class TestContainmentPairs:
    def _docs(self, spark):
        from pyspark.sql import Row

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        return spark.createDataFrame(
            [
                Row(doc_id=1, text=base),
                # quote: d2's shingles are a strict subset of d1's
                Row(doc_id=2, text="beta gamma delta epsilon zeta"),
                Row(doc_id=3, text="unrelated words with zero overlap at all"),
            ]
        )

    def test_asymmetric_quote_detected(self, spark):
        from reader_spark.ops.dedup import containment_pairs

        got = {
            (r.doc_a, r.doc_b): r.containment
            for r in containment_pairs(
                self._docs(spark), "doc_id", "text", threshold=0.5
            ).collect()
        }
        # d2 (3 shingles, all in d1) is fully contained in d1 ...
        assert got[(2, 1)] == 1.0
        # ... but d1 (8 shingles, 3 shared) is NOT contained in d2
        assert (1, 2) not in got
        assert all(3 not in pair for pair in got)

    def test_jaccard_misses_what_containment_catches(self, spark):
        from reader_spark.ops.dedup import containment_pairs, ngram_jaccard_pairs

        docs = self._docs(spark)
        jac = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
        cont = containment_pairs(docs, "doc_id", "text", threshold=0.5).collect()
        assert not jac and cont  # the asymmetric relation is the point

    def test_stop_shingle_cap_only_drops_common(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.dedup import containment_pairs

        common = "the quick brown fox jumps"
        rows = [Row(doc_id=i, text=f"{common} unique{i} tail{i} words{i}")
                for i in range(10)]
        rows.append(Row(doc_id=99, text=common))
        df = spark.createDataFrame(rows)
        uncapped = containment_pairs(df, "doc_id", "text", threshold=0.9)
        # doc 99 is contained in every other doc via the common prefix
        assert uncapped.where("doc_a = 99").count() == 10
        capped = containment_pairs(
            df, "doc_id", "text", threshold=0.9, max_doc_freq=5
        )
        # the cap drops the ubiquitous shingles -> those pairs vanish,
        # documented undercount behavior
        assert capped.where("doc_a = 99").count() == 0

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.dedup import containment_pairs

        with _pytest.raises(ValueError, match="threshold"):
            containment_pairs(self._docs(spark), "doc_id", "text", threshold=0.0)


class TestTfidfTopTerms:
    def _docs(self, spark):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [
                Row(doc_id=1, text="apple apple apple banana common"),
                Row(doc_id=2, text="banana banana cherry common"),
                Row(doc_id=3, text="cherry date common common"),
            ]
        )

    def test_hand_checked_scores(self, spark):
        import math

        from reader_spark.ops.search import tfidf_top_terms

        got = {
            (r.doc_id, r.rank): (r.term, r.tf, r.score)
            for r in tfidf_top_terms(self._docs(spark), "doc_id", "text", k=2).collect()
        }
        ln3 = round(math.log(3.0), 9)
        ln15 = round(math.log(1.5), 9)
        # doc 1: apple tf=3 df=1 -> 3*ln3 ; banana tf=1 df=2 -> ln1.5
        assert got[(1, 1)] == ("apple", 3, round(3 * ln3, 6))
        assert got[(1, 2)] == ("banana", 1, round(ln15, 6))
        # 'common' has df=3 -> idf 0, never ranks above real terms
        assert all(v[0] != "common" for v in got.values())

    def test_tie_broken_by_term(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.search import tfidf_top_terms

        df = spark.createDataFrame([Row(doc_id=1, text="zeta alpha"),
                                    Row(doc_id=2, text="other words")])
        r = tfidf_top_terms(df, "doc_id", "text", k=2).where("doc_id = 1").collect()
        assert [x.term for x in sorted(r, key=lambda x: x.rank)] == ["alpha", "zeta"]

    def test_punctuation_normalized(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.search import tfidf_top_terms

        df = spark.createDataFrame([Row(doc_id=1, text="Hello, HELLO!! world."),
                                    Row(doc_id=2, text="unrelated stuff")])
        top = tfidf_top_terms(df, "doc_id", "text", k=1).where("doc_id = 1").head()
        assert top.term == "hello" and top.tf == 2

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.search import tfidf_top_terms

        with _pytest.raises(ValueError, match="k must"):
            tfidf_top_terms(self._docs(spark), "doc_id", "text", k=0)


class TestDomainBoilerplate:
    def _docs(self, spark):
        from pyspark.sql import Row

        rows = [
            Row(doc_id=i, source="a",
                text=f"cookie banner unique{i} words here cookie banner")
            for i in range(4)
        ]
        rows += [Row(doc_id=10 + i, source="b", text=f"only{i} fresh{i} stuff{i}")
                 for i in range(4)]
        return spark.createDataFrame(rows)

    def test_template_line_flagged_per_domain(self, spark):
        from reader_spark.ops.lines import domain_boilerplate

        got = {
            (r.domain, r.line): (r.n_docs, r.doc_frac)
            for r in domain_boilerplate(
                self._docs(spark), words_per_line=2, min_frac=0.5
            ).collect()
        }
        # 'cookie banner' on 4/4 of domain a's docs; counted ONCE per doc
        # despite appearing twice in each (presence, not frequency)
        assert got[("a", "cookie banner")] == (4, 1.0)
        assert all(dom != "b" for dom, _ in got)

    def test_domains_independent(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.lines import domain_boilerplate

        df = spark.createDataFrame(
            [Row(doc_id=1, source="a", text="shared line"),
             Row(doc_id=2, source="b", text="shared line"),
             Row(doc_id=3, source="b", text="other words")]
        )
        got = {(r.domain, r.line): r.doc_frac
               for r in domain_boilerplate(df, min_frac=0.6).collect()}
        # 'shared line' is 1/1 of a but only 1/2 of b
        assert ("a", "shared line") in got and ("b", "shared line") not in got

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.lines import domain_boilerplate

        with _pytest.raises(ValueError, match="min_frac"):
            domain_boilerplate(self._docs(spark), min_frac=0.0)
        with _pytest.raises(ValueError, match="words_per_line"):
            domain_boilerplate(self._docs(spark), words_per_line=0)


class TestNoveltyScores:
    def test_hand_checked(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.dedup import novelty_scores

        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="a b c d e"),          # 3 shingles, all first
                Row(doc_id=2, text="a b c d e"),          # exact copy: redundancy 1
                Row(doc_id=3, text="a b c x y z"),        # 'a b c' seen, 3 new
            ]
        )
        got = {r.doc_id: r for r in novelty_scores(df, "doc_id", "text").collect()}
        assert (got[1].n_shingles, got[1].n_seen_before) == (3, 0)
        assert got[1].novelty == 1.0
        assert got[2].redundancy == 1.0 and got[2].novelty == 0.0
        assert (got[3].n_shingles, got[3].n_seen_before) == (4, 1)
        assert got[3].redundancy == 0.25

    def test_order_matters_first_doc_is_always_novel(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.dedup import novelty_scores

        df = spark.createDataFrame(
            [Row(doc_id=i, text="same repeated text here") for i in range(5)]
        )
        got = {r.doc_id: r.novelty for r in novelty_scores(df, "doc_id", "text").collect()}
        assert got[0] == 1.0 and all(got[i] == 0.0 for i in range(1, 5))


class TestSignedPermutation:
    def test_orthogonality_preserves_distances(self, spark):
        """A signed permutation is orthogonal: pairwise L2 distances in the
        transformed space equal the originals exactly."""
        from pyspark.sql import Row

        from reader_spark.ops.ann import (
            apply_signed_permutation,
            md5_signed_permutation,
        )

        import pyspark.sql.functions as F

        perm, signs = md5_signed_permutation(8)
        assert sorted(perm) == list(range(8))
        assert set(signs) <= {1.0, -1.0}
        df = spark.createDataFrame(
            [Row(a=[float(i + j) for i in range(8)]) for j in range(3)]
        )
        t = df.select(
            apply_signed_permutation(F.col("a"), perm, signs).alias("t"), "a"
        )
        row = t.select(
            F.aggregate("a", F.lit(0.0), lambda acc, x: acc + x * x).alias("n0"),
            F.aggregate("t", F.lit(0.0), lambda acc, x: acc + x * x).alias("n1"),
        ).head()
        assert row.n0 == row.n1

    def test_determinism_and_seed_independence(self):
        from reader_spark.ops.ann import md5_signed_permutation

        assert md5_signed_permutation(16) == md5_signed_permutation(16)
        assert md5_signed_permutation(16, seed=1) != md5_signed_permutation(16)


class TestMediaSniff:
    def test_known_magics(self, spark):
        from pyspark.sql import Row

        import pyspark.sql.functions as F

        from reader_spark.ops.multimodal import sniff_kind_col

        cases = [
            (bytes.fromhex("FFD8FF") + b"rest", "jpeg"),
            (bytes.fromhex("89504E470D0A1A0A") + b"x", "png"),
            (bytes.fromhex("47494638") + b"9a", "gif"),
            (b"RIFF1234WAVE", "riff"),
            (b"%PDF-1.7 blah", "pdf"),
            (bytes.fromhex("00000018") + b"ftypisom", "mp4"),
            (b"plain text bytes", "unknown"),
            (b"", "unknown"),
        ]
        df = spark.createDataFrame(
            [Row(i=i, content=c) for i, (c, _) in enumerate(cases)],
            "i int, content binary",
        )
        got = {
            r.i: r.kind
            for r in df.select(
                "i", sniff_kind_col(F.col("content")).alias("kind")
            ).collect()
        }
        for i, (_, want) in enumerate(cases):
            assert got[i] == want, (i, got[i], want)

    def test_stays_jvm_side(self, spark):
        from pyspark.sql import Row

        import pyspark.sql.functions as F

        from reader_spark.ops.multimodal import sniff_kind_col
        from tests.test_plans import plan_of

        df = spark.createDataFrame([Row(content=b"x")], "content binary")
        plan = plan_of(df.select(sniff_kind_col(F.col("content"))))
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestTokenBucket:
    def _events(self, spark):
        import datetime as dt

        from pyspark.sql import Row

        base = dt.datetime(2024, 1, 1)
        secs = [0, 1, 2, 3, 500_000, 500_001]
        return spark.createDataFrame(
            [Row(user_id=1, event_id=i, ts=base + dt.timedelta(seconds=s))
             for i, s in enumerate(secs)]
        )

    def test_burst_then_refill(self, spark):
        from reader_spark.ops.ratelimit import token_bucket_admission

        out = {
            r.event_id: r
            for r in token_bucket_admission(
                self._events(spark), capacity_tokens=3, us_per_unit=100_000
            ).collect()
        }
        # initial burst: capacity admits the first 3, 4th denied
        assert [out[i].admitted for i in range(4)] == [True, True, True, False]
        # long gap refills to capacity (500000s * 10 units/s >> cap)
        assert out[4].admitted and out[4].token_units == 2_000_000
        assert out[5].admitted  # 1s adds 10 units; 2.00001 tokens >= 1

    def test_keys_independent(self, spark):
        import datetime as dt

        from pyspark.sql import Row

        from reader_spark.ops.ratelimit import admission_summary, token_bucket_admission

        base = dt.datetime(2024, 1, 1)
        rows = [Row(user_id=u, event_id=u * 10 + i, ts=base + dt.timedelta(seconds=i))
                for u in (1, 2) for i in range(5)]
        s = {
            r.user_id: (r.n_admitted, r.n_denied)
            for r in admission_summary(
                token_bucket_admission(spark.createDataFrame(rows))
            ).collect()
        }
        # identical traffic -> identical independent decisions per key
        assert s[1] == s[2] == (3, 2)

    def test_integer_state_never_floats(self, spark):
        from reader_spark.ops.ratelimit import token_bucket_admission

        df = token_bucket_admission(self._events(spark))
        assert dict(df.dtypes)["token_units"] == "bigint"


class TestSemDeDup:
    """SemDeDup (Abbas et al. 2023): cell-bounded semantic prune."""

    def _emb(self, spark):
        from pyspark.sql import Row

        rows = []
        # two near-identical pairs (semantic dups) + orthogonal singletons
        rows.append(Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]))
        rows.append(Row(vec_id=1, embedding=[0.999, 0.01, 0.0, 0.0]))
        rows.append(Row(vec_id=2, embedding=[0.0, 1.0, 0.0, 0.0]))
        rows.append(Row(vec_id=3, embedding=[0.01, 0.999, 0.0, 0.0]))
        rows.append(Row(vec_id=4, embedding=[0.0, 0.0, 1.0, 0.0]))
        rows.append(Row(vec_id=5, embedding=[0.0, 0.0, 0.0, 1.0]))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def test_lowest_id_exemplar_survives(self, spark):
        from reader_spark.ops.semdedup import semdedup

        cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
                 [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
        got = {r.vec_id: r for r in semdedup(self._emb(spark), cents, tau=0.9).collect()}
        assert got[0].keep == 1 and got[1].keep == 0  # dup pair, min id kept
        assert got[2].keep == 1 and got[3].keep == 0
        assert got[4].keep == 1 and got[5].keep == 1  # singletons survive

    def test_cross_cell_pairs_never_compared(self, spark):
        """Vectors in different cells are never pruned against each other,
        even at tau=0 — the cell equi-join IS the candidate bound."""
        from reader_spark.ops.semdedup import semdedup

        cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
                 [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
        got = {r.vec_id: r.keep for r in semdedup(self._emb(spark), cents, tau=-1.0).collect()}
        # within-cell lower-id wins; cross-cell ids untouched
        assert got[0] == 1 and got[1] == 0
        assert got[2] == 1 and got[3] == 0
        assert got[4] == 1 and got[5] == 1

    def test_summary_accounting(self, spark):
        from reader_spark.ops.semdedup import semdedup, semdedup_summary

        cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
                 [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
        s = {r.cell: r for r in semdedup_summary(
            semdedup(self._emb(spark), cents, tau=0.9)).collect()}
        assert s[0].n_vectors == 2 and s[0].n_pruned == 1
        assert abs(s[0].prune_rate - 0.5) < 1e-9
        assert s[2].n_pruned == 0 and s[3].n_pruned == 0


class TestDsir:
    """DSIR importance weights (Xie et al. 2023, hashed n-gram models)."""

    def test_target_lookalikes_outrank(self, spark):
        """Docs drawn from the target distribution score higher log_w than
        docs from a disjoint-vocabulary distribution."""
        from pyspark.sql import Row, functions as F

        from reader_spark.ops.dsir import dsir_log_weights

        rows = []
        for i in range(20):
            rows.append(Row(doc_id=i, text="the quick brown fox jumps over the lazy dog", tag="t"))
        for i in range(20, 40):
            rows.append(Row(doc_id=i, text="zzz qqq xxx vvv kkk www jjj yyy nnn mmm", tag="r"))
        # one raw doc that LOOKS like the target but is not labeled target
        rows.append(Row(doc_id=99, text="the quick brown fox", tag="r"))
        df = spark.createDataFrame(rows)
        w = {r.doc_id: r.log_w for r in dsir_log_weights(
            df, "doc_id", "text", target=F.col("tag") == "t", buckets=64).collect()}
        assert w[99] > w[25]          # target-lookalike beats off-target
        assert w[0] > w[25]           # actual target docs rank high too

    def test_weights_deterministic_and_total_feats(self, spark):
        from pyspark.sql import functions as F

        from reader_spark.ops.dsir import dsir_log_weights, hashed_ngram_features

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = dsir_log_weights(docs, "doc_id", "text", F.col("lang") == "en")
        b = dsir_log_weights(docs, "doc_id", "text", F.col("lang") == "en")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        # n_feats = unigrams + bigrams = n + (n-1) per doc with n >= 1 tokens
        feats = hashed_ngram_features(docs.limit(1), "doc_id", "text")
        n_uni = docs.limit(1).selectExpr(
            "size(filter(split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), t -> t != '')) n"
        ).head()["n"]
        assert feats.count() == 2 * n_uni - 1


class TestDrift:
    """KS / PSI drift detectors: quiet on same-distribution, fire on shift."""

    def _arms(self, spark, mult):
        from pyspark.sql import Row
        import random

        rng = random.Random(7)
        rows = []
        for i in range(800):
            a = i % 2 == 0
            v = rng.gauss(50, 10)
            rows.append(Row(k="x", v=v if a else round(v * mult, 9), a=a))
        return spark.createDataFrame(rows)

    def test_ks_quiet_on_identical(self, spark):
        from reader_spark.ops.drift import ks_two_sample
        from pyspark.sql import functions as F

        r = ks_two_sample(self._arms(spark, 1.0), "k", "v", F.col("a")).head()
        assert r.drifted == 0 and r.ks <= r.ks_crit

    def test_ks_fires_on_scale_shift(self, spark):
        from reader_spark.ops.drift import ks_two_sample
        from pyspark.sql import functions as F

        r = ks_two_sample(self._arms(spark, 1.5), "k", "v", F.col("a")).head()
        assert r.drifted == 1 and r.ks > r.ks_crit
        assert r.n_a == 400 and r.n_b == 400

    def test_psi_fires_and_quiet(self, spark):
        from reader_spark.ops.drift import psi_deciles
        from pyspark.sql import functions as F

        quiet = psi_deciles(self._arms(spark, 1.0), "k", "v", F.col("a")).head()
        loud = psi_deciles(self._arms(spark, 2.0), "k", "v", F.col("a")).head()
        assert quiet.drifted == 0 and quiet.psi < 0.05
        assert loud.drifted == 1 and loud.psi > 0.2

    def test_ks_registered_query_fires_only_planted(self, spark):
        """At sf0.01 (~1000/arm) the five random splits stay under the
        alpha=0.05 critical value and only the planted 1.75x arm fires.
        (At sf0.001's ~100/arm, chance exceedances are expected — that's
        what the critical value means, not a detector bug.)"""
        import __spark_entry__ as entry

        got = {r.key: r.drifted for r in entry.queries()["value_ks_drift"](
            spark, "/root/testdata/sf0.01").collect()}
        assert got["click_shifted"] == 1
        assert all(v == 0 for k, v in got.items() if k != "click_shifted")


class TestSq8:
    def test_codes_bounds_and_reconstruction(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.ann import sq8_encode, sq8_train_ranges

        rows = [
            Row(vec_id=0, embedding=[0.0, -1.0, 5.0]),
            Row(vec_id=1, embedding=[1.0, 1.0, 5.0]),
            Row(vec_id=2, embedding=[0.5, 0.0, 5.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {r.vec_id: r.codes for r in sq8_encode(df, sq8_train_ranges(df)).collect()}
        assert got[0] == [0, 0, 0]        # mins -> 0; constant dim -> 0
        assert got[1][0] == 255 and got[1][1] == 255  # maxes -> 255
        assert got[2][0] == 127           # midpoint -> floor(127.5)
        # reconstruction error < one cell width
        mn, mx = 0.0, 1.0
        width = (mx - mn) / 255
        recon = mn + got[2][0] * width
        assert abs(recon - 0.5) <= width

    def test_corpus_codes_in_range_every_dim(self, spark):
        from pyspark.sql import functions as F

        from reader_spark.ops.ann import sq8_encode, sq8_train_ranges

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        enc = sq8_encode(emb, sq8_train_ranges(emb))
        bad = enc.where(
            F.exists(F.col("codes"), lambda c: (c < 0) | (c > 255))
        ).count()
        assert bad == 0
        assert enc.count() == emb.count()


class TestWinnowing:
    """Schleimer et al. 2003: shared runs >= w+k-1 tokens MUST share a
    selected fingerprint; selection density ~ 2/(w+1)."""

    def test_shared_run_guarantees_common_fingerprint(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.winnow import winnow_fingerprints

        shared = "alpha beta gamma delta epsilon zeta"  # 6 = w+k-1 tokens
        df = spark.createDataFrame([
            Row(doc_id=1, text=f"one two three {shared} four five six"),
            Row(doc_id=2, text=f"nine eight {shared} seven"),
            Row(doc_id=3, text="totally different words everywhere here now"),
        ])
        sel = winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect()
        by_doc = {}
        for r in sel:
            by_doc.setdefault(r.doc_id, set()).add(r.gram_hash)
        assert by_doc[1] & by_doc[2]          # guarantee holds
        assert not (by_doc[1] & by_doc[3])    # disjoint text, disjoint prints

    def test_density_and_determinism(self, spark):
        from reader_spark.ops.winnow import positional_shingles, winnow_fingerprints

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        sel = winnow_fingerprints(docs, "doc_id", "text", k=3, w=4)
        n_sel = sel.count()
        n_grams = positional_shingles(docs, "doc_id", "text", 3).count()
        # expected density 2/(w+1) = 0.4 of the gram stream (distinct-ness
        # and short docs move it a bit); assert the bounded-fraction claim
        assert 0.2 <= n_sel / n_grams <= 0.6
        again = winnow_fingerprints(docs, "doc_id", "text", k=3, w=4)
        assert sorted(map(tuple, sel.collect())) == sorted(map(tuple, again.collect()))

    def test_short_doc_single_fingerprint(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.winnow import winnow_fingerprints

        df = spark.createDataFrame([Row(doc_id=1, text="only two")])
        got = winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect()
        assert len(got) == 1 and got[0].sel_pos == 0


class TestKCenter:
    def test_picks_spread_and_radius_monotone(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.coreset import k_center_select

        # three tight clusters + one outlier; k=4 must hit all four groups
        rows, vid = [], 0
        for base in ([0.0, 0.0], [10.0, 0.0], [0.0, 10.0]):
            for j in range(5):
                rows.append(Row(vec_id=vid, embedding=[base[0] + j * 0.01, base[1]]))
                vid += 1
        rows.append(Row(vec_id=vid, embedding=[50.0, 50.0]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = k_center_select(df, k=4).collect()
        picked = {r.vec_id for r in got}
        assert 0 in picked           # deterministic seed = smallest id
        assert vid in picked         # outlier must be covered
        radii = [r.radius for r in sorted(got, key=lambda r: r.rank)]
        assert all(a >= b for a, b in zip(radii, radii[1:]))  # monotone non-increasing
        assert radii[-1] < radii[0] / 100  # 4 centers cover 4 groups tightly

    def test_k_larger_than_corpus(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.coreset import k_center_select

        df = spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(i), 0.0]) for i in range(3)],
            "vec_id long, embedding array<float>",
        )
        got = k_center_select(df, k=3).collect()
        assert {r.vec_id for r in got} == {0, 1, 2}


class TestQualityLogit:
    def test_junk_scores_below_clean_prose(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.textstats import quality_logit_score

        df = spark.createDataFrame([
            Row(doc_id=1, text="The committee reviewed the annual report and "
                               "found that the results were consistent with "
                               "expectations for the period under review."),
            Row(doc_id=2, text="$$$ ### 0x1f 0x2e !!! ??? ___ 999 %%% @@@ "
                               "^^^ &&& *** ((( ))) +++ === ~~~ ||| ;;; :::"),
        ])
        got = {r.doc_id: r for r in quality_logit_score(df).collect()}
        assert got[1].score > got[2].score
        assert got[1].keep == 1 and got[2].keep == 0

    def test_weight_override_moves_boundary(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.textstats import quality_logit_score

        df = spark.createDataFrame([Row(doc_id=1, text="plain simple words here")])
        hi = quality_logit_score(df, weights={"intercept": 5.0}).head()
        lo = quality_logit_score(df, weights={"intercept": -9.0}).head()
        assert hi.keep == 1 and lo.keep == 0


class TestWinnowPairs:
    def test_near_copies_found_disjoint_not(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.winnow import winnow_pairs

        shared = "the quick brown fox jumps over the lazy dog again and again"
        df = spark.createDataFrame([
            Row(doc_id=1, text=f"intro words {shared} closing remark"),
            Row(doc_id=2, text=f"other opening {shared} different end"),
            Row(doc_id=3, text="completely unrelated content about weather patterns today"),
        ])
        got = {(r.a, r.b): r.n_shared for r in winnow_pairs(df, "doc_id", "text").collect()}
        assert (1, 2) in got and got[(1, 2)] >= 2
        assert all({a, b} == {1, 2} for a, b in got)

    def test_stop_fingerprint_guard_kills_boilerplate_blowup(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.winnow import winnow_pairs

        # 30 docs sharing ONLY one boilerplate sentence: with max_df=10 the
        # shared prints are cut and no quadratic pair set is emitted
        boiler = "copyright notice all rights reserved contact us for terms"
        rows = [Row(doc_id=i, text=f"unique{i} w{i}x y{i}z {boiler}") for i in range(30)]
        df = spark.createDataFrame(rows)
        got = winnow_pairs(df, "doc_id", "text", min_shared=1, max_df=10).count()
        assert got == 0


class TestFeatureHash:
    def test_unit_norm_and_determinism(self, spark):
        from pyspark.sql import functions as F

        from reader_spark.ops.vectorize import feature_hash_vectors

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        vecs = feature_hash_vectors(docs)
        norms = vecs.select(
            F.aggregate("vector", F.lit(0.0), lambda a, v: a + v * v).alias("n2")
        ).collect()
        assert all(abs(r.n2 - 1.0) < 1e-3 for r in norms)  # round-6 components
        assert vecs.count() == docs.count()

    def test_similar_texts_closer_than_different(self, spark):
        from pyspark.sql import Row, functions as F

        from reader_spark.ops.vectorize import feature_hash_vectors
        from reader_spark.ops.ann import cosine_col

        df = spark.createDataFrame([
            Row(doc_id=1, text="the cat sat on the mat near the door"),
            Row(doc_id=2, text="the cat sat on the mat near the window"),
            Row(doc_id=3, text="quarterly revenue exceeded analyst forecasts substantially"),
        ])
        v = {r.doc_id: r.vector for r in feature_hash_vectors(df).collect()}
        import math
        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a)); nb = math.sqrt(sum(x * x for x in b))
            return d / (na * nb)
        assert cos(v[1], v[2]) > 0.8 > cos(v[1], v[3])

    def test_empty_text_zero_vector(self, spark):
        from pyspark.sql import Row

        from reader_spark.ops.vectorize import feature_hash_vectors

        df = spark.createDataFrame([Row(doc_id=1, text="real words here"),
                                    Row(doc_id=2, text="!!! ???")])
        got = {r.doc_id: r.vector for r in feature_hash_vectors(df).collect()}
        # doc 2 has no alnum tokens -> no rows survive the explode; absent
        assert 1 in got
        assert 2 not in got or all(x == 0.0 for x in got[2])


class TestRendezvousShard:
    def test_minimal_disruption_vs_pmod(self, spark):
        from pyspark.sql import functions as F

        from reader_spark.ops.shard import reshard_movement

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        mv = reshard_movement(docs, "doc_id", 8, 9)
        total = mv.count()
        moved = mv.where("moved = 1").count()
        # HRW bound: ~1/9 of keys move (binomial spread allowed)
        assert moved / total < 0.25
        # every moved key lands on the NEW shard (8) — nothing reshuffles
        # among surviving shards
        bad = mv.where((F.col("moved") == 1) & (F.col("shard_b") != 8)).count()
        assert bad == 0
        # contrast: pmod re-sharding moves ~8/9 of keys
        pm = docs.select(
            (F.pmod(F.col("doc_id"), 8) != F.pmod(F.col("doc_id"), 9)).cast("int").alias("m")
        ).agg(F.avg("m")).head()[0]
        assert pm > 0.8

    def test_balance(self, spark):
        from pyspark.sql import functions as F

        from reader_spark.ops.shard import rendezvous_shard

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        counts = [
            r["count"]
            for r in docs.select(rendezvous_shard(F.col("doc_id"), 8).alias("s"))
            .groupBy("s").count().collect()
        ]
        assert len(counts) == 8
        assert max(counts) < 2.2 * min(counts)  # hashed balance, 500 keys


class TestMojibake:
    def test_detect_and_repair_roundtrip(self, spark):
        from pyspark.sql import Row, functions as F

        from reader_spark.ops.textstats import (
            MOJIBAKE_MAP,
            mojibake_count_col,
            mojibake_fix_col,
        )

        corrupted = ("it\u00e2\u20ac\u2122s caf\u00c3\u00a9 "
                     "\u00e2\u20ac\u0153ok\u00e2\u20ac\u009d")
        clean = "it\u2019s caf\u00e9 \u201cok\u201d"
        df = spark.createDataFrame(
            [Row(t=corrupted), Row(t=clean), Row(t="plain ascii")]
        )
        got = df.select(
            mojibake_count_col(F.col("t")).alias("n"),
            mojibake_fix_col(F.col("t")).alias("fx"),
        ).collect()
        assert got[0].n == 4 and got[0].fx == clean
        assert got[1].n == 0 and got[1].fx == clean   # idempotent on clean
        assert got[2].n == 0 and got[2].fx == "plain ascii"
        # every map entry individually repairs
        for bad, good in MOJIBAKE_MAP.items():
            r = spark.createDataFrame([Row(t=f"x{bad}y")]).select(
                mojibake_fix_col(F.col("t")).alias("fx")).head()
            assert r.fx == f"x{good}y", hex(ord(good))


class TestHardNegatives:
    def test_negatives_cross_label_and_hardest_first(self, spark):
        import __spark_entry__ as entry

        rows = entry.queries()["hard_negatives"](
            spark, "/root/testdata/sf0.001").collect()
        assert rows
        by_anchor = {}
        for r in rows:
            assert r.anchor_label != r.neg_label  # never same-label
            by_anchor.setdefault(r.anchor_id, []).append(r)
        for rs in by_anchor.values():
            rs.sort(key=lambda r: r.rank)
            assert len(rs) == 3
            cos = [r.cosine for r in rs]
            assert cos == sorted(cos, reverse=True)  # hardest first

    def test_bucketed_contract_and_recall(self, spark):
        """The bucketed path obeys the same output contract, emits no
        same-label or duplicate pairs, and multiprobe recall of the brute
        top-3 is high on the fixture (LSH recall < 1 by construction,
        but Hamming-1 probing should recover most true hard negatives)."""
        from reader_spark.ops.ann import md5_plane_weights
        from reader_spark.ops.negatives import (
            hard_negatives_brute,
            hard_negatives_bucketed,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet")
        anchors = emb.where(F.col("vec_id") < 20)
        w = md5_plane_weights(dim=64, planes=5)
        got = hard_negatives_bucketed(
            anchors, emb, k=3, weights=w, multiprobe=True).collect()
        assert got
        seen = set()
        for r in got:
            assert r.anchor_label != r.neg_label
            assert (r.anchor_id, r.neg_id) not in seen  # multiprobe no dup
            seen.add((r.anchor_id, r.neg_id))
        true = {(r.anchor_id, r.neg_id)
                for r in hard_negatives_brute(anchors, emb, k=3).collect()}

        def recall(planes, multiprobe):
            pairs = {
                (r.anchor_id, r.neg_id)
                for r in hard_negatives_bucketed(
                    anchors, emb, k=3,
                    weights=md5_plane_weights(dim=64, planes=planes),
                    multiprobe=multiprobe,
                ).collect()
            }
            return len(true & pairs) / len(true)

        # Hamming-1 probing must materially lift recall (Lv et al. 2007),
        # and widening buckets (fewer planes) must recover most true
        # hard negatives: the recall/cost dial works as designed.
        assert recall(5, True) > recall(5, False)
        assert recall(2, True) >= 0.7


class TestHeavyHitters:
    def _df(self, spark, values, parts=8):
        return spark.createDataFrame(
            [(v,) for v in values], "value string"
        ).repartition(parts)

    def test_exact_answer_on_skewed_stream(self, spark):
        from reader_spark.ops.heavy import heavy_hitters

        # 'a' 40%, 'b' 30%, 100 singletons pad the tail
        vals = ["a"] * 400 + ["b"] * 300 + [f"t{i}" for i in range(300)]
        got = {r.value: r.cnt for r in
               heavy_hitters(self._df(spark, vals), "value", k=9).collect()}
        # phi = ceil(1e6/10)/1e6 = 0.1: only a and b clear 10%
        assert got == {"a": 400, "b": 300}

    def test_deterministic_under_partitioning(self, spark):
        from reader_spark.ops.heavy import heavy_hitters

        vals = ["x"] * 120 + ["y"] * 90 + [f"t{i}" for i in range(9)] * 10
        expect = None
        for parts in (1, 3, 16):
            got = sorted(
                (r.value, r.cnt)
                for r in heavy_hitters(
                    self._df(spark, vals, parts), "value", k=4
                ).collect()
            )
            expect = got if expect is None else expect
            assert got == expect, parts

    def test_guarantee_boundary_is_strict(self, spark):
        from reader_spark.ops.heavy import heavy_hitters

        # 4 values x 25%: share == phi exactly (k=3 -> phi=0.25 via
        # ceil(1e6/4)=250000); strict > excludes all of them
        vals = [c for c in "abcd" for _ in range(25)]
        assert heavy_hitters(self._df(spark, vals), "value", k=3).count() == 0

    def test_phi_below_guarantee_raises(self, spark):
        import pytest as _pytest

        from reader_spark.ops.heavy import heavy_hitters

        df = self._df(spark, ["a", "b"])
        with _pytest.raises(ValueError, match="guarantee"):
            heavy_hitters(df, "value", k=10, phi=0.01)
        with _pytest.raises(ValueError, match="k must"):
            heavy_hitters(df, "value", k=0)

    def test_empty_and_nulls(self, spark):
        from reader_spark.ops.heavy import heavy_hitters

        empty = spark.createDataFrame([], "value string")
        assert heavy_hitters(empty, "value", k=5).count() == 0
        with_nulls = spark.createDataFrame(
            [("a",), (None,), ("a",), (None,), (None,)], "value string"
        )
        got = {r.value: r.cnt for r in
               heavy_hitters(with_nulls, "value", k=1).collect()}
        # nulls ignored: n=2, 'a' has share 1.0
        assert got == {"a": 2}


class TestClusterExemplars:
    def _run(self, spark, comps, scores):
        from reader_spark.ops.dedup import cluster_exemplars

        c = spark.createDataFrame(comps, "doc long, component long")
        s = spark.createDataFrame(scores, "doc_id long, score double")
        return {r.component: r for r in cluster_exemplars(c, s).collect()}

    def test_highest_score_wins_not_lowest_id(self, spark):
        got = self._run(
            spark,
            [(1, 1), (2, 1), (3, 1)],
            [(1, 0.2), (2, 0.9), (3, 0.5)],
        )
        assert got[1].exemplar == 2 and got[1].n_members == 3
        assert got[1].score == 0.9

    def test_tie_breaks_to_lowest_id(self, spark):
        got = self._run(spark, [(5, 5), (7, 5)], [(5, 0.5), (7, 0.5)])
        assert got[5].exemplar == 5

    def test_unscored_docs_rank_last_but_can_win_alone(self, spark):
        got = self._run(
            spark,
            [(1, 1), (2, 1), (9, 9)],
            [(2, 0.1)],  # doc 1 and 9 have no score row
        )
        assert got[1].exemplar == 2  # scored member beats unscored
        assert got[9].exemplar == 9 and got[9].score is None


class TestMediaDedup:
    def _media(self, spark):
        rows = [
            (1, b"\xff\xd8\xffAAA"),   # jpeg payload A
            (2, b"\xff\xd8\xffAAA"),   # exact copy of 1
            (3, b"\xff\xd8\xffBBB"),   # jpeg, different payload
            (4, b"\x89PNG\r\n\x1a\nAAA"),  # png with same tail as A
            (5, b"\xff\xd8\xffAAA"),   # third copy of 1
        ]
        return spark.createDataFrame(rows, "media_id long, content binary")

    def test_groups_keeper_and_kind(self, spark):
        from reader_spark.ops.multimodal import media_dedup

        got = {r.keeper_id: r for r in
               media_dedup(self._media(spark), portable=True).collect()}
        assert set(got) == {1, 3, 4}
        assert got[1].n_copies == 3 and got[1].kind == "jpeg"
        assert got[3].n_copies == 1
        assert got[4].kind == "png" and got[4].n_bytes == 11

    def test_production_hash_same_grouping(self, spark):
        from reader_spark.ops.multimodal import media_dedup

        prod = {(r.keeper_id, r.n_copies, r.kind) for r in
                media_dedup(self._media(spark), portable=False).collect()}
        port = {(r.keeper_id, r.n_copies, r.kind) for r in
                media_dedup(self._media(spark), portable=True).collect()}
        assert prod == port


class TestTokenBudgetMix:
    def _docs(self, spark):
        # lang en: docs of 60/50/40 tokens; lang fr: 30/30; lang es: 99
        rows = [
            (1, "en", 60), (2, "en", 50), (3, "en", 40),
            (4, "fr", 30), (5, "fr", 30), (6, "es", 99),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, lang string, n_tokens long"
        )

    def test_greedy_fill_includes_straddler(self, spark):
        from reader_spark.ops.sampling import token_budget_mix

        got = token_budget_mix(
            self._docs(spark), "lang", "n_tokens", 200,
            {"en": 0.5, "fr": 0.5}, id_col="doc_id",
        ).collect()
        by_lang = {}
        for r in got:
            by_lang.setdefault(r.lang, []).append(r)
        # en budget 100: doc1 (60, before=0) + doc2 (50, before=60<100,
        # straddles to 110) taken; doc3 (before=110) dropped
        assert sorted(r.doc_id for r in by_lang["en"]) == [1, 2]
        assert max(r.cum_tokens for r in by_lang["en"]) == 110
        # fr budget 100 > 60 total: everything taken
        assert sorted(r.doc_id for r in by_lang["fr"]) == [4, 5]
        # es not in weights: whitelist drop
        assert "es" not in by_lang

    def test_score_order_beats_id_order(self, spark):
        from pyspark.sql import functions as F

        from reader_spark.ops.sampling import token_budget_mix

        docs = self._docs(spark).withColumn(
            "quality", (F.col("doc_id") % 3).cast("double")
        )
        got = token_budget_mix(
            docs, "lang", "n_tokens", 120, {"en": 1.0},
            score_col="quality", id_col="doc_id",
        ).collect()
        # en quality: doc1->1.0 doc2->2.0 doc3->0.0; budget 120 takes
        # doc2 (50) then doc1 (60, before=50<120) then doc3 (before=110<120)
        assert sorted(r.doc_id for r in got) == [1, 2, 3]
        first = min(got, key=lambda r: r.cum_tokens)
        assert first.doc_id == 2  # highest quality filled first

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.sampling import token_budget_mix

        with _pytest.raises(ValueError, match="budget"):
            token_budget_mix(
                self._docs(spark), "lang", "n_tokens", 0, {"en": 1.0}
            )
        with _pytest.raises(ValueError, match="weights"):
            token_budget_mix(
                self._docs(spark), "lang", "n_tokens", 10, {}
            )


class TestScriptProfile:
    def test_counts_and_dominant(self, spark):
        from reader_spark.ops.textstats import script_profile

        rows = [
            (1, "hello world 123"),
            (2, "это русский текст"),
            (3, "中文文本在这里"),
            (4, "mixed русский hello"),   # latin 10 vs cyrillic 7
            (5, "12345"),
            (6, "!!! ???"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in
               script_profile(df, "doc_id", "text").collect()}
        assert got[1].main_script == "latin" and got[1].n_digit == 3
        assert got[2].main_script == "cyrillic"
        assert got[3].main_script == "cjk" and got[3].n_cjk == 7
        assert got[4].main_script == "latin"
        assert got[5].main_script == "digit"
        assert got[6].main_script == "none"

    def test_tie_goes_to_first_listed_class(self, spark):
        from reader_spark.ops.textstats import script_profile

        # 2 latin chars, 2 cyrillic chars: latin listed first wins
        df = spark.createDataFrame([(1, "ab юя")], "doc_id long, text string")
        r = script_profile(df, "doc_id", "text").collect()[0]
        assert r.n_latin == 2 and r.n_cyrillic == 2
        assert r.main_script == "latin"


class TestPassageChunks:
    def _chunks(self, spark, text, size, stride):
        from reader_spark.ops.chunks import passage_chunks

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return sorted(
            passage_chunks(df, "doc_id", "text", size=size, stride=stride)
            .collect(),
            key=lambda r: r.chunk_id,
        )

    def test_every_token_covered_and_tail_full_width(self, spark):
        toks = [f"t{i}" for i in range(10)]
        got = self._chunks(spark, " ".join(toks), size=4, stride=3)
        # starts 1,4,7 then appended tail 7? last = 10-4+1 = 7; grid hits
        # 1,4,7 exactly -> no append
        assert [r.start_token for r in got] == [1, 4, 7]
        assert [r.chunk_id for r in got] == [0, 1, 2]
        assert all(r.n_tokens == 4 for r in got)
        covered = set()
        for r in got:
            covered.update(range(r.start_token, r.start_token + r.n_tokens))
        assert covered == set(range(1, 11))
        assert got[-1].chunk_text == "t6 t7 t8 t9"

    def test_tail_appended_when_grid_misses(self, spark):
        toks = [f"t{i}" for i in range(11)]
        got = self._chunks(spark, " ".join(toks), size=4, stride=3)
        # last = 8; grid 1,4,7 misses 8 -> appended with dense chunk_id 3
        assert [r.start_token for r in got] == [1, 4, 7, 8]
        assert [r.chunk_id for r in got] == [0, 1, 2, 3]
        assert got[-1].n_tokens == 4  # tail chunk is full width

    def test_short_and_empty_docs_yield_one_chunk(self, spark):
        got = self._chunks(spark, "one two", size=128, stride=96)
        assert len(got) == 1 and got[0].n_tokens == 2
        assert got[0].chunk_text == "one two"
        got = self._chunks(spark, "", size=8, stride=8)
        assert len(got) == 1 and got[0].chunk_text == ""

    def test_exact_tiling_no_overlap(self, spark):
        toks = [str(i) for i in range(9)]
        got = self._chunks(spark, " ".join(toks), size=3, stride=3)
        texts = [r.chunk_text for r in got]
        assert texts == ["0 1 2", "3 4 5", "6 7 8"]

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.chunks import passage_chunks

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="size"):
            passage_chunks(df, "doc_id", "text", size=0)
        with _pytest.raises(ValueError, match="stride"):
            passage_chunks(df, "doc_id", "text", size=4, stride=5)


class TestRepetitionProfile:
    def _profile(self, spark, rows, **kw):
        from reader_spark.ops.textstats import repetition_profile

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r.doc_id: r
            for r in repetition_profile(df, "doc_id", "text", **kw).collect()
        }

    def test_top_ngram_fraction(self, spark):
        got = self._profile(
            spark,
            [(1, "spam spam spam spam ham"), (2, "a b c d e f g h")],
        )
        # "spam spam" occurs 3x (overlapping), len 9, total chars 23
        assert got[1].top2_gram == "spam spam"
        assert got[1].top2_char_frac == round(3 * 9 / 23, 6)
        assert not got[1].rep_pass
        # no repeats: top2 is the lexicographically-first gram, cnt 1
        assert got[2].top2_gram == "a b"
        assert got[2].top2_char_frac == round(3 / 15, 6)

    def test_dup_ngram_fraction_and_gate(self, spark):
        text = "one two three four five " * 3 + "tail"
        got = self._profile(spark, [(1, text.strip())], dup_ns=(5,))
        r = got[1]
        # every 5-gram window repeats across the 3 copies
        assert r.dup5_char_frac > 0.15
        assert not r.rep_pass
        clean = self._profile(
            spark, [(2, "alpha beta gamma delta epsilon zeta")], dup_ns=(5,)
        )[2]
        assert clean.dup5_char_frac == 0.0

    def test_short_and_empty_docs_report_zero(self, spark):
        got = self._profile(spark, [(1, "x"), (2, "")])
        for r in got.values():
            assert r.top2_gram is None
            assert r.top2_char_frac == 0.0 and r.dup5_char_frac == 0.0
            assert r.rep_pass

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.textstats import repetition_profile

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="n-gram"):
            repetition_profile(df, "doc_id", "text", top_ns=(1,))


class TestCaptionPairs:
    def _spans(self, spark):
        rows = [
            # doc 1: heading, image, text -> caption = following text
            (1, 0, "heading", "Title", None),
            (1, 1, "image", "![a](u1)", "u1"),
            (1, 2, "text", "Body one", None),
            # doc 2: heading, text, image -> caption falls back to before
            (2, 0, "heading", "T2", None),
            (2, 1, "text", "Body two", None),
            (2, 2, "image", "![b](u2)", "u2"),
            # doc 3: no media
            (3, 0, "text", "only text", None),
            # doc 4: image only -> both sides null
            (4, 0, "image", "![c](u4)", "u4"),
        ]
        return spark.createDataFrame(
            rows,
            "doc_id long, ord int, kind string, text string, media_ref string",
        )

    def test_pairing_policy(self, spark):
        from reader_spark.ops.multimodal import caption_pairs

        got = {r.doc_id: r for r in caption_pairs(self._spans(spark)).collect()}
        assert set(got) == {1, 2, 4}
        assert got[1].text_before == "Title"
        assert got[1].text_after == "Body one"
        assert got[1].caption == "Body one"      # following wins
        assert got[2].text_after is None
        assert got[2].caption == "Body two"      # falls back to preceding
        assert got[4].caption is None

    def test_multiple_images_each_get_nearest(self, spark):
        from reader_spark.ops.multimodal import caption_pairs

        rows = [
            (1, 0, "text", "first", None),
            (1, 1, "image", "i1", "u1"),
            (1, 2, "text", "middle", None),
            (1, 3, "image", "i2", "u2"),
            (1, 4, "text", "last", None),
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id long, ord int, kind string, text string, media_ref string",
        )
        got = {r.media_ref: r for r in caption_pairs(df).collect()}
        assert got["u1"].text_before == "first"
        assert got["u1"].caption == "middle"
        assert got["u2"].text_before == "middle"
        assert got["u2"].caption == "last"


class TestCaptionAlignment:
    def _pairs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, ord int, media_ref string, caption string"
        )

    def test_score_is_cosine_of_the_two_towers(self, spark):
        import hashlib
        import math

        from reader_spark.ops.multimodal import caption_alignment_scores

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        caption, ref, dim = "alpha beta alpha", "u://img/1", 8
        tv = [0] * dim
        for tok in ["alpha", "beta", "alpha"]:
            sign = 1 if h("fh2:" + tok) % 2 == 0 else -1
            tv[h("fh1:" + tok) % dim] += sign
        iv = [h(f"im:{ref}:{i}") % 9 - 4 for i in range(dim)]
        dot = sum(a * b for a, b in zip(tv, iv))
        want = round(
            dot
            / math.sqrt(sum(a * a for a in tv) * sum(b * b for b in iv)),
            6,
        )
        got = caption_alignment_scores(
            self._pairs(spark, [(1, 1, ref, caption)])
        ).collect()[0]
        assert got.score == pytest.approx(want, abs=1e-9)
        assert got.keep == (1 if want >= 0.3 else 0)

    def test_null_and_empty_captions_score_null_and_drop(self, spark):
        from reader_spark.ops.multimodal import caption_alignment_scores

        rows = [(1, 1, "u1", None), (2, 1, "u2", "!!! ??? ...")]
        got = {
            r.doc_id: r
            for r in caption_alignment_scores(self._pairs(spark, rows)).collect()
        }
        assert got[1].score is None and got[1].keep == 0
        assert got[2].score is None and got[2].keep == 0

    def test_every_pair_yields_exactly_one_row(self, spark):
        from reader_spark.ops.multimodal import caption_alignment_scores

        rows = [(1, 1, "u1", "one two"), (1, 3, "u2", "three"), (2, 1, "u3", None)]
        out = caption_alignment_scores(self._pairs(spark, rows)).collect()
        assert sorted((r.doc_id, r.ord) for r in out) == [(1, 1), (1, 3), (2, 1)]


class TestSpanLanguageProfile:
    def _spans(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "doc_id long, ord int, kind string, text string, media_ref string",
        )

    def test_switches_count_adjacent_text_spans_only(self, spark):
        from reader_spark.ops.multimodal import span_language_profile

        rows = [
            (1, 0, "text", "the thing is singing and sing", None),
            (1, 1, "image", "![x](u)", "u"),  # media ignored
            (1, 2, "text", "der ich und sich schon", None),
            (1, 3, "text", "the theory and the thing", None),
        ]
        got = span_language_profile(self._spans(spark, rows)).collect()[0]
        assert got.n_text_spans == 3
        assert got.n_langs == 2
        assert got.code_switches == 2  # en->de->en
        assert got.dominant_lang == "en"  # 2 en spans vs 1 de

    def test_dominance_tie_breaks_lexicographically_last(self, spark):
        from reader_spark.ops.multimodal import span_language_profile

        rows = [
            (1, 0, "text", "the thing and the sing", None),
            (1, 1, "text", "der ich und sich schung", None),
        ]
        got = span_language_profile(self._spans(spark, rows)).collect()[0]
        assert got.dominant_lang == "en"  # tie 1-1: en > de

    def test_no_signal_is_und_with_zero_switches(self, spark):
        from reader_spark.ops.multimodal import span_language_profile

        rows = [(1, 0, "text", "zzz qqq", None), (1, 1, "text", "xxxy", None)]
        got = span_language_profile(self._spans(spark, rows)).collect()[0]
        assert got.n_langs == 1 and got.dominant_lang == "und"
        assert got.code_switches == 0

    def test_media_only_doc_still_yields_a_row(self, spark):
        from reader_spark.ops.multimodal import span_language_profile

        rows = [
            (1, 0, "image", "![a](u)", "u"),  # no textual spans at all
            (2, 0, "text", "the thing and the sing", None),
        ]
        got = {
            r.doc_id: r
            for r in span_language_profile(self._spans(spark, rows)).collect()
        }
        assert set(got) == {1, 2}  # doc 1 must not vanish
        assert got[1].n_text_spans == 0 and got[1].n_langs == 0
        assert got[1].dominant_lang == "und" and got[1].code_switches == 0


class TestTemplateClusters:
    def test_same_kind_sequence_clusters_regardless_of_text(self, spark):
        from reader_spark.ops.multimodal import template_clusters

        rows = [
            (1, 0, "heading", "A", None), (1, 1, "text", "body one", None),
            (2, 0, "heading", "B", None), (2, 1, "text", "totally different", None),
            (3, 0, "text", "no heading", None),
            # out-of-order ords must still serialize by ord
            (4, 1, "text", "x", None), (4, 0, "heading", "y", None),
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id long, ord int, kind string, text string, media_ref string",
        )
        got = {r.skeleton: r for r in template_clusters(df).collect()}
        assert got["heading>text"].n_docs == 3  # docs 1, 2, 4
        assert got["heading>text"].example_doc == 1
        assert got["text"].n_docs == 1
        import hashlib

        assert (
            got["text"].template_id
            == hashlib.md5(b"text").hexdigest()
        )


class TestInterleaveProfile:
    def test_switch_counting(self, spark):
        from reader_spark.ops.multimodal import interleave_profile

        rows = [
            (1, 0, "heading"), (1, 1, "image"), (1, 2, "text"),  # 2 switches
            (2, 0, "text"), (2, 1, "text"), (2, 2, "image"),      # 1 switch
            (3, 0, "text"), (3, 1, "text"),                        # 0
        ]
        df = spark.createDataFrame(rows, "doc_id long, ord int, kind string")
        got = {r.doc_id: r for r in interleave_profile(df).collect()}
        assert (got[1].n_switches, got[1].n_media, got[1].first_media_ord) == (2, 1, 1)
        assert (got[2].n_switches, got[2].first_media_ord) == (1, 2)
        assert got[3].n_switches == 0 and got[3].first_media_ord is None
        assert got[1].media_ratio == round(1 / 3, 6)
        assert got[3].media_ratio == 0.0


class TestBigramLm:
    def test_scores_and_spine(self, spark):
        import math

        from reader_spark.ops.textstats import bigram_lm_scores

        rows = [(1, "the cat sat"), (2, "the cat sat"), (3, "x"), (4, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in bigram_lm_scores(df, "doc_id", "text").collect()}
        # vocab = {the, cat, sat, x} = 4; c(the cat)=2, c1(the)=2
        # p(cat|the) = 3/6, p(sat|cat) = 3/6 -> every term = 1 bit
        assert got[1].n_bigrams == 2
        assert math.isclose(got[1].avg_nll_bits, 1.0)
        assert got[1].avg_nll_bits == got[2].avg_nll_bits
        # docs below 2 alpha tokens stay in the output, score NULL
        assert got[3].n_bigrams == 0 and got[3].avg_nll_bits is None
        assert got[4].n_bigrams == 0 and got[4].avg_nll_bits is None

    def test_word_order_signal(self, spark):
        """A shuffled doc must score worse than the fluent twin even
        though its unigram distribution is identical."""
        from reader_spark.ops.textstats import bigram_lm_scores

        fluent = "the cat sat on the mat " * 5
        shuffled = "cat the on sat mat the " * 5
        corpus = [(i, fluent.strip()) for i in range(1, 9)] + [(9, shuffled.strip())]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {r.doc_id: r for r in bigram_lm_scores(df, "doc_id", "text").collect()}
        assert got[9].avg_nll_bits > got[1].avg_nll_bits


class TestPackByCost:
    def test_matches_pack_sequences_on_token_costs(self, spark):
        from reader_spark.ops.packing import pack_by_cost, pack_sequences

        rows = [(i, "w " * (i * 3)) for i in range(1, 8)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        via_text = sorted(
            map(str, pack_sequences(df, "doc_id", "text", 10).collect())
        )
        costs = df.select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("cost"),
        )
        via_cost = sorted(
            map(str, pack_by_cost(costs, "doc_id", "cost", 10).collect())
        )
        assert via_text == via_cost

    def test_image_cost_charges_budget(self, spark):
        from reader_spark.ops.packing import pack_by_cost

        # doc1: 4 text tokens + 1 image @64 = 68 -> straddles a 64-seq cut
        rows = [(1, 68), (2, 10)]
        df = spark.createDataFrame(rows, "doc_id long, cost long")
        got = sorted(
            pack_by_cost(df, "doc_id", "cost", 64).collect(),
            key=lambda r: (r.doc_id, r.seq_id),
        )
        assert [(r.doc_id, r.seq_id, r.n_tokens) for r in got] == [
            (1, 0, 64), (1, 1, 4), (2, 1, 10),
        ]

    def test_zero_cost_items_drop(self, spark):
        from reader_spark.ops.packing import pack_by_cost

        df = spark.createDataFrame(
            [(1, 5), (2, 0), (3, 5)], "doc_id long, cost long"
        )
        got = pack_by_cost(df, "doc_id", "cost", 100).collect()
        assert sorted(r.doc_id for r in got) == [1, 3]


class TestCcnetBuckets:
    def test_bucketing_and_null_routing(self, spark):
        from reader_spark.ops.textstats import ccnet_buckets

        rows = (
            # en: 6 scoreable docs + 1 unscoreable (digits only)
            [(i, "the cat sat on the mat " * i, "en") for i in range(1, 7)]
            + [(7, "12345 678", "en")]
            + [(8, "der hund und der ball", "de")]
        )
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        got = {r.doc_id: r for r in ccnet_buckets(df).collect()}
        en = [got[i] for i in range(1, 8)]
        # 7 en docs -> ntile(3) = 3/2/2 split in score order
        assert [r.bucket for r in sorted(en, key=lambda r: r.bucket_id)] == [
            "head", "head", "head", "middle", "middle", "tail", "tail"
        ]
        # the unscoreable doc lands in the tail, never vanishes
        assert got[7].avg_nll_bits is None and got[7].bucket == "tail"
        assert got[7].n_tokens == 0
        # a single-doc language is its own head
        assert got[8].bucket == "head"

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.textstats import ccnet_buckets

        df = spark.createDataFrame(
            [(1, "x", "en")], "doc_id long, text string, lang string"
        )
        with _pytest.raises(ValueError, match="n_buckets"):
            ccnet_buckets(df, n_buckets=1)


class TestSpanCorruption:
    def _run(self, spark, rows, **kw):
        from reader_spark.ops.chunks import span_corruption

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r.doc_id: r
            for r in span_corruption(df, "doc_id", "text", **kw).collect()
        }

    def test_mask_geometry_and_roundtrip(self, spark):
        toks = [f"t{i}" for i in range(45)]  # 2 full blocks + 5 tail
        got = self._run(spark, [(1, " ".join(toks))])[1]
        assert got.n_tokens == 45 and got.n_masked == 6
        inp = got.input_text.split(" ")
        assert inp.count("<extra_id_0>") == 1 and inp.count("<extra_id_1>") == 1
        # masked tokens absent from input, present in target, order kept
        tgt = got.target_text.split(" ")
        masked = [t for t in tgt if not t.startswith("<extra_id_")]
        assert len(masked) == 6
        assert all(m not in inp for m in masked)
        # reconstruction: splice targets back at sentinels -> original doc
        by_sentinel = {}
        cur = None
        for t in tgt:
            if t.startswith("<extra_id_"):
                cur = t
                by_sentinel[cur] = []
            else:
                by_sentinel[cur].append(t)
        rebuilt = []
        for t in inp:
            rebuilt.extend(by_sentinel.get(t, [t]))
        assert rebuilt == toks
        # tail tokens pass through unmasked
        assert inp[-5:] == toks[-5:]

    def test_determinism_is_positional(self, spark):
        a = self._run(spark, [(7, "w " * 40)])[7]
        b = self._run(spark, [(7, "w " * 40)])[7]
        assert a.input_text == b.input_text and a.target_text == b.target_text
        # different doc_id -> different mask offsets (with 40 tokens the
        # chance both windows collide is 1/324; pick ids that differ)
        c = self._run(spark, [(8, " ".join(f"t{i}" for i in range(40)))])[8]
        d = self._run(spark, [(9, " ".join(f"t{i}" for i in range(40)))])[9]
        assert c.target_text != d.target_text

    def test_short_doc_passthrough(self, spark):
        got = self._run(spark, [(1, "a b c")])
        assert got[1].n_masked == 0
        assert got[1].input_text == "a b c" and got[1].target_text == ""

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.chunks import span_corruption

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="span"):
            span_corruption(df, "doc_id", "text", span=0)
        with _pytest.raises(ValueError, match="block"):
            span_corruption(df, "doc_id", "text", block=3, span=3)


class TestPrCurve:
    def test_counts_and_ratios(self, spark):
        from reader_spark.ops.evals import pr_curve

        # scores 0.9/0.8 positives, 0.8/0.1 negatives
        rows = [(0.9, 1), (0.8, 1), (0.8, 0), (0.1, 0)]
        df = spark.createDataFrame(rows, "score double, y int")
        got = {r.threshold: r for r in pr_curve(df, "score", "y", 1).collect()}
        assert set(got) == {0.9, 0.8, 0.1}
        r9 = got[0.9]
        assert (r9.tp, r9.fp, r9.fn) == (1, 0, 1)
        assert r9.precision == 1.0 and r9.recall == 0.5
        r8 = got[0.8]
        assert (r8.tp, r8.fp, r8.fn) == (2, 1, 0)
        assert r8.precision == round(2 / 3, 6) and r8.recall == 1.0
        assert r8.f1 == round(4 / 5, 6)
        r1 = got[0.1]
        assert (r1.tp, r1.fp) == (2, 2) and r1.recall == 1.0

    def test_no_positives_gives_null_recall(self, spark):
        from reader_spark.ops.evals import pr_curve

        df = spark.createDataFrame([(0.5, 0), (0.2, 0)], "score double, y int")
        got = pr_curve(df, "score", "y", 1).collect()
        assert all(r.recall is None for r in got)
        assert all(r.tp == 0 for r in got)

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.evals import pr_curve

        df = spark.createDataFrame([(0.5, 0)], "score double, y int")
        with _pytest.raises(ValueError, match="round_dp"):
            pr_curve(df, "score", "y", -1)


class TestRemoveDuplicateSpans:
    def test_keep_first_policy(self, spark):
        from reader_spark.ops.substring import remove_duplicate_spans

        # distinct words on BOTH flanks: a shared flank word would extend
        # the duplicated window past the planted 20 tokens
        boiler = " ".join(f"b{i}" for i in range(20))
        rows = [
            (1, "alpha one " + boiler + " omega juliet"),
            (2, "alpha two " + boiler + " zulu tango"),
            (3, "clean doc " + " ".join(f"u{i}" for i in range(20))),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r
            for r in remove_duplicate_spans(
                df, "doc_id", "text", min_tokens=20
            ).collect()
        }
        # first occurrence (lowest doc_id) survives
        assert got[1].n_removed == 0 and boiler in got[1].clean_text
        # later occurrence cut, everything else intact
        assert got[2].n_removed == 20
        assert got[2].clean_text == "alpha two zulu tango"
        assert got[3].n_removed == 0
        # every doc stays in the output
        assert set(got) == {1, 2, 3}

    def test_intra_doc_repeat_removed(self, spark):
        from reader_spark.ops.substring import remove_duplicate_spans

        span = " ".join(f"s{i}" for i in range(20))
        df = spark.createDataFrame(
            [(1, span + " mid " + span)], "doc_id long, text string"
        )
        r = remove_duplicate_spans(df, "doc_id", "text", 20).collect()[0]
        assert r.n_removed == 20
        assert r.clean_text == span + " mid"

    def test_hashed_matches_raw(self, spark):
        from reader_spark.ops.substring import remove_duplicate_spans

        boiler = " ".join(f"b{i}" for i in range(25))
        rows = [(i, f"head {i} " + boiler) for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        raw = sorted(map(str, remove_duplicate_spans(df, "doc_id", "text", 20, hashed=False).collect()))
        hsh = sorted(map(str, remove_duplicate_spans(df, "doc_id", "text", 20, hashed=True).collect()))
        assert raw == hsh


class TestMatryoshkaEval:
    def test_identical_prefix_perfect_fidelity(self, spark):
        from reader_spark.ops.evals import matryoshka_eval

        # vectors whose first 4 dims carry ALL the signal: truncation to
        # 4 dims must preserve cosine exactly (tail dims are zero)
        rows = [(i, [float(i + 1), 1.0, 0.5, 2.0, 0.0, 0.0, 0.0, 0.0])
                for i in range(6)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {r.prefix_dim: r
               for r in matryoshka_eval(df, prefix_dims=(4, 8)).collect()}
        assert got[4].n_pairs == 5 and got[8].n_pairs == 5
        assert got[4].mean_abs_diff == 0.0
        assert got[4].mean_cos_prefix == got[4].mean_cos_full
        assert got[8].mean_abs_diff == 0.0

    def test_lossy_prefix_detected(self, spark):
        from reader_spark.ops.evals import matryoshka_eval

        # orthogonal in the first 2 dims, identical in the last 2:
        # 2-dim prefix cosine is 0, full cosine is positive
        rows = [
            (0, [1.0, 0.0, 1.0, 1.0]),
            (1, [0.0, 1.0, 1.0, 1.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        r = {x.prefix_dim: x for x in matryoshka_eval(df, prefix_dims=(2,)).collect()}[2]
        assert r.mean_cos_prefix == 0.0
        assert r.mean_cos_full > 0.5
        assert r.mean_abs_diff > 0.5

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.evals import matryoshka_eval

        df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
        with _pytest.raises(ValueError, match="prefix"):
            matryoshka_eval(df, prefix_dims=(0,))


class TestPhashNeardup:
    def _media(self, spark, rows):
        return spark.createDataFrame(
            rows, "media_id long, thumb_8x8 array<double>"
        )

    def test_finds_perturbed_twin_not_noise(self, spark):
        from reader_spark.ops.multimodal import phash_neardup

        base = [float((i * 37) % 19) for i in range(64)]
        twin = list(base)
        twin[5] += 0.6  # flips at most a couple of threshold bits
        noise = [float((i * 53 + 7) % 23) for i in range(64)]
        df = self._media(spark, [(1, base), (2, twin), (3, noise)])
        pairs = {(r.id_a, r.id_b): r.hamming
                 for r in phash_neardup(df, max_hamming=3).collect()}
        assert (1, 2) in pairs
        assert all(3 not in k for k in pairs)

    def test_identical_thumbs_hamming_zero(self, spark):
        from reader_spark.ops.multimodal import phash_neardup

        px = [float(i % 9) for i in range(64)]
        df = self._media(spark, [(1, px), (2, px)])
        got = phash_neardup(df).collect()
        assert len(got) == 1 and got[0].hamming == 0
        # candidate join emits one row per shared band; output must be
        # one row per pair
        assert (got[0].id_a, got[0].id_b) == (1, 2)

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.multimodal import phash_neardup

        df = self._media(spark, [(1, [0.0] * 64)])
        with _pytest.raises(ValueError, match="max_hamming"):
            phash_neardup(df, max_hamming=9)


class TestAudioNeardup:
    N_FRAMES, N_BANDS = 8, 8

    def _energy(self, seed: int) -> list[list[float]]:
        # deterministic varied energies; no two adjacent cells equal, so
        # every HK difference has a definite sign
        return [
            [float((seed * 7 + f * 13 + b * 29) % 17) - 8.0
             for b in range(self.N_BANDS)]
            for f in range(self.N_FRAMES)
        ]

    def _clips(self, spark, rows):
        return spark.createDataFrame(
            rows, "media_id long, frames array<array<double>>"
        )

    def _fp(self, frames: list[list[float]]) -> list[int]:
        # reference Haitsma-Kalker fingerprint, independent implementation
        out = []
        for f in range(1, self.N_FRAMES):
            h = 0
            for b in range(1, self.N_BANDS):
                d = (frames[f][b] - frames[f][b - 1]
                     - frames[f - 1][b] + frames[f - 1][b - 1])
                h = h * 2 + (1 if d > 0 else 0)
            out.append(h)
        return out

    def test_matches_reference_fingerprint(self, spark):
        from reader_spark.ops.audio import hk_fingerprint
        from pyspark.sql import functions as F

        frames = self._energy(3)
        df = self._clips(spark, [(1, frames)])
        got = df.select(
            hk_fingerprint(F.col("frames"), 8, 8).alias("fp")
        ).head().fp
        assert got == self._fp(frames)

    def test_finds_perturbed_twin_not_noise(self, spark):
        from reader_spark.ops.audio import audio_neardup

        base = self._energy(1)
        twin = [row[:] for row in base]
        twin[0][0] += 50.0  # E(0,0) touches only bit(1,1) -> <=1 frame-hash
        noise = self._energy(2)
        df = self._clips(spark, [(1, base), (2, twin), (3, noise)])
        pairs = {(r.id_a, r.id_b): r.n_mismatch
                 for r in audio_neardup(df, max_mismatch=1).collect()}
        assert (1, 2) in pairs and pairs[(1, 2)] <= 1
        assert all(3 not in k for k in pairs)

    def test_identical_clips_zero_mismatch(self, spark):
        from reader_spark.ops.audio import audio_neardup

        frames = self._energy(5)
        df = self._clips(spark, [(1, frames), (2, frames)])
        got = audio_neardup(df).collect()
        # one row per pair even though both pigeonhole bands match
        assert len(got) == 1
        assert (got[0].id_a, got[0].id_b, got[0].n_mismatch) == (1, 2, 0)

    def test_banding_lossless_vs_bruteforce(self, spark):
        from reader_spark.ops.audio import audio_neardup

        rows = []
        for i in range(12):
            frames = self._energy(i)
            rows.append((i, frames))
            if i % 3 == 0:  # plant a twin differing in <=2 frame-hashes
                t = [row[:] for row in frames]
                t[0][0] += 40.0   # frame-hash 0
                t[7][7] += 40.0   # frame-hash 6
                rows.append((i + 1000, t))
        expected = set()
        fps = {mid: self._fp(fr) for mid, fr in rows}
        for a in fps:
            for b in fps:
                if a < b:
                    mm = sum(x != y for x, y in zip(fps[a], fps[b]))
                    if mm <= 2:
                        expected.add((a, b, mm))
        got = {(r.id_a, r.id_b, r.n_mismatch)
               for r in audio_neardup(
                   self._clips(spark, rows), max_mismatch=2
               ).collect()}
        assert got == expected
        assert expected  # the fixture must actually plant pairs

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.audio import audio_neardup, hk_fingerprint
        from pyspark.sql import functions as F

        df = self._clips(spark, [(1, self._energy(0))])
        with _pytest.raises(ValueError, match="max_mismatch"):
            audio_neardup(df, max_mismatch=7)
        with _pytest.raises(ValueError, match="n_frames"):
            hk_fingerprint(F.col("frames"), 1, 8)


class TestRedactSpans:
    def _docs(self, spark):
        rows = [
            (
                "d1",
                [
                    ("heading", "Reach me", None, 0),
                    ("image", None, "https://x.test/a.png", 1),
                    ("text", "mail bob@corp.example or 10.1.2.3 ok", None, 2),
                    ("code", "admin@internal.example # untouched", None, 3),
                ],
            ),
            ("d2", []),
            ("d3", None),
        ]
        return spark.createDataFrame(
            rows,
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        )

    def test_masks_prose_only_preserves_shape(self, spark):
        from reader_spark.ops.multimodal import redact_spans

        out = {r.doc_id: r.spans for r in redact_spans(self._docs(spark)).collect()}
        spans = out["d1"]
        assert [s.kind for s in spans] == ["heading", "image", "text", "code"]
        assert [s.offset for s in spans] == [0, 1, 2, 3]
        assert spans[1].media_ref == "https://x.test/a.png"
        assert spans[2].text == "mail <EMAIL> or <IP> ok"
        # code kind is not in the default prose set -> byte-identical
        assert spans[3].text == "admin@internal.example # untouched"
        assert out["d2"] == [] and out["d3"] is None

    def test_schema_generic_order_field(self, spark):
        from reader_spark.ops.multimodal import redact_spans

        df = spark.createDataFrame(
            [("d1", [("text", "a@b.co", None, 7)])],
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,order:int>>",
        )
        s = redact_spans(df).head().spans[0]
        assert (s.text, s.order) == ("<EMAIL>", 7)

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.multimodal import redact_spans

        df = spark.createDataFrame(
            [("d1", [("x",)])], "doc_id string, spans array<struct<k:string>>"
        )
        with _pytest.raises(ValueError, match="lacks"):
            redact_spans(df)


class TestTruncateSpansToBudget:
    SCHEMA = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,order:int>>"
    )

    def test_cuts_at_span_boundary(self, spark):
        from reader_spark.ops.multimodal import truncate_spans_to_budget

        rows = [
            (
                "d1",
                [
                    ("heading", "one two", None, 0),        # 2 tokens
                    ("image", None, "img://a", 1),          # 10 (media_cost)
                    ("text", "a b c d e", None, 2),         # 5
                    ("text", "tail span here", None, 3),    # 3
                ],
            )
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        r = truncate_spans_to_budget(df, budget=17, media_cost=10).head()
        # cum costs: 2, 12, 17, 20 -> keep 3 spans, cost 17
        assert (r.n_spans_kept, r.n_spans_dropped, r.cost_kept) == (3, 1, 17)
        assert [s.order for s in r.spans] == [0, 1, 2]
        assert r.spans[1].media_ref == "img://a"

    def test_budget_zero_and_oversized_first_span(self, spark):
        from reader_spark.ops.multimodal import truncate_spans_to_budget

        rows = [("d1", [("text", "a b c", None, 0)])]
        df = spark.createDataFrame(rows, self.SCHEMA)
        r0 = truncate_spans_to_budget(df, budget=0).head()
        assert (r0.n_spans_kept, r0.cost_kept, r0.spans) == (0, 0, [])
        r2 = truncate_spans_to_budget(df, budget=2).head()
        assert (r2.n_spans_kept, r2.spans) == (0, [])  # first span > budget

    def test_empty_null_and_blank_text(self, spark):
        from reader_spark.ops.multimodal import truncate_spans_to_budget

        rows = [
            ("empty", []),
            ("nul", None),
            ("blank", [("text", "   ", None, 0), ("text", None, None, 1)]),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        got = {r.doc_id: r for r in truncate_spans_to_budget(df, budget=5).collect()}
        assert (got["empty"].n_spans_kept, got["empty"].spans) == (0, [])
        assert got["nul"].spans is None and got["nul"].n_spans_kept == 0
        # zero-cost spans all fit
        assert (got["blank"].n_spans_kept, got["blank"].cost_kept) == (2, 0)

    def test_validation(self, spark):
        import pytest as _pytest

        from reader_spark.ops.multimodal import truncate_spans_to_budget

        df = spark.createDataFrame([("d", [])], self.SCHEMA)
        with _pytest.raises(ValueError, match="budget"):
            truncate_spans_to_budget(df, budget=-1)


class TestRenderInterleavedSample:
    SCHEMA = TestTruncateSpansToBudget.SCHEMA

    def test_placeholders_refs_and_order(self, spark):
        from reader_spark.ops.multimodal import render_interleaved_sample

        rows = [
            (
                "d1",
                [
                    ("heading", "Title", None, 0),
                    ("image", None, "img://a", 1),
                    ("text", "caption one", None, 2),
                    ("video", None, "vid://b", 3),
                    ("text", None, None, 4),  # null text, non-media: skipped
                    ("text", "tail", None, 5),
                ],
            ),
            ("empty", []),
            ("nul", None),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        got = {r.doc_id: r for r in render_interleaved_sample(df).collect()}
        d1 = got["d1"]
        assert d1.sample == (
            "Title\n\n<image_0>\n\ncaption one\n\n<image_1>\n\ntail"
        )
        assert d1.media_refs == ["img://a", "vid://b"]
        assert d1.n_media == 2
        assert (got["empty"].sample, got["empty"].media_refs) == ("", [])
        assert got["nul"].sample is None and got["nul"].n_media == 0

    def test_composes_with_truncation(self, spark):
        from reader_spark.ops.multimodal import (
            render_interleaved_sample,
            truncate_spans_to_budget,
        )

        rows = [
            (
                "d1",
                [
                    ("text", "a b", None, 0),
                    ("image", None, "img://x", 1),
                    ("text", "c d e", None, 2),
                ],
            )
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = render_interleaved_sample(
            truncate_spans_to_budget(df, budget=12, media_cost=10)
        ).head()
        # cums: 2, 12, 15 -> keep 2 spans; render keeps the placeholder
        assert out.sample == "a b\n\n<image_0>"
        assert out.media_refs == ["img://x"] and out.n_spans_kept == 2


def test_token_budget_mix_positive_weight_never_floors_to_zero(spark):
    """A whitelisted group whose weight rounds below one token must still
    contribute its first doc (straddler-included greedy fill)."""
    from reader_spark.ops.sampling import token_budget_mix

    df = spark.createDataFrame(
        [("a", "g_big", 10), ("b", "g_big", 10), ("c", "g_tiny", 7)],
        "doc_id string, grp string, n_tokens int",
    )
    got = token_budget_mix(
        df, "grp", "n_tokens", budget=10,
        weights={"g_big": 1.0, "g_tiny": 1e-9},
    )
    rows = {r.doc_id for r in got.collect()}
    assert "c" in rows  # tiny-but-positive weight keeps its straddler
    zero = token_budget_mix(
        df, "grp", "n_tokens", budget=10,
        weights={"g_big": 1.0, "g_tiny": 0.0},
    )
    assert "c" not in {r.doc_id for r in zero.collect()}


def test_lsh_s_curve_matches_float_formula(spark):
    """Fixed-point curve tracks 1-(1-s^r)^b within grid resolution and
    is monotone with the analytic 0.5-crossing near (1/b)^(1/r)."""
    from reader_spark.ops.evals import lsh_s_curve

    rows = {r["s_milli"]: r for r in lsh_s_curve(spark, 16, 4, 25).collect()}
    assert len(rows) == 41
    assert rows[0]["p_candidate_milli"] == 0
    assert rows[1000]["p_candidate_milli"] == 1000
    prev = -1
    for s in sorted(rows):
        p = rows[s]["p_candidate_milli"]
        assert p >= prev  # monotone
        prev = p
        exact = 1 - (1 - (s / 1000) ** 4) ** 16
        assert abs(p / 1000 - exact) < 0.02, (s, p, exact)
    # analytic 0.5-crossing: (1-s^4)^16 = 0.5 -> s ~ 0.4536
    assert not rows[425]["is_above_half"]
    assert rows[475]["is_above_half"]


def test_shrunk_rates_pulls_small_groups_to_pool(spark):
    """m-estimate: a tiny perfect group lands between pool and raw; a
    large group barely moves; exact integer milli values."""
    from reader_spark.ops.shrinkage import shrunk_rates

    rows = (
        [("big", 1)] * 900 + [("big", 0)] * 100      # raw 0.900, n=1000
        + [("tiny", 1)] * 2                           # raw 1.000, n=2
        + [("bad", 0)] * 48 + [("bad", 1)] * 2        # raw 0.040, n=50
    )
    df = spark.createDataFrame(rows, "source string, is_good int")
    out = {r["source"]: r for r in shrunk_rates(df, prior_strength=100).collect()}
    pool_micro = (900 + 2 + 2) * 10**6 // 1052
    for g, n, x in (("big", 1000, 900), ("tiny", 2, 2), ("bad", 50, 2)):
        assert out[g]["raw_milli"] == x * 1000 // n
        assert out[g]["shrunk_milli"] == (
            (x * 10**6 + 100 * pool_micro) // ((n + 100) * 1000)
        )
    # tiny's perfect rate collapses toward the pool; big barely moves
    assert out["tiny"]["shrunk_milli"] < 900
    assert abs(out["big"]["shrunk_milli"] - out["big"]["raw_milli"]) < 10
    # shrunk preserves enough signal to still rank big > tiny-pool > bad
    assert out["big"]["shrunk_milli"] > out["tiny"]["shrunk_milli"] > out["bad"]["shrunk_milli"]
