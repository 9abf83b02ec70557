"""Approximate-nearest-neighbor search over an embedding column
(array<float>) — Spark-native.

Three paths:
  * brute_force_topk — exact cosine top-k via F.aggregate/zip_with dot
    products (JVM-side, no Python). Baseline and oracle.
  * lsh_bucketed_topk — random-hyperplane LSH (Charikar STOC'02 sign-random
    projections; Indyk & Motwani STOC'98 LSH framing): deterministic
    sign-bit sketches bucket the corpus; only bucket-mates (and optionally
    neighbor buckets) are scored. The scale path: candidate scoring is a
    bucket equi-join, not a full cross product.
  * IVF (inverted-file) — k-means coarse quantizer (Lloyd's algorithm,
    deterministic init; cf. Jégou/Douze/Schmid TPAMI'11 IVFADC coarse stage):
    corpus partitioned into cells by nearest centroid; queries probe the
    `nprobe` nearest cells only. Centroid training shuffles `cells × dim`
    rows per partition (map-side combined), assignment is shuffle-free
    (centroids broadcast as literals), search is a cell equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL cosine instead of an ANSI
    # DIVIDE_BY_ZERO task failure (one junk embedding must not kill a scan)
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector (broadcast as a literal
    array — no shuffle at all; the scan streams once)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col).cast("array<double>"), q), 4).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def hyperplane_sketch(vec: Column, dim: int, planes: int = 16, seed: int = 0) -> Column:
    """Random-hyperplane sign sketch with DETERMINISTIC pseudo-random planes:
    plane p's weight for dimension d = (xxhash64(p*dim+d) scaled to [-1,1]).
    Same planes on every executor with zero data movement. `seed` selects an
    independent plane family (seed=0 keeps the original planes) — used for
    multi-table LSH, where a pair collides if it agrees in ANY table."""
    bits = []
    for p in range(planes):
        weights = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d, p=p: (
                F.xxhash64(
                    F.lit(p * 100003 + seed * 1000003619).cast("long")
                    + d.cast("long")
                )
                .cast("double")
                / F.lit(float(2**63))
            ),
        )
        proj = F.aggregate(
            F.zip_with(vec, weights, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bits.append(F.shiftleft(bit, p))
    sketch = bits[0]
    for b in bits[1:]:
        sketch = sketch + b
    return sketch


def _sq_l2(vec: Column, centroid: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cell_ranks(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of cell ids ordered by ascending L2 distance from `vec`.
    Centroids are literal arrays (driver-broadcast constants) — the whole
    expression is JVM-side, no shuffle, no Python."""
    entries = F.array(
        *[
            F.struct(
                F.round(_sq_l2(vec, c), 9).alias("dist"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.transform(F.array_sort(entries), lambda s: s.getField("cell"))


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer.

    Init: the `n_cells` vectors with the smallest xxhash64(id) — a
    deterministic pseudo-random sample, same on every run. Each iteration:
    nearest-centroid assignment (broadcast literals, shuffle-free), then
    centroid recompute via posexplode + groupBy(cell, pos).avg — map-side
    partial aggregation means the shuffle carries only
    `partitions × n_cells × dim` rows regardless of corpus size.
    """
    seeds = (
        embeddings.select(
            F.col(vec_col).cast("array<double>").alias("v"),
            F.xxhash64(F.col(id_col)).alias("h"),
        )
        .orderBy("h")
        .limit(n_cells)
        .collect()
    )
    centroids = [list(r["v"]) for r in seeds]
    n_cells = len(centroids)  # corpus may be smaller than the requested cells
    vecs = embeddings.select(F.col(vec_col).cast("array<double>").alias("v"))
    for _ in range(iters):
        assigned = vecs.withColumn("cell", _cell_ranks(F.col("v"), centroids)[0])
        rows = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
            .collect()
        )
        new = {r["cell"]: [e["m"] for e in r["ms"]] for r in rows}
        # empty cells keep their previous centroid (standard Lloyd handling)
        centroids = [new.get(i, centroids[i]) for i in range(n_cells)]
    return centroids


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF index: every corpus vector tagged with its nearest cell.
    At scale this frame is written bucketed/partitioned BY cell so a probe
    reads only the probed cells (partition pruning on the cell column)."""
    return embeddings.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("corpus_vec"),
    ).withColumn("cell", _cell_ranks(F.col("corpus_vec"), centroids)[0])


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k per query over the `nprobe` nearest IVF cells: queries explode
    to (query, probe_cell) pairs, equi-join the cell-partitioned corpus,
    score cosine on bucket-mates only, window top-k. Work per query is
    ~nprobe/n_cells of brute force."""
    from pyspark.sql import Window

    corpus = ivf_assign(embeddings, centroids, id_col, vec_col)
    qs = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("query_vec"),
        )
        .withColumn(
            "cell",
            F.explode(F.slice(_cell_ranks(F.col("query_vec"), centroids), 1, nprobe)),
        )
    )
    scored = corpus.join(qs, "cell").withColumn(
        "cosine", F.round(cosine_col(F.col("corpus_vec"), F.col("query_vec")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k per query via LSH bucketing: join corpus and queries on the
    hyperplane sketch, score only bucket-mates, window top-k per query.

    Recall < 1.0 by construction (ANN); raise `planes` tables or probe
    neighboring buckets for higher recall.
    """
    from pyspark.sql import Window

    corpus = embeddings.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("corpus_vec"),
    ).withColumn("bucket", hyperplane_sketch(F.col("corpus_vec"), dim, planes))
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("query_vec"),
    ).withColumn("bucket", hyperplane_sketch(F.col("query_vec"), dim, planes))
    scored = corpus.join(qs, "bucket").withColumn(
        "cosine", F.round(cosine_col(F.col("corpus_vec"), F.col("query_vec")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def md5_plane_weights(dim: int, planes: int) -> list[list[float]]:
    """Deterministic, ENGINE-PORTABLE hyperplane weights: weight(p, d) =
    uint32(md5("p:d")[:8]) / 2^31 - 1  in [-1, 1). Computed driver-side in
    pure Python and embedded as literals on BOTH sides of an oracle check,
    so Spark and any ANSI engine score byte-identical projections. Use
    hyperplane_sketch (seeded xxhash64, zero literal bloat) in production."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) / 2**31 - 1.0
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def hyperplane_sketch_literal(vec: Column, weights: list[list[float]]) -> Column:
    """Sign sketch against EXPLICIT plane weights (literal arrays — constant
    folded, broadcast with the plan, no data movement)."""
    bits = []
    for p, w in enumerate(weights):
        wcol = F.array(*[F.lit(float(x)) for x in w])
        proj = F.aggregate(
            F.zip_with(vec, wcol, lambda x, ww: x * ww),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bits.append(F.shiftleft(bit, p))
    sketch = bits[0]
    for b in bits[1:]:
        sketch = sketch + b
    return sketch


def lsh_bucketed_topk_literal(
    embeddings: DataFrame,
    queries: DataFrame,
    weights: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """lsh_bucketed_topk with explicit literal planes — identical physical
    shape (bucket equi-join, window top-k); exists so the LSH path can be
    oracle-checked value-for-value against an ANSI engine."""
    from pyspark.sql import Window

    corpus = embeddings.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("corpus_vec"),
    ).withColumn("bucket", hyperplane_sketch_literal(F.col("corpus_vec"), weights))
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("query_vec"),
    ).withColumn("bucket", hyperplane_sketch_literal(F.col("query_vec"), weights))
    scored = corpus.join(qs, "bucket").withColumn(
        "cosine", F.round(cosine_col(F.col("corpus_vec"), F.col("query_vec")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def md5_pq_codebooks(
    dim: int, m: int = 8, k: int = 16
) -> list[list[list[float]]]:
    """Deterministic ENGINE-PORTABLE product-quantization codebooks:
    codebooks[sub][code][d] derived from md5, in [-1, 1). Like
    md5_plane_weights, these are literals embedded identically on both
    sides of an oracle check. Production should train per-subspace Lloyd
    codebooks (train_pq_codebooks) — random codebooks exercise the exact
    same encode/search machinery with weaker quantization quality."""
    import hashlib

    subdim = dim // m
    return [
        [
            [
                int(
                    hashlib.md5(f"pq:{sub}:{code}:{d}".encode()).hexdigest()[:8], 16
                )
                / 2**31
                - 1.0
                for d in range(subdim)
            ]
            for code in range(k)
        ]
        for sub in range(m)
    ]


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace Lloyd codebooks (the PQ training stage of IVFADC,
    Jégou/Douze/Schmid TPAMI'11): split each vector into m contiguous
    subvectors, run the same deterministic k-means as the IVF coarse
    quantizer independently per subspace. Each subspace shuffles only
    partitions x k x subdim partial sums; the driver holds m*k*subdim
    floats."""
    dim = len(embeddings.select(vec_col).head()[0])
    subdim = dim // m
    books = []
    for sub in range(m):
        sliced = embeddings.select(
            F.col(id_col),
            F.slice(F.col(vec_col).cast("array<double>"), sub * subdim + 1, subdim).alias(
                "embedding"
            ),
        )
        books.append(
            train_ivf_centroids(sliced, n_cells=k, iters=iters, id_col=id_col)
        )
    return books


def _pq_code_col(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """codes: array<int>, one nearest-sub-centroid id per subspace.
    Centroids are literals — pure JVM expression, no shuffle, no Python."""
    m = len(codebooks)
    subdim = len(codebooks[0][0])
    code_cols = []
    for sub in range(m):
        sv = F.slice(vec, sub * subdim + 1, subdim)
        entries = F.array(
            *[
                F.struct(
                    F.round(_sq_l2(sv, c), 9).alias("dist"),
                    F.lit(code).alias("code"),
                )
                for code, c in enumerate(codebooks[sub])
            ]
        )
        code_cols.append(
            F.element_at(F.array_sort(entries), 1).getField("code").cast("int")
        )
    return F.array(*code_cols)


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode the corpus: (id, codes array<int>). At m=8, k=16 each
    64-dim float vector compresses 256 B -> 8 codes (4 bits each) — the
    storage layout that makes 10^12-vector search feasible."""
    return embeddings.select(
        F.col(id_col),
        _pq_code_col(F.col(vec_col).cast("array<double>"), codebooks).alias("codes"),
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the per-(subspace,
    code) distance table is computed DRIVER-SIDE from the raw query and
    embedded as literals, so scoring a vector is m table lookups + a sum —
    no float vector is read at all. Scan-bound; sort+limit compiles to
    TakeOrderedAndProject (per-partition partial top-k)."""
    m = len(codebooks)
    subdim = len(codebooks[0][0])
    table = [
        [
            round(
                sum(
                    (query_vec[sub * subdim + d] - c[d]) ** 2 for d in range(subdim)
                ),
                9,
            )
            for c in codebooks[sub]
        ]
        for sub in range(m)
    ]
    table_lit = F.array(
        *[F.array(*[F.lit(x) for x in row]) for row in table]
    )
    terms = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda sub: F.element_at(
            F.element_at(table_lit, sub + 1),
            F.element_at(F.col("codes"), sub + 1) + 1,
        ),
    )
    dist = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    return (
        encoded.select(F.col(id_col), F.round(dist, 6).alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(topk)
    )


def ivfadc_encode(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The PERSISTABLE IVFADC index table: (corpus_id, cell, codes).

    Write it ``.write.partitionBy("cell").parquet(path)`` once at ingest
    (jobs/ann_index_job.py); queries then read only their probed cells
    (partition pruning, pinned by tests/test_plans.py) and score a few
    bytes of codes per vector — the raw float corpus is never read again.
    """
    corpus = ivf_assign(embeddings, centroids, id_col, vec_col)
    return corpus.select(
        "corpus_id",
        "cell",
        _pq_code_col(F.col("corpus_vec"), codebooks).alias("codes"),
    )


def ivfadc_search(
    encoded: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over a prebuilt (corpus_id, cell, codes) index — the
    query half of ivfadc_topk. Probing filters to nprobe cells per query
    BEFORE the join, so a cell-partitioned on-disk index is read
    ~nprobe/n_cells."""
    from pyspark.sql import Window

    m = len(codebooks)
    subdim = len(codebooks[0][0])
    books_lit = F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in book])
            for book in codebooks
        ]
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("query_vec"),
    ).withColumn(
        "cell",
        F.explode(F.slice(_cell_ranks(F.col("query_vec"), centroids), 1, nprobe)),
    )

    def _term(sub):
        centroid = F.element_at(
            F.element_at(books_lit, sub + 1), F.element_at(F.col("codes"), sub + 1) + 1
        )
        sq = F.aggregate(
            F.zip_with(
                F.slice(F.col("query_vec"), sub * subdim + 1, subdim),
                centroid,
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.round(sq, 9)

    terms = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), _term)
    adc = F.round(
        F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x), 6
    )
    scored = encoded.join(qs, "cell").withColumn("adc_dist", adc)
    w = Window.partitionBy("query_id").orderBy("adc_dist", "corpus_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "adc_dist", "rank")
    )


def ivfadc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full IVFADC (Jégou/Douze/Schmid TPAMI'11): coarse IVF cell probe +
    asymmetric-distance scoring over PQ codes of the probed cells only.

    The 10^12-vector shape: the corpus is stored as (cell, codes) — a few
    bytes per vector, partitioned by cell — so a query touches
    ~nprobe/n_cells of the index and never reads a float corpus vector.
    Per candidate the score is m subspace lookups against the query's
    sub-distance expression; everything (centroids, codebooks) rides the
    plan as literals. Rounding contract: each subspace term rounds at 9
    (matching the ANSI oracle), the sum rounds at 6.

    Composition of ivfadc_encode + ivfadc_search — the one-shot form; the
    persisted-index flow writes the encode result and searches it later.
    """
    encoded = ivfadc_encode(embeddings, centroids, codebooks, id_col, vec_col)
    return ivfadc_search(
        encoded, queries, centroids, codebooks, k, nprobe, id_col, vec_col
    )


def brute_force_topk_np(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via a VECTORIZED pandas UDF: per Arrow batch, one
    numpy matrix-vector product scores every row at once. Same results as
    brute_force_topk; wins on wide embeddings (dim >= ~256) where the
    per-element JVM aggregate loses to BLAS. Sort+limit compiles to
    TakeOrderedAndProject (per-partition partial top-k, no full sort)."""
    import math
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from pyspark.sql.types import StructField, StructType
    from pyspark.sql.types import DoubleType as _Dbl

    q = np.asarray(query_vec, dtype=np.float64)
    qn = math.sqrt(float(q @ q))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            mat = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            # zero-norm vectors: cosine undefined -> NaN here, which Arrow
            # surfaces as NULL — the same as the JVM brute_force_topk
            # (non-ANSI 0.0/0.0 -> NULL) — instead of a numpy warning
            denom = norms * qn
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom == 0, np.nan, (mat @ q) / denom)
            yield pd.DataFrame(
                {id_col: batch[id_col], "cosine": np.round(cos, 4)}
            )

    # derive the id field's real dtype — string/int doc ids must round-trip
    out_schema = StructType(
        [embeddings.schema[id_col], StructField("cosine", _Dbl())]
    )
    scored = embeddings.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def md5_signed_permutation(
    dim: int, seed: int = 0
) -> tuple[list[int], list[float]]:
    """Deterministic signed permutation — the cheap orthogonal transform
    of the OPQ family (Ge et al. CVPR'13 evaluate random rotation /
    permutation baselines; signed permutations ARE orthogonal matrices,
    so quantization distances are exactly preserved in aggregate while
    coordinates are redistributed across PQ subspaces, balancing
    per-subspace variance when dimensions are heterogeneous).

    Engine-portable by construction: perm = positions sorted by
    md5('perm:seed:p'), sign[p] = parity of md5('sign:seed:p') — pure
    literals on both sides of an oracle check, like md5_pq_codebooks.
    Returns (perm, signs): transformed[i] = signs[i] * v[perm[i]].
    """
    import hashlib

    perm = sorted(
        range(dim),
        key=lambda p: hashlib.md5(f"perm:{seed}:{p}".encode()).hexdigest(),
    )
    signs = [
        1.0
        if int(hashlib.md5(f"sign:{seed}:{i}".encode()).hexdigest()[:2], 16) % 2 == 0
        else -1.0
        for i in range(dim)
    ]
    return perm, signs


def apply_signed_permutation(
    vec: Column, perm: list[int], signs: list[float]
) -> Column:
    """transformed[i] = signs[i] * vec[perm[i]] — a pure JVM expression
    (dim element_at's), no shuffle, no Python."""
    return F.array(
        *[
            F.lit(signs[i]) * F.element_at(vec, perm[i] + 1)
            for i in range(len(perm))
        ]
    )


def opq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    perm: list[int],
    signs: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """OPQ-style transform-then-encode: apply the signed permutation,
    then product-quantize (the FAISS OPQMatrix+PQ composition, with the
    learned rotation swapped for the deterministic orthogonal
    permutation). Search uses the same transform on the query vector
    (driver-side) + the standard ADC machinery — distances are computed
    in the transformed space, which orthogonality keeps isometric to the
    original."""
    transformed = embeddings.select(
        F.col(id_col),
        apply_signed_permutation(
            F.col(vec_col).cast("array<double>"), perm, signs
        ).alias("embedding"),
    )
    return pq_encode(transformed, codebooks, id_col=id_col, vec_col="embedding")


def sq8_train_ranges(
    embeddings: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension [min, max] ranges for SQ8 scalar quantization, as a
    ONE-ROW dim frame (array<struct<mn,mx>> ordered by dimension).

    Fully distributed: posexplode -> per-dim min/max with map-side combine
    (the shuffle carries partitions x dim rows), re-assembled into a single
    array row — never collected to the driver, broadcast-joined by the
    encoder. This is the quantizer 'training' step of e.g. FAISS's
    ScalarQuantizer QT_8bit (public API semantics, not its code).
    """
    return (
        embeddings.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x")
        )
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mn", "mx"))
            ).alias("__rng")
        )
        .select(
            F.transform(
                F.col("__rng"), lambda s: F.struct(s.getField("mn").alias("mn"), s.getField("mx").alias("mx"))
            ).alias("ranges")
        )
    )


def sq8_encode(
    embeddings: DataFrame,
    ranges: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ8 encode: each float dimension to an int code in [0, 255] via
    code = floor(round((v - mn) * 255 / (mx - mn), 9)), clamped; constant
    dimensions (mx == mn) encode as 0. 4x memory cut per dimension vs
    float32 (16x vs the double compute type) with rank-preserving error
    bounded by the cell width — the cheap first rung below PQ/IVFADC.
    Engine-portable: the round-9-before-floor keeps the integer codes
    bit-identical across engines (same convention as zorder/sq twins).
    """
    code = lambda v, s: F.least(  # noqa: E731
        F.lit(255),
        F.floor(
            F.round(
                (v - s.getField("mn")) * 255.0 / (s.getField("mx") - s.getField("mn")),
                9,
            )
        ),
    ).cast("int")
    return embeddings.crossJoin(F.broadcast(ranges)).select(
        F.col(id_col),
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("ranges"),
            lambda v, s: F.when(
                s.getField("mx") > s.getField("mn"), code(v, s)
            ).otherwise(F.lit(0)),
        ).alias("codes"),
    )


def sign_bit_words(vec: Column, dim: int) -> Column:
    """Binary (sign-bit) quantization: bit i = 1 iff vec[i] > 0, packed
    MSB-first into 32-bit words (array<long>). 32 bits per word — not 64
    — keeps every intermediate below 2^53 and clear of the 1<<63
    signed-overflow trap, portable across engines. dim need not be a
    multiple of 32; the last word just carries fewer bits."""
    words = []
    for w in range((dim + 31) // 32):
        n = min(32, dim - w * 32)
        words.append(
            F.aggregate(
                F.slice(vec, w * 32 + 1, n),
                F.lit(0).cast("long"),
                lambda acc, v: acc * 2 + F.when(v > 0, 1).otherwise(0),
            )
        )
    return F.array(*words)


def binary_hamming_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantized ANN (the RaBitQ/BQ recipe every vector store
    ships): sign-bit codes + Hamming-distance candidate generation, then
    exact cosine rerank within the candidate set only.

    Scale shape: codes are dim/8 bytes (16 bytes for dim=64 — a 16x scan
    reduction when persisted as a compact index); the candidate stage is
    a pure scan + TakeOrdered (per-partition partial top-C, NO shuffle,
    no full sort), and the float vectors are touched only for the C
    candidate rows. Ties at the candidate boundary cut deterministically
    by (hamming, id).

    Returns (id, hamming, cosine) — the exact-cosine top-k of the
    candidate set, ordered by cosine desc."""
    dim = len(query_vec)
    qbits = []
    for w in range((dim + 31) // 32):
        acc = 0
        for v in query_vec[w * 32 : w * 32 + 32]:
            acc = acc * 2 + (1 if v > 0 else 0)
        qbits.append(acc)
    code = sign_bit_words(F.col(vec_col).cast("array<double>"), dim)
    hamming = None
    for i, qw in enumerate(qbits):
        term = F.bit_count(
            F.element_at(F.col("code"), i + 1).bitwiseXOR(F.lit(qw))
        ).cast("long")
        hamming = term if hamming is None else hamming + term
    cand = (
        embeddings.withColumn("code", code)
        .select(id_col, vec_col, hamming.alias("hamming"))
        .orderBy(F.asc("hamming"), F.col(id_col).asc())
        .limit(candidates)
    )
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        cand.select(
            F.col(id_col),
            F.col("hamming"),
            F.round(
                cosine_col(F.col(vec_col).cast("array<double>"), q), 4
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col).asc())
        .limit(k)
    )


def binary_index_encode(
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(corpus_id, code): the persisted binary index rows — sign-bit words
    only, dim/8 bytes per vector. The float vectors do NOT ride along:
    at query time the full-precision rerank fetches candidates from the
    embedding store by id (k x Q rows), never scanning it."""
    return embeddings.select(
        F.col(id_col).alias("corpus_id"),
        sign_bit_words(F.col(vec_col).cast("array<double>"), dim).alias("code"),
    )


def binary_index_search(
    codes: DataFrame,
    queries: DataFrame,
    embeddings: DataFrame,
    dim: int,
    k: int = 10,
    candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-query search against a persisted binary index: the compact
    code table scans ONCE with the query codes broadcast beside it
    (hamming per row, integers only), the per-query candidate cut is a
    query-keyed window over (hamming, id) rows — Q bounded, rows are
    three ints — and ONLY the candidate ids join back to the embedding
    store for the exact cosine rerank. The full-precision corpus is
    never scanned at query time.

    Returns (query_id, corpus_id, hamming, cosine, rank) — top-k per
    query by exact cosine within candidates."""
    from pyspark.sql import Window

    qcodes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        sign_bit_words(F.col(vec_col).cast("array<double>"), dim).alias("qc"),
    )
    hamming = None
    for w in range((dim + 31) // 32):
        term = F.bit_count(
            F.element_at(F.col("qc"), w + 1).bitwiseXOR(
                F.element_at(F.col("code"), w + 1)
            )
        ).cast("long")
        hamming = term if hamming is None else hamming + term
    pairs = codes.crossJoin(
        F.broadcast(qcodes.select("query_id", "qc"))
    ).select("query_id", "corpus_id", hamming.alias("hamming"))
    wq = Window.partitionBy("query_id")
    cand = pairs.withColumn(
        "hr",
        F.row_number().over(wq.orderBy(F.asc("hamming"), F.asc("corpus_id"))),
    ).where(F.col("hr") <= candidates)
    fetched = cand.join(
        embeddings.select(
            F.col(id_col).alias("corpus_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        ),
        "corpus_id",
    ).join(qcodes.select("query_id", "qv"), "query_id")
    scored = fetched.select(
        "query_id",
        "corpus_id",
        "hamming",
        F.round(cosine_col(F.col("cv"), F.col("qv")), 4).alias("cosine"),
    )
    return (
        scored.withColumn(
            "rank",
            F.row_number().over(
                wq.orderBy(F.desc("cosine"), F.asc("corpus_id"))
            ),
        )
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "hamming", "cosine", "rank")
    )
