"""Corpus deduplication operators — exact, n-gram Jaccard, MinHash-LSH
(Broder, "On the resemblance and containment of documents", 1997; banding
per Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3), SimHash
(Charikar, "Similarity estimation techniques from rounding algorithms",
STOC'02). All Spark-native (no Python UDFs): shingling via split/explode,
hashing via xxhash64, min-signatures via groupBy(min), band-bucket joins.

Scale notes (100 TB corpus):
  * Exact dedup: one shuffle on a 64-bit content hash (not the full text).
  * MinHash-LSH: candidate generation is an equi-join on (band_id,
    band_hash) buckets — no O(n^2) pair scan; only bucket-mates compare.
  * SimHash: 64 one-bit aggregations expressed as a single groupBy over
    exploded tokens; hamming distance is a codegen'd bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reader_spark.spark.fanout import fanout_scan


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups: hash-groupBy on content (J2-style dedup).

    Returns (content_hash, keeper_id, dup_count) — keeper = min id.
    """
    return (
        df.select(F.col(id_col), F.xxhash64(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("dup_count"),
        )
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a text column (distinct), as array<string>.

    LINEAR construction: arrays_zip of the word array with its n-1 shifted
    copies, one concat per window. The naive transform(sequence, i ->
    slice(words, i, n)) form is O(len^2) — Slice copies per element — and
    stalls on multi-hundred-KB documents (a 300k-word 2 MiB doc never
    finishes); this form is 3 slices + 1 zip regardless of length."""
    words = F.split(F.trim(text), r"\s+")
    size = F.size(words)
    k = size - (n - 1)
    shifts = [words] + [
        F.slice(words, i + 1, F.greatest(size - i, F.lit(0))) for i in range(1, n)
    ]
    zipped = F.arrays_zip(*shifts)
    joined = F.transform(
        zipped,
        lambda s: F.concat_ws(" ", *[s.getField(str(i)) for i in range(n)]),
    )
    return F.array_distinct(
        F.when(k > 0, F.slice(joined, 1, k)).otherwise(
            F.array(F.concat_ws(" ", words))
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard similarity.

    Exact (no sketch): explode distinct shingles, self-join on shingle to
    count intersections, Jaccard = |I| / (|A| + |B| - |I|). Quadratic in the
    worst case — use minhash_lsh_candidates at scale; this is the oracle-able
    exact form.
    """
    sh = fanout_scan(df).select(
        F.col(id_col).alias("doc"), shingles(F.col(text_col), n).alias("sh")
    )
    sizes = sh.select("doc", F.size("sh").alias("n_sh"))
    exploded = sh.select("doc", F.explode("sh").alias("shingle"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 64
) -> DataFrame:
    """MinHash signatures: k seeded xxhash64 mins over exploded shingles.

    One explode + one groupBy (k aggregates run as a single map-side-combined
    shuffle) — no per-row Python.
    """
    exploded = fanout_scan(df).select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    )
    mins = [
        F.min(F.xxhash64(F.lit(seed), F.col("shingle"))).alias(f"h{seed}")
        for seed in range(num_hashes)
    ]
    sig = exploded.groupBy("doc").agg(*mins)
    return sig.select(
        "doc", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )


def _minhash_banded(
    signatures: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(doc, band_id, band_hash) bucket rows from minhash signatures."""
    return signatures.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.struct(
                    band.alias("band_id"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("signature"),
                                    band * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda value: value.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("doc", "band.band_id", "band.band_hash")


def _bucket_pairs(banded: DataFrame) -> DataFrame:
    """Distinct (doc_a, doc_b) sharing any bucket — all pairs WITHIN each
    bucket. Quadratic in bucket size: fine for well-spread sketches, a
    scale-killer on boilerplate-heavy corpora where one bucket holds
    millions of near-identical docs. Use _bucket_star_edges when the pairs
    feed connected components."""
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def _bucket_star_edges(banded: DataFrame) -> DataFrame:
    """STAR edges per bucket: every member links to the bucket's min doc.

    For connected-components consumption this is EQUIVALENT to all pairs
    (any two bucket-mates connect through the hub) but emits n-1 edges per
    bucket instead of n(n-2)/2 — on a boilerplate-heavy corpus where one
    bucket holds millions of docs, that is the difference between a linear
    job and a quadratic blowup. One map-side-combined groupBy (hub per
    bucket) + one 1:1 equi-join back; no self-join of bucket rows.
    """
    hubs = banded.groupBy("band_id", "band_hash").agg(F.min("doc").alias("hub"))
    return (
        banded.join(hubs, ["band_id", "band_hash"])
        .where(F.col("doc") != F.col("hub"))
        .select(F.col("hub").alias("doc_a"), F.col("doc").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: bucket docs by (band_id, hash(band slice)); docs sharing
    any bucket are candidate near-duplicates. Returns distinct (doc_a, doc_b).

    The join key (band_id, band_hash) spreads uniformly on DIVERSE corpora —
    candidate generation is shuffle-bounded, never a global all-pairs. For
    clustering (no per-pair verification downstream), prefer
    minhash_lsh_star_edges: identical components, linear in bucket size.
    """
    return _bucket_pairs(_minhash_banded(signatures, bands, rows_per_band))


def minhash_lsh_star_edges(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Cluster-equivalent LSH edges (star per bucket) — the PRODUCTION
    candidate generator when the output feeds connected components (as in
    corpus_prep). Emits O(members) edges per bucket, so a corpus where one
    template dominates (the real shape of web data) stays linear."""
    return _bucket_star_edges(_minhash_banded(signatures, bands, rows_per_band))


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Duplicate-cluster assembly: connected components over candidate
    pairs via min-label propagation WITH pointer jumping (hash-min plus a
    label <- label-of-label step each round, i.e. path halving; cf.
    Rastogi et al., "Finding connected components in MapReduce", ICDE'13).
    Plain one-hop propagation needs O(diameter) rounds — a CHAIN of
    near-dups (doc i ~ doc i+1, the transitive-duplicate shape) silently
    returned unconverged labels past 20 hops. Pointer jumping doubles the
    covered distance per round, so max_iterations=20 handles diameters up
    to ~2^20.

    Returns (doc, component) where component = min doc id in the cluster.
    Each round is two narrow (vertex, label) shuffles; lineage is truncated
    with localCheckpoint so the plan does not grow with iterations. A
    convergence check (any label changed?) exits early — and if the loop
    exhausts max_iterations still unconverged, it raises rather than
    returning wrong clusters.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.v)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        hopped = labels.join(neighbor_min, labels.v == neighbor_min.src, "left").select(
            "v",
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping: label <- label's own label (labels are always
        # vertex ids, so the self-join always resolves); min is monotone
        jump = hopped.select(
            F.col("v").alias("pv"), F.col("label").alias("plabel")
        )
        updated = (
            hopped.join(jump, hopped.label == jump.pv, "left")
            .select(
                "v",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "v")
            .where(F.col("u.label") != F.col("l.label"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds — raise max_iterations (graph diameter > ~2^rounds)"
        )
    return labels.select(F.col("v").alias("doc"), F.col("label").alias("component"))


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32, portable: bool = False
) -> DataFrame:
    """SimHash fingerprints: per-token 64-bit hash, sum each bit's +/-1
    weight per doc, sign -> bit. Returns (doc, simhash:long).

    Uses the low `bits` bits (32 default keeps the reassembled value safely
    inside a signed long).

    portable=True swaps the token hash from xxhash64 to the first 32 bits of
    md5 hex (conv(substr(md5(token),1,8),16,10)) — byte-identical in ANSI SQL
    engines, so the whole fingerprint is oracle-checkable. Production path
    stays xxhash64 (faster, 64 usable bits).
    """
    token_hash = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
        if portable
        else F.xxhash64("token")
    )
    tokens = fanout_scan(df).select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    ).withColumn("th", token_hash)
    bit_sums = tokens.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    fingerprint = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fingerprint = term if fingerprint is None else fingerprint + term
    return bit_sums.select("doc", fingerprint.alias("simhash"))


def simhash_near_pairs(fingerprints: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by hamming distance over simhash (codegen'd bit_count).

    All-pairs ORACLE form — O(n^2), kept only because it is trivially
    SQL-expressible for correctness checks on small candidate sets. The
    production path is simhash_banded_pairs (identical output, equi-join
    candidate generation).
    """
    a = fingerprints.alias("a")
    b = fingerprints.alias("b")
    return (
        a.join(b, F.col("a.doc") < F.col("b.doc"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            "hamming",
        )
    )


def simhash_banded_pairs(
    fingerprints: DataFrame, max_hamming: int = 3, bits: int = 32
) -> DataFrame:
    """Near-dup pairs by hamming distance — banded (Manku/Jain/Sarma,
    "Detecting near-duplicates for web crawling", WWW'07, block-permutation
    scheme) — the PRODUCTION scale path.

    Split the `bits`-bit fingerprint into `max_hamming + 1` contiguous
    blocks. Pigeonhole: a pair differing in <= max_hamming bits cannot
    differ in all max_hamming+1 blocks, so it agrees exactly on at least
    one block. Candidate generation is therefore an equi-join on
    (block_id, block_value) — shuffle-bounded, never all-pairs — and the
    exact bit_count(xor) filter on bucket-mates makes the result IDENTICAL
    to simhash_near_pairs (the all-pairs oracle form). A pytest pins the
    set equality on fixtures.

    At 100 TB the bucket join's key cardinality is 2^(bits/(h+1)) per
    block (e.g. 2^8 for 32 bits / 4 blocks — too coarse for a trillion
    docs); for production corpora use bits=64 with max_hamming=3 -> 2^16
    buckets per block, or add a second split round per the paper. The
    physical shape is unchanged; only the literals move.
    """
    n_blocks = max_hamming + 1
    if n_blocks > bits:
        raise ValueError(
            f"max_hamming+1 ({n_blocks}) blocks cannot exceed bits ({bits})"
        )
    base, rem = divmod(bits, n_blocks)
    block_structs = []
    start = 0
    for i in range(n_blocks):
        width = base + (1 if i < rem else 0)
        block_structs.append(
            F.struct(
                F.lit(i).alias("block_id"),
                F.shiftright(F.col("simhash"), start)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("block_val"),
            )
        )
        start += width
    banded = fingerprints.select(
        "doc", "simhash", F.explode(F.array(*block_structs)).alias("b")
    ).select("doc", "simhash", F.col("b.block_id"), F.col("b.block_val"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        # distinct BEFORE the hamming filter: a pair agreeing on k blocks
        # appears k times; dedup on ids (simhash is functionally dependent)
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_near_pairs_bucketed(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.9,
    planes: int = 8,
    tables: int = 2,
    weights: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the LSH-bucketed PRODUCTION
    path (the exact all-pairs form in dedup_embedding_cosine is the oracle
    twin, O(n^2) by design).

    Each vector is sketched into `tables` independent hyperplane sign
    buckets; candidate pairs are bucket-mates in ANY table (equi-join on
    (table_id, bucket) — shuffle-bounded, never all-pairs). The exact
    cosine >= threshold filter then runs on candidates only, so precision
    is 1.0 by construction: results are always a SUBSET of the exact form.
    Recall is probabilistic — a pair at angle theta collides per table with
    prob (1 - theta/pi)^planes — so this path is for NEAR-duplicates
    (threshold >= ~0.85); raise `tables` for higher recall. Identical
    vectors always share every bucket (recall 1.0 for exact dups).

    `weights` (list of plane-weight vectors) swaps in literal planes —
    single-table — for engine-portable oracle checks (md5_plane_weights).
    """
    from reader_spark.ops.ann import (
        cosine_col,
        hyperplane_sketch,
        hyperplane_sketch_literal,
    )

    base = embeddings.select(
        F.col(id_col).alias("doc"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if weights is not None:
        sketches = [
            F.struct(
                F.lit(0).alias("table_id"),
                hyperplane_sketch_literal(F.col("v"), weights).alias("bucket"),
            )
        ]
    else:
        sketches = [
            F.struct(
                F.lit(t).alias("table_id"),
                hyperplane_sketch(F.col("v"), dim, planes, seed=t).alias("bucket"),
            )
            for t in range(tables)
        ]
    bucketed = base.select(
        "doc", "v", F.explode(F.array(*sketches)).alias("b")
    ).select("doc", "v", F.col("b.table_id"), F.col("b.bucket"))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.v").alias("v_a"),
            F.col("b.v").alias("v_b"),
        )
        # a pair colliding in several tables appears once per table; vectors
        # are functionally dependent on ids, so dedup on the id pair
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("cosine", F.round(cosine_col(F.col("v_a"), F.col("v_b")), 4))
        .where(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )


def minhash_lsh_candidates_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """MinHash-LSH candidate pairs with an ANSI-SQL-portable hash family.

    Same algorithm as minhash_signatures + minhash_lsh_candidates, but every
    hash is md5 hex (available identically in Spark and DuckDB/ANSI engines),
    so the WHOLE sketch is oracle-checkable value-for-value:
      h_seed(shingle) = md5('<seed>|' || shingle)   (lowercase hex)
      signature[seed] = MIN(h_seed)                  (lexicographic = numeric
                                                      on fixed-width hex)
      band_hash(b)    = md5(h_{b*r} || '|' || ... || h_{b*r+r-1})
    Candidates = distinct (doc_a, doc_b) sharing any (band_id, band_hash).
    Use the xxhash64 variant in production (faster); this one is the
    correctness gate. Physical shape is identical: one explode + one
    map-side-combined groupBy + one equi-join on band buckets.
    """
    return _bucket_pairs(
        _minhash_banded_portable(
            df, id_col, text_col, n, num_hashes, bands, rows_per_band
        )
    )


def minhash_lsh_star_edges_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Star-edge form of the portable sketch (see minhash_lsh_star_edges):
    component-equivalent, linear in bucket size."""
    return _bucket_star_edges(
        _minhash_banded_portable(
            df, id_col, text_col, n, num_hashes, bands, rows_per_band
        )
    )


def _minhash_banded_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    rows_per_band: int,
) -> DataFrame:
    if bands * rows_per_band != num_hashes:
        # a shortfall silently ignores hashes (lower recall), an overrun
        # hashes nulls into every band (false buckets)
        raise ValueError(
            f"bands*rows_per_band ({bands}*{rows_per_band}) must equal "
            f"num_hashes ({num_hashes})"
        )
    exploded = fanout_scan(df).select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    )
    mins = [
        F.min(
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("shingle")))
        ).alias(f"h{seed}")
        for seed in range(num_hashes)
    ]
    sig = exploded.groupBy("doc").agg(*mins)
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
                )
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc", "band.band_id", "band.band_hash")


def build_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    portable: bool = False,
) -> DataFrame:
    """The PERSISTENT dedup index for incremental crawls: one row per
    ingested doc, ``(doc, band_hashes, shingle_set)`` where
    ``band_hashes[band_id]`` is the LSH band bucket hash (identical
    values to the inline banding — same slice + hash recipe) and
    ``shingle_set`` is the distinct word-n-gram set for exact-Jaccard
    verification.

    Write it once at ingest (``df.write.parquet(path)``, ideally
    bucketed/sorted by ``doc``); every later recrawl batch joins against
    it WITHOUT re-shingling or re-minhashing the corpus — at 100 TB,
    re-sketching the whole corpus per batch is the dominant cost this
    table removes. Parquet column pruning keeps the two read paths
    cheap: the candidate join projects only (doc, band_hashes); the
    verify join only (doc, shingle_set).

    Build cost: one shingle explode + one map-side-combined groupBy +
    one doc-keyed join — ingest-time, once per doc ever.
    """
    if bands * rows_per_band != num_hashes:
        raise ValueError(
            f"bands*rows_per_band ({bands}*{rows_per_band}) must equal "
            f"num_hashes ({num_hashes})"
        )
    sets = fanout_scan(df).select(
        F.col(id_col).alias("doc"),
        shingles(F.col(text_col), n).alias("shingle_set"),
    )
    exploded = sets.select("doc", F.explode("shingle_set").alias("shingle"))
    if portable:
        mins = [
            F.min(
                F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("shingle")))
            ).alias(f"h{seed}")
            for seed in range(num_hashes)
        ]
        band_hash = [
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"h{b * rows_per_band + j}")
                        for j in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    else:
        mins = [
            F.min(F.xxhash64(F.lit(seed), F.col("shingle"))).alias(f"h{seed}")
            for seed in range(num_hashes)
        ]
        # same recipe as _minhash_banded: xxhash64 over the comma-joined
        # band slice of the signature, rendered via string casts
        band_hash = [
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{b * rows_per_band + j}").cast("string")
                        for j in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    sig = exploded.groupBy("doc").agg(*mins)
    banded = sig.select("doc", F.array(*band_hash).alias("band_hashes"))
    return banded.join(sets, "doc")


def _index_banded(index: DataFrame) -> DataFrame:
    """Explode a band index back to (doc, band_id, band_hash) bucket rows
    — array position IS the band id, so values are identical to the
    inline banding."""
    return index.select(
        "doc",
        F.posexplode("band_hashes").alias("band_id", "band_hash"),
    )


def incremental_near_dups(
    old_df: DataFrame | None,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.8,
    portable: bool = False,
    index: DataFrame | None = None,
) -> DataFrame:
    """Cross-batch near-dup detection: flag documents in a NEW batch
    that near-duplicate anything already in the ingested corpus — the
    incremental-crawl dedup step (each recrawl batch checks against the
    corpus without re-pairing the corpus with itself).

    Shape at 100 TB: the old batch's band index is the PERSISTENT INDEX
    — built once at ingest via :func:`build_band_index`, stored on disk,
    and passed in as ``index``; only the new batch is sketched per run.
    When ``index`` is None it is built inline from ``old_df`` (the
    small-corpus / one-shot form — bit-identical pairs either way).
    Candidates come from one equi-join of new bands against the index
    (no new-x-new or old-x-old pairing), and the exact-Jaccard verify
    joins shingle sets for candidate docs only — old shingle sets come
    FROM the index, so the old corpus text is never re-read. Both joins
    are key-bounded; nothing is quadratic in corpus size.

    portable=True uses the md5 hash family (byte-identical in ANSI SQL,
    oracle-checkable end-to-end); production uses xxhash64. An index
    must be queried with the same ``portable`` mode it was built with.

    Returns (new_doc, old_doc, jaccard) for verified pairs with
    round(jaccard, 6) >= threshold.
    """
    if bands * rows_per_band != num_hashes:
        raise ValueError(
            f"bands*rows_per_band ({bands}*{rows_per_band}) must equal "
            f"num_hashes ({num_hashes})"
        )
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if index is None:
        if old_df is None:
            raise ValueError("provide old_df or a prebuilt index")
        index = build_band_index(
            old_df, id_col, text_col, n, num_hashes, bands, rows_per_band,
            portable=portable,
        )
    else:
        # A prebuilt index whose band geometry or hash family differs from
        # the query-side banding produces ZERO band-hash matches and would
        # silently report "no near-duplicates" (ADVICE r3) — fail loudly.
        # Hash family is schema-visible (md5 bands are strings, xxhash64
        # bands are longs); band count needs a 1-row probe (LIMIT 1 scan).
        from pyspark.sql.types import ArrayType, StringType

        elem = index.schema["band_hashes"].dataType
        if not isinstance(elem, ArrayType):
            raise ValueError("index.band_hashes must be an array column")
        idx_portable = isinstance(elem.elementType, StringType)
        if idx_portable != portable:
            raise ValueError(
                f"hash-family mismatch: index was built with portable="
                f"{idx_portable} (band_hashes element "
                f"{elem.elementType.simpleString()}), query side uses "
                f"portable={portable}"
            )
        probe = index.select(F.size("band_hashes").alias("b")).head()
        if probe is not None and probe["b"] != bands:
            raise ValueError(
                f"band-geometry mismatch: index has {probe['b']} bands, "
                f"query side expects {bands} (bands={bands}, "
                f"rows_per_band={rows_per_band}, num_hashes={num_hashes})"
            )

    def banded(df: DataFrame) -> DataFrame:
        if portable:
            return _minhash_banded_portable(
                df, id_col, text_col, n, num_hashes, bands, rows_per_band
            )
        return _minhash_banded(
            minhash_signatures(df, id_col, text_col, n, num_hashes),
            bands,
            rows_per_band,
        )

    old_b = _index_banded(index).withColumnRenamed("doc", "old_doc")
    new_b = banded(new_df).withColumnRenamed("doc", "new_doc")
    cands = (
        new_b.join(old_b, ["band_id", "band_hash"])
        .select("new_doc", "old_doc")
        .distinct()
    )

    def sets(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(name),
            shingles(F.col(text_col), n).alias(f"{name}_sh"),
        )

    old_sets = index.select(
        F.col("doc").alias("old_doc"),
        F.col("shingle_set").alias("old_doc_sh"),
    )
    return (
        cands.join(sets(new_df, "new_doc"), "new_doc")
        .join(old_sets, "old_doc")
        .withColumn(
            "n_inter", F.size(F.array_intersect("new_doc_sh", "old_doc_sh"))
        )
        .withColumn(
            "n_union",
            F.size("new_doc_sh") + F.size("old_doc_sh") - F.col("n_inter"),
        )
        .where(F.col("n_union") > 0)
        .withColumn("jaccard", F.round(F.col("n_inter") / F.col("n_union"), 6))
        .where(F.col("jaccard") >= threshold)
        .select("new_doc", "old_doc", "jaccard")
    )


def similarity_join_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT Jaccard similarity self-join via prefix filtering (PPJoin
    family, Bayardo et al. WWW'07 / Xiao et al. WWW'08): unlike
    MinHash-LSH this has RECALL 1 by theorem, not in expectation.

    Order every doc's shingle set by GLOBAL frequency (rarest first,
    token as tiebreak); a doc of set size m keeps a prefix of
    p = m - ceil(threshold*m) + 1 tokens. Any pair with Jaccard >=
    threshold must share a prefix token (if the prefixes were disjoint,
    the overlap is at most min(m_a, m_b) - p < threshold-required), so
    the equi-join on prefix tokens is a LOSSLESS candidate generator;
    exact set intersection verifies.

    Shape at 100 TB: frequency ordering is the scale lever — prefixes
    hold the RAREST tokens, so the candidate join's key distribution is
    anti-Zipfian (the 'the' shingle is in nobody's prefix at tau=0.8
    unless a set is tiny); shuffles are bounded by prefix rows
    (~(1-tau)*corpus tokens) plus candidate pairs. Verification joins
    shingle arrays for candidates only.

    Float note: ceil(threshold*m) is evaluated as the same double
    expression in every engine — parity by construction.

    Returns (doc_a, doc_b, jaccard), doc_a < doc_b, round(jaccard,6) >=
    threshold.
    """
    from pyspark.sql import Window

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    sets = fanout_scan(df).select(
        F.col(id_col).alias("doc"), shingles(F.col(text_col), n).alias("sh")
    )
    toks = sets.select("doc", F.explode("sh").alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    ranked = (
        toks.join(freq, "tok")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("doc").orderBy(F.col("f").asc(), F.col("tok").asc())
            ),
        )
        .withColumn("m", F.count(F.lit(1)).over(Window.partitionBy("doc")))
    )
    prefix = ranked.where(
        F.col("r") <= F.col("m") - F.ceil(F.lit(threshold) * F.col("m")) + 1
    ).select("doc", "tok")
    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    return (
        cands.join(sets.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sets.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("n_union", F.size("sh_a") + F.size("sh_b") - F.col("n_inter"))
        .where(F.col("n_union") > 0)
        .withColumn("jaccard", F.round(F.col("n_inter") / F.col("n_union"), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """DIRECTIONAL containment |A∩B| / |A| >= threshold — the asymmetric
    near-dup relation Jaccard misses: a short quote/excerpt contained in a
    long page scores high containment but low Jaccard (Broder 1997
    distinguishes resemblance from containment). Emits (doc_a, doc_b,
    containment) meaning "doc_a is contained in doc_b"; both directions
    can appear with different scores.

    Shape: inverted-index equi-join on shingles (postings self-join) +
    one count aggregate — EXACT with recall 1 (a pair with containment
    > 0 shares a shingle by definition; shingle sets are distinct).
    Shuffles are bounded by postings rows and candidate pairs.

    Scale lever: ``max_doc_freq`` drops shingles whose posting list
    exceeds the cap (stop-shingles — the 'the quick brown' problem: one
    boilerplate shingle shared by millions of docs makes the self-join
    quadratic). Capped runs UNDERCOUNT intersections of pairs that only
    share ultra-common shingles; at sane thresholds those pairs are
    noise. None (default) = exact, the oracle-checked form.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sets = fanout_scan(df).select(
        F.col(id_col).alias("doc"),
        shingles(F.col(text_col), n).alias("sh"),
    )
    sizes = sets.select("doc", F.size("sh").alias("n_sh"))
    postings = sets.select("doc", F.explode("sh").alias("shingle"))
    if max_doc_freq is not None:
        keep = (
            postings.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        postings = postings.join(keep, "shingle")
    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") != F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a"), "doc_a")
        .withColumn(
            "containment", F.round(F.col("n_inter") / F.col("n_sh"), 6)
        )
        .where(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def novelty_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-document novelty vs everything ingested BEFORE it (ingest
    order = ascending id): the fraction of the doc's shingles whose
    first corpus occurrence is an earlier doc is its redundancy; novelty
    = 1 - redundancy. The curation signal behind 'later crawl snapshots
    add little new text' (cf. the dedup ablations in Lee et al. 2021) —
    feeds keep/drop decisions for incremental snapshots.

    Returns (<id_col>, n_shingles, n_seen_before, redundancy, novelty).

    Shape at 100 TB: one explode + ONE map-side-combined min-aggregate
    gives every shingle's first-seen doc (vocabulary-bounded shuffle);
    one equi-join back on shingle scores all docs. No pairing of docs at
    any point — cost is linear in corpus shingles, unlike pairwise dedup.
    """
    sets = fanout_scan(df).select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    )
    first_seen = sets.groupBy("shingle").agg(F.min("doc").alias("first_doc"))
    scored = (
        sets.join(first_seen, "shingle")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("first_doc") < F.col("doc")).cast("long")).alias(
                "n_seen_before"
            ),
        )
    )
    return scored.select(
        F.col("doc").alias(id_col),
        "n_shingles",
        "n_seen_before",
        F.round(F.col("n_seen_before") / F.col("n_shingles"), 6).alias(
            "redundancy"
        ),
        F.round(
            1.0 - F.col("n_seen_before") / F.col("n_shingles"), 6
        ).alias("novelty"),
    )


def cluster_exemplars(
    components: DataFrame,
    scores: DataFrame,
    doc_col: str = "doc",
    component_col: str = "component",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware canonical selection for duplicate clusters.

    ``connected_components`` (and the min-id keeper in ``exact_dups``)
    keep the LOWEST-ID member of each duplicate cluster — fine for
    counting, wrong for curation: a near-dup cluster usually contains one
    clean page and N mirror/boilerplate copies, and the clean one is
    rarely the lowest id. This joins each cluster against a per-doc
    quality score (ops.textstats.quality_logit_score, Gopher rules, or
    any (id, score) frame) and keeps the HIGHEST-scoring member, ties
    broken by lowest id for determinism.

    Returns (component, exemplar, score, n_members). Docs in
    ``components`` with no score row rank below every scored member
    (null-last ordering) — they can still win singleton clusters, with a
    null score, rather than being silently dropped.

    Scale shape: one equi-join on doc id + one per-component window; the
    window partitions by component (cluster sizes are bounded in practice
    by upstream banding; no global sort, no driver state).
    """
    from pyspark.sql import Window

    members = components.select(
        F.col(doc_col).alias("__doc"), F.col(component_col).alias("component")
    )
    sc = scores.select(
        F.col(id_col).alias("__doc"), F.col(score_col).alias("__score")
    )
    joined = members.join(sc, "__doc", "left")
    w = Window.partitionBy("component").orderBy(
        F.desc_nulls_last("__score"), F.asc("__doc")
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("component")),
        )
        .where(F.col("__rn") == 1)
        .select(
            "component",
            F.col("__doc").alias("exemplar"),
            F.col("__score").alias("score"),
            F.col("n_members").cast("long").alias("n_members"),
        )
    )


def url_variant_clusters(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-variant dedup: cluster raw crawl URLs by their canonical key
    (spark/columns.url_key_col — the U3 dedup key: fragment/query/www/
    default-port/index-file/case/trailing-slash folds, mirroring the
    reference's getUrlKey, url-helpers.ts:95-137) and elect a canonical
    representative per cluster: min by (length, url) — shortest, ties
    lexicographic, ONE struct min, no window.

    Output: (url_key, n_hits, n_variants, canonical_url). The crawl-
    hygiene report feeding frontier dedup and the URL rewrite map.
    Shape at 100 TB: keying is a pure map; ONE map-side-combined
    groupBy on the key — a mega-cluster (tracking-parameter explosion
    on one page) collapses to one candidate row per map task.
    """
    from reader_spark.spark.columns import url_key_col

    keyed = urls.select(
        url_key_col(F.col(url_col)).alias("url_key"),
        F.col(url_col).alias("_raw"),
    )
    return keyed.groupBy("url_key").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.countDistinct("_raw").alias("n_variants"),
        F.min(F.struct(F.length("_raw").alias("l"), F.col("_raw").alias("u"))).alias(
            "_c"
        ),
    ).select(
        "url_key",
        "n_hits",
        "n_variants",
        F.col("_c").getField("u").alias("canonical_url"),
    )


def content_aliases(
    docs: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Mirror / alias detection: byte-identical content served from
    more than one URL. Groups on the 128-bit content digest and reports
    (content_md5, n_copies, n_urls, n_hosts, first_url) for every
    digest with >1 distinct URL — the signal that feeds mirror-domain
    collapsing (keep one host, tombstone the rest) and explains why
    URL-level dedup alone under-counts duplication.

    Shape at 100 TB: the digest is computed map-side, so the ONE
    groupBy shuffles 32-hex digests + URLs, never payloads; a
    million-copy mirror set is absorbed by the partial aggregate.
    first_url = struct min (deterministic representative, no window).
    """
    hashed = docs.select(
        F.md5(F.col(text_col)).alias("content_md5"),
        F.col(url_col).alias("_url"),
        F.col(host_col).alias("_host"),
    )
    agg = hashed.groupBy("content_md5").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct("_url").alias("n_urls"),
        F.countDistinct("_host").alias("n_hosts"),
        F.min("_url").alias("first_url"),
    )
    return agg.where(F.col("n_urls") > 1)


def _weighted_elements(
    df: DataFrame, id_col: str, text_col: str, cap: int
) -> DataFrame:
    """(doc, tok, w) capped token counts plus the duplication expansion
    (doc, element) with element = tok#i, i < w — the exact reduction of
    integer-weighted Jaccard to set Jaccard (replicated elements; cf.
    Ioffe ICDM 2010 §1's folklore baseline that CWS accelerates)."""
    toks = fanout_scan(df).select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.filter(
                F.split(F.trim(F.col(text_col)), "\\s+"), lambda x: x != ""
            )
        ).alias("tok"),
    )
    return toks.groupBy("doc", "tok").agg(
        F.least(F.count(F.lit(1)), F.lit(cap)).cast("long").alias("w")
    )


def weighted_minhash_md5(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    cap: int = 8,
) -> DataFrame:
    """Weighted-Jaccard MinHash signature digest, md5-portable: token
    multiplicities (capped at `cap` — an 80x-repeated token should not
    own the whole similarity) expand to distinct elements tok#i, and
    the standard md5 min-hash family runs over the expansion, so two
    docs' signature-agreement probability estimates their CAPPED
    weighted Jaccard sum(min w)/sum(max w) instead of the set Jaccard
    that plain MinHash gives (which a copy-paste-with-repetition spam
    page games). Shape: one groupBy(doc, tok), a bounded <= cap
    per-token explode, one map-side-combined groupBy(doc) for the k
    mins. Returns (doc, sig_md5)."""
    el = _weighted_elements(df, id_col, text_col, cap).select(
        "doc",
        F.explode(F.sequence(F.lit(0), (F.col("w") - 1).cast("int"))).alias(
            "i"
        ),
        F.col("tok"),
    ).select(
        "doc", F.concat(F.col("tok"), F.lit("#"), F.col("i")).alias("el")
    )
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{seed}|"), F.col("el")))).alias(
            f"h{seed}"
        )
        for seed in range(num_hashes)
    ]
    sig = el.groupBy("doc").agg(*mins)
    return sig.select(
        "doc",
        F.md5(
            F.concat_ws("|", *[f"h{i}" for i in range(num_hashes)])
        ).alias("sig_md5"),
    )


def weighted_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    cap: int = 8,
) -> DataFrame:
    """Banded weighted-MinHash candidates with the EXACT capped
    weighted Jaccard evaluated on each candidate pair: bands bucket the
    duplication-expanded signatures (equi-join, never all-pairs), then
    sum(min w)/sum(max w) is computed from the two count vectors in
    exact integer milli units. Returns (doc_a, doc_b, wj_milli).

    Shape at 100 TB: the token-count frame is one groupBy; candidates
    come from the band equi-join; the exact pass joins counts ONLY for
    candidate docs (semi-join pushdown), and the per-pair token union
    is a (pair, tok)-keyed groupBy — bounded by the two docs' vocab."""
    if num_hashes % bands != 0:
        raise ValueError(f"{num_hashes=} not divisible by {bands=}")
    rows = num_hashes // bands
    counts = _weighted_elements(df, id_col, text_col, cap)
    el = counts.select(
        "doc",
        F.explode(F.sequence(F.lit(0), (F.col("w") - 1).cast("int"))).alias(
            "i"
        ),
        "tok",
    ).select(
        "doc", F.concat(F.col("tok"), F.lit("#"), F.col("i")).alias("el")
    )
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{seed}|"), F.col("el")))).alias(
            f"h{seed}"
        )
        for seed in range(num_hashes)
    ]
    sig = el.groupBy("doc").agg(*mins)
    bandrows = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows + r}") for r in range(rows)]
        bandrows.append(
            sig.select(
                "doc",
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    banded = bandrows[0]
    for extra in bandrows[1:]:
        banded = banded.union(extra)
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
        )
        .distinct()
    )
    ca = cand.join(
        counts.select(F.col("doc").alias("doc_a"), "tok", F.col("w").alias("wa")),
        "doc_a",
    ).select("doc_a", "doc_b", "tok", "wa", F.lit(0).cast("long").alias("wb"))
    cb = cand.join(
        counts.select(F.col("doc").alias("doc_b"), "tok", F.col("w").alias("wb")),
        "doc_b",
    ).select("doc_a", "doc_b", "tok", F.lit(0).cast("long").alias("wa"), "wb")
    merged = (
        ca.union(cb)
        .groupBy("doc_a", "doc_b", "tok")
        .agg(F.max("wa").alias("wa"), F.max("wb").alias("wb"))
    )
    return (
        merged.groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.least("wa", "wb")).alias("mn"),
            F.sum(F.greatest("wa", "wb")).alias("mx"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("(mn * 1000) div mx").cast("long").alias("wj_milli"),
        )
    )
