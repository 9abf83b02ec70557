"""Feature-hashing text vectorizer (Weinberger et al. 2009, ICML).

The "hashing trick": token t contributes sign(h2(t)) at index h1(t) of a
fixed-dim vector — no vocabulary, no fit step, memory O(dim) regardless of
corpus size. This is the bridge from raw text to this repo's embedding
operators (SemDeDup / ANN / SQ8 / k-center all consume array<double>):
at 100 TB you get deterministic, shuffle-free document vectors from one
token explode + one map-side-combined aggregate per doc.

Engine-portable: both hash functions are the repo's md5-head family;
counts are INTEGERS (sign-summed), so the squared-norm is exact and the
final L2 normalization divides by the same double in every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reader_spark.spark.fanout import fanout_scan

__all__ = ["feature_hash_vectors"]


def _md5_head(prefix: str, s: Column) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), s)), 1, 8), 16, 10
    ).cast("long")


def feature_hash_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    normalize: bool = True,
    fanout: int | None = None,
) -> DataFrame:
    """(id, vector array<double>): signed hashed bag-of-words.

    index = h1(token) mod dim, sign = +-1 from h2(token)'s low bit (the
    sign hash keeps the estimator unbiased — collisions cancel in
    expectation instead of accumulating). With normalize=True the vector
    is L2-unit (zero vectors stay zero), ready for cosine machinery.

    fanout: the token explode amplifies per-row work ~2 md5/token, so a
    small corpus read from one parquet file (scan partitions < cores)
    starves the cluster at the hash stage. None (auto) repartitions to
    defaultParallelism ONLY in that case — the pre-explode rows are tiny
    relative to the hash work, and at real scale the scan already carries
    more partitions than cores so auto is a no-op (no extra shuffle).
    0 disables; any positive int forces that width. Values are exact
    integer counts, so partitioning never changes the result.
    """
    df = fanout_scan(df, fanout)
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(
                    F.trim(
                        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
                    ),
                    " ",
                ),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    idx = F.pmod(_md5_head("fh1:", F.col("tok")), F.lit(dim))
    sign = F.when(
        F.pmod(_md5_head("fh2:", F.col("tok")), F.lit(2)) == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    cells = (
        toks.groupBy(id_col, idx.alias("i"))
        .agg(F.sum(sign).alias("c"))
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("i").cast("int"), F.col("c")))
            ).alias("m")
        )
    )
    # A doc with zero alphanumeric tokens produces no explode rows and
    # would vanish here; every input doc must yield a row (zero vector),
    # or downstream SemDeDup/ANN compositions silently lose docs (ADVICE
    # r3). Left-join back onto the id spine; a null map densifies to the
    # zero vector via the per-element coalesce below.
    cells = df.select(F.col(id_col)).join(cells, id_col, "left")
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0)).cast(
            "double"
        ),
    )
    if not normalize:
        return cells.select(F.col(id_col), dense.alias("vector"))
    # integer counts -> exact squared norm -> one portable double divide
    norm = F.sqrt(
        F.aggregate(dense, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    unit = F.transform(
        dense, lambda v: F.round(F.try_divide(v, norm), 6)
    )
    return cells.select(
        F.col(id_col),
        F.when(norm > 0, unit).otherwise(dense).alias("vector"),
    )


def text_clusters(
    df: DataFrame,
    seed_ids: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Seeded text clustering over feature-hashed unit vectors — the
    corpus data-map step (cluster-balanced sampling, topic-sliced audits;
    the assignment pass of spherical k-means with deterministic seeds,
    cf. SemDeDup's cell step but over TEXT features, no embedding model
    needed). Each doc goes to the seed with max cosine (ties -> lowest
    seed id). Returns (id, cluster, cosine).

    The k seed vectors ride as literals (a k x dim driver fetch, the
    documented IVF/coreset pattern); assignment is then a pure per-row
    expression over ONE scan of the hashed vectors — no join, no
    shuffle beyond feature_hash_vectors' own token groupBy. Zero-token
    docs (zero vectors) get cosine -2.0 and land in the first seed
    cluster deterministically."""
    if not seed_ids:
        raise ValueError("seed_ids must not be empty")
    vecs = feature_hash_vectors(
        df, id_col=id_col, text_col=text_col, dim=dim, normalize=True
    )
    seed_rows = {
        r[id_col]: list(r["vector"])
        for r in vecs.where(F.col(id_col).isin(*seed_ids)).collect()
    }
    missing = [s for s in seed_ids if s not in seed_rows]
    if missing:
        raise ValueError(f"seed ids not found in corpus: {missing}")

    def cos_lit(sv: list) -> "F.Column":
        lit = F.array(*[F.lit(float(x)) for x in sv])
        dot = F.aggregate(
            F.zip_with(F.col("vector"), lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        na = F.sqrt(
            F.aggregate(F.col("vector"), F.lit(0.0), lambda a, v: a + v * v)
        )
        nb = F.sqrt(F.aggregate(lit, F.lit(0.0), lambda a, v: a + v * v))
        return F.coalesce(F.round(F.try_divide(dot, na * nb), 4), F.lit(-2.0))

    scored = F.array(
        *[
            F.struct(
                cos_lit(seed_rows[s]).alias("c"),
                F.lit(-i).alias("negid"),
                F.lit(s).alias("cluster"),
            )
            for i, s in enumerate(sorted(seed_ids))
        ]
    )
    best = F.array_max(scored)
    return vecs.select(
        F.col(id_col),
        best.getField("cluster").alias("cluster"),
        best.getField("c").alias("cosine"),
    )
