"""Public-suffix-list registrable-domain extraction (eTLD+1) — the
host-grouping primitive every per-"domain" statistic in a web pipeline
actually needs: grouping by raw host splits one site into thousands of
subdomains (user123.github.io), grouping by last-two-labels merges
unrelated sites (everything under co.uk). The PSL algorithm
(publicsuffix.org/list/; Mozilla's rules, used by every browser cookie
jar and by Common Crawl's host->PLD rollups) resolves both: the public
suffix is the LONGEST matching rule, wildcard rules (*.ck) match one
extra label, exception rules (!www.ck) override their wildcard, and the
registrable domain (aka PLD / eTLD+1) is the suffix plus one label.

Spark-first shape: the rule list is a tiny broadcast dim; each host
explodes into its <= max_labels trailing suffixes (substring_index —
no Python), candidates equi-join the rule dim under the three match
forms, and a packed-long election picks (exception beats all, then most
labels). One bounded explode + one broadcast join + one groupBy(host):
scan-bound at any corpus size. The production deployment swaps
MINI_PSL for the full ~9k-rule list — same dim-join plan.

The reference resolves hosts with WHATWG URL semantics only
(url-helpers.ts strict-host is_same_domain); this op is the corpus-
analytics layer above it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (rule, kind): kind 0 = exact, 1 = wildcard base (the '*.' stripped),
# 2 = exception (the '!' stripped). A representative slice of the real
# list: multi-label ccTLD suffixes, a wildcard TLD with its exception,
# and a private-section entry (github.io).
MINI_PSL: tuple[tuple[str, int], ...] = (
    ("com", 0),
    ("org", 0),
    ("net", 0),
    ("edu", 0),
    ("gov", 0),
    ("info", 0),
    ("io", 0),
    ("de", 0),
    ("fr", 0),
    ("us", 0),
    ("br", 0),
    ("com.br", 0),
    ("jp", 0),
    ("co.jp", 0),
    ("ne.jp", 0),
    ("uk", 0),
    ("co.uk", 0),
    ("org.uk", 0),
    ("ac.uk", 0),
    ("au", 0),
    ("com.au", 0),
    ("gov.au", 0),
    ("ck", 1),  # *.ck — every third-level zone is public
    ("www.ck", 2),  # !www.ck — except www.ck itself
    ("github.io", 0),  # private-section entry
)
MAX_LABELS = 8


def registrable_domain(
    df: DataFrame,
    host_col: str = "host",
    rules: tuple[tuple[str, int], ...] = MINI_PSL,
) -> DataFrame:
    """Append (public_suffix, registrable_domain) to each row.

    Unmatched hosts fall back to the PSL default rule '*' (public
    suffix = last label). A host that IS a public suffix (e.g. co.uk)
    has no registrable domain -> NULL; an exception-rule host (www.ck
    under !www.ck) is its OWN registrable domain per the spec.
    Empty/NULL hosts yield NULL/NULL.
    """
    host = F.lower(F.col(host_col))
    n = F.size(F.split(host, "\\."))

    if len(rules) <= 256:
        # Expression-sized rule lists ride the plan as literal arrays
        # and the whole op becomes ONE scan-local projection: per host,
        # a within-row fold over its <= MAX_LABELS trailing suffixes
        # computes the same packed (exception, labels) election the
        # dim-join form aggregated (max over candidates; unmatched ->
        # default rule '*'). Zero shuffles, zero joins — the dim-join
        # chain cost ~6 broadcast/aggregate stages for a per-row pure
        # function (measured 4.6 s -> <1 s at sf0.1). Rule lists past
        # expression size (the full ~9k PSL) keep the broadcast-dim
        # join below.
        exact_arr = F.array(
            *[F.lit(r) for r, k in rules if k == 0]
        ) if any(k == 0 for _, k in rules) else F.array().cast("array<string>")
        wild_arr = F.array(
            *[F.lit(r) for r, k in rules if k == 1]
        ) if any(k == 1 for _, k in rules) else F.array().cast("array<string>")
        exc_arr = F.array(
            *[F.lit(r) for r, k in rules if k == 2]
        ) if any(k == 2 for _, k in rules) else F.array().cast("array<string>")

        h = F.col("__h")

        def packed(i):
            sfx = F.expr(f"substring_index(__h, '.', -{i})")
            par = (
                F.expr(f"substring_index(__h, '.', -({i} - 1))")
                if i > 1
                else F.lit(None).cast("string")
            )
            cands = [
                F.when(F.array_contains(exact_arr, sfx), F.lit(i)),
                F.when(F.array_contains(wild_arr, par), F.lit(i)),
                F.when(
                    F.array_contains(exc_arr, sfx), F.lit(1000 + (i - 1))
                ),
            ]
            return F.when(
                F.lit(i) <= F.least(F.col("__n"), F.lit(MAX_LABELS)),
                F.greatest(*cands),
            )

        best = F.greatest(
            *[packed(i) for i in range(1, MAX_LABELS + 1)]
        )
        out = (
            df.withColumn("__h", host)
            .withColumn("__n", n)
            .withColumn(
                "__ps",
                F.when(
                    h.isNull() | (h == ""), F.lit(None).cast("int")
                ).otherwise(
                    F.coalesce(F.pmod(best, F.lit(1000)), F.lit(1))
                ),
            )
        )
        ps = F.expr("substring_index(__h, '.', -__ps)")
        reg = F.when(
            F.col("__n") >= F.col("__ps") + 1,
            F.expr("substring_index(__h, '.', -(__ps + 1))"),
        )
        return out.select(
            *[c for c in df.columns],
            F.when(F.col("__ps").isNotNull(), ps).alias("public_suffix"),
            F.when(F.col("__ps").isNotNull(), reg).alias(
                "registrable_domain"
            ),
        )

    spark = df.sparkSession
    rules_df = spark.createDataFrame(
        list(rules), "rule string, kind int"
    )

    base = df.withColumn("__h", host).withColumn("__n", n)

    cand = base.select(
        "*",
        F.explode(
            F.sequence(F.lit(1), F.least(F.col("__n"), F.lit(MAX_LABELS)))
        ).alias("__i"),
    ).withColumn("__sfx", F.expr("substring_index(__h, '.', -__i)"))
    # wildcard rules match when the candidate MINUS its first label
    # equals the rule base (the '*' consumes that first label); a
    # 1-label candidate has no parent.
    cand = cand.withColumn(
        "__par",
        F.when(
            F.col("__i") > 1,
            F.expr("substring_index(__h, '.', -(__i - 1))"),
        ),
    )

    r = F.broadcast(rules_df)
    exact = cand.join(
        r.where(F.col("kind") == 0).select(F.col("rule").alias("__sfx")),
        "__sfx",
    ).select("__h", F.col("__i").alias("__ps"), F.lit(0).alias("__exc"))
    wild = cand.join(
        r.where(F.col("kind") == 1).select(F.col("rule").alias("__par")),
        "__par",
    ).select("__h", F.col("__i").alias("__ps"), F.lit(0).alias("__exc"))
    exc = cand.join(
        r.where(F.col("kind") == 2).select(F.col("rule").alias("__sfx")),
        "__sfx",
    ).select(
        "__h", (F.col("__i") - 1).alias("__ps"), F.lit(1).alias("__exc")
    )

    # election: exception rules take precedence, then the longest match
    # (packed long: exc * 1000 + labels); ties impossible (one rule per
    # (host, length, kind) by construction).
    matched = (
        exact.union(wild)
        .union(exc)
        .groupBy("__h")
        .agg(
            F.max(
                F.col("__exc").cast("long") * 1000 + F.col("__ps")
            ).alias("__m")
        )
        .select("__h", F.pmod(F.col("__m"), F.lit(1000)).alias("__ps"))
    )

    out = base.join(matched, "__h", "left").withColumn(
        "__ps",
        # default rule '*': unmatched host's public suffix = last label
        F.when(F.col("__h").isNull() | (F.col("__h") == ""), F.lit(None))
        .otherwise(F.coalesce(F.col("__ps"), F.lit(1))),
    )
    ps = F.expr("substring_index(__h, '.', -__ps)")
    reg = F.when(
        F.col("__n") >= F.col("__ps") + 1,
        F.expr("substring_index(__h, '.', -(__ps + 1))"),
    )
    return out.select(
        *[c for c in df.columns],
        F.when(F.col("__ps").isNotNull(), ps).alias("public_suffix"),
        F.when(F.col("__ps").isNotNull(), reg).alias("registrable_domain"),
    )
