"""Weighted PageRank over an edge DataFrame.

The crawl-frontier / domain-authority computation a web-scale pipeline
runs over its link graph (cf. Page et al. 1999; used for crawl
prioritization and domain-quality priors in corpus curation). Pure
DataFrame algebra — each iteration is ONE equi-join (ranks onto edge
sources) and ONE map-side-combined groupBy(dst); no driver-side graph,
no RDDs.

Shape at 100 TB:
- Per-iteration shuffle is bounded by |edges| on the join and
  |distinct dst| on the aggregate. Out-weights are computed once,
  joined into the edge list up front, and REUSED every iteration —
  only the rank vector (|nodes| rows, small relative to edges) moves
  per round.
- Hub skew (a node with millions of in-links) is absorbed by the
  partial aggregate: each map task pre-sums its contributions per dst.
- Lineage is truncated with localCheckpoint each iteration (same
  pattern as ops/dedup.connected_components) so the plan stays
  constant-size over any iteration count.
- Dangling mass (nodes with no out-edges) is redistributed uniformly,
  so total rank is conserved at 1 every iteration.

Float parity for the oracle gate: contributions and ranks are rounded
to 9 dp inside every iteration, keeping both engines in lockstep
regardless of per-partition summation order; callers round the final
rank for display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
    tol: float | None = None,
) -> DataFrame:
    """Iterate rank(n) = (1-d)/N + d * (in-contributions + dangling/N)
    from the uniform start 1/N, for `iterations` rounds — or, with
    `tol` set, until the L1 delta ||pr_t - pr_{t-1}||_1 <= tol, with
    `iterations` as the cap. The data flow stays driver-free (dangling
    mass is a 1-row broadcast dim fused into each round's job); the
    convergence CHECK is one scalar aggregate over the round's
    already-checkpointed |nodes|-row rank vector — a scan, never a
    recompute — which is the unavoidable driver decision any early-stop
    loop makes, paid once per round on the smallest frame in the job.

    Returns (node, pr) with pr rounded to 9 dp (the in-iteration
    precision). Edge weights default to 1 per edge; parallel edges are
    NOT collapsed (their weights add, matching a link-count graph).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if tol is not None and tol <= 0.0:
        raise ValueError(f"tol must be positive, got {tol}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")

    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("edges is empty — pagerank needs at least one edge")

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # fraction of src's rank each edge carries; fixed across iterations
    frac = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
        .localCheckpoint(eager=True)
    )
    has_out = out_w.select("src").withColumnRenamed("src", "node")

    ranks = nodes.withColumn("pr", F.lit(round(1.0 / n_nodes, 9)))

    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        # dangling mass as a 1-row broadcast dim, not a driver round-trip:
        # the aggregate fuses into the iteration's lazy plan, so each round
        # is one submitted job instead of two with a driver sync on the
        # critical path
        dangling = F.broadcast(
            ranks.join(has_out, "node", "left_anti").agg(
                F.coalesce(F.sum("pr"), F.lit(0.0)).alias("__mass")
            )
        )
        contribs = (
            frac.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("pr") * F.col("frac"), 9).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        ranks = (
            ranks.select("node", F.col("pr").alias("__prev"))
            .join(contribs, "node", "left")
            .crossJoin(dangling)
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("__mass") / F.lit(float(n_nodes))
                    ),
                    9,
                ).alias("pr"),
                "__prev",
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            delta = ranks.agg(
                F.sum(F.abs(F.col("pr") - F.col("__prev"))).alias("d")
            ).first()["d"]
            if delta <= tol:
                break
    return ranks.drop("__prev")


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    tol: float | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg JACM'99) — the link-graph
    companion to pagerank: authority(i) ~ sum of hub scores linking to i,
    hub(j) ~ sum of authority scores j links to, L1-normalized each half
    step. Crawl seeding uses hubs (good link pages); corpus quality
    priors use authorities.

    Same execution shape as pagerank: per half-iteration ONE edge
    equi-join + one map-side-combined aggregate; L1 norms fold in as
    1-row broadcast dims (no driver sync in the loop);
    localCheckpoint bounds plan growth. Float lockstep for the unrolled
    SQL oracle: summands are 9 dp, sums round at 9, normalized scores
    round at 9, display at 6.

    With `tol` set, the loop stops once the hub-vector L1 delta
    ||h_t - h_{t-1}||_1 <= tol (hub scores are the last half-step, so
    their delta bounds the iteration's movement), with `iterations` as
    the cap; the check is one scalar aggregate over the checkpointed
    |nodes|-row hub vector, same pattern as :func:`pagerank`.

    Returns (node, hub, authority), both rounded to 6 dp.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if tol is not None and tol <= 0.0:
        raise ValueError(f"tol must be positive, got {tol}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes.isEmpty():
        raise ValueError("edges is empty — hits needs at least one edge")

    hubs = nodes.withColumn("h", F.lit(1.0))
    auths = None
    for _ in range(iterations):
        a_raw = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.round(F.sum("h"), 9).alias("a_raw"))
        )
        a_full = nodes.join(a_raw, "node", "left").select(
            "node", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw")
        )
        a_norm = F.broadcast(a_full.agg(F.sum("a_raw").alias("__na")))
        auths = (
            a_full.crossJoin(a_norm)
            .select(
                "node",
                F.round(F.try_divide(F.col("a_raw"), F.col("__na")), 9).alias("a"),
            )
            .localCheckpoint(eager=True)
        )
        h_raw = (
            e.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.round(F.sum("a"), 9).alias("h_raw"))
        )
        h_full = (
            hubs.select("node", F.col("h").alias("__prev"))
            .join(h_raw, "node", "left")
            .select(
                "node",
                F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
                "__prev",
            )
        )
        h_norm = F.broadcast(h_full.agg(F.sum("h_raw").alias("__nh")))
        hubs = (
            h_full.crossJoin(h_norm)
            .select(
                "node",
                F.round(F.try_divide(F.col("h_raw"), F.col("__nh")), 9).alias("h"),
                "__prev",
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            delta = hubs.agg(
                F.sum(F.abs(F.col("h") - F.col("__prev"))).alias("d")
            ).first()["d"]
            if delta <= tol:
                break
    return (
        hubs.join(auths, "node")
        .select(
            "node",
            F.round("h", 6).alias("hub"),
            F.round("a", 6).alias("authority"),
        )
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient.

    Degree-oriented triangle enumeration (Suri & Vassilvitskii 2011,
    "Counting triangles and the curse of the last reducer"): every
    undirected edge is oriented from its lower-(degree, id) endpoint to the
    higher one, wedges are built only at each edge's SMALLER endpoint, and
    each triangle closes exactly once. At web scale this is the standard
    fix for the quadratic hub problem — a node with degree d contributes
    O(d_oriented^2) wedges where d_oriented is bounded by O(sqrt(m)) under
    this orientation, instead of d^2 at the hub. All joins are equi-joins
    on node keys; no cartesian anywhere.

    Input: directed (src, dst) edges; self-loops and duplicates dropped.
    Output: (node, deg, n_triangles, clustering) with the usual
    C(v) = 2T(v) / (deg(v) * (deg(v) - 1)).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
    )
    e1 = oriented.select(F.col("a"), F.col("b").alias("x"))
    e2 = oriented.select(F.col("a"), F.col("b").alias("y"))
    wedges = e1.join(e2, "a").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        und,
        (F.col("x") == F.col("u")) & (F.col("y") == F.col("v")),
    ).select("a", "x", "y")
    per_node = (
        closed.select(F.col("a").alias("n"))
        .unionAll(closed.select(F.col("x").alias("n")))
        .unionAll(closed.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return (
        deg.join(per_node, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("deg").cast("long").alias("deg"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                F.when(
                    F.col("deg") >= 2,
                    2.0
                    * F.coalesce(F.col("t"), F.lit(0))
                    / (F.col("deg") * (F.col("deg") - 1)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering"),
        )
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
    tol: float | None = None,
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004):
    PageRank with the teleport vector biased to a trusted seed set —
    trust flows out of seeds along links and decays with distance, so
    pages reachable only through spam neighborhoods score ~0. The
    crawl-quality prior a web-scale pipeline combines with PageRank to
    estimate spam mass (see :func:`spam_mass`).

    ``seeds``' first column names the trusted nodes (clipped to the
    graph's node set). Teleport d(n) = 1/|S| on seeds, 0 elsewhere;
    dangling mass is redistributed along d (the paper's variant), so
    total trust is conserved at 1 every iteration. Iteration structure,
    9 dp in-iteration rounding, localCheckpoint lineage truncation, and
    the optional ``tol`` early stop all mirror :func:`pagerank` — ONE
    edge join + ONE map-side-combined aggregate per round; the seed dim
    joins in once up front.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if tol is not None and tol <= 0.0:
        raise ValueError(f"tol must be positive, got {tol}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")

    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seed_nodes = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .join(nodes, "node")
        .localCheckpoint(eager=True)
    )
    s_count = seed_nodes.count()
    if s_count == 0:
        raise ValueError("no seed appears in the graph — trustrank needs >= 1")

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    frac = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
        .localCheckpoint(eager=True)
    )
    has_out = out_w.select("src").withColumnRenamed("src", "node")

    d0 = round(1.0 / s_count, 9)
    nodes_d = (
        nodes.join(seed_nodes.withColumn("__d", F.lit(d0)), "node", "left")
        .select("node", F.coalesce(F.col("__d"), F.lit(0.0)).alias("d"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes_d.select("node", "d", F.col("d").alias("tr"))

    for _ in range(iterations):
        dangling = F.broadcast(
            ranks.join(has_out, "node", "left_anti").agg(
                F.coalesce(F.sum("tr"), F.lit(0.0)).alias("__mass")
            )
        )
        contribs = (
            frac.join(
                ranks.select(F.col("node").alias("src"), "tr"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("tr") * F.col("frac"), 9).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        ranks = (
            ranks.select("node", "d", F.col("tr").alias("__prev"))
            .join(contribs, "node", "left")
            .crossJoin(dangling)
            .select(
                "node",
                "d",
                F.round(
                    F.lit(1.0 - damping) * F.col("d")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("__mass") * F.col("d")
                    ),
                    9,
                ).alias("tr"),
                "__prev",
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            delta = ranks.agg(
                F.sum(F.abs(F.col("tr") - F.col("__prev"))).alias("d2")
            ).first()["d2"]
            if delta <= tol:
                break
    return ranks.select("node", "tr")


def spam_mass(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
    threshold: float = 0.5,
) -> DataFrame:
    """Relative spam mass (Gyongyi, Berkhin, Garcia-Molina & Pedersen
    2006, "Link spam detection based on mass estimation"): the fraction
    of a node's PageRank NOT explained by trusted-seed flow,
    ``rel_mass = (pr - tr) / pr`` over the same graph, iterations, and
    damping. Both rank vectors sum to 1, so rel_mass ~ 1 flags nodes
    whose authority comes entirely from untrusted (spam-suspect)
    neighborhoods; ``spam_candidate`` applies ``threshold``.

    Output: (node, pr, tr, rel_mass, spam_candidate), ranks at display
    precision (6 dp) and the division evaluated ON the displayed values
    so two engines agree bit-for-bit.
    """
    # The two rank vectors are independent power iterations over the
    # same edges — run their driver loops CONCURRENTLY (guide §2.6:
    # actions are only sequential because the driver calls them
    # sequentially; each iteration's tiny jobs leave most executors
    # idle, so the second loop back-fills the first one's tail).
    # Results are unchanged: each loop's checkpoint lineage is its own.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        pr_f = pool.submit(
            pagerank,
            edges,
            src_col=src_col,
            dst_col=dst_col,
            weight_col=weight_col,
            iterations=iterations,
            damping=damping,
        )
        tr_f = pool.submit(
            trustrank,
            edges,
            seeds,
            src_col=src_col,
            dst_col=dst_col,
            weight_col=weight_col,
            iterations=iterations,
            damping=damping,
        )
        pr = pr_f.result()
        tr = tr_f.result()
    pr6 = F.round(F.col("pr"), 6)
    tr6 = F.round(F.col("tr"), 6)
    rel = F.round((pr6 - tr6) / pr6, 6)
    return (
        pr.join(tr, "node")
        .select(
            "node",
            pr6.alias("pr"),
            tr6.alias("tr"),
            rel.alias("rel_mass"),
            (rel > F.lit(threshold)).alias("spam_candidate"),
        )
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 4,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan, Albert &
    Kumara 2007, "Near linear time algorithm to detect community
    structures") — the community sibling of connected_components: CC
    answers "reachable at all" (one bridge edge merges two host
    clusters), LPA answers "densely knit" (a single bridge between two
    tight communities loses the vote), which is what mirror-farm /
    link-ring grouping over the domain graph actually wants.

    The paper breaks vote ties randomly and updates asynchronously;
    both are non-reproducible, so this is the SYNCHRONOUS variant with
    the house election: every node starts as its own label, each round
    every node adopts the (count DESC, label ASC)-winning label among
    its neighbours PLUS itself (the self-vote is the standard
    oscillation damper for synchronous LPA on bipartite-ish stars), and
    a fixed iteration count makes the output a pure function of the
    graph. Labels are node ids, so ordering is engine-portable string
    order.

    Shape at 100 TB: the edge list is symmetrized once and reused; each
    round is one equi-join (labels onto neighbour endpoints), one
    map-side-combined groupBy(node, label), and the two-stage
    max-count/min-label election — every shuffle keyed by node, no
    windows, no driver-side graph; lineage truncated per round with
    localCheckpoint (the pagerank discipline).

    Returns (node, community).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")

    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(
            edges.select(
                F.col(dst_col).alias("a"), F.col(src_col).alias("b")
            )
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        neigh = e.join(
            labels.select(
                F.col("node").alias("b"), F.col("label")
            ),
            "b",
        ).select(F.col("a").alias("node"), "label")
        votes = neigh.union(labels.select("node", "label"))
        counts = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        mx = counts.groupBy("node").agg(F.max("c").alias("mc"))
        labels = (
            counts.join(mx, "node")
            .where(F.col("c") == F.col("mc"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("label").alias("community"))


def salsa_authorities(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """SALSA authority scores in CLOSED FORM (Lempel & Moran WWW 2000
    "SALSA: the stochastic approach for link-structure analysis"; the
    TKDE 2001 journal version proves the stationary distribution):
    unlike HITS, the SALSA authority chain's stationary weights need no
    power iteration — within each connected component C of the
    co-citation (authority-side) graph,

        a(i) = (|C| / |A|) * (d_in(i) / sum_{j in C} d_in(j)),

    i.e. component mass proportional to component size, split
    degree-proportionally inside. Najork (SIGIR 2007) found this beats
    HITS as a ranking feature; it is also immune to HITS's tightly-knit
    community (TKC) drift, which is precisely the link-spam failure
    mode on crawl graphs.

    Shape at 100 TB: co-citation connectivity is built as HUB-STAR
    edges (per hub: min-authority anchor -> authority; LINEAR in
    |edges|, never the quadratic per-hub co-citation expansion) and
    resolved by the certified pointer-jumping connected_components;
    degrees and component sums are map-side-combined groupBys; the
    authority-count scalar rides a 1-row broadcast dim. Scores are
    exact integer micro-units ((n_c * d_in * 1e6) div (n_total * D_c),
    truncating — both engines agree bit-for-bit); the products fit
    BIGINT for per-component degree sums < ~9e12 given micro rendering
    — past that, render in DOUBLE (same partition/degree inputs).

    Returns (node, d_in, component, n_c, salsa).
    """
    from reader_spark.ops.dedup import connected_components

    e = edges.select(
        F.col(src_col).alias("h"), F.col(dst_col).alias("a")
    ).distinct()
    din = e.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("d_in"))

    anchors = e.groupBy("h").agg(F.min("a").alias("anchor"))
    star = (
        e.join(anchors, "h")
        .where(F.col("a") != F.col("anchor"))
        .select(F.col("anchor").alias("doc_a"), F.col("a").alias("doc_b"))
        .distinct()
    )
    comps = connected_components(star)
    labeled = din.join(
        comps.select(F.col("doc").alias("a"), "component"), "a", "left"
    ).select(
        "a",
        "d_in",
        F.coalesce(F.col("component"), F.col("a")).alias("component"),
    )
    cstats = labeled.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        F.sum("d_in").cast("long").alias("d_c"),
    )
    total = labeled.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        labeled.join(cstats, "component")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("a").alias("node"),
            "d_in",
            "component",
            "n_c",
            (
                F.expr("(n_c * d_in * 1000000) div (n_total * d_c)")
                / F.lit(1e6)
            ).alias("salsa"),
        )
    )
