"""Whole-graph structural statistics: rich-club coefficients and a
power-law exponent estimate for the degree distribution.

Both are single-pass descriptive aggregates a link-graph operator runs
before committing to algorithm constants (salting thresholds, hub
cutoffs): the rich-club curve says whether high-degree pages
preferentially interlink (hub-core topology ⇒ salt the core), and the
power-law alpha calibrates how heavy the tail actually is (the
north_rule's "degree-aware" partitioning needs the exponent, not a
guess). Complements g_assortativity (global degree correlation) and
g_degree_hist (raw distribution) on the contract board.

Scale: rich_club is two hash aggregates plus one edge→degree join per
endpoint (degree table is vertex-shaped; thresholds ride along as a
broadcast literal array — no per-k re-scan of the edge set).
powerlaw_alpha is one degree aggregate plus one scalar aggregate. No
driver-side iteration anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, symmetrize


def rich_club(
    g: EncodedGraph, thresholds: list[int]
) -> DataFrame:
    """Rich-club coefficient phi(k) for each degree threshold k (Zhou &
    Mondragon 2004): with N_k = vertices of undirected degree > k and
    E_k = undirected edges whose BOTH endpoints have degree > k,
    phi(k) = 2*E_k / (N_k*(N_k-1)) — the edge density of the subgraph
    induced by the rich vertices. NULL when fewer than two rich vertices
    (density undefined).

    Returns (k, n_rich, e_rich, phi) — one row per threshold.

    Physical plan: degree agg over the symmetrized edge set (map-side
    combine absorbs hubs), one unique-edge (src<dst) projection joined to
    the degree table on each endpoint, then each side is aggregated once
    per threshold via an exploded broadcast literal array — the edge set
    is scanned once, not once per k.
    """
    if not thresholds:
        raise ValueError("rich_club: need at least one threshold")
    sym = symmetrize(g.edges)
    deg = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("deg")
    )
    ks = F.explode(
        F.array(*[F.lit(int(k)) for k in sorted(set(thresholds))])
    ).alias("k")

    n_rich = (
        deg.select("deg", ks)
        .filter(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_rich"))
    )

    uniq = sym.filter(F.col("src") < F.col("dst"))
    edge_min_deg = (
        uniq.join(deg.withColumnRenamed("vid", "src").withColumnRenamed("deg", "ds"), "src")
        .join(deg.withColumnRenamed("vid", "dst").withColumnRenamed("deg", "dd"), "dst")
        .select(F.least("ds", "dd").alias("min_deg"))
    )
    e_rich = (
        edge_min_deg.select("min_deg", ks)
        .filter(F.col("min_deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").alias("e_rich"))
    )

    base = deg.sparkSession.createDataFrame(
        [(int(k),) for k in sorted(set(thresholds))], "k int"
    )
    return (
        base.join(n_rich, "k", "left")
        .join(e_rich, "k", "left")
        .select(
            "k",
            F.coalesce("n_rich", F.lit(0)).alias("n_rich"),
            F.coalesce("e_rich", F.lit(0)).alias("e_rich"),
            F.when(
                F.coalesce("n_rich", F.lit(0)) >= 2,
                2.0
                * F.coalesce("e_rich", F.lit(0))
                / (F.col("n_rich") * (F.col("n_rich") - 1)),
            ).alias("phi"),
        )
    )


def powerlaw_alpha(g: EncodedGraph, d_min: int = 2) -> DataFrame:
    """Continuous-approximation Hill/MLE estimate of the power-law
    exponent of the IN-degree distribution (Clauset–Shalizi–Newman 2009,
    eq. 3.7 discrete approximation):

        alpha = 1 + n / sum_i ln(d_i / (d_min - 0.5))

    over the tail d_i >= d_min. Returns a single row
    (d_min, n_tail, alpha) — alpha NULL when the tail is empty or the
    log-sum is zero (degenerate tail of all-d_min... impossible with the
    -0.5 shift, kept for belt-and-braces).

    In-degree (not undirected) because the web-graph power law of record
    is the in-link distribution; pass a pre-symmetrized graph for the
    undirected variant.
    """
    if d_min < 1:
        raise ValueError("powerlaw_alpha: d_min must be >= 1")
    indeg = g.edges.groupBy(F.col("dst").alias("vid")).agg(
        F.count("*").alias("deg")
    )
    tail = indeg.filter(F.col("deg") >= d_min)
    return tail.agg(
        F.lit(int(d_min)).alias("d_min"),
        F.count("*").alias("n_tail"),
        (
            1.0
            + F.count("*")
            / F.sum(F.log(F.col("deg") / (F.lit(float(d_min)) - 0.5)))
        ).alias("alpha"),
    )


def knn_curve(g: EncodedGraph) -> DataFrame:
    """Average-nearest-neighbor-degree curve knn(k) (Pastor-Satorras,
    Vazquez & Vespignani 2001) — the standard degree-correlation profile
    behind the single assortativity scalar: for each undirected degree k,
    the mean degree of the neighbors of degree-k vertices,

        knn(k) = ( sum_{v: deg(v)=k} sum_{u in N(v)} deg(u) )
               / ( sum_{v: deg(v)=k} deg(v) )

    (edge-weighted form: one exact integer/integer division per k, so the
    micro-unit rounding is engine-portable — no average-of-averages
    double rounding). Returns (k, n_vertices, knn_e6), one row per
    occupied degree.

    Physical plan: degree agg over the symmetrized edges, one
    edge⋈degree equi-join on the neighbor endpoint with a map-side
    combining SUM per vertex, then one final hash agg keyed on k — the
    edge set is scanned twice total, no window, no driver loop. Hub skew
    lands on the per-vertex SUM, which partial aggregation absorbs
    exactly like the degree agg itself.
    """
    sym = symmetrize(g.edges)
    deg = sym.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    nbr_sum = (
        sym.join(
            deg.select(F.col("vid").alias("dst"), F.col("deg").alias("nbr_deg")),
            "dst",
        )
        .groupBy(F.col("src").alias("vid"))
        .agg(F.sum("nbr_deg").alias("s"))
    )
    return (
        deg.join(nbr_sum, "vid")
        .groupBy(F.col("deg").alias("k"))
        .agg(
            F.count("*").alias("n_vertices"),
            F.round(F.lit(1e6) * F.sum("s") / F.sum("deg"))
            .cast("long")
            .alias("knn_e6"),
        )
    )


def graph_profile(edges: DataFrame) -> DataFrame:
    """One-row graph dashboard — the profile a link-graph operator reads
    before choosing algorithm constants: vertex/edge counts, self-loops,
    reciprocity, density, degree extremes, dangling count. Complements
    the dedicated rows (assortativity, power-law alpha, rich club) with
    the cheap one-pass scalars.

    Scale shape: every number is a scalar aggregate over the edge table
    (count/max/anti-join count); the driver holds nine integers. The
    reciprocity numerator is an edge-keyed self-join on the reversed
    pair — an equi-join, not a cartesian."""
    F_ = F
    e = edges.select("src", "dst").distinct().persist()
    nl = e.filter(F_.col("src") != F_.col("dst"))
    n_edges = e.count()
    n_loops = e.count() - nl.count()
    verts = (
        e.select(F_.col("src").alias("vid"))
        .unionByName(e.select(F_.col("dst").alias("vid")))
        .distinct()
        .persist()
    )
    n_verts = verts.count()
    rev = nl.select(F_.col("dst").alias("src"), F_.col("src").alias("dst"))
    n_recip = nl.join(rev, ["src", "dst"], "left_semi").count()
    n_nl = n_edges - n_loops
    max_out = e.groupBy("src").count().agg(F_.max("count")).collect()[0][0]
    max_in = e.groupBy("dst").count().agg(F_.max("count")).collect()[0][0]
    dangling = verts.join(
        e.select("src").distinct().withColumnRenamed("src", "vid"),
        "vid",
        "left_anti",
    ).count()
    e.unpersist()
    verts.unpersist()
    row = (
        int(n_verts),
        int(n_edges),
        int(n_loops),
        int(n_recip),
        int(round(n_recip * 1e6 / n_nl)) if n_nl else None,
        int(round(n_edges * 1e6 / (n_verts * (n_verts - 1))))
        if n_verts > 1
        else None,
        int(max_out),
        int(max_in),
        int(dangling),
    )
    return edges.sparkSession.createDataFrame(
        [row],
        "n_vertices long, n_edges long, self_loops long, "
        "reciprocal_edges long, reciprocity_e6 long, density_e6 long, "
        "max_out_degree long, max_in_degree long, dangling long",
    )
