"""Triangle counting — two sort-merge equi-joins over oriented edges (J7).

Standard algorithm: orient the undirected edge set by vertex id (keep only
src < dst, so every triangle {a<b<c} appears exactly once as the wedge
a->b, b->c closed by a->c). Self-loops vanish under orientation, matching
the fixture oracle (FIXTURES.md: "self-edge ... triangle count unaffected").

    wedges   = oriented e1 ⋈ e2 ON e1.dst = e2.src
    closed   = wedges LEFT SEMI JOIN oriented ON (e1.src, e2.dst)
    triangles(total)     = count(closed)
    triangles(per-vertex)= closed exploded to its 3 corners, groupBy(vid)

Scale notes: orientation halves the edge set and bounds the wedge join by
sum(min(deg...)); Catalyst picks SMJ on the vid keys, AQE splits skewed
wedge partitions. Degree-ordered orientation (orient by (degree, vid)
instead of vid) cuts wedge counts on power-law graphs by orders of
magnitude and still enumerates every triangle exactly once WITH all three
corner vids intact — so both the total count and per-vertex attribution
use it (a hub's wedges are enumerated from its low-degree neighbors, never
quadratically from the hub itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, symmetrize, truncate_lineage


def _oriented(g: EncodedGraph, degree_ordered: bool) -> DataFrame:
    sym = symmetrize(g.edges)  # canonical undirected, no self-loops
    und = sym.filter(F.col("src") < F.col("dst"))
    if not degree_ordered:
        return und
    # orient low-degree -> high-degree (ties by vid): classic wedge bound.
    # Degrees derive from the SAME sym subtree as `und` (round 6): the two
    # symmetrize calls were structurally identical, but each carried its
    # own scan + union + distinct — one shared subtree lets Catalyst reuse
    # the exchange instead of deduplicating the edge set twice per build.
    deg = sym.groupBy("src").count().select(
        F.col("src").alias("vid"), F.col("count").alias("deg")
    )
    e = (
        und.join(deg.withColumnRenamed("vid", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("vid", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    )
    keep = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def triangle_count(g: EncodedGraph, degree_ordered: bool = True) -> int:
    """Total number of distinct triangles in the undirected graph.

    Counted as Σ_{(a,b) oriented} |N⁺(a) ∩ N⁺(b)| over per-vertex
    oriented-out-neighbor arrays: the same triangle set the wedge join
    enumerates, but the quadratic wedge table is never materialized or
    shuffled — the intersection runs row-locally inside codegen after two
    edge⋈adjacency joins (on a dense graph the wedge form shuffled
    O(Σ deg²) rows to then discard most of them in the closing semi-join).
    Degree-ordered orientation bounds every array by the classic
    O(sqrt(E)) wedge argument, so rows stay small on power-law graphs."""
    e = _oriented(g, degree_ordered).persist()
    adj = e.groupBy(F.col("src").alias("vid")).agg(
        F.collect_list("dst").alias("nbrs")
    )
    pairs = e.join(
        adj.select(F.col("vid").alias("src"), F.col("nbrs").alias("na")), "src"
    ).join(adj.select(F.col("vid").alias("dst"), F.col("nbrs").alias("nb")), "dst")
    row = pairs.agg(
        F.sum(F.size(F.array_intersect("na", "nb"))).alias("t")
    ).collect()[0]
    e.unpersist()
    return int(row["t"] or 0)


def triangle_count_per_vertex(g: EncodedGraph, degree_ordered: bool = True) -> DataFrame:
    """(vid, triangles) — each triangle credited to all three corners.

    Uses degree-ordered orientation by default: the oriented triangle set
    is identical to the plain-vid one (each undirected triangle appears
    exactly once), only the (a, b, c) role assignment differs — and the
    corners union below is role-agnostic, so attribution is unchanged
    while hub-wedge blowup is avoided (see module docstring)."""
    e = _oriented(g, degree_ordered).persist()
    # neighbor-array intersection (see triangle_count): each oriented
    # triangle {base (a,b), apex c ∈ N⁺(a)∩N⁺(b)} enumerates exactly once
    # with all three corners intact — no wedge table is materialized
    adj = e.groupBy(F.col("src").alias("vid")).agg(
        F.collect_list("dst").alias("nbrs")
    )
    closed = (
        e.join(adj.select(F.col("vid").alias("src"), F.col("nbrs").alias("na")), "src")
        .join(adj.select(F.col("vid").alias("dst"), F.col("nbrs").alias("nb")), "dst")
        .select(
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.explode(F.array_intersect("na", "nb")).alias("c"),
        )
    )
    corners = (
        closed.select(F.col("a").alias("vid"))
        .unionAll(closed.select(F.col("b").alias("vid")))
        .unionAll(closed.select(F.col("c").alias("vid")))
    )
    counts = corners.groupBy("vid").agg(F.count("*").alias("triangles"))
    return g.vertices.select("vid").join(counts, "vid", "left").select(
        "vid", F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles")
    )


def clustering_coefficient(g: EncodedGraph) -> DataFrame:
    """(vid, deg, triangles, lcc_e6) — local clustering coefficient in
    exact micro-units: lcc_e6 = (2,000,000 * T(v)) DIV (deg * (deg - 1)),
    0 for deg < 2. The README's link-analysis surface stops at degree
    top-k (README.md:107-112); local clustering is its standard
    densification companion (triangles / possible wedges per vertex).

    Integer arithmetic end to end (no float division), so the DuckDB
    oracle reproduces every value exactly. deg and T(v) are both <= n, so
    2e6 * T fits comfortably in int64 below ~4.6e12 triangles per vertex.

    Scale: one degree aggregation over the symmetrized edge set plus the
    degree-ordered triangle attribution already bounded by
    sum(min-degree) wedges — no new join shapes beyond J7.
    """
    deg = (
        symmetrize(g.edges)
        .groupBy("src")
        .agg(F.count("*").alias("deg"))
        .select(F.col("src").alias("vid"), "deg")
    )
    tri = triangle_count_per_vertex(g)
    return (
        tri.join(deg, "vid", "left")
        .select(
            "vid",
            F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"),
            F.col("triangles").cast("long").alias("triangles"),
        )
        .withColumn(
            "lcc_e6",
            F.when(
                F.col("deg") >= 2,
                F.expr("(2000000 * triangles) DIV (deg * (deg - 1))"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def link_prediction(
    g: EncodedGraph,
    top_k: int = 50,
    max_degree: int | None = None,
) -> DataFrame:
    """Neighborhood-overlap link prediction over the undirected graph:
    for every non-adjacent pair {a, b} sharing >= 1 common neighbor,
    (a, b, common_neighbors, ra_e6, jaccard_e6, adamic_adar_e6), top_k
    pairs by (common_neighbors, ra_e6, a, b) descending. The three
    classic indices in one pass: common-neighbor count, Resource
    Allocation (Zhou et al. 2009: sum over shared z of 1/deg(z)), Jaccard
    of neighborhoods, and Adamic-Adar (sum of 1/ln deg(z)). The crawl
    analog of "pages that should link but don't" — the ranking signal the
    reference's in-degree table (README.md:107-112) can't express because
    it needs the wedge join, not a degree scan.

    Determinism/oracle: ranking uses ONLY integer-exact columns — cn is a
    count, ra_e6 sums per-center integer terms 1000000 DIV deg(z), and
    the (a, b) tail makes the sort key unique — so the selected set is
    bit-identical across engines. adamic_adar_e6 is the lone float column
    (ln), rounded to micro-units like every *_e6 float in the repo.

    Scale: the wedge generation is sum(deg(z)^2) over centers — the hub
    blowup triangle counting avoids via orientation is inherent here
    (both endpoints of a candidate pair are needed). `max_degree` caps
    the center degree, the standard mitigation (a 10^6-degree hub's
    common-neighbor evidence is saturated long before 10^12 wedges);
    None enumerates exactly. One wedge self-join -> one (a,b) hash
    aggregate (map-side combine collapses repeated pairs) -> one
    anti-join against the edge set -> two broadcast-size degree joins ->
    global top-k via TakeOrderedAndProject.
    """
    plan, sym = _link_prediction_plan(g, top_k, max_degree)
    # <= top_k rows — materialize, then free the symmetrized cache
    # (the modularity release pattern; never leak a per-call persist)
    out = plan.transform(truncate_lineage)
    sym.unpersist()
    return out


def _link_prediction_plan(
    g: EncodedGraph,
    top_k: int,
    max_degree: int | None,
) -> tuple[DataFrame, DataFrame]:
    """The lazy top-k plan plus the symmetrized cache it reads — split
    out so tests can pin the plan shape (TakeOrderedAndProject) before
    the public wrapper materializes it."""
    sym = symmetrize(g.edges).persist()
    deg = sym.groupBy("src").agg(F.count("*").alias("deg")).select(
        F.col("src").alias("vid"), "deg"
    )
    # centers: (z, nbr, deg(z)) — one row per directed edge, deg of the CENTER
    centers = sym.join(deg, sym["src"] == deg["vid"]).select(
        F.col("src").alias("z"), F.col("dst").alias("nbr"), F.col("deg").alias("zdeg")
    )
    if max_degree is not None:
        centers = centers.filter(F.col("zdeg") <= max_degree)
    n1 = centers.select("z", F.col("nbr").alias("a"), "zdeg")
    n2 = centers.select("z", F.col("nbr").alias("b"))
    wedges = n1.join(n2, "z").filter(F.col("a") < F.col("b"))
    cand = wedges.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("common_neighbors"),
        F.sum(F.expr("1000000 DIV zdeg")).cast("long").alias("ra_e6"),
        F.sum(1.0 / F.log(F.col("zdeg"))).alias("_aa"),
    )
    und = sym.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    nonedges = cand.join(und, ["a", "b"], "left_anti")
    da = deg.select(F.col("vid").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("vid").alias("b"), F.col("deg").alias("db"))
    out = (
        nonedges.join(da, "a").join(db, "b")
        .select(
            "a", "b", "common_neighbors", "ra_e6",
            F.expr(
                "1000000 * common_neighbors DIV (da + db - common_neighbors)"
            ).cast("long").alias("jaccard_e6"),
            F.round(F.col("_aa") * 1e6).cast("long").alias("adamic_adar_e6"),
        )
        .orderBy(
            F.desc("common_neighbors"), F.desc("ra_e6"), F.asc("a"), F.asc("b")
        )
        .limit(top_k)
    )
    return out, sym


def k_truss(
    g: EncodedGraph,
    k: int,
    rounds: int | None = None,
    max_iter: int = 64,
) -> DataFrame:
    """k-truss decomposition: the maximal subgraph whose every edge lies
    on >= k-2 triangles WITHIN the subgraph — the standard edge-level
    density backbone one notch above k_core's vertex criterion (every
    k-truss is inside the (k-1)-core, not vice versa). Returns the
    surviving undirected edges (a, b, support) with a < b and `support`
    the triangle count that justified survival in the final round.

    `rounds=None` peels to the fixpoint (raises past `max_iter`, never a
    silent superset — the k_core no-silent-caps rule); an explicit
    `rounds` runs exactly that many support/prune rounds (oracle mode:
    the unrolled-SQL oracle mirrors round-for-round).

    Scale per round: one oriented wedge self-join bounded like J7, one
    left-semi close, one explode of each triangle to its 3 edges, one
    (a, b) hash aggregate, one anti/semi prune — all shapes already in
    triangle_count; per-round localCheckpoint truncates the iterative
    lineage (SURVEY §4 item 3). Rounds are O(max support) in the worst
    case but converge in a handful on web graphs.
    """
    if k < 2:
        raise ValueError(f"k_truss: k must be >= 2, got {k}")
    need = k - 2
    e = (
        symmetrize(g.edges)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .transform(truncate_lineage)
    )
    it = 0
    n_prev = None  # carried from the previous round's kept-count (round 6)
    while True:
        if rounds is not None and it >= rounds:
            break
        if rounds is None and it >= max_iter:
            raise RuntimeError(
                f"k_truss(k={k}): no fixpoint after max_iter={max_iter} "
                "rounds; raise max_iter — a capped result is a superset "
                "of the true truss, never returned silently"
            )
        # support(a,b) = |adj(a) ∩ adj(b)| over the CURRENT edge set —
        # identical to the former wedge-join + semi-close + 3-corner
        # explode + (a,b) aggregate, computed row-locally from per-vertex
        # neighbor arrays instead of materializing the wedge table every
        # round (the triangle_count rewrite, applied per peel round). Row
        # size is bounded by the hub degree; the wedge form generated
        # deg² rows per hub instead.
        sym_cur = e.select(F.col("a").alias("v"), F.col("b").alias("w")).unionAll(
            e.select(F.col("b").alias("v"), F.col("a").alias("w"))
        )
        adj = sym_cur.groupBy("v").agg(F.collect_list("w").alias("nbrs"))
        kept = (
            e.join(adj.select(F.col("v").alias("a"), F.col("nbrs").alias("na")), "a")
            .join(adj.select(F.col("v").alias("b"), F.col("nbrs").alias("nb")), "b")
            .select(
                "a",
                "b",
                F.size(F.array_intersect("na", "nb")).cast("long").alias("support"),
            )
            .filter(F.col("support") >= need)
            .transform(truncate_lineage)
        )
        # carry the previous round's survivor count instead of re-counting
        # e (one job per peel round saved; identical fixpoint test)
        if n_prev is None:
            n_prev = e.count()
        n_now = kept.count()
        # kept is already materialized; its projection needs no second copy
        e = kept.select("a", "b")
        it += 1
        if rounds is None and n_now == n_prev:
            return kept
        n_prev = n_now
    # oracle mode: recompute nothing — `kept` carries round-`rounds` support
    if rounds == 0:
        return e.withColumn("support", F.lit(None).cast("long")).select(
            "a", "b", "support"
        )
    return kept


def truss_decomposition(
    g: EncodedGraph,
    iters: int | None = None,
    max_iter: int = 64,
) -> DataFrame:
    """FULL truss decomposition — every edge's trussness (the maximum k
    with the edge inside the k-truss) in one pass, where k_truss answers
    a single fixed k. Uses the local h-index iteration (the edge-level
    analog of kcore.py's coreness h-index; Sariyuce, Seshadhri & Pinar's
    local nucleus decomposition, WWW 2018): init t(e) = support(e); each
    round every edge looks at its triangles, takes rho = min of the two
    partner edges' values per triangle, and lowers itself to the h-index
    of its rho multiset. Monotone non-increasing, fixpoint = trussness-2
    exactly; ``iters=None`` stops at the zero-change round (idempotent
    at the fixpoint, so a fixed-horizon oracle >= the convergence round
    matches the early-stopped run bit-for-bit — the g_coreness pattern).

    Scale: triangles enumerate ONCE into a persisted static incidence
    table (edge + its two partner edges) — the per-round cost is two
    equi-joins of the edge-value state onto that stationary table, one
    bounded per-edge window (partition size = the edge's support), and
    one hash aggregate; the state that re-shuffles is edge-shaped, and
    no round re-runs the wedge self-join (k_truss pays it every round
    because pruning changes the triangle set; trussness never prunes,
    so the incidence table is loop-invariant)."""
    from pyspark.sql import Window

    e = (
        symmetrize(g.edges)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .transform(truncate_lineage)
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(
        e.select(F.col("a").alias("x"), F.col("b").alias("z")),
        ["x", "z"],
        "left_semi",
    )

    def side(ea, eb, p1a, p1b, p2a, p2b):
        return tri.select(
            F.col(ea).alias("ea"), F.col(eb).alias("eb"),
            F.col(p1a).alias("p1a"), F.col(p1b).alias("p1b"),
            F.col(p2a).alias("p2a"), F.col(p2b).alias("p2b"),
        )

    inc = (
        side("x", "y", "y", "z", "x", "z")
        .unionAll(side("y", "z", "x", "y", "x", "z"))
        .unionAll(side("x", "z", "x", "y", "y", "z"))
        .persist()
    )
    inc.count()

    sup = inc.groupBy("ea", "eb").agg(F.count("*").cast("long").alias("val"))
    t = (
        e.join(sup, (e.a == sup.ea) & (e.b == sup.eb), "left")
        .select("a", "b", F.coalesce("val", F.lit(0)).cast("long").alias("val"))
        .transform(truncate_lineage)
    )

    w = Window.partitionBy("ea", "eb").orderBy(F.desc("rho"))
    it = 0
    while True:
        if iters is not None and it >= iters:
            break
        if iters is None and it >= max_iter:
            raise RuntimeError(
                f"truss_decomposition: no fixpoint after {max_iter} rounds"
            )
        t1 = t.select(
            F.col("a").alias("p1a"), F.col("b").alias("p1b"),
            F.col("val").alias("v1"),
        )
        t2 = t.select(
            F.col("a").alias("p2a"), F.col("b").alias("p2b"),
            F.col("val").alias("v2"),
        )
        rho = (
            inc.join(t1, ["p1a", "p1b"])
            .join(t2, ["p2a", "p2b"])
            .select("ea", "eb", F.least("v1", "v2").alias("rho"))
        )
        h = (
            rho.withColumn("rn", F.row_number().over(w))
            .groupBy("ea", "eb")
            .agg(
                F.max(
                    F.when(F.col("rho") >= F.col("rn"), F.col("rn")).otherwise(0)
                ).alias("h")
            )
        )
        new_t = (
            t.join(h, (t.a == h.ea) & (t.b == h.eb), "left")
            .select(
                "a", "b",
                F.when(F.col("h").isNull(), F.col("val"))
                .otherwise(F.least(F.col("val"), F.col("h")))
                .cast("long")
                .alias("val"),
            )
            .transform(truncate_lineage)
        )
        it += 1
        if iters is None:
            changed = (
                new_t.join(
                    t.withColumnRenamed("val", "prev"), ["a", "b"]
                )
                .filter(F.col("val") != F.col("prev"))
                .count()
            )
            t = new_t
            if changed == 0:
                break
        else:
            t = new_t
    inc.unpersist()
    return t.select("a", "b", (F.col("val") + 2).alias("trussness"))


def four_clique_count_per_vertex(
    g: EncodedGraph, degree_ordered: bool = True
) -> DataFrame:
    """(vid, cliques4) — each 4-clique credited to all four corners.

    Chiba-Nishizeki clique extension over the same oriented DAG as
    triangle counting: a 4-clique {w,x,y,z} with DAG order w<x<y<z is
    enumerated exactly once as the oriented triangle (w,x,y) extended by
    an out-neighbor d of w such that the oriented edges (x,d) and (y,d)
    also exist — the two semi-joins force d above x and y in the DAG
    order, so d is always the clique's maximum and no clique is counted
    twice. The per-vertex credit is orientation-independent (the clique
    SET is a graph property), which is what lets the DuckDB oracle use
    plain vid ordering while the engine keeps the degree-ordered DAG.

    Scale: one extra equi-join + two semi-joins past the triangle plan,
    all on oriented edges whose out-degree is bounded by the
    degree-ordered orientation (O(sqrt(m)) on arbitrary graphs, far
    smaller on power-law webs) — the candidate fan-out per triangle is
    outdeg(a), never a hub's full neighborhood. No pair or clique table
    is ever keyed quadratically; the final aggregate is a map-side
    combining corner count."""
    e = _oriented(g, degree_ordered).persist()
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(
            e.select(F.col("src").alias("a"), F.col("dst").alias("c")),
            ["a", "c"],
            "left_semi",
        )
    )
    quads = (
        tri.join(e.select(F.col("src").alias("a"), F.col("dst").alias("d")), "a")
        .join(
            e.select(F.col("src").alias("b"), F.col("dst").alias("d")),
            ["b", "d"],
            "left_semi",
        )
        .join(
            e.select(F.col("src").alias("c"), F.col("dst").alias("d")),
            ["c", "d"],
            "left_semi",
        )
    )
    corners = (
        quads.select(F.col("a").alias("vid"))
        .unionAll(quads.select(F.col("b").alias("vid")))
        .unionAll(quads.select(F.col("c").alias("vid")))
        .unionAll(quads.select(F.col("d").alias("vid")))
    )
    counts = (
        corners.groupBy("vid")
        .agg(F.count("*").alias("cliques4"))
        .transform(truncate_lineage)
    )
    e.unpersist()
    return g.vertices.select("vid").join(counts, "vid", "left").select(
        "vid", F.coalesce(F.col("cliques4"), F.lit(0)).cast("long").alias("cliques4")
    )
