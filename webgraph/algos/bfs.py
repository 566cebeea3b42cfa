"""Multi-source BFS hop distances — the crawl-depth operator.

The reference bounds its crawl by hop distance from the seed URLs
(ApplicationConfiguration.java:38,294-296 ``maxDepthOfCrawling``,
App.java:298; seeds added via controller.addSeed). This re-expresses that
frontier semantics as a batch operator over the already-built edge table:
``bfs_depths`` returns, for every page reachable from the seed set within
``max_depth`` directed hops, the minimum hop distance — i.e. the depth at
which the reference's crawler would first have fetched it.

Execution shape (level-synchronous BFS, the scalable formulation):

- per level: ONE join of the current frontier against the stationary edge
  table + one anti-join against the visited set. The big side (edges) is
  persisted once by the caller's EncodedGraph and never re-shuffled — only
  the frontier (<= |V| rows, usually far smaller) moves.
- visited/frontier are localCheckpointed (or CheckpointManager-committed)
  per level: lineage stays O(1), and the ``changed``-style loop condition
  reads the materialized frame — never re-executing the join (the
  single-execution discipline pagerank.py:159-174 established).
- at 100 TB the frontier join is a shuffle hash join keyed on vid; hub
  fan-in is absorbed by the per-level ``distinct()`` partial aggregate
  (map-side combine removes duplicate (dst) rows before the shuffle).

With ``checkpoint_dir`` each level's visited set is committed via
CheckpointManager (parquet + manifest) so deep crawl-frontier runs are
resumable with per-level metrics, like PageRank/CC/LP/HITS/k-core.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import (
    EncodedGraph,
    cluster_for_loop,
    symmetrize,
    truncate_lineage,
)
from webgraph.checkpoint import CheckpointManager


def bfs_depths(
    g: EncodedGraph,
    seeds,
    max_depth: int,
    directed: bool = True,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """Minimum hop distance from any seed, following edges src->dst.

    Returns (``(vid, depth)`` DataFrame — reachable vertices only, seeds at
    depth 0 — and per-level metrics). Seeds absent from the graph raise
    ValueError (matching personalized_pagerank's seed validation).
    ``directed=False`` walks the symmetrized edge set.
    """
    if max_depth < 0:
        raise ValueError(f"bfs_depths: max_depth must be >= 0, got {max_depth}")
    spark = g.edges.sparkSession
    # undirected mode: materialize the symmetrized set ONCE — otherwise
    # its union+distinct shuffle of the full edge table re-executes on
    # every level's frontier probe
    edges, _unpersist_edges = _shared_edges(g, directed)
    ckpt = CheckpointManager(checkpoint_dir, "bfs") if checkpoint_dir else None

    seeds_df = spark.createDataFrame([(int(s),) for s in set(seeds)], "vid long")
    missing = seeds_df.join(g.vertices.select("vid"), "vid", "left_anti").count()
    if missing:
        raise ValueError(f"bfs_depths: {missing} seed vid(s) not in the graph")

    visited = seeds_df.select("vid", F.lit(0).alias("depth"))
    start_level = 1
    metrics: list[dict] = []
    if ckpt and resume:
        loaded = ckpt.load_latest(spark)
        if loaded is not None:
            visited, last = loaded
            start_level = last + 1
    visited = visited.transform(truncate_lineage)

    for level in range(start_level, max_depth + 1):
        t0 = time.time()
        frontier = visited.filter(F.col("depth") == level - 1).select("vid")
        # one frontier⋈edges probe; distinct() partial-aggregates map-side
        # so hub fan-in never inflates the shuffle
        nxt = (
            frontier.hint("shuffle_hash")
            .join(edges.withColumnRenamed("src", "vid"), "vid")
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(visited.select("vid"), "vid", "left_anti")
            .select("vid", F.lit(level).alias("depth"))
        )
        if ckpt:
            visited = ckpt.write_state(visited.unionByName(nxt), level)
            n_new = visited.filter(F.col("depth") == level).count()
        else:
            # only the NEW level materializes (round 6): visited stays a
            # union of already-materialized level frames — re-truncating
            # the whole visited set every level rewrote O(V) rows x depth
            # per sweep; a periodic re-truncation bounds plan width
            nxt = truncate_lineage(nxt)
            n_new = nxt.count()
            visited = visited.unionByName(nxt)
            if level % 32 == 0:
                visited = truncate_lineage(visited)
        m = {
            "iteration": level,
            "wall_sec": round(time.time() - t0, 3),
            "frontier": n_new,
        }
        metrics.append(m)
        if ckpt:
            ckpt.log_entry(level, m)
        if n_new == 0:
            break

    if _unpersist_edges:
        edges.unpersist()
    return visited.select("vid", "depth"), metrics


def _shared_edges(g: EncodedGraph, directed: bool) -> tuple[DataFrame, bool]:
    """The (src, dst) traversal frame, src-clustered for the level loops
    (cluster_for_loop): every per-level frontier⋈edges probe then streams
    the cache with zero exchange and zero sort — the graph cache's own
    (src,dst)-hash layout would re-exchange all E rows at EVERY level.
    Costs one loop-lifetime in-memory copy in directed mode (the r05
    no-second-copy rule traded per-level E-sized exchanges for that
    memory; the exchange is the wrong side of the trade at any scale).
    Returns (frame, we_persisted_it) so callers unpersist once their
    outputs are materialized."""
    n = g.edges.count()
    if directed:
        e = cluster_for_loop(g.edges.select("src", "dst"), "src", num_rows=n)
    else:
        e = cluster_for_loop(symmetrize(g.edges), "src", num_rows=2 * n)
    e.count()
    return e, True


def multi_path_counts(
    g: EncodedGraph,
    roots,
    max_depth: int,
    directed: bool = True,
    edges: DataFrame | None = None,
) -> DataFrame:
    """(root, vid, depth, sigma) — shortest-path counts from EVERY root in
    one batched level-synchronous sweep (the sigma phase of Brandes'
    betweenness): sigma(root, v) = sum of sigma(root, u) over predecessors
    u on shortest paths from that root.

    The frontier is keyed (root, vid), so K roots advance through ONE
    edges-join + ONE hash aggregate per level instead of K sequential job
    chains — the same multi-source trick bfs_depths uses for crawl depth,
    extended to carry sigma. At 100 TB the per-level shuffle is
    (sum of frontier sizes) rows, and driver latency is levels, not
    levels x pivots. sigma can grow combinatorially on dense DAG-like
    graphs — int64 holds ~9.2e18 paths; overflow on adversarial graphs
    would need decimal, documented here rather than silently wrapped."""
    if max_depth < 0:
        raise ValueError(f"multi_path_counts: max_depth must be >= 0, got {max_depth}")
    roots = [int(s) for s in dict.fromkeys(roots)]
    if not roots:
        raise ValueError("multi_path_counts: roots must be non-empty")
    spark = g.edges.sparkSession
    roots_df = spark.createDataFrame([(s,) for s in roots], "vid long")
    missing = roots_df.join(g.vertices.select("vid"), "vid", "left_anti").count()
    if missing:
        raise ValueError(f"multi_path_counts: {missing} root vid(s) not in the graph")
    own_edges = edges is None
    unpersist = False
    if own_edges:
        edges, unpersist = _shared_edges(g, directed)
    frontier = spark.createDataFrame(
        [(s, s, 1) for s in roots], "root long, vid long, sigma long"
    ).transform(truncate_lineage)
    visited = frontier.select(
        "root", "vid", F.lit(0).alias("depth"), "sigma"
    ).transform(truncate_lineage)
    for d in range(1, max_depth + 1):
        # ONE probe for all roots: frontier ⋈ edges, partial-aggregated
        # map-side on (root, dst) before the shuffle
        nxt = (
            frontier.hint("shuffle_hash")
            .join(edges, frontier.vid == edges.src, "inner")
            .groupBy("root", F.col("dst").alias("vid"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited.select("root", "vid"), ["root", "vid"], "left_anti")
            .transform(truncate_lineage)
        )
        # materialized above — take(1) reads the checkpoint, no re-execution
        if not nxt.take(1):
            break
        # visited stays a union of already-materialized level frames (see
        # bfs_depths — no O(V·depth) rewrite); periodic re-truncation
        # bounds plan width on deep graphs
        visited = visited.unionByName(
            nxt.select("root", "vid", F.lit(d).alias("depth"), "sigma")
        )
        if d % 32 == 0:
            visited = truncate_lineage(visited)
        frontier = nxt
    if unpersist:
        edges.unpersist()
    return visited


def multi_betweenness_contributions(
    g: EncodedGraph,
    roots,
    max_depth: int,
    directed: bool = True,
) -> DataFrame:
    """(root, vid, depth, sigma, delta) — Brandes' dependency accumulation
    for EVERY root in one batched backward sweep. After the shared forward
    sigma sweep (multi_path_counts), walk the BFS levels BACKWARD
    accumulating, per root,

        delta(v) = sum_{w in succ(v), depth(w)=depth(v)+1}
                       (sigma(v)/sigma(w)) * (1 + delta(w)).

    Every backward level is ONE edges ⋈ level-frame join + ONE hash
    aggregate covering all roots (group keys (root, vid)); levels are
    materialized so the backward pass re-reads state instead of
    re-planning it. The (possibly symmetrized) edge frame is built and
    persisted ONCE and shared by both phases and all roots, then released
    before returning. Roots whose sweep ends shallower than the global
    deepest level simply have empty successor frames there (frac NULL ->
    delta 0), so mixed-eccentricity pivot sets batch correctly."""
    edges, unpersist = _shared_edges(g, directed)
    visited = multi_path_counts(
        g, roots, max_depth, directed=True, edges=edges
    )  # already localCheckpointed per level
    deepest = visited.agg(F.max("depth")).collect()[0][0]
    if deepest is None:
        if unpersist:
            edges.unpersist()
        return visited.select(
            "root", "vid", "depth", "sigma", F.lit(0.0).alias("delta")
        )
    # level frames keyed by depth, enriched with delta bottom-up
    level = {
        d: visited.filter(F.col("depth") == d).select("root", "vid", "sigma")
        for d in range(deepest + 1)
    }
    delta = level[deepest].select(
        "root", "vid", F.lit(0.0).alias("delta")
    ).transform(truncate_lineage)
    out = [
        level[deepest].join(delta, ["root", "vid"]).select(
            "root", "vid", F.lit(deepest).alias("depth"), "sigma", "delta"
        )
    ]
    for d in range(deepest - 1, -1, -1):
        cur = level[d]
        succ = level[d + 1].join(delta, ["root", "vid"]).select(
            "root",
            F.col("vid").alias("w"),
            F.col("sigma").alias("sw"),
            F.col("delta").alias("dw"),
        )
        contrib = (
            cur.hint("shuffle_hash").join(edges, cur.vid == edges.src, "inner")
            .join(
                succ,
                (cur.root == succ.root) & (F.col("dst") == F.col("w")),
                "inner",
            )
            .groupBy(cur.root.alias("root"), F.col("src").alias("v"))
            .agg(F.sum((F.lit(1.0) + F.col("dw")) / F.col("sw")).alias("frac"))
        )
        delta = (
            cur.join(
                contrib,
                (cur.root == contrib.root) & (cur.vid == F.col("v")),
                "left",
            )
            .select(
                cur.root.alias("root"),
                cur.vid.alias("vid"),
                (F.col("sigma") * F.coalesce(F.col("frac"), F.lit(0.0))).alias("delta"),
            )
            .transform(truncate_lineage)
        )
        out.append(
            cur.join(delta, ["root", "vid"]).select(
                "root", "vid", F.lit(d).alias("depth"), "sigma", "delta"
            )
        )
    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    result = result.transform(truncate_lineage)
    if unpersist:
        edges.unpersist()
    return result


def harmonic_centrality(
    g: EncodedGraph,
    landmarks,
    max_depth: int,
    directed: bool = True,
) -> DataFrame:
    """Harmonic centrality of a landmark set: for each landmark l,
    sum(1/d(l, v)) over vertices reachable within max_depth hops — the
    standard landmark/pivot formulation (exact all-pairs centrality is
    O(V·E); production link-graph pipelines compute it for a small pivot
    set, which is also how crawl-frontier reachability is audited).

    Returns one row per landmark: (vid, n_reached, harmonic_e6) where
    harmonic_e6 = SUM(1_000_000 DIV depth) over reached vertices at depth
    >= 1 — integer micro-units (floor per term) so the value is exactly
    reproducible on any engine, same convention as lcc_e6/rank_e6.

    Scale: ONE batched multi-source sweep keyed (root, vid) — all K
    landmarks share each level's single edges-join (frontier-sized
    shuffles, stationary edges); K adds rows to the frontier, not jobs to
    the driver. Landmark count remains the accuracy/cost knob."""
    if not landmarks:
        raise ValueError("harmonic_centrality: landmarks must be non-empty")
    landmarks = [int(s) for s in dict.fromkeys(landmarks)]
    visited = multi_path_counts(g, landmarks, max_depth, directed=directed)
    spark = g.edges.sparkSession
    lm_df = spark.createDataFrame([(s,) for s in landmarks], "vid long")
    agg = (
        visited.filter(F.col("depth") >= 1)
        .groupBy(F.col("root").alias("vid"))
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            F.sum(F.expr("1000000 DIV depth")).cast("long").alias("harmonic_e6"),
        )
    )
    # landmarks that reach nothing still get a (0, 0) row
    return lm_df.join(agg, "vid", "left").select(
        "vid",
        F.coalesce(F.col("n_reached"), F.lit(0)).cast("long").alias("n_reached"),
        F.coalesce(F.col("harmonic_e6"), F.lit(0)).cast("long").alias("harmonic_e6"),
    )


def closeness_centrality(
    g: EncodedGraph,
    landmarks,
    max_depth: int,
    directed: bool = True,
) -> DataFrame:
    """Landmark closeness centrality: n_reached / sum(d(l, v)) over the
    depth-bounded reachable set — harmonic_centrality's sibling (the two
    are the standard pivot pair; closeness penalizes a few far vertices
    where harmonic discounts them). Returns (vid, n_reached, sum_depth,
    closeness_e6) with closeness_e6 = 1e6 * n_reached DIV sum_depth —
    pure integer arithmetic, exactly engine-reproducible; landmarks that
    reach nothing get (0, 0, 0).

    Scale: identical economics to harmonic_centrality — the SAME batched
    (root, vid)-keyed multi-source sweep, so K landmarks cost one
    edges-join per level, then one tiny aggregate per landmark."""
    if not landmarks:
        raise ValueError("closeness_centrality: landmarks must be non-empty")
    landmarks = [int(s) for s in dict.fromkeys(landmarks)]
    visited = multi_path_counts(g, landmarks, max_depth, directed=directed)
    spark = g.edges.sparkSession
    lm_df = spark.createDataFrame([(s,) for s in landmarks], "vid long")
    agg = (
        visited.filter(F.col("depth") >= 1)
        .groupBy(F.col("root").alias("vid"))
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            F.sum("depth").cast("long").alias("sum_depth"),
        )
    )
    return lm_df.join(agg, "vid", "left").select(
        "vid",
        F.coalesce(F.col("n_reached"), F.lit(0)).cast("long").alias("n_reached"),
        F.coalesce(F.col("sum_depth"), F.lit(0)).cast("long").alias("sum_depth"),
        F.coalesce(
            F.expr("1000000 * n_reached DIV sum_depth"), F.lit(0)
        ).cast("long").alias("closeness_e6"),
    )


def bfs_path_counts(
    g: EncodedGraph,
    seed: int,
    max_depth: int,
    directed: bool = True,
) -> DataFrame:
    """(vid, depth, sigma) — single-source shortest-path counts; thin
    wrapper over the batched multi_path_counts (one root) so both surfaces
    share one implementation and one set of tests."""
    if max_depth < 0:
        raise ValueError(f"bfs_path_counts: max_depth must be >= 0, got {max_depth}")
    if g.vertices.filter(F.col("vid") == seed).count() == 0:
        raise ValueError(f"bfs_path_counts: seed {seed} not in graph")
    return multi_path_counts(g, [seed], max_depth, directed=directed).select(
        "vid", "depth", "sigma"
    )


def betweenness_contributions(
    g: EncodedGraph,
    seed: int,
    max_depth: int,
    directed: bool = True,
) -> DataFrame:
    """(vid, depth, sigma, delta) — Brandes' single-source dependency
    accumulation; thin wrapper over multi_betweenness_contributions (one
    root). Reports the raw sweep INCLUDING the seed's own depth-0 row —
    estimators that sum sweeps must drop that row (standard Brandes
    accumulates C_B[w] += delta_s[w] only for w != s; see
    approximate_betweenness)."""
    return multi_betweenness_contributions(
        g, [seed], max_depth, directed=directed
    ).select("vid", "depth", "sigma", "delta")


def approximate_betweenness(
    g: EncodedGraph,
    pivots,
    max_depth: int,
    directed: bool = True,
) -> DataFrame:
    """Pivot-sampled betweenness centrality: sum of Brandes dependency
    contributions over a pivot set — the standard estimator (exact
    betweenness is the same sum over ALL sources; pivot count trades
    accuracy for sweeps, like harmonic_centrality's landmarks). Per
    Brandes, each sweep's SOURCE row is excluded from the sum
    (C_B[w] += delta_s[w] only for w != s — the depth-0 row); a pivot
    still accumulates centrality from the other pivots' sweeps.

    Runs as ONE batched forward + ONE batched backward sweep keyed
    (pivot, vid) — all K pivots share each level's single edges-join
    (multi_betweenness_contributions), so K scales frontier rows, not
    driver-serialized job chains. Returns (vid, betweenness) over every
    vertex reached by any pivot sweep at depth >= 1."""
    if not pivots:
        raise ValueError("approximate_betweenness: pivots must be non-empty")
    contrib = multi_betweenness_contributions(
        g, pivots, max_depth, directed=directed
    )
    return (
        contrib.filter(F.col("depth") >= 1)
        .groupBy("vid")
        .agg(F.sum("delta").alias("betweenness"))
    )


def edge_betweenness_contributions(
    g: EncodedGraph,
    seed: int,
    max_depth: int,
    directed: bool = True,
) -> DataFrame:
    """(src, dst, depth, delta_edge) — Brandes' single-source dependency
    accumulation resolved to EDGES: for every shortest-path-DAG edge
    (v, w) with depth(w) = depth(v) + 1,

        delta_edge(v, w) = (sigma(v) / sigma(w)) * (1 + delta(w)),

    the exact per-edge term the vertex sweep sums into delta(v) before
    discarding (multi_betweenness_contributions' `contrib` aggregate).
    Summed over a pivot set this is the standard edge-betweenness
    estimator — the quantity Girvan–Newman community detection removes
    greedily, and for a crawl graph the "load" a hyperlink carries
    between regions. ``depth`` is depth(v) (the edge's tail level).

    Cost: ONE extra three-way join over the ALREADY-materialized vertex
    sweep (per-level frames are localCheckpointed by the backward pass)
    — the sweep itself is not re-run, and non-DAG edges drop out of the
    depth-equality join. Edges whose head has sigma 0 cannot appear
    (every swept vertex has sigma >= 1 by construction)."""
    sweep = multi_betweenness_contributions(
        g, [seed], max_depth, directed=directed
    ).select("vid", "depth", "sigma", "delta")
    sweep = sweep.transform(truncate_lineage)
    edges, unpersist = _shared_edges(g, directed)
    tail = sweep.select(
        F.col("vid").alias("src"),
        F.col("depth").alias("depth"),
        F.col("sigma").alias("sv"),
    )
    head = sweep.select(
        F.col("vid").alias("dst"),
        F.col("depth").alias("dw"),
        F.col("sigma").alias("sw"),
        F.col("delta").alias("deltaw"),
    )
    out = (
        edges.join(tail, "src")
        .join(head, "dst")
        .filter(F.col("dw") == F.col("depth") + 1)
        .select(
            "src",
            "dst",
            "depth",
            (
                # same association order as the oracle's
                # sigma * (1 + delta) / sigma_w — digit-for-digit equal,
                # never an ulp apart at a ROUND(x*1e6) boundary
                F.col("sv") * (F.lit(1.0) + F.col("deltaw")) / F.col("sw")
            ).alias("delta_edge"),
        )
        .transform(truncate_lineage)
    )
    if unpersist:
        edges.unpersist()
    return out


def pseudo_diameter(
    g: EncodedGraph,
    seed: int,
    max_depth: int,
    directed: bool = False,
) -> DataFrame:
    """Double-sweep pseudo-diameter (Magnien–Latapy–Habib): BFS from
    ``seed``, restart from the farthest vertex found, and report that
    second sweep's eccentricity — a lower bound on the true diameter
    that is exact on trees and empirically tight on web graphs, for two
    BFS sweeps instead of the all-pairs sweep exact diameter costs.
    Both sweeps are horizon-bounded by ``max_depth`` (the same truncation
    contract as neighborhood_function_exact / g_eff_diameter): on a
    graph whose eccentricities exceed the horizon the reported bound is
    the horizon itself. Ties at the farthest depth break to MIN vid so
    the result is deterministic under any partitioning.

    Returns one row: (seed, far1, ecc1, far2, ecc2) — sweep-1's farthest
    vertex and eccentricity, then sweep-2's, with ecc2 >= ecc1 the
    pseudo-diameter. The only driver readout is the two scalar
    (depth, vid) argmax rows, one per sweep."""

    def _far(depths: DataFrame) -> tuple[int, int]:
        row = (
            depths.orderBy(F.desc("depth"), F.asc("vid")).limit(1).collect()[0]
        )
        return int(row["vid"]), int(row["depth"])

    d1, _ = bfs_depths(g, [seed], max_depth, directed=directed)
    far1, ecc1 = _far(d1)
    d2, _ = bfs_depths(g, [far1], max_depth, directed=directed)
    far2, ecc2 = _far(d2)
    spark = g.edges.sparkSession
    return spark.createDataFrame(
        [(int(seed), far1, ecc1, far2, ecc2)],
        "seed long, far1 long, ecc1 long, far2 long, ecc2 long",
    )
