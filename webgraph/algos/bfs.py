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

from webgraph.algos.common import EncodedGraph, symmetrize
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
    edges = (
        g.edges
        if directed
        else symmetrize(g.edges).localCheckpoint(eager=True)
    )
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
    visited = visited.localCheckpoint(eager=True)

    for level in range(start_level, max_depth + 1):
        t0 = time.time()
        frontier = visited.filter(F.col("depth") == level - 1).select("vid")
        # one frontier⋈edges probe; distinct() partial-aggregates map-side
        # so hub fan-in never inflates the shuffle
        nxt = (
            frontier.join(edges.withColumnRenamed("src", "vid"), "vid")
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(visited.select("vid"), "vid", "left_anti")
            .select("vid", F.lit(level).alias("depth"))
        )
        new_visited = visited.unionByName(nxt)
        if ckpt:
            visited = ckpt.write_state(new_visited, level)
        else:
            visited = new_visited.localCheckpoint(eager=True)
        # count the MATERIALIZED frame — the join above ran exactly once
        n_new = visited.filter(F.col("depth") == level).count()
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

    return visited.select("vid", "depth"), metrics


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

    Scale: one level-synchronous BFS per landmark over the shared
    persisted edge table (frontier-sized shuffles only); landmark count is
    the explicit cost knob."""
    if not landmarks:
        raise ValueError("harmonic_centrality: landmarks must be non-empty")
    if not directed:
        # symmetrize ONCE and share across landmark sweeps — calling
        # bfs_depths(directed=False) per landmark would re-persist K
        # copies of the symmetrized edge set.
        sym = symmetrize(g.edges).persist()
        sym.count()
        g = EncodedGraph(vertices=g.vertices, edges=sym, num_vertices=g.num_vertices)
        directed = True
    out = None
    for lm in landmarks:
        depths, _ = bfs_depths(g, [lm], max_depth=max_depth, directed=directed)
        row = (
            depths.filter(F.col("depth") >= 1)
            .agg(
                F.count("*").cast("long").alias("n_reached"),
                F.coalesce(
                    F.sum(F.expr("1000000 DIV depth")), F.lit(0)
                ).cast("long").alias("harmonic_e6"),
            )
            .select(F.lit(lm).cast("long").alias("vid"), "n_reached", "harmonic_e6")
        )
        out = row if out is None else out.unionByName(row)
    return out


def _shared_edges(g: EncodedGraph, directed: bool) -> DataFrame:
    """The (src, dst) traversal frame without redundant caching: directed
    mode projects the EncodedGraph's ALREADY-persisted edges (the
    projection scans the cache — persisting it again would hold a second
    in-memory copy); undirected mode materializes the symmetrized set,
    which IS new data, once."""
    if directed:
        return g.edges.select("src", "dst")
    sym = symmetrize(g.edges).persist()
    sym.count()
    return sym


def bfs_path_counts(
    g: EncodedGraph,
    seed: int,
    max_depth: int,
    directed: bool = True,
) -> DataFrame:
    """(vid, depth, sigma) — number of distinct SHORTEST paths from the
    seed to each reachable vertex (the sigma phase of Brandes'
    betweenness): sigma(v) = sum of sigma(u) over predecessors u on
    shortest paths (depth(u) = depth(v) - 1).

    Level-synchronous like bfs_depths, with the frontier carrying path
    counts: per level, frontier ⋈ edges -> groupBy(dst).sum(sigma) ->
    anti-join visited. Same scale economics (stationary persisted edges,
    vertex-shaped frontier); sigma can grow combinatorially on dense
    DAG-like graphs — int64 holds ~9.2e18 paths, overflow on adversarial
    graphs would need decimal, documented here rather than silently
    wrapped."""
    if max_depth < 0:
        raise ValueError(f"bfs_path_counts: max_depth must be >= 0, got {max_depth}")
    edges = _shared_edges(g, directed)
    spark = g.edges.sparkSession
    if g.vertices.filter(F.col("vid") == seed).count() == 0:
        raise ValueError(f"bfs_path_counts: seed {seed} not in graph")
    frontier = spark.createDataFrame(
        [(int(seed), 1)], "vid long, sigma long"
    ).localCheckpoint(eager=True)
    visited = frontier.select("vid", F.lit(0).alias("depth"), "sigma")
    visited = visited.localCheckpoint(eager=True)
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier.vid == edges.src, "inner")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited.select("vid"), "vid", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.rdd.isEmpty():
            break
        visited = visited.unionByName(
            nxt.select("vid", F.lit(d).alias("depth"), "sigma")
        ).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def betweenness_contributions(
    g: EncodedGraph,
    seed: int,
    max_depth: int,
    directed: bool = True,
) -> DataFrame:
    """(vid, depth, sigma, delta) — Brandes' single-source dependency
    accumulation: after the sigma (shortest-path count) forward sweep,
    walk the BFS levels BACKWARD accumulating

        delta(v) = sum_{w in succ(v), depth(w)=depth(v)+1}
                       (sigma(v)/sigma(w)) * (1 + delta(w)).

    Summing delta over a pivot/seed sample is the standard approximate
    betweenness centrality at scale (exact betweenness is one such sweep
    per vertex — the pivot count is the explicit cost knob, like
    harmonic_centrality's landmarks).

    Each backward level is one edges ⋈ level-frame join + a hash
    aggregate — the same stationary-edges economics as the forward sweep;
    levels are materialized so the backward pass re-reads state instead
    of re-planning it. The (possibly symmetrized) edge frame is built and
    persisted ONCE per call and shared with the forward sweep — not one
    copy per phase (review finding: duplicate persists double the edge
    cache per pivot)."""
    edges = _shared_edges(g, directed)
    g_shared = EncodedGraph(
        vertices=g.vertices, edges=edges, num_vertices=g.num_vertices
    )
    visited = bfs_path_counts(g_shared, seed, max_depth, directed=True)
    visited = visited.persist()
    depths = [r["d"] for r in visited.select(F.col("depth").alias("d")).distinct().collect()]
    if not depths:
        return visited.select("vid", "depth", "sigma", F.lit(0.0).alias("delta"))
    deepest = max(depths)
    # level frames keyed by depth, enriched with delta bottom-up
    level = {
        d: visited.filter(F.col("depth") == d).select("vid", "sigma")
        for d in range(deepest + 1)
    }
    delta = level[deepest].select(
        "vid", F.lit(0.0).alias("delta")
    ).localCheckpoint(eager=True)
    out = [
        level[deepest].join(delta, "vid").select(
            "vid", F.lit(deepest).alias("depth"), "sigma", "delta"
        )
    ]
    for d in range(deepest - 1, -1, -1):
        cur = level[d]
        succ = level[d + 1].join(delta, "vid").select(
            F.col("vid").alias("w"), F.col("sigma").alias("sw"), F.col("delta").alias("dw")
        )
        contrib = (
            cur.join(edges, cur.vid == edges.src, "inner")
            .join(succ, F.col("dst") == F.col("w"), "inner")
            .groupBy(F.col("src").alias("v"))
            .agg(F.sum((F.lit(1.0) + F.col("dw")) / F.col("sw")).alias("frac"))
        )
        delta = (
            cur.join(contrib, cur.vid == F.col("v"), "left")
            .select(
                "vid",
                (F.col("sigma") * F.coalesce(F.col("frac"), F.lit(0.0))).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        out.append(
            cur.join(delta, "vid").select(
                "vid", F.lit(d).alias("depth"), "sigma", "delta"
            )
        )
    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    return result


def approximate_betweenness(
    g: EncodedGraph,
    pivots,
    max_depth: int,
    directed: bool = True,
) -> DataFrame:
    """Pivot-sampled betweenness centrality: sum of Brandes dependency
    contributions over a pivot set (the standard estimator — exact
    betweenness is the same sum over ALL sources; pivot count trades
    accuracy for sweeps, like harmonic_centrality's landmarks). Returns
    (vid, betweenness) over every vertex reached by any pivot sweep."""
    if not pivots:
        raise ValueError("approximate_betweenness: pivots must be non-empty")
    out = None
    for s in pivots:
        d = betweenness_contributions(g, s, max_depth, directed=directed).select(
            "vid", "delta"
        )
        out = d if out is None else out.unionByName(d)
    return out.groupBy("vid").agg(F.sum("delta").alias("betweenness"))
