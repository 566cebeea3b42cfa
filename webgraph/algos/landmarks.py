"""Landmark (pivot) distance oracle — approximate shortest-path queries.

The standard web-scale distance primitive (Potamias et al. 2009,
"Fast shortest path distance estimation in large networks"): BFS once
from L landmarks, store an L-vector per vertex, and answer arbitrary
d(u, v) queries with the triangle-inequality upper bound

    d(u, v) <= min_l  d(u, l) + d(l, v)

— exact whenever some landmark lies on a u–v shortest path. BFS from
all landmarks runs as ONE batched level-synchronous sweep keyed
(landmark, vid) (bfs.multi_path_counts — the Brandes sigma machinery,
distances only), so L landmarks cost one edges-join per level, not L
job chains. The estimate phase is a pair-table double join against the
V x L distance table: equi-joins on vid, map-side-combining MIN — no
per-query BFS anywhere.

Landmark choice is the caller's policy; pick_landmarks gives the
deterministic portable-hash draw (reproducible across engines and
cluster sizes, the repo's sampling convention) — degree-weighted
variants can pass their own list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.bfs import multi_path_counts
from webgraph.algos.common import EncodedGraph
from webgraph.algos.mis import priority_expr


def pick_landmarks(g: EncodedGraph, n: int, seed: int = 42) -> list[int]:
    """The ``n`` vertices with smallest (portable-hash priority, vid) —
    a deterministic uniform draw, SQL-replayable by the contract."""
    if n < 1:
        raise ValueError(f"pick_landmarks: n must be >= 1, got {n}")
    rows = (
        g.vertices.select("vid", priority_expr("vid", seed).alias("p"))
        .orderBy("p", "vid")
        .limit(n)
        .collect()
    )
    return [r["vid"] for r in rows]


def landmark_distances(
    g: EncodedGraph,
    landmarks: list[int],
    max_depth: int,
    directed: bool = False,
) -> DataFrame:
    """(landmark, vid, dist) for every vertex within ``max_depth`` of a
    landmark. Unreached pairs are ABSENT (not +inf rows — at web scale a
    V x L dense table with mostly-infinite cells is the wrong
    materialization; estimate() treats missing as unusable)."""
    pc = multi_path_counts(g, landmarks, max_depth, directed=directed)
    return pc.select(
        F.col("root").alias("landmark"),
        "vid",
        F.col("depth").cast("long").alias("dist"),
    )


def estimate_distances(
    dists: DataFrame,
    pairs: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """Triangle-inequality upper bound per pair: (u, v, dist_ub) =
    min over landmarks known to BOTH endpoints of d(l,u) + d(l,v)
    (undirected semantics — build ``dists`` with directed=False).
    Pairs with no common landmark are absent."""
    du = dists.select(
        F.col("landmark"), F.col("vid").alias(u_col), F.col("dist").alias("du")
    )
    dv = dists.select(
        F.col("landmark"), F.col("vid").alias(v_col), F.col("dist").alias("dv")
    )
    return (
        pairs.join(du, u_col)
        .join(dv, [v_col, "landmark"])
        .groupBy(u_col, v_col)
        .agg(F.min(F.col("du") + F.col("dv")).alias("dist_ub"))
    )
