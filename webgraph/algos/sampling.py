"""Deterministic snowball (multi-seed capped-fanout BFS) sampling — the
standard way to cut a representative, connectivity-preserving subgraph
out of a graph too big to run an expensive analytic on (Leskovec &
Faloutsos, "Sampling from Large Graphs", KDD 2006: BFS-family samples
preserve community/degree locality where uniform edge samples shatter
it). A 100 TB link graph uses this to calibrate algorithm constants
(salting thresholds, truss horizons, LSH bands) on a faithful slice
before the full run.

"Random" neighbor choice is the walks.py convention — no RNG state:
each frontier vertex expands its (at most) ``fanout`` out-edges with
the SMALLEST seeded portable hash, ties by dst, so the sample is
reproducible across runs, partitionings, engines and cluster sizes,
and the DuckDB oracle replays it with plain integer arithmetic.

Physical shape per level (the BFS economics): frontier joins the
stationary persisted edge table on src, one per-src window caps the
fanout (partition size = out-degree, bounded by construction), one
anti-join against the visited set dedups first-reached levels. The
state that re-shuffles is vertex-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, truncate_lineage
from webgraph.algos.walks import _step_hash


def snowball_sample(
    g: EncodedGraph,
    seeds: DataFrame,
    fanout: int = 3,
    depth: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Returns ``(vid, level)`` — every sampled vertex tagged with the
    level it was FIRST reached at (seeds are level 0). ``seeds`` is a
    one-column ``(vid)`` frame. Each level, every frontier vertex
    expands at most ``fanout`` out-edges (smallest seeded hash wins,
    ties by dst); already-visited vertices never re-enter."""
    edges = g.edges.select("src", "dst")
    visited = seeds.select("vid", F.lit(0).alias("level")).transform(
        truncate_lineage
    )
    frontier = visited.select("vid")
    w = Window.partitionBy("src").orderBy("h", "dst")
    for level in range(1, depth + 1):
        cand = frontier.join(edges, frontier.vid == edges.src, "inner").select(
            "src",
            "dst",
            _step_hash(F.col("src"), level, F.col("dst"), seed).alias("h"),
        )
        kept = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= fanout)
            .select("dst")
            .distinct()
        )
        new = (
            kept.join(visited, kept.dst == visited.vid, "left_anti")
            .select(F.col("dst").alias("vid"), F.lit(level).alias("level"))
            .transform(truncate_lineage)
        )
        visited = visited.unionByName(new)
        frontier = new.select("vid")
    return visited
