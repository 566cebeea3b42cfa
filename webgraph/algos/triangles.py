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

from webgraph.algos.common import EncodedGraph, symmetrize


def _oriented(g: EncodedGraph, degree_ordered: bool) -> DataFrame:
    sym = symmetrize(g.edges)  # canonical undirected, no self-loops
    und = sym.filter(F.col("src") < F.col("dst"))
    if not degree_ordered:
        return und
    # orient low-degree -> high-degree (ties by vid): classic wedge bound
    deg = symmetrize(g.edges).groupBy("src").count().select(
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
    """Total number of distinct triangles in the undirected graph."""
    e = _oriented(g, degree_ordered).persist()
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    closing = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    closed = wedges.join(closing, ["a", "c"], "left_semi")
    n = closed.count()
    e.unpersist()
    return n


def triangle_count_per_vertex(g: EncodedGraph, degree_ordered: bool = True) -> DataFrame:
    """(vid, triangles) — each triangle credited to all three corners.

    Uses degree-ordered orientation by default: the oriented triangle set
    is identical to the plain-vid one (each undirected triangle appears
    exactly once), only the (a, b, c) role assignment differs — and the
    corners union below is role-agnostic, so attribution is unchanged
    while hub-wedge blowup is avoided (see module docstring)."""
    e = _oriented(g, degree_ordered).persist()
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    closing = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    closed = wedges.join(closing, ["a", "c"], "left_semi")
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
