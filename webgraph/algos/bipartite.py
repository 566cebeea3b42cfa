"""Bipartiteness / odd-cycle detection via the bipartite double cover.

A component is bipartite iff it contains no odd cycle. The classic
reduction avoids any new iterative machinery: build the DOUBLE COVER
(each vertex v becomes v0/v1; each undirected edge {u,v} becomes
{u0,v1} and {u1,v0}) and run plain connected components on it. An
odd cycle — and only an odd cycle — connects v0 to v1, so:

    component C is bipartite  <=>  no v in C has cover(v0) == cover(v1)

This reuses the audited CC loop (components.py) twice — same shuffle
shapes, same truncation, nothing new for the 100-TB story; the double
cover merely doubles |V| and |E| and can up to double the effective
diameter (the CC round count), which the caller's max_iter must cover.

Use over a link graph: odd-cycle-free subgraphs admit a 2-coloring
(crawl frontier A/B alternation, conflict-free two-phase updates), and
"which components are NOT bipartite" is the cheap structural screen for
that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, symmetrize
from webgraph.algos.components import connected_components


def bipartite_components(
    g: EncodedGraph,
    max_iter: int = 50,
) -> DataFrame:
    """Returns one row per component: ``(component, n_vertices,
    is_bipartite)`` with ``component`` = min vid (the components.py
    label). Isolated vertices are trivially bipartite singletons."""
    labels, _ = connected_components(g, max_iter=max_iter, collect_skew=False)

    sym = symmetrize(g.edges)
    dc_edges = sym.select(
        (F.col("src") * 2).alias("src"), (F.col("dst") * 2 + 1).alias("dst")
    )
    dc_verts = (
        g.vertices.select((F.col("vid") * 2).alias("vid"))
        .unionByName(g.vertices.select((F.col("vid") * 2 + 1).alias("vid")))
        .withColumn("url", F.col("vid").cast("string"))
    )
    dc = EncodedGraph(
        vertices=dc_verts, edges=dc_edges, num_vertices=2 * g.num_vertices
    )
    dc_labels, _ = connected_components(dc, max_iter=max_iter, collect_skew=False)

    # v is on an odd cycle <=> its two cover copies share a component
    odd = (
        dc_labels.filter(F.col("vid") % 2 == 0)
        .select((F.col("vid") / 2).cast("long").alias("vid"),
                F.col("component").alias("c0"))
        .join(
            dc_labels.filter(F.col("vid") % 2 == 1).select(
                ((F.col("vid") - 1) / 2).cast("long").alias("vid"),
                F.col("component").alias("c1"),
            ),
            "vid",
        )
        .select("vid", (F.col("c0") == F.col("c1")).alias("on_odd_cycle"))
    )
    return (
        labels.join(odd, "vid", "left")
        .groupBy("component")
        .agg(
            F.count("*").alias("n_vertices"),
            (~F.max(F.coalesce("on_odd_cycle", F.lit(False)))).alias(
                "is_bipartite"
            ),
        )
    )
