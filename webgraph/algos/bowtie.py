"""Bowtie decomposition — the canonical macroscopic map of a web graph.

Broder et al. 2000 ("Graph structure in the Web") showed the directed
web decomposes around its largest strongly connected component into six
regions; every large-crawl analysis since reports this breakdown. The
reference stops at per-node in-degree (its graph IS the directed
Page-LINKS->Page table, BatchGraphImporter.java edge creation), so the
bowtie is the natural capstone over the same table:

    CORE          the largest SCC
    IN            reaches CORE, not reachable from it
    OUT           reachable from CORE, does not reach it
    TUBE          on an IN -> OUT path that bypasses CORE
    TENDRIL       everything else weakly connected to CORE
    DISCONNECTED  a different weakly connected component

Region tests only need four reachability predicates, and for vertices
already known to be outside CORE/IN/OUT, "reachable from IN" cannot pass
through CORE (a path through CORE would put the vertex in OUT) — so the
plain forward closure of IN and backward closure of OUT classify
TUBE/TENDRIL without building the core-deleted subgraph.

Execution model: SCC (scc.py's forward/backward min-label coloring)
picks the core; each closure is ONE frontier-synchronous sweep —
per level, one equi-join of the (shrinking) frontier against the
stationary edge table plus one anti-join against the reached set, both
keyed on vid, so a level costs O(frontier ⋈ edges) and the level count
is the seed set's eccentricity (~effective diameter ≈ 16 on real web
graphs, Broder §3). State frames pass through truncate_lineage every
level (common.py:89 — keeps both the lineage and Catalyst's size
estimate O(1) across levels). No collect beyond the two scalar
readouts (core id, core WCC label); the result stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage
from webgraph.algos.components import connected_components
from webgraph.algos.scc import strongly_connected_components

REGIONS = ("CORE", "IN", "OUT", "TUBE", "TENDRIL", "DISCONNECTED")


def reachable_from(
    seeds: DataFrame, edges: DataFrame, reverse: bool = False, max_depth: int = 10_000
) -> DataFrame:
    """All vertices reachable from the ``seeds`` (vid) set along ``edges``
    (src -> dst; dst -> src when ``reverse``), seeds included. Frontier-
    synchronous: each level joins only the NEW vertices against the edge
    table, so total join work is O(E) across the whole sweep, not O(E)
    per level."""
    src, dst = ("dst", "src") if reverse else ("src", "dst")
    # probe-key-clustered loop copy: without it the FULL edge table
    # re-exchanged at every level of the sweep (the frontier's stats are
    # conservative post-truncation, so the semi-join went sort-merge)
    e = cluster_for_loop(edges.select("src", "dst"), src, num_rows=edges.count())
    reached = truncate_lineage(seeds.select("vid").distinct())
    frontier = reached
    for depth in range(max_depth):
        nxt = (
            e.join(
                frontier.withColumnRenamed("vid", src).hint("shuffle_hash"),
                src,
                "left_semi",
            )
            .select(F.col(dst).alias("vid"))
            .distinct()
            .join(reached, "vid", "left_anti")
        )
        nxt = truncate_lineage(nxt)
        if nxt.isEmpty():
            e.unpersist()
            return reached
        # `reached` stays a union of ALREADY-materialized frontiers
        # (round 6): only the new frontier needs a materialization job per
        # level — re-truncating the whole reached set every level rewrote
        # O(V) rows x depth across the sweep. The union is over
        # ExistingRDD scans (no recompute); a periodic re-truncation
        # bounds plan width on pathological deep chains.
        reached = reached.unionByName(nxt)
        if (depth + 1) % 32 == 0:
            reached = truncate_lineage(reached)
        frontier = nxt
    e.unpersist()
    raise RuntimeError(
        f"reachable_from: frontier still non-empty after {max_depth} levels"
    )


def bowtie(g: EncodedGraph, max_scc_rounds: int = 50) -> DataFrame:
    """Per-vertex bowtie region: ``(vid, region)`` with region one of
    REGIONS. The core is the largest SCC, ties broken toward the smaller
    SCC label (= its minimum member vid), so the output is deterministic
    for a given edge set."""
    edges = truncate_lineage(g.edges.filter(F.col("src") != F.col("dst")))

    scc_labels, _ = strongly_connected_components(g, max_rounds=max_scc_rounds)
    scc_labels = truncate_lineage(scc_labels)
    core_row = (
        scc_labels.groupBy("scc")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("scc"))
        .first()
    )
    if core_row is None:  # empty graph
        return g.vertices.sparkSession.createDataFrame([], "vid long, region string")
    core_id = core_row["scc"]

    core = scc_labels.filter(F.col("scc") == core_id).select("vid")
    fwd = reachable_from(core, edges)  # CORE ∪ OUT
    bwd = reachable_from(core, edges, reverse=True)  # CORE ∪ IN
    in_set = bwd.join(fwd, "vid", "left_anti")
    out_set = fwd.join(bwd, "vid", "left_anti")
    fwd_in = reachable_from(in_set, edges)  # marks TUBE/TENDRIL candidates
    bwd_out = reachable_from(out_set, edges, reverse=True)

    wcc, _ = connected_components(g)
    core_wcc = (
        wcc.join(core.limit(1), "vid", "left_semi").select("component").first()[0]
    )

    flag = lambda df, name: df.select("vid", F.lit(True).alias(name))  # noqa: E731
    marked = (
        g.vertices.select("vid")
        .join(flag(core, "is_core"), "vid", "left")
        .join(flag(in_set, "is_in"), "vid", "left")
        .join(flag(out_set, "is_out"), "vid", "left")
        .join(flag(fwd_in, "from_in"), "vid", "left")
        .join(flag(bwd_out, "to_out"), "vid", "left")
        .join(wcc, "vid")
    )
    return marked.select(
        "vid",
        F.when(F.col("is_core"), "CORE")
        .when(F.col("is_in"), "IN")
        .when(F.col("is_out"), "OUT")
        .when(F.col("component") != F.lit(core_wcc), "DISCONNECTED")
        .when(F.col("from_in") & F.col("to_out"), "TUBE")
        .otherwise("TENDRIL")
        .alias("region"),
    )
