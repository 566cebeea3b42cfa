"""HITS (hubs & authorities, Kleinberg) — the natural companion to
PageRank over the same link graph (reference README.md:107-112 ranks pages
by raw in-degree; HITS is the principled mutual-reinforcement version).

Per iteration, over the once-persisted edge table:

    auth(v) = sum_{u->v} hub(u)     then L2-normalize auth
    hub(u)  = sum_{u->v} auth(v)    then L2-normalize hub

Physical plan per iteration: two (edges ⋈ scores -> groupBy) passes — the
same shuffle shape as one PageRank step, run in each direction; each L2
norm is a 1-row aggregate cross-joined back as a broadcast (no driver
collect); per-iteration localCheckpoint truncates lineage. Vertices with
no in-links (out-links) keep authority (hub) 0 via the left join onto the
full vertex set.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph


def _normalized(scores: DataFrame, col: str) -> DataFrame:
    nrm = scores.agg(
        F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_nrm")
    )
    return scores.crossJoin(F.broadcast(nrm)).select(
        "vid",
        F.when(F.col("_nrm") > 0, F.col(col) / F.col("_nrm"))
        .otherwise(F.lit(0.0))
        .alias(col),
    )


def hits(
    g: EncodedGraph, max_iter: int = 5
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid, hub, auth) DataFrame, per-iteration metrics)."""
    edges = g.edges.persist()
    num_edges = edges.count()
    verts = g.vertices.select("vid")

    hub = verts.select("vid", F.lit(1.0).alias("hub"))
    metrics: list[dict] = []
    auth = None
    for it in range(max_iter):
        t0 = time.time()
        a_raw = (
            edges.join(hub, edges.src == hub.vid, "inner")
            .groupBy(edges.dst.alias("vid"))
            .agg(F.sum("hub").alias("auth"))
        )
        auth = _normalized(
            verts.join(a_raw, "vid", "left").select(
                "vid", F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth")
            ),
            "auth",
        ).localCheckpoint(eager=True)
        h_raw = (
            edges.join(auth, edges.dst == auth.vid, "inner")
            .groupBy(edges.src.alias("vid"))
            .agg(F.sum("auth").alias("hub"))
        )
        hub = _normalized(
            verts.join(h_raw, "vid", "left").select(
                "vid", F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub")
            ),
            "hub",
        ).localCheckpoint(eager=True)
        metrics.append(
            {"iteration": it, "wall_sec": round(time.time() - t0, 3),
             "messages": 2 * num_edges}
        )
    out = hub.join(auth, "vid").select("vid", "hub", "auth")
    edges.unpersist()
    return out, metrics
