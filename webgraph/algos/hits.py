"""HITS (hubs & authorities, Kleinberg) — the natural companion to
PageRank over the same link graph (reference README.md:107-112 ranks pages
by raw in-degree; HITS is the principled mutual-reinforcement version).

Per iteration, over the once-persisted edge table:

    auth(v) = sum_{u->v} hub(u)     then L2-normalize auth
    hub(u)  = sum_{u->v} auth(v)    then L2-normalize hub

Physical plan per iteration: two (edges ⋈ scores -> groupBy) passes — the
same shuffle shape as one PageRank step, run in each direction. The raw
(pre-normalization) score frame is localCheckpoint'd BEFORE the L2 norm,
so the expensive edges⋈scores aggregation executes exactly once per
direction; the norm itself is then a 1-row aggregate over the
materialized frame, cross-joined back as a broadcast (no driver collect).
Vertices with no in-links (out-links) keep authority (hub) 0 via the left
join onto the full vertex set.

With ``checkpoint_dir`` the per-iteration ``(vid, hub, auth)`` state is
committed through CheckpointManager (same parquet+manifest protocol as
PageRank/CC/LP), so runs are resumable with per-iteration metrics.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage
from webgraph.checkpoint import CheckpointManager


def _normalized(scores: DataFrame, col: str) -> DataFrame:
    """L2-normalize `col`. `scores` must already be materialized
    (checkpointed) by the caller: the 1-row norm aggregate and the main
    side then both read the same ExistingRDD scan instead of re-executing
    the score subtree twice."""
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
    g: EncodedGraph,
    max_iter: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid, hub, auth) DataFrame, per-iteration metrics)."""
    if max_iter < 1:
        raise ValueError(f"hits: max_iter must be >= 1, got {max_iter}")
    spark = g.edges.sparkSession
    num_edges = g.edges.count()
    # Two clustered loop copies, one per sweep direction (the auth pass
    # joins on src, the hub pass on dst) — each streams sort- and
    # exchange-free in its shuffled hash join; released on return.
    e_fwd = cluster_for_loop(
        g.edges.select("src", "dst"), "src", num_rows=num_edges
    )
    e_bwd = cluster_for_loop(
        g.edges.select("src", "dst"), "dst", num_rows=num_edges
    )
    verts = g.vertices.select("vid")

    ckpt = CheckpointManager(checkpoint_dir, "hits") if checkpoint_dir else None
    hub = verts.select("vid", F.lit(1.0).alias("hub"))
    auth = verts.select("vid", F.lit(0.0).alias("auth"))
    start_iter = 0
    if ckpt and resume:
        loaded = ckpt.load_latest(spark)
        if loaded is not None:
            state, start_iter = loaded
            hub = state.select("vid", "hub")
            auth = state.select("vid", "auth")
            start_iter += 1

    metrics: list[dict] = []
    state = None
    for it in range(start_iter, max_iter):
        t0 = time.time()
        h = hub.hint("shuffle_hash")
        a_raw = (
            e_fwd.join(h, e_fwd.src == h["vid"], "inner")
            .groupBy(e_fwd.dst.alias("vid"))
            .agg(F.sum("hub").alias("auth"))
        )
        # Materialize the raw scores, THEN normalize over the checkpointed
        # frame (single execution of the edges⋈hub aggregation).
        a_full = (
            verts.join(a_raw.hint("shuffle_hash"), "vid", "left")
            .select("vid", F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"))
            .transform(truncate_lineage)
        )
        auth = _normalized(a_full, "auth")
        a = auth.hint("shuffle_hash")
        h_raw = (
            e_bwd.join(a, e_bwd.dst == a["vid"], "inner")
            .groupBy(e_bwd.src.alias("vid"))
            .agg(F.sum("auth").alias("hub"))
        )
        h_full = (
            verts.join(h_raw.hint("shuffle_hash"), "vid", "left")
            .select("vid", F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"))
            .transform(truncate_lineage)
        )
        hub = _normalized(h_full, "hub")
        # Commit the iteration state (vid, hub, auth); both norm aggregates
        # are 1-row scans over the checkpointed raw frames.
        new_state = hub.join(auth, "vid").select("vid", "hub", "auth")
        if ckpt:
            state = ckpt.write_state(new_state, it)
        else:
            state = new_state.transform(truncate_lineage)
        hub = state.select("vid", "hub")
        auth = state.select("vid", "auth")
        m = {"iteration": it, "wall_sec": round(time.time() - t0, 3),
             "messages": 2 * num_edges}
        metrics.append(m)
        if ckpt:
            ckpt.log_entry(it, m)

    if state is None:  # resumed at or past max_iter: return loaded state
        state = hub.join(auth, "vid").select("vid", "hub", "auth")
    e_fwd.unpersist()
    e_bwd.unpersist()
    return state, metrics
