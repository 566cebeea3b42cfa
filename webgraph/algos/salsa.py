"""SALSA (Lempel & Moran's Stochastic Approach for Link-Structure
Analysis) — the degree-normalized cousin of HITS: authority/hub scores
from alternating backward/forward random-walk steps instead of raw
mutual reinforcement. Where HITS needs an explicit L2 norm per pass,
SALSA's steps are row-stochastic (contributions divided by out-/in-
degree), so iteration is just two weighted gather-scatter passes — the
exact PageRank shuffle shape, run in each direction, with NO norm
subtree at all.

    auth'(i) = sum_{j->i} hub(j)  / outdeg(j)
    hub'(j)  = sum_{j->i} auth(i) / indeg(i)

Both normalized edge frames are built once and persisted (the stationary
big join sides); per iteration only the vertex-shaped score frames
re-shuffle. Scores are deterministic floats with an exact unrolled SQL
oracle (micro-unit rounded), like g_pagerank/g_hits.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage
from webgraph.checkpoint import CheckpointManager


def salsa(
    g: EncodedGraph,
    max_iter: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid, hub, auth) DataFrame, per-iteration metrics).
    Init hub = 1.0 everywhere (any fixed init yields the same fixpoint
    direction; fixed-iteration runs are exactly reproducible).

    With ``checkpoint_dir`` each iteration's (vid, hub, auth) state is
    committed via CheckpointManager (parquet + manifest) and
    ``resume=True`` continues from the last committed iteration,
    bit-identical to an uninterrupted run — the same surface as
    PR/CC/LP/HITS/k-core/BFS (north_rule: resumable from checkpoint)."""
    if max_iter < 1:
        raise ValueError(f"salsa: max_iter must be >= 1, got {max_iter}")
    spark = g.edges.sparkSession
    ckpt = CheckpointManager(checkpoint_dir, "salsa") if checkpoint_dir else None
    edges = g.edges.persist()
    num_edges = edges.count()
    verts = g.vertices.select("vid")

    out_deg = edges.groupBy("src").agg(F.count("*").alias("odeg"))
    in_deg = edges.groupBy("dst").agg(F.count("*").alias("ideg"))
    # Each stationary side is explicitly clustered by ITS iteration join
    # key (fwd sweeps join on src, bwd on dst) so the per-iteration
    # shuffled hash joins stream both caches with zero exchange and zero
    # sort (cluster_for_loop, same rationale as pagerank.py).
    e_fwd = cluster_for_loop(
        edges.join(out_deg, "src", "inner").select(
            "src", "dst", (F.lit(1.0) / F.col("odeg")).alias("w")
        ),
        "src",
        num_rows=num_edges,
    )
    e_bwd = cluster_for_loop(
        edges.join(in_deg, "dst", "inner").select(
            "src", "dst", (F.lit(1.0) / F.col("ideg")).alias("w")
        ),
        "dst",
        num_rows=num_edges,
    )
    e_fwd.count(), e_bwd.count()

    hub = verts.select("vid", F.lit(1.0).alias("hub"))
    auth = verts.select("vid", F.lit(0.0).alias("auth"))
    metrics: list[dict] = []
    state = None
    start_iter = 0
    if ckpt and resume:
        loaded = ckpt.load_latest(spark)
        if loaded is not None:
            state, last = loaded
            hub = state.select("vid", "hub")
            auth = state.select("vid", "auth")
            start_iter = last + 1
    for it in range(start_iter, max_iter):
        t0 = time.time()
        # shuffled hash joins, build = the V-shaped state / aggregate side:
        # the clustered edge caches stream sort-free (see pagerank.py)
        h = hub.hint("shuffle_hash")
        a_raw = (
            e_fwd.join(h, e_fwd.src == h["vid"], "inner")
            .groupBy(e_fwd.dst.alias("vid"))
            .agg(F.sum(F.col("w") * F.col("hub")).alias("auth"))
        )
        auth = (
            verts.join(a_raw.hint("shuffle_hash"), "vid", "left")
            .select("vid", F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"))
            .transform(truncate_lineage)
        )
        a = auth.hint("shuffle_hash")
        h_raw = (
            e_bwd.join(a, e_bwd.dst == a["vid"], "inner")
            .groupBy(e_bwd.src.alias("vid"))
            .agg(F.sum(F.col("w") * F.col("auth")).alias("hub"))
        )
        hub = verts.join(h_raw.hint("shuffle_hash"), "vid", "left").select(
            "vid", F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub")
        )
        if ckpt:
            # the parquet commit IS the materialization — no extra action
            state = ckpt.write_state(
                hub.join(auth, "vid").select("vid", "hub", "auth"), it
            )
            hub = state.select("vid", "hub")
            auth = state.select("vid", "auth")
        else:
            hub = hub.transform(truncate_lineage)
            state = hub.join(auth, "vid").select("vid", "hub", "auth")
        m = {"iteration": it, "wall_sec": round(time.time() - t0, 3),
             "messages": 2 * num_edges}
        metrics.append(m)
        if ckpt:
            ckpt.log_entry(it, m)
    # state is materialized (localCheckpoint / parquet re-read), so the
    # normalized edge caches can be released (review finding: per-call
    # caches were never unpersisted)
    e_fwd.unpersist()
    e_bwd.unpersist()
    return state, metrics
