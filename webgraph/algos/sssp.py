"""Weighted single-source shortest paths — Bellman-Ford relaxation
rounds as DataFrame joins.

    d_{t+1}(v) = LEAST( d_t(v),  min_{u->v} d_t(u) + w(u,v) )

Round t holds the exact shortest distance over paths of <= t edges, so a
fixed-iteration run is SQL-expressible (the unrolled-oracle story of
PageRank/Katz applied to min-plus instead of sum-times: both are
semiring iterations over the same edges ⋈ state -> aggregate shape).
Unreached vertices carry NULL, and both engines' LEAST/min skip NULLs,
so "infinity" never needs a sentinel value.

Delta-stepping and frontier tricks (bfs.py) win when most of the graph
is settled early; the dense relaxation here keeps EVERY round one
identically-shaped shuffle join against the stationary persisted edge
table — the plan a 10^9-edge cluster iteration wants, with AQE free to
handle hub skew, and convergence detectable as a zero-change round.
With ``checkpoint_dir`` each round's (vid, dist) state commits through
CheckpointManager (parquet + manifest) — resumable like PR/CC/LP/HITS.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage
from webgraph.checkpoint import CheckpointManager


def shortest_paths(
    g: EncodedGraph,
    source: int,
    weight: F.Column | None = None,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    early_stop: bool = True,
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid, dist) DataFrame — dist NULL = unreachable within
    ``max_iter`` hops — and per-iteration metrics).

    ``weight``: a Column expression over the edge frame's (src, dst)
    columns; defaults to 1 (hop count). Negative weights are accepted by
    the relaxation but, as in any Bellman-Ford, a negative cycle makes
    the fixpoint undefined — fixed-iteration mode still returns the
    exact <= k-edge optimum.

    ``early_stop``: break when a round changes no distance. Min-plus
    relaxation is a monotone fixpoint, so a zero-change round means the
    <= k-edge optimum already equals the unbounded optimum — the result
    is bit-identical to running all ``max_iter`` rounds, only cheaper.
    The check is one sum aggregate over the ALREADY-materialized state
    joined to the previous state (same shape as PageRank's tol pass,
    pagerank.py); fixed-round oracles that must execute exactly k joins
    pass ``early_stop=False``.
    """
    if max_iter < 1:
        raise ValueError(f"shortest_paths: max_iter must be >= 1, got {max_iter}")
    spark = g.edges.sparkSession
    w = F.lit(1).cast("long") if weight is None else weight.cast("long")
    num_edges = g.edges.count()
    # src-clustered loop copy (cluster_for_loop): each relaxation round
    # streams it with zero exchange and zero sort; released on return
    edges = cluster_for_loop(
        g.edges.select("src", "dst", w.alias("w")), "src", num_rows=num_edges
    )
    verts = g.vertices.select("vid")

    ckpt = CheckpointManager(checkpoint_dir, "sssp") if checkpoint_dir else None
    state = verts.select(
        "vid",
        F.when(F.col("vid") == source, F.lit(0)).otherwise(F.lit(None))
        .cast("long")
        .alias("dist"),
    )
    start_iter = 0
    if ckpt and resume:
        loaded = ckpt.load_latest(spark)
        if loaded is not None:
            state, start_iter = loaded
            start_iter += 1

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.time()
        cand = (
            edges.join(
                state.select("vid", "dist")
                .filter(F.col("dist").isNotNull())
                .hint("shuffle_hash"),
                edges.src == F.col("vid"), "inner")
            .groupBy(edges.dst.alias("vid"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
        )
        # NULL-safe change flag rides the update projection (round 6 —
        # see components.py): the old dist is on the row, so the former
        # state ⋈ prev join + aggregate per relax round is a comparison.
        new_state = verts.join(
            state.select("vid", "dist").hint("shuffle_hash"), "vid", "left"
        ).join(
            cand.hint("shuffle_hash"), "vid", "left"
        ).select(
            "vid",
            F.least(F.col("dist"), F.col("nd")).alias("dist"),
            (~F.least(F.col("dist"), F.col("nd")).eqNullSafe(F.col("dist")))
            .alias("_chg"),
        )
        if ckpt:
            state = ckpt.write_state(new_state, it)
        else:
            state = new_state.transform(truncate_lineage)
        changed = None
        if early_stop:
            # one agg over the materialized state
            changed = (
                state.agg(F.sum(F.col("_chg").cast("long")).alias("chg"))
                .collect()[0][0]
            )
        m = {"iteration": it, "wall_sec": round(time.time() - t0, 3),
             "messages": num_edges}
        if changed is not None:
            m["changed"] = int(changed)
        metrics.append(m)
        if ckpt:
            ckpt.log_entry(it, m)
        if changed == 0:
            break

    edges.unpersist()
    return state.select("vid", "dist"), metrics
