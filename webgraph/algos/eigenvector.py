"""Eigenvector centrality — normalized power iteration on A^T.

    y_{t+1}(v) = sum_{u->v} x_t(u)
    x_{t+1}   = y_{t+1} / ||y_{t+1}||_1,      x_0(v) = 1/n

The fixed point is the principal eigenvector of A^T (Bonacich
centrality): a page is central in proportion to the centrality of the
pages that link to it, with no teleport (PageRank's alpha) and no
additive base signal (Katz's beta) — the third classic member of the
family the engine already carries (pagerank.py, katz.py; the reference
ranks raw in-degree, README.md:107-112, of which eigenvector centrality
is the spectral limit). A fixed-iteration run is EXACTLY
SQL-expressible: each round is one join+agg plus one scalar L1 total,
so the contract oracle unrolls it verbatim (contract.py:q_g_eigencentrality).

Physical plan per iteration: one edges ⋈ scores shuffle join + one hash
aggregate on dst + one 1-row total cross-joined back BROADCAST — no
driver round-trip inside the loop, same shape as PageRank's dangling-
mass pass (pagerank.py:218-224). The edge side stays persisted and
stationary; only the skinny (vid, x) state re-shuffles, so every scale
property of the PageRank loop (AQE skew handling, O(1) lineage via
per-iteration materialization) carries over. Per-round normalization
also makes overflow impossible at any depth — the un-normalized
truncated series (A^T)^k·1 grows like lambda_max^k and would leave
double range near k≈60 on a 10^9-edge hub graph.

Vertices with no in-links within k hops of mass hold x = 0 — the
standard truncated-power-iteration semantics (they are exactly the
vertices whose true eigenvector weight is 0 when the graph's condensed
DAG keeps them upstream of every recurrent class).

With ``checkpoint_dir`` the per-iteration state commits through
CheckpointManager (parquet + manifest), resumable like PR/CC/LP/Katz.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage
from webgraph.checkpoint import CheckpointManager


def eigenvector_centrality(
    g: EncodedGraph,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    tol: float = 0.0,
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid, eig) DataFrame with sum(eig) == 1, per-iteration
    metrics).

    ``tol`` > 0 turns on the convergence pass: after each materialized
    round one join+agg computes delta = sum(|x_t - x_{t-1}|) and the
    loop breaks when delta < tol (power iteration converges at rate
    lambda_2/lambda_1, so delta shrinks geometrically; no divergence
    guard is needed — normalization bounds the state by construction).
    tol = 0 (the default, and what the fixed-iteration contract oracle
    uses) skips the extra pass entirely.
    """
    if max_iter < 1:
        raise ValueError(
            f"eigenvector_centrality: max_iter must be >= 1, got {max_iter}"
        )
    spark = g.edges.sparkSession
    num_edges = g.edges.count()
    # Src-clustered loop copy (cluster_for_loop): the per-iteration join
    # streams it with zero exchange and zero sort; released on return.
    edges = cluster_for_loop(
        g.edges.select("src", "dst"), "src", num_rows=num_edges
    )
    verts = g.vertices.select("vid")
    n = g.num_vertices
    if n == 0:
        raise ValueError("eigenvector_centrality: empty graph")

    ckpt = CheckpointManager(checkpoint_dir, "eigenvector") if checkpoint_dir else None
    state = verts.select("vid", F.lit(1.0 / n).alias("eig"))
    start_iter = 0
    if ckpt and resume:
        loaded = ckpt.load_latest(spark)
        if loaded is not None:
            state, start_iter = loaded
            start_iter += 1

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.time()
        st = state.hint("shuffle_hash")
        inflow = (
            edges.join(st, edges.src == st["vid"], "inner")
            .groupBy(edges.dst.alias("vid"))
            .agg(F.sum("eig").alias("inflow"))
        )
        based = verts.join(inflow.hint("shuffle_hash"), "vid", "left").select(
            "vid", F.coalesce(F.col("inflow"), F.lit(0.0)).alias("y")
        )
        # L1 total as a broadcast 1-row frame — keeps the normalization
        # inside the plan (no collect inside the loop). total == 0 would
        # mean no edge carries mass (possible only when every mass-
        # holding vertex is a sink); guard it to a clear error rather
        # than a silent NaN state.
        tot = based.agg(F.sum("y").alias("total"))
        new_state = based.crossJoin(F.broadcast(tot)).select(
            "vid",
            F.when(
                F.col("total") > 0, F.col("y") / F.col("total")
            ).alias("eig"),
        )
        prev_state = state
        if ckpt:
            state = ckpt.write_state(new_state, it)
        else:
            state = new_state.transform(truncate_lineage)
        delta = None
        if tol > 0:
            delta = (
                state.join(prev_state.withColumnRenamed("eig", "prev"), "vid")
                .agg(F.sum(F.abs(F.col("eig") - F.col("prev"))))
                .collect()[0][0]
            )
        m = {"iteration": it, "wall_sec": round(time.time() - t0, 3),
             "messages": num_edges}
        if delta is not None:
            m["delta"] = float(delta)
        metrics.append(m)
        if ckpt:
            ckpt.log_entry(it, m)
        if delta is not None and delta < tol:
            break

    # a zero L1 total at any round nulls the state from there on (the
    # `when` has no otherwise); surface it as one check on the final
    # materialized frame instead of a per-iteration scan
    if state.filter(F.col("eig").isNull()).limit(1).count() > 0:
        raise ValueError(
            "eigenvector_centrality: all mass reached sink vertices "
            "(L1 total of A^T x hit 0); the graph has no recurrent "
            "in-link structure to rank"
        )
    edges.unpersist()
    return state, metrics
