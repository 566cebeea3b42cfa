"""Katz centrality — truncated-series attenuation centrality.

    x_{t+1}(v) = beta + alpha * sum_{u->v} x_t(u),   x_0(v) = beta

After k iterations x equals the Katz series truncated at path length k
(sum_{j<=k} alpha^j * (#paths of length j into v) * beta), so a
fixed-iteration run is EXACTLY SQL-expressible — same unrolled-oracle
story as PageRank, with none of PageRank's dangling-mass correction
(Katz attenuates instead of redistributing; the reference ranks pages by
raw in-degree, README.md:107-112 — Katz is in-degree's transitive
closure, PageRank its normalized cousin).

Physical plan per iteration: one edges ⋈ scores shuffle join + one hash
aggregate on dst — identical shape to a PageRank step, so every scale
property of that loop (stationary persisted edge side, AQE skew
handling, O(1) lineage via per-iteration checkpoint) carries over.
With ``checkpoint_dir`` the per-iteration state commits through
CheckpointManager (parquet + manifest), resumable like PR/CC/LP/HITS.
"""

from __future__ import annotations

import time
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage
from webgraph.checkpoint import CheckpointManager


def katz_centrality(
    g: EncodedGraph,
    alpha: float = 0.05,
    beta: float = 1.0,
    max_iter: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    tol: float = 0.0,
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid, katz) DataFrame, per-iteration metrics).

    ``alpha`` must stay below 1/lambda_max(A) for the infinite series to
    converge; the truncated k-step result is well-defined for any alpha
    and is what the contract oracle checks.

    ``tol`` > 0 turns on the convergence pass: after each materialized
    round, one join+agg computes delta = sum(|x_t - x_{t-1}|) and the
    loop breaks when delta < tol (same shape as PageRank's tol loop).
    The same pass doubles as the divergence guard: for alpha below
    1/lambda_max the per-round increments shrink geometrically (ratio
    ~ alpha*lambda_max), so a round whose delta EXCEEDS the previous
    round's signals alpha > 1/lambda_max — the series is diverging and
    "iterating to convergence" would never terminate; a RuntimeWarning
    fires. tol = 0 (the default, and what the fixed-iteration contract
    oracle uses) skips the extra pass entirely.
    """
    if max_iter < 1:
        raise ValueError(f"katz_centrality: max_iter must be >= 1, got {max_iter}")
    spark = g.edges.sparkSession
    num_edges = g.edges.count()
    # Src-clustered loop copy (cluster_for_loop): the per-iteration join
    # then streams it with zero exchange and zero sort. Costs one extra
    # in-memory copy of (src, dst) for the loop's lifetime — released
    # before returning — where the shared graph cache's (src,dst)-hash
    # layout would re-exchange all E rows every iteration.
    edges = cluster_for_loop(
        g.edges.select("src", "dst"), "src", num_rows=num_edges
    )
    verts = g.vertices.select("vid")

    ckpt = CheckpointManager(checkpoint_dir, "katz") if checkpoint_dir else None
    state = verts.select("vid", F.lit(float(beta)).alias("katz"))
    start_iter = 0
    if ckpt and resume:
        loaded = ckpt.load_latest(spark)
        if loaded is not None:
            state, start_iter = loaded
            start_iter += 1

    metrics: list[dict] = []
    prev_delta = None
    for it in range(start_iter, max_iter):
        t0 = time.time()
        st = state.hint("shuffle_hash")
        contrib = (
            edges.join(st, edges.src == st["vid"], "inner")
            .groupBy(edges.dst.alias("vid"))
            .agg(F.sum("katz").alias("inflow"))
        )
        new_state = verts.join(contrib.hint("shuffle_hash"), "vid", "left").select(
            "vid",
            (
                F.lit(float(beta))
                + F.lit(float(alpha)) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("katz"),
        )
        prev_state = state
        if ckpt:
            state = ckpt.write_state(new_state, it)
        else:
            state = new_state.transform(truncate_lineage)
        delta = None
        if tol > 0:
            delta = (
                state.join(prev_state.withColumnRenamed("katz", "prev"), "vid")
                .agg(F.sum(F.abs(F.col("katz") - F.col("prev"))))
                .collect()[0][0]
            )
        m = {"iteration": it, "wall_sec": round(time.time() - t0, 3),
             "messages": num_edges}
        if delta is not None:
            m["delta"] = float(delta)
        metrics.append(m)
        if ckpt:
            ckpt.log_entry(it, m)
        if delta is not None:
            if prev_delta is not None and delta > prev_delta:
                warnings.warn(
                    f"katz_centrality: delta grew {prev_delta:.4g} -> "
                    f"{delta:.4g} at iteration {it}; alpha={alpha} likely "
                    "exceeds 1/lambda_max — the series is diverging and "
                    "will never meet tol",
                    RuntimeWarning,
                    stacklevel=2,
                )
            if delta < tol:
                break
            prev_delta = delta

    edges.unpersist()
    return state, metrics
