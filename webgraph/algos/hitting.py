"""Truncated hitting time to a target set — expected random-walk steps
(Sarkar & Moore 2007), capped at a horizon so it is finite everywhere
and computable in `horizon` backup rounds:

    h(v) = 0                                   v in targets
    h(v) = min(H, 1 + avg_{v->u} h(u))          outdeg(v) > 0
    h(v) = H                                    dangling non-target

Value iteration from h0 = (0 on targets, H elsewhere) is monotone
DECREASING, so a zero-change round is the fixpoint and early-stop is
bit-identical to running all rounds. The state is kept in integer
MICRO-steps (h_e6) and the neighbor average uses integer division, so
every round's state is integer-exact — the unrolled-SQL oracle replays
it digit-for-digit with `//`, no float drift across engines (the
SimRank/coloring convention: define the engine on integers, then the
oracle is exact rather than allclose).

Per-round shape: one shuffle join of the stationary persisted edge
table against the (vid, h) state, then a (src)-keyed SUM/COUNT — the
out-degree falls out of the same aggregate, so no degree table and no
second shuffle. This is the PageRank/Katz/SSSP plan with avg-plus-one
in place of the semiring combine; the 120M-edge scaling evidence
transfers. With ``checkpoint_dir`` each round commits through
CheckpointManager — resumable like PR/CC/LP/SSSP.

Reference parity note: neo4j-webgraph exposes no hitting-time
analytics; this extends the link-analysis family (random-walk
proximity for link prediction / crawl prioritization) beyond the
reference surface.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage
from webgraph.checkpoint import CheckpointManager

SCALE = 1_000_000


def truncated_hitting_time(
    g: EncodedGraph,
    targets: DataFrame,
    horizon: int = 10,
    rounds: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    early_stop: bool = True,
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid, h_e6) with h_e6 in [0, horizon*1e6], and
    per-round metrics).

    ``targets``: a (vid) DataFrame; hitting-time target sets are seed /
    hub sized in every published use, so it rides in as a broadcast
    flag on the state — a V-sized target set would make h identically
    0/1 and is not worth a shuffle.

    ``rounds`` defaults to ``horizon``: h after k backups is exact for
    walks of <= k steps, so `horizon` rounds realize the definition;
    more rounds cannot change it (the cap binds). ``early_stop`` breaks
    on a zero-change round (monotone-decreasing integer state, so this
    is the fixpoint — bit-identical, only cheaper); fixed-round oracles
    pass ``early_stop=False``.
    """
    if horizon < 1:
        raise ValueError(f"truncated_hitting_time: horizon must be >= 1, got {horizon}")
    rounds = horizon if rounds is None else rounds
    if rounds < 1:
        raise ValueError(f"truncated_hitting_time: rounds must be >= 1, got {rounds}")
    spark = g.edges.sparkSession
    cap = horizon * SCALE
    num_edges = g.edges.count()
    # dst-clustered loop copy (cluster_for_loop): the per-round gather
    # joins on dst and streams it exchange- and sort-free; released on
    # return
    edges = cluster_for_loop(
        g.edges.select("src", "dst"), "dst", num_rows=num_edges
    )
    verts = g.vertices.select("vid").join(
        F.broadcast(targets.select("vid").distinct().withColumn("_t", F.lit(True))),
        "vid",
        "left",
    ).select("vid", F.coalesce(F.col("_t"), F.lit(False)).alias("is_tgt"))

    ckpt = CheckpointManager(checkpoint_dir, "hitting") if checkpoint_dir else None
    state = verts.select(
        "vid",
        "is_tgt",
        F.when(F.col("is_tgt"), F.lit(0)).otherwise(F.lit(cap))
        .cast("long")
        .alias("h"),
    )
    start_iter = 0
    if ckpt and resume:
        loaded = ckpt.load_latest(spark)
        if loaded is not None:
            state, start_iter = loaded
            start_iter += 1

    metrics: list[dict] = []
    for it in range(start_iter, rounds):
        t0 = time.time()
        # gather h over OUT-neighbors; COUNT(*) is the out-degree because
        # the state has a row for every vid — one aggregate, no degree
        # table, map-side partial combine absorbs hub fan-in
        nbr = (
            edges.join(
                state.select(F.col("vid").alias("dst"), "h").hint("shuffle_hash"),
                "dst",
                "inner",
            )
            .groupBy(F.col("src").alias("vid"))
            .agg(F.sum("h").alias("hsum"), F.count("*").alias("deg"))
        )
        # The state is verts-shaped (one row per vid, is_tgt carried), so
        # it replaces `verts` as the left side and the old h rides the
        # update row: the change flag becomes a comparison instead of the
        # former state ⋈ prev join + aggregate per round (components.py).
        new_h = (
            F.when(F.col("is_tgt"), F.lit(0))
            .when(
                F.col("deg").isNotNull(),
                F.least(
                    F.lit(cap),
                    F.lit(SCALE) + F.expr("hsum div deg"),
                ),
            )
            .otherwise(F.lit(cap))
            .cast("long")
        )
        new_state = (
            state.select("vid", "is_tgt", F.col("h").alias("_old"))
            .join(nbr, "vid", "left")
            .select(
                "vid",
                "is_tgt",
                new_h.alias("h"),
                (new_h != F.col("_old")).alias("_chg"),
            )
        )
        if ckpt:
            state = ckpt.write_state(new_state, it)
        else:
            state = new_state.transform(truncate_lineage)
        changed = None
        if early_stop:
            changed = int(
                state.agg(
                    F.sum(F.col("_chg").cast("long")).alias("chg")
                ).collect()[0][0] or 0
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
    return state.select("vid", F.col("h").alias("h_e6")), metrics
