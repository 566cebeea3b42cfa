"""Connected components — union-find via iterative min-label exchange
(north_rule wording), exact at convergence.

Each vertex starts labeled with its own vid; every iteration each vertex
takes the minimum label among itself and its (undirected) neighbors;
fixpoint when zero labels change. Deterministic: min is order-insensitive.

Physical plan per iteration:
  1. sym_edges ⋈ labels on src            — stationary big side (symmetrized
     edges built once, repartitioned by src, persisted).
  2. groupBy(dst).min(label)              — hash agg, map-side combine makes
     hub skew cheap (min compresses at the mappers).
  3. outer-join with current labels, take least — vertices with no
     neighbors keep their own label.
  4. changed-count agg drives convergence (A9); checkpoint per iteration.

Web graphs have small effective diameter, so min-label exchange converges
in few iterations; a pointer-jumping variant (label-graph shortcutting)
would cut worst-case chains but is unnecessary for the target topology.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import (
    EncodedGraph,
    cluster_for_loop,
    symmetrize,
    truncate_lineage,
)
from webgraph.checkpoint import CheckpointManager
from webgraph.metrics import iteration_metrics, partition_skew


def connected_components(
    g: EncodedGraph,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    collect_skew: bool = True,
    _probe=None,
    initial_labels: DataFrame | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Returns (labels DataFrame ``(vid, component)``, iteration metrics).
    ``component`` is the minimum vid in the component (stable, comparable
    across runs). ``_probe(it, changed_df)`` is a test seam that receives
    the convergence-count frame before it executes (plan assertions).

    ``initial_labels`` (vid, component) warm-starts the min-label
    propagation — the incremental-maintenance pattern: labels from a
    PRIOR run on a SUBGRAPH of the current edge set are a valid starting
    point because (a) a subgraph's min-reachable label is always >= the
    full graph's (edges only merge components under append-only
    maintenance), and (b) each label is itself a vid inside the vertex's
    component, so propagating minima still bottoms out at the component's
    true minimum. The warm fixpoint is therefore IDENTICAL to the cold
    one — warm starting buys iterations, never correctness. Vertices
    absent from ``initial_labels`` fall back to their own vid."""
    spark = g.edges.sparkSession
    # Explicit src-clustering for the stationary big side: symmetrize ends
    # in a (src,dst)-keyed dedup whose layout does NOT satisfy the loop's
    # src clustering, so without this the full symmetrized edge table
    # re-exchanged EVERY iteration. Partition count sized from the 2E
    # upper bound (g.edges is already cached, so the count is free).
    sym = cluster_for_loop(
        symmetrize(g.edges), "src", num_rows=2 * g.edges.count()
    )
    num_msgs = sym.count()

    ckpt = CheckpointManager(checkpoint_dir, "components") if checkpoint_dir else None
    labels = g.vertices.select("vid", F.col("vid").alias("component"))
    if initial_labels is not None:
        labels = (
            g.vertices.select("vid")
            .join(
                initial_labels.select("vid", F.col("component").alias("_w")),
                "vid",
                "left",
            )
            .select("vid", F.coalesce("_w", F.col("vid")).alias("component"))
        )
    start_iter = 0
    if ckpt and resume:
        loaded = ckpt.load_latest(spark)
        if loaded is not None:
            labels, start_iter = loaded
            start_iter += 1

    metrics: list[dict] = []
    skew = {}
    if collect_skew:
        skew = {f"edges_{k}": v for k, v in partition_skew(sym).items()}

    for it in range(start_iter, max_iter):
        t0 = time.time()
        # Shuffled hash joins, build side = the V-shaped label state: the
        # src-clustered edge cache streams with zero exchange and zero
        # sort; only the small label frame shuffles to meet it (sort-merge
        # would re-sort all E rows every iteration). One row per vid on
        # the build side — hash-uniform, no skew.
        lbl = labels.select("vid", "component").hint("shuffle_hash")
        neighbor_min = (
            sym.join(lbl, sym.src == lbl["vid"], "inner")
            .groupBy(sym.dst.alias("vid"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # The change flag rides the update projection (round 6): the old
        # label is already on the row here, so `component != prev` costs a
        # comparison — the former separate labels ⋈ prev join to count
        # changes re-shuffled the V-sized state once more EVERY round.
        new_labels = (
            labels.select("vid", "component")
            .join(neighbor_min.hint("shuffle_hash"), "vid", "left")
            .select(
                "vid",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_min"), F.col("component")) < F.col("component"))
                .alias("_chg"),
            )
        )
        # Materialize FIRST (one execution of the join+agg job), then count
        # changes from the materialized frame — the pagerank.py pattern.
        # Counting over the lazy plan and then checkpointing would execute
        # the identical uncached iteration twice (2x every shuffle at
        # scale). The flag column is carried in the checkpointed state and
        # stripped at return; resume tolerates states with or without it.
        if ckpt:
            labels = ckpt.write_state(new_labels, it)
        else:
            labels = new_labels.transform(truncate_lineage)
        changed_df = labels.filter(F.col("_chg"))
        if _probe is not None:
            _probe(it, changed_df)
        changed = changed_df.count()
        wall = time.time() - t0
        m = iteration_metrics(
            it, wall, messages=num_msgs, changed=changed,
            extra=skew if it == start_iter else {},
        )
        metrics.append(m)
        if ckpt:
            ckpt.log_entry(it, m)

        if changed == 0:
            break

    return labels.select("vid", "component"), metrics
