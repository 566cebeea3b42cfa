"""Label propagation (community detection) — synchronous, deterministic.

Init: label(v) = vid. Iteration: v adopts the most frequent label among its
(undirected) neighbors; ties break to the smallest label (deterministic —
north_rule requires reproducible convergence, and async/random LPA is not).
Fixpoint when zero labels change or max_iter.

Physical plan per iteration:
  1. sym_edges ⋈ labels on src                   — stationary big side.
  2. groupBy(dst, label).count()                 — frequency table.
  3. max_by over struct(count, -label) per dst   — argmax with min-label
     tie-break in ONE hash agg (no window/sort).
  4. join with current labels; count changes; checkpoint.

Synchronous LPA can 2-cycle on bipartite structures; the driver detects a
non-decreasing changed-count plateau and stops, reporting convergence state
in the metrics (standard practice; tests pin exact labels on fixtures).
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
from webgraph.metrics import iteration_metrics


def label_propagation(
    g: EncodedGraph,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    _probe=None,
) -> tuple[DataFrame, list[dict]]:
    """Returns (labels DataFrame ``(vid, label)``, iteration metrics).
    ``_probe(it, changed_df)`` is a test seam that receives the
    convergence-count frame before it executes (plan assertions)."""
    spark = g.edges.sparkSession
    # src-clustered loop cache + shuffled hash joins: see components.py
    sym = cluster_for_loop(
        symmetrize(g.edges), "src", num_rows=2 * g.edges.count()
    )
    num_msgs = sym.count()

    ckpt = CheckpointManager(checkpoint_dir, "labelprop") if checkpoint_dir else None
    labels = g.vertices.select("vid", F.col("vid").alias("label"))
    start_iter = 0
    if ckpt and resume:
        loaded = ckpt.load_latest(spark)
        if loaded is not None:
            labels, start_iter = loaded
            start_iter += 1

    metrics: list[dict] = []
    prev_changed = None
    for it in range(start_iter, max_iter):
        t0 = time.time()
        lbl = labels.select("vid", "label").hint("shuffle_hash")
        freq = (
            sym.join(lbl, sym.src == lbl["vid"], "inner")
            .groupBy(sym.dst.alias("vid"), F.col("label"))
            .agg(F.count("*").alias("n"))
        )
        # argmax(n) with min-label tie-break, single aggregate:
        best = freq.groupBy("vid").agg(
            F.max_by("label", F.struct(F.col("n"), -F.col("label"))).alias("nbr_label")
        )
        # Change flag rides the update projection (see components.py):
        # the old label is on the row, so the former labels ⋈ prev join —
        # one extra V-sized shuffle per round — is a comparison instead.
        new_labels = (
            labels.select("vid", "label")
            .join(best.hint("shuffle_hash"), "vid", "left")
            .select(
                "vid",
                F.coalesce(F.col("nbr_label"), F.col("label")).alias("label"),
                (F.coalesce(F.col("nbr_label"), F.col("label")) != F.col("label"))
                .alias("_chg"),
            )
        )
        # Materialize first, then count changes from the materialized frame
        # (see components.py — avoids executing each iteration twice).
        if ckpt:
            labels = ckpt.write_state(new_labels, it)
        else:
            labels = new_labels.transform(truncate_lineage)
        changed_df = labels.filter(F.col("_chg"))
        if _probe is not None:
            _probe(it, changed_df)
        changed = changed_df.count()
        wall = time.time() - t0
        m = iteration_metrics(it, wall, messages=num_msgs, changed=changed)
        metrics.append(m)
        if ckpt:
            ckpt.log_entry(it, m)

        if changed == 0:
            break
        if prev_changed is not None and changed >= prev_changed and it >= 4:
            # oscillation plateau (bipartite 2-cycle): stop deterministically
            m["plateau_stop"] = True
            break
        prev_changed = changed

    return labels.select("vid", "label"), metrics


def seeded_label_spread(
    g: EncodedGraph,
    seeds: DataFrame,
    iters: int = 3,
) -> DataFrame:
    """Semi-supervised label spreading with ABSORBING seeds (the
    hard-label variant of Zhu & Ghahramani 2003's harmonic label
    propagation — the TrustRank-adjacent way quality/spam labels extend
    from a small audited set over the whole web graph). ``seeds`` is
    ``(vid, label)`` with integer classes; seed labels never change,
    every other vertex synchronously adopts the most frequent label
    among its labeled (undirected) neighbors each round — ties to the
    smallest label, so the result is deterministic and the fixed-horizon
    oracle replays it exactly. A vertex with no labeled neighbor stays
    unlabeled that round; re-computation is from scratch each round, so
    a non-seed CAN change class as mass shifts. Returns ``(vid, label,
    is_seed)`` for LABELED vertices only.

    Plan per round: the LPA economics (labelprop.py:32) — stationary
    persisted symmetrized edges, labeled-frontier join, one
    (dst, label) frequency aggregate with map-side combine, one max_by
    argmax; only the vertex-shaped label state re-shuffles."""
    sym = cluster_for_loop(
        symmetrize(g.edges), "src", num_rows=2 * g.edges.count()
    )
    sym.count()
    seed_labels = (
        g.vertices.select("vid")
        .join(seeds.select("vid", F.col("label").cast("long").alias("label")), "vid")
        .persist()
    )
    labels = seed_labels
    for _ in range(iters):
        lbl = labels.hint("shuffle_hash")
        freq = (
            sym.join(lbl, sym.src == lbl["vid"], "inner")
            .groupBy(sym.dst.alias("vid"), F.col("label"))
            .agg(F.count("*").alias("n"))
        )
        best = freq.groupBy("vid").agg(
            F.max_by("label", F.struct(F.col("n"), -F.col("label"))).alias(
                "nbr_label"
            )
        )
        # absorbing: seeds override whatever the neighborhood says
        labels = (
            best.join(seed_labels.withColumnRenamed("label", "_seed"), "vid", "full")
            .select(
                "vid",
                F.coalesce(F.col("_seed"), F.col("nbr_label")).alias("label"),
            )
            .transform(truncate_lineage)
        )
    return labels.join(
        seed_labels.select("vid").withColumn("_s", F.lit(True)), "vid", "left"
    ).select("vid", "label", F.col("_s").isNotNull().alias("is_seed"))
