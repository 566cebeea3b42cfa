"""Maximal independent set — deterministic Luby-style local-minima rounds.

Every undecided vertex compares a fixed pseudo-random priority against its
undecided neighbors; strict local minima join the MIS, their neighbors
drop out, repeat. With a *fixed* priority (the engine-portable hash mix,
dedup.py:token_hash constants) instead of per-round randomness the result
is exactly the sequential greedy MIS in priority order — deterministic
across runs, partitionings, and engines, which is what makes the result
SQL-verifiable (the contract oracle unrolls the identical rounds).

Rounds: O(log n) expected for hash-uniform priorities (Luby 1986's
analysis applies per-round; the fixed-priority variant is the
"lexicographically-first MIS" which is P-complete sequentially but
converges in few rounds on bounded-expansion/web-shaped graphs — the
round count is asserted, not assumed).

Physical plan per round (the CC/PageRank template):
  1. undecided-neighbor min-priority: one join of the stationary
     symmetrized edge set against the (shrinking) undecided frame +
     a map-side-combining min aggregate — hub skew compresses at the
     mappers, same as components.py.
  2. winners = strict minima (left join, NULL neighbor-min ⇒ isolated
     vertex ⇒ joins the MIS).
  3. excluded = neighbors of winners (semi-join projection).
  4. undecided shrinks by winners ∪ excluded; localCheckpoint truncates
     lineage; zero-undecided terminates.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, symmetrize, truncate_lineage
from webgraph.dedup import POLY_MOD, _MIX_BASE
from webgraph.metrics import iteration_metrics


def priority_expr(vid, seed: int) -> F.Column:
    """Portable priority: ((vid % P) * MIX + seed) % P. Injective for
    vid < P (P prime, MIX % P != 0); the (priority, vid) pair ordering
    below makes the total order strict for arbitrary vids."""
    return ((F.col(vid) % POLY_MOD) * F.lit(_MIX_BASE) + F.lit(seed)) % POLY_MOD


def maximal_independent_set(
    g: EncodedGraph,
    seed: int = 42,
    max_iter: int = 30,
) -> tuple[DataFrame, list[dict]]:
    """Returns (mis DataFrame ``(vid, round)``, iteration metrics).
    ``round`` is the 0-based round the vertex entered the set. Raises if
    the loop does not converge within ``max_iter`` rounds (a correctness
    failure, not a budget knob — maximality would be silently violated)."""
    spark = g.edges.sparkSession
    sym = symmetrize(g.edges).persist()
    sym.count()

    undecided = (
        g.vertices.select("vid")
        .withColumn("p", priority_expr("vid", seed))
        .transform(truncate_lineage)
    )
    mis_parts: list[DataFrame] = []
    metrics: list[dict] = []
    converged = False
    for it in range(max_iter):
        t0 = time.time()
        # min (priority, vid) among each vertex's undecided neighbors;
        # struct min keeps the order strict even under priority collisions
        nbr_min = (
            sym.join(undecided.withColumnRenamed("vid", "src"), "src", "inner")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min(F.struct("p", F.col("src").alias("nvid"))).alias("nm"))
        )
        state = undecided.join(nbr_min, "vid", "left")
        winners = state.filter(
            F.col("nm").isNull()
            | (F.struct("p", F.col("vid").alias("nvid")) < F.col("nm"))
        ).select("vid")
        winners = winners.transform(truncate_lineage)
        n_won = winners.count()
        mis_parts.append(winners.withColumn("round", F.lit(it)))

        excluded = (
            sym.join(winners.withColumnRenamed("vid", "src"), "src", "leftsemi")
            .select(F.col("dst").alias("vid"))
            .distinct()
        )
        undecided = (
            undecided.join(winners, "vid", "left_anti")
            .join(excluded, "vid", "left_anti")
            .transform(truncate_lineage)
        )
        n_left = undecided.count()
        metrics.append(
            iteration_metrics(
                it, time.time() - t0, messages=n_won, changed=n_left
            )
        )
        if n_left == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"maximal_independent_set: {max_iter} rounds did not decide "
            "every vertex — raise max_iter (result would not be maximal)"
        )
    out = mis_parts[0]
    for part in mis_parts[1:]:
        out = out.unionByName(part)
    return out, metrics
