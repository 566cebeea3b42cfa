"""Distributed maximal matching — deterministic local-minima edge rounds.

The edge analog of algos/mis.py (Luby MIS run on the line graph, without
materializing it): every live edge carries a fixed pseudo-random priority
(the portable hash mix over its canonical endpoint pair); an edge joins the
matching when its (priority, u, v) triple is the strict minimum among ALL
live edges touching either endpoint; matched vertices retire every edge
they touch; repeat until no live edge remains. Israeli & Itai (1986) give
the O(log n) expected round count for random priorities; with a *fixed*
priority the result is exactly the sequential greedy matching in priority
order — deterministic across runs, partitionings, and engines, which makes
it SQL-verifiable (the contract oracle unrolls the identical rounds).

Parity note: the reference engine (fgavilondo/neo4j-webgraph) has no
matching operator — this row extends the link-analysis family the same way
g_mis / g_msf do, with the same round-unrolled oracle discipline.

Physical plan per round (no line graph, no cartesian):
  1. ends = live edges exploded to both endpoints (2|E| skinny rows of
     (vid, p, u, v) — longs only, never content).
  2. per-vertex min (p, u, v): one map-side-combining min aggregate; hub
     skew compresses at the mappers exactly like components.py.
  3. winners = edges whose triple equals the min at BOTH endpoints — two
     equi-joins of the live frame against the V-sized min frame.
  4. live edges shrink by two anti-joins against the matched-vertex set;
     localCheckpoint truncates lineage; zero live edges terminates.

Progress is guaranteed (the globally-minimal live edge always wins its
round), so non-convergence within max_iter is a correctness failure —
the loop raises rather than return a non-maximal matching.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, truncate_lineage
from webgraph.dedup import POLY_MOD, _MIX_BASE
from webgraph.metrics import iteration_metrics


def edge_priority_expr(u, v, seed: int) -> F.Column:
    """Portable per-edge priority over the canonical (u < v) pair — two
    mix rounds so the priority is non-monotone in BOTH endpoints (a
    single linear pass leaves p monotone in v for fixed u, which chains
    adjacent edges into long sequential-greedy dependency runs and
    stretches the round count; measured 23 -> 8 rounds at sf0.01):
    (((u % P) * MIX % P + v % P) * MIX + seed) % P. Max intermediate is
    (2P-2) * MIX ≈ 5.3e18 < 2^63 — overflow-safe as BIGINT in both Spark
    and DuckDB. Collisions across edges are broken by the strict
    (p, u, v) lexicographic order, identical on both engines."""
    return (
        ((F.col(u) % POLY_MOD) * F.lit(_MIX_BASE) % POLY_MOD + F.col(v) % POLY_MOD)
        * F.lit(_MIX_BASE)
        + F.lit(seed)
    ) % POLY_MOD


def canonical_edges(edges: DataFrame, seed: int) -> DataFrame:
    """Undirected canonical pairs (u < v, self-loops dropped, deduplicated)
    with their fixed priority. Direction is a crawl artifact for matching,
    same as CC/LP (common.py:symmetrize)."""
    return (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .withColumn("p", edge_priority_expr("u", "v", seed))
    )


def maximal_matching(
    g: EncodedGraph,
    seed: int = 42,
    max_iter: int = 30,
) -> tuple[DataFrame, list[dict]]:
    """Returns (matching DataFrame ``(u, v, round)``, iteration metrics).
    ``round`` is the 0-based round the edge entered the matching. Raises
    if live edges remain after ``max_iter`` rounds (the result would not
    be maximal — a correctness failure, not a budget knob)."""
    live = canonical_edges(g.edges, seed).transform(truncate_lineage)

    matched_parts: list[DataFrame] = []
    metrics: list[dict] = []
    converged = False
    for it in range(max_iter):
        t0 = time.time()
        trip = F.struct("p", "u", "v")
        ends = live.select(F.col("u").alias("vid"), trip.alias("t")).unionByName(
            live.select(F.col("v").alias("vid"), trip.alias("t"))
        )
        vmin = ends.groupBy("vid").agg(F.min("t").alias("m"))
        winners = (
            live.join(
                vmin.select(F.col("vid").alias("u"), F.col("m").alias("mu")), "u"
            )
            .join(vmin.select(F.col("vid").alias("v"), F.col("m").alias("mv")), "v")
            .filter((trip == F.col("mu")) & (trip == F.col("mv")))
            .select("u", "v")
            .transform(truncate_lineage)
        )
        n_won = winners.count()
        matched_parts.append(winners.withColumn("round", F.lit(it)))

        matched_vids = (
            winners.select(F.col("u").alias("vid"))
            .unionByName(winners.select(F.col("v").alias("vid")))
        )
        live = (
            live.join(matched_vids.withColumnRenamed("vid", "u"), "u", "left_anti")
            .join(matched_vids.withColumnRenamed("vid", "v"), "v", "left_anti")
            .transform(truncate_lineage)
        )
        n_live = live.count()
        metrics.append(
            iteration_metrics(it, time.time() - t0, messages=n_won, changed=n_live)
        )
        if n_live == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"maximal_matching: {max_iter} rounds left live edges — raise "
            "max_iter (result would not be maximal)"
        )
    out = matched_parts[0]
    for part in matched_parts[1:]:
        out = out.unionByName(part)
    return out.select("u", "v", "round"), metrics
