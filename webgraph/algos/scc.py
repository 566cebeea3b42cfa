"""Strongly connected components — the web bowtie operator.

The reference's graph is directed (Page-LINKS->Page,
BatchGraphImporter.java edge creation); its analytics stop at in-degree.
SCC is the canonical directed-structure decomposition for link graphs
(the Broder et al. 2000 "bowtie": one giant SCC + IN/OUT tendrils) and
complements the undirected connected_components operator.

Algorithm — iterative forward/backward min-label coloring (the GraphX
SCC formulation; no sequential Tarjan possible distributedly):

    repeat on the remaining subgraph:
      fwd(v) = min vid u with u ->* v   (min-label propagation along edges)
      bwd(v) = min vid u with v ->* u   (same along reversed edges)
      settle every v with fwd(v) = bwd(v) = c: v and c reach each other,
      so scc(v) = c (and c is its SCC's minimum member); the (fwd, bwd)
      pair is constant across an SCC, so whole SCCs settle atomically.
      Remove settled vertices' edges (two anti semi-joins) and repeat.

Each round settles at least the SCC of the remaining minimum vid, so the
outer loop terminates in <= #SCC rounds; on real web graphs almost
everything settles in round 1 (the giant SCC plus every source/sink-side
SCC whose min label reaches symmetrically). Long SCC-chains (a path of
singleton SCCs) degrade toward O(n) rounds — the same known worst case
GraphX documents — so ``max_rounds`` raises rather than silently
returning partial labels (k_core's no-silent-caps rule, kcore.py:14-16).

Inner propagations follow the single-execution iteration discipline
(materialize via localCheckpoint, then count the change against the
materialized frame — pagerank.py:159-174); the edge table is
localCheckpointed per round so lineage stays O(1).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage


def _min_label_fixpoint(verts: DataFrame, edges: DataFrame, src: str, dst: str):
    """labels(v) = min vid u with u ->* v along (src -> dst); returns the
    materialized (vid, label) frame and the number of iterations run."""
    # probe-key-clustered loop copy + shuffled hash joins (pagerank.py
    # pattern): the fixpoint otherwise re-exchanged and re-sorted the
    # edge frame at every min-label round, in both sweep directions
    e = cluster_for_loop(edges.select("src", "dst"), src, num_rows=edges.count())
    labels = verts.select("vid", F.col("vid").alias("label")).transform(truncate_lineage)
    it = 0
    while True:
        it += 1
        incoming = (
            e.join(
                labels.withColumnRenamed("vid", src).hint("shuffle_hash"), src
            )
            .groupBy(F.col(dst).alias("vid"))
            .agg(F.min("label").alias("nbr_min"))
        )
        # change flag rides the update projection (see components.py) —
        # the former new ⋈ old join per min-label round was one extra
        # V-sized shuffle in BOTH sweep directions of EVERY peel round
        new_labels = (
            labels.select("vid", "label")
            .join(incoming.hint("shuffle_hash"), "vid", "left")
            .select(
                "vid",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_min"), F.col("label")) < F.col("label"))
                .alias("_chg"),
            )
            .transform(truncate_lineage)
        )
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels
        if changed == 0:
            e.unpersist()
            return labels.select("vid", "label"), it


def strongly_connected_components(
    g: EncodedGraph,
    max_rounds: int | None = 50,
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid, scc) with scc = the SCC's minimum member vid for
    every vertex of g, and per-round metrics). ``max_rounds`` hit before
    all vertices settle raises RuntimeError (never partial labels)."""
    spark = g.edges.sparkSession
    edges = g.edges.filter(F.col("src") != F.col("dst")).transform(truncate_lineage)
    verts = g.vertices.select("vid").transform(truncate_lineage)
    settled_parts: list[DataFrame] = []
    metrics: list[dict] = []
    rnd = 0
    n_remaining = verts.count()
    while n_remaining > 0:
        if max_rounds is not None and rnd >= max_rounds:
            raise RuntimeError(
                f"strongly_connected_components: hit max_rounds={max_rounds} "
                f"with {n_remaining} vertices unsettled; raise max_rounds — "
                "partial labels are never returned silently"
            )
        t0 = time.time()
        # Trim (Hong et al. 2013, "On fast parallel detection of strongly
        # connected components"): a vertex with no in-edge or no out-edge
        # WITHIN the remaining subgraph cannot lie on a cycle there, and
        # because every earlier round settles whole SCCs the remaining
        # subgraph is a union of intact SCCs — so such a vertex is a
        # singleton SCC (scc = its own vid), settled without paying the
        # two min-label fixpoints. Web graphs are mostly DAG fringe
        # (tendrils, IN/OUT), so iterated trimming removes the bulk of
        # the vertices in a few cheap anti-join rounds.
        n_trimmed = 0
        while True:
            srcs = edges.select(F.col("src").alias("vid"))
            dsts = edges.select(F.col("dst").alias("vid"))
            trivial = (
                verts.join(srcs, "vid", "left_anti")
                .unionByName(verts.join(dsts, "vid", "left_anti"))
                .distinct()
                .transform(truncate_lineage)
            )
            n_triv = trivial.count()
            if n_triv == 0:
                break
            n_trimmed += n_triv
            settled_parts.append(
                trivial.select("vid", F.col("vid").alias("scc"))
            )
            verts = (
                verts.join(trivial, "vid", "left_anti")
                .transform(truncate_lineage)
            )
            keep = verts.select("vid")
            edges = (
                edges.join(keep.withColumnRenamed("vid", "src"), "src", "left_semi")
                .join(keep.withColumnRenamed("vid", "dst"), "dst", "left_semi")
                .transform(truncate_lineage)
            )
        n_remaining = verts.count()
        if n_remaining == 0:
            metrics.append(
                {
                    "iteration": rnd,
                    "wall_sec": round(time.time() - t0, 3),
                    "settled": n_trimmed,
                    "remaining": 0,
                    "trimmed": n_trimmed,
                }
            )
            break
        fwd, fwd_iters = _min_label_fixpoint(verts, edges, "src", "dst")
        bwd, bwd_iters = _min_label_fixpoint(verts, edges, "dst", "src")
        paired = fwd.withColumnRenamed("label", "f").join(
            bwd.withColumnRenamed("label", "b"), "vid"
        )
        settled = (
            paired.filter(F.col("f") == F.col("b"))
            .select("vid", F.col("f").alias("scc"))
            .transform(truncate_lineage)
        )
        n_settled = settled.count()
        settled_parts.append(settled)
        verts = (
            verts.join(settled.select("vid"), "vid", "left_anti")
            .transform(truncate_lineage)
        )
        keep = verts.select("vid")
        edges = (
            edges.join(keep.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("vid", "dst"), "dst", "left_semi")
            .transform(truncate_lineage)
        )
        n_remaining = verts.count()
        metrics.append(
            {
                "iteration": rnd,
                "wall_sec": round(time.time() - t0, 3),
                "settled": n_settled + n_trimmed,
                "remaining": n_remaining,
                "trimmed": n_trimmed,
                "fwd_iters": fwd_iters,
                "bwd_iters": bwd_iters,
            }
        )
        rnd += 1

    if not settled_parts:  # empty graph: no rounds ran
        out = spark.createDataFrame([], "vid long, scc long")
    else:
        out = settled_parts[0]
        for part in settled_parts[1:]:
            out = out.unionByName(part)
    return out, metrics
