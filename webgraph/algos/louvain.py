"""Louvain community detection — distributed local-move + contraction.

The missing optimizer next to g_modularity (community.py scores a
partition; label propagation was the only method that *produced* one).
Classic Louvain (Blondel et al. 2008) alternates:

  1. local move: each vertex greedily joins the neighbor community with
     the best modularity gain;
  2. contraction: communities collapse to vertices, edge weights sum
     (the rollup shape g_domain_pagerank already uses).

Distributed reformulation — three deviations from the sequential paper,
each forced by determinism or parallelism, each pinned by tests:

- **Simultaneous moves with a parity gate.** Sequential Louvain moves one
  vertex at a time; naive simultaneous moves oscillate (two vertices
  swapping communities forever). Round r only lets vertices with
  pmod(vid + r, 2) == 0 move — neighbors on opposite parities can't
  swap in the same round, and every vertex gets a move chance every
  2 rounds. (Same trick as semi-synchronous LP literature.)
- **Integer gain arithmetic.** The gain of moving i into C is
  ΔQ ∝ k_{i,C} − Σtot_C·k_i/(2m). Scaled by S = 2m everything is an
  exact integer over integer edge weights: score = S·k_{i,C} −
  Σtot'_C·k_i (Σtot' excludes i for its own community). Float sums
  re-ordered by a different partitioning could flip an argmax at the
  last ulp; longs cannot — the mapping is bit-identical under any
  repartitioning. (At S·k ≈ 2^63 scale switch the two products to
  DECIMAL(38,0); the contract scale never gets near it.)
- **Per-level acceptance guard.** Simultaneous moves compute gains
  against the pre-round state, so a round *can* overshoot. Rather than
  prove convergence, measure it: after each level the scaled modularity
  Q·S² = Σ_c [S·w_in(c) − Σtot(c)²] (integer again) is compared to the
  previous level's; a level that fails to improve is discarded and the
  loop stops. Modularity per level is therefore non-decreasing by
  construction, and contraction preserves Q exactly, so the guard
  composed across levels bounds the whole run.

Scale shape per round: one edge ⋈ state join (the stationary persisted
edge table, only the small (vid, gid, k) state re-shuffles — the
PageRank economics), one (vertex, community)-keyed partial-aggregating
sum, one community-keyed degree rollup that is broadcast-sized after the
first level. Contraction is one group-by on the tagged edges. No
all-pairs anything; hub skew is absorbed by map-side partial aggregation
exactly as in pagerank.py.
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


def _q_num(edges: DataFrame, state: DataFrame, s: int) -> int:
    """Scaled modularity Q·S² = Σ_c [S·w_in(c) − Σtot(c)²] as an exact
    long. `edges` is the symmetric weighted multiset (both directions +
    self-loops), `state` carries (vid, gid, k)."""
    m_src = state.select(F.col("vid").alias("src"), F.col("gid").alias("gsrc"))
    m_dst = state.select(F.col("vid").alias("dst"), F.col("gid").alias("gdst"))
    w_in = (
        edges.join(m_src, "src")
        .join(m_dst, "dst")
        .filter(F.col("gsrc") == F.col("gdst"))
        .groupBy(F.col("gsrc").alias("gid"))
        .agg(F.sum("w").alias("w_in"))
    )
    tot = state.groupBy("gid").agg(F.sum("k").alias("tot"))
    row = (
        tot.join(w_in, "gid", "left")
        .agg(
            F.sum(
                F.lit(s) * F.coalesce(F.col("w_in"), F.lit(0))
                - F.col("tot") * F.col("tot")
            ).alias("q")
        )
        .collect()[0]
    )
    return int(row["q"] or 0)


def louvain(
    g: EncodedGraph,
    max_levels: int = 5,
    max_rounds: int = 10,
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid, gid) mapping over the ORIGINAL vertex set and
    per-level metrics). gids are vids of current community exemplars —
    stable, deterministic labels (no hash, no nondeterministic id).

    max_levels: contraction levels; max_rounds: local-move rounds per
    level (each round is one shuffle join; a round moving nothing ends
    the level early).
    """
    spark = g.edges.sparkSession
    # level-1 weighted symmetric multiset: w=1 per direction, no self-loops
    # dst-clustered level cache: the per-round k_{i,C} join keys on dst,
    # so local-move rounds stream it exchange- and sort-free
    e_rows = 2 * g.edges.count()
    sym_w = symmetrize(g.edges).withColumn("w", F.lit(1).cast("long"))
    # dst-clustering amortizes one up-front exchange over the level's
    # local-move rounds; with a single round there is nothing to amortize
    # (the round's one dst-keyed join pays the same exchange either way),
    # so a 1-round schedule persists without the extra repartition —
    # strictly cheaper at any scale, identical result.
    if max_rounds > 1:
        edges = cluster_for_loop(sym_w, "dst", num_rows=e_rows)
    else:
        edges = sym_w.persist()
    s = int(edges.agg(F.sum("w")).collect()[0][0] or 0)
    full_map = g.vertices.select("vid", F.col("vid").alias("gid")).transform(truncate_lineage)
    if s == 0:  # no edges: every vertex is its own community
        edges.unpersist()
        return full_map, []

    metrics: list[dict] = []
    # singleton-partition baseline: w_in = 0 everywhere, Q·S² = −Σ k²
    deg0 = edges.groupBy("src").agg(F.sum("w").alias("k"))
    q_prev = int(
        deg0.agg(F.sum(-F.col("k") * F.col("k")).alias("q")).collect()[0]["q"]
    )

    for level in range(max_levels):
        t0 = time.time()
        deg = edges.groupBy(F.col("src").alias("vid")).agg(F.sum("w").alias("k"))
        state = deg.select("vid", F.col("vid").alias("gid"), "k").transform(truncate_lineage)
        n_verts = state.count()

        rounds = 0
        moved_total = 0
        for r in range(max_rounds):
            comm = state.groupBy("gid").agg(F.sum("k").alias("tot"))
            # k_{i,C}: weight from i to each neighbor community (self-loops
            # excluded — they move with i and cancel in the gain)
            contrib = (
                edges.filter(F.col("src") != F.col("dst"))
                .join(
                    state.select(
                        F.col("vid").alias("dst"), F.col("gid").alias("ngid")
                    ).hint("shuffle_hash"),
                    "dst",
                )
                .groupBy(F.col("src").alias("vid"), "ngid")
                .agg(F.sum("w").alias("kic"))
            )
            scored = (
                contrib.join(state, "vid")
                .join(
                    comm.select(F.col("gid").alias("ngid"), "tot"), "ngid"
                )
                .withColumn(
                    "score",
                    F.lit(s) * F.col("kic")
                    - (
                        F.col("tot")
                        - F.when(F.col("ngid") == F.col("gid"), F.col("k")).otherwise(
                            F.lit(0)
                        )
                    )
                    * F.col("k"),
                )
            )
            best_ext = (
                scored.filter(F.col("ngid") != F.col("gid"))
                .groupBy("vid")
                .agg(
                    F.max(
                        F.struct(
                            F.col("score").alias("s"), (-F.col("ngid")).alias("ng")
                        )
                    ).alias("b")
                )
                .select(
                    "vid",
                    F.col("b.s").alias("ext_score"),
                    (-F.col("b.ng")).alias("ext_gid"),
                )
            )
            own = scored.filter(F.col("ngid") == F.col("gid")).select(
                "vid", F.col("score").alias("own_kic_score")
            )
            stay_tot = comm.select(F.col("gid"), "tot")
            new_state = (
                state.join(best_ext, "vid", "left")
                .join(own, "vid", "left")
                .join(stay_tot, "gid", "left")
                .withColumn(
                    "stay_score",
                    F.coalesce(
                        F.col("own_kic_score"),
                        -(F.col("tot") - F.col("k")) * F.col("k"),
                    ),
                )
                .withColumn(
                    "move",
                    (F.pmod(F.col("vid") + F.lit(r), F.lit(2)) == 0)
                    & F.col("ext_score").isNotNull()
                    & (F.col("ext_score") > F.col("stay_score")),
                )
                .select(
                    "vid",
                    F.when(F.col("move"), F.col("ext_gid"))
                    .otherwise(F.col("gid"))
                    .alias("gid"),
                    "k",
                    F.col("move").cast("long").alias("moved"),
                )
            )
            new_state = new_state.transform(truncate_lineage)
            moved = int(new_state.agg(F.sum("moved")).collect()[0][0] or 0)
            state = new_state.drop("moved")
            rounds = r + 1
            moved_total += moved
            if moved == 0:
                break

        q_new = _q_num(edges, state, s)
        lvl = {
            "level": level,
            "rounds": rounds,
            "moved": moved_total,
            "q_num": q_new,
            "q_den": s * s,
            "wall_sec": round(time.time() - t0, 3),
        }
        accepted = q_new > q_prev
        lvl["accepted"] = accepted
        if not accepted:
            # the guard: a level that fails to STRICTLY improve Q is
            # discarded (full_map untouched) and the loop ends — per-level
            # modularity is non-decreasing by construction
            metrics.append(lvl)
            break
        q_prev = q_new
        # compose onto the original vertex set; LEFT join so a vertex
        # with no edges (possible in a hand-built EncodedGraph whose
        # vertices frame is wider than its edge endpoints) keeps its
        # identity label instead of dropping out
        full_map = (
            full_map.withColumnRenamed("gid", "mid")
            .join(
                state.select(F.col("vid").alias("mid"), "gid"), "mid", "left"
            )
            .select("vid", F.coalesce("gid", "mid").alias("gid"))
            .transform(truncate_lineage)
        )
        n_comm = state.select("gid").distinct().count()
        lvl["n_communities"] = n_comm
        metrics.append(lvl)
        if n_comm == n_verts:
            break  # contraction would be the identity
        # contract: communities become vertices, weights sum; intra-pair
        # weight lands on the (g, g) self-loop row (counted once, weight
        # already includes both directions — total weight S is preserved)
        m_src = state.select(F.col("vid").alias("src"), F.col("gid").alias("gsrc"))
        m_dst = state.select(F.col("vid").alias("dst"), F.col("gid").alias("gdst"))
        # contraction never grows the edge multiset, so the previous
        # level's row count is a valid sizing bound
        contracted = (
            edges.join(m_src.hint("shuffle_hash"), "src")
            .join(m_dst.hint("shuffle_hash"), "dst")
            .groupBy(F.col("gsrc").alias("src"), F.col("gdst").alias("dst"))
            .agg(F.sum("w").alias("w"))
        )
        # same 1-round rule as the level-1 cache: only re-cluster when
        # the next level's local-move rounds can amortize the exchange
        if max_rounds > 1:
            nxt = cluster_for_loop(contracted, "dst", num_rows=e_rows)
        else:
            nxt = contracted.persist()
        e_rows = nxt.count()
        edges.unpersist()
        edges = nxt

    edges.unpersist()
    return full_map, metrics


def refine_connected(
    labels: DataFrame, g: EncodedGraph, max_iter: int = 50
) -> tuple[DataFrame, list[dict]]:
    """Leiden-style connectivity refinement (Traag et al. 2019, "From
    Louvain to Leiden": Louvain can emit arbitrarily badly connected —
    even disconnected — communities; Leiden's defining guarantee is that
    every community is internally connected). This is that guarantee as
    a post-pass over ANY (vid, gid) partition: each community is split
    into its connected parts, each part relabeled by its min-vid
    exemplar (same stable-label convention as louvain/components).

    Splitting a disconnected community can only RAISE modularity: no
    internal edge crosses the split (the parts are disconnected), so
    Σ_c w_in is unchanged while Σ_c tot_c² strictly shrinks — the
    refined partition is never worse, and connected communities pass
    through untouched (pinned by tests).

    Plan shape: two broadcast-or-shuffle hash joins tag each edge with
    its endpoint communities, the same-community filter keeps the
    within-community multiset, and :func:`connected_components` runs its
    already-audited min-label exchange over that (smaller) edge set.
    Nothing new shuffles content; state rows are (vid, gid) longs.
    """
    from webgraph.algos.components import connected_components

    lsrc = labels.select(F.col("vid").alias("src"), F.col("gid").alias("gsrc"))
    ldst = labels.select(F.col("vid").alias("dst"), F.col("gid").alias("gdst"))
    within = (
        g.edges.join(lsrc, "src")
        .join(ldst, "dst")
        .filter(F.col("gsrc") == F.col("gdst"))
        .select("src", "dst")
    )
    sub = EncodedGraph(
        vertices=labels.select("vid"),
        edges=within,
        num_vertices=-1,  # unused by connected_components
    )
    comp, metrics = connected_components(sub, max_iter=max_iter, collect_skew=False)
    return comp.select("vid", F.col("component").alias("gid")), metrics
