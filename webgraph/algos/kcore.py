"""k-core decomposition — iterative degree peel over the undirected graph.

The k-core is the maximal subgraph where every vertex has (undirected)
degree >= k: the standard "dense backbone" extraction for link graphs
(spam-farm detection, crawl prioritization). Complements the reference's
in-degree ranking (README.md:92-112) with a mutual-density criterion.

Per round: one degree aggregate over the surviving edge set + two
semi-joins to drop edges touching peeled vertices; per-round
localCheckpoint truncates lineage (the iterative-plan-growth guard, SURVEY
§4 item 3). Peeling converges in at most O(n) rounds (every non-final
round removes >= 1 vertex — a 2(n/2)-vertex path with k=2 really does
take ~n/2 rounds), so the default is to peel to the fixpoint with no
round cap; an explicit ``max_iter`` that is hit before the fixpoint
raises instead of silently returning a superset of the k-core (the same
no-silent-caps rule the dedup bucket guards follow).

With ``checkpoint_dir`` each round's surviving edge set is committed via
CheckpointManager (parquet + manifest, as in PageRank/CC/LP), making long
peels resumable with per-round metrics.
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


def _peel(edges: DataFrame, survivors: DataFrame) -> DataFrame:
    """Edge set restricted to surviving endpoints — two LEFT SEMI joins.
    Semi (not inner) matters at scale: it neither duplicates edge rows on
    hub keys nor drags the survivor column through the shuffle."""
    return (
        edges.join(survivors.withColumnRenamed("vid", "src"), "src", "left_semi")
        .join(survivors.withColumnRenamed("vid", "dst"), "dst", "left_semi")
    )


def k_core(
    g: EncodedGraph,
    k: int,
    rounds: int | None = None,
    max_iter: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid) DataFrame of the k-core members, per-round metrics).

    `rounds=None` peels to the fixpoint (stops when no vertex is dropped);
    an explicit `rounds` runs exactly that many peel rounds (oracle mode).
    `max_iter` is a safety cap on fixpoint mode: hitting it before
    convergence raises RuntimeError (never a silent partial answer).
    """
    spark = g.edges.sparkSession
    ckpt = CheckpointManager(checkpoint_dir, "kcore") if checkpoint_dir else None
    edges = symmetrize(g.edges).transform(truncate_lineage)
    metrics: list[dict] = []
    n_prev = None
    start_iter = 0
    if ckpt and resume:
        loaded = ckpt.load_latest(spark)
        if loaded is not None:
            edges, start_iter = loaded
            n_prev = (ckpt.latest().get("metrics") or {}).get("survivors")
            start_iter += 1

    survivors = None
    converged = False
    it = start_iter
    while True:
        if rounds is not None:
            if it >= rounds:
                break
        elif max_iter is not None and it - start_iter >= max_iter:
            raise RuntimeError(
                f"k_core(k={k}): hit max_iter={max_iter} before the peel "
                f"fixpoint ({n_prev} survivors at the cap); raise max_iter "
                "or leave it None — a capped result is a superset of the "
                "true k-core, never returned silently"
            )
        t0 = time.time()
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        survivors = deg.filter(F.col("deg") >= k).select(
            F.col("src").alias("vid")
        ).transform(truncate_lineage)
        n = survivors.count()
        new_edges = _peel(edges, survivors)
        if ckpt:
            edges = ckpt.write_state(new_edges, it)
        else:
            edges = new_edges.transform(truncate_lineage)
        m = {"iteration": it, "wall_sec": round(time.time() - t0, 3),
             "survivors": n}
        metrics.append(m)
        if ckpt:
            ckpt.log_entry(it, m)
        it += 1
        if rounds is None and n_prev == n:
            converged = True
            break
        n_prev = n

    if survivors is None:
        if rounds == 0:
            survivors = symmetrize(g.edges).select(F.col("src").alias("vid")).distinct()
        else:
            # resumed at an already-converged checkpoint: one confirming
            # round was still run above, so this branch is only rounds<=start
            survivors = edges.select(F.col("src").alias("vid")).distinct()
    if rounds is None and not converged:
        # unreachable by construction (loop exits via fixpoint or raise),
        # kept as an invariant guard
        raise RuntimeError("k_core: exited without reaching the fixpoint")
    return survivors.select("vid"), metrics


def coreness(
    g: EncodedGraph, rounds: int = 30, early_stop: bool = True
) -> tuple[DataFrame, int, bool]:
    """Full core decomposition via the h-index iteration (Lü et al. 2016,
    "The H-index of a network node and its relation to degree and
    coreness"; distributed form: Montresor, De Pellegrini & Miorandi
    2013): c_0(v) = deg(v), then

        c_{t+1}(v) = H( { c_t(u) : u in N(v) } )

    where H is the h-index operator (max h such that >= h neighbors have
    value >= h). The sequence is monotone non-increasing and converges
    exactly to coreness(v) — the largest k with v in the k-core — so
    k_core() answers one k, coreness() answers all of them at once.

    Truncation semantics: runs min(fixpoint, ``rounds``) rounds and
    returns (state ``(vid, c)``, rounds_run, converged). Because the
    operator is idempotent at the fixpoint, a converged early stop equals
    any longer horizon — the contract oracle unrolls the FULL ``rounds``
    horizon and matches whether or not Spark stopped early.

    Per round: one edges ⋈ state equi-join, one vid-partitioned window
    (row_number over neighbor values desc — a partition-local sort, not a
    global one) and one MAX(LEAST(rank, value)) aggregate; state passes
    through truncate_lineage. Isolated vertices hold c = 0 via the left
    join. At power-law scale the window sort on a hub vertex touches
    deg(v) rows — the histogram reformulation (count neighbors >= h per
    h) bounds that to max-coreness buckets if hubs ever dominate; the
    sort form is exact and simpler, so it stays until measurement says
    otherwise.
    """
    from pyspark.sql.window import Window

    if rounds < 1:
        raise ValueError(f"coreness: rounds must be >= 1, got {rounds}")
    # dst-clustered loop cache (the per-round neighbor join keys on dst);
    # shuffled hash join streams it sort- and exchange-free (pagerank.py)
    sym = cluster_for_loop(
        symmetrize(g.edges), "dst", num_rows=2 * g.edges.count()
    )
    sym.count()
    deg = sym.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("c"))
    state = truncate_lineage(
        g.vertices.select("vid")
        .join(deg, "vid", "left")
        .select("vid", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    # row_number among tied nc values is engine-arbitrary, but
    # MAX(LEAST(rank, value)) is invariant to which tied row takes which
    # rank (equal values fill a contiguous rank block), so the result is
    # deterministic without a tiebreak column.
    w = Window.partitionBy("vid").orderBy(F.desc("nc"))
    run, converged = 0, False
    for _ in range(rounds):
        nbr = sym.join(
            state.select(F.col("vid").alias("dst"), F.col("c").alias("nc"))
            .hint("shuffle_hash"),
            "dst",
        ).select(F.col("src").alias("vid"), "nc")
        h = (
            nbr.withColumn("rn", F.row_number().over(w))
            .groupBy("vid")
            .agg(F.max(F.least(F.col("rn").cast("long"), F.col("nc"))).alias("h"))
        )
        # change flag rides the update projection (see components.py):
        # the old value joins in with the state row, so the former
        # new ⋈ old join per h-index round is a comparison instead
        new_state = truncate_lineage(
            state.select("vid", F.col("c").alias("_prev"))
            .join(h, "vid", "left")
            .select(
                "vid",
                F.coalesce("h", F.lit(0)).cast("long").alias("c"),
                (F.coalesce("h", F.lit(0)).cast("long") != F.col("_prev"))
                .alias("_chg"),
            )
        )
        run += 1
        if early_stop:
            changed = new_state.filter(F.col("_chg")).count()
            state = new_state
            if changed == 0:
                converged = True
                break
        else:
            state = new_state
    sym.unpersist()
    return state.select("vid", "c"), run, converged
