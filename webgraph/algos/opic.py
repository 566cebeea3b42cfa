"""OPIC — On-line Page Importance Computation (Abiteboul, Preda &
Cobena 2003, "Adaptive on-line page importance computation").

The crawl-frontier prioritization algorithm of record: each page holds
*cash*; fetching a page banks its cash into *history* and distributes it
equally over its out-links, so a page's accumulated history estimates
its importance WITHOUT waiting for a PageRank fixpoint — exactly the
"which URL next" decision the reference crawler makes with a plain FIFO
(App.java crawl loop; f_crawl_schedule adds politeness batching, OPIC
adds importance ordering on top).

This is the synchronous batch variant (every page "fetched" each round
— the paper's analysis baseline):

    history_{t+1}(v) = history_t(v) + cash_t(v)
    cash_{t+1}(v)    = sum_{u->v} cash_t(u) / outdeg(u)  +  D_t / N

with D_t = total cash on dangling (no-outlink) pages, redistributed
uniformly — the same dangling-mass discipline as pagerank.py, keeping
total cash exactly conserved at N per round. OPIC is PageRank's d=1
cousin but converges in the Cesàro (history) average rather than the
iterate, and needs no damping parameter; fixed-round truncation makes
it exactly SQL-replayable (the Katz oracle pattern).

Physical plan per round = PageRank's (pagerank.py:12-24): the stationary
(src, dst, w=1/outdeg) edge frame is built once and persisted; each
round re-shuffles only the small cash frame into the edges_w join, a
map-side-combining SUM absorbs hub in-degree skew, the dangling total is
one scalar aggregate, and state passes through truncate_lineage so both
lineage and Catalyst's size statistics stay O(1) in the round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage


def opic(g: EncodedGraph, iters: int = 5) -> DataFrame:
    """Run ``iters`` synchronous OPIC rounds from cash(v) = 1.0.
    Returns (vid, cash, history) — rank pages by history (+ cash for the
    paper's unbiased estimate) to order a crawl frontier."""
    if iters < 1:
        raise ValueError(f"opic: iters must be >= 1, got {iters}")
    n = g.num_vertices
    outdeg = g.edges.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("od")
    )
    edges_w = cluster_for_loop(
        g.edges.join(outdeg.withColumnRenamed("vid", "src"), "src").select(
            "src", "dst", (F.lit(1.0) / F.col("od")).alias("w")
        ),
        "src",
        num_rows=g.edges.count(),
    )
    edges_w.count()
    has_out = outdeg.select("vid")

    state = truncate_lineage(
        g.vertices.select(
            "vid", F.lit(1.0).alias("cash"), F.lit(0.0).alias("history")
        )
    )
    for _ in range(iters):
        dangling = (
            state.join(has_out, "vid", "left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0.0)))
            .first()[0]
        )
        gathered = (
            edges_w.join(
                state.select(F.col("vid").alias("src"), "cash").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum(F.col("cash") * F.col("w")).alias("inflow"))
        )
        state = truncate_lineage(
            state.join(gathered, "vid", "left").select(
                "vid",
                (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n)).alias(
                    "cash"
                ),
                (F.col("history") + F.col("cash")).alias("history"),
            )
        )
    edges_w.unpersist()
    return state
