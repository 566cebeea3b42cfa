"""k-core decomposition — iterative degree peel over the undirected graph.

The k-core is the maximal subgraph where every vertex has (undirected)
degree >= k: the standard "dense backbone" extraction for link graphs
(spam-farm detection, crawl prioritization). Complements the reference's
in-degree ranking (README.md:92-112) with a mutual-density criterion.

Per round: one degree aggregate over the surviving edge set + two
semi-joins to drop edges touching peeled vertices; per-round
localCheckpoint truncates lineage (the iterative-plan-growth guard, SURVEY
§4 item 3). Converges in <= max-degree rounds, usually a handful; the
`rounds` parameter forces a fixed count so the unrolled-SQL contract
oracle computes the identical intermediate states.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, symmetrize


def k_core(
    g: EncodedGraph, k: int, rounds: int | None = None, max_iter: int = 50
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid) DataFrame of the k-core members, per-round metrics).

    `rounds=None` peels to the fixpoint (stops when no vertex is dropped);
    an explicit `rounds` runs exactly that many peel rounds (oracle mode).
    """
    edges = symmetrize(g.edges).localCheckpoint(eager=True)
    metrics: list[dict] = []
    n_prev = None
    limit = rounds if rounds is not None else max_iter
    survivors = None
    for it in range(limit):
        t0 = time.time()
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        survivors = deg.filter(F.col("deg") >= k).select(
            F.col("src").alias("vid")
        ).localCheckpoint(eager=True)
        n = survivors.count()
        edges = (
            edges.join(survivors.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(survivors.withColumnRenamed("vid", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        metrics.append(
            {"iteration": it, "wall_sec": round(time.time() - t0, 3), "survivors": n}
        )
        if rounds is None and n_prev == n:
            break
        n_prev = n
    if survivors is None:  # rounds == 0
        survivors = symmetrize(g.edges).select(F.col("src").alias("vid")).distinct()
    return survivors.select("vid"), metrics
