"""Time-respecting reachability over a temporal edge set.

Link graphs are crawled, not static: every edge carries the time it was
observed, and "can information flow u -> v" means a path whose edge
times never decrease (Holme & Saramaki 2012, "Temporal networks";
Kempe, Kleinberg & Kumar 2000 for the reachability semantics). Static
reachability on the flattened graph OVERSTATES influence — an edge seen
in January cannot forward something that only arrived in March. The
canonical primitive is the earliest-arrival time:

    arr(s) = t0 for every seed s
    arr(v) = min over temporal edges (u, v, t) with t >= arr(u) of t

— a Bellman-Ford-style fixpoint, monotone non-increasing per vertex, so
iteration converges and an unchanged round is exactly the fixpoint.

Physical plan per round (the SSSP discipline, sssp.py): one equi-join of
the stationary temporal edge table against the small arrival frame on
src, the time-window predicate rides the join, a map-side-combining MIN
per dst collapses hub in-degree before the shuffle, a LEAST merge with
the previous state, truncate_lineage, and one scalar changed-count for
the zero-change early stop. Unreached vertices are ABSENT from the
result (never +inf rows — the web-scale V-sized dense frame rule,
landmarks.py:56-59).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import truncate_lineage


def temporal_earliest_arrival(
    tedges: DataFrame,
    seeds: DataFrame,
    t0: int = 0,
    max_iter: int = 200,
) -> DataFrame:
    """Earliest time-respecting arrival from the seed set.

    ``tedges``: (src, dst, t) — t any orderable integer timestamp.
    ``seeds``: (vid) — each seeded with arrival ``t0``.
    Returns (vid, arrival) for every vertex reachable along a
    non-decreasing-time path, seeds included at t0. Raises if the
    fixpoint is not reached within ``max_iter`` rounds (never partial)."""
    edges = truncate_lineage(
        tedges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("t").cast("long"),
        )
    )
    arr = truncate_lineage(
        seeds.select(F.col("vid").cast("long")).distinct().select(
            "vid", F.lit(int(t0)).cast("long").alias("arrival")
        )
    )
    for _ in range(max_iter):
        relaxed = (
            edges.join(
                arr.select(F.col("vid").alias("src"), "arrival"), "src"
            )
            .filter(F.col("t") >= F.col("arrival"))
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min("t").alias("cand"))
        )
        new_arr = truncate_lineage(
            arr.join(relaxed, "vid", "full")
            .select(
                "vid",
                F.least(
                    F.coalesce("arrival", F.col("cand")),
                    F.coalesce("cand", F.col("arrival")),
                ).alias("arrival"),
            )
        )
        changed = (
            new_arr.alias("n")
            .join(arr.alias("p"), "vid", "left")
            .filter(
                F.col("p.arrival").isNull()
                | (F.col("n.arrival") != F.col("p.arrival"))
            )
            .count()
        )
        arr = new_arr
        if changed == 0:
            return arr
    raise RuntimeError(
        f"temporal_earliest_arrival: no fixpoint within {max_iter} rounds"
    )
