"""Distributed greedy graph coloring — deterministic priority-DAG rounds.

Greedy coloring in a fixed vertex order is the workhorse conflict-freeing
primitive (batch scheduling, parallel graph mutation, register-style
resource assignment over a link graph). The sequential rule — visit
vertices in order, give each the smallest color not used by an
already-colored neighbor — parallelizes exactly: with a fixed priority
per vertex, a vertex can commit its color as soon as EVERY
higher-priority neighbor has committed, and the committed color (the mex
over those neighbors' colors) is identical to the sequential greedy
result. Rounds needed = the longest strictly-decreasing priority path;
for hash-uniform priorities that is O(log n) w.h.p. (the same argument
as Luby-style MIS — this module is the chromatic sibling of
webgraph/algos/mis.py and reuses its portable priority).

Determinism across engines/partitionings/cluster sizes comes from the
engine-portable priority hash (dedup.py constants), which is what makes
the result SQL-verifiable: the contract oracle replays the SEQUENTIAL
greedy order in a DuckDB recursive CTE (one vertex per step), and the
distributed rounds must reproduce it bit-for-bit.

Physical plan per round (the MIS/CC template, made INCREMENTAL):
  1. ready = waiting vertices whose colored-lower-neighbor count has
     reached their static lower-neighbor count; their color is the mex
     of the accumulated neighbor-color set, a codegen array_sort +
     aggregate fold (no UDF).
  2. delta = out-edges of the NEWLY colored only, joined against the
     stationary oriented edge set, then a map-side-combining count +
     collect_set aggregate. Only this round's frontier is aggregated, so
     total messages over the whole run are one pass of the edge set
     (O(E)), not O(E x rounds); the accumulated set holds DISTINCT
     colors, so its size is bounded by the palette reached so far (tens
     for web-shaped graphs), never by a hub's degree.
  3. waiting state merges the delta (left join + array_union) and drops
     the newly colored; truncate_lineage bounds both the lineage and
     the checkpoint-propagated statistics each round.

Round COUNT is the priority-DAG depth — the longest strictly-decreasing
priority path. Sparse web-shaped graphs stay shallow (O(log n) w.h.p.
at bounded degree); dense graphs are the documented worst case (a
clique's DAG is a single chain of depth n). The engine raises past
``max_iter`` rather than returning a partial coloring.
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
from webgraph.algos.mis import priority_expr
from webgraph.metrics import iteration_metrics


def _mex(sorted_colors: F.Column) -> F.Column:
    """Smallest non-negative integer absent from a sorted distinct array:
    fold left, bumping the candidate while the array stays contiguous."""
    return F.aggregate(
        sorted_colors,
        F.lit(0).cast("long"),
        lambda acc, c: F.when(c == acc, acc + F.lit(1)).otherwise(acc),
    )


def greedy_coloring(
    g: EncodedGraph,
    seed: int = 42,
    max_iter: int = 256,
) -> tuple[DataFrame, list[dict]]:
    """Returns (colors DataFrame ``(vid, color)``, iteration metrics).
    ``color`` is 0-based and equals the sequential greedy coloring in
    ascending (portable-hash priority, vid) order; adjacent vertices
    always receive distinct colors and every vertex uses a color
    <= its degree. Raises if the priority DAG is not exhausted within
    ``max_iter`` rounds (correctness failure — some vertex would stay
    uncolored)."""
    p_src = F.struct(priority_expr("src", seed).alias("p"), F.col("src").alias("v"))
    p_dst = F.struct(priority_expr("dst", seed).alias("p"), F.col("dst").alias("v"))
    # edges oriented higher-priority-src -> lower-priority... we keep the
    # (lower src -> waits-on dst) orientation: src must commit before dst.
    # src-clustered (cluster_for_loop) so each round's delta join streams
    # it exchange- and sort-free; the intermediate symmetrized frame is
    # consumed only here and needs no cache of its own.
    oriented = cluster_for_loop(
        symmetrize(g.edges).filter(p_src < p_dst),
        "src",
        num_rows=2 * g.edges.count(),
    )
    oriented.count()

    pred_cnt = oriented.groupBy(F.col("dst").alias("vid")).agg(
        F.count("*").alias("need")
    )
    # incremental waiting state: (vid, need, got, cset). Each round only
    # the NEWLY colored vertices' out-edges are aggregated and merged in,
    # so the total work over the whole run is one pass of the oriented
    # edge set (O(E) messages), not O(E x rounds) — the recompute-from-
    # scratch variant re-joins every colored vertex every round and turns
    # deep priority DAGs (dense graphs) quadratic.
    empty_arr = F.array().cast("array<long>")
    state = truncate_lineage(
        g.vertices.select("vid")
        .join(pred_cnt, "vid", "left")
        .select(
            "vid",
            F.coalesce("need", F.lit(0)).alias("need"),
            F.lit(0).cast("long").alias("got"),
            empty_arr.alias("cset"),
        )
    )

    parts: list[DataFrame] = []
    metrics: list[dict] = []
    done = False
    for it in range(max_iter):
        t0 = time.time()
        ready = truncate_lineage(
            state.filter(F.col("got") == F.col("need")).select(
                "vid", _mex(F.array_sort("cset")).alias("color")
            )
        )
        n_ready = ready.count()
        parts.append(ready.withColumn("round", F.lit(it)))

        delta = (
            oriented.join(
                ready.withColumnRenamed("vid", "src").hint("shuffle_hash"),
                "src",
                "inner",
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg(
                F.count("*").alias("d_got"),
                F.collect_set("color").alias("d_cset"),
            )
        )
        state = truncate_lineage(
            state.join(ready.select("vid"), "vid", "left_anti")
            .join(delta, "vid", "left")
            .select(
                "vid",
                "need",
                (F.col("got") + F.coalesce("d_got", F.lit(0))).alias("got"),
                F.array_union(
                    "cset", F.coalesce("d_cset", empty_arr)
                ).alias("cset"),
            )
        )
        n_left = state.count()
        metrics.append(
            iteration_metrics(it, time.time() - t0, messages=n_ready, changed=n_left)
        )
        if n_left == 0:
            done = True
            break
    oriented.unpersist()
    if not done:
        raise RuntimeError(
            f"greedy_coloring: {max_iter} rounds left vertices uncolored — "
            "raise max_iter (priority chain longer than the budget)"
        )
    out = parts[0].select("vid", "color")
    for part in parts[1:]:
        out = out.unionByName(part.select("vid", "color"))
    return out, metrics
