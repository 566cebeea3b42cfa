"""DAG scheduling over a condensation graph: topological levels.

The build-order primitive for dependency graphs (module imports, page
template includes): after collapsing cycles into SCCs
(algos/scc.py:strongly_connected_components), level k of the
condensation is everything that can be processed once levels < k are
done — level = longest path ending at the node, the max-plus twin of
sssp's min-plus relaxation with the same zero-change early stop.

Scale shape: one edge-keyed join + max aggregate per round (map-side
combine absorbs fan-in), state is vertex-shaped and lineage-truncated;
rounds = DAG depth. A cycle in the input makes the fixpoint diverge, so
the iteration cap doubles as the cycle guard and raises instead of
returning wrong levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import truncate_lineage


def topological_levels(edges: DataFrame, max_iter: int = 64) -> DataFrame:
    """(vid, level) for every vertex of the DAG ``edges`` (src -> dst
    meaning src must come before dst). level(v) = 0 for sources, else
    1 + max(level(pred)) — the longest path ending at v. Monotone
    max-plus fixpoint from all-zeros; stops on a zero-change round;
    raises RuntimeError when max_iter rounds pass without convergence
    (the input contains a cycle, or the DAG is deeper than max_iter)."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    e = truncate_lineage(e)
    verts = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    lvl = truncate_lineage(verts.select("vid", F.lit(0).cast("long").alias("level")))
    for _ in range(max_iter):
        cand = (
            e.join(lvl, e.src == lvl.vid)
            .groupBy(F.col("dst").alias("vid"))
            .agg((F.max("level") + 1).alias("cand"))
        )
        new = truncate_lineage(
            lvl.join(cand, "vid", "left").select(
                "vid",
                F.greatest(F.col("level"), F.coalesce(F.col("cand"), F.lit(0)))
                .alias("level"),
            )
        )
        changed = (
            new.join(lvl.withColumnRenamed("level", "_old"), "vid")
            .filter(F.col("level") != F.col("_old"))
            .count()
        )
        lvl = new
        if changed == 0:
            return lvl
    raise RuntimeError(
        f"topological_levels: no convergence in {max_iter} rounds — "
        "the input has a cycle or is deeper than max_iter; condense "
        "SCCs first (strongly_connected_components) or raise max_iter"
    )
