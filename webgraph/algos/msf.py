"""Minimum spanning forest — distributed Borůvka over DataFrame joins.

Each round every component selects its minimum-weight incident edge
(total-ordered by (weight, src, dst) so the forest is UNIQUE even with
duplicate weights — the classic lexicographic tie-break that makes MSF
deterministic), the selected edges merge their endpoint components, and
the edge set contracts. Component count at least halves per round ⇒
ceil(log2 V) rounds worst-case, each round a constant number of joins +
one map-side-combining min aggregate — the same shuffle shapes as the
audited PageRank/CC loops, nothing new for the 100-TB story.

The component-merge step exploits Borůvka structure: selected edges form
a pseudo-forest on the component graph whose only cycles are mutual-min
2-cycles (strict total edge order), so parent pointers + 2-cycle rooting
+ pointer doubling (log-depth) resolve the merged labels without a
nested full CC run.

MSF is not expressible in the driver's one-shot SQL oracle dialect
(union-find state); correctness is pinned by pytest against a sequential
Kruskal oracle (tests/test_round5b.py) and by the contract's
rows/invariant checks.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, truncate_lineage
from webgraph.metrics import iteration_metrics


def _pointer_double(parent: DataFrame, max_jump: int = 40) -> DataFrame:
    """parent(vid, root) functional forest -> fully-jumped (vid, root).
    Doubling: root <- parent[root] until fixpoint; depth halves per jump."""
    parent = parent.transform(truncate_lineage)
    for _ in range(max_jump):
        hop = parent.select(
            F.col("vid").alias("root"), F.col("root").alias("root2")
        )
        # the old root is on the join row, so the change flag rides the
        # jump projection instead of a jumped ⋈ parent join per doubling
        # step (see components.py)
        jumped = (
            parent.join(hop, "root", "left")
            .select(
                "vid",
                F.coalesce("root2", F.col("root")).alias("root"),
                (F.coalesce("root2", F.col("root")) != F.col("root")).alias("_chg"),
            )
            .transform(truncate_lineage)
        )
        changed = jumped.filter(F.col("_chg")).count()
        parent = jumped.select("vid", "root")
        if changed == 0:
            return parent
    raise RuntimeError("_pointer_double: did not stabilize (cycle?)")


def minimum_spanning_forest(
    edges: DataFrame,
    g: EncodedGraph | None = None,
    max_iter: int = 40,
) -> tuple[DataFrame, list[dict]]:
    """``edges``: undirected weighted edges (src, dst, weight), one row
    per undirected edge (orientation irrelevant; self-loops dropped).
    Returns (forest edges ``(src, dst, weight)``, iteration metrics).
    The forest is the unique MSF under the (weight, src, dst) total
    order; vertices = endpoints of ``edges`` (or ``g.vertices`` when a
    graph is passed, so isolated vertices are counted in metrics)."""
    e = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
        .persist()
    )
    e.count()
    verts = (
        g.vertices.select("vid")
        if g is not None
        else e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    comp = verts.select("vid", F.col("vid").alias("comp")).transform(truncate_lineage)

    forest_parts: list[DataFrame] = []
    metrics: list[dict] = []
    live = e
    for it in range(max_iter):
        t0 = time.time()
        # relabel edge endpoints with current component ids
        ce = (
            live.join(
                comp.select(F.col("vid").alias("src"), F.col("comp").alias("cs")),
                "src",
            )
            .join(
                comp.select(F.col("vid").alias("dst"), F.col("comp").alias("cd")),
                "dst",
            )
            .filter(F.col("cs") != F.col("cd"))
            .transform(truncate_lineage)
        )
        n_live = ce.count()
        if n_live == 0:
            metrics.append(
                iteration_metrics(it, time.time() - t0, messages=0, changed=0)
            )
            break
        # each component's min incident edge under the strict total order
        key = F.struct("weight", "src", "dst")
        incident = ce.select(F.col("cs").alias("c"), key.alias("k")).unionByName(
            ce.select(F.col("cd").alias("c"), key.alias("k"))
        )
        chosen = (
            incident.groupBy("c")
            .agg(F.min("k").alias("k"))
            .select("c", "k.weight", "k.src", "k.dst")
        )
        # re-attach endpoint components to each component's chosen edge;
        # hooking along one's OWN chosen edge (not an arbitrary incident
        # selected edge) is what makes every pointer cycle a mutual-min
        # 2-cycle: following pointers, each hop's weight is <= the
        # previous (the next comp's own min is at most the arriving
        # edge), and the strict (weight, src, dst) order forbids equal
        # non-identical hops — so a cycle must reuse one edge, i.e. have
        # length 2. Hooking by min-incident-neighbor instead can split a
        # selected path into two mutual-min trees and re-select the
        # bridging edge forever.
        ch = chosen.join(
            ce.select("src", "dst", "cs", "cd"), ["src", "dst"], "inner"
        ).transform(truncate_lineage)
        sel = ch.select("src", "dst", "weight").distinct()
        forest_parts.append(sel)
        n_sel = ch.count()

        ptr = ch.select(
            F.col("c").alias("vid"),
            F.when(F.col("c") == F.col("cs"), F.col("cd"))
            .otherwise(F.col("cs"))
            .alias("root"),
        )
        # break 2-cycles: if root's root == vid and vid < root, self-root
        rr = ptr.select(F.col("vid").alias("root"), F.col("root").alias("rroot"))
        ptr = ptr.join(rr, "root", "left").select(
            "vid",
            F.when(
                (F.col("rroot") == F.col("vid")) & (F.col("vid") < F.col("root")),
                F.col("vid"),
            )
            .otherwise(F.col("root"))
            .alias("root"),
        )
        resolved = _pointer_double(ptr)
        comp = (
            comp.join(
                resolved.withColumnRenamed("vid", "comp"), "comp", "left"
            )
            .select("vid", F.coalesce("root", F.col("comp")).alias("comp"))
            .transform(truncate_lineage)
        )
        live = ce.select("src", "dst", "weight")
        metrics.append(
            iteration_metrics(
                it, time.time() - t0, messages=n_live, changed=n_sel
            )
        )
    else:
        raise RuntimeError(
            f"minimum_spanning_forest: not contracted after {max_iter} rounds"
        )
    e.unpersist()
    if not forest_parts:
        schema_src = verts.select(
            F.col("vid").alias("src"),
            F.col("vid").alias("dst"),
            F.lit(0.0).alias("weight"),
        )
        return schema_src.limit(0), metrics
    out = forest_parts[0]
    for part in forest_parts[1:]:
        out = out.unionByName(part)
    return out, metrics
