"""Community quality — modularity of a vertex partition.

Modularity Q is the standard score for a community assignment (label
propagation output, domain grouping): the fraction of edges inside
communities minus the fraction expected under a degree-preserving random
rewiring. Over the symmetrized edge multiset S (|S| = 2m):

    Q = sum_c [ w_c/|S| - (d_c/|S|)^2 ]

with w_c = symmetrized edges having both ends in c (= 2 * within-edges)
and d_c = total degree of c. This is the companion operator to
label_propagation/g_domain rollups: LP gives the partition, modularity
says whether it means anything.

Scale: two vertex-keyed joins to tag edge endpoints (the contract_graph
shape), one community-keyed aggregate (communities << vertices), one
1-row final agg. No quadratic term anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, symmetrize, truncate_lineage


def modularity(g: EncodedGraph, mapping: DataFrame) -> DataFrame:
    """1-row (n_communities, modularity_e6) for a (vid, gid) mapping.
    Vertices missing from the mapping are dropped (with their edges) —
    callers pass a total mapping in practice."""
    sym = symmetrize(g.edges).persist()
    m_src = mapping.select(F.col("vid").alias("src"), F.col("gid").alias("gsrc"))
    m_dst = mapping.select(F.col("vid").alias("dst"), F.col("gid").alias("gdst"))
    tagged = sym.join(m_src, "src", "inner").join(m_dst, "dst", "inner").persist()
    s = tagged.count()  # |S| = 2m over the mapped subgraph
    deg = (
        tagged.groupBy("gsrc")
        .agg(F.count("*").alias("d"))
        .select(F.col("gsrc").alias("gid"), "d")
    )
    within = (
        tagged.filter(F.col("gsrc") == F.col("gdst"))
        .groupBy("gsrc")
        .agg(F.count("*").alias("w"))
        .select(F.col("gsrc").alias("gid"), "w")
    )
    per_c = deg.join(within, "gid", "left").select(
        "gid",
        (
            F.coalesce(F.col("w"), F.lit(0)).cast("double") / F.lit(float(s))
            - (F.col("d").cast("double") / F.lit(float(s)))
            * (F.col("d").cast("double") / F.lit(float(s)))
        ).alias("q"),
    )
    out = per_c.agg(
        F.count("*").cast("long").alias("n_communities"),
        F.round(F.sum("q") * 1e6).cast("long").alias("modularity_e6"),
    ).transform(truncate_lineage)  # 1 row — materialize, then free the caches
    tagged.unpersist()
    sym.unpersist()
    return out
