"""Co-citation similarity — "pages linked together" over the link graph.

The reference ranks pages by raw in-degree (README.md:92-112 top-50
queries); co-citation is the pairwise refinement the same edge data
supports: two pages are similar when many third pages link to BOTH
(classic bibliographic coupling / co-citation from citation analysis).
Used for related-page suggestions and link-spam cluster detection.

Execution shape — a wedge join keyed on the CITING page:

    pairs(a, b) = for each src, all unordered pairs among its out-links
    common(a,b) = count of srcs citing both

The wedge count for a src with out-degree d is d·(d-1)/2, so power-law
hubs dominate the cost: a directory page linking 10^5 targets alone
contributes 5·10^9 wedges. The ``max_out_degree`` cap excludes such srcs
BEFORE the self-join (one degree aggregate + semi-join), logging how many
were dropped — the same documented-approximation contract as the n-gram
``max_doc_freq`` cap (dedup.py): a hub that cites everything carries no
similarity signal (inverse-df intuition), and the cap is deterministic,
loud, and reproducible in the oracle. No cap (None) is exact.

The self-join shuffles edges once on src; the pair aggregate shuffles
(a, b) keys with map-side partial counts. No cartesian product anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cocitation(
    edges: DataFrame,
    min_common: int = 2,
    max_out_degree: int | None = None,
) -> DataFrame:
    """Pairs ``(a, b, common)`` with a < b and common >= min_common, where
    ``common`` counts distinct srcs linking to both a and b.

    ``max_out_degree``: drop citing pages with more than this many
    outlinks before pairing (hub-wedge guard; logged via the returned
    plan's filter, exact when None).
    """
    e = edges.select("src", "dst").distinct()
    if max_out_degree is not None:
        deg = e.groupBy("src").agg(F.count("*").alias("_d"))
        keep = deg.filter(F.col("_d") <= max_out_degree).select("src")
        n_hot = deg.filter(F.col("_d") > max_out_degree).count()
        if n_hot:
            print(
                f"cocitation: excluding {n_hot} citing page(s) with "
                f"out-degree > {max_out_degree} (documented hub cap)"
            )
        e = e.join(keep, "src", "left_semi")
    left = e.select("src", F.col("dst").alias("a"))
    right = e.select("src", F.col("dst").alias("b"))
    return (
        left.join(right, "src")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= min_common)
    )
