"""Co-citation / bibliographic coupling — "pages linked together".

The reference ranks pages by raw in-degree (README.md:92-112 top-50
queries); these are the pairwise refinements the same edge data supports
(classic citation analysis):

- co-citation: two pages are similar when many third pages link to BOTH;
- bibliographic coupling (the transpose): two CITING pages are similar
  when they share many outlink targets.

Execution shape — a wedge join keyed on the shared endpoint:

    pairs(a, b) = for each key page, all unordered pairs among its
                  neighbors on the other side
    common(a,b) = count of key pages shared by a and b

The wedge count for a key with degree d is d·(d-1)/2, so power-law hubs
dominate the cost: a directory page linking 10^5 targets alone
contributes 5·10^9 wedges. The degree cap excludes such keys BEFORE the
self-join (one degree aggregate + anti-join), logging how many were
dropped — the same documented-approximation contract as the n-gram
``max_doc_freq`` cap (dedup.py:113-135): a hub that cites everything
carries no similarity signal (inverse-df intuition), and the cap is
deterministic, loud, and reproducible in the oracle. No cap (None) is
exact. The hot-key set is persisted (it is hub-sized, tiny) so the degree
aggregate runs once, not once for the log and once for the join.

The self-join shuffles edges once on the key; the pair aggregate shuffles
(a, b) keys with map-side partial counts. No cartesian product anywhere.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger("webgraph.cocitation")


def cocitation(
    edges: DataFrame,
    min_common: int = 2,
    max_out_degree: int | None = None,
) -> DataFrame:
    """Pairs ``(a, b, common)`` with a < b and common >= min_common, where
    ``common`` counts distinct srcs linking to both a and b.

    ``max_out_degree``: drop citing pages with more than this many
    outlinks before pairing (hub-wedge guard, logged; exact when None).
    """
    e = edges.select("src", "dst").distinct()
    if max_out_degree is not None:
        hot = (
            e.groupBy("src")
            .agg(F.count("*").alias("_d"))
            .filter(F.col("_d") > max_out_degree)
            .select("src")
            .persist()
        )
        n_hot = hot.count()
        if n_hot:
            _log.warning(
                "cocitation: excluding %d citing page(s) with out-degree > %d "
                "(documented hub cap)", n_hot, max_out_degree,
            )
        e = e.join(hot, "src", "left_anti")
    left = e.select("src", F.col("dst").alias("a"))
    right = e.select("src", F.col("dst").alias("b"))
    return (
        left.join(right, "src")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= min_common)
    )


def coupling(
    edges: DataFrame,
    min_common: int = 2,
    max_in_degree: int | None = None,
) -> DataFrame:
    """Bibliographic coupling — :func:`cocitation` on the transposed edge
    list: pairs ``(a, b, common)`` of CITING pages that share >=
    min_common outlink targets. ``max_in_degree`` caps the CITED side (a
    target everyone links to — a home page — carries no coupling
    signal)."""
    transposed = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return cocitation(
        transposed, min_common=min_common, max_out_degree=max_in_degree
    )


def butterfly_count(
    edges: DataFrame,
    max_out_degree: int | None = None,
) -> DataFrame:
    """1-row ``(n_butterflies)`` — the number of butterflies (complete
    2x2 bipartite subgraphs: two citing pages that BOTH link to the same
    two targets) in the directed edge set viewed as a src->dst bipartite
    graph. The standard cohesion motif for bipartite link data (the
    4-cycle analog of the triangle), and the natural next number after
    ``cocitation``: a dst pair with `common` shared citers closes
    C(common, 2) butterflies, so the total is one aggregate over the
    co-citation pair frame.

    Integer-exact (counts and DIV only), so the DuckDB oracle matches
    bit-for-bit. ``max_out_degree`` is the same documented hub cap as
    cocitation — a directory page citing everything closes a butterfly
    with every pair of its co-citers' targets; exact when None.

    Scale: identical economics to cocitation (wedge join + pair
    aggregate, no new shapes) plus one global sum."""
    pairs = cocitation(edges, min_common=2, max_out_degree=max_out_degree)
    return pairs.agg(
        F.coalesce(F.sum(F.expr("common * (common - 1) DIV 2")), F.lit(0))
        .cast("long")
        .alias("n_butterflies")
    )
