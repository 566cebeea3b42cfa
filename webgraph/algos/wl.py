"""Weisfeiler–Leman (color refinement) structural role fingerprints.

1-WL color refinement: every vertex starts from its degree and
repeatedly re-hashes (own color, multiset of neighbor colors). After r
rounds, equal colors mean "locally indistinguishable to radius r" — the
standard structural-role / graph-fingerprint primitive (role discovery,
mirror-site detection via identical link neighborhoods, graph-level
signatures as the sorted color histogram).

The multiset hash is COMMUTATIVE by construction:

    c'(v) = ( c(v) * MIX  +  sum_{u~v} (c(u) * A + B mod P) ) mod P

so the neighbor aggregation is a plain map-side-combining SUM — no
sorted collect_list, no hub-sized arrays (a 10^8-degree hub contributes
partial sums, never a materialized multiset), and the result is
independent of partitioning and addition order (the inner mod keeps
every addend < P; 2^63 overflow needs degree > 9e18/P ≈ 9.2e9, checked
nowhere near). Sum-based multiset hashing is the standard WL-variant
trade: collisions are possible at probability ~deg/P per pair; P is the
repo's 1e9+7 prime and the contract graph is 500 vertices, so the
oracle comparison is collision-free in practice and any collision would
show up as a mismatch, not hide one.

All arithmetic is integer-exact in both engines (DuckDB promotes the
SUM to HUGEINT, Spark keeps partial sums < 2^63 via the inner mod), so
the oracle unrolls the identical rounds in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import (
    EncodedGraph,
    cluster_for_loop,
    symmetrize,
    truncate_lineage,
)
from webgraph.dedup import POLY_MOD, _MIX_BASE

_A = 1_000_003  # odd multipliers, coprime to P
_B = 7_919


def wl_refinement(
    g: EncodedGraph,
    rounds: int = 3,
    directed: bool = False,
) -> DataFrame:
    """Returns ``(vid, wl_color)`` after ``rounds`` refinement rounds.
    ``directed=True`` refines over out-neighbors only (link-role
    fingerprints); default refines the symmetrized graph (structural
    roles). Isolated vertices keep hashing their degree-0 color and
    remain mutually indistinguishable, as 1-WL prescribes."""
    if rounds < 0:
        raise ValueError(f"wl_refinement: rounds must be >= 0, got {rounds}")
    edges = g.edges.select("src", "dst") if directed else symmetrize(g.edges)
    # src-clustered loop cache + shuffled hash joins (see pagerank.py)
    edges = cluster_for_loop(edges, "src", num_rows=2 * g.edges.count())
    edges.count()

    deg = edges.groupBy(F.col("dst").alias("vid")).agg(F.count("*").alias("deg"))
    colors = truncate_lineage(
        g.vertices.select("vid")
        .join(deg, "vid", "left")
        .select(
            "vid",
            (F.coalesce("deg", F.lit(0)) % POLY_MOD).alias("wl_color"),
        )
    )
    for _ in range(rounds):
        msg = (
            edges.join(
                colors.withColumnRenamed("vid", "src")
                .withColumnRenamed("wl_color", "c")
                .hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum((F.col("c") * _A + _B) % POLY_MOD).alias("nsum"))
        )
        colors = truncate_lineage(
            colors.join(msg, "vid", "left")
            .select(
                "vid",
                (
                    (F.col("wl_color") * _MIX_BASE + F.coalesce("nsum", F.lit(0)))
                    % POLY_MOD
                ).alias("wl_color"),
            )
        )
    edges.unpersist()
    return colors
