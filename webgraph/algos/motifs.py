"""Directed triad census — network-motif fingerprint of a link graph.

Milo et al. 2002 ("Network motifs: simple building blocks of complex
networks") made the census of directed three-vertex subgraphs the
standard structural fingerprint: the web's feed-forward-heavy profile
differs measurably from social graphs' reciprocity-heavy one. This
operator counts every CLOSED triad (all three pairs connected in at
least one direction — the 7 triad classes 030T, 030C, 111D/U-closed,
120D/U/C, 210, 300 of the Holland-Leinhardt census) keyed by a
canonical motif code.

Canonical form, not hand-written type rules: a triad on (x, y, z) is the
6-bit adjacency string [x->y, y->x, x->z, z->x, y->z, z->y]; the motif
class is the LEXICOGRAPHIC MINIMUM of that string over the 6 orderings
of the triple. This is exact (two triads are isomorphic iff their
minima agree), engine-portable (the oracle computes the same 6 strings
and takes LEAST), and immune to the classification-table bugs the named
taxonomies invite.

Physical plan: one flagged undirected pair table (u < v, fwd, bwd —
reciprocity collapses BEFORE enumeration, halving the join input), the
standard oriented two-path + closing equi-join used by
triangles.py (each triangle emitted exactly once at its a < b < c
orientation), a pure-codegen projection computing the 6 permutation
codes + LEAST in-row, and one map-side-combining count per motif code.
No UDF, no driver loop; the only shuffles are the triangle joins
themselves, which AQE skew-splits on hub keys like the triangle
counter.
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph


def _pair_flags(edges: DataFrame) -> DataFrame:
    """(u, v, fwd, bwd) with u < v for every connected unordered pair."""
    e = edges.filter(F.col("src") != F.col("dst"))
    u = F.least("src", "dst").alias("u")
    v = F.greatest("src", "dst").alias("v")
    return (
        e.select(
            u,
            v,
            (F.col("src") < F.col("dst")).cast("int").alias("f"),
            (F.col("src") > F.col("dst")).cast("int").alias("b"),
        )
        .groupBy("u", "v")
        .agg(F.max("f").alias("fwd"), F.max("b").alias("bwd"))
    )


def triad_census(g: EncodedGraph) -> DataFrame:
    """Census of closed directed triads: (motif, n_triads), where motif
    is the canonical 6-bit code described in the module docstring."""
    pairs = _pair_flags(g.edges)
    p_ab = pairs.select(
        F.col("u").alias("a"), F.col("v").alias("b"),
        F.col("fwd").alias("ab"), F.col("bwd").alias("ba"),
    )
    p_bc = pairs.select(
        F.col("u").alias("b"), F.col("v").alias("c"),
        F.col("fwd").alias("bc"), F.col("bwd").alias("cb"),
    )
    p_ac = pairs.select(
        F.col("u").alias("a"), F.col("v").alias("c"),
        F.col("fwd").alias("ac"), F.col("bwd").alias("ca"),
    )
    tri = p_ab.join(p_bc, "b").join(p_ac, ["a", "c"])

    flag = {}
    for x, y in permutations("abc", 2):
        flag[(x, y)] = F.col(f"{x}{y}").cast("string")
    codes = [
        F.concat(
            flag[(x, y)], flag[(y, x)],
            flag[(x, z)], flag[(z, x)],
            flag[(y, z)], flag[(z, y)],
        )
        for x, y, z in permutations("abc")
    ]
    return (
        tri.select(F.least(*codes).alias("motif"))
        .groupBy("motif")
        .agg(F.count("*").alias("n_triads"))
    )
