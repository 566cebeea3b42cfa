"""Round-5c operators: deterministic greedy graph coloring and Okapi
BM25 ranked retrieval. House style: tiny hand-checkable fixtures, a
pure-Python sequential replay as the coloring oracle, plan pins for the
BM25 top-k, partitioning independence.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from webgraph.algos.common import from_int_edges
from webgraph.dedup import POLY_MOD, _MIX_BASE


def _graph(spark, edges):
    return from_int_edges(spark.createDataFrame(edges, "src long, dst long"))


def _prio(v, seed=42):
    return ((v % POLY_MOD) * _MIX_BASE + seed) % POLY_MOD


def _sequential_greedy(edges, seed=42):
    """Reference: greedy coloring in ascending (priority, vid) order."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
        adj.setdefault(s, set())
    verts = sorted(adj, key=lambda v: (_prio(v, seed), v))
    colors: dict[int, int] = {}
    for v in verts:
        used = {colors[u] for u in adj[v] if u in colors}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors


# ------------------------------------------------------ coloring ----------


def test_coloring_matches_sequential_greedy(spark):
    from webgraph.algos.coloring import greedy_coloring

    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0), (0, 2),   # wheel-ish core
        (4, 0), (4, 1), (4, 2), (4, 3),            # hub
        (5, 6), (6, 7),                            # path off to the side
        (8, 8),                                    # self loop (dropped)
    ]
    g = _graph(spark, edges)
    got, metrics = greedy_coloring(g, seed=42)
    got = {r["vid"]: r["color"] for r in got.collect()}
    want = _sequential_greedy(edges)
    want[8] = 0  # self-loop-only vertex is isolated after loop drop
    assert got == want
    assert metrics and metrics[-1]["changed"] == 0


def test_coloring_is_proper_and_degree_bounded(spark):
    from webgraph.algos.coloring import greedy_coloring

    # deterministic pseudo-random graph, 40 vertices / ~80 edges
    edges = [
        (i, (i * 17 + j * j) % 40)
        for i in range(40)
        for j in range(1, 3)
        if i != (i * 17 + j * j) % 40
    ]
    g = _graph(spark, edges)
    colors, _ = greedy_coloring(g, seed=42)
    cdf = colors.withColumnRenamed("vid", "v").withColumnRenamed("color", "c")
    sym = g.edges.union(
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).filter(F.col("src") != F.col("dst"))
    conflicts = (
        sym.join(cdf.withColumnRenamed("v", "src").withColumnRenamed("c", "cs"), "src")
        .join(cdf.withColumnRenamed("v", "dst").withColumnRenamed("c", "cd"), "dst")
        .filter(F.col("cs") == F.col("cd"))
        .count()
    )
    assert conflicts == 0
    deg = sym.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("deg"))
    over = (
        colors.withColumnRenamed("vid", "v")
        .join(deg, "v")
        .filter(F.col("color") > F.col("deg"))
        .count()
    )
    assert over == 0
    assert got_equal_under_repartition(spark, g)


def got_equal_under_repartition(spark, g):
    from webgraph.algos.coloring import greedy_coloring

    a, _ = greedy_coloring(g, seed=42)
    shuffled = g._replace(edges=g.edges.repartition(7))
    b, _ = greedy_coloring(shuffled, seed=42)
    return sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_coloring_raises_rather_than_partial(spark):
    from webgraph.algos.coloring import greedy_coloring

    # a triangle needs >= 2 rounds; max_iter=1 must raise, not return 2 rows
    g = _graph(spark, [(0, 1), (1, 2), (2, 0)])
    with pytest.raises(RuntimeError, match="uncolored"):
        greedy_coloring(g, seed=42, max_iter=1)


def test_coloring_isolated_vertices_get_zero(spark):
    from webgraph.algos.coloring import greedy_coloring
    from webgraph.algos.common import EncodedGraph

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    verts = spark.createDataFrame(
        [(0, "0"), (1, "1"), (9, "9")], "vid long, url string"
    )
    g = EncodedGraph(vertices=verts, edges=edges, num_vertices=3)
    colors, _ = greedy_coloring(g, seed=42)
    got = {r["vid"]: r["color"] for r in colors.collect()}
    assert got[9] == 0
    assert sorted(got[v] for v in (0, 1)) == [0, 1]


# ------------------------------------------------------ BM25 --------------


def _bm25_py(docs, query, k1=1.2, b=0.75):
    toks = {i: t.lower().strip().split() for i, t in docs}
    n = float(len(docs))
    avgdl = sum(len(v) if v != [] else 1 for v in toks.values()) / n
    # NB: split('\s+') on empty text yields [''] -> dl 1; fixtures avoid it
    dfreq = {
        t: sum(1 for v in toks.values() if t in v) for t in query
    }
    out = {}
    for i, v in toks.items():
        s, hits = 0, 0
        for t in query:
            tf = v.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += round(idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(v) / avgdl)) * 1e6)
        if hits:
            out[i] = (s, hits)
    return out


def test_bm25_scores_match_reference_math(spark):
    from webgraph.text import bm25_search

    docs = [
        (1, "spark shuffle join join join"),
        (2, "join once in a very long document that dilutes the score a lot ok"),
        (3, "nothing relevant here at all"),
        (4, "shuffle shuffle join"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["score_e6"], r["n_hits"])
        for r in bm25_search(df, ["join", "shuffle"], k=10).collect()
    }
    assert got == _bm25_py(docs, ["join", "shuffle"])


def test_bm25_rank_order_and_k(spark):
    from webgraph.text import bm25_search

    docs = [(i, "term " * (i + 1) + "pad " * (10 - i)) for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    top = bm25_search(df, ["term"], k=3).collect()
    assert len(top) == 3
    scores = [r["score_e6"] for r in top]
    assert scores == sorted(scores, reverse=True)
    # all docs same length => more occurrences, higher score: doc 7 first
    assert top[0]["doc_id"] == 7


def test_bm25_empty_query_rejected(spark):
    from webgraph.text import bm25_search

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_search(df, [])


def test_bm25_plan_is_topk_not_global_sort(spark):
    from webgraph.text import bm25_search

    df = spark.createDataFrame(
        [(i, f"w{i} join") for i in range(50)], "doc_id long, text string"
    )
    plan = bm25_search(df, ["join"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
