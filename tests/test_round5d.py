"""Round-5d operators: double-cover bipartiteness, Weisfeiler-Leman
role refinement, landmark distance oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, from_int_edges


def _graph(spark, edges):
    return from_int_edges(spark.createDataFrame(edges, "src long, dst long"))


# ----------------------------------------------------- bipartite ----------


def test_bipartite_even_odd_and_isolated(spark):
    from webgraph.algos.bipartite import bipartite_components

    # C4 (bipartite), C3 (odd), P2 (bipartite), isolated vertex 99
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (10, 11), (11, 12), (12, 10), (20, 21)],
        "src long, dst long",
    )
    verts = spark.createDataFrame(
        [(v, str(v)) for v in [0, 1, 2, 3, 10, 11, 12, 20, 21, 99]],
        "vid long, url string",
    )
    g = EncodedGraph(vertices=verts, edges=edges, num_vertices=10)
    got = {
        r["component"]: (r["n_vertices"], r["is_bipartite"])
        for r in bipartite_components(g).collect()
    }
    assert got == {0: (4, True), 10: (3, False), 20: (2, True), 99: (1, True)}


def test_bipartite_odd_cycle_attached_to_tree(spark):
    from webgraph.algos.bipartite import bipartite_components

    # pentagon with a tail: one component, NOT bipartite
    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 5), (5, 6)])
    rows = bipartite_components(g).collect()
    assert len(rows) == 1
    assert rows[0]["n_vertices"] == 7 and not rows[0]["is_bipartite"]


# ----------------------------------------------------- WL roles -----------


def test_wl_distinguishes_path_positions(spark):
    from webgraph.algos.wl import wl_refinement

    # P4: 0-1-2-3. Ends {0,3} equivalent, middles {1,2} equivalent,
    # ends != middles after refinement.
    g = _graph(spark, [(0, 1), (1, 2), (2, 3)])
    c = {r["vid"]: r["wl_color"] for r in wl_refinement(g, rounds=3).collect()}
    assert c[0] == c[3] and c[1] == c[2] and c[0] != c[1]


def test_wl_separates_rounds_zero_and_star(spark):
    from webgraph.algos.wl import wl_refinement

    # star S3: center vs leaves differ already at round 0 (degree);
    # rounds=0 returns the degree colors
    g = _graph(spark, [(0, 1), (0, 2), (0, 3)])
    c0 = {r["vid"]: r["wl_color"] for r in wl_refinement(g, rounds=0).collect()}
    assert c0[0] == 3 and c0[1] == c0[2] == c0[3] == 1
    c = {r["vid"]: r["wl_color"] for r in wl_refinement(g, rounds=2).collect()}
    assert len({c[1], c[2], c[3]}) == 1 and c[0] != c[1]


def test_wl_partitioning_independent(spark):
    from webgraph.algos.wl import wl_refinement

    edges = [(i, (i * 13 + 5) % 30) for i in range(30) if i != (i * 13 + 5) % 30]
    g = _graph(spark, edges)
    a = sorted(map(tuple, wl_refinement(g, rounds=3).collect()))
    g2 = g._replace(edges=g.edges.repartition(7))
    b = sorted(map(tuple, wl_refinement(g2, rounds=3).collect()))
    assert a == b


def test_wl_rejects_negative_rounds(spark):
    from webgraph.algos.wl import wl_refinement

    with pytest.raises(ValueError):
        wl_refinement(_graph(spark, [(0, 1)]), rounds=-1)


# ----------------------------------------------------- landmarks ----------


def test_landmark_distances_exact_on_path(spark):
    from webgraph.algos.landmarks import landmark_distances

    # P5: 0-1-2-3-4; landmark 0 -> dist = vid
    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    d = {
        (r["landmark"], r["vid"]): r["dist"]
        for r in landmark_distances(g, [0], max_depth=10).collect()
    }
    assert d == {(0, v): v for v in range(5)}


def test_landmark_estimate_is_valid_upper_bound(spark):
    from webgraph.algos.landmarks import estimate_distances, landmark_distances

    # cycle C6; landmark 0. True d(2,4)=2; bound via 0: d(0,2)+d(0,4)=2+2=4
    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0)])
    dists = landmark_distances(g, [0], max_depth=10)
    pairs = spark.createDataFrame([(2, 4), (1, 5)], "u long, v long")
    got = {
        (r["u"], r["v"]): r["dist_ub"]
        for r in estimate_distances(dists, pairs).collect()
    }
    assert got == {(2, 4): 4, (1, 5): 2}
    # adding landmark 3 tightens d(2,4) to 1+1=2 (exact: 3 is on the path)
    dists2 = landmark_distances(g, [0, 3], max_depth=10)
    got2 = {
        (r["u"], r["v"]): r["dist_ub"]
        for r in estimate_distances(dists2, pairs).collect()
    }
    assert got2[(2, 4)] == 2


def test_pick_landmarks_deterministic(spark):
    from webgraph.algos.landmarks import pick_landmarks

    g = _graph(spark, [(i, i + 1) for i in range(20)])
    a = pick_landmarks(g, 3)
    b = pick_landmarks(g, 3)
    assert a == b and len(a) == 3
    with pytest.raises(ValueError):
        pick_landmarks(g, 0)
