"""Round-5o: eigenvector centrality (normalized power iteration),
edge betweenness (Brandes dependency resolved to edges), double-sweep
pseudo-diameter. House style: graphs tiny enough that every value is
hand-computable; the shuffled-sum determinism is the contract rows'
job (g_eigencentrality / g_edge_betweenness / g_pseudo_diameter, exact
DuckDB replay)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from webgraph.algos.common import from_int_edges


def _graph(spark, edges):
    return from_int_edges(spark.createDataFrame(edges, "src long, dst long"))


# ------------------------------------------------ eigenvector centrality --


def test_eigenvector_cycle_is_uniform(spark):
    """On a directed 3-cycle, A^T is a permutation: the uniform vector is
    the exact fixed point at every round."""
    from webgraph.algos.eigenvector import eigenvector_centrality

    g = _graph(spark, [(0, 1), (1, 2), (2, 0)])
    state, metrics = eigenvector_centrality(g, max_iter=3)
    got = {r["vid"]: r["eig"] for r in state.collect()}
    assert got == {0: pytest.approx(1 / 3), 1: pytest.approx(1 / 3),
                   2: pytest.approx(1 / 3)}
    assert len(metrics) == 3


def test_eigenvector_hand_computed_two_rounds(spark):
    """0->1, 1->2, 2->0, 2->1: round 1 x = (1/4, 1/2, 1/4);
    round 2 x = (1/5, 2/5, 2/5)."""
    from webgraph.algos.eigenvector import eigenvector_centrality

    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (2, 1)])
    one, _ = eigenvector_centrality(g, max_iter=1)
    got1 = {r["vid"]: r["eig"] for r in one.collect()}
    assert got1 == {0: pytest.approx(0.25), 1: pytest.approx(0.5),
                    2: pytest.approx(0.25)}
    two, _ = eigenvector_centrality(g, max_iter=2)
    got2 = {r["vid"]: r["eig"] for r in two.collect()}
    assert got2 == {0: pytest.approx(0.2), 1: pytest.approx(0.4),
                    2: pytest.approx(0.4)}


def test_eigenvector_l1_normalized_every_round(spark):
    from webgraph.algos.eigenvector import eigenvector_centrality

    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (2, 1), (0, 2)])
    for k in (1, 3):
        state, _ = eigenvector_centrality(g, max_iter=k)
        total = state.agg(F.sum("eig")).collect()[0][0]
        assert total == pytest.approx(1.0)


def test_eigenvector_sink_absorbs_all_mass_raises(spark):
    """Pure in-star: after round 1 the dangling hub holds ALL mass, so
    round 2's L1 total is 0 — the documented fail-loud case."""
    from webgraph.algos.eigenvector import eigenvector_centrality

    g = _graph(spark, [(1, 0), (2, 0), (3, 0)])
    with pytest.raises(ValueError, match="sink"):
        eigenvector_centrality(g, max_iter=2)


def test_eigenvector_tol_early_stop(spark):
    """The cycle's uniform state has delta 0 after any round: tol > 0
    must break at the first materialized round."""
    from webgraph.algos.eigenvector import eigenvector_centrality

    g = _graph(spark, [(0, 1), (1, 2), (2, 0)])
    _, metrics = eigenvector_centrality(g, max_iter=10, tol=1e-12)
    assert len(metrics) == 1
    assert metrics[0]["delta"] == pytest.approx(0.0)


def test_eigenvector_guards(spark):
    from webgraph.algos.eigenvector import eigenvector_centrality

    g = _graph(spark, [(0, 1)])
    with pytest.raises(ValueError, match="max_iter"):
        eigenvector_centrality(g, max_iter=0)


def test_eigenvector_checkpoint_resume_bit_identical(spark, tmp_path):
    from webgraph.algos.eigenvector import eigenvector_centrality

    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (2, 1), (0, 2)])
    full, _ = eigenvector_centrality(g, max_iter=5)
    want = {r["vid"]: r["eig"] for r in full.collect()}

    d = str(tmp_path / "ck")
    eigenvector_centrality(g, max_iter=2, checkpoint_dir=d)  # "crash"
    resumed, metrics = eigenvector_centrality(
        g, max_iter=5, checkpoint_dir=d, resume=True
    )
    got = {r["vid"]: r["eig"] for r in resumed.collect()}
    assert got == want  # bit-identical, not just allclose
    assert metrics[0]["iteration"] == 2  # resumed, not restarted


# ---------------------------------------------------- edge betweenness --


def _edge_rows(df):
    return {(r["src"], r["dst"]): (r["depth"], r["delta_edge"])
            for r in df.collect()}


def test_edge_betweenness_path_graph(spark):
    """0->1->2->3 from seed 0: every sigma is 1, so delta_edge counts the
    downstream vertices + 1 per edge: 3, 2, 1."""
    from webgraph.algos.bfs import edge_betweenness_contributions

    g = _graph(spark, [(0, 1), (1, 2), (2, 3)])
    got = _edge_rows(edge_betweenness_contributions(g, 0, max_depth=3))
    assert got == {
        (0, 1): (0, pytest.approx(3.0)),
        (1, 2): (1, pytest.approx(2.0)),
        (2, 3): (2, pytest.approx(1.0)),
    }


def test_edge_betweenness_diamond_splits_flow(spark):
    """0->{1,2}->3: sigma(3) = 2, each incoming edge carries 1/2, each
    top edge 1 + 1/2."""
    from webgraph.algos.bfs import edge_betweenness_contributions

    g = _graph(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    got = _edge_rows(edge_betweenness_contributions(g, 0, max_depth=2))
    assert got == {
        (0, 1): (0, pytest.approx(1.5)),
        (0, 2): (0, pytest.approx(1.5)),
        (1, 3): (1, pytest.approx(0.5)),
        (2, 3): (1, pytest.approx(0.5)),
    }


def test_edge_betweenness_sums_to_vertex_delta(spark):
    """Brandes' invariant: a vertex's delta equals the sum of delta_edge
    over its outgoing DAG edges — the edge view is the vertex sweep's
    pre-aggregation terms, on a graph with non-trivial sigma splits."""
    from webgraph.algos.bfs import (
        betweenness_contributions,
        edge_betweenness_contributions,
    )

    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (1, 4), (0, 5), (5, 6)]
    g = _graph(spark, edges)
    vert = {
        r["vid"]: r["delta"]
        for r in betweenness_contributions(g, 0, max_depth=4).collect()
    }
    by_tail: dict[int, float] = {}
    for (s, _d), (_dep, de) in _edge_rows(
        edge_betweenness_contributions(g, 0, max_depth=4)
    ).items():
        by_tail[s] = by_tail.get(s, 0.0) + de
    for vid, delta in vert.items():
        assert by_tail.get(vid, 0.0) == pytest.approx(delta), vid


def test_edge_betweenness_excludes_non_dag_edges(spark):
    """A same-level edge (1, 2) and a back edge (2, 0) lie on no shortest
    path from the seed and must not appear."""
    from webgraph.algos.bfs import edge_betweenness_contributions

    g = _graph(spark, [(0, 1), (0, 2), (1, 2), (2, 0), (1, 3)])
    got = _edge_rows(edge_betweenness_contributions(g, 0, max_depth=3))
    assert set(got) == {(0, 1), (0, 2), (1, 3)}


# ---------------------------------------------------- pseudo-diameter --


def _pd_row(df):
    r = df.collect()[0]
    return (r["seed"], r["far1"], r["ecc1"], r["far2"], r["ecc2"])


def test_pseudo_diameter_exact_on_path(spark):
    """Double sweep is exact on trees: seeded mid-path it finds an
    endpoint (min-vid tie-break between the two), then the full length."""
    from webgraph.algos.bfs import pseudo_diameter

    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    assert _pd_row(pseudo_diameter(g, 2, max_depth=4)) == (2, 0, 2, 4, 4)


def test_pseudo_diameter_horizon_truncates(spark):
    from webgraph.algos.bfs import pseudo_diameter

    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    seed, far1, ecc1, far2, ecc2 = _pd_row(pseudo_diameter(g, 2, max_depth=2))
    assert (seed, far1, ecc1) == (2, 0, 2)
    assert ecc2 == 2  # the horizon, not the true eccentricity 4
    assert far2 == 2


def test_pseudo_diameter_star_tie_breaks_min_vid(spark):
    from webgraph.algos.bfs import pseudo_diameter

    g = _graph(spark, [(0, 1), (0, 2), (0, 3)])
    assert _pd_row(pseudo_diameter(g, 0, max_depth=3)) == (0, 1, 1, 2, 2)
