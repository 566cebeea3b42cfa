"""Round-5 hardening: SSSP zero-change early stop, Katz tol loop +
divergence warning, exact substring dedup, Louvain, main-content
extraction. Fixture style follows the suite: tiny hand-checkable graphs
with exact expected values plus structural pins.
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from webgraph.algos.common import from_int_edges


def _graph(spark, edges):
    return from_int_edges(spark.createDataFrame(edges, "src long, dst long"))


# ------------------------------------------------ SSSP early stop ---------


def test_sssp_converged_graph_stops_early(spark):
    # path 0->1->2: settles in 2 relaxation rounds; round 3 changes
    # nothing, so early_stop must break well before max_iter=10
    from webgraph.algos.sssp import shortest_paths

    g = _graph(spark, [(0, 1), (1, 2)])
    state, metrics = shortest_paths(g, source=0, max_iter=10)
    assert len(metrics) < 10
    assert metrics[-1]["changed"] == 0
    dists = {r["vid"]: r["dist"] for r in state.collect()}
    assert dists == {0: 0, 1: 1, 2: 2}


def test_sssp_early_stop_matches_fixed_iteration(spark):
    from webgraph.algos.sssp import shortest_paths

    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (0, 3), (3, 4)])
    fast, _ = shortest_paths(g, source=0, max_iter=8, early_stop=True)
    full, _ = shortest_paths(g, source=0, max_iter=8, early_stop=False)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, full.collect()))


def test_sssp_unreachable_stays_null_and_stops(spark):
    from webgraph.algos.sssp import shortest_paths

    g = _graph(spark, [(0, 1), (2, 3)])
    state, metrics = shortest_paths(g, source=0, max_iter=6)
    # NULL->NULL rounds count as unchanged (eqNullSafe), so the
    # disconnected component can't keep the loop alive
    assert len(metrics) < 6
    dists = {r["vid"]: r["dist"] for r in state.collect()}
    assert dists[2] is None and dists[3] is None


# ------------------------------------------------ Katz tol + divergence ---


def test_katz_tol_converges_and_stops_early(spark):
    from webgraph.algos.katz import katz_centrality

    # small alpha on a DAG: series truncates exactly at the longest path,
    # so delta hits 0 and the tol loop must break before max_iter
    g = _graph(spark, [(0, 1), (1, 2)])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # divergence warning would fail here
        state, metrics = katz_centrality(g, alpha=0.1, max_iter=20, tol=1e-9)
    assert len(metrics) < 20
    k = {r["vid"]: r["katz"] for r in state.collect()}
    # closed form on the 2-path: x0=1, x1=1+a, x2=1+a+a^2
    assert abs(k[0] - 1.0) < 1e-9
    assert abs(k[1] - 1.1) < 1e-9
    assert abs(k[2] - 1.11) < 1e-9


def test_katz_diverging_alpha_warns(spark):
    from webgraph.algos.katz import katz_centrality

    # 2-cycle: lambda_max = 1, so alpha=2 > 1/lambda_max diverges —
    # per-round deltas grow and the guard must raise RuntimeWarning
    g = _graph(spark, [(0, 1), (1, 0)])
    with pytest.warns(RuntimeWarning, match="diverging"):
        katz_centrality(g, alpha=2.0, max_iter=5, tol=1e-12)


def test_katz_fixed_iteration_mode_has_no_delta_pass(spark):
    from webgraph.algos.katz import katz_centrality

    g = _graph(spark, [(0, 1)])
    _, metrics = katz_centrality(g, alpha=0.5, max_iter=3, tol=0.0)
    assert len(metrics) == 3
    assert all("delta" not in m for m in metrics)
