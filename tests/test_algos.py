"""Iterative analytics vs pure-Python oracles (BASELINE.json correctness
gates): PageRank allclose 1e-6, components/labels exact, triangles exact;
dangling-node, self-loop, two-component and checkpoint-resume cases."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.oracles import (
    components_oracle,
    label_propagation_oracle,
    pagerank_oracle,
    triangle_oracle,
)
from webgraph.algos import (
    connected_components,
    encode_graph,
    label_propagation,
    pagerank,
    triangle_count,
)
from webgraph.algos.triangles import triangle_count_per_vertex
from webgraph.build import build_graph
from webgraph.corpus import fixture_docs, synthetic_corpus

DOMAINS = ["alpha.example.com", "beta.example.com", "example.com"]


def _encoded(spark, fixture=None, n_pages=None, seed=42):
    docs = (
        fixture_docs(spark, fixture)
        if fixture
        else synthetic_corpus(spark, n_pages=n_pages, n_sites=5, seed=seed)
    )
    g = build_graph(docs, DOMAINS)
    return encode_graph(g.edges)


def _edge_list(eg):
    return [(r["src"], r["dst"]) for r in eg.edges.collect()]


def _vertex_set(eg):
    return {r["vid"] for r in eg.vertices.collect()}


def _assert_pagerank_matches(eg, tol=1e-6):
    ranks, metrics = pagerank(eg, tol=tol, collect_skew=False)
    got = {r["vid"]: r["rank"] for r in ranks.collect()}
    want = pagerank_oracle(_edge_list(eg), _vertex_set(eg), tol=tol)
    assert set(got) == set(want)
    keys = sorted(got)
    assert np.allclose(
        [got[k] for k in keys], [want[k] for k in keys], atol=1e-6
    ), "pagerank mismatch"
    # probability mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-9
    return metrics


@pytest.mark.parametrize(
    "fixture",
    [
        # star_in is the slow convergence case (~2.5 min): full oracle
        # coverage stays in the default suite via the other fixtures
        pytest.param("star_in", marks=pytest.mark.slow),
        pytest.param("chain_backlink", marks=pytest.mark.slow),
        "dangling",
        "self_loop",
    ],
)
def test_pagerank_fixtures(spark, fixture):
    eg = _encoded(spark, fixture=fixture)
    metrics = _assert_pagerank_matches(eg)
    assert metrics[-1]["delta_l1"] < 1e-6


@pytest.mark.slow
def test_pagerank_synthetic_graph(spark):
    eg = _encoded(spark, n_pages=300)
    _assert_pagerank_matches(eg)


def test_pagerank_salted_equals_unsalted(spark):
    eg = _encoded(spark, n_pages=200)
    r1, _ = pagerank(eg, max_iter=5, tol=0, collect_skew=False)
    r2, _ = pagerank(eg, max_iter=5, tol=0, salt_buckets=8, collect_skew=False)
    a = {r["vid"]: r["rank"] for r in r1.collect()}
    b = {r["vid"]: r["rank"] for r in r2.collect()}
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], atol=1e-12)


def test_connected_components_exact(spark):
    eg = _encoded(spark, fixture="two_components")
    labels, metrics = connected_components(eg, collect_skew=False)
    got = {r["vid"]: r["component"] for r in labels.collect()}
    want = components_oracle(_edge_list(eg), _vertex_set(eg))
    assert got == want
    assert len(set(got.values())) == 2
    assert metrics[-1]["changed"] == 0


def test_connected_components_synthetic(spark):
    eg = _encoded(spark, n_pages=300)
    labels, _ = connected_components(eg, collect_skew=False)
    got = {r["vid"]: r["component"] for r in labels.collect()}
    want = components_oracle(_edge_list(eg), _vertex_set(eg))
    assert got == want


def test_label_propagation_exact(spark):
    for fixture in ["triangle", "two_components", "star_in"]:
        eg = _encoded(spark, fixture=fixture)
        labels, _ = label_propagation(eg)
        got = {r["vid"]: r["label"] for r in labels.collect()}
        want = label_propagation_oracle(_edge_list(eg), _vertex_set(eg))
        assert got == want, fixture


def test_triangle_count(spark):
    eg = _encoded(spark, fixture="triangle")
    want = triangle_oracle(_edge_list(eg))
    assert want == 1
    assert triangle_count(eg, degree_ordered=False) == 1
    assert triangle_count(eg, degree_ordered=True) == 1
    per_v = {
        r["vid"]: r["triangles"]
        for r in triangle_count_per_vertex(eg).collect()
    }
    assert sorted(per_v.values()) == [0, 1, 1, 1]


def test_triangle_count_synthetic(spark):
    eg = _encoded(spark, n_pages=200)
    want = triangle_oracle(_edge_list(eg))
    assert triangle_count(eg, degree_ordered=True) == want
    assert triangle_count(eg, degree_ordered=False) == want


def test_self_loop_does_not_break_anything(spark):
    eg = _encoded(spark, fixture="self_loop")
    assert triangle_count(eg) == 0
    labels, _ = connected_components(eg, collect_skew=False)
    comps = {r["component"] for r in labels.collect()}
    assert len(comps) == 1


@pytest.mark.slow
def test_pagerank_checkpoint_resume(spark, tmp_path):
    eg = _encoded(spark, n_pages=120)
    full, _ = pagerank(eg, max_iter=8, tol=0, collect_skew=False)
    want = {r["vid"]: r["rank"] for r in full.collect()}

    # run 4 iters, then resume for 4 more from the manifest
    d = str(tmp_path / "ck")
    pagerank(eg, max_iter=4, tol=0, checkpoint_dir=d, collect_skew=False)
    resumed, metrics = pagerank(
        eg, max_iter=8, tol=0, checkpoint_dir=d, resume=True, collect_skew=False
    )
    got = {r["vid"]: r["rank"] for r in resumed.collect()}
    ks = sorted(want)
    assert np.allclose([got[k] for k in ks], [want[k] for k in ks], atol=1e-12)
    assert metrics[0]["iteration"] == 4  # resumed, not restarted
    # manifest carries per-iteration lineage + metrics (north_rule)
    from webgraph.checkpoint import CheckpointManager

    entries = CheckpointManager(d, "pagerank").entries()
    assert [e["iteration"] for e in entries] == list(range(8))
    assert all("messages" in e["metrics"] for e in entries)


def test_metrics_shape(spark):
    eg = _encoded(spark, n_pages=150)
    _, metrics = pagerank(eg, max_iter=3, collect_skew=True)
    m0 = metrics[0]
    assert {"iteration", "wall_sec", "messages", "edges_per_sec", "delta_l1"} <= set(m0)
    assert "edges_skew_ratio" in m0  # skew sampled on first iteration
    # fixed-iteration mode (tol<=0) skips the delta pass entirely
    _, fast = pagerank(eg, max_iter=2, tol=0, collect_skew=False)
    assert all("delta_l1" not in m for m in fast)


def test_per_vertex_triangles_degree_ordered_on_hub_graph(spark):
    """Degree-ordered orientation must (a) keep per-vertex attribution
    identical to plain-vid orientation and (b) cut the wedge count on a
    hub-skewed graph — the blowup the ordering exists to kill."""
    from pyspark.sql import functions as F

    from webgraph.algos.common import from_int_edges
    from webgraph.algos.triangles import _oriented, triangle_count_per_vertex

    # hub in the MIDDLE of the vid range (plain src<dst orientation then
    # gives it both in- and out-edges -> O(n^2) wedges through it);
    # consecutive leaves linked -> triangles (i, i+1, hub)
    n, hub = 61, 30
    edges = [(i, hub) for i in range(n) if i != hub] + [
        (i, i + 1) for i in range(n - 1)
    ]
    eg = from_int_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )

    def wedge_count(degree_ordered):
        e = _oriented(eg, degree_ordered)
        e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        return e1.join(e2, "b").count()

    plain, ordered = wedge_count(False), wedge_count(True)
    assert ordered * 5 < plain  # hub wedges gone under degree ordering

    per_plain = {
        r["vid"]: r["triangles"]
        for r in triangle_count_per_vertex(eg, degree_ordered=False).collect()
    }
    per_ordered = {
        r["vid"]: r["triangles"]
        for r in triangle_count_per_vertex(eg, degree_ordered=True).collect()
    }
    assert per_plain == per_ordered
    # every leaf-chain edge not touching the hub closes a triangle with it
    assert per_ordered[hub] == n - 3
    assert per_ordered[0] == 1 and per_ordered[1] == 2


def test_hits_matches_python_oracle(spark):
    import math

    from webgraph.algos.hits import hits

    for fixture, n_pages in [("triangle", None), (None, 200)]:
        eg = _encoded(spark, fixture=fixture, n_pages=n_pages)
        edges = _edge_list(eg)
        verts = sorted(_vertex_set(eg))

        hub = {v: 1.0 for v in verts}
        auth = {}
        for _ in range(3):
            auth = {v: 0.0 for v in verts}
            for s, d in edges:
                auth[d] += hub[s]
            nrm = math.sqrt(sum(x * x for x in auth.values()))
            auth = {v: (x / nrm if nrm else 0.0) for v, x in auth.items()}
            hub = {v: 0.0 for v in verts}
            for s, d in edges:
                hub[s] += auth[d]
            nrm = math.sqrt(sum(x * x for x in hub.values()))
            hub = {v: (x / nrm if nrm else 0.0) for v, x in hub.items()}

        out, metrics = hits(eg, max_iter=3)
        got = {r["vid"]: (r["hub"], r["auth"]) for r in out.collect()}
        assert len(metrics) == 3
        for v in verts:
            assert abs(got[v][0] - hub[v]) < 1e-9, (fixture, v)
            assert abs(got[v][1] - auth[v]) < 1e-9, (fixture, v)


def test_k_core_matches_python_oracle(spark):
    from webgraph.algos import encode_graph
    from webgraph.algos.kcore import k_core

    eg = _encoded(spark, n_pages=200)
    edges = _edge_list(eg)
    verts = _vertex_set(eg)

    def py_kcore(k):
        und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
        alive = set(verts)
        while True:
            deg = {v: 0 for v in alive}
            for a, b in und:
                if a in alive and b in alive:
                    deg[a] += 1
                    deg[b] += 1
            nxt = {v for v in alive if deg.get(v, 0) >= k}
            if nxt == alive:
                return alive
            alive = nxt

    for k in (2, 3, 5):
        got = {r["vid"] for r in k_core(eg, k)[0].collect()}
        assert got == py_kcore(k), k
    # empty-core edge case converges to the empty set
    assert k_core(eg, 10_000)[0].count() == 0

def test_hits_rejects_zero_iterations(spark):
    from webgraph.algos.hits import hits

    eg = _encoded(spark, fixture="triangle")
    with pytest.raises(ValueError):
        hits(eg, max_iter=0)


@pytest.mark.slow
def test_hits_checkpoint_resume(spark, tmp_path):
    from webgraph.algos.hits import hits

    eg = _encoded(spark, n_pages=120)
    full, _ = hits(eg, max_iter=4)
    want = {r["vid"]: (r["hub"], r["auth"]) for r in full.collect()}

    d = str(tmp_path / "ck")
    hits(eg, max_iter=2, checkpoint_dir=d)
    resumed, metrics = hits(eg, max_iter=4, checkpoint_dir=d, resume=True)
    got = {r["vid"]: (r["hub"], r["auth"]) for r in resumed.collect()}
    assert metrics[0]["iteration"] == 2  # resumed, not restarted
    for v, (h, a) in want.items():
        assert abs(got[v][0] - h) < 1e-12 and abs(got[v][1] - a) < 1e-12

    from webgraph.checkpoint import CheckpointManager

    entries = CheckpointManager(d, "hits").entries()
    assert [e["iteration"] for e in entries] == list(range(4))
    assert all("messages" in e["metrics"] for e in entries)


def test_k_core_checkpoint_resume(spark, tmp_path):
    from webgraph.algos.common import from_int_edges
    from webgraph.algos.kcore import k_core

    # a chain of small cliques peels over several rounds
    edges = []
    for c in range(6):
        b = 10 * c
        edges += [(b + i, b + j) for i in range(4) for j in range(i + 1, 4)]
        edges.append((b + 3, b + 10))  # bridge to next clique
    eg = from_int_edges(spark.createDataFrame(edges[:-1], "src long, dst long"))

    want = {r["vid"] for r in k_core(eg, 3)[0].collect()}

    d = str(tmp_path / "ck")
    k_core(eg, 3, rounds=1, checkpoint_dir=d)
    resumed, metrics = k_core(eg, 3, checkpoint_dir=d, resume=True)
    assert metrics[0]["iteration"] == 1  # continued from the commit
    assert {r["vid"] for r in resumed.collect()} == want


@pytest.mark.slow
def test_k_core_path_graph_peels_to_empty_fixpoint(spark):
    """ADVICE case: a path has an empty 2-core but needs ~n/2 peel rounds;
    the old max_iter=50 default silently returned the partially-peeled
    superset. Default mode now runs to the fixpoint."""
    from webgraph.algos.common import from_int_edges
    from webgraph.algos.kcore import k_core

    n = 40
    eg = from_int_edges(
        spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    )
    out, metrics = k_core(eg, 2)
    assert out.count() == 0
    assert len(metrics) > 10  # really did peel round by round

    with pytest.raises(RuntimeError, match="max_iter"):
        k_core(eg, 2, max_iter=3)


@pytest.mark.slow
def test_personalized_pagerank_matches_python_oracle(spark):
    from tests.oracles import ppr_oracle
    from webgraph.algos import personalized_pagerank

    # dangling fixture exercises the seed-directed dangling redistribution
    for fixture, n_pages in [("dangling", None), (None, 200)]:
        eg = _encoded(spark, fixture=fixture, n_pages=n_pages)
        verts = _vertex_set(eg)
        seeds = sorted(verts)[:3]
        ranks, metrics = personalized_pagerank(
            eg, seeds, tol=0.0, max_iter=5, collect_skew=False
        )
        got = {r["vid"]: r["rank"] for r in ranks.collect()}
        want = ppr_oracle(_edge_list(eg), verts, set(seeds), max_iter=5)
        ks = sorted(verts)
        assert np.allclose([got[k] for k in ks], [want[k] for k in ks], atol=1e-9)
        # probability mass is conserved (teleport + dangling both land on p)
        assert abs(sum(got.values()) - 1.0) < 1e-9
        assert len(metrics) == 5

    with pytest.raises(ValueError):
        personalized_pagerank(eg, [10**12], max_iter=2)

    # duplicate seeds must not double-count mass (one row per vertex,
    # mass exactly 1)
    s = sorted(_vertex_set(eg))[:2]
    dup, _ = personalized_pagerank(
        eg, [s[0], s[0], s[1]], tol=0.0, max_iter=2, collect_skew=False
    )
    assert dup.count() == len(_vertex_set(eg))
    assert abs(dup.agg(F.sum("rank")).first()[0] - 1.0) < 1e-9


@pytest.mark.slow
def test_bfs_depths_matches_python_oracle(spark):
    from tests.oracles import bfs_oracle
    from webgraph.algos import bfs_depths

    for fixture, n_pages in [("chain_backlink", None), (None, 200)]:
        eg = _encoded(spark, fixture=fixture, n_pages=n_pages)
        seeds = sorted(_vertex_set(eg))[:2]
        for directed in (True, False):
            got_df, metrics = bfs_depths(
                eg, seeds, max_depth=4, directed=directed
            )
            got = {r["vid"]: r["depth"] for r in got_df.collect()}
            want = bfs_oracle(
                _edge_list(eg), set(seeds), max_depth=4, directed=directed
            )
            assert got == want
            # every level's frontier count matches the oracle's histogram
            from collections import Counter

            hist = Counter(want.values())
            for m in metrics:
                assert m["frontier"] == hist.get(m["iteration"], 0)


@pytest.mark.slow
def test_bfs_validates_seeds_and_depth(spark):
    from webgraph.algos import bfs_depths

    eg = _encoded(spark, fixture="star_in")
    with pytest.raises(ValueError, match="seed"):
        bfs_depths(eg, [10**12], max_depth=2)
    with pytest.raises(ValueError, match="max_depth"):
        bfs_depths(eg, sorted(_vertex_set(eg))[:1], max_depth=-1)
    # depth 0: just the seeds
    seeds = sorted(_vertex_set(eg))[:2]
    out, metrics = bfs_depths(eg, seeds, max_depth=0)
    assert {r["vid"] for r in out.collect()} == set(seeds)
    assert metrics == []


@pytest.mark.slow
def test_bfs_checkpoint_resume(spark, tmp_path):
    from webgraph.algos import bfs_depths

    eg = _encoded(spark, n_pages=150)
    seeds = sorted(_vertex_set(eg))[:2]
    full, _ = bfs_depths(eg, seeds, max_depth=4)
    want = {(r["vid"], r["depth"]) for r in full.collect()}

    d = str(tmp_path / "ck")
    bfs_depths(eg, seeds, max_depth=2, checkpoint_dir=d)
    resumed, metrics = bfs_depths(
        eg, seeds, max_depth=4, checkpoint_dir=d, resume=True
    )
    assert {(r["vid"], r["depth"]) for r in resumed.collect()} == want
    assert metrics[0]["iteration"] == 3  # resumed, not restarted


def test_cocitation_matches_python_oracle(spark):
    from tests.oracles import cocitation_oracle
    from webgraph.algos import cocitation

    eg = _encoded(spark, n_pages=200)
    edges = _edge_list(eg)
    for cap in (None, 3):
        got_df = cocitation(eg.edges, min_common=2, max_out_degree=cap)
        got = {(r["a"], r["b"]): r["common"] for r in got_df.collect()}
        assert got == cocitation_oracle(edges, min_common=2, max_out_degree=cap)


@pytest.mark.slow
def test_scc_matches_tarjan_oracle(spark):
    from tests.oracles import scc_oracle
    from webgraph.algos import strongly_connected_components
    from webgraph.algos.common import from_int_edges

    # two 3-cycles bridged by one edge, plus a tail: 2 cyclic SCCs +
    # singletons; then a random sparse digraph (many SCC shapes)
    bridged = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (5, 6)]
    import random

    rng = random.Random(7)
    rand = list({(rng.randrange(40), rng.randrange(40)) for _ in range(90)})
    for edge_list in (bridged, rand):
        eg = from_int_edges(
            spark.createDataFrame(edge_list, "src long, dst long")
        )
        out, metrics = strongly_connected_components(eg)
        got = {r["vid"]: r["scc"] for r in out.collect()}
        want = scc_oracle(edge_list, _vertex_set(eg))
        assert got == want
        assert sum(m["settled"] for m in metrics) == len(want)


@pytest.mark.slow
def test_scc_raises_on_round_cap_instead_of_partial_labels(spark):
    from webgraph.algos import strongly_connected_components
    from webgraph.algos.common import from_int_edges

    # A path of singleton SCCs no longer exercises the cap: the round-6
    # trim settles the whole DAG fringe without any fixpoint round. A
    # CHAIN of 2-cycles C0 -> C1 -> ... is trim-proof (every vertex lies
    # on a cycle) and settles exactly one SCC per peel round (only the
    # chain head has fwd-min == bwd-min), so the cap must raise.
    chain = []
    for i in range(6):
        a, b = 2 * i, 2 * i + 1
        chain += [(a, b), (b, a)]
        if i < 5:
            chain.append((b, 2 * i + 2))
    eg = from_int_edges(spark.createDataFrame(chain, "src long, dst long"))
    with pytest.raises(RuntimeError, match="max_rounds"):
        strongly_connected_components(eg, max_rounds=2)


def test_scc_trim_settles_dag_fringe_without_fixpoint_rounds(spark):
    """Round-6 trim pin: a pure path (all singleton SCCs) settles
    entirely through the trim anti-joins — zero min-label fixpoints run,
    labels are exact, and the round cap is never consulted."""
    from webgraph.algos import strongly_connected_components
    from webgraph.algos.common import from_int_edges

    path = [(i, i + 1) for i in range(12)]
    eg = from_int_edges(spark.createDataFrame(path, "src long, dst long"))
    labels, metrics = strongly_connected_components(eg, max_rounds=2)
    got = {(r["vid"], r["scc"]) for r in labels.collect()}
    assert got == {(i, i) for i in range(13)}
    assert len(metrics) == 1
    assert metrics[0]["trimmed"] == 13
    assert "fwd_iters" not in metrics[0]  # no fixpoint ever ran


def test_coupling_matches_python_oracle(spark):
    from tests.oracles import cocitation_oracle
    from webgraph.algos.cocitation import coupling

    eg = _encoded(spark, n_pages=200)
    # coupling == cocitation on the transposed edge list
    edges_t = [(d, s) for s, d in _edge_list(eg)]
    for cap in (None, 3):
        got_df = coupling(eg.edges, min_common=2, max_in_degree=cap)
        got = {(r["a"], r["b"]): r["common"] for r in got_df.collect()}
        assert got == cocitation_oracle(edges_t, min_common=2, max_out_degree=cap)
