"""Round-3 operators: clustering coefficient, near-dup clustering,
stratified sampling, graph contraction + weighted PageRank.

Oracle style follows the suite convention: tiny hand-checkable fixtures
with exact expected values (GraphImporterTestBase.java's known-degree
scenarios), plus partition-independence checks for the deterministic
sampling ops.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from webgraph.algos.common import (
    contract_graph,
    from_int_edges,
    from_weighted_edges,
)
from webgraph.algos.pagerank import pagerank
from webgraph.algos.triangles import clustering_coefficient


def _graph(spark, edges):
    return from_int_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )


# ------------------------------------------------- clustering coefficient --


def test_clustering_coefficient_triangle_plus_pendant(spark):
    # Triangle 1-2-3 plus pendant 4 attached to 1.
    g = _graph(spark, [(1, 2), (2, 3), (3, 1), (1, 4)])
    rows = {r["vid"]: r for r in clustering_coefficient(g).collect()}
    assert rows[1]["deg"] == 3 and rows[1]["triangles"] == 1
    # lcc(1) = 2*1 / (3*2) = 1/3 -> 333333 in exact micro-units
    assert rows[1]["lcc_e6"] == 333333
    for v in (2, 3):
        assert rows[v]["deg"] == 2 and rows[v]["lcc_e6"] == 1_000_000
    assert rows[4]["deg"] == 1 and rows[4]["lcc_e6"] == 0


@pytest.mark.slow
def test_clustering_coefficient_direction_agnostic(spark):
    # Same undirected structure, different edge directions.
    a = clustering_coefficient(_graph(spark, [(1, 2), (2, 3), (3, 1)]))
    b = clustering_coefficient(_graph(spark, [(2, 1), (3, 2), (3, 1)]))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ------------------------------------------------------- dedup clustering --


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.slow
def test_dedup_clusters_transitive_and_singletons(spark):
    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base + "extra tail token"
    other = "completely different content about spark engines " * 6
    docs = _docs(
        spark,
        [(1, base), (2, base), (3, near), (4, other), (5, "short unique text")],
    )
    out = {
        r["doc_id"]: r
        for r in __import__("webgraph.dedup", fromlist=["dedup_clusters"])
        .dedup_clusters(docs, threshold=0.5)
        .collect()
    }
    assert len(out) == 5  # every corpus row present
    # 1~2 identical, 2~3 near: transitive cluster with canonical min id 1
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == out[3]["cluster_id"] == 1
    assert out[1]["cluster_size"] == 3
    assert out[1]["keep"] and not out[2]["keep"] and not out[3]["keep"]
    # singletons keep themselves
    for v in (4, 5):
        assert out[v]["cluster_id"] == v and out[v]["cluster_size"] == 1 and out[v]["keep"]


# ----------------------------------------------------- stratified sampling --


def test_stratified_sample_quota_and_determinism(spark):
    from webgraph.text import stratified_sample

    rows = [(i, "g%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out1 = stratified_sample(df, "grp", 10, id_col="doc_id").collect()
    assert len(out1) == 30
    per = {}
    for r in out1:
        per.setdefault(r["grp"], []).append(r["sample_rank"])
    for g, ranks in per.items():
        assert sorted(ranks) == list(range(1, 11))
    # partition-independence: different physical layout, identical sample
    out2 = stratified_sample(
        df.repartition(7, "doc_id"), "grp", 10, id_col="doc_id"
    ).collect()
    key = lambda r: (r["grp"], r["doc_id"], r["sample_rank"])
    assert sorted(map(key, out1)) == sorted(map(key, out2))


def test_stratified_sample_small_group_keeps_all(spark):
    from webgraph.text import stratified_sample

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, grp string"
    )
    out = stratified_sample(df, "grp", 5, id_col="doc_id").collect()
    assert len(out) == 3


# ------------------------------------- contraction + weighted pagerank --


def test_contract_graph_weights(spark):
    g = _graph(spark, [(0, 2), (1, 2), (0, 3), (2, 0), (1, 3)])
    mapping = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20), (3, 20)], "vid long, gid long"
    )
    rows = {(r["src"], r["dst"]): r["weight"] for r in contract_graph(g, mapping).collect()}
    # 0->2, 1->2, 0->3, 1->3 all cross 10->20 (weight 4); 2->0 is 20->10.
    assert rows == {(10, 20): 4, (20, 10): 1}


def test_weighted_pagerank_matches_numpy(spark):
    edges = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0)]
    wg = from_weighted_edges(
        spark.createDataFrame(edges, "src long, dst long, weight double")
    )
    ranks, _ = pagerank(wg, tol=0.0, max_iter=20, collect_skew=False, weight_col="weight")
    got = {r["vid"]: r["rank"] for r in ranks.collect()}

    n, d = 3, 0.85
    r = np.full(n, 1.0 / n)
    w = np.zeros((n, n))
    for s, t, wt in edges:
        w[s][t] = wt
    p = w / w.sum(axis=1, keepdims=True)
    for _ in range(20):
        r = (1 - d) / n + d * (r @ p)
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-9


@pytest.mark.slow
def test_weighted_pagerank_uniform_weights_equal_unweighted(spark):
    edges = [(0, 1), (1, 2), (2, 0), (0, 2)]
    g = _graph(spark, edges)
    wdf = spark.createDataFrame(
        [(s, t, 1.0) for s, t in edges], "src long, dst long, weight double"
    )
    wg = from_weighted_edges(wdf)
    r1, _ = pagerank(g, tol=0.0, max_iter=8, collect_skew=False)
    r2, _ = pagerank(wg, tol=0.0, max_iter=8, collect_skew=False, weight_col="weight")
    a = {r["vid"]: r["rank"] for r in r1.collect()}
    b = {r["vid"]: r["rank"] for r in r2.collect()}
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12


# ------------------------------------------------ walks / harmonic / anf --


def test_deterministic_walks_shape_and_reproducibility(spark):
    from webgraph.algos.walks import deterministic_walks

    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (1, 3)])
    w1 = sorted(map(tuple, deterministic_walks(g, walk_len=3).collect()))
    w2 = sorted(map(tuple, deterministic_walks(g, walk_len=3).collect()))
    assert w1 == w2
    # every walk starts at its own vertex
    starts = [(r[0], r[2]) for r in w1 if r[1] == 0]
    assert starts == [(v, v) for v in range(4)]
    # vertex 3 is dangling: its walk has only step 0
    assert [r for r in w1 if r[0] == 3] == [(3, 0, 3)]
    # walks follow edges: each consecutive (step, step+1) pair is an edge
    edges = {(0, 1), (1, 2), (2, 0), (1, 3)}
    bywalk = {}
    for wid, step, vid in w1:
        bywalk.setdefault(wid, {})[step] = vid
    for wid, steps in bywalk.items():
        for t in range(len(steps) - 1):
            assert (steps[t], steps[t + 1]) in edges


def test_harmonic_centrality_exact_values(spark):
    from webgraph.algos.bfs import harmonic_centrality

    # path 0 -> 1 -> 2 -> 3: from 0, depths 1,2,3
    g = _graph(spark, [(0, 1), (1, 2), (2, 3)])
    rows = {r["vid"]: r for r in harmonic_centrality(g, [0, 3], 3).collect()}
    assert rows[0]["n_reached"] == 3
    assert rows[0]["harmonic_e6"] == 1_000_000 + 500_000 + 333_333
    assert rows[3]["n_reached"] == 0 and rows[3]["harmonic_e6"] == 0


def test_exact_ball_sizes(spark):
    from webgraph.algos.anf import neighborhood_sizes_exact

    g = _graph(spark, [(0, 1), (1, 2), (2, 3)])
    balls = {r["vid"]: r["ball"] for r in neighborhood_sizes_exact(g, 2).collect()}
    assert balls == {0: 3, 1: 3, 2: 2, 3: 1}


@pytest.mark.slow
def test_hyperball_estimate_tracks_exact(spark):
    from webgraph.algos.anf import (
        hyperball_estimate,
        hyperball_registers,
        neighborhood_sizes_exact,
    )
    from webgraph.corpus import synthetic_corpus
    from webgraph.build import build_graph
    from webgraph.algos.common import encode_graph

    corpus = synthetic_corpus(spark, n_pages=800, seed=7)
    g = build_graph(corpus, ["example.com"])
    eg = encode_graph(g.edges.select("src", "dst"))
    exact = {r["vid"]: r["ball"] for r in neighborhood_sizes_exact(eg, 2).collect()}
    regs = hyperball_registers(eg, radius=2, m=64)
    est = {r["vid"]: r["ball_est"] for r in hyperball_estimate(regs, m=64).collect()}
    assert set(est) == set(exact)
    import math

    errs = [abs(est[v] - exact[v]) / exact[v] for v in exact if exact[v] >= 32]
    assert errs, "fixture should have nontrivial balls"
    mean_err = sum(errs) / len(errs)
    # HLL with m=64 -> ~13% expected relative error; allow generous slack
    assert mean_err < 0.25, mean_err


# ------------------------------------- repetition / pii / modularity --


def test_repetition_score_values(spark):
    from webgraph.text import repetition_score

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # 7 trigrams, "a b c" x3
            (2, "all words unique here now"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_score(docs).collect()}
    assert rows[1]["n_ngrams"] == 7 and rows[1]["max_rep"] == 3
    assert rows[1]["rep_e6"] == (1_000_000 * 3) // 7
    assert rows[2]["max_rep"] == 1
    assert rows[3]["n_ngrams"] == 0 and rows[3]["rep_e6"] == 0


def test_redact_pii_counts_and_text(spark):
    from webgraph.text import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "write to a.b+c@mail.example.com or x@y.io, call 555-010-1234"),
            (2, "no pii at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 1
    assert rows[1]["clean_text"] == "write to <EMAIL> or <EMAIL>, call <PHONE>"
    assert rows[2]["n_emails"] == 0 and rows[2]["clean_text"] == "no pii at all"


def test_modularity_two_cliques(spark):
    from webgraph.algos.community import modularity

    # two triangles joined by one bridge edge; perfect 2-community split
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    g = _graph(spark, edges)
    mapping = spark.createDataFrame(
        [(v, 0 if v < 3 else 1) for v in range(6)], "vid long, gid long"
    )
    row = modularity(g, mapping).collect()[0]
    assert row["n_communities"] == 2
    # |S|=14; w_c=6 each; d_0=d_1=7: Q = 2*(6/14 - (7/14)^2) = 5/14
    import math

    assert abs(row["modularity_e6"] - round(5 / 14 * 1e6)) <= 1


def test_late_orders_semi_join_matches_manual(spark):
    from webgraph.contract import q_r_late_orders

    out = {
        r["o_orderpriority"]: r["n_late"]
        for r in q_r_late_orders(spark, "/root/testdata/sf0.001").collect()
    }
    # manual: distinct late orderkeys via inner join then count
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    man = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .count()
    )
    man_d = {r["o_orderpriority"]: r["count"] for r in man.collect()}
    assert out == man_d


# ------------------------------------------- salsa / asof / inverted idx --


def test_salsa_matches_numpy(spark):
    from webgraph.algos.salsa import salsa

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    g = _graph(spark, edges)
    state, _ = salsa(g, max_iter=4)
    got = {r["vid"]: (r["hub"], r["auth"]) for r in state.collect()}

    n = 4
    outd = {0: 2, 1: 1, 2: 1, 3: 1}
    ind = {1: 1, 2: 3, 0: 1}
    hub = {v: 1.0 for v in range(n)}
    for _ in range(4):
        auth = {v: 0.0 for v in range(n)}
        for s, t in edges:
            auth[t] += hub[s] / outd[s]
        hub = {v: 0.0 for v in range(n)}
        for s, t in edges:
            hub[s] += auth[t] / ind[t]
    for v in range(n):
        assert abs(got[v][0] - hub[v]) < 1e-12, (v, got[v], hub[v])
        assert abs(got[v][1] - auth[v]) < 1e-12


def test_as_of_join_semantics(spark):
    from datetime import datetime

    from webgraph.asof import as_of_join

    ts = lambda m: datetime(2024, 1, 1, 0, m)
    facts = spark.createDataFrame(
        [(1, 100, ts(5)), (2, 100, ts(10)), (3, 100, ts(1)), (4, 200, ts(30))],
        "event_id long, user_id long, ts timestamp",
    )
    states = spark.createDataFrame(
        [(100, ts(2), 10.0), (100, ts(10), 20.0), (200, ts(31), 99.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r["last_value"]
        for r in as_of_join(facts, states, "user_id", "ts", "ts", "value").collect()
    }
    assert out[1] == 10.0          # state at :02 applies at :05
    assert out[2] == 20.0          # tie at :10 -> state at the same ts wins
    assert out[3] is None          # fact before any state
    assert out[4] is None          # user 200's only state is after the fact


def test_inverted_index_cap_and_true_df(spark):
    from webgraph.text import inverted_index

    docs = spark.createDataFrame(
        [(1, "x x x common"), (2, "x common"), (3, "x y common"), (4, "x common")],
        "doc_id long, text string",
    )
    rows = [r for r in inverted_index(docs, k=2).collect()]
    x = sorted([r for r in rows if r["token"] == "x"], key=lambda r: r["rank"])
    assert len(x) == 2                      # capped at k
    assert x[0]["doc_id"] == 1 and x[0]["tf"] == 3
    assert x[1]["doc_id"] == 2              # tf tie (1) broken by doc_id
    assert all(r["df"] == 4 for r in x)     # true df survives the cap
    y = [r for r in rows if r["token"] == "y"]
    assert len(y) == 1 and y[0]["df"] == 1


@pytest.mark.slow
def test_pagerank_warm_start_converges_faster_to_same_fixpoint(spark):
    from webgraph.corpus import synthetic_edges

    e1 = synthetic_edges(spark, n_vertices=2000, n_edges=20000, partitions=4)
    g1 = from_int_edges(e1)
    r1, m1 = pagerank(g1, tol=1e-9, max_iter=60, collect_skew=False)

    # graph delta: ~1% extra edges
    extra = synthetic_edges(
        spark, n_vertices=2000, n_edges=200, partitions=2, seed=99
    )
    g2 = from_int_edges(e1.unionByName(extra))
    r_cold, m_cold = pagerank(g2, tol=1e-9, max_iter=60, collect_skew=False)
    r_warm, m_warm = pagerank(
        g2, tol=1e-9, max_iter=60, collect_skew=False, initial_ranks=r1
    )
    assert len(m_warm) < len(m_cold), (len(m_warm), len(m_cold))
    cold = {r["vid"]: r["rank"] for r in r_cold.collect()}
    warm = {r["vid"]: r["rank"] for r in r_warm.collect()}
    for v in cold:
        assert abs(cold[v] - warm[v]) < 1e-6


# --------------------------------------------- hll / assortativity / q17 --


def test_hll_distinct_estimate_accuracy(spark):
    from webgraph.sketches import hll_build, hll_count

    n = 5000
    items = spark.range(n).select(
        F.concat(F.lit("tok"), F.col("id").cast("string")).alias("token")
    )
    regs = hll_build(items, "token", m=64)
    assert regs.count() == 64
    est = hll_count(regs, m=64)
    assert abs(est - n) / n < 0.3, est


def test_hll_merge_is_elementwise_max(spark):
    from webgraph.sketches import hll_build

    a = spark.createDataFrame([("x",), ("y",)], "token string")
    b = spark.createDataFrame([("y",), ("z",)], "token string")
    both = a.unionByName(b)
    ra = hll_build(a, m=16).withColumnRenamed("reg", "ra")
    rb = hll_build(b, m=16).withColumnRenamed("reg", "rb")
    merged = ra.join(rb, "j").select(
        "j", F.greatest("ra", "rb").alias("reg")
    )
    direct = hll_build(both, m=16)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_assortativity_bounds_and_star(spark):
    from webgraph.contract import q_g_assortativity

    row = q_g_assortativity(spark, "/root/testdata/sf0.001").collect()[0]
    assert -1_000_000 <= row["assortativity_e6"] <= 1_000_000
    assert row["n_edges"] > 0


# ------------------------------------------- decontaminate / packing --


def test_decontaminate_flags_overlap_only(spark):
    from webgraph.dedup import decontaminate

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    train = _docs(
        spark,
        [
            (1, "prefix words " + shared + " suffix words"),
            (2, "totally unrelated content with many distinct tokens here"),
        ],
    )
    evals = _docs(spark, [(100, shared + " trailing eval context")])
    out = {r["doc_id"]: r for r in decontaminate(train, evals, window_tokens=8).collect()}
    assert out[1]["contaminated"] and out[1]["n_shared_grams"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_shared_grams"] == 0


def test_pack_sequences_chunk_assignment(spark):
    from webgraph.text import pack_sequences, token_prefix_sums

    docs = _docs(spark, [(i, " ".join(["w"] * 10)) for i in range(1, 21)])
    out = pack_sequences(docs, 25).collect()
    assert len(out) == 20
    for r in out:
        assert r["seq_id"] == (r["cum_tokens"] - r["n_tokens"]) // 25
    # total stream = 200 tokens -> seq ids span 0..7
    assert {r["seq_id"] for r in out} == set(range(8))
    # partition-independence
    a = sorted(map(tuple, out))
    b = sorted(map(tuple, pack_sequences(docs.repartition(5), 25).collect()))
    assert a == b


def test_sample_to_token_budget_unchanged_by_refactor(spark):
    from webgraph.text import sample_to_token_budget

    docs = _docs(spark, [(i, " ".join(["w"] * 10)) for i in range(1, 21)])
    out = sample_to_token_budget(docs, 95).collect()
    assert all(r["cum_tokens"] <= 95 for r in out)
    assert len(out) == 9  # 9 docs x 10 tokens = 90 <= 95 < 100


def test_bfs_path_counts_diamond(spark):
    from webgraph.algos.bfs import bfs_path_counts

    # diamond: two shortest paths 0->3; plus a longer path through 4
    g = _graph(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (0, 4), (4, 1)])
    out = {r["vid"]: (r["depth"], r["sigma"]) for r in
           bfs_path_counts(g, 0, max_depth=3).collect()}
    assert out[0] == (0, 1)
    assert out[1] == (1, 1)   # direct edge wins; path via 4 is longer
    assert out[2] == (1, 1)
    assert out[4] == (1, 1)
    assert out[3] == (2, 2)   # two shortest paths


def test_bfs_path_counts_unreachable_and_seed_validation(spark):
    import pytest as _pytest

    from webgraph.algos.bfs import bfs_path_counts

    g = _graph(spark, [(0, 1), (2, 3)])
    out = bfs_path_counts(g, 0, max_depth=5)
    assert {r["vid"] for r in out.collect()} == {0, 1}
    with _pytest.raises(ValueError):
        bfs_path_counts(g, 99, max_depth=2)


@pytest.mark.slow
def test_betweenness_contributions_diamond(spark):
    from webgraph.algos.bfs import betweenness_contributions

    g = _graph(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    out = {r["vid"]: r for r in
           betweenness_contributions(g, 0, max_depth=3).collect()}
    assert out[3]["sigma"] == 2 and out[3]["delta"] == 0.0
    assert out[1]["delta"] == 0.5 and out[2]["delta"] == 0.5
    assert out[0]["delta"] == 3.0


@pytest.mark.slow
def test_hyperball_wide_equals_long(spark):
    from webgraph.algos.anf import (
        hyperball_registers,
        hyperball_registers_wide,
        wide_to_long,
    )

    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4)])
    long_l = sorted(map(tuple, hyperball_registers(g, radius=2, m=16).collect()))
    wide = hyperball_registers_wide(g, radius=2, m=16)
    long_w = sorted(map(tuple, wide_to_long(wide, m=16).collect()))
    assert long_l == long_w


def test_dedup_clusters_no_pairs_all_singletons(spark):
    from webgraph.dedup import dedup_clusters

    docs = _docs(
        spark,
        [(i, "entirely distinct doc %d with own words w%d x%d" % (i, i, i))
         for i in range(1, 6)],
    )
    out = dedup_clusters(docs, threshold=0.9).collect()
    assert len(out) == 5
    assert all(r["keep"] and r["cluster_size"] == 1 for r in out)


@pytest.mark.slow
def test_neighborhood_function_tracks_exact_and_diameter(spark):
    from webgraph.algos.anf import (
        effective_diameter,
        neighborhood_function,
        neighborhood_sizes_exact,
    )
    from webgraph.corpus import synthetic_edges

    g = from_int_edges(synthetic_edges(spark, n_vertices=400, n_edges=2400, partitions=4))
    nf = neighborhood_function(g, max_r=4, m=64)
    assert [row["r"] for row in nf] == [0, 1, 2, 3, 4]
    # monotone nondecreasing curve
    vals = [row["est_pairs"] for row in nf]
    assert all(b >= a * 0.99 for a, b in zip(vals, vals[1:]))
    # r=2 estimate within HLL error of the exact total
    exact2 = neighborhood_sizes_exact(g, 2).agg(F.sum("ball")).collect()[0][0]
    assert abs(vals[2] - exact2) / exact2 < 0.2, (vals[2], exact2)
    d = effective_diameter(nf)
    assert 0 <= d <= 4


def test_histogram_quantiles_accuracy_and_degenerate(spark):
    from webgraph.sketches import histogram_quantiles

    df = spark.range(1, 10001).select((F.col("id") * 1.0).alias("v"))
    out = {r["q_pct"]: r["est_e6"] / 1e6 for r in
           histogram_quantiles(df, "v", (50, 90), bins=1000).collect()}
    binw = (10000 - 1) / 1000
    assert abs(out[50] - 5000) <= binw + 1
    assert abs(out[90] - 9000) <= binw + 1
    # degenerate: constant column
    const = spark.range(5).select(F.lit(7.5).alias("v"))
    rows = {r["q_pct"]: r["est_e6"] for r in
            histogram_quantiles(const, "v", (50,), bins=10).collect()}
    assert rows[50] == 7_500_000


# ------------------------------------------------------ skew stress --


@pytest.mark.slow
def test_extreme_hub_degree_agg_and_pagerank(spark):
    """Skew regression: one vertex receives 25% of all edges (a 10^5:1
    hub at bench scale). Degree aggregation and a PageRank iteration must
    still complete with correct values — map-side partial aggregation is
    what keeps the hub's fan-in off a single reducer, and salting must
    not change results."""
    from webgraph.corpus import synthetic_edges

    n = 40_000
    base = synthetic_edges(spark, n_vertices=2000, n_edges=n, partitions=8)
    hub = (
        spark.range(n // 3)
        .select((F.col("id") % 1999).alias("src"), F.lit(777_777).alias("dst"))
    )
    g = from_int_edges(base.unionByName(hub))
    indeg = g.edges.groupBy("dst").count()
    hub_row = indeg.filter(F.col("dst") == 777_777).collect()[0]
    assert hub_row["count"] >= 1900  # distinct srcs pointing at the hub
    r_plain, _ = pagerank(g, tol=0.0, max_iter=2, collect_skew=True)
    r_salted, _ = pagerank(g, tol=0.0, max_iter=2, collect_skew=False, salt_buckets=8)
    a = {r["vid"]: r["rank"] for r in r_plain.collect()}
    b = {r["vid"]: r["rank"] for r in r_salted.collect()}
    assert abs(a[777_777] - b[777_777]) < 1e-12
    top = max(a, key=a.get)
    assert top == 777_777  # the hub dominates, as it must


@pytest.mark.slow
def test_streaming_cms_replay_does_not_double_count(spark, tmp_path):
    import shutil

    from webgraph.streaming import read_cms_state, streaming_cms

    docs = _docs(
        spark, [(i, "alpha beta gamma token%d" % i) for i in range(40)]
    )
    src = str(tmp_path / "in")
    docs.repartition(4).write.parquet(src)

    def drain(ck):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        streaming_cms(
            spark, stream, str(tmp_path / "state"), str(tmp_path / ck),
            width=64, depth=2,
        )

    drain("ck1")
    first = sorted(
        map(tuple, read_cms_state(spark, str(tmp_path / "state"))
            .select("row", "bucket", "cnt").collect())
    )
    # simulate a lost checkpoint: every micro-batch replays with the same
    # batch ids — the state's committed-version watermark must reject them
    drain("ck2")
    second = sorted(
        map(tuple, read_cms_state(spark, str(tmp_path / "state"))
            .select("row", "bucket", "cnt").collect())
    )
    assert first == second


# --------------------------------------------------- end-to-end pipeline --


@pytest.mark.slow
def test_clean_corpus_stage_accounting(spark):
    from webgraph.pipeline import clean_corpus

    rows = []
    # 10 good docs, pairwise-distinct vocabularies (no shared trigrams)
    for i in range(1, 11):
        words = " ".join("w%dtok%d" % (i, k) for k in range(12))
        rows.append((i, "g%d" % (i % 2), words))
    rows.append((20, "g0", "x"))                      # fails token floor
    rows.append((21, "g1", "1 2 3 4 5 6 7 8 9"))      # fails alpha ratio
    rows.append((22, "g0", rows[0][2]))               # exact dup of doc 1
    rows.append((23, "g1", rows[1][2] + " extratok")) # near-dup of doc 2
    docs = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    evals = spark.createDataFrame(
        [(100, rows[2][2] + " heldout trailer")], "doc_id long, text string"
    )
    out, manifest = clean_corpus(
        docs, evals, group_col="grp", min_tokens=5, min_alpha_pct10=3,
        near_threshold=0.5, quota=4, seq_len=30,
    )
    assert manifest["input"] == 14
    assert manifest["quality"] == 12        # 20 and 21 dropped
    assert manifest["exact_dedup"] == 11    # 22 collapsed into 1
    assert manifest["near_dedup"] == 10     # 23 clustered under 2
    assert manifest["decontaminated"] == 9  # doc 3 shares eval 8-grams
    assert manifest["sampled"] == 8         # quota 4 per group
    rows_out = out.collect()
    assert len(rows_out) == 8
    for r in rows_out:
        assert r["seq_id"] == (r["cum_tokens"] - r["n_tokens"]) // 30
