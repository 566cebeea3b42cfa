"""Round-5g operators: bowtie decomposition, knn(k) degree-correlation
curve, module import graph. House style: tiny hand-checkable fixtures
with exact expected values, plus structural pins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webgraph.algos.common import from_int_edges


def _graph(spark, edges):
    return from_int_edges(spark.createDataFrame(edges, "src long, dst long"))


# ---------------------------------------------------------- bowtie --------


def test_bowtie_all_six_regions(spark):
    from webgraph.algos.bowtie import bowtie

    # CORE {0,1}; IN {2, 10}; OUT {3, 11}; TUBE {4} (2->4->3 bypasses the
    # core); TENDRIL {5 (off IN), 6 (into OUT), 7 (tendril-of-tendril)};
    # DISCONNECTED {8, 9}.
    g = _graph(
        spark,
        [
            (0, 1), (1, 0),          # core SCC
            (2, 0), (10, 2),         # IN chain
            (1, 3), (3, 11),         # OUT chain
            (2, 4), (4, 3),          # tube
            (2, 5),                  # tendril hanging off IN
            (6, 3),                  # tendril pointing into OUT
            (7, 5),                  # attached only through a tendril
            (8, 9),                  # separate weak component
        ],
    )
    got = {r["vid"]: r["region"] for r in bowtie(g).collect()}
    assert got == {
        0: "CORE", 1: "CORE",
        2: "IN", 10: "IN",
        3: "OUT", 11: "OUT",
        4: "TUBE",
        5: "TENDRIL", 6: "TENDRIL", 7: "TENDRIL",
        8: "DISCONNECTED", 9: "DISCONNECTED",
    }


def test_bowtie_all_core(spark):
    from webgraph.algos.bowtie import bowtie

    # 3-cycle: everything is the core, no other region.
    g = _graph(spark, [(0, 1), (1, 2), (2, 0)])
    got = {r["vid"]: r["region"] for r in bowtie(g).collect()}
    assert got == {0: "CORE", 1: "CORE", 2: "CORE"}


def test_reachable_from_is_frontier_bounded(spark):
    from webgraph.algos.bowtie import reachable_from

    # path 0->1->2->3: full reach from 0, and max_depth raises rather
    # than silently truncating (no-silent-caps rule).
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "vid long")
    got = {r["vid"] for r in reachable_from(seeds, edges).collect()}
    assert got == {0, 1, 2, 3}
    import pytest

    with pytest.raises(RuntimeError):
        reachable_from(seeds, edges, max_depth=2)


# ------------------------------------------------------- knn curve --------


def test_knn_curve_star(spark):
    from webgraph.algos.stats import knn_curve

    # star: hub 0 with 3 leaves. knn(3) = 1.0 (hub sees leaves),
    # knn(1) = 3.0 (leaves see the hub).
    g = _graph(spark, [(0, 1), (0, 2), (0, 3)])
    rows = {r["k"]: r for r in knn_curve(g).collect()}
    assert rows[3]["n_vertices"] == 1 and rows[3]["knn_e6"] == 1_000_000
    assert rows[1]["n_vertices"] == 3 and rows[1]["knn_e6"] == 3_000_000


def test_knn_curve_direction_free(spark):
    from webgraph.algos.stats import knn_curve

    # reversing every edge changes nothing: the curve is undirected.
    fwd = knn_curve(_graph(spark, [(0, 1), (1, 2)])).collect()
    rev = knn_curve(_graph(spark, [(1, 0), (2, 1)])).collect()
    as_map = lambda rows: {r["k"]: (r["n_vertices"], r["knn_e6"]) for r in rows}  # noqa: E731
    assert as_map(fwd) == as_map(rev)


# ---------------------------------------------------- import graph --------


def test_import_graph_dedup_and_anchoring(spark):
    from webgraph.code import import_graph

    df = spark.createDataFrame(
        [
            # repeated import dedups within the file; mid-line and
            # malformed mentions never match the line-anchored regex.
            (1, "a", "import b\nimport b\nimport a\nx import c\nimportd\n"),
            (2, "a", "import b"),
            (3, "b", "import a\n"),
            (4, "c", "no imports here"),
        ],
        "doc_id long, module string, content string",
    )
    got = {
        (r["src_module"], r["dst_module"]): r["n_files"]
        for r in import_graph(df).collect()
    }
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_import_graph_plan_is_codegen(spark):
    import io
    from contextlib import redirect_stdout

    from webgraph.code import import_graph

    df = spark.createDataFrame(
        [(1, "a", "import b")], "doc_id long, module string, content string"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        import_graph(df).explain(mode="formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ----------------------------------------- product quantization -----------


def test_pq_exact_when_codebook_holds_every_vector(spark):
    # with n_codes >= N and iters=0 every subvector is (or ties with) a
    # codebook entry at distance 0, so ADC distance == the true squared
    # L2 distance (per-subspace micro-rounded) and the ranking matches
    # brute force exactly.
    from webgraph.similarity import build_pq_index, pq_topk

    vecs = {
        1: [0.0, 0.0, 10.0, 10.0],
        2: [1.0, 0.0, 10.0, 11.0],
        3: [10.0, 10.0, 0.0, 0.0],
        4: [9.0, 10.0, 1.0, 0.0],
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    codes, books = build_pq_index(emb, m=2, n_codes=4, iters=0)
    q = vecs[1]
    got = [
        (r["vec_id"], r["adc_e6"])
        for r in pq_topk(codes.filter("vec_id <> 1"), books, q, k=3).collect()
    ]

    def d2(a, b, lo, hi):
        return sum((a[i] - b[i]) ** 2 for i in range(lo, hi))

    want = sorted(
        (int(round(1e6 * d2(q, v, 0, 2))) + int(round(1e6 * d2(q, v, 2, 4))), i)
        for i, v in vecs.items()
        if i != 1
    )
    assert got == [(i, s) for s, i in want[:3]]


def test_pq_lloyd_never_increases_distortion(spark):
    from webgraph.similarity import build_pq_index

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def distortion(iters):
        codes, books = build_pq_index(emb, m=2, n_codes=4, iters=iters)
        by_id = dict(rows)
        total = 0.0
        for r in codes.collect():
            v = by_id[r["vec_id"]]
            for j, c in enumerate(r["codes"]):
                cent = books[j][c]
                sub = v[j * 4 : (j + 1) * 4]
                total += sum((x - y) ** 2 for x, y in zip(sub, cent))
        return total

    d0, d2_ = distortion(0), distortion(2)
    assert d2_ <= d0 + 1e-9


def test_pq_dim_not_divisible_raises(spark):
    import pytest

    from webgraph.similarity import build_pq_index

    emb = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        build_pq_index(emb, m=2)


# ------------------------------------------------------------- OPIC -------


def test_opic_hand_computed_two_rounds(spark):
    from webgraph.algos.opic import opic

    # 0->1, 0->2, 1->0; vertex 2 dangles. After 2 synchronous rounds:
    # cash = (10/9, 17/18, 17/18), history = (7/3, 11/6, 11/6).
    g = _graph(spark, [(0, 1), (0, 2), (1, 0)])
    rows = {r["vid"]: r for r in opic(g, iters=2).collect()}
    assert abs(rows[0]["cash"] - 10 / 9) < 1e-12
    assert abs(rows[1]["cash"] - 17 / 18) < 1e-12
    assert abs(rows[2]["cash"] - 17 / 18) < 1e-12
    assert abs(rows[0]["history"] - 7 / 3) < 1e-12
    assert abs(rows[1]["history"] - 11 / 6) < 1e-12
    # cash is exactly conserved at N per round
    assert abs(sum(r["cash"] for r in rows.values()) - 3.0) < 1e-12


def test_opic_rejects_zero_iters(spark):
    import pytest

    from webgraph.algos.opic import opic

    with pytest.raises(ValueError):
        opic(_graph(spark, [(0, 1)]), iters=0)


# -------------------------------------------- duplicate n-gram frac -------


def test_dup_ngram_fraction_cross_doc_only(spark):
    from webgraph.text import dup_ngram_fraction

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # trigrams: "a b c"(dup), "b c d"
            (2, "a b c x"),        # trigrams: "a b c"(dup), "b c x"
            (3, "zz yy"),          # too short: (0, 0, 0)
            (4, "q w e q w e"),    # "q w e" repeats WITHIN the doc only:
                                   # document frequency 1 -> not a dup
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["dup_ngrams"], r["dup_frac_e6"])
        for r in dup_ngram_fraction(docs).collect()
    }
    assert got == {
        1: (2, 1, 500_000),
        2: (2, 1, 500_000),
        3: (0, 0, 0),
        4: (4, 0, 0),
    }


# --------------------------------------------------------- coreness -------


def test_coreness_matches_kcore_membership(spark):
    from webgraph.algos.kcore import coreness, k_core

    # triangle {0,1,2} + path 2-3-4 + isolated-by-absence: coreness is
    # 2 on the triangle, 1 on the path tail.
    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)])
    state, run, converged = coreness(g)
    got = {r["vid"]: r["c"] for r in state.collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1}
    assert converged and run <= 5
    # cross-check against the peel: coreness(v) >= k iff v in the k-core
    for k in (1, 2, 3):
        members, _ = k_core(g, k)
        in_core = {r["vid"] for r in members.collect()}
        assert in_core == {v for v, c in got.items() if c >= k}


def test_coreness_truncation_is_monotone(spark):
    from webgraph.algos.kcore import coreness

    # a long path needs several rounds; a 1-round truncation must sit
    # ABOVE the true coreness (monotone non-increasing iteration).
    edges = [(i, i + 1) for i in range(8)]
    g = _graph(spark, edges)
    one, _, _ = coreness(g, rounds=1, early_stop=False)
    full, _, conv = coreness(g)
    one_m = {r["vid"]: r["c"] for r in one.collect()}
    full_m = {r["vid"]: r["c"] for r in full.collect()}
    assert conv and all(full_m[v] == 1 for v in full_m)
    assert all(one_m[v] >= full_m[v] for v in one_m)


def test_coreness_rejects_zero_rounds(spark):
    import pytest

    from webgraph.algos.kcore import coreness

    with pytest.raises(ValueError):
        coreness(_graph(spark, [(0, 1)]), rounds=0)


# ---------------------------------------------------- trending top-k ------


def test_trending_topk_ranks_within_window(spark):
    from webgraph.streaming import trending_topk

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 10)
    t1 = dt.datetime(2026, 1, 1, 11)
    counts = spark.createDataFrame(
        [
            (t0, "click", 10), (t0, "view", 10), (t0, "buy", 3),
            (t1, "buy", 7), (t1, "view", 2),
        ],
        "window_start timestamp, event_type string, n long",
    )
    got = {
        (r["window_start"], r["event_type"]): r["trend_rank"]
        for r in trending_topk(counts, k=2).collect()
    }
    # tie at n=10 breaks alphabetically: click before view
    assert got == {
        (t0, "click"): 1, (t0, "view"): 2,
        (t1, "buy"): 1, (t1, "view"): 2,
    }


def test_trending_topk_rejects_zero_k(spark):
    import pytest

    from webgraph.streaming import trending_topk

    counts = spark.createDataFrame(
        [], "window_start timestamp, event_type string, n long"
    )
    with pytest.raises(ValueError):
        trending_topk(counts, k=0)


# ------------------------------------------------------- robots -----------


def test_robots_longest_match_and_allow_tie(spark):
    from webgraph.filters import robots_filter

    pages = spark.createDataFrame(
        [
            (1, "a.com", "/private/x"),   # deny-all, no carve-out
            (2, "a.com", "/public/doc"),  # longer allow beats deny-all
            (3, "a.com", "/tie/z"),       # equal-length allow+deny: allow
            (4, "b.com", "/anything"),    # no rule for host -> allowed
        ],
        "doc_id long, host string, path string",
    )
    rules = spark.createDataFrame(
        [
            ("a.com", "/", False),
            ("a.com", "/public", True),
            ("a.com", "/tie/", True),
            ("a.com", "/tie/", False),
        ],
        "host string, prefix string, allow boolean",
    )
    got = {
        r["doc_id"]: r["allowed"] for r in robots_filter(pages, rules).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: True}


# --------------------------------------------------------- plan pins ------


def _plan_of(df):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_round5_plans_stay_jvm_side_and_broadcast(spark):
    from webgraph.filters import robots_filter
    from webgraph.similarity import build_pq_index
    from webgraph.text import dup_ngram_fraction

    # PQ encode: the (j, code, cvec) table must arrive broadcast — the
    # corpus side never re-partitions for the centroid join.
    emb = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0, 2.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    codes, _ = build_pq_index(emb, m=2, n_codes=2, iters=0)
    pq_plan = _plan_of(codes)
    assert "BroadcastHashJoin" in pq_plan
    assert "BatchEvalPython" not in pq_plan and "CartesianProduct" not in pq_plan

    # robots: broadcast rules, no cartesian (host equi-key extracted).
    pages = spark.createDataFrame(
        [(1, "a", "/x")], "doc_id long, host string, path string"
    )
    rules = spark.createDataFrame(
        [("a", "/", True)], "host string, prefix string, allow boolean"
    )
    robots_plan = _plan_of(robots_filter(pages, rules))
    assert "BroadcastHashJoin" in robots_plan
    assert "CartesianProduct" not in robots_plan

    # dup-ngram: pure codegen + hash aggregates, no Python, no cartesian.
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    dg_plan = _plan_of(dup_ngram_fraction(docs))
    assert "BatchEvalPython" not in dg_plan and "CartesianProduct" not in dg_plan


# --------------------------------------------------- temporal reach -------


def test_temporal_reach_respects_time_ordering(spark):
    from webgraph.algos.temporal import temporal_earliest_arrival

    # 0 -(t=5)-> 1 -(t=3)-> 2: the 1->2 edge fires BEFORE anything can
    # arrive at 1, so 2 is unreachable despite static connectivity.
    # 0 -(t=2)-> 3 -(t=2)-> 4: equal times are allowed (non-decreasing).
    te = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 3), (0, 3, 2), (3, 4, 2)],
        "src long, dst long, t long",
    )
    seeds = spark.createDataFrame([(0,)], "vid long")
    got = {
        r["vid"]: r["arrival"]
        for r in temporal_earliest_arrival(te, seeds).collect()
    }
    assert got == {0: 0, 1: 5, 3: 2, 4: 2}


def test_temporal_reach_takes_earliest_of_many_paths(spark):
    from webgraph.algos.temporal import temporal_earliest_arrival

    # two routes to 2: direct at t=9, two-hop arriving at t=4.
    te = spark.createDataFrame(
        [(0, 2, 9), (0, 1, 1), (1, 2, 4)], "src long, dst long, t long"
    )
    seeds = spark.createDataFrame([(0,)], "vid long")
    got = {
        r["vid"]: r["arrival"]
        for r in temporal_earliest_arrival(te, seeds).collect()
    }
    assert got[2] == 4


def test_temporal_reach_raises_instead_of_partial(spark):
    import pytest

    from webgraph.algos.temporal import temporal_earliest_arrival

    te = spark.createDataFrame(
        [(i, i + 1, i + 1) for i in range(6)], "src long, dst long, t long"
    )
    seeds = spark.createDataFrame([(0,)], "vid long")
    with pytest.raises(RuntimeError):
        temporal_earliest_arrival(te, seeds, max_iter=2)


# ------------------------------------------------------ triad census ------


def test_triad_census_isomorphism_invariance(spark):
    from webgraph.algos.motifs import triad_census

    def census(edges):
        return {
            r["motif"]: r["n_triads"]
            for r in triad_census(_graph(spark, edges)).collect()
        }

    transitive = census([(0, 1), (0, 2), (1, 2)])
    # relabeled + reoriented transitive triangle: same canonical code
    transitive2 = census([(9, 4), (9, 7), (7, 4)])
    cyclic = census([(0, 1), (1, 2), (2, 0)])
    full = census([(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)])

    assert len(transitive) == len(cyclic) == len(full) == 1
    assert transitive == transitive2
    assert set(transitive) != set(cyclic)
    assert list(full) == ["111111"]
    assert sum(transitive.values()) == 1 and sum(cyclic.values()) == 1


def test_triad_census_counts_each_triangle_once(spark):
    from webgraph.algos.motifs import triad_census

    # two triangles sharing an edge; reciprocal pair collapses to flags
    got = triad_census(
        _graph(spark, [(0, 1), (1, 0), (1, 2), (2, 0), (1, 3), (3, 0)])
    ).collect()
    assert sum(r["n_triads"] for r in got) == 2


# -------------------------------------------------- warm-start CC ---------


def test_cc_warm_start_equals_cold_and_saves_rounds(spark):
    from webgraph.algos import connected_components

    # long path: cold min-label needs ~n rounds; warm-starting from the
    # true labels of a subgraph covering most of the path converges
    # faster and lands on the identical fixpoint.
    full = _graph(spark, [(i, i + 1) for i in range(12)])
    sub = _graph(spark, [(i, i + 1) for i in range(10)])
    prior, _ = connected_components(sub, collect_skew=False)
    cold, cold_m = connected_components(full, collect_skew=False)
    warm, warm_m = connected_components(
        full, collect_skew=False, initial_labels=prior
    )
    as_map = lambda df: {r["vid"]: r["component"] for r in df.collect()}  # noqa: E731
    assert as_map(warm) == as_map(cold)
    assert len(warm_m) < len(cold_m)


def test_cc_warm_start_ignores_unknown_vertices(spark):
    from webgraph.algos import connected_components

    g = _graph(spark, [(5, 6)])
    prior = spark.createDataFrame([(99, 99)], "vid long, component long")
    labels, _ = connected_components(g, collect_skew=False, initial_labels=prior)
    assert {r["vid"]: r["component"] for r in labels.collect()} == {5: 5, 6: 5}
