"""Round-5m: single-source SimRank (Fogaras-Racz coupled fingerprint
walks). House style: tiny fixtures where every walk has exactly one
candidate per step, so meeting times — and therefore the integer decay
sums — are exact by hand; plus partitioning-independence and the
max_steps guard. The hash-argmin branch path is pinned by the g_simrank
contract row (exact DuckDB replay of the seeded walks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webgraph.algos.common import from_int_edges
from webgraph.algos.simrank import DECAY_MICRO, simrank_single_source


def _graph(spark, edges):
    return from_int_edges(spark.createDataFrame(edges, "src long, dst long"))


def _rows(df):
    return sorted(
        (r["vid"], r["sim_micro"], r["meets"]) for r in df.collect()
    )


def test_simrank_star_meets_at_tau1(spark):
    # 1, 2, 3 share the single in-neighbor 0: every sample's walk steps
    # 1->0 and 2->0 deterministically, so 2 and 3 meet the query (1) at
    # tau=1 in ALL samples; 0's walk dangles immediately and never meets.
    g = _graph(spark, [(0, 1), (0, 2), (0, 3)])
    out = simrank_single_source(g, 1, n_samples=6, max_steps=3)
    assert _rows(out) == [
        (1, 6 * DECAY_MICRO[0], 6),
        (2, 6 * DECAY_MICRO[1], 6),
        (3, 6 * DECAY_MICRO[1], 6),
    ]


def test_simrank_first_meeting_at_tau2(spark):
    # q=2 walks 2->1->0; v=4 walks 4->3->0 (single candidate each step):
    # first meeting at tau=2 in every sample. v=3 reaches 0 at tau=1 but
    # its walk dies before q arrives at step 2 — coupled walks only meet
    # at the SAME step, so 3 never scores (position, not trajectory).
    g = _graph(spark, [(0, 1), (1, 2), (0, 3), (3, 4)])
    out = simrank_single_source(g, 2, n_samples=6, max_steps=4)
    assert _rows(out) == [
        (2, 6 * DECAY_MICRO[0], 6),
        (4, 6 * DECAY_MICRO[2], 6),
    ]


def test_simrank_disjoint_components_never_meet(spark):
    g = _graph(spark, [(0, 1), (2, 3)])
    out = simrank_single_source(g, 1, n_samples=4, max_steps=3)
    assert _rows(out) == [(1, 4 * DECAY_MICRO[0], 4)]


def test_simrank_partitioning_independent(spark):
    edges = [(i, (i * 7 + 3) % 23) for i in range(23)]
    base = spark.createDataFrame(edges, "src long, dst long")
    a = simrank_single_source(from_int_edges(base), 3)
    b = simrank_single_source(from_int_edges(base.repartition(7)), 3)
    assert _rows(a) == _rows(b)


def test_simrank_max_steps_guard(spark):
    g = _graph(spark, [(0, 1)])
    with pytest.raises(ValueError):
        simrank_single_source(g, 1, max_steps=len(DECAY_MICRO))


def _cliques4(spark, edges, **kw):
    from webgraph.algos.triangles import four_clique_count_per_vertex

    out = four_clique_count_per_vertex(_graph(spark, edges), **kw)
    return {r["vid"]: r["cliques4"] for r in out.collect()}


def test_four_cliques_k4_and_pendant(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _cliques4(spark, k4 + [(0, 4)]) == {0: 1, 1: 1, 2: 1, 3: 1, 4: 0}


def test_four_cliques_k5_each_vertex_in_four(spark):
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    assert _cliques4(spark, k5) == {v: 4 for v in range(5)}


def test_four_cliques_diamond_has_none(spark):
    # K4 minus one edge: triangles exist, no 4-clique
    assert _cliques4(spark, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]) == {
        v: 0 for v in range(4)
    }


def test_four_cliques_orientation_independent(spark):
    edges = [(i, (i * 5 + 2) % 17) for i in range(17)] + [
        (i, (i * 3 + 1) % 17) for i in range(17)
    ]
    a = _cliques4(spark, edges, degree_ordered=True)
    b = _cliques4(spark, edges, degree_ordered=False)
    assert a == b


def test_normalize_text_hand_cases(spark):
    from webgraph.text import normalize_text

    cases = [
        (0, "café"),                     # NFC composes to é
        (1, "a b​c"),                # NBSP -> space, ZW dropped
        (2, "x\x07y\x00z"),                    # control chars stripped
        (3, "l1   \nl2\n\n\n\n\nl3"),          # trailing ws + blank collapse
        (4, "  plain  "),                      # trim only
        (5, None),                             # null passes through
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    out = {
        r["doc_id"]: r["norm_text"]
        for r in normalize_text(df).collect()
    }
    assert out[0] == "café"
    assert out[1] == "a bc"
    assert out[2] == "xyz"
    assert out[3] == "l1\nl2\n\nl3"
    assert out[4] == "plain"
    assert out[5] is None


def test_normalize_text_idempotent(spark):
    from webgraph.text import normalize_text

    df = spark.createDataFrame(
        [(0, "café x y\n\n\n\nz\x07")], "doc_id long, text string"
    )
    once = normalize_text(df).select(
        "doc_id", F.col("norm_text").alias("text")
    )
    twice = normalize_text(once).collect()[0]["norm_text"]
    assert twice == normalize_text(df).collect()[0]["norm_text"]


def test_clone_type3_near_miss_pair(spark):
    from webgraph.code import clone_type3_pairs
    from webgraph.dedup import token_hash

    # v1 = v0 with one inserted call statement: a type-3 pair. v2 is
    # structurally unrelated. Type-2 copies of v0 (renamed) collapse to
    # ONE unit first, so no rename pair is reported.
    v0 = "x = 1\ny = x + 2\nz = y * 3\nreturn z"
    v0r = "q = 7\nw = q + 9\ne = w * 4\nreturn e"  # rename of v0
    v1 = "a = 9\nb = a + 77\nc = b * 5\nlog(c)\nreturn c"
    v2 = "if alpha:\n    beta = alpha - 1\nelse:\n    beta = 0"
    df = spark.createDataFrame(
        [(v0,), (v0r,), (v1,), (v2,)], "content string"
    )
    rows = clone_type3_pairs(df, threshold_e6=300_000).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["a"] < r["b"]
    assert 300_000 <= r["jaccard_e6"] < 1_000_000
    # exact Jaccard: common / (na + nb - common), integer micro-units
    assert r["jaccard_e6"] == (1_000_000 * r["common"]) // (
        r["na"] + r["nb"] - r["common"]
    )


def test_clone_type3_min_shingles_drops_repetition_soup(spark):
    from webgraph.code import clone_type3_pairs

    # two all-ID units of different lengths share the single shingle
    # "ID ID ID ID" -> jaccard 1.0, but both have < min_shingles distinct
    # shingles and are dropped as boilerplate
    df = spark.createDataFrame(
        [("aa bb cc dd ee ff gg hh",), ("k1 k2 k3 k4 k5 k6 k7 k8 k9",)],
        "content string",
    )
    assert clone_type3_pairs(df).count() == 0


def test_clone_type3_guard(spark):
    from webgraph.code import clone_type3_pairs

    df = spark.createDataFrame([("x",)], "content string")
    with pytest.raises(ValueError):
        clone_type3_pairs(df, min_tokens=2, n=4)


def test_anf_error_certification_exact_on_saturated_registers(spark):
    """On K3 (every 2-ball = the whole graph), the per-vertex estimate
    is identical for all vertices — registers saturate to the same
    state — so err_e4 must agree across vertices and match the hand
    formula |est - ball| * 1e4 / ball rounded to integer basis points."""
    from webgraph.algos.anf import (
        hyperball_estimate,
        hyperball_registers,
        neighborhood_sizes_exact,
    )

    g = _graph(
        spark, [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)]
    )
    regs = hyperball_registers(g, radius=2, m=16, seed=42)
    est = hyperball_estimate(regs, m=16)
    exact = neighborhood_sizes_exact(g, radius=2)
    rows = (
        exact.join(est, "vid")
        .select(
            "vid",
            "ball",
            F.round(
                F.abs(F.col("ball_est") - F.col("ball")) * 10000 / F.col("ball")
            )
            .cast("long")
            .alias("err_e4"),
        )
        .collect()
    )
    assert len(rows) == 3
    assert all(r["ball"] == 3 for r in rows)
    errs = {r["err_e4"] for r in rows}
    assert len(errs) == 1  # saturated registers -> identical estimate
    est_val = {r["vid"]: r["ball_est"] for r in est.collect()}[0]
    want = round(abs(est_val - 3) * 10000 / 3)
    assert errs == {want}
