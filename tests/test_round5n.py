"""Round-5n: per-source KL domain shift. House style: corpora tiny
enough that every addend is hand-computable with math.log, plus the
single-source zero-divergence invariant and the min_count
renormalization semantics. The shuffled-sum determinism is the
contract row's job (t_kl_shift, exact DuckDB replay)."""

from __future__ import annotations

import math

import pytest

from webgraph.text import kl_shift


def _rows(df):
    return {
        r["source"]: (r["n_tokens"], r["vocab"], r["kl_e6"])
        for r in df.collect()
    }


def _term(c_s, n_s, c, n):
    return round((c_s / n_s) * math.log((c_s * n) / (n_s * c)) * 1e6)


def test_kl_shift_hand_computed_two_sources(spark):
    df = spark.createDataFrame(
        [("s1", "a a b"), ("s2", "a b b b")], "source string, text string"
    )
    got = _rows(kl_shift(df))
    n = 7.0  # corpus tokens; a: 3, b: 4
    want_s1 = _term(2, 3, 3, n) + _term(1, 3, 4, n)
    want_s2 = _term(1, 4, 3, n) + _term(3, 4, 4, n)
    assert got == {"s1": (3, 2, want_s1), "s2": (4, 2, want_s2)}


def test_kl_shift_single_source_is_zero(spark):
    df = spark.createDataFrame(
        [("only", "x y z x")], "source string, text string"
    )
    got = _rows(kl_shift(df))
    assert got == {"only": (4, 3, 0)}  # P == Q -> every ln(1) addend is 0


def test_kl_shift_min_count_renormalizes(spark):
    # "z" appears once corpus-wide: dropped by min_count=2 from BOTH
    # distributions, and s1's total re-derives to 3 (not 4)
    df = spark.createDataFrame(
        [("s1", "a a b z"), ("s2", "a b b b")], "source string, text string"
    )
    got = _rows(kl_shift(df, min_count=2))
    n = 7.0
    want_s1 = _term(2, 3, 3, n) + _term(1, 3, 4, n)
    assert got["s1"] == (3, 2, want_s1)


def test_kl_shift_guard():
    with pytest.raises(ValueError):
        kl_shift(None, min_count=0)


def _hit(spark, edges, targets, **kw):
    from webgraph.algos.common import from_int_edges
    from webgraph.algos.hitting import truncated_hitting_time

    g = from_int_edges(spark.createDataFrame(edges, "src long, dst long"))
    t = spark.createDataFrame([(v,) for v in targets], "vid long")
    state, metrics = truncated_hitting_time(g, t, **kw)
    return {r["vid"]: r["h_e6"] for r in state.collect()}, metrics


def test_hitting_time_path_and_dangling(spark):
    # 2 -> 0 -> 1(target), 1 -> 3 (dangling): h = steps to the target,
    # dangling non-target pegs at the cap
    got, _ = _hit(spark, [(0, 1), (2, 0), (1, 3)], [1], horizon=5)
    assert got == {1: 0, 0: 1_000_000, 2: 2_000_000, 3: 5_000_000}


def test_hitting_time_integer_average(spark):
    # 0 has two out-neighbors: the target (h=0) and a 1-step vertex
    # (h=1e6) -> h(0) = 1e6 + (0 + 1e6) // 2 = 1_500_000 exactly
    got, _ = _hit(spark, [(0, 9), (0, 1), (1, 9)], [9], horizon=5)
    assert got == {9: 0, 1: 1_000_000, 0: 1_500_000}


def test_hitting_time_early_stop_is_bit_identical(spark):
    edges = [(0, 1), (2, 0), (1, 3)]
    fast, m_fast = _hit(spark, edges, [1], horizon=8)
    full, m_full = _hit(spark, edges, [1], horizon=8, early_stop=False)
    assert fast == full
    assert len(m_fast) < len(m_full) == 8
    assert m_fast[-1]["changed"] == 0


def test_hitting_time_unreachable_component_at_cap(spark):
    got, _ = _hit(spark, [(0, 1), (5, 6), (6, 5)], [1], horizon=3)
    assert got[5] == got[6] == 3_000_000


def test_hitting_time_guards(spark):
    from webgraph.algos.common import from_int_edges
    from webgraph.algos.hitting import truncated_hitting_time

    g = from_int_edges(spark.createDataFrame([(0, 1)], "src long, dst long"))
    t = spark.createDataFrame([(1,)], "vid long")
    with pytest.raises(ValueError):
        truncated_hitting_time(g, t, horizon=0)
    with pytest.raises(ValueError):
        truncated_hitting_time(g, t, horizon=2, rounds=0)


def test_hitting_time_checkpoint_resume_bit_identical(spark, tmp_path):
    from webgraph.algos.common import from_int_edges
    from webgraph.algos.hitting import truncated_hitting_time
    from webgraph.checkpoint import CheckpointManager

    edges = [(0, 1), (2, 0), (1, 3), (3, 2), (4, 0), (4, 3)]
    g = from_int_edges(spark.createDataFrame(edges, "src long, dst long"))
    t = spark.createDataFrame([(1,)], "vid long")
    full, _ = truncated_hitting_time(g, t, horizon=5, early_stop=False)
    want = {r["vid"]: r["h_e6"] for r in full.collect()}

    d = str(tmp_path / "ck")
    truncated_hitting_time(
        g, t, horizon=5, rounds=2, checkpoint_dir=d, early_stop=False
    )  # "crash" after round 2
    resumed, metrics = truncated_hitting_time(
        g, t, horizon=5, checkpoint_dir=d, resume=True, early_stop=False
    )
    got = {r["vid"]: r["h_e6"] for r in resumed.collect()}
    assert got == want  # bit-identical
    assert metrics[0]["iteration"] == 2
    entries = CheckpointManager(d, "hitting").entries()
    assert [e["iteration"] for e in entries] == list(range(5))


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_pq_recall_perfect_codebook_is_exact(spark):
    """With n_codes >= corpus size every subvector is its own codebook
    entry, so ADC == 1e6 * true d2 and the exact side is 1e12 * true d2
    — order-isomorphic scores with identical tie-breaks, so every query
    recalls the full top-k."""
    from webgraph.similarity import pq_recall

    import itertools

    vecs = [list(p) for p in itertools.product([0, 1, 2], repeat=4)][:20]
    got = pq_recall(
        _emb(spark, vecs), n_queries=4, k=5, m=2, n_codes=20
    ).collect()
    assert len(got) == 4
    assert all(r["n_hits"] == 5 and r["recall_e6"] == 1_000_000 for r in got)


def test_pq_recall_partitioning_independent(spark):
    from webgraph.similarity import pq_recall

    vecs = [
        [((7 * i + 3 * j) % 11) / 3.0 for j in range(8)] for i in range(30)
    ]
    df = _emb(spark, vecs)
    a = sorted(map(tuple, pq_recall(df, n_queries=4, k=5, m=2, n_codes=8).collect()))
    b = sorted(
        map(
            tuple,
            pq_recall(
                df.repartition(7), n_queries=4, k=5, m=2, n_codes=8
            ).collect(),
        )
    )
    assert a == b
    assert all(0 <= r[1] <= 5 for r in a)
