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
