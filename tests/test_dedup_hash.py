"""Portable-hash Unicode parity: the whole sketch family (simhash,
containment fingerprints, token-budget order keys) rests on token_hash
computing the SAME integer in Spark and DuckDB. ADVICE round 2 flagged
F.ascii as possibly byte-based; empirically Spark 4.1.2's ascii/substr/
length are all code-POINT based (verified including non-BMP surrogate
pairs), matching DuckDB ord() and Python ord(). These tests pin that."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from webgraph.dedup import POLY_MOD, token_hash


def _py_fold(t: str) -> int:
    h = 0
    for ch in t:
        h = (h * 31 + ord(ch)) % POLY_MOD
    return h


def _spark_hashes(spark, toks):
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    return [
        r["h"] for r in df.select(token_hash(F.col("t")).alias("h")).collect()
    ]


@pytest.mark.slow
def test_token_hash_matches_ord_fold_on_unicode_properties(spark):
    from hypothesis import given, settings, strategies as st

    # full Unicode minus surrogates (not encodable), incl. non-BMP planes
    text_st = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=24
    )

    @settings(max_examples=15, deadline=None)
    @given(st.lists(text_st, min_size=1, max_size=40))
    def check(toks):
        assert _spark_hashes(spark, toks) == [_py_fold(t) for t in toks]

    check()


def test_token_hash_matches_duckdb_ord_fold(spark):
    """Cross-engine pin: the literal recursive ord() fold a DuckDB oracle
    would run produces the same integers (BMP + astral + empty)."""
    toks = ["", "hello", "café", "中文词", "a𝄞b", "€uro", "🙂🙂", "mixé𝕊"]
    got = dict(zip(toks, _spark_hashes(spark, toks)))
    con = duckdb.connect()
    for t in toks:
        want = con.sql(
            f"""
            WITH RECURSIVE f(i, h) AS (
              SELECT 0, CAST(0 AS BIGINT)
              UNION ALL
              SELECT i+1, (h*31 + ord(substr('{t}', i+1, 1))) % {POLY_MOD}
              FROM f WHERE i < length('{t}')
            ) SELECT h FROM f ORDER BY i DESC LIMIT 1"""
        ).fetchone()[0]
        assert got[t] == want, t
