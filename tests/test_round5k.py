"""Round-5k operators: skew-salted join, CDC merge-on-read, streaming
record detection, configuration-model null graph, readability, API
surface."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from webgraph.joins import SALT_COL, salted_join


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def skew_tables(spark):
    probe = spark.createDataFrame(
        [(k, v) for v, k in enumerate([0, 0, 0, 0, 0, 1, 2, 2, 9])],
        "k long, v long",
    )
    build = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, name string"
    )
    return probe, build


def test_salted_inner_equals_plain(spark, skew_tables):
    probe, build = skew_tables
    got = _rows(salted_join(probe, build, "k", n_salts=5), "k", "v", "name")
    want = _rows(probe.join(build, "k"), "k", "v", "name")
    assert got == want and len(got) == 8


def test_salted_left_and_anti(spark, skew_tables):
    probe, build = skew_tables
    left = salted_join(probe, build, "k", n_salts=3, how="left")
    assert _rows(left, "k", "v", "name") == _rows(
        probe.join(build, "k", "left"), "k", "v", "name"
    )
    anti = salted_join(probe, build, "k", n_salts=3, how="left_anti")
    assert _rows(anti, "k", "v") == [(9, 8)]


def test_salted_join_guards(spark, skew_tables):
    probe, build = skew_tables
    with pytest.raises(ValueError, match="probe-preserving"):
        salted_join(probe, build, "k", how="full")
    with pytest.raises(ValueError, match="reserved"):
        salted_join(probe.withColumn(SALT_COL, F.lit(0)), build, "k")


def test_salted_join_plan_joins_on_salt(spark, skew_tables):
    """The physical join keys must include the salt — that IS the skew
    spread; without it the helper silently degenerates to a plain join."""
    probe, build = skew_tables
    df = salted_join(probe, build, "k", n_salts=4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="extended")
    plan = buf.getvalue()
    assert SALT_COL in plan and "xxhash64" in plan
    # n_salts replicas of the build side: explode over a 4-element array
    assert "explode" in plan
