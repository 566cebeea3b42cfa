"""Round-5s: filtered vector search (pre-filter exact + IVF post-filter
with oversampling) and radius search. House style: the filtered-ANN
starvation bug pinned as a test, post-filter/pre-filter agreement at
full probe, hand-computable radii; the shuffled determinism is the
contract rows' job (e_filtered_topk / e_range_search, exact DuckDB
replay)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _q(spark, qid, vec):
    return spark.createDataFrame(
        [(qid, [float(x) for x in vec])], "q_id long, q_vec array<double>"
    )


def test_filtered_topk_ranks_within_filter_not_globally(spark):
    """The starvation bug: global top-2 then filter would return ONE
    label-1 row; pre-filter top-2 returns the two best label-1 rows."""
    from webgraph.similarity import filtered_topk

    emb = _emb(
        spark,
        [
            (1, [1.0, 0.0], 0),       # cos 1.0 but wrong label
            (2, [0.9, 0.1], 0),
            (3, [0.5, 0.5], 1),
            (4, [0.1, 0.9], 1),
            (5, [-1.0, 0.0], 1),
        ],
    )
    out = filtered_topk(emb, _q(spark, 0, [1.0, 0.0]), F.col("label") == 1, k=2)
    got = [(r["vec_id"], r["rank"]) for r in out.orderBy("rank").collect()]
    assert got == [(3, 1), (4, 2)]


def test_ivf_filtered_topk_agrees_with_exact_at_full_probe(spark):
    from webgraph.similarity import (
        build_ivf_index,
        filtered_topk,
        ivf_filtered_topk,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(4)], i % 3)
        for i in range(30)
    ]
    emb = _emb(spark, rows)
    qvec = [1.0, 2.0, -1.0, 0.5]
    indexed, cents = build_ivf_index(emb, n_centroids=4, iters=2)
    approx = ivf_filtered_topk(
        indexed, cents, qvec, F.col("label") == 1,
        k=5, nprobe=len(cents), oversample=30, meta=emb,
    )
    exact = filtered_topk(emb, _q(spark, 99, qvec), F.col("label") == 1, k=5)
    got = [(r["vec_id"], round(r["cos"], 9)) for r in approx.collect()]
    want = [
        (r["vec_id"], round(r["cos"], 9))
        for r in exact.orderBy("rank").collect()
    ]
    assert got == want  # full probe + full oversample == exact pre-filter


def test_ivf_filtered_topk_respects_predicate(spark):
    from webgraph.similarity import build_ivf_index, ivf_filtered_topk

    rows = [(i, [float(i), 1.0], i % 2) for i in range(12)]
    emb = _emb(spark, rows)
    indexed, cents = build_ivf_index(emb, n_centroids=2, iters=2)
    out = ivf_filtered_topk(
        indexed, cents, [1.0, 0.0], F.col("label") == 0,
        k=3, nprobe=2, oversample=4, meta=emb,
    )
    assert all(r["vec_id"] % 2 == 0 for r in out.collect())


def test_range_search_hand_computed(spark):
    """Unit vectors at known angles: threshold 0.6 keeps cos 1.0 and
    ~0.707, drops 0.0 and -1.0."""
    from webgraph.similarity import range_search

    emb = _emb(
        spark,
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 1.0], 0),   # cos ~0.7071
            (3, [0.0, 1.0], 0),   # cos 0
            (4, [-1.0, 0.0], 0),  # cos -1
        ],
    )
    out = range_search(emb, _q(spark, 0, [1.0, 0.0]), threshold=0.6)
    got = sorted((r["vec_id"], round(r["cos"], 4)) for r in out.collect())
    assert got == [(1, 1.0), (2, 0.7071)]


def test_range_search_returns_whole_dense_neighborhood(spark):
    """Six near-identical vectors: top-k with k=3 would truncate; range
    search returns all six."""
    from webgraph.similarity import range_search

    emb = _emb(
        spark,
        [(i, [1.0, 0.001 * i], 0) for i in range(6)] + [(9, [0.0, 1.0], 0)],
    )
    out = range_search(emb, _q(spark, 0, [1.0, 0.0]), threshold=0.99)
    assert out.count() == 6


# ------------------------------------------------------ MAD outliers --


def test_mad_outliers_hand_computed(spark):
    """Values 1..9 plus 100: med = 5.5, devs = .5..4.5 and 94.5, MAD =
    median(devs)... hand: devs sorted = [0.5,0.5,1.5,1.5,2.5,2.5,3.5,
    3.5,4.5,94.5] -> MAD = 2.5; fence 3*2.5 = 7.5 flags only 100."""
    from webgraph.sketches import mad_outliers

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])],
        "id long, x double",
    )
    out = mad_outliers(df, "x", k=3.0, scale=1)
    assert [(r["id"], r["_u"]) for r in out.collect()] == [(9, 100)]


def test_mad_outliers_uniform_data_flags_nothing(spark):
    from webgraph.sketches import mad_outliers

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, x double"
    )
    assert mad_outliers(df, "x", k=3.0, scale=1).count() == 0


def test_mad_outliers_zero_mad_caveat(spark):
    """>50% identical values -> MAD 0 -> every other value is flagged
    (the documented caveat)."""
    from webgraph.sketches import mad_outliers

    df = spark.createDataFrame(
        [(i, 5.0) for i in range(6)] + [(10, 7.0), (11, 4.0)],
        "id long, x double",
    )
    out = mad_outliers(df, "x", k=3.0, scale=1)
    assert sorted(r["id"] for r in out.collect()) == [10, 11]
