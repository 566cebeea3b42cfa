"""Round-5b operators: rich-club / power-law statistics, maximal
independent set, Boruvka minimum spanning forest, weighted sampling,
Misra-Gries heavy hitters, embedding covariance, binned interval join,
stream-stream join. House style: tiny hand-checkable fixtures with exact
expected values, plus partitioning-independence and structural pins.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from webgraph.algos.common import from_int_edges


def _graph(spark, edges):
    return from_int_edges(spark.createDataFrame(edges, "src long, dst long"))


# ------------------------------------------------------ rich club ---------


def test_rich_club_triangle_plus_pendant(spark):
    from webgraph.algos.stats import rich_club

    # triangle 0-1-2 (degree 2 each) + pendant 3 attached to 0 (deg 3 / 1)
    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (0, 3)])
    rows = {r["k"]: r for r in rich_club(g, [0, 1, 2]).collect()}
    # k=0: all 4 nodes rich, all 4 edges rich: phi = 2*4/(4*3) = 2/3
    assert rows[0]["n_rich"] == 4 and rows[0]["e_rich"] == 4
    assert abs(rows[0]["phi"] - 2 / 3) < 1e-12
    # k=1: nodes with deg>1 = {0,1,2}; edges among them = triangle = 3
    assert rows[1]["n_rich"] == 3 and rows[1]["e_rich"] == 3
    assert abs(rows[1]["phi"] - 1.0) < 1e-12
    # k=2: only node 0 (deg 3); density undefined -> NULL
    assert rows[2]["n_rich"] == 1 and rows[2]["e_rich"] == 0
    assert rows[2]["phi"] is None


def test_rich_club_empty_threshold_rejected(spark):
    from webgraph.algos.stats import rich_club

    g = _graph(spark, [(0, 1)])
    with pytest.raises(ValueError):
        rich_club(g, [])


# ----------------------------------------------------- power law ----------


def test_powerlaw_alpha_hand_value(spark):
    from webgraph.algos.stats import powerlaw_alpha

    # in-degrees: node 9 <- {0,1,2} (3), node 8 <- {0,1} (2), node 7 <- {0}
    g = _graph(spark, [(0, 9), (1, 9), (2, 9), (0, 8), (1, 8), (0, 7)])
    row = powerlaw_alpha(g, d_min=2).collect()[0]
    assert row["n_tail"] == 2
    expected = 1 + 2 / (math.log(3 / 1.5) + math.log(2 / 1.5))
    assert abs(row["alpha"] - expected) < 1e-12


# ---------------------------------------------------------- MIS -----------


def _check_mis(g, mis_rows):
    m = {r["vid"] for r in mis_rows}
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    adj: dict = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    assert not any(s in m and d in m for s, d in edges if s != d)
    verts = {r["vid"] for r in g.vertices.collect()}
    for v in verts - m:
        assert adj.get(v, set()) & m, f"not maximal at {v}"
    return m


def test_mis_path_graph_is_greedy_by_priority(spark):
    from webgraph.algos.mis import maximal_independent_set, priority_expr

    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    mis, metrics = maximal_independent_set(g, seed=42)
    m = _check_mis(g, mis.collect())
    # equals the sequential greedy MIS in priority order
    prios = {
        r["vid"]: r["p"]
        for r in g.vertices.select(
            "vid", priority_expr("vid", 42).alias("p")
        ).collect()
    }
    taken: set = set()
    banned: set = set()
    for v in sorted(prios, key=lambda v: prios[v]):
        if v not in banned:
            taken.add(v)
            banned |= {0: {1}, 1: {0, 2}, 2: {1, 3}, 3: {2, 4}, 4: {3}}[v]
    assert m == taken


def test_mis_isolated_vertices_all_join(spark):
    from webgraph.algos.mis import maximal_independent_set

    # two components + a self-loop-ish isolated pair structure
    g = _graph(spark, [(0, 1), (2, 2)])  # self-loop at 2 drops: 2 isolated
    mis, _ = maximal_independent_set(g)
    m = _check_mis(g, mis.collect())
    assert 2 in m  # isolated vertex is in every MIS


def test_mis_partitioning_independent(spark):
    from webgraph.algos.mis import maximal_independent_set

    edges = [(i, (i * 7 + 3) % 23) for i in range(23)]
    base = spark.createDataFrame(edges, "src long, dst long")
    g1 = from_int_edges(base)
    g2 = from_int_edges(base.repartition(7))
    m1, _ = maximal_independent_set(g1)
    m2, _ = maximal_independent_set(g2)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


def test_mis_nonconvergence_raises(spark):
    from webgraph.algos.mis import maximal_independent_set
    from webgraph.dedup import _MIX_BASE, POLY_MOD

    # a path whose priorities increase along the chain needs exactly one
    # round per vertex-pair: pick three vids with monotone priorities so
    # max_iter=1 provably cannot decide the tail vertex
    def p(v):
        return ((v % POLY_MOD) * _MIX_BASE + 42) % POLY_MOD

    a, b, c = sorted(range(50), key=p)[:3]
    g = _graph(spark, [(a, b), (b, c)])
    with pytest.raises(RuntimeError):
        maximal_independent_set(g, max_iter=1)


# ---------------------------------------------------------- MSF -----------


def _kruskal(rows, verts):
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for r in sorted(rows, key=lambda r: (r[2], r[0], r[1])):
        a, b = find(r[0]), find(r[1])
        if a != b:
            parent[a] = b
            out.append(r)
    return sorted(out)


def _we(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, weight double")


def test_msf_matches_kruskal_on_seeded_graph(spark):
    from webgraph.algos.msf import minimum_spanning_forest

    triples = []
    for i in range(40):
        a, b = i % 17, (i * 5 + 2) % 17
        if a != b:
            triples.append(
                (min(a, b), max(a, b), float((i * 2654435761) % 1000003))
            )
    # dedupe to unique undirected edges, keep min weight
    uniq: dict = {}
    for s, d, w in triples:
        uniq[(s, d)] = min(uniq.get((s, d), w), w)
    rows = [(s, d, w) for (s, d), w in uniq.items()]
    forest, metrics = minimum_spanning_forest(_we(spark, rows))
    got = sorted((r["src"], r["dst"], r["weight"]) for r in forest.collect())
    verts = {v for s, d, _ in rows for v in (s, d)}
    assert got == _kruskal(rows, verts)
    assert metrics[-1]["messages"] == 0  # terminated with no live edges


def test_msf_disconnected_forest(spark):
    from webgraph.algos.msf import minimum_spanning_forest

    rows = [(0, 1, 5.0), (1, 2, 3.0), (0, 2, 4.0), (10, 11, 1.0)]
    forest, _ = minimum_spanning_forest(_we(spark, rows))
    got = sorted((r["src"], r["dst"], r["weight"]) for r in forest.collect())
    assert got == [(0, 2, 4.0), (1, 2, 3.0), (10, 11, 1.0)]


def test_msf_duplicate_weights_unique_under_tiebreak(spark):
    from webgraph.algos.msf import minimum_spanning_forest

    # all weights equal: MSF must still be the unique (weight, src, dst)
    # lexicographic Kruskal forest, regardless of partitioning
    rows = [(a, b, 1.0) for a in range(6) for b in range(a + 1, 6)]
    forest, _ = minimum_spanning_forest(_we(spark, rows))
    got = sorted((r["src"], r["dst"], r["weight"]) for r in forest.collect())
    assert got == _kruskal(rows, set(range(6)))
    forest2, _ = minimum_spanning_forest(_we(spark, rows).repartition(5))
    assert got == sorted(
        (r["src"], r["dst"], r["weight"]) for r in forest2.collect()
    )


def test_msf_empty_edges(spark):
    from webgraph.algos.msf import minimum_spanning_forest

    forest, metrics = minimum_spanning_forest(
        _we(spark, []).limit(0)
    )
    assert forest.count() == 0


# ------------------------------------------------- weighted sample --------


def test_weighted_sample_matches_manual_key_order(spark):
    from webgraph.dedup import _MIX_BASE, POLY_MOD
    from webgraph.text import weighted_sample

    rows = [(i, (i * 13) % 50 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = [
        (r["doc_id"], r["sample_rank"])
        for r in weighted_sample(df, "n_chars", 10)
        .orderBy("sample_rank")
        .collect()
    ]

    def key(doc_id, w):
        u = (((doc_id % POLY_MOD) * _MIX_BASE + 42) % POLY_MOD + 1.0) / (
            POLY_MOD + 1.0
        )
        return math.log(u) / w

    manual = sorted(rows, key=lambda r: (-key(r[0], r[1]), r[0]))[:10]
    assert got == [(d, i + 1) for i, (d, _) in enumerate(manual)]


def test_weighted_sample_zero_weight_excluded(spark):
    from webgraph.text import weighted_sample

    df = spark.createDataFrame(
        [(1, 0), (2, 5), (3, -1)], "doc_id long, n_chars long"
    )
    got = {r["doc_id"] for r in weighted_sample(df, "n_chars", 10).collect()}
    assert got == {2}


# --------------------------------------------------- heavy hitters --------


def test_heavy_hitters_exact_threshold_semantics(spark):
    from webgraph.sketches import heavy_hitters

    docs = [("a " * 30 + "b " * 10 + "c",)] * 3 + [("d e f g h i j k",)] * 2
    df = spark.createDataFrame(docs, "text string")
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(df, capacity=5).collect()}
    # token counts: a=90, b=30, c=3, d..k=2 each; n=139; keep cnt*5 > 139
    assert got == {("a", 90), ("b", 30)}


def test_heavy_hitters_partitioning_independent(spark):
    from webgraph.sketches import heavy_hitters

    # token 'a' holds 40/160 = 25% of the stream (> 1/5); the x_i/y_i
    # long tail forces the per-partition MG summaries to actually evict
    rows = [("a a b c d",)] * 20 + [(f"x{i} y{i} z{i % 3}",) for i in range(30)]
    df = spark.createDataFrame(rows, "text string")
    a = sorted(map(tuple, heavy_hitters(df, capacity=5).collect()))
    b = sorted(
        map(tuple, heavy_hitters(df.repartition(13), capacity=5).collect())
    )
    assert a == b and a  # non-empty and batch-layout independent


def test_heavy_hitters_small_capacity_still_exact(spark):
    from collections import Counter

    from webgraph.sketches import heavy_hitters

    rows = [(" ".join(f"w{(i * j) % 11}" for j in range(12)),) for i in range(30)]
    df = spark.createDataFrame(rows, "text string")
    counts = Counter(
        t for (txt,) in rows for t in txt.split() if t
    )
    n = sum(counts.values())
    expected = {(t, c) for t, c in counts.items() if c * 3 > n}
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(df, capacity=3).collect()}
    assert got == expected


# ----------------------------------------------- embedding covariance -----


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from webgraph.similarity import embedding_covariance

    rng = [[float((i * 7 + j * 3) % 5) - 2.0 for j in range(4)] for i in range(9)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)], "vec_id long, embedding array<float>"
    )
    got = {
        (r["i"], r["j"]): r["cov"] for r in embedding_covariance(df).collect()
    }
    x = np.array(rng, dtype=np.float64)
    expected = np.cov(x, rowvar=False, bias=True)
    assert len(got) == 4 * 5 / 2
    for (i, j), v in got.items():
        assert i <= j
        assert abs(v - expected[i][j]) < 1e-9


def test_embedding_covariance_rejects_ragged(spark):
    from py4j.protocol import Py4JJavaError

    from webgraph.similarity import embedding_covariance

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception):
        embedding_covariance(df).collect()


# ------------------------------------------------ binned interval join ----


def test_interval_count_join_manual(spark):
    from webgraph.asof import interval_count_join

    iv = spark.createDataFrame(
        [
            (1, "2024-01-01 06:00:00", "2024-01-03 00:00:00"),
            (2, "2024-01-02 00:00:00", "2024-01-02 00:00:01"),
            (3, "2024-01-09 00:00:00", "2024-01-08 00:00:00"),  # inverted
        ],
        "iid long, s string, e string",
    ).select("iid", F.col("s").cast("timestamp"), F.col("e").cast("timestamp"))
    pts = spark.createDataFrame(
        [
            ("2024-01-01 05:59:59",),  # before 1
            ("2024-01-01 06:00:00",),  # in 1 (inclusive start)
            ("2024-01-02 23:59:59",),  # in 1
            ("2024-01-03 00:00:00",),  # out (exclusive end)
            ("2024-01-02 00:00:00",),  # in 1 and 2
        ],
        "t string",
    ).select(F.col("t").cast("timestamp"))
    got = {
        r["iid"]: r["n_points"]
        for r in interval_count_join(iv, pts, "iid", "s", "e", "t").collect()
    }
    assert got == {1: 3, 2: 1, 3: 0}


# ------------------------------------------------- stream-stream join -----


@pytest.mark.slow
def test_stream_stream_join_matches_batch(spark, tmp_path):
    from webgraph.streaming import run_to_append_sink, stream_stream_join

    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", i % 3, "view" if i % 2 == 0 else "click")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).select(
        "event_id", F.col("ts").cast("timestamp"), "user_id", "event_type"
    )
    src_dir = str(tmp_path / "events")
    df.coalesce(1).write.parquet(src_dir)
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def src():
        return spark.readStream.schema(schema).parquet(src_dir)

    views = src().filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    clicks = src().filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    joined = stream_stream_join(
        views, clicks, "user_id", "ts", "ts", "5 minutes", "10 minutes"
    ).select("user_id", "l_event_id", "r_event_id")
    out = str(tmp_path / "out")
    run_to_append_sink(joined, f"{out}/res", f"{out}/ck")
    got = sorted(map(tuple, spark.read.parquet(f"{out}/res").collect()))

    batch = (
        df.filter(F.col("event_type") == "view")
        .select("user_id", F.col("event_id").alias("l"), F.col("ts").alias("lt"))
        .join(
            df.filter(F.col("event_type") == "click").select(
                F.col("user_id").alias("u2"),
                F.col("event_id").alias("r"),
                F.col("ts").alias("rt"),
            ),
            (F.col("user_id") == F.col("u2"))
            & (F.col("rt") >= F.col("lt"))
            & (F.col("rt") < F.col("lt") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select("user_id", "l", "r")
    )
    assert got == sorted(map(tuple, batch.collect()))
    assert got  # the fixture produces matches


# ------------------------------------- stats-safe lineage truncation ------


def _size_digits(df):
    return len(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def test_truncate_lineage_resets_plan_statistics(spark):
    """Spark propagates origin-plan statistics through localCheckpoint;
    a loop that self-joins its checkpointed state SQUARES the sizeInBytes
    estimate per round, and by ~round 15 Catalyst spends minutes
    multiplying million-digit BigIntegers on the driver (observed on
    g_msf's pointer-doubling before the fix). truncate_lineage must keep
    the estimate's digit count bounded and constant across rounds."""
    from webgraph.algos.common import truncate_lineage

    state = spark.range(64).selectExpr("id AS vid", "id AS root")

    plain = state.localCheckpoint(eager=True)
    safe = truncate_lineage(state)
    plain_digits, safe_digits = [], []
    for _ in range(4):
        hop_p = plain.select(F.col("vid").alias("root"), F.col("root").alias("r2"))
        plain = plain.join(hop_p, "root").select("vid", F.col("r2").alias("root")) \
            .localCheckpoint(eager=True)
        hop_s = safe.select(F.col("vid").alias("root"), F.col("root").alias("r2"))
        safe = truncate_lineage(
            safe.join(hop_s, "root").select("vid", F.col("r2").alias("root"))
        )
        plain_digits.append(_size_digits(plain))
        safe_digits.append(_size_digits(safe))
    # the un-reset variant compounds: digits roughly double per self-join
    # round (this is the curve that reaches millions of digits by round 20)
    assert plain_digits[-1] >= 2 * plain_digits[0]
    # … the safe variant stays at the constant leaf default, round after round
    assert len(set(safe_digits)) == 1 and safe_digits[0] <= 19
    # and the data is untouched
    assert safe.count() == 64
    assert sorted(r["vid"] for r in safe.collect()) == list(range(64))


def test_truncate_lineage_preserves_schema_and_values(spark):
    from webgraph.algos.common import truncate_lineage

    df = spark.createDataFrame(
        [(1, "a", 2.5, [1, 2]), (2, None, -0.5, [])],
        "id long, s string, x double, arr array<int>",
    )
    out = truncate_lineage(df)
    assert out.schema == df.schema
    assert sorted(map(tuple, out.fillna({"s": "?"}).collect())) == sorted(
        map(tuple, df.fillna({"s": "?"}).collect())
    )
