"""Round-5i operators: gap-encoding compression stats (Boldi-Vigna),
BPE merge learning, explicit k-means clustering. House style: tiny
hand-checkable fixtures with exact expected values, plus structural pins.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan_of(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


# ----------------------------------------------- gap-encoding stats -------


def test_gamma_bit_length_exact_at_powers_of_two(spark):
    from webgraph.algos.compress import gamma_bit_length

    # gamma(v) = 2*floor(log2 v) + 1; powers of two are where a naive
    # float log2 rounds wrong.
    vals = [1, 2, 3, 4, 7, 8, 1023, 1024, 1025, 2**40]
    got = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .select("v", gamma_bit_length(F.col("v")).alias("bits"))
        .collect()
    )
    expect = {v: 2 * (v.bit_length() - 1) + 1 for v in vals}
    assert {r["v"]: r["bits"] for r in got} == expect


def test_gap_encoding_stats_hand_computed(spark):
    from webgraph.algos.compress import gap_encoding_stats

    # src 0 -> [2, 3, 7]: first value 2*(2-0)+1=5 -> gamma 5 bits;
    # gaps 1 -> 1 bit, 4 -> 5 bits; total 11.
    # src 5 -> [1]: first value 2*(5-1)-1+1=8 -> gamma 7 bits.
    # src 9 -> [9]: self-loop, first value 1 -> 1 bit.
    edges = spark.createDataFrame(
        [(0, 2), (0, 3), (0, 7), (5, 1), (9, 9)], "src long, dst long"
    )
    got = {
        r["src"]: (r["out_deg"], r["gamma_bits"])
        for r in gap_encoding_stats(edges).collect()
    }
    assert got == {0: (3, 11), 5: (1, 7), 9: (1, 1)}


def test_gap_encoding_plan_is_codegen(spark):
    from webgraph.algos.compress import gap_encoding_stats

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    plan = _plan_of(gap_encoding_stats(edges))
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


# ----------------------------------------------- BPE merge learning -------


def test_bpe_merges_hand_computed(spark):
    from webgraph.text import bpe_learn_merges

    # "aabaab" + "aab": round 1 counts aa:3 ab:3 ba:1 -> tie broken to
    # (a,a); round 2 (aa,b):3; round 3 (aab,aab):1.
    docs = spark.createDataFrame(
        [(1, "aabaab"), (2, "aab")], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_learn_merges(docs, n_merges=3).collect()]
    assert got == [
        (1, "a", "a", "aa", 3),
        (2, "aa", "b", "aab", 3),
        (3, "aab", "aab", "aabaab", 1),
    ]


def test_bpe_greedy_merge_is_left_to_right(spark):
    from webgraph.text import bpe_learn_merges

    # "aaaa": round 1 pair (a,a) counted with overlaps (3), greedy
    # application yields (aa)(aa) -> round 2 pair is (aa,aa) count 1.
    docs = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_learn_merges(docs, n_merges=2).collect()]
    assert got == [(1, "a", "a", "aa", 3), (2, "aa", "aa", "aaaa", 1)]


def test_bpe_strips_non_alpha_and_stops_when_corpus_exhausted(spark):
    from webgraph.text import bpe_learn_merges

    # Only a-z survive seeding; a single-symbol corpus has no pairs, so
    # the loop stops early instead of emitting empty rounds.
    docs = spark.createDataFrame([(1, "A!1b")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_learn_merges(docs, n_merges=4).collect()]
    assert got == [(1, "a", "b", "ab", 1)]


# ----------------------------------------------- explicit k-means ---------


def test_kmeans_init_centroids_converges_to_true_clusters(spark):
    from webgraph.similarity import (
        assign_buckets,
        centroid_frame,
        kmeans_centroids,
    )

    # Two well-separated groups; init from the two lowest-id vectors (one
    # in each group): two Lloyd rounds land every point with its group.
    pts = [
        (0, [0.0, 0.1]), (2, [0.1, 0.0]), (4, [0.0, 0.0]),
        (1, [10.0, 10.1]), (3, [10.1, 10.0]), (5, [10.0, 10.0]),
    ]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    init = [[0.0, 0.1], [10.0, 10.1]]
    cents = kmeans_centroids(emb, n_centroids=2, iters=2, init_centroids=init)
    assert [round(x, 6) for x in cents[0]] == [
        round(x, 6) for x in [0.1 / 3, 0.1 / 3]
    ]
    assigned = assign_buckets(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")),
        centroid_frame(spark, cents),
    )
    got = {r["id"]: r["bucket"] for r in assigned.collect()}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}


def test_kmeans_hash_init_still_default(spark):
    from webgraph.similarity import kmeans_centroids

    emb = spark.createDataFrame(
        [(i, [float(i), float(i)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    a = kmeans_centroids(emb, n_centroids=2, iters=1)
    b = kmeans_centroids(emb, n_centroids=2, iters=1)
    assert a == b  # seeded-hash init stays deterministic


def test_bpe_plan_has_no_python_and_no_cartesian(spark):
    from webgraph.text import bpe_learn_merges

    docs = spark.createDataFrame([(1, "abab")], "doc_id long, text string")
    # the returned frame is a driver-built literal table; pin the plan of
    # the heavy intermediate instead: the symbol seeding explode.
    from webgraph.algos.common import truncate_lineage  # noqa: F401

    s = F.substring(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""), 1, 24)
    base = docs.select(F.col("doc_id"), s.alias("s")).filter(F.length("s") > 0)
    seeded = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("s")),
                lambda i: F.col("s").substr(i, F.lit(1)),
            )
        ).alias("pos", "sym"),
    )
    plan = _plan_of(seeded)
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ----------------------------------------------- node2vec walks -----------


def _graph(spark, edges):
    from webgraph.algos.common import from_int_edges

    return from_int_edges(spark.createDataFrame(edges, "src long, dst long"))


def test_node2vec_degenerates_to_first_order_at_unit_costs(spark):
    from webgraph.algos.walks import deterministic_walks, node2vec_walks

    g = _graph(
        spark,
        [(0, 1), (0, 2), (1, 2), (1, 3), (2, 0), (2, 3), (3, 0), (3, 1)],
    )
    first = {
        (r["walk_id"], r["step"]): r["vid"]
        for r in deterministic_walks(g, walk_len=3, seed=7).collect()
    }
    second = {
        (r["walk_id"], r["step"]): r["vid"]
        for r in node2vec_walks(
            g, walk_len=3, return_cost=1, inout_cost=1, seed=7
        ).collect()
    }
    assert first == second


def test_node2vec_bias_classes_pick_the_common_neighbor(spark):
    from webgraph.algos.walks import WALK_MOD, node2vec_walks

    # From 0 the only move is 1 (prev becomes 0). At step 2 the
    # candidates are: back to 0 (return class), 2 (prev 0 also links to
    # it -> class 1), 3 (outward class). With both return and in-out
    # costs at WALK_MOD, any class-1 candidate wins the hash race.
    g = _graph(spark, [(0, 1), (0, 2), (1, 0), (1, 2), (1, 3)])
    out = {
        (r["walk_id"], r["step"]): r["vid"]
        for r in node2vec_walks(
            g, walk_len=2, return_cost=WALK_MOD, inout_cost=WALK_MOD
        ).collect()
    }
    assert out[(0, 0)] == 0 and out[(0, 1)] == 1 and out[(0, 2)] == 2


def test_node2vec_walk_ends_at_dangling_vertex(spark):
    from webgraph.algos.walks import node2vec_walks

    g = _graph(spark, [(0, 1)])  # 1 has no out-edges
    rows = sorted(
        (r["walk_id"], r["step"], r["vid"])
        for r in node2vec_walks(g, walk_len=4).collect()
        if r["walk_id"] == 0
    )
    assert rows == [(0, 0, 0), (0, 1, 1)]


# ----------------------------------------------- type-2 clones ------------


def test_type2_normalization_is_rename_and_literal_invariant(spark):
    from webgraph.code import normalize_type2

    got = (
        spark.createDataFrame(
            [("x = 1\ny = x + 2",), ("foo = 10\nbar = foo + 25",)],
            "block string",
        )
        .select(normalize_type2(F.col("block")).alias("n"))
        .collect()
    )
    assert got[0]["n"] == got[1]["n"] == "ID = N ID = ID + N"


def test_type2_keywords_carry_structure(spark):
    from webgraph.code import normalize_type2

    # same token shapes but different keywords must NOT collapse
    got = (
        spark.createDataFrame(
            [("if x:\n    return y",), ("while x:\n    return y",)],
            "block string",
        )
        .select(normalize_type2(F.col("block")).alias("n"))
        .collect()
    )
    assert got[0]["n"] == "if ID : return ID"
    assert got[1]["n"] == "while ID : return ID"


def test_clone_type2_groups_renamed_blocks_across_repos(spark):
    from webgraph.code import clone_type2

    docs = spark.createDataFrame(
        [
            ("r1", "x = 1\ny = x + 2"),
            ("r2", "foo = 10\nbar = foo + 25"),
            ("r3", "if alpha:\n    return beta + 1"),  # different structure
        ],
        "repo string, content string",
    )
    rows = clone_type2(docs).collect()
    assert len(rows) == 1  # only the renamed pair survives min_copies
    r = rows[0]
    assert (r["n_tokens"], r["n_copies"], r["n_repos"], r["first_repo"]) == (
        8, 2, 2, "r1",
    )


# ----------------------------------------------- label spreading ----------


def test_label_spread_seeds_absorb_and_majority_wins(spark):
    from webgraph.algos.labelprop import seeded_label_spread

    # path 0-1-2 plus hub 3 linked to two class-0 seeds and one class-1:
    # seeds: 0 (class 0), 2 (class 1), 4 (class 0).
    # vertex 1 borders seeds 0 and 2 -> tie (1 vs 1) -> smallest label 0.
    # vertex 3 borders 0, 2, 4 -> class 0 wins 2:1.
    g = _graph(spark, [(0, 1), (1, 2), (3, 0), (3, 2), (3, 4)])
    seeds = spark.createDataFrame(
        [(0, 0), (2, 1), (4, 0)], "vid long, label long"
    )
    out = {
        r["vid"]: (r["label"], r["is_seed"])
        for r in seeded_label_spread(g, seeds, iters=2).collect()
    }
    assert out[0] == (0, True) and out[2] == (1, True) and out[4] == (0, True)
    assert out[1] == (0, False)
    assert out[3] == (0, False)


def test_label_spread_unreached_vertices_stay_unlabeled(spark):
    from webgraph.algos.labelprop import seeded_label_spread

    # component {5,6} holds no seed: absent from the output.
    g = _graph(spark, [(0, 1), (5, 6)])
    seeds = spark.createDataFrame([(0, 3)], "vid long, label long")
    out = {r["vid"]: r["label"] for r in seeded_label_spread(g, seeds, iters=4).collect()}
    assert out == {0: 3, 1: 3}


def test_label_spread_seed_overrides_neighborhood(spark):
    from webgraph.algos.labelprop import seeded_label_spread

    # seed 1 (class 9) is surrounded by class-0 mass but never flips.
    g = _graph(spark, [(0, 1), (2, 1), (3, 1)])
    seeds = spark.createDataFrame(
        [(0, 0), (2, 0), (3, 0), (1, 9)], "vid long, label long"
    )
    out = {r["vid"]: r["label"] for r in seeded_label_spread(g, seeds, iters=3).collect()}
    assert out[1] == 9


# ----------------------------------------------- truss decomposition ------


def test_trussness_k4_is_4_everywhere(spark):
    from webgraph.algos.triangles import truss_decomposition

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {
        (r["a"], r["b"]): r["trussness"]
        for r in truss_decomposition(_graph(spark, k4)).collect()
    }
    assert got == {e: 4 for e in k4}


def test_trussness_shared_edge_of_two_triangles_is_3(spark):
    from webgraph.algos.triangles import truss_decomposition

    # triangles {1,2,3} and {2,3,4} share edge (2,3): the 4-truss is
    # empty (edge (1,2) has support 1, peeling cascades), so every edge
    # — including the support-2 shared edge — has trussness 3.
    g = _graph(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    got = {
        (r["a"], r["b"]): r["trussness"]
        for r in truss_decomposition(g).collect()
    }
    assert got == {(1, 2): 3, (1, 3): 3, (2, 3): 3, (2, 4): 3, (3, 4): 3}


def test_trussness_triangle_free_edge_is_2(spark):
    from webgraph.algos.triangles import truss_decomposition

    g = _graph(spark, [(0, 1), (1, 2)])
    got = {
        (r["a"], r["b"]): r["trussness"]
        for r in truss_decomposition(g).collect()
    }
    assert got == {(0, 1): 2, (1, 2): 2}


def test_trussness_early_stop_equals_fixed_horizon(spark):
    from webgraph.algos.triangles import truss_decomposition

    # K4 plus a pendant triangle hanging off vertex 0
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [
        (0, 10), (0, 11), (10, 11),
    ]
    g = _graph(spark, edges)
    stopped = {
        (r["a"], r["b"]): r["trussness"]
        for r in truss_decomposition(g, iters=None).collect()
    }
    fixed = {
        (r["a"], r["b"]): r["trussness"]
        for r in truss_decomposition(g, iters=6).collect()
    }
    assert stopped == fixed
    assert stopped[(0, 1)] == 4 and stopped[(0, 10)] == 3


# ----------------------------------------------- snowball sampling --------


def test_snowball_fanout_caps_expansion(spark):
    from webgraph.algos.sampling import snowball_sample

    g = _graph(spark, [(0, d) for d in range(1, 6)])
    seeds = spark.createDataFrame([(0,)], "vid long")
    out = snowball_sample(g, seeds, fanout=3, depth=1)
    levels = {r["level"]: r["n"] for r in out.groupBy("level").agg(F.count("*").alias("n")).collect()}
    assert levels == {0: 1, 1: 3}


def test_snowball_keeps_first_reached_level(spark):
    from webgraph.algos.sampling import snowball_sample

    # 2 is reachable directly (level 1) and via 1 (level 2): must be 1.
    g = _graph(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    seeds = spark.createDataFrame([(0,)], "vid long")
    out = {
        r["vid"]: r["level"]
        for r in snowball_sample(g, seeds, fanout=5, depth=2).collect()
    }
    assert out == {0: 0, 1: 1, 2: 1, 3: 2}


def test_snowball_is_deterministic_across_runs(spark):
    from webgraph.algos.sampling import snowball_sample

    edges = [(a, (a * 7 + b) % 20) for a in range(20) for b in range(1, 5)]
    g = _graph(spark, edges)
    seeds = spark.createDataFrame([(0,), (13,)], "vid long")
    a = sorted(tuple(r) for r in snowball_sample(g, seeds, fanout=2, depth=3).collect())
    b = sorted(tuple(r) for r in snowball_sample(g, seeds, fanout=2, depth=3).collect())
    assert a == b and len(a) > 2


# ----------------------------------------------- perceptron ---------------


def test_perceptron_learns_a_separable_threshold(spark):
    from webgraph.ml import train_perceptron

    # 1-D separable data: label +1 iff x >= 5.
    rows = [(i, i, 1 if i >= 5 else -1) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, x long, y long")
    w, scored, mistakes = train_perceptron(df, "y", ["x"], iters=25)
    got = {r["doc_id"]: r["pred"] for r in scored.collect()}
    assert got == {i: (1 if i >= 5 else -1) for i in range(10)}
    assert min(mistakes) == 0  # the pocket found a perfect separator


def test_perceptron_pocket_keeps_the_best_round(spark):
    from webgraph.ml import train_perceptron

    # w=0 -> every margin is 0 (<= 0, misclassified): round-0 mistakes
    # = all rows, and the round-1 candidate is [sum(y), sum(y*x)].
    rows = [(0, 2, 1), (1, 3, -1), (2, 7, 1)]
    df = spark.createDataFrame(rows, "doc_id long, x long, y long")
    w, scored, mistakes = train_perceptron(df, "y", ["x"], iters=1)
    assert mistakes[0] == 3
    cand1 = [1 + (-1) + 1, 2 - 3 + 7]  # [1, 6]
    # pocket = argmin(mistakes, round): cand1 classifies all three
    # correctly (scores 3, 7, 13 -> but y=-1 at x=3 is wrong: 1+18>0),
    # so mistakes[1] = 1 and the pocket is still cand1 over the all-zero
    # w0 (3 mistakes).
    assert w == cand1 and mistakes[1] == 1


def test_perceptron_is_deterministic_under_repartition(spark):
    from webgraph.ml import train_perceptron

    rows = [(i, (i * 13) % 23, (i * 7) % 11, 1 if i % 3 else -1) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, a long, b long, y long")
    w1, _, m1 = train_perceptron(df.repartition(2), "y", ["a", "b"], iters=4)
    w2, _, m2 = train_perceptron(df.repartition(16), "y", ["a", "b"], iters=4)
    assert w1 == w2 and m1 == m2


# ----------------------------------------------- streaming minhash --------


def _drain_minhash(spark, tmpdir, docs):
    from webgraph.streaming import streaming_minhash_state

    docs.repartition(2).write.mode("overwrite").parquet(f"{tmpdir}/in")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/in")
    )
    q = streaming_minhash_state(
        spark, stream, f"{tmpdir}/state", f"{tmpdir}/ck", num_hashes=16, bands=4
    )
    q.awaitTermination()


def test_streaming_minhash_state_equals_batch_index(spark, tmp_path):
    from webgraph.dedup import minhash_band_buckets, minhash_signatures, shingles
    from webgraph.streaming import read_minhash_state

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc{i % 3} zeta") for i in range(12)],
        "doc_id long, text string",
    )
    _drain_minhash(spark, str(tmp_path), docs)
    drained = {
        (r["id"], r["band"], r["bsig"])
        for r in read_minhash_state(spark, f"{tmp_path}/state").collect()
    }
    batch = {
        (r["id"], r["band"], r["bsig"])
        for r in minhash_band_buckets(
            minhash_signatures(shingles(docs), 16), 4, 4
        ).collect()
    }
    assert drained == batch


def test_streaming_minhash_serves_exact_near_dups(spark, tmp_path):
    from webgraph.streaming import minhash_pairs_from_state

    # 0 and 1 share every shingle; 2 is unrelated.
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again"),
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "completely different words with no overlap here at all"),
        ],
        "doc_id long, text string",
    )
    _drain_minhash(spark, str(tmp_path), docs)
    got = [
        (r["a"], r["b"], r["jaccard"])
        for r in minhash_pairs_from_state(
            spark, f"{tmp_path}/state", docs, threshold=0.9
        ).collect()
    ]
    assert got == [(0, 1, 1.0)]


def test_streaming_minhash_replay_is_idempotent(spark, tmp_path):
    from webgraph.streaming import read_minhash_state, streaming_minhash_state

    docs = spark.createDataFrame(
        [(i, f"one two three four five six doc{i}") for i in range(6)],
        "doc_id long, text string",
    )
    _drain_minhash(spark, str(tmp_path), docs)
    before = read_minhash_state(spark, f"{tmp_path}/state").count()
    # re-drain the same input with a FRESH checkpoint: every batch
    # replays, the anti-join on committed ids must add zero rows
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp_path}/in")
    )
    q = streaming_minhash_state(
        spark, stream, f"{tmp_path}/state", f"{tmp_path}/ck2",
        num_hashes=16, bands=4,
    )
    q.awaitTermination()
    after = read_minhash_state(spark, f"{tmp_path}/state").count()
    assert before == after


# ----------------------------------------------- R-MAT + cube -------------


def test_rmat_bits_stay_in_range_and_skew_toward_low_ids(spark):
    from webgraph.generators import rmat_edges

    e = rmat_edges(spark, scale=6, n_edges=800, a=570, b=190, c=190).cache()
    stats = e.agg(
        F.min("src"), F.max("src"), F.min("dst"), F.max("dst"), F.count("*")
    ).collect()[0]
    assert stats[4] == 800
    assert 0 <= stats[0] and stats[1] < 64 and 0 <= stats[2] and stats[3] < 64
    # a=0.57 concentrates mass in the low-id quadrant at every level:
    # the low half must hold well over half of all endpoints
    low = e.filter((F.col("src") < 32) & (F.col("dst") < 32)).count()
    assert low > 800 * 0.5


def test_rmat_is_a_pure_function_of_the_index(spark):
    from webgraph.generators import rmat_edges

    a = sorted(tuple(r) for r in rmat_edges(spark, scale=5, n_edges=100).collect())
    b = sorted(tuple(r) for r in rmat_edges(spark, scale=5, n_edges=100).collect())
    assert a == b
    # prefix stability: the first 50 edges of a 100-edge run equal a
    # 50-edge run outright (edge i never depends on n_edges)
    c = sorted(tuple(r) for r in rmat_edges(spark, scale=5, n_edges=50).collect())
    assert c == [t for t in a if t[0] < 50]


def test_rmat_plan_has_no_shuffle(spark):
    from webgraph.generators import rmat_edges

    plan = _plan_of(rmat_edges(spark, scale=5, n_edges=10))
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ----------------------------------------------- skip-gram pairs ----------


def test_skipgram_pairs_hand_computed(spark):
    from webgraph.algos.walks import skipgram_pairs

    # one walk 10 -> 20 -> 30: window 1 gives the 4 adjacent directed
    # pairs; window 2 adds (10,30) and (30,10).
    walks = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 20), (0, 2, 30)], "walk_id long, step long, vid long"
    )
    w1 = {(r["center"], r["context"]): r["n"] for r in skipgram_pairs(walks, 1).collect()}
    assert w1 == {(10, 20): 1, (20, 10): 1, (20, 30): 1, (30, 20): 1}
    w2 = {(r["center"], r["context"]): r["n"] for r in skipgram_pairs(walks, 2).collect()}
    assert w2 == {**w1, (10, 30): 1, (30, 10): 1}


def test_skipgram_counts_aggregate_across_walks(spark):
    from webgraph.algos.walks import skipgram_pairs

    walks = spark.createDataFrame(
        [(0, 0, 1), (0, 1, 2), (7, 0, 1), (7, 1, 2)],
        "walk_id long, step long, vid long",
    )
    got = {(r["center"], r["context"]): r["n"] for r in skipgram_pairs(walks, 1).collect()}
    assert got == {(1, 2): 2, (2, 1): 2}


# ----------------------------------------------- corpus datasheet ---------


def test_datasheet_counts_and_shares(spark):
    from webgraph.text import corpus_datasheet

    docs = spark.createDataFrame(
        [
            (0, "one two three", "en", "web"),
            (1, "uno dos", "es", "web"),
            (2, "a b c d e", "en", "book"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        (r["source"], r["lang"]): (
            r["n_docs"], r["n_tokens"], r["docs_share_e6"], r["tokens_share_e6"]
        )
        for r in corpus_datasheet(docs).collect()
    }
    assert got == {
        ("web", "en"): (1, 3, 333333, 300000),
        ("web", "es"): (1, 2, 333333, 200000),
        ("book", "en"): (1, 5, 333333, 500000),
    }


def test_datasheet_plan_broadcasts_the_totals(spark):
    from webgraph.text import corpus_datasheet

    docs = spark.createDataFrame(
        [(0, "x", "en", "web")], "doc_id long, text string, lang string, source string"
    )
    plan = _plan_of(corpus_datasheet(docs))
    assert "BroadcastNestedLoopJoin" in plan and "BatchEvalPython" not in plan


# ----------------------------------------------- IVF recall ---------------


def test_ivf_recall_probe_all_is_perfect(spark):
    from webgraph.similarity import build_ivf_index, ivf_recall

    emb = spark.createDataFrame(
        [(i, [1.0 + (i * 7) % 5, 1.0 + (i * 3) % 4]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    init = [[1.0, 1.0], [5.0, 4.0]]
    indexed, cents = build_ivf_index(emb, n_centroids=2, iters=1, init_centroids=init)
    queries = emb.filter(F.col("vec_id") < 3)
    out = ivf_recall(indexed, cents, queries, k=5, nprobe=2)  # probe all
    assert all(r["recall_e6"] == 1_000_000 for r in out.collect())


def test_ivf_recall_single_probe_can_miss(spark):
    from webgraph.similarity import build_ivf_index, ivf_recall

    # two tight clusters; k spans both, one probe sees only one cluster
    pts = [(i, [1.0, 1.0 + i * 0.01]) for i in range(6)] + [
        (10 + i, [10.0, 1.0 - i * 0.01]) for i in range(6)
    ]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    indexed, cents = build_ivf_index(
        emb, n_centroids=2, iters=1, init_centroids=[[1.0, 1.0], [10.0, 1.0]]
    )
    queries = emb.filter(F.col("vec_id") == 0)
    full = ivf_recall(indexed, cents, queries, k=12, nprobe=2).collect()[0]
    one = ivf_recall(indexed, cents, queries, k=12, nprobe=1).collect()[0]
    assert full["recall_e6"] == 1_000_000
    assert one["n_hits"] < 12  # the unprobed cluster's vectors are missed


# ----------------------------------------------- perceptual hashing -------


def test_ahash_bits_from_injected_thumbnailer(spark):
    from webgraph.multimodal import image_ahash

    # thumbnail = 16 high pixels then 48 low: bits 1..16 set -> b0 =
    # 0xFFFF, b1..b3 = 0 (mean = 4, high 16 > mean, low 0 not).
    def thumb(data):
        return [16] * 16 + [0] * 48

    assets = spark.createDataFrame(
        [(1, "image/png", bytearray(b"x"))], "asset_id long, mime string, media binary"
    )
    r = image_ahash(assets, thumb_fn=thumb).collect()[0]
    assert (r["b0"], r["b1"], r["b2"], r["b3"]) == (0xFFFF, 0, 0, 0)


def test_phash_near_pairs_banding_is_lossless_at_radius_3(spark):
    from webgraph.multimodal import phash_near_pairs

    # a/b differ in 3 bits of band 0 only (hamming 3: kept, bands 1-3
    # equal); a/c differ in one bit per band (hamming 4: dropped).
    rows = [
        (1, 0b111, 10, 20, 30),
        (2, 0b000, 10, 20, 30),
        (3, 0b110, 11, 21, 31),
    ]
    hashed = spark.createDataFrame(
        rows, "asset_id long, b0 long, b1 long, b2 long, b3 long"
    )
    got = {(r["a"], r["b"]): r["hamming"] for r in phash_near_pairs(hashed, 3).collect()}
    assert got == {(1, 2): 3}


def test_phash_identical_media_is_hamming_zero(spark):
    from webgraph.multimodal import image_ahash, phash_near_pairs

    assets = spark.createDataFrame(
        [(1, "image/png", bytearray(b"same")), (2, "image/png", bytearray(b"same")),
         (3, "image/png", bytearray(b"other payload entirely"))],
        "asset_id long, mime string, media binary",
    )
    got = [tuple(r) for r in phash_near_pairs(image_ahash(assets)).collect()]
    assert got == [(1, 2, 0)]


def test_frame_dedup_groups_identical_frames_across_assets(spark):
    from webgraph.multimodal import frame_dedup_groups

    frames = spark.createDataFrame(
        [
            (1, 0, 0, "hA"), (1, 1, 1000, "hB"),
            (2, 0, 0, "hA"),                      # same frame, other asset
            (2, 1, 1000, "hA"),                   # and repeated within it
            (3, 0, 0, "hC"),                      # unique: dropped
        ],
        "asset_id long, frame_idx int, ts_ms long, frame_sha256 string",
    )
    rows = [tuple(r) for r in frame_dedup_groups(frames).collect()]
    assert rows == [(3, 2, 1)]  # hA: 3 copies, 2 assets, first asset 1


# ----------------------------------------------- webgraph ascii export ----


def test_webgraph_ascii_export_roundtrip(spark, tmp_path):
    from webgraph.export import export_webgraph_ascii

    edges = spark.createDataFrame(
        [(0, 7), (0, 2), (5, 1), (5, 9), (5, 3)], "src long, dst long"
    )
    out = export_webgraph_ascii(edges, str(tmp_path / "g"), partitions=2)
    import glob

    lines = []
    for p in sorted(glob.glob(f"{out}/part-*")):
        with open(p) as f:
            lines += [ln.rstrip("\n") for ln in f if ln.strip()]
    # one line per src, successors ascending, global src order after
    # filename-ordered concatenation
    assert lines == ["0 2 7", "5 1 3 9"]


# ----------------------------------------------- composed frontier --------


def test_frontier_composition_denies_robots_and_batches_by_host(spark):
    from webgraph.contract import q_f_frontier

    rows = q_f_frontier(spark, "/root/testdata/sf0.001").collect()
    # paths starting /p/1 are robots-denied
    assert all("/p/1" != r["url"].split(".com")[1][:4] for r in rows)
    assert not any(r["url"].endswith("/p/1") for r in rows)
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append((r["rank_in_host"], r["batch"]))
    for host, pairs in by_host.items():
        ranks = sorted(p[0] for p in pairs)
        assert ranks == list(range(1, len(ranks) + 1))  # dense per-host rank
        assert all(b == (rk - 1) // 3 for rk, b in pairs)  # rounds of 3
