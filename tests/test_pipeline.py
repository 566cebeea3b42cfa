"""Training-data pipeline operators: text analysis, dedup (exact /
MinHash-LSH / SimHash / n-gram Jaccard / embedding), similarity search,
multimodal plumbing, streaming. Oracles are pure-Python recomputations."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from webgraph import dedup, similarity, text

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (1, "the quick brown fox jumps over the lazy dog and runs away quickly"),
    (2, "a completely different document about spark and data processing"),
    (3, "the quick brown fox jumps over the lazy dog and runs away fast"),  # dup of 0
    (4, "der schnelle braune fuchs springt und der hund ist nicht mit"),
    (5, "el zorro que salta sobre el perro con los gatos de la casa"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_shingles(s, n=3):
    t = s.lower().split()
    return {" ".join(t[i : i + n]) for i in range(max(1, len(t) - n + 1))}


def _py_jaccard(a, b, n=3):
    sa, sb = _py_shingles(a, n), _py_shingles(b, n)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [0, 3]
    kept = dedup.exact_dedup(docs)
    assert kept.count() == 5
    assert kept.filter(F.col("doc_id") == 3).count() == 0  # min-id kept


def test_exact_duplicates_caps_degenerate_group_payload(spark):
    """A degenerate corpus (thousands of copies of one doc) must not ship
    its whole posting list through one reducer: doc_ids is capped to the
    K smallest ids, n_docs stays the exact count."""
    n = 5000
    degen = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("same exact text").alias("text")
    )
    row = dedup.exact_duplicates(degen, max_ids_per_group=10).collect()
    assert len(row) == 1
    assert row[0]["n_docs"] == n
    assert row[0]["doc_ids"] == list(range(10))  # K smallest, sorted
    # unbounded mode still available explicitly
    full = dedup.exact_duplicates(degen.limit(50), max_ids_per_group=None)
    assert full.collect()[0]["doc_ids"] == list(range(50))


def test_ngram_jaccard_matches_python_oracle(docs):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        want = _py_jaccard(ta, tb)
        if want > 0:
            assert abs(got[(ia, ib)] - want) < 1e-12, (ia, ib)
        else:
            assert (ia, ib) not in got


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.minhash_dedup_pairs(docs, threshold=0.5).collect()
    }
    # the near-dup pair (0,1) and exact dup (0,3)/(1,3) must be found;
    # verify stage guarantees jaccard values are EXACT
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and abs(pairs[(0, 1)] - _py_jaccard(DOCS[0][1], DOCS[1][1])) < 1e-12
    # precision: nothing below threshold
    assert all(j >= 0.5 for j in pairs.values())
    assert (0, 2) not in pairs


def test_simhash_near_pairs(docs):
    sigs = dedup.simhash(docs)
    got = {r["id"]: r["simhash"] for r in sigs.collect()}
    assert got[0] == got[3]  # identical docs -> identical signature

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    near, far = ham(got[0], got[1]), ham(got[0], got[2])
    assert near < far  # near-dups closer in hamming space than unrelated

    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(sigs, max_hamming=near, bands=32).collect()
    }
    assert pairs[(0, 3)] == 0
    assert pairs[(0, 1)] == near  # candidate retrieval found the near pair
    assert (0, 2) not in pairs  # unrelated pair beyond the threshold


def test_embedding_near_dup_and_topk(spark):
    import math
    import random

    rnd = random.Random(7)
    base = [rnd.uniform(-1, 1) for _ in range(16)]
    rows = []
    for i in range(40):
        if i < 3:  # 3 near-dups of base
            v = [x + rnd.uniform(-0.01, 0.01) for x in base]
        else:
            v = [rnd.uniform(-1, 1) for _ in range(16)]
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    pairs = {
        (r["a"], r["b"]) for r in dedup.embedding_near_dup_pairs(emb, threshold=0.99).collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= pairs

    # brute-force top-k vs python oracle
    q = spark.createDataFrame([(0, [float(x) for x in base])], "q_id long, q_vec array<float>")
    got = [
        r["vec_id"]
        for r in similarity.brute_force_topk(emb, q, k=3).collect()
    ]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    fr = {i: cos([float(x) for x in v], base) for i, v in rows}
    want = sorted(fr, key=lambda i: (-fr[i], i))[:3]
    assert got == want

    # IVF path: query near the dup cluster must recover the cluster
    indexed, cents = similarity.build_ivf_index(emb, n_centroids=4)
    ivf = [r["vec_id"] for r in similarity.ivf_topk(indexed, cents, base, k=3, nprobe=2).collect()]
    assert set(ivf) & {0, 1, 2}


def test_language_detection(docs):
    got = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", text.detect_language(F.col("text")).alias("lang")
        ).collect()
    }
    assert got[0] == "en" and got[1] == "en"
    assert got[4] == "de"
    assert got[5] == "es"


def test_quality_features_and_filter(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it was a good day for all of us"),
            (1, "x"),  # too short
            (2, "000 111 222 333 444 555 666 777 888 999 000 111"),  # no alpha
        ],
        "doc_id long, text string",
    )
    kept = [r["doc_id"] for r in text.quality_filter(df, min_tokens=5).collect()]
    assert kept == [0]
    feats = text.quality_features(df).filter(F.col("doc_id") == 0).collect()[0]
    assert feats["n_tokens"] == 16
    assert 0 < feats["stopword_ratio"] < 1
    assert feats["alpha_ratio"] > 0.7


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "hello world, it's 2026!")], "i long, text string")
    r = df.select(
        text.token_count(F.col("text")).alias("ws"),
        text.bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert r["ws"] == 4
    # hello/world/,/it/'/s/2026/! = 8
    assert r["bpe"] == 8


def test_fingerprints(docs):
    fps = docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp")).collect()
    got = {r["doc_id"]: r["fp"] for r in fps}
    assert got[0] == got[3] and got[0] != got[1]
    rw = docs.select(
        "doc_id", text.rolling_fingerprints(F.col("text"), 4).alias("rf")
    ).collect()
    by_id = {r["doc_id"]: r["rf"] for r in rw}
    # shared 4-token windows between the two near-dup docs
    assert set(by_id[0]) & set(by_id[1])


def test_multimodal_plumbing(spark):
    from webgraph import multimodal as mm

    assets = mm.synthetic_assets(spark, n=32)
    stats = {r["media_class"]: r["n_assets"] for r in mm.media_stats(assets).collect()}
    assert stats == {"image": 16, "video": 8, "audio": 8}

    imgs = mm.decode_images(assets).collect()
    assert len(imgs) == 16
    r0 = imgs[0]
    assert 64 <= r0["width"] <= 2048 and r0["channels"] == 3
    assert len(r0["embedding"]) == 16
    # determinism across runs
    again = mm.decode_images(mm.synthetic_assets(spark, n=32)).collect()
    assert {r["asset_id"]: r["sha256"] for r in imgs} == {
        r["asset_id"]: r["sha256"] for r in again
    }

    frames = mm.sample_video_frames(assets).collect()
    assert frames and all(f["ts_ms"] == f["frame_idx"] * 1000 for f in frames)


def test_streaming_windowed_counts(spark, tmp_path):
    from webgraph import streaming as st

    src = str(tmp_path / "events_in")
    ev = spark.createDataFrame(
        [
            (1, "2026-01-01 10:05:00", 1, "click", 1.0, "{}"),
            (2, "2026-01-01 10:15:00", 1, "click", 2.0, "{}"),
            (3, "2026-01-01 11:05:00", 2, "view", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ev.write.parquet(src)

    stream = st.read_event_stream(spark, src)
    assert stream.isStreaming
    counts = st.windowed_event_counts(stream, "1 hour", "2 hours")
    st.run_to_memory_sink(counts, "win_counts")
    rows = {
        (str(r["window_start"]), r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert rows[("2026-01-01 10:00:00", "click")] == 2
    assert rows[("2026-01-01 11:00:00", "view")] == 1


def test_streaming_incremental_edge_merge(spark, tmp_path):
    from webgraph import streaming as st
    from webgraph.corpus import DOC_COLUMNS, fixture_docs

    in_dir = str(tmp_path / "docs_in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    fixture_docs(spark, "star_in").write.parquet(in_dir)

    docs_stream = (
        spark.readStream.schema(
            "repo string, path string, commit string, lang string, content string, seq long"
        ).parquet(in_dir)
    )
    q = st.incremental_edge_merge(
        spark, docs_stream, state, ["alpha.example.com"], ck
    )
    q.awaitTermination()
    edges = st.read_edge_state(spark, state)
    assert edges.count() == 4  # the 4 star edges, deduplicated

    # second batch: same docs again -> still 4 (idempotent merge), and the
    # batch directory holds ONLY the delta (zero rows), not a table rewrite
    fixture_docs(spark, "star_in").select(DOC_COLUMNS).write.mode("append").parquet(in_dir)
    q2 = st.incremental_edge_merge(spark, docs_stream, state, ["alpha.example.com"], ck)
    q2.awaitTermination()
    assert st.read_edge_state(spark, state).count() == 4
    entries = st._edge_manifest_entries(state)
    assert [e["rows"] for e in entries] == [4, 0]
    for e in entries:  # per-batch dirs contain exactly the delta rows
        assert spark.read.parquet(e["path"]).count() == e["rows"]


def test_incremental_merge_crash_before_commit_is_replay_safe(spark, tmp_path):
    """A batch directory written WITHOUT its manifest line (crash between
    the parquet write and the commit append) is invisible to readers and
    safely overwritten when the batch replays."""
    from webgraph import streaming as st
    from webgraph.corpus import fixture_docs

    in_dir = str(tmp_path / "docs_in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    fixture_docs(spark, "star_in").write.parquet(in_dir)

    # simulate the crash: orphan batch dir exists, no manifest
    orphan = f"{state}/edges/batch=0"
    spark.createDataFrame(
        [("https://x/", "https://y/")], "src string, dst string"
    ).write.parquet(orphan)
    assert st.read_edge_state(spark, state) is None  # uncommitted -> unseen

    docs_stream = (
        spark.readStream.schema(
            "repo string, path string, commit string, lang string, "
            "content string, seq long"
        ).parquet(in_dir)
    )
    q = st.incremental_edge_merge(spark, docs_stream, state, ["alpha.example.com"], ck)
    q.awaitTermination()
    got = {
        (r["src"], r["dst"]) for r in st.read_edge_state(spark, state).collect()
    }
    assert len(got) == 4  # replay overwrote the orphan; stale edge gone
    assert ("https://x/", "https://y/") not in got


def test_ivf_scales_to_many_centroids(spark):
    """k=256 smoke: centroid assignment must plan via the broadcast
    centroid join (O(1) expression size in k), not a k x dim literal
    when-chain — the latter collapses Catalyst/codegen at realistic k."""
    import random

    from webgraph import similarity

    rnd = random.Random(7)
    rows = [
        (i, [float(rnd.uniform(-1, 1)) for _ in range(8)]) for i in range(2000)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    indexed, cents = similarity.build_ivf_index(emb, n_centroids=256, iters=1)
    assert len(cents) == 256
    stats = indexed.agg(
        F.countDistinct("bucket").alias("nb"),
        F.min("bucket").alias("lo"),
        F.max("bucket").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert stats["n"] == 2000
    assert 0 <= stats["lo"] and stats["hi"] <= 255
    assert stats["nb"] > 32  # vectors actually spread over the buckets


def test_ngram_max_doc_freq_caps_boilerplate(spark):
    """The document-frequency cap bounds the quadratic shared-shingle join:
    boilerplate shingles shared by every doc are dropped (logged), so a
    boilerplate-heavy corpus produces no quadratic pair blowup."""
    rows = [
        (
            i,
            "all rights reserved footer text here "
            + f"unique{i} alpha{i} beta{i} gamma{i} delta{i}",
        )
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.2)
    assert exact.count() == 40 * 39 // 2  # uncapped: every pair (quadratic)
    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.2, max_doc_freq=10)
    assert capped.count() == 0  # boilerplate dropped -> nothing shared


def test_lsh_strict_mode_fails_on_oversized_bucket(spark):
    docs = spark.createDataFrame(
        [(i, "the same exact text repeated in every single row") for i in range(30)],
        "doc_id long, text string",
    )
    sh = dedup.shingles(docs)
    sigs = dedup.minhash_signatures(sh, num_hashes=32)
    with pytest.raises(ValueError, match="strict mode"):
        dedup.minhash_lsh_candidates(
            sigs, bands=8, rows_per_band=4, max_bucket=10, strict=True
        ).count()


def test_driver_testdata_lsh_recall_is_exactly_one(spark):
    """Pins the fact the d_minhash/e_near_dup EXACT oracles rely on, on the
    driver corpus itself: seeded LSH retrieval is deterministic for fixed
    data, and on this data it retrieves the complete exact pair set —
    including the ~25 NATURAL near-dup pairs in [0.9, 1) the corpus
    contains. If the corpus is regenerated and recall drops, this fails
    before the driver's oracle comparison does."""
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not present")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    exact = {
        (r["a"], r["b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert len(exact) >= 20  # the corpus really has natural near-dups
    got = {
        (r["a"], r["b"])
        for r in dedup.minhash_dedup_pairs(
            docs, threshold=0.9, num_hashes=64, bands=16
        ).collect()
    }
    assert got == exact  # recall 1.0 AND precision 1.0 (verify stage)

    # embeddings: no natural pair reaches the 0.9999 threshold, so the
    # only oracle pairs are constructed duplicates (identical sign buckets)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select("vec_id", "embedding")
    assert dedup.embedding_near_dup_pairs(emb, threshold=0.9999).count() == 0


def test_stateful_sessions_applyinpandaswithstate(spark, tmp_path):
    """Custom stateful operator: sessions close (a) when a later event of
    the same user arrives beyond the gap, (b) when the event-time
    watermark passes session_end + gap (timeout); open sessions stay in
    state and are NOT emitted."""
    from webgraph import streaming as st

    src = str(tmp_path / "ev_in")
    out = str(tmp_path / "ev_out")
    ck = str(tmp_path / "ev_ck")
    ev = spark.createDataFrame(
        [
            (1, "2026-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2026-01-01 10:05:00", 1, "click", 2.0, "{}"),
            (3, "2026-01-01 12:00:00", 1, "click", 4.0, "{}"),
            # watermark sentinel: pushes the event-time watermark to 22:50
            (4, "2026-01-01 23:00:00", 99, "view", 0.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # one part file -> one micro-batch: with several files the source may
    # batch the 23:00 sentinel FIRST (mtime order), advancing the watermark
    # past the 10:05/12:00 events, which then get dropped as late
    ev.coalesce(1).write.parquet(src)

    stream = st.read_event_stream(spark, src)
    sessions = st.stateful_sessions(stream, gap="30 minutes", watermark="10 minutes")
    st.run_to_append_sink(sessions, out, ck)
    got = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    # session 1 closed by the 12:00 event (gap split); session 2 closed by
    # the watermark timeout; user 99's session is still open -> absent
    assert got == {
        (1, "2026-01-01 10:00:00"): (2, 3.0),
        (1, "2026-01-01 12:00:00"): (1, 4.0),
    }


def test_sample_to_token_budget(spark):
    """Budget prefix semantics vs a python oracle: seeded order, running
    token sum, cut at the budget — exact, deterministic, repartition-proof."""
    rows = [(i, " ".join(f"w{j}" for j in range(5 + i % 7))) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    A, P, seed = 2_654_435_761, 1_000_000_007, 42
    order = sorted(range(200), key=lambda i: (((i % P) * A + seed) % P, i))
    toks = {i: 5 + i % 7 for i in range(200)}
    want, cum = [], 0
    for i in order:
        cum += toks[i]
        if cum > 300:
            break
        want.append((i, toks[i], cum))

    for parts in (2, 7):  # result must not depend on partitioning
        got = [
            (r["doc_id"], r["n_tokens"], r["cum_tokens"])
            for r in text.sample_to_token_budget(
                docs, 300, partitions=parts
            ).orderBy("cum_tokens").collect()
        ]
        assert got == want


def test_deterministic_split_is_stable_and_partition_independent(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    out = text.deterministic_split(df)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    # re-run under a different partitioning: identical assignment
    got2 = {
        r["doc_id"]: r["split"]
        for r in text.deterministic_split(df.repartition(7)).collect()
    }
    assert got == got2
    from collections import Counter

    hist = Counter(got.values())
    assert set(hist) == {"train", "valid", "test"}
    # hash-bucket proportions: within a few points of 80/10/10 at n=2000
    assert abs(hist["train"] / 2000 - 0.80) < 0.05
    assert abs(hist["valid"] / 2000 - 0.10) < 0.03
    assert abs(hist["test"] / 2000 - 0.10) < 0.03

    # custom splits + validation
    two = text.deterministic_split(df, splits={"a": 50, "b": 50})
    assert set(r["split"] for r in two.collect()) == {"a", "b"}
    with pytest.raises(ValueError, match="sum to 100"):
        text.deterministic_split(df, splits={"a": 60, "b": 60})


def test_top_tokens_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(0, "b a  a"), (1, " B c\tA"), (2, "")],
        "doc_id long, text string",
    )
    out = [(r["token"], r["n"]) for r in text.top_tokens(df, k=10).collect()]
    # 'a' x3, 'b' x2, 'c' x1; lowercased; empty tokens dropped;
    # ties impossible between equal counts -> lexicographic order
    assert out == [("a", 3), ("b", 2), ("c", 1)]
    assert [r["token"] for r in text.top_tokens(df, k=2).collect()] == ["a", "b"]
    assert [(r["token"], r["n"]) for r in text.top_tokens(df, k=10, min_count=2).collect()] == [
        ("a", 3), ("b", 2)
    ]


def test_cms_estimates_upper_bound_and_merge(spark):
    from webgraph import sketches

    docs = spark.createDataFrame(
        [(i, "alpha beta " + ("gamma " * (i % 3))) for i in range(60)],
        "doc_id long, text string",
    )
    sk = sketches.cms_build(docs, width=64, depth=3)
    # sketch never exceeds depth*width cells; total mass == token count
    assert sk.count() <= 3 * 64
    n_tokens = sk.filter(F.col("row") == 0).agg(F.sum("cnt")).first()[0]

    q = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("absent",)], "token string"
    )
    est = {
        r["token"]: r["est"]
        for r in sketches.cms_estimate(sk, q, width=64, depth=3).collect()
    }
    true = {"alpha": 60, "beta": 60, "gamma": 60, "absent": 0}
    for tok, t in true.items():
        assert est[tok] >= t  # count-min never underestimates
        assert est[tok] <= n_tokens

    # mergeability: sketch(a) + sketch(b) == sketch(a union b), cell-wise
    a, b = docs.filter(F.col("doc_id") < 30), docs.filter(F.col("doc_id") >= 30)
    merged = sketches.cms_merge(
        sketches.cms_build(a, width=64, depth=3),
        sketches.cms_build(b, width=64, depth=3),
    )
    whole = sketches.cms_build(docs, width=64, depth=3)
    assert {
        (r["row"], r["bucket"]): r["cnt"] for r in merged.collect()
    } == {(r["row"], r["bucket"]): r["cnt"] for r in whole.collect()}


def test_stream_distinct_keys_dedups_across_microbatches(spark, tmp_path):
    from webgraph.streaming import run_to_append_sink, stream_distinct_keys

    src = tmp_path / "in"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    rows1 = [(1, "2026-01-01 00:00:00", 1, "click"), (2, "2026-01-01 00:01:00", 1, "view")]
    rows2 = [(3, "2026-01-01 00:02:00", 1, "click"), (4, "2026-01-01 00:03:00", 2, "click")]
    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(
            [(e, None, u, t) for e, _, u, t in rows], schema
        ).withColumn("ts", F.lit(rows[0][1]).cast("timestamp")).coalesce(1).write.parquet(
            str(src / f"batch{i}")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # forces >= 2 micro-batches
        .parquet(str(src / "batch*"))
    )
    deduped = stream_distinct_keys(stream, ["user_id", "event_type"])
    run_to_append_sink(deduped, str(tmp_path / "out"), str(tmp_path / "ck"))
    got = {
        (r["user_id"], r["event_type"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # (1, click) appears in BOTH batches; state dedups it across batches
    assert got == {(1, "click"), (1, "view"), (2, "click")}


def test_tfidf_top_terms(spark):
    import math

    df = spark.createDataFrame(
        [
            (0, "apple apple banana common"),
            (1, "banana cherry common common"),
            (2, "cherry common date date date"),
        ],
        "doc_id long, text string",
    )
    out = text.tfidf_top_terms(df, k=2)
    rows = {(r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf_e6"]) for r in out.collect()}
    # doc 0: apple tf=2 df=1 -> 2*ln(3) tops; banana tf=1 df=2 second
    assert rows[(0, "apple")] == (2, 1, round(2 * math.log(3.0) * 1e6))
    assert rows[(0, "banana")][2] == round(math.log(3.0 / 2.0) * 1e6)
    # 'common' has df=3 -> idf 0 -> never in any top-2 over real terms
    assert not any(t == "common" for (_, t) in rows)
    # exactly k rows per doc
    from collections import Counter

    per_doc = Counter(d for (d, _) in rows)
    assert all(v == 2 for v in per_doc.values())


def test_stream_distinct_keys_watermark_bounded_mode(spark, tmp_path):
    """The bounded-state variant (dropDuplicatesWithinWatermark): dedups
    redeliveries arriving within the delay; emitted key set over this
    single-drain input equals the batch DISTINCT."""
    from webgraph.streaming import run_to_append_sink, stream_distinct_keys

    src = tmp_path / "in"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    rows = [
        (1, "2026-01-01 10:00:00", 1, "click"),
        (2, "2026-01-01 10:00:30", 1, "click"),  # redelivery inside delay
        (3, "2026-01-01 10:01:00", 2, "view"),
        (4, "2026-01-01 12:00:00", 1, "click"),  # far later: state evicted
    ]
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.parquet(
        str(src / "b0")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    deduped = stream_distinct_keys(
        stream, ["user_id", "event_type"], watermark=("ts", "10 minutes")
    )
    run_to_append_sink(deduped, str(tmp_path / "out"), str(tmp_path / "ck"))
    got = sorted(
        (r["user_id"], r["event_type"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    # one emission per key within the watermark horizon of this drain
    assert got == [(1, "click"), (2, "view")]
