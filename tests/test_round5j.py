"""Round-5j: code-graph compositions — import-graph PageRank and
dead-module BFS (contract queries c_import_rank / c_dead_modules)."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _expected_module_graph():
    """Closed-form seeded import graph: module m has edges m -> 7m % 50
    and m -> 13m % 50 (self-loops dropped), restricted to modules that
    appear on at least one surviving edge."""
    edges = set()
    for m in range(50):
        for d in (7 * m % 50, 13 * m % 50):
            if d != m:
                edges.add((m, d))
    nodes = {v for e in edges for v in e}
    return nodes, edges


def test_import_rank_covers_graph_and_sums_to_one(spark):
    from webgraph.contract import q_c_import_rank

    nodes, _ = _expected_module_graph()
    rows = q_c_import_rank(spark, SF).collect()
    assert {r["module"] for r in rows} == {f"m{v}" for v in nodes}
    # ranks are a probability vector (e6 units, rounding slack)
    total = sum(r["rank_e6"] for r in rows)
    assert abs(total - 1_000_000) <= len(rows)


def test_dead_modules_match_python_closure(spark):
    from webgraph.contract import (
        DEAD_MODULE_ENTRIES,
        q_c_dead_modules,
    )

    nodes, edges = _expected_module_graph()
    # plain-python BFS closure from the entry modules
    frontier = set(DEAD_MODULE_ENTRIES)
    reached = set(frontier)
    while frontier:
        frontier = {
            d for (s, d) in edges if s in frontier and d not in reached
        }
        reached |= frontier
    rows = q_c_dead_modules(spark, SF).collect()
    assert {r["module"] for r in rows} == {f"m{v}" for v in nodes}
    got_reached = {r["module"] for r in rows if r["reachable"]}
    assert got_reached == {f"m{v}" for v in reached}
    # entry modules sit at depth 0
    for r in rows:
        if r["module"] in {f"m{s}" for s in DEAD_MODULE_ENTRIES}:
            assert r["depth"] == 0


def test_ccnet_buckets_balanced_and_partition_independent(spark):
    from webgraph.text import ccnet_buckets

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = ccnet_buckets(docs, n_buckets=3).collect()
    by = {}
    for r in rows:
        by.setdefault(r["bucket"], set()).add(r["doc_id"])
    # equal-population thirds (within 1 by integer cuts)
    sizes = sorted(len(v) for v in by.values())
    assert set(by) == {"head", "middle", "tail"}
    assert sizes[-1] - sizes[0] <= 1
    # head is the low-perplexity stratum
    ppl = {r["doc_id"]: r["ppl_mnat"] for r in rows}
    assert max(ppl[d] for d in by["head"]) <= min(ppl[d] for d in by["tail"])
    # stratum assignment survives a different physical partitioning
    rows2 = ccnet_buckets(docs.repartition(7), n_buckets=3).collect()
    assert {(r["doc_id"], r["bucket"]) for r in rows2} == {
        (r["doc_id"], r["bucket"]) for r in rows
    }


def test_bpe_tokenize_stats_compresses(spark):
    from webgraph.text import bpe_tokenize_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = bpe_tokenize_stats(docs, n_merges=3).collect()
    assert rows, "corpus has non-empty normalized prefixes"
    assert all(0 < r["n_tokens"] <= r["n_chars"] for r in rows)
    # the learned merges fire somewhere: total symbols strictly shrink
    assert sum(r["n_tokens"] for r in rows) < sum(r["n_chars"] for r in rows)


def test_late_events_drops_and_never_duplicates(spark):
    """The append-mode watermark drain: (a) holds back still-open tail
    windows vs the batch answer, (b) emits every finalized (window,
    type) key exactly once — duplicates would mean late wave-2 rows
    re-created evicted state, i.e. the late filter did NOT drop them."""
    import pyspark.sql.functions as F

    from webgraph.contract import q_s_late_events, load

    res = q_s_late_events(spark, SF).cache()
    keys = res.select("hour_epoch", "event_type")
    assert keys.count() == keys.distinct().count()  # the drop certificate
    batch = (
        load(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
    )
    assert res.count() < batch.count()  # tail windows withheld


def test_audio_energy_injectable_pcm_seam(spark):
    """A 'real' decoder (bytes -> per-byte amplitudes) slots into the
    pcm_fn seam unchanged, and the integer features follow from it."""
    from webgraph.multimodal import audio_energy, synthetic_assets

    assets = synthetic_assets(spark, n=12)

    def byte_pcm(data):
        return [int(b) for b in data[:8]]

    rows = audio_energy(assets, silence_threshold=128, pcm_fn=byte_pcm).collect()
    assert rows  # audio/wav assets exist in the cycle
    for r in rows:
        assert r["n_frames"] == 8
        assert 0 <= r["peak_amp"] <= 255
        assert r["energy"] >= r["peak_amp"] * r["peak_amp"] // 8
        assert 0 <= r["n_silent"] <= 8


def test_audio_energy_stub_matches_python_replay(spark):
    import hashlib

    from webgraph.multimodal import audio_energy, synthetic_assets

    assets = synthetic_assets(spark, n=8)
    rows = {r["asset_id"]: r for r in audio_energy(assets).collect()}
    raw = {r["asset_id"]: (bytes(r["media"]), r["mime"]) for r in assets.collect()}
    for aid, (payload, mime) in raw.items():
        if not mime.startswith("audio/"):
            assert aid not in rows
            continue
        h = hashlib.sha256(payload).hexdigest()
        amps = [int(h[4 * i : 4 * i + 4], 16) for i in range(16)]
        r = rows[aid]
        assert r["peak_amp"] == max(amps)
        assert r["energy"] == sum(a * a for a in amps)


def test_mips_augment_reduces_to_cosine(spark):
    """Neyshabur-Srebro reduction: top-k by raw inner product equals
    top-k by cosine over the augmented corpus (query gets a 0 tail) —
    the certificate that the cosine ANN infrastructure can serve MIPS."""
    import pyspark.sql.functions as F

    from webgraph.similarity import brute_force_topk, mips_augment, mips_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 3).select(
        F.lit(0).alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = mips_topk(emb.filter(F.col("vec_id") != 3), q, k=10).collect()

    aug, big_m = mips_augment(emb.filter(F.col("vec_id") != 3))
    assert big_m > 0
    qa = q.select(
        "q_id",
        F.concat(
            F.transform(F.col("q_vec"), lambda x: x.cast("double")),
            F.array(F.lit(0.0)),
        ).alias("q_vec"),
    )
    via_cos = brute_force_topk(
        aug, qa, k=10, vec_col="aug"
    ).collect()
    assert [r["vec_id"] for r in exact] == [r["vec_id"] for r in via_cos]


def test_snapshot_diff_statuses(spark):
    from webgraph.pipeline import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_zipf_fit_positive_alpha(spark):
    from webgraph.text import zipf_fit

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    r = zipf_fit(docs, top_n=200).collect()[0]
    # top_n is a cap: the sf0.001 vocabulary is smaller than 200
    assert 0 < r["n_points"] <= 200
    assert r["alpha_e6"] > 0  # frequency falls with rank
    assert 0 < r["r2_e6"] <= 1_000_000


def test_attack_shrinks_lcc(spark):
    from webgraph.contract import q_g_attack_lcc

    rows = {r["phase"]: r for r in q_g_attack_lcc(spark, SF).collect()}
    b, a = rows["before"], rows["after"]
    assert a["n_vertices"] < b["n_vertices"]
    assert a["n_edges"] < b["n_edges"]
    assert a["lcc_size"] < b["lcc_size"]
    assert a["lcc_size"] <= a["n_vertices"]


def test_top_pc_maximizes_variance(spark):
    """The power-iterated direction is unit-norm and captures at least
    as much variance as any coordinate axis (the dominant-eigenvector
    property, checked without any linear-algebra library)."""
    import pyspark.sql.functions as F

    from webgraph.similarity import top_principal_component

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    proj, pc = top_principal_component(emb, iters=12)
    assert abs(sum(w * w for w in pc) - 1.0) < 1e-9
    pc_var = proj.agg(F.var_pop("proj").alias("v")).collect()[0]["v"]
    axis_vars = (
        emb.select(F.posexplode(F.col("embedding")).alias("i", "v"))
        .groupBy("i")
        .agg(F.var_pop(F.col("v").cast("double")).alias("v"))
        .agg(F.max("v").alias("m"))
        .collect()[0]["m"]
    )
    assert pc_var >= axis_vars * (1 - 1e-6)


def test_edge_state_time_travel(spark, tmp_path):
    """as_of_batch reads over the append-only manifest: each snapshot is
    exactly the prefix union of committed deltas — the Iceberg
    snapshot-read analog on plain parquet, at zero extra storage."""
    import pyspark.sql.functions as F

    from webgraph.streaming import incremental_edge_merge, read_edge_state

    base = str(tmp_path)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_partkey").cast("long").alias("l_partkey"),
    )
    li.repartition(3).write.parquet(f"{base}/in")
    stream = (
        spark.readStream.schema("l_orderkey long, l_partkey long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
    )

    def extract(batch):
        return batch.select(
            (F.col("l_orderkey") % 100).alias("src"),
            (F.col("l_partkey") % 100).alias("dst"),
        ).distinct()

    q = incremental_edge_merge(
        spark, stream, f"{base}/state", [], f"{base}/ck", extract_fn=extract
    )
    q.awaitTermination()
    latest = read_edge_state(spark, f"{base}/state")
    full = {(r["src"], r["dst"]) for r in latest.collect()}
    prev = set()
    for b in range(3):
        snap = read_edge_state(spark, f"{base}/state", as_of_batch=b)
        got = {(r["src"], r["dst"]) for r in snap.collect()}
        assert prev <= got <= full  # snapshots grow monotonically
        prev = got
    assert prev == full  # as-of the last batch == latest
    # a snapshot strictly before the end is a strict subset (3 batches
    # of distinct lineitem rows always add edges at this scale)
    snap0 = read_edge_state(spark, f"{base}/state", as_of_batch=0)
    assert len({(r["src"], r["dst"]) for r in snap0.collect()}) < len(full)


def test_topological_levels_semantics(spark):
    from webgraph.algos.dag import topological_levels

    # diamond + a long chain: levels are longest paths
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (5, 1)],
        "src long, dst long",
    )
    got = {r["vid"]: r["level"] for r in topological_levels(e).collect()}
    assert got == {0: 0, 5: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_topological_levels_cycle_raises(spark):
    import pytest

    from webgraph.algos.dag import topological_levels

    cyc = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    with pytest.raises(RuntimeError, match="cycle"):
        topological_levels(cyc, max_iter=8)


def test_percolation_sampling_and_monotonicity(spark):
    """The seeded-hash edge sampling hits its keep fraction and the LCC
    degrades monotonically as edges drop. (The dense TPC-H-derived
    graph is far above the percolation threshold, so — unlike a
    scale-free web graph — its giant component survives both levels;
    the AJB random-vs-targeted CONTRAST is a property of the input, not
    of the operator, and is not asserted here.)"""
    from webgraph.contract import q_g_percolation

    base = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        (F.col("l_orderkey") % 500).alias("src"),
        (F.col("l_partkey") % 500).alias("dst"),
    ).distinct().count()
    perc = {r["keep_pct"]: r for r in q_g_percolation(spark, SF).collect()}
    for keep in (60, 30):
        frac = perc[keep]["n_edges"] / base
        assert abs(frac - keep / 100) < 0.05  # hash split is unbiased
    assert perc[30]["n_edges"] < perc[60]["n_edges"]
    assert perc[30]["lcc_size"] <= perc[60]["lcc_size"]
    assert perc[30]["n_vertices"] <= perc[60]["n_vertices"]


def test_landmark_estimate_is_an_upper_bound(spark):
    """Triangle inequality: the landmark estimate can never undershoot
    the exact BFS distance, and is exact at distance 0 (the source)."""
    from webgraph.contract import LM_EVAL_SRC, q_g_landmark_error

    rows = q_g_landmark_error(spark, SF).collect()
    assert rows
    assert all(r["abs_err"] >= 0 for r in rows)
    src = [r for r in rows if r["v"] == LM_EVAL_SRC]
    assert src and src[0]["exact_dist"] == 0


def test_shot_boundaries_segments_runs(spark):
    """Hand-built frame table: hash runs AAB BBC -> shots with the right
    starts and lengths; shots never span assets."""
    from webgraph.multimodal import shot_boundaries

    frames = spark.createDataFrame(
        [
            (1, 0, 0, "A"), (1, 1, 1000, "A"), (1, 2, 2000, "B"),
            (1, 3, 3000, "B"), (1, 4, 4000, "C"),
            (2, 0, 0, "A"),
        ],
        "asset_id long, frame_idx int, ts_ms long, frame_sha256 string",
    )
    got = {
        (r["asset_id"], r["shot_id"]): (r["start_idx"], r["n_frames"])
        for r in shot_boundaries(frames).collect()
    }
    assert got == {
        (1, 0): (0, 2), (1, 1): (2, 2), (1, 2): (4, 1), (2, 0): (0, 1),
    }


def test_import_rank_plan_is_jvm_only(spark):
    """The composition inherits the engine's hot-path rules: no per-row
    Python, no cartesian product in the physical plan."""
    from webgraph.contract import q_c_import_rank

    df = q_c_import_rank(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
