"""Round-4 hardening: batched multi-pivot Brandes sweeps, Brandes
source-row exclusion, streaming-CMS crash-atomic state, as-of join
reserved-column guard, resumable SALSA/walks.

Oracle style follows the suite convention: tiny hand-checkable fixtures
with exact expected values, plus structural pins (job counts, plan
seams) for the scale properties that values alone can't witness.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webgraph.algos.common import from_int_edges


def _graph(spark, edges):
    return from_int_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )


# -------------------------------------------- batched multi-pivot Brandes --

DIAMOND = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 5), (4, 0)]


def test_multi_path_counts_equals_per_root_singles(spark):
    from webgraph.algos.bfs import bfs_path_counts, multi_path_counts

    g = _graph(spark, DIAMOND)
    roots = [0, 4, 3]
    batched = {
        (r["root"], r["vid"]): (r["depth"], r["sigma"])
        for r in multi_path_counts(g, roots, max_depth=4).collect()
    }
    for s in roots:
        single = {
            (s, r["vid"]): (r["depth"], r["sigma"])
            for r in bfs_path_counts(g, s, max_depth=4).collect()
        }
        assert single == {k: v for k, v in batched.items() if k[0] == s}


def test_multi_betweenness_equals_per_root_singles(spark):
    from webgraph.algos.bfs import (
        betweenness_contributions,
        multi_betweenness_contributions,
    )

    g = _graph(spark, DIAMOND)
    roots = [0, 4]
    batched = {
        (r["root"], r["vid"]): (r["depth"], r["sigma"], r["delta"])
        for r in multi_betweenness_contributions(g, roots, max_depth=4).collect()
    }
    for s in roots:
        single = {
            (s, r["vid"]): (r["depth"], r["sigma"], r["delta"])
            for r in betweenness_contributions(g, s, max_depth=4).collect()
        }
        assert single == {k: v for k, v in batched.items() if k[0] == s}


def test_approximate_betweenness_excludes_source_rows(spark):
    # Brandes: C_B[w] += delta_s[w] only for w != s. On the plain diamond
    # with pivots {0}, vertex 0's own sweep delta (3.0) must NOT appear;
    # with pivots {0, 1}, vertex 1 gets only pivot-0's contribution (0.5),
    # not its own depth-0 delta.
    from webgraph.algos.bfs import approximate_betweenness

    g = _graph(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    one = {r["vid"]: r["betweenness"]
           for r in approximate_betweenness(g, [0], max_depth=3).collect()}
    assert 0 not in one  # source row excluded, 0 unreached otherwise
    assert one[1] == 0.5 and one[2] == 0.5 and one[3] == 0.0

    two = {r["vid"]: r["betweenness"]
           for r in approximate_betweenness(g, [0, 1], max_depth=3).collect()}
    assert two[1] == 0.5  # from pivot 0 only; own sweep's source row dropped
    assert two[3] == 0.0


def test_pivot_sweep_job_count_independent_of_pivot_count(spark):
    # The scale pin for the batched sweep: K pivots advance through ONE
    # edges-join per level, so the number of Spark jobs (driver round
    # trips) must not grow with K. Measured via job groups; small slack
    # absorbs AQE re-planning jobs.
    from webgraph.algos.bfs import approximate_betweenness

    sc = spark.sparkContext
    g = _graph(spark, DIAMOND)

    def jobs_for(pivots, group):
        sc.setJobGroup(group, group)
        approximate_betweenness(g, pivots, max_depth=3).collect()
        sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    # pivots 0/1/2 all have eccentricity <= pivot 0's, so the batched run
    # adds NO levels — any job growth would be per-pivot serialization
    j1 = jobs_for([0], "btw-k1")
    j3 = jobs_for([0, 1, 2], "btw-k3")
    assert j3 <= j1 + 4, f"batched sweep regressed: {j1} jobs for 1 pivot, {j3} for 3"


def test_harmonic_centrality_batched_matches_expected(spark):
    from webgraph.algos.bfs import harmonic_centrality

    # chain 0->1->2->3: from 0, depths 1,2,3 -> 1e6 + 5e5 + 333333
    g = _graph(spark, [(0, 1), (1, 2), (2, 3)])
    rows = {r["vid"]: r for r in harmonic_centrality(g, [0, 3], 3).collect()}
    assert rows[0]["n_reached"] == 3
    assert rows[0]["harmonic_e6"] == 1_000_000 + 500_000 + 333_333
    assert rows[3]["n_reached"] == 0 and rows[3]["harmonic_e6"] == 0


# ------------------------------------------ streaming CMS crash atomicity --


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _drain_cms(spark, tmp_path, ck, width=64, depth=2):
    from webgraph.streaming import streaming_cms

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    streaming_cms(
        spark, stream, str(tmp_path / "state"), str(tmp_path / ck),
        width=width, depth=depth,
    )


def test_streaming_cms_partial_version_is_invisible(spark, tmp_path):
    # A crash mid-write leaves a version dir without _SUCCESS; readers and
    # the replay watermark must both ignore it.
    from webgraph.streaming import read_cms_state

    _docs(spark, [(i, "alpha beta") for i in range(8)]).repartition(2).write.parquet(
        str(tmp_path / "in")
    )
    _drain_cms(spark, tmp_path, "ck1")
    committed = sorted(map(tuple, read_cms_state(spark, str(tmp_path / "state"))
                           .collect()))
    # fake a crashed attempt at a FUTURE version: partial dir, no _SUCCESS
    partial = tmp_path / "state" / "v=999"
    partial.mkdir()
    (partial / "part-00000.parquet").write_bytes(b"torn write")
    after = sorted(map(tuple, read_cms_state(spark, str(tmp_path / "state"))
                       .collect()))
    assert after == committed


def test_streaming_cms_old_state_survives_until_new_commit(spark, tmp_path):
    # The delete-then-overwrite window of the old layout is gone: after a
    # drain, the committed version dir still exists on disk alongside (and
    # ignoring) any partial; pruning only removes SUPERSEDED versions.
    import os

    from webgraph.streaming import _latest_cms_version

    _docs(spark, [(i, "tok%d common" % i) for i in range(6)]).repartition(
        3
    ).write.parquet(str(tmp_path / "in"))
    _drain_cms(spark, tmp_path, "ck1")
    state = str(tmp_path / "state")
    v = _latest_cms_version(state)
    assert v is not None
    versions = [n for n in os.listdir(state) if n.startswith("v=")]
    assert versions == [f"v={v}"]  # superseded versions pruned post-commit
    assert os.path.isfile(os.path.join(state, f"v={v}", "_SUCCESS"))


def test_streaming_cms_empty_batches_leave_no_placeholder_cells(spark, tmp_path):
    # An empty micro-batch used to inject a (0, 0, 0) cell that survived
    # every later merge; now empty batches commit a schema-only version.
    from webgraph.streaming import read_cms_state

    _docs(spark, []).coalesce(1).write.parquet(str(tmp_path / "in"))
    _drain_cms(spark, tmp_path, "ck1")
    out = read_cms_state(spark, str(tmp_path / "state"))
    assert out.columns == ["row", "bucket", "cnt"]
    assert out.count() == 0


# ----------------------------------------- as-of join reserved-col guard --


def test_as_of_join_rejects_reserved_and_clashing_columns(spark):
    from webgraph.asof import as_of_join

    states = spark.createDataFrame(
        [(1, 10, "basic")], "uid long, ts long, plan string"
    )
    bad_facts = spark.createDataFrame(
        [(1, 12, 0)], "uid long, ts long, _is_state int"
    )
    with pytest.raises(ValueError, match="_is_state"):
        as_of_join(bad_facts, states, "uid", "ts", "ts", "plan")

    clash_facts = spark.createDataFrame(
        [(1, 12, "x")], "uid long, ts long, last_plan string"
    )
    with pytest.raises(ValueError, match="last_plan"):
        as_of_join(clash_facts, states, "uid", "ts", "ts", "plan")

    ok = spark.createDataFrame([(1, 12)], "uid long, ts long")
    rows = as_of_join(ok, states, "uid", "ts", "ts", "plan").collect()
    assert rows[0]["last_plan"] == "basic"


# ------------------------------------------- SALSA / walks resumability --

RING = [(i, (i + 1) % 8) for i in range(8)] + [(0, 4), (5, 2), (6, 1)]


def test_salsa_checkpoint_resume_bit_identical(spark, tmp_path):
    from webgraph.algos.salsa import salsa

    g = _graph(spark, RING)
    full, _ = salsa(g, max_iter=5)
    want = {r["vid"]: (r["hub"], r["auth"]) for r in full.collect()}

    d = str(tmp_path / "ck")
    salsa(g, max_iter=2, checkpoint_dir=d)  # "crash" after iteration 1
    resumed, metrics = salsa(g, max_iter=5, checkpoint_dir=d, resume=True)
    got = {r["vid"]: (r["hub"], r["auth"]) for r in resumed.collect()}
    assert got == want  # bit-identical, not just allclose
    assert metrics[0]["iteration"] == 2  # resumed, not restarted

    from webgraph.checkpoint import CheckpointManager

    entries = CheckpointManager(d, "salsa").entries()
    assert [e["iteration"] for e in entries] == list(range(5))
    assert all("messages" in e["metrics"] for e in entries)


def test_walks_checkpoint_resume_bit_identical(spark, tmp_path):
    from webgraph.algos.walks import deterministic_walks

    g = _graph(spark, RING + [(3, 7)])
    want = sorted(
        map(tuple, deterministic_walks(g, walk_len=4, seed=7).collect())
    )

    d = str(tmp_path / "ck")
    deterministic_walks(g, walk_len=2, seed=7, checkpoint_dir=d)  # "crash"
    resumed = deterministic_walks(
        g, walk_len=4, seed=7, checkpoint_dir=d, resume=True
    )
    assert sorted(map(tuple, resumed.collect())) == want

    from webgraph.checkpoint import CheckpointManager

    entries = CheckpointManager(d, "walks").entries()
    assert [e["iteration"] for e in entries] == [1, 2, 3, 4]


# --------------------------------------------- multimodal codec seam --


def test_injected_image_decoder_runs_through_arrow_path(spark):
    # The slot-in claim made concrete: a "real" decoder with the seam
    # signature runs through the SAME mapInPandas batch function and
    # produces its values in the output schema.
    from webgraph.multimodal import decode_images, synthetic_assets

    def real_decoder(data, embed_dim):
        return len(data) % 100, 42, 1, [float(len(data))] * embed_dim

    assets = synthetic_assets(spark, n=12)
    out = {r["asset_id"]: r
           for r in decode_images(assets, embed_dim=4, decoder=real_decoder).collect()}
    assert out  # image/* rows survived the filter
    for r in out.values():
        assert r["height"] == 42 and r["channels"] == 1
        assert len(r["embedding"]) == 4
        assert int(r["embedding"][0]) % 100 == r["width"]  # decoder's values
        assert len(r["sha256"]) == 64  # hashing stays in the shared path
    # schema identical to the stub path
    stub_cols = decode_images(assets).columns
    assert decode_images(assets, decoder=real_decoder).columns == stub_cols


def test_injected_frame_sampler_one_to_many(spark):
    from webgraph.multimodal import sample_video_frames, synthetic_assets

    def real_sampler(data, every_ms, max_frames):
        return [(i, i * every_ms, "f" * 64) for i in range(3)]  # always 3 frames

    assets = synthetic_assets(spark, n=12)
    out = sample_video_frames(assets, every_ms=500, sampler=real_sampler)
    rows = out.collect()
    n_videos = assets.filter("mime like 'video/%'").count()
    assert len(rows) == 3 * n_videos  # one-to-many expansion preserved
    assert {r["ts_ms"] for r in rows} == {0, 500, 1000}
    assert out.columns == sample_video_frames(assets).columns
