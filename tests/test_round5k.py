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


# ------------------------------------------------------------ CDC merge --


def _drain_cdc(spark, tmp, rows, name, n_buckets=4):
    from webgraph.streaming import cdc_apply

    base = str(tmp / name)
    df = spark.createDataFrame(rows, "key long, seq long, op string, val long")
    df.coalesce(1).write.parquet(f"{base}/in")
    stream = (
        spark.readStream.schema("key long, seq long, op string, val long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
    )
    cdc_apply(
        spark, stream, f"{base}/state", f"{base}/ck", n_buckets=n_buckets
    ).awaitTermination()
    return base


def test_cdc_upsert_delete_tombstone(spark, tmp_path):
    from webgraph.streaming import read_cdc_state

    rows = [
        (1, 10, "U", 100), (1, 20, "U", 101),        # key 1: final val 101
        (2, 11, "U", 200), (2, 30, "D", 0),          # key 2: deleted
        (3, 12, "U", 300),                           # key 3: untouched
        (2, 25, "U", 250),                           # older than the delete
    ]
    base = _drain_cdc(spark, tmp_path, rows, "basic")
    snap = _rows(read_cdc_state(spark, f"{base}/state"), "key", "seq", "val")
    assert snap == [(1, 20, 101), (3, 12, 300)]
    # the tombstone is IN state (so no lower-seq change can resurrect it)
    with_t = _rows(
        read_cdc_state(spark, f"{base}/state", include_tombstones=True), "key", "seq"
    )
    assert (2, 30) in with_t


def test_cdc_split_invariance_and_time_travel(spark, tmp_path):
    """The drained snapshot must not depend on the micro-batch split, and
    every committed snapshot must stay readable as-of its batch id."""
    from webgraph.streaming import cdc_apply, read_cdc_state

    rows = [(k, s, "U", k * 1000 + s) for k in range(5) for s in (1, 2, 3)]
    base = str(tmp_path / "split")
    df = spark.createDataFrame(rows, "key long, seq long, op string, val long")
    df.repartition(5).write.parquet(f"{base}/in")  # 5 arbitrary-split files
    stream = (
        spark.readStream.schema("key long, seq long, op string, val long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
    )
    cdc_apply(spark, stream, f"{base}/state", f"{base}/ck").awaitTermination()
    snap = _rows(read_cdc_state(spark, f"{base}/state"), "key", "seq", "val")
    assert snap == [(k, 3, k * 1000 + 3) for k in range(5)]
    # time travel: as-of the first commit the table held only batch 0's rows
    early = read_cdc_state(spark, f"{base}/state", as_of=0)
    assert 0 < early.count() <= 15


def test_cdc_replay_skip_and_touched_buckets_only(spark, tmp_path):
    """A replayed batch id is a no-op (exactly-once), and a commit rewrites
    only the buckets its keys hash into — the copy-on-write cost model."""
    import os

    from webgraph.streaming import _cdc_snapshots, read_cdc_state

    rows = [(1, 1, "U", 10), (2, 1, "U", 20), (3, 1, "U", 30), (4, 1, "U", 40)]
    base = _drain_cdc(spark, tmp_path, rows, "replay", n_buckets=4)
    snaps = _cdc_snapshots(f"{base}/state")
    assert [s["snapshot"] for s in snaps] == [0]
    # a second WRITER (fresh checkpoint, so its Spark batch ids restart at
    # 0) must append a new snapshot, not collide with the first writer's
    # batch 0; the new snapshot keeps every untouched bucket at version 0
    df2 = spark.createDataFrame([(1, 2, "U", 11)], "key long, seq long, op string, val long")
    df2.coalesce(1).write.parquet(f"{base}/in2")
    stream2 = (
        spark.readStream.schema("key long, seq long, op string, val long")
        .parquet(f"{base}/in2")
    )
    from webgraph.streaming import cdc_apply

    cdc_apply(spark, stream2, f"{base}/state", f"{base}/ck2").awaitTermination()
    snaps = _cdc_snapshots(f"{base}/state")
    assert len(snaps) == 2
    versions = set(snaps[-1]["buckets"].values())
    assert versions == {0, snaps[-1]["snapshot"]}  # untouched buckets kept
    snap = dict(
        (r[0], r[2]) for r in _rows(read_cdc_state(spark, f"{base}/state"), "key", "seq", "val")
    )
    assert snap[1] == 11 and snap[2] == 20
    # replaying a committed batch id leaves the manifest unchanged
    n_lines = len(snaps)
    from webgraph.streaming import cdc_apply as _ca  # same checkpoint -> no new batch

    stream3 = (
        spark.readStream.schema("key long, seq long, op string, val long")
        .parquet(f"{base}/in2")
    )
    _ca(spark, stream3, f"{base}/state", f"{base}/ck2").awaitTermination()
    assert len(_cdc_snapshots(f"{base}/state")) == n_lines


# ----------------------------------------------------------- record peaks --


def test_record_peaks_cross_batch_state(spark, tmp_path):
    """A later batch's smaller value must NOT be a record (state carries
    the max across batches); a new high must."""
    import os

    from webgraph.streaming import record_peaks, run_to_append_sink

    base = str(tmp_path / "peaks")
    os.makedirs(f"{base}/in")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    w0 = [(1, "2024-01-01 00:00:01", 7, "x", 5.0, ""),
          (2, "2024-01-01 00:00:02", 7, "x", 9.0, "")]
    w1 = [(3, "2024-01-01 00:00:03", 7, "x", 8.0, ""),   # below the max: no
          (4, "2024-01-01 00:00:04", 7, "x", 9.0, ""),   # tie: strict, no
          (5, "2024-01-01 00:00:05", 7, "x", 9.5, "")]   # new record
    for i, rows in enumerate([w0, w1]):
        df = spark.createDataFrame(
            [(e, __import__("datetime").datetime.fromisoformat(t), u, et, v, p)
             for e, t, u, et, v, p in rows],
            schema,
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{base}/w{i}")
        import glob, shutil
        part = glob.glob(f"{base}/w{i}/part-*.parquet")[0]
        dst = f"{base}/in/wave{i}.parquet"
        shutil.copyfile(part, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
    )
    run_to_append_sink(record_peaks(stream), f"{base}/out", f"{base}/ck")
    got = sorted(
        (r["event_id"], r["value"]) for r in spark.read.parquet(f"{base}/out").collect()
    )
    assert got == [(1, 5.0), (2, 9.0), (5, 9.5)]


# ---------------------------------------------------- configuration model --


def test_configuration_model_preserves_degrees(spark):
    from webgraph.generators import configuration_model

    edges = spark.createDataFrame(
        [(a, b) for a in range(12) for b in range(12) if (a * 7 + b) % 5 == 0 and a != b],
        "src long, dst long",
    )
    rw = configuration_model(edges)
    assert rw.count() == edges.count()

    def degs(df, col):
        return dict((r[0], r[1]) for r in df.groupBy(col).count().collect())

    assert degs(rw, "src") == degs(edges, "src")
    assert degs(rw, "dst") == degs(edges, "dst")
    # a 29-edge graph rewired under independent permutations must move
    # SOME edge (probability of identity wiring is astronomically small)
    orig = set((r[0], r[1]) for r in edges.collect())
    got = [(r[0], r[1]) for r in rw.collect()]
    assert any(p not in orig for p in got)


def test_configuration_model_partition_invariant(spark):
    from webgraph.generators import configuration_model

    edges = spark.createDataFrame(
        [(i % 9, (i * i + 3) % 9) for i in range(40)], "src long, dst long"
    ).distinct()
    a = sorted(map(tuple, configuration_model(edges.coalesce(1)).collect()))
    b = sorted(map(tuple, configuration_model(edges.repartition(8)).collect()))
    assert a == b


# --------------------------------------------------------------- readability --


def test_readability_known_values(spark):
    from webgraph.text import readability_stats

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran."),   # 6 words, 2 sentences, 6 syllable-runs
            (2, ""),                              # empty -> NULL score, 'empty'
            (3, "a"),                             # 1 word, floor 1 sentence
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in readability_stats(docs).collect()}
    assert got[1]["n_words"] == 6 and got[1]["n_sentences"] == 2
    assert got[1]["n_syllables"] == 6
    # 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert got[1]["flesch_e4"] == 1191900 and got[1]["band"] == "very_easy"
    assert got[2]["flesch_e4"] is None and got[2]["band"] == "empty"
    assert got[3]["n_sentences"] == 1 and got[3]["band"] == "very_easy"


# --------------------------------------------------------------- API surface --


def test_api_surface_counts_and_sharing(spark):
    from webgraph.code import api_surface

    files = spark.createDataFrame(
        [
            ("r1", "def alpha(x):\n  pass\ndef beta():\n  pass\nclass Gamma:\n  pass"),
            ("r1", "def alpha(y):\n  return y"),          # alpha again: distinct once
            ("r2", "def alpha():\n  pass"),                # shares alpha with r1
            ("r3", "x = 1  # no decls; 'def inline' not at line start"),
        ],
        "repo string, content string",
    )
    got = {r["repo"]: r.asDict() for r in api_surface(files).collect()}
    assert got["r1"]["n_defs"] == 3 and got["r1"]["n_classes"] == 1
    assert got["r1"]["n_symbols"] == 3          # alpha, beta, Gamma
    assert got["r1"]["n_shared"] == 1           # alpha only
    assert got["r2"]["n_shared"] == 1 and got["r2"]["n_symbols"] == 1
    assert "r3" not in got                      # no declarations at all


# ------------------------------------------------------------- int8 SQ --


def test_sq_quantize_codes_and_recall_bounds(spark):
    from webgraph.similarity import sq_quantize, sq_recall

    emb = spark.createDataFrame(
        [(i, [float(i), 10.0 - i, 5.0]) for i in range(11)],
        "vec_id long, embedding array<double>",
    )
    quant, params = sq_quantize(emb)
    assert params == [(0.0, 10.0), (0.0, 10.0), (5.0, 5.0)]
    codes = {r["vec_id"]: r["qvec"] for r in quant.collect()}
    assert codes[0] == [0, 255, 0]          # min -> 0, max -> 255, const dim -> 0
    assert codes[10] == [255, 0, 0]
    assert codes[4] == [102, 153, 0]        # round(4*25.5) = 102
    rec = sq_recall(emb, n_queries=2, k=3).collect()
    assert len(rec) == 2
    for r in rec:
        assert 0 <= r["n_hits"] <= 3 and r["recall_e6"] == round(r["n_hits"] * 1e6 / 3)


# ---------------------------------------------------- portable MinHash --


def test_portable_minhash_identical_docs_collide_everywhere(spark):
    from webgraph.dedup import (
        minhash_band_keys_portable,
        minhash_signatures_portable,
        pairs_from_buckets,
        shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),   # identical
            (3, "completely different words appear in this text here"),
        ],
        "doc_id long, text string",
    )
    sh = shingles(docs)
    sigs = minhash_signatures_portable(sh, num_hashes=8)
    by_id = {r["id"]: r["sig"] for r in sigs.collect()}
    assert by_id[1] == by_id[2] != by_id[3]
    assert all(0 <= h < 1_000_000_007 for h in by_id[1])
    bk = minhash_band_keys_portable(sigs, bands=2, rows_per_band=4)
    pairs = sorted(map(tuple, pairs_from_buckets(bk).collect()))
    assert (1, 2) in pairs and (1, 3) not in pairs
