"""Round-5q: SimHash banding recall certification and the streaming
fixed-range histogram sketch. House style: the pigeonhole guarantee
pinned as a property, drained-equals-batch mergeability, crash
atomicity mirrored from the CMS suite, hand-computable readouts; the
shuffled determinism is the contract rows' job (d_simhash_recall /
s_stream_quantiles, exact DuckDB replay)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# --------------------------------------------- simhash banding recall --


def test_simhash_banding_pigeonhole_guarantee(spark):
    """With 8 bands of 8 bits, EVERY pair at hamming < 8 shares a chunk:
    the candidate stage (hamming cap lifted) must contain every such
    pair — the deterministic half of the recall curve d_simhash_recall
    publishes."""
    from webgraph.dedup import simhash, simhash_near_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta tok{i % 5} tok{i % 3} epsilon zeta")
         for i in range(24)],
        "doc_id long, text string",
    )
    sigs = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    cand = {
        (r["a"], r["b"])
        for r in simhash_near_pairs(simhash(docs), max_hamming=64, bands=8)
        .select("a", "b")
        .collect()
    }
    ids = sorted(sigs)
    missed = [
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") < 8 and (a, b) not in cand
    ]
    assert missed == []


# ------------------------------------------- streaming histogram sketch --


def _events(spark, values):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)],
        "event_id long, value double",
    )


def _drain_hist(spark, tmp_path, ck, **kw):
    from webgraph.streaming import streaming_histogram

    stream = (
        spark.readStream.schema("event_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    streaming_histogram(
        spark, stream, str(tmp_path / "state"), str(tmp_path / ck), **kw
    )


def test_streaming_histogram_drained_equals_batch(spark, tmp_path):
    """Disjoint-batch histograms merge losslessly: the drained 3-batch
    state equals one batch histogram over all the data."""
    from webgraph.streaming import read_hist_state

    vals = [1.0, 5.0, 5.5, 9.9, 2.5, 7.5, 5.0, 0.0]
    _events(spark, vals).repartition(3).write.parquet(str(tmp_path / "in"))
    _drain_hist(spark, tmp_path, "ck1", lo=0.0, hi=10.0, bins=10)
    got = {
        r["bin"]: r["cnt"]
        for r in read_hist_state(spark, str(tmp_path / "state")).collect()
    }
    want = {}
    for v in vals:
        b = min(int(v / 10.0 * 10), 9)
        want[b] = want.get(b, 0) + 1
    assert got == want


def test_streaming_histogram_clamps_out_of_range(spark, tmp_path):
    from webgraph.streaming import read_hist_state

    _events(spark, [-3.0, 0.5, 12.0, 99.0]).coalesce(1).write.parquet(
        str(tmp_path / "in")
    )
    _drain_hist(spark, tmp_path, "ck1", lo=0.0, hi=10.0, bins=10)
    got = {
        r["bin"]: r["cnt"]
        for r in read_hist_state(spark, str(tmp_path / "state")).collect()
    }
    assert got == {0: 2, 9: 2}  # -3 clamps to bin 0; 12 and 99 to bin 9


def test_streaming_histogram_partial_version_is_invisible(spark, tmp_path):
    from webgraph.streaming import read_hist_state

    _events(spark, [1.0, 2.0, 3.0]).repartition(2).write.parquet(
        str(tmp_path / "in")
    )
    _drain_hist(spark, tmp_path, "ck1", lo=0.0, hi=10.0, bins=10)
    committed = sorted(
        map(tuple, read_hist_state(spark, str(tmp_path / "state")).collect())
    )
    partial = tmp_path / "state" / "v=999"
    partial.mkdir()
    (partial / "part-00000.parquet").write_bytes(b"torn write")
    after = sorted(
        map(tuple, read_hist_state(spark, str(tmp_path / "state")).collect())
    )
    assert after == committed


def test_streaming_histogram_guards(spark, tmp_path):
    from webgraph.streaming import streaming_histogram

    with pytest.raises(ValueError, match="hi > lo"):
        streaming_histogram(spark, None, "x", "y", lo=5.0, hi=5.0)
    with pytest.raises(ValueError, match="bins"):
        streaming_histogram(spark, None, "x", "y", bins=0)


def test_hist_quantile_readout_hand_computed(spark):
    """10 values one per bin 0..9 over [0, 10): the q-th percentile bin
    is ceil(q/10)-1, lower edge = bin index."""
    from webgraph.sketches import hist_quantile_readout

    hist = spark.createDataFrame(
        [(b, 1) for b in range(10)], "bin long, cnt long"
    )
    got = {
        r["q_pct"]: r["est_e6"]
        for r in hist_quantile_readout(
            hist, 0.0, 10.0, 10, quantiles=(10, 25, 50, 99, 100)
        ).collect()
    }
    assert got == {
        10: 0,
        25: 2_000_000,
        50: 4_000_000,
        99: 9_000_000,
        100: 9_000_000,
    }
