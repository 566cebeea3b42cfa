"""Round-5r: lang-metadata audit (content-derived language vs the lang
column of the input table) and voice-activity segments over the
per-frame amplitude table. House style: hand-computable corpora, the
first-wins tiebreak pinned, gaps-and-islands boundaries exercised; the
shuffled determinism is the contract rows' job (c_lang_mismatch /
m_vad_segments, exact DuckDB replay)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F


# ----------------------------------------------------- lang mismatch --


def _mm(df):
    return sorted(
        (r["doc_id"], r["claimed"], r["detected"]) for r in df.collect()
    )


def test_lang_mismatch_flags_only_wrong_claims(spark):
    from webgraph.code import lang_mismatch

    df = spark.createDataFrame(
        [
            (1, "python", "import os\ndef main():\n"),      # right
            (2, "go", "import os\ndef main():\n"),          # wrong: python
            (3, "c", "#include <a.h>\nprintf(x);\n"),       # right
            (4, "python", "function f() {\nconsole.log(1)"),  # wrong: js
        ],
        "doc_id long, lang string, content string",
    )
    assert _mm(lang_mismatch(df)) == [
        (2, "go", "python"),
        (4, "python", "js"),
    ]


def test_lang_mismatch_unknown_content_is_not_flagged(spark):
    """No marker evidence is not evidence of mislabeling."""
    from webgraph.code import lang_mismatch

    df = spark.createDataFrame(
        [(1, "python", "just prose with no markers at all")],
        "doc_id long, lang string, content string",
    )
    assert lang_mismatch(df).count() == 0


def test_lang_mismatch_tie_breaks_first_in_marker_order(spark):
    """One '#include' (1.0) and one 'package ' (1.0) tie: detected must
    be 'c' (first in CODE_LANG_MARKERS), so a 'go' claim is flagged."""
    from webgraph.code import lang_mismatch

    df = spark.createDataFrame(
        [(1, "go", "#include x package y")],
        "doc_id long, lang string, content string",
    )
    assert _mm(lang_mismatch(df)) == [(1, "go", "c")]


def test_detect_code_lang_column_form(spark):
    from webgraph.code import detect_code_lang

    df = spark.createDataFrame(
        [("func main() {\npackage main\n",), ("nothing here",)],
        "content string",
    )
    got = [r["d"] for r in
           df.select(detect_code_lang(F.col("content")).alias("d")).collect()]
    assert got == ["go", "unknown"]


# ------------------------------------------------------ VAD segments --


def _segs(df):
    return sorted(
        (r["asset_id"], r["seg_start"], r["seg_end"], r["n_frames"], r["peak_amp"])
        for r in df.collect()
    )


def _frames(spark, rows):
    return spark.createDataFrame(rows, "asset_id long, frame_idx long, amp long")


def test_vad_segments_hand_computed_islands(spark):
    from webgraph.multimodal import vad_segments

    frames = _frames(
        spark,
        [(1, 0, 9000), (1, 1, 9500), (1, 2, 100), (1, 3, 8200),
         (1, 4, 50), (1, 5, 8300), (1, 6, 8400)],
    )
    assert _segs(vad_segments(frames, activity_threshold=8192)) == [
        (1, 0, 1, 2, 9500),
        (1, 3, 3, 1, 8200),
        (1, 5, 6, 2, 8400),
    ]


def test_vad_segments_all_silent_asset_has_no_rows(spark):
    from webgraph.multimodal import vad_segments

    frames = _frames(spark, [(7, i, 10) for i in range(5)])
    assert vad_segments(frames).count() == 0


def test_vad_segments_multi_asset_independent_islands(spark):
    from webgraph.multimodal import vad_segments

    frames = _frames(
        spark,
        [(1, 0, 9000), (1, 1, 9000), (2, 0, 9000), (2, 2, 9000)],
    )
    # asset 2's frames 0 and 2 are NOT consecutive -> two segments
    assert _segs(vad_segments(frames)) == [
        (1, 0, 1, 2, 9000),
        (2, 0, 0, 1, 9000),
        (2, 2, 2, 1, 9000),
    ]


def test_audio_frames_replays_fake_pcm(spark):
    from webgraph.multimodal import audio_frames

    payload = b"hello"
    assets = spark.createDataFrame(
        [(1, bytearray(payload), "audio/wav"), (2, bytearray(b"x"), "image/png")],
        "asset_id long, media binary, mime string",
    )
    got = {
        (r["asset_id"], r["frame_idx"]): r["amp"]
        for r in audio_frames(assets).collect()
    }
    h = hashlib.sha256(payload).hexdigest()
    want = {(1, i): int(h[4 * i: 4 * i + 4], 16) for i in range(16)}
    assert got == want  # image asset filtered out; amps = digest nibbles


# -------------------------------------------------- co-change coupling --


def _events(spark, rows):
    return spark.createDataFrame(rows, "repo string, commit string, path string")


def test_cochange_hand_computed_support_and_jaccard(spark):
    """a+b co-change in c1, c2 (support 2); a appears in 3 commits, b in
    2 -> jaccard = 2 / (3 + 2 - 2) = 2/3."""
    from webgraph.code import cochange_pairs

    ev = _events(
        spark,
        [("r", "c1", "a"), ("r", "c1", "b"),
         ("r", "c2", "a"), ("r", "c2", "b"),
         ("r", "c3", "a"), ("r", "c3", "z")],
    )
    got = [
        (r["repo"], r["path_a"], r["path_b"], r["support"], r["jaccard_e6"])
        for r in cochange_pairs(ev, min_support=2).collect()
    ]
    assert got == [("r", "a", "b", 2, 666667)]


def test_cochange_sweep_commit_dropped_whole(spark):
    """A commit touching more than max_commit_files contributes NO pairs
    — not even for file pairs that also co-change elsewhere."""
    from webgraph.code import cochange_pairs

    base = [("r", "c1", "a"), ("r", "c1", "b"),
            ("r", "c2", "a"), ("r", "c2", "b")]
    sweep = [("r", "sweep", f"f{i}") for i in range(5)] + [
        ("r", "sweep", "a"), ("r", "sweep", "b")]
    got = {
        (r["path_a"], r["path_b"]): r["support"]
        for r in cochange_pairs(
            _events(spark, base + sweep), min_support=2, max_commit_files=4
        ).collect()
    }
    # sweep (7 files > cap 4) dropped whole: support stays 2, and the
    # jaccard denominators count only kept commits
    assert got == {("a", "b"): 2}


def test_cochange_no_cross_repo_pairs(spark):
    from webgraph.code import cochange_pairs

    ev = _events(
        spark,
        [("r1", "c1", "a"), ("r2", "c1", "b"),
         ("r1", "c2", "a"), ("r2", "c2", "b")],
    )
    assert cochange_pairs(ev, min_support=1).count() == 0


def test_cochange_guard(spark):
    from webgraph.code import cochange_pairs

    with pytest.raises(ValueError, match="min_support"):
        cochange_pairs(_events(spark, [("r", "c", "a")]), min_support=0)


def test_churn_hotspots_hand_computed(spark):
    from webgraph.code import churn_hotspots

    ev = _events(
        spark,
        [("r", "c1", "a"), ("r", "c2", "a"), ("r", "c3", "a"),
         ("r", "c1", "b"), ("r", "c2", "b"),
         ("r", "c1", "z"),
         ("r2", "c1", "only")],
    )
    got = sorted(
        (r["repo"], r["path"], r["n_commits"], r["churn_rank"])
        for r in churn_hotspots(ev).collect()
    )
    assert got == [
        ("r", "a", 3, 1), ("r", "b", 2, 2), ("r", "z", 1, 3),
        ("r2", "only", 1, 1),
    ]


def test_churn_hotspots_dedupes_same_commit_touches(spark):
    """Duplicate (repo, commit, path) events count once."""
    from webgraph.code import churn_hotspots

    ev = _events(spark, [("r", "c1", "a"), ("r", "c1", "a")])
    assert churn_hotspots(ev).collect()[0]["n_commits"] == 1
