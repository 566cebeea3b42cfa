"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Task brief: the Spark-side plumbing — schema, partitioning, Arrow batch
shape, UDF signatures — is real and tested; the actual codec calls are
STUBBED (the container ships no image/audio libraries). Each stub is
either a clearly-marked NotImplementedError (real-codec path) or a
deterministic fake derived from the bytes, so pipelines are testable
end-to-end and a real decoder (Pillow/ffmpeg/torchaudio) drops into the
same `mapInPandas` batch function unchanged.

Scale notes: binary payloads dominate I/O — assets are processed with
`mapInPandas` so each Arrow batch holds few rows (set
spark.sql.execution.arrow.maxRecordsPerBatch low for big blobs), and
feature extraction projects away the payload as early as possible so the
shuffle carries features, never bytes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)

REAL_CODECS = False  # flip when Pillow/ffmpeg are available


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from the content hash.
    Replace with PIL.Image.open when REAL_CODECS."""
    h = hashlib.sha256(payload or b"").digest()
    w = 64 + struct.unpack("<H", h[0:2])[0] % 1985  # 64..2048
    ht = 64 + struct.unpack("<H", h[2:4])[0] % 1985
    return w, ht, 3


def _fake_embedding(payload: bytes, dim: int = 16) -> list[float]:
    h = hashlib.sha256(payload or b"").digest()
    return [
        (int.from_bytes(h[(2 * i) % 30 : (2 * i) % 30 + 2], "little") / 65535.0) * 2 - 1
        for i in range(dim)
    ]


def _default_image_decoder(data: bytes, embed_dim: int):
    """The shipped decoder: deterministic fake, or a loud refusal when the
    deployment claims real codecs but none is injected. A REAL decoder
    (PIL.Image.open -> size/mode + any embedding model) has exactly this
    signature — bytes in, (w, h, c, embedding) out — and slots into
    decode_images via the `decoder=` seam with zero plumbing changes
    (proved by tests/test_round4.py's injected-decoder test)."""
    if REAL_CODECS:
        raise NotImplementedError(
            "real image decode requires Pillow; not shipped in this container"
        )
    w, h, c = _fake_decode(data)
    return w, h, c, _fake_embedding(data, embed_dim)


def decode_images(
    assets: DataFrame, embed_dim: int = 16, decoder=None
) -> DataFrame:
    """image bytes -> (dims, hash, feature vector) via Arrow batches.

    The payload column is dropped inside the batch function — downstream
    stages shuffle ~100 B/row of features instead of megabyte blobs.
    `decoder(data, embed_dim) -> (w, h, channels, embedding)` is the
    codec seam: the default is the deterministic fake (or the REAL_CODECS
    refusal); injecting a real one exercises the identical mapInPandas
    batch path."""
    decode = decoder or _default_image_decoder

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["media"]):
                data = bytes(payload) if payload is not None else b""
                w, h, c, emb = decode(data, embed_dim)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "embedding": emb,
                    }
                )
            yield pd.DataFrame(rows)

    return assets.filter(F.col("mime").startswith("image/")).select(
        "asset_id", "media"
    ).mapInPandas(batch_fn, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    assets: DataFrame, every_ms: int = 1000, max_frames: int = 16, sampler=None
) -> DataFrame:
    """video bytes -> sampled frame records. Frame extraction itself is the
    stub (deterministic frame hashes from (content, idx)); the exploded
    one-to-many shape and timestamps are the real contract ffmpeg slots
    into, via the same `sampler=` seam as decode_images' `decoder=`."""
    return _sample_video_frames(assets, every_ms, max_frames, sampler=sampler)


def _default_frame_sampler(data: bytes, every_ms: int, max_frames: int):
    """bytes -> [(frame_idx, ts_ms, frame_sha256)]. A real ffmpeg sampler
    has this exact signature (decode, seek every_ms, hash each frame)."""
    if REAL_CODECS:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg; not shipped in this container"
        )
    # fake duration: proportional to payload size
    n = min(max_frames, max(1, len(data) // 64))
    return [
        (i, i * every_ms, hashlib.sha256(data + i.to_bytes(4, "little")).hexdigest())
        for i in range(n)
    ]


def _sample_video_frames(
    assets: DataFrame, every_ms: int, max_frames: int, sampler=None
) -> DataFrame:
    sample = sampler or _default_frame_sampler

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["media"]):
                data = bytes(payload) if payload is not None else b""
                for i, ts, sha in sample(data, every_ms, max_frames):
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "frame_idx": i,
                            "ts_ms": ts,
                            "frame_sha256": sha,
                        }
                    )
            yield pd.DataFrame(rows)

    return assets.filter(F.col("mime").startswith("video/")).select(
        "asset_id", "media"
    ).mapInPandas(batch_fn, schema=FRAME_SCHEMA)


def media_stats(assets: DataFrame) -> DataFrame:
    """Cheap JVM-side metadata pass (no Python): payload sizes and hashes
    by mime class — the triage query before any decode fan-out."""
    return (
        assets.select(
            F.split(F.col("mime"), "/").getItem(0).alias("media_class"),
            F.length(F.col("media")).alias("bytes"),
        )
        .groupBy("media_class")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("bytes").alias("total_bytes"),
            F.max("bytes").alias("max_bytes"),
        )
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("peak_amp", T.LongType()),
        T.StructField("sum_amp", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("n_silent", T.IntegerType()),
    ]
)


def _fake_pcm(data: bytes, n_frames: int = 16) -> list[int]:
    """Stub PCM frame amplitudes: sixteen 16-bit values cut from the
    sha256 hex digest (4 hex chars each) — deterministic and
    SQL-replayable, the audio twin of _fake_thumbnail. A REAL decoder
    (ffmpeg/soundfile -> per-frame max |sample|) has this exact
    signature — bytes in, frame-amplitude ints out — and slots into
    audio_energy via the ``pcm_fn=`` seam."""
    h = hashlib.sha256(data or b"").hexdigest()
    return [int(h[4 * i : 4 * i + 4], 16) for i in range(n_frames)]


def audio_energy(
    assets: DataFrame, silence_threshold: int = 8192, pcm_fn=None
) -> DataFrame:
    """Per-asset audio frame-energy features — the triage pass a speech/
    audio corpus pipeline runs before transcription fan-out (silence
    share decides whether an asset is worth decoding at all). Integer
    arithmetic only: peak / sum / sum-of-squares energy / silent-frame
    count over the frame amplitudes, so the features are engine-exact.

    ``pcm_fn(data) -> [amplitudes]`` is the codec seam (stub =
    sha256-derived 16-bit frames). Arrow mapInPandas; the payload is
    dropped inside the batch function — downstream shuffles five
    integers per asset, never audio bytes."""
    pcm = pcm_fn or _fake_pcm

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["media"]):
                amps = pcm(bytes(payload) if payload is not None else b"")
                rows.append(
                    {
                        "asset_id": asset_id,
                        "n_frames": len(amps),
                        "peak_amp": max(amps) if amps else 0,
                        "sum_amp": sum(amps),
                        "energy": sum(a * a for a in amps),
                        "n_silent": sum(
                            1 for a in amps if a < silence_threshold
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return assets.filter(F.col("mime").startswith("audio/")).select(
        "asset_id", "media"
    ).mapInPandas(batch_fn, schema=AUDIO_FEATURES_SCHEMA)


def synthetic_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests/bench: binary payloads from
    sha256(seed, id), mimes cycling image/audio/video."""
    mimes = ["image/png", "image/jpeg", "video/mp4", "audio/wav"]
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}-{i}".encode()).digest() * (1 + i % 7)
        rows.append((i, bytearray(payload), mimes[i % len(mimes)], {"src": f"s{i%3}"}))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("b0", T.LongType()),
        T.StructField("b1", T.LongType()),
        T.StructField("b2", T.LongType()),
        T.StructField("b3", T.LongType()),
    ]
)


def _fake_thumbnail(data: bytes) -> list[int]:
    """Stub 8x8 grayscale thumbnail: the 64 sha256 hex nibbles (0..15)
    of the payload. A REAL thumbnailer (PIL resize((8, 8)) ->
    convert('L')) has this exact signature — bytes in, 64 ints out —
    and slots into image_ahash via the `thumb_fn=` seam."""
    h = hashlib.sha256(data or b"").hexdigest()
    return [int(c, 16) for c in h]


def image_ahash(assets: DataFrame, thumb_fn=None) -> DataFrame:
    """Perceptual average-hash (aHash) of every image asset — the
    classic media near-dup fingerprint (8x8 grayscale thumbnail, bit i
    set iff pixel i is above the thumbnail mean; re-encodes, format
    shifts and mild recompression keep most bits). Returned as FOUR
    16-bit band values (b0..b3, bits MSB-first) rather than one 64-bit
    value: the bands are the LSH join keys downstream
    (phash_near_pairs), and staying in [0, 2^16) sidesteps signed-long
    edge cases in both engines.

    The thumbnail is the codec seam (`thumb_fn(data) -> 64 ints`; stub
    = sha256 hex nibbles, deterministic and SQL-replayable); the mean
    comparison is exact integer arithmetic: bit_i = 64*g_i > sum(g),
    no float mean. Arrow mapInPandas, payload dropped inside the batch
    — downstream shuffles 4 longs per asset, never the blob."""
    thumb = thumb_fn or _fake_thumbnail

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["media"]):
                g = thumb(bytes(payload) if payload is not None else b"")
                total = sum(g)
                bits = [1 if 64 * v > total else 0 for v in g]
                bands = [
                    sum(b << (15 - j) for j, b in enumerate(bits[k * 16 : k * 16 + 16]))
                    for k in range(4)
                ]
                rows.append(
                    {
                        "asset_id": asset_id,
                        "b0": bands[0],
                        "b1": bands[1],
                        "b2": bands[2],
                        "b3": bands[3],
                    }
                )
            yield pd.DataFrame(rows)

    return assets.filter(F.col("mime").startswith("image/")).select(
        "asset_id", "media"
    ).mapInPandas(batch_fn, schema=AHASH_SCHEMA)


def phash_near_pairs(hashed: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(a, b, hamming) pairs of perceptually near-duplicate assets. The
    SimHash banding argument, exact by pigeonhole: two 64-bit hashes
    within hamming distance 3 differ in at most 3 of the 4 bands, so at
    least one band matches EXACTLY — candidates are 4 equi-joins on a
    16-bit key (never all pairs), then the full Hamming distance
    (xor + bit_count over the four bands, pure codegen) verifies."""
    long_form = hashed.select(
        "asset_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("band"), F.col(f"b{k}").alias("v"))
                    for k in range(4)
                ]
            )
        ).alias("bk"),
    ).select("asset_id", F.col("bk.band").alias("band"), F.col("bk.v").alias("v"))
    cands = (
        long_form.select("band", "v", F.col("asset_id").alias("a"))
        .join(long_form.select("band", "v", F.col("asset_id").alias("b")), ["band", "v"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    ha = hashed.select(
        F.col("asset_id").alias("a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
    )
    hb = hashed.select(
        F.col("asset_id").alias("b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(4)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"bb{k}"))) for k in range(4)
    )
    return (
        cands.join(ha, "a")
        .join(hb, "b")
        .select("a", "b", hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def frame_dedup_groups(frames: DataFrame, min_copies: int = 2) -> DataFrame:
    """Cross-video frame-level dedup: group byte-identical frames (by
    frame_sha256) across assets — re-uploads, clips and re-encodes of
    the same footage share frame hashes, and the duplicate-frame report
    is the first signal a video-corpus dedup pass acts on. Returns one
    row per duplicated frame group: (n_copies, n_assets, first_asset).

    block_clones economics (code.py:312): frames are already hash-sized
    rows (the sampler dropped pixels batch-side), so both aggregates —
    the (sha, asset) collapse, then the sha group — move 8-byte-ish keys
    with map-side combining absorbing hot-frame skew (stills, slates,
    black frames)."""
    per_asset = frames.groupBy("frame_sha256", "asset_id").agg(
        F.count("*").alias("n")
    )
    return (
        per_asset.groupBy("frame_sha256")
        .agg(
            F.sum("n").alias("n_copies"),
            F.count("*").alias("n_assets"),
            F.min("asset_id").alias("first_asset"),
        )
        .filter(F.col("n_copies") >= min_copies)
        .select(
            F.col("n_copies").cast("long").alias("n_copies"),
            F.col("n_assets").cast("long").alias("n_assets"),
            "first_asset",
        )
    )


def shot_boundaries(frames: DataFrame) -> DataFrame:
    """Shot segmentation over a sampled-frame table: a cut wherever the
    frame fingerprint changes from the previous frame of the same asset
    (the hash-equality stub of histogram/SSIM cut detection — a real
    scorer slots into the frame hash upstream via sample_video_frames'
    ``sampler=`` seam). Returns one row per shot: (asset_id, shot_id,
    start_idx, start_ts_ms, n_frames).

    Scale shape: both windows partition by asset_id with at most
    max_frames rows per partition (bounded, uniform key) — gaps-and-
    islands by cumulative cut count, then one hash aggregate. Frame
    payloads never appear here; only hashes and indices shuffle."""
    from pyspark.sql import Window

    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    cut = (
        F.lag("frame_sha256").over(w).isNull()
        | (F.col("frame_sha256") != F.lag("frame_sha256").over(w))
    ).cast("long")
    wc = Window.partitionBy("asset_id").orderBy("frame_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        frames.withColumn("_cut", cut)
        .withColumn("shot_id", F.sum("_cut").over(wc) - 1)
        .groupBy("asset_id", "shot_id")
        .agg(
            F.min("frame_idx").cast("long").alias("start_idx"),
            F.min("ts_ms").cast("long").alias("start_ts_ms"),
            F.count("*").alias("n_frames"),
        )
    )


AUDIO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("amp", T.LongType()),
    ]
)


def audio_frames(assets: DataFrame, pcm_fn=None) -> DataFrame:
    """(asset_id, frame_idx, amp) — the per-frame amplitude table behind
    segment-level audio ops (vad_segments), same codec seam and Arrow
    economics as audio_energy: payload bytes are dropped inside the
    batch function, downstream shuffles (id, idx, int) rows only."""
    pcm = pcm_fn or _fake_pcm

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["media"]):
                amps = pcm(bytes(payload) if payload is not None else b"")
                rows.extend(
                    {"asset_id": asset_id, "frame_idx": i, "amp": a}
                    for i, a in enumerate(amps)
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "amp"]
            )

    return assets.filter(F.col("mime").startswith("audio/")).select(
        "asset_id", "media"
    ).mapInPandas(batch_fn, schema=AUDIO_FRAMES_SCHEMA)


def vad_segments(
    frames: DataFrame, activity_threshold: int = 8192
) -> DataFrame:
    """Voice-activity segments: maximal runs of consecutive frames with
    amp >= activity_threshold — the energy-gate VAD every speech
    pipeline runs before transcription (only active segments are worth
    decoding; the segment table also drives chunked ASR fan-out).
    Returns (asset_id, seg_start, seg_end, n_frames, peak_amp), one row
    per run.

    Plan: gaps-and-islands — filter active frames, island key =
    frame_idx - row_number() within the asset (consecutive frames share
    it), one hash aggregate per island. The only window partitions BY
    ASSET over its own frames (bounded by clip length), so the shape
    scales with assets, not with a global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    active = frames.filter(F.col("amp") >= activity_threshold)
    islands = active.withColumn(
        "_isl", F.col("frame_idx") - F.row_number().over(w)
    )
    return (
        islands.groupBy("asset_id", "_isl")
        .agg(
            F.min("frame_idx").alias("seg_start"),
            F.max("frame_idx").alias("seg_end"),
            F.count("*").alias("n_frames"),
            F.max("amp").alias("peak_amp"),
        )
        .drop("_isl")
        .select("asset_id", "seg_start", "seg_end", "n_frames", "peak_amp")
    )
