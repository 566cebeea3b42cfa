"""Structured Streaming form of the reference's event/observer subsystem.

The reference's only "streaming" is the bounded-queue observer fan-out
(BatchGraphImporter.java:87-124: producer blocks when the queue is full =
backpressure; consumers enrich pages as they arrive — SURVEY §2.9). The
Spark-native equivalent:

- ingest: `readStream` over a parquet/json directory (file source; at
  cluster scale Kafka with maxOffsetsPerTrigger as the queue bound),
- process: the same DataFrame transformations as batch (windowed counts
  with watermarks for late data; the batch/streaming unification is the
  point),
- graph maintenance: `foreachBatch` merging each micro-batch of new edges
  into the running edge table with the J1/J3 dedup joins — the event-queue
  consumer re-expressed,
- sessionization: stateful per-user session aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream with a per-trigger bound — the ArrayBlockingQueue
    capacity analog (BatchGraphImporter.java:108-113)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data handling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame, table_name: str, mode: str = "complete"
):
    """Drain all available input (Trigger.AvailableNow) into an in-memory
    table and return after termination — the waitForImportToFinish analog
    (BatchGraphImporter.java:400-434)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _edge_manifest(state_dir: str) -> str:
    import os

    return os.path.join(state_dir, "edges_manifest.jsonl")


def _edge_manifest_entries(state_dir: str) -> list[dict]:
    import json
    import os

    m = _edge_manifest(state_dir)
    if not os.path.exists(m):
        return []
    with open(m) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def read_edge_state(
    spark: SparkSession, state_dir: str, as_of_batch: int | None = None
) -> DataFrame | None:
    """The committed persistent edge table: the union of the manifest's
    batch directories. The manifest line is the commit point, so readers
    never observe a half-written batch; None when no batch committed yet.

    ``as_of_batch`` is TIME TRAVEL over the append-only commit log (the
    Iceberg snapshot-read analog on plain parquet): restrict the union
    to batches with batch_id <= as_of_batch — because committed batch
    directories are immutable and the manifest is append-only, the
    result is exactly the table a reader saw right after that commit,
    at zero storage cost beyond the deltas themselves."""
    entries = _edge_manifest_entries(state_dir)
    if as_of_batch is not None:
        entries = [e for e in entries if e["batch_id"] <= as_of_batch]
    paths = [e["path"] for e in entries]
    return spark.read.parquet(*paths) if paths else None


SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)


def stateful_sessions(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization with an
    inactivity gap, via applyInPandasWithState (the Spark surface for
    operators the built-in windowed aggs can't express — task brief E4).

    Semantics: consecutive events of a user belong to one session while
    the gap between them is <= `gap`; a session is EMITTED when (a) a
    later event of the same user arrives beyond the gap (intra/inter-batch
    split), or (b) the event-time watermark passes session_end + gap
    (GroupStateTimeout.EventTimeTimeout fires — late events can no longer
    reopen it). State per user is one 4-tuple (start, last, n, total) —
    O(active users), not O(events); Arrow-batched, never row-Python."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_s = pd.Timedelta(gap).total_seconds()
    state_schema = "start double, last double, n long, total double"

    def fn(key, pdfs, state):
        uid = key[0]
        closed: list[tuple] = []
        if state.hasTimedOut:
            start, last, n, total = state.get
            closed.append((uid, start, last, n, total))
            state.remove()
        else:
            frames = [p[["ts", "value"]] for p in pdfs]
            rows = pd.concat(frames, ignore_index=True).sort_values("ts")
            cur = list(state.get) if state.exists else None
            for ts, val in zip(rows["ts"], rows["value"]):
                t = ts.timestamp()
                if cur is not None and t - cur[1] > gap_s:
                    closed.append((uid, *cur))
                    cur = None
                if cur is None:
                    cur = [t, t, 0, 0.0]
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += float(val)
            if cur is not None:
                state.update(tuple(cur))
                # timeout = session_end + gap, but never behind the
                # current watermark (Spark rejects a stale timeout)
                timeout_ms = int((cur[1] + gap_s) * 1000)
                state.setTimeoutTimestamp(
                    max(timeout_ms, state.getCurrentWatermarkMs() + 1)
                )
        if closed:
            import numpy as np

            def ts_us(vals):
                # microsecond-unit timestamps: Spark's Arrow schema is
                # timestamp[us]; default ns-unit pandas values trip the
                # safe-cast check on sub-second inputs
                us = (np.array(vals, dtype="float64") * 1e6).round().astype("int64")
                return pd.to_datetime(us, unit="us").as_unit("us")

            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": ts_us([c[1] for c in closed]),
                    "session_end": ts_us([c[2] for c in closed]),
                    "n_events": [int(c[3]) for c in closed],
                    "total_value": [float(c[4]) for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_to_parquet_sink(stream_df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Drain all available input into a parquet directory and return after
    termination. Aggregated streams run in complete mode via foreachBatch
    (each batch's full result overwrites the output) — unlike the memory
    sink, the result never has to fit on the driver; at cluster scale the
    overwrite becomes an Iceberg snapshot replace."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_to_append_sink(stream_df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Drain an append-mode stream (e.g. stateful_sessions output) into a
    parquet directory via the native file sink and return after
    termination."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def incremental_edge_merge(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    domains: list[str],
    checkpoint_dir: str,
    extract_fn=None,
):
    """Micro-batch graph maintenance: every batch of new documents is
    extracted/filtered and merged into the persistent edge table with the
    same get-or-create/dedup semantics as the batch build (J1/J3) — the
    observer-consumer loop as foreachBatch. Returns the StreamingQuery.

    ``extract_fn(batch_df) -> (src, dst) DataFrame`` overrides the default
    crawl-corpus extraction (build_graph over `domains`) — the merge/commit
    protocol is extraction-agnostic, so any edge derivation streams through
    the same exactly-once state machinery (the contract's
    s_incremental_merge drains lineitem-derived edges through it and checks
    drained-state == batch-derivation equality).

    Commit protocol (append-only, per-batch cost O(|batch|) written bytes):

        <state_dir>/edges/batch=<id>/      only this batch's NEW edges
                                           (anti-joined against committed
                                           state), idempotently OVERWRITTEN
                                           on replay of the same batch id
        <state_dir>/edges_manifest.jsonl   one line per committed batch —
                                           appended only after the parquet
                                           write returns (the same
                                           write-then-log protocol as
                                           CheckpointManager)

    A crash at any point replays the batch: before the manifest line
    exists the batch is uncommitted (readers via read_edge_state never see
    it) and the replay overwrites the same directory. The full table is
    never rewritten — unlike an overwrite-merge, whose per-batch cost is
    O(|table|) and whose final directory swap is not atomic on plain
    parquet. On Iceberg the same loop is `MERGE INTO` with snapshot
    commits; at cluster scale write batches bucketed by src so the
    anti-join against committed state is co-located."""
    import json
    import os

    from webgraph.build import build_graph

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        committed = {e["batch_id"] for e in _edge_manifest_entries(state_dir)}
        if batch_id in committed:
            return  # replayed batch already durable: exactly-once
        new_edges = (
            extract_fn(batch_df)
            if extract_fn is not None
            else build_graph(batch_df, domains).edges
        )
        existing = read_edge_state(spark, state_dir)
        delta = (
            new_edges
            if existing is None
            else new_edges.join(existing, ["src", "dst"], "left_anti")
        )
        path = os.path.join(state_dir, "edges", f"batch={batch_id}")
        delta.write.mode("overwrite").parquet(path)
        rows = spark.read.parquet(path).count()  # parquet count-star: footer stats
        with open(_edge_manifest(state_dir), "a") as f:
            f.write(json.dumps({"batch_id": batch_id, "path": path, "rows": rows}) + "\n")

    return (
        docs_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_distinct_keys(
    events: DataFrame,
    keys: list[str],
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Streaming deduplication: emit each key combination once across ALL
    micro-batches (exactly-once delivery of at-least-once event feeds —
    the event-queue consumer's idempotency guard, SURVEY §2.9).

    State is one entry per distinct key. With ``watermark=(ts_col,
    delay)`` the operator uses dropDuplicatesWithinWatermark so state for
    keys older than the watermark is evicted — the bounded-state mode an
    unbounded 100 TB feed requires (duplicates are redeliveries, which
    arrive within the delay; an unbounded-state exact dedup of an infinite
    stream is not a thing). Without it, exact dedup with state = |keys|.

    Projecting to the key columns BEFORE dedup keeps the emitted set
    deterministic (no arbitrary first-row-wins payload), which is what
    makes the contract oracle exact: SELECT DISTINCT keys."""
    if watermark is not None:
        ts_col, delay = watermark
        return (
            events.withWatermark(ts_col, delay)
            .select(*keys, ts_col)
            .dropDuplicatesWithinWatermark(keys)
            .select(*keys)
        )
    return events.select(*keys).dropDuplicates(keys)


def _latest_cms_version(state_dir: str) -> int | None:
    """Largest COMMITTED sketch version under state_dir — a ``v=<batch>``
    subdir counts only once its ``_SUCCESS`` marker exists, so a crash
    mid-write leaves an ignorable partial dir, never a readable one."""
    import os

    if not os.path.isdir(state_dir):
        return None
    best = None
    for name in os.listdir(state_dir):
        if not name.startswith("v="):
            continue
        try:
            b = int(name[2:])
        except ValueError:
            continue
        if os.path.isfile(os.path.join(state_dir, name, "_SUCCESS")):
            best = b if best is None or b > best else best
    return best


def read_cms_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current (latest committed) streaming-CMS sketch as
    ``(row, bucket, cnt)``. Raises FileNotFoundError before the first
    commit."""
    v = _latest_cms_version(state_dir)
    if v is None:
        raise FileNotFoundError(f"no committed CMS state under {state_dir}")
    return spark.read.parquet(f"{state_dir}/v={v}").select("row", "bucket", "cnt")


def streaming_cms(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 3,
):
    """Streaming count-min sketch: per micro-batch, build the batch's CMS
    and merge it cell-wise into the running sketch — the mergeability
    property exercised as cross-batch state. Because disjoint-corpus
    sketches merge losslessly, the drained stream's sketch equals the
    batch sketch over all data (the contract oracle checks exactly that).

    The sketch is <= depth*width rows, so the running state is collected
    to the driver and written as a NEW version dir ``v=<batch_id>`` per
    batch; readers (read_cms_state) take the largest version with a
    ``_SUCCESS`` marker. No live data is ever deleted before its
    replacement commits — a crash at any point leaves either the old
    version intact or the old + an ignorable partial (review finding:
    the previous mode("overwrite") on a single dir had a delete-then-
    write window that could lose ALL merged state). Superseded versions
    are pruned only after the new one commits.

    Restart-safe: foreachBatch is at-least-once (a crash between the
    state write and the checkpoint offset commit replays the batch), so
    the committed version id IS the last-merged-batch watermark and a
    replayed batch is skipped instead of double-counted. Empty batches
    commit an empty (schema-only) version — no placeholder cells that
    would pollute later merges (review finding)."""
    import os
    import shutil

    from webgraph.sketches import cms_build, cms_merge

    def update(batch_df: DataFrame, batch_id: int) -> None:
        last = _latest_cms_version(state_dir)
        if last is not None and batch_id <= last:
            return  # replayed batch: already merged, skip
        batch_sketch = cms_build(batch_df, text_col=text_col, width=width, depth=depth)
        if last is not None:
            current = read_cms_state(spark, state_dir).filter(F.col("cnt") > 0)
            merged = cms_merge(current, batch_sketch)
        else:
            merged = batch_sketch
        rows = [(r["row"], r["bucket"], r["cnt"]) for r in merged.collect()]
        # overwrite is safe HERE: v=<batch_id> is only ever written by this
        # batch, so the only thing it can clobber is this batch's own
        # crashed partial attempt (which no reader trusts — no _SUCCESS)
        spark.createDataFrame(rows, "row int, bucket bigint, cnt long").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{state_dir}/v={batch_id}")
        for name in os.listdir(state_dir):  # prune AFTER the new commit
            if name.startswith("v=") and name != f"v={batch_id}":
                shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)

    q = (
        stream_df.writeStream.foreachBatch(update)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
    prefixes: tuple[str, str] = ("l_", "r_"),
) -> DataFrame:
    """Watermarked stream-stream inner join: each left row matches right
    rows with the same `key` whose event time falls in
    [left_time, left_time + max_gap) — the attribution-join shape
    ("click within 30 minutes of the view"). Both sides carry watermarks
    so Spark bounds the join state: left rows older than
    watermark + max_gap and right rows older than watermark are evicted
    instead of accumulating forever — without the time-range condition a
    stream-stream join is unbounded state and Spark rightly refuses it.

    Output columns are the two inputs' columns under `prefixes` (the join
    key unprefixed once). Deterministic for a fixed input set: the match
    predicate is pure event-time arithmetic, so draining with
    AvailableNow emits exactly the batch join's rows — which is what the
    contract oracle checks with a plain SQL theta join.
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    lp, rp = prefixes
    lcols = [F.col(c).alias(f"{lp}{c}") for c in lw.columns if c != key]
    rcols = [F.col(c).alias(f"{rp}{c}") for c in rw.columns if c != key]
    lt, rt = f"{lp}{left_time}", f"{rp}{right_time}"
    lw = lw.select(key, *lcols)
    rw = rw.select(F.col(key).alias("_rkey"), *rcols)
    cond = (
        (F.col(key) == F.col("_rkey"))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) < F.col(lt) + F.expr(f"INTERVAL {max_gap}"))
    )
    return lw.join(rw, cond, "inner").drop("_rkey")


def trending_topk(windowed_counts: DataFrame, k: int = 3) -> DataFrame:
    """Trending items: top-``k`` event types per tumbling window, ranked
    by count (ties broken by type name for determinism). Runs over the
    DRAINED windowed-counts table (the parquet sink of
    windowed_event_counts) rather than inside the stream: Structured
    Streaming cannot host a rank over an updating aggregate, and a
    production trending pipeline ranks at read time for exactly that
    reason — the streaming job maintains counts, the serving query ranks.
    Per-window partitioned window rank: the sort is local to a window's
    partition, never global."""
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"trending_topk: k must be >= 1, got {k}")
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    return windowed_counts.withColumn(
        "trend_rank", F.row_number().over(w).cast("long")
    ).filter(F.col("trend_rank") <= k)


# ------------------------------------------------ streaming MinHash --


def _mh_manifest(state_dir: str) -> str:
    import os

    return os.path.join(state_dir, "buckets_manifest.jsonl")


def _mh_manifest_entries(state_dir: str) -> list[dict]:
    import json
    import os

    path = _mh_manifest(state_dir)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def read_minhash_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Committed (id, band, bsig) bucket rows — only batches with a
    manifest line are visible (the read_edge_state protocol)."""
    entries = _mh_manifest_entries(state_dir)
    if not entries:
        return None
    return spark.read.parquet(*[e["path"] for e in entries])


def streaming_minhash_state(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
):
    """Incremental MinHash-LSH index maintenance: every micro-batch of
    new documents is shingled, signed, and banded ONCE — at arrival —
    and its bucket rows are appended to the persistent LSH index with
    the incremental_edge_merge exactly-once commit protocol (per-batch
    parquet + manifest line, idempotent replay). The expensive per-doc
    work (shingle -> 64 hashes -> band signatures) never re-runs for
    old documents; a full-corpus batch re-index at 100 TB re-pays it
    for every document on every refresh.

    Order-independence (why the drained state is exactly the batch
    index): a document's bucket rows depend only on its own text —
    never on other documents or on arrival time — so the union of
    per-batch bucket rows equals minhash_band_buckets over the whole
    corpus regardless of how documents were split into batches, and
    the near-dup pairs served from the drained state inherit the batch
    pipeline's pinned recall. Serving is read-time (the s_trending_topk
    pattern): pairs_from_buckets + exact-Jaccard verify over the
    committed index."""
    import json
    import os

    from webgraph.dedup import minhash_band_buckets, minhash_signatures, shingles

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        committed = {e["batch_id"] for e in _mh_manifest_entries(state_dir)}
        if batch_id in committed:
            return  # replayed batch already durable: exactly-once
        docs = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        existing = read_minhash_state(spark, state_dir)
        if existing is not None:
            docs = docs.join(
                existing.select(F.col("id").alias("doc_id")).distinct(),
                "doc_id",
                "left_anti",
            )
        sh = shingles(docs, "doc_id", "text", n)
        bucketed = minhash_band_buckets(
            minhash_signatures(sh, num_hashes), bands, num_hashes // bands
        )
        path = os.path.join(state_dir, "buckets", f"batch={batch_id}")
        bucketed.write.mode("overwrite").parquet(path)
        rows = spark.read.parquet(path).count()
        with open(_mh_manifest(state_dir), "a") as f:
            f.write(
                json.dumps({"batch_id": batch_id, "path": path, "rows": rows}) + "\n"
            )

    return (
        docs_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def minhash_pairs_from_state(
    spark: SparkSession,
    state_dir: str,
    docs: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_bucket: int = 200,
    strict: bool = False,
) -> DataFrame:
    """Serve near-dup pairs from the drained streaming index: candidates
    from the committed bucket table, exact-Jaccard verified against the
    corpus shingles (verification is what keeps LSH deterministic —
    candidates only affect recall, never precision)."""
    from webgraph.dedup import pairs_from_buckets, shingles, verify_jaccard_pairs

    bucketed = read_minhash_state(spark, state_dir)
    cands = pairs_from_buckets(bucketed, max_bucket, strict)
    sh = shingles(docs, id_col, text_col, n).persist()
    return verify_jaccard_pairs(cands, sh, threshold)


def stream_static_enrich(stream: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static broadcast enrichment — the dimension-join shape of
    Structured Streaming: the static side needs NO watermark and NO
    state store (it is re-resolved and broadcast against every
    micro-batch, which is also how a slowly-changing dimension table is
    picked up between batches). Contrast stream_stream_join, where both
    sides are unbounded and state must be watermark-evicted.

    At scale the static side must stay broadcast-sized (dimension
    tables: nations, sources, license classes); a large static side
    becomes a shuffled join per micro-batch and belongs in
    incremental_edge_merge-style state instead."""
    return stream.join(F.broadcast(dim), key)


# ----------------------------------------------------------- CDC merge --

_CDC_MANIFEST = "cdc_manifest.jsonl"


def _cdc_snapshots(state_dir: str) -> list[dict]:
    import json
    import os

    path = os.path.join(state_dir, _CDC_MANIFEST)
    if not os.path.isfile(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def cdc_apply(
    spark: SparkSession,
    change_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "key",
    seq_col: str = "seq",
    op_col: str = "op",
    n_buckets: int = 16,
):
    """Change-data-capture merge: drain an insert/update/delete log into a
    keyed snapshot table — the MERGE INTO half of the table-format story
    that incremental_edge_merge (append-only) doesn't cover. Returns the
    StreamingQuery.

    The log rows carry (key, seq, op, payload...): ``seq`` totally orders
    changes per key (a commit LSN), ``op`` is 'D' for delete, anything
    else upserts. Deletes are retained as TOMBSTONES in state — a
    late-arriving change with a lower seq can never resurrect a deleted
    key — and filtered only at read time (read_cdc_state), i.e.
    merge-on-read semantics with a merge-on-write layout.

    Layout (the Iceberg copy-on-write miniature, bucket = file group):

        <state_dir>/snap=<n>/_b=<bucket>/   bucket contents written by
                                            snapshot n
        <state_dir>/cdc_manifest.jsonl      one line per commit:
            {"snapshot": n, "writer": <checkpoint_dir>, "batch_id": id,
             "buckets": {bucket: snapshot-that-last-wrote-it}}

    Snapshot ids are MONOTONIC ACROSS WRITERS (next = count of committed
    lines), decoupled from Spark's per-checkpoint batch ids — a second
    streaming query with a fresh checkpoint appends snapshots instead of
    colliding with the first writer's batch 0. Replay detection is
    per-writer: a (writer, batch_id) pair already in the manifest is a
    replayed micro-batch and is skipped (exactly-once); and because the
    merge itself — argmax-by-seq per key over (old bucket contents UNION
    batch) — is associative, commutative, and idempotent, even a replay
    that slipped the check would commit a content-identical snapshot,
    never a corruption. The same associativity makes the final state
    independent of how changes split into micro-batches, which is what
    makes the drained-stream == one-shot-batch oracle exact.

    Only buckets containing batch keys are rewritten (the others keep
    their previous version in the new snapshot line), so the per-batch
    write cost is O(touched buckets), not O(|table|) — at cluster scale
    n_buckets grows with the table and the touched set is the working
    set.

    Crash protocol is write-then-log, same as incremental_edge_merge:
    the manifest line is the commit point; a crash mid-write leaves an
    unreferenced snap=<n> partial that the replayed batch overwrites
    (the replay recomputes the same next-snapshot id because the crashed
    attempt never appended its line). Old bucket versions are retained —
    snapshots are time-travelable via read_cdc_state(as_of=); expiry
    would prune versions no live snapshot references (not needed at
    contract scale)."""
    import json
    import os

    def bucket_of(col):
        return F.pmod(F.xxhash64(col), F.lit(n_buckets))

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        snaps = _cdc_snapshots(state_dir)
        if any(
            s["batch_id"] == batch_id and s["writer"] == checkpoint_dir
            for s in snaps
        ):
            return  # replayed batch already committed: exactly-once
        snapshot = len(snaps)
        buckets = dict(snaps[-1]["buckets"]) if snaps else {}
        cols = [c for c in batch_df.columns if c != key_col]
        latest = (
            batch_df.groupBy(key_col)
            .agg(F.max_by(F.struct(*cols), F.col(seq_col)).alias("_v"))
            .select(key_col, "_v.*")
            .withColumn("_b", bucket_of(F.col(key_col)))
            .persist()
        )
        touched = sorted(r["_b"] for r in latest.select("_b").distinct().collect())
        if touched:
            old_paths = [
                f"{state_dir}/snap={buckets[str(b)]}/_b={b}"
                for b in touched
                if str(b) in buckets
            ]
            merged = latest
            if old_paths:
                old = spark.read.parquet(*old_paths).withColumn(
                    "_b", bucket_of(F.col(key_col))
                )
                merged = (
                    old.unionByName(latest)
                    .groupBy(key_col)
                    .agg(F.max_by(F.struct("_b", *cols), F.col(seq_col)).alias("_v"))
                    .select(key_col, "_v.*")
                )
            merged.write.partitionBy("_b").mode("overwrite").parquet(
                f"{state_dir}/snap={snapshot}"
            )
            for b in touched:
                buckets[str(b)] = snapshot
        latest.unpersist()
        os.makedirs(state_dir, exist_ok=True)
        with open(os.path.join(state_dir, _CDC_MANIFEST), "a") as f:
            f.write(
                json.dumps(
                    {
                        "snapshot": snapshot,
                        "writer": checkpoint_dir,
                        "batch_id": batch_id,
                        "buckets": buckets,
                    }
                )
                + "\n"
            )

    return (
        change_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cdc_state(
    spark: SparkSession,
    state_dir: str,
    op_col: str = "op",
    as_of: int | None = None,
    include_tombstones: bool = False,
) -> DataFrame | None:
    """The committed CDC snapshot: latest row per key, deletes filtered
    (unless ``include_tombstones``). ``as_of`` reads the table as of that
    snapshot id — every manifest line references only immutable bucket
    versions, so history stays readable at zero copy cost."""
    snaps = _cdc_snapshots(state_dir)
    if as_of is not None:
        snaps = [s for s in snaps if s["snapshot"] <= as_of]
    if not snaps:
        return None
    buckets = snaps[-1]["buckets"]
    paths = [f"{state_dir}/snap={v}/_b={b}" for b, v in buckets.items()]
    if not paths:
        return None
    df = spark.read.parquet(*paths)
    if not include_tombstones:
        df = df.filter(F.col(op_col) != "D")
    return df


# ------------------------------------------------------- record peaks --

PEAKS_OUT_SCHEMA = "user_id long, event_id long, ts timestamp, value double"


def record_peaks(events: DataFrame) -> DataFrame:
    """Streaming record/peak detection: emit every event whose value
    strictly exceeds everything its user emitted before it (in event-time
    order) — the running-max anomaly family (new-record alerting, spike
    triage). A per-user scalar of state via applyInPandasWithState:
    O(active users) state forever, each record emitted exactly once, at
    the batch it arrives.

    Unlike the z-score family, the predicate compares STORED doubles with
    no arithmetic, so the emitted set is bit-deterministic and exactly
    SQL-replayable (value > MAX(value) OVER preceding) — an anomaly
    operator with an exact oracle. In-order arrival is the operator's
    contract (same as any run-length state machine); the caller feeds
    time-ordered micro-batches and each batch is sorted on
    (ts, event_id) before the fold."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        uid = key[0]
        rows = pd.concat(
            [p[["event_id", "ts", "value"]] for p in pdfs], ignore_index=True
        ).sort_values(["ts", "event_id"])
        cur = state.get[0] if state.exists else None
        recs = []
        for eid, ts, v in zip(rows["event_id"], rows["ts"], rows["value"]):
            v = float(v)
            if cur is None or v > cur:
                recs.append((int(eid), ts, v))
                cur = v
        state.update((cur,))
        if recs:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(recs),
                    "event_id": [r[0] for r in recs],
                    "ts": pd.Series([r[1] for r in recs]).dt.as_unit("us"),
                    "value": [r[2] for r in recs],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        PEAKS_OUT_SCHEMA,
        "cur_max double",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def read_hist_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current (latest committed) streaming histogram as
    ``(bin, cnt)``. Raises FileNotFoundError before the first commit."""
    v = _latest_cms_version(state_dir)
    if v is None:
        raise FileNotFoundError(f"no committed histogram state under {state_dir}")
    return spark.read.parquet(f"{state_dir}/v={v}").select("bin", "cnt")


def streaming_histogram(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 512,
):
    """Streaming fixed-range histogram sketch: per micro-batch, count the
    batch's values into ``bins`` equal-width bins over the FIXED [lo, hi)
    range and merge bin counts (sum) into the running state — the
    mergeable quantile sketch for streams. The range must be fixed
    a-priori (a stream cannot run histogram_quantiles' min/max pre-pass
    over future data); out-of-range values clamp into the edge bins, the
    standard fixed-range contract. Because disjoint-batch histograms
    merge losslessly, the drained state equals the batch histogram over
    all data, so quantile readouts (sketches.hist_quantile_readout) are
    batch-exact — which is exactly what the contract oracle checks.

    State commit protocol is streaming_cms's: the <= bins-row state is
    written as a NEW ``v=<batch_id>`` dir per batch, readers take the
    largest ``_SUCCESS``-marked version, replayed batches are skipped by
    the version watermark, superseded versions are pruned only after the
    new commit. NULL values carry no bin and are dropped on both engines.
    """
    import os
    import shutil

    if hi <= lo:
        raise ValueError(f"streaming_histogram: need hi > lo, got [{lo}, {hi})")
    if bins < 1:
        raise ValueError(f"streaming_histogram: bins must be >= 1, got {bins}")

    def update(batch_df: DataFrame, batch_id: int) -> None:
        last = _latest_cms_version(state_dir)
        if last is not None and batch_id <= last:
            return  # replayed batch: already merged, skip
        scaled = (
            (F.col(value_col) - F.lit(lo)) / F.lit(hi - lo) * F.lit(bins)
        )
        bin_ = F.least(
            F.greatest(F.floor(scaled).cast("long"), F.lit(0)),
            F.lit(bins - 1),
        )
        batch_hist = (
            batch_df.filter(F.col(value_col).isNotNull())
            .select(bin_.alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias("cnt"))
        )
        if last is not None:
            current = read_hist_state(spark, state_dir)
            merged = (
                current.unionByName(batch_hist)
                .groupBy("bin")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = batch_hist
        rows = [(r["bin"], r["cnt"]) for r in merged.collect()]
        # overwrite is safe HERE: v=<batch_id> is only ever written by
        # this batch, so the only thing it can clobber is this batch's
        # own crashed partial attempt (no _SUCCESS -> no reader trusts it)
        spark.createDataFrame(rows, "bin long, cnt long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/v={batch_id}")
        for name in os.listdir(state_dir):  # prune AFTER the new commit
            if name.startswith("v=") and name != f"v={batch_id}":
                shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)

    q = (
        stream_df.writeStream.foreachBatch(update)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
