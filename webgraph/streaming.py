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


def incremental_edge_merge(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    domains: list[str],
    checkpoint_dir: str,
):
    """Micro-batch graph maintenance: every batch of new documents is
    extracted/filtered and merged into the persistent edge table with the
    same get-or-create/dedup semantics as the batch build (J1/J3) — the
    observer-consumer loop as foreachBatch. Returns the StreamingQuery.

    State layout: <state_dir>/edges parquet; each batch rewrites the
    (small) union of old + genuinely-new edges. On Iceberg this is a
    MERGE INTO; parquet-backed here."""
    import os

    from webgraph.build import build_graph

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        g = build_graph(batch_df, domains)
        new_edges = g.edges
        edges_path = os.path.join(state_dir, "edges")
        try:
            existing = spark.read.parquet(edges_path)
        except Exception:
            existing = None
        if existing is not None:
            merged = existing.unionByName(new_edges).dropDuplicates(["src", "dst"])
        else:
            merged = new_edges
        merged.write.mode("overwrite").parquet(edges_path + ".tmp")
        tmp = spark.read.parquet(edges_path + ".tmp")
        tmp.write.mode("overwrite").parquet(edges_path)

    return (
        docs_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
