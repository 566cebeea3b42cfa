"""Iteration metrics — the GraphObserver statistics analog (A8, north_rule).

The reference keeps per-observer atomic counters (received / notified /
updated / ignored / failed / pending, GraphObserver.java:28-85) and logs
nodes/sec every `reportFrequency` nodes
(AbstractObservableGraphImporter.java:150-163). Our iterative drivers emit
one metrics dict per iteration — messages exchanged (edge rows shuffled),
delta norms, changed-label counts, skew ratio, wall time, edges/sec — which
the checkpoint manifest persists per iteration (north_rule: "per-partition
lineage and iteration metrics").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_skew(df: DataFrame) -> dict[str, float]:
    """max/mean rows per partition — the skew ratio the north_rule asks for.

    One extra job over the (usually cached/checkpointed) frame; drivers
    sample it on iteration 0 only, since partitioning is fixed thereafter.
    """
    counts = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.avg("count").alias("avg"),
            F.count("*").alias("parts"),
        )
        .collect()[0]
    )
    if not counts["parts"] or not counts["avg"]:
        return {"partitions": 0, "skew_ratio": 0.0}
    return {
        "partitions": int(counts["parts"]),
        "max_partition_rows": int(counts["mx"]),
        "skew_ratio": round(float(counts["mx"]) / float(counts["avg"]), 3),
    }


def iteration_metrics(
    iteration: int,
    wall_sec: float,
    messages: int,
    delta: float | None = None,
    changed: int | None = None,
    extra: dict | None = None,
) -> dict:
    m = {
        "iteration": iteration,
        "wall_sec": round(wall_sec, 3),
        "messages": messages,
        "edges_per_sec": round(messages / wall_sec) if wall_sec > 0 else None,
    }
    if delta is not None:
        m["delta_l1"] = delta
    if changed is not None:
        m["changed"] = changed
    if extra:
        m.update(extra)
    return m
