"""Bucketed-layout vs plain-parquet edge table: what does the committed
CSR-style layout (layout.write_edges_bucketed) actually buy?

tests/test_plans.py::test_bucketed_tables_join_without_shuffle pins the
PHYSICAL claim (bucketed+sorted tables sort-merge-join with zero
Exchange). This tool quantifies the WALL effect on the PageRank
preparation path — the out-degree aggregate + edges⋈degree join that
turns a stored edge table into the weighted iteration frame:

  plain parquet:  scan -> Exchange(src) for the aggregate
                       -> Exchange(src) for the join side
  bucketed table: scan (already hash(src)-clustered) -> neither Exchange

Per-ITERATION cost is identical either way once the weighted frame is
persisted (pagerank caches it) — the layout pays on the one-time
derivation, which at 100 TB is the dominant full-table shuffle of an
analytics session, and on any engine restart that re-derives it.

Broadcast is disabled for the measured joins: at bench scale the 2.5M-row
degree frame fits under the broadcast threshold, which would hide the
exchange being measured; at 10^9+ vertices it does not broadcast, so the
big-big join IS the cluster-scale shape.

Emits one JSON line; run on an idle box (steal/spread noise applies).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _cpu_ticks  # noqa: E402
from webgraph.session import get_spark  # noqa: E402


def _exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def _prep(edges):
    """The pagerank weighted-edge derivation (pagerank.py:89-97 shape)."""
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    return edges.join(out_deg, "src", "inner").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    )


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_edges = int(os.environ.get("SPARK_GRAFT_BENCH_EDGES", "30000000"))
    buckets = cpus
    base = os.environ.get("SPARK_GRAFT_BUCKET_DIR", "/tmp/bucketed_bench")
    spark = get_spark(
        app_name="bucketed-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=buckets,  # must equal bucket count for reuse
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    from webgraph.corpus import synthetic_edges

    edges = synthetic_edges(
        spark, n_vertices=n_edges // 12, n_edges=n_edges, partitions=cpus * 4
    ).select(F.col("src").cast("long"), F.col("dst").cast("long")).distinct()

    plain_path = f"{base}/plain"
    edges.write.mode("overwrite").parquet(plain_path)
    spark.sql("DROP TABLE IF EXISTS bench_edges_bucketed")
    (
        spark.read.parquet(plain_path)
        .write.mode("overwrite")
        .bucketBy(buckets, "src")
        .sortBy("src")
        .option("path", f"{base}/bucketed")
        .saveAsTable("bench_edges_bucketed")
    )

    results = {}
    for name, frame in (
        ("plain", spark.read.parquet(plain_path)),
        ("bucketed", spark.table("bench_edges_bucketed")),
    ):
        walls, steals = [], []
        for _ in range(3):
            spark.catalog.clearCache()
            t0, s0 = _cpu_ticks()
            w0 = time.time()
            ew = _prep(frame)
            n = ew.count()
            walls.append(round(time.time() - w0, 3))
            t1, s1 = _cpu_ticks()
            steals.append(round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2))
        results[name] = {
            "prep_wall_sec": walls,
            "min_wall_sec": min(walls),
            "steal_pct": steals,
            "exchanges_in_plan": _exchanges(_prep(frame)),
            "rows": n,
        }

    out = {
        "metric": "pagerank_prep_wall_bucketed_vs_plain",
        "edges": n_edges,
        "buckets": buckets,
        "cpus": cpus,
        **results,
        "speedup_min": round(
            results["plain"]["min_wall_sec"] / results["bucketed"]["min_wall_sec"], 3
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
