"""Repeated web_graph_build profiling (round-6): times each phase of the
bench's _build_once in a fresh session, several attempts, with steal
brackets and JVM GC time deltas, to explain the bimodal build walls.

Usage: python tools/profile_build.py [n_attempts] [n_pages]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _cpu_ticks():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7]


def gc_time_ms(spark):
    """Total GC millis across the JVM (local mode: driver==executor)."""
    try:
        beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    except Exception:
        return -1


def main():
    n_attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 200000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from webgraph.algos import encode_graph
    from webgraph.build import build_graph
    from webgraph.corpus import synthetic_corpus
    from webgraph.session import get_spark

    spark = get_spark(
        app_name="profile-build",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    t0 = time.time()
    docs = synthetic_corpus(
        spark, n_pages=n_pages, n_sites=max(10, n_pages // 20000),
        links_per_page=8, seed=42, partitions=cpus * 2,
    ).persist()
    docs.count()
    print(json.dumps({"phase": "corpus_prep", "sec": round(time.time() - t0, 3)}),
          flush=True)

    for i in range(n_attempts):
        t_all, s_all = _cpu_ticks()
        g0 = gc_time_ms(spark)
        t0 = time.time()
        g = build_graph(docs, ["example.com"])
        t_plan = time.time()
        e = encode_graph(g.edges, partitions=cpus * 2)
        t1 = time.time()
        t_all2, s_all2 = _cpu_ticks()
        g1 = gc_time_ms(spark)
        print(json.dumps({
            "attempt": i,
            "plan_sec": round(t_plan - t0, 3),
            "encode_sec": round(t1 - t_plan, 3),
            "total_sec": round(t1 - t0, 3),
            "steal_pct": round(100.0 * (s_all2 - s_all) / max(1, t_all2 - t_all), 2),
            "gc_delta_ms": g1 - g0,
        }), flush=True)
        e.vertices.unpersist()
        e.edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
