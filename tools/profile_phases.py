"""Phase-level wall breakdown for the bench's iterative contract queries
(round-6 instrumentation; not used by bench.py). Prints one JSON line per
phase so the optimization doc can cite where the seconds go.

Usage: python tools/profile_phases.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F

    from webgraph.session import get_spark

    spark = get_spark(
        app_name="profile-phases",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )

    def t(label, fn):
        t0 = time.time()
        out = fn()
        print(json.dumps({"phase": label, "sec": round(time.time() - t0, 3)}),
              flush=True)
        return out

    from webgraph.algos import pagerank
    from webgraph.algos.common import from_int_edges
    from webgraph.contract import PR_ITERS, DAMPING, derived_edges

    # warm pass so the breakdown isn't first-query-initialization noise
    t("warm_g_top50", lambda: derived_edges(spark, sf_dir)
        .groupBy("dst").count().orderBy(F.desc("count")).limit(50).collect())

    for rep in range(2):
        e = t(f"[{rep}] derived_edges+distinct (lazy)", lambda: derived_edges(spark, sf_dir))
        g = t(f"[{rep}] from_int_edges", lambda: from_int_edges(e))
        ranks, metrics = t(f"[{rep}] pagerank 5 iters", lambda: pagerank(
            g, damping=DAMPING, tol=0.0, max_iter=PR_ITERS, collect_skew=False))
        print(json.dumps({"phase": f"[{rep}] iter_walls",
                          "walls": [round(m["wall_sec"], 3) for m in metrics]}),
              flush=True)
        t(f"[{rep}] final select+noop", lambda: ranks.select(
            "vid", F.round(F.col("rank") * 1e6).cast("long").alias("rank_e6"))
            .write.format("noop").mode("overwrite").save())
        g.edges.unpersist()
        g.vertices.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
