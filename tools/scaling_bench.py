"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule's criterion — throughput scaling efficiency >= 0.8 from N to 4N
executors — cannot use a real cluster in this sandbox, so per the task
instructions we run the IDENTICAL PageRank job at two parallelism levels
(local[8] vs local[32]) on the SAME input and report throughput at both
plus efficiency = T_N / (4 * T_4N) (equivalently eps_4N / (4 * eps_N)).

Each level runs in its own subprocess (one JVM per parallelism level, cold
start excluded from iteration timing). Results -> BENCH/BASELINE.md +
BENCH/scaling.json.

Usage:
  python tools/scaling_bench.py                 # orchestrate both levels
  python tools/scaling_bench.py --worker C P I  # one level (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CPUS = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
N4_CPUS = int(os.environ.get("SPARK_GRAFT_SCALE_4N", "16"))
PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "8000000"))
ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "6"))


def worker(cpus: int, pages: int, iters: int) -> None:
    from webgraph.algos import encode_graph, pagerank
    from webgraph.build import build_graph
    from webgraph.corpus import synthetic_corpus
    from webgraph.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
        # Scaling evidence must exercise the at-scale physical plan: at
        # 10^9 vertices the rank side is NOT broadcastable, so the
        # iteration join is a shuffle join. Locally 2M ranks fit under the
        # broadcast threshold and the (single-threaded, driver-side)
        # broadcast build would dominate and mask scaling — disable it.
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    docs = synthetic_corpus(
        spark, n_pages=pages, n_sites=max(10, pages // 20000),
        links_per_page=8, seed=42, partitions=cpus * 2,
    )
    g = build_graph(docs, ["example.com"])
    eg = encode_graph(g.edges, partitions=cpus * 2)
    _, metrics = pagerank(eg, tol=0.0, max_iter=iters, collect_skew=False)
    iter_secs = [m["wall_sec"] for m in metrics]
    steady = iter_secs[1:] or iter_secs
    n_edges = metrics[0]["messages"]
    print(
        json.dumps(
            {
                "cpus": cpus,
                "edges": n_edges,
                "vertices": eg.num_vertices,
                "iter_sec": iter_secs,
                "mean_steady_iter_sec": sum(steady) / len(steady),
                "edges_per_sec_per_iter": n_edges / (sum(steady) / len(steady)),
            }
        )
    )
    spark.stop()


def orchestrate() -> None:
    results = {}
    for cpus in (N_CPUS, N4_CPUS):
        print(f"running PageRank at local[{cpus}] ...", file=sys.stderr)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(cpus), str(PAGES), str(ITERS)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)

    n, n4 = results[N_CPUS], results[N4_CPUS]
    speedup = n["mean_steady_iter_sec"] / n4["mean_steady_iter_sec"]
    ratio = N4_CPUS / N_CPUS
    efficiency = speedup / ratio

    os.makedirs("BENCH", exist_ok=True)
    payload = {
        "n_cpus": N_CPUS,
        "n4_cpus": N4_CPUS,
        "pages": PAGES,
        "results": results,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    with open("BENCH/scaling.json", "w") as f:
        json.dump(payload, f, indent=2)

    md = f"""# BENCH/BASELINE.md — throughput + scaling evidence

Primary metric (BASELINE.json): **edges-processed/sec per PageRank
iteration**; scaling criterion: efficiency >= 0.8 from N to 4N executors,
evidenced here (per task instructions — no real cluster in the sandbox) by
the identical job at two parallelism levels on the same input.

Job: synthetic hub-skewed web corpus ({PAGES:,} pages, 8 links/page) ->
extract/filter/dedup -> vid-encode -> {ITERS} PageRank iterations
(fixed-iteration mode, per-iteration localCheckpoint). Steady-state mean
excludes the warm-up iteration. Graph: {n4["edges"]:,} edges /
{n4["vertices"]:,} vertices.

| parallelism | mean steady iter (s) | edges/sec/iteration |
|---|---|---|
| local[{N_CPUS}] (N) | {n["mean_steady_iter_sec"]:.3f} | {n["edges_per_sec_per_iter"]:,.0f} |
| local[{N4_CPUS}] (4N) | {n4["mean_steady_iter_sec"]:.3f} | {n4["edges_per_sec_per_iter"]:,.0f} |

**Speedup N -> 4N: {speedup:.2f}x over a {ratio:.0f}x core increase ->
scaling efficiency = {efficiency:.3f}** (criterion: >= 0.8).

Per-iteration seconds:
- local[{N_CPUS}]: {n["iter_sec"]}
- local[{N4_CPUS}]: {n4["iter_sec"]}

Reproduce: `python tools/scaling_bench.py` (env: SPARK_GRAFT_BENCH_PAGES,
SPARK_GRAFT_SCALE_N, SPARK_GRAFT_SCALE_4N, SPARK_GRAFT_BENCH_ITERS).
"""
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps(payload))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        orchestrate()
