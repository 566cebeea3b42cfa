"""Per-round benchmark. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>, ...extras}

Two parts:
1. Headline contract queries at $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1) — the driver-table workload.
2. The primary BASELINE.json metric: edges-processed/sec per PageRank
   iteration on a synthetic hub-skewed web graph built end-to-end from a
   documents corpus (extract -> filter -> dedup -> encode -> iterate).
   Size via $SPARK_GRAFT_BENCH_PAGES (default 200k pages, ~1.6M raw links).

Scaling-efficiency evidence is produced by tools/scaling_bench.py,
which writes BENCH/BASELINE.md.

NOTE: sandbox wall-clock variance is large (hypervisor noise: identical
runs have differed 2-4x); compare medians across runs, not single samples.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webgraph.session import get_spark  # noqa: E402


def _cpu_ticks() -> tuple[int, int]:
    """(total, steal) jiffies from /proc/stat's aggregate cpu line. Steal
    is the hypervisor-contention gauge BENCH/NOTES.md identified as the
    cause of 2-4x wall swings: ticks the guest was runnable but the host
    ran someone else. Measuring its delta around a timed region tells us
    whether THAT window was clean — something a spread heuristic can't
    (r03's resample fired inside the same poisoned window and recorded a
    2.4x-low headline)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError, IndexError):
        return 0, 0


def _steal_window(fn):
    """Run fn(), returning (result, steal_pct of the surrounding window)."""
    t0, s0 = _cpu_ticks()
    out = fn()
    t1, s1 = _cpu_ticks()
    dt = t1 - t0
    return out, round(100.0 * (s1 - s0) / dt, 2) if dt > 0 else 0.0


def run_bench(
    sf_dir: str,
    cpus: int,
    bench_pages: int,
    pr_iters: int = 5,
    spark=None,
) -> dict:
    from pyspark.sql import functions as F

    from webgraph.algos import encode_graph, pagerank
    from webgraph.build import build_graph
    from webgraph.contract import QUERIES
    from webgraph.corpus import synthetic_corpus

    own_session = spark is None
    if own_session:
        spark = get_spark(
            app_name="webgraph-bench",
            master=f"local[{cpus}]",
            shuffle_partitions=max(cpus, 8),
        )

    timings: dict[str, float] = {}
    headline = [
        "g_top50_in_degree",
        "g_pagerank",
        "g_components",
        "g_triangles",
        "g_salsa",
        "t_ngram_similar_pairs",
        "t_repetition",
        "c_stack_filter",
        "d_substring_dedup",
        "g_louvain",
        "t_main_content",
        "t_gopher_rules",
        "g_anchor_text",
        "g_spam_mass",
        "t_c4_filter",
        "e_cosine_topk",
        "s_sessions",
        "s_asof_state",
        "r_pricing_summary",
        "r_customer_nation_revenue",
        "g_knn_degree",
        "e_pq_topk",
    ]
    for name in headline:
        fn = QUERIES[name][0]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        assert n >= 0

    # --- primary metric: web-graph PageRank throughput -------------------
    steal_thresh = float(os.environ.get("SPARK_GRAFT_STEAL_PCT_MAX", "5"))
    t0 = time.time()
    # Persist the generated corpus: build_graph scans documents 3x (page
    # dedup, link extraction, filters); a real corpus is a materialized
    # table, so caching makes the measured build representative. Corpus
    # generation is timed SEPARATELY (corpus_prep) — the build line
    # measures the build plan, not the data generator.
    docs = synthetic_corpus(
        spark,
        n_pages=bench_pages,
        n_sites=max(10, bench_pages // 20000),
        links_per_page=8,
        seed=42,
        partitions=cpus * 2,
    ).persist()
    docs.count()
    timings["corpus_prep"] = round(time.time() - t0, 3)

    def _build_once():
        t1 = time.time()
        g = build_graph(docs, ["example.com"])
        e = encode_graph(g.edges, partitions=cpus * 2)
        return e, round(time.time() - t1, 3)

    # Steal-bracketed build sampling (r05 — closes the r04 VERDICT gap:
    # the build was the one number per round that couldn't prove its
    # window). Same protocol as the big-PR loop: bracket each build with
    # /proc/stat steal deltas; if the window was dirty (steal >= threshold)
    # or the wall blew past the clean-build band, unpersist and rebuild on
    # the cached corpus (up to $SPARK_GRAFT_BUILD_ATTEMPTS, default 3).
    # Report the min wall (steal is additive), the min-attempt's steal_pct,
    # and build_contended if no attempt saw a clean window.
    rerun_thresh = float(os.environ.get("SPARK_GRAFT_BUILD_RERUN_SEC", "60"))
    build_max_attempts = int(os.environ.get("SPARK_GRAFT_BUILD_ATTEMPTS", "3"))
    build_attempts: list[dict] = []
    eg = None
    for i in range(build_max_attempts):
        if eg is not None:
            eg.vertices.unpersist()
            eg.edges.unpersist()
        (eg, t_b), b_steal = _steal_window(_build_once)
        build_attempts.append({"steal_pct": b_steal, "sec": t_b})
        if b_steal < steal_thresh and t_b <= rerun_thresh:
            break
    best_build = min(build_attempts, key=lambda a: a["sec"])
    timings["web_graph_build"] = best_build["sec"]
    for j, a in enumerate(build_attempts[1:], start=2):
        timings[f"web_graph_build_attempt{j}"] = a["sec"]
    build_contended = not any(
        a["steal_pct"] < steal_thresh for a in build_attempts
    )

    ranks, metrics = pagerank(
        eg, tol=0.0, max_iter=pr_iters, collect_skew=False
    )
    # materialized per-iteration via localCheckpoint; sum the iteration walls
    iter_secs = [m["wall_sec"] for m in metrics]
    n_edges = metrics[0]["messages"]
    # steady-state throughput: drop the warm-up iteration; min statistic
    # (steal is additive — BENCH/NOTES.md)
    steady = iter_secs[1:] or iter_secs
    eps_iter = n_edges / min(steady)
    timings["pagerank_iterations"] = round(sum(iter_secs), 3)

    # --- headline throughput: 30M-edge direct graph (matches the
    # BENCH/BASELINE.md scaling configuration) ---------------------------
    from webgraph.algos.common import from_int_edges
    from webgraph.corpus import synthetic_edges

    big_edges = int(os.environ.get("SPARK_GRAFT_BENCH_EDGES", "30000000"))
    t0 = time.time()
    big = from_int_edges(
        synthetic_edges(spark, n_vertices=big_edges // 12, n_edges=big_edges,
                        partitions=cpus * 4)
    )
    timings["big_graph_prep"] = round(time.time() - t0, 3)
    # MIN steady iteration, per BENCH/NOTES.md protocol: hypervisor steal
    # is strictly additive, so the min is the least-contended estimate.
    # Steal-aware sampling (r04+): each 4-iteration sample is bracketed by
    # /proc/stat steal readings; resample (up to $SPARK_GRAFT_BENCH_ATTEMPTS,
    # default 5) until a sample lands in a low-steal window (< threshold %
    # AND steady-iteration spread <= 2x). The min is taken over ALL
    # attempts' steady walls; if no clean window appears the run is
    # flagged contended=true instead of silently recording a poisoned
    # number (r03's spread-only guard resampled once inside the same
    # poisoned window and published 2.4x low).
    max_attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "5"))
    # Early-exit bar tightened r05: a 4.4% steal window (under the 5%
    # accept threshold) measured 2x slower than the 0.05% samples on
    # record — sub-threshold steal still poisons the number. So only a
    # PRISTINE window (< 1% by default) stops the sampling early; any
    # dirtier sample keeps resampling until attempts run out, and the
    # min over ALL attempts' steady walls remains the estimator (steal
    # is additive, so min = least contended).
    pristine_thresh = float(os.environ.get("SPARK_GRAFT_STEAL_PCT_PRISTINE", "1"))
    attempts: list[dict] = []
    steady_walls: list[float] = []
    big_metrics = None
    for i in range(max_attempts):
        metrics_i, steal_pct = _steal_window(
            lambda: pagerank(big, tol=0.0, max_iter=4, collect_skew=False)[1]
        )
        if big_metrics is None:
            big_metrics = metrics_i
        walls = [m["wall_sec"] for m in metrics_i]
        steady = walls[1:]
        attempts.append(
            {"steal_pct": steal_pct, "iter_sec": walls, "sum_sec": round(sum(walls), 3)}
        )
        steady_walls += steady
        if steal_pct < pristine_thresh and max(steady) / min(steady) <= 2.0:
            break
    big_walls = attempts[0]["iter_sec"]
    big_steady = min(steady_walls)
    # the attempt that produced the headline min — its steal is the
    # number's cleanliness certificate
    best_attempt = min(attempts, key=lambda a: min(a["iter_sec"][1:]))
    contended = not any(
        a["steal_pct"] < steal_thresh
        and max(a["iter_sec"][1:]) / min(a["iter_sec"][1:]) <= 2.0
        for a in attempts
    )
    timings["big_pagerank_iterations"] = round(sum(big_walls), 3)
    for j, a in enumerate(attempts[1:], start=2):
        timings[f"big_pagerank_iterations_attempt{j}"] = a["sum_sec"]

    total = round(sum(timings.values()), 3)
    eps_big = round(big.edges.count() / big_steady)
    # value IS the BASELINE.json primary metric (edges-processed/sec per
    # PageRank iteration); total wall-clock lives in total_bench_sec.
    result = {
        "metric": "edges_processed_per_sec_per_pagerank_iteration",
        "value": eps_big,
        "unit": "edges/sec/iteration",
        "queries": timings,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "total_bench_sec": total,
        "edges_per_sec_per_iteration": eps_big,
        "graph_edges": int(big_metrics[0]["messages"]),
        "graph_vertices": int(big.num_vertices),
        "pagerank_iter_sec": big_walls,
        "pipeline_edges_per_sec_per_iteration": round(eps_iter),
        "pipeline_graph_edges": int(n_edges),
        "pipeline_iter_sec": iter_secs,
        "cpus": cpus,
        "steady_stat": "min",
        "steal_pct": best_attempt["steal_pct"],
        "steal_attempts": attempts,
        "contended": contended,
        "build_steal_pct": best_build["steal_pct"],
        "build_attempts": build_attempts,
        "build_contended": build_contended,
    }
    if own_session:
        spark.stop()
    return result


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "200000"))
    result = run_bench(sf_dir, cpus, bench_pages)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
