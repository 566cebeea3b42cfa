"""sf0.1 heavyweight sweep (round-5 VERDICT #6): run the heaviest
contract queries at 10x the tuning scale and record walls, so the tuned
constants (max_cluster, bands, df caps) have measured — not assumed —
10x behavior.

Usage: python tools/heavy_sweep.py [sf_dir] [out_json] [name ...]
With names given, only those queries run and their rows are merged into
an existing out_json (incremental re-measure after a constants fix).
Writes one JSON object per query: {name: {"sec": w, "rows": n}} plus a
steal bracket over the whole sweep (same /proc/stat protocol as
bench.py) so a contended run can't masquerade as a scaling problem.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

HEAVY = [
    "e_semdedup",
    "s_stream_cms",
    "s_pagerank_refresh",
    "d_clean_corpus",
    "c_repo_dedup",
    "g_katz",
    "g_betweenness",
    "g_ktruss",
    "d_substring_dedup",
    "g_louvain",
    "t_ngram_similar_pairs",
    "d_minhash_dup_pairs",
    # round-5b..5f additions with non-trivial plans
    "g_msf",
    "g_mis",
    "g_coloring",
    "g_bipartite",
    "g_community_graph",
    "g_landmark_dist",
    "e_covariance",
    "t_pmi_pairs",
    "t_bm25",
    "r_sessionize",
    "s_stream_join",
    "t_heavy_hitters",
    # round-5g additions
    "g_bowtie",
    "g_knn_degree",
    "c_import_graph",
    # round-5h additions that scale with corpus/event volume
    "t_dup_ngram_frac",
    "s_trending_topk",
    "g_temporal_reach",
    # round-5i additions with iterative/windowed plans
    "s_cc_refresh",
    "g_node2vec_walks",
    "g_label_spread",
    "t_bpe_merges",
    "g_gap_stats",
    # round-5j additions with iterative/streamed/windowed plans
    "g_condensation_levels",
    "g_attack_lcc",
    "c_import_rank",
    "t_ccnet_buckets",
    "s_late_events",
    "e_top_pc",
    # round-5l additions: iterative walks, 3-join motif, Arrow NFC seam,
    # shingle bucket join
    "g_simrank",
    "g_four_cliques",
    "t_normalize",
    "c_clone_type3",
    # round-5n additions: register merge + exact-ball compare, exploded
    # token double-agg, expectation iteration, PQ encode + dual top-k
    "g_anf_error",
    "t_kl_shift",
    "g_hitting",
    "e_pq_recall",
    # round-5o additions: normalized power iteration, per-edge Brandes
    # resolution over the materialized sweep
    "g_eigencentrality",
    "g_edge_betweenness",
    # round-5p additions: wide-register sweep + per-round estimates,
    # distributed-exact rank + explode + min-bin aggregate
    "g_hyperball_harmonic",
    "t_heaps_law",
    # round-5q additions: 64-vote signature agg + banded join over the
    # doubled corpus; 4-micro-batch drain paying the state-commit floor
    "d_simhash_recall",
    "s_stream_quantiles",
    # round-5r additions: skinny-score barrier + attribute filter;
    # per-asset gaps-and-islands over the Arrow frame seam
    "c_lang_mismatch",
    "m_vad_segments",
    # round-5s additions: label-filtered windowed top-k; broadcast
    # radius scan
    "e_filtered_topk",
    "e_range_search",
    # round-5t addition: register sweep + pair-table expansion compared
    "g_harmonic_error",
    # round-5u addition: two exact-percentile passes + broadcast fences
    "r_mad_outliers",
    # round-5v addition: (repo, commit)-bucketed pair join + cap drop
    "c_cochange",
    # light round-5 rows kept for per-round 10x coverage symmetry
    "g_pseudo_diameter",
    "c_churn",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/heavy_sweep_r05.json"
    names = sys.argv[3:] or HEAVY

    from bench import _steal_window
    from webgraph.contract import QUERIES
    from webgraph.session import get_spark

    spark = get_spark(app_name="heavy-sweep", shuffle_partitions=32)

    results: dict[str, dict] = {}
    if len(sys.argv) > 3:  # incremental: keep prior rows, re-measure names
        try:
            with open(out_path) as f:
                results = json.load(f)["queries"]
        except FileNotFoundError:
            pass

    def run_all():
        for name in names:
            fn = QUERIES[name][0]
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            w = round(time.time() - t0, 2)
            results[name] = {"sec": w, "rows": int(n)}
            print(f"{name}: {w}s ({n} rows)", flush=True)

    _, steal_pct = _steal_window(run_all)
    out = {"sf_dir": sf_dir, "steal_pct": steal_pct, "queries": results,
           "total_sec": round(sum(r["sec"] for r in results.values()), 2)}
    if len(sys.argv) > 3:
        # steal bracket covers only the re-measured names this run
        out["steal_pct_window"] = names
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
