"""Dump formatted physical plans of representative contract queries to a
tracked artifact (BENCH/plans_r{N}.txt) — the plan-shape evidence the
plan-pin tests assert (TakeOrderedAndProject for top-k, BroadcastHashJoin
for dimension joins, zero BatchEvalPython outside Arrow seams, no
CartesianProduct) in human-readable form, regenerated per round.

Usage: python tools/dump_plans.py [sf_dir] [out_path]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

# shapes worth reading: top-k, iterative prep, window, banding, Arrow seam
PLAN_QUERIES = [
    "g_top50_in_degree",  # TakeOrderedAndProject, pushed filters
    "g_gap_stats",        # single src-window + hash agg
    "d_line_dedup",       # hash-agg argmin survivor, NO window sort
    "t_stratified_sample",  # broadcast quota table
    "c_code_stats",       # pure codegen, zero Exchange
    "m_phash_dup_pairs",  # Arrow seam + 16-bit band equi-join
    "r_cube",             # one Expand for all grouping sets
    "e_mips_topk",        # broadcast 1-row query, codegen fold dot
    "t_ccnet_buckets",    # distributed exact rank, no single-task window
    "d_snapshot_diff",    # digest-only full outer join
    "t_normalize",        # codegen regexp chain around ONE ArrowEvalPython
    "c_clone_type3",      # distinct-unit shingle bucket join, no cartesian
    "t_kl_shift",         # co-partitioned tok join + broadcast totals
    "e_pq_recall",        # broadcast PQ LUT join + dual windowed top-k
    "g_eigencentrality",  # loop body: join+agg + broadcast 1-row L1 total
    "t_heaps_law",        # distributed exact rank, min-bin agg, 10-row window
    "g_hyperball_harmonic",  # split wide-register init (the codegen fix)
    "c_lang_mismatch",    # skinny-score barrier stops pushdown re-inlining
    "m_vad_segments",     # per-asset islands window over the Arrow seam
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/plans_r05.txt"
    from webgraph.contract import QUERIES
    from webgraph.session import get_spark

    spark = get_spark(app_name="dump_plans", master="local[8]", shuffle_partitions=8)
    chunks = []
    for name in PLAN_QUERIES:
        df = QUERIES[name][0](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        verdicts = []
        for marker in ("BatchEvalPython", "CartesianProduct"):
            verdicts.append(f"{marker}: {'PRESENT' if marker in plan else 'absent'}")
        chunks.append(
            f"{'=' * 72}\n{name}\n{'-' * 72}\n"
            + "\n".join(verdicts)
            + "\n\n"
            + plan
        )
    with open(out_path, "w") as f:
        f.write("\n".join(chunks))
    print(f"wrote {out_path} ({len(PLAN_QUERIES)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
