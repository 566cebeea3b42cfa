"""Round-6 optimization instrumentation (bench.py is FROZEN — extra
measurements live here, per the optimization-guide §1 protocol).

Subcommands:

  plans <out_dir> <suffix> [--sf SF_DIR] [query ...]
      Write `.explain("formatted")` of each named contract query to
      <out_dir>/<query>_<suffix>.txt (the plans/r06/ evidence files).

  time [--sf SF_DIR] [--repeat N] [query ...]
      Isolated per-query timing with the noop sink (guide §1.4: computes
      every column of every row, no optimizer shortcut via count()) and a
      /proc/stat steal bracket per query so each wall carries its own
      window-cleanliness certificate. Prints one JSON line per query.

  priter [n_edges]
      The big-PR loop in isolation: builds the bench-shaped synthetic
      graph, prints per-iteration walls + the ITERATION physical plan
      (bench.py's timed loop body, which query-level explain can't show).

Not a results cache and not used by bench.py; everything recomputes from
the parquet inputs each invocation.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _cpu_ticks():
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError, IndexError):
        return 0, 0


def _steal_window(fn):
    t0, s0 = _cpu_ticks()
    out = fn()
    t1, s1 = _cpu_ticks()
    dt = t1 - t0
    return out, round(100.0 * (s1 - s0) / dt, 2) if dt > 0 else 0.0


def _spark(cpus: int):
    from webgraph.session import get_spark

    return get_spark(
        app_name="bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )


def _parse(argv):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = 1
    names = []
    it = iter(argv)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--repeat":
            repeat = int(next(it))
        else:
            names.append(a)
    return sf_dir, repeat, names


def cmd_plans(argv):
    out_dir, suffix = argv[0], argv[1]
    sf_dir, _, names = _parse(argv[2:])
    from webgraph.contract import QUERIES

    os.makedirs(out_dir, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _spark(cpus)
    for name in names:
        df = QUERIES[name][0](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
    spark.stop()


def cmd_time(argv):
    sf_dir, repeat, names = _parse(argv)
    from webgraph.contract import QUERIES

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _spark(cpus)
    for name in names:
        walls = []
        steals = []
        for _ in range(repeat):
            def run():
                spark.sparkContext.setJobDescription(f"bench_extra: {name}")
                t0 = time.time()
                df = QUERIES[name][0](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                return round(time.time() - t0, 3)

            w, s = _steal_window(run)
            walls.append(w)
            steals.append(s)
        print(
            json.dumps(
                {"query": name, "walls": walls, "steal_pcts": steals, "sf_dir": sf_dir}
            ),
            flush=True,
        )
    spark.stop()


def cmd_priter(argv):
    from pyspark.sql import functions as F

    from webgraph.algos import pagerank
    from webgraph.algos.common import from_int_edges
    from webgraph.corpus import synthetic_edges

    n_edges = int(argv[0]) if argv else 30_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _spark(cpus)
    t0 = time.time()
    big = from_int_edges(
        synthetic_edges(
            spark, n_vertices=n_edges // 12, n_edges=n_edges, partitions=cpus * 4
        )
    )
    print(f"prep {round(time.time()-t0, 3)}s edges={n_edges}", flush=True)

    def run():
        return pagerank(big, tol=0.0, max_iter=4, collect_skew=False)[1]

    attempts = int(argv[1]) if len(argv) > 1 else 1
    best = None
    for i in range(attempts):
        metrics, steal = _steal_window(run)
        walls = [m["wall_sec"] for m in metrics]
        print(
            json.dumps(
                {
                    "attempt": i,
                    "iter_walls": walls,
                    "steal_pct": steal,
                    "steady_min": min(walls[1:]),
                    "eps_iter": round(n_edges / min(walls[1:])),
                }
            ),
            flush=True,
        )
        best = min(best or 1e9, min(walls[1:]))
        if steal < 1.0:
            break
    print(json.dumps({"best_steady_min": best, "best_eps_iter": round(n_edges / best)}), flush=True)
    spark.stop()


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    argv = sys.argv[2:]
    if cmd == "plans":
        cmd_plans(argv)
    elif cmd == "time":
        cmd_time(argv)
    elif cmd == "priter":
        cmd_priter(argv)
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")


if __name__ == "__main__":
    main()
