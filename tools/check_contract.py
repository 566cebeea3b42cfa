"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir; compare row count, column names, and
order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb


def normalize(rows, columns):
    out = []
    for row in rows:
        d = dict(zip(columns, row))
        out.append(tuple((c, repr(d[c])) for c in sorted(columns)))
    return sorted(out)


def main():
    sys.stdout.reconfigure(line_buffering=True)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from webgraph.contract import TABLES
    from webgraph.session import get_spark

    spark = get_spark(app_name="contract-check", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows-only check, {len(srows)} rows ({t_spark:.1f}s)")
            if len(srows) == 0:
                failures.append((name, "zero rows (rows-only)"))
            continue
        t0 = time.time()
        res = con.sql(oracles[name])
        ocols = res.columns
        orows = res.fetchall()
        t_duck = time.time() - t0
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {scols} vs {ocols}")
        elif len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        else:
            a = normalize(srows, scols)
            b = normalize(orows, ocols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        status = "OK " if not problems else "FAIL"
        print(
            f"  {status} {name}: {len(srows)} rows (spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)"
        )
        for p in problems:
            print(f"       {p}")
            failures.append((name, p))

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
