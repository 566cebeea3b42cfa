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


_FAMILIES = {
    "tinyint": "i8", "int8": "i8",
    "smallint": "i16", "int16": "i16",
    "int": "i32", "integer": "i32", "int32": "i32",
    "bigint": "i64", "int64": "i64",
    "hugeint": "i128", "int128": "i128",
    "float": "f32", "real": "f32",
    "double": "f64", "float64": "f64",
    "string": "str", "varchar": "str",
    "boolean": "bool", "bool": "bool",
    "date": "date", "timestamp": "ts", "timestamp_ns": "ts",
    "timestamp with time zone": "ts", "timestamp_ntz": "ts",
}


def _family(type_str):
    t = type_str.strip().lower()
    if t.startswith(("decimal", "numeric")):
        return "decimal"
    if t.startswith(("array", "list", "struct", "map")):
        return "nested"
    return _FAMILIES.get(t, t)


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

    # no console progress bar: the sweep log is a tracked artifact and
    # \r-progress frames would pollute it
    spark = get_spark(
        app_name="contract-check",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

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
        otypes = [str(t) for t in res.types]
        orows = res.fetchall()
        t_duck = time.time() - t0
        problems = []
        # Driver's value hash is type-sensitive: DuckDB HUGEINT vs Spark
        # BIGINT trips it even when values match (round-2 lesson). Map both
        # sides to a coarse type family and require equality per column.
        stypes = {f.name: _family(f.dataType.simpleString()) for f in sdf.schema.fields}
        for c, t in zip(ocols, otypes):
            fam = _family(t)
            if c in stypes and fam != stypes[c]:
                problems.append(f"type mismatch col {c}: duckdb {t} vs spark family {stypes[c]}")
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
