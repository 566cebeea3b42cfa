"""Driver contract for the spark-graft builder (PySpark target).

entry():      flagship query (top-50 by in-degree over the derived link
              graph — the reference README's headline query,
              README.md:107-112) at sf0.001.
queries():    one entry per implemented operator family from SURVEY.md §2,
              implemented in webgraph.contract.
oracle_sql(): DuckDB-equivalent SQL for EVERY query — iterative
              algorithms via unrolled fixed-iteration SQL, reachability
              via recursive CTEs, and the probabilistic sketches
              (MinHash-LSH, SimHash, IVF, PQ, CMS, HLL, HyperBall) made
              exactly replayable through engine-portable integer hashing
              and micro-unit rounding. No query lacks an oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from webgraph.contract import q_g_top50_in_degree

    return q_g_top50_in_degree(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from webgraph.contract import QUERIES

    return {name: fns[0] for name, fns in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from webgraph.contract import QUERIES

    return {name: fns[1]() for name, fns in QUERIES.items() if fns[1] is not None}
