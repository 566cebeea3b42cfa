"""Storage layout — the index-maintenance analog (S5) plus partition
sizing (E3).

The reference maintains exact Lucene indexes on (url, domain, type)
(BatchGraphImporter.java:215-221) and chunks work into 20-page units
(ListChunker.java:14-42). In Spark those become physical layout decisions:

- point lookups: sort files by url within partitions so parquet min/max
  stats prune row groups (the poor man's index); at cluster scale, bucket
  `pages` by url and `edges` by src so the J1/J2 joins are shuffle-free.
- scan queries: partition the written table BY domain/type directories so
  `WHERE domain = X` prunes whole files.
- chunking: Arrow batch size / rows-per-partition control.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_pages_indexed(pages: DataFrame, path: str, partitions: int = 32) -> None:
    """Write `pages` laid out for point lookups + domain/type scans:
    directory-partitioned by type, sorted by url within files (row-group
    pruning on url predicates — the pages-index analog)."""
    (
        pages.repartition(partitions, "url")
        .sortWithinPartitions("url")
        .write.mode("overwrite")
        .partitionBy("type")
        .parquet(path)
    )


def write_edges_bucketed(
    edges: DataFrame, table_name: str, buckets: int = 64
) -> None:
    """Bucket `edges` by src into a managed table: every downstream
    src-keyed join/aggregation is then shuffle-free (CSR-partition
    analog). Requires a warehouse-backed catalog."""
    (
        edges.write.mode("overwrite")
        .bucketBy(buckets, "src")
        .sortBy("src")
        .saveAsTable(table_name)
    )


def chunk_partitions(df: DataFrame, rows_per_chunk: int, total_rows: int | None = None) -> DataFrame:
    """Repartition so each partition holds ~rows_per_chunk rows — the
    ListChunker analog (ListChunker.java:14-42): ceil(n / chunk) chunks,
    last one short."""
    n = total_rows if total_rows is not None else df.count()
    parts = max(1, math.ceil(n / rows_per_chunk))
    return df.repartition(parts)


def num_chunks(n: int, rows_per_chunk: int) -> int:
    """ceil-division chunk count (ListChunkerTest.java:15-111 arithmetic)."""
    if rows_per_chunk < 1:
        raise ValueError("rows_per_chunk must be >= 1")
    return max(1, math.ceil(n / rows_per_chunk)) if n > 0 else 0
