"""Neo4j bulk-import export (S3/S8 hand-off parity).

The reference's OUTPUT ARTIFACT is a Neo4j store built with the
BatchInserter (BatchGraphImporter.java:7-9). The modern equivalent of that
hand-off is `neo4j-admin database import` over CSV files; this module
writes the pages/edges tables in exactly that format, with the reference's
own property keys (PageNode.java:12-20: url, domain, type, incomingLinks,
outgoingLinks, content, facebookTotalCount, twitterCount) and its
LINKS_TO relationship type (AbstractObservableGraphImporter.java:124).

Written distributed (one headerless CSV part-file per partition, Spark's
csv sink — no driver collect) plus ONE single-line `_header.csv` per
group. neo4j-admin reads the header from the FIRST file of each group
only — a header row baked into every part file would be ingested as data
rows by every file after the first (bogus 'url:ID' node + relationships),
so the header lives in its own file and the import command lists it
first:

    neo4j-admin database import full --multiline-fields=true \\
        --nodes=Page=<dir>/nodes/_header.csv,<dir>/nodes/part-.*\\.csv \\
        --relationships=LINKS_TO=<dir>/relationships/_header.csv,<dir>/relationships/part-.*\\.csv

(--multiline-fields because page content is quoted HTML with newlines;
the second element of each group is a neo4j-admin filename regex.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.build import GraphTables

# header names carry neo4j-admin type annotations; the reference's int
# counters (PageNode.java:116-146) stay ints, degrees are long
NODE_COLUMNS = [
    ("url", "url:ID"),
    ("domain", "domain"),
    ("type", "type"),
    ("content", "content"),
    ("in_degree", "incomingLinks:long"),
    ("out_degree", "outgoingLinks:long"),
    ("facebook_total_count", "facebookTotalCount:int"),
    ("twitter_count", "twitterCount:int"),
]

REL_COLUMNS = [":START_ID", ":END_ID"]


def _write_group(df: DataFrame, path: str, header: list[str]) -> None:
    """Headerless distributed CSV parts + a single-line _header.csv.
    The header write is a driver-side one-liner (on a cluster with an
    object store, the same line goes through the Hadoop FS API)."""
    df.write.mode("overwrite").option("header", False).option("escape", '"').csv(path)
    with open(os.path.join(path, "_header.csv"), "w") as f:
        f.write(",".join(header) + "\n")


def export_neo4j_csv(g: GraphTables, out_dir: str) -> dict[str, str]:
    """Write <out_dir>/nodes and <out_dir>/relationships CSV directories in
    neo4j-admin bulk-import format (headerless part files + _header.csv,
    see module docstring). Returns the two paths."""
    nodes_path = f"{out_dir}/nodes"
    rels_path = f"{out_dir}/relationships"
    _write_group(
        g.pages.select(*[F.col(src).alias(dst) for src, dst in NODE_COLUMNS]),
        nodes_path,
        [dst for _, dst in NODE_COLUMNS],
    )
    _write_group(
        g.edges.select(
            F.col("src").alias(":START_ID"), F.col("dst").alias(":END_ID")
        ),
        rels_path,
        REL_COLUMNS,
    )
    return {"nodes": nodes_path, "relationships": rels_path}


def export_webgraph_ascii(
    edges: DataFrame, out_dir: str, partitions: int = 32
) -> str:
    """ASCII adjacency-list export in the WebGraph framework's graph-txt
    shape (Boldi & Vigna's toolchain ingests it with ASCIIGraph: one
    line per source, successors sorted ascending, space-separated —
    public format, documented in the WebGraph distribution): the
    hand-off that lets the compression toolchain g_gap_stats SIZES
    actually build the compressed graph.

    Written distributed: edges range-partitioned by src (so part files
    cover disjoint, ordered src ranges — concatenating parts in
    filename order yields one globally src-sorted file), successors
    sorted inside a per-src hash aggregate (sort_array over the
    collected list — per-row work bounded by out-degree, the bounded
    direction), no driver collect. Returns the output directory."""
    adj = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("succ"))
        .select(
            "src",
            F.concat_ws(
                " ",
                F.col("src").cast("string"),
                F.concat_ws(" ", F.transform("succ", lambda d: d.cast("string"))),
            ).alias("line"),
        )
        .repartitionByRange(partitions, "src")
        .sortWithinPartitions("src")
        .select("line")
    )
    adj.write.mode("overwrite").text(out_dir)
    return out_dir
