"""Neo4j bulk-import export (S3/S8 hand-off parity).

The reference's OUTPUT ARTIFACT is a Neo4j store built with the
BatchInserter (BatchGraphImporter.java:7-9). The modern equivalent of that
hand-off is `neo4j-admin database import` over CSV files; this module
writes the pages/edges tables in exactly that format, with the reference's
own property keys (PageNode.java:12-20: url, domain, type, incomingLinks,
outgoingLinks, content, facebookTotalCount, twitterCount) and its
LINKS_TO relationship type (AbstractObservableGraphImporter.java:124).

Written distributed (one CSV part-file per partition, Spark's csv sink —
no driver collect); neo4j-admin accepts multiple files per group:

    neo4j-admin database import full --multiline-fields=true \\
        --nodes=Page=<dir>/nodes/part-*.csv \\
        --relationships=LINKS_TO=<dir>/relationships/part-*.csv

(--multiline-fields because page content is quoted HTML with newlines.)
"""

from __future__ import annotations

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


def export_neo4j_csv(g: GraphTables, out_dir: str) -> dict[str, str]:
    """Write <out_dir>/nodes and <out_dir>/relationships CSV directories in
    neo4j-admin bulk-import format. Returns the two paths."""
    nodes_path = f"{out_dir}/nodes"
    rels_path = f"{out_dir}/relationships"
    (
        g.pages.select(
            *[F.col(src).alias(dst) for src, dst in NODE_COLUMNS]
        ).write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .csv(nodes_path)
    )
    (
        g.edges.select(
            F.col("src").alias(":START_ID"), F.col("dst").alias(":END_ID")
        ).write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .csv(rels_path)
    )
    return {"nodes": nodes_path, "relationships": rels_path}
