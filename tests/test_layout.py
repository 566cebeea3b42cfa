"""Layout/chunking (ListChunkerTest.java:15-111 arithmetic; S5 index-layout
pruning) and enrichment observer statistics (GraphObserver counters)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webgraph import layout
from webgraph.build import build_graph
from webgraph.corpus import fixture_docs
from webgraph.enrich import DeterministicSocialClient, EnrichmentStats, enrich_pages

DOMAINS = ["alpha.example.com", "beta.example.com"]


@pytest.mark.parametrize(
    "n,chunk,want",
    [
        (0, 20, 0),
        (1, 20, 1),
        (20, 20, 1),
        (21, 20, 2),
        (100, 20, 5),
        (101, 20, 6),
        (5, 1, 5),
    ],
)
def test_chunk_arithmetic(n, chunk, want):
    assert layout.num_chunks(n, chunk) == want


def test_chunk_partitions_shape(spark):
    df = spark.range(0, 100)
    out = layout.chunk_partitions(df, rows_per_chunk=20, total_rows=100)
    assert out.rdd.getNumPartitions() == 5


def test_pages_indexed_layout_prunes(spark, tmp_path):
    g = build_graph(fixture_docs(spark, "star_in"), DOMAINS)
    path = str(tmp_path / "pages_idx")
    layout.write_pages_indexed(g.pages, path, partitions=2)
    re_read = spark.read.parquet(path)
    # directory partitioning by type: a type filter prunes partitions
    homes = re_read.filter(F.col("type") == "home")
    assert homes.count() == 1
    plan = homes.explain(extended=False) or ""
    # and the data round-trips completely
    assert re_read.count() == g.pages.count()
    assert set(re_read.columns) == set(g.pages.columns)


def test_enrichment_stats_counters(spark):
    pages = build_graph(fixture_docs(spark, "star_in"), DOMAINS).pages
    stats = EnrichmentStats(spark)
    out = enrich_pages(pages, DeterministicSocialClient(), stats=stats)
    out.collect()
    d = stats.as_dict()
    assert d["received"] == 5 and d["updated"] == 5
    assert d["failed"] == 0

    # failure path: counters record retries and final failure
    stats2 = EnrichmentStats(spark)
    out2 = enrich_pages(
        pages, DeterministicSocialClient(fail_first=99), max_retries=2, stats=stats2
    )
    out2.collect()
    d2 = stats2.as_dict()
    assert d2["failed"] == d2["received"] > 0
    assert d2["retried"] >= 1


def test_neo4j_csv_export(spark, tmp_path):
    """neo4j-admin bulk-import hand-off: reference property keys
    (PageNode.java:12-20), :ID/:START_ID/:END_ID columns, quoted content,
    one part-file per partition (distributed write, no driver collect)."""
    import csv
    import glob

    from webgraph.build import build_graph
    from webgraph.corpus import fixture_docs
    from webgraph.export import export_neo4j_csv

    g = build_graph(fixture_docs(spark, "star_in"), ["alpha.example.com"])
    # force a multi-partition write: THE failure mode of per-part headers
    # is every file after the first feeding its header line in as data
    g = g._replace(pages=g.pages.repartition(4), edges=g.edges.repartition(4))
    paths = export_neo4j_csv(g, str(tmp_path / "neo4j"))

    node_header = [
        "url:ID", "domain", "type", "content",
        "incomingLinks:long", "outgoingLinks:long",
        "facebookTotalCount:int", "twitterCount:int",
    ]
    with open(f"{paths['nodes']}/_header.csv") as fh:
        assert fh.read().strip().split(",") == node_header

    node_files = glob.glob(f"{paths['nodes']}/part-*.csv")
    assert len(node_files) > 1
    rows = []
    for f in node_files:
        with open(f) as fh:
            # data files are headerless: neo4j-admin takes the header from
            # _header.csv (listed first) and treats every other line as data
            rows.extend(csv.DictReader(fh, fieldnames=node_header))
    assert len(rows) == 5  # no header rows counted as data
    assert not any(r["url:ID"] == "url:ID" for r in rows)
    hub = next(r for r in rows if r["url:ID"] == "https://www.alpha.example.com/")
    assert hub["incomingLinks:long"] == "4" and hub["type"] == "home"

    with open(f"{paths['relationships']}/_header.csv") as fh:
        assert fh.read().strip().split(",") == [":START_ID", ":END_ID"]
    rel_rows = []
    for f in glob.glob(f"{paths['relationships']}/part-*.csv"):
        with open(f) as fh:
            rel_rows.extend(csv.DictReader(fh, fieldnames=[":START_ID", ":END_ID"]))
    assert len(rel_rows) == 4
    assert all(
        r[":END_ID"] == "https://www.alpha.example.com/" for r in rel_rows
    )
