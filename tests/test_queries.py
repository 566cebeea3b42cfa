"""README query catalog vs hand-computed oracles on a known topology
(README.md:55-166). The fixture graph: two sites, cross-links, one hub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webgraph import queries as Q
from webgraph.build import build_graph
from webgraph.corpus import _doc, _mkdf

DOMAINS = ["alpha.example.com", "beta.example.com"]

HOME_A = "https://www.alpha.example.com/"
HOME_B = "https://www.beta.example.com/"
A = "github.com/acme/alpha"
B = "github.com/acme/beta"


def _p(n):
    return f"https://alpha.example.com/p/{n}.html"


def _q(n):
    return f"https://beta.example.com/p/{n}.html"


@pytest.fixture(scope="module")
def graph(spark):
    # alpha: home -> p1,p2,p3; p1,p2,p3 -> home (hub, in=3)
    # beta: home -> q1; q1 -> alpha home (cross-domain); alpha p1 -> beta q1
    rows = [
        _doc(A, "", [_p(1), _p(2), _p(3)], 0),
        _doc(A, "p/1.html", [HOME_A, _q(1)], 1),
        _doc(A, "p/2.html", [HOME_A], 2),
        _doc(A, "p/3.html", [HOME_A], 3),
        _doc(B, "", [_q(1)], 4),
        _doc(B, "p/1.html", [HOME_A], 5),
    ]
    return build_graph(_mkdf(spark, rows), DOMAINS)


def test_point_lookup(graph):
    rows = Q.page_by_url(graph.pages, HOME_A).collect()
    assert len(rows) == 1
    r = rows[0]
    # in: p1,p2,p3,q1 = 4; out: p1,p2,p3 = 3
    assert r["in_degree"] == 4 and r["out_degree"] == 3
    assert r["facebook_total_count"] is None


def test_count_links_to(graph):
    assert Q.count_links_to(graph.edges, HOME_A).collect()[0][
        "linking_pages"
    ] == 4


def test_min_in_degree_filter(graph):
    rows = Q.pages_with_min_in_degree(graph.pages, 2).collect()
    assert [r["url"] for r in rows] == [HOME_A, _q(1)]
    assert [r["in_degree"] for r in rows] == [4, 2]


def test_top_pages_both_formulations_agree(graph):
    a = Q.top_pages_by_incoming_links(graph.pages, graph.edges, k=3, from_degrees=True)
    b = Q.top_pages_by_incoming_links(graph.pages, graph.edges, k=3, from_degrees=False)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
    assert a.collect()[0]["url"] == HOME_A


def test_home_page_queries(graph):
    assert Q.count_home_pages(graph.pages).collect()[0]["home_pages"] == 2
    rows = Q.home_pages_by_incoming_links(graph.pages).collect()
    assert [r["url"] for r in rows] == [HOME_A, HOME_B]
    rows50 = Q.home_pages_by_incoming_links(graph.pages, min_links=4).collect()
    assert [r["url"] for r in rows50] == [HOME_A]


def test_domain_queries(graph):
    assert Q.count_pages_in_domain(graph.pages, "alpha").collect()[0][
        "pages_in_domain"
    ] == 4
    rows = Q.domain_pages_with_min_in_degree(graph.pages, "alpha", 1).collect()
    assert rows[0]["url"] == HOME_A


def test_cross_domain_links(graph):
    # pages in beta linking out of beta to pages with in_degree >= 2
    rows = Q.cross_domain_links(graph.pages, graph.edges, "beta", threshold=2).collect()
    assert [(r["url"], r["linked_url"]) for r in rows] == [(_q(1), HOME_A)]
    # and from alpha: p1 -> q1 (in_degree 2 >= 2)
    rows_a = Q.cross_domain_links(graph.pages, graph.edges, "alpha", threshold=2).collect()
    assert [(r["url"], r["linked_url"]) for r in rows_a] == [(_p(1), _q(1))]


def test_unfetched_and_enrichment_presence(graph):
    # every page here is fetched; no unfetched rows
    assert Q.count_unfetched_pages(graph.pages).collect()[0]["unfetched_pages"] == 0
    # none enriched yet -> all pages listed
    assert Q.pages_without_enrichment(graph.pages).count() == graph.pages.count()


def test_rank_within_domain(graph):
    rows = Q.rank_pages_within_domain(graph.pages, k=1).collect()
    got = {r["domain"]: r["url"] for r in rows}
    assert got == {"alpha": HOME_A, "beta": _q(1)}


def test_count_pages_by_type(graph):
    got = {r["type"]: r["n"] for r in Q.count_pages_by_type(graph.pages).collect()}
    assert got == {"home": 2, "page": 4}


def test_pages_by_ids(spark, graph):
    from webgraph.algos.common import encode_graph

    eg = encode_graph(graph.edges)
    one = Q.page_by_id(eg.vertices, int(eg.vertices.first()["vid"]))
    assert one.count() == 1
    vids = [r["vid"] for r in eg.vertices.limit(3).collect()]
    got = Q.pages_by_ids(eg.vertices, vids, graph.pages)
    rows = got.collect()
    assert {r["vid"] for r in rows} <= set(vids)
    assert "in_degree" in got.columns  # enriched with page properties


def test_sentinel_social_counts_compat(graph):
    got = Q.with_sentinel_social_counts(graph.pages).select(
        "facebook_total_count", "twitter_count"
    ).distinct().collect()
    # unenriched graph: every NULL becomes the reference's -1 sentinel
    assert [(r[0], r[1]) for r in got] == [(-1, -1)]
