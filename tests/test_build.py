"""Graph-build semantics vs GraphImporterTestBase.java:73-225 — URL
idempotency, degree maintenance, edge dedup, UNKNOWN-content link-only
nodes, content upgrade, plus the FIXTURES.md §4 topology oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from webgraph.build import build_graph, graph_counts, root_page
from webgraph.corpus import fixture_docs, synthetic_corpus

DOMAINS = ["alpha.example.com", "beta.example.com"]

HOME_A = "https://www.alpha.example.com/"


def _p(n):
    return f"https://alpha.example.com/p/{n}.html"


def _pages_map(g):
    return {r["url"]: r.asDict() for r in g.pages.collect()}


def test_star_in_degrees(spark):
    g = build_graph(fixture_docs(spark, "star_in"), DOMAINS)
    pages = _pages_map(g)
    hub = pages[HOME_A]
    assert hub["in_degree"] == 4 and hub["out_degree"] == 0
    assert hub["type"] == "home" and hub["domain"] == "alpha"
    for n in range(1, 5):
        leaf = pages[_p(n)]
        assert leaf["out_degree"] == 1 and leaf["in_degree"] == 0
        assert leaf["type"] == "page"
    assert graph_counts(g) == {"pages": 5, "links": 4}


def test_chain_backlink_cycle_and_edge_dedup(spark):
    # root -> p1 -> root cycle; root -> p2 listed twice in content but the
    # edge is deduplicated (GraphImporterTestBase: re-adding changes nothing).
    g = build_graph(fixture_docs(spark, "chain_backlink"), DOMAINS)
    pages = _pages_map(g)
    assert pages[HOME_A]["in_degree"] == 1 and pages[HOME_A]["out_degree"] == 2
    assert pages[_p(1)]["in_degree"] == 1 and pages[_p(1)]["out_degree"] == 1
    assert pages[_p(2)]["in_degree"] == 1 and pages[_p(2)]["out_degree"] == 0
    assert graph_counts(g) == {"pages": 3, "links": 3}


def test_dangling_link_only_node_has_null_content(spark):
    # p9 linked but never fetched -> UNKNOWN content (null), degrees counted
    # (BatchGraphImporter.java:284).
    g = build_graph(fixture_docs(spark, "dangling"), DOMAINS)
    pages = _pages_map(g)
    assert pages[_p(9)]["content"] is None
    assert pages[_p(9)]["in_degree"] == 2 and pages[_p(9)]["out_degree"] == 0
    assert pages[HOME_A]["content"] is not None


def test_self_loop_kept_once(spark):
    g = build_graph(fixture_docs(spark, "self_loop"), DOMAINS)
    edges = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert (HOME_A, HOME_A) in edges
    pages = _pages_map(g)
    assert pages[HOME_A]["in_degree"] == 1 and pages[HOME_A]["out_degree"] == 2


def test_idempotent_refetch_upgrades_content(spark):
    # Same URL fetched twice: one row, later content wins, never downgraded
    # (GraphImporterTestBase.java:73-83; updatePageContent rule).
    g = build_graph(fixture_docs(spark, "idempotent_refetch"), DOMAINS)
    pages = _pages_map(g)
    assert len([u for u in pages if u == _p(1)]) == 1
    assert "v2" in pages[_p(1)]["content"]
    # the refetched page's outlink (added in v2) is present
    assert pages[HOME_A]["in_degree"] == 1


def test_filtered_urls_quarantined_not_in_graph(spark):
    g = build_graph(fixture_docs(spark, "filtered"), DOMAINS)
    urls = set(_pages_map(g))
    assert urls == {HOME_A, _p(1)}
    errs = {r["error_type"]: r["url"] for r in g.errors.collect()}
    assert errs == {"ExcludedDomain": "evil.other.com"}


def test_content_sha256_invariant_vs_source(spark):
    # Per-row invariant (BASELINE.json input_hint): fetched pages keep
    # byte-identical content — sha256 equality against the corpus.
    docs = synthetic_corpus(spark, n_pages=200, n_sites=4, seed=7)
    g = build_graph(docs, ["example.com"])
    from webgraph.extract import with_url

    src = with_url(docs).select(
        "url", F.sha2(F.col("content"), 256).alias("h_src")
    )
    mismatches = (
        g.pages.filter(F.col("content").isNotNull())
        .select("url", F.sha2(F.col("content"), 256).alias("h_page"))
        .join(src, "url", "inner")
        .filter(F.col("h_page") != F.col("h_src"))
        .count()
    )
    assert mismatches == 0


def test_synthetic_corpus_build_and_root(spark):
    docs = synthetic_corpus(spark, n_pages=500, n_sites=5, seed=42)
    g = build_graph(docs, ["example.com"])
    counts = graph_counts(g)
    assert counts["pages"] >= 500
    assert counts["links"] > 500
    root = root_page(g.pages, "https://www.site-0.example.com/").collect()
    assert len(root) == 1 and root[0]["type"] == "home"
    # media/off-domain noise links never become edges
    bad = g.edges.filter(
        F.col("dst").contains("/img/") | F.col("dst").contains("tracker")
    ).count()
    assert bad == 0
    # determinism: same seed -> same graph
    g2 = build_graph(synthetic_corpus(spark, n_pages=500, n_sites=5, seed=42), ["example.com"])
    assert g2.edges.exceptAll(g.edges).count() == 0


def test_multi_seed_union(spark):
    """U2: two seed corpora build into ONE graph — pages get-or-create,
    edge dedup, and content upgrade apply across seeds (App.java:330-340:
    every seed feeds the same importer)."""
    from webgraph.build import build_graph_multi
    from webgraph.corpus import fixture_docs

    # seed 1: the star; seed 2: a component on beta + a REFETCH of the
    # alpha hub (cross-seed content upgrade must win deterministically)
    seed1 = fixture_docs(spark, "star_in")
    seed2 = fixture_docs(spark, "two_components")
    g = build_graph_multi([seed1, seed2], DOMAINS)
    pages = _pages_map(g)

    # alpha home exists ONCE even though both corpora mention it, and the
    # p1 -> home edge both seeds contribute is deduplicated ACROSS seeds
    assert list(pages).count(HOME_A) == 1
    assert pages[HOME_A]["in_degree"] == 4
    # beta pages merged into the same graph
    assert "https://www.beta.example.com/" in pages
    # edges deduplicated across seeds
    assert g.edges.count() == g.edges.dropDuplicates(["src", "dst"]).count()

    # single-corpus degenerate case == plain build
    g1 = build_graph_multi([seed1], DOMAINS)
    assert graph_counts(g1) == graph_counts(build_graph(seed1, DOMAINS))


def test_multi_seed_equal_seq_tiebreak_is_deterministic(spark):
    """Two seeds refetch the same URL at the same seq: the later-listed
    seed's content must win, every run."""
    from webgraph.build import build_graph_multi

    def corpus(content):
        return spark.createDataFrame(
            [
                ("github.com/acme/alpha", "", "c0", "html", content, 0),
            ],
            "repo string, path string, commit string, lang string, "
            "content string, seq long",
        )

    g = build_graph_multi([corpus("from-seed-1"), corpus("from-seed-2")], DOMAINS)
    assert _pages_map(g)[HOME_A]["content"] == "from-seed-2"
