"""Round-5 hardening: SSSP zero-change early stop, Katz tol loop +
divergence warning, exact substring dedup, Louvain, main-content
extraction. Fixture style follows the suite: tiny hand-checkable graphs
with exact expected values plus structural pins.
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from webgraph.algos.common import from_int_edges


def _graph(spark, edges):
    return from_int_edges(spark.createDataFrame(edges, "src long, dst long"))


# ------------------------------------------------ SSSP early stop ---------


def test_sssp_converged_graph_stops_early(spark):
    # path 0->1->2: settles in 2 relaxation rounds; round 3 changes
    # nothing, so early_stop must break well before max_iter=10
    from webgraph.algos.sssp import shortest_paths

    g = _graph(spark, [(0, 1), (1, 2)])
    state, metrics = shortest_paths(g, source=0, max_iter=10)
    assert len(metrics) < 10
    assert metrics[-1]["changed"] == 0
    dists = {r["vid"]: r["dist"] for r in state.collect()}
    assert dists == {0: 0, 1: 1, 2: 2}


def test_sssp_early_stop_matches_fixed_iteration(spark):
    from webgraph.algos.sssp import shortest_paths

    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (0, 3), (3, 4)])
    fast, _ = shortest_paths(g, source=0, max_iter=8, early_stop=True)
    full, _ = shortest_paths(g, source=0, max_iter=8, early_stop=False)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, full.collect()))


def test_sssp_unreachable_stays_null_and_stops(spark):
    from webgraph.algos.sssp import shortest_paths

    g = _graph(spark, [(0, 1), (2, 3)])
    state, metrics = shortest_paths(g, source=0, max_iter=6)
    # NULL->NULL rounds count as unchanged (eqNullSafe), so the
    # disconnected component can't keep the loop alive
    assert len(metrics) < 6
    dists = {r["vid"]: r["dist"] for r in state.collect()}
    assert dists[2] is None and dists[3] is None


# ------------------------------------------------ Katz tol + divergence ---


def test_katz_tol_converges_and_stops_early(spark):
    from webgraph.algos.katz import katz_centrality

    # small alpha on a DAG: series truncates exactly at the longest path,
    # so delta hits 0 and the tol loop must break before max_iter
    g = _graph(spark, [(0, 1), (1, 2)])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # divergence warning would fail here
        state, metrics = katz_centrality(g, alpha=0.1, max_iter=20, tol=1e-9)
    assert len(metrics) < 20
    k = {r["vid"]: r["katz"] for r in state.collect()}
    # closed form on the 2-path: x0=1, x1=1+a, x2=1+a+a^2
    assert abs(k[0] - 1.0) < 1e-9
    assert abs(k[1] - 1.1) < 1e-9
    assert abs(k[2] - 1.11) < 1e-9


def test_katz_diverging_alpha_warns(spark):
    from webgraph.algos.katz import katz_centrality

    # 2-cycle: lambda_max = 1, so alpha=2 > 1/lambda_max diverges —
    # per-round deltas grow and the guard must raise RuntimeWarning
    g = _graph(spark, [(0, 1), (1, 0)])
    with pytest.warns(RuntimeWarning, match="diverging"):
        katz_centrality(g, alpha=2.0, max_iter=5, tol=1e-12)


def test_katz_fixed_iteration_mode_has_no_delta_pass(spark):
    from webgraph.algos.katz import katz_centrality

    g = _graph(spark, [(0, 1)])
    _, metrics = katz_centrality(g, alpha=0.5, max_iter=3, tol=0.0)
    assert len(metrics) == 3
    assert all("delta" not in m for m in metrics)


# ------------------------------------------- exact substring dedup --------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_dedup_cross_doc_span(spark):
    from webgraph.dedup import substring_dedup

    # B embeds A's full 6-token text after a 2-token unique prefix; with
    # W=4 every B-window touching the shared span repeats with A, the
    # prefix-straddling windows are unique -> B keeps exactly the prefix
    out = substring_dedup(
        _docs(
            spark,
            [(1, "a b c d e f"), (2, "x y a b c d e f")],
        ),
        window_tokens=4,
    )
    got = {r["doc_id"]: (r["text_dedup"], r["n_kept"], r["n_dropped"]) for r in out.collect()}
    assert got[1] == ("a b c d e f", 6, 0)
    assert got[2] == ("x y", 2, 6)


def test_substring_dedup_identical_doc_fully_stripped(spark):
    from webgraph.dedup import substring_dedup

    out = substring_dedup(
        _docs(spark, [(1, "a b c d e"), (2, "a b c d e")]), window_tokens=4
    )
    got = {r["doc_id"]: (r["text_dedup"], r["n_kept"], r["n_dropped"]) for r in out.collect()}
    assert got[1] == ("a b c d e", 5, 0)  # first instance wins
    assert got[2] == ("", 0, 5)


def test_substring_dedup_short_doc_passes_through(spark):
    from webgraph.dedup import substring_dedup

    # 3 tokens < W=4: no windows, intact even though it equals a span of doc 1
    out = substring_dedup(
        _docs(spark, [(1, "a b c d e"), (2, "a b c")]), window_tokens=4
    )
    got = {r["doc_id"]: r["text_dedup"] for r in out.collect()}
    assert got[2] == "a b c"


def test_substring_dedup_within_doc_period(spark):
    from webgraph.dedup import substring_dedup

    # period-4 repetition inside ONE doc: windows at pos>=4 repeat with
    # pos-4, so exactly the first period survives (Lee et al. keep-one)
    out = substring_dedup(
        _docs(spark, [(1, "p q r s p q r s p q r s")]), window_tokens=4
    )
    r = out.collect()[0]
    assert (r["text_dedup"], r["n_kept"], r["n_dropped"]) == ("p q r s", 4, 8)


def test_substring_dedup_case_folded_match_keeps_original_case(spark):
    from webgraph.dedup import substring_dedup

    out = substring_dedup(
        _docs(spark, [(1, "A B C D e"), (2, "a b c d X")]), window_tokens=4
    )
    got = {r["doc_id"]: r["text_dedup"] for r in out.collect()}
    assert got[1] == "A B C D e"  # first instance, original case intact
    assert got[2] == "X"  # covered span dropped despite case difference


# ---------------------------------------------------- Louvain -------------


def test_louvain_two_triangles(spark):
    from webgraph.algos.louvain import louvain

    g = _graph(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)])
    mapping, metrics = louvain(g, max_levels=4, max_rounds=8)
    comm = {}
    for r in mapping.collect():
        comm.setdefault(r["gid"], set()).add(r["vid"])
    assert sorted(sorted(v) for v in comm.values()) == [[0, 1, 2], [3, 4, 5]]
    # known optimum for this graph: Q = 70/196
    assert metrics[0]["q_num"] * 196 == 70 * metrics[0]["q_den"]


def test_louvain_ring_of_cliques_and_monotone_q(spark):
    from webgraph.algos.louvain import louvain

    edges = []
    for c in range(4):
        b = c * 3
        edges += [(b, b + 1), (b + 1, b + 2), (b, b + 2), (b + 2, (b + 3) % 12)]
    g = _graph(spark, edges)
    mapping, metrics = louvain(g, max_levels=5, max_rounds=10)
    comm = {}
    for r in mapping.collect():
        comm.setdefault(r["gid"], set()).add(r["vid"])
    assert sorted(sorted(v) for v in comm.values()) == [
        [0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]
    ]
    # acceptance guard => strictly increasing Q on accepted levels,
    # final (rejected or terminal) level never decreases the kept Q
    accepted = [m["q_num"] for m in metrics if m.get("accepted")]
    assert accepted == sorted(accepted)
    assert all(
        m["q_num"] >= accepted[-1] or not m.get("accepted", True) for m in metrics
    )


@pytest.mark.slow
def test_louvain_deterministic_under_repartitioning(spark):
    from webgraph.algos.common import from_int_edges
    from webgraph.algos.louvain import louvain

    edges = []
    for c in range(3):
        b = c * 4
        edges += [
            (b, b + 1), (b, b + 2), (b, b + 3),
            (b + 1, b + 2), (b + 1, b + 3), (b + 2, b + 3),
        ]
    edges += [(3, 4), (7, 8), (11, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    m1, _ = louvain(from_int_edges(df.repartition(1)), max_levels=4)
    m2, _ = louvain(from_int_edges(df.repartition(16, "dst")), max_levels=4)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


def test_louvain_edgeless_graph_is_identity(spark):
    from webgraph.algos.common import EncodedGraph
    from webgraph.algos.louvain import louvain

    verts = spark.createDataFrame([(i, str(i)) for i in range(4)], "vid long, url string")
    edges = spark.createDataFrame([], "src long, dst long")
    g = EncodedGraph(vertices=verts, edges=edges, num_vertices=4)
    mapping, metrics = louvain(g)
    assert metrics == []
    assert sorted(map(tuple, mapping.collect())) == [(i, i) for i in range(4)]


# ----------------------------------------- main-content extraction --------


_PAGE = """<html><head><title>T</title><script>var x = "</p>";</script>
<style>.a  color red </style></head><body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/c">Contact</a></nav>
<div>This is the real article body with plenty of prose words inside it.</div>
<p>A second paragraph that also has enough words to survive the filter easily.</p>
<p>See <a href="/ref">this reference</a> for more details on the method used here.</p>
<ul><li><a href="/1">One</a></li><li><a href="/2">Two</a></li></ul>
<footer>Copyright 2026 <a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>
</body></html>"""


def test_main_content_extracts_prose_drops_boilerplate(spark):
    from webgraph.text import main_content

    docs = spark.createDataFrame([(1, _PAGE)], "doc_id long, html string")
    r = main_content(docs).collect()[0]
    assert r["main_text"] == (
        "This is the real article body with plenty of prose words inside it.\n"
        "A second paragraph that also has enough words to survive the filter easily.\n"
        "See this reference for more details on the method used here."
    )
    assert r["n_kept"] == 3
    # title fragment, nav, 3 prose, 2 list items, footer => 8 non-empty blocks
    assert r["n_blocks"] == 8


def test_main_content_script_payload_with_fake_close_tag_is_stripped(spark):
    from webgraph.text import main_content

    # the script body contains '</p>' INSIDE a string: the non-greedy
    # (?is) container strip must remove it before block segmentation
    docs = spark.createDataFrame([(1, _PAGE)], "doc_id long, html string")
    r = main_content(docs).collect()[0]
    assert "var x" not in r["main_text"]
    assert "color red" not in r["main_text"]


def test_main_content_link_density_drops_anchor_farm(spark):
    from webgraph.text import main_content

    page = (
        '<div><a href="/x">alpha beta gamma delta epsilon zeta</a></div>'
        "<p>six ordinary words of real prose here</p>"
    )
    docs = spark.createDataFrame([(1, page)], "doc_id long, html string")
    r = main_content(docs, min_words=5, max_link_density=0.5).collect()[0]
    # anchor farm passes min_words (6) but is 100% link chars -> dropped
    assert r["main_text"] == "six ordinary words of real prose here"
    assert (r["n_blocks"], r["n_kept"]) == (2, 1)


def test_main_content_tagless_and_short_docs(spark):
    from webgraph.text import main_content

    docs = spark.createDataFrame(
        [
            (1, "no tags at all but lots of words in this plain text line"),
            (2, "<p>too short</p>"),
        ],
        "doc_id long, html string",
    )
    got = {r["doc_id"]: r for r in main_content(docs).collect()}
    assert got[1]["main_text"].startswith("no tags at all")
    assert got[2]["main_text"] == "" and got[2]["n_blocks"] == 1


# ------------------------------------------- anchor-text aggregation ------


def test_anchor_extraction_pairs_and_normalization(spark):
    from webgraph.extract import extract_anchor_texts

    docs = spark.createDataFrame(
        [
            ("u1", "html",
             '<a href="/a">First  Link</a> x <a class="z" href="/b">SECOND</a>'),
            ("u2", "py", 'href="/a" not parsed: <a href="/c">nope</a>'),
        ],
        "url string, lang string, content string",
    )
    rows = sorted(map(tuple, extract_anchor_texts(docs).collect()))
    # non-markup rows contribute nothing; anchors collapse+fold
    assert rows == [("u1", "/a", "first link"), ("u1", "/b", "second")]


def test_anchor_summary_topk_and_tiebreak(spark):
    from webgraph.extract import anchor_summary

    anchors = spark.createDataFrame(
        [("s1", "/t", "home"), ("s2", "/t", "home"), ("s3", "/t", "zeta"),
         ("s4", "/t", "alpha"), ("s5", "/t", ""), ("s6", "/u", "only")],
        "src string, dst_raw string, anchor string",
    )
    out = {(r["dst_raw"], r["rank"]): (r["anchor"], r["n"])
           for r in anchor_summary(anchors, top_k=2).collect()}
    # count desc then anchor asc; empty anchors dropped
    assert out[("/t", 1)] == ("home", 2)
    assert out[("/t", 2)] == ("alpha", 1)
    assert out[("/u", 1)] == ("only", 1)
    assert ("/t", 3) not in out


# ----------------------------------------------- Gopher rule battery ------


def test_gopher_rules_keeps_clean_prose(spark):
    from webgraph.text import gopher_rules

    prose = " ".join(
        "the quick brown fox jumps over and over with plenty of words that "
        "have to be of use".split() * 4
    )
    docs = spark.createDataFrame([(1, prose)], "doc_id long, text string")
    r = gopher_rules(docs, min_words=20).collect()[0]
    assert r["keep"] is True
    assert r["n_words"] == 72 and r["stop_hits"] >= 2


def test_gopher_rules_rejects_bullet_and_ellipsis_pages(spark):
    from webgraph.text import gopher_rules

    filler = "the words and that have to be of with more text here today now"
    bullets = "\n".join(f"- item {i} {filler}" for i in range(10))
    dots = "\n".join(f"read more about topic {i} {filler} ..." for i in range(10))
    docs = spark.createDataFrame(
        [(1, bullets), (2, dots)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in gopher_rules(docs, min_words=20).collect()}
    assert got[1]["bullet_frac_e4"] == 10000 and got[1]["keep"] is False
    assert got[2]["ellipsis_frac_e4"] == 10000 and got[2]["keep"] is False


def test_gopher_rules_symbol_alpha_and_empty(spark):
    from webgraph.text import gopher_rules

    hashy = " ".join(["#tag"] * 30) + " the of and that be to have with"
    numeric = " ".join(str(i) for i in range(40)) + " the of"
    docs = spark.createDataFrame(
        [(1, hashy), (2, numeric), (3, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in gopher_rules(docs, min_words=20).collect()}
    assert got[1]["symbol_ratio_e4"] > 1000 and got[1]["keep"] is False
    assert got[2]["alpha_frac_e4"] < 8000 and got[2]["keep"] is False
    assert got[3]["n_words"] == 0 and got[3]["keep"] is False


def test_louvain_isolated_vertex_keeps_identity_label(spark):
    from webgraph.algos.common import EncodedGraph
    from webgraph.algos.louvain import louvain

    verts = spark.createDataFrame(
        [(i, str(i)) for i in range(5)], "vid long, url string"
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src long, dst long"
    )
    g = EncodedGraph(vertices=verts, edges=edges, num_vertices=5)
    mapping, _ = louvain(g, max_levels=3)
    got = {r["vid"]: r["gid"] for r in mapping.collect()}
    assert got[3] == 3 and got[4] == 4  # edgeless vertices survive
    assert len({got[0], got[1], got[2]}) == 1  # the triangle merges


# ------------------------------------------------ C4 cleaning battery -----


def _c4(spark, rows):
    from webgraph.text import c4_filter

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in c4_filter(docs).collect()}


def test_c4_line_rules(spark):
    page = "\n".join([
        "This is a perfectly fine sentence with punctuation.",
        "no terminal punctuation on this line",
        "Too short.",
        "Enable javascript to view this page.",
        "Please read our privacy policy before continuing.",
        "Another good sentence survives the filter!",
    ])
    out = _c4(spark, [(1, page)])[1]
    kept = out["clean_text"].split("\n")
    assert kept == [
        "This is a perfectly fine sentence with punctuation.",
        "Another good sentence survives the filter!",
    ]
    assert out["n_lines"] == 6 and out["n_lines_kept"] == 2


def test_c4_page_rules_sentences_lorem_braces(spark):
    good = "\n".join(
        f"Sentence number {i} is long enough to keep." for i in range(6)
    )
    out = _c4(spark, [
        (1, good),
        (2, good + "\nSadly this page contains Lorem Ipsum filler."),
        (3, good + "\nfunction f() { return 1; }"),
        (4, "Only one good sentence lives here."),
    ])
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False          # lorem ipsum
    assert out[3]["keep"] is False          # curly bracket
    assert out[4]["keep"] is False and out[4]["n_sentences"] == 1
    assert out[1]["n_sentences"] == 6


def test_c4_empty_and_whitespace_text(spark):
    out = _c4(spark, [(1, ""), (2, "   \n  ")])
    for d in (1, 2):
        assert out[d]["clean_text"] == ""
        assert out[d]["n_lines_kept"] == 0
        assert out[d]["keep"] is False


# ------------------------------------------------ TrustRank spam mass -----


def test_spam_mass_vectors_and_identity(spark):
    import math

    from webgraph.algos import spam_mass

    # trusted core 0-1-2 densely linked; spam farm 3<->4 boosting 5
    g = _graph(spark, [
        (0, 1), (1, 2), (2, 0), (1, 0), (2, 1),
        (3, 4), (4, 3), (3, 5), (4, 5), (5, 3),
    ])
    sm = spam_mass(g, trusted_seeds=[0], damping=0.85, tol=0.0,
                   max_iter=12, collect_skew=False)
    rows = {r["vid"]: r for r in sm.collect()}
    assert math.isclose(sum(r["pr"] for r in rows.values()), 1.0, abs_tol=1e-9)
    assert math.isclose(sum(r["tr"] for r in rows.values()), 1.0, abs_tol=1e-9)
    # mass = pr - tr identically, and sums to ~0
    for r in rows.values():
        assert math.isclose(r["mass"], r["pr"] - r["tr"], abs_tol=1e-12)
    assert math.isclose(sum(r["mass"] for r in rows.values()), 0.0, abs_tol=1e-9)
    # the farm (unreachable from the trusted seed) has rel_mass ~ 1;
    # the trusted cluster's rank is covered by trust (rel_mass << 1)
    for v in (3, 4, 5):
        assert rows[v]["rel_mass"] > 0.95
    for v in (0, 1, 2):
        assert rows[v]["rel_mass"] < 0.5


def test_spam_mass_rejects_unknown_seed(spark):
    from webgraph.algos import spam_mass

    g = _graph(spark, [(0, 1)])
    with pytest.raises(ValueError):
        spam_mass(g, trusted_seeds=[99], max_iter=2).collect()


# ------------------------------------------------ Leiden refinement -------


def test_refine_splits_disconnected_community_and_raises_modularity(spark):
    from webgraph.algos.community import modularity
    from webgraph.algos.louvain import refine_connected

    # two triangles with NO edge between them, forced into ONE community
    g = _graph(spark, [
        (0, 1), (1, 2), (2, 0),
        (10, 11), (11, 12), (12, 10),
    ])
    bad = g.vertices.select("vid", F.lit(0).alias("gid"))
    refined, _ = refine_connected(bad, g)
    got = {r["vid"]: r["gid"] for r in refined.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}

    q_bad = modularity(g, bad).collect()[0]["modularity_e6"]
    q_ref = modularity(g, refined).collect()[0]["modularity_e6"]
    assert q_ref > q_bad  # splitting a disconnected community raises Q


def test_refine_is_identity_on_connected_communities(spark):
    from webgraph.algos.louvain import louvain, refine_connected

    # two 4-cliques joined by one bridge: louvain finds them, both connected
    clique = lambda off: [
        (off + i, off + j) for i in range(4) for j in range(4) if i != j
    ]
    g = _graph(spark, clique(0) + clique(10) + [(0, 10)])
    mapping, _ = louvain(g)
    refined, _ = refine_connected(mapping, g)

    # labels differ by convention (louvain: exemplar gid; refine: min vid)
    # so compare the PARTITIONS, canonicalized to frozensets of members
    def parts(df):
        groups = {}
        for r in df.collect():
            groups.setdefault(r["gid"], set()).add(r["vid"])
        return {frozenset(v) for v in groups.values()}

    assert parts(mapping) == parts(refined)


def test_refine_keeps_isolated_vertices_singleton(spark):
    from webgraph.algos.common import EncodedGraph
    from webgraph.algos.louvain import refine_connected

    base = _graph(spark, [(0, 1)])
    verts = base.vertices.sparkSession.createDataFrame(
        [(0,), (1,), (7,)], "vid long"
    ).withColumn("url", F.col("vid").cast("string"))
    g = EncodedGraph(vertices=verts, edges=base.edges, num_vertices=3)
    labels = verts.select("vid", F.lit(0).alias("gid"))
    refined, _ = refine_connected(labels, g)
    got = {r["vid"]: r["gid"] for r in refined.collect()}
    assert got == {0: 0, 1: 0, 7: 7}
