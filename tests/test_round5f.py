"""Round-5f operators: PMI collocations, canonical-URL dedup, community
supergraph."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from webgraph.algos.common import from_int_edges


# ---------------------------------------------------------- PMI -----------


def _pmi_py(docs, min_count):
    toks = [t.lower().split() for t in docs]
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    tt = bb = 0
    for ws in toks:
        tt += len(ws)
        bb += max(len(ws) - 1, 0)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b_ in zip(ws, ws[1:]):
            bi[(a, b_)] = bi.get((a, b_), 0) + 1
    out = {}
    for (x, y), nxy in bi.items():
        if nxy < min_count:
            continue
        pmi = math.log((nxy / bb) / ((uni[x] / tt) * (uni[y] / tt)))
        out[(x, y)] = (nxy, round(pmi * 1e6))
    return out


def test_pmi_matches_reference_math(spark):
    from webgraph.text import pmi_collocations

    docs = [
        "new york new york is big",
        "new york has new things",
        "york new is rare here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["x"], r["y"]): (r["n_xy"], r["pmi_e6"])
        for r in pmi_collocations(df, k=50, min_count=2).collect()
    }
    assert got == _pmi_py(docs, 2)
    # "new york" must outrank "york new"-style accidental pairs
    assert ("new", "york") in got


def test_pmi_empty_tokens_do_not_bridge(spark):
    from webgraph.text import pmi_collocations

    # "a  b" (double space) still pairs (a,b): empties filtered BEFORE
    # pairing, so adjacency is over real words
    df = spark.createDataFrame(
        [(1, "a  b"), (2, "a \n b"), (3, "a b")], "doc_id long, text string"
    )
    got = {
        (r["x"], r["y"]): r["n_xy"]
        for r in pmi_collocations(df, k=10, min_count=3).collect()
    }
    assert got == {("a", "b"): 3}


def test_pmi_rejects_bad_min_count(spark):
    from webgraph.text import pmi_collocations

    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pmi_collocations(df, min_count=0)


# ------------------------------------------------------ URL dedup ---------


def test_url_dedup_collapses_case_and_backslashes(spark):
    from webgraph.dedup import url_dedup

    df = spark.createDataFrame(
        [
            (1, "https://A.com/X"),
            (2, "https://a.com/x"),
            (3, "https:\\\\a.com\\x"),
            (4, "https://b.com/y"),
        ],
        "doc_id long, url string",
    )
    got = {
        r["canonical_url"]: (r["keep_id"], r["n_dups"])
        for r in url_dedup(df).collect()
    }
    assert got == {
        "https://a.com/x": (1, 3),
        "https://b.com/y": (4, 1),
    }


# ---------------------------------------------- community supergraph ------


def test_community_supergraph_two_triangles(spark):
    from webgraph.algos.common import contract_graph
    from webgraph.algos.louvain import louvain

    # two triangles joined by one bridge edge 2->3
    g = from_int_edges(
        spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
            "src long, dst long",
        )
    )
    mapping, _ = louvain(g, max_levels=1, max_rounds=8)
    rolled = contract_graph(g, mapping)
    rows = rolled.collect()
    # the bridge is the only inter-community edge
    assert len(rows) == 1 and rows[0]["weight"] == 1
    comms = {r["gid"] for r in mapping.collect()}
    assert len(comms) == 2


# ------------------------------------------------------ bigram LM ---------


def test_bigram_lm_matches_reference_math(spark):
    from webgraph.text import bigram_lm_score

    docs = {1: "a b a b", 2: "a b zz", 3: "solo"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    # corpus counts: unigrams a:3 b:3 zz:1 solo:1 (V=4)
    # bigrams: (a,b):2+1=3? doc1: (a,b),(b,a),(a,b); doc2: (a,b),(b,zz)
    uni = {"a": 3, "b": 3, "zz": 1, "solo": 1}
    bi = {("a", "b"): 3, ("b", "a"): 1, ("b", "zz"): 1}
    k, v = 0.1, 4

    def nll(pair):
        x, _ = pair
        p = (bi[pair] + k) / (uni[x] + k * v)
        return round(-math.log(p) * 1e6)

    want = {
        1: (nll(("a", "b")) * 2 + nll(("b", "a")), 3),
        2: (nll(("a", "b")) + nll(("b", "zz")), 2),
        # doc 3 has no bigram -> absent
    }
    got = {
        r["doc_id"]: (r["nll_e6"], r["n_bigrams"])
        for r in bigram_lm_score(df, k=0.1).collect()
    }
    assert got == want


def test_bigram_lm_ranks_gibberish_above_boilerplate(spark):
    from webgraph.text import bigram_lm_score

    common = [(i, "the same line of text repeated verbatim") for i in range(20)]
    rare = [(100, "zqx wvu ptk mno qrs jkl")]
    df = spark.createDataFrame(common + rare, "doc_id long, text string")
    rows = {r["doc_id"]: r["nll_e6"] for r in bigram_lm_score(df).collect()}
    assert rows[100] > rows[0]


# ------------------------------------------------------ plan pins ---------


def test_sessionize_plans_single_exchange(spark):
    from webgraph.asof import sessionize

    ev = spark.createDataFrame(
        [(i, f"2024-01-01 00:{i:02d}:00", i % 3) for i in range(30)],
        "event_id long, ts string, user_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = (
        sessionize(ev, "user_id", "ts", 60, order_cols=["event_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both windows and the final aggregate reuse ONE hashpartitioning on
    # the key; a second Exchange would mean the sort order was lost
    assert plan.count("Exchange hashpartitioning") == 1


def test_crawl_schedule_plans_single_exchange(spark):
    from webgraph.filters import crawl_schedule

    df = spark.createDataFrame(
        [(f"u{i}", f"h{i % 4}", i) for i in range(40)],
        "url string, host string, prio long",
    )
    plan = (
        crawl_schedule(df, "host", "prio", 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_pmi_plans_topk_not_global_sort(spark):
    from webgraph.text import pmi_collocations

    df = spark.createDataFrame(
        [(i, "x y z w " * 5) for i in range(20)], "doc_id long, text string"
    )
    plan = (
        pmi_collocations(df, k=5, min_count=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
