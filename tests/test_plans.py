"""Physical-plan assertions: the optimizer contracts this engine relies on
(task brief: '.explain the plan and iterate until it's the plan you'd
want'). These tests fail if a future change silently degrades a plan —
e.g. a filter stops pushing to the scan or top-k becomes a global sort."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from webgraph import queries as Q
from webgraph.build import build_graph
from webgraph.corpus import fixture_docs, synthetic_corpus


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def parquet_graph(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("plans")
    g = build_graph(synthetic_corpus(spark, 2000, seed=11), ["example.com"])
    g.pages.write.parquet(str(d / "pages"))
    g.edges.write.parquet(str(d / "edges"))
    return (
        spark.read.parquet(str(d / "pages")),
        spark.read.parquet(str(d / "edges")),
    )


def test_point_lookup_pushes_filter_to_scan(parquet_graph):
    pages, _ = parquet_graph
    plan = plan_of(Q.page_by_url(pages, "https://www.site-0.example.com/"))
    assert "PushedFilters" in plan
    assert "EqualTo(url,https://www.site-0.example.com/)" in plan.replace("'", "")


def test_column_pruning_reads_only_needed_columns(parquet_graph):
    pages, _ = parquet_graph
    plan = plan_of(pages.select("url", "in_degree").filter(F.col("in_degree") > 5))
    # ReadSchema must not include content (the wide column)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "content" not in read_schema
    assert "url" in read_schema and "in_degree" in read_schema


def test_topk_compiles_to_take_ordered_not_global_sort(parquet_graph):
    pages, edges = parquet_graph
    plan = plan_of(Q.top_pages_by_incoming_links(pages, edges, k=50))
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_covers_scalar_pipeline(spark):
    from webgraph.extract import with_url
    from webgraph.urls import extract_domain

    docs = fixture_docs(spark, "star_in")
    df = with_url(docs).select(extract_domain(F.col("url")).alias("d"))
    plan = plan_of(df, mode="simple")
    # '*(n)' prefixes mark WholeStageCodegen stages in simple mode
    assert "*(1)" in plan
    # no Python evaluation anywhere in the scalar path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_small_dim_join_broadcasts(parquet_graph, spark):
    pages, edges = parquet_graph
    # J5-style: tiny filtered page side joined to edges
    plan = plan_of(Q.cross_domain_links(pages, edges, "site-0", threshold=1))
    assert "BroadcastHashJoin" in plan or "broadcast" in plan.lower()


def test_pagerank_iteration_reuses_cached_edges(spark):
    """The stationary weighted-edge side must be an InMemoryTableScan in
    the iteration plan — the layout-reuse that makes iterations cheap."""
    from webgraph.algos import encode_graph
    from webgraph.build import build_graph as bg

    g = bg(fixture_docs(spark, "star_in"), ["alpha.example.com"])
    eg = encode_graph(g.edges)
    out_deg = eg.edges.groupBy("src").agg(F.count("*").alias("deg"))
    edges_w = (
        eg.edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .persist()
    )
    edges_w.count()
    ranks = eg.vertices.select("vid", F.lit(0.2).alias("rank"))
    it_plan = plan_of(
        edges_w.join(ranks, edges_w.src == ranks.vid).groupBy(edges_w.dst).agg(
            F.sum(F.col("w") * F.col("rank"))
        ),
        mode="simple",
    )
    assert "InMemoryTableScan" in it_plan
    edges_w.unpersist()


def test_enrichment_is_arrow_not_row_python(spark):
    from webgraph.build import build_graph as bg
    from webgraph.enrich import enrich_pages

    pages = bg(fixture_docs(spark, "star_in"), ["alpha.example.com"]).pages
    plan = plan_of(enrich_pages(pages), mode="simple")
    # mapInPandas shows up as MapInPandas (Arrow); row-python would be
    # BatchEvalPython
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_ivf_assignment_plans_broadcast_join_not_literal_chain(spark):
    """Centroid assignment = BroadcastNestedLoopJoin + partial-agg min:
    the shuffle carries |base| rows regardless of k, and the plan contains
    no unrolled per-centroid literals (expression size O(1) in k)."""
    from webgraph.similarity import assign_buckets, centroid_frame

    base = spark.range(100).select(
        F.col("id"), F.array(F.lit(0.1), F.lit(0.2)).alias("v")
    )
    cents = centroid_frame(spark, [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
    plan = plan_of(assign_buckets(base, cents))
    assert "BroadcastNestedLoopJoin" in plan
    # partial + final aggregate pair: the k candidate rows per id collapse
    # map-side before any exchange (struct-min buffers plan as SortAggregate)
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2
    # the distance is computed against the joined cvec column, never
    # against unrolled centroid literals
    assert "2.0" not in plan or plan.count("2.0") <= 2


def test_dedup_pipelines_never_plan_cartesian_products(spark):
    """Every near-dup method must meet candidates through an equi bucket
    join — a CartesianProduct/BroadcastNestedLoop over the corpus means a
    bucketing regression (the 100TB killer)."""
    from webgraph import dedup

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} common tail") for i in range(30)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0, 3.0]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    for df in (
        dedup.ngram_jaccard_pairs(docs, max_doc_freq=100),
        dedup.minhash_dedup_pairs(docs),
        dedup.simhash_near_pairs(dedup.simhash(docs)),
        dedup.embedding_near_dup_pairs(emb),
    ):
        plan = plan_of(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

def test_cc_lp_convergence_count_reads_materialized_state(spark):
    """The changed-count that drives convergence must execute over the
    MATERIALIZED new state (ExistingRDD scans), never by re-planning the
    iteration's neighbor aggregation — re-planning doubles every
    iteration's shuffle (the round-2 verdict's 100x flag)."""
    from webgraph.algos import connected_components, encode_graph, label_propagation
    from webgraph.build import build_graph as bg

    eg = encode_graph(
        bg(synthetic_corpus(spark, 300, seed=7), ["example.com"]).edges
    )

    cc_plans, lp_plans = {}, {}
    connected_components(
        eg, max_iter=2, collect_skew=False, _probe=lambda it, df: cc_plans.__setitem__(it, plan_of(df))
    )
    label_propagation(eg, max_iter=2, _probe=lambda it, df: lp_plans.__setitem__(it, plan_of(df)))

    # iteration 1: both sides of the changed-count join are checkpointed
    p = cc_plans[1]
    assert "ExistingRDD" in p
    assert "partial_min" not in p and "min(component" not in p
    p = lp_plans[1]
    assert "ExistingRDD" in p
    assert "max_by" not in p


def test_hits_norm_is_over_checkpointed_scores(spark):
    """_normalized must receive a materialized frame: the 1-row L2 agg and
    the main side then share one ExistingRDD scan instead of re-executing
    the edges-join-scores aggregation."""
    from webgraph.algos import encode_graph
    from webgraph.algos.hits import _normalized
    from webgraph.build import build_graph as bg

    eg = encode_graph(bg(fixture_docs(spark, "star_in"), ["alpha.example.com"]).edges)
    scores = eg.vertices.select("vid", F.lit(1.0).alias("auth")).localCheckpoint()
    plan = plan_of(_normalized(scores, "auth"))
    assert "ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan or "broadcast" in plan.lower()
    # no shuffle join of edges anywhere in the normalization subtree
    assert "SortMergeJoin" not in plan


def test_token_budget_window_is_per_partition_not_global(spark):
    """sample_to_token_budget's cumulative window must be partitioned by
    _p (the physical partition id): a global ORDER BY window serializes the
    whole corpus through one task at 100 TB."""
    from webgraph.text import sample_to_token_budget

    docs = spark.createDataFrame(
        [(i, "a b c d") for i in range(100)], "doc_id long, text string"
    )
    plan = plan_of(sample_to_token_budget(docs, 50), mode="formatted")
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln or "windowspecdefinition" in ln]
    assert any("_p" in ln for ln in win_lines), win_lines
    # the only Sort feeding the window is partition-local
    assert "Sort [" not in plan or "global=false" in plan.lower() or "Exchange rangepartitioning" not in plan


def test_kcore_peel_uses_semi_joins_not_inner(spark):
    from webgraph.algos.kcore import _peel

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    survivors = spark.createDataFrame([(1,), (2,), (3,)], "vid long")
    plan = plan_of(_peel(edges, survivors))
    assert "LeftSemi" in plan
    assert "Inner" not in plan


def test_stateful_sessions_plans_arrow_state_operator(spark):
    """The sessionizer must compile to FlatMapGroupsInPandasWithState
    (Arrow-batched custom state), with no row-at-a-time Python eval."""
    from webgraph.streaming import stateful_sessions

    events = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            (F.col("value") % 5).alias("user_id"),
            F.col("timestamp").alias("ts"),
            F.col("value").cast("double").alias("value"),
            F.lit(0).alias("event_id"),
        )
    )
    plan = plan_of(stateful_sessions(events))
    assert "FlatMapGroupsInPandasWithState" in plan
    assert "BatchEvalPython" not in plan


def test_cocitation_plans_equi_wedge_join_not_cartesian(spark):
    """Co-citation meets pairs through the src equi-join; a cartesian or
    nested-loop over edges is a bucketing regression (100TB killer)."""
    from webgraph.algos import cocitation

    edges = spark.createDataFrame(
        [(i % 7, i % 11) for i in range(60)], "src long, dst long"
    )
    plan = plan_of(cocitation(edges, min_common=2, max_out_degree=50))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_top_tokens_compiles_to_take_ordered_not_global_sort(spark):
    """The top-k over the vocabulary must be TakeOrderedAndProject — a
    global Sort materializes the full token dictionary on one task."""
    from webgraph.text import top_tokens

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = plan_of(top_tokens(docs, k=10))
    assert "TakeOrderedAndProject" in plan


def test_rollup_plans_single_expand_not_per_level_rescan(spark):
    """rollup() must compile to ONE Expand + hash aggregate over a single
    scan — not a union of per-grouping-level re-aggregations."""
    docs = spark.createDataFrame(
        [("a", 1, 1.0), ("b", 2, 2.0)], "k string, y int, v double"
    )
    plan = plan_of(docs.rollup("k", "y").agg(F.sum("v")))
    assert "Expand" in plan
    # a per-level re-aggregation would plan a Union of aggregates
    assert "Union" not in plan


def test_bfs_frontier_join_reads_persisted_edges(spark):
    """Each BFS level probes the PERSISTED edge table (InMemoryTableScan)
    — the big side is never re-shuffled or re-derived per level — and the
    whole loop stays JVM-side (no Python eval in the plan)."""
    from webgraph.algos import bfs_depths
    from webgraph.algos.common import from_int_edges

    eg = from_int_edges(
        spark.createDataFrame(
            [(i, (i * 3 + 1) % 50) for i in range(50)], "src long, dst long"
        )
    )
    out, _ = bfs_depths(eg, [0], max_depth=2)
    plan = plan_of(out)
    assert "BatchEvalPython" not in plan
    # the returned frame is the materialized localCheckpoint
    assert "ExistingRDD" in plan or "InMemoryTableScan" in plan


def test_redact_pii_stays_codegen_no_shuffle(spark):
    """PII scrub must be a pure narrow map: no Exchange, no Python eval —
    it runs at scan speed or it's wrong at 100 TB."""
    from webgraph.text import redact_pii

    docs = spark.createDataFrame(
        [(1, "mail a@b.com now")], "doc_id long, text string"
    )
    plan = plan_of(redact_pii(docs))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stratified_sample_pushes_partial_rank_limit_before_shuffle(spark):
    """The sampler's skew guard is Spark's rank-limit pushdown: a Partial
    WindowGroupLimit BEFORE the group exchange caps each map partition's
    shipment at quota rows per group. If the pushdown stops applying
    (expression change, rank->dense_rank, filter moved), a giant group
    would shuffle whole — this pins it."""
    from webgraph.text import stratified_sample

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2)) for i in range(100)], "doc_id long, grp string"
    )
    plan = plan_of(stratified_sample(df, "grp", 5), mode="simple")
    partial_pos = plan.find("WindowGroupLimit")
    assert partial_pos != -1, plan
    assert "Partial" in plan, plan
    # the Partial limit must sit below (after, in printed order) the
    # Exchange feeding the final window
    exch_pos = plan.find("Exchange")
    assert exch_pos != -1 and plan.find("Partial") > exch_pos, plan


def test_walk_step_is_hash_aggregate_not_window(spark):
    """Each walk step picks argmin by a groupBy min(struct) — a hash
    aggregate with map-side partial aggregation — never a per-walk window
    sort."""
    from webgraph.algos.common import from_int_edges
    from webgraph.algos.walks import deterministic_walks

    g = from_int_edges(
        spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    )
    plan = plan_of(deterministic_walks(g, walk_len=1), mode="simple")
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_contract_graph_aggregates_after_equi_joins(spark):
    """Contraction = two equi joins + one hash agg; no cartesian, no
    window."""
    from webgraph.algos.common import contract_graph, from_int_edges

    g = from_int_edges(
        spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    )
    mapping = spark.createDataFrame([(0, 0), (1, 0), (2, 1)], "vid long, gid long")
    plan = plan_of(contract_graph(g, mapping), mode="simple")
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "HashAggregate" in plan


def test_bucketed_tables_join_without_shuffle(spark, tmp_path_factory):
    """The 100 TB co-location story: edge tables bucketed+sorted on the
    join key join with ZERO Exchange — the physical contract that makes
    repeated vid-keyed joins (degree maintenance, endpoint resolution)
    scan-local on a real cluster. Bucketing metadata only exists through
    the catalog, so this writes two external bucketed tables."""
    d = tmp_path_factory.mktemp("buckets")
    e1 = spark.range(0, 10000).select(
        (F.col("id") % 500).alias("src"), (F.col("id") % 97).alias("dst")
    )
    e2 = spark.range(0, 5000).select(
        (F.col("id") % 500).alias("src"), F.col("id").alias("w")
    )
    spark.sql("DROP TABLE IF EXISTS bk_e1")
    spark.sql("DROP TABLE IF EXISTS bk_e2")
    (e1.write.bucketBy(8, "src").sortBy("src")
        .option("path", str(d / "e1")).saveAsTable("bk_e1"))
    (e2.write.bucketBy(8, "src").sortBy("src")
        .option("path", str(d / "e2")).saveAsTable("bk_e2"))
    # pin the sort-merge path: with a broadcastable side Catalyst prefers
    # BroadcastHashJoin and disables bucketed scans entirely ("Bucketed:
    # false (disabled by query planner)") — the co-location contract under
    # test is the big-big join, where broadcast isn't an option.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t1, t2 = spark.table("bk_e1"), spark.table("bk_e2")
        joined = t1.join(t2, "src")
        plan = plan_of(joined, mode="simple")
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # sanity: result correct
        n = joined.count()
        assert n == e1.join(e2, "src").count() == n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_e1")
        spark.sql("DROP TABLE IF EXISTS bk_e2")


def test_main_content_and_gopher_rules_are_pure_codegen(spark, tmp_path):
    """The r05 text operators must stay single-stage scans: zero Exchange
    and a pruned ReadSchema (only id + text), whatever else the table
    carries — the physical contract that makes them free at 100 TB."""
    from webgraph.text import gopher_rules, main_content

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "a b c", "junk")], "doc_id long, text string, extra string"
    ).write.parquet(p)
    docs = spark.read.parquet(p)

    plan_mc = plan_of(main_content(docs.withColumnRenamed("text", "html")))
    plan_gr = plan_of(gopher_rules(docs))
    for plan in (plan_mc, plan_gr):
        assert "Exchange" not in plan, plan
        assert "extra" not in [
            c for l in plan.splitlines() if "ReadSchema" in l for c in [l]
        ][0], plan


def test_anchor_summary_topk_plans_window_group_limit(spark):
    """The per-target top-k rank must compile to WindowGroupLimit (rank
    pushdown: each partition keeps k rows BEFORE the final sort) over
    exactly two Exchanges — (dst, anchor) count, then dst-keyed rank."""
    from webgraph.extract import anchor_summary

    anch = spark.createDataFrame(
        [("u", "d", "a")], "src string, dst_raw string, anchor string"
    )
    plan = plan_of(anchor_summary(anch))
    assert "WindowGroupLimit" in plan, plan


def test_substring_dedup_plans_no_cartesian_no_sort_merge(spark):
    """Every substring-dedup join is a key-equi join on an 8-byte
    fingerprint or (id, idx); no cartesian, and on small inputs the
    aggregate sides broadcast."""
    from webgraph.dedup import substring_dedup

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = plan_of(substring_dedup(docs, window_tokens=4))
    assert "Cartesian" not in plan, plan


def test_c4_filter_is_pure_codegen(spark, tmp_path):
    """c4_filter joins the main_content/gopher family: one Project over
    the scan — zero Exchange, zero Python eval, pruned ReadSchema."""
    from webgraph.text import c4_filter

    p = str(tmp_path / "docs_c4")
    spark.createDataFrame(
        [(1, "Nice line here.", "junk")], "doc_id long, text string, extra string"
    ).write.parquet(p)
    plan = plan_of(c4_filter(spark.read.parquet(p)))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "extra" not in read, plan


def test_spam_mass_is_one_vid_join_over_pinned_pagerank(spark):
    """spam_mass adds exactly one vid-keyed equi join on top of the two
    (already plan-audited) pagerank runs — no cartesian, no extra agg."""
    from webgraph.algos import spam_mass
    from webgraph.algos.common import from_int_edges

    g = from_int_edges(
        spark.createDataFrame([(0, 1), (1, 0), (1, 2)], "src long, dst long")
    )
    df = spam_mass(g, trusted_seeds=[0], max_iter=2, tol=0.0, collect_skew=False)
    plan = plan_of(df)
    assert "Cartesian" not in plan, plan
