"""spark-submit entry point: the App.run pipeline (SURVEY §3 entry point 1).

    spark-submit --py-files webgraph.zip -m webgraph ... , or locally:
    python -m webgraph --root-url https://www.site-0.example.com/ \
        --domains example.com --corpus /path/docs.parquet --out /tmp/graph

Stages (each maps to a reference phase): config validation -> corpus scan
(or synthetic generation) -> build pages/edges/errors -> enrichment ->
analytics (PageRank/CC/LP/triangles) -> snapshot writes -> report
(reportResults analog: counts, throughput, top home pages, failed URLs —
App.java:342-436).
"""

from __future__ import annotations

import json
import os
import sys
import time

from webgraph.config import parse_args


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    corpus_path = None
    out_dir = "./webgraph_out"
    synth_pages = 0
    rest: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--corpus":
            corpus_path = argv[i + 1]
            i += 2
        elif argv[i] == "--out":
            out_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--synthetic-pages":
            synth_pages = int(argv[i + 1])
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    cfg = parse_args(rest)

    from pyspark.sql import functions as F

    from webgraph.algos import (
        connected_components,
        encode_graph,
        label_propagation,
        pagerank,
        triangle_count,
    )
    from webgraph.build import build_graph, graph_counts
    from webgraph.corpus import synthetic_corpus
    from webgraph.enrich import enrich_pages
    from webgraph.queries import home_pages_by_incoming_links
    from webgraph.session import get_spark

    t_start = time.time()
    spark = get_spark(
        app_name="webgraph-import",
        shuffle_partitions=cfg.shuffle_partitions or cfg.parallelism,
    )

    if corpus_path:
        docs = spark.read.parquet(corpus_path)
    elif synth_pages:
        docs = synthetic_corpus(spark, n_pages=synth_pages)
    else:
        print("error: need --corpus <path> or --synthetic-pages <n>", file=sys.stderr)
        return 2
    if cfg.max_pages > 0:
        docs = docs.limit(cfg.max_pages)

    g = build_graph(docs, cfg.domains_to_crawl, cfg.subdomains_to_ignore)
    # The edge table feeds the pages degree joins AND its own write below;
    # persist so link extraction runs once, not once per consumer.
    g.edges.persist()
    pages = enrich_pages(g.pages)

    os.makedirs(out_dir, exist_ok=True)
    pages.write.mode("overwrite").parquet(f"{out_dir}/pages")
    g.edges.write.mode("overwrite").parquet(f"{out_dir}/edges")
    g.errors.write.mode("overwrite").parquet(f"{out_dir}/errors")
    pages = spark.read.parquet(f"{out_dir}/pages")
    edges = spark.read.parquet(f"{out_dir}/edges")
    g.edges.unpersist()

    eg = encode_graph(edges)
    ck = cfg.checkpoint_dir or f"{out_dir}/checkpoints"
    ranks, pr_metrics = pagerank(
        eg,
        damping=cfg.pagerank_damping,
        tol=cfg.pagerank_tol,
        max_iter=cfg.max_iterations,
        checkpoint_dir=ck,
        resume=cfg.resumable,
    )
    comps, cc_metrics = connected_components(
        eg, max_iter=cfg.max_iterations, checkpoint_dir=ck, resume=cfg.resumable
    )
    labels, lp_metrics = label_propagation(eg, max_iter=min(cfg.max_iterations, 20))
    triangles = triangle_count(eg)

    extended: dict = {}
    if cfg.extended_analytics:
        from webgraph.algos import hits, k_core, strongly_connected_components

        hub_auth, hits_metrics = hits(
            eg, max_iter=min(cfg.max_iterations, 10), checkpoint_dir=ck,
            resume=cfg.resumable,
        )
        hub_auth.join(eg.vertices, "vid").select("url", "hub", "auth").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/hits")
        core3, _ = k_core(eg, 3)
        core3.join(eg.vertices, "vid").select("url").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/kcore3")
        sccs, scc_metrics = strongly_connected_components(eg)
        sccs.join(eg.vertices, "vid").select("url", "scc").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/scc")
        from webgraph.algos.common import contract_graph, from_weighted_edges
        from webgraph.algos.salsa import salsa
        from webgraph.algos.triangles import clustering_coefficient
        from webgraph.algos.walks import deterministic_walks
        from webgraph.urls import extract_host

        sal, _ = salsa(eg, max_iter=5)
        sal.join(eg.vertices, "vid").select("url", "hub", "auth").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/salsa")
        lcc = clustering_coefficient(eg)
        lcc.join(eg.vertices, "vid").select(
            "url", "deg", "triangles", "lcc_e6"
        ).write.mode("overwrite").parquet(f"{out_dir}/clustering")
        walks = deterministic_walks(eg, walk_len=4)
        walks.write.mode("overwrite").parquet(f"{out_dir}/walks")
        # host-level rollup ranked by weighted PageRank (the domain
        # property grouping, PageNode.java:13, as a contracted graph)
        host = extract_host(F.col("url"))
        mapping = eg.vertices.select(
            "vid", F.xxhash64(host).alias("gid"), host.alias("host")
        ).persist()
        ge = contract_graph(eg, mapping.select("vid", "gid"))
        wg = from_weighted_edges(ge)
        # single-host crawls contract to an empty inter-host graph
        # (drop_self removes every edge) — skip the rollup rather than
        # divide by zero vertices in pagerank
        if wg.num_vertices > 0:
            dranks, _ = pagerank(
                wg, tol=0.0, max_iter=5, collect_skew=False, weight_col="weight"
            )
            dranks.join(
                mapping.select("gid", "host").distinct(),
                dranks.vid == F.col("gid"),
            ).select("host", "rank").write.mode("overwrite").parquet(
                f"{out_dir}/domain_rank"
            )
        extended = {
            "hits_iterations": len(hits_metrics),
            "kcore3_vertices": core3.count(),
            "scc_count": sccs.select("scc").distinct().count(),
            "scc_rounds": len(scc_metrics),
            "mean_lcc_e6": int(
                lcc.agg(F.coalesce(F.avg("lcc_e6"), F.lit(0.0))).collect()[0][0]
            ),
            "walk_rows": walks.count(),
            "domains_ranked": wg.num_vertices,
        }

    ranks.join(eg.vertices, "vid").select("url", "rank").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/pagerank")
    comps.join(eg.vertices, "vid").select("url", "component").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/components")
    labels.join(eg.vertices, "vid").select("url", "label").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/labels")

    # ---- reportResults analog (App.java:342-436) ----
    counts = graph_counts(g._replace(pages=pages, edges=edges))
    elapsed = time.time() - t_start
    report = {
        "pages": counts["pages"],
        "links": counts["links"],
        "pages_per_sec": round(counts["pages"] / elapsed, 2),
        "elapsed_sec": round(elapsed, 2),
        "triangles": triangles,
        "components": comps.select("component").distinct().count(),
        "pagerank_iterations": len(pr_metrics),
        # resumed runs may have nothing left to iterate -> metrics == []
        "pagerank_final_delta": pr_metrics[-1].get("delta_l1") if pr_metrics else None,
        "cc_iterations": len(cc_metrics),
        "lp_iterations": len(lp_metrics),
        "failed_urls": g.errors.count(),
        "out_dir": out_dir,
        **extended,
    }
    print(json.dumps(report))
    print("top home pages by incoming links:", file=sys.stderr)
    for r in home_pages_by_incoming_links(pages).limit(10).collect():
        print(f"  {r['in_degree']:>8}  {r['url']}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
