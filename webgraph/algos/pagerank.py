"""PageRank — join + hash-aggregate gather-scatter with dangling mass,
convergence control, per-iteration checkpoint + metrics (J6/A9, north_rule).

Formulation (standard power iteration, damping d):

    r'(v) = (1-d)/N + d * ( sum_{u->v} r(u)/outdeg(u) + dangling_mass/N )

where dangling_mass = sum of r(u) over outdeg(u)=0 vertices — exactly the
reference's link-only UNKNOWN-content pages (BatchGraphImporter.java:284).

Physical plan per iteration (designed before written, .explain-verified):
  1. contribs = edges_w ⋈ ranks on src      — the ONLY big shuffle; edges_w
     (src, dst, w=1/outdeg) is built once, repartitioned by src, persisted:
     iterations re-shuffle only the small ranks frame to meet it.
  2. groupBy(dst).sum(contrib)              — hash agg; map-side partial
     aggregation collapses hub dsts before the shuffle, so power-law
     in-degree skew compresses at the mappers. AQE skew-join handles src
     skew in step 1; salt_buckets adds deterministic two-level agg on top
     for pathological hubs.
  3. left join onto the full vertex set     — vertices with no in-links
     still get the base term.
  4. L1 delta agg; driver loop stops at tol.
Every iteration commits ranks to the checkpoint manifest (resume-able,
lineage truncated); without a checkpoint_dir it localCheckpoints instead.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage
from webgraph.checkpoint import CheckpointManager
from webgraph.metrics import iteration_metrics, partition_skew


def build_loop_caches(g: EncodedGraph, weight_col: str | None = None):
    """Build the loop-stationary state :func:`pagerank` iterates over:
    (edges_w src-clustered + persisted, dangling persisted, n_dangling,
    num_edges). Exposed so multi-run compositions (spam_mass = PR + TR on
    the SAME graph) pay the out-degree join, the explicit src-clustering
    shuffle and the dangling scan once instead of once per run. The
    caller owns the two caches and must unpersist them."""
    num_edges = g.edges.count()
    if weight_col:
        out_deg = g.edges.groupBy("src").agg(F.sum(weight_col).alias("deg"))
        w_expr = F.col(weight_col).cast("double") / F.col("deg")
    else:
        out_deg = g.edges.groupBy("src").agg(F.count("*").alias("deg"))
        w_expr = F.lit(1.0) / F.col("deg")
    # Explicit src-clustering for the stationary big side: the per-iteration
    # join then never exchanges OR sorts edges_w (the loop uses a shuffled
    # hash join). Without this the layout depends on which join strategy
    # built edges_w (a broadcast build leaves the input's (src,dst)-hash
    # layout, which does NOT satisfy src clustering, and the E-sized frame
    # would re-exchange every iteration).
    edges_w = cluster_for_loop(
        g.edges.join(out_deg, "src", "inner").select(
            "src", "dst", w_expr.alias("w")
        ),
        "src",
        num_rows=num_edges,
    )

    # Dangling vertices: outdeg == 0 (left_anti against srcs). Counted once;
    # a graph with none (common after dedup of a well-linked corpus) skips
    # the per-iteration mass aggregation entirely — the dominant fixed cost
    # at high parallelism. The distinct-src set reads the already
    # src-clustered edges_w cache, so it aggregates with NO exchange
    # (deriving it from g.edges would re-shuffle all E rows).
    dangling = (
        g.vertices.select("vid").join(
            edges_w.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti"
        )
    ).persist()
    # one materialization job for both caches: counting dangling computes
    # edges_w (filling its cache) on the way — a separate edges_w.count()
    # would submit a second job for work this one already does
    n_dangling = dangling.count()
    return edges_w, dangling, n_dangling, num_edges


def pagerank(
    g: EncodedGraph,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 40,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    salt_buckets: int = 0,
    collect_skew: bool = True,
    checkpoint_retain: int | None = None,
    on_iteration=None,
    personalization: DataFrame | None = None,
    weight_col: str | None = None,
    initial_ranks: DataFrame | None = None,
    loop_caches=None,
) -> tuple[DataFrame, list[dict]]:
    """Returns (ranks DataFrame ``(vid, rank)``, per-iteration metrics).

    `tol` is the L1 delta threshold; with damping d the iteration contracts
    by factor d per step, so reaching L1 < tol(1-d)/(1+d)-ish guarantees
    per-vertex closeness; we iterate to L1 < tol directly and tests assert
    allclose(1e-6) against a dense numpy oracle.

    `personalization`: optional ``(vid, p)`` frame (p summing to 1) turning
    this into personalized PageRank — teleport lands on p instead of the
    uniform 1/N (restart vector and dangling redistribution both follow p):

        r'(v) = (1-d)*p(v) + d*( sum contribs + dangling_mass*p(v) )

    The p frame is vertex-shaped: persisted once, joined per iteration on
    the same vid key the rank update already shuffles on.
    """
    spark = g.edges.sparkSession
    n = g.num_vertices

    pers = None
    if personalization is not None:
        pers = (
            g.vertices.select("vid")
            .join(personalization.select("vid", "p"), "vid", "left")
            .select("vid", F.coalesce(F.col("p"), F.lit(0.0)).alias("p"))
            .persist()
        )
        pers.count()

    # Weighted mode (weight_col set, e.g. a contract_graph rollup): each
    # edge carries weight/out-weight instead of 1/outdeg — the standard
    # weighted power iteration. Same plan shape either way: the normalized
    # edge frame is built once and stays the stationary big join side.
    # `loop_caches` (round 6) lets compositions that run PR repeatedly on
    # one graph (spam_mass, warm-start refresh sweeps) pass a prebuilt
    # state from build_loop_caches; the caches then outlive this call and
    # the CALLER unpersists them.
    own_caches = loop_caches is None
    if own_caches:
        loop_caches = build_loop_caches(g, weight_col)
    edges_w, dangling, n_dangling, num_edges = loop_caches

    ckpt = (
        CheckpointManager(checkpoint_dir, "pagerank", retain=checkpoint_retain)
        if checkpoint_dir
        else None
    )
    metrics: list[dict] = []
    start_iter = 0

    if initial_ranks is not None:
        # Warm start (incremental maintenance): seed from a previous run's
        # ranks — after a small graph delta the old fixpoint is near the
        # new one, so tol-mode converges in a fraction of the iterations
        # (power iteration contracts the remaining error by `damping` per
        # step). New vertices get the uniform prior; the vector is then
        # L1-renormalized so it is a distribution again (one 1-row agg,
        # broadcast back — no driver round-trip).
        seeded = (
            g.vertices.select("vid")
            .join(initial_ranks.select("vid", "rank"), "vid", "left")
            .select("vid", F.coalesce(F.col("rank"), F.lit(1.0 / n)).alias("rank"))
            .transform(truncate_lineage)
        )
        tot = seeded.agg(F.sum("rank").alias("_tot"))
        ranks = seeded.crossJoin(F.broadcast(tot)).select(
            "vid", (F.col("rank") / F.col("_tot")).alias("rank")
        )
    elif pers is not None:
        ranks = pers.select("vid", F.col("p").alias("rank"))
    else:
        ranks = g.vertices.select("vid", F.lit(1.0 / n).alias("rank"))
    if ckpt and resume:
        loaded = ckpt.load_latest(spark)
        if loaded is not None:
            ranks, start_iter = loaded
            start_iter += 1

    skew = {}
    if collect_skew:
        skew = {f"edges_{k}": v for k, v in partition_skew(edges_w).items()}

    for it in range(start_iter, max_iter):
        t0 = time.time()
        # Shuffled hash join, build side = the V-shaped rank state: the
        # stationary src-clustered edges_w cache streams with zero exchange
        # and zero sort, and only the small ranks frame is shuffled to meet
        # it (a sort-merge join would re-sort all E rows EVERY iteration).
        # The build side has one row per vid — hash-uniform, no skew — so
        # per-partition hash maps stay at V/P rows by construction.
        r = ranks.hint("shuffle_hash")
        contribs = edges_w.join(r, edges_w.src == r["vid"], "inner").select(
            edges_w.src.alias("_src"),
            edges_w.dst.alias("vid"),
            (F.col("w") * F.col("rank")).alias("c"),
        )
        if salt_buckets > 1:
            # Deterministic two-level aggregation for pathological hubs:
            # bucket a hub dst's incoming rows by hash(src) so no single
            # reduce key carries the whole hub; final agg re-combines.
            salted = contribs.withColumn(
                "_s", F.pmod(F.xxhash64("_src"), F.lit(salt_buckets))
            )
            summed = (
                salted.groupBy("vid", "_s")
                .agg(F.sum("c").alias("p"))
                .groupBy("vid")
                .agg(F.sum("p").alias("contrib"))
            )
        else:
            summed = contribs.groupBy("vid").agg(F.sum("c").alias("contrib"))

        # Hash join again (build = the aggregated contribs, also V-shaped):
        # the vertex cache and the aggregate are both vid-clustered already,
        # so this join runs with no exchange and — unlike sort-merge — no
        # per-iteration sort of either V-sized side.
        base = g.vertices.select("vid").join(
            summed.hint("shuffle_hash"), "vid", "left"
        )
        if pers is not None:
            # Personalized teleport: restart mass and dangling mass both
            # land on p(v). The p side is stationary and vid-keyed, so the
            # join rides the same exchange as the rank update.
            based = base.join(pers, "vid")
            if n_dangling == 0:
                new_ranks = based.select(
                    "vid",
                    (
                        F.lit(1.0 - damping) * F.col("p")
                        + F.lit(damping)
                        * F.coalesce(F.col("contrib"), F.lit(0.0))
                    ).alias("rank"),
                )
            else:
                dm_df = (
                    ranks.join(dangling, "vid", "left_semi")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
                )
                new_ranks = based.crossJoin(F.broadcast(dm_df)).select(
                    "vid",
                    (
                        F.lit(1.0 - damping) * F.col("p")
                        + F.lit(damping)
                        * (
                            F.col("_dm") * F.col("p")
                            + F.coalesce(F.col("contrib"), F.lit(0.0))
                        )
                    ).alias("rank"),
                )
        elif n_dangling == 0:
            # No dangling mass: the base term is a literal — skips the
            # per-iteration mass aggregate + broadcast entirely.
            new_ranks = base.select(
                "vid",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        else:
            # Dangling mass folded into the same job as the rank update: a
            # 1-row aggregate cross-joined (broadcast) instead of a separate
            # collect() round-trip per iteration.
            dm_df = (
                ranks.join(dangling, "vid", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            )
            new_ranks = base.crossJoin(F.broadcast(dm_df)).select(
                "vid",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.col("_dm") / F.lit(float(n))
                        + F.coalesce(F.col("contrib"), F.lit(0.0))
                    )
                ).alias("rank"),
            )

        # Materialize the new state INSIDE the timed region — the
        # checkpoint (or localCheckpoint) is what actually executes the
        # iteration's join+aggregate job. (Measuring before it would time
        # plan construction only.)
        prev_ranks = ranks
        if ckpt:
            ranks = ckpt.write_state(new_ranks, it)
        else:
            ranks = new_ranks.transform(truncate_lineage)

        # Convergence delta only when a tolerance is set; fixed-iteration
        # runs (tol <= 0, the bench mode) skip the extra join+agg pass.
        # Computed over the materialized state (cheap re-read).
        delta = None
        if tol > 0:
            delta = (
                ranks.join(prev_ranks.withColumnRenamed("rank", "prev"), "vid", "inner")
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))))
                .collect()[0][0]
            )
        wall = time.time() - t0
        m = iteration_metrics(
            it, wall, messages=num_edges, delta=delta,
            extra=(skew if it == start_iter else {}),
        )
        metrics.append(m)
        if ckpt:
            ckpt.log_entry(it, m)
        if on_iteration is not None:
            # observer hook (progress reporting, GC nudges in long bench
            # loops, external metrics sinks); runs outside the timed region
            on_iteration(m)

        if delta is not None and delta < tol:
            break

    # Release loop-lifetime caches (round 6): the returned ranks state is
    # checkpoint-materialized and independent of them, and a long-lived
    # session (the bench runs every query in one session) otherwise
    # accumulates one orphaned edge-cache pair per pagerank call.
    if own_caches:
        edges_w.unpersist()
        dangling.unpersist()
    if pers is not None:
        pers.unpersist()
    return ranks, metrics


def personalized_pagerank(g: EncodedGraph, seeds, **kwargs):
    """Random-walk-with-restart over a seed set: uniform restart vector on
    seeds ∩ V (raises if empty). Thin wrapper that builds the `p` frame
    and delegates to :func:`pagerank` (personalization=...)."""
    spark = g.edges.sparkSession
    seeds_df = spark.createDataFrame(
        [(int(s),) for s in set(seeds)], "vid long"
    )
    present = seeds_df.join(g.vertices.select("vid"), "vid", "left_semi")
    cnt = present.count()
    if cnt == 0:
        raise ValueError("personalized_pagerank: no seed vid exists in the graph")
    p = present.select("vid", F.lit(1.0 / cnt).alias("p"))
    return pagerank(g, personalization=p, **kwargs)


def spam_mass(g: EncodedGraph, trusted_seeds, **kwargs) -> DataFrame:
    """Link-spam mass estimation (Gyongyi et al. 2004 "Combating Web Spam
    with TrustRank" + 2006 "Link Spam Detection Based on Mass Estimation"):

        TR   = PageRank personalized on a hand-vetted trusted seed set
        mass = PR - TR          (absolute spam mass)
        rel  = (PR - TR) / PR   (relative spam mass; ~1 => rank came
                                 almost entirely from untrusted regions)

    Both vectors run the SAME damping/iteration schedule so they are
    directly comparable (each sums to 1). The composition is two calls
    into :func:`pagerank`, so the per-iteration physical plan — one
    stationary edges_w shuffle + map-side-combined hash agg — is the one
    already audited and plan-pinned; the final step is a single vid-keyed
    join of two rank vectors. No new shuffle shape is introduced.

    Returns ``(vid, pr, tr, mass, rel_mass)``. ``rel_mass`` is 0.0 when
    pr == 0 (cannot happen with damping < 1, kept for safety).
    """
    # One loop-cache build for both runs (round 6): PR and TR iterate the
    # same graph, so the out-degree join + src-clustering shuffle + dangling
    # scan are paid once; each run's iterations are unchanged.
    caches = build_loop_caches(g, kwargs.get("weight_col"))
    pr, _ = pagerank(g, loop_caches=caches, **kwargs)
    tr, _ = personalized_pagerank(g, trusted_seeds, loop_caches=caches, **kwargs)
    caches[0].unpersist()
    caches[1].unpersist()
    return (
        pr.select("vid", F.col("rank").alias("pr"))
        .join(tr.select("vid", F.col("rank").alias("tr")), "vid")
        .select(
            "vid",
            "pr",
            "tr",
            (F.col("pr") - F.col("tr")).alias("mass"),
            F.when(F.col("pr") == 0.0, F.lit(0.0))
            .otherwise((F.col("pr") - F.col("tr")) / F.col("pr"))
            .alias("rel_mass"),
        )
    )
