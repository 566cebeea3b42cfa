"""Deterministic random walks — the graph-embedding corpus generator
(DeepWalk/node2vec input; at 100 TB these walks feed representation
learning the same way the reference's exported store feeds Cypher
analysis, README.md:38-53).

"Random" with a fixed seed and NO RNG state: the step from vertex v at
step t goes to the out-neighbor u minimizing a seeded portable hash
h(v, t, u) (ties by u). That makes walks reproducible across runs,
partitionings, engines, and cluster sizes — the same property the
deterministic split/sampling primitives guarantee — and gives the DuckDB
oracle an exact replica (plain integer arithmetic, no engine RNG).

Physical shape per step (the BFS frontier pattern): frontier ⋈ edges on
the stationary persisted edge side, then a per-walk argmin aggregate
(min of a (hash, dst) struct — map-side partial aggregation collapses
each walk's candidate edges before the shuffle). State is one row per
live walk: O(walks), not O(edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage

# Same modulus family as webgraph.dedup's portable hashes; three odd
# multipliers decorrelate (cur, step, dst). All arithmetic stays < 2^63:
# each term is < M * max(B) ~= 2.7e18 and is reduced mod M before summing.
WALK_MOD = 1_000_000_007
_B_CUR = 1_315_423_911
_B_STEP = 2_654_435_761
_B_DST = 97_531


def _step_hash(cur, step: int, dst, seed: int):
    return (
        ((cur % WALK_MOD) * _B_CUR) % WALK_MOD
        + (F.lit(step) * _B_STEP) % WALK_MOD
        + ((dst % WALK_MOD) * _B_DST) % WALK_MOD
        + F.lit(seed)
    ) % WALK_MOD


def step_hash_sql(cur: str, step: int, dst: str, seed: int = 42) -> str:
    """The identical arithmetic as a SQL expression (oracle parity)."""
    m = WALK_MOD
    return (
        f"((({cur} % {m}) * {_B_CUR}) % {m}"
        f" + ({step} * {_B_STEP}) % {m}"
        f" + (({dst} % {m}) * {_B_DST}) % {m}"
        f" + {seed}) % {m}"
    )


def deterministic_walks(
    g: EncodedGraph,
    walk_len: int = 4,
    seed: int = 42,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """One walk per vertex, `walk_len` steps (or until a dangling vertex
    ends it early). Returns (walk_id, step, vid) with step 0 = the seed
    vertex; rows are emitted only for steps actually taken.

    Scale: walk_len joins of a vertex-shaped frontier against the
    persisted edge table — identical join key and physical layout every
    step, so only the small frontier re-shuffles (the PageRank iteration
    economics). The per-walk argmin is a hash aggregate, not a window: no
    per-key sort, partial aggregation map-side.

    With ``checkpoint_dir`` each step commits the accumulated
    (walk_id, step, vid) table via CheckpointManager; ``resume=True``
    reloads the last committed step and continues — the frontier is
    exactly the max-step rows (walks that ended early have no row there),
    so a resumed run is bit-identical to an uninterrupted one (the
    deterministic step hash carries no RNG state to restore)."""
    from webgraph.checkpoint import CheckpointManager

    ckpt = CheckpointManager(checkpoint_dir, "walks") if checkpoint_dir else None
    # src-clustered loop copy: every step's frontier join streams it
    # exchange- and sort-free (cluster_for_loop)
    edges = cluster_for_loop(
        g.edges.select("src", "dst"), "src", num_rows=g.edges.count()
    )
    frontier = g.vertices.select(
        F.col("vid").alias("walk_id"), F.col("vid").alias("cur")
    )
    acc = frontier.select(
        "walk_id", F.lit(0).alias("step"), F.col("cur").alias("vid")
    )
    start_step = 1
    if ckpt and resume:
        loaded = ckpt.load_latest(g.edges.sparkSession)
        if loaded is not None:
            acc, last = loaded
            frontier = acc.filter(F.col("step") == last).select(
                "walk_id", F.col("vid").alias("cur")
            )
            start_step = last + 1
    for t in range(start_step, walk_len + 1):
        h = _step_hash(F.col("cur"), t, F.col("dst"), seed)
        nxt = (
            frontier.hint("shuffle_hash")
            .join(edges, frontier.cur == edges.src, "inner")
            .groupBy("walk_id")
            .agg(F.min(F.struct(h.alias("h"), F.col("dst").alias("d"))).alias("m"))
            .select("walk_id", F.col("m.d").alias("cur"))
        )
        if ckpt:
            acc = ckpt.commit(
                acc.unionByName(
                    nxt.select(
                        "walk_id", F.lit(t).alias("step"), F.col("cur").alias("vid")
                    )
                ),
                t,
                {"step": t},
            )
            frontier = acc.filter(F.col("step") == t).select(
                "walk_id", F.col("vid").alias("cur")
            )
        else:
            nxt = nxt.transform(truncate_lineage)  # truncate per-step lineage
            acc = acc.unionByName(
                nxt.select("walk_id", F.lit(t).alias("step"), F.col("cur").alias("vid"))
            )
            frontier = nxt
    edges.unpersist()
    return acc


def node2vec_walks(
    g: EncodedGraph,
    walk_len: int = 3,
    return_cost: int = 4,
    inout_cost: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Second-order biased walks (Grover & Leskovec 2016, node2vec) in the
    same deterministic no-RNG form as ``deterministic_walks``: each
    candidate's priority is ``inv_weight * h(cur, step, dst)`` (ties by
    dst) and the walk takes the argmin, so a LARGER inverse weight makes a
    candidate proportionally less likely to win the hash race. Inverse
    weights follow node2vec's three classes — ``return_cost`` (node2vec
    p) for stepping back to the previous vertex, 1 for a candidate the
    previous vertex also links to (BFS-like), ``inout_cost`` (node2vec q)
    for jumping outward (DFS-like). ``return_cost = inout_cost = 1``
    degenerates to exactly ``deterministic_walks`` (pinned by test).

    The second-order state is one row per live walk ``(walk_id, prev,
    cur)``. Per step: frontier joins the stationary persisted edge table
    on ``cur`` (the PageRank economics — only the walk-shaped frontier
    re-shuffles), then the candidate set left-joins edges once more on
    ``(prev, dst)`` for the in/out classification — the distributed
    analog of node2vec's alias-table adjacency test, an equi-join on the
    edge key rather than per-vertex alias tables, so it needs no
    precomputed O(sum deg^2) structure and survives power-law fan-out.
    Integer-exact everywhere (priority < 2^63), hence the DuckDB oracle
    replays it verbatim. Walks end early at dangling vertices; rows are
    emitted only for steps actually taken."""
    edges = cluster_for_loop(
        g.edges.select("src", "dst"), "src", num_rows=g.edges.count()
    )
    frontier = g.vertices.select(
        F.col("vid").alias("walk_id"),
        F.lit(None).cast("long").alias("prev"),
        F.col("vid").alias("cur"),
    )
    acc = frontier.select(
        "walk_id", F.lit(0).alias("step"), F.col("cur").alias("vid")
    )
    adj = edges.select(
        F.col("src").alias("_asrc"), F.col("dst").alias("_adst")
    ).withColumn("_hit", F.lit(True))
    for t in range(1, walk_len + 1):
        cand = frontier.hint("shuffle_hash").join(
            edges, frontier.cur == edges.src, "inner"
        ).select(
            "walk_id",
            "prev",
            "cur",
            "dst",
            _step_hash(F.col("cur"), t, F.col("dst"), seed).alias("h"),
        )
        classed = cand.join(
            adj,
            (cand.prev == adj._asrc) & (cand.dst == adj._adst),
            "left",
        ).select(
            "walk_id",
            "cur",
            "dst",
            F.when(F.col("prev").isNull(), F.lit(1))
            .when(F.col("dst") == F.col("prev"), F.lit(return_cost))
            .when(F.col("_hit").isNotNull(), F.lit(1))
            .otherwise(F.lit(inout_cost))
            .cast("long")
            .alias("iw"),
            "h",
        )
        pri = (F.col("iw") * F.col("h")).alias("p")
        nxt = (
            classed.groupBy("walk_id")
            .agg(
                F.min(
                    F.struct(pri, F.col("dst").alias("d"), F.col("cur").alias("c"))
                ).alias("m")
            )
            .select(
                "walk_id", F.col("m.c").alias("prev"), F.col("m.d").alias("cur")
            )
        )
        nxt = nxt.transform(truncate_lineage)
        acc = acc.unionByName(
            nxt.select("walk_id", F.lit(t).alias("step"), F.col("cur").alias("vid"))
        )
        frontier = nxt
    edges.unpersist()
    return acc


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, n) skip-gram training pairs from a walk corpus —
    the word2vec-style data-prep step between DeepWalk/node2vec walks
    and embedding training (Perozzi et al. 2014 treat walk steps as
    words in sentences; the training input is exactly this frequency
    table of co-occurring vertex pairs within a step window).

    Plan: one self-join per walk_id with |step delta| in [1, window] —
    the join key is the walk id, so each key's match set is bounded by
    walk_len^2 regardless of graph size — then one (center, context)
    hash aggregate whose map-side combine absorbs the hub skew (hubs
    appear in many walks; their pair counts collapse at the mappers).
    Directional: (center, context) and (context, center) are separate
    rows, as in word2vec's window enumeration."""
    c = walks.select(
        F.col("walk_id"), F.col("step").alias("cs"), F.col("vid").alias("center")
    )
    x = walks.select(
        F.col("walk_id"), F.col("step").alias("xs"), F.col("vid").alias("context")
    )
    delta = F.abs(F.col("cs") - F.col("xs"))
    return (
        c.join(x, "walk_id")
        .filter((delta >= 1) & (delta <= window))
        .groupBy("center", "context")
        .agg(F.count("*").alias("n"))
    )
