"""Approximate/exact neighborhood function (ANF) — ball sizes |N(v, r)|.

The neighborhood function is the classic webgraph reachability statistic
(effective diameter, vertex "influence"): for each vertex, how many
vertices lie within r hops. Two modes:

- ``neighborhood_sizes_exact``: the (root, member) pair expansion —
  exact, quadratic-prone on hub graphs (the pair table is
  sum-of-ball-sizes rows), intended for small r / validation oracles.
  Each round is one join of the pair table against the stationary edge
  set + a distinct (map-side combine collapses duplicate pairs
  pre-shuffle).

- ``hyperball_registers``: the HyperBall formulation (Boldi & Vigna,
  "HyperANF/HyperBall": HyperLogLog counters merged along edges, one
  groupBy-max per round) with DETERMINISTIC portable-hash registers.
  State is O(V·m) small ints regardless of ball sizes — the 100 TB path.
  The register arithmetic is identical integer math on both engines, so
  even this *approximate* operator has an EXACT oracle: the approximation
  lives in the estimator formula, not in the execution. Contract queries
  compare the integer registers; ``hyperball_estimate`` turns them into
  float ball-size estimates (tested against the exact mode with HLL's
  ~1.04/sqrt(m) error in pytest).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage

ANF_MOD = 1_000_000_007
_B1 = 2_654_435_761
_B2 = 40_503


def neighborhood_function_exact(g: EncodedGraph, max_r: int) -> list[int]:
    """Exact neighborhood function N(r) = total reachable (root, member)
    pairs within <= r hops, for r = 0..max_r, from ONE incremental ball
    expansion. The exact twin of neighborhood_function (HyperANF) for
    small graphs and oracles.

    r06: frontier-based — each radius expands only the members ADDED at
    the previous radius and anti-joins the ball, instead of re-distincting
    the whole O(V·ball) pair table every round; once a round adds nothing
    the expansion has saturated and the remaining totals are constant.
    Identical ball sets, identical counts, a fraction of the shuffle."""
    if max_r < 0:
        raise ValueError(f"max_r must be >= 0, got {max_r}")
    edges = cluster_for_loop(
        g.edges.select("src", "dst"), "src", num_rows=g.edges.count()
    )
    frontier = g.vertices.select(
        F.col("vid").alias("root"), F.col("vid").alias("member")
    ).transform(truncate_lineage)
    ball = frontier
    total = ball.count()
    totals = [total]
    for _ in range(max_r):
        if frontier is not None:
            grown = (
                frontier.hint("shuffle_hash")
                .join(edges, frontier.member == edges.src, "inner")
                .select("root", F.col("dst").alias("member"))
                .distinct()
            )
            new = grown.join(ball, ["root", "member"], "left_anti").transform(
                truncate_lineage
            )
            n_new = new.count()
            if n_new:
                ball = ball.unionByName(new).transform(truncate_lineage)
                total += n_new
                frontier = new
            else:
                frontier = None  # saturated — every later N(r) equals N(r-1)
        totals.append(total)
    edges.unpersist()
    return totals


def neighborhood_sizes_exact(g: EncodedGraph, radius: int = 2) -> DataFrame:
    """(vid, ball) — exact count of distinct vertices within <= radius
    directed hops, self included. Pair-table expansion: use for small r
    and correctness oracles; switch to hyperball at scale."""
    if radius < 0:
        raise ValueError(f"radius must be >= 0, got {radius}")
    # frontier expansion (see neighborhood_function_exact): expand only
    # last round's additions, anti-join the ball, stop when saturated —
    # identical ball sets without the per-round full-table distinct
    edges = cluster_for_loop(
        g.edges.select("src", "dst"), "src", num_rows=g.edges.count()
    )
    frontier = g.vertices.select(
        F.col("vid").alias("root"), F.col("vid").alias("member")
    ).transform(truncate_lineage)
    ball = frontier
    for _ in range(radius):
        grown = (
            frontier.hint("shuffle_hash")
            .join(edges, frontier.member == edges.src, "inner")
            .select("root", F.col("dst").alias("member"))
            .distinct()
        )
        new = grown.join(ball, ["root", "member"], "left_anti").transform(
            truncate_lineage
        )
        if not new.take(1):
            break
        ball = ball.unionByName(new).transform(truncate_lineage)
        frontier = new
    edges.unpersist()
    return ball.groupBy("root").agg(F.count("*").alias("ball")).select(
        F.col("root").alias("vid"), F.col("ball").cast("long").alias("ball")
    )


def vertex_hash(vid, seed: int):
    """Nonnegative portable hash of a vid (same in SQL: see
    vertex_hash_sql). Two-step mod keeps every intermediate < 2^62."""
    nn = (vid % ANF_MOD + ANF_MOD) % ANF_MOD
    return (nn * _B1 + F.lit(seed) * _B2) % ANF_MOD


def vertex_hash_sql(vid: str, seed: int) -> str:
    m = ANF_MOD
    return f"((({vid} % {m} + {m}) % {m}) * {_B1} + {seed} * {_B2}) % {m}"


def rho_column(h):
    """1 + trailing-zero-count of h (h >= 0); the HLL rank. Unrolled
    integer probes (h % 2^k == 0), portable to SQL via the same chain."""
    expr = F.lit(1)
    for i in range(30):
        expr = F.when((h % F.lit(1 << (i + 1))) == 0, F.lit(i + 2)).otherwise(expr)
    return expr


def rho_sql(h: str) -> str:
    expr = "1"
    for i in range(30):
        expr = f"CASE WHEN ({h}) % {1 << (i + 1)} = 0 THEN {i + 2} ELSE {expr} END"
    return expr


def hyperball_registers(
    g: EncodedGraph,
    radius: int = 2,
    m: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(vid, j, reg) long-layout HyperBall registers after `radius` merge
    rounds: register j of v holds the max rho among hashed members of
    v's r-ball that map to bucket j. Simple (one groupBy-max per round)
    but each edge meets all m register rows — E*m shuffled rows per
    round. Use hyperball_registers_wide at scale (E rows per round); this
    layout remains the oracle-checked reference and the merge-friendly
    exchange format."""
    if radius < 0:
        raise ValueError(f"radius must be >= 0, got {radius}")
    spark = g.edges.sparkSession
    # project the ALREADY-persisted EncodedGraph edges — re-persisting
    # the projection would hold a second in-memory copy (the
    # _shared_edges rule, webgraph/algos/bfs.py)
    edges = g.edges.select("src", "dst")
    v = g.vertices.select("vid")
    h = vertex_hash(F.col("vid"), seed)
    own = v.select(
        "vid",
        (h % m).cast("int").alias("j"),
        rho_column((h / F.lit(m)).cast("long")).cast("long").alias("reg"),
    )
    cells = v.crossJoin(spark.range(m).select(F.col("id").cast("int").alias("j")))
    regs = (
        cells.join(own, ["vid", "j"], "left")
        .select("vid", "j", F.coalesce(F.col("reg"), F.lit(0)).alias("reg"))
        .transform(truncate_lineage)
    )
    for _ in range(radius):
        nbr = (
            edges.join(regs.withColumnRenamed("vid", "dst"), "dst", "inner")
            .groupBy(F.col("src").alias("vid"), "j")
            .agg(F.max("reg").alias("nreg"))
        )
        regs = (
            regs.join(nbr, ["vid", "j"], "left")
            .select(
                "vid", "j",
                F.greatest(
                    F.col("reg"), F.coalesce(F.col("nreg"), F.lit(0))
                ).alias("reg"),
            )
            .transform(truncate_lineage)
        )
    return regs


def hyperball_estimate(regs: DataFrame, m: int = 16) -> DataFrame:
    """(vid, ball_est) — the standard HyperLogLog estimator over the long
    register layout, with small-range (linear counting) correction. The
    hash domain here is ~2^30/m per register, plenty for web-scale balls;
    expected relative error ~1.04/sqrt(m)."""
    agg = regs.groupBy("vid").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("z"),
        F.sum((F.col("reg") == 0).cast("int")).alias("v0"),
    )
    return agg.select(
        "vid", _estimate_exprs(F.col("z"), F.col("v0"), m).alias("ball_est")
    )


def hyperball_registers_wide(
    g: EncodedGraph,
    radius: int = 2,
    m: int = 16,
    seed: int = 42,
) -> DataFrame:
    """The scale-preferred HyperBall layout: ONE row per vertex with m
    register COLUMNS (reg0..reg{m-1}), merged per round by m column-wise
    max aggregates over a single edges ⋈ registers join. The long layout
    (hyperball_registers) shuffles E*m rows per round (each edge meets m
    register rows); this one shuffles E rows — at 10^9 edges and m=64
    that is the difference between 64 billion and 1 billion shuffled rows
    per round. Results are identical (pytest pins equivalence).
    """
    if radius < 0:
        raise ValueError(f"radius must be >= 0, got {radius}")
    # project the ALREADY-persisted EncodedGraph edges — re-persisting
    # the projection would hold a second in-memory copy (the
    # _shared_edges rule, webgraph/algos/bfs.py)
    edges = g.edges.select("src", "dst")
    regs = _wide_init(g, m, seed)
    for _ in range(radius):
        regs = _wide_merge_round(edges, regs, m)
    return regs


def _wide_init(g: EncodedGraph, m: int, seed: int) -> DataFrame:
    """Wide-layout register init: vertex v contributes rho to its own
    bucket j(v), zero elsewhere. Shared by hyperball_registers_wide and
    neighborhood_function (one implementation, one equivalence pin).

    The hash chain and the 30-deep rho CASE are computed ONCE in a lower
    projection and the m register columns derive from the two small
    attributes: inlining them per column (m copies of ~300 overflow-
    checked ops) blows the generated method past janino's limits and
    silently drops the whole stage to interpreted mode. CollapseProject
    leaves the split alone — the producer expressions are non-cheap and
    referenced m times."""
    h = vertex_hash(F.col("vid"), seed)
    base = g.vertices.select(
        "vid",
        (h % m).cast("int").alias("_j"),
        rho_column((h / F.lit(m)).cast("long")).cast("long").alias("_rho"),
    )
    return base.select(
        "vid",
        *[
            F.when(F.col("_j") == i, F.col("_rho"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias(f"reg{i}")
            for i in range(m)
        ],
    ).transform(truncate_lineage)


def _wide_merge_round(edges: DataFrame, regs: DataFrame, m: int) -> DataFrame:
    """One HyperBall merge round over the wide layout: column-wise max of
    each vertex's registers with its out-neighbors'."""
    nbr = (
        edges.join(regs.withColumnRenamed("vid", "dst"), "dst", "inner")
        .groupBy(F.col("src").alias("vid"))
        .agg(*[F.max(f"reg{i}").alias(f"n{i}") for i in range(m)])
    )
    return (
        regs.join(nbr, "vid", "left")
        .select(
            "vid",
            *[
                F.greatest(
                    F.col(f"reg{i}"), F.coalesce(F.col(f"n{i}"), F.lit(0))
                ).alias(f"reg{i}")
                for i in range(m)
            ],
        )
        .transform(truncate_lineage)
    )


def wide_to_long(regs_wide: DataFrame, m: int = 16) -> DataFrame:
    """(vid, reg0..reg{m-1}) -> (vid, j, reg) for comparison/estimation."""
    pairs = F.array(
        *[
            F.struct(F.lit(i).cast("int").alias("j"), F.col(f"reg{i}").alias("reg"))
            for i in range(m)
        ]
    )
    return regs_wide.select("vid", F.explode(pairs).alias("p")).select(
        "vid", F.col("p.j").alias("j"), F.col("p.reg").alias("reg")
    )


def neighborhood_function(
    g: EncodedGraph,
    max_r: int,
    m: int = 64,
    seed: int = 42,
) -> list[dict]:
    """HyperANF: the neighborhood function N(r) = sum over vertices of
    |ball(v, r)|, estimated per radius from one shared wide-register
    sweep (each radius is one more merge round — the whole curve costs
    the same as the deepest ball). Returns per-radius metrics
    [{r, est_pairs}] — the curve behind effective-diameter reporting.
    """
    # project the ALREADY-persisted EncodedGraph edges — re-persisting
    # the projection would hold a second in-memory copy (the
    # _shared_edges rule, webgraph/algos/bfs.py)
    edges = g.edges.select("src", "dst")
    regs = _wide_init(g, m, seed)

    def total_estimate(r_df: DataFrame) -> float:
        est = hyperball_estimate(wide_to_long(r_df, m), m)
        return est.agg(F.sum("ball_est")).collect()[0][0]

    out = [{"r": 0, "est_pairs": float(g.num_vertices)}]
    for r in range(1, max_r + 1):
        regs = _wide_merge_round(edges, regs, m)
        out.append({"r": r, "est_pairs": float(total_estimate(regs))})
    return out


def effective_diameter(nf: list[dict], alpha: float = 0.9) -> int:
    """Smallest r whose N(r) reaches alpha * N(max_r) — the standard
    (integer) effective-diameter readout of the neighborhood function."""
    target = alpha * nf[-1]["est_pairs"]
    for row in nf:
        if row["est_pairs"] >= target:
            return row["r"]
    return nf[-1]["r"]


def _estimate_exprs(z, v0, m: int):
    """The HLL estimate as a column expression over (z, v0) — shared by
    the long-layout hyperball_estimate and the wide-layout row-wise
    estimator so there is exactly one implementation of the correction
    arithmetic. z is order-independent-exact (a sum of dyadic terms
    fits a double's mantissa), so the same expression replays digit-
    for-digit in SQL."""
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    raw = F.lit(alpha * m * m) / z
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / v0)
    return F.when((raw <= 2.5 * m) & (v0 > 0), lin).otherwise(raw)


def _wide_estimate(regs_wide: DataFrame, m: int) -> DataFrame:
    """(vid, ball_est) from the wide layout with NO aggregate: z and v0
    are row-wise folds over the m register columns, so the per-round
    estimate inside hyperball_harmonic costs a projection, not a
    shuffle. Exactly equal to hyperball_estimate(wide_to_long(...)):
    z's dyadic terms sum exactly in any association."""
    z = sum(
        (F.pow(F.lit(2.0), -F.col(f"reg{i}")) for i in range(1, m)),
        F.pow(F.lit(2.0), -F.col("reg0")),
    )
    v0 = sum(
        ((F.col(f"reg{i}") == 0).cast("int") for i in range(1, m)),
        (F.col("reg0") == 0).cast("int"),
    )
    return regs_wide.select("vid", _estimate_exprs(z, v0, m).alias("ball_est"))


def hyperball_harmonic(
    g: EncodedGraph,
    max_r: int = 3,
    m: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(vid, harmonic_est) — harmonic centrality for EVERY vertex from
    one HyperBall sweep (Boldi & Vigna, "In-Core Computation of
    Geometric Centralities with HyperBall", ICDMW'13):

        harmonic(v) ≈ sum_{r=1..max_r} (|B(v,r)| - |B(v,r-1)|) / r,

    each ball size read from the shared register state after round r.
    This is THE scale path for closeness-family centralities: the exact
    sweep (harmonic_centrality) costs one BFS per SOURCE and is only
    viable for a landmark set, while this estimates all 10^9 vertices
    in max_r merge rounds over the wide layout (E shuffled rows per
    round, not E*m — hyperball_registers_wide's economics). Horizon-
    bounded like the exact neighborhood function; balls are directed
    (out-edges), matching hyperball_registers.

    Ball-size deltas inherit the HLL estimator's noise (±1.04/sqrt(m)
    relative), including the occasional NEGATIVE delta where the
    small-range correction hands off to the raw estimator between
    rounds — standard for the method; the per-round registers
    themselves are monotone. Every arithmetic step (dyadic z sums,
    IEEE divisions, fixed-order accumulation) is engine-exact, so the
    contract oracle replays the estimate digit-for-digit."""
    if max_r < 1:
        raise ValueError(f"hyperball_harmonic: max_r must be >= 1, got {max_r}")
    # project the ALREADY-persisted EncodedGraph edges — re-persisting
    # the projection would hold a second in-memory copy (the
    # _shared_edges rule, webgraph/algos/bfs.py)
    edges = g.edges.select("src", "dst")
    regs = _wide_init(g, m, seed)
    prev = _wide_estimate(regs, m).withColumnRenamed("ball_est", "_prev")
    harm = g.vertices.select("vid", F.lit(0.0).alias("harm"))
    for r in range(1, max_r + 1):
        regs = _wide_merge_round(edges, regs, m)
        est = _wide_estimate(regs, m).withColumnRenamed("ball_est", "_cur")
        harm = (
            harm.join(est, "vid")
            .join(prev, "vid")
            .select(
                "vid",
                (
                    F.col("harm")
                    + (F.col("_cur") - F.col("_prev")) / F.lit(float(r))
                ).alias("harm"),
            )
            .transform(truncate_lineage)
        )
        prev = est.withColumnRenamed("_cur", "_prev")
    return harm.select("vid", F.col("harm").alias("harmonic_est"))


def harmonic_exact(g: EncodedGraph, max_r: int) -> DataFrame:
    """(vid, harmonic) — EXACT within-horizon harmonic centrality via the
    pair-table ball expansion: sum_{r=1..max_r} (|B(r)| - |B(r-1)|)/r
    with exact ball counts (|B(r)| - |B(r-1)| = vertices at depth
    exactly r, so the sum is sum over reached w of 1/d(v,w)). O(V·ball)
    pair rows — the correctness-oracle twin of hyperball_harmonic, which
    replaces the pair table with registers at scale; the accumulation
    order matches it term for term so certifications compare the two
    directly."""
    if max_r < 1:
        raise ValueError(f"harmonic_exact: max_r must be >= 1, got {max_r}")
    # r06 frontier form: |B(r)| - |B(r-1)| IS the per-root count of
    # members first reached at radius r, so the harmonic term needs only
    # the newly-added frontier — no per-round full-ball distinct or
    # count, and the loop exits at saturation (every later term is
    # exactly +0.0/r, leaving the IEEE accumulation bit-identical).
    edges = cluster_for_loop(
        g.edges.select("src", "dst"), "src", num_rows=g.edges.count()
    )
    verts = g.vertices.select("vid")
    frontier = verts.select(
        F.col("vid").alias("root"), F.col("vid").alias("member")
    ).transform(truncate_lineage)
    ball = frontier
    harm = verts.select("vid", F.lit(0.0).alias("harmonic"))
    for r in range(1, max_r + 1):
        grown = (
            frontier.hint("shuffle_hash")
            .join(edges, frontier.member == edges.src, "inner")
            .select("root", F.col("dst").alias("member"))
            .distinct()
        )
        new = grown.join(ball, ["root", "member"], "left_anti").transform(
            truncate_lineage
        )
        if not new.take(1):
            break
        delta = new.groupBy("root").agg(F.count("*").alias("_d")).select(
            F.col("root").alias("vid"), "_d"
        )
        harm = (
            harm.join(delta.hint("shuffle_hash"), "vid", "left")
            .select(
                "vid",
                (
                    F.col("harmonic")
                    + F.coalesce(F.col("_d"), F.lit(0)).cast("double")
                    / F.lit(float(r))
                ).alias("harmonic"),
            )
            .transform(truncate_lineage)
        )
        ball = ball.unionByName(new).transform(truncate_lineage)
        frontier = new
    edges.unpersist()
    return harm
