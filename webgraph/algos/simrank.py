"""Single-source SimRank — Monte-Carlo coupled fingerprint walks.

SimRank (Jeh & Widom KDD'02) scores two pages as similar when their
IN-neighborhoods are recursively similar: sim(a,b) = E[C^tau] where tau
is the first meeting time of two coupled reverse random walks started
at a and b. The naive fixpoint carries an O(V^2) pair table — the exact
thing this engine never materializes — so we implement the Fogaras-Racz
fingerprint estimator (VLDB'05 "Scaling link-based similarity search"):

- For sample r, ONE global step function f_{r,t}(v) = the in-neighbor u
  minimizing the seeded portable hash h(v, t, u, seed + r) (ties by u) —
  the same no-RNG-state determinism as algos/walks.py, so walks are
  reproducible across runs, partitionings, and engines, and the DuckDB
  oracle replays them exactly.
- Because the step depends only on (current vertex, step, sample), walks
  that collide COALESCE: once the walk from v meets the walk from the
  query vertex q they stay together forever, so "first meeting at step
  t" is well-defined and each (sample, vertex) row retires at its first
  meeting.
- sim(q, v) is estimated as (1/R) * sum over samples of C^tau_r. Decay
  weights ship as exact pre-scaled integers (micro-units of C = 0.8:
  1e6, 8e5, 64e4, 512e3, 4096e2, 32768e1), so the published scores are
  integer-exact on both engines — no floating pow in the contract.

Physical plan: state is (sample, start-vertex, current-vertex) — O(R*V)
skinny long rows, never pairs. Per step: one equi-join against the
stationary persisted REVERSED edge table + a map-side-combining argmin
aggregate (hub in-degree compresses at the mappers, the walks.py
economics), then meeting detection against an R-row broadcast of the
query walk's positions. Met and dangling rows retire, so state shrinks
monotonically; localCheckpoint truncates lineage per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.algos.common import EncodedGraph, cluster_for_loop, truncate_lineage
from webgraph.algos.walks import WALK_MOD, _B_CUR, _B_DST, _B_STEP

#: exact micro-unit decay table for C = 0.8 (index = meeting step tau)
DECAY_MICRO = [1_000_000, 800_000, 640_000, 512_000, 409_600, 327_680]


def _step_hash(cur, step: int, dst, seed_col):
    """h(cur, step, dst, seed) — walks.py's arithmetic with a *column*
    seed so all R samples advance in one join (seed = base + sample)."""
    return (
        ((cur % WALK_MOD) * _B_CUR) % WALK_MOD
        + (F.lit(step) * _B_STEP) % WALK_MOD
        + ((dst % WALK_MOD) * _B_DST) % WALK_MOD
        + seed_col
    ) % WALK_MOD


def simrank_single_source(
    g: EncodedGraph,
    query_vid: int,
    n_samples: int = 6,
    max_steps: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Returns ``(vid, sim_micro, meets)`` for every vertex whose coupled
    reverse walk met the query walk within ``max_steps`` in at least one
    sample, plus the query vertex itself (tau = 0 in every sample).
    ``sim_micro`` = sum over samples of DECAY_MICRO[tau] — divide by
    ``n_samples * 1e6`` for the SimRank estimate; kept integer so the
    contract compares exact values."""
    if max_steps >= len(DECAY_MICRO):
        raise ValueError(f"max_steps must be < {len(DECAY_MICRO)}")
    spark = g.edges.sparkSession
    # src-clustered loop cache: the per-step join keys on cur == rev.src
    rev = cluster_for_loop(
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        .distinct(),
        "src",
        num_rows=g.edges.count(),
    )
    rev.count()

    samples = spark.range(n_samples).select(F.col("id").alias("r"))
    state = (
        g.vertices.select("vid")
        .crossJoin(F.broadcast(samples))
        .select("r", "vid", F.col("vid").alias("cur"))
        .transform(truncate_lineage)
    )
    met_parts: list[DataFrame] = []
    for t in range(1, max_steps + 1):
        h = _step_hash(F.col("cur"), t, F.col("dst"), F.lit(seed) + F.col("r"))
        stepped = (
            state.hint("shuffle_hash").join(rev.withColumnRenamed("src", "cur"), "cur")
            .groupBy("r", "vid")
            .agg(F.min(F.struct(h.alias("h"), F.col("dst"))).alias("m"))
            .select("r", "vid", F.col("m.dst").alias("cur"))
            .transform(truncate_lineage)
        )
        qpos = stepped.filter(F.col("vid") == query_vid).select(
            "r", F.col("cur").alias("qcur")
        )
        met = (
            stepped.filter(F.col("vid") != query_vid)
            .join(F.broadcast(qpos), "r")
            .filter(F.col("cur") == F.col("qcur"))
            .select("r", "vid", F.lit(t).alias("tau"))
        )
        met_parts.append(met)
        state = stepped.join(met.select("r", "vid"), ["r", "vid"], "left_anti")

    # Every met_part is anchored on a localCheckpoint'd `stepped`, so the
    # reversed edge cache is no longer reachable from the returned plan.
    rev.unpersist()

    taus = met_parts[0]
    for part in met_parts[1:]:
        taus = taus.unionByName(part)
    decay = F.element_at(
        F.array(*[F.lit(d) for d in DECAY_MICRO]), F.col("tau") + 1
    )
    out = taus.groupBy("vid").agg(
        F.sum(decay).alias("sim_micro"), F.count("*").alias("meets")
    )
    self_row = spark.range(1).select(
        F.lit(query_vid).cast("long").alias("vid"),
        F.lit(n_samples * DECAY_MICRO[0]).cast("long").alias("sim_micro"),
        F.lit(n_samples).cast("long").alias("meets"),
    )
    return out.unionByName(self_row)
