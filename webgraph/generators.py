"""Deterministic synthetic graph generation — R-MAT (Chakrabarti, Zhan
& Faloutsos, SDM 2004), the standard scale-free benchmark generator
(Graph500 uses the same recursion). An engine that targets 100 TB needs
to BENCHMARK at sizes no stored fixture covers; a generator whose output
is a pure function of the edge index produces that input at any scale
with zero I/O and zero shuffle: ``spark.range(n_edges)`` partitions the
index space, every edge derives independently inside whole-stage
codegen, and the same arithmetic replays in plain SQL (the walks.py
no-RNG convention), so even the generator is oracle-checkable.

R-MAT recursion: each of ``scale`` levels picks one quadrant of the
(src, dst) adjacency square with probabilities a/b/c/d; the chosen
quadrant's bits append to src/dst. Quadrant choice here is a seeded
portable hash of (edge_index, level) reduced mod 1000 against integer
per-mille thresholds — integer arithmetic end to end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# dedup.py's mix_bit family: a DISTINCT MULTIPLIER per level. Any scheme
# where levels share one multiplied residue collapses — with r(i, l) =
# ((i*B + l*C) mod M) mod 1000 the whole per-edge bit vector is a
# function of (i*B) mod 1000, i.e. at most 1000 distinct vertices total
# (measured: 37). Stretching each level by its own multiplier is what
# decorrelates the bits.
RMAT_MOD = 1_000_000_007
_B_EDGE = 1_315_423_911
_B_STEP = 40_503


def _quadrant_hash(edge, level, seed: int):
    return (
        ((edge + F.lit(seed)) % RMAT_MOD) * (F.lit(_B_EDGE) + level * _B_STEP)
        + level
    ) % RMAT_MOD % 1000


def quadrant_hash_sql(edge: str, level: str, seed: int = 42) -> str:
    """The identical arithmetic as a SQL expression (oracle parity)."""
    m = RMAT_MOD
    return (
        f"((({edge} + {seed}) % {m}) * ({_B_EDGE} + {level} * {_B_STEP})"
        f" + {level}) % {m} % 1000"
    )


def rmat_edges(
    spark: SparkSession,
    scale: int = 8,
    n_edges: int = 2000,
    a: int = 570,
    b: int = 190,
    c: int = 190,
    seed: int = 42,
) -> DataFrame:
    """(edge_id, src, dst) over 2^scale vertices; a/b/c are per-mille
    quadrant probabilities (d = 1000-a-b-c). a > d skews mass toward
    low ids — the power-law in-degree shape real link graphs have, which
    is exactly what salting/AQE-skew benchmarks need to see. Pure
    codegen over ``spark.range``: no shuffle, no Python, no RNG state;
    100x the edges is the same plan over a longer range."""
    if not (0 < a + b + c <= 1000):
        raise ValueError("per-mille probabilities must sum to (0, 1000]")
    i = F.col("id")

    def bit_sum(bit_expr):
        # fold over levels MSB-first: acc*2 + bit — same value as the
        # shifted sum, no shift-by-column needed
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(scale - 1)),
            F.lit(0).cast("long"),
            lambda acc, lv: acc * 2 + bit_expr(_quadrant_hash(i, lv, seed)),
        )

    # quadrants: r < a -> (0,0); < a+b -> (0,1); < a+b+c -> (1,0); else (1,1)
    src_bit = lambda r: F.when(r < a + b, F.lit(0)).otherwise(F.lit(1)).cast("long")  # noqa: E731
    dst_bit = lambda r: (  # noqa: E731
        F.when((r >= a) & (r < a + b), F.lit(1))
        .when(r >= a + b + c, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
    )
    return spark.range(n_edges).select(
        F.col("id").alias("edge_id"),
        bit_sum(src_bit).alias("src"),
        bit_sum(dst_bit).alias("dst"),
    )


# --------------------------------------------------- configuration model --

# Stub-permutation priorities: one multiplier pair per side, the R-MAT
# distinct-multiplier lesson applied (shared multipliers would correlate
# the out- and in-permutations and bias the rewiring toward the original
# wiring). Residues are reduced mod CM_MOD before multiplying so every
# intermediate stays < 2^62 for arbitrary vids.
CM_MOD = 1_000_000_007
_CM_OUT_A, _CM_OUT_B = 2_654_435_761, 40_503
_CM_IN_A, _CM_IN_B = 1_315_423_911, 2_246_822_519


def _stub_priority(src, dst, mult_a: int, mult_b: int, seed: int):
    return (
        ((src % CM_MOD) * mult_a) % CM_MOD
        + ((dst % CM_MOD) * mult_b) % CM_MOD
        + seed
    ) % CM_MOD


def stub_priority_sql(side: str, seed: int = 42) -> str:
    """The identical priority arithmetic as SQL (oracle parity)."""
    a, b = (_CM_OUT_A, _CM_OUT_B) if side == "out" else (_CM_IN_A, _CM_IN_B)
    return (
        f"(((src % {CM_MOD}) * {a}) % {CM_MOD}"
        f" + ((dst % {CM_MOD}) * {b}) % {CM_MOD} + {seed}) % {CM_MOD}"
    )


def _global_rank(edges: DataFrame, pri, out_col: str) -> DataFrame:
    """(out_col, rank): 1-based global rank of each edge's stub under the
    strict order (priority, src, dst) — the token_prefix_sums protocol
    (range partition -> per-partition counts -> broadcast offsets ->
    within-partition row_number), NO single-task global window."""
    from pyspark.sql.window import Window

    spark = edges.sparkSession
    parts = spark.sparkContext.defaultParallelism
    d = (
        edges.select("src", "dst", pri.alias("_pri"))
        .repartitionByRange(parts, "_pri", "src", "dst")
        .withColumn("_p", F.spark_partition_id())
        .persist()
    )
    counts = sorted(
        (r["_p"], r["c"]) for r in d.groupBy("_p").agg(F.count("*").alias("c")).collect()
    )
    offsets, acc = [], 0
    for p, c in counts:
        offsets.append((p, acc))
        acc += c
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_p int, _off long")
    w = Window.partitionBy("_p").orderBy("_pri", "src", "dst")
    ranked = (
        d.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_p")
        .select(out_col, (F.col("_rn") + F.col("_off")).alias("rank"))
    )
    return ranked


def configuration_model(edges: DataFrame, seed: int = 42) -> DataFrame:
    """Degree-preserving null graph (the configuration model, Newman
    SIAM Rev. 2003 §4; Milo et al. 2002 use it as the motif-significance
    baseline): every edge contributes one out-stub at src and one
    in-stub at dst; pairing out-stub rank k with in-stub rank k under
    two independent seeded permutations rewires the graph while
    preserving EVERY vertex's exact out- and in-degree. Observed motif
    counts (triangles, butterflies, triads) are only meaningful against
    this baseline — a degree sequence alone forces many motifs.

    Deterministic: permutations are portable-hash priorities (strict
    order (pri, src, dst)), so the identical rewiring replays in plain
    SQL. Distributed: two global ranks via the range-partition +
    broadcast-offset protocol and one rank-keyed equi-join — O(E log E)
    sort shuffles, no single-task window, no driver data. Self-loops and
    multi-edges arise as in the standard model; callers filter if their
    statistic requires simple graphs."""
    out_pri = _stub_priority(F.col("src"), F.col("dst"), _CM_OUT_A, _CM_OUT_B, seed)
    in_pri = _stub_priority(F.col("src"), F.col("dst"), _CM_IN_A, _CM_IN_B, seed + 1)
    out_stubs = _global_rank(edges, out_pri, "src")
    in_stubs = _global_rank(edges, in_pri, "dst")
    return out_stubs.join(in_stubs, "rank").select("src", "dst")
