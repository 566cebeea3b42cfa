"""Shared graph plumbing: vid encoding, edge partitioning, skew salting.

Mirrors Neo4j's internal url -> node-id resolution
(BatchGraphImporter.java:330-339) with a distributed dictionary encode, and
implements the north_rule's "salted, degree-aware CSR edge partitions" as:

- string keys dictionary-encoded to dense-ish longs once, up front (longs
  shuffle ~5-10x cheaper than URL strings across 10+ iterations);
- edges repartitioned by the iteration join key and persisted/checkpointed
  so every iteration reuses one physical layout (no re-shuffle of the big
  side — only the small per-vertex state moves);
- explicit salting helpers for hub keys (power-law dsts), on top of AQE's
  runtime skew-join splitting.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class EncodedGraph(NamedTuple):
    vertices: DataFrame  # vid:long, url:string
    edges: DataFrame  # src:long, dst:long  (deduplicated)
    num_vertices: int


def encode_graph(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    partitions: int | None = None,
) -> EncodedGraph:
    """Dictionary-encode string endpoints to unique longs.

    vids come from ``monotonically_increasing_id`` over the distinct vertex
    set: unique by construction (no 64-bit-hash collision risk at 10^9
    vertices), assigned without any shuffle beyond the distinct itself.
    They are stable for the lifetime of the returned (persisted) frames;
    resumable runs persist the mapping via CheckpointManager and reload it
    rather than re-encode. Algorithms key on vid and only join urls back
    for final output.
    """
    # Materialize the (src, dst) string pairs ONCE: both the vertex
    # dictionary and the encoded-edge joins read this cache, where deriving
    # each from the raw input would execute the whole upstream pipeline
    # (scan -> extract -> filter -> dedup) twice.
    raw = edges.select(src, dst).persist()
    verts = (
        raw.select(F.col(src).alias("url"))
        .unionByName(raw.select(F.col(dst).alias("url")))
        .distinct()
        .withColumn("vid", F.monotonically_increasing_id())
        .select("vid", "url")
        .persist()
    )
    n = verts.count()  # materializes the mapping so vids never re-derive

    e = (
        raw.join(verts.withColumnRenamed("url", src), src, "inner")
        .withColumnRenamed("vid", "src_vid")
        .join(verts.withColumnRenamed("url", dst).withColumnRenamed("vid", "dst_vid"), dst, "inner")
        .select(F.col("src_vid").alias("src"), F.col("dst_vid").alias("dst"))
    )
    if partitions:
        e = e.repartition(partitions, "src")
    e = e.persist()
    e.count()
    raw.unpersist()
    return EncodedGraph(vertices=verts, edges=e, num_vertices=n)


def from_int_edges(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    assume_distinct: bool = False,
) -> EncodedGraph:
    """Wrap an already-integer-keyed edge table as an EncodedGraph (vid ≡
    the integer key, no dictionary encode). Used when the upstream data
    carries numeric ids (e.g. the driver's TPC-H-derived graphs).

    Both caches materialize in ONE job (round 6): the vertex set derives
    from the persisted edge frame through a single ``explode`` branch —
    the same vid set as the union-of-endpoints form, but one subtree, so
    the edge cache fills as a side effect of the one vertex count and the
    upstream plan (scan + dedup) executes exactly once (the former
    edges-count-then-vertices-count shape paid two job submissions, and a
    two-branch union over a not-yet-materialized cache races both
    branches into the upstream). ``assume_distinct=True`` skips the
    (src, dst) dedup when the caller's input is provably duplicate-free
    (e.g. ends in its own DISTINCT); the wrapped result is identical
    either way."""
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    if not assume_distinct:
        e = e.distinct()
    e = e.persist()
    verts = (
        e.select(F.explode(F.array("src", "dst")).alias("vid"))
        .distinct()
        .withColumn("url", F.col("vid").cast("string"))
        .persist()
    )
    n = verts.count()
    return EncodedGraph(vertices=verts, edges=e, num_vertices=n)


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Iteration-state truncation: ``localCheckpoint(eager=True)`` plus a
    plan-statistics reset. Use this — not a bare localCheckpoint — at every
    truncation point inside an iterative join loop.

    Why the reset exists: Spark propagates the *origin plan's* estimated
    statistics through (local)checkpoints (LogicalRDD keeps
    ``originStats`` so post-checkpoint planning can still pick broadcast
    joins). Size-only estimation multiplies children's ``sizeInBytes``
    at every join, so a loop that joins its own checkpointed state keeps
    COMPOUNDING the estimate: one self-join per round doubles the digit
    count of the BigInt (pointer doubling squares it per jump). After
    ~15 rounds the estimate is a million-digit BigInteger and Catalyst
    spends minutes inside ``BigInteger.multiply`` (Toom-Cook) computing
    statistics nobody needs — the driver, not the executors, becomes the
    bottleneck (observed: g_msf at sf0.01 stuck >12 min with zero running
    tasks, jstack pointing at SizeInBytesOnlyStatsPlanVisitor).

    The reset rebuilds the DataFrame over the already-materialized
    InternalRow RDD without origin stats, so the leaf reports the
    conservative default size (never broadcast the state frame — the
    right call for V-sized iteration state at web scale; genuinely small
    frames on the OTHER side of a join keep their real stats and still
    broadcast). Falls back to the plain checkpoint if the JVM seam is
    unavailable — correctness is unaffected either way.
    """
    out = df.localCheckpoint(eager=True)
    try:
        spark = out.sparkSession
        jdf = out._jdf
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception:  # pragma: no cover - private-API fallback
        return out


def cluster_for_loop(
    edges: DataFrame, key: str, num_rows: int | None = None
) -> DataFrame:
    """Repartition a stationary edge frame by its per-iteration join key
    and persist it. Iterative loops then stream this cache with zero
    exchange and zero sort (pair it with a ``shuffle_hash`` hint on the
    V-shaped state side — sort-merge would re-sort all E rows every
    iteration, and without explicit clustering the layout depends on
    whichever join built the frame). Partition count is explicit and
    scale-derived (~24 B/row cached, ≤128 MB per partition, floor =
    cluster parallelism) — an unnumbered repartition would let AQE
    coalesce the loop's layout below the core count. The caller owns the
    cache and should unpersist it when the loop ends."""
    spark = edges.sparkSession
    if num_rows is None:
        num_rows = edges.count()
    n_parts = max(
        spark.sparkContext.defaultParallelism,
        int(num_rows * 24 // (128 << 20)) + 1,
    )
    return edges.repartition(n_parts, key).persist()


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: both directions, self-loops dropped, deduplicated.
    Used by CC / LP / triangles (link direction is a crawl artifact there)."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).filter(F.col("src") != F.col("dst")).distinct()


def hot_keys(edges: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose degree exceeds `threshold` — the hub set to salt."""
    return (
        edges.groupBy(key)
        .count()
        .filter(F.col("count") > threshold)
        .select(F.col(key).alias("hot_key"))
    )


def salt_aggregate(
    df: DataFrame,
    key: str,
    value: str,
    salt_buckets: int,
) -> DataFrame:
    """Two-level sum: groupBy(key, salt) partial, then groupBy(key) final.

    Deterministic degree-agnostic salting for power-law aggregation keys.
    Note Spark's hash aggregate already partial-aggregates map-side, so
    this only pays off when a single reduce partition would otherwise
    exceed memory; drivers expose it as an option (AQE handles the common
    case at runtime).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(salt_buckets))
    )
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(f"sum_{value}"))


def from_weighted_edges(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> EncodedGraph:
    """Wrap integer-keyed WEIGHTED edges (already unique per (src, dst) —
    e.g. the output of contract_graph) as an EncodedGraph; the weight
    column rides along on g.edges for weight-aware algorithms
    (pagerank(weight_col=...))."""
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        F.col(weight).cast("double").alias("weight"),
    ).persist()
    # one materialization job: the single explode branch fills the edge
    # cache while computing the vertex set (see from_int_edges)
    verts = (
        e.select(F.explode(F.array("src", "dst")).alias("vid"))
        .distinct()
        .withColumn("url", F.col("vid").cast("string"))
        .persist()
    )
    n = verts.count()
    return EncodedGraph(vertices=verts, edges=e, num_vertices=n)


def contract_graph(
    g: EncodedGraph,
    mapping: DataFrame,
    drop_self: bool = True,
) -> DataFrame:
    """Graph contraction by a vertex -> group map: the host/domain-level
    rollup every link-graph pipeline needs (the reference stores a domain
    property per page for exactly this grouping, PageNode.java:13 /
    UrlUtil.java:43-51; contracting the page graph by it yields the
    domain-level link graph). Returns weighted group edges
    (src, dst, weight = number of underlying page edges).

    Scale: two vid-keyed equi joins (mapping is vertex-shaped — broadcast
    when small, SMJ otherwise) + one hash aggregate whose map-side partial
    aggregation collapses the quadratic hub fan-in before the shuffle.
    `drop_self` removes intra-group edges (standard for inter-host
    ranking; keep them for modularity-style diagnostics)."""
    m_src = mapping.select(F.col("vid").alias("src"), F.col("gid").alias("gsrc"))
    m_dst = mapping.select(F.col("vid").alias("dst"), F.col("gid").alias("gdst"))
    ge = (
        g.edges.join(m_src, "src", "inner")
        .join(m_dst, "dst", "inner")
        .groupBy("gsrc", "gdst")
        .agg(F.count("*").alias("weight"))
        .select(
            F.col("gsrc").alias("src"), F.col("gdst").alias("dst"), "weight"
        )
    )
    if drop_self:
        ge = ge.filter(F.col("src") != F.col("dst"))
    return ge
