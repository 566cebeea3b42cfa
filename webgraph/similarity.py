"""Similarity search over embedding columns (task brief): brute-force
cosine top-k as the exact baseline; IVF (coarse-quantizer buckets) as the
scale path.

Representation: `array<float>` columns; all math is done in double via
built-in higher-order functions (zip_with / aggregate) — JVM-side, no
Python. For 100 TB-scale corpora the IVF path bounds each query's work to
`nprobe` partitions of the corpus instead of a full scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k neighbors for every query row: broadcast the (small)
    query set against the corpus, window-rank per query.

    Returns (q_id, vec_id, cos, rank). The corpus side streams once; with
    Q queries the cross join is |corpus| x Q rows — fine for batch scoring
    (Q small), replaced by IVF for large Q."""
    c = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    q = queries.select(F.col(q_id_col), _as_double(F.col(q_vec_col)).alias("_qv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        q_id_col,
        id_col,
        (dot(F.col("_v"), F.col("_qv")) / (l2_norm(F.col("_v")) * l2_norm(F.col("_qv")))).alias(
            "cos"
        ),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(q_id_col, "rank")
    )


def mips_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact maximum-inner-product top-k for every query row — the
    recsys scoring primitive (user x item affinity), where the vector
    NORM carries signal (popularity/importance) and must NOT be
    normalized away, so cosine search is the wrong tool. Same
    broadcast-queries + per-query window shape as brute_force_topk,
    ranked by the raw dot product. Returns (q_id, vec_id, ip, rank).

    Scale path: mips_augment reduces MIPS to cosine NN, after which the
    IVF / hyperplane-LSH cosine infrastructure serves inner-product
    queries unchanged; this exact scorer is its oracle twin."""
    c = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    q = queries.select(F.col(q_id_col), _as_double(F.col(q_vec_col)).alias("_qv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        q_id_col, id_col, dot(F.col("_v"), F.col("_qv")).alias("ip")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(q_id_col).orderBy(F.desc("ip"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(q_id_col, "rank")
    )


def mips_augment(
    df: DataFrame,
    big_m: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, float]:
    """Asymmetric MIPS -> cosine reduction (Neyshabur & Srebro 2015,
    simple-LSH): scale every corpus vector by the corpus max norm M and
    append sqrt(1 - ||x/M||^2); a query appends 0. Then for unit-scaled
    queries, argmax <q, x> == argmax cosine over the augmented vectors,
    so every cosine ANN structure in this module (hyperplane LSH
    buckets, IVF) serves inner-product queries with NO new index code.
    Returns (augmented frame with ``aug`` column, M).

    Scale shape: M is one max aggregate (a driver scalar broadcast back
    as a literal); the transform itself is per-row codegen — no shuffle,
    no UDF."""
    d = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    if big_m is None:
        big_m = float(
            d.select(F.max(l2_norm(F.col("_v"))).alias("m")).collect()[0]["m"]
        )
    if big_m <= 0:
        raise ValueError(f"mips_augment: corpus max norm must be > 0, got {big_m}")
    scaled = F.transform(F.col("_v"), lambda x: x / F.lit(big_m))
    tail = F.sqrt(
        F.greatest(
            F.lit(0.0),
            F.lit(1.0)
            - F.aggregate(
                F.transform(scaled, lambda x: x * x),
                F.lit(0.0),
                lambda s, x: s + x,
            ),
        )
    )
    out = d.select(
        id_col, F.concat(scaled, F.array(tail)).alias("aug")
    )
    return out, big_m


def centroid_frame(spark, centroids: list[list[float]]) -> DataFrame:
    """(bucket, cvec) — the broadcast side of centroid assignment. The
    driver holds only the k x dim list; it ships to executors once as a
    broadcast relation, NOT as a Catalyst literal tree (a k x dim
    when-chain collapses codegen at realistic k >= 1024)."""
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "bucket int, cvec array<double>",
    )


def assign_buckets(
    base: DataFrame, cent_df: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """base(id, v [, carry...]) -> (id, v, carry..., bucket): nearest
    centroid by squared L2, deterministic ties to the lowest bucket id.

    Plan shape: BroadcastNestedLoopJoin (k rows per input row, emitted
    consecutively) -> hash aggregate whose map-side partial min collapses
    the k candidates back to 1 row per id BEFORE the exchange — the shuffle
    carries |base| rows regardless of k, and the expression tree is O(1)
    in k (the distance lambda is evaluated against the joined cvec column,
    not unrolled literals)."""
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    scored = base.join(F.broadcast(cent_df)).select(
        "id",
        "v",
        *carry,
        F.struct(d2.alias("d2"), F.col("bucket").alias("b")).alias("_db"),
    )
    aggs = [F.first(c).alias(c) for c in ("v", *carry)]  # constant per id
    return (
        scored.groupBy("id")
        .agg(*aggs, F.min("_db").alias("_m"))
        .select("id", "v", *carry, F.col("_m.b").alias("bucket"))
    )


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    init_centroids: list[list[float]] | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer.

    Init: the n_centroids rows ranked first by a seeded content hash (a
    stable pseudo-random sample), or the caller-supplied
    ``init_centroids`` (the contract oracle uses the k lowest-id vectors
    so the unrolled SQL twin can reproduce the init relationally). Each
    iteration: assign via the broadcast centroid join (assign_buckets) ->
    recompute means fully distributed (posexplode + groupBy). The driver
    holds only the k x dim centroid list (tiny); at no point does the
    plan embed k x dim literals."""
    base = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).persist()
    if init_centroids is not None:
        cents = [[float(x) for x in c] for c in init_centroids]
    else:
        cents = [
            [float(x) for x in r["v"]]
            for r in base.orderBy(F.xxhash64(F.col("v").cast("string"), F.lit(seed)))
            .limit(n_centroids)
            .collect()
        ]
    spark = emb.sparkSession
    for _ in range(iters):
        assigned = assign_buckets(base, centroid_frame(spark, cents))
        means = (
            assigned.select("bucket", F.posexplode("v").alias("pos", "val"))
            .groupBy("bucket", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("bucket")
            .agg(F.sort_array(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "bucket", F.transform("pm", lambda s: s.getField("m")).alias("centroid")
            )
            .collect()
        )
        new = {r["bucket"]: [float(x) for x in r["centroid"]] for r in means}
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    base.unpersist()
    return cents


def build_ivf_index(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    iters: int = 5,
    init_centroids: list[list[float]] | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Assign every vector to its nearest centroid bucket. At scale the
    returned frame is written partitioned by `bucket` so a query scans
    only its nprobe buckets (partition pruning does the rest).
    ``init_centroids`` passes through to kmeans_centroids (the portable
    lowest-id init the exact-oracle contract rows use)."""
    cents = kmeans_centroids(
        emb,
        n_centroids,
        iters=iters,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        init_centroids=init_centroids,
    )
    base = emb.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        F.col(vec_col).alias("_orig"),
    )
    assigned = assign_buckets(base, centroid_frame(emb.sparkSession, cents), ("_orig",))
    indexed = assigned.select(
        F.col("id").alias(id_col), F.col("_orig").alias(vec_col), "bucket"
    )
    return indexed, cents


def ivf_topk(
    indexed: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only the `nprobe` buckets whose centroids
    are closest to the query. Returns (vec_id, cos) desc."""
    import math

    def d2(c):
        return sum((x - y) ** 2 for x, y in zip(c, query_vec))

    probe = sorted(range(len(centroids)), key=lambda i: d2(centroids[i]))[:nprobe]
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(x * x for x in query_vec))
    v = _as_double(F.col(vec_col))
    cos = dot(v, qlit) / (l2_norm(v) * F.lit(qn))
    return (
        indexed.filter(F.col("bucket").isin(*probe))
        .select(id_col, cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def semdedup(
    emb: DataFrame,
    n_clusters: int = 16,
    tau: float = 0.95,
    kmeans_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_cluster: int = 2000,
    cc_max_iter: int = 8,
    strict: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic deduplication by k-means
    clustering + within-cluster cosine pruning. Embedding-space near-dups
    (paraphrases, re-encodings, boilerplate variants) rarely share exact
    n-grams, so MinHash misses them; clustering bounds the candidate set
    so the quadratic step runs per-cluster, never corpus-wide.

    Pipeline, each stage keeping its own economics at 100 TB:
    1. Coarse clusters via the IVF quantizer (build_ivf_index: broadcast
       centroid join, map-side argmin — the shuffle carries |emb| rows).
    2. Within-cluster pair join with EXACT cosine >= tau (per-cluster
       quadratic — the paper's design point: k scales with corpus size so
       clusters stay bounded; `max_cluster` guards the quadratic blowup
       the same way LSH bucket caps do, and `strict` makes an overflow
       fail loudly instead of shrinking the answer).
    3. Connected components over the (tiny) pair graph; survivor = min id
       per component — the same first-wins canonical rule as
       dedup.dedup_clusters, deterministic under any partitioning. The
       paper keeps the item farthest from the centroid; min-id is used
       here so keep/drop is engine-reproducible (documented deviation).

    Returns (id_col, cluster, dup_group, group_size, keep): every input
    row appears; singletons keep themselves.
    """
    from webgraph.algos.common import from_int_edges
    from webgraph.algos.components import connected_components

    indexed, _cents = build_ivf_index(
        emb, n_clusters, id_col=id_col, vec_col=vec_col,
        seed=seed, iters=kmeans_iters,
    )
    base = indexed.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        "bucket",
    ).persist()

    sizes = base.groupBy("bucket").agg(F.count("*").alias("n"))
    if strict:
        biggest = sizes.agg(F.max("n").alias("m")).collect()[0]["m"] or 0
        if biggest > max_cluster:
            raise ValueError(
                f"semdedup: cluster of size {biggest} exceeds "
                f"max_cluster={max_cluster} in strict mode — raise "
                "n_clusters so the per-cluster quadratic stays bounded"
            )
    ok = sizes.filter((F.col("n") > 1) & (F.col("n") <= max_cluster))
    inb = base.join(ok.select("bucket"), "bucket", "left_semi")
    a = inb.select("bucket", F.col("id").alias("a"), F.col("v").alias("va"))
    b = inb.select("bucket", F.col("id").alias("b"), F.col("v").alias("vb"))
    cos = dot(F.col("va"), F.col("vb")) / (
        l2_norm(F.col("va")) * l2_norm(F.col("vb"))
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cos.alias("cos"))
        .filter(F.col("cos") >= tau)
    )

    g = from_int_edges(pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    labels, cc_metrics = connected_components(
        g, max_iter=cc_max_iter, collect_skew=False
    )
    if cc_metrics and cc_metrics[-1].get("changed", 0) > 0:
        msg = (
            f"semdedup: connected components NOT converged after "
            f"{cc_max_iter} rounds — duplicate groups are split; raise "
            "cc_max_iter"
        )
        if strict:
            raise ValueError(msg)
        import logging

        logging.getLogger("webgraph.similarity").warning(msg)

    assigned = (
        base.select("id", "bucket")
        .join(labels.withColumnRenamed("vid", "id"), "id", "left")
        .select(
            "id",
            "bucket",
            F.coalesce(F.col("component"), F.col("id")).alias("dup_group"),
        )
    )
    grp = assigned.groupBy("dup_group").agg(F.count("*").alias("group_size"))
    out = (
        assigned.join(grp, "dup_group")
        .select(
            F.col("id").alias(id_col),
            F.col("bucket").alias("cluster"),
            "dup_group",
            F.col("group_size").cast("long").alias("group_size"),
            (F.col("id") == F.col("dup_group")).alias("keep"),
        )
        .localCheckpoint()
    )
    base.unpersist()
    return out


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    upper_only: bool = True,
) -> DataFrame:
    """Population covariance matrix of an array<float> embedding column:
    cov(i, j) = E[x_i x_j] - E[x_i] E[x_j]. Returns (i, j, n, cov) with
    0-based dims, upper triangle (i <= j) by default — the input to PCA
    whitening / decorrelation diagnostics over an embedding corpus.

    Single pass, Arrow-vectorized: each partition emits ONE partial row —
    (count, sum-vector, flattened Gram matrix) computed as numpy
    float64 X^T X over the whole partition — so the shuffle moves
    partitions x (d^2 + d + 1) doubles, never the rows. The tiny partial
    frame is then exploded positionally and reduced by one hash
    aggregate; no driver-side math beyond the final plan.

    Rows with NULL or wrong-length vectors are rejected loudly (a silent
    skip would bias the estimate): the partition raises on first sight.
    """
    import numpy as np
    import pandas as pd

    d = len(
        df.select(F.col(vec_col).alias("v")).filter(F.col("v").isNotNull())
        .limit(1).collect()[0]["v"]
    )

    def partial_gram(batches):
        n = 0
        s = np.zeros(d, dtype=np.float64)
        g = np.zeros((d, d), dtype=np.float64)
        for pdf in batches:
            col = pdf[vec_col]
            if col.isnull().any():
                raise ValueError("embedding_covariance: NULL vector")
            x = np.array([np.asarray(v, dtype=np.float64) for v in col])
            if x.size == 0:
                continue
            if x.shape[1] != d:
                raise ValueError(
                    f"embedding_covariance: ragged vector (expected {d})"
                )
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    # materialize: the n_total readout below must not re-run the corpus
    # scan that the main plan already pays for
    partials = df.select(F.col(vec_col)).mapInPandas(
        partial_gram, "n long, s array<double>, g array<double>"
    ).localCheckpoint(eager=True)
    # explode positionally: tiny frame (one row per partition), so the
    # d^2-way explode moves partitions x d^2 scalars — negligible
    pos = partials.select(
        "n",
        F.posexplode(F.concat(F.col("s"), F.col("g"))).alias("pos", "val"),
    )
    sums = pos.groupBy("pos").agg(F.sum("val").alias("val"))
    n_total = partials.agg(F.sum("n")).collect()[0][0]
    if not n_total:
        raise ValueError("embedding_covariance: empty input")
    means = (
        sums.filter(F.col("pos") < d)
        .select(F.col("pos").cast("long").alias("i"),
                (F.col("val") / n_total).alias("mu"))
    )
    gram = sums.filter(F.col("pos") >= d).select(
        ((F.col("pos") - d) / d).cast("long").alias("i"),
        ((F.col("pos") - d) % d).cast("long").alias("j"),
        (F.col("val") / n_total).alias("exy"),
    )
    out = (
        gram.join(means.withColumnRenamed("mu", "mi"), "i")
        .join(
            means.select(F.col("i").alias("j"), F.col("mu").alias("mj")), "j"
        )
        .select(
            "i",
            "j",
            F.lit(int(n_total)).cast("long").alias("n"),
            (F.col("exy") - F.col("mi") * F.col("mj")).alias("cov"),
        )
    )
    if upper_only:
        out = out.filter(F.col("i") <= F.col("j"))
    return out


# --------------------------------------------- product quantization --


def build_pq_index(
    emb: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Product quantization (Jegou et al. 2011, "Product quantization for
    nearest neighbor search"): split each vector into ``m`` contiguous
    subspaces, learn an ``n_codes``-entry codebook per subspace, store
    each vector as ``m`` small codes. Memory per vector drops from
    dim x 4 bytes to m bytes — the standard billion-vector ANN
    compression, complementary to IVF (which prunes the scan; IVF-PQ
    composes both).

    Codebook init is the portable-hash sample (the repo's deterministic
    sampling convention, seed + j per subspace) so ``iters=0`` is exactly
    SQL-replayable by the contract oracle; ``iters>0`` runs Lloyd rounds
    per subspace through the same assign/mean machinery as
    kmeans_centroids (broadcast centroids, distributed means — covered by
    pytest fixtures rather than SQL).

    Returns (codes frame ``(id_col, codes array<int>)``, codebooks
    ``[m][n_codes][dsub]``). Encode is ONE pass over the corpus: the m
    subspaces explode in-row (m rows per vector), join the broadcast
    (j, code, cvec) table, and a map-side-combining MIN(struct) argmin
    collapses the m x n_codes candidates before the single id-keyed
    exchange — full vectors never shuffle.
    """
    from webgraph.dedup import POLY_MOD, _MIX_BASE

    spark = emb.sparkSession
    base = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).persist()
    first = base.select(F.size("v").alias("d")).first()
    if first is None:
        raise ValueError("build_pq_index: empty embedding frame")
    dim = first["d"]
    if dim % m != 0:
        raise ValueError(f"build_pq_index: dim {dim} not divisible by m={m}")
    dsub = dim // m

    codebooks: list[list[list[float]]] = []
    for j in range(m):
        sub = base.select("id", F.slice("v", j * dsub + 1, dsub).alias("v"))
        pr = ((F.col("id") % POLY_MOD) * F.lit(_MIX_BASE) + F.lit(seed + j)) % POLY_MOD
        cents = [
            [float(x) for x in r["v"]]
            for r in sub.orderBy(pr, "id").limit(n_codes).collect()
        ]
        for _ in range(iters):
            assigned = assign_buckets(sub, centroid_frame(spark, cents))
            means = (
                assigned.select("bucket", F.posexplode("v").alias("pos", "val"))
                .groupBy("bucket", "pos")
                .agg(F.avg("val").alias("mv"))
                .groupBy("bucket")
                .agg(
                    F.sort_array(F.collect_list(F.struct("pos", "mv"))).alias("pm")
                )
                .select(
                    "bucket",
                    F.transform("pm", lambda s: s.getField("mv")).alias("c"),
                )
                .collect()
            )
            new = {r["bucket"]: [float(x) for x in r["c"]] for r in means}
            cents = [new.get(i, cents[i]) for i in range(len(cents))]
        codebooks.append(cents)

    cent_rows = [
        (j, c, codebooks[j][c])
        for j in range(m)
        for c in range(len(codebooks[j]))
    ]
    cdf = spark.createDataFrame(cent_rows, "j int, code int, cvec array<double>")
    sub_all = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.slice("v", j * dsub + 1, dsub).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("id", F.col("s.j").alias("j"), F.col("s.sv").alias("sv"))
    d2 = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    codes = (
        sub_all.join(F.broadcast(cdf), "j")
        .select(
            "id", "j", F.struct(d2.alias("d2"), F.col("code").alias("c")).alias("_dc")
        )
        .groupBy("id", "j")
        .agg(F.min("_dc").alias("_m"))
        .groupBy("id")
        .agg(
            F.sort_array(F.collect_list(F.struct("j", F.col("_m.c").alias("c"))))
            .alias("jc")
        )
        .select(
            F.col("id").alias(id_col),
            F.transform("jc", lambda s: s.getField("c")).alias("codes"),
        )
    )
    base.unpersist()
    return codes, codebooks


def pq_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ index: precompute the
    m x n_codes lookup table of squared distances between the query's
    subvectors and every codebook entry, then score each stored vector as
    the SUM of m table lookups — no vector math per corpus row at all.

    Each LUT entry is rounded to integer micro-units BEFORE the per-row
    sum (the t_bm25 trick), so the ranking is an integer total — exactly
    reproducible across engines regardless of float summation order.
    Returns (id_col, adc_e6) ascending; the plan is one in-row transform
    over the codes column + TakeOrderedAndProject.
    """
    import math

    m = len(codebooks)
    dsub = len(query_vec) // m
    lut_e6 = [
        [
            int(
                math.floor(
                    1e6
                    * sum(
                        (float(query_vec[j * dsub + i]) - c[i]) ** 2
                        for i in range(dsub)
                    )
                    + 0.5
                )
            )
            for c in codebooks[j]
        ]
        for j in range(m)
    ]
    lut_col = F.array(
        *[F.array(*[F.lit(x).cast("long") for x in row]) for row in lut_e6]
    )
    score = F.aggregate(
        F.zip_with(
            F.col("codes"), lut_col, lambda code, lut: F.element_at(lut, code + 1)
        ),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    return (
        codes.select(F.col(id_col), score.alias("adc_e6"))
        .orderBy(F.asc("adc_e6"), F.asc(id_col))
        .limit(k)
    )


def ivf_recall(
    indexed: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-query IVF evaluation — recall@k of the nprobe-probed index
    against the exact scan, fully distributed (no per-query driver
    loop): ``(qid, n_hits, recall_e6)`` per query. This is the
    measurement an index owner runs before trusting nprobe at scale;
    the contract row makes the APPROXIMATE regime (nprobe <
    n_centroids) oracle-exact, where e_ivf_topk only certifies the
    probe-all reduction.

    Plan: queries broadcast everywhere (they are the small side by
    construction). Probe selection = one broadcast centroid join + a
    per-query window over n_centroids rows; IVF candidates = probes
    joined to the index ON BUCKET (at scale: partition pruning on the
    bucket-partitioned layout); brute force = queries x corpus, the
    self-declared exact baseline. Both sides rank with the same
    (cosine DESC, id ASC) window, so ties resolve identically."""
    from pyspark.sql import Window

    spark = indexed.sparkSession
    cent_df = centroid_frame(spark, centroids)
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    w_probe = Window.partitionBy("qid").orderBy("d2", "bucket")
    probes = (
        q.join(F.broadcast(cent_df))
        .select("qid", "qv", "bucket", d2.alias("d2"))
        .withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= nprobe)
        .select("qid", "qv", "bucket")
    )
    base = indexed.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v"), "bucket"
    )
    cos = dot(F.col("v"), F.col("qv")) / (l2_norm(F.col("v")) * l2_norm(F.col("qv")))
    w_rank = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vid"))

    def topk(scored):
        return (
            scored.withColumn("_rk", F.row_number().over(w_rank))
            .filter(F.col("_rk") <= k)
            .select("qid", "vid")
        )

    ivf = topk(
        F.broadcast(probes).join(base, "bucket").select("qid", "vid", cos.alias("cos"))
    )
    brute = topk(base.join(F.broadcast(q)).select("qid", "vid", cos.alias("cos")))
    hits = ivf.join(brute, ["qid", "vid"]).groupBy("qid").agg(
        F.count("*").alias("n_hits")
    )
    return (
        q.select("qid")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(F.lit(1e6) * F.coalesce("n_hits", F.lit(0)) / k)
            .cast("long")
            .alias("recall_e6"),
        )
    )


def mean_vector(df: DataFrame, vec_col: str = "embedding") -> list[float]:
    """Per-dimension mean of an embedding column as a driver list (dim
    scalars — corpus-size-independent). Positional explode + avg here;
    at 10^12 rows the partial-sum pass inside embedding_covariance
    already carries the same sums and would be reused instead."""
    rows = (
        df.select(F.posexplode(_as_double(F.col(vec_col))).alias("i", "v"))
        .groupBy("i")
        .agg(F.avg("v").alias("mu"))
        .orderBy("i")
        .collect()
    )
    return [float(r["mu"]) for r in rows]


def top_principal_component(
    df: DataFrame,
    iters: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """Leading principal component by power iteration, plus every
    vector's centered projection onto it — the 1-D PCA readout
    (dominant direction of variation; the first step of whitening and
    of SemDeDup-style embedding hygiene).

    Scale split: the DISTRIBUTED work is one Arrow partial-Gram pass
    (embedding_covariance — partitions ship (d^2+d+1) doubles each) and
    one codegen projection scan; the power iteration itself runs on the
    DRIVER over the dim x dim matrix (dim^2 scalars, corpus-size-
    independent — driver-side math on a constant-size object is not a
    scale-out concern). Deterministic start (e_0 basis vector), L2
    normalization per round: the identical procedure is SQL-replayable,
    so the contract oracle certifies the whole pipeline including the
    iteration. Returns ((id, proj) DataFrame, pc list)."""
    if iters < 1:
        raise ValueError(f"top_principal_component: iters must be >= 1, got {iters}")
    cov_rows = embedding_covariance(df, vec_col).collect()
    dim = max(r["j"] for r in cov_rows) + 1
    c = [[0.0] * dim for _ in range(dim)]
    for r in cov_rows:
        c[r["i"]][r["j"]] = float(r["cov"])
        c[r["j"]][r["i"]] = float(r["cov"])
    v = [1.0] + [0.0] * (dim - 1)
    for _ in range(iters):
        u = [sum(c[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        s = sum(x * x for x in u) ** 0.5
        if s == 0.0:
            raise ValueError("top_principal_component: zero covariance matrix")
        v = [x / s for x in u]
    mu = mean_vector(df, vec_col)
    mu_dot = sum(mu[i] * v[i] for i in range(dim))
    pc_lit = F.array(*[F.lit(float(w)) for w in v])
    proj = dot(_as_double(F.col(vec_col)), pc_lit) - F.lit(float(mu_dot))
    return df.select(F.col(id_col), proj.alias("proj")), v


def sq_quantize(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> tuple[DataFrame, list[tuple[float, float]]]:
    """Per-dimension min/max scalar quantization to 8-bit codes (the
    int8-SQ memory mode every production vector store ships — 4x smaller
    than float32, scan-speed dot products): code = round((x - lo_d) *
    255 / (hi_d - lo_d)) in 0..255, constant dims collapsing to 0.

    Params are one (lo, hi) per dimension — a single posexplode
    min/max aggregate whose result is dim-sized (corpus-independent),
    collected and re-broadcast as literal arrays, the centroid_frame
    pattern. Quantization itself is a codegen transform over the array
    column; codes are INTEGERS, so downstream dot products are
    integer-exact and the whole regime is SQL-replayable bit-for-bit.

    Returns ((id, qvec array<long>) DataFrame, [(lo, hi)] params)."""
    pt = df.select(F.posexplode(_as_double(F.col(vec_col))).alias("pos", "val"))
    params = sorted(
        (r["pos"], float(r["lo"]), float(r["hi"]))
        for r in pt.groupBy("pos")
        .agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
        .collect()
    )
    lo = F.array(*[F.lit(l) for _, l, _ in params])
    span = F.array(*[F.lit(h - l) for _, l, h in params])
    qvec = F.transform(
        _as_double(F.col(vec_col)),
        lambda x, i: F.when(F.element_at(span, i + 1) == 0.0, F.lit(0)).otherwise(
            F.round(
                (x - F.element_at(lo, i + 1)) * 255 / F.element_at(span, i + 1)
            ).cast("long")
        ),
    )
    return df.select(F.col(id_col), qvec.alias("qvec")), [
        (l, h) for _, l, h in params
    ]


def sq_recall(
    df: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the int8-SQ regime against the exact fixed-point scan
    — the evaluate-your-approximations row for scalar quantization
    (alongside ivf_recall / pq / hll_error / landmark_error): does 8-bit
    precision change the top-k, and by how much?

    Both rankings are integer dot products — SQ codes on one side,
    1e-6 fixed-point components on the "exact" side — so every score,
    tie-break (score desc, id asc), and therefore the recall itself is
    engine-exact, not merely allclose. Queries are the first n_queries
    vectors, broadcast against the corpus (the single-query
    brute_force_topk pattern widened to a query TABLE); per-query
    ranking is a qid-partitioned window — parallel across queries, and
    at corpus scale the refinement is the standard two-phase top-k
    (per-partition partial top-k, then merge), same plan shape the IVF
    path already uses for probe pruning.

    Query selection assumes DENSE integer ids starting at 0 (the first
    n_queries ids are the query set); on sparse/offset ids it raises
    rather than silently certifying fewer (or zero) queries."""
    from pyspark.sql.window import Window

    if df.filter(F.col(id_col) < n_queries).isEmpty():
        raise ValueError(
            f"sq_recall: no rows with {id_col} < {n_queries}; query "
            "selection assumes dense integer ids starting at 0"
        )
    quant, _ = sq_quantize(df, id_col, vec_col)
    e6 = F.transform(
        _as_double(F.col(vec_col)), lambda x: F.round(x * 1e6).cast("long")
    )
    base = df.select(F.col(id_col), e6.alias("evec")).join(quant, id_col)
    qdf = (
        base.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("qid"),
            F.col("evec").alias("q_evec"),
            F.col("qvec").alias("q_qvec"),
        )
    )
    idot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        base.crossJoin(F.broadcast(qdf))
        .filter(F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            F.col(id_col),
            idot(F.col("evec"), F.col("q_evec")).alias("s_exact"),
            idot(F.col("qvec"), F.col("q_qvec")).alias("s_sq"),
        )
    )

    def topk(score):
        w = Window.partitionBy("qid").orderBy(F.desc(score), F.asc(id_col))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("qid", id_col)
        )

    hits = topk("s_exact").join(topk("s_sq"), ["qid", id_col])
    return (
        qdf.select("qid")
        .join(hits.groupBy("qid").agg(F.count("*").alias("n_hits")), "qid", "left")
        .select(
            "qid",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) * 1e6 / k)
            .cast("long")
            .alias("recall_e6"),
        )
    )


def pq_recall(
    df: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    m: int = 4,
    n_codes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of product-quantization ADC ranking against the exact
    fixed-point L2 scan — the PQ leg of evaluate-your-approximations
    (ivf_recall measures scan pruning, sq_recall 8-bit precision, this
    one m-byte code compression): how much of the true top-k survives
    when every vector is m bytes?

    Both rankings are integer-exact: each per-subspace LUT entry rounds
    to micro-units BEFORE the per-vector sum (the pq_topk convention,
    widened from one driver-side query to a query TABLE computed
    DataFrame-side), and the exact side is squared L2 over 1e-6
    fixed-point components — so scores, (score asc, id asc) tie-breaks,
    and the recall itself reproduce across engines digit-for-digit.

    Plan: the LUT is (n_queries x m x n_codes) rows — broadcast; ADC
    scoring is the exploded codes column joined to it, one id-keyed
    aggregate, full vectors never touch the candidate side. The exact
    baseline is the brute scan against broadcast queries (self-declared
    exact, same as ivf_recall/sq_recall). ``iters=0`` codebooks keep
    the whole pipeline SQL-replayable.

    Query selection assumes DENSE integer ids starting at 0 (the first
    n_queries ids are the query set); on sparse/offset ids it raises
    rather than silently certifying fewer (or zero) queries."""
    from pyspark.sql.window import Window

    if df.filter(F.col(id_col) < n_queries).isEmpty():
        raise ValueError(
            f"pq_recall: no rows with {id_col} < {n_queries}; query "
            "selection assumes dense integer ids starting at 0"
        )
    spark = df.sparkSession
    codes, books = build_pq_index(
        df, m=m, n_codes=n_codes, iters=0, id_col=id_col, vec_col=vec_col, seed=seed
    )
    dsub = len(books[0][0])
    cent_rows = [
        (j, c, books[j][c]) for j in range(m) for c in range(len(books[j]))
    ]
    cdf = spark.createDataFrame(cent_rows, "j int, code int, cvec array<double>")

    base = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    sub_q = (
        base.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("qid"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.slice("v", j * dsub + 1, dsub).alias("sv"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("s"),
        )
        .select("qid", F.col("s.j").alias("j"), F.col("s.sv").alias("sv"))
    )
    d2 = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    lut = sub_q.join(F.broadcast(cdf), "j").select(
        "qid", "j", "code", F.round(d2 * 1e6).cast("long").alias("d2_e6")
    )
    adc = (
        codes.select(F.col(id_col), F.posexplode("codes").alias("j", "code"))
        .join(F.broadcast(lut), ["j", "code"])
        .filter(F.col(id_col) != F.col("qid"))
        .groupBy("qid", id_col)
        .agg(F.sum("d2_e6").alias("score"))
    )

    evec = F.transform(F.col("v"), lambda x: F.round(x * 1e6).cast("long"))
    ib = base.select(F.col(id_col), evec.alias("evec"))
    qe = ib.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"), F.col("evec").alias("q_evec")
    )
    exact = (
        ib.crossJoin(F.broadcast(qe))
        .filter(F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            F.col(id_col),
            F.aggregate(
                F.zip_with(
                    F.col("evec"), F.col("q_evec"), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0).cast("long"),
                lambda s, x: s + x,
            ).alias("score"),
        )
    )

    def topk(scored):
        w = Window.partitionBy("qid").orderBy(F.asc("score"), F.asc(id_col))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("qid", id_col)
        )

    hits = topk(adc).join(topk(exact), ["qid", id_col])
    return (
        qe.select("qid")
        .join(hits.groupBy("qid").agg(F.count("*").alias("n_hits")), "qid", "left")
        .select(
            "qid",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) * 1e6 / k)
            .cast("long")
            .alias("recall_e6"),
        )
    )


def filtered_topk(
    emb: DataFrame,
    queries: DataFrame,
    predicate: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Filtered vector search, exact PRE-FILTER reference: apply the
    metadata predicate, then the exact scan (brute_force_topk) over the
    survivors — top-k is taken WITHIN the filtered set, never globally
    then filtered (the classic filtered-ANN bug: a selective predicate
    starves a post-filtered global top-k below k results).

    The 100 TB decision is selectivity-driven: a SELECTIVE predicate
    wants this pre-filter shape (the filter pushes into the scan and
    the survivors are cheap to score exactly); a LOOSE predicate wants
    ivf_filtered_topk (probe nprobe buckets with k*oversample, filter,
    cut to k — never scans the corpus). This exact path is the
    oracle-able twin the contract checks."""
    return brute_force_topk(
        emb.filter(predicate), queries, k,
        id_col=id_col, vec_col=vec_col,
        q_id_col=q_id_col, q_vec_col=q_vec_col,
    )


def ivf_filtered_topk(
    indexed: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    predicate: Column,
    k: int = 10,
    nprobe: int = 4,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    meta: DataFrame | None = None,
) -> DataFrame:
    """Filtered ANN, POST-FILTER scale path: probe the nprobe nearest
    buckets for k*oversample candidates, apply the predicate, cut to k.
    The oversample factor buys back the candidates the predicate
    removes — with selectivity s, E[survivors] ≈ s*k*oversample, so
    oversample ≈ ceil(1/s) keeps recall flat without widening nprobe.
    Exact on any query whose true filtered top-k lies inside the probed
    buckets' first k*oversample candidates (pytest pins agreement with
    filtered_topk at full probe)."""
    cand = ivf_topk(
        indexed, centroids, query_vec,
        k=k * oversample, nprobe=nprobe, id_col=id_col, vec_col=vec_col,
    )
    # build_ivf_index keeps only (id, vec, bucket); predicates over other
    # metadata columns evaluate against ``meta`` (id + metadata — at
    # scale a skinny broadcastable frame, or the partitioned base table)
    keyed = (meta if meta is not None else indexed).select(
        F.col(id_col), predicate.alias("_keep")
    )
    return (
        cand.join(keyed, id_col)
        .filter(F.col("_keep"))
        .drop("_keep")
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def range_search(
    emb: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Radius (range) search: every corpus vector with cosine >=
    threshold per query — the FAISS range_search analog, the primitive
    behind near-dup sweeps where the NUMBER of neighbors is unknown
    a-priori (top-k truncates dense neighborhoods; range search
    returns them whole). Broadcast the query set, one corpus scan, no
    window: output size is data-dependent by design. The LSH-bucketed
    near-dup family (embedding_near_dup_pairs) is the all-pairs scale
    path; this is the per-query exact form."""
    c = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    q = queries.select(F.col(q_id_col), _as_double(F.col(q_vec_col)).alias("_qv"))
    cos = dot(F.col("_v"), F.col("_qv")) / (
        l2_norm(F.col("_v")) * l2_norm(F.col("_qv"))
    )
    return (
        c.crossJoin(F.broadcast(q))
        .select(q_id_col, id_col, cos.alias("cos"))
        .filter(F.col("cos") >= F.lit(float(threshold)))
    )
