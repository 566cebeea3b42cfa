"""Deduplication operators for training-data pipelines (task brief):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design: every method is shuffle-bounded by design —
- exact dedup: one hash aggregate on a 64-bit fingerprint (no string
  shuffle: the fingerprint is computed map-side).
- MinHash-LSH: signatures via k=`num_hashes` xxhash64 family (map-side),
  banded; candidate generation is an equi-join on (band, band_signature)
  buckets, i.e. only near-duplicates ever meet in a shuffle. Oversized
  buckets (degenerate content) are capped to bound the quadratic blowup,
  with the cap logged — never silent.
- SimHash: 64-bit signature by bit-voting token hashes (built-ins only),
  near-dup candidates via banding the signature into `bands` chunks
  (hamming-distance-bounded retrieval), verified by exact hamming.
- embedding near-dup: random-hyperplane LSH buckets + exact cosine verify.

All signatures are deterministic (xxhash64 with literal seeds) — re-runs
and resumed runs agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.text import fingerprint, tokens


# ------------------------------------------------------------- exact ----


def exact_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_ids_per_group: int | None = 100,
) -> DataFrame:
    """Groups of byte-identical (post whitespace/case normalization) docs:
    (fp, n_docs, doc_ids). One hash aggregate.

    ``doc_ids`` keeps only the ``max_ids_per_group`` smallest ids per
    group (``n_docs`` is always the exact full count): an unbounded
    collect_list would land a 10^6-copy fingerprint's whole posting list
    in one reducer's aggregation buffer. The capped path never builds
    that buffer — a rank window (sort-based, spillable) drops ids past
    the cap BEFORE the list is collected, so per-group memory is O(cap).
    The cap is explicit in the signature, never silent — pass None for
    the unbounded list (small corpora only)."""
    fps = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    if max_ids_per_group is None:
        grouped = fps.groupBy("fp").agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        return grouped.filter(F.col("n_docs") > 1)
    from pyspark.sql.window import Window

    counts = fps.groupBy("fp").agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("fp").orderBy(id_col)
    ids = (
        fps.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_ids_per_group)
        .groupBy("fp")  # same fp partitioning as the window: no re-shuffle
        .agg(F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
    )
    return counts.join(ids, "fp").filter(F.col("n_docs") > 1).select(
        "fp", "n_docs", "doc_ids"
    )


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the min-id representative per fingerprint (deterministic)."""
    w = (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w, id_col, "left_semi")


# ------------------------------------------------------------ shingles --


def shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) — distinct word n-grams, lowercased."""
    toks = tokens(F.lower(F.col(text_col)))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def bucket_pair_counts(kv: DataFrame, key: str, id_col: str) -> DataFrame:
    """(a, b, common) — for every `key` bucket, count co-occurring id
    pairs with a < b. ONE key-keyed aggregation into sorted id arrays
    with bucket-local pair expansion, replacing the classic self-join
    that shuffles the (usually string) key column TWICE and filters
    a < b only after generating both orders. Pair rows stream one per
    (member, later-member) — each carries one bucket array, bounded by
    that bucket's membership, never the quadratic pair set in one row.
    Exact: identical pair multiset to the self-join form."""
    buckets = (
        kv.groupBy(key)
        .agg(F.sort_array(F.collect_list(id_col)).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    members = buckets.select(
        "ds", F.posexplode("ds").alias("i", "a")
    ).filter(F.col("i") < F.size("ds") - 1)
    pairs = members.select(
        "a",
        F.explode(F.slice(F.col("ds"), F.col("i") + 2, F.size("ds"))).alias("b"),
    )
    return pairs.groupBy("a", "b").agg(F.count("*").alias("common"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a, b, jaccard) — the
    ground-truth method MinHash approximates. Quadratic only within
    shared-shingle buckets.

    `max_doc_freq` is the scale guard: the shared-shingle self-join is
    quadratic in a shingle's document frequency, so one boilerplate
    trigram shared by 10^6 docs would be 10^12 join rows. With a cap,
    shingles whose document frequency exceeds it are dropped from BOTH the
    intersection and the denominators (a consistent approximation —
    jaccard is then computed over the informative shingle set), and the
    number of dropped shingles is logged, never silent. None (the default
    and the contract-oracle mode) computes the exact statistic."""
    sh = shingles(df, id_col, text_col, n)
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
        hot = freq.filter(F.col("df_") > max_doc_freq)
        n_hot = hot.count()
        if n_hot:
            import logging

            logging.getLogger("webgraph.dedup").warning(
                "ngram_jaccard_pairs: dropping %d shingles with document "
                "frequency > %d (boilerplate guard)",
                n_hot,
                max_doc_freq,
            )
            sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
    sz = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    # sorted-bucket pair expansion: one shingle-keyed exchange instead of
    # the two the self-join paid (identical pairs — bucket_pair_counts)
    common = bucket_pair_counts(sh, "shingle", "id")
    return (
        common.join(sz.withColumnRenamed("id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sz.withColumnRenamed("id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .select(
            "a",
            "b",
            (
                F.col("common")
                / (F.col("na") + F.col("nb") - F.col("common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 16,
    min_shared: int = 1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Partial-duplicate / containment pairs (a, b, shared_windows) via
    rolling window fingerprints (winnowing-style): documents sharing >=
    `min_shared` distinct `window_tokens`-token windows. Catches quote /
    boilerplate / excerpt containment that whole-document Jaccard misses.

    Same scale shape as the other bucketed methods: fingerprints are the
    equi-join key (quadratic only within one fingerprint's posting list),
    `max_doc_freq` drops fingerprints seen in more than that many docs
    (logged). The fingerprint is the portable polynomial fold, so the
    contract oracle recomputes the identical hash in DuckDB — collisions
    (~1 in 10^9 per window pair) affect both engines identically."""
    from webgraph.text import rolling_fingerprints

    fps = df.select(
        F.col(id_col).alias("id"),
        F.explode(rolling_fingerprints(F.col(text_col), window_tokens)).alias("fp"),
    ).distinct()
    if max_doc_freq is not None:
        freq = fps.groupBy("fp").agg(F.count("*").alias("df_"))
        hot = freq.filter(F.col("df_") > max_doc_freq)
        n_hot = hot.count()
        if n_hot:
            import logging

            logging.getLogger("webgraph.dedup").warning(
                "containment_pairs: dropping %d fingerprints with document "
                "frequency > %d", n_hot, max_doc_freq,
            )
            fps = fps.join(hot.select("fp"), "fp", "left_anti")
    a = fps.select(F.col("id").alias("a"), "fp")
    b = fps.select(F.col("id").alias("b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared_windows"))
        .filter(F.col("shared_windows") >= min_shared)
    )


# ------------------------------------------------------------- minhash --


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 64
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) MinHash signatures.

    Hash family: xxhash64(shingle, i) for i in 0..k-1 — computed map-side
    as an array per shingle row, then positionally min-aggregated per doc
    (k scalar min aggregates; partial aggregation collapses each doc's
    shingles before the shuffle)."""
    hs = sh.select(
        "id",
        *[F.xxhash64("shingle", F.lit(i)).alias(f"h{i}") for i in range(num_hashes)],
    )
    aggs = [F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    mins = hs.groupBy("id").agg(*aggs)
    return mins.select(
        "id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_band_buckets(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """(id, band, bsig) — each signature cut into LSH band buckets. The
    bucket derivation depends ONLY on the document's signature, which is
    what makes the streaming variant order-independent: band rows union'd
    across micro-batches equal the batch bucket table exactly
    (streaming.py:streaming_minhash_state)."""
    return sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bsig"),
                ),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bsig").alias("bsig"))


def pairs_from_buckets(
    bucketed: DataFrame, max_bucket: int = 200, strict: bool = False
) -> DataFrame:
    """Candidate pairs (a, b) from a (id, band, bsig) bucket table.
    Buckets larger than `max_bucket` are dropped (degenerate boilerplate
    shingles), the standard guard against quadratic bucket blowup —
    counted, not silent. `strict=True` FAILS instead of dropping (one
    tiny aggregate job): exact-oracle contract runs use it so a cap-drop
    can never masquerade as a correct result."""
    sizes = bucketed.groupBy("band", "bsig").agg(F.count("*").alias("n"))
    if strict:
        biggest = sizes.agg(F.max("n").alias("m")).collect()[0]["m"] or 0
        if biggest > max_bucket:
            raise ValueError(
                f"minhash_lsh_candidates: bucket of size {biggest} exceeds "
                f"max_bucket={max_bucket} in strict mode (degenerate "
                "near-identical content group; raise max_bucket or dedup "
                "exactly first)"
            )
    ok = sizes.filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
    inb = bucketed.join(ok.select("band", "bsig"), ["band", "bsig"], "left_semi")
    a = inb.select("band", "bsig", F.col("id").alias("a"))
    b = inb.select("band", "bsig", F.col("id").alias("b"))
    return (
        a.join(b, ["band", "bsig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 200,
    strict: bool = False,
) -> DataFrame:
    """Candidate pairs (a, b) sharing at least one LSH band bucket.

    With b bands of r rows, a pair with Jaccard s collides with prob
    1-(1-s^r)^b (b=16, r=4: s=0.5 -> 64%, s=0.8 -> 99.9%). Composition of
    minhash_band_buckets + pairs_from_buckets (see those for the bucket
    cap / strict semantics)."""
    return pairs_from_buckets(
        minhash_band_buckets(sigs, bands, rows_per_band), max_bucket, strict
    )


def verify_jaccard_pairs(
    cands: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against the shingle
    table ``(id, shingle)``: returns (a, b, jaccard) with jaccard >=
    threshold. The verify step is what makes any LSH pipeline's output
    deterministic — candidates only affect recall, never precision."""
    sz = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a_sh = sh.select(F.col("id").alias("a"), "shingle")
    b_sh = sh.select(F.col("id").alias("b"), "shingle")
    common = (
        cands.join(a_sh, "a")
        .join(b_sh, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sz.withColumnRenamed("id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sz.withColumnRenamed("id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .select(
            "a",
            "b",
            (F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    strict: bool = False,
) -> DataFrame:
    """Full MinHash-LSH pipeline: shingle -> sign -> band -> bucket-join ->
    verify candidates with EXACT Jaccard >= threshold. Returns
    (a, b, jaccard). The verify step makes the result deterministic (LSH
    only affects recall, never precision). `strict` fails loudly if any
    band bucket exceeds the size cap (see minhash_lsh_candidates)."""
    sh = shingles(df, id_col, text_col, n).persist()
    sigs = minhash_signatures(sh, num_hashes)
    cands = minhash_lsh_candidates(sigs, bands, num_hashes // bands, strict=strict)
    return verify_jaccard_pairs(cands, sh, threshold)


# ------------------------------------------------------------- simhash --


# Portable hash parameters: polynomial-31 token hash mod a 30-bit prime,
# re-mixed per bit with multipliers < 2^32 so every product stays < 2^62 —
# no BIGINT overflow in engines that (unlike the JVM) refuse to wrap.
POLY_MOD = 1_000_000_007
_MIX_BASE = 2_654_435_761  # Knuth's 2^32 / phi
_MIX_STEP = 40_503


def token_hash(tok) -> "F.Column":
    """Engine-portable token hash: fold (h*31 + charcode) % POLY_MOD over
    the characters. Chosen over xxhash64 so signatures are reproducible in
    plain integer SQL (the DuckDB oracle computes the identical fold).

    charcode is the Unicode CODE POINT on both engines: Spark's
    ascii/substr/length are code-point based (verified in 4.1.2 incl.
    non-BMP surrogate pairs) and DuckDB's ord() likewise — so the
    portability holds for arbitrary Unicode text, not just ASCII
    (pinned by tests/test_dedup_hash.py)."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(tok)),
        lambda i: F.ascii(F.substr(tok, i, F.lit(1))).cast("long"),
    )
    h = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, c: (acc * 31 + c) % POLY_MOD
    )
    # sequence(1, 0) is DESCENDING in Spark; guard the empty token
    return F.when(F.length(tok) == 0, F.lit(0).cast("long")).otherwise(h)


def mix_bit(h, i: int) -> "F.Column":
    """Pseudo-random bit i of token-hash h, portable integer arithmetic."""
    return ((h * F.lit(_MIX_BASE + _MIX_STEP * i) + F.lit(i)) % POLY_MOD) % 2


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash: long) 64-bit SimHash: per-token portable hash, each
    bit votes +1/-1 (duplicate tokens vote repeatedly = frequency
    weighting), signature bit = sign of the vote sum. Pure built-ins:
    explode tokens -> per-bit vote columns -> sum -> reassemble bits."""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).withColumn("h", token_hash(F.col("tok")))
    votes = tok.groupBy("id").agg(
        *[
            F.sum(F.when(mix_bit(F.col("h"), i) == 1, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(64)
        ]
    )
    # bits are disjoint, so sum == bitwise-or; bit 63 is the sign bit and
    # must be added as long-min (1<<63 overflows engines that check).
    sig = F.when(F.col("b63") > 0, F.lit(-(2**63)).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    for i in range(63):
        sig = sig + F.when(
            F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("id", sig.alias("simhash"))


def hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    sigs: DataFrame, max_hamming: int = 3, bands: int = 8
) -> DataFrame:
    """(a, b, hamming) pairs with hamming <= max_hamming.

    Banding the 64-bit signature into `bands` 8-bit chunks guarantees any
    pair within hamming < bands shares at least one identical chunk
    (pigeonhole), so candidates come from chunk-equality buckets — no
    all-pairs join."""
    width = 64 // bands
    # bands is static -> unroll in Python (F.shiftright needs an int shift)
    chunk_structs = [
        F.struct(
            F.lit(b).alias("chunk"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("val"),
        )
        for b in range(bands)
    ]
    chunked = sigs.select(
        "id", "simhash", F.explode(F.array(*chunk_structs)).alias("c")
    ).select("id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))
    a = chunked.select("chunk", "val", F.col("id").alias("a"), F.col("simhash").alias("sa"))
    b = chunked.select("chunk", "val", F.col("id").alias("b"), F.col("simhash").alias("sb"))
    cands = (
        a.join(b, ["chunk", "val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb")
        .distinct()
    )
    return cands.select(
        "a", "b", hamming64(F.col("sa"), F.col("sb")).cast("long").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# -------------------------------------------------- embedding near-dup --


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 12,
    seed: int = 42,
    max_bucket: int = 500,
    strict: bool = False,
) -> DataFrame:
    """(a, b, cos) pairs with cosine >= threshold via random-hyperplane LSH.

    Hyperplanes are deterministic pseudo-random unit-ish vectors derived
    from xxhash64(dim, plane, seed) — no driver-side numpy state to ship.
    Bucket = the `planes`-bit sign pattern; exact cosine verifies
    candidates (precision 1.0; recall grows with fewer planes).
    `strict=True` fails loudly when a sign bucket exceeds `max_bucket`
    instead of silently dropping it (contract-oracle mode)."""
    dim_count = F.size(F.col(vec_col))
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def plane_component(dim_idx, p):
        h = F.xxhash64(dim_idx, F.lit(p), F.lit(seed))
        return (F.pmod(h, F.lit(2000001)) - F.lit(1000000)).cast("double") / 1e6

    def signbit(p):
        dots = F.zip_with(
            vec_d,
            F.transform(F.sequence(F.lit(0), dim_count - 1), lambda i: plane_component(i, p)),
            lambda x, w: x * w,
        )
        s = F.aggregate(dots, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))

    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bucket = bucket * 2 + signbit(p)

    norm = F.sqrt(
        F.aggregate(F.transform(vec_d, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    base = emb.select(
        F.col(id_col).alias("id"), vec_d.alias("v"), norm.alias("nrm"), bucket.alias("bkt")
    ).persist()

    sizes = base.groupBy("bkt").agg(F.count("*").alias("n"))
    if strict:
        biggest = sizes.agg(F.max("n").alias("m")).collect()[0]["m"] or 0
        if biggest > max_bucket:
            raise ValueError(
                f"embedding_near_dup_pairs: bucket of size {biggest} exceeds "
                f"max_bucket={max_bucket} in strict mode"
            )
    ok = sizes.filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
    inb = base.join(ok.select("bkt"), "bkt", "left_semi")
    a = inb.select("bkt", F.col("id").alias("a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = inb.select("bkt", F.col("id").alias("b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = a.join(b, "bkt").filter(F.col("a") < F.col("b"))
    cos = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / (F.col("na") * F.col("nb"))
    return (
        pairs.select("a", "b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .distinct()
    )


def dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    max_iter: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Near-duplicate CLUSTERING — the keep/drop decision layer on top of
    minhash_dedup_pairs (pairs alone don't dedup a corpus: transitive
    groups A~B~C must collapse to one survivor). Connected components over
    the near-dup pair graph, canonical representative = min id per
    cluster (the reference's get-or-create keeps the FIRST node for a URL,
    BatchGraphImporter.java:266-301 — same first-wins rule, id-ordered so
    it is deterministic under any partitioning).

    Returns (id, cluster_id, cluster_size, keep): every corpus row appears,
    singletons as their own cluster, keep = (id == cluster_id).

    Scale: the pair graph is tiny relative to the corpus (only near-dups),
    so the CC runs on a graph orders of magnitude smaller than the input;
    the final attachment is one left join corpus⋈labels + one count agg.
    Min-label CC is monotone, so any rounds >= the true diameter yield the
    fixpoint — max_iter bounds pathological chains (logged via the CC
    metrics, never silently wrong: extra rounds are no-ops once converged).
    """
    from webgraph.algos.common import from_int_edges
    from webgraph.algos.components import connected_components

    pairs = minhash_dedup_pairs(
        df, id_col=id_col, text_col=text_col, threshold=threshold,
        num_hashes=num_hashes, bands=bands, strict=strict,
    )
    g = from_int_edges(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    labels, cc_metrics = connected_components(
        g, max_iter=max_iter, collect_skew=False
    )
    if cc_metrics and cc_metrics[-1].get("changed", 0) > 0:
        # Unconverged min-label propagation splits long near-dup chains
        # into several "clusters", each keeping a survivor — duplicates
        # would silently pass dedup. Same no-silent-caps policy as the
        # LSH bucket guards: fail in strict mode, shout otherwise.
        msg = (
            f"dedup_clusters: connected components NOT converged after "
            f"{max_iter} rounds ({cc_metrics[-1]['changed']} labels still "
            "changing) — near-dup chains longer than max_iter are split; "
            "raise max_iter"
        )
        if strict:
            raise ValueError(msg)
        import logging

        logging.getLogger("webgraph.dedup").warning(msg)
    assigned = (
        df.select(F.col(id_col))
        .join(labels.withColumnRenamed("vid", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )
    sizes = assigned.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        assigned.join(sizes, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            (F.col(id_col) == F.col("cluster_id")).alias("keep"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
) -> DataFrame:
    """Train/eval decontamination (the GPT-3 appendix-C method): flag any
    training document sharing an `window_tokens`-token window fingerprint
    with the evaluation set. Returns every train row as
    (id, n_shared_grams, contaminated).

    Reuses the containment machinery's two-level portable window hash, so
    the contract oracle replays the identical arithmetic. The eval gram
    set is tiny relative to the corpus (benchmarks, not crawls): Catalyst
    broadcasts it, making the scan-side semi-join shuffle-free for the
    train table; the per-doc gram count then aggregates only matching
    rows."""
    from webgraph.text import rolling_fingerprints

    tr = train.select(
        F.col(id_col),
        F.explode(rolling_fingerprints(F.col(text_col), window_tokens)).alias("fp"),
    ).distinct()
    ev = (
        eval_df.select(
            F.explode(rolling_fingerprints(F.col(text_col), window_tokens)).alias("fp")
        )
        .distinct()
    )
    hits = (
        tr.join(F.broadcast(ev), "fp", "inner")
        .groupBy(id_col)
        .agg(F.count("*").alias("n"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_shared_grams"),
            (F.coalesce(F.col("n"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_count: int = 2,
) -> DataFrame:
    """Line-level exact deduplication — the C4/CCNet cleaning step the
    document-level dedups above can't express: boilerplate lines (nav
    bars, cookie banners, license headers) repeat across otherwise-unique
    pages, so dedup must act WITHIN documents at line granularity.

    Semantics (first-wins, deterministic): a line instance survives iff
    its normalized form (lower+trim) occurs in fewer than `min_count`
    line instances corpus-wide, OR it is the globally first instance of
    its form (ordered by (id, line position)). Documents are then
    reconstructed in original line order. Returns
    (id, text_dedup, n_kept, n_dropped) — one row per input document,
    empty string when nothing survives.

    Scale: one explode -> one hash aggregate on the line key carrying
    (count, argmin-of-(id, idx)) -> one key join back -> one per-doc
    rebuild aggregate. The line-key aggregate partial-aggregates map-side,
    so hot boilerplate lines (the skew being removed) collapse before the
    shuffle — the same economics as exact_duplicates; no per-key sort
    (a window row_number would sort every hot key's instances).

    `sep` is a regex for line splitting ('\\n' default; the contract
    exercises the identical plan at token granularity since the driver
    corpus is single-line)."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("idx", "line"),
    )
    keyed = lines.select(
        id_col, "idx", "line", F.trim(F.lower(F.col("line"))).alias("k")
    )
    stats = keyed.groupBy("k").agg(
        F.count("*").alias("cnt"),
        F.min(F.struct(F.col(id_col).alias("fid"), F.col("idx").alias("fidx"))).alias(
            "first"
        ),
    )
    kept = keyed.join(stats, "k").filter(
        (F.col("cnt") < min_count)
        | ((F.col("first.fid") == F.col(id_col)) & (F.col("first.fidx") == F.col("idx")))
    )
    sep_lit = sep.replace("\\n", "\n")
    rebuilt = kept.groupBy(id_col).agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(idx, line))), "
            "s -> s.line), '"
            + sep_lit.replace("'", "\\'")
            + "')"
        ).alias("text_dedup"),
        F.count("*").alias("n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_total"))
    return (
        docs.select(id_col)
        .join(totals, id_col, "inner")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_total") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 50,
) -> DataFrame:
    """Exact substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", ExactSubstr): strip any
    token span of >= `window_tokens` tokens that occurs verbatim more
    than once corpus-wide, keeping the globally first occurrence. The
    modality the rest of the family can't express: line_dedup removes
    identical LINES, winnowing FINDS containment — this one REMOVES
    repeated spans that cross line boundaries.

    Distributed reformulation of the paper's suffix array: a span of
    >= W tokens repeats iff every W-token window inside it repeats, so
    (1) fingerprint every W-token window (two-level portable polynomial
    hash, same arithmetic the containment oracle replays in SQL),
    (2) one hash aggregate per fingerprint carrying (count,
    argmin-of-(id, pos)) — map-side partial agg collapses hot spans,
    the skew being removed, before the shuffle, (3) every NON-first
    instance of a repeated window marks its W positions covered,
    (4) tokens anti-join coverage and documents rebuild in original
    token order. No suffix sort, no window-function sort — the same
    economics as dedup_lines.

    Scale bound: step (3) explodes W rows per duplicate window instance
    before the (id, idx) distinct — at duplicate fraction d that is
    ~W*d*total_tokens intermediate rows (W x on a fully-duplicated
    corpus). Below d ~ 2/W this beats any per-document-sort
    alternative because it needs no ordered scan; a corpus KNOWN to be
    massively self-repetitive should run exact_duplicates/dedup_lines
    first (as Lee et al. do), which collapses whole-doc and line dups
    for pennies and brings d back into this operator's cheap regime.

    Semantics (first-wins, deterministic): token i of doc d is dropped
    iff some repeated window instance (d, p), p <= i < p+W, is not the
    lexicographically-first (id, pos) instance of its fingerprint.
    Docs shorter than W tokens have no windows and pass through intact
    (whole-doc dup removal is exact_duplicates' job). Matching is
    case-folded; rebuild preserves original token case with
    single-space joins. Returns (id, text_dedup, n_kept, n_dropped),
    empty string when nothing survives.
    """
    w = int(window_tokens)
    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("toks"))

    tok_tbl = base.select(id_col, F.posexplode("toks").alias("idx", "tok"))

    def window_fp(hs):
        return F.aggregate(
            hs, F.lit(0).cast("long"), lambda acc, h: (acc * 31 + h) % POLY_MOD
        )

    th = F.transform(F.col("toks"), lambda t: token_hash(F.lower(t)))
    wins = base.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size("toks") < w, F.array().cast("array<long>")
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - w),
                    lambda i: window_fp(F.slice(th, i + 1, w)),
                )
            )
        ).alias("pos", "fp"),
    )
    stats = wins.groupBy("fp").agg(
        F.count("*").alias("cnt"),
        F.min(F.struct(F.col(id_col).alias("fid"), F.col("pos").alias("fpos"))).alias(
            "first"
        ),
    )
    dup = wins.join(stats, "fp").filter(
        (F.col("cnt") >= 2)
        & ~(
            (F.col("first.fid") == F.col(id_col))
            & (F.col("first.fpos") == F.col("pos"))
        )
    )
    covered = dup.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + w - 1)).alias("idx"),
    ).distinct()
    kept = tok_tbl.join(covered, [id_col, "idx"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(idx, tok))), "
            "s -> s.tok), ' ')"
        ).alias("text_dedup"),
        F.count("*").alias("n_kept"),
    )
    totals = base.select(id_col, F.size("toks").cast("long").alias("n_total"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_total") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def url_dedup(df, url_col: str = "url", id_col: str = "doc_id"):
    """Exact-URL deduplication after crawler-style canonicalization
    (urls.normalize_url: lowercase + fragment/whitespace cleanup — the
    reference lowercases before every URL decision,
    HtmlOnlyCrawler.java:82). The cheapest dedup stage and the first a
    web pipeline runs: the same page fetched under case/fragment URL
    variants collapses BEFORE any content hashing.

    Returns one survivor row per canonical URL: (canonical_url, keep_id
    = min id, n_dups). One hash aggregate on the canonical key — the
    min-id survivor rule is the same first-wins convention as
    dedup_lines/fingerprint dedup, and the aggregate partial-combines
    map-side (no URL list ever materializes)."""
    from webgraph.urls import normalize_url

    return (
        df.select(
            normalize_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


# ------------------------------------------- portable MinHash (recall eval) --


def minhash_signatures_portable(sh: DataFrame, num_hashes: int = 24) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures from the PORTABLE hash
    family h_i(s) = ((MIX + i*STEP) * s + i*i + 1) % P over the
    polynomial shingle hash s = token_hash(shingle).

    The xxhash64 family (minhash_signatures) is the production path;
    this variant exists so the LSH *retrieval step itself* — not just
    the exact-Jaccard verify — can be replayed in plain integer SQL,
    which is what lets d_minhash_recall certify banding recall on seeded
    mutations where recall < 1 is the expected, meaningful answer.
    Same plan shape: per-shingle hash array map-side, positional min
    aggregate per doc (partial agg collapses shingles pre-shuffle).
    Every intermediate stays < 2^62: (MIX + i*STEP) < 2.7e9 times
    s < 1e9."""
    s = token_hash(F.col("shingle"))
    hs = sh.select(
        "id",
        *[
            ((F.lit(_MIX_BASE + _MIX_STEP * i) * s + F.lit(i * i + 1)) % POLY_MOD).alias(
                f"h{i}"
            )
            for i in range(num_hashes)
        ],
    )
    mins = hs.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return mins.select(
        "id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_band_keys_portable(
    sigs: DataFrame, bands: int = 6, rows_per_band: int = 4
) -> DataFrame:
    """(id, band, bsig) with the band key folded portably:
    bsig = fold(acc*MIX + h_k) % P over the band's rows in k order —
    feeds pairs_from_buckets like the xxhash64 banding."""
    return sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.aggregate(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                        F.lit(0).cast("long"),
                        lambda acc, x: (acc * F.lit(_MIX_BASE) + x) % POLY_MOD,
                    ).alias("bsig"),
                ),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bsig").alias("bsig"))
