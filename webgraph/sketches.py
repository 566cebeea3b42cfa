"""Mergeable frequency sketches — the 100 TB answer to vocabulary stats.

An exact token-frequency table over a 100 TB corpus shuffles the full
vocabulary; a count-min sketch (Cormode & Muthukrishnan 2005) fixes the
state at ``depth x width`` counters, is built with ONE partial-aggregating
groupBy, and merges across corpora/partitions/days by cell-wise addition —
the standard streaming/approximate counterpart to ``text.top_tokens``.

Hashing is the repo's portable integer scheme (webgraph/dedup.py:
token_hash, the per-row mix mirroring the simhash per-bit mix), so sketch
cells are bit-identical across engines and the DuckDB contract oracle
reproduces the sketch — estimates are checked EXACTLY, collisions
included, not just within the epsilon bound.

Estimates are the classic min-over-rows upper bound: est(t) >= true(t),
with overestimate probability delta = exp(-depth) at epsilon = e/width.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webgraph.dedup import _MIX_BASE, _MIX_STEP, POLY_MOD, token_hash
from webgraph.text import tokens

CMS_WIDTH = 1024
CMS_DEPTH = 3


def _bucket(h: Column, row: int, width: int) -> Column:
    """Row-i bucket of a token hash — same mix family as the simhash bits
    (multipliers < 2^32 keep every product < 2^62: no BIGINT overflow in
    engines that refuse to wrap)."""
    return (
        (h * F.lit(_MIX_BASE + _MIX_STEP * row) + F.lit(row)) % POLY_MOD
    ) % F.lit(width)


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Build a count-min sketch over the corpus's lowercased whitespace
    tokens. Returns ``(row, bucket, cnt)`` — at most depth*width rows.

    One explode -> one hash aggregate: the (row, bucket) keys partial-
    aggregate map-side, so the shuffle carries <= depth*width rows per
    input partition regardless of corpus size."""
    toks = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
        .filter(F.col("tok") != "")
        .select(token_hash(F.col("tok")).alias("h"))
    )
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col("h"), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(
        F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — sketches over disjoint corpora merge losslessly
    (the property that lets 1000 executors sketch independently)."""
    return (
        reduce(DataFrame.unionByName, sketches)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str = "token",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Point-frequency estimates: min over rows of the queried cells.
    Returns ``(token, est)``; absent cells count 0. The sketch side is at
    most depth*width rows — always broadcastable."""
    qh = queries.select(
        F.col(token_col).alias("token"), token_hash(F.col(token_col)).alias("h")
    )
    qb = qh.select(
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col("h"), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select("token", "c.row", "c.bucket")
    return (
        qb.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ------------------------------------------------------ HLL distinct --


def hll_build(
    items: DataFrame,
    col: str = "token",
    m: int = 32,
) -> DataFrame:
    """HyperLogLog registers for COUNT DISTINCT over a (string) column —
    the mergeable streaming-distinct sketch (the corpus-stats companion
    of the count-min sketch above: CMS answers "how often", HLL answers
    "how many distinct").

    Registers use the same engine-portable token hash as SimHash/CMS, so
    the sketch is deterministic and the contract oracle compares every
    register exactly; the estimator (hll_count) carries the standard
    ~1.04/sqrt(m) error. Densified to exactly m rows (j, reg) so merges
    (elementwise max) and comparisons are trivial.

    One explode + one m-row hash aggregate: map-side partial max collapses
    everything before the shuffle — O(m) state total, any corpus size."""
    from webgraph.algos.anf import ANF_MOD, _B1, _B2, rho_column
    from webgraph.dedup import token_hash

    spark = items.sparkSession
    # Second-level mix (same family as HyperBall's vertex hash): the raw
    # base-31 polynomial fold leaves low bits under-mixed for sequential
    # strings, which starves the trailing-zero rank and collapses the
    # estimate — the multiply by an even 32-bit constant mod an odd prime
    # rescatters them (measured: est 793 vs truth 5000 unmixed; ~5% error
    # mixed, m=64).
    h = (token_hash(F.col(col)) * _B1 + F.lit(42) * _B2) % ANF_MOD
    regs = (
        items.select(
            (h % m).cast("int").alias("j"),
            rho_column((h / F.lit(m)).cast("long")).cast("long").alias("r"),
        )
        .groupBy("j")
        .agg(F.max("r").alias("reg"))
    )
    dense = spark.range(m).select(F.col("id").cast("int").alias("j"))
    return dense.join(regs, "j", "left").select(
        "j", F.coalesce(F.col("reg"), F.lit(0)).cast("long").alias("reg")
    )


def hll_count(registers: DataFrame, m: int = 32) -> float:
    """Standard HLL estimate (with linear-counting small-range correction)
    from an m-row (j, reg) register table."""
    import math

    rows = {r["j"]: r["reg"] for r in registers.collect()}
    regs = [rows.get(j, 0) for j in range(m)]
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    z = sum(2.0 ** -r for r in regs)
    raw = alpha * m * m / z
    v0 = regs.count(0)
    if raw <= 2.5 * m and v0 > 0:
        return m * math.log(m / v0)
    return raw


# ----------------------------------------------------- bloom filter --

BLOOM_M = 4096
BLOOM_K = 3


def _bloom_pos(h: Column, i: int, m: int, seed: int) -> Column:
    """Probe position i for element hash h — the CMS row-mix family with
    the seed folded into the multiplier index, portable integer
    arithmetic mirrored verbatim by the SQL oracle."""
    j = seed + i
    return ((h * F.lit(_MIX_BASE + _MIX_STEP * j) + F.lit(j)) % POLY_MOD) % F.lit(m)


def bloom_build(
    df: DataFrame,
    col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: int = 0,
) -> DataFrame:
    """Bloom filter over a key column as a set-bit relation
    ``(bit_pos long)`` — the crawler's visited-URL set
    (AbstractObservableGraphImporter.java:116-123 re-checks existing
    links per add; a frontier at 100 TB keeps the seen-set as exactly
    this broadcastable sketch instead of a billion-row join side).

    Scale: ONE narrow projection -> explode(k probes) -> distinct over at
    most m values; the result is <= m rows regardless of input size, so
    downstream membership joins BROADCAST it. Mergeable across
    corpora/days by union-distinct (`bloom_merge`). Hashing is the
    portable char-fold + row-mix family, so the filter (and hence every
    false positive) is bit-reproducible in the DuckDB oracle — membership
    is checked exactly, collisions included."""
    h = token_hash(F.col(col))
    probes = F.array(*[_bloom_pos(h, i, m, seed) for i in range(k)])
    return (
        df.select(F.explode(probes).alias("bit_pos"))
        .distinct()
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Cell-wise OR = union-distinct of the set-bit relations."""
    return reduce(lambda a, b: a.unionByName(b), filters).distinct()


def bloom_contains(
    bits: DataFrame,
    probes_df: DataFrame,
    id_col: str,
    col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: int = 0,
) -> DataFrame:
    """Membership test: (id, maybe_present) — true iff ALL k probe bits
    are set (no false negatives; false positives at the classic
    (1-e^{-kn/m})^k rate, and deterministically identical across engines).

    Scale: the filter side is <= m rows -> broadcast hash join against
    the exploded probe relation (<= k rows per element), then one
    all-present aggregate keyed by the element id. No shuffle of the
    probe corpus beyond the id-keyed agg."""
    h = token_hash(F.col(col))
    probes = F.array_distinct(F.array(*[_bloom_pos(h, i, m, seed) for i in range(k)]))
    pos = probes_df.select(F.col(id_col), F.explode(probes).alias("bit_pos"))
    hit = F.broadcast(bits.select("bit_pos").distinct().withColumn("_hit", F.lit(1)))
    return (
        pos.join(hit, "bit_pos", "left")
        .groupBy(id_col)
        .agg((F.min(F.coalesce(F.col("_hit"), F.lit(0))) == 1).alias("maybe_present"))
    )


# ------------------------------------------------- histogram quantiles --


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: tuple = (25, 50, 75, 90, 99),
    bins: int = 1000,
) -> DataFrame:
    """Deterministic approximate quantiles via a fixed-range histogram
    sketch — the mergeable alternative to percentile_approx whose result
    is reproducible across engines, runs, and partitionings (Spark's
    built-in sketch is neither deterministic nor engine-portable, so it
    can't be oracle-checked; this one is both).

    Two passes: (1) one min/max aggregate pins the range; (2) one
    bins-bounded hash aggregate counts per bin (mergeable: bin counts
    sum). The quantile readout is ONE pass over the cumulative histogram
    (hist_quantile_readout, shared with the drained streaming sketch).
    Returns (q_pct, est) with est exact-rounded micro-units.
    """
    spark = df.sparkSession
    lohi = df.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).collect()[0]
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    if hi <= lo:
        return spark.createDataFrame(
            [(int(q), int(round(lo * 1e6))) for q in quantiles],
            "q_pct long, est_e6 long",
        )
    # bin index mirrored verbatim in the SQL oracle: floor of the scaled
    # offset, top edge clamped into the last bin
    scaled = (F.col(value_col) - F.lit(lo)) / F.lit(hi - lo) * F.lit(bins)
    bin_ = F.least(F.floor(scaled).cast("long"), F.lit(bins - 1))
    hist = df.select(bin_.alias("bin")).groupBy("bin").agg(
        F.count("*").alias("cnt")
    )
    return hist_quantile_readout(hist, lo, hi, bins, quantiles)


def hist_quantile_readout(
    hist: DataFrame,
    lo: float,
    hi: float,
    bins: int,
    quantiles: tuple = (25, 50, 75, 90, 99),
) -> DataFrame:
    """(q_pct, est_e6) straddle readout over a (bin, cnt) histogram frame
    (<= bins rows; rows must have cnt > 0) — shared by the batch sketch
    (histogram_quantiles) and the drained streaming sketch
    (streaming.read_hist_state): each quantile's bin is the unique row
    whose cumulative count straddles its rank; the estimate is the bin
    LOWER EDGE, error bounded by one bin width."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("total", F.sum("cnt").over(Window.partitionBy()))
        .withColumn("prev", F.lag("cum", 1, 0).over(Window.orderBy("bin")))
    )
    qdf = spark.createDataFrame(
        [(int(q),) for q in quantiles], "q_pct long"
    )
    # first bin whose cumulative count reaches the quantile's rank: cum
    # straddles total*q (hist rows all have cnt > 0, so the q=0 edge case
    # resolves to the first bin via prev == 0)
    hit = (F.col("cum") * 100 >= F.col("total") * F.col("q_pct")) & (
        (F.col("prev") * 100 < F.col("total") * F.col("q_pct"))
        | ((F.col("q_pct") == 0) & (F.col("prev") == 0))
    )
    return cum.join(F.broadcast(qdf), hit).select(
        F.col("q_pct").cast("long").alias("q_pct"),
        F.round(
            (F.lit(lo) + F.col("bin") * F.lit((hi - lo) / bins)) * 1e6
        ).cast("long").alias("est_e6"),
    )


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    capacity: int = 50,
) -> DataFrame:
    """Exact frequent tokens above the n/`capacity` threshold via the
    two-pass Misra–Gries protocol — the classic "heavy hitters without
    shuffling the token stream":

    pass 1 (candidates): each partition runs a mergeable Misra–Gries
      summary of at most `capacity` counters over its own tokens inside
      one Arrow batch iterator (mapInPandas; counting is vectorized
      pandas value_counts, the decrement is one partial-sort per batch).
      A token with global frequency > n/capacity must exceed
      n_p/capacity in at least one partition (pigeonhole), and MG's
      deficit bound (Agarwal et al. 2013 mergeable-summaries) keeps any
      such token's counter positive there — so the union of partition
      summaries (<= capacity rows per partition, the ONLY shuffled data)
      is a guaranteed candidate superset.
    pass 2 (verify): exact counts for candidate tokens only — explode,
      broadcast-semi-join the candidate set, one hash aggregate — then
      keep cnt * capacity > n (integer compare, no float threshold).

    The result is EXACT and independent of partitioning/batching (the MG
    summary only affects which extra candidates get verified), which is
    what makes it oracle-checkable. Returns (token, cnt).

    Scale: the full token stream is never shuffled — pass 1 moves
    capacity x partitions rows, pass 2 moves only candidate-matching
    tokens into a map-side-combining count.
    """
    import pandas as pd

    spark = df.sparkSession
    cap = int(capacity)
    if cap < 1:
        raise ValueError("heavy_hitters: capacity must be >= 1")

    # blank docs tokenize to [''] and are dropped by the empty-token
    # filters on both passes — no separate text-level filter needed
    toks = df.select(tokens(F.col(text_col)).alias("toks"))

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            exact = pd.Series(
                [t for arr in pdf["toks"] for t in arr if t != ""]
            ).value_counts()
            for tok, c in exact.items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > cap:
                # mergeable-MG decrement: subtract the (cap+1)-th largest
                # count from everyone, drop non-positive counters
                vals = sorted(counters.values(), reverse=True)
                sub = vals[cap]
                counters = {
                    t: c - sub for t, c in counters.items() if c - sub > 0
                }
        if counters:
            yield pd.DataFrame({"token": list(counters.keys())})

    candidates = toks.mapInPandas(mg_partition, "token string").distinct()

    exploded = toks.select(F.explode("toks").alias("token")).filter(
        F.col("token") != ""
    )
    n_tokens = exploded.count()
    verified = (
        exploded.join(F.broadcast(candidates), "token", "leftsemi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * cap > F.lit(n_tokens))
    )
    return verified


def mad_outliers(
    df: DataFrame,
    value_col: str,
    k: float = 3.0,
    scale: int = 100,
) -> DataFrame:
    """Robust outlier detection via median absolute deviation: flag rows
    with |x - median(x)| > k * MAD — the robust twin of the z-score
    (median and MAD have 50% breakdown; mean/stddev are dragged by the
    very outliers being hunted). Returns the input rows that exceed the
    fence, plus (units, dev_units).

    Exactness contract: values are first scaled to integer units
    (ROUND(x * scale) — cents for 2-decimal money), so both exact
    percentiles land on .0/.5 doubles, deviations and the k*MAD fence
    stay dyadic-exact, and the row set replays digit-for-digit on any
    engine — no float-boundary flips. Both medians run as broadcast
    1-row aggregates cross-joined back (no driver round-trip). The
    exact percentile is a sort-based aggregate: right for the
    deterministic contract; at 100 TB use hist_quantile_readout's
    sketch as the approximate fence and keep this for bounded slices.
    Standard MAD caveat: when >50% of values are identical, MAD = 0 and
    every other value is flagged."""
    units = F.round(F.col(value_col) * scale).cast("long")
    u = df.withColumn("_u", units)
    med = u.agg(F.expr("percentile(_u, 0.5)").alias("_med"))
    d = u.crossJoin(F.broadcast(med)).withColumn(
        "_dev", F.abs(F.col("_u") - F.col("_med"))
    )
    mad = d.agg(F.expr("percentile(_dev, 0.5)").alias("_mad"))
    return (
        d.crossJoin(F.broadcast(mad))
        .filter(F.col("_dev") > F.lit(float(k)) * F.col("_mad"))
        .drop("_med", "_mad")
    )
