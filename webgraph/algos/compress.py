"""Link-graph compressibility statistics — gap (delta) encoding of sorted
adjacency lists with Elias-gamma code lengths, the core measurement behind
the WebGraph compression framework (Boldi & Vigna, "The WebGraph Framework
I: Compression Techniques", WWW 2004 — public paper).

Web adjacency lists compress 10-20x because successors cluster: sorting
each page's out-neighbours and storing *gaps* turns locality into small
integers, and an instantaneous code (gamma: ``2*floor(log2 v) + 1`` bits
for ``v >= 1``) turns small integers into few bits. A link-graph engine
uses the per-list bit costs to size its storage layout (how many edges per
parquet row-group / CSR block actually fit) BEFORE committing to one, the
same way g_powerlaw calibrates salting thresholds.

Spark shape: one window (partition by src, order by dst) for the lag —
a single hash-partitioned shuffle on src — then one hash aggregate; both
whole-stage-codegen arithmetic, no Python, no arrays materialized. Hub
skew: out-degree is the bounded direction of a web graph (pages link to
hundreds, not millions), so per-src windows stay small even when in-degree
is power-law; for in-adjacency compression call with (src, dst) swapped
and salt via the common helpers if a super-aggregator host appears.

First-successor convention (Boldi-Vigna section 3): the first value is
encoded relative to the list's OWN source id via the signed-to-unsigned
nu-map ``2(d-s)`` if ``d >= s`` else ``2(s-d)-1``, then shifted +1 so
gamma (defined on v >= 1) applies; subsequent values are strict gaps
``d_i - d_{i-1} >= 1`` (lists are deduplicated).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gamma_bit_length(v: Column) -> Column:
    """Elias-gamma code length ``2*floor(log2 v) + 1`` for ``v >= 1``,
    exact for v < 2^52: the float ``log2`` is corrected by +-1 against
    integer ``pow`` comparisons so exact powers of two never round to the
    wrong exponent."""
    p0 = F.floor(F.log2(v.cast("double"))).cast("long")
    p = (
        F.when(F.pow(F.lit(2.0), p0.cast("double")) > v.cast("double"), p0 - 1)
        .when(F.pow(F.lit(2.0), (p0 + 1).cast("double")) <= v.cast("double"), p0 + 1)
        .otherwise(p0)
    )
    return (2 * p + 1).cast("long")


def gap_encoding_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-source adjacency-list compression stats over a deduplicated
    edge table: ``(src, out_deg, gamma_bits)`` where ``gamma_bits`` is the
    total Elias-gamma cost of the gap-encoded sorted successor list.
    Compare against ``out_deg * 64`` (raw long ids) for the ratio."""
    w = Window.partitionBy(src).orderBy(dst)
    prev = F.lag(dst).over(w)
    s, d = F.col(src), F.col(dst)
    first_v = (
        F.when(d >= s, 2 * (d - s)).otherwise(2 * (s - d) - 1) + 1
    )
    v = F.when(prev.isNull(), first_v).otherwise(d - prev)
    return (
        edges.select(src, dst)
        .withColumn("_bits", gamma_bit_length(v))
        .groupBy(src)
        .agg(
            F.count("*").alias("out_deg"),
            F.sum("_bits").alias("gamma_bits"),
        )
    )
