"""Skew-salted equi-join: the explicit hub-key join strategy.

The north rule calls for "partitioning / shuffle / skew handled
explicitly". The aggregation side of that is algos/common.py's
salt_aggregate (two-level hub-safe sums); this module is the JOIN side:
a power-law key column (hub pages, viral repos) sends every probe row
for one key to ONE reducer in a shuffled equi-join, and that straggler
task bounds the stage. The reference hits the same hotspot in its URL
index cache (BatchGraphImporter.java:100-103, a 150k-entry hot-key
cache); at 10^12 files the hot key is a shuffle-partition killer, not a
cache-miss annoyance.

``salted_join`` is the classic fix when the build side is too big to
broadcast but cheap to replicate R times: replicate the build side once
per salt, scatter the probe side uniformly across salts, and join on
(key, salt) so each hot key's rows spread over R reducers. AQE's skew
handling (spark.sql.adaptive.skewJoin) splits oversized SORT-MERGE
partitions at runtime; the explicit form works for any join the planner
picks, needs no size statistics, and keeps the fan-out deterministic —
the properties a checkpoint-resumable pipeline wants.

Cost model: shuffle bytes grow by R x |build|, reducer fan-out per hot
key grows by R. Pick R ~ (hot-key rows / healthy-partition rows); at
R = 1 the join degenerates to the plain shuffled join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``probe`` (large, key-skewed) with ``build`` (replicable) on
    the equi-key(s) ``on``, spreading each key over ``n_salts`` reducers.

    Probe rows get a deterministic per-row salt (xxhash64 of the whole
    row — stable under retries, unlike monotonically_increasing_id);
    build rows are exploded once per salt value. Joining on
    (*on, _salt) is then semantically the plain equi-join: every probe
    row meets exactly the one build replica carrying its salt.

    ``how`` is limited to the directions the replication preserves:
    inner / left / left_semi / left_anti (probe side survives at most
    once per build match). right/full would see the build side
    n_salts-fold — refuse loudly rather than return duplicates.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join supports probe-preserving joins only, not {how!r}")
    if SALT_COL in probe.columns or SALT_COL in build.columns:
        raise ValueError(f"{SALT_COL!r} is reserved by salted_join")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    p = probe.withColumn(SALT_COL, salt)
    b = build.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = p.join(b, keys + [SALT_COL], how)
    return joined.drop(SALT_COL)
