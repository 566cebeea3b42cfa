"""As-of join — match each fact row to the most recent state row at or
before its timestamp. The temporal-join primitive Spark lacks natively
(finance ticks, slowly-changing dimensions, "user's plan at event
time"); DuckDB ships it as ASOF JOIN, which is exactly what the contract
oracle uses, so the semantics here are pinned to the industry-standard
definition: greatest state_time <= fact_time per key, NULL when no state
precedes the fact.

Formulation: the union-window method — tag state and fact rows, sort
within key by (time, state-first-on-ties), and carry the last non-null
state value forward. ONE shuffle on the key, no join at all; ties at
equal timestamps resolve state-before-fact (ASOF's <= semantics).

Scale: per-key data lands on one reducer sorted by time — the standard
layout (same as any sessionization); for pathological single-key volume,
pre-bucket by coarse time range and stitch the last state across bucket
boundaries (documented extension, not needed for vertex/user-shaped
keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    facts: DataFrame,
    states: DataFrame,
    key_col: str,
    fact_time: str,
    state_time: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """facts + one column `out_col` (default ``last_<value_col>``): the
    `value_col` of the latest state at or before the fact's time.

    `states` must be unique per (key, state_time) — pre-aggregate
    otherwise (ambiguous simultaneous states have no defined answer; this
    operator refuses to pick one silently by construction, since the
    window would be nondeterministic)."""
    out_col = out_col or f"last_{value_col}"
    vtype = dict(states.dtypes)[value_col]
    fcols = facts.columns
    clash = [c for c in ("_t", "_is_state", "_v") if c in fcols]
    if clash:
        raise ValueError(
            f"as_of_join: facts carries reserved working column(s) {clash}; "
            "rename them before joining"
        )
    if out_col in fcols:
        raise ValueError(
            f"as_of_join: output column {out_col!r} already exists on facts; "
            "pass a different out_col"
        )
    f = facts.select(
        *fcols,
        F.col(fact_time).alias("_t"),
        F.lit(0).alias("_is_state"),
        F.lit(None).cast(vtype).alias("_v"),
    )
    s = states.select(
        F.col(key_col),
        F.col(state_time).alias("_t"),
        F.lit(1).alias("_is_state"),
        F.col(value_col).alias("_v"),
    )
    u = f.unionByName(s, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_t").asc(), F.col("_is_state").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.when(F.col("_is_state") == 1, F.col("_v")), ignorenulls=True)
    return (
        u.withColumn(out_col, carried.over(w))
        .filter(F.col("_is_state") == 0)
        .select(*fcols, out_col)
    )


def interval_count_join(
    intervals: DataFrame,
    points: DataFrame,
    interval_id: str,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_unit: str = "day",
) -> DataFrame:
    """Count, per interval, the point rows whose timestamp falls in
    [start, end) — the interval/range-join primitive ("events in the
    week after each order", "ticks during each outage window") that a
    naive formulation turns into a non-equi theta join, i.e. a broadcast
    nested loop.

    Formulation: the BINNED range join — each interval explodes into its
    covering `bin_width` buckets (sequence(), bounded by the interval
    span), points map to their single bucket, the two sides EQUI-join on
    the bucket, and the exact [start, end) predicate filters residual
    boundary rows. The non-equi join becomes a hash join whose build/
    probe keys are time buckets: shuffle is proportional to
    intervals x span/bin + points, never |intervals| x |points|. Pick
    `bin_unit` (a date_trunc unit: hour/day/week/...) near the typical
    interval span so both sides land on the same calendar grid (AQE
    handles residual bucket skew; a hot bucket is a calendar hotspot,
    salt via finer bins).

    Intervals with no matching points are kept with n = 0 (left join
    back to the interval table), so the output is total over intervals.

    Returns intervals' `interval_id` + ``n_points``.
    """
    step = F.expr(f"INTERVAL 1 {bin_unit}")
    iv = intervals.select(
        F.col(interval_id),
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
    ).filter(F.col("_s") < F.col("_e"))
    binned_iv = iv.select(
        interval_id,
        "_s",
        "_e",
        F.explode(
            F.sequence(
                F.date_trunc(bin_unit, F.col("_s")).cast("timestamp"),
                # sequence end may overshoot by < one bin; the exact
                # [_s, _e) filter below drops the residue
                F.col("_e"),
                step,
            )
        ).alias("_bin"),
    )
    binned_pt = points.select(
        F.col(ts_col).alias("_t"),
        F.date_trunc(bin_unit, F.col(ts_col)).cast("timestamp").alias("_bin"),
    )
    matched = (
        binned_iv.join(binned_pt, "_bin", "inner")
        .filter((F.col("_t") >= F.col("_s")) & (F.col("_t") < F.col("_e")))
        .groupBy(interval_id)
        .agg(F.count("*").alias("n_points"))
    )
    return (
        intervals.select(interval_id)
        .join(matched, interval_id, "left")
        .select(
            interval_id, F.coalesce("n_points", F.lit(0)).alias("n_points")
        )
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Batch gap-based sessionization: consecutive events of a key belong
    to one session while the inter-event gap stays <= ``gap_seconds``; a
    longer gap starts the next session. The BATCH twin of
    streaming.stateful_sessions (which holds open state across
    micro-batches) — over a closed table the two agree on every
    non-trailing session, and this one also closes the trailing ones.

    Returns one row per session: (key, session_id 1-based within key,
    n_events, start_ts, end_ts). ``order_cols`` extends the within-key
    order to a TOTAL one under timestamp ties (pass the event id); a
    non-total order would make session boundaries engine-dependent.

    Physical plan: ONE shuffle on the key + one per-partition sort
    feeding two window passes (lag -> boundary flags, running sum ->
    session numbers) and a final hash aggregate that reuses the same
    partitioning — the minimal plan for any gap sessionization; no join,
    no second Exchange on the key.
    """
    if gap_seconds <= 0:
        raise ValueError(f"sessionize: gap_seconds must be > 0, got {gap_seconds}")
    extra = list(order_cols or [])
    order = [F.col(ts_col)] + [F.col(c) for c in extra]
    w = Window.partitionBy(key_col).orderBy(*order)
    # microsecond-exact, timezone-free gap test: timestamp subtraction
    # yields a day-time interval on both TIMESTAMP and TIMESTAMP_NTZ
    # (an epoch cast would force a timezone interpretation, and a
    # seconds cast would truncate sub-second gaps)
    boundary = F.col(ts_col) - F.lag(F.col(ts_col)).over(w) > F.expr(
        f"INTERVAL {int(gap_seconds)} SECONDS"
    )
    numbered = df.select(
        F.col(key_col),
        F.col(ts_col),
        *[F.col(c) for c in extra],
        F.when(boundary, 1).otherwise(0).alias("_new"),
    ).select(
        key_col,
        ts_col,
        (F.sum("_new").over(w) + 1).alias("session_id"),
    )
    return numbered.groupBy(key_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    )
