"""Event-sequence analytics: ordered funnels and cohort retention.

The reference's analytics surface is the per-table statistics aggregate
(SURVEY §2.4, O17); these are its event-stream generalizations — the
two queries every product/ops team runs over an event table at scale.

Scale shapes:
- ``funnel_counts``: ONE shuffle on the user key.  Events are first
  filtered to the funnel's step types (predicate pushed to the scan),
  then per-user matching is a sorted-array fold — a pure Catalyst
  higher-order ``aggregate``, no UDF, no k self-joins (the naive plan
  joins the event table k times; this touches it once).  Per-user
  state in the fold is two scalars.  The collect_list is bounded by
  events-per-user AFTER the step-type filter; for genuinely unbounded
  users, pre-filter to the funnel's time window first.
- ``cohort_retention``: two aggregates — per-user first-activity
  (map-side combined), then an exact distinct count per (cohort,
  offset) cell, which Spark executes as the standard two-phase
  partial/final plan.  Never materializes a per-user matrix.

Both are deterministic and exactly reproducible by the SQL oracles
(strict event-time ordering; week buckets are Monday-truncated in both
engines).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NEG_INF = -(2**62)


def user_funnel_depth(
    df: DataFrame,
    *,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_hours: int | None = None,
) -> DataFrame:
    """Per-user furthest funnel step reached, matching steps strictly
    in event-time order (greedy earliest-match, which maximizes the
    matched prefix): step i+1 counts only with an event strictly later
    than the event matched for step i.

    ``within_hours`` adds the product-analytics conversion window:
    steps beyond the first count only within that many hours of the
    user's FIRST matched step-1 event (first-touch anchoring — the
    standard attribution spec, and the one the SQL oracle can mirror
    deterministically; a later step-1 event never re-anchors).

    Output: (user_col, depth) with depth in [1, len(steps)] — users
    with no step-1 event don't appear.
    """
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    evs = F.sort_array(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("t"),
                F.col(type_col).alias("y"),
            )
        )
    )
    if within_hours is None:
        def in_window(acc, e):
            return F.lit(True)
    else:
        win_us = int(within_hours) * 3_600_000_000

        def in_window(acc, e):
            # NULL t0 (no step-1 match yet) → window not armed
            return F.coalesce(
                e["t"] <= acc["t0"] + F.lit(win_us), F.lit(True)
            )
    fold = F.aggregate(
        evs,
        F.struct(
            F.lit(0).alias("step"),
            F.lit(_NEG_INF).cast("long").alias("t"),
            F.lit(None).cast("long").alias("t0"),
        ),
        lambda acc, e: F.when(
            (acc["step"] < k)
            & (e["y"] == F.element_at(steps_arr, acc["step"] + 1))
            & (e["t"] > acc["t"])
            & in_window(acc, e),
            F.struct(
                (acc["step"] + 1).alias("step"),
                e["t"].alias("t"),
                F.coalesce(acc["t0"], e["t"]).alias("t0"),
            ),
        ).otherwise(acc),
    )
    return (
        df.filter(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(fold.alias("_f"))  # one fold per group; fields projected below
        .select(
            user_col,
            F.col("_f.step").alias("depth"),
            F.col("_f.t0").alias("first_micros"),
            F.col("_f.t").alias("last_micros"),
        )
        .filter(F.col("depth") >= 1)
    )


def funnel_counts(
    df: DataFrame,
    *,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_hours: int | None = None,
) -> DataFrame:
    """Ordered-funnel report: for each step, how many users reached at
    least that step (strict event-time ordering between steps).

    Output: (step, step_name, n_users), one row per funnel step, step
    1-based; n_users is non-increasing in step.
    """
    depth = user_funnel_depth(
        df, steps=steps, user_col=user_col, ts_col=ts_col,
        type_col=type_col, within_hours=within_hours,
    )
    ladder = depth.select(
        F.explode(F.sequence(F.lit(1), F.col("depth"))).alias("step")
    )
    counts = ladder.groupBy("step").agg(F.count(F.lit(1)).alias("_n"))
    steps_arr = F.array(*[F.lit(s) for s in steps])
    all_steps = (
        df.sparkSession.range(1, len(steps) + 1)
        .select(F.col("id").cast("int").alias("step"))
    )
    return all_steps.join(counts, on="step", how="left").select(
        "step",
        F.element_at(steps_arr, F.col("step")).alias("step_name"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_users"),
    )


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    period (the cohort), counted in each later period they were active.

    Output: (cohort, period_offset, n_users) — offset 0 is the cohort
    period itself (n_users = cohort size), offsets count ``granularity``
    periods since.  Exact distinct counts.
    """
    days = {"week": 7, "day": 1}[granularity]
    firsts = df.groupBy(user_col).agg(
        F.date_trunc(granularity, F.min(ts_col)).alias("_cohort")
    )
    active = df.select(
        user_col, F.date_trunc(granularity, F.col(ts_col)).alias("_period")
    ).distinct()
    return (
        active.join(firsts, on=user_col)
        .select(
            F.col("_cohort").alias("cohort"),
            (
                F.datediff(F.col("_period"), F.col("_cohort"))
                / F.lit(days)
            )
            .cast("int")
            .alias("period_offset"),
            user_col,
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def funnel_conversion_stats(
    df: DataFrame,
    *,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert for fully-converted users: count and mean
    first-step→last-step latency.  The micros differences sum EXACTLY
    (bigint) with one double division at the end, so the mean is
    bit-identical cross-engine (the corr/covar lesson applied to
    latency).  Output: one row (n_converted, avg_seconds)."""
    depth = user_funnel_depth(
        df, steps=steps, user_col=user_col, ts_col=ts_col, type_col=type_col
    )
    conv = depth.filter(F.col("depth") == len(steps))
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(
            F.sum(F.col("last_micros") - F.col("first_micros")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1000000.0),
            6,
        ).alias("avg_seconds"),
    )


def resample_ffill(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    step_hours: int = 6,
) -> DataFrame:
    """Regular time-grid resampling with forward fill: per key, emit
    one row every ``step_hours`` from the key's first observation hour
    to its last, carrying the latest value observed at or before each
    grid instant — the gap-filling step before any windowed model
    consumes an irregular series.

    Plan: per-key min/max aggregate → bounded grid explode (span /
    step rows per key, never data-dependent blowup) → one union with
    the observations → a single per-key ordered window doing
    last_value(ignore nulls).  Order is (instant, grid-after-obs,
    id) — fully deterministic even with duplicate timestamps, and the
    forward-filled value is an exact copy of an input value (no
    arithmetic), so the result is engine-exact.

    Output: (key_col, grid_ts, value).  The grid starts at the
    TRUNCATED first-observation hour, so the first grid instant can
    precede the first observation — its value is NULL (nothing to
    carry yet), matching the oracle exactly.
    """
    from pyspark.sql import Window as W

    bounds = df.groupBy(key_col).agg(
        F.date_trunc("hour", F.min(ts_col)).alias("_s"),
        F.date_trunc("hour", F.max(ts_col)).alias("_e"),
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(
                F.col("_s"),
                F.col("_e"),
                F.expr(f"INTERVAL {step_hours} HOURS"),
            )
        ).alias("grid_ts"),
    )
    _max_id = F.lit(2**62).cast("long")
    obs = df.select(
        F.col(key_col),
        F.col(ts_col).alias("_ot"),
        F.col(value_col).alias("_v"),
        F.lit(0).alias("_isg"),
        # numeric ids keep their exact order (the oracle's raw
        # event_id tie); a non-numeric id would CRASH the ANSI cast —
        # try_cast + deterministic hash fallback keeps the tie total
        # (grid-vs-obs order is carried by _isg, never by _tie)
        F.coalesce(
            F.col(id_col).try_cast("long"), F.xxhash64(F.col(id_col))
        ).alias("_tie"),
        F.lit(None).cast("timestamp").alias("grid_ts"),
    )
    gr = grid.select(
        key_col,
        F.col("grid_ts").alias("_ot"),
        F.lit(None).cast("double").alias("_v"),
        F.lit(1).alias("_isg"),
        _max_id.alias("_tie"),
        "grid_ts",
    )
    w = (
        W.partitionBy(key_col)
        .orderBy("_ot", "_isg", "_tie")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        obs.unionByName(gr)
        .withColumn("_f", F.last("_v", ignorenulls=True).over(w))
        .filter(F.col("_isg") == 1)
        .select(key_col, "grid_ts", F.col("_f").alias("value"))
    )


def resample_interpolate(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    step_hours: int = 6,
    scale: int = 6,
) -> DataFrame:
    """Linear-interpolation twin of :func:`resample_ffill`: each grid
    instant takes v0 + (v1 − v0)·(g − t0)/(t1 − t0) between the last
    observation at-or-before (t0, v0) and the first after (t1, v1);
    before the first observation the value is NULL, after the last it
    holds v0 (forward-fill tail).  Same single union + per-key ordered
    window plan — one extra window pass (forward FIRST) over the same
    sort, no extra shuffle.  The micros arithmetic is exact bigint
    with one double division, mirrored op-for-op by the oracle, so
    results match bit-for-bit at ``scale`` decimals.
    """
    from pyspark.sql import Window as W

    bounds = df.groupBy(key_col).agg(
        F.date_trunc("hour", F.min(ts_col)).alias("_s"),
        F.date_trunc("hour", F.max(ts_col)).alias("_e"),
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(
                F.col("_s"), F.col("_e"),
                F.expr(f"INTERVAL {step_hours} HOURS"),
            )
        ).alias("grid_ts"),
    )
    _max_id = F.lit(2**62).cast("long")
    obs = df.select(
        F.col(key_col),
        F.col(ts_col).alias("_ot"),
        F.col(value_col).alias("_v"),
        F.lit(0).alias("_isg"),
        # numeric ids keep their exact order (the oracle's raw
        # event_id tie); a non-numeric id would CRASH the ANSI cast —
        # try_cast + deterministic hash fallback keeps the tie total
        # (grid-vs-obs order is carried by _isg, never by _tie)
        F.coalesce(
            F.col(id_col).try_cast("long"), F.xxhash64(F.col(id_col))
        ).alias("_tie"),
        F.lit(None).cast("timestamp").alias("grid_ts"),
    )
    gr = grid.select(
        key_col,
        F.col("grid_ts").alias("_ot"),
        F.lit(None).cast("double").alias("_v"),
        F.lit(1).alias("_isg"),
        _max_id.alias("_tie"),
        "grid_ts",
    )
    u = obs.unionByName(gr).withColumn("_ot_us", F.unix_micros("_ot"))
    order = [F.col("_ot"), F.col("_isg"), F.col("_tie")]
    w_back = (
        W.partitionBy(key_col).orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy(key_col).orderBy(*order)
        .rowsBetween(1, W.unboundedFollowing)
    )
    vt = F.when(F.col("_v").isNotNull(), F.col("_ot_us"))
    out = (
        u.withColumn("_v0", F.last("_v", ignorenulls=True).over(w_back))
        .withColumn("_t0", F.last(vt, ignorenulls=True).over(w_back))
        .withColumn("_v1", F.first("_v", ignorenulls=True).over(w_fwd))
        .withColumn("_t1", F.first(vt, ignorenulls=True).over(w_fwd))
        .filter(F.col("_isg") == 1)
    )
    frac = (
        (F.col("_ot_us") - F.col("_t0")).cast("double")
        / (F.col("_t1") - F.col("_t0")).cast("double")
    )
    val = F.when(F.col("_v0").isNull(), F.lit(None).cast("double")).when(
        F.col("_v1").isNull(), F.col("_v0")
    ).otherwise(F.col("_v0") + (F.col("_v1") - F.col("_v0")) * frac)
    return out.select(
        key_col, "grid_ts", F.round(val, scale).alias("value")
    )
