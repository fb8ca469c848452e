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
) -> DataFrame:
    """Per-user furthest funnel step reached, matching steps strictly
    in event-time order (greedy earliest-match, which maximizes the
    matched prefix): step i+1 counts only with an event strictly later
    than the event matched for step i.

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
    fold = F.aggregate(
        evs,
        F.struct(
            F.lit(0).alias("step"), F.lit(_NEG_INF).cast("long").alias("t")
        ),
        lambda acc, e: F.when(
            (acc["step"] < k)
            & (e["y"] == F.element_at(steps_arr, acc["step"] + 1))
            & (e["t"] > acc["t"]),
            F.struct((acc["step"] + 1).alias("step"), e["t"].alias("t")),
        ).otherwise(acc),
    )
    return (
        df.filter(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(fold["step"].alias("depth"))
        .filter(F.col("depth") >= 1)
    )


def funnel_counts(
    df: DataFrame,
    *,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel report: for each step, how many users reached at
    least that step (strict event-time ordering between steps).

    Output: (step, step_name, n_users), one row per funnel step, step
    1-based; n_users is non-increasing in step.
    """
    depth = user_funnel_depth(
        df, steps=steps, user_col=user_col, ts_col=ts_col, type_col=type_col
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
