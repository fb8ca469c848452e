"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with
``r.ts < l.ts`` (or ``<=`` with ``allow_exact_matches``) within the same
``by`` key: the canonical shape for "state as of event time" lookups
(last quote before a trade, last click before a purchase, dimension
version in effect at fact time).

Implementation is union + last-value window, NOT an inequality join:
an inequality join explodes to O(|L|·|R|) per key before filtering,
while the union sorts each key's merged timeline once and carries the
latest right payload forward — O((|L|+|R|) log) per key, one shuffle on
``by``, skew-bounded by the hottest key.  This is the same plan a
range-join-optimized engine produces for ASOF JOIN (DuckDB's ASOF is
the oracle twin in plans.registry).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str | Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] | None = None,
    allow_exact_matches: bool = False,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join.

    Returns every left row with ``{prefix}{c}`` columns holding the
    payload of the latest right row at-or-before (``allow_exact_matches``)
    / strictly-before its ``ts_col``; nulls when no prior right row
    exists (left semantics).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    rcols = list(right_cols or [c for c in right.columns if c not in by_cols])

    r = right.select(
        *by_cols,
        F.col(ts_col).alias("_ts"),
        F.struct(*[F.col(c) for c in rcols]).alias("_rpayload"),
        F.lit(True).alias("_is_right"),
    )
    lcols = left.columns
    l = left.select(
        *by_cols,
        F.col(ts_col).alias("_ts"),
        F.struct(*[F.col(c) for c in lcols if c not in by_cols]).alias("_lpayload"),
        F.lit(False).alias("_is_right"),
    ).withColumn("_rpayload", F.lit(None).cast(r.schema["_rpayload"].dataType))

    merged = r.withColumn(
        "_lpayload", F.lit(None).cast(l.schema["_lpayload"].dataType)
    ).unionByName(l)

    # Tie policy at equal ts via the right/left sort position: rights
    # first ⇒ the frame-up-to-previous-row includes them (exact matches
    # allowed); rights last ⇒ excluded (strictly-before).
    tie = F.col("_is_right").desc() if allow_exact_matches else F.col("_is_right").asc()
    # Final tiebreaker: multiple RIGHT rows sharing (by, ts) would
    # otherwise leave the window order partial and the carried payload
    # partition-order-dependent (nondeterministic across runs/retries).
    # Struct order is total, so the MAX right payload wins — stable.
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col("_ts").asc(), tie, F.col("_rpayload").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = merged.withColumn(
        "_asof",
        F.last(F.when(F.col("_is_right"), F.col("_rpayload")), ignorenulls=True).over(w),
    )
    out = carried.filter(~F.col("_is_right")).select(
        *by_cols,
        F.col("_ts").alias(ts_col),
        *[
            F.col("_lpayload")[c].alias(c)
            for c in lcols
            if c not in by_cols and c != ts_col
        ],
        *[F.col("_asof")[c].alias(f"{prefix}{c}") for c in rcols],
    )
    return out
