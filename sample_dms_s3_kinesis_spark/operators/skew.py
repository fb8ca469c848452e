"""Skew-mitigation operators: salted joins and two-phase distinct.

When one join/group key value carries a disproportionate share of rows
(the boilerplate document, the null customer, the bot user), the task
holding that key becomes the straggler no matter how many executors
exist.  AQE's skew-join splitting handles moderate sort-merge skew
automatically (`spark.sql.adaptive.skewJoin.enabled`); these helpers
cover the cases it doesn't:

- ``salted_join``: replicate the small side over N salt values so the
  hot key's probe rows spread over N tasks.  Exact — every original
  pair still meets exactly once.
- ``two_phase_distinct_count``: exact COUNT(DISTINCT v) per key without
  concentrating each key's full value set on one task; phase 1
  deduplicates on (key, value) — spreading by value — and phase 2
  counts the survivors.

Plain sums/counts need no salting: hash aggregation already combines
map-side, so each task ships one partial row per key regardless of
skew.  Salting aggregation only pays when the aggregate keeps per-row
state (collect_list, exact distinct) — hence the distinct helper.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt: int, source: str | Column | None) -> Column:
    """Deterministic salt in [0, salt): hash of a row-distinguishing
    column (caller-chosen; defaults to all columns).  Deterministic so
    retried tasks re-derive the same salt (nondeterministic salts break
    recomputation under task retry)."""
    src = (
        F.xxhash64(*[F.col(c) for c in df.columns])
        if source is None
        else F.xxhash64(source if isinstance(source, Column) else F.col(source))
    )
    return F.pmod(src, F.lit(salt)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    *,
    salt: int = 8,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join with the big (skewed) side salted and the small side
    replicated ``salt`` times.  Output equals ``big.join(small, on,
    how)`` exactly: each big row carries one salt value, and the small
    side holds every salt value, so each original pair matches once.

    Use when the big side's key distribution is heavy-tailed and the
    small side is too large to broadcast but cheap to replicate N×.
    Supported how: inner / left (semantics preserved by replication).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 1:
        # pmod(x, 0) is NULL (never joins) and sequence(0, -1) descends
        # — salt=0 would silently return an empty/all-NULL join
        raise ValueError(f"salt must be >= 1, got {salt}")
    on_cols = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn("_salt", _salt_col(big, salt, salt_source))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("int"), F.lit(salt - 1).cast("int")))
    )
    return big_s.join(small_s, on_cols + ["_salt"], how).drop("_salt")


def two_phase_distinct_count(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    *,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value) as dedup-then-count.

    ``groupBy(k).agg(countDistinct(v))`` shuffles every (k, v) pair to
    k's single reducer — the hot key's task receives its whole value
    universe.  Phase 1 here groups by (k, v), so rows spread across
    reducers by value too and map-side combine collapses duplicates
    early; phase 2 counts one row per surviving (k, v).

    NULL values count as 0, matching COUNT(DISTINCT v) — the (k, NULL)
    group survives phase 1 (so an all-NULL key still emits a row, as
    the SQL GROUP BY does) but phase 2 counts only non-null values."""
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    return (
        df.select(*key_cols, value_col)
        .groupBy(*key_cols, value_col)
        .agg(F.lit(1).alias("_one"))
        .groupBy(*key_cols)
        .agg(F.count(F.col(value_col)).alias(alias))
    )


def skew_report(
    df: DataFrame,
    key_cols: str | Sequence[str],
    *,
    top: int = 20,
) -> DataFrame:
    """Heavy-hitter diagnosis for a prospective shuffle key: the ``top``
    key values by row count, each with its share of total rows — the
    number that says whether a join/groupBy on this key needs salting
    (a key with share ≈ 1/partitions or more will straggle).

    One partial-agg groupBy over the key, then TakeOrderedAndProject
    for the top-N (per-partition heaps; no global sort) and a broadcast
    1-row total — the report itself never concentrates the hot key's
    rows anywhere.  NULL keys count as a key value (the classic skew
    culprit).

    Returns ``(key_cols..., n_rows, share)`` ordered by count desc.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").cast("double").alias("_total"))
    return (
        counts.orderBy(F.desc("n_rows"), *[F.asc_nulls_first(k) for k in keys])
        .limit(top)
        .crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
        )
    )
