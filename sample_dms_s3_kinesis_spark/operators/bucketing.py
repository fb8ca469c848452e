"""Bucketed-table helpers: co-located, shuffle-free joins and
aggregations.

At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
sides.  Writing the tables bucketed (and sorted) by the join key moves
that cost to write time, once: every subsequent join/aggregate on the
bucket key runs with NO exchange — each task reads bucket i of both
sides and merges.  This is the batch analog of co-partitioned state in
streaming.

Rules that make it work (all encoded here):
- both sides bucketed by the same key into the SAME bucket count;
- ``sortBy`` the bucket key so sort-merge join skips its sort;
- read through the table catalog (``spark.table``), not raw parquet
  paths — bucket metadata lives in the catalog entry;
- keep ``spark.sql.sources.bucketing.enabled`` on (default).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    key: str | Sequence[str],
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key — plans
    with zero shuffle exchanges when both sides share bucket spec."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on_cols, how)


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange — the
    assertion hook for co-location tests and plan audits.  Matches ANY
    shuffle exchange (hash, range, round-robin, single-partition) —
    only BroadcastExchange is not a shuffle; the former two-pattern
    match reported global aggregates and repartitions shuffle-free.
    ``ReusedExchange`` nodes are excluded too: reuse of a broadcast
    exchange is not a shuffle, and reuse of a shuffle exchange always
    coexists with the original ``Exchange`` node it points at, which
    this still matches."""
    import re as _re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return bool(
        _re.search(r"(?<!Broadcast)(?<!Reused)Exchange[ (]", plan)
        or plan.startswith("Exchange")
    )
