"""Mergeable frequency sketches as plain relational tables.

The HLL query (``q_hll_daily_union``) keeps DISTINCT counts
re-aggregatable; this module does the same for FREQUENCIES with a
Count-Min sketch (Cormode & Muthukrishnan 2005) expressed as a
DataFrame instead of an opaque binary: ``(d, b, cnt)`` — depth×width
counters, counter (d, b) = how many input rows hashed to bucket b
under seed d.  A metrics store keeps one sketch table per partition
(per day, per source); ANY range's frequency estimates come from
summing the partitions' counters (:func:`cms_merge`) and probing
(:func:`cms_estimate`) — no rescan of the raw events.

Why a TABLE and not Spark's ``count_min_sketch`` binary: the binary
is only readable driver-side through the JVM helper class, so every
estimate leaves the engine; the relational form keeps build, merge
and probe inside Catalyst (map-side-combined aggregates + a
broadcast probe join), stays engine-portable, and the driver gate /
oracles can see it.

Guarantees (depth d = ⌈ln 1/δ⌉, width w = ⌈e/ε⌉): estimates never
undercount, and overcount by more than ε·N with probability at most
δ.  ``tests/test_sketch_ops.py`` pins both sides against exact
counts.

Scale: the build is one bounded explode (×depth) into one map-side-
combined groupBy — hot values collapse in the combiner, and the
sketch itself is at most d·w rows regardless of input size.  Probes
broadcast the (tiny) probe set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators.partitioning import spread


def _bucket(col: Column, d: Column, width: int) -> Column:
    return F.pmod(F.xxhash64(col, d), F.lit(width)).cast("int")


def cms_table(
    df: DataFrame,
    col: str,
    *,
    width: int = 1024,
    depth: int = 5,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Build a Count-Min sketch table over ``df[col]`` — one sketch
    per ``group_cols`` combination (e.g. per day) or one global
    sketch.

    Output: (*group_cols, d, b, cnt) with ``cnt`` long; absent
    (d, b) pairs are implicitly zero.
    """
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("d")
    rows = spread(df).select(
        *[F.col(g) for g in group_cols], F.col(col).alias("_v"), seeds
    )
    return (
        rows.select(
            *[F.col(g) for g in group_cols],
            "d",
            _bucket(F.col("_v"), F.col("d"), width).alias("b"),
        )
        .groupBy(*group_cols, "d", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(
    cms: DataFrame, *, drop_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge sketches by summing counters — the whole point of the
    sketch being a table: dropping the partition columns and
    re-aggregating IS the union.  Output: (d, b, cnt)."""
    return (
        cms.drop(*drop_cols)
        .groupBy("d", "b")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    col: str,
    *,
    width: int = 1024,
    depth: int = 5,
) -> DataFrame:
    """Estimate each probe value's frequency from a (merged) sketch:
    min over the depth rows of its counters (a missing counter is 0).
    The probe set is broadcast — it is the small side by contract.

    Output: (col, est_count); ``est_count >= true_count`` always.
    """
    keyed = probes.select(F.col(col)).distinct().select(
        F.col(col),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
    )
    keyed = keyed.select(
        col, "d", _bucket(F.col(col), F.col("d"), width).alias("b")
    )
    return (
        F.broadcast(keyed)
        .join(cms, on=["d", "b"], how="left")
        .groupBy(col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )
