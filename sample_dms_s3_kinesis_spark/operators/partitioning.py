"""Partitioning helpers for compute-bound operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions for expression-heavy per-row work.

    A small table arriving as one parquet file gets one input split, which
    pins per-row compute (signatures, per-pair cosine, array folds) to a
    single core no matter how many are available.  At production scale
    inputs arrive in many splits and this is a no-op; when it does fire,
    the repartition cost is bounded by the (small) input size while the
    downstream compute parallelizes across the cluster.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
