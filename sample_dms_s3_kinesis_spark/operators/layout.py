"""Storage-layout operators: range-clustered parquet writes and
small-file compaction.

At 100 TB the scan cost is set less by the engine than by the layout it
reads: parquet row-group min/max statistics only prune when values are
clustered, and a table fragmented into millions of KB-scale files turns
the driver's split planning and the store's request rate into the
bottleneck.  These operators maintain that layout as ordinary Spark
jobs:

- ``write_range_clustered``: global range partitioning on the cluster
  keys + an intra-partition sort before write.  Each output file then
  owns a narrow, non-overlapping key range, so a predicate on the
  cluster key prunes to O(1) files via footer stats alone — no index
  structure needed.  (Range partitioning samples the key distribution,
  so skewed keys still yield balanced files.)
- ``compact_small_files``: bin-packs an existing directory into
  ~``target_file_mb`` outputs.  Uses the actual on-disk bytes to pick
  the file count, so repeated compaction is idempotent-ish rather than
  oscillating.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_range_clustered(
    df: DataFrame,
    path: str,
    *,
    cluster_cols: list[str],
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``num_files`` parquet files range-clustered on
    ``cluster_cols``: file i holds keys strictly below file i+1's, and
    rows inside each file are sorted — the layout that makes footer
    min/max pruning and downstream merge-ish reads effective."""
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def directory_bytes(path: str) -> int:
    """Total bytes of the parquet part-files under ``path`` (local FS;
    on object stores use the catalog's size statistics instead)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, name))
    return total


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    target_file_mb: int = 128,
    cluster_cols: list[str] | None = None,
) -> int:
    """Rewrite a fragmented parquet directory into ~``target_file_mb``
    files; returns the output file count.  With ``cluster_cols`` the
    rewrite also restores range clustering (compaction and re-sorting
    are one pass, not two).

    The file count comes from the source's real on-disk size, so the
    operation converges: compacting an already-compacted directory
    plans the same file count again.
    """
    df = spark.read.parquet(src_path)
    n = max(1, math.ceil(directory_bytes(src_path) / (target_file_mb * 1024 * 1024)))
    if cluster_cols:
        write_range_clustered(
            df, dst_path, cluster_cols=cluster_cols, num_files=n
        )
    else:
        # coalesce, not repartition: no shuffle — each output task reads
        # a run of input files and streams them through.
        df.coalesce(n).write.mode("overwrite").parquet(dst_path)
    return n
