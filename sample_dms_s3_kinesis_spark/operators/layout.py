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

    ``dst_path`` must differ from ``src_path``: Spark cannot overwrite
    a path it is reading (the lazy write fails mid-operation, after
    some committers have already deleted source files) — compact into
    a sibling directory and swap atomically at the storage layer.
    """
    import os as _os

    if _os.path.abspath(src_path.rstrip("/")) == _os.path.abspath(
        dst_path.rstrip("/")
    ):
        raise ValueError(
            "compact_small_files cannot compact in place: write to a "
            "sibling directory and swap (Spark refuses to overwrite a "
            "path being read, and failure mid-write would lose source "
            "files)"
        )
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


# ----------------------------------------------------------- z-order

def _spread_bits_16(c):
    """Spread a 16-bit value's bits to even positions (0b_x_x_x…):
    classic mask-shift doubling, pure JVM bit ops."""
    c = (c.bitwiseOR(F.shiftleft(c, 8))).bitwiseAND(F.lit(0x00FF00FF))
    c = (c.bitwiseOR(F.shiftleft(c, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    c = (c.bitwiseOR(F.shiftleft(c, 2))).bitwiseAND(F.lit(0x33333333))
    c = (c.bitwiseOR(F.shiftleft(c, 1))).bitwiseAND(F.lit(0x55555555))
    return c


def zorder_key(x, y, *, x_min, x_max, y_min, y_max):
    """32-bit Morton (Z-order) key interleaving two numeric columns,
    each scaled to 16 bits over its [min, max] range.  Equal-width
    scaling: fine for roughly uniform keys; for heavy skew, pre-map
    through quantile buckets before calling."""

    def scale(c, lo, hi):
        span = float(hi - lo) if hi > lo else 1.0
        scaled = ((c.cast("double") - F.lit(float(lo))) / F.lit(span)) * 65535.0
        return F.least(
            F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit(65535)
        )

    return _spread_bits_16(scale(x, x_min, x_max)).bitwiseOR(
        F.shiftleft(_spread_bits_16(scale(y, y_min, y_max)), 1)
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    *,
    cluster_cols: list[str],
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``num_files`` parquet files clustered on the
    Morton (Z-order) interleave of TWO numeric columns, so footer
    min/max statistics prune on BOTH dimensions — the multi-column
    analogue of ``write_range_clustered`` (which gives one strongly
    pruned leading column and nothing on the rest).

    One cheap min/max agg fixes the scaling; the write is then an
    ordinary range-partition + sort on the z key (sampled, so balanced
    even for clustered z values).  The z key itself is dropped from
    the stored schema.
    """
    if len(cluster_cols) != 2:
        raise ValueError("zorder clustering takes exactly two columns")
    cx, cy = cluster_cols
    b = df.agg(
        F.min(cx).alias("x_min"),
        F.max(cx).alias("x_max"),
        F.min(cy).alias("y_min"),
        F.max(cy).alias("y_max"),
    ).first()
    if b is None or any(b[k] is None for k in ("x_min", "x_max", "y_min", "y_max")):
        # Empty input or an all-null cluster column: no bounds to scale
        # against, so a z-key is meaningless — fall back to a plain
        # write (still honors num_files) instead of a TypeError.
        df.repartition(num_files).write.mode(mode).parquet(path)
        return
    z = zorder_key(
        F.col(cx),
        F.col(cy),
        x_min=b["x_min"],
        x_max=b["x_max"],
        y_min=b["y_min"],
        y_max=b["y_max"],
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def skipping_report(
    path: str,
    column: str,
    *,
    lo=None,
    hi=None,
) -> dict:
    """Data-skipping effectiveness of the CURRENT layout for a range
    predicate ``lo <= column <= hi``: walk every parquet footer under
    ``path`` (metadata only — no row data is read, the same I/O a
    query planner's pruning pass does) and report how many row groups
    a min/max check would skip.

    The number that justifies :func:`write_range_clustered` /
    :func:`write_zorder_clustered`: on unclustered data every row
    group straddles the predicate and ``skippable`` is ~0; after
    clustering on ``column`` it approaches ``1 - selectivity``.
    ``lo``/``hi`` of None mean unbounded on that side.

    Returns ``{"files", "row_groups", "skippable", "skip_fraction",
    "rows_total", "rows_skippable"}``.
    """
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(dirpath, f)
        for dirpath, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_groups = n_skip = rows_total = rows_skip = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        try:
            idx = md.schema.names.index(column)
        except ValueError as exc:
            raise ValueError(
                f"column {column!r} not in {fp}: {md.schema.names}"
            ) from exc
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            n_groups += 1
            rows_total += g.num_rows
            st = g.column(idx).statistics
            if st is None or not st.has_min_max:
                continue  # no stats → never skippable
            # row group is skippable iff its [min, max] is DISJOINT
            # from [lo, hi]
            if (hi is not None and st.min > hi) or (
                lo is not None and st.max < lo
            ):
                n_skip += 1
                rows_skip += g.num_rows
    return {
        "files": len(files),
        "row_groups": n_groups,
        "skippable": n_skip,
        "skip_fraction": round(n_skip / n_groups, 6) if n_groups else None,
        "rows_total": rows_total,
        "rows_skippable": rows_skip,
    }
