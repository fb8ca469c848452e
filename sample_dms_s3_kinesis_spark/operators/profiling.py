"""Dataset profiling: per-column statistics in one aggregation pass.

The pipeline-health report a curation run starts and ends with (row
counts, null rates, cardinalities, value ranges) — the generalization
of the reference's per-table replication statistics
(`/root/reference/run.py:209-215`) from apply counters to column-level
data quality.

Scale notes: ONE wide aggregate computes every column's stats in a
single pass (count/min/max partial-aggregate map-side; the exact
distincts share one expand-based aggregate), then a literal
struct-array explode pivots the 1-row result into one row per column —
driver never sees data, only the final O(columns) rows.  Exact
distinct counts multiply the aggregate's internal row stream by the
column count (Spark's expand); at 100 TB pass ``exact=False`` to use
HLL sketches (``approx_count_distinct``) and keep the pass linear.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    exact: bool = True,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, n_distinct,
    min_value, max_value), min/max cast to string so heterogeneous
    column types share one schema.  ``exact=False`` swaps the distinct
    counts to ``approx_count_distinct`` (no SQL oracle then)."""
    cols = list(columns) if columns is not None else list(df.columns)
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            distinct(F.col(c)).alias(f"_d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_total").alias("n_rows"),
            (F.col("_total") - F.col(f"_nn_{c}")).alias("n_null"),
            F.col(f"_d_{c}").alias("n_distinct"),
            F.col(f"_mn_{c}").alias("min_value"),
            F.col(f"_mx_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*entries)).alias("_p")).select("_p.*")
