"""Binned range (interval) join — point-in-interval matching WITHOUT an
equality key.

Spark executes a pure range predicate (``s <= p AND p < e``) as a
broadcast-nested-loop join: O(|points| × |intervals|) comparisons and a
broadcast of one whole side.  Fine at test scale, catastrophic at 100 TB.

The scale-correct plan is binning: quantize the value domain into
fixed-width bins, explode each interval over the bins it covers, tag
each point with its single bin, equi-join on the bin id, then re-check
the exact range predicate.  That turns the join into a hash-partitioned
shuffle join — each matching pair is produced exactly once (a point
lives in exactly one bin, and an interval covers that bin at most once),
so no dedup pass is needed.

Cost model: the explode factor is ceil(interval_len / bin_width) + 1,
and the number of candidate pairs is (pairs whose bins collide) instead
of |P|×|I| — pick ``bin_width`` near the median interval length so both
stay O(1) per row.  Skewed bins (one hot hour) are ordinary equi-join
skew: AQE's skew-join splitting or salting applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "_range_bin"


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    max_bins_per_interval: int = 1_000_000,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point < end`` (end-exclusive), all columns of both inputs
    preserved.  ``point_col``/``start_col``/``end_col`` must be numeric
    (LONG-compatible) and in the same units as ``bin_width`` — for
    timestamps, convert with ``unix_micros`` first.  Column names of the
    two inputs must be disjoint.

    Empty intervals (start >= end) match nothing.  Left/anti variants
    compose from this: e.g. unmatched points = points left-anti the
    matched point ids.

    ``max_bins_per_interval`` caps the per-row explode: an open-ended
    sentinel interval (end = Long.MAX, the common SCD "still open"
    encoding) would otherwise ask F.sequence for billions of elements
    and kill the job with an opaque array-size error — the cap fails
    the offending ROW loudly instead (widen ``bin_width`` or close the
    sentinel before joining).
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    w = F.lit(int(bin_width))

    def to_bin(c: Column) -> Column:
        return F.floor(c.cast("double") / w.cast("double")).cast("long")

    n_bins = to_bin(F.col(end_col) - 1) - to_bin(F.col(start_col)) + 1
    guard = F.assert_true(
        n_bins <= F.lit(int(max_bins_per_interval)),
        F.concat(
            F.lit(
                "binned_range_join: interval spans more than "
                f"{max_bins_per_interval} bins (bin_width={bin_width}"
                "); widen bin_width or close open-ended intervals"
            )
        ),
    )
    pb = points.withColumn(_BIN, to_bin(F.col(point_col)))
    ib = (
        intervals.filter(F.col(start_col) < F.col(end_col))
        .withColumn(
            _BIN,
            F.explode(
                # end is exclusive, so the last covered bin holds end-1;
                # assert_true is NULL on success, so the when() always
                # takes the otherwise branch after evaluating the guard
                F.when(guard.isNotNull(), F.array(F.lit(0).cast("long")))
                .otherwise(
                    F.sequence(
                        to_bin(F.col(start_col)), to_bin(F.col(end_col) - 1)
                    )
                )
            ),
        )
    )
    return (
        pb.join(ib, on=_BIN, how="inner")
        .filter(
            (F.col(start_col) <= F.col(point_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop(_BIN)
    )
