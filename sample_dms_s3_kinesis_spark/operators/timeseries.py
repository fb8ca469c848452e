"""Distributed time-series similarity search — PAA / SAX over keyed
event streams (Keogh et al.'s Piecewise Aggregate Approximation and
Symbolic Aggregate approXimation; the retrieved EDBT 2019 streaming
time-series-similarity line uses the same reduced representations).

The engine's event table is (key, ts, value); a series is a key's
values averaged over a fixed time grid.  Everything here is pure
Catalyst:

- :func:`paa_series` — ONE map-side-combined aggregate builds the
  per-key bucketed averages; the dense PAA vector assembles from a
  bucket→avg map lookup over a literal bucket sequence (missing
  buckets fill 0.0, documented).  100 TB shape: one shuffle on the
  key, output |keys| × buckets doubles.
- :func:`znormalize_series` — per-series z-normalization from exact
  moment sums inside one bound HOF chain (flat series → zeros, not
  NaN).
- :func:`sax_symbols` — z-normalized PAA quantized by the fixed
  Gaussian breakpoints per alphabet size: identical SAX words are
  candidate near-identical behavior patterns, an equality-banded
  join like the LSH families (exact, engine-independent — the
  breakpoints are literals, so DuckDB replicates every symbol).
- :func:`series_topk` — z-normalized Euclidean top-k against one
  query key: TakeOrderedAndProject finishes, no global sort.

After PAA the series is just an embedding — the ANN/PQ/PCA machinery
(`operators/similarity.py`) composes directly for billion-key scale;
this module supplies the representation and the exact small-k path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators.partitioning import spread
from sample_dms_s3_kinesis_spark.operators.text import _bind

# Gaussian breakpoints per alphabet size (SAX standard table):
# P(N(0,1) < b_i) = i/alphabet.
_SAX_BREAKPOINTS = {
    2: [0.0],
    3: [-0.4307272992954576, 0.4307272992954576],
    4: [-0.6744897501960817, 0.0, 0.6744897501960817],
    5: [-0.8416212335729142, -0.2533471031357997,
        0.2533471031357997, 0.8416212335729142],
    8: [-1.1503493803760079, -0.6744897501960817, -0.3186393639643751,
        0.0, 0.3186393639643751, 0.6744897501960817,
        1.1503493803760079],
}


def paa_series(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    start: str,
    end: str,
    buckets: int,
) -> DataFrame:
    """Piecewise Aggregate Approximation: per key, the mean of
    ``value_col`` over each of ``buckets`` equal time slices of
    [start, end).  Output: (key_col, series array<double>) — buckets
    with no rows read 0.0 (the neutral element of the z-normalized
    distance; callers needing mean-fill can post-process).

    Rows with NULL ts/value or outside the window are excluded."""
    if buckets < 1:
        raise ValueError("paa_series: buckets must be >= 1")
    s = F.unix_micros(F.to_timestamp(F.lit(start)))
    e = F.unix_micros(F.to_timestamp(F.lit(end)))
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = F.floor(
        (t - s) * buckets / (e - s)
    ).cast("int")
    per = (
        spread(df)
        .filter(
            F.col(ts_col).isNotNull()
            & F.col(value_col).isNotNull()
            & (t >= s)
            & (t < e)
        )
        .withColumn("_b", bucket)
        .groupBy(F.col(key_col), F.col("_b"))
        .agg(F.avg(F.col(value_col).cast("double")).alias("_v"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(buckets - 1)),
        # try_element_at: ANSI mode makes plain element_at THROW on a
        # missing map key, and empty buckets are expected
        lambda i: F.coalesce(
            F.try_element_at(F.col("_m"), i.cast("int")), F.lit(0.0)
        ),
    )
    return (
        per.groupBy(key_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_b", "_v"))
            ).alias("_m")
        )
        .select(F.col(key_col), dense.alias("series"))
    )


def znormalize_series(series: Column) -> Column:
    """(x - mean) / std per series, from exact moment sums; a flat
    series (std == 0) normalizes to all-zeros instead of NaN.  The
    input is bound once — the mean/std references would otherwise
    re-evaluate an upstream pipeline per element (HOF-CSE)."""

    def _z(xs: Column) -> Column:
        n = F.size(xs).cast("double")
        mean = (
            F.aggregate(xs, F.lit(0.0), lambda a, x: a + x) / n
        )
        var = (
            F.aggregate(xs, F.lit(0.0), lambda a, x: a + x * x) / n
            - mean * mean
        )
        std = F.sqrt(F.greatest(var, F.lit(0.0)))
        # bind the scalars: they are referenced once per element
        stats = F.array(mean, std)
        return _bind(
            stats,
            lambda st: F.transform(
                xs,
                lambda x: F.when(
                    F.element_at(st, 2) > 0,
                    (x - F.element_at(st, 1)) / F.element_at(st, 2),
                ).otherwise(F.lit(0.0)),
            ),
        )

    return _bind(series, _z)


def sax_symbols(zseries: Column, *, alphabet: int = 4) -> Column:
    """SAX word of a z-normalized series: each value maps to the index
    of its Gaussian-breakpoint band, concatenated as a string (e.g.
    '0231...') — identical words are candidate near-identical shapes.
    Deterministic and engine-independent (breakpoint literals)."""
    try:
        brk = _SAX_BREAKPOINTS[alphabet]
    except KeyError:
        raise ValueError(
            f"sax_symbols: unsupported alphabet {alphabet}; "
            f"available: {sorted(_SAX_BREAKPOINTS)}"
        )

    def _sym(x: Column) -> Column:
        idx = F.lit(0)
        for b in brk:
            idx = idx + F.when(x >= F.lit(b), F.lit(1)).otherwise(F.lit(0))
        return idx.cast("string")

    return F.concat_ws(
        "", F.transform(zseries, lambda x: _sym(x))
    )


def series_topk(
    series_df: DataFrame,
    query_key,
    *,
    key_col: str,
    k: int = 10,
    scale: int = 6,
) -> DataFrame:
    """Top-k keys by z-normalized Euclidean distance to ``query_key``'s
    series (the query key itself excluded).  The query series is one
    collected row (driver-bounded, like every ANN query vector);
    distances are a bound zip_with fold; TakeOrderedAndProject
    finishes.  Ties break on the key.

    Output: (key_col, dist) ascending, ``dist`` rounded to ``scale``
    decimals."""
    from sample_dms_s3_kinesis_spark.operators.dedup import _cut_lineage

    # lineage cut: the one-row query collect and the distance scan
    # would otherwise each re-run the upstream PAA aggregation
    z = _cut_lineage(
        series_df.select(
            F.col(key_col),
            znormalize_series(F.col("series")).alias("_z"),
        )
    )
    row = z.filter(F.col(key_col) == F.lit(query_key)).collect()
    if not row:
        raise ValueError(f"series_topk: query key {query_key!r} not found")
    qv = row[0]["_z"]
    d2 = F.aggregate(
        F.zip_with(
            F.col("_z"),
            F.array(*[F.lit(float(x)) for x in qv]),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda s_, x: s_ + x,
    )
    return (
        z.filter(F.col(key_col) != F.lit(query_key))
        .select(
            F.col(key_col), F.round(F.sqrt(d2), scale).alias("dist")
        )
        .orderBy("dist", key_col)
        .limit(k)
    )
