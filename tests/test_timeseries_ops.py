"""PAA / SAX / series top-k vs pure-Python references."""

import math

import pytest
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import timeseries as ts

START, END = "2026-01-01 00:00:00", "2026-01-11 00:00:00"  # 10 days


def _events(spark):
    rows = []
    # user 1: rising ramp; user 2: identical shape, scaled+shifted
    # (z-norm equal); user 3: flat; user 4: sparse (gaps -> 0 fill)
    for d in range(10):
        rows.append((1, f"2026-01-{d+1:02d} 12:00:00", float(d)))
        rows.append((2, f"2026-01-{d+1:02d} 12:00:00", 100.0 + 3.0 * d))
        rows.append((3, f"2026-01-{d+1:02d} 12:00:00", 5.0))
    rows.append((4, "2026-01-01 12:00:00", 7.0))
    rows.append((4, "2026-01-09 12:00:00", 9.0))
    df = spark.createDataFrame(rows, "user_id long, ts_s string, value double")
    return df.select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
    )


def _series(spark, buckets=10):
    return ts.paa_series(
        _events(spark),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        start=START,
        end=END,
        buckets=buckets,
    )


def test_paa_series_matches_reference(spark):
    got = {r["user_id"]: r["series"] for r in _series(spark).collect()}
    assert got[1] == [float(d) for d in range(10)]
    assert got[2] == [100.0 + 3.0 * d for d in range(10)]
    assert got[3] == [5.0] * 10
    want4 = [0.0] * 10
    want4[0], want4[8] = 7.0, 9.0
    assert got[4] == want4
    # coarser grid: bucket means
    coarse = {
        r["user_id"]: r["series"]
        for r in _series(spark, buckets=5).collect()
    }
    assert coarse[1] == [0.5, 2.5, 4.5, 6.5, 8.5]


def test_znormalize_and_sax(spark):
    z = _series(spark).select(
        "user_id",
        ts.znormalize_series(F.col("series")).alias("z"),
        ts.sax_symbols(
            ts.znormalize_series(F.col("series")), alphabet=4
        ).alias("sax"),
    )
    got = {r["user_id"]: (r["z"], r["sax"]) for r in z.collect()}
    # affine-equivalent series share the z-form and the SAX word
    for a, b in zip(got[1][0], got[2][0]):
        assert a == pytest.approx(b, abs=1e-12)
    assert got[1][1] == got[2][1]
    # flat series: zeros, all-middle symbols, no NaN
    assert got[3][0] == [0.0] * 10
    assert got[3][1] == "2" * 10  # 0.0 >= breakpoints -0.67, 0.0
    # python reference for user 1
    xs = [float(d) for d in range(10)]
    m = sum(xs) / 10
    sd = math.sqrt(sum(x * x for x in xs) / 10 - m * m)
    for a, b in zip(got[1][0], [(x - m) / sd for x in xs]):
        assert a == pytest.approx(b, abs=1e-12)

    with pytest.raises(ValueError, match="alphabet"):
        _series(spark).select(
            ts.sax_symbols(F.col("series"), alphabet=7)
        )


def test_series_topk_orders_by_znormalized_distance(spark):
    out = ts.series_topk(
        _series(spark), 1, key_col="user_id", k=3
    ).collect()
    ids = [r["user_id"] for r in out]
    # user 2 is z-identical (dist 0) and must rank first
    assert ids[0] == 2 and out[0]["dist"] == 0.0
    assert 1 not in ids
    dists = [r["dist"] for r in out]
    assert dists == sorted(dists)
    with pytest.raises(ValueError, match="not found"):
        ts.series_topk(_series(spark), 999, key_col="user_id")


def test_paa_validates_buckets(spark):
    with pytest.raises(ValueError, match="buckets"):
        ts.paa_series(
            _events(spark),
            key_col="user_id",
            ts_col="ts",
            value_col="value",
            start=START,
            end=END,
            buckets=0,
        )
