"""As-of join operator vs a Python reference fold over the events
table (last click before each purchase, per user)."""

import bisect

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators.asof import asof_join
from sample_dms_s3_kinesis_spark.plans.registry import t

from tdata import sf_dir

SF_DIR = sf_dir("0.001")


def _frames(spark):
    ev = t(spark, SF_DIR, "events").filter(F.col("user_id") < 40)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), "value"
    )
    return purchases, clicks


def _python_asof(purchases, clicks, allow_exact):
    by_user = {}
    for r in clicks:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["click_id"], r["value"]))
    for v in by_user.values():
        v.sort(key=lambda x: (x[0], x[1]))
    expected = {}
    for p in purchases:
        rows = by_user.get(p["user_id"], [])
        ts_list = [x[0] for x in rows]
        idx = (
            bisect.bisect_right(ts_list, p["ts"])
            if allow_exact
            else bisect.bisect_left(ts_list, p["ts"])
        )
        expected[p["event_id"]] = rows[idx - 1][1] if idx > 0 else None
    return expected


def _check(spark, allow_exact):
    purchases, clicks = _frames(spark)
    got = {
        r["event_id"]: r["asof_click_id"]
        for r in asof_join(
            purchases,
            clicks,
            by="user_id",
            ts_col="ts",
            allow_exact_matches=allow_exact,
        ).collect()
    }
    expected = _python_asof(purchases.collect(), clicks.collect(), allow_exact)
    assert got == expected
    assert sum(v is not None for v in got.values()) > 0


def test_asof_strictly_before(spark):
    _check(spark, allow_exact=False)


def test_asof_allow_exact(spark):
    _check(spark, allow_exact=True)


def test_asof_carries_payload_columns(spark):
    purchases, clicks = _frames(spark)
    out = asof_join(purchases, clicks, by="user_id", ts_col="ts")
    assert set(out.columns) == {
        "user_id", "ts", "event_id", "asof_click_id", "asof_ts", "asof_value",
    }
    row = out.filter(F.col("asof_click_id").isNotNull()).first()
    assert row["asof_ts"] < row["ts"]


# ---------------------------------------------------------------- binned
# range join (operators.intervals) — no-equi-key point-in-interval.

def test_binned_range_join_matches_naive_theta_join(spark):
    from sample_dms_s3_kinesis_spark.operators.intervals import binned_range_join

    import random

    rng = random.Random(11)
    points = [(i, rng.randint(0, 10_000)) for i in range(400)]
    ivals = []
    for j in range(120):
        s = rng.randint(-500, 10_000)
        ln = rng.choice([0, 1, 7, 50, 400, 3000])  # incl. empty + multi-bin
        ivals.append((1000 + j, s, s + ln))

    p = spark.createDataFrame(points, "p_id long, p long")
    iv = spark.createDataFrame(ivals, "i_id long, s long, e long")

    for width in (1, 64, 1000, 20_000):  # narrower and wider than spans
        got = {
            (r["p_id"], r["i_id"])
            for r in binned_range_join(
                p, iv, point_col="p", start_col="s", end_col="e", bin_width=width
            ).collect()
        }
        expected = {
            (pid, iid)
            for pid, pv in points
            for iid, s, e in ivals
            if s <= pv < e
        }
        assert got == expected, f"width={width}"


def test_binned_range_join_produces_each_pair_once(spark):
    from sample_dms_s3_kinesis_spark.operators.intervals import binned_range_join

    p = spark.createDataFrame([(1, 50)], "p_id long, p long")
    iv = spark.createDataFrame([(9, 0, 1000)], "i_id long, s long, e long")
    # interval spans many bins; the point's bin matches exactly one copy
    out = binned_range_join(
        p, iv, point_col="p", start_col="s", end_col="e", bin_width=10
    ).collect()
    assert len(out) == 1


def test_asof_join_deterministic_on_duplicate_right_ts(spark):
    """r6 review: equal-(key, ts) right rows used to carry a partition-
    order-dependent payload; the struct tiebreaker makes the MAX right
    payload win, stably across runs and partitionings."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from sample_dms_s3_kinesis_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 0, 11), 1)],
        "key string, ts timestamp, lv long",
    )
    t0 = datetime(2024, 1, 1, 0, 10)
    right_rows = [("k", t0, float(p)) for p in (1, 2, 3)]
    outs = set()
    for nparts in (1, 2, 7):
        right = spark.createDataFrame(
            right_rows, "key string, ts timestamp, price double"
        ).repartition(nparts)
        out = asof_join(
            left, right, by="key", ts_col="ts", right_cols=["price"]
        ).collect()[0]["asof_price"]
        outs.add(out)
    assert outs == {3.0}   # max payload, same under every partitioning


def test_binned_range_join_rejects_open_ended_sentinel(spark):
    """r6 review: an open-ended sentinel interval used to ask
    F.sequence for billions of elements and kill the job opaquely —
    the per-row cap fails loudly with an actionable message."""
    import pytest

    from sample_dms_s3_kinesis_spark.operators.intervals import (
        binned_range_join,
    )

    pts = spark.createDataFrame([(1, 100)], "pid long, v long")
    iv = spark.createDataFrame(
        [(9, 0, 2**62)], "iid long, s long, e long"  # "still open"
    )
    with pytest.raises(Exception, match="spans more than"):
        binned_range_join(
            pts, iv, point_col="v", start_col="s", end_col="e",
            bin_width=1000, max_bins_per_interval=10_000,
        ).collect()
    # a sane interval under the cap still joins
    ok = binned_range_join(
        pts,
        spark.createDataFrame([(9, 0, 5000)], "iid long, s long, e long"),
        point_col="v", start_col="s", end_col="e", bin_width=1000,
    ).collect()
    assert len(ok) == 1
