"""Funnel / cohort-retention operators vs hand-built scenarios and a
pure-Python greedy-subsequence reference."""

from datetime import datetime

from hypothesis import HealthCheck, given, settings, strategies as st

from sample_dms_s3_kinesis_spark.operators import analytics


def _ts(day, hour=0, minute=0):
    return datetime(2024, 1, day, hour, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, u, ts, ty) for i, (u, ts, ty) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, event_type string",
    )


def _ref_depth(events_by_user, steps):
    """Greedy earliest-match subsequence depth per user — the textbook
    O(n) scan over time-sorted events."""
    out = {}
    for u, evs in events_by_user.items():
        need, last_t = 0, None
        for t, y in sorted(evs):
            if need < len(steps) and y == steps[need] and (
                last_t is None or t > last_t
            ):
                need += 1
                last_t = t
        if need:
            out[u] = need
    return out


def test_funnel_depth_scenarios(spark):
    steps = ["view", "click", "purchase"]
    rows = [
        # u1 converts fully, in order
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # u2: purchase BEFORE the click — depth stops at click
        (2, _ts(1), "view"), (2, _ts(3), "click"), (2, _ts(2), "purchase"),
        # u3: no view at all — excluded even with later steps present
        (3, _ts(1), "click"), (3, _ts(2), "purchase"),
        # u4: simultaneous view+click — strict ordering rejects the click
        (4, _ts(1, 5), "view"), (4, _ts(1, 5), "click"),
        # u5: view only
        (5, _ts(9), "view"),
        # u6: repeated views then conversion via later events
        (6, _ts(1), "view"), (6, _ts(2), "view"), (6, _ts(2, 1), "click"),
        (6, _ts(2, 2), "purchase"),
    ]
    got = {
        r["user_id"]: r["depth"]
        for r in analytics.user_funnel_depth(
            _events(spark, rows), steps=steps
        ).collect()
    }
    assert got == {1: 3, 2: 2, 4: 1, 5: 1, 6: 3}

    counts = {
        r["step"]: (r["step_name"], r["n_users"])
        for r in analytics.funnel_counts(
            _events(spark, rows), steps=steps
        ).collect()
    }
    assert counts == {
        1: ("view", 5),
        2: ("click", 3),
        3: ("purchase", 2),
    }


def test_funnel_emits_zero_rows_for_unreached_steps(spark):
    rows = [(1, _ts(1), "view")]
    counts = {
        r["step"]: r["n_users"]
        for r in analytics.funnel_counts(
            _events(spark, rows), steps=["view", "click", "purchase"]
        ).collect()
    }
    assert counts == {1: 1, 2: 0, 3: 0}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),          # user
            st.integers(min_value=0, max_value=50),         # minute
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_depth_property(spark, raw):
    steps = ["view", "click", "purchase"]
    rows = [(u, _ts(1, 0, m), y) for u, m, y in raw]
    by_user = {}
    for u, ts, y in rows:
        if y in steps:
            by_user.setdefault(u, []).append((ts, y))
    got = {
        r["user_id"]: r["depth"]
        for r in analytics.user_funnel_depth(
            _events(spark, rows), steps=steps
        ).collect()
    }
    assert got == _ref_depth(by_user, steps)


def test_cohort_retention_matrix(spark):
    rows = [
        # cohort week of Jan 1 (Mon): u1 active weeks 0 and 2, u2 week 0
        (1, _ts(2), "view"), (1, _ts(16), "click"),
        (2, _ts(3), "view"),
        # cohort week of Jan 8: u3 active weeks 0 and 1
        (3, _ts(9), "view"), (3, _ts(15), "view"), (3, _ts(16), "view"),
    ]
    got = {
        (r["cohort"].date().isoformat(), r["period_offset"]): r["n_users"]
        for r in analytics.cohort_retention(_events(spark, rows)).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_funnel_conversion_stats(spark):
    rows = [
        # u1 converts: view@d1 -> purchase@d3 (48h)
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # u2 converts: view@d1 -> purchase@d2 (24h); later earlier-view ignored
        (2, _ts(1), "view"), (2, _ts(1, 6), "click"), (2, _ts(2), "purchase"),
        # u3 does not convert
        (3, _ts(1), "view"), (3, _ts(2), "click"),
    ]
    got = analytics.funnel_conversion_stats(
        _events(spark, rows), steps=["view", "click", "purchase"]
    ).collect()[0]
    assert got["n_converted"] == 2
    assert got["avg_seconds"] == (48 * 3600 + 24 * 3600) / 2


def test_resample_ffill_gaps_duplicates_and_nulls(spark):
    rows = [
        # u1: obs at 00:30 (v=1), 13:00 (v=2); 6h grid 00:00..12:00
        (1, datetime(2024, 1, 1, 0, 30), 1.0),
        (1, datetime(2024, 1, 1, 13, 0), 2.0),
        # u2: duplicate timestamp — higher event_id wins the tie
        (2, datetime(2024, 1, 1, 1, 0), 10.0),
        (2, datetime(2024, 1, 1, 1, 0), 11.0),
        (2, datetime(2024, 1, 1, 8, 0), 12.0),
        # u3: NULL value is "no observation" — fill skips it
        (3, datetime(2024, 1, 1, 0, 0), 30.0),
        (3, datetime(2024, 1, 1, 7, 0), None),
    ]
    df = spark.createDataFrame(
        [(i, u, ts, v) for i, (u, ts, v) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        (r["user_id"], r["grid_ts"].isoformat()): r["value"]
        for r in analytics.resample_ffill(df, step_hours=6).collect()
    }
    assert got == {
        # u1 grid: 00:00 (before first obs -> NULL fill is impossible;
        # the 00:30 obs hasn't happened yet at the 00:00 instant)
        (1, "2024-01-01T00:00:00"): None,
        (1, "2024-01-01T06:00:00"): 1.0,
        (1, "2024-01-01T12:00:00"): 1.0,
        (2, "2024-01-01T01:00:00"): 11.0,   # duplicate-ts tie: id order
        (2, "2024-01-01T07:00:00"): 11.0,
        (3, "2024-01-01T00:00:00"): 30.0,
        (3, "2024-01-01T06:00:00"): 30.0,
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),      # user
            st.integers(min_value=0, max_value=40),     # hour offset
            st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_resample_ffill_property(spark, raw):
    from datetime import timedelta

    base = datetime(2024, 1, 1)
    rows = [
        (i, u, base + timedelta(hours=h), float(v) if v is not None else None)
        for i, (u, h, v) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r["user_id"], r["grid_ts"]): r["value"]
        for r in analytics.resample_ffill(df, step_hours=6).collect()
    }
    # python model: per user, 6h grid from floor-hour(min) to floor-hour(max);
    # fill = value of the last (ts, event_id)-ordered non-null obs with ts <= g
    exp = {}
    by_user = {}
    for eid, u, ts, v in rows:
        by_user.setdefault(u, []).append((ts, eid, v))
    for u, obs in by_user.items():
        s = min(t for t, _, _ in obs).replace(minute=0, second=0, microsecond=0)
        e = max(t for t, _, _ in obs).replace(minute=0, second=0, microsecond=0)
        g = s
        while g <= e:
            fills = [
                (t, eid, v)
                for t, eid, v in obs
                if t <= g and v is not None
            ]
            exp[(u, g)] = max(fills)[2] if fills else None
            g += timedelta(hours=6)
    assert got == exp


def test_funnel_conversion_window(spark):
    rows = [
        # u1: click 1 day after view (inside 48h), purchase 3 days after
        # the FIRST view (outside) -> depth 2
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(4), "purchase"),
        # u2: everything within 48h of first view -> depth 3
        (2, _ts(1), "view"), (2, _ts(1, 6), "click"), (2, _ts(2), "purchase"),
        # u3: a LATER view would fit, but first-touch anchoring keeps
        # the day-1 anchor -> click on day 9 is outside -> depth 1
        (3, _ts(1), "view"), (3, _ts(8), "view"), (3, _ts(9), "click"),
    ]
    got = {
        r["user_id"]: r["depth"]
        for r in analytics.user_funnel_depth(
            _events(spark, rows),
            steps=["view", "click", "purchase"],
            within_hours=48,
        ).collect()
    }
    assert got == {1: 2, 2: 3, 3: 1}
    # without the window, u1 and u3 convert further
    unwindowed = {
        r["user_id"]: r["depth"]
        for r in analytics.user_funnel_depth(
            _events(spark, rows), steps=["view", "click", "purchase"]
        ).collect()
    }
    assert unwindowed == {1: 3, 2: 3, 3: 2}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=0, max_value=200),       # hour offset
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=72),
)
def test_funnel_windowed_property(spark, raw, win_h):
    from datetime import timedelta

    steps = ["view", "click", "purchase"]
    base = datetime(2024, 1, 1)
    rows = [(u, base + timedelta(hours=h), y) for u, h, y in raw]
    got = {
        r["user_id"]: r["depth"]
        for r in analytics.user_funnel_depth(
            _events(spark, rows), steps=steps, within_hours=win_h
        ).collect()
    }
    # python model: greedy fold with a first-touch-anchored window
    exp = {}
    by_user = {}
    for u, ts, y in rows:
        by_user.setdefault(u, []).append((ts, y))
    for u, evs in by_user.items():
        need, last_t, t0 = 0, None, None
        for t, y in sorted(evs):
            if need >= len(steps) or y != steps[need]:
                continue
            if last_t is not None and t <= last_t:
                continue
            if t0 is not None and t > t0 + timedelta(hours=win_h):
                continue
            need += 1
            last_t = t
            if t0 is None:
                t0 = t
        if need:
            exp[u] = need
    assert got == exp


def test_resample_interpolate_brackets_and_tails(spark):
    rows = [
        # u1: v=0 at 00:00, v=12 at 12:00 -> 06:00 interpolates to 6.0
        (1, datetime(2024, 1, 1, 0, 0), 0.0),
        (1, datetime(2024, 1, 1, 12, 0), 12.0),
        # u2: first obs at 00:30 -> 00:00 grid point is NULL;
        # after the last obs the value holds (ffill tail)
        (2, datetime(2024, 1, 1, 0, 30), 5.0),
        (2, datetime(2024, 1, 1, 3, 0), 10.0),
        (2, datetime(2024, 1, 1, 14, 0), 20.0),
    ]
    df = spark.createDataFrame(
        [(i, u, ts, v) for i, (u, ts, v) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        (r["user_id"], r["grid_ts"].isoformat()): r["value"]
        for r in analytics.resample_interpolate(df, step_hours=6).collect()
    }
    assert got[(1, "2024-01-01T00:00:00")] == 0.0
    assert got[(1, "2024-01-01T06:00:00")] == 6.0
    assert got[(1, "2024-01-01T12:00:00")] == 12.0
    assert got[(2, "2024-01-01T00:00:00")] is None          # before first
    # 06:00 between (03:00, 10) and (14:00, 20): 10 + 10*(3/11)
    assert abs(got[(2, "2024-01-01T06:00:00")] - (10 + 10 * 3 / 11)) < 1e-5
    assert got[(2, "2024-01-01T12:00:00")] == round(10 + 10 * 9 / 11, 6)


def test_resample_ffill_string_ids(spark):
    """r6 review: the tie-break cast to long crashed ANSI mode for
    non-numeric ids; try_cast + hash fallback keeps the order total
    (and identical to before for numeric ids)."""
    rows = [
        ("u", datetime(2024, 1, 1, 0, 30), 1.0, "id-a"),
        ("u", datetime(2024, 1, 1, 0, 30), 2.0, "id-b"),  # duplicate ts
        ("u", datetime(2024, 1, 1, 6, 10), 5.0, "id-c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, value double, event_id string"
    )
    out = analytics.resample_ffill(
        df, key_col="user_id", ts_col="ts", value_col="value",
        id_col="event_id", step_hours=6,
    )
    got = {str(r["grid_ts"]): r["value"] for r in out.collect()}
    assert len(got) == 2
    # deterministic: repeated runs agree
    again = {
        str(r["grid_ts"]): r["value"]
        for r in analytics.resample_ffill(
            df, key_col="user_id", ts_col="ts", value_col="value",
            id_col="event_id", step_hours=6,
        ).collect()
    }
    assert got == again
