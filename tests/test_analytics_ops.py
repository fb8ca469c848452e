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
