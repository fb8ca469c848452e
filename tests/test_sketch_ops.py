"""Count-Min sketch tables vs exact counts: never undercounts,
overcount bounded, merge == build-on-union."""

import math

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import sketches


def _events(spark, n=2000):
    # zipf-ish: value v appears roughly n/(v+1) times
    rows = []
    i = 0
    v = 0
    while i < n:
        reps = max(1, n // (8 * (v + 1)))
        for _ in range(min(reps, n - i)):
            rows.append((i % 7, f"u{v}"))
            i += 1
        v += 1
    return spark.createDataFrame(rows, "day int, user string")


def test_cms_never_undercounts_and_bounds_overcount(spark):
    df = _events(spark)
    exact = {
        r["user"]: r["c"]
        for r in df.groupBy("user").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(exact.values())
    width, depth = 256, 5
    cms = sketches.cms_table(df, "user", width=width, depth=depth)
    est = {
        r["user"]: r["est_count"]
        for r in sketches.cms_estimate(
            cms, df.select("user"), "user", width=width, depth=depth
        ).collect()
    }
    assert set(est) == set(exact)
    eps = math.e / width
    for u, c in exact.items():
        assert est[u] >= c, u                      # never undercounts
        assert est[u] <= c + eps * n * 3, u        # 3x slack on the w.h.p. bound
    # the heavy value is estimated exactly or nearly so
    top = max(exact, key=exact.get)
    assert est[top] <= exact[top] + eps * n


def test_cms_merge_equals_build_on_union(spark):
    df = _events(spark)
    width, depth = 128, 4
    daily = sketches.cms_table(
        df, "user", width=width, depth=depth, group_cols=("day",)
    )
    merged = sketches.cms_merge(daily, drop_cols=("day",))
    direct = sketches.cms_table(df, "user", width=width, depth=depth)
    a = {(r["d"], r["b"]): r["cnt"] for r in merged.collect()}
    b = {(r["d"], r["b"]): r["cnt"] for r in direct.collect()}
    assert a == b


def test_cms_absent_probe_estimates_from_collisions_only(spark):
    df = _events(spark, n=400)
    cms = sketches.cms_table(df, "user", width=512, depth=5)
    ghost = spark.createDataFrame([("never-seen",)], "user string")
    est = sketches.cms_estimate(
        cms, ghost, "user", width=512, depth=5
    ).collect()[0]["est_count"]
    assert 0 <= est <= 400  # collision noise only, bounded by N


def test_cms_plan_is_jvm_only_with_partial_agg(spark):
    df = _events(spark, n=300)
    cms = sketches.cms_table(df, "user", width=64, depth=3)
    plan = cms._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan
    est = sketches.cms_estimate(cms, df.select("user"), "user", width=64, depth=3)
    est.collect()  # AQE finalizes the physical plan only after execution
    plan2 = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan2
