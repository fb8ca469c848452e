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


def test_kmv_distinct_estimate_accuracy(spark):
    import math

    n = 5000
    df = spark.createDataFrame(
        [(f"v{i}",) for i in range(n)] * 2, "x string"  # duplicates collapse
    )
    k = 256
    sk = sketches.kmv_table(df, "x", k=k)
    assert sk.count() == k
    est = sketches.kmv_estimate(sk, k=k).collect()[0]["est_distinct"]
    assert abs(est - n) / n < 4 / math.sqrt(k), est

    # under-full sketch: exact
    small = spark.createDataFrame([(f"s{i}",) for i in range(37)], "x string")
    sk2 = sketches.kmv_table(small, "x", k=k)
    assert sketches.kmv_estimate(sk2, k=k).collect()[0]["est_distinct"] == 37.0


def test_kmv_grouped_and_union_consistency(spark):
    rows = [(d, f"u{i % (200 * (d + 1))}") for d in range(3) for i in range(2000)]
    df = spark.createDataFrame(rows, "day int, user string")
    k = 128
    daily = sketches.kmv_table(df, "user", k=k, group_cols=("day",))
    # union of daily sketches == sketch of the whole frame
    parts = [
        daily.filter(F.col("day") == d).select("h", "rn") for d in range(3)
    ]
    u = sketches.kmv_union(*parts, k=k)
    direct = sketches.kmv_table(df, "user", k=k)
    assert [r["h"] for r in u.orderBy("rn").collect()] == [
        r["h"] for r in direct.orderBy("rn").collect()
    ]


def test_kmv_intersection_estimate(spark):
    import math

    # A = 0..2999, B = 1500..4499 → |A∩B| = 1500, |A∪B| = 4500
    a_df = spark.createDataFrame([(f"v{i}",) for i in range(3000)], "x string")
    b_df = spark.createDataFrame(
        [(f"v{i}",) for i in range(1500, 4500)], "x string"
    )
    k = 256
    a = sketches.kmv_table(a_df, "x", k=k)
    b = sketches.kmv_table(b_df, "x", k=k)
    r = sketches.kmv_intersect_estimate(a, b, k=k).collect()[0]
    tol = 6 / math.sqrt(k)
    assert abs(r["est_union"] - 4500) / 4500 < tol, r
    assert abs(r["est_intersection"] - 1500) / 1500 < 2 * tol, r
    assert abs(r["est_jaccard"] - 1500 / 4500) < 0.12, r

    # disjoint sets → zero intersection
    c_df = spark.createDataFrame([(f"w{i}",) for i in range(3000)], "x string")
    c = sketches.kmv_table(c_df, "x", k=k)
    r2 = sketches.kmv_intersect_estimate(a, c, k=k).collect()[0]
    assert r2["est_intersection"] == 0.0

    # small exact mode: everything fits, numbers are exact
    sa = sketches.kmv_table(
        spark.createDataFrame([(f"e{i}",) for i in range(40)], "x string"),
        "x", k=k,
    )
    sb = sketches.kmv_table(
        spark.createDataFrame([(f"e{i}",) for i in range(20, 60)], "x string"),
        "x", k=k,
    )
    r3 = sketches.kmv_intersect_estimate(sa, sb, k=k).collect()[0]
    assert r3["est_intersection"] == 20.0 and r3["est_union"] == 60.0


def test_sketch_properties_random_multisets(spark):
    """Universal guarantees on random inputs: CMS never undercounts
    any value; KMV is exact whenever distinct cardinality <= k."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(40)]),
            min_size=1,
            max_size=300,
        )
    )
    def check(values):
        from collections import Counter

        df = spark.createDataFrame([(v,) for v in values], "x string")
        exact = Counter(values)
        cms = sketches.cms_table(df, "x", width=64, depth=4)
        est = {
            r["x"]: r["est_count"]
            for r in sketches.cms_estimate(
                cms, df.select("x"), "x", width=64, depth=4
            ).collect()
        }
        for v, c in exact.items():
            assert est[v] >= c, (v, est[v], c)

        k = 64
        sk = sketches.kmv_table(df, "x", k=k)
        got = sketches.kmv_estimate(sk, k=k).collect()[0]["est_distinct"]
        if len(exact) <= k:
            assert got == float(len(exact))

    check()


def test_quantile_sketch_merge_equals_direct_build(spark):
    """Sketch(batch1 ∪ batch2) == merge(sketch(batch1), sketch(batch2))
    — the mergeability law that lets per-batch stores serve ranges."""
    from sample_dms_s3_kinesis_spark.operators.sketches import (
        quantile_merge,
        quantile_sketch,
    )

    rows = [(i, float((i * 37) % 1000)) for i in range(1, 1201)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    b1, b2 = df.filter("event_id <= 600"), df.filter("event_id > 600")
    direct = quantile_sketch(df, "value", id_col="event_id", k=64)
    merged = quantile_merge(
        quantile_sketch(b1, "value", id_col="event_id", k=64),
        quantile_sketch(b2, "value", id_col="event_id", k=64),
        k=64,
    )
    key = lambda f: sorted((r["r"], r["v"]) for r in f.collect())
    assert key(direct) == key(merged)
    assert direct.count() == 64


def test_quantile_estimate_tracks_exact_quantiles(spark):
    """Uniform-sample rank error: with k=256 over 4000 rows the
    estimated quantile's TRUE rank must be within ~4/sqrt(k) of q."""
    from sample_dms_s3_kinesis_spark.operators.sketches import (
        quantile_estimate,
        quantile_sketch,
    )

    n, k = 4000, 256
    rows = [(i, float((i * 997) % n)) for i in range(1, n + 1)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    sk = quantile_sketch(df, "value", id_col="event_id", k=k)
    ests = {
        r["q"]: r["est"]
        for r in quantile_estimate(sk, qs=(0.25, 0.5, 0.9)).collect()
    }
    values = sorted(v for _, v in rows)
    import bisect

    for q, est in ests.items():
        true_rank = bisect.bisect_right(values, est) / n
        assert abs(true_rank - q) < 4 / (k ** 0.5), (q, est, true_rank)


def test_quantile_sketch_excludes_nulls_and_validates_family(spark):
    import pytest as _pytest

    from sample_dms_s3_kinesis_spark.operators.sketches import (
        quantile_sketch,
    )

    df = spark.createDataFrame(
        [(1, None), (2, 5.0)], "event_id long, value double"
    )
    out = quantile_sketch(df, "value", id_col="event_id", k=8).collect()
    assert [r["v"] for r in out] == [5.0]
    with _pytest.raises(ValueError, match="hash_family"):
        quantile_sketch(
            df, "value", id_col="event_id", k=8, hash_family="crc32"
        )


def test_quantile_sketch_excludes_null_ids(spark):
    from sample_dms_s3_kinesis_spark.operators.sketches import (
        quantile_sketch,
    )

    rows = [(None, 0.0)] * 10 + [(1, 5.0), (2, 6.0)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    for fam in ("xxhash64", "md5"):
        vs = sorted(
            r["v"]
            for r in quantile_sketch(
                df, "value", id_col="event_id", k=8, hash_family=fam
            ).collect()
        )
        assert vs == [5.0, 6.0], fam


# ------------------------------------------------------------- bloom

def _keyed(spark):
    fact = spark.createDataFrame(
        [(i, f"k{i % 50}") for i in range(2000)] + [(9999, None)],
        "row_id int, key string",
    )
    dim = spark.createDataFrame(
        [(f"k{v}",) for v in range(0, 50, 3)] + [(None,)], "key string"
    )
    return fact, dim


def test_bloom_no_false_negatives_and_exact_semijoin(spark):
    fact, dim = _keyed(spark)
    probed = sketches.bloom_probe(
        fact, "key", sketches.bloom_table(dim, "key"), out_col="maybe"
    )
    members = {f"k{v}" for v in range(0, 50, 3)}
    for r in probed.collect():
        if r["key"] in members:
            assert r["maybe"]  # a Bloom filter never false-negatives
        if r["key"] is None:
            assert not r["maybe"]
    got = sketches.bloom_semijoin(fact, "key", dim)
    exp = fact.join(dim.filter(F.col("key").isNotNull()), "key", "left_semi")
    assert sorted(r["row_id"] for r in got.collect()) == sorted(
        r["row_id"] for r in exp.collect()
    )


def test_bloom_tiny_filter_has_false_positives_never_negatives(spark):
    # 64-bit filter saturates: everything passes, nothing is missed —
    # the exact-verify tail still makes the semijoin exact
    fact, dim = _keyed(spark)
    got = sketches.bloom_semijoin(fact, "key", dim, n_bits=64, k=2)
    exp = fact.join(dim.filter(F.col("key").isNotNull()), "key", "left_semi")
    assert sorted(r["row_id"] for r in got.collect()) == sorted(
        r["row_id"] for r in exp.collect()
    )


def test_bloom_merge_equals_union_build(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(200)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(200)], "key string")
    merged = {
        (r["word_idx"], r["bits"])
        for r in sketches.bloom_merge(
            sketches.bloom_table(a, "key"), sketches.bloom_table(b, "key")
        ).collect()
    }
    direct = {
        (r["word_idx"], r["bits"])
        for r in sketches.bloom_table(a.unionByName(b), "key").collect()
    }
    assert merged == direct


def test_bloom_probe_is_shuffle_free(spark):
    from sample_dms_s3_kinesis_spark.operators.bucketing import has_shuffle

    fact, dim = _keyed(spark)
    # materialize the (tiny) word table so the plan under test is the
    # probe alone — in a composed plan the build's own 16Ki-row groupBy
    # is the only exchange, on the broadcast side, never on the fact side
    bloom = spark.createDataFrame(
        sketches.bloom_table(dim, "key").collect(), "word_idx int, bits long"
    )
    probed = sketches.bloom_probe(fact, "key", bloom)
    # k broadcast joins, no exchange on the fact side
    assert not has_shuffle(probed)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bloom_fpp_report_counts_consistent(spark):
    fact, dim = _keyed(spark)
    r = sketches.bloom_fpp_report(fact, "key", dim, n_bits=256, k=3).collect()[0]
    # 2000 non-null probes; 17 member keys * 40 rows each = 680 members
    assert r["n_probed"] == 2000
    assert r["n_members"] == 680
    assert r["n_passed"] >= r["n_members"]  # no false negatives
    assert r["n_false_pos"] == r["n_passed"] - r["n_members"]
    assert 0.0 <= r["measured_fpp"] <= 1.0
    assert 0.0 < r["theoretical_fpp"] < 1.0
    # a roomy filter has (near-)zero false positives on this key space
    r2 = sketches.bloom_fpp_report(fact, "key", dim).collect()[0]
    assert r2["n_false_pos"] == 0


def test_md5_families_preserve_sketch_semantics(spark):
    # the md5 (oracle-replicable) hash family must satisfy the same
    # guarantees as xxhash64: CMS never undercounts, KMV tracks the
    # exact distinct count, Bloom never false-negatives
    df = _events(spark)
    exact = {
        r["user"]: r["c"]
        for r in df.groupBy("user").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    cms = sketches.cms_table(df, "user", width=256, depth=5, hash_family="md5")
    est = {
        r["user"]: r["est_count"]
        for r in sketches.cms_estimate(
            cms, df.select("user"), "user", width=256, depth=5,
            hash_family="md5",
        ).collect()
    }
    assert set(est) == set(exact)
    assert all(est[u] >= exact[u] for u in exact)

    kmv = sketches.kmv_table(df, "user", k=64, hash_family="md5")
    n_true = len(exact)
    est_d = sketches.kmv_estimate(kmv, k=64).collect()[0]["est_distinct"]
    if n_true < 64:
        assert est_d == float(n_true)  # exact mode
    else:
        assert abs(est_d - n_true) / n_true < 0.5

    fact, dim = _keyed(spark)
    semij = sketches.bloom_semijoin(
        fact, "key", dim, n_bits=256, k=3, hash_family="md5"
    )
    expected = fact.join(dim.distinct(), "key", "left_semi")
    assert sorted(map(tuple, semij.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_bloom_probe_survives_reserved_caller_columns(spark):
    # regression: caller columns named like the old internal `_bw0` /
    # `_bb0` join columns were overwritten then silently dropped
    fact, dim = _keyed(spark)
    fact2 = fact.withColumn("_bw0", F.lit("keepme")).withColumn(
        "_bb1", F.lit(7)
    )
    bloom = sketches.bloom_table(dim, "key")
    probed = sketches.bloom_probe(fact2, "key", bloom)
    assert "_bw0" in probed.columns and "_bb1" in probed.columns
    row = probed.limit(1).collect()[0]
    assert row["_bw0"] == "keepme" and row["_bb1"] == 7
