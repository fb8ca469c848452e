"""Skew operators: exact equivalence with the naive formulations on a
deliberately skewed dataset (90% of rows share one key)."""

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import skew
from sample_dms_s3_kinesis_spark.plans.registry import t

from tdata import sf_dir

SF_DIR = sf_dir("0.001")


def _skewed_events(spark):
    """events with user_id collapsed so one key dominates."""
    ev = t(spark, SF_DIR, "events").select("event_id", "user_id", "event_type")
    return ev.withColumn(
        "user_id",
        F.when(F.col("user_id") % 10 != 0, F.lit(7)).otherwise(F.col("user_id")),
    )


def test_salted_inner_join_matches_plain(spark):
    big = _skewed_events(spark)
    small = (
        t(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .withColumn("user_tag", F.concat(F.lit("u"), F.col("user_id")))
    )
    plain = {
        tuple(r)
        for r in big.join(small, "user_id").select(
            "event_id", "user_id", "user_tag"
        ).collect()
    }
    salted = {
        tuple(r)
        for r in skew.salted_join(big, small, "user_id", salt=8)
        .select("event_id", "user_id", "user_tag")
        .collect()
    }
    assert salted == plain and len(salted) > 0


def test_salted_left_join_keeps_unmatched(spark):
    big = _skewed_events(spark)
    small = spark.createDataFrame([(7, "hot")], ["user_id", "tag"])
    out = skew.salted_join(big, small, "user_id", salt=4, how="left")
    plain = big.join(small, "user_id", "left")
    assert out.count() == plain.count()
    assert (
        out.filter(F.col("tag").isNull()).count()
        == plain.filter(F.col("tag").isNull()).count()
        > 0
    )


def test_two_phase_distinct_count_matches_count_distinct(spark):
    ev = _skewed_events(spark)
    expected = {
        (r["user_id"], r["n_distinct"])
        for r in ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n_distinct"))
        .collect()
    }
    got = {
        (r["user_id"], r["n_distinct"])
        for r in skew.two_phase_distinct_count(ev, "user_id", "event_type").collect()
    }
    assert got == expected and len(got) > 0


def test_two_phase_distinct_null_values_match_count_distinct(spark):
    """r6 review: NULL must count as 0 distinct values, matching
    COUNT(DISTINCT v); an all-NULL key still emits a row (GROUP BY
    semantics)."""
    from sample_dms_s3_kinesis_spark.operators.skew import (
        two_phase_distinct_count,
    )

    df = spark.createDataFrame(
        [("k1", None), ("k1", "a"), ("k2", None), ("k2", None)],
        "k string, v string",
    )
    got = {
        r["k"]: r["n_distinct"]
        for r in two_phase_distinct_count(df, "k", "v").collect()
    }
    ref = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert got == ref == {"k1": 1, "k2": 0}


def test_salted_join_rejects_zero_salt(spark):
    import pytest

    from sample_dms_s3_kinesis_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "x")], "k long, a string")
    small = spark.createDataFrame([(1, "y")], "k long, b string")
    with pytest.raises(ValueError, match="salt must be >= 1"):
        salted_join(big, small, "k", salt=0)
