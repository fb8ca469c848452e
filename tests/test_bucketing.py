"""Co-located bucketed joins: the join/aggregate on the bucket key must
plan with NO shuffle exchange, and results must equal the plain join."""

import pytest

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import bucketing as B

from tdata import sf_dir

SF_DIR = sf_dir("0.001")


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS buck LOCATION '{warehouse}'"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    B.write_bucketed(orders, "buck.orders_b", buckets=8, key="o_orderkey")
    B.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "buck.lineitem_b",
        buckets=8,
        key="o_orderkey",
    )
    yield "buck.orders_b", "buck.lineitem_b"
    spark.sql("DROP DATABASE IF EXISTS buck CASCADE")


def test_cobucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # Force the sort-merge path so absence of exchanges is attributable
    # to co-location, not to a broadcast.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = B.bucketed_join(spark, ot, lt, "o_orderkey")
        assert not B.has_shuffle(joined)
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join over raw parquet shuffles both sides."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        joined = o.join(l, o["o_orderkey"] == l["l_orderkey"])
        assert B.has_shuffle(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    ot, lt = bucketed_tables
    bucketed = (
        B.bucketed_join(spark, ot, lt, "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {tuple(r) for r in bucketed.collect()} == {
        tuple(r) for r in plain.collect()
    }


def test_bucket_key_aggregation_has_no_shuffle(spark, bucketed_tables):
    """Aggregation keyed by the bucket column also avoids the exchange."""
    _, lt = bucketed_tables
    agg = (
        spark.table(lt)
        .groupBy("o_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"))
    )
    assert not B.has_shuffle(agg)
    assert agg.count() > 0
