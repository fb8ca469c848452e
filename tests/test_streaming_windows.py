"""Event-time streaming operators driven as real streams (file source,
availableNow trigger, memory sink), cross-checked against their batch
twins on the same data — Structured Streaming's unified-API contract."""

import os
import shutil
import tempfile
import uuid

import pytest

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.streaming import windows as W

from tdata import sf_dir

SF_DIR = sf_dir("0.001")


@pytest.fixture(scope="module")
def staged_events(spark):
    """events table re-staged as a parquet directory usable as a
    streaming file source (schema must be supplied explicitly)."""
    tmp = tempfile.mkdtemp(prefix="stream-events-")
    # t() handles the TIMESTAMP(NANOS) parquet ts; the re-staged copy is
    # written back out in microseconds, which the streaming source reads.
    from sample_dms_s3_kinesis_spark.plans.registry import t

    src = t(spark, SF_DIR, "events").filter(F.col("user_id") < 30)
    path = os.path.join(tmp, "events")
    src.write.mode("overwrite").parquet(path)
    yield path, src.schema
    shutil.rmtree(tmp, ignore_errors=True)


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update" if name in ("firstseen", "funnel") else "complete")
        .option("checkpointLocation", f"/tmp/ckpt-{name}-{uuid.uuid4()}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_counts_stream_matches_batch(spark, staged_events):
    path, schema = staged_events
    batch = spark.read.schema(schema).parquet(path)
    stream = spark.readStream.schema(schema).parquet(path)

    expected = {
        tuple(r)
        for r in W.tumbling_counts(batch, watermark="10 years").collect()
    }
    got_df = _run_stream(
        spark, W.tumbling_counts(stream, watermark="10 years"), "tumbling"
    )
    got = {tuple(r) for r in got_df.collect()}
    assert got == expected and len(got) > 0


def test_session_counts_stream_matches_batch(spark, staged_events):
    path, schema = staged_events
    batch = spark.read.schema(schema).parquet(path)
    stream = spark.readStream.schema(schema).parquet(path)

    expected = {
        tuple(r) for r in W.session_counts(batch, watermark="10 years").collect()
    }
    got_df = _run_stream(
        spark, W.session_counts(stream, watermark="10 years"), "sessions"
    )
    got = {tuple(r) for r in got_df.collect()}
    assert got == expected and len(got) > 0


def test_session_counts_matches_window_cumsum_twin(spark, staged_events):
    """session_window grouping must agree with the lag/cumsum batch
    sessionization (same gap): identical (user, n_events) multisets."""
    path, schema = staged_events
    batch = spark.read.schema(schema).parquet(path)

    from collections import Counter

    sw = Counter(
        (r["user_id"], r["n_events"])
        for r in W.session_counts(batch, gap="30 minutes").collect()
    )

    from pyspark.sql import Window as Win

    w = Win.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    marks = batch.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap_us > 1_800_000_000, 1).when(gap_us.isNull(), 1).otherwise(0).alias(
            "new_sess"
        ),
    )
    wsum = Win.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Win.unboundedPreceding, 0
    )
    cumsum = Counter(
        (r["user_id"], r["n_events"])
        for r in marks.select(
            "user_id", F.sum("new_sess").over(wsum).alias("sid")
        )
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert sw == cumsum and len(sw) > 0


def test_streaming_first_seen_state(spark, staged_events):
    """applyInPandasWithState dedup: canonical first id and duplicate
    counts must match a batch groupBy on the same fingerprint."""
    path, schema = staged_events
    batch = spark.read.schema(schema).parquet(path)
    stream = spark.readStream.schema(schema).parquet(path)

    fp = F.col("event_type")  # coarse fingerprint => guaranteed dups
    expected = {
        r["fingerprint"]: (r["first_event_id"], r["n_duplicates"])
        for r in batch.select(fp.alias("fingerprint"), "event_id")
        .groupBy("fingerprint")
        .agg(
            F.min("event_id").alias("first_event_id"),
            (F.count(F.lit(1)) - 1).alias("n_duplicates"),
        )
        .collect()
    }

    dedup_stream = W.streaming_first_seen(
        stream.select(fp.alias("fingerprint"), "event_id")
    )
    got_df = _run_stream(spark, dedup_stream, "firstseen")
    # update-mode memory sink appends one row per key per batch; the
    # last row per key carries the final totals.
    rows = got_df.collect()
    final = {}
    for r in rows:
        final[r["fingerprint"]] = (r["first_event_id"], r["n_duplicates"])
    assert final == expected and len(final) > 0


def test_interval_join_stream_matches_batch(spark, staged_events):
    """Stream-stream interval join (both sides watermarked) equals the
    batch inequality join on the same data."""
    path, schema = staged_events

    def split(df):
        purchases = df.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("click_id")
        )
        return purchases, clicks

    bp, bc = split(spark.read.schema(schema).parquet(path))
    expected = {
        (r["purchase_id"], r["click_id"])
        for r in W.interval_join(
            bp, bc, by="user_id", left_ts="p_ts", right_ts="c_ts",
            lookback="30 minutes", watermark="10 years",
        ).collect()
    }

    sp, sc = split(spark.readStream.schema(schema).parquet(path))
    joined = W.interval_join(
        sp, sc, by="user_id", left_ts="p_ts", right_ts="c_ts",
        lookback="30 minutes", watermark="10 years",
    )
    import uuid as _uuid

    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .option("checkpointLocation", f"/tmp/ckpt-ssjoin-{_uuid.uuid4()}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["purchase_id"], r["click_id"]) for r in spark.table("ssjoin").collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_dedup_one_row_per_key_matches_batch(spark, staged_events):
    path, schema = staged_events
    batch = spark.read.schema(schema).parquet(path)
    stream = spark.readStream.schema(schema).parquet(path)

    expected_keys = {
        (r["user_id"], r["event_type"])
        for r in batch.select("user_id", "event_type").distinct().collect()
    }

    deduped = W.streaming_dedup(
        stream, keys=["user_id", "event_type"], watermark="10 years"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedupstream")
        .outputMode("append")
        .option("checkpointLocation", f"/tmp/ckpt-dedupstream-{uuid.uuid4()}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("dedupstream").select("user_id", "event_type").collect()
    got = [(r["user_id"], r["event_type"]) for r in rows]
    assert len(got) == len(set(got))  # exactly one survivor per key
    assert set(got) == expected_keys

    # batch twin: same keys survive
    batch_out = W.streaming_dedup(batch, keys=["user_id", "event_type"])
    assert {
        (r["user_id"], r["event_type"])
        for r in batch_out.select("user_id", "event_type").collect()
    } == expected_keys


def test_streaming_funnel_matches_batch(spark, staged_events):
    """applyInPandasWithState funnel: final per-user (depth, first,
    last) must equal the batch fold on the same data."""
    from sample_dms_s3_kinesis_spark.operators import analytics

    path, schema = staged_events
    batch = spark.read.schema(schema).parquet(path)
    stream = spark.readStream.schema(schema).parquet(path)
    steps = ["view", "click", "purchase"]

    expected = {
        r["user_id"]: (r["depth"], r["first_micros"], r["last_micros"])
        for r in analytics.user_funnel_depth(batch, steps=steps).collect()
    }

    out = W.streaming_funnel(stream, steps=steps)
    got_df = _run_stream(spark, out, "funnel")
    final = {}
    for r in got_df.collect():  # update mode: last row per user wins
        final[r["user_id"]] = (r["depth"], r["first_micros"], r["last_micros"])
    assert final == expected and len(final) > 0


def test_window_counts_accept_generator_keys(spark):
    """r6 review: a generator `keys` was exhausted by groupBy and the
    key columns silently vanished from the output."""
    from datetime import datetime

    from sample_dms_s3_kinesis_spark.streaming.windows import (
        sliding_counts,
        tumbling_counts,
    )

    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 5), "view", 1.0),
         (datetime(2024, 1, 1, 0, 6), "click", 2.0)],
        "ts timestamp, event_type string, value double",
    )
    out = tumbling_counts(df, keys=(k for k in ["event_type"]))
    assert "event_type" in out.columns
    assert out.count() == 2
    out2 = sliding_counts(df, keys=(k for k in ["event_type"]))
    assert "event_type" in out2.columns
