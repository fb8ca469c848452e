"""Multimodal plumbing: mapInPandas schemas, error channels, and the
frame-sampling fan-out are real; decode kernels are deterministic stubs
(the container ships no media libraries)."""

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import multimodal as M


def test_image_features_schema_and_error_channel(spark):
    assets = M.synthetic_assets(spark, n=16)
    feats = M.extract_image_features(assets)
    assert feats.schema == M.IMAGE_FEATURES_SCHEMA
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert len(rows) == 16
    # ids 5 and 10 and 15 have empty payloads -> corrupt-row channel
    corrupt = {i for i, r in rows.items() if r["content_sha256"] is None}
    assert corrupt == {5, 10, 15}
    ok = rows[1]
    assert ok["n_bytes"] == 128 and len(ok["feature"]) == 8
    assert 64 <= ok["resized_width"] <= 224


def test_image_features_deterministic(spark):
    assets = M.synthetic_assets(spark, n=8)
    a = {r["asset_id"]: r["content_sha256"] for r in M.extract_image_features(assets).collect()}
    b = {r["asset_id"]: r["content_sha256"] for r in M.extract_image_features(assets).collect()}
    assert a == b


def test_audio_features(spark):
    assets = M.synthetic_assets(spark, n=16)
    audio = M.extract_audio_features(assets.filter(F.col("media_type") == "audio"))
    rows = {r["asset_id"]: r for r in audio.collect()}
    assert all(r["resampled_rate"] == 16_000 for r in rows.values() if r["n_bytes"])
    good = [r for r in rows.values() if r["n_bytes"] is not None]
    assert good and all(r["n_windows"] >= 1 and len(r["feature"]) == 8 for r in good)


def test_frame_sample_plan_fanout(spark):
    assets = M.synthetic_assets(spark, n=16)
    frames = M.frame_sample_plan(assets, every_ms=1000)
    per_asset = (
        frames.groupBy("asset_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    # every video asset is 3000 ms -> frames at 0/1000/2000 ms
    assert per_asset and all(r["n"] == 3 for r in per_asset)
    ts = {r["frame_ts_ms"] for r in frames.collect()}
    assert ts == {0, 1000, 2000}
