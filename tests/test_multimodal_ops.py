"""Multimodal pipeline: the PPM/WAV decode kernels are REAL (pure
numpy), the mapInPandas plumbing and error channels are exercised
end-to-end, and unsupported codecs route to the null-feature channel.
"""

import numpy as np
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import multimodal as M


def test_ppm_decode_resize_roundtrip():
    raw = M._ppm_bytes(3, w=48, h=36)
    img = M.decode_image(raw)
    assert img.shape == (36, 48, 3)
    # decode is exact: regenerate the gradient and compare
    y, x = np.mgrid[0:36, 0:48]
    assert (img[..., 0] == (x * 31 + 3 * 13) % 256).all()
    small = M.resize_image(img, (24, 24))
    # aspect preserved, never upscaled: 48x36 -> 24x18
    assert (small.shape[1], small.shape[0]) == (24, 18)
    big = M.resize_image(img, (1000, 1000))
    assert big.shape == img.shape  # no upscale


def test_wav_decode_and_resample():
    raw = M._wav_bytes(1, rate=8_000, ms=200)
    rate, samples = M.decode_wav(raw)
    assert rate == 8_000 and len(samples) == 1_600
    assert float(np.abs(samples).max()) <= 0.5 + 1e-6
    res = M.resample_linear(samples, rate, 16_000)
    assert abs(len(res) - 3_200) <= 1
    # energy is preserved through linear resampling of a sine
    assert abs(np.sqrt((res**2).mean()) - np.sqrt((samples**2).mean())) < 0.01


def test_image_features_schema_and_error_channel(spark):
    assets = M.synthetic_assets(spark, n=16).filter(
        F.col("media_type") == "image"
    )
    feats = M.extract_image_features(assets)
    assert feats.schema == M.IMAGE_FEATURES_SCHEMA
    rows = {r["asset_id"]: r for r in feats.collect()}
    # image ids are 0,3,6,9,12,15; id 15 has empty content -> corrupt
    assert set(rows) == {0, 3, 6, 9, 12, 15}
    corrupt = {i for i, r in rows.items() if r["content_sha256"] is None}
    assert corrupt == {15}
    # id 6 carries a PPM payload, id 3 a baseline-JPEG one (the table
    # alternates so both decode kernels are exercised)
    ok = rows[6]
    assert ok["n_bytes"] == len(M._ppm_bytes(6))
    assert len(ok["feature"]) == 8
    # 48x36 source is below the 224 target: no upscale
    assert (ok["resized_width"], ok["resized_height"]) == (48, 36)
    jp = rows[3]
    assert jp["content_sha256"] is not None
    assert len(jp["feature"]) == 8
    assert (jp["resized_width"], jp["resized_height"]) == (48, 36)


def test_unsupported_codec_routes_to_error_channel(spark):
    """WAV bytes through the image extractor = unsupported codec ->
    null features, job survives (NotImplementedError is disclosed)."""
    assets = M.synthetic_assets(spark, n=16).filter(
        F.col("media_type") == "audio"
    )
    rows = M.extract_image_features(assets).collect()
    assert rows and all(r["content_sha256"] is None for r in rows)


def test_image_features_deterministic(spark):
    assets = M.synthetic_assets(spark, n=9).filter(
        F.col("media_type") == "image"
    )
    a = {r["asset_id"]: r["feature"] for r in M.extract_image_features(assets).collect()}
    b = {r["asset_id"]: r["feature"] for r in M.extract_image_features(assets).collect()}
    assert a == b


def test_audio_features(spark):
    assets = M.synthetic_assets(spark, n=16)
    audio = M.extract_audio_features(assets.filter(F.col("media_type") == "audio"))
    rows = {r["asset_id"]: r for r in audio.collect()}
    # audio ids are 1,4,7,10,13; id 10 has empty content -> corrupt
    assert set(rows) == {1, 4, 7, 10, 13}
    assert rows[10]["feature"] is None
    good = [r for i, r in rows.items() if i != 10]
    assert all(r["resampled_rate"] == 16_000 for r in good)
    # 200 ms at 16 kHz / 25 ms windows = 8 real windows
    assert all(r["n_windows"] == 8 for r in good)
    assert all(len(r["feature"]) == 8 for r in good)
    # a constant-amplitude sine has flat per-segment RMS ~ 0.5/sqrt(2)
    f = good[0]["feature"]
    assert all(abs(v - 0.3535) < 0.02 for v in f)


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


# -------------------------------------------------- perceptual hashing

def test_average_hash_stable_under_resize_and_noise(spark):
    import numpy as np

    from sample_dms_s3_kinesis_spark.operators.multimodal import (
        average_hash,
        decode_image,
        resize_image,
        _ppm_bytes,
    )

    # structured (low-frequency) content: a two-axis gradient — the
    # case perceptual hashing is FOR; pure-noise images (the synthetic
    # PPMs) have no structure for any resolution-robust hash to keep.
    yy, xx = np.mgrid[0:64, 0:96]
    img = np.stack(
        [
            (xx * 255 / 95),
            (yy * 255 / 63),
            ((xx + yy) * 255 / 158),
        ],
        axis=-1,
    ).astype(np.uint8)
    h0 = average_hash(img)
    # resize: same perceptual content, identical or near-identical hash
    h_small = average_hash(resize_image(img, (24, 24)))
    assert bin((h0 ^ h_small) & (2**64 - 1)).count("1") <= 6
    # mild noise: few bits flip
    noisy = np.clip(
        img.astype(np.int16) + ((np.indices(img.shape).sum(axis=0) % 3) - 1),
        0, 255,
    ).astype(np.uint8)
    assert bin((h0 ^ average_hash(noisy)) & (2**64 - 1)).count("1") <= 6
    # different random images are far apart
    a = average_hash(decode_image(_ppm_bytes(7)))
    b = average_hash(decode_image(_ppm_bytes(23)))
    assert bin((a ^ b) & (2**64 - 1)).count("1") > 6


def test_image_near_dup_pairs_matches_reference(spark):
    from sample_dms_s3_kinesis_spark.operators.multimodal import (
        ASSET_SCHEMA,
        average_hash,
        decode_image,
        image_near_dup_pairs,
        _ppm_bytes,
    )

    # ids 0/100 share payload 3 (exact dup), 1/101 share payload 9,
    # 2 is unique, 3 is corrupt (undecodable → never pairs)
    payloads = {0: _ppm_bytes(3), 100: _ppm_bytes(3), 1: _ppm_bytes(9),
                101: _ppm_bytes(9), 2: _ppm_bytes(40), 3: b"JUNK"}
    rows = [
        (i, "image", bytearray(p), 48, 36, None, None)
        for i, p in payloads.items()
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_dup_pairs(df, max_hamming=3).collect()
    }
    # python reference
    hashes = {}
    for i, p in payloads.items():
        try:
            hashes[i] = average_hash(decode_image(bytes(p)))
        except Exception:
            pass
    exp = set()
    ids = sorted(hashes)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            d = bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
            if d <= 3:
                exp.add((a, b, d))
    assert got == exp
    assert (0, 100, 0) in got and (1, 101, 0) in got
    assert all(3 not in (a, b) for a, b, _ in got)


def test_audio_hash_gain_invariant_and_discriminative(spark):
    import numpy as np

    from sample_dms_s3_kinesis_spark.operators.multimodal import (
        audio_hash,
        decode_wav,
        resample_linear,
        _wav_bytes,
    )

    _, s = decode_wav(_wav_bytes(4))
    h0 = audio_hash(s)
    # gain change: identical fingerprint (RMS and median scale together)
    assert audio_hash(s * 0.25) == h0
    # resample: small drift only
    rs = resample_linear(s, 8000, 16000)
    assert bin((h0 ^ audio_hash(rs)) & (2**64 - 1)).count("1") <= 6
    # different clip: far away
    _, s2 = decode_wav(_wav_bytes(13))
    assert bin((h0 ^ audio_hash(s2)) & (2**64 - 1)).count("1") > 6


def test_audio_near_dup_pairs_matches_reference(spark):
    from sample_dms_s3_kinesis_spark.operators.multimodal import (
        ASSET_SCHEMA,
        audio_hash,
        audio_near_dup_pairs,
        decode_wav,
        _wav_bytes,
    )

    payloads = {0: _wav_bytes(4), 100: _wav_bytes(4), 1: _wav_bytes(13),
                2: _wav_bytes(27), 3: b"JUNK"}
    rows = [
        (i, "audio", bytearray(p), None, None, 8000, None)
        for i, p in payloads.items()
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in audio_near_dup_pairs(df, max_hamming=3).collect()
    }
    hashes = {}
    for i, p in payloads.items():
        try:
            hashes[i] = audio_hash(decode_wav(bytes(p))[1])
        except Exception:
            pass
    exp = set()
    ids = sorted(hashes)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            d = bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
            if d <= 3:
                exp.add((a, b, d))
    assert got == exp and (0, 100, 0) in got
