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


# ------------------------------------------------------------ video

def test_fvid_roundtrip_and_frame_seek():
    raw = M._fvid_bytes(2, w=32, h=24, fps=10, n=30)
    hdr = M.decode_video_header(raw)
    assert hdr == {"width": 32, "height": 24, "fps": 10, "n_frames": 30,
                   "duration_ms": 3000}
    # O(1) frame seek returns exactly the frame that was packed
    y, x = np.mgrid[0:24, 0:32]
    env = 90.0 * np.sin(2 * np.pi * 7 / 30 + 0.7 * 2)
    f7 = M.decode_video_frame(raw, 7)
    exp_r = np.clip((x * 23 + 7 * 9 + 2 * 13) % 128 + env + 64, 0, 255)
    exp_g = np.clip((y * 11 + 7 * 5 + 2 * 7) % 128 + env + 64, 0, 255)
    assert (f7[..., 0] == exp_r.astype(np.uint8)).all()
    assert (f7[..., 1] == exp_g.astype(np.uint8)).all()
    # non-FVID payloads route to the NotImplementedError channel,
    # truncated FVID is a hard ValueError
    import pytest

    with pytest.raises(NotImplementedError):
        M.decode_video_header(b"\x00\x00\x01\xba mpeg-ps")
    with pytest.raises(ValueError):
        M.decode_video_header(raw[: len(raw) // 2])
    with pytest.raises(ValueError):
        M.decode_video_frame(raw, 30)


def test_sample_frame_indices_schedule():
    # 30 frames @ 10 fps = 3000 ms; 1000 ms cadence -> frames 0/10/20
    assert M.sample_frame_indices(30, 10, 1000) == [0, 10, 20]
    # sub-frame-period cadence never repeats a frame
    idxs = M.sample_frame_indices(5, 1, 200)
    assert idxs == sorted(set(idxs)) and idxs[0] == 0 and max(idxs) <= 4
    # cadence longer than the clip still samples frame 0
    assert M.sample_frame_indices(3, 30, 60_000) == [0]


def test_video_frames_and_error_channel(spark):
    assets = M.synthetic_assets(spark, n=16).filter(
        F.col("media_type") == "video"
    )
    frames = M.extract_video_frames(assets, every_ms=1000)
    assert frames.schema == M.VIDEO_FRAME_SCHEMA
    rows = frames.collect()
    # video ids are 2,5,8,11,14; id 5 has empty content -> one NULL row
    by_id = {}
    for r in rows:
        by_id.setdefault(r["asset_id"], []).append(r)
    assert set(by_id) == {2, 5, 8, 11, 14}
    assert len(by_id[5]) == 1 and by_id[5][0]["frame_idx"] is None
    for i in (2, 8, 11, 14):
        got = sorted((r["frame_idx"], r["frame_ts_ms"]) for r in by_id[i])
        assert got == [(0, 0), (10, 1000), (20, 2000)]
        assert all(len(r["feature"]) == 8 for r in by_id[i])


def test_video_summary_matches_numpy_reference(spark):
    assets = M.synthetic_assets(spark, n=16).filter(
        F.col("media_type") == "video"
    )
    out = {r["asset_id"]: r
           for r in M.extract_video_features(assets, every_ms=1000).collect()}
    assert set(out) == {2, 5, 8, 11, 14}
    # corrupt asset: NULL analysis columns (error channel)
    assert out[5]["n_frames"] is None and out[5]["mean_feature"] is None
    ref_blob = M._fvid_bytes(8)
    feats = []
    lumas = []
    for idx in (0, 10, 20):
        frame = M.decode_video_frame(ref_blob, idx)
        resized = M.resize_image(frame, (224, 224))
        fv = M.image_feature(resized)
        feats.append(fv)
        lumas.append(fv[6])
    r = out[8]
    assert (r["n_frames"], r["fps"], r["duration_ms"], r["n_sampled"]) == (
        30, 10, 3000, 3)
    exp_mean = [round(sum(c) / 3, 6) for c in zip(*feats)]
    assert all(abs(a - b) < 1e-5 for a, b in zip(r["mean_feature"], exp_mean))
    exp_motion = round(
        (abs(lumas[1] - lumas[0]) + abs(lumas[2] - lumas[1])) / 2, 6)
    assert abs(r["motion_score"] - exp_motion) < 1e-6
    # the panning gradient has real motion
    assert r["motion_score"] > 0


def test_video_near_dup_pairs_matches_reference(spark):
    base = M._fvid_bytes(0)
    bright = M._fvid_bytes(0, brightness=2)
    # temporal subsample: every other frame at half the fps — same
    # content timeline, so the duration-fraction fingerprint is stable
    stack = np.stack([M.decode_video_frame(base, k) for k in range(0, 30, 2)])
    slow = M.encode_fvid(stack, 5)
    rng = np.random.RandomState(7)
    noise = M.encode_fvid(
        rng.randint(0, 256, (30, 24, 32, 3)).astype(np.uint8), 10)
    payloads = {0: base, 1: bright, 2: slow, 3: noise, 4: b""}
    rows = [(i, "video", bytearray(p), None, None, None, None)
            for i, p in payloads.items()]
    df = spark.createDataFrame(rows, M.ASSET_SCHEMA)
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in M.video_near_dup_pairs(df, max_hamming=3).collect()}
    hashes = {}
    for i, p in payloads.items():
        try:
            hashes[i] = M.video_hash(bytes(p))
        except Exception:
            pass
    exp = set()
    ids = sorted(hashes)
    for xi, a in enumerate(ids):
        for b in ids[xi + 1:]:
            d = bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
            if d <= 3:
                exp.add((a, b, d))
    assert got == exp
    assert any(p[:2] == (0, 1) for p in got)  # brightness variant pairs
    assert any(p[:2] == (0, 2) for p in got)  # fps-resampled copy pairs
    assert not any(3 in p[:2] for p in got)   # unrelated noise never pairs
    assert not any(4 in p[:2] for p in got)   # corrupt never pairs


def test_video_motion_deterministic_at_high_fps(spark):
    # fps > 1000 collides frame_ts_ms (idx*1000//fps): at 1500 fps the
    # sampled frames 0 and 1 both land on ts 0, so the motion window
    # must tiebreak on frame_idx or the lag order is nondeterministic
    raw = M._fvid_bytes(3, w=16, h=12, fps=1500, n=5)
    df = spark.createDataFrame(
        [(0, "video", bytearray(raw), None, None, None, 3)], M.ASSET_SCHEMA
    )
    frames = M.extract_video_frames(df, every_ms=1)
    rows = sorted(
        (r["frame_idx"], r["frame_ts_ms"], r["feature"][6])
        for r in frames.collect()
    )
    assert [(i, t) for i, t, _ in rows] == [(0, 0), (1, 0), (3, 2)]
    lumas = [l for _, _, l in rows]
    exp = (abs(lumas[1] - lumas[0]) + abs(lumas[2] - lumas[1])) / 2
    got = M.extract_video_features(df, every_ms=1).collect()[0][
        "motion_score"
    ]
    assert abs(got - exp) < 1e-6
