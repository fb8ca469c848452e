"""Pure-numpy baseline JPEG codec: roundtrip accuracy bounds,
subsampling/restart/grayscale coverage, unsupported-variant rejection,
and the multimodal integration (a JPEG asset row flows through the
mapInPandas feature pipeline next to PPM rows)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import multimodal
from sample_dms_s3_kinesis_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=2,
    ).astype(np.uint8)


def test_roundtrip_accuracy_and_determinism():
    img = _gradient(36, 48)
    for subsample in (False, True):
        for ri in (0, 1, 3):
            data = encode_jpeg(img, subsample=subsample, restart_interval=ri)
            out = decode_jpeg(data)
            assert out.shape == img.shape
            err = np.abs(out.astype(float) - img.astype(float)).max()
            # smooth content: tight bound; chroma subsampling doubles it
            assert err <= (16 if subsample else 8), (subsample, ri, err)
    assert encode_jpeg(img) == encode_jpeg(img)  # byte-deterministic


def test_roundtrip_random_sizes_including_non_multiple_of_mcu():
    rng = np.random.default_rng(42)
    for _ in range(6):
        h = int(rng.integers(3, 40))
        w = int(rng.integers(3, 40))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for subsample in (False, True):
            out = decode_jpeg(encode_jpeg(img, subsample=subsample))
            assert out.shape == (h, w, 3)
            # noise quantizes hard; the DC term still pins the mean
            err = np.abs(
                out.astype(float).mean() - img.astype(float).mean()
            )
            assert err < 16, err


def test_grayscale_single_component():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(g))
    assert out.shape == (9, 11, 3)
    assert (out[..., 0] == out[..., 1]).all()
    assert np.abs(out[..., 0].astype(float) - g.astype(float)).max() <= 32


def test_unsupported_variants_raise_not_implemented():
    import struct

    prog = (
        b"\xff\xd8"
        + struct.pack(">BBH", 0xFF, 0xC2, 8)
        + b"\x08\x00\x08\x00\x08\x01"
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="0xFFC2"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_multimodal_pipeline_exercises_jpeg_rows(spark):
    assets = multimodal.synthetic_assets(spark, n=64)
    # the asset table must actually contain both payload kinds
    kinds = (
        assets.filter(
            (F.col("media_type") == "image") & (F.length("content") > 0)
        )
        .select(
            F.when(
                F.substring(F.col("content").cast("binary"), 1, 2)
                == bytes(b"\xff\xd8"),
                "jpeg",
            )
            .otherwise("ppm")
            .alias("kind")
        )
        .groupBy("kind")
        .count()
        .collect()
    )
    counts = {r["kind"]: r["count"] for r in kinds}
    assert counts.get("jpeg", 0) >= 5 and counts.get("ppm", 0) >= 5, counts

    out = multimodal.extract_image_features(
        assets.filter(F.col("media_type") == "image")
    ).collect()
    decoded = [r for r in out if r["feature"] is not None]
    failed = [r for r in out if r["feature"] is None]
    # every non-empty payload decodes (PPM and JPEG alike); empties fail
    n_nonempty = assets.filter(
        (F.col("media_type") == "image") & (F.length("content") > 0)
    ).count()
    assert len(decoded) == n_nonempty
    assert all(len(r["feature"]) == 8 for r in decoded)
    assert failed, "empty-content rows should hit the error channel"

def test_encode_high_quality_scale_clamps_dqt():
    """quality_scale >= 4 pushes chroma quant values past 255; the
    8-bit DQT write must clamp, not crash."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    data = encode_jpeg(img, quality_scale=6)
    out = decode_jpeg(data)
    assert out.shape == (24, 32, 3)  # coarser, but decodable


def test_non_divisor_sampling_factors_raise_not_implemented():
    """A spec-valid SOF with factors (3,1)/(2,1)/(1,1) needs fractional
    resampling; the decoder must raise a clean NotImplementedError at
    parse time (callers route it to the null-feature channel)."""
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    # patch the SOF0 component (h,v) nibbles: find marker 0xFFC0
    sof = data.index(b"\xff\xc0")
    comp0 = sof + 4 + 6  # marker(2) + len(2) + prec(1) + H(2) + W(2) + ncomp(1)
    data[comp0 + 1] = 0x31  # Y: (3,1)
    data[comp0 + 4] = 0x21  # Cb: (2,1)
    data[comp0 + 7] = 0x11  # Cr: (1,1)
    with pytest.raises(NotImplementedError, match="non-divisor"):
        decode_jpeg(bytes(data))
