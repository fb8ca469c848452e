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

    # arithmetic-coded sequential (SOF9) stays on the error channel
    # (progressive SOF2 decodes since r8)
    arith = (
        b"\xff\xd8"
        + struct.pack(">BBH", 0xFF, 0xC9, 8)
        + b"\x08\x00\x08\x00\x08\x01"
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="0xFFC9"):
        decode_jpeg(arith)
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


def _patch_sof_hv(data: bytes, comp_index: int, hv: int) -> bytes:
    buf = bytearray(data)
    sof = buf.index(b"\xff\xc0")
    buf[sof + 4 + 6 + 3 * comp_index + 1] = hv
    return bytes(buf)


def test_grayscale_nonone_sampling_factors_decode_noninterleaved():
    """T.81 A.2.2: an Ns=1 scan ignores SOF sampling factors (MCU =
    one 8x8 block).  'jpegtran -grayscale' keeps (2,2) factors on the
    surviving component; decode must equal the (1,1) stream's."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    data = encode_jpeg(img)  # 2-D input -> grayscale stream
    base = decode_jpeg(data)
    for hv in (0x22, 0x21, 0x12):
        assert np.array_equal(decode_jpeg(_patch_sof_hv(data, 0, hv)), base)


def test_rgb_component_ids_skip_color_matrix():
    """Component ids 'R','G','B' (or Adobe APP14 transform=0) mean the
    planes are stored as RGB — the YCbCr matrix must not run."""
    rng = np.random.default_rng(5)
    # mid-range smooth image: flat 8x8 blocks → quantization error is
    # DC-only and tiny, keeping the plane comparison tight
    blocks = rng.integers(80, 176, size=(3, 5, 3), dtype=np.uint8)
    img = blocks.repeat(8, axis=0).repeat(8, axis=1)
    data = encode_jpeg(img, subsample=False)

    buf = bytearray(data)
    sof = buf.index(b"\xff\xc0")
    sos = buf.index(b"\xff\xda")
    for i, cid in enumerate((0x52, 0x47, 0x42)):  # R, G, B
        buf[sof + 4 + 6 + 3 * i] = cid
        buf[sos + 5 + 2 * i] = cid
    got = decode_jpeg(bytes(buf)).astype(np.float64)

    # expected: the stored planes ARE the encoder's YCbCr of img
    f = img.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
    cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
    want = np.stack([y, cb, cr], axis=2)
    assert np.abs(got - want).max() <= 4.0


def test_adobe_app14_transform_flags():
    rng = np.random.default_rng(6)
    img = rng.integers(60, 200, size=(16, 16, 3), dtype=np.uint8)
    data = encode_jpeg(img, subsample=False)
    base = decode_jpeg(data)

    def with_app14(transform):
        seg = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform])
        app14 = b"\xff\xee" + (len(seg) + 2).to_bytes(2, "big") + seg
        return data[:2] + app14 + data[2:]

    # transform=1: explicit YCbCr — identical to the bare stream
    assert np.array_equal(decode_jpeg(with_app14(1)), base)
    # transform=0: stored RGB — color matrix skipped, so the output
    # differs from the YCbCr interpretation of the same planes
    assert not np.array_equal(decode_jpeg(with_app14(0)), base)


def test_dnl_deferred_height_raises():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    sof = data.index(b"\xff\xc0")
    data[sof + 5 : sof + 7] = b"\x00\x00"  # lines = 0 → DNL
    with pytest.raises(NotImplementedError, match="DNL"):
        decode_jpeg(bytes(data))


def test_encode_rejects_nonpositive_quality_scale():
    import numpy as np
    import pytest

    from sample_dms_s3_kinesis_spark.operators.jpeg import encode_jpeg

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    for q in (0, -1):
        with pytest.raises(ValueError, match="quality_scale"):
            encode_jpeg(img, quality_scale=q)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode
# ---------------------------------------------------------------------------

def _prog():
    from sample_dms_s3_kinesis_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )
    return encode_jpeg_progressive


def test_progressive_equals_baseline_gray_and_color():
    """The progressive scan script encodes the SAME quantized
    coefficients as the baseline encoder, so the two decodes must agree
    EXACTLY — pixel-identical, not within-epsilon."""
    enc_p = _prog()
    rng = np.random.default_rng(7)
    gray = (
        np.linspace(0, 255, 48 * 64).reshape(48, 64)
        + rng.integers(0, 40, (48, 64))
    ).clip(0, 255).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(gray)), decode_jpeg(enc_p(gray))
    )
    rgb = _gradient(41, 53)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(rgb)), decode_jpeg(enc_p(rgb))
    )


def test_progressive_subsampled_odd_sizes_and_quality():
    """4:2:0 with odd dimensions exercises the non-interleaved AC block
    grid being smaller than the MCU-padded grid; a coarser quant table
    exercises sparse bands (long EOB runs)."""
    enc_p = _prog()
    rng = np.random.default_rng(11)
    for h, w, qs in ((33, 17, 1), (16, 33, 3), (25, 31, 2)):
        rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(rgb, subsample=True, quality_scale=qs))
        prog = decode_jpeg(enc_p(rgb, subsample=True, quality_scale=qs))
        assert np.array_equal(base, prog), (h, w, qs)


def test_progressive_restart_markers():
    enc_p = _prog()
    rng = np.random.default_rng(13)
    rgb = rng.integers(0, 256, (33, 17, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(rgb, subsample=True))
    for ri in (1, 2, 5):
        assert np.array_equal(
            base, decode_jpeg(enc_p(rgb, subsample=True, restart_interval=ri))
        ), ri


def test_progressive_eob_runs_and_flat_regions():
    """A mostly-flat image maximizes EOB-run coding (including runs
    spanning many blocks) and the sharp edge forces ZRL + refinement
    correction bits in the same scan."""
    enc_p = _prog()
    img = np.full((80, 96), 130, np.uint8)
    img[10:20, 40:41] = 255
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img)), decode_jpeg(enc_p(img))
    )


def test_progressive_random_sweep():
    enc_p = _prog()
    rng = np.random.default_rng(29)
    for i in range(12):
        h, w = int(rng.integers(8, 70)), int(rng.integers(8, 70))
        if i % 2:
            im = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            sub = i % 4 == 1
            a = decode_jpeg(encode_jpeg(im, subsample=sub))
            b = decode_jpeg(enc_p(im, subsample=sub))
        else:
            im = rng.integers(0, 256, (h, w)).astype(np.uint8)
            a = decode_jpeg(encode_jpeg(im))
            b = decode_jpeg(enc_p(im))
        assert np.array_equal(a, b), (i, h, w)


def test_progressive_rejects_bad_quality_scale():
    with pytest.raises(ValueError, match="quality_scale"):
        _prog()(np.zeros((8, 8), np.uint8), quality_scale=0)


def test_progressive_through_multimodal_pipeline(spark):
    """A progressive JPEG asset row decodes through the same
    mapInPandas feature path as baseline rows."""
    enc_p = _prog()
    img = _gradient(24, 16)
    rows = [
        (1, "image", bytearray(encode_jpeg(img))),
        (2, "image", bytearray(enc_p(img))),
    ]
    df = spark.createDataFrame(
        rows, "asset_id long, media_type string, content binary"
    )
    out = multimodal.extract_image_features(df).orderBy("asset_id").collect()
    assert [r["asset_id"] for r in out] == [1, 2]
    assert all(r["feature"] is not None for r in out)
    # identical decoded pixels in -> identical features out
    assert out[0]["feature"] == out[1]["feature"]


def test_noninterleaved_sequential_equals_interleaved():
    """T.81 A.2.2 non-interleaved layout (one Ns=1 scan per component,
    block grid over the component's own sample grid): same quantized
    coefficients -> pixel-identical decode vs the interleaved stream,
    including 4:2:0 where luma's non-interleaved grid differs from the
    MCU grid, and per-block restart intervals."""
    rng = np.random.default_rng(17)
    for h, w, sub, ri in (
        (33, 17, True, 0), (16, 33, True, 2), (24, 24, False, 0),
        (25, 31, False, 3),
    ):
        rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        a = decode_jpeg(encode_jpeg(rgb, subsample=sub, restart_interval=ri))
        b = decode_jpeg(
            encode_jpeg(
                rgb, subsample=sub, restart_interval=ri, noninterleaved=True
            )
        )
        assert np.array_equal(a, b), (h, w, sub, ri)


def test_noninterleaved_missing_component_scan_errors():
    import struct

    rgb = np.full((8, 8, 3), 100, np.uint8)
    data = encode_jpeg(rgb, noninterleaved=True)
    # truncate after the SECOND scan's payload: drop the last SOS
    last_sos = data.rfind(b"\xff\xda")
    truncated = data[:last_sos] + b"\xff\xd9"
    with pytest.raises(ValueError, match="no scan for component"):
        decode_jpeg(truncated)
    # sanity: the untouched stream decodes
    assert decode_jpeg(data).shape == (8, 8, 3)
    assert struct is not None
