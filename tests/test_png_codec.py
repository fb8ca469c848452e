"""PNG codec tests: exact roundtrips through every filter path, the
non-truecolor color types via hand-built spec-compliant payloads, and
the NotImplementedError / ValueError contract for out-of-profile and
corrupt streams.  No Spark needed — the codec is pure numpy."""

import struct
import zlib

import numpy as np
import pytest

from sample_dms_s3_kinesis_spark.operators.multimodal import decode_image
from sample_dms_s3_kinesis_spark.operators.png import (
    decode_png,
    encode_png,
)


def _gradient(h=23, w=31, seed=5):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 29 + seed) % 256, (y * 19 + seed * 3) % 256, (x + 2 * y) % 256],
        axis=-1,
    ).astype(np.uint8)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _raw_png(w, h, color_type, raster_rows, extra=b"", depth=8, interlace=0):
    """Hand-build a PNG: raster_rows = list of (filter, bytes) rows."""
    body = b"".join(bytes([ft]) + row for ft, row in raster_rows)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(body))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, "mixed"])
def test_rgb_roundtrip_every_filter(ft):
    img = _gradient()
    out = decode_png(encode_png(img, filter_type=ft))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_grey_roundtrip_replicates_channels():
    grey = (_gradient()[:, :, 0]).astype(np.uint8)
    out = decode_png(encode_png(grey, filter_type="mixed"))
    assert out.shape == (*grey.shape, 3)
    for c in range(3):
        assert np.array_equal(out[:, :, c], grey)


def test_multi_idat_chunks_concatenate():
    img = _gradient(h=9, w=7)
    payload = encode_png(img)
    # split the single IDAT into two: re-walk the chunks and rebuild
    sig, pos, chunks = payload[:8], 8, []
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        chunks.append((payload[pos + 4 : pos + 8], payload[pos + 8 : pos + 8 + ln]))
        pos += 12 + ln
    rebuilt = sig
    for ctype, body in chunks:
        if ctype == b"IDAT":
            mid = len(body) // 2
            rebuilt += _chunk(b"IDAT", body[:mid]) + _chunk(b"IDAT", body[mid:])
        else:
            rebuilt += _chunk(ctype, body)
    assert np.array_equal(decode_png(rebuilt), img)


def test_rgba_drops_alpha():
    h, w = 5, 6
    rgb = _gradient(h, w)
    rgba = np.dstack([rgb, np.full((h, w), 77, np.uint8)])
    rows = [(0, rgba[r].tobytes()) for r in range(h)]
    out = decode_png(_raw_png(w, h, 6, rows))
    assert np.array_equal(out, rgb)


def test_grey_alpha_drops_alpha():
    h, w = 4, 5
    grey = (_gradient(h, w)[:, :, 1]).astype(np.uint8)
    ga = np.dstack([grey, np.full((h, w), 9, np.uint8)])
    rows = [(2, None) for _ in range(h)]  # Up filter everywhere
    raster, prev = [], np.zeros(w * 2, np.int64)
    flat = ga.reshape(h, w * 2).astype(np.int64)
    for r in range(h):
        raster.append((2, ((flat[r] - prev) % 256).astype(np.uint8).tobytes()))
        prev = flat[r]
    out = decode_png(_raw_png(w, h, 4, raster))
    for c in range(3):
        assert np.array_equal(out[:, :, c], grey)


def test_palette_resolves_plte():
    h, w = 3, 4
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], np.uint8
    )
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 3, 0]], np.uint8)
    rows = [(0, idx[r].tobytes()) for r in range(h)]
    payload = _raw_png(w, h, 3, rows, extra=_chunk(b"PLTE", palette.tobytes()))
    assert np.array_equal(decode_png(payload), palette[idx])


def test_palette_index_out_of_range_raises():
    rows = [(0, bytes([5]))]
    payload = _raw_png(
        1, 1, 3, rows, extra=_chunk(b"PLTE", bytes([1, 2, 3, 4, 5, 6]))
    )
    with pytest.raises(ValueError, match="palette index"):
        decode_png(payload)


def test_palette_missing_plte_raises():
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(_raw_png(1, 1, 3, [(0, b"\x00")]))


def test_crc_corruption_raises():
    payload = bytearray(encode_png(_gradient(h=4, w=4)))
    payload[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_out_of_profile_raises():
    # every spec depth decodes since r8; non-spec depths and unknown
    # interlace methods fail clearly
    with pytest.raises(ValueError, match="invalid PNG bit depth"):
        decode_png(_raw_png(8, 1, 0, [(0, b"\x00")], depth=3))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(_raw_png(2, 1, 2, [(0, b"\x00" * 6)], interlace=7))


def test_truncated_and_malformed_raise_valueerror():
    payload = encode_png(_gradient(h=4, w=4))
    with pytest.raises(ValueError):
        decode_png(payload[:20])
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNKJUNKJUNK")
    # raster shorter than h*(1+stride): drop the last row from the body
    img = _gradient(h=3, w=2)
    body = b"".join(b"\x00" + img[r].tobytes() for r in range(2))
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 3, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(body))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(bad)


def test_decode_image_dispatches_png():
    img = _gradient()
    assert np.array_equal(decode_image(encode_png(img, filter_type=4)), img)


def test_adam7_interlaced_equals_straight():
    """Adam7: every filter mode, plus tiny shapes where whole passes
    are empty, decode pixel-identically to the non-interlaced stream."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (21, 13, 3)).astype(np.uint8)
    for ft in (0, 1, 2, 3, 4, "mixed"):
        assert np.array_equal(
            decode_png(encode_png(img, filter_type=ft)),
            decode_png(encode_png(img, filter_type=ft, interlace=True)),
        ), ft
    for h, w in ((1, 1), (2, 3), (5, 1), (7, 7), (8, 8), (3, 9)):
        t = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        assert np.array_equal(
            decode_png(encode_png(t)),
            decode_png(encode_png(t, interlace=True)),
        ), (h, w)


def test_16bit_reduces_to_high_byte():
    """16-bit samples decode via the high byte (the spec's 16->8
    scaling), for grey and RGB, straight and interlaced."""
    rng = np.random.default_rng(29)
    img8 = rng.integers(0, 256, (11, 7, 3)).astype(np.uint8)
    low = rng.integers(0, 256, img8.shape).astype(np.uint16)
    img16 = (img8.astype(np.uint16) << 8) | low
    assert np.array_equal(
        decode_png(encode_png(img16, filter_type="mixed")), img8
    )
    assert np.array_equal(
        decode_png(encode_png(img16, filter_type="mixed", interlace=True)),
        img8,
    )
    g8 = rng.integers(0, 256, (6, 9)).astype(np.uint8)
    g16 = (g8.astype(np.uint16) << 8) | 0x7F
    out = decode_png(encode_png(g16))
    assert np.array_equal(out[..., 0], g8)
    assert np.array_equal(out[..., 0], out[..., 2])


def test_sub_byte_greyscale_scales_samples():
    """1/2/4-bit greyscale: MSB-first packed samples, byte-padded rows,
    bpp=1 filters, decode scales by 255/(2^d - 1) — straight and
    Adam7, across filter modes and widths that pad mid-byte."""
    rng = np.random.default_rng(31)
    for d in (1, 2, 4):
        for h, w in ((5, 5), (3, 17), (1, 1)):
            g = rng.integers(0, 1 << d, (h, w)).astype(np.uint8)
            want = (g.astype(int) * (255 // ((1 << d) - 1))).astype(np.uint8)
            for il in (False, True):
                out = decode_png(
                    encode_png(g, depth=d, filter_type="mixed", interlace=il)
                )
                assert np.array_equal(out[..., 0], want), (d, h, w, il)
                assert np.array_equal(out[..., 0], out[..., 2])


def test_sub_byte_palette_resolves_plte():
    """Hand-built 4-bit palette image: indexes pack two per byte and
    resolve through PLTE unscaled."""
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], np.uint8
    )
    # 2x3 image of indexes: rows [0,1,2], [3,0,1] -> packed nibbles
    rows = [(0, bytes([0x01, 0x20])), (0, bytes([0x30, 0x10]))]
    data = _raw_png(
        3, 2, 3, rows, depth=4,
        extra=_chunk(b"PLTE", palette.tobytes()),
    )
    out = decode_png(data)
    want = palette[np.array([[0, 1, 2], [3, 0, 1]])]
    assert np.array_equal(out, want)


def test_sub_byte_invalid_combinations_raise():
    # sub-byte truecolor is out of spec
    with pytest.raises(ValueError, match="sub-byte"):
        decode_png(_raw_png(1, 1, 2, [(0, b"\x00")], depth=4))
    # depth 3 is not a PNG depth at all
    with pytest.raises(ValueError, match="invalid PNG bit depth"):
        decode_png(_raw_png(1, 1, 0, [(0, b"\x00")], depth=3))
    # encoder guards: range and shape
    with pytest.raises(ValueError, match="range"):
        encode_png(np.array([[4]], np.uint8), depth=2)
    with pytest.raises(ValueError, match="grey"):
        encode_png(np.zeros((2, 2, 3), np.uint8), depth=4)
