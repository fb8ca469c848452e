"""Pure-numpy PNG codec: a real decoder (plus a minimal encoder for
fixtures) built only on the public W3C PNG spec / RFC 2083 and the
stdlib ``zlib`` inflate.

Scope — the profile a no-media-library container can honestly decode:

- 8-bit samples, color types 0 (greyscale), 2 (truecolor), 3 (palette),
  4 (grey+alpha), 6 (truecolor+alpha);
- all five row filters (None / Sub / Up / Average / Paeth);
- multi-chunk IDAT streams, CRC-verified chunk walk.

- 16-bit samples (reduced to 8-bit by taking the high byte — the
  spec-sanctioned approximation; the spec's recommended exact scaling
  is round(v*255/65535), which differs from the high byte by 1 for
  roughly half of all 16-bit values) for color types 0/2/4/6;
- sub-byte depths (1/2/4-bit, color types 0 and 3): MSB-first packed
  samples, scanlines padded to byte boundaries, filters on bytes with
  the spec's bpp=1 filter distance; greyscale scales by 255/(2^d-1)
  (spec sample depth scaling), palette indexes resolve as-is;
- Adam7 interlacing (seven sub-image passes, each filtered
  independently, scattered back on the pass grid — spec §8.2), at any
  supported depth.

Alpha is dropped on decode (features are computed over RGB); palette
entries resolve through PLTE.  The encoder exists so tests and the
synthetic asset fixture can produce real spec-compliant payloads that
exercise every filter path (``filter_type='mixed'`` cycles them
row-by-row).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid (spec §8.2): (x0, y0, dx, dy) per pass.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over int32 arrays (spec §6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _chunks(content: bytes):
    """Walk (type, data) chunks, verifying length and CRC32."""
    pos = len(_SIGNATURE)
    n = len(content)
    while pos < n:
        if pos + 8 > n:
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > n:
            raise ValueError("truncated PNG chunk body")
        (crc,) = struct.unpack(">I", content[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG stream missing IEND")


def _scanline(w: int, channels: int, depth: int) -> int:
    """Bytes per scanline: samples pack MSB-first, rows pad to byte
    boundaries (spec §7.2)."""
    return -(-w * channels * depth // 8)


def _unfilter(raw: bytes, stride: int, h: int, bpp: int) -> np.ndarray:
    """Reverse the per-row filters → (h, stride) uint8 reconstruction.
    ``stride`` is bytes per scanline; ``bpp`` the spec's filter
    distance (1 for sub-byte depths)."""
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG raster length mismatch")
    n_units = stride // bpp
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        ft = int(rows[r, 0])
        cur = rows[r, 1:].astype(np.int64)
        if ft == 0:  # None
            recon = cur
        elif ft == 1:  # Sub: running sum along the row, per channel
            recon = (
                cur.reshape(n_units, bpp).cumsum(axis=0) % 256
            ).reshape(stride)
        elif ft == 2:  # Up
            recon = (cur + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: sequential in x
            px = cur.reshape(n_units, bpp)
            pr = prev.reshape(n_units, bpp)
            rec = np.empty((n_units, bpp), dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            upleft = np.zeros(bpp, dtype=np.int64)
            for x in range(n_units):
                if ft == 3:
                    pred = (left + pr[x]) >> 1
                else:
                    pred = _paeth(left, pr[x], upleft)
                rec[x] = (px[x] + pred) % 256
                left = rec[x]
                upleft = pr[x]
            recon = rec.reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = recon.astype(np.uint8)
        prev = recon
    return out


def _pass_raster(
    raw: bytes, w: int, h: int, channels: int, depth: int
) -> np.ndarray:
    """One (sub)image's filtered scanlines → (h, w, B) uint8 pixel
    bytes (B = channels, or channels*2 at depth 16).  Sub-byte depths
    unfilter at the spec's bpp=1 distance, then unpack MSB-first."""
    if depth in (8, 16):
        bpp = channels * (depth // 8)
        return _unfilter(raw, w * bpp, h, bpp).reshape(h, w, bpp)
    stride = _scanline(w, channels, depth)
    rows = _unfilter(raw, stride, h, 1)
    bits = np.unpackbits(rows, axis=1)
    nsamp = stride * 8 // depth
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (bits.reshape(h, nsamp, depth) * weights).sum(axis=2)
    return (
        samples[:, : w * channels].astype(np.uint8).reshape(h, w, channels)
    )


def _deinterlace(
    raw: bytes, w: int, h: int, channels: int, depth: int
) -> np.ndarray:
    """Adam7: seven independently-filtered sub-rasters, decoded in
    order from ONE decompressed stream and scattered back on the pass
    grid.  Returns (h, w, B) uint8 pixel bytes."""
    B = channels * (2 if depth == 16 else 1)
    full = np.zeros((h, w, B), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = max(0, -(-(w - x0) // dx))
        ph = max(0, -(-(h - y0) // dy))
        if pw == 0 or ph == 0:
            continue  # a pass can be empty for small images (spec 8.2)
        if depth in (8, 16):
            nbytes = ph * (1 + pw * B)
        else:
            nbytes = ph * (1 + _scanline(pw, channels, depth))
        sub = _pass_raster(raw[pos : pos + nbytes], pw, ph, channels, depth)
        pos += nbytes
        full[y0::dy, x0::dx, :] = sub
    if pos != len(raw):
        raise ValueError("PNG interlaced raster length mismatch")
    return full


def decode_png(content: bytes) -> np.ndarray:
    """Decode a PNG payload to an (H, W, 3) uint8 RGB array.

    Supports every spec depth — 1/2/4-bit (greyscale + palette),
    8-bit, and 16-bit (reduced via the high byte) — all color types,
    all filters, straight or Adam7-interlaced.  Out-of-spec headers
    (non-PNG depths, sub-byte truecolor, 16-bit palette) raise
    ``ValueError`` into the caller's error channel."""
    if not content.startswith(_SIGNATURE):
        raise ValueError("not a PNG stream")
    ihdr = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(content):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if len(body) % 3:
                raise ValueError("PLTE length not a multiple of 3")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if ihdr is None:
        raise ValueError("PNG stream missing IHDR")
    w, h, depth, color_type, compression, filter_method, interlace = ihdr
    if compression != 0 or filter_method != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {depth}")
    if color_type not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    if depth < 8 and color_type not in (0, 3):
        raise ValueError(
            f"sub-byte depth {depth} is only valid for greyscale/"
            f"palette (spec 11.2.2), got color type {color_type}"
        )
    if depth == 16 and color_type == 3:
        raise ValueError("palette PNG cannot be 16-bit (spec 11.2.2)")
    if w <= 0 or h <= 0:
        raise ValueError("empty PNG image")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    if interlace == 1:
        px = _deinterlace(raw, w, h, channels, depth)
    else:
        px = _pass_raster(raw, w, h, channels, depth)
    if depth == 16:
        # big-endian sample pairs -> high byte (the spec's 16->8 scale)
        px = px.reshape(h, w, channels, 2)[:, :, :, 0]
    elif depth < 8 and color_type == 0:
        # spec sample-depth scaling: 255/(2^d - 1) is exact for 1/2/4
        px = (px.astype(np.int64) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
    if color_type == 0:  # greyscale
        return np.repeat(px, 3, axis=2)
    if color_type == 2:  # truecolor
        return px
    if color_type == 3:  # palette
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        return palette[idx]
    if color_type == 4:  # grey + alpha: drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # truecolor + alpha: drop alpha


def _filter_row(
    ft: int, cur: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply filter ``ft`` to one reconstructed row (the encode side)."""
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    upleft = np.zeros_like(prev)
    upleft[bpp:] = prev[:-bpp]
    if ft == 0:
        return cur
    if ft == 1:
        return (cur - left) % 256
    if ft == 2:
        return (cur - prev) % 256
    if ft == 3:
        return (cur - ((left + prev) >> 1)) % 256
    if ft == 4:
        return (cur - _paeth(left, prev, upleft)) % 256
    raise ValueError(f"unknown PNG filter type {ft}")


def encode_png(
    img: np.ndarray,
    *,
    filter_type: int | str = 0,
    interlace: bool = False,
    depth: int | None = None,
) -> bytes:
    """Encode an (H, W, 3) RGB or (H, W) greyscale array as a PNG —
    8-bit from uint8 input, 16-bit from uint16 (big-endian sample
    pairs, the high byte carrying the uint8-visible value).
    ``filter_type`` is 0–4 applied to every row, or ``'mixed'`` to
    cycle all five filters row-by-row (the fixture mode that exercises
    every decode path in one payload); ``interlace=True`` writes the
    Adam7 seven-pass layout, each pass filtered independently;
    ``depth=1/2/4`` packs a 2-D greyscale array of small sample values
    (< 2^depth) into a sub-byte stream."""
    depth16 = img.dtype == np.uint16
    if depth is not None and depth < 8:
        if img.ndim != 2:
            raise ValueError("sub-byte encode_png expects (H, W) grey")
        if int(img.max(initial=0)) >= (1 << depth):
            raise ValueError(f"sample values exceed {depth}-bit range")
        color_type, channels = 0, 1
        px = img[:, :, None]
    elif img.ndim == 2:
        color_type, channels = 0, 1
        px = img[:, :, None]
        depth = 16 if depth16 else 8
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
        px = img
        depth = 16 if depth16 else 8
    else:
        raise ValueError("encode_png expects (H, W, 3) RGB or (H, W) grey")
    h, w = px.shape[:2]
    if depth == 16:
        plane = np.stack(
            [(px >> 8) & 0xFF, px & 0xFF], axis=-1
        ).reshape(h, w, channels * 2).astype(np.uint8)
    else:
        plane = px.astype(np.uint8)
    bpp = channels * 2 if depth == 16 else 1 if depth < 8 else channels

    def filtered_rows(region: np.ndarray) -> bytearray:
        ph, pw = region.shape[:2]
        if depth < 8:
            # pack samples MSB-first, pad each row to a byte boundary
            bits = (
                (region.reshape(ph, pw)[:, :, None]
                 >> np.arange(depth - 1, -1, -1)) & 1
            ).reshape(ph, pw * depth).astype(np.uint8)
            rows = np.packbits(bits, axis=1).astype(np.int64)
        else:
            rows = region.reshape(ph, pw * bpp).astype(np.int64)
        prev = np.zeros(rows.shape[1], dtype=np.int64)
        body = bytearray()
        for r in range(ph):
            ft = (r % 5) if filter_type == "mixed" else int(filter_type)
            body.append(ft)
            body += (
                _filter_row(ft, rows[r], prev, bpp).astype(np.uint8).tobytes()
            )
            prev = rows[r]
        return body

    if interlace:
        body = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = plane[y0::dy, x0::dx, :]
            if sub.shape[0] and sub.shape[1]:
                body += filtered_rows(sub)
    else:
        body = filtered_rows(plane)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0,
        1 if interlace else 0,
    )
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + chunk(b"IEND", b"")
    )
