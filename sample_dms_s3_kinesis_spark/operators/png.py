"""Pure-numpy PNG codec: a real decoder (plus a minimal encoder for
fixtures) built only on the public W3C PNG spec / RFC 2083 and the
stdlib ``zlib`` inflate.

Scope — the profile a no-media-library container can honestly decode:

- 8-bit samples, color types 0 (greyscale), 2 (truecolor), 3 (palette),
  4 (grey+alpha), 6 (truecolor+alpha);
- all five row filters (None / Sub / Up / Average / Paeth);
- multi-chunk IDAT streams, CRC-verified chunk walk.

Interlaced (Adam7), 16-bit and sub-byte depths raise
``NotImplementedError`` — routed by callers to the same null-feature
error channel as corrupt files (see :mod:`.multimodal`), mirroring the
baseline-vs-progressive split in :mod:`.jpeg`.

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

# channels per pixel by color type (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


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


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Reverse the per-row filters → (h, w*bpp) uint8 reconstruction."""
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG raster length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        ft = int(rows[r, 0])
        cur = rows[r, 1:].astype(np.int64)
        if ft == 0:  # None
            recon = cur
        elif ft == 1:  # Sub: running sum along the row, per channel
            recon = (cur.reshape(w, bpp).cumsum(axis=0) % 256).reshape(stride)
        elif ft == 2:  # Up
            recon = (cur + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: sequential in x
            px = cur.reshape(w, bpp)
            pr = prev.reshape(w, bpp)
            rec = np.empty((w, bpp), dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            upleft = np.zeros(bpp, dtype=np.int64)
            for x in range(w):
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


def decode_png(content: bytes) -> np.ndarray:
    """Decode a PNG payload to an (H, W, 3) uint8 RGB array.

    Supports the 8-bit non-interlaced profile (all color types, all
    filters); Adam7 / 16-bit / sub-byte depths raise
    ``NotImplementedError`` into the caller's error channel."""
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
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG is not supported")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} is not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    if w <= 0 or h <= 0:
        raise ValueError("empty PNG image")
    bpp = _CHANNELS[color_type]
    raster = _unfilter(zlib.decompress(bytes(idat)), w, h, bpp)
    px = raster.reshape(h, w, bpp)
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


def encode_png(img: np.ndarray, *, filter_type: int | str = 0) -> bytes:
    """Encode an (H, W, 3) RGB or (H, W) greyscale uint8 array as a
    non-interlaced 8-bit PNG.  ``filter_type`` is 0–4 applied to every
    row, or ``'mixed'`` to cycle all five filters row-by-row (the
    fixture mode that exercises every decode path in one payload)."""
    if img.ndim == 2:
        color_type, bpp = 0, 1
        px = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, bpp = 2, 3
        px = img
    else:
        raise ValueError("encode_png expects (H, W, 3) RGB or (H, W) grey")
    h, w = px.shape[:2]
    rows = px.reshape(h, w * bpp).astype(np.int64)
    prev = np.zeros(w * bpp, dtype=np.int64)
    body = bytearray()
    for r in range(h):
        ft = (r % 5) if filter_type == "mixed" else int(filter_type)
        body.append(ft)
        body += _filter_row(ft, rows[r], prev, bpp).astype(np.uint8).tobytes()
        prev = rows[r]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + chunk(b"IEND", b"")
    )
