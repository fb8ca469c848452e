"""Baseline JPEG codec in pure numpy — the in-container decode path
for the single most common image payload a multimodal pipeline meets
(reference scope: the engine treats media as opaque binary columns;
VERDICT r6 asked for baseline-JPEG decode as the one scope-edge
capability users hit immediately).

Decoder: baseline DCT (SOF0) and extended-sequential (SOF1) Huffman
streams — DQT (8/16-bit), multi-table DHT, integer-ratio sampling
factors (4:4:4 / 4:2:2 / 4:2:0 and any (h,v) pair dividing the max),
restart markers, grayscale or 3-component YCbCr.  Progressive (SOF2),
arithmetic coding, hierarchical, lossless, and non-divisor sampling
factor variants raise
``NotImplementedError`` — callers route that to the null-feature error
channel like any undecodable payload.

Encoder: baseline 4:4:4 or 4:2:0, used for deterministic fixtures and
thumbnails; it writes its Huffman tables into the stream (flat-length
canonical tables — valid JPEG, no reliance on remembering the spec's
Annex-K code lists).  ``decode(encode(img))`` equals ``img`` within
quantization error, which is the codec's pytest contract.

Everything here derives from the public JPEG specification (ITU-T
T.81): marker grammar, zigzag order, canonical Huffman code
construction, the orthonormal 8x8 DCT-II, and the YCbCr<->RGB
(BT.601 full-range) transform.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan: ZIGZAG[k] = natural (row-major) index of the k-th
# zigzag-ordered coefficient.
def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):  # anti-diagonals
        ij = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            ij.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(i * 8 + j for i, j in ij)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: forward F = T f T'."""
    x = np.arange(8)
    T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    T *= np.sqrt(2 / 8)
    T[0, :] = np.sqrt(1 / 8)
    return T


_DCT = _dct_matrix()

# Quantization base table: a mild, deterministic table (flat 16s for
# luma DC-heavy content would blur; use a gentle frequency ramp).  The
# decoder never assumes it — tables always come from the stream's DQT.
_Q_RAMP = (8 + 2 * (np.arange(8)[:, None] + np.arange(8)[None, :])).astype(
    np.int64
).reshape(64)


# ------------------------------------------------------------------
# Huffman
# ------------------------------------------------------------------

def _canonical_codes(counts: list[int], symbols: list[int]) -> dict:
    """(length, code) -> symbol map from a DHT BITS/HUFFVAL pair, per
    the canonical construction: codes of each length are consecutive,
    doubling when the length grows."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops (pads with zeros) at any real marker, recording
    it for the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.marker: int | None = None  # marker byte that ended the data

    def _next_byte(self) -> int:
        if self.marker is not None:
            return 0
        d = self.data
        p = self.pos
        if p >= len(d):
            self.marker = 0xD9  # treat EOF as EOI
            return 0
        b = d[p]
        if b != 0xFF:
            self.pos = p + 1
            return b
        # 0xFF: stuffed zero, fill byte, or a marker
        q = p + 1
        while q < len(d) and d[q] == 0xFF:
            q += 1
        if q >= len(d):
            self.marker = 0xD9
            return 0
        nxt = d[q]
        if nxt == 0x00:
            self.pos = q + 1
            return 0xFF
        self.marker = nxt
        self.pos = q + 1
        return 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.cur = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.nbits = 0

    def decode_huffman(self, table: dict) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    """DIFF/coefficient magnitude decoding (T.81 F.2.2.1 EXTEND)."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ------------------------------------------------------------------
# Decoder
# ------------------------------------------------------------------

def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (H, W, 3) uint8 RGB array.

    Grayscale streams are expanded to 3 identical channels so the
    feature kernels downstream see one shape.
    """
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (H, W, [(cid, h, v, tq), ...])
    restart_interval = 0
    planes = None
    app14_transform = None  # Adobe APP14 color-transform flag
    pos = 2
    n = len(content)
    while pos < n:
        if content[pos] != 0xFF:
            pos += 1  # tolerate stray bytes between segments
            continue
        while pos < n and content[pos] == 0xFF:
            pos += 1
        if pos >= n:
            break
        marker = content[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        (seg_len,) = struct.unpack_from(">H", content, pos)
        seg = content[pos + 2 : pos + seg_len]
        pos_after = pos + seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    vals = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = vals  # DQT is in zigzag order
                qt[tq] = table
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1 : i + 17])
                total = sum(counts)
                symbols = list(seg[i + 17 : i + 17 + total])
                (dc_tables if tc == 0 else ac_tables)[th] = _canonical_codes(
                    counts, symbols
                )
                i += 17 + total
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. seq.
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG precision unsupported"
                )
            H, W = struct.unpack_from(">HH", seg, 1)
            if H == 0:
                # T.81 B.2.2: lines=0 defers the height to a DNL
                # marker after the scan — unsupported; raising beats
                # silently returning a 0-row "decoded" image
                raise NotImplementedError(
                    "DNL-deferred number of lines unsupported"
                )
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            # Integer-ratio upsampling only: a spec-valid but
            # non-divisor factor pair like (3,1)/(2,1) would need
            # fractional resampling — reject at parse time so callers'
            # unsupported-codec channel sees a clean NotImplementedError
            # instead of a downstream shape error.
            _hmax = max(c[1] for c in comps)
            _vmax = max(c[2] for c in comps)
            for _cid, _h, _v, _tq in comps:
                if _h == 0 or _v == 0 or _hmax % _h or _vmax % _v:
                    raise NotImplementedError(
                        f"non-divisor chroma sampling factors "
                        f"({_h},{_v}) vs max ({_hmax},{_vmax}) "
                        f"unsupported"
                    )
            frame = (H, W, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential Huffman JPEG is "
                f"supported (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            # transform flag: 0 = components stored as-is (RGB for
            # 3-comp), 1 = YCbCr.  Photoshop emits transform=0 RGB
            # JPEGs; running those through the YCbCr matrix silently
            # mangles every pixel.
            if len(seg) >= 12:
                app14_transform = seg[11]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cs, tdta >> 4, tdta & 0xF))
            planes, pos_after = _decode_scan(
                content,
                pos + seg_len,
                frame,
                scan_comps,
                qt,
                dc_tables,
                ac_tables,
                restart_interval,
            )
        pos = pos_after
    if frame is None or planes is None:
        raise ValueError("JPEG stream has no decoded scan")
    H, W, comps = frame
    if len(comps) == 1:
        y = planes[comps[0][0]][:H, :W]
        return np.clip(np.rint(y), 0, 255).astype(np.uint8)[..., None].repeat(
            3, axis=2
        )
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG unsupported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, h, v, _tq in comps:
        # non-divisor (h, v) pairs were rejected at SOF parse time, so
        # integer-ratio upsampling is safe here
        p = planes[cid]
        p = p.repeat(vmax // v, axis=0).repeat(hmax // h, axis=1)
        full.append(p[:H, :W])
    cids = tuple(c[0] for c in comps)
    stored_rgb = app14_transform == 0 or (
        app14_transform is None and cids == (0x52, 0x47, 0x42)  # 'R','G','B'
    )
    if stored_rgb:
        # components are already R, G, B (Adobe transform=0 or
        # RGB-lettered component ids) — no color matrix
        rgb = np.stack(full, axis=2)
    else:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_scan(
    data: bytes,
    pos: int,
    frame,
    scan_comps,
    qt,
    dc_tables,
    ac_tables,
    restart_interval: int,
):
    H, W, comps = frame
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    if len(scan_comps) != len(comps):
        raise NotImplementedError(
            "non-interleaved multi-scan baseline JPEG unsupported"
        )
    if len(scan_comps) == 1:
        # T.81 A.2.2: an Ns=1 scan is NON-interleaved — the MCU is one
        # 8x8 block over the component's own sample grid and the SOF
        # sampling factors play no layout role ('jpegtran -grayscale'
        # keeps the (2,2) factors of its 4:2:0 source on the single
        # remaining component).  Treating the factors as (1,1) over a
        # (1,1)-max grid reduces the interleaved loop below to exactly
        # the spec's ceil(W/8) × ceil(H/8) row-major block order, with
        # restart intervals counted per block.
        cid0 = comps[0][0]
        by_id = {cid0: (1, 1, by_id[cid0][2])}
    hmax = max(h for h, _v, _tq in by_id.values())
    vmax = max(v for _h, v, _tq in by_id.values())
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    # per-component coefficient planes sized to the MCU grid
    planes = {
        cid: np.zeros((mcus_y * v * 8, mcus_x * h * 8), dtype=np.float64)
        for cid, (h, v, _tq) in by_id.items()
    }
    reader = _BitReader(data, pos)
    preds = {cid: 0 for cid, _, _ in scan_comps}
    Tt = _DCT.T
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.byte_align()
                # consume up to one stuffed padding byte (1-padding can
                # produce 0xFF00 before the marker), then the RSTn
                for _ in range(2):
                    if reader.marker is not None:
                        break
                    reader._next_byte()
                if reader.marker is not None and 0xD0 <= reader.marker <= 0xD7:
                    reader.marker = None  # resume after restart
                else:
                    raise ValueError("expected JPEG restart marker")
                preds = {cid: 0 for cid in preds}
            for cid, td, ta in scan_comps:
                h, v, tq = by_id[cid]
                dct = dc_tables.get(td)
                act = ac_tables.get(ta)
                q = qt.get(tq)
                if dct is None or act is None or q is None:
                    raise ValueError("JPEG scan references missing table")
                for bv in range(v):
                    for bh in range(h):
                        coef = np.zeros(64, dtype=np.float64)
                        s = reader.decode_huffman(dct)
                        diff = _extend(reader.read_bits(s), s)
                        preds[cid] += diff
                        coef[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huffman(act)
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            coef[ZIGZAG[k]] = _extend(
                                reader.read_bits(size), size
                            )
                            k += 1
                        block = (coef * q).reshape(8, 8)
                        spatial = Tt @ block @ _DCT + 128.0
                        py = (my * v + bv) * 8
                        px = (mx * h + bh) * 8
                        planes[cid][py : py + 8, px : px + 8] = spatial
            mcu_index += 1
    # skip to the marker that ended the entropy data
    end_pos = reader.pos
    if reader.marker is None:
        # walk forward to the next marker
        while end_pos < len(data):
            if data[end_pos] == 0xFF and end_pos + 1 < len(data) and data[
                end_pos + 1
            ] not in (0x00,):
                break
            end_pos += 1
    else:
        end_pos = reader.pos - 2 if reader.pos >= 2 else reader.pos
    return planes, end_pos


# ------------------------------------------------------------------
# Encoder (fixtures / thumbnails)
# ------------------------------------------------------------------

def _flat_huffman(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """A valid canonical Huffman table giving every symbol the same
    code length (the smallest L with 2^L > len(symbols), so the
    all-ones code stays unused as T.81 recommends).  Returns (BITS,
    HUFFVAL, symbol -> (length, code))."""
    L = 1
    while (1 << L) <= len(symbols):
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(symbols)
    enc = {sym: (L, i) for i, sym in enumerate(symbols)}
    return counts, symbols, enc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.cur = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.cur <<= 8 - self.nbits
            self.cur |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.cur)
            if self.cur == 0xFF:
                self.out.append(0x00)
            self.cur = 0
            self.nbits = 0


def _magnitude(v: int) -> tuple[int, int]:
    """(size, offset-coded value) for DIFF/AC amplitude coding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def encode_jpeg(
    img: np.ndarray,
    *,
    quality_scale: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array (or (H, W) grayscale) as a
    baseline JPEG.  ``quality_scale`` multiplies the quantization ramp
    (1 = mild); ``subsample=True`` writes 4:2:0 chroma;
    ``restart_interval=N`` emits RSTn markers every N MCUs (DRI).
    Deterministic: same pixels -> same bytes."""
    if quality_scale < 1:
        # quality_scale=0 (or negative) would clip the quant tables to
        # all-1s, where a high-frequency block can yield an AC
        # magnitude of size 11 — absent from the flat Huffman table
        # (sizes 1-10) — and raise a bare KeyError mid-encode.
        raise ValueError(
            f"quality_scale must be >= 1, got {quality_scale}"
        )
    gray = img.ndim == 2
    if gray:
        comps_px = [img.astype(np.float64)]
        samp = [(1, 1, 0)]
    else:
        x = img.astype(np.float64)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            cb = _box2(cb)
            cr = _box2(cr)
            samp = [(2, 2, 0), (1, 1, 1), (1, 1, 1)]
        else:
            samp = [(1, 1, 0), (1, 1, 1), (1, 1, 1)]
        comps_px = [y, cb, cr]
    H, W = img.shape[:2]
    # Baseline DQT entries are 8-bit: clamp to 255 so large
    # quality_scale values coarsen quantization instead of crashing
    # the bytes() write with values outside range(256).
    q0 = np.clip(_Q_RAMP * quality_scale, 1, 255)
    q1 = np.clip(_Q_RAMP * quality_scale * 2, 1, 255)
    qtabs = [q0, q1]
    dc_counts, dc_syms, dc_enc = _flat_huffman(list(range(12)))
    ac_syms = sorted({0x00, 0xF0} | {
        (r << 4) | s for r in range(16) for s in range(1, 11)
    })
    ac_counts, ac_vals, ac_enc = _flat_huffman(ac_syms)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    # pad every component plane to its MCU-grid size (edge replicate)
    padded = []
    for px, (h, v, _tq) in zip(comps_px, samp):
        ph, pw = mcus_y * v * 8, mcus_x * h * 8
        ch, cw = px.shape
        out = np.empty((ph, pw))
        out[:ch, :cw] = px
        if pw > cw:
            out[:ch, cw:] = px[:, -1:]
        if ph > ch:
            out[ch:, :] = out[ch - 1 : ch, :]
        padded.append(out)

    w = _BitWriter()
    preds = [0] * len(samp)
    mcu_index = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_index
                and mcu_index % restart_interval == 0
            ):
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                preds = [0] * len(samp)
            mcu_index += 1
            for ci, (plane, (h, v, tq)) in enumerate(zip(padded, samp)):
                q = qtabs[tq]
                for bv in range(v):
                    for bh in range(h):
                        py = (my * v + bv) * 8
                        px_ = (mx * h + bh) * 8
                        block = plane[py : py + 8, px_ : px_ + 8] - 128.0
                        coef = _DCT @ block @ _DCT.T
                        zz = np.rint(
                            coef.reshape(64)[ZIGZAG] / q[ZIGZAG]
                        ).astype(np.int64)
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        s, off = _magnitude(diff)
                        ln, code = dc_enc[s]
                        w.write(code, ln)
                        if s:
                            w.write(off, s)
                        run = 0
                        for k in range(1, 64):
                            val = int(zz[k])
                            if val == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = ac_enc[0xF0]
                                w.write(code, ln)
                                run -= 16
                            s, off = _magnitude(val)
                            ln, code = ac_enc[(run << 4) | s]
                            w.write(code, ln)
                            w.write(off, s)
                            run = 0
                        if run:
                            ln, code = ac_enc[0x00]
                            w.write(code, ln)
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qtabs[: 1 if gray else 2]):
        out += seg(0xDB, bytes([tq]) + bytes(int(x) for x in q[ZIGZAG]))
    ncomp = len(samp)
    sof = struct.pack(">BHHB", 8, H, W, ncomp)
    for ci, (h, v, tq) in enumerate(samp):
        sof += bytes([ci + 1, (h << 4) | v, tq])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_vals))
    if not gray:
        out += seg(0xC4, bytes([0x01]) + bytes(dc_counts) + bytes(dc_syms))
        out += seg(0xC4, bytes([0x11]) + bytes(ac_counts) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        td_ta = 0x00 if (gray or ci == 0) else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline fixed)
    out += seg(0xDA, sos)
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


def _box2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-mean downsample with edge replication for odd sizes."""
    h, w = plane.shape
    if h % 2:
        plane = np.vstack([plane, plane[-1:, :]])
    if w % 2:
        plane = np.hstack([plane, plane[:, -1:]])
    return 0.25 * (
        plane[0::2, 0::2]
        + plane[1::2, 0::2]
        + plane[0::2, 1::2]
        + plane[1::2, 1::2]
    )
