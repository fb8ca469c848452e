"""Huffman JPEG codec in pure numpy — the in-container decode path
for the single most common image payload a multimodal pipeline meets
(reference scope: the engine treats media as opaque binary columns).

Decoder: baseline DCT (SOF0), extended-sequential (SOF1) and
progressive (SOF2, T.81 Annex G.2: spectral selection + successive
approximation, DC/AC first and refinement scans, EOB runs) Huffman
streams, interleaved or non-interleaved (one Ns=1 scan per component,
A.2.2) — DQT (8/16-bit), multi-table DHT, integer-ratio sampling
factors (4:4:4 / 4:2:2 / 4:2:0 and any (h,v) pair dividing the max),
restart markers, grayscale or 3-component YCbCr.  Arithmetic coding,
hierarchical, lossless, and non-divisor sampling factor variants raise
``NotImplementedError`` — callers route that to the null-feature error
channel like any undecodable payload.

Encoder: 4:4:4 or 4:2:0, sequential (interleaved or non-interleaved)
or progressive, used for deterministic fixtures and thumbnails; it
writes its Huffman tables into the stream (flat-length canonical
tables — valid JPEG, no reliance on remembering the spec's Annex-K
code lists) and every mode shares ONE quantizer front half
(``_quantized_comp_blocks``), so all encodings of the same pixels
decode identically — the codec's pytest contract, alongside
``decode(encode(img)) == img`` within quantization error.

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
    progressive = False
    coefs: dict[int, np.ndarray] | None = None  # cid -> (BY, BX, 64)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2 progressive
            progressive = marker == 0xC2
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
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential/progressive Huffman "
                f"JPEG is supported (SOF marker 0xFF{marker:02X})"
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
            if progressive:
                ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                if coefs is None:
                    coefs = _alloc_coef_planes(frame)
                pos_after = _decode_scan_progressive(
                    content,
                    pos + seg_len,
                    frame,
                    scan_comps,
                    ss,
                    se,
                    ahal >> 4,
                    ahal & 0xF,
                    coefs,
                    dc_tables,
                    ac_tables,
                    restart_interval,
                )
            else:
                if planes is None:
                    planes = {}
                pos_after = _decode_scan(
                    content,
                    pos + seg_len,
                    frame,
                    scan_comps,
                    qt,
                    dc_tables,
                    ac_tables,
                    restart_interval,
                    planes,
                )
        pos = pos_after
    if progressive and coefs is not None:
        # all scans accumulated into the coefficient planes; one
        # dequantize + IDCT pass reconstructs the spatial planes the
        # shared upsample/color tail below expects
        planes = {}
        for cid, _h, _v, tq in frame[2]:
            q = qt.get(tq)
            if q is None:
                raise ValueError("JPEG frame references missing DQT table")
            c = coefs[cid]
            by, bx = c.shape[:2]
            plane = np.empty((by * 8, bx * 8), dtype=np.float64)
            Tt = _DCT.T
            # per-block, same associativity as the baseline path — a
            # batched einsum reorders the float sums and the ulp drift
            # can cross an rint boundary (observed: one off-by-one
            # pixel per ~50 blocks vs the sequential decode)
            for y in range(by):
                for x in range(bx):
                    block = (c[y, x].astype(np.float64) * q).reshape(8, 8)
                    plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = (
                        Tt @ block @ _DCT + 128.0
                    )
            planes[cid] = plane
    if frame is None or not planes:
        raise ValueError("JPEG stream has no decoded scan")
    H, W, comps = frame
    missing = [cid for cid, _h, _v, _tq in comps if cid not in planes]
    if missing:
        # a non-interleaved stream whose per-component scans were
        # truncated: fail clearly instead of KeyError-ing in assembly
        raise ValueError(
            f"JPEG stream has no scan for component id(s) {missing}"
        )
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


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _alloc_coef_planes(frame) -> dict[int, np.ndarray]:
    """Per-component (BY, BX, 64) int32 coefficient planes sized to the
    frame's interleaved MCU grid (a superset of every scan's block
    grid), natural (row-major) coefficient order."""
    H, W, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    return {
        cid: np.zeros((mcus_y * v, mcus_x * h, 64), dtype=np.int32)
        for cid, h, v, _tq in comps
    }


def _expect_restart(reader: _BitReader, preds: dict) -> None:
    """Byte-align and consume an RSTn marker mid-scan, resetting DC
    predictions (shared by the baseline and progressive paths)."""
    reader.byte_align()
    # consume up to one stuffed padding byte (1-padding can produce
    # 0xFF00 before the marker), then the RSTn
    for _ in range(2):
        if reader.marker is not None:
            break
        reader._next_byte()
    if reader.marker is not None and 0xD0 <= reader.marker <= 0xD7:
        reader.marker = None  # resume after restart
    else:
        raise ValueError("expected JPEG restart marker")
    for cid in preds:
        preds[cid] = 0


def _scan_end_pos(reader: _BitReader, data: bytes) -> int:
    """Stream position just before the marker that ended a scan's
    entropy-coded data (walks forward if the reader never hit one)."""
    end_pos = reader.pos
    if reader.marker is None:
        while end_pos < len(data):
            if data[end_pos] == 0xFF and end_pos + 1 < len(data) and data[
                end_pos + 1
            ] not in (0x00,):
                break
            end_pos += 1
        return end_pos
    return reader.pos - 2 if reader.pos >= 2 else reader.pos


def _decode_scan_progressive(
    data: bytes,
    pos: int,
    frame,
    scan_comps,
    ss: int,
    se: int,
    ah: int,
    al: int,
    coefs: dict[int, np.ndarray],
    dc_tables,
    ac_tables,
    restart_interval: int,
) -> int:
    """Decode ONE progressive scan (T.81 G.2) into the shared
    coefficient planes, in place; returns the position after the scan's
    entropy data.  DC scans (Ss=0) may interleave components; AC scans
    are single-component by B.2.3.  Ah=0 scans establish coefficient
    values at approximation Al; Ah>0 scans refine one bit."""
    H, W, comps = frame
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    reader = _BitReader(data, pos)
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    def _refine_nonzero(coef, k):
        # correction bit for a history-nonzero coefficient (G.1.2.3):
        # a 1-bit grows the magnitude by 2^Al unless this approximation
        # bit is already set (Python's & on negatives is two's
        # complement, matching the int16 arithmetic the spec implies)
        if reader.read_bit():
            c = int(coef[ZIGZAG[k]])
            if (c & p1) == 0:
                coef[ZIGZAG[k]] = c + (p1 if c >= 0 else m1)

    if ss == 0:  # DC scan (se must be 0 per B.2.3)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        preds = {cid: 0 for cid, _, _ in scan_comps}
        if len(scan_comps) == 1:
            # non-interleaved: the component's own ceil(xi/8)*ceil(yi/8)
            # block grid in row-major order
            cid0, td0, _ta0 = scan_comps[0]
            h, v, _tq = by_id[cid0]
            nbx = _ceil_div(_ceil_div(W * h, hmax), 8)
            nby = _ceil_div(_ceil_div(H * v, vmax), 8)
            plane = coefs[cid0]
            unit = 0
            for by in range(nby):
                for bx in range(nbx):
                    if (
                        restart_interval
                        and unit
                        and unit % restart_interval == 0
                    ):
                        _expect_restart(reader, preds)
                    coef = plane[by, bx]
                    if ah == 0:
                        s = reader.decode_huffman(_req(dc_tables, td0))
                        preds[cid0] += _extend(reader.read_bits(s), s)
                        coef[0] = preds[cid0] << al
                    else:
                        if reader.read_bit():
                            coef[0] = int(coef[0]) | p1
                    unit += 1
        else:
            mcus_x = -(-W // (8 * hmax))
            mcus_y = -(-H // (8 * vmax))
            unit = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if (
                        restart_interval
                        and unit
                        and unit % restart_interval == 0
                    ):
                        _expect_restart(reader, preds)
                    for cid, td, _ta in scan_comps:
                        h, v, _tq = by_id[cid]
                        for bv in range(v):
                            for bh in range(h):
                                coef = coefs[cid][my * v + bv, mx * h + bh]
                                if ah == 0:
                                    s = reader.decode_huffman(
                                        _req(dc_tables, td)
                                    )
                                    preds[cid] += _extend(
                                        reader.read_bits(s), s
                                    )
                                    coef[0] = preds[cid] << al
                                else:
                                    if reader.read_bit():
                                        coef[0] = int(coef[0]) | p1
                    unit += 1
        return _scan_end_pos(reader, data)

    # AC scan: exactly one component (T.81 B.2.3)
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must have Ns = 1")
    cid0, _td0, ta0 = scan_comps[0]
    h, v, _tq = by_id[cid0]
    nbx = _ceil_div(_ceil_div(W * h, hmax), 8)
    nby = _ceil_div(_ceil_div(H * v, vmax), 8)
    act = _req(ac_tables, ta0)
    plane = coefs[cid0]
    unit = 0
    noop_preds: dict = {}
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and unit and unit % restart_interval == 0:
                _expect_restart(reader, noop_preds)
                eobrun = 0
            unit += 1
            coef = plane[by, bx]
            if ah == 0:  # first pass over this band (G.1.2.2)
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode_huffman(act)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC index overrun")
                    coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
                    k += 1
                continue
            # refinement pass (G.1.2.3, after jdphuff's control flow)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode_huffman(act)
                    r, s = rs >> 4, rs & 0xF
                    val = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        # r == 15: ZRL — skip 16 history-zero coeffs
                    else:
                        if s != 1:
                            raise ValueError(
                                "invalid refinement magnitude in "
                                "progressive JPEG scan"
                            )
                        val = p1 if reader.read_bit() else m1
                    while k <= se:
                        if plane[by, bx, ZIGZAG[k]] != 0:
                            _refine_nonzero(coef, k)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        coef[ZIGZAG[k]] = val
                    k += 1
            if eobrun > 0:
                # EOB-covered remainder of the band still carries
                # correction bits for history-nonzero coefficients
                while k <= se:
                    if plane[by, bx, ZIGZAG[k]] != 0:
                        _refine_nonzero(coef, k)
                    k += 1
                eobrun -= 1
    return _scan_end_pos(reader, data)


def _req(tables: dict, idx: int) -> dict:
    table = tables.get(idx)
    if table is None:
        raise ValueError("JPEG scan references missing table")
    return table


def _decode_scan(
    data: bytes,
    pos: int,
    frame,
    scan_comps,
    qt,
    dc_tables,
    ac_tables,
    restart_interval: int,
    planes: dict[int, np.ndarray],
):
    """Decode ONE sequential-Huffman scan into ``planes`` (shared
    across scans so a non-interleaved stream's per-component scans
    accumulate); returns the position after the entropy data."""
    H, W, comps = frame
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    if len(scan_comps) == 1:
        # T.81 A.2.2: an Ns=1 scan is NON-interleaved — the MCU is one
        # 8x8 block over the COMPONENT'S own sample grid (xi = ceil(
        # W·h/hmax) wide) and the SOF factors play no layout role
        # beyond sizing that grid ('jpegtran -grayscale' keeps the
        # (2,2) factors of its 4:2:0 source on the single remaining
        # component, where the grid degenerates to ceil(W/8)).
        # Treating the factors as (1,1) over the component dimensions
        # reduces the interleaved loop below to exactly the spec's
        # row-major block order, restart intervals counted per block.
        cid0, _td, _ta = scan_comps[0]
        h, v, tq0 = by_id[cid0]
        hmax_f = max(c[1] for c in comps)
        vmax_f = max(c[2] for c in comps)
        W_eff = _ceil_div(W * h, hmax_f)
        H_eff = _ceil_div(H * v, vmax_f)
        by_id = {cid0: (1, 1, tq0)}
    elif len(scan_comps) != len(comps):
        raise NotImplementedError(
            "partially-interleaved JPEG scan unsupported"
        )
    else:
        W_eff, H_eff = W, H
    hmax = max(h for h, _v, _tq in by_id.values())
    vmax = max(v for _h, v, _tq in by_id.values())
    mcus_x = -(-W_eff // (8 * hmax))
    mcus_y = -(-H_eff // (8 * vmax))
    # per-component planes sized to the scan's block grid; a plane
    # already allocated by an earlier scan of a non-interleaved stream
    # is reused (and grown only if this scan's grid is larger)
    for cid, (h, v, _tq) in by_id.items():
        need = (mcus_y * v * 8, mcus_x * h * 8)
        cur = planes.get(cid)
        if cur is None or cur.shape[0] < need[0] or cur.shape[1] < need[1]:
            grown = np.zeros(
                (
                    max(need[0], 0 if cur is None else cur.shape[0]),
                    max(need[1], 0 if cur is None else cur.shape[1]),
                ),
                dtype=np.float64,
            )
            if cur is not None:
                grown[: cur.shape[0], : cur.shape[1]] = cur
            planes[cid] = grown
    reader = _BitReader(data, pos)
    preds = {cid: 0 for cid, _, _ in scan_comps}
    Tt = _DCT.T
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                _expect_restart(reader, preds)
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
    return _scan_end_pos(reader, data)


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


def _emit_restart(w: _BitWriter, rst_n: int) -> int:
    """Byte-align (1-padded flush) and write RSTn; returns the next
    marker index (mod 8).  Shared by every encoder mode."""
    w.flush()
    w.out += bytes([0xFF, 0xD0 + rst_n])
    return (rst_n + 1) % 8


def _encode_block(w: _BitWriter, zz, pred: int, dc_enc: dict,
                  ac_enc: dict) -> int:
    """Sequential-Huffman entropy coding of one zigzag-ordered block
    (DC diff + AC run/size pairs); returns the new DC predictor.
    Shared by the interleaved and non-interleaved encoders."""
    diff = int(zz[0]) - pred
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
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    *,
    quality_scale: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
    noninterleaved: bool = False,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array (or (H, W) grayscale) as a
    baseline JPEG.  ``quality_scale`` multiplies the quantization ramp
    (1 = mild); ``subsample=True`` writes 4:2:0 chroma;
    ``restart_interval=N`` emits RSTn markers every N MCUs (DRI);
    ``noninterleaved=True`` writes one Ns=1 SOS per component (the
    T.81 A.2.2 layout, restart intervals counted per block) — the
    fixture for the decoder's non-interleaved path, decoding pixel-
    identically to the interleaved stream (same quantized
    coefficients).  Deterministic: same pixels -> same bytes.  The
    coefficient front half is shared with ``encode_jpeg_progressive``
    via ``_quantized_comp_blocks`` — ONE float pipeline, so the exact
    progressive==baseline decode contract cannot drift."""
    H, W, samp, qtabs, comp_zz = _quantized_comp_blocks(
        img, quality_scale, subsample
    )
    gray = len(samp) == 1
    dc_counts, dc_syms, dc_enc = _flat_huffman(list(range(12)))
    ac_syms = sorted({0x00, 0xF0} | {
        (r << 4) | s for r in range(16) for s in range(1, 11)
    })
    ac_counts, ac_vals, ac_enc = _flat_huffman(ac_syms)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))

    scan_payloads: list[tuple[list[int], bytes]] = []
    if noninterleaved and not gray:
        for ci, (h, v, _tq) in enumerate(samp):
            w = _BitWriter()
            pred = 0
            rst_n = 0
            unit = 0
            nbx = _ceil_div(_ceil_div(W * h, hmax), 8)
            nby = _ceil_div(_ceil_div(H * v, vmax), 8)
            for by in range(nby):
                for bx in range(nbx):
                    if (
                        restart_interval
                        and unit
                        and unit % restart_interval == 0
                    ):
                        rst_n = _emit_restart(w, rst_n)
                        pred = 0
                    unit += 1
                    pred = _encode_block(
                        w, comp_zz[ci][by, bx], pred, dc_enc, ac_enc
                    )
            w.flush()
            scan_payloads.append(([ci], bytes(w.out)))
    else:
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
                    rst_n = _emit_restart(w, rst_n)
                    preds = [0] * len(samp)
                mcu_index += 1
                for ci, (h, v, _tq) in enumerate(samp):
                    for bv in range(v):
                        for bh in range(h):
                            preds[ci] = _encode_block(
                                w,
                                comp_zz[ci][my * v + bv, mx * h + bh],
                                preds[ci],
                                dc_enc,
                                ac_enc,
                            )
        w.flush()
        scan_payloads.append((list(range(len(samp))), bytes(w.out)))

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
    for cis, payload in scan_payloads:
        sos = bytes([len(cis)])
        for ci in cis:
            td_ta = 0x00 if (gray or ci == 0) else 0x11
            sos += bytes([ci + 1, td_ta])
        sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline fixed)
        out += seg(0xDA, sos)
        out += payload
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


# ------------------------------------------------------------------
# Progressive encoder (fixtures — exercises the SOF2 decode path)
# ------------------------------------------------------------------

def _quantized_comp_blocks(img: np.ndarray, quality_scale: int,
                           subsample: bool):
    """Shared front half of both encoders: color transform, optional
    4:2:0 subsampling, MCU padding, 8x8 DCT + quantization.  Returns
    (H, W, samp, qtabs, comp_zz) with comp_zz[ci] an (nby, nbx, 64)
    int64 array in ZIGZAG order over the MCU-padded block grid."""
    if quality_scale < 1:
        raise ValueError(f"quality_scale must be >= 1, got {quality_scale}")
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
    q0 = np.clip(_Q_RAMP * quality_scale, 1, 255)
    q1 = np.clip(_Q_RAMP * quality_scale * 2, 1, 255)
    qtabs = [q0, q1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = _ceil_div(W, 8 * hmax)
    mcus_y = _ceil_div(H, 8 * vmax)
    comp_zz = []
    for px, (h, v, tq) in zip(comps_px, samp):
        ph, pw = mcus_y * v * 8, mcus_x * h * 8
        ch, cw = px.shape
        plane = np.empty((ph, pw))
        plane[:ch, :cw] = px
        if pw > cw:
            plane[:ch, cw:] = px[:, -1:]
        if ph > ch:
            plane[ch:, :] = plane[ch - 1 : ch, :]
        nby, nbx = ph // 8, pw // 8
        q = qtabs[tq]
        zz = np.empty((nby, nbx, 64), dtype=np.int64)
        # per-block, same float associativity as encode_jpeg — a
        # batched einsum reorders the sums and an rint-boundary ulp
        # would put the two encoders one quantization step apart
        for by in range(nby):
            for bx in range(nbx):
                block = (
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                )
                coef = _DCT @ block @ _DCT.T
                zz[by, bx] = np.rint(
                    coef.reshape(64)[ZIGZAG] / q[ZIGZAG]
                ).astype(np.int64)
        comp_zz.append(zz)
    return H, W, samp, qtabs, comp_zz


def encode_jpeg_progressive(
    img: np.ndarray,
    *,
    quality_scale: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode as a progressive (SOF2) JPEG with a libjpeg-style scan
    script: DC first (Al=1) -> luma AC 1-5 then 6-63 at Al=2 -> chroma
    AC at Al=1 -> luma AC refinements (2->1) -> DC refinement -> final
    AC refinements (->0), exercising spectral selection, successive
    approximation, EOB runs, ZRL-in-refinement and buffered correction
    bits (T.81 G.1.2).  Same quantized coefficients as ``encode_jpeg``,
    so ``decode_jpeg(encode_jpeg_progressive(x)) ==
    decode_jpeg(encode_jpeg(x))`` EXACTLY — the pytest contract.
    Fixture-grade: optimized for determinism, not speed."""
    H, W, samp, qtabs, comp_zz = _quantized_comp_blocks(
        img, quality_scale, subsample
    )
    gray = len(samp) == 1
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = _ceil_div(W, 8 * hmax)
    mcus_y = _ceil_div(H, 8 * vmax)

    dc_counts, dc_syms, dc_enc = _flat_huffman(list(range(12)))
    ac_syms = sorted(
        {(r << 4) for r in range(16)}
        | {(r << 4) | s for r in range(16) for s in range(1, 11)}
    )
    ac_counts, ac_vals, ac_enc = _flat_huffman(ac_syms)

    def nonint_grid(ci: int) -> tuple[int, int]:
        h, v, _tq = samp[ci]
        return (
            _ceil_div(_ceil_div(H * v, vmax), 8),
            _ceil_div(_ceil_div(W * h, hmax), 8),
        )

    def emit_sym(w: _BitWriter, enc: dict, sym: int) -> None:
        ln, code = enc[sym]
        w.write(code, ln)

    def dc_groups() -> list[list[tuple[int, int, int]]]:
        """DC-scan restart units: one (ci, by, bx) block per unit in
        the single-component (non-interleaved) case, one MCU's worth
        of blocks per unit otherwise — ONE definition, shared by the
        first and refinement scans, because the decoder's DC path must
        mirror this order exactly."""
        if gray:
            nby, nbx = nonint_grid(0)
            return [
                [(0, by, bx)] for by in range(nby) for bx in range(nbx)
            ]
        groups = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                g = []
                for ci, (h, v, _tq) in enumerate(samp):
                    for bv in range(v):
                        for bh in range(h):
                            g.append((ci, my * v + bv, mx * h + bh))
                groups.append(g)
        return groups

    def dc_first_scan(al: int) -> bytes:
        w = _BitWriter()
        preds = [0] * len(samp)
        rst_n = 0
        unit = 0
        for g in dc_groups():
            if restart_interval and unit and unit % restart_interval == 0:
                rst_n = _emit_restart(w, rst_n)
                preds = [0] * len(samp)
            unit += 1
            for ci, by, bx in g:
                t2 = int(comp_zz[ci][by, bx, 0]) >> al
                diff = t2 - preds[ci]
                preds[ci] = t2
                s, off = _magnitude(diff)
                emit_sym(w, dc_enc, s)
                if s:
                    w.write(off, s)
        w.flush()
        return bytes(w.out)

    def dc_refine_scan(al: int) -> bytes:
        w = _BitWriter()
        rst_n = 0
        unit = 0
        for g in dc_groups():
            if restart_interval and unit and unit % restart_interval == 0:
                rst_n = _emit_restart(w, rst_n)
            unit += 1
            for ci, by, bx in g:
                w.write((int(comp_zz[ci][by, bx, 0]) >> al) & 1, 1)
        w.flush()
        return bytes(w.out)

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        w = _BitWriter()
        eobrun = 0
        rst_n = 0
        unit = 0

        def emit_eobrun() -> None:
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                emit_sym(w, ac_enc, nbits << 4)
                if nbits:
                    w.write(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0

        nby, nbx = nonint_grid(ci)
        zzc = comp_zz[ci]
        for by in range(nby):
            for bx in range(nbx):
                if (
                    restart_interval
                    and unit
                    and unit % restart_interval == 0
                ):
                    emit_eobrun()
                    rst_n = _emit_restart(w, rst_n)
                unit += 1
                zz = zzc[by, bx]
                r = 0
                for k in range(ss, se + 1):
                    a = int(zz[k])
                    v2 = -((-a) >> al) if a < 0 else (a >> al)
                    if v2 == 0:
                        r += 1
                        continue
                    emit_eobrun()
                    while r > 15:
                        emit_sym(w, ac_enc, 0xF0)
                        r -= 16
                    s, off = _magnitude(v2)
                    emit_sym(w, ac_enc, (r << 4) | s)
                    w.write(off, s)
                    r = 0
                if r:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        emit_eobrun()
        emit_eobrun()
        w.flush()
        return bytes(w.out)

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        w = _BitWriter()
        eobrun = 0
        pending: list[int] = []  # correction bits deferred past EOBn
        rst_n = 0
        unit = 0

        def emit_eobrun() -> None:
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                emit_sym(w, ac_enc, nbits << 4)
                if nbits:
                    w.write(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0
            for bit in pending:
                w.write(bit, 1)
            pending.clear()

        nby, nbx = nonint_grid(ci)
        zzc = comp_zz[ci]
        for by in range(nby):
            for bx in range(nbx):
                if (
                    restart_interval
                    and unit
                    and unit % restart_interval == 0
                ):
                    emit_eobrun()
                    rst_n = _emit_restart(w, rst_n)
                unit += 1
                zz = zzc[by, bx]
                absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                eob_k = ss - 1
                for k in range(ss, se + 1):
                    if absv[k - ss] == 1:
                        eob_k = k
                r = 0
                br: list[int] = []  # this block's buffered bits
                for k in range(ss, se + 1):
                    temp = absv[k - ss]
                    if temp == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob_k:
                        emit_eobrun()
                        emit_sym(w, ac_enc, 0xF0)
                        r -= 16
                        for bit in br:
                            w.write(bit, 1)
                        br = []
                    if temp > 1:
                        br.append(temp & 1)
                        continue
                    emit_eobrun()
                    emit_sym(w, ac_enc, (r << 4) | 1)
                    w.write(1 if int(zz[k]) > 0 else 0, 1)
                    for bit in br:
                        w.write(bit, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    pending.extend(br)
                    if eobrun == 0x7FFF or len(pending) > 900:
                        emit_eobrun()
        emit_eobrun()
        w.flush()
        return bytes(w.out)

    # libjpeg-style scan script (components are 0-indexed ci here,
    # 1-indexed ids in the stream)
    scans: list[tuple[list[int], int, int, int, int, bytes]] = []
    all_cis = list(range(len(samp)))
    scans.append((all_cis, 0, 0, 0, 1, dc_first_scan(1)))
    scans.append(([0], 1, 5, 0, 2, ac_first_scan(0, 1, 5, 2)))
    scans.append(([0], 6, 63, 0, 2, ac_first_scan(0, 6, 63, 2)))
    if not gray:
        scans.append(([1], 1, 63, 0, 1, ac_first_scan(1, 1, 63, 1)))
        scans.append(([2], 1, 63, 0, 1, ac_first_scan(2, 1, 63, 1)))
    scans.append(([0], 1, 63, 2, 1, ac_refine_scan(0, 1, 63, 1)))
    scans.append((all_cis, 0, 0, 1, 0, dc_refine_scan(0)))
    scans.append(([0], 1, 63, 1, 0, ac_refine_scan(0, 1, 63, 0)))
    if not gray:
        scans.append(([1], 1, 63, 1, 0, ac_refine_scan(1, 1, 63, 0)))
        scans.append(([2], 1, 63, 1, 0, ac_refine_scan(2, 1, 63, 0)))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qtabs[: 1 if gray else 2]):
        out += seg(0xDB, bytes([tq]) + bytes(int(x) for x in q[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, H, W, len(samp))
    for ci, (h, v, tq) in enumerate(samp):
        sof += bytes([ci + 1, (h << 4) | v, tq])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for cis, ss, se, ah, al, payload in scans:
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        out += payload
    out += b"\xff\xd9"
    return bytes(out)
