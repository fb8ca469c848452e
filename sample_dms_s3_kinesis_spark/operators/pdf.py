"""From-scratch PDF text-layer extraction (and the fixture writer).

A meaningful share of real crawl 200s are ``application/pdf`` — before
r15 those either garbage-ingested (pre-MIME-gate) or quarantined
(post-gate).  This module gives the pipeline a text path: a pure-
Python, stdlib-only (zlib) PDF parser that walks the object graph,
inflates FlateDecode content streams, and replays the text-showing
operators (Tj / ' / " / TJ) in page order — the same from-scratch
codec pattern as :mod:`.jpeg` and :mod:`.png` (reference parity:
the reference sample ships no engine code; this is the training-data
north-star layer).

Scope, by design:
- text-LAYER only: string encodings (literal + hex, UTF-16BE BOM
  honored, else Latin-1 ≈ PDFDocEncoding for the printable range)
  plus per-font ``/ToUnicode`` CMaps (bfchar/bfrange, Tf-tracked —
  subset-font private codes, the dominant real-crawl shape, decode to
  real Unicode; fonts without a CMap keep the byte conventions); no
  glyph/layout reconstruction — line structure comes from the
  text-positioning operators (Td/TD/T*/'/\"), page structure from the
  page tree.
- encrypted documents (``/Encrypt`` in the trailer) raise
  :class:`EncryptedPdfError`; Flate, LZW (TIFF-variant incl.
  EarlyChange), ASCIIHex and ASCII85 stream filters decode — anything
  else (DCT/JBIG2/JPX image codecs) raises
  ``NotImplementedError`` — callers route both to the error channel,
  never a silent empty string.
- a parseable document whose pages show NO text (scanned/image-only)
  reports ``error='image_only'`` — distinct from a truncated parse.

The writer (:func:`encode_pdf`) produces deterministic single-xref
PDFs (optionally uncompressed → pure-ASCII output that survives the
text-based WARC reader) and exists so tests and fixture queries can
roundtrip arbitrary corpus text without any PDF library in the
container.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

__all__ = [
    "EncryptedPdfError",
    "encode_pdf",
    "decode_pdf_text",
    "extract_pdf_text",
]


class EncryptedPdfError(Exception):
    """The document declares /Encrypt — content streams are ciphertext
    and a text walk would emit garbage; callers route to the error
    channel (the reference pattern: exceptions table, never silent)."""


# ---------------------------------------------------------------- writer

_LIT_ESCAPES = {
    ord("\\"): b"\\\\",
    ord("("): b"\\(",
    ord(")"): b"\\)",
    ord("\n"): b"\\n",
    ord("\r"): b"\\r",
    ord("\t"): b"\\t",
    ord("\b"): b"\\b",
    ord("\f"): b"\\f",
}


def _pdf_string(line: str) -> bytes:
    """One text line as a PDF string object: literal ``(...)`` when the
    line is printable Latin-1, else a UTF-16BE hex string with BOM
    (what real writers emit for non-Latin text)."""
    try:
        raw = line.encode("latin-1")
        printable = all(0x20 <= b <= 0x7E for b in raw)
    except UnicodeEncodeError:
        raw, printable = b"", False
    if printable:
        out = bytearray(b"(")
        for b in raw:
            out += _LIT_ESCAPES.get(b, bytes([b]))
        out += b")"
        return bytes(out)
    payload = b"\xfe\xff" + line.encode("utf-16-be")
    return b"<" + payload.hex().upper().encode() + b">"


def _page_stream(text: str) -> bytes:
    """Content stream for one page: one Tj per line, T* line moves."""
    parts = [b"BT", b"/F1 12 Tf", b"14 TL", b"72 720 Td"]
    for i, line in enumerate(text.split("\n")):
        if i > 0:
            parts.append(b"T*")
        parts.append(_pdf_string(line) + b" Tj")
    parts.append(b"ET")
    return b"\n".join(parts)


def encode_pdf(
    pages: list[str],
    *,
    compress: bool = True,
    encrypted: bool = False,
    filter_name: str | None = None,
) -> bytes:
    """Serialize ``pages`` (one text string per page, ``\\n`` = line
    break) as a complete single-xref PDF.

    ``compress=False`` emits uncompressed content streams — the whole
    file is then pure ASCII (when the text is), which survives
    text-mode transports (the WARC reader reads payloads as UTF-8
    strings).  ``encrypted=True`` stamps an /Encrypt entry into the
    trailer (fixture for the error channel — the streams are NOT
    actually enciphered, the flag alone must reject).  ``filter_name``
    overrides the declared stream filter (fixture for the
    unsupported-filter channel)."""
    objects: dict[int, bytes] = {}
    n = len(pages)
    font_num = 3 + 2 * n
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    for i, text in enumerate(pages):
        page_num, content_num = 3 + 2 * i, 4 + 2 * i
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {content_num} 0 R >>"
        ).encode()
        data = _page_stream(text)
        if compress:
            data = zlib.compress(data, 9)
            filt = filter_name or "FlateDecode"
            head = f"<< /Length {len(data)} /Filter /{filt} >>"
        elif filter_name:
            head = f"<< /Length {len(data)} /Filter /{filter_name} >>"
        else:
            head = f"<< /Length {len(data)} >>"
        objects[content_num] = (
            head.encode() + b"\nstream\n" + data + b"\nendstream"
        )
    objects[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    if encrypted:
        enc_num = font_num + 1
        objects[enc_num] = b"<< /Filter /Standard /V 1 /R 2 >>"

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    count = max(objects) + 1
    out += f"xref\n0 {count}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, count):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    trailer = f"<< /Size {count} /Root 1 0 R"
    if encrypted:
        trailer += f" /Encrypt {font_num + 1} 0 R"
    trailer += " >>"
    out += (
        b"trailer\n" + trailer.encode()
        + f"\nstartxref\n{xref_at}\n%%EOF\n".encode()
    )
    return bytes(out)


# ---------------------------------------------------------------- parser

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Minimal PDF object lexer over a bytes buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek_keyword(self, kw: bytes) -> bool:
        self._skip_ws()
        return self.data.startswith(kw, self.pos)

    def parse_object(self):
        """One PDF object: dict, array, string, name, number, bool,
        null, or an indirect reference tuple ('ref', num)."""
        self._skip_ws()
        d = self.data
        p = self.pos
        if p >= len(d):
            raise ValueError("unexpected end of PDF data")
        c = d[p]
        if d.startswith(b"<<", p):
            return self._parse_dict()
        if c == 0x3C:  # '<' hex string
            return self._parse_hex_string()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x5B:  # '['
            return self._parse_array()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if d.startswith(b"true", p):
            self.pos = p + 4
            return True
        if d.startswith(b"false", p):
            self.pos = p + 5
            return False
        if d.startswith(b"null", p):
            self.pos = p + 4
            return None
        return self._parse_number_or_ref()

    def _parse_dict(self) -> dict:
        self.pos += 2
        out: dict[str, object] = {}
        while True:
            self._skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            key = self._parse_name()
            out[key] = self.parse_object()

    def _parse_array(self) -> list:
        self.pos += 1
        out: list = []
        while True:
            self._skip_ws()
            if self.data[self.pos] == 0x5D:  # ']'
                self.pos += 1
                return out
            out.append(self.parse_object())

    def _parse_name(self) -> str:
        assert self.data[self.pos] == 0x2F
        self.pos += 1
        start = self.pos
        d, n = self.data, len(self.data)
        while self.pos < n and d[self.pos] not in _WS and d[
            self.pos
        ] not in _DELIM:
            self.pos += 1
        raw = d[start : self.pos]
        # #xx hex escapes in names
        return re.sub(
            rb"#([0-9A-Fa-f]{2})",
            lambda m: bytes([int(m.group(1), 16)]),
            raw,
        ).decode("latin-1")

    def _parse_literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        while depth:
            c = d[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                e = d[self.pos]
                self.pos += 1
                if e == ord("n"):
                    out += b"\n"
                elif e == ord("r"):
                    out += b"\r"
                elif e == ord("t"):
                    out += b"\t"
                elif e == ord("b"):
                    out += b"\b"
                elif e == ord("f"):
                    out += b"\f"
                elif e in b"0123456789"[:8]:
                    oct_digits = bytes([e])
                    while (
                        len(oct_digits) < 3
                        and d[self.pos : self.pos + 1].isdigit()
                        and d[self.pos] < 0x38
                    ):
                        oct_digits += d[self.pos : self.pos + 1]
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and d[self.pos : self.pos + 1] == b"\n":
                        self.pos += 1
                else:
                    out.append(e)
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth:
                    out.append(c)
            else:
                out.append(c)
        return bytes(out)

    def _parse_hex_string(self) -> bytes:
        end = self.data.index(b">", self.pos)
        hx = re.sub(rb"\s+", b"", self.data[self.pos + 1 : end])
        self.pos = end + 1
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))

    def _parse_number_or_ref(self):
        d = self.data
        start = self.pos
        n = len(d)
        while self.pos < n and d[self.pos] not in _WS and d[
            self.pos
        ] not in _DELIM:
            self.pos += 1
        tok = d[start : self.pos]
        # 'N G R' indirect reference lookahead
        m = re.match(rb"^\d+$", tok)
        if m:
            save = self.pos
            self._skip_ws()
            m2 = re.match(rb"(\d+)\s+R\b", d[self.pos :])
            if m2:
                self.pos += m2.end()
                return ("ref", int(tok))
            self.pos = save
            return int(tok)
        try:
            return float(tok) if b"." in tok else int(tok)
        except ValueError:
            return ("op", tok.decode("latin-1", "replace"))


def _scan_objects(data: bytes) -> dict[int, tuple[dict | object, bytes | None]]:
    """All indirect objects: num -> (value, stream_bytes|None).

    Object bodies are parsed with the real lexer; stream payloads are
    skipped via their /Length (direct or resolved in a second pass),
    falling back to an `endstream` search — and header-shaped byte
    runs ('N 0 obj') INSIDE a known stream range are skipped too
    (r15 review sweep #2: binary stream content could otherwise mint
    a spurious object that first-occurrence-shadows the real one), so
    stream content can never desynchronize the scan.  The one residual
    gap: a stream with an unresolvable indirect /Length is bounded by
    the first 'endstream' byte-run, which binary content could fake —
    such a document degrades to a parse error, never a wrong page."""
    objects: dict[int, tuple[object, bytes | None]] = {}
    pending_len: list[tuple[int, dict, int]] = []
    resume_pos = 0
    for m in _OBJ_HEAD_RE.finditer(data):
        if m.start() < resume_pos:
            continue  # header-shaped bytes inside a stream payload
        num = int(m.group(1))
        lex = _Lexer(data, m.end())
        try:
            val = lex.parse_object()
        except (ValueError, IndexError, AssertionError):
            continue
        stream: bytes | None = None
        lex._skip_ws()
        if data.startswith(b"stream", lex.pos):
            p = lex.pos + len(b"stream")
            if data.startswith(b"\r\n", p):
                p += 2
            elif data.startswith(b"\n", p):
                p += 1
            length = val.get("Length") if isinstance(val, dict) else None
            if isinstance(length, int):
                stream = data[p : p + length]
                resume_pos = p + length
            elif isinstance(length, tuple) and length[0] == "ref":
                pending_len.append((num, val, p))
                stream = b""
                end = data.find(b"endstream", p)
                resume_pos = end if end >= 0 else len(data)
            else:
                end = data.find(b"endstream", p)
                stream = data[p:end] if end >= 0 else data[p:]
                resume_pos = end if end >= 0 else len(data)
        if num not in objects:
            objects[num] = (val, stream)
    for num, val, p in pending_len:
        ref = val["Length"]
        length_obj = objects.get(ref[1])
        if length_obj and isinstance(length_obj[0], int):
            objects[num] = (val, data[p : p + length_obj[0]])
        else:
            end = data.find(b"endstream", p)
            objects[num] = (val, data[p:end] if end >= 0 else data[p:])
    return objects


def _expand_object_streams(objects: dict) -> None:
    """Surface objects stored INSIDE /Type /ObjStm compressed object
    streams (the PDF 1.5+ packaging most modern writers use for the
    catalog/page dicts): inflate each object stream, read the N
    (obj-num, offset) header pairs before /First, and lex each
    embedded object into the table.  Directly-defined objects win on
    collision (a hostile ObjStm must not shadow a real object);
    streams that fail to inflate or parse are skipped — their objects
    stay missing and the document degrades to a parse error, never a
    wrong page.  Objects inside an ObjStm carry no streams (spec)."""
    for num, (val, stream) in list(objects.items()):
        if not (
            isinstance(val, dict)
            and val.get("Type") == "ObjStm"
            and stream is not None
        ):
            continue
        try:
            data = _decode_stream(val, stream, objects)
        except (NotImplementedError, zlib.error, ValueError):
            continue
        n = _resolve(objects, val.get("N"))
        first = _resolve(objects, val.get("First"))
        if not isinstance(n, int) or not isinstance(first, int):
            continue
        lex = _Lexer(data[:first])
        pairs: list[tuple[int, int]] = []
        try:
            for _ in range(n):
                onum = lex.parse_object()
                ooff = lex.parse_object()
                if isinstance(onum, int) and isinstance(ooff, int):
                    pairs.append((onum, ooff))
        except (ValueError, IndexError):
            pass
        for onum, ooff in pairs:
            if onum in objects:
                continue
            try:
                obj = _Lexer(data, first + ooff).parse_object()
            except (ValueError, IndexError):
                continue
            objects[onum] = (obj, None)


def _trailer_dicts(data: bytes) -> Iterator[dict]:
    for m in re.finditer(rb"trailer\b", data):
        lex = _Lexer(data, m.end())
        try:
            val = lex.parse_object()
        except (ValueError, IndexError):
            continue
        if isinstance(val, dict):
            yield val


def _resolve(objects: dict, v):
    # bounded walk (r15 second sweep #2): a hostile `1 0 obj 1 0 R
    # endobj` self/cycle reference would otherwise spin forever inside
    # an executor — every other hostile input degrades to the error
    # channel, so must this one (None reads as "unresolvable")
    for _ in range(64):
        if not (isinstance(v, tuple) and len(v) == 2 and v[0] == "ref"):
            return v
        entry = objects.get(v[1])
        v = entry[0] if entry else None
    return None


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode (the TIFF LZW variant): 9->12-bit growing codes,
    Clear=256 / EOD=257, ``EarlyChange`` widening one code early by
    default.  Pure Python — LZW shows up in older real-crawl PDFs and
    was a documented reject channel before r15."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    bitpos = 0
    total = len(data) * 8
    prev: bytes | None = None
    while bitpos + width <= total:
        code = 0
        for _ in range(width):
            code = (code << 1) | (
                (data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1
            )
            bitpos += 1
        if code == 256:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == 257:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad LZW start code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("bad LZW code")
        out += entry
        prev = entry
        # widening: the DECODER's table lags the encoder's by one
        # entry (the encoder adds when it emits; the decoder adds one
        # code later), so it widens at table size
        # 2^width - EarlyChange - 1 — i.e. len(table) + early + 1 >=
        # 2^width (r15 third sweep #1: the previous offset desynced
        # real encoder output past the 9->10 boundary, and the test's
        # encoder twin replicated the same offset, masking it;
        # verified empirically against a reset-capable canonical
        # encoder in both EarlyChange modes across all boundaries)
        if len(table) + early + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _ascii_hex_decode(data: bytes) -> bytes:
    body = data.split(b">", 1)[0]
    hx = re.sub(rb"\s+", b"", body)
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    import base64

    body = re.sub(rb"\s+", b"", data)
    if body.startswith(b"<~"):
        body = body[2:]
    if body.endswith(b"~>"):
        body = body[:-2]
    return base64.a85decode(body)


def _apply_predictor(data: bytes, pred: int, pm: dict) -> bytes:
    """Undo a /Predictor post-filter (PDF spec 7.4.4.4): TIFF
    horizontal differencing (2) and the PNG row filters (10-15 —
    what xref streams actually use), reusing :mod:`.png`'s
    reconstruction for the PNG family."""
    cols = pm.get("Columns", 1)
    colors = pm.get("Colors", 1)
    bpc = pm.get("BitsPerComponent", 8)
    if not all(isinstance(v, int) and v > 0 for v in (cols, colors, bpc)):
        raise ValueError("bad predictor parameters")
    if pred == 2:
        if bpc != 8:
            raise NotImplementedError(
                "TIFF predictor with BitsPerComponent != 8"
            )
        stride = cols * colors
        out = bytearray(data)
        for r in range(0, len(out) - stride + 1, stride):
            for i in range(colors, stride):
                out[r + i] = (out[r + i] + out[r + i - colors]) & 0xFF
        return bytes(out)
    if 10 <= pred <= 15:
        from sample_dms_s3_kinesis_spark.operators.png import _unfilter

        bpp = max(1, (colors * bpc) // 8)
        stride = (cols * colors * bpc + 7) // 8
        rowlen = stride + 1
        h = len(data) // rowlen
        if h == 0:
            return data
        return _unfilter(data[: h * rowlen], stride, h, bpp).tobytes()
    raise NotImplementedError(f"unsupported stream predictor: {pred}")


def _decode_stream(
    sdict: dict, raw: bytes, objects: dict | None = None
) -> bytes:
    def _res(v):
        return _resolve(objects, v) if objects is not None else v

    filt = _res(sdict.get("Filter"))
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    parms = _res(sdict.get("DecodeParms") or sdict.get("DP"))
    if isinstance(parms, list):
        # PAD a short DecodeParms array (r15 third sweep #3: zip
        # truncation silently skipped trailing filters and returned
        # partially-decoded bytes as content)
        plist = list(parms) + [None] * (len(filters) - len(parms))
    else:
        plist = [parms] * len(filters)
    out = raw
    for f, pm in zip(filters, plist):
        pm = _res(pm)
        pm = pm if isinstance(pm, dict) else {}
        if f == "FlateDecode":
            out = zlib.decompress(out)
        elif f == "LZWDecode":
            early = pm.get("EarlyChange", 1)
            out = _lzw_decode(
                out, early if isinstance(early, int) else 1
            )
        elif f == "ASCIIHexDecode" or f == "AHx":
            out = _ascii_hex_decode(out)
        elif f == "ASCII85Decode" or f == "A85":
            out = _ascii85_decode(out)
        else:
            raise NotImplementedError(f"unsupported stream filter: {f}")
        pred = pm.get("Predictor", 1)
        if isinstance(pred, int) and pred > 1:
            # predictors post-process the DECODED bytes (spec order)
            out = _apply_predictor(out, pred, pm)
    return out


def _pdf_text_bytes(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", "replace")
    return b.decode("latin-1")


# text-showing / positioning operators replayed by the extractor
_TEXT_OPS = frozenset(["Tj", "'", '"', "TJ"])
_NEWLINE_OPS = frozenset(["Td", "TD", "T*"])

# ------------------------------------------------ /ToUnicode CMaps
# Real crawl PDFs overwhelmingly embed SUBSET fonts whose show-string
# bytes are font-private codes, not Latin-1 — without the font's
# /ToUnicode CMap the "text" is garbage.  The CMap is itself a small
# PostScript-ish stream: codespacerange fixes the code byte width,
# bfchar/bfrange map codes to UTF-16BE Unicode.

_CS_RANGE_RE = re.compile(
    rb"begincodespacerange(.*?)endcodespacerange", re.S
)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_TOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _parse_tounicode(data: bytes) -> tuple[int, dict[int, str]]:
    """(code_width_bytes, {code -> unicode string}) from a /ToUnicode
    CMap stream.  Handles bfchar, scalar bfrange, and array-form
    bfrange; width comes from the first codespacerange token (2 the
    overwhelming real-world default when absent)."""
    width = 2
    m = _CS_RANGE_RE.search(data)
    if m:
        toks = _HEX_TOK_RE.findall(m.group(1))
        if toks:
            width = max(1, len(toks[0]) // 2)

    def _u(hx: bytes) -> str:
        raw = bytes.fromhex(hx.decode("ascii"))
        if len(raw) % 2:
            raw = b"\x00" + raw
        return raw.decode("utf-16-be", "replace")

    cmap: dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(data):
        toks = _HEX_TOK_RE.findall(m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            cmap[int(src, 16)] = _u(dst)
    for m in _BFRANGE_RE.finditer(data):
        body = m.group(1)
        # array form: <lo> <hi> [<d1> <d2> ...]
        for am in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]",
            body,
            re.S,
        ):
            lo, hi = int(am.group(1), 16), int(am.group(2), 16)
            dsts = _HEX_TOK_RE.findall(am.group(3))
            for i, d in enumerate(dsts):
                if lo + i <= hi:
                    cmap[lo + i] = _u(d)
        # scalar form: <lo> <hi> <dstStart> — strip whole ARRAY
        # entries (src pair INCLUDED) first, or a mixed block's
        # leftover <lo> <hi> tokens shift the scalar triple alignment
        # and silently drop mappings (r15 third sweep #2)
        body2 = re.sub(
            rb"<[0-9A-Fa-f]+>\s*<[0-9A-Fa-f]+>\s*\[.*?\]",
            b"",
            body,
            flags=re.S,
        )
        toks = _HEX_TOK_RE.findall(body2)
        for lo_h, hi_h, d_h in zip(toks[0::3], toks[1::3], toks[2::3]):
            lo, hi = int(lo_h, 16), int(hi_h, 16)
            base = int(d_h, 16)
            # per spec only the LAST byte/code increments; cap the
            # expansion so a hostile 4-GB range cannot OOM the worker
            nbytes = max(2, len(d_h) // 2)
            for i in range(min(hi - lo + 1, 65536)):
                code = lo + i
                try:
                    raw = (base + i).to_bytes(nbytes, "big")
                except OverflowError:
                    break
                cmap.setdefault(code, raw.decode("utf-16-be", "replace"))
    return width, cmap


def _decode_with_cmap(
    b: bytes, width: int, cmap: dict[int, str]
) -> str:
    """Decode a show-string through a font CMap: width-sized codes,
    unmapped codes fall back to their Latin-1 projection (single-byte)
    or U+FFFD (multi-byte) — lossy but never silent garbage."""
    out = []
    for i in range(0, len(b) - width + 1, width):
        code = int.from_bytes(b[i : i + width], "big")
        mapped = cmap.get(code)
        if mapped is not None:
            out.append(mapped)
        elif width == 1:
            out.append(chr(code))
        else:
            out.append("\ufffd")
    return "".join(out)


def _page_text(
    content: bytes,
    fonts: dict[str, tuple[int, dict[int, str]]] | None = None,
) -> tuple[str, int]:
    """Replay the text operators of one page's (concatenated) content
    streams: each Tj/'/\"/TJ appends to the current line; Td/TD/T*
    (and '/\" themselves) start a new line once text has been shown.
    ``fonts`` maps resource font names ('F1') to parsed /ToUnicode
    CMaps; the Tf operator tracks the CURRENT font so each show-string
    decodes through its font's map (fonts without a CMap keep the
    Latin-1 / UTF-16BE-BOM convention).  Returns (text, n_show_ops)."""
    lex = _Lexer(content)
    lines: list[str] = []
    cur: list[str] = []
    shown = 0
    stack: list = []
    cur_font: tuple[int, dict[int, str]] | None = None

    def _txt(b: bytes) -> str:
        if cur_font is not None:
            w, cm = cur_font
            # the UTF-16BE BOM convention wins only when the font does
            # NOT map that code itself (r15 third sweep #7: an explicit
            # mapping must beat the heuristic)
            if b.startswith(b"\xfe\xff") and not (
                w == 2 and 0xFEFF in cm
            ):
                return _pdf_text_bytes(b)
            return _decode_with_cmap(b, w, cm)
        return _pdf_text_bytes(b)

    def _newline():
        if shown:
            lines.append("".join(cur))
            cur.clear()

    while True:
        lex._skip_ws()
        if lex.pos >= len(lex.data):
            break
        try:
            tok = lex.parse_object()
        except (ValueError, IndexError):
            lex.pos += 1
            continue
        if isinstance(tok, tuple) and tok[0] == "op":
            op = tok[1]
            if op == "Tf" and fonts and len(stack) >= 2 and isinstance(
                stack[-2], str
            ):
                cur_font = fonts.get(stack[-2])
            elif op == "Tj" and stack and isinstance(stack[-1], bytes):
                cur.append(_txt(stack[-1]))
                shown += 1
            elif op in ("'", '"') and stack and isinstance(
                stack[-1], bytes
            ):
                _newline()
                cur.append(_txt(stack[-1]))
                shown += 1
            elif op == "TJ" and stack and isinstance(stack[-1], list):
                cur.append(
                    "".join(
                        _txt(e)
                        for e in stack[-1]
                        if isinstance(e, bytes)
                    )
                )
                shown += 1
            elif op in _NEWLINE_OPS:
                _newline()
            stack.clear()
        else:
            stack.append(tok)
    if cur:
        lines.append("".join(cur))
    return "\n".join(lines), shown


def _walk_pages(
    objects: dict,
    node,
    out: list[dict],
    depth: int = 0,
    inherited_res=None,
):
    node = _resolve(objects, node)
    if not isinstance(node, dict) or depth > 64:
        return
    # /Resources is inheritable (PDF spec 7.7.3.4): many writers hang
    # ONE shared dict on the /Pages node — a page without its own
    # entry uses the nearest ancestor's (r15 third sweep #5: without
    # this, shared subset fonts lost their ToUnicode maps silently)
    res = node.get("Resources", inherited_res)
    if node.get("Type") == "Page":
        if "Resources" not in node and res is not None:
            node = {**node, "Resources": res}
        out.append(node)
        return
    for kid in node.get("Kids", []) or []:
        _walk_pages(objects, kid, out, depth + 1, res)


def decode_pdf_text(content: bytes) -> dict:
    """Extract the text layer: ``{"n_pages": int, "pages": [str,...]}``
    in page-tree order.

    Raises :class:`EncryptedPdfError` on /Encrypt,
    ``NotImplementedError`` on stream filters outside the decoded set
    (Flate, LZW, ASCIIHex, ASCII85 — with TIFF/PNG predictors — are
    decoded; DCT/JBIG2/JPX image codecs reject), ``ValueError`` on a
    document with no parseable page tree."""
    if not content.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    objects = _scan_objects(content)
    root = None
    for tr in _trailer_dicts(content):
        if "Encrypt" in tr:
            raise EncryptedPdfError("document declares /Encrypt")
        if "Root" in tr:
            root = tr["Root"]
    # xref-stream documents have no `trailer` keyword: their trailer
    # fields live in the /Type /XRef stream dict — honor an /Encrypt
    # there (r15 review sweep #5: encrypted 1.5+ documents must raise
    # the 'encrypted' channel, not a downstream zlib error), take its
    # /Root, and otherwise fall back to the catalog object itself
    if root is None:
        for num, (val, _) in sorted(objects.items()):
            if isinstance(val, dict) and val.get("Type") == "XRef":
                if "Encrypt" in val:
                    raise EncryptedPdfError(
                        "document declares /Encrypt (xref stream)"
                    )
                if root is None and "Root" in val:
                    root = val["Root"]
    # AFTER the encrypt checks (an encrypted ObjStm would just fail
    # inflate), surface PDF 1.5+ object-stream members — the catalog
    # and page dicts of most modern writers live inside one
    _expand_object_streams(objects)
    if root is None:
        for num, (val, _) in sorted(objects.items()):
            if isinstance(val, dict) and val.get("Type") == "Catalog":
                root = ("ref", num)
                break
    cat = _resolve(objects, root)
    if not isinstance(cat, dict) or "Pages" not in cat:
        raise ValueError("no /Root catalog with a /Pages tree")
    pages: list[dict] = []
    _walk_pages(objects, cat["Pages"], pages)
    if not pages:
        raise ValueError("empty page tree")
    texts: list[str] = []
    font_cache: dict[int, tuple[int, dict[int, str]] | None] = {}
    for page in pages:
        contents = page.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        blobs: list[bytes] = []
        for ref in refs:
            if not (isinstance(ref, tuple) and ref[0] == "ref"):
                continue
            entry = objects.get(ref[1])
            if entry is None or entry[1] is None:
                continue
            sdict, raw = entry
            blobs.append(_decode_stream(sdict, raw, objects))
        text, _ = _page_text(
            b"\n".join(blobs), _page_fonts(objects, page, font_cache)
        )
        texts.append(text)
    return {"n_pages": len(pages), "pages": texts}


def _page_fonts(
    objects: dict, page: dict, cache: dict | None = None
) -> dict[str, tuple[int, dict[int, str]]]:
    """Parsed /ToUnicode CMaps for a page's font resources: {resource
    name -> (code_width, code->unicode)}.  Fonts without a usable
    /ToUnicode stream are simply absent (their strings keep the
    Latin-1 / UTF-16BE-BOM convention); a broken CMap never fails the
    page.  ``cache`` memoizes parsed CMaps by ToUnicode object number
    across a document's pages (r15 third sweep #6: a 500-page doc
    sharing one font must not inflate+parse the same CMap 500x)."""
    fonts: dict[str, tuple[int, dict[int, str]]] = {}
    res = _resolve(objects, page.get("Resources"))
    if not isinstance(res, dict):
        return fonts
    fdict = _resolve(objects, res.get("Font"))
    if not isinstance(fdict, dict):
        return fonts
    for name, fref in fdict.items():
        fobj = _resolve(objects, fref)
        if not isinstance(fobj, dict):
            continue
        tu = fobj.get("ToUnicode")
        if not (isinstance(tu, tuple) and tu[0] == "ref"):
            continue
        if cache is not None and tu[1] in cache:
            parsed = cache[tu[1]]
            if parsed is not None:
                fonts[name] = parsed
            continue
        entry = objects.get(tu[1])
        parsed = None
        if entry is not None and entry[1] is not None:
            try:
                data = _decode_stream(entry[0], entry[1], objects)
                width, cmap = _parse_tounicode(data)
                if cmap:
                    parsed = (width, cmap)
            except (NotImplementedError, zlib.error, ValueError):
                parsed = None
        if cache is not None:
            cache[tu[1]] = parsed
        if parsed is not None:
            fonts[name] = parsed
    return fonts


# ----------------------------------------------------- HTTP raw payload

def _dechunk_bytes(b: bytes) -> bytes:
    """Decode a Transfer-Encoding: chunked entity at the BYTE level
    (RFC 7230 §4.1; chunk extensions tolerated, trailers ignored)."""
    out = bytearray()
    pos = 0
    while True:
        nl = b.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("bad chunked framing")
        try:
            size = int(b[pos:nl].split(b";", 1)[0].strip(), 16)
        except ValueError:
            raise ValueError("bad chunked framing") from None
        pos = nl + 2
        if size == 0:
            return bytes(out)
        out += b[pos : pos + size]
        if b[pos + size : pos + size + 2] != b"\r\n":
            raise ValueError("bad chunked framing")
        pos += size + 2


def http_entity_bytes(raw: bytes) -> bytes:
    """Entity bytes out of a RAW HTTP response (header block included):
    split at the first CRLFCRLF, then undo Transfer-Encoding: chunked
    and Content-Encoding: gzip/x-gzip/deflate at the byte level — the
    binary twin of the text-path decode in ``sources/crawl.py``
    (which must produce a STRING and therefore mangles binary
    entities like Flate PDFs).  Unsupported codings raise
    ``NotImplementedError`` into the caller's error channel."""
    head, sep, body = raw.partition(b"\r\n\r\n")
    if not sep:
        raise ValueError("no HTTP header block in raw payload")
    hdr = head.decode("latin-1")
    import re as _re

    def _h(name: str) -> str | None:
        m = _re.search(
            rf"(?im)^{name}:[ \t]*([^\r\n]*?)[ \t]*$", hdr
        )
        return m.group(1).lower() if m else None

    te = _h("Transfer-Encoding")
    if te and te != "identity":
        if te != "chunked":
            raise NotImplementedError(
                f"unsupported transfer coding: {te}"
            )
        body = _dechunk_bytes(body)
    ce = _h("Content-Encoding")
    if ce and ce != "identity":
        if ce in ("gzip", "x-gzip"):
            body = zlib.decompress(body, 16 + zlib.MAX_WBITS)
        elif ce == "deflate":
            try:
                body = zlib.decompress(body)
            except zlib.error:
                body = zlib.decompress(body, -zlib.MAX_WBITS)
        else:
            raise NotImplementedError(
                f"unsupported content coding: {ce}"
            )
    return body


# ------------------------------------------------------------- operator

PAGE_SEP = "\n\n"


def extract_pdf_text(
    df,
    *,
    content_col: str = "content",
    id_col: str = "asset_id",
    on_error: str = "null",
    http_col: str | None = None,
):
    """Text-layer extraction over a binary PDF column via mapInPandas
    (Arrow batches — the multimodal pattern, never per-row Python).

    Output: ``(id_col, n_pages int, text string, error string)`` —
    ``error`` is NULL on success, ``'encrypted'`` / ``'image_only'`` /
    ``'unsupported_filter: ...'`` / the parse failure otherwise (text
    NULL on every error).  ``on_error='fail'`` re-raises instead (CI
    mode).  ``http_col`` names an optional BOOLEAN column: rows where
    it is true carry a RAW HTTP response (header block + codings) and
    run through :func:`http_entity_bytes` first — the binary-WARC
    path is how real crawl PDFs arrive.  Scale shape: embarrassingly
    parallel per-document decode, no shuffle; the 100 TB path is
    partition-count sizing only."""
    import pandas as pd

    if on_error not in ("null", "fail"):
        raise ValueError(f"on_error must be null|fail, got {on_error!r}")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, n_pages, texts, errors = [], [], [], []
            raws = (
                pdf[http_col]
                if http_col is not None
                else [False] * len(pdf)
            )
            for did, blob, is_raw in zip(
                pdf[id_col], pdf[content_col], raws
            ):
                ids.append(did)
                try:
                    if blob is None:
                        raise ValueError("null content")
                    if is_raw:
                        blob = http_entity_bytes(bytes(blob))
                    dec = decode_pdf_text(bytes(blob))
                    joined = PAGE_SEP.join(dec["pages"])
                    if not joined.strip():
                        n_pages.append(dec["n_pages"])
                        texts.append(None)
                        errors.append("image_only")
                    else:
                        n_pages.append(dec["n_pages"])
                        texts.append(joined)
                        errors.append(None)
                except Exception as e:  # noqa: BLE001 — error channel
                    if on_error == "fail":
                        raise
                    n_pages.append(None)
                    texts.append(None)
                    if isinstance(e, EncryptedPdfError):
                        errors.append("encrypted")
                    elif isinstance(e, NotImplementedError):
                        errors.append(str(e))
                    else:
                        errors.append(
                            f"{type(e).__name__}: {str(e)[:120]}"
                        )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_pages": pd.array(n_pages, dtype="Int32"),
                    "text": texts,
                    "error": errors,
                }
            )

    id_field = df.schema[id_col]
    return df.mapInPandas(
        batches,
        schema=(
            f"{id_col} {id_field.dataType.simpleString()}, "
            "n_pages int, text string, error string"
        ),
    )


def synthesize_pdf_column(
    df,
    *,
    pages_col: str = "pages",
    id_col: str = "doc_id",
    compress: bool = True,
):
    """Fixture builder (the `synthetic_assets` pattern): turn an
    ``array<string>`` pages column into a binary PDF column —
    ``(id_col, content binary)`` — so fixture queries and the WARC
    funnel can roundtrip corpus text through real PDF bytes without
    any PDF library in the container.  ``compress=False`` keeps the
    output pure ASCII for text-mode transports."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf_ in it:
            yield pd.DataFrame(
                {
                    id_col: pdf_[id_col],
                    "content": [
                        encode_pdf(list(pages), compress=compress)
                        for pages in pdf_[pages_col]
                    ],
                }
            )

    id_field = df.schema[id_col]
    return df.mapInPandas(
        batches,
        schema=(
            f"{id_col} {id_field.dataType.simpleString()}, "
            "content binary"
        ),
    )


# ---------------------------------------------------- fixture corpus

def _lzw_encode_fixture(data: bytes, early: int = 1) -> bytes:
    """The canonical TIFF-LZW encoder of record (fixtures AND the
    pytest reference delegate here — exactly one copy, so a future
    boundary fix cannot desynchronize them): Clear first, EOD last,
    EarlyChange widening, Clear-and-reset at a full 12-bit table.
    The DECODER's widening rule was pinned independently via the
    empirical k-offset sweep, so encoder/decoder cannot share a
    hidden off-by-one."""
    out_bits: list[int] = []
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code: int) -> None:
        for b in range(width - 1, -1, -1):
            out_bits.append((code >> b) & 1)

    emit(256)
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code + early >= (1 << width):
            if width < 12:
                width += 1
            else:
                emit(256)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(257)
    while len(out_bits) % 8:
        out_bits.append(0)
    return bytes(
        int("".join(map(str, out_bits[i : i + 8])), 2)
        for i in range(0, len(out_bits), 8)
    )


def _swap_content_stream(doc: bytes, body: bytes, head: bytes) -> bytes:
    """Replace the single uncompressed content stream of an
    encode_pdf(compress=False) document with ``body`` declared via
    ``head`` (the stream-dict text after /Length)."""
    m = re.search(
        rb"<< /Length (\d+) >>\nstream\n(.*?)\nendstream", doc, re.S
    )
    if not m:
        raise ValueError("no uncompressed content stream to swap")
    return (
        doc[: m.start()]
        + b"<< /Length %d %s >>\nstream\n" % (len(body), head)
        + body
        + b"\nendstream"
        + doc[m.end() :]
    )


def _objstm_fixture(text: str) -> bytes:
    """PDF 1.5-style: catalog/pages/page dicts inside a Flate /ObjStm,
    XRef-dict root, no classic trailer."""
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    ]
    body = b""
    offsets = []
    for num, ob in objs:
        offsets.append((num, len(body)))
        body += ob + b"\n"
    header = " ".join(f"{n} {o}" for n, o in offsets).encode() + b"\n"
    stm = zlib.compress(header + body)
    content = _page_stream(text)
    doc = b"%PDF-1.5\n"
    doc += (
        b"7 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d "
        b"/Filter /FlateDecode >>\nstream\n"
        % (len(objs), len(header), len(stm))
        + stm
        + b"\nendstream\nendobj\n"
    )
    doc += (
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream\nendobj\n"
    )
    doc += b"8 0 obj\n<< /Type /XRef /Root 1 0 R >>\nendobj\n%%EOF\n"
    return doc


def _cmap_fixture() -> bytes:
    """Subset font with a /ToUnicode CMap hung on the /Pages node
    (inherited resources): 2-byte private codes -> 'Map OK'."""
    cmap = (
        b"begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"4 beginbfchar\n"
        b"<0001> <004D>\n<0002> <0061>\n<0003> <0070>\n"
        b"<0004> <0020004F004B>\n"
        b"endbfchar\n"
    )
    content = b"BT /F9 12 Tf 72 720 Td <0001000200030004> Tj ET"
    doc = b"%PDF-1.4\n"
    doc += b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    doc += (
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/Resources << /Font << /F9 5 0 R >> >> >>\nendobj\n"
    )
    doc += (
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
        b"\nendobj\n"
    )
    doc += (
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream\nendobj\n"
    )
    doc += (
        b"5 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>"
        b"\nendobj\n"
    )
    doc += (
        b"6 0 obj\n<< /Length %d >>\nstream\n" % len(cmap)
        + cmap
        + b"\nendstream\nendobj\n"
    )
    doc += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return doc


def synthetic_pdf_corpus(spark):
    """One deterministic document per decoder feature — the PDF twin
    of ``multimodal.synthetic_assets``: (asset_id, kind, content).
    Drive through :func:`extract_pdf_text` for a full feature matrix
    (every success text and error channel is fixed by construction —
    `q_pdf_feature_matrix` pins the whole surface with an exact
    hand-derived oracle)."""
    base = "matrix page text"
    stream = _page_stream(base)
    pred_cols = 16
    rows = [stream[i : i + pred_cols] for i in range(0, len(stream), pred_cols)]
    rows[-1] = rows[-1].ljust(pred_cols, b" ")
    pred = bytearray()
    for row in rows:
        pred.append(1)  # PNG Sub
        prev = 0
        for b in row:
            pred.append((b - prev) & 0xFF)
            prev = b
    import base64

    plain = encode_pdf(["plain alpha page"])
    docs = [
        ("plain", plain),
        ("multipage", encode_pdf(["page one text", "page two text"])),
        ("unicode", encode_pdf(["café 中文 页面"])),
        ("uncompressed_ascii", encode_pdf(["ascii body"], compress=False)),
        ("objstm", _objstm_fixture("objstm body text")),
        ("cmap_subset_font", _cmap_fixture()),
        (
            "lzw",
            _swap_content_stream(
                encode_pdf([base], compress=False),
                _lzw_encode_fixture(stream),
                b"/Filter /LZWDecode",
            ),
        ),
        (
            "ascii85",
            _swap_content_stream(
                encode_pdf([base], compress=False),
                base64.a85encode(stream) + b"~>",
                b"/Filter /ASCII85Decode",
            ),
        ),
        (
            "hex_flate_chain",
            _swap_content_stream(
                encode_pdf([base], compress=False),
                zlib.compress(stream).hex().encode() + b">",
                b"/Filter [/ASCIIHexDecode /FlateDecode]",
            ),
        ),
        (
            "png_predictor",
            _swap_content_stream(
                encode_pdf([base], compress=False),
                zlib.compress(bytes(pred)),
                b"/Filter /FlateDecode /DecodeParms "
                b"<< /Predictor 12 /Columns 16 >>",
            ),
        ),
        ("encrypted", encode_pdf(["secret"], encrypted=True)),
        (
            "unsupported_filter",
            encode_pdf(["z"], filter_name="DCTDecode"),
        ),
        (
            "image_only",
            _swap_content_stream(
                encode_pdf([""], compress=False),
                b"0 0 100 100 re f",
                b"",
            ),
        ),
        ("not_a_pdf", b"GIF89a definitely not a pdf"),
    ]
    return spark.createDataFrame(
        [(i, kind, bytearray(blob)) for i, (kind, blob) in enumerate(docs)],
        "asset_id int, kind string, content binary",
    )
