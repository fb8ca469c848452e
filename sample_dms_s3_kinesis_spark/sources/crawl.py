"""Crawl-container ingestion: WARC and JSON-lines readers.

The LLM-data layer's curation operators (``operators/text.py``
``html_extract``, ``operators/urls.py`` domain caps, the
``CorpusIngestTask`` admission gates) all assume the page/document is
already a DataFrame column.  Real crawl corpora arrive in CONTAINERS —
Common-Crawl-style WARC files or JSON-lines dumps — so this module is
the actual first step of the RefinedWeb/C4-shaped pipeline: container
bytes in, one row per record out, rejects on a side channel.

Reference parity: the reference ingests containerized change files from
object storage and binds them to rows schema-on-read
(/root/reference/run.py:162-164 stages LOADnnn.csv objects;
/root/reference/stack.py:176-182 declares the external table the files
bind to).  The crawl readers keep that shape — path in, bound rows +
exceptions channel out — for web-crawl containers.

Scale notes:
- Both readers are pure Catalyst (text source + ``from_json`` /
  ``regexp_extract``): no Python in the row path, whole-stage codegen
  end to end, and they work identically under ``spark.read`` and
  ``spark.readStream`` (pass ``streaming=True``).
- WARC records are folded out of the text source with a custom record
  delimiter (``lineSep = "WARC/1.0\\r\\n"``).  Hadoop's line reader
  aligns split starts to the NEXT delimiter and reads records that
  span split ends to completion, so uncompressed WARC splits cleanly
  at ``spark.sql.files.maxPartitionBytes`` with no record straddling
  bugs.  ``.warc.gz`` is a non-splittable codec: there the FILE is the
  parallel unit (Common Crawl ships ~1 GB files, which parallelizes
  fine at file granularity on a large cluster).
- The readers target TEXT entities (UTF-8 HTML/JSON — the curation
  case), but real-crawl HTTP encodings around them ARE handled:
  ``warc_responses`` decodes ``Transfer-Encoding: chunked`` bodies in
  pure Catalyst on BOTH readers' output, and ``Content-Encoding:
  gzip``/``deflate`` (incl. chunked+compressed) via one Arrow-batched
  decompressor UDF when the record bytes survive — i.e. through
  ``read_warc_gz(binary_payload=True)``; through the text source
  compressed bytes are already mangled and such records honestly
  reject (``body = NULL``).  Truly binary entities (images in WARC)
  remain out of scope.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------
# JSON-lines
# --------------------------------------------------------------------


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    streaming: bool = False,
    options: dict | None = None,
) -> DataFrame:
    """Read JSON-lines files under ``path`` with an EXPLICIT schema.

    Returns one row per non-blank line with the schema's fields plus
    ``_raw_line`` (the original line) and ``_corrupt`` (true when the
    line failed to parse — those rows have NULL in every schema field
    and are split out by :func:`jsonl_rejects`).

    Implementation is ``text`` source + ``from_json`` rather than the
    JSON source's top-level corrupt-record channel: identical JVM
    parser, but the raw line is retained for the rejects channel and
    the corrupt split has none of the JSON source's restrictions on
    referencing the corrupt column alone.  Corruption is detected via
    ``from_json``'s own ``columnNameOfCorruptRecord`` field (PERMISSIVE
    mode fills it for malformed lines AND for type-mismatched fields —
    an all-null parse is indistinguishable from corrupt otherwise).
    The schema is always explicit — schema INFERENCE is a second full
    pass over the corpus and is never acceptable at scale (same rule
    as the CSV source).
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    cr = "_crawl_corrupt_record"
    if cr in schema.fieldNames():
        raise ValueError(f"schema field name {cr!r} is reserved")
    # NOT schema.add(...): StructType.add mutates the receiver, which
    # would leak the probe field into the caller's schema and ours
    probe = T.StructType(
        list(schema.fields) + [T.StructField(cr, T.StringType())]
    )
    reader = spark.readStream if streaming else spark.read
    lines = reader.options(**(options or {})).text(path)
    parsed = (
        lines.filter(F.col("value") != "")
        .select(
            F.col("value").alias("_raw_line"),
            F.from_json(
                F.col("value"),
                probe,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": cr},
            ).alias("_rec"),
        )
        .select(
            *[F.col(f"_rec.{f}") for f in schema.fieldNames()],
            "_raw_line",
            F.col(f"_rec.{cr}").isNotNull().alias("_corrupt"),
        )
    )
    return parsed


def jsonl_records(df: DataFrame) -> DataFrame:
    """The admitted side of :func:`read_jsonl`: parsed rows, container
    plumbing columns dropped."""
    return df.filter(~F.col("_corrupt")).drop("_raw_line", "_corrupt")


def jsonl_rejects(df: DataFrame) -> DataFrame:
    """The exceptions channel of :func:`read_jsonl`: unparseable lines,
    raw text preserved — the crawl twin of the CDC exceptions table."""
    return df.filter(F.col("_corrupt")).select("_raw_line")


# --------------------------------------------------------------------
# CDX (crawl index)
# --------------------------------------------------------------------


def read_cdx(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    streaming: bool = False,
    options: dict | None = None,
) -> DataFrame:
    """Read CDXJ crawl-index files (Common Crawl's cdx-*.gz sidecars:
    one line per capture, ``<urlkey SURT> <14-digit timestamp>
    <json>``) — the SELECTION entry point of a crawl pipeline: real
    corpus builds query the index to pick captures (latest per URL,
    status 200, text mime, unseen digest) BEFORE touching any WARC
    byte, because the index is ~1/1000 the size of the crawl.

    Same contract as :func:`read_jsonl`: explicit ``schema`` for the
    JSON block (no inference pass), one row per line with ``urlkey``,
    ``capture_ts`` (the raw 14-digit string — fixed-width digits, so
    lexicographic order IS chronological and no cross-engine timestamp
    parsing is involved) plus the schema's fields, ``_raw_line`` and
    ``_corrupt`` (malformed JSON, type-mismatched fields, a bad/
    missing timestamp or a missing JSON block -> rejects channel via
    :func:`jsonl_rejects`; a MISSING schema field is NOT corruption —
    it parses as NULL, same contract as :func:`read_jsonl`).  Pure
    Catalyst; gzip'd index
    files decompress through the text source codec (non-splittable:
    file-granularity parallelism, same story as .warc.gz)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    cr = "_crawl_corrupt_record"
    if cr in schema.fieldNames():
        raise ValueError(f"schema field name {cr!r} is reserved")
    probe = T.StructType(
        list(schema.fields) + [T.StructField(cr, T.StringType())]
    )
    reader = spark.readStream if streaming else spark.read
    lines = reader.options(**(options or {})).text(path)
    # split on the first two spaces only: SURT keys never contain
    # spaces, the JSON block may
    parts = F.split(F.col("value"), " ", 3)
    staged = (
        lines.filter(F.col("value") != "")
        .select(
            F.col("value").alias("_raw_line"),
            F.get(parts, 0).alias("urlkey"),
            F.get(parts, 1).alias("capture_ts"),
            F.from_json(
                F.get(parts, 2),
                probe,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": cr},
            ).alias("_rec"),
        )
    )
    shape_ok = (
        # split never yields NULL for part 0, but a line starting with
        # a space yields urlkey = '' — which would collapse every such
        # line into one group downstream
        (F.coalesce(F.col("urlkey"), F.lit("")) != "")
        & F.col("capture_ts").rlike(r"^[0-9]{14}$")
        # _rec itself NULL = the line had no JSON block at all
        # (from_json(NULL) is a NULL struct whose corrupt field reads
        # NULL too — checking only the probe field would admit it)
        & F.col("_rec").isNotNull()
        & F.col(f"_rec.{cr}").isNull()
    )
    return staged.select(
        "urlkey",
        "capture_ts",
        *[F.col(f"_rec.{f}") for f in schema.fieldNames()],
        "_raw_line",
        (~shape_ok).alias("_corrupt"),
    )


def cdx_latest_captures(
    records: DataFrame,
    *,
    key_col: str = "urlkey",
    ts_col: str = "capture_ts",
) -> DataFrame:
    """One row per ``key_col``: the LATEST capture (max ``ts_col``)
    plus ``n_captures`` — the standard index-side selection (fetch one
    capture per URL) as a single partial-aggregating groupBy; feed it
    :func:`jsonl_records` output.  Ties on the timestamp (CDX
    timestamps are second-resolution; same-second recrawls are rare
    but replay determinism matters) break on the greatest payload
    struct — a total order over the remaining columns, so repeated
    runs of the same input always pick the same capture."""
    payload = [c for c in records.columns if c not in (key_col, ts_col)]
    if not payload:
        raise ValueError(
            "cdx_latest_captures needs at least one payload column "
            f"besides {key_col!r} and {ts_col!r}; got only "
            f"{records.columns}"
        )
    picked = records.groupBy(key_col).agg(
        F.max(ts_col).alias(ts_col),
        F.max_by(
            F.struct(*payload),
            # deterministic tie-break: order by (ts, payload struct) —
            # struct comparison is lexicographic over the fields
            F.struct(F.col(ts_col), *[F.col(c) for c in payload]),
        ).alias("_best"),
        F.count(F.lit(1)).alias("n_captures"),
    )
    return picked.select(
        key_col,
        ts_col,
        *[F.col(f"_best.{c}").alias(c) for c in payload],
        "n_captures",
    )


# --------------------------------------------------------------------
# Sitemap XML
# --------------------------------------------------------------------


def sitemap_entries(
    df: DataFrame,
    *,
    xml_col: str = "xml",
    key_cols: Sequence[str] = ("host",),
) -> DataFrame:
    """Extract URL entries from sitemap XML documents (sitemaps.org
    protocol) — the URL-DISCOVERY step between robots.txt (which names
    the sitemaps, :func:`operators.robots.robots_sitemaps`) and the
    crawl frontier.

    Input: one row per fetched sitemap document (``key_cols`` identify
    it, ``xml_col`` holds the text).  Output: one row per entry —
    (*key_cols, kind, loc, lastmod) with ``kind`` 'url' (a ``<urlset>``
    page entry) or 'sitemap' (a ``<sitemapindex>`` child sitemap).
    ``loc`` is XML-entity-decoded (sitemaps MUST escape '&' etc.;
    :func:`operators.text.decode_html_entities` applies the same
    single-decode rules as the HTML path); ``lastmod`` is the raw
    value string or NULL.  Entries without a ``<loc>`` are dropped —
    the protocol makes it mandatory.

    Pure Catalyst (regexp_extract_all over entry blocks + per-block
    probes); tolerant of namespace attributes and whitespace, and of
    malformed surrounding XML — it keys on the entry elements only,
    the right trade for crawl-scale inputs where a DOM parse would be
    a Python hop that dies on the first stray byte."""
    from sample_dms_s3_kinesis_spark.operators.text import (
        decode_html_entities,
    )

    # One alternation pass over each document ("(url|sitemap)" with a
    # backreferenced close tag) instead of one full scan per element
    # kind; "(?:[\w.-]+:)?" tolerates namespace prefixes (ElementTree
    # default output is <ns0:urlset>...), \b keeps <url> from matching
    # <urlset> (and <sitemap> from <sitemapindex>), [^>]* tolerates
    # attributes on every tag incl. <loc>.
    ns = r"(?:[\w.-]+:)?"
    block_re = rf"(?is)<{ns}(url|sitemap)\b[^>]*>.*?</{ns}\1\s*>"
    kind_re = rf"(?is)^<{ns}(url|sitemap)\b"
    loc_re = rf"(?is)<{ns}loc\b[^>]*>\s*(.*?)\s*</{ns}loc\s*>"
    lastmod_re = (
        rf"(?is)<{ns}lastmod\b[^>]*>\s*(.*?)\s*</{ns}lastmod\s*>"
    )
    blocks = df.select(
        *key_cols,
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(block_re), F.lit(0))
        ).alias("_b"),
    )
    return blocks.select(
        *key_cols,
        F.lower(F.regexp_extract("_b", kind_re, 1)).alias("kind"),
        decode_html_entities(
            F.nullif(F.regexp_extract("_b", loc_re, 1), F.lit(""))
        ).alias("loc"),
        F.nullif(
            F.regexp_extract("_b", lastmod_re, 1), F.lit("")
        ).alias("lastmod"),
    ).filter(F.col("loc").isNotNull())


# --------------------------------------------------------------------
# WARC
# --------------------------------------------------------------------

# Record boundary for the text-source fold.  WARC/1.1 files differ only
# in this version string; pass version="1.1" for them.
_WARC_BOUNDARY = "WARC/{version}\r\n"


def _warc_header(hdr: Column, name: str) -> Column:
    # Explicit (?:^|\n) line anchor, NOT (?m)^: Java multiline ^ also
    # fires after bare \r / U+0085 / U+2028 / U+2029; Python fires after
    # \n only — the gz twin must apply the identical rule, and header
    # lines in the block are \r\n-separated anyway.  (?i) per spec:
    # header names are case-insensitive; value runs to end of line
    # (trailing \r excluded because the block was split on \r\n pairs).
    return F.nullif(
        F.regexp_extract(hdr, rf"(?i)(?:^|\n){name}:[ \t]*([^\r\n]*)", 1),
        F.lit(""),
    )


def read_warc_records(
    spark: SparkSession,
    path: str,
    *,
    streaming: bool = False,
    version: str = "1.0",
    options: dict | None = None,
) -> DataFrame:
    """Read WARC files under ``path``, one row per WARC record.

    Columns: ``warc_type``, ``target_uri``, ``record_id``,
    ``warc_date``, ``content_type``, ``content_length`` (the declared
    value), ``payload`` (everything after the header block, record
    separator stripped), ``payload_len`` (actual UTF-8 byte length) and
    ``length_ok``.

    ``length_ok`` is the honesty bit of the fold: records are split on
    the ``WARC/1.0\\r\\n`` boundary marker, so a payload that itself
    contains the marker splits early — the declared ``Content-Length``
    then disagrees with ``payload_len`` and BOTH fragments flag
    ``length_ok = false`` (a fragment lacking the mandatory
    Content-Length header flags false too).  Callers route those to
    the rejects channel
    (the admission pipeline filters on it) instead of ingesting
    silently truncated pages.  Inter-record padding (stray newlines
    from non-spec writers) is tolerated and stripped.
    """
    boundary = _WARC_BOUNDARY.format(version=version)
    reader = spark.readStream if streaming else spark.read
    raw = (
        reader.options(**(options or {}))
        .option("lineSep", boundary)
        .text(path)
    )
    # whitespace-ONLY fragments are inter-record padding, not records
    # (rlike \S rather than trim: trim only strips spaces, and the
    # Python gz twin must apply the identical rule)
    rec = raw.filter(F.col("value").rlike(r"\S"))
    # A record with no header/payload blank-line split is malformed:
    # nullif folds the failed extract ("") to NULL so every downstream
    # probe reads NULL and length_ok lands false.
    hdr = F.nullif(
        F.regexp_extract("value", r"(?s)^(.*?)\r\n\r\n", 1), F.lit("")
    )
    raw_payload = F.regexp_extract("value", r"(?s)^.*?\r\n\r\n(.*)$", 1)
    staged = rec.select(hdr.alias("_hdr"), raw_payload.alias("_rp"))
    # Strip exactly ONE trailing record separator (+ sink padding): the
    # greedy leading group pins the match to the LAST \r\n\r\n, so a
    # payload whose body itself ends with CRLF keeps it (a leftmost
    # regexp_replace would eat the body's CRLF too and fail the length
    # check on spec-valid records).  No trailing separator at all
    # (truncated tail record) -> payload kept as-is; the length check
    # judges it.
    # ASCII class + absolute \z end anchor, not \s*$: Java \s is
    # already ASCII-only but Java $ ALSO matches before a final line
    # terminator (U+0085/U+2028/U+2029), and Python's \s is
    # Unicode-aware — either would let the two readers strip different
    # separators on exotic padding (e.g. a U+00A0 tail).  The explicit
    # class and \z (Python twin: \Z) mean both engines read the
    # pattern identically.
    one_sep = r"(?s)^(.*)\r\n\r\n[ \t\n\x0b\f\r]*\z"
    payload = F.when(
        F.col("_rp").rlike(one_sep),
        F.regexp_extract("_rp", one_sep, 1),
    ).otherwise(F.col("_rp"))
    # Bind hdr/payload once through a projection: five header probes
    # plus two length checks reference them repeatedly and the source
    # string is a whole record.
    bound = staged.select("_hdr", payload.alias("payload"))
    h = F.col("_hdr")
    declared = _warc_header(h, "Content-Length").try_cast("long")
    return bound.select(
        _warc_header(h, "WARC-Type").alias("warc_type"),
        _warc_header(h, "WARC-Target-URI").alias("target_uri"),
        _warc_header(h, "WARC-Record-ID").alias("record_id"),
        _warc_header(h, "WARC-Date").alias("warc_date"),
        _warc_header(h, "Content-Type").alias("content_type"),
        declared.alias("content_length"),
        F.col("payload"),
        F.octet_length("payload").cast("long").alias("payload_len"),
        F.coalesce(
            F.col("_hdr").isNotNull()
            # Content-Length is MANDATORY (WARC spec §5.3): a record
            # without one is either non-compliant or a fragment of a
            # marker-collision split — both belong on the rejects side
            # (coalesce: NULL declared must read as false, not NULL)
            & (declared == F.octet_length("payload").cast("long")),
            F.lit(False),
        ).alias("length_ok"),
    )


_WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("payload_len", T.LongType()),
        T.StructField("length_ok", T.BooleanType()),
    ]
)

# read_warc_gz(binary_payload=True): the base schema plus the raw
# payload bytes — the only field binary HTTP bodies can survive in
_WARC_BIN_SCHEMA = T.StructType(
    list(_WARC_SCHEMA.fields)
    + [T.StructField("payload_bin", T.BinaryType())]
)


# Precompiled pieces of the Python parse twin: _parse_warc_piece runs
# once per record — ~50-100k times per Common Crawl container — so
# imports, closures and pattern builds must not be per-call.
import re as _re  # noqa: E402

_HDR_SPLIT = _re.compile(r"(?s)^(.*?)\r\n\r\n")
# ASCII class + \Z, in lockstep with the Catalyst one_sep (Java \z):
# Python's \s is Unicode-aware and would strip e.g. U+00A0 padding the
# Java side keeps; Python's $ also differs from Java's before final
# line terminators.
_ONE_SEP = _re.compile(r"(?s)^(.*)\r\n\r\n[ \t\n\x0b\f\r]*\Z")
_HEADER_PROBES = {
    # (?:^|\n), not (?m)^ — see _warc_header: Java and Python disagree
    # on which line terminators multiline ^ fires after
    name: _re.compile(rf"(?i)(?:^|\n){name}:[ \t]*([^\r\n]*)")
    for name in (
        "WARC-Type",
        "WARC-Target-URI",
        "WARC-Record-ID",
        "WARC-Date",
        "Content-Type",
        "Content-Length",
    )
}
# try_cast('long') semantics: trimmed ASCII sign+digits only, int64
# range; '1_0', unicode digits/spaces and overflow all fold to NULL
_LONG_LITERAL = _re.compile(r"[+-]?[0-9]+")
# ASCII whitespace only — Python's unicode-aware str.strip() would
# accept a U+2007-padded value Spark's try_cast rejects
_ASCII_WS = " \t\n\r\f\v"
# Java's default (non-UNICODE_CHARACTER_CLASS) \S — the Catalyst
# padding filter rlike(r"\S") keeps a U+00A0-only fragment; Python's
# unicode-aware strip() would drop it
_ASCII_NONWS = _re.compile(r"[^ \t\n\x0b\f\r]")


def _try_cast_long(s: str | None) -> int | None:
    if s is None:
        return None
    s = s.strip(_ASCII_WS)
    if not _LONG_LITERAL.fullmatch(s):
        return None
    v = int(s)
    return v if -(2**63) <= v < 2**63 else None


_HDR_SPLIT_B = _re.compile(rb"(?s)^(.*?)\r\n\r\n")
_ONE_SEP_B = _re.compile(rb"(?s)^(.*)\r\n\r\n[ \t\n\x0b\f\r]*\Z")
_ASCII_NONWS_B = _re.compile(rb"[^ \t\n\x0b\f\r]")


def _parse_warc_piece_bytes(piece: bytes) -> tuple | None:
    """Byte-level twin of :func:`_parse_warc_piece` for
    ``read_warc_gz(binary_payload=True)``: identical split/probe rules
    (the regexes are the ``rb`` twins of the str ones — header bytes
    are ASCII, \\r\\n bytes can never occur inside a UTF-8 multibyte
    sequence, so split-then-decode equals decode-then-split), but the
    RAW payload bytes survive in a trailing ``payload_bin`` field and
    ``payload_len``/``length_ok`` are computed on the raw bytes.  That
    is what makes binary HTTP bodies (Content-Encoding: gzip) readable:
    the text path's decode-to-str mangles them irreversibly and such
    records can only ever flag ``length_ok = false`` there."""
    if not _ASCII_NONWS_B.search(piece):
        return None
    m = _HDR_SPLIT_B.match(piece)
    hdr_b = m.group(1) if m and m.group(1) else None
    raw_payload = piece[m.end():] if m else b""
    sep = _ONE_SEP_B.match(raw_payload)
    payload_b = sep.group(1) if sep else raw_payload
    hdr = hdr_b.decode("utf-8", "replace") if hdr_b is not None else None

    def probe(name):
        if hdr is None:
            return None
        h = _HEADER_PROBES[name].search(hdr)
        return (h.group(1) or None) if h else None

    declared = _try_cast_long(probe("Content-Length"))
    payload_len = len(payload_b)
    return (
        probe("WARC-Type"),
        probe("WARC-Target-URI"),
        probe("WARC-Record-ID"),
        probe("WARC-Date"),
        probe("Content-Type"),
        declared,
        payload_b.decode("utf-8", "replace"),
        payload_len,
        hdr is not None and declared is not None and declared == payload_len,
        payload_b,
    )


def _parse_warc_piece(piece: str) -> tuple | None:
    """Python twin of the Catalyst record parse in
    :func:`read_warc_records` — kept in LOCKSTEP with it (the
    equivalence is pinned by ``test_warc_gz_matches_text_reader``).
    ``piece`` is one boundary-split fragment; returns a `_WARC_SCHEMA`
    tuple, or None for blank padding fragments."""
    if not _ASCII_NONWS.search(piece):
        return None
    m = _HDR_SPLIT.match(piece)
    hdr = m.group(1) if m and m.group(1) else None
    raw_payload = piece[m.end():] if m else ""
    sep = _ONE_SEP.match(raw_payload)
    payload = sep.group(1) if sep else raw_payload

    def probe(name):
        if hdr is None:
            return None
        h = _HEADER_PROBES[name].search(hdr)
        return (h.group(1) or None) if h else None

    declared = _try_cast_long(probe("Content-Length"))
    payload_len = len(payload.encode("utf-8"))
    return (
        probe("WARC-Type"),
        probe("WARC-Target-URI"),
        probe("WARC-Record-ID"),
        probe("WARC-Date"),
        probe("Content-Type"),
        declared,
        payload,
        payload_len,
        hdr is not None and declared is not None and declared == payload_len,
    )


_BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def read_warc_gz(
    spark: SparkSession,
    path: str,
    *,
    version: str = "1.0",
    batch_rows: int = 512,
    streaming: bool = False,
    binary_payload: bool = False,
    options: dict | None = None,
) -> DataFrame:
    """Read gzip-compressed WARC containers (``.warc.gz`` — the format
    Common Crawl actually ships) into the same frame as
    :func:`read_warc_records`.

    gzip is a non-splittable codec, so the FILE is the parallel unit:
    ``binaryFile`` source + ``mapInPandas``, one task per container
    (Common Crawl's ~1 GB files parallelize at file granularity on a
    real cluster).  Crawl ``.warc.gz`` files are MULTI-MEMBER — each
    record is its own gzip member, concatenated — so decompression
    streams member-by-member through an incremental UTF-8 decoder and
    records are emitted in ``batch_rows`` chunks: peak memory is one
    decompression buffer plus one output batch, never the whole
    decompressed container.  The record parse is the Python twin of
    the Catalyst parse (same header/payload/length_ok semantics,
    equivalence pinned by test).

    ``binary_payload=True`` appends a ``payload_bin`` BINARY column
    with the RAW payload bytes and computes ``payload_len`` /
    ``length_ok`` on those bytes instead of the decoded string.  This
    is the real-crawl mode: a record whose HTTP body is binary
    (``Content-Encoding: gzip``) keeps its bytes intact for
    :func:`warc_responses` to decode, and flags ``length_ok = true``
    when the declared Content-Length matches the raw bytes.  The
    default mode stays byte-for-byte in lockstep with the text reader
    (which can only see the lossy decoded string, so such records flag
    false there — the honest reject)."""
    import codecs
    import gzip
    import io

    if batch_rows < 1:
        raise ValueError(f"batch_rows must be >= 1, got {batch_rows}")
    boundary = _WARC_BOUNDARY.format(version=version)
    schema = _WARC_BIN_SCHEMA if binary_payload else _WARC_SCHEMA
    cols = schema.fieldNames()

    sep_b = boundary.encode()

    def walk_records(buf: bytes, out: list, final: bool) -> bytes:
        """Length-driven record walk for the binary path: a record
        whose header declares a sane Content-Length consumes exactly
        that many payload bytes plus the ``\\r\\n\\r\\n`` separator, so
        a RAW BINARY payload that happens to contain the boundary byte
        sequence (gzip/deflate bodies are uniform bytes — at 100 TB
        the ~10-byte marker does occur) no longer splits mid-payload
        into two length_ok=false fragments.  Records without a
        parseable length, with a hostile (>2 GiB) one, or whose
        declared length doesn't land on a separator fall back to
        boundary scanning for that record — the same honest-reject
        shape as before.  Returns the unconsumed residual (b'' when
        ``final``)."""
        pos, n = 0, len(buf)

        def emit(piece):
            rec = _parse_warc_piece_bytes(piece)
            if rec is not None:
                out.append(rec)

        while True:
            j = pos
            while j < n and buf[j] in b" \t\n\x0b\f\r":
                j += 1  # inter-record padding
            if j >= n:
                return b""
            if not buf.startswith(sep_b, j):
                # garbage/preamble before a boundary: emit up to the
                # next boundary as one piece (the parse flags it)
                nxt = buf.find(sep_b, j)
                if nxt < 0:
                    if not final:
                        return buf[j:]
                    emit(buf[j:])
                    return b""
                emit(buf[j:nxt])
                pos = nxt
                continue
            body_start = j + len(sep_b)
            he = buf.find(b"\r\n\r\n", body_start)
            declared = None
            if he >= 0:
                hdr = buf[body_start:he].decode("utf-8", "replace")
                m = _HEADER_PROBES["Content-Length"].search(hdr)
                declared = _try_cast_long(m.group(1)) if m else None
                if declared is not None and not (
                    0 <= declared <= (1 << 31)
                ):
                    declared = None  # hostile/absurd: don't buffer it
            if declared is not None:
                rec_end = he + 4 + declared
                if rec_end + 4 <= n and buf.startswith(
                    b"\r\n\r\n", rec_end
                ):
                    emit(buf[body_start : rec_end + 4])
                    pos = rec_end + 4
                    continue
                if rec_end <= n <= rec_end + 4 and final:
                    # tail record: declared bytes present, separator
                    # (fully or partly) truncated at EOF
                    emit(buf[body_start:])
                    return b""
                if rec_end + 4 > n:
                    if not final:
                        return buf[j:]  # need more data
                    emit(buf[body_start:])  # truncated tail record
                    return b""
                # declared length doesn't land on a separator: the
                # header lies — boundary-scan fallback for this record
            nxt = buf.find(sep_b, body_start)
            if nxt < 0:
                if not final:
                    return buf[j:]
                emit(buf[body_start:])
                return b""
            emit(buf[body_start:nxt])
            pos = nxt

    def parse_files(batches):
        for pdf in batches:
            for content in pdf["content"]:
                gz = gzip.GzipFile(fileobj=io.BytesIO(bytes(content)))
                out = []
                if binary_payload:
                    buf = b""
                    while True:
                        chunk = gz.read(1 << 20)
                        if not chunk:
                            break
                        buf += chunk
                        if len(buf) >= (1 << 21):
                            buf = walk_records(buf, out, final=False)
                        while len(out) >= batch_rows:
                            yield pd.DataFrame(
                                out[:batch_rows], columns=cols
                            )
                            out = out[batch_rows:]
                    walk_records(buf, out, final=True)
                    while out:
                        yield pd.DataFrame(
                            out[:batch_rows], columns=cols
                        )
                        out = out[batch_rows:]
                    continue
                decoder = codecs.getincrementaldecoder("utf-8")("replace")
                decode_chunk = decoder.decode
                sep, buf, parse = boundary, "", _parse_warc_piece

                def take_complete(buf):
                    # split off every COMPLETE record; the residual —
                    # a partial record (or partial boundary string)
                    # whose closing boundary hasn't arrived — stays
                    # buffered for the next chunk
                    pieces = buf.split(sep)
                    tail = pieces.pop()
                    for piece in pieces:
                        rec = parse(piece)
                        if rec is not None:
                            out.append(rec)
                    return tail

                while True:
                    chunk = gz.read(1 << 20)
                    if not chunk:
                        break
                    buf += decode_chunk(chunk)
                    if len(buf) >= (1 << 21):
                        buf = take_complete(buf)
                    while len(out) >= batch_rows:
                        yield pd.DataFrame(
                            out[:batch_rows], columns=cols
                        )
                        out = out[batch_rows:]
                buf += decode_chunk(b"", True)
                buf = take_complete(buf)
                rec = parse(buf)  # the final record
                if rec is not None:
                    out.append(rec)
                while out:
                    yield pd.DataFrame(out[:batch_rows], columns=cols)
                    out = out[batch_rows:]

    reader = (
        spark.readStream if streaming else spark.read
    ).format("binaryFile").options(**(options or {}))
    if streaming:
        # the streaming file source requires an explicit schema; the
        # batch binaryFile source rejects one — apply only here
        reader = reader.schema(_BINARY_FILE_SCHEMA)
    files = reader.load(path)
    return files.select("content").mapInPandas(parse_files, schema)


# Chunked size line (RFC 9112 §7.1): 1-7 hex digits (256 MB-1 chunk
# cap — a hostile larger claim fails the in-bounds check) + optional
# ASCII-printable chunk extension of at most 254 bytes (so the whole
# line fits the fixed 266-byte probe slice — the Python twin applies
# the identical bound).  The extension class is [ -~], NOT [^\r\n]: a
# non-ASCII byte in it would make the matched string's char length
# diverge from its byte length after the lossy binary->string cast,
# corrupting the byte-offset walk — rejecting it keeps every offset
# exact.
_CHUNK_SIZE_LINE = r"^([0-9a-fA-F]{1,7})(?:;[ -~]{0,254})?\r\n"
_CHUNK_SIZE_LINE_B = _re.compile(rb"([0-9a-fA-F]{1,7})(?:;[ -~]{0,254})?\r\n")


def _dechunk_py(b: bytes, max_chunks: int = 8192) -> bytes | None:
    """Python twin of :func:`_dechunk`, for the gzip decode path
    (chunked+gzipped bodies reassemble inside the gunzip UDF — a
    Python UDF whose input expression contains HOF lambdas cannot be
    extracted for batch evaluation, so the Catalyst fold cannot feed
    it directly).  Kept in LOCKSTEP with the Catalyst fold; the
    equivalence is pinned by test_chunked_decoder_twins_agree."""
    off, acc = 0, bytearray()
    for _ in range(max_chunks + 1):
        m = _CHUNK_SIZE_LINE_B.match(b, off)
        if not m:
            return None
        n = int(m.group(1), 16)
        if n == 0:
            return bytes(acc)
        start = m.end()
        chunk = b[start : start + n]
        if len(chunk) != n or b[start + n : start + n + 2] != b"\r\n":
            return None
        acc += chunk
        off = start + n + 2
    return None


def _dechunk(data: Column, *, max_chunks: int = 8192) -> Column:
    """Decode HTTP chunked transfer framing from BINARY ``data``:
    returns ``struct(ok boolean, data binary)`` — ``ok`` true and the
    reassembled entity bytes when the framing is well-formed, false /
    NULL otherwise (bad size line, missing chunk CRLF, truncated
    chunk, or more than ``max_chunks`` chunks).  The default ceiling
    (8192 chunks ≈ a 64 MB page at the common ~8 KB chunk size) is a
    safety bound on the per-row ``sequence`` array, not a tuning knob —
    the adaptive step count below keeps typical rows cheap — and
    :func:`warc_responses` exposes it for corpora that legitimately
    exceed it.

    Pure Catalyst: an ``aggregate`` fold over ``sequence(1, N)`` walks
    the framing one chunk per step with a (byte-offset, accumulator,
    state) struct; finished rows short-circuit each remaining step to
    a no-op ``when``.  Byte arithmetic throughout — chunk sizes count
    BYTES, so the walk runs on binary and only ASCII-safe slices are
    ever cast to string (cast, not decode: decode throws on malformed
    bytes under ANSI, cast wraps them).  Trailer fields after the
    terminal 0-chunk are tolerated and ignored.  The input expression
    is routed through a bound lambda variable so the fold reads it
    once, not once per step (HOF lambdas are opaque to Catalyst CSE).
    """
    from sample_dms_s3_kinesis_spark.operators.text import _bind

    def run(b):
        def step(s, _i):
            off = s.getField("off")
            acc = s.getField("acc")
            st = s.getField("st")
            probe = F.substring(b, off.cast("int"), 266).try_cast(
                "string"
            )
            m0 = F.regexp_extract(probe, _CHUNK_SIZE_LINE, 0)
            m1 = F.regexp_extract(probe, _CHUNK_SIZE_LINE, 1)
            n = F.conv(m1, 16, 10).try_cast("long")
            data_off = off + F.octet_length(m0).cast("long")
            chunk = F.substring(b, data_off.cast("int"), n.cast("int"))
            intact = (
                F.octet_length(chunk).cast("long") == n
            ) & (
                F.substring(b, (data_off + n).cast("int"), 2)
                == F.lit(b"\r\n")
            )
            keep = F.struct(off.alias("off"), acc.alias("acc"))

            def halt(code):
                return F.struct(
                    keep.getField("off").alias("off"),
                    keep.getField("acc").alias("acc"),
                    F.lit(code).alias("st"),
                )

            # NOTE the accumulator concat copies the accumulated body
            # once per chunk — O(chunks × body) bytes per row.  At the
            # common ~8 KB chunk size that is ~body²/8KB: fine for the
            # multi-MB pages the 8192-chunk default admits (a 8 MB
            # page costs ~8 GB of sequential memcpy spread over its
            # row's fold, still microseconds-per-chunk), but anyone
            # raising max_chunks toward 10^5+ should expect this
            # quadratic term to dominate and route such corpora
            # through the (linear) Python twin instead.
            return F.when(st != 0, s).otherwise(
                F.when(m0 == "", halt(2))
                .when(n == 0, halt(1))
                .when(
                    intact,
                    F.struct(
                        (data_off + n + 2).alias("off"),
                        F.concat(acc, chunk).alias("acc"),
                        F.lit(0).alias("st"),
                    ),
                )
                .otherwise(halt(2))
            )

        # Adaptive step count: a well-formed chunk occupies >= 6 bytes
        # ("1\r\n" + 1 data byte + "\r\n") and the terminal >= 3, so
        # len/6 + 2 steps suffice for ANY valid framing of this input
        # — iterating the full max_chunks ceiling would pay ~1000
        # guarded struct copies per row even for a 3-chunk body.
        n_iter = F.least(
            F.lit(max_chunks + 1),
            (F.octet_length(b) / F.lit(6)).cast("int") + F.lit(2),
        )
        return F.aggregate(
            F.sequence(F.lit(1), n_iter),
            F.struct(
                F.lit(1).cast("long").alias("off"),
                F.lit(b"").alias("acc"),
                F.lit(0).alias("st"),
            ),
            step,
            lambda s: F.struct(
                (s.getField("st") == 1).alias("ok"),
                F.when(s.getField("st") == 1, s.getField("acc")).alias(
                    "data"
                ),
            ),
        )

    return _bind(data, run)


# Content-Encoding values the binary decode path dispatches to the
# entity UDF.  br/zstd decode only when their (optional) codec package
# is importable ON THE WORKER — absent packages reject each row with a
# distinct machine-readable reason instead of a silent NULL, so a
# corpus owner can see exactly how many pages a missing codec costs.
SUPPORTED_CONTENT_CODINGS = ("gzip", "x-gzip", "deflate", "br", "zstd")

# The two REAL meta charset declarations, each its own pattern (a
# single "any charset= inside any <meta>" pattern would false-match a
# description like <meta name="description" content="... charset=x">
# and transcode a valid UTF-8 page through the quoted codec):
#   1. <meta http-equiv="Content-Type" content="text/html;
#      charset=..."> — the charset parameter of a Content-Type
#      http-equiv's content value;
#   2. <meta charset="..."> — the bare charset attribute, accepted
#      only in a tag carrying NO name=/http-equiv= attribute (a real
#      charset meta has nothing else).
# Probe order matches WHATWG (either wins; header still beats both).
# Java-regex / Python-re compatible (lookahead used; these are never
# evaluated by RE2 — the DuckDB oracles replay outcomes from doc_id
# arithmetic, not the regex).  Used by the Catalyst prescan in
# warc_responses AND (byte-compiled) inside the entity udf for
# chunked/compressed entities.
META_CHARSET_EQUIV_RE = (
    r"""(?is)<meta(?=[^>]*http-equiv\s*=\s*["']?content-type)"""
    r"""[^>]*content\s*=\s*["'][^"'>]*;[ \t]*charset="""
    r"""([A-Za-z0-9._:-]+)"""
)
META_CHARSET_ATTR_RE = (
    r"""(?is)<meta(?![^>]*\b(?:name|http-equiv)\s*=)"""
    r"""[^>]*?\bcharset\s*=\s*["']?([A-Za-z0-9._:-]+)"""
)

_BR_MODULE = ()  # () = not probed yet; None = probed, unavailable
_ZSTD_DECOMPRESS = ()


def _load_brotli():
    """Per-process probe for a brotli decompressor (``brotli`` or
    ``brotlicffi`` — API-compatible).  Runs on the WORKER, so a
    heterogeneous cluster rejects per-row with ``br_unavailable``
    exactly where the package is missing rather than failing at plan
    time."""
    global _BR_MODULE
    if _BR_MODULE == ():
        _BR_MODULE = None
        for name in ("brotli", "brotlicffi"):
            try:
                _BR_MODULE = __import__(name)
                break
            except ImportError:
                pass
    return _BR_MODULE


def _load_zstd():
    """Per-process probe for a zstd decompress callable: stdlib
    ``compression.zstd`` (3.14+) first, then the ``zstandard``
    package."""
    global _ZSTD_DECOMPRESS
    if _ZSTD_DECOMPRESS == ():
        _ZSTD_DECOMPRESS = None
        try:
            from compression import zstd as _z  # Python 3.14+

            _ZSTD_DECOMPRESS = _z.decompress
        except ImportError:
            try:
                import zstandard as _z

                _ZSTD_DECOMPRESS = _z.ZstdDecompressor().decompress
            except ImportError:
                pass
    return _ZSTD_DECOMPRESS


_ENTITY_UDFS: dict = {}


def _encoded_entity_udf(max_chunks: int = 8192):
    """Arrow-batched decoder for compressed HTTP entities (raw body
    bytes + codings -> ``struct(body string, reason string,
    charset string, charset_source string)`` — the decoded entity, or
    NULL plus a machine-readable reject reason, plus which charset the
    decode actually used and where it came from).
    The one Python step in the response decode path — Catalyst has no
    decompression expression; everything around it (header probes,
    dispatch, and the common text-chunked case) stays JVM-side, and
    the udf only ever sees non-NULL input on rows whose
    Content-Encoding names a member of ``SUPPORTED_CONTENT_CODINGS``.
    Chunked+compressed bodies de-chunk HERE via :func:`_dechunk_py`
    (the pinned twin of the Catalyst fold): a Python UDF whose input
    expression contains HOF lambdas is not extractable for batch
    evaluation, so the fold's output cannot feed the udf directly.
    After transfer/content decoding the charset resolves with WHATWG
    precedence — BOM > Content-Type header (the fourth input) >
    ``<meta charset>``/``<meta http-equiv>`` prescan over the first
    1024 entity bytes > UTF-8 default — and the bytes decode through
    that codec with U+FFFD replacement, matching what the text source
    does to a page that was never compressed.  A UTF-8 BOM strips
    (utf-8-sig); UTF-16 BOMs decode through Python's BOM-consuming
    'utf-16'.  Reasons: ``bad_chunked_framing``,
    ``decompress_failed``, ``br_unavailable`` / ``zstd_unavailable``
    (optional codec package absent on the worker — brotli /
    brotlicffi, compression.zstd / zstandard),
    ``unsupported_charset`` (no text codec for the declared name)."""
    cached = _ENTITY_UDFS.get(max_chunks)
    if cached is None:
        import gzip
        import zlib

        @F.pandas_udf(
            "body string, reason string, charset string, "
            "charset_source string"
        )
        def encoded_entity(
            data: pd.Series,
            te: pd.Series,
            ce: pd.Series,
            cs: pd.Series,
        ) -> pd.DataFrame:
            import re as _re

            meta_res = [
                _re.compile(p.encode("ascii"))
                for p in (META_CHARSET_EQUIV_RE, META_CHARSET_ATTR_RE)
            ]

            def one(v, t, c, s):
                if v is None:
                    return (None, None, None, None)
                b = bytes(v)
                if t == "chunked":
                    b = _dechunk_py(b, max_chunks)
                    if b is None:
                        return (None, "bad_chunked_framing", None, None)
                try:
                    if c is None or c == "identity":
                        # charset-only row: nothing to decompress
                        pass
                    elif c == "deflate":
                        # RFC says zlib-wrapped; plenty of servers send
                        # raw DEFLATE — try the wrapper, fall back raw
                        try:
                            b = zlib.decompress(b)
                        except zlib.error:
                            b = zlib.decompress(b, -15)
                    elif c == "br":
                        br = _load_brotli()
                        if br is None:
                            return (None, "br_unavailable", None, None)
                        b = br.decompress(b)
                    elif c == "zstd":
                        zd = _load_zstd()
                        if zd is None:
                            return (None, "zstd_unavailable", None, None)
                        b = zd(b)
                    else:  # gzip / x-gzip
                        b = gzip.decompress(b)
                except Exception:
                    return (None, "decompress_failed", None, None)
                # WHATWG precedence: BOM > header > meta > utf-8
                if b[:3] == b"\xef\xbb\xbf":
                    return (
                        b.decode("utf-8-sig", "replace"),
                        None,
                        "utf-8",
                        "bom",
                    )
                if b[:2] in (b"\xff\xfe", b"\xfe\xff"):
                    # Python's 'utf-16' consumes the BOM and picks
                    # the byte order from it
                    return (
                        b.decode("utf-16", "replace"),
                        None,
                        "utf-16",
                        "bom",
                    )
                s_src = "header" if s is not None else None
                if s is None:
                    for mr in meta_res:
                        m = mr.search(b[:1024])
                        if m:
                            s = (
                                m.group(1)
                                .decode("ascii", "ignore")
                                .lower()
                            )
                            s_src = "meta"
                            break
                if s is not None and s not in (
                    "utf-8",
                    "utf8",
                    "us-ascii",
                    "ascii",
                ):
                    # transcode a declared non-UTF-8 entity; "replace"
                    # mirrors make_valid_utf8's U+FFFD convention.
                    # bytes.decode only resolves TEXT encodings, so an
                    # untrusted header naming a bytes-to-bytes codec
                    # ('hex', 'zlib', ...) lands in LookupError too.
                    try:
                        return (b.decode(s, "replace"), None, s, s_src)
                    except LookupError:
                        return (None, "unsupported_charset", s, s_src)
                return (b.decode("utf-8", "replace"), None, s, s_src)

            out = [
                one(v, t, c, s)
                for v, t, c, s in zip(data, te, ce, cs)
            ]
            return pd.DataFrame(
                {
                    "body": pd.Series([o[0] for o in out], dtype=object),
                    "reason": pd.Series(
                        [o[1] for o in out], dtype=object
                    ),
                    "charset": pd.Series(
                        [o[2] for o in out], dtype=object
                    ),
                    "charset_source": pd.Series(
                        [o[3] for o in out], dtype=object
                    ),
                }
            )

        cached = _ENTITY_UDFS[max_chunks] = encoded_entity
    return cached


def warc_responses(
    records: DataFrame,
    *,
    max_chunks: int = 8192,
    keep_payload_bin: bool = False,
) -> DataFrame:
    """HTTP response records out of :func:`read_warc_records` /
    :func:`read_warc_gz` output: parses the HTTP status line, splits
    headers from body and DECODES the body's HTTP encodings.

    Adds ``http_status`` (int), ``http_content_type``,
    ``http_location`` (the raw redirect-target header —
    :func:`redirect_edges` resolves it), ``http_etag`` /
    ``http_last_modified`` (cache validators, raw — the
    If-None-Match / If-Modified-Since a conditional refetch sends
    back), ``http_x_robots_tag`` (the on-page-robots HTTP channel,
    raw — fold with ``<meta name="robots">`` via
    `operators/text.py:robots_directive_flags`), ``http_retry_after``
    (raw — `operators/urls.py:host_backoff` folds it with 429/503
    statuses into per-host fetch penalties),
    ``http_charset`` (the Content-Type charset parameter,
    lowercased), ``charset_sniffed`` / ``charset_source`` (the charset
    the decode ACTUALLY used and where it came from — ``bom`` /
    ``header`` / ``meta`` — WHATWG precedence: a BOM beats the header,
    the header beats a ``<meta charset>``/``<meta http-equiv>``
    declaration prescanned from the first 1024 entity bytes; NULL =
    nothing declared, plain UTF-8),
    ``http_transfer_encoding``, ``http_content_encoding``, ``body``
    and ``body_reject_reason``; keeps the WARC columns.  A UTF-8 BOM
    strips from the decoded body; UTF-16 BOMs decode on the binary
    path (BOM-consuming utf-16 codec in the entity udf).  Prescan
    limits, both honest at corpus scale: UTF-16 BOMs on the TEXT path
    were already mangled at read time (undetectable), and a
    meta-declared charset inside a chunked-but-uncompressed entity is
    only seen when the row reaches the entity udf for another reason
    (the pure-Catalyst chunk fold does not re-scan).  Non-response
    records (request, warcinfo, metadata, …) are filtered out — crawl
    curation ingests fetched pages, not the crawler's own bookkeeping.

    ``body`` is the DECODED entity: the raw body for unencoded
    responses, the reassembled entity for ``Transfer-Encoding:
    chunked`` (pure-Catalyst :func:`_dechunk`, works on both readers'
    output), and the decompressed text for ``Content-Encoding:
    gzip``/``x-gzip``/``deflate`` (zlib-wrapped or raw) — plus ``br``
    and ``zstd`` when their optional codec package is importable on
    the worker — WHEN the input carries a ``payload_bin`` column
    (``read_warc_gz(binary_payload=True)`` — compressed bytes cannot
    survive the text source's decode, so on the text path such
    records get ``body = NULL``).  ``body IS NULL`` means undecodable,
    and ``body_reject_reason`` says WHY — a machine-readable reason a
    corpus owner can aggregate to see what a funnel loses per coding:
    ``bad_chunked_framing``, ``decompress_failed``, ``br_unavailable``
    / ``zstd_unavailable`` (optional codec absent),
    ``unsupported_transfer_encoding``,
    ``unsupported_content_encoding``, ``unsupported_charset`` (a
    declared charset Python has no text codec for),
    ``compressed_body_on_text_path``, or ``charset_on_text_path`` (a
    declared non-UTF-8 charset on the text path, whose bytes the text
    source already mangled at read time).  The reason is NULL wherever
    ``body`` decoded (and for uncoded records, whose raw body needs no
    decode step).  Chunked+compressed responses decode in RFC order
    (de-chunk, then decompress).  A declared non-UTF-8 charset
    (anything but utf-8/utf8/us-ascii/ascii in the Content-Type
    ``charset=`` parameter) TRANSCODES on the binary path: the entity
    udf decodes the de-chunked, decompressed bytes with the declared
    codec — U+FFFD replacement, the same convention every other decode
    branch follows — so a Latin-1 or Shift-JIS page lands as clean
    UTF-8 text instead of mojibake.  ``max_chunks`` bounds the chunked
    walk per row (default 8192 ≈ a 64 MB entity at ~8 KB chunks);
    framings that exceed it reject as ``bad_chunked_framing``."""
    resp = records.filter(F.lower(F.col("warc_type")) == "response")
    has_bin = "payload_bin" in records.columns
    http_hdr = F.regexp_extract("payload", r"(?s)^(.*?)\r\n\r\n", 1)
    body = F.regexp_extract("payload", r"(?s)^.*?\r\n\r\n(.*)$", 1)
    bound = resp.select(
        "warc_type",
        "target_uri",
        "record_id",
        "warc_date",
        "content_length",
        "payload_len",
        "length_ok",
        http_hdr.alias("_http_hdr"),
        body.alias("_body_raw"),
        *([F.col("payload_bin")] if has_bin else []),
    )
    # trailing OWS is SP *or* HTAB (RFC 7230); rtrim strips spaces
    # only and a 'chunked\t' value would defeat every dispatch compare
    def _ows(c):
        return F.regexp_replace(c, r"[ \t]+$", "")

    te = F.lower(_ows(_warc_header(F.col("_http_hdr"), "Transfer-Encoding")))
    ce = F.lower(_ows(_warc_header(F.col("_http_hdr"), "Content-Encoding")))
    # the Content-Type charset parameter (quoted or bare), lowercased:
    # the declared byte encoding of the entity — non-UTF-8 pages
    # transcode in the entity udf below instead of mojibaking into the
    # corpus
    cs = F.lower(
        F.nullif(
            F.regexp_extract(
                "_http_hdr",
                r"(?i)(?:^|\n)Content-Type:[^\r\n]*;[ \t]*charset="
                r"[\"']?([A-Za-z0-9._:-]+)",
                1,
            ),
            F.lit(""),
        )
    )
    if has_bin:
        # entity bytes = the raw payload minus the HTTP header block.
        # The header is ASCII in any response we can decode, so its
        # re-encoded length is the exact byte offset; a non-ASCII
        # header would skew the slice and the decode below would fail
        # to NULL — the honest outcome for such a record.
        ebin = F.substring(
            F.col("payload_bin"),
            F.octet_length(F.encode(F.col("_http_hdr"), "UTF-8")) + 5,
            F.octet_length(F.col("payload_bin")),
        )
    else:
        # text path: recover the body bytes from the (valid-UTF-8)
        # string — exact for every record the text source didn't
        # already mangle
        ebin = F.encode(F.col("_body_raw"), "UTF-8")
    # ---- charset sniffing (WHATWG precedence: BOM > header > meta) --
    # BOM probes run on the raw entity bytes, so they are only
    # meaningful for un-chunked entities (a chunked body starts with
    # its chunk-size line; compressed bytes never look like a BOM) —
    # chunked/compressed entities get the same probes inside the
    # entity udf, AFTER transfer/content decoding.
    if has_bin:
        bom8_e = F.substring(ebin, 1, 3) == F.lit(b"\xef\xbb\xbf")
        bom16_e = (F.substring(ebin, 1, 2) == F.lit(b"\xff\xfe")) | (
            F.substring(ebin, 1, 2) == F.lit(b"\xfe\xff")
        )
        prescan_src = F.decode(F.substring(ebin, 1, 1024), "ISO-8859-1")
    else:
        # the text source already decoded the bytes: a UTF-8 BOM
        # surfaces as a leading U+FEFF; UTF-16 BOMs were mangled at
        # read time and cannot be recovered here
        bom8_e = F.col("_body_raw").startswith("﻿")
        bom16_e = F.lit(False)
        prescan_src = F.substring(F.col("_body_raw"), 1, 1024)
    te_none_e = te.isNull() | (te == "identity")
    ce_none_e = ce.isNull() | (ce == "identity")
    # <meta charset> / <meta http-equiv="Content-Type"> prescan over
    # the first 1024 entity bytes (decoded as ISO-8859-1, the WHATWG
    # byte-transparent prescan convention) — consulted only when the
    # Content-Type header declares nothing (header beats meta) and
    # the entity is not transfer/content-coded (the udf re-scans
    # those itself)
    meta_cs_e = F.when(
        cs.isNull() & te_none_e & ce_none_e,
        F.lower(
            F.coalesce(
                F.nullif(
                    F.regexp_extract(
                        prescan_src, META_CHARSET_EQUIV_RE, 1
                    ),
                    F.lit(""),
                ),
                F.nullif(
                    F.regexp_extract(
                        prescan_src, META_CHARSET_ATTR_RE, 1
                    ),
                    F.lit(""),
                ),
            )
        ),
    )
    # The sniff probes are STAGED alias columns (same discipline as
    # the _chunk/_ent stages below): meta_cs/cs_eff feed the dispatch,
    # the body/reason branches, and the observability pair — inlined,
    # the 1024-char prescan regex tree re-expands into each of those
    # ~6 references.
    staged = bound.select(
        "*",
        te.alias("http_transfer_encoding"),
        ce.alias("http_content_encoding"),
        cs.alias("http_charset"),
        bom8_e.alias("_bom8"),
        bom16_e.alias("_bom16"),
        meta_cs_e.alias("_meta_cs"),
    )
    te_c = F.col("http_transfer_encoding")
    ce_c = F.col("http_content_encoding")
    cs_c = F.col("http_charset")
    bom8 = F.col("_bom8")
    bom16 = F.col("_bom16")
    meta_cs = F.col("_meta_cs")
    te_none = te_c.isNull() | (te_c == "identity")
    ce_none = ce_c.isNull() | (ce_c == "identity")
    te_ok = te_none | (te_c == "chunked")
    ce_codec = ce_c.isin(*SUPPORTED_CONTENT_CODINGS)
    plainish = te_none & ce_none
    cs_eff = F.coalesce(cs_c, meta_cs)
    # absent or UTF-8-family charset: the bytes already ARE the target
    # encoding, no transcode step
    cs_utf8 = cs_eff.isNull() | cs_eff.isin(
        "utf-8", "utf8", "us-ascii", "ascii"
    )
    # a plain entity with a UTF-8 BOM decodes as UTF-8 no matter what
    # the header claims (BOM wins) — strip the U+FEFF, skip the udf
    bom8_plain = plainish & bom8
    # a UTF-16 BOM needs the udf's BOM-consuming utf-16 decode
    bom16_row = plainish & bom16
    chunk_rows = (te_c == "chunked") & ce_none & cs_utf8
    udf_rows = (
        te_ok & (ce_codec | (ce_none & ~cs_utf8 & ~bom8_plain))
    ) | bom16_row
    plain_rows = plainish & ~bom16 & (cs_utf8 | bom8)
    # Stage the two expensive decode structs as GATED alias columns:
    # body and body_reject_reason below both read their fields, and
    # CollapseProject refuses to inline a non-cheap alias referenced
    # more than once — so the chunked fold and the entity udf each
    # evaluate exactly once per row, not once per output column
    # (pinned by test_warc_responses_plan_stays_jvm_side's single
    # ArrowEvalPython count and test_chunked_fold_evaluates_once).
    stage_cols = [
        F.when(
            chunk_rows, _dechunk(ebin, max_chunks=max_chunks)
        ).alias("_chunk")
    ]
    if has_bin:
        # One udf call on PRE-GATED inputs: NULL bytes for every
        # non-compressed row (the decompressor sees nothing to do),
        # and the input expressions are lambda-free so the UDF is
        # extractable into its Arrow batch projection.  De-chunking
        # for the chunked+compressed combo happens inside the udf
        # (_dechunk_py).
        stage_cols.append(
            _encoded_entity_udf(max_chunks)(
                F.when(udf_rows, ebin),
                F.when(udf_rows, te_c),
                F.when(udf_rows, ce_c),
                # the HEADER charset, utf-8-family included — a NULL
                # tells the udf "nothing declared, prescan the entity
                # yourself", so an explicit utf-8 header must pass
                # through or a meta tag could wrongly override it
                F.when(udf_rows, cs_c),
            ).alias("_ent")
        )
    staged2 = staged.select("*", *stage_cols)
    chunk_s = F.col("_chunk")

    def _strip_bom(c):
        # a decoded UTF-8 BOM is a leading U+FEFF — WHATWG strips it
        return F.regexp_replace(c, "^﻿", "")

    body = F.when(
        plain_rows, _strip_bom(F.col("_body_raw"))
    ).when(
        chunk_rows,
        # make_valid_utf8, not decode: U+FFFD replacement for invalid
        # bytes — the same convention the text source applies to
        # uncompressed pages (ANSI decode throws)
        F.when(
            chunk_s.getField("ok"),
            _strip_bom(F.make_valid_utf8(chunk_s.getField("data"))),
        ),
    )
    # reason is NULL wherever body decoded; every reject names why
    reason = F.when(
        plain_rows, F.lit(None).cast("string")
    ).when(
        chunk_rows,
        F.when(
            ~F.coalesce(chunk_s.getField("ok"), F.lit(False)),
            F.lit("bad_chunked_framing"),
        ),
    )
    # which charset the decode used, and where it came from — the
    # observability pair for the admission funnel (the udf reports its
    # own BOM/meta findings for the rows it decoded)
    sniffed = F.when(bom8_plain, F.lit("utf-8"))
    sniff_src = F.when(bom8_plain, F.lit("bom"))
    if has_bin:
        body = body.when(udf_rows, F.col("_ent").getField("body"))
        reason = reason.when(
            udf_rows, F.col("_ent").getField("reason")
        )
        sniffed = sniffed.when(
            udf_rows, F.col("_ent").getField("charset")
        )
        sniff_src = sniff_src.when(
            udf_rows, F.col("_ent").getField("charset_source")
        )
    else:
        reason = reason.when(
            ce_codec & te_ok, F.lit("compressed_body_on_text_path")
        ).when(
            # the text source already UTF-8-mangled the declared
            # non-UTF-8 bytes at read time — transcoding is impossible
            # and a mojibake body must not enter the corpus
            ~cs_utf8 & ce_none & te_ok,
            F.lit("charset_on_text_path"),
        )
    sniffed = sniffed.when(cs_c.isNotNull(), cs_c).otherwise(meta_cs)
    sniff_src = (
        sniff_src.when(cs_c.isNotNull(), F.lit("header"))
        .when(meta_cs.isNotNull(), F.lit("meta"))
        .otherwise(F.lit(None).cast("string"))
    )
    reason = reason.when(
        ~te_ok, F.lit("unsupported_transfer_encoding")
    ).otherwise(F.lit("unsupported_content_encoding"))
    return staged2.select(
        "warc_type",
        "target_uri",
        "record_id",
        "warc_date",
        "content_length",
        "payload_len",
        "length_ok",
        F.nullif(
            F.regexp_extract(
                "_http_hdr", r"^HTTP/[0-9.]+[ \t]+([0-9]{3})", 1
            ),
            F.lit(""),
        )
        .try_cast("int")
        .alias("http_status"),
        F.nullif(
            F.regexp_extract(
                "_http_hdr",
                r"(?i)(?:^|\n)Content-Type:[ \t]*([^\r\n;]*)",
                1,
            ),
            F.lit(""),
        ).alias("http_content_type"),
        # the redirect target header, raw (resolution against the
        # request URI is redirect_edges' job — resolving here would pay
        # the RFC 3986 regex chain on every row when only ~3xx need it)
        F.nullif(
            _ows(_warc_header(F.col("_http_hdr"), "Location")),
            F.lit(""),
        ).alias("http_location"),
        # cache validators, raw (ETag keeps its quotes and any W/ weak
        # prefix — RFC 7232 compares them byte-wise, so stripping
        # would corrupt the If-None-Match a refetch must send back)
        F.nullif(
            _ows(_warc_header(F.col("_http_hdr"), "ETag")),
            F.lit(""),
        ).alias("http_etag"),
        F.nullif(
            _ows(_warc_header(F.col("_http_hdr"), "Last-Modified")),
            F.lit(""),
        ).alias("http_last_modified"),
        # on-page robots' HTTP channel (RFC 9309's non-normative
        # cousin): raw directive list — operators/text.py:
        # robots_directive_flags folds it with <meta name="robots">
        F.nullif(
            _ows(_warc_header(F.col("_http_hdr"), "X-Robots-Tag")),
            F.lit(""),
        ).alias("http_x_robots_tag"),
        # rate-limit backoff channel, raw (RFC 9110 §10.2.3: delta-
        # seconds or an HTTP-date) — operators/urls.py:host_backoff
        # folds it with 429/503 statuses into per-host penalties
        F.nullif(
            _ows(_warc_header(F.col("_http_hdr"), "Retry-After")),
            F.lit(""),
        ).alias("http_retry_after"),
        "http_charset",
        sniffed.alias("charset_sniffed"),
        sniff_src.alias("charset_source"),
        "http_transfer_encoding",
        "http_content_encoding",
        body.alias("body"),
        reason.alias("body_reject_reason"),
        # opt-in raw-bytes passthrough (pdf_text mode: a binary PDF's
        # bytes cannot survive the text decode above — the extractor
        # needs the RAW record payload to strip the header block and
        # HTTP codings itself).  Off by default: the column is the
        # whole payload, a corpus-scale frame must not carry it.
        *(
            [F.col("payload_bin")]
            if keep_payload_bin and has_bin
            else []
        ),
    )


def mime_admitted(content_type: Column, allowlist) -> Column:
    """True when the declared media type passes a text-corpus
    allowlist — the content-type admission predicate
    ``streaming/ingest.py:CorpusIngestTask(mime_allowlist=...)`` gates
    on.  Case-insensitive on the media type alone (feed it
    :func:`warc_responses`' ``http_content_type``, which already has
    parameters like ``charset`` parsed off; trim guards the pre-``;``
    whitespace a ``text/html ; charset=..`` header leaves).  A NULL
    content type passes: the gate rejects DECLARED non-text, it does
    not demand a declaration."""
    allow = [m.strip().lower() for m in allowlist]
    norm = F.lower(F.trim(content_type))
    return norm.isNull() | norm.isin(allow)


def redirect_edges(responses: DataFrame) -> DataFrame:
    """Redirect edges out of :func:`warc_responses` output: one
    ``(url, redirect_target, http_status, record_id, warc_date)`` row
    per 3xx response that carries a ``Location`` header.  Real crawls
    are ~20-30% redirects; without this the moved page neither
    contributes its target to the frontier nor records the alias.

    ``redirect_target`` is the ABSOLUTE landing URL: RFC 7231 §7.1.2
    allows a relative URI-reference in ``Location``, so the raw header
    resolves against the request URI through
    `operators/urls.py:resolve_url` (RFC 3986 §5).  Rows whose target
    is not fetchable (fragment-only, ``javascript:`` …) drop — there
    is nothing for a fetch tier to do with them.

    Pure Catalyst: a status-range filter then the resolve projection —
    the (regex-heavy) resolve chain runs only on the 3xx subset, never
    the whole container.  Feed the output to
    `operators/urls.py:follow_redirects` to collapse chains, or into a
    frontier (`streaming/ingest.py:CorpusIngestTask` does both gates
    with ``follow_redirects=True``)."""
    from sample_dms_s3_kinesis_spark.operators import urls as _urls

    r3 = responses.filter(
        F.col("http_status").between(300, 399)
        & F.col("http_location").isNotNull()
        & F.col("target_uri").isNotNull()
    )
    return r3.select(
        F.col("target_uri").alias("url"),
        _urls.resolve_url(F.col("target_uri"), F.col("http_location")).alias(
            "redirect_target"
        ),
        "http_status",
        "record_id",
        "warc_date",
    ).filter(F.col("redirect_target").isNotNull())


def warc_conversions(records: DataFrame) -> DataFrame:
    """Text records out of a WET container (Common Crawl's
    *.warc.wet.gz sidecar: one ``conversion`` record per page whose
    payload IS the extracted text — no HTTP framing, no HTML).  Works
    on either reader's output; pair with :func:`read_warc_gz` for the
    shipped gzip form.  Keeps the WARC columns and aliases the payload
    to ``text``; intact records only (``length_ok``) — the honesty-bit
    contract is the same as :func:`warc_responses`."""
    return records.filter(
        (F.lower(F.col("warc_type")) == "conversion")
        & F.col("length_ok")
    ).select(
        "warc_type",
        "target_uri",
        "record_id",
        "warc_date",
        "content_length",
        "payload_len",
        F.col("payload").alias("text"),
    )


def http_chunked_body(body: Column, *, chunk_chars: int = 2048) -> Column:
    """Frame a text ``body`` with HTTP chunked transfer coding (the
    write direction of :func:`_dechunk`, for fixtures and for spilling
    curated pages back out as spec-shaped WARC).  Splits on CHARACTER
    boundaries every ``chunk_chars`` chars but declares each chunk's
    size in BYTES (hex), per RFC 9112 — multibyte text frames
    correctly.  Pure Catalyst (sequence + transform + concat_ws); NULL
    body stays NULL."""
    from sample_dms_s3_kinesis_spark.operators.text import _bind

    if chunk_chars < 1:
        raise ValueError(f"chunk_chars must be >= 1, got {chunk_chars}")

    def run(b):
        n_chunks = F.ceil(F.length(b) / F.lit(chunk_chars)).cast("int")
        idx = F.when(n_chunks > 0, F.sequence(F.lit(1), n_chunks)).otherwise(
            F.array().cast("array<int>")
        )
        parts = F.transform(
            idx,
            lambda i: _bind(
                F.substring(
                    b, (i - 1) * chunk_chars + 1, F.lit(chunk_chars)
                ),
                lambda c: F.concat(
                    F.lower(F.hex(F.octet_length(c))),
                    F.lit("\r\n"),
                    c,
                    F.lit("\r\n"),
                ),
            ),
        )
        return F.when(
            b.isNotNull(),
            F.concat(F.concat_ws("", parts), F.lit("0\r\n\r\n")),
        )

    return _bind(body, run)


def warc_response_record(
    *,
    target_uri: Column,
    body: Column,
    http_status: Column | None = None,
    warc_date: Column | None = None,
    record_id: Column | None = None,
    http_content_type: str = "text/html",
    warc_type: str = "response",
    extra_http_headers: Sequence[str | Column] = (),
) -> Column:
    """Build a spec-shaped WARC record STRING as a Column expression —
    the write direction of the fold, used to synthesize fixtures and to
    spill curated pages back out as WARC.  Content-Length is computed
    from the payload's UTF-8 byte length, so a re-read round-trips with
    ``length_ok = true``.  Fully distributed (pure concat — no driver
    loop, no UDF).  ``extra_http_headers`` appends header lines (e.g.
    ``"Transfer-Encoding: chunked"`` with a :func:`http_chunked_body`-
    framed body) after Content-Type; an entry may be a Column for
    per-row values (``F.concat(F.lit("Location: "), target)``)."""
    status = (
        http_status if http_status is not None else F.lit(200)
    ).cast("string")
    extra_parts: list[Column] = []
    for h in extra_http_headers:
        extra_parts.append(F.lit(h) if isinstance(h, str) else h)
        extra_parts.append(F.lit("\r\n"))
    payload = F.concat(
        F.lit("HTTP/1.1 "),
        status,
        F.lit(" \r\nContent-Type: "),
        F.lit(http_content_type),
        F.lit("\r\n"),
        *extra_parts,
        F.lit("\r\n"),
        body,
    )
    hdr = F.concat(
        F.lit(f"WARC-Type: {warc_type}\r\nWARC-Target-URI: "),
        target_uri,
        F.lit("\r\nWARC-Record-ID: "),
        (
            record_id
            if record_id is not None
            else F.concat(F.lit("<urn:uuid:"), F.md5(target_uri), F.lit(">"))
        ),
        F.lit("\r\nWARC-Date: "),
        (
            warc_date
            if warc_date is not None
            else F.lit("2026-01-01T00:00:00Z")
        ),
        F.lit("\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
    )
    # The leading boundary is written here; the trailing \r\n\r\n is
    # the record separator.  Readers tolerate sink-appended newline
    # padding between records (see read_warc_records).
    return F.concat(
        F.lit("WARC/1.0\r\n"), hdr, F.lit("\r\n\r\n"), payload,
        F.lit("\r\n\r\n"),
    )


def http_chunk_bytes(data: bytes, chunk_size: int = 2048) -> bytes:
    """Python twin of :func:`http_chunked_body` for BINARY entities
    (the Catalyst framer is text-only): frame ``data`` with HTTP
    chunked transfer coding, ``chunk_size`` bytes per chunk."""
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    out = bytearray()
    for i in range(0, len(data), chunk_size):
        c = data[i : i + chunk_size]
        out += format(len(c), "x").encode() + b"\r\n" + c + b"\r\n"
    return bytes(out + b"0\r\n\r\n")


def warc_response_record_bytes(
    target_uri: str,
    body: bytes,
    *,
    http_status: int = 200,
    http_content_type: str = "text/html",
    transfer_encoding: str | None = None,
    content_encoding: str | None = None,
) -> bytes:
    """Python/bytes twin of :func:`warc_response_record`, for records
    whose HTTP body is BINARY (gzip Content-Encoding) or chunk-framed
    — the Catalyst builder is a string expression and cannot carry
    non-UTF-8 bytes.  ``body`` must already be encoded as declared
    (pair with :mod:`gzip` and :func:`http_chunk_bytes`).  Used by
    binary fixtures and by tests; spec-shaped so a re-read through
    ``read_warc_gz(binary_payload=True)`` round-trips with
    ``length_ok = true``."""
    extra = b""
    if transfer_encoding:
        extra += f"Transfer-Encoding: {transfer_encoding}\r\n".encode()
    if content_encoding:
        extra += f"Content-Encoding: {content_encoding}\r\n".encode()
    payload = (
        f"HTTP/1.1 {http_status} \r\n"
        f"Content-Type: {http_content_type}\r\n".encode()
        + extra
        + b"\r\n"
        + body
    )
    import hashlib

    rid = hashlib.md5(target_uri.encode()).hexdigest()
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + target_uri.encode() + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload
        + b"\r\n\r\n"
    )


def warc_request_record(*, target_uri: Column) -> Column:
    """A minimal non-response record (crawler bookkeeping) for fixtures
    and filter tests."""
    payload = F.concat(F.lit("GET "), target_uri, F.lit(" HTTP/1.1"))
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: "),
        target_uri,
        F.lit("\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"),
        payload,
        F.lit("\r\n\r\n"),
    )
