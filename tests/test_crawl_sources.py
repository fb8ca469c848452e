"""Crawl-container readers (sources/crawl.py): JSONL and WARC.

Covers the record/rejects split contract for both containers, the WARC
text-source fold (header parse, response split, non-response filtering,
Content-Length honesty bit) and the builder round-trip the registry
fixtures rely on."""

import os

import pytest
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.sources import crawl


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "jsonl"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "bye"}\n'
        "NOT JSON AT ALL\n"
        '{"doc_id": 3, "text": "truncated"\n'
        '{"doc_id": "notanumber", "text": "type mismatch"}\n'
        "\n"
        '{"doc_id": 4}\n'
    )
    return str(p)


def test_jsonl_records_and_rejects(spark, jsonl_dir):
    df = crawl.read_jsonl(spark, jsonl_dir, "doc_id long, text string")
    good = {
        r["doc_id"]: r["text"] for r in crawl.jsonl_records(df).collect()
    }
    # a MISSING field is not corruption (4 parses with NULL text);
    # malformed JSON and type-mismatched fields are
    assert good == {1: "hello world", 2: "bye", 4: None}
    bad = {r["_raw_line"] for r in crawl.jsonl_rejects(df).collect()}
    assert bad == {
        '{"doc_id": "notanumber", "text": "type mismatch"}',
        '{"doc_id": 3, "text": "truncated"',
        "NOT JSON AT ALL",
    }
    # blank lines are neither records nor rejects
    assert df.count() == 6


def test_jsonl_reserved_field_guard(spark, jsonl_dir):
    with pytest.raises(ValueError, match="reserved"):
        crawl.read_jsonl(
            spark, jsonl_dir, "doc_id long, _crawl_corrupt_record string"
        )


def _write_warc_fixture(spark, out_dir):
    """Four records via the builders: three responses (one 404) and a
    request, written through the text sink like the registry fixture."""
    src = spark.range(4).select(
        F.concat(F.lit("https://ex.com/p/"), F.col("id").cast("string")).alias(
            "uri"
        ),
        F.concat(
            F.lit("<html><body><p>page "),
            F.col("id").cast("string"),
            F.lit(" text</p></body></html>"),
        ).alias("body"),
        F.col("id"),
    )
    recs = src.select(
        F.when(
            F.col("id") == 3,
            crawl.warc_request_record(target_uri=F.col("uri")),
        )
        .otherwise(
            crawl.warc_response_record(
                target_uri=F.col("uri"),
                body=F.col("body"),
                http_status=F.when(F.col("id") == 2, F.lit(404)).otherwise(
                    F.lit(200)
                ),
            )
        )
        .alias("value")
    )
    recs.coalesce(1).write.mode("overwrite").text(out_dir)


def test_warc_roundtrip_and_response_split(spark, tmp_path):
    out = str(tmp_path / "warc")
    _write_warc_fixture(spark, out)
    rec = crawl.read_warc_records(spark, out)
    rows = {r["target_uri"]: r for r in rec.collect()}
    assert len(rows) == 4
    assert {r["warc_type"] for r in rows.values()} == {"response", "request"}
    # builder-computed Content-Length survives the sink round-trip
    assert all(r["length_ok"] for r in rows.values())
    assert all(
        r["content_length"] == r["payload_len"] for r in rows.values()
    )

    resp = {
        r["target_uri"]: r for r in crawl.warc_responses(rec).collect()
    }
    # the request record is crawler bookkeeping, not a page
    assert set(resp) == {f"https://ex.com/p/{i}" for i in range(3)}
    assert resp["https://ex.com/p/2"]["http_status"] == 404
    assert resp["https://ex.com/p/0"]["http_status"] == 200
    assert resp["https://ex.com/p/0"]["http_content_type"] == "text/html"
    assert (
        resp["https://ex.com/p/1"]["body"]
        == "<html><body><p>page 1 text</p></body></html>"
    )


def test_warc_marker_collision_flags_length(spark, tmp_path):
    """A payload containing the record boundary splits early — both
    fragments must flag length_ok=false instead of silently truncating."""
    p = tmp_path / "warc2"
    p.mkdir()
    evil_body = "before WARC/1.0\r\nWARC-Type: fake\r\n\r\nafter"
    payload = f"HTTP/1.1 200 \r\n\r\n{evil_body}"
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: https://ex.com/evil\r\n"
        f"Content-Length: {len(payload.encode())}\r\n\r\n"
        f"{payload}\r\n\r\n"
    )
    (p / "f.warc").write_text(rec)
    rows = crawl.read_warc_records(spark, str(p)).collect()
    assert len(rows) == 2  # split at the embedded marker
    assert not any(r["length_ok"] for r in rows)
    # and the honest filter the ingest path uses drops both
    ok = crawl.warc_responses(
        crawl.read_warc_records(spark, str(p))
    ).filter(F.col("length_ok"))
    assert ok.count() == 0


def test_warc_malformed_record_no_blank_line(spark, tmp_path):
    p = tmp_path / "warc3"
    p.mkdir()
    (p / "f.warc").write_text(
        "WARC/1.0\r\nWARC-Type: response\r\nno blank line ever"
    )
    rows = crawl.read_warc_records(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0]["length_ok"] is False
    assert rows[0]["warc_type"] is None  # header block never terminated


def test_warc_spec_exact_separators_parse(spark, tmp_path):
    """A hand-written spec-compliant file (no sink padding) parses
    identically — the reader must not DEPEND on the text sink's
    trailing newline."""
    p = tmp_path / "warc4"
    p.mkdir()
    body = "<html><body>x</body></html>"
    payload = f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n{body}"
    recs = ""
    for i in range(2):
        recs += (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: https://s.com/{i}\r\n"
            f"Content-Length: {len(payload.encode())}\r\n\r\n"
            f"{payload}\r\n\r\n"
        )
    (p / "f.warc").write_text(recs)
    out = crawl.warc_responses(crawl.read_warc_records(spark, str(p)))
    rows = {r["target_uri"]: r for r in out.collect()}
    assert set(rows) == {"https://s.com/0", "https://s.com/1"}
    assert all(r["length_ok"] and r["body"] == body for r in rows.values())
    assert rows["https://s.com/0"]["http_status"] == 200


def test_warc_streaming_reader_matches_batch(spark, tmp_path):
    """streaming=True builds the same frame through readStream — drain
    one micro-batch and compare to the batch read."""
    out = str(tmp_path / "warc5")
    _write_warc_fixture(spark, out)
    batch = {
        (r["target_uri"], r["warc_type"])
        for r in crawl.read_warc_records(spark, out).collect()
    }
    sink = f"{tmp_path}/sink"
    q = (
        crawl.read_warc_records(spark, out, streaming=True)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["target_uri"], r["warc_type"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == batch


def test_warc_body_ending_with_crlf_roundtrips(spark, tmp_path):
    """A body that itself ends in CRLF must keep it: only the ONE
    trailing record separator strips, so Content-Length still matches
    and the record stays length_ok (regression: a leftmost strip ate
    the body's own CRLF and silently rejected spec-valid pages)."""
    p = tmp_path / "warc6"
    p.mkdir()
    body = "line one\r\nline two\r\n"
    payload = f"HTTP/1.1 200 OK\r\n\r\n{body}"
    (p / "f.warc").write_text(
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: https://s.com/crlf\r\n"
        f"Content-Length: {len(payload.encode())}\r\n\r\n"
        f"{payload}\r\n\r\n"
    )
    rows = crawl.warc_responses(
        crawl.read_warc_records(spark, str(p))
    ).collect()
    assert len(rows) == 1
    assert rows[0]["length_ok"] is True
    assert rows[0]["body"] == body

    # and through the sink round-trip (adds newline padding)
    out = str(tmp_path / "warc7")
    spark.range(1).select(
        crawl.warc_response_record(
            target_uri=F.lit("https://s.com/crlf2"), body=F.lit(body)
        ).alias("value")
    ).coalesce(1).write.text(out)
    rows = crawl.warc_responses(
        crawl.read_warc_records(spark, out)
    ).collect()
    assert rows[0]["length_ok"] is True and rows[0]["body"] == body


def test_warc_gz_matches_text_reader(spark, tmp_path):
    """read_warc_gz is the Python twin of the Catalyst parse: over a
    fixture hitting every branch (normal, CRLF body, 404, request,
    marker collision, malformed, padding), the gz frame must equal the
    text-reader frame row-for-row — single-member AND multi-member
    (Common Crawl style, one gzip member per record) containers."""
    import gzip

    body_a = "<html><body><p>alpha page</p></body></html>"
    body_crlf = "line one\r\nline two\r\n"
    evil = "x WARC/1.0\r\nWARC-Type: fake\r\n\r\ny"
    records = []
    for uri, body, status in [
        ("https://g.com/p/1", body_a, 200),
        ("https://g.com/p/2", body_crlf, 200),
        ("https://g.com/p/3", "<p>gone for good</p>", 404),
        ("https://g.com/evil", evil, 200),
    ]:
        payload = f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n{body}"
        records.append(
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload.encode())}\r\n\r\n"
            f"{payload}\r\n\r\n"
        )
    records.append(
        "WARC/1.0\r\nWARC-Type: request\r\n"
        "WARC-Target-URI: https://g.com/p/1\r\n"
        "Content-Length: 3\r\n\r\nGET\r\n\r\n"
    )
    # Content-Length literals where Python int() and Spark's
    # try_cast('long') historically disagreed: underscore separator
    # (int('2_9')==29, try_cast NULL) and int64 overflow (int fine,
    # try_cast NULL) — both must fold to NULL/length_ok=false in BOTH
    # readers
    records.append(
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://g.com/weird1\r\n"
        "Content-Length: 2_9\r\n\r\n"
        "HTTP/1.1 200 OK\r\n\r\nunderscore length body here\r\n\r\n"
    )
    records.append(
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://g.com/weird2\r\n"
        "Content-Length: 99999999999999999999\r\n\r\n"
        "HTTP/1.1 200 OK\r\n\r\noverflow length body\r\n\r\n"
    )
    # separator-padding divergence literals: non-ASCII whitespace after
    # the record separator — U+00A0 (Python's unicode \s used to strip
    # it; Java's ASCII \s never did) and U+2028 (Java's $ used to match
    # before it as a final line terminator; Python's never did).  With
    # the shared ASCII class + \z/\Z anchor BOTH readers must keep the
    # tail (payload_len mismatch -> length_ok false) identically.
    records.append(
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://g.com/nbsp\r\n"
        "Content-Length: 4\r\n\r\nbody\r\n\r\n\u00a0 "
    )
    records.append(
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://g.com/ls\r\n"
        "Content-Length: 4\r\n\r\nbody\r\n\r\n\u2028"
    )
    # header-anchor divergence literal: a header name after a bare \r
    # (Java (?m)^ fired there; Python's only after \n) — invisible to
    # BOTH readers under the explicit (?:^|\n) anchor
    records.append(
        "WARC/1.0\r\nWARC-Type: response\rContent-Type: text/html\r\n"
        "WARC-Target-URI: https://g.com/cr\r\n"
        "Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    # trailing malformed record: header never terminated
    records.append("WARC/1.0\r\nWARC-Type: metadata\r\nno blank line")

    plain = "".join(records)
    tdir = tmp_path / "txt"
    tdir.mkdir()
    (tdir / "f.warc").write_text(plain)

    gdir = tmp_path / "gz"
    gdir.mkdir()
    (gdir / "single.warc.gz").write_bytes(gzip.compress(plain.encode()))
    # multi-member: one gzip member per record, concatenated
    (gdir / "multi.warc.gz").write_bytes(
        b"".join(gzip.compress(r.encode()) for r in records)
    )

    want = sorted(
        map(tuple, crawl.read_warc_records(spark, str(tdir)).collect()),
        key=repr,
    )
    for f in ["single.warc.gz", "multi.warc.gz"]:
        got = sorted(
            map(
                tuple,
                crawl.read_warc_gz(
                    spark, str(gdir / f), batch_rows=2
                ).collect(),
            ),
            key=repr,
        )
        assert got == want, f
    # and the response split composes identically on top
    resp = crawl.warc_responses(
        crawl.read_warc_gz(spark, str(gdir / "single.warc.gz"))
    )
    rows = {r["target_uri"]: r for r in resp.collect()}
    assert rows["https://g.com/p/2"]["body"] == body_crlf
    assert rows["https://g.com/p/2"]["length_ok"] is True


def test_wet_conversion_records(spark, tmp_path):
    """WET sidecar support: 'conversion' records carry extracted text
    as the raw payload (no HTTP framing); warc_conversions keeps
    intact ones as (text) rows and both readers feed it."""
    import gzip

    texts = {
        "https://w.com/1": "extracted text of page one\nsecond line",
        "https://w.com/2": "page two words here",
    }
    recs = ""
    for uri, text in texts.items():
        recs += (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(text.encode())}\r\n\r\n"
            f"{text}\r\n\r\n"
        )
    # one warcinfo record: filtered by type
    recs += (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        "Content-Length: 4\r\n\r\ninfo\r\n\r\n"
    )
    p = tmp_path / "wet"
    p.mkdir()
    (p / "f.warc.wet").write_text(recs)
    g = tmp_path / "wetgz"
    g.mkdir()
    (g / "f.warc.wet.gz").write_bytes(gzip.compress(recs.encode()))

    for frame in [
        crawl.read_warc_records(spark, str(p)),
        crawl.read_warc_gz(spark, str(g)),
    ]:
        got = {
            r["target_uri"]: r["text"]
            for r in crawl.warc_conversions(frame).collect()
        }
        assert got == texts


def _zlib_c(data):
    import zlib

    return zlib.compress(data)


def _raw_deflate(data):
    import zlib

    c = zlib.compressobj(wbits=-15)
    return c.compress(data) + c.flush()


def _enc_records(body):
    """WARC records covering every HTTP-encoding variant of ``body``:
    plain, chunked, gzip, chunked+gzip, deflate (zlib-wrapped and
    raw), plus an unsupported coding."""
    import gzip as _gz

    def chunk_bytes(data, n=100):
        out = b""
        for i in range(0, len(data), n):
            c = data[i : i + n]
            out += format(len(c), "x").encode() + b"\r\n" + c + b"\r\n"
        return out + b"0\r\n\r\n"

    def rec(uri, payload):
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
            + uri.encode()
            + b"\r\nContent-Length: "
            + str(len(payload)).encode()
            + b"\r\n\r\n"
            + payload
            + b"\r\n\r\n"
        )

    def http(extra, ent):
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + extra
            + b"\r\n"
            + ent
        )

    raw = body.encode()
    gz_body = _gz.compress(raw, mtime=0)
    return {
        "https://e.com/plain": rec(
            "https://e.com/plain", http(b"", raw)
        ),
        "https://e.com/chunked": rec(
            "https://e.com/chunked",
            http(b"Transfer-Encoding: chunked\r\n", chunk_bytes(raw)),
        ),
        "https://e.com/gzip": rec(
            "https://e.com/gzip",
            http(b"Content-Encoding: gzip\r\n", gz_body),
        ),
        "https://e.com/both": rec(
            "https://e.com/both",
            http(
                b"Transfer-Encoding: chunked\r\n"
                b"Content-Encoding: gzip\r\n",
                chunk_bytes(gz_body),
            ),
        ),
        "https://e.com/br": rec(
            "https://e.com/br",
            http(b"Content-Encoding: br\r\n", raw),
        ),
        # deflate both ways servers actually send it: zlib-wrapped
        # (the RFC meaning) and raw DEFLATE (the common violation)
        "https://e.com/deflate": rec(
            "https://e.com/deflate",
            http(b"Content-Encoding: deflate\r\n", _zlib_c(raw)),
        ),
        "https://e.com/deflate-raw": rec(
            "https://e.com/deflate-raw",
            http(b"Content-Encoding: deflate\r\n", _raw_deflate(raw)),
        ),
    }


def test_encoded_bodies_decode_on_binary_path(spark, tmp_path):
    """Real-crawl HTTP encodings through read_warc_gz(
    binary_payload=True): chunked, gzip and chunked+gzip all decode
    back to the original entity; an unsupported coding (br) honestly
    yields body NULL.  This is the chunked+gzipped round-trip
    regression the text path can never satisfy."""
    import gzip as _gz

    body = "öne füll pàge of text " * 200  # multibyte, multi-chunk
    recs = _enc_records(body)
    g = tmp_path / "enc"
    g.mkdir()
    (g / "f.warc.gz").write_bytes(
        b"".join(_gz.compress(r) for r in recs.values())
    )
    frame = crawl.read_warc_gz(spark, str(g), binary_payload=True)
    assert frame.columns == crawl._WARC_BIN_SCHEMA.fieldNames()
    # raw-byte length accounting: every record is intact
    assert all(r["length_ok"] for r in frame.collect())
    rows = {
        r["target_uri"]: r
        for r in crawl.warc_responses(frame).collect()
    }
    assert rows["https://e.com/plain"]["body"] == body
    for u, te, ce in [
        ("https://e.com/chunked", "chunked", None),
        ("https://e.com/gzip", None, "gzip"),
        ("https://e.com/both", "chunked", "gzip"),
        ("https://e.com/deflate", None, "deflate"),
        ("https://e.com/deflate-raw", None, "deflate"),
    ]:
        assert rows[u]["body"] == body, u
        assert rows[u]["http_transfer_encoding"] == te, u
        assert rows[u]["http_content_encoding"] == ce, u
    # unsupported coding: flagged, not garbage
    assert rows["https://e.com/br"]["body"] is None
    assert rows["https://e.com/br"]["http_content_encoding"] == "br"
    assert rows["https://e.com/br"]["length_ok"] is True


def test_encoded_bodies_on_text_path(spark, tmp_path):
    """The text reader decodes chunked (text-safe framing) in pure
    Catalyst; gzip bytes are mangled by the text source, so those
    records reject honestly — body NULL and/or length_ok false —
    instead of feeding garbage to html_extract."""
    body = "chünked pãge text " * 150
    recs = _enc_records(body)
    p = tmp_path / "enctxt"
    p.mkdir()
    (p / "f.warc").write_bytes(b"".join(recs.values()))
    rows = {
        r["target_uri"]: r
        for r in crawl.warc_responses(
            crawl.read_warc_records(spark, str(p))
        ).collect()
    }
    assert rows["https://e.com/plain"]["body"] == body
    assert rows["https://e.com/chunked"]["body"] == body
    assert rows["https://e.com/chunked"]["length_ok"] is True
    for u in ["https://e.com/gzip", "https://e.com/both"]:
        assert rows[u]["body"] is None or rows[u]["length_ok"] is False, u
    # and the binary gz reader in DEFAULT (text-twin) mode agrees with
    # the text reader row-for-row on this fixture too
    import gzip as _gz

    g = tmp_path / "encgz"
    g.mkdir()
    (g / "f.warc.gz").write_bytes(
        _gz.compress(b"".join(recs.values()))
    )
    want = sorted(
        map(tuple, crawl.read_warc_records(spark, str(p)).collect()),
        key=repr,
    )
    got = sorted(
        map(tuple, crawl.read_warc_gz(spark, str(g)).collect()),
        key=repr,
    )
    assert got == want


def test_chunked_decoder_twins_agree(spark):
    """_dechunk (Catalyst fold) and _dechunk_py (the gunzip UDF's
    Python twin) must agree byte-for-byte on well-formed AND malformed
    framings."""
    import gzip as _gz

    gz_bytes = _gz.compress(b"payload bytes \xff\x00 binary", mtime=0)

    def chunk_bytes(data, n):
        out = b""
        for i in range(0, len(data), n):
            c = data[i : i + n]
            out += format(len(c), "x").encode() + b"\r\n" + c + b"\r\n"
        return out + b"0\r\n\r\n"

    cases = [
        chunk_bytes(b"hello world", 4),
        chunk_bytes(gz_bytes, 7),  # binary chunk data
        b"b;ext=1\r\nhello world\r\n0\r\n\r\n",  # chunk extension
        b"0\r\n\r\n",  # empty entity
        b"0\r\nTrailer: x\r\n\r\n",  # trailers tolerated
        b"zz\r\nhello\r\n0\r\n\r\n",  # bad size line
        b"5\r\nhello\r\n",  # missing terminal chunk
        b"6\r\nhello\r\n0\r\n\r\n",  # size larger than data+sep
        b"5\r\nhelloXX0\r\n\r\n",  # missing chunk CRLF
        b"5;" + b"e" * 300 + b"\r\nhello\r\n0\r\n\r\n",  # ext too long
        b"",  # empty input
    ]
    df = spark.createDataFrame(
        [(i, bytearray(c)) for i, c in enumerate(cases)],
        "i int, b binary",
    )
    got = {
        r["i"]: (r["d"]["ok"], bytes(r["d"]["data"]) if r["d"]["data"] is not None else None)
        for r in df.select(
            "i", crawl._dechunk(F.col("b")).alias("d")
        ).collect()
    }
    for i, c in enumerate(cases):
        py = crawl._dechunk_py(c)
        assert got[i] == (py is not None, py), (i, c[:40])


def test_chunked_builder_roundtrips(spark):
    """http_chunked_body -> _dechunk is the identity on text,
    including multibyte chunks split on char boundaries and the empty
    and NULL edge cases."""
    texts = ["héllo wörld! " * 300, "short", "", "日本語テキスト" * 99]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, t string"
    )
    out = df.select(
        "i",
        "t",
        crawl._dechunk(
            F.encode(
                crawl.http_chunked_body(F.col("t"), chunk_chars=64),
                "utf-8",
            )
        ).alias("d"),
    ).collect()
    for r in out:
        assert r["d"]["ok"] is True
        assert bytes(r["d"]["data"]).decode("utf-8") == r["t"]
    n = df.select(
        crawl.http_chunked_body(F.lit(None).cast("string")).alias("f")
    ).collect()[0]["f"]
    assert n is None


def test_cdx_reader_and_latest_selection(spark, tmp_path):
    """CDXJ index lines: (urlkey, 14-digit ts, json) parse
    schema-on-read; malformed shapes (bad timestamp, missing fields,
    truncated json) reject; latest-capture selection picks the newest
    valid capture per urlkey with a capture count."""
    p = tmp_path / "cdx"
    p.mkdir()
    (p / "idx.cdx").write_text(
        "com,a)/x 20240101000000 "
        '{"url": "https://a.com/x", "status": "200", "digest": "d1"}\n'
        "com,a)/x 20240301000000 "
        '{"url": "https://a.com/x", "status": "200", "digest": "d2"}\n'
        "com,b)/y 20240102000000 "
        '{"url": "https://b.com/y", "status": "404", "digest": "d3"}\n'
        # malformed: truncated JSON
        "com,c)/z 20240103000000 "
        '{"url": "https://c.com/z", "status": "200"\n'
        # malformed: timestamp not 14 digits
        "com,d)/w 2024010 "
        '{"url": "https://d.com/w", "status": "200", "digest": "d4"}\n'
        # malformed: no json block at all
        "com,e)/v 20240104000000\n"
        "\n"
    )
    df = crawl.read_cdx(
        spark, str(p), "url string, status string, digest string"
    )
    good = crawl.jsonl_records(df)
    assert {
        (r["urlkey"], r["capture_ts"], r["digest"])
        for r in good.collect()
    } == {
        ("com,a)/x", "20240101000000", "d1"),
        ("com,a)/x", "20240301000000", "d2"),
        ("com,b)/y", "20240102000000", "d3"),
    }
    assert crawl.jsonl_rejects(df).count() == 3

    latest = crawl.cdx_latest_captures(good.drop("_raw_line", "_corrupt"))
    rows = {r["urlkey"]: r for r in latest.collect()}
    assert rows["com,a)/x"]["capture_ts"] == "20240301000000"
    assert rows["com,a)/x"]["digest"] == "d2"
    assert rows["com,a)/x"]["n_captures"] == 2
    assert rows["com,b)/y"]["n_captures"] == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="reserved"):
        crawl.read_cdx(
            spark, str(p), "_crawl_corrupt_record string"
        )


def test_sitemap_entries(spark):
    """Sitemap XML extraction: urlset vs sitemapindex kinds, entity
    decode, whitespace/namespace/attribute tolerance, mandatory-loc
    rule, and <url> not matching <urlset>."""
    files = spark.createDataFrame(
        [
            (
                "a.com",
                '<?xml version="1.0"?>\n<urlset '
                'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                "<url><loc> https://a.com/p?x=1&amp;y=2 </loc>"
                "<lastmod>2024-03-01</lastmod></url>"
                "<url>\n<loc>https://a.com/q</loc>\n</url>"
                "<url><lastmod>2024-01-01</lastmod></url>"  # no loc
                "</urlset>",
            ),
            (
                "b.com",
                "<sitemapindex><sitemap><loc>https://b.com/s1.xml"
                "</loc></sitemap></sitemapindex>",
            ),
            (
                # namespace-prefixed output (ElementTree default) and
                # an attribute-carrying <loc> must both extract
                "c.com",
                '<ns0:urlset xmlns:ns0="http://www.sitemaps.org/'
                'schemas/sitemap/0.9"><ns0:url>'
                "<ns0:loc>https://c.com/n</ns0:loc></ns0:url>"
                "</ns0:urlset>"
                '<urlset><url><loc xml:space="preserve">'
                "https://c.com/attr</loc></url></urlset>",
            ),
        ],
        "host string, xml string",
    )
    got = {
        (r["host"], r["kind"], r["loc"], r["lastmod"])
        for r in crawl.sitemap_entries(files).collect()
    }
    assert got == {
        ("a.com", "url", "https://a.com/p?x=1&y=2", "2024-03-01"),
        ("a.com", "url", "https://a.com/q", None),
        ("b.com", "sitemap", "https://b.com/s1.xml", None),
        ("c.com", "url", "https://c.com/n", None),
        ("c.com", "url", "https://c.com/attr", None),
    }


def test_body_reject_reasons(spark, tmp_path):
    """body_reject_reason names WHY every undecodable body is NULL —
    the per-coding observability a corpus owner aggregates to see what
    an ingest funnel loses (br pages on a brotli-less cluster, corrupt
    gzip, bad chunked framing, exotic codings) — and stays NULL on
    every decoded row."""
    import gzip as _gz

    body = "reject reason page text " * 40
    raw = body.encode()
    gz = _gz.compress(raw, mtime=0)
    bad_chunk = b"Z" + crawl.http_chunk_bytes(raw, 64)[1:]  # size line broken
    bad_chunk_gz = b"Z" + crawl.http_chunk_bytes(gz, 64)[1:]
    recs = {
        "https://r.com/plain": (raw, None, None),
        "https://r.com/gzip": (gz, None, "gzip"),
        "https://r.com/br": (raw, None, "br"),
        "https://r.com/zstd": (raw, None, "zstd"),
        "https://r.com/corrupt-gzip": (gz[:-4], None, "gzip"),
        "https://r.com/bad-chunked": (bad_chunk, "chunked", None),
        "https://r.com/bad-chunked-gzip": (bad_chunk_gz, "chunked", "gzip"),
        "https://r.com/te-gzip": (gz, "gzip", None),
        "https://r.com/ce-compress": (raw, None, "compress"),
    }
    g = tmp_path / "rej"
    g.mkdir()
    (g / "f.warc.gz").write_bytes(
        b"".join(
            _gz.compress(
                crawl.warc_response_record_bytes(
                    u, b, transfer_encoding=te, content_encoding=ce
                )
            )
            for u, (b, te, ce) in recs.items()
        )
    )
    rows = {
        r["target_uri"]: r
        for r in crawl.warc_responses(
            crawl.read_warc_gz(spark, str(g), binary_payload=True)
        ).collect()
    }
    assert rows["https://r.com/plain"]["body"] == body
    assert rows["https://r.com/plain"]["body_reject_reason"] is None
    assert rows["https://r.com/gzip"]["body"] == body
    assert rows["https://r.com/gzip"]["body_reject_reason"] is None
    # optional codecs: decode when the package exists, otherwise the
    # distinct *_unavailable reason (never a silent NULL)
    if crawl._load_brotli() is None:
        assert rows["https://r.com/br"]["body"] is None
        assert (
            rows["https://r.com/br"]["body_reject_reason"]
            == "br_unavailable"
        )
    if crawl._load_zstd() is None:
        assert rows["https://r.com/zstd"]["body"] is None
        assert (
            rows["https://r.com/zstd"]["body_reject_reason"]
            == "zstd_unavailable"
        )
    expect = {
        "https://r.com/corrupt-gzip": "decompress_failed",
        "https://r.com/bad-chunked": "bad_chunked_framing",
        "https://r.com/bad-chunked-gzip": "bad_chunked_framing",
        "https://r.com/te-gzip": "unsupported_transfer_encoding",
        "https://r.com/ce-compress": "unsupported_content_encoding",
    }
    for u, reason in expect.items():
        assert rows[u]["body"] is None, u
        assert rows[u]["body_reject_reason"] == reason, u
    # text path: compressed bodies carry their own distinct reason
    p = tmp_path / "rejtxt"
    p.mkdir()
    (p / "f.warc").write_bytes(
        crawl.warc_response_record_bytes(
            "https://r.com/gzip", gz, content_encoding="gzip"
        )
    )
    (trow,) = crawl.warc_responses(
        crawl.read_warc_records(spark, str(p))
    ).collect()
    assert trow["body"] is None
    assert trow["body_reject_reason"] == "compressed_body_on_text_path"


def test_warc_responses_max_chunks_knob(spark, tmp_path):
    """A well-formed chunked body with more chunks than ``max_chunks``
    rejects as bad_chunked_framing; raising the knob (or the 8192
    default) decodes it — on the Catalyst fold AND the in-UDF Python
    twin (chunked+gzip, whose ~40 gzip bytes still make >8 chunks at
    2 bytes each)."""
    import gzip as _gz

    body = "x" * 4000  # 2000 chunks at 2 bytes each
    chunked = crawl.http_chunk_bytes(body.encode(), 2)
    chunked_gz = crawl.http_chunk_bytes(
        _gz.compress(body.encode(), mtime=0), 2
    )
    g = tmp_path / "mc"
    g.mkdir()
    (g / "f.warc.gz").write_bytes(
        b"".join(
            _gz.compress(
                crawl.warc_response_record_bytes(
                    u, b, transfer_encoding="chunked", content_encoding=ce
                )
            )
            for u, b, ce in [
                ("https://m.com/fold", chunked, None),
                ("https://m.com/udf", chunked_gz, "gzip"),
            ]
        )
    )
    frame = crawl.read_warc_gz(spark, str(g), binary_payload=True)
    low = {
        r["target_uri"]: r
        for r in crawl.warc_responses(frame, max_chunks=8).collect()
    }
    for u in ("https://m.com/fold", "https://m.com/udf"):
        assert low[u]["body"] is None, u
        assert low[u]["body_reject_reason"] == "bad_chunked_framing", u
    high = {
        r["target_uri"]: r
        for r in crawl.warc_responses(frame).collect()
    }
    for u in ("https://m.com/fold", "https://m.com/udf"):
        assert high[u]["body"] == body, u
        assert high[u]["body_reject_reason"] is None, u


def test_chunked_fold_evaluates_once(spark, tmp_path):
    """body and body_reject_reason both read the chunked fold's output
    struct; the fold must appear ONCE in the optimized plan (the gated
    alias stays staged — CollapseProject refuses to duplicate a
    non-cheap multiply-referenced alias), not once per output column."""
    import gzip as _gz

    rec = crawl.warc_response_record_bytes(
        "https://o.com/c",
        crawl.http_chunk_bytes(b"once is enough", 4),
        transfer_encoding="chunked",
    )
    g = tmp_path / "once"
    g.mkdir()
    (g / "f.warc.gz").write_bytes(_gz.compress(rec))
    for frame in (
        crawl.read_warc_gz(spark, str(g), binary_payload=True),
        crawl.read_warc_gz(spark, str(g)),
    ):
        plan = (
            crawl.warc_responses(frame)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert plan.count("aggregate(") == 1, plan.count("aggregate(")


def test_binary_walk_survives_embedded_boundary(spark, tmp_path):
    """A raw binary payload CONTAINING the b'WARC/1.0\\r\\n' boundary
    byte sequence must survive intact in binary_payload mode: the
    reader walks records by declared Content-Length instead of blind
    boundary splitting (a compressed body is uniform bytes — at corpus
    scale the marker does occur), and falls back to boundary scanning
    only for records without a parseable length."""
    import gzip as _gz

    evil = b"AAAA" + b"WARC/1.0\r\n" + b"BBBB"  # marker mid-payload
    rec_evil = crawl.warc_response_record_bytes(
        "https://w.com/evil", evil, content_encoding="gzip"
    )
    rec_plain = crawl.warc_response_record_bytes(
        "https://w.com/plain", b"plain body"
    )
    # a record whose Content-Length header is unparseable exercises the
    # boundary-scan fallback and must still reject honestly
    rec_nolen = rec_plain.replace(
        b"Content-Length: " + str(len(b"HTTP/1.1 200 \r\nContent-Type: text/html\r\n\r\nplain body")).encode(),
        b"Content-Length: banana",
    ).replace(b"/plain", b"/nolen")
    g = tmp_path / "emb"
    g.mkdir()
    (g / "f.warc.gz").write_bytes(
        b"".join(_gz.compress(r) for r in (rec_evil, rec_plain, rec_nolen))
    )
    rows = {
        r["target_uri"]: r
        for r in crawl.read_warc_gz(
            spark, str(g), binary_payload=True
        ).collect()
    }
    assert rows["https://w.com/evil"]["length_ok"] is True
    assert bytes(rows["https://w.com/evil"]["payload_bin"]).endswith(evil)
    assert rows["https://w.com/plain"]["length_ok"] is True
    assert rows["https://w.com/nolen"]["length_ok"] is False
    # and warc_responses sees the intact payload (raw bytes, no ce
    # decode needed here: the 'gzip' label on evil is a lie, so the
    # decoder rejects it with a reason rather than crashing)
    resp = {
        r["target_uri"]: r
        for r in crawl.warc_responses(
            crawl.read_warc_gz(spark, str(g), binary_payload=True)
        ).collect()
    }
    assert resp["https://w.com/evil"]["body_reject_reason"] == "decompress_failed"
    assert resp["https://w.com/plain"]["body"] == "plain body"


def test_cdx_latest_captures_ties_and_empty_payload(spark):
    """Exact capture_ts ties break deterministically (greatest payload
    struct), and a frame with ONLY the key and timestamp columns
    raises a clear ValueError instead of an opaque struct() error."""
    import pytest

    df = spark.createDataFrame(
        [
            ("k1", "20240101000000", "a", "d1"),
            ("k1", "20240101000000", "b", "d2"),  # tie: picks ('b','d2')
            ("k2", "20240201000000", "x", "d3"),
            ("k2", "20240101000000", "z", "d4"),  # older: loses
        ],
        "urlkey string, capture_ts string, status string, digest string",
    )
    got = {
        r["urlkey"]: (r["status"], r["digest"], r["n_captures"])
        for r in crawl.cdx_latest_captures(df).collect()
    }
    assert got == {"k1": ("b", "d2", 2), "k2": ("x", "d3", 2)}
    with pytest.raises(ValueError, match="payload column"):
        crawl.cdx_latest_captures(df.select("urlkey", "capture_ts"))


def test_sitemap_entries_match_etree_reference(spark):
    """sitemap_entries == an xml.etree reference over seeded-random
    WELL-FORMED sitemaps (urlset + sitemapindex, optional namespace,
    whitespace inside <loc>, escaped '&amp;' in locs, optional
    lastmod/priority, empty files).  The operator additionally
    tolerates malformed XML the reference cannot parse — that half is
    covered by the hand-worked tolerance cases above; this pins the
    well-formed core.  A 150-file development probe ran 0 divergences."""
    import html as _html
    import random
    import xml.etree.ElementTree as ET

    def ref_entries(xml_text):
        root = ET.fromstring(xml_text)
        tag = root.tag.split("}")[-1]
        if tag == "urlset":
            kind = child = "url"
        elif tag == "sitemapindex":
            kind, child = "sitemap", "sitemap"
        else:
            return []
        out = []
        for e in root:
            if e.tag.split("}")[-1] != child:
                continue
            loc = lastmod = None
            for c in e:
                n = c.tag.split("}")[-1]
                if n == "loc":
                    loc = (c.text or "").strip()
                elif n == "lastmod":
                    lastmod = (c.text or "").strip()
            if loc:
                out.append((kind, _html.unescape(loc), lastmod))
        return out

    rng = random.Random(4242)
    ns = ["", ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"']

    def rloc(i):
        base = f"https://s{rng.randint(1, 3)}.example/p/{i}"
        if rng.random() < 0.3:
            base += "?a=1&amp;b=2"
        return base

    def rfile():
        ws = rng.choice(["", "\n  ", " "])
        if rng.random() < 0.3:
            entries = "".join(
                f"<sitemap>{ws}<loc>{rloc(i)}</loc>{ws}"
                + (
                    f"<lastmod>2024-0{rng.randint(1, 9)}-01</lastmod>"
                    if rng.random() < 0.5
                    else ""
                )
                + "</sitemap>"
                for i in range(rng.randint(0, 4))
            )
            return (
                '<?xml version="1.0"?><sitemapindex'
                f"{rng.choice(ns)}>{entries}</sitemapindex>"
            )
        entries = "".join(
            f"<url>{ws}<loc>{ws}{rloc(i)}{ws}</loc>"
            + (
                f"<lastmod>2024-0{rng.randint(1, 9)}-01T00:0{rng.randint(0, 9)}:00Z</lastmod>"
                if rng.random() < 0.5
                else ""
            )
            + (
                f"<priority>0.{rng.randint(1, 9)}</priority>"
                if rng.random() < 0.3
                else ""
            )
            + "</url>"
            for i in range(rng.randint(0, 5))
        )
        return f'<?xml version="1.0"?><urlset{rng.choice(ns)}>{entries}</urlset>'

    files = [(f"h{i}", rfile()) for i in range(60)]
    df = spark.createDataFrame(files, "host string, xml string")
    got = {}
    for r in crawl.sitemap_entries(df).collect():
        got.setdefault(r["host"], []).append(
            (r["kind"], r["loc"], r["lastmod"])
        )
    bad = []
    for h, xml_text in files:
        if sorted(got.get(h, [])) != sorted(ref_entries(xml_text)):
            bad.append((h, got.get(h, []), ref_entries(xml_text)))
    assert not bad, bad[:3]


def test_charset_transcode_binary_path(spark, tmp_path):
    """Declared non-UTF-8 charsets transcode in the entity udf on the
    binary path: Latin-1 plain, Shift-JIS under gzip, chunked Latin-1,
    an unknown charset rejects counted, explicit utf-8 is a no-op."""
    import gzip

    d = tmp_path / "w"
    d.mkdir()
    recs = [
        crawl.warc_response_record_bytes(
            "https://t/0",
            "café ñ body".encode("latin-1"),
            http_content_type="text/html; charset=ISO-8859-1",
        ),
        crawl.warc_response_record_bytes(
            "https://t/1",
            gzip.compress(
                "こんにちは world".encode("shift_jis"), mtime=0
            ),
            http_content_type='text/html; charset="Shift_JIS"',
            content_encoding="gzip",
        ),
        crawl.warc_response_record_bytes(
            "https://t/2",
            b"abc",
            http_content_type="text/html; charset=x-klingon",
        ),
        crawl.warc_response_record_bytes(
            "https://t/3",
            "plain ü".encode(),
            http_content_type="text/html; charset=UTF-8",
        ),
        crawl.warc_response_record_bytes(
            "https://t/4",
            crawl.http_chunk_bytes("chunké".encode("latin-1"), 4),
            http_content_type="text/html; charset=latin-1",
            transfer_encoding="chunked",
        ),
    ]
    with open(d / "a.warc.gz", "wb") as f:
        f.write(b"".join(gzip.compress(r, mtime=0) for r in recs))
    rows = {
        r["target_uri"]: (
            r["http_charset"],
            r["body"],
            r["body_reject_reason"],
        )
        for r in crawl.warc_responses(
            crawl.read_warc_gz(spark, str(d), binary_payload=True)
        ).collect()
    }
    assert rows == {
        "https://t/0": ("iso-8859-1", "café ñ body", None),
        "https://t/1": ("shift_jis", "こんにちは world", None),
        "https://t/2": ("x-klingon", None, "unsupported_charset"),
        "https://t/3": ("utf-8", "plain ü", None),
        "https://t/4": ("latin-1", "chunké", None),
    }


def test_charset_sniffing_bom_and_meta(spark, tmp_path):
    """WHATWG charset detection beyond the Content-Type header: BOM >
    header > <meta charset>/<meta http-equiv> (first 1024 bytes) >
    UTF-8.  A header-less Latin-1 page with a meta declaration lands
    clean; BOMs decode and strip; an explicit header beats meta."""
    import gzip

    d = tmp_path / "w"
    d.mkdir()
    meta_l1 = (
        '<html><head><meta charset="ISO-8859-1"></head>'
        "<body>café ñ</body></html>"
    )
    meta_sj = (
        "<html><head><meta http-equiv=\"Content-Type\" "
        "content=\"text/html; charset=Shift_JIS\"></head>"
        "<body>こんにちは</body></html>"
    )
    recs = [
        # 0: meta-declared Latin-1, NO header charset
        crawl.warc_response_record_bytes(
            "https://t/0", meta_l1.encode("latin-1")
        ),
        # 1: meta http-equiv Shift-JIS, NO header charset
        crawl.warc_response_record_bytes(
            "https://t/1", meta_sj.encode("shift_jis")
        ),
        # 2: UTF-8 BOM, nothing declared -> decode + strip
        crawl.warc_response_record_bytes(
            "https://t/2", b"\xef\xbb\xbf" + "bom ü body".encode()
        ),
        # 3: UTF-16LE BOM -> BOM-consuming utf-16 decode
        crawl.warc_response_record_bytes(
            "https://t/3", "utf16 body é".encode("utf-16")
        ),
        # 4: UTF-8 BOM beats a WRONG Latin-1 header
        crawl.warc_response_record_bytes(
            "https://t/4",
            b"\xef\xbb\xbf" + "bom wins ü".encode(),
            http_content_type="text/html; charset=ISO-8859-1",
        ),
        # 5: explicit utf-8 header beats a Latin-1 meta tag
        crawl.warc_response_record_bytes(
            "https://t/5",
            '<meta charset="ISO-8859-1">header wins ü'.encode(),
            http_content_type="text/html; charset=UTF-8",
        ),
        # 6: gzip + meta Latin-1 (no header) -> udf decompresses,
        #    prescans, transcodes
        crawl.warc_response_record_bytes(
            "https://t/6",
            gzip.compress(meta_l1.encode("latin-1"), mtime=0),
            content_encoding="gzip",
        ),
        # 7: gzip + UTF-8 BOM -> udf strips post-decompress
        crawl.warc_response_record_bytes(
            "https://t/7",
            gzip.compress(b"\xef\xbb\xbf" + "zipped ü".encode(), mtime=0),
            content_encoding="gzip",
        ),
        # 8: nothing anywhere -> plain utf-8, no sniff columns
        crawl.warc_response_record_bytes(
            "https://t/8", "plain page".encode()
        ),
        # 9: 'charset=' inside a DESCRIPTION meta is NOT a declaration
        #    (the prescan must not transcode a valid UTF-8 page
        #    through a codec someone merely wrote about)
        crawl.warc_response_record_bytes(
            "https://t/9",
            '<meta name="description" content="set charset=iso-8859-1">'
            "ü body".encode(),
        ),
    ]
    with open(d / "a.warc.gz", "wb") as f:
        f.write(b"".join(gzip.compress(r, mtime=0) for r in recs))
    rows = {
        r["target_uri"]: (
            r["body"],
            r["body_reject_reason"],
            r["charset_sniffed"],
            r["charset_source"],
        )
        for r in crawl.warc_responses(
            crawl.read_warc_gz(spark, str(d), binary_payload=True)
        ).collect()
    }
    assert rows["https://t/0"] == (meta_l1, None, "iso-8859-1", "meta")
    assert rows["https://t/1"] == (meta_sj, None, "shift_jis", "meta")
    assert rows["https://t/2"] == ("bom ü body", None, "utf-8", "bom")
    assert rows["https://t/3"] == ("utf16 body é", None, "utf-16", "bom")
    assert rows["https://t/4"] == ("bom wins ü", None, "utf-8", "bom")
    assert rows["https://t/5"] == (
        '<meta charset="ISO-8859-1">header wins ü',
        None,
        "utf-8",
        "header",
    )
    assert rows["https://t/6"] == (meta_l1, None, "iso-8859-1", "meta")
    assert rows["https://t/7"] == ("zipped ü", None, "utf-8", "bom")
    assert rows["https://t/8"] == ("plain page", None, None, None)
    assert rows["https://t/9"] == (
        '<meta name="description" content="set charset=iso-8859-1">'
        "ü body",
        None,
        None,
        None,
    )


def test_charset_meta_on_text_path_rejects_and_bom_strips(spark, tmp_path):
    """Text path: a meta-declared non-UTF-8 page rejects with
    charset_on_text_path (its bytes were already mangled at read
    time); a UTF-8 BOM survives the text decode as U+FEFF and strips."""
    out = str(tmp_path / "t")
    rec1 = crawl.warc_response_record(
        target_uri=F.lit("https://t/meta"),
        body=F.lit('<meta charset="iso-8859-1">x'),
    )
    rec2 = crawl.warc_response_record(
        target_uri=F.lit("https://t/bom"),
        body=F.lit("﻿bom text"),
    )
    spark.range(1).select(
        F.explode(F.array(rec1, rec2)).alias("value")
    ).coalesce(1).write.mode("overwrite").text(out)
    rows = {
        r["target_uri"]: (
            r["body"],
            r["body_reject_reason"],
            r["charset_sniffed"],
            r["charset_source"],
        )
        for r in crawl.warc_responses(
            crawl.read_warc_records(spark, out)
        ).collect()
    }
    assert rows["https://t/meta"] == (
        None,
        "charset_on_text_path",
        "iso-8859-1",
        "meta",
    )
    assert rows["https://t/bom"] == ("bom text", None, "utf-8", "bom")


def test_charset_on_text_path_rejects(spark, tmp_path):
    """The text source already UTF-8-mangled a declared non-UTF-8 body
    at read time — transcoding is impossible, so the row rejects with
    its own counted reason (the charset twin of
    compressed_body_on_text_path)."""
    out = str(tmp_path / "t")
    rec = crawl.warc_response_record(
        target_uri=F.lit("https://t/5"),
        body=F.lit("x"),
        http_content_type="text/html; charset=iso-8859-1",
    )
    spark.range(1).select(rec.alias("value")).coalesce(1).write.mode(
        "overwrite"
    ).text(out)
    (row,) = crawl.warc_responses(
        crawl.read_warc_records(spark, out)
    ).collect()
    assert row["http_charset"] == "iso-8859-1"
    assert row["body"] is None
    assert row["body_reject_reason"] == "charset_on_text_path"


def test_http_validator_columns(spark, tmp_path):
    """ETag / Last-Modified surface raw (quotes and the W/ weak prefix
    survive — RFC 7232 compares validators byte-wise), header names
    case-insensitive, trailing OWS trimmed, NULL when absent."""
    out = str(tmp_path / "warc")
    rec = crawl.warc_response_record(
        target_uri=F.lit("https://t/v"),
        body=F.lit("x"),
        extra_http_headers=(
            'etag: W/"abc" \t',
            "LAST-MODIFIED: Tue, 02 Jan 2024 03:04:05 GMT",
        ),
    )
    spark.range(1).select(rec.alias("value")).coalesce(1).write.mode(
        "overwrite"
    ).text(out)
    (row,) = crawl.warc_responses(
        crawl.read_warc_records(spark, out)
    ).collect()
    assert row["http_etag"] == 'W/"abc"'
    assert row["http_last_modified"] == "Tue, 02 Jan 2024 03:04:05 GMT"
