"""URL / domain curation operators vs hand-computed expectations."""

import pytest

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import urls


def _parse_one(spark, url):
    df = spark.createDataFrame([(1, url)], "doc_id long, url string")
    return urls.parse_urls(df).collect()[0]


def test_url_parse_full_and_minimal(spark):
    r = _parse_one(
        spark, "HTTPS://WWW.Example.CO.UK:8443/a/b%20c?x=1&y=2#frag"
    )
    assert r["url_scheme"] == "https"
    assert r["url_host"] == "www.example.co.uk"
    assert r["url_port"] == 8443
    assert r["url_path"] == "/a/b%20c"
    assert r["url_query"] == "x=1&y=2"
    assert r["url_domain"] == "example.co.uk"

    r = _parse_one(spark, "http://example.com")
    assert (
        r["url_scheme"], r["url_host"], r["url_port"],
        r["url_path"], r["url_query"], r["url_domain"],
    ) == ("http", "example.com", None, "", "", "example.com")


def test_url_parse_unparseable_and_single_label(spark):
    r = _parse_one(spark, "not a url at all")
    assert r["url_scheme"] == "" and r["url_host"] == ""
    assert r["url_port"] is None and r["url_domain"] == ""
    r = _parse_one(spark, "https://localhost/x")
    assert r["url_host"] == "localhost"
    assert r["url_domain"] == "localhost"  # <= 2 labels pass through


def test_registered_domain_second_level_suffixes(spark):
    cases = {
        "a.b.example.co.uk": "example.co.uk",
        "x.shop.com.au": "shop.com.au",
        "deep.sub.example.org": "example.org",
        "example.org": "example.org",
        "co.uk": "co.uk",  # 2 labels pass through, even a suffix
    }
    df = spark.createDataFrame(
        [(h,) for h in cases], "host string"
    ).select(
        "host", urls.registered_domain(F.col("host")).alias("dom")
    )
    got = {r["host"]: r["dom"] for r in df.collect()}
    assert got == cases


def test_domain_caps_flags_overflow_deterministically(spark):
    rows = [
        (i, f"https://{'a' if i < 5 else 'b'}.example.com/{i}")
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["doc_id"]: r["kept"]
        for r in urls.domain_caps(df, max_per_domain=2).collect()
    }
    # one registered domain (example.com): first 2 doc_ids kept
    assert out == {i: (1 if i < 2 else 0) for i in range(8)}

    # distinct domains each get their own budget
    rows = [(i, f"https://s{i % 3}.net/{i}") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["doc_id"]: r["kept"]
        for r in urls.domain_caps(df, max_per_domain=2).collect()
    }
    assert sum(out.values()) == 6
    assert out[0] == out[1] == out[2] == out[3] == out[4] == out[5] == 1
    assert out[6] == out[7] == out[8] == 0

    with pytest.raises(ValueError, match="max_per_domain"):
        urls.domain_caps(df, max_per_domain=0)


def test_url_parse_userinfo_and_trailing_dot(spark):
    """Userinfo must not leak into the host (each 'a@spam.com' would
    otherwise mint a fresh domain and evade the per-domain cap), and a
    trailing root-dot FQDN is the same site as the undotted host."""
    r = _parse_one(spark, "https://alice@example.com/x")
    assert r["url_host"] == "example.com"
    assert r["url_domain"] == "example.com"
    r = _parse_one(spark, "https://u:p@example.com:8080/x?q=1")
    assert r["url_host"] == "example.com"
    assert r["url_port"] == 8080
    assert r["url_path"] == "/x" and r["url_query"] == "q=1"
    r = _parse_one(spark, "https://example.com./x")
    assert r["url_host"] == "example.com"
    assert r["url_domain"] == "example.com"
    # '@' later in the path is not userinfo
    r = _parse_one(spark, "https://example.com/a@b")
    assert r["url_host"] == "example.com" and r["url_path"] == "/a@b"


def test_domain_caps_reuses_precomputed_domain(spark):
    rows = [(i, f"https://d{i % 2}.net/{i}") for i in range(6)]
    df = urls.parse_urls(
        spark.createDataFrame(rows, "doc_id long, url string")
    )
    out = {
        r["doc_id"]: r["kept"]
        for r in urls.domain_caps(
            df, domain_col="url_domain", max_per_domain=1
        ).collect()
    }
    assert out == {0: 1, 1: 1, 2: 0, 3: 0, 4: 0, 5: 0}


def test_domain_caps_against_counts_corpus(spark):
    """Incremental gate: a domain with 2 corpus docs and cap 3 admits
    exactly 1 more; a full domain admits none; a fresh domain gets the
    whole budget; collision-prone caller column names survive."""
    corpus = spark.createDataFrame(
        [(i, "https://full.com/x") for i in range(3)]
        + [(10 + i, "https://half.com/y") for i in range(2)],
        "doc_id long, url string",
    )
    new = spark.createDataFrame(
        [
            (100, "https://full.com/a"),
            (101, "https://half.com/b"),
            (102, "https://half.com/c"),
            (103, "https://fresh.org/d"),
        ],
        "doc_id long, url string",
    )
    out = {
        r["doc_id"]: r["kept"]
        for r in urls.domain_caps_against(
            new, corpus, max_per_domain=3
        ).collect()
    }
    assert out == {100: 0, 101: 1, 102: 0, 103: 1}

    # caller columns named like internals must pass through untouched
    new2 = new.withColumn("_rk", F.lit(7)).withColumn("_dom", F.lit("z"))
    got = urls.domain_caps_against(new2, corpus, max_per_domain=3)
    row = got.filter(F.col("doc_id") == 100).collect()[0]
    assert row["_rk"] == 7 and row["_dom"] == "z" and row["kept"] == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_per_domain"):
        urls.domain_caps_against(new, corpus, max_per_domain=0)

    # a caller column that exactly matches an internal name must fail
    # loudly, never be silently clobbered (fixed tag means the old
    # per-call-uuid impossibility no longer holds)
    clashing = new.withColumn("_rk_v7k2", F.lit(1))
    with _pytest.raises(ValueError, match="_rk_v7k2"):
        urls.domain_caps_against(clashing, corpus, max_per_domain=3)


def test_url_port_requires_delimiter_after_digits(spark):
    """A malformed authority like ':80abc' must not report port 80 —
    the digits must run to a /?# delimiter or the end of the URL."""
    r = _parse_one(spark, "https://example.com:80abc/x")
    assert r["url_port"] is None
    r = _parse_one(spark, "https://example.com:8080")  # end-anchored
    assert r["url_port"] == 8080
    r = _parse_one(spark, "https://example.com:8080?q=1")
    assert r["url_port"] == 8080
    r = _parse_one(spark, "https://example.com:8080#f")
    assert r["url_port"] == 8080


def test_url_query_is_anchored_before_fragment(spark):
    """RFC 3986: everything after '#' is fragment — a '?' inside it is
    not a query; a '?' in a non-URL string invents nothing."""
    r = _parse_one(spark, "https://example.com/p#sec?note")
    assert r["url_query"] == ""
    assert r["url_path"] == "/p"
    r = _parse_one(spark, "not a url? really")
    assert r["url_query"] == "" and r["url_scheme"] == ""
    r = _parse_one(spark, "https://example.com/p?a=1#frag?x")
    assert r["url_query"] == "a=1"


def test_domain_blocklist_flags_registered_domain(spark):
    """Blocklist matches on REGISTERED domain: subdomains of a blocked
    domain are blocked (no evasion via cdn./www. hosts); host-shaped
    blocklist entries normalize to their registered domain; list and
    frame paths agree."""
    df = spark.createDataFrame(
        [
            (1, "https://evil.com/x"),
            (2, "https://cdn.evil.com/y"),       # subdomain of blocked
            (3, "https://good.org/z"),
            (4, "https://sub.bad.co.uk/w"),       # blocked via host entry
            (5, "https://notbad.co.uk/v"),
        ],
        "doc_id long, url string",
    )
    blocked = ["evil.com", "www.bad.co.uk"]  # host-shaped 2nd entry
    want = {1: 0, 2: 0, 3: 1, 4: 0, 5: 1}

    got_list = {
        r["doc_id"]: r["kept"]
        for r in urls.domain_blocklist(df, blocked).collect()
    }
    assert got_list == want

    frame = spark.createDataFrame([(b,) for b in blocked], "d string")
    got_frame = {
        r["doc_id"]: r["kept"]
        for r in urls.domain_blocklist(df, frame).collect()
    }
    assert got_frame == want

    # empty list: everything kept
    all_kept = {
        r["doc_id"]: r["kept"]
        for r in urls.domain_blocklist(df, []).collect()
    }
    assert set(all_kept.values()) == {1}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly 1 column"):
        urls.domain_blocklist(
            df, spark.createDataFrame([(1, "a")], "x long, y string")
        )


def test_domain_blocklist_entry_normalization_and_nulls(spark):
    """Wild-form entries (FQDN root-dot, full URL with userinfo/port,
    blank) normalize to the registered domain on both paths; NULL/
    unparseable-URL rows are kept (the parser's problem, not the
    blocklist's); blank entries block nothing — not even the ''
    domain unparseable URLs produce."""
    df = spark.createDataFrame(
        [
            (1, "https://evil.com/x"),
            (2, "https://sub.worse.org/y"),
            (3, "https://fine.net/z"),
            (4, None),
            (5, "not a url"),
        ],
        "doc_id long, url string",
    )
    blocked = ["evil.com.", "https://u:p@www.worse.org:8080/path?q#f", "  "]
    want = {1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    got_list = {
        r["doc_id"]: r["kept"]
        for r in urls.domain_blocklist(df, blocked).collect()
    }
    assert got_list == want
    frame = spark.createDataFrame([(b,) for b in blocked], "d string")
    got_frame = {
        r["doc_id"]: r["kept"]
        for r in urls.domain_blocklist(df, frame).collect()
    }
    assert got_frame == want

    # internal-name collision fails loudly on the frame path
    import pytest as _pytest

    with _pytest.raises(ValueError, match="_bl_dom"):
        urls.domain_blocklist(
            df.withColumn("_bl_dom", F.lit("x")), frame
        )
