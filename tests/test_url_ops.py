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


# --------------------------------------------------------------------
# resolve_url / surt_urlkey / fetch_schedule / html_links (r12)
# --------------------------------------------------------------------


def _resolve_all(spark, cases):
    df = spark.createDataFrame(cases, "base string, href string")
    rows = df.select(
        "href", urls.resolve_url(F.col("base"), F.col("href")).alias("r")
    ).collect()
    return {r["href"]: r["r"] for r in rows}


def test_resolve_url_absolute_and_scheme_filter(spark):
    base = "https://site.example.com/dir/page.html"
    got = _resolve_all(spark, [
        (base, "https://x.com/a?b=1&c=2"),
        (base, "HTTPS://UPPER.COM/Y"),       # scheme match is ci
        (base, "mailto:someone@example.com"),
        (base, "javascript:void(0)"),
        (base, "tel:+15551234"),
        (base, "#frag"),
        (base, ""),
    ])
    assert got["https://x.com/a?b=1&c=2"] == "https://x.com/a?b=1&c=2"
    assert got["HTTPS://UPPER.COM/Y"] == "HTTPS://UPPER.COM/Y"
    assert got["mailto:someone@example.com"] is None
    assert got["javascript:void(0)"] is None
    assert got["tel:+15551234"] is None
    assert got["#frag"] is None
    assert got[""] is None


def test_resolve_url_relative_forms(spark):
    base = "https://site.example.com/dir/page.html"
    got = _resolve_all(spark, [
        (base, "/root/page"),
        (base, "relative/p2"),
        (base, "../up/one"),
        (base, "//cdn.x.com/lib.js"),
        (base, "?q=7"),
        (base, "other.html#sec"),
        (base, "   /spaced  "),
    ])
    assert got["/root/page"] == "https://site.example.com/root/page"
    assert got["relative/p2"] == "https://site.example.com/dir/relative/p2"
    assert got["../up/one"] == "https://site.example.com/up/one"
    # protocol-relative inherits the BASE scheme
    assert got["//cdn.x.com/lib.js"] == "https://cdn.x.com/lib.js"
    # query-only replaces the query, keeps the base path
    assert got["?q=7"] == "https://site.example.com/dir/page.html?q=7"
    # fragment stripped from a path-relative href
    assert got["other.html#sec"] == "https://site.example.com/dir/other.html"
    # surrounding whitespace trimmed
    assert got["   /spaced  "] == "https://site.example.com/spaced"


def test_resolve_url_dot_segments_and_edge_bases(spark):
    got = _resolve_all(spark, [
        ("https://s.com/a/b/c/d.html", "../../x/./y.html"),
        ("https://s.com/d/e.html", "../../../../too/deep"),  # past root
        ("https://s.com", "p.html"),            # base with no path
        ("https://s.com/d/", "sub/p.html"),     # base dir form
        ("https://s.com/a/", "b/../c/./d"),     # collapse inside href
        ("not-a-url", "rel/x"),                 # relative off a non-URL
        ("not-a-url", "https://ok.com/x"),      # absolute still passes
    ])
    assert got["../../x/./y.html"] == "https://s.com/a/x/y.html"
    assert got["../../../../too/deep"] == "https://s.com/too/deep"
    assert got["p.html"] == "https://s.com/p.html"
    assert got["sub/p.html"] == "https://s.com/d/sub/p.html"
    assert got["b/../c/./d"] == "https://s.com/a/c/d"
    assert got["rel/x"] is None
    assert got["https://ok.com/x"] == "https://ok.com/x"


def test_resolve_url_all_dot_segment_names(spark):
    # '...' is a REGULAR segment name (only '.' and '..' are special)
    got = _resolve_all(spark, [
        ("https://s.com/a/", ".../x"),
        ("https://s.com/a/.../b.html", "../y"),
    ])
    assert got[".../x"] == "https://s.com/a/.../x"
    assert got["../y"] == "https://s.com/a/y"


def test_surt_urlkey_canonical_forms(spark):
    cases = [
        ("https://WWW.Example.COM:443/Path/Sub?b=2&a=1#frag",
         "com,example)/path/sub?a=1&b=2"),
        ("http://www2.foo.co.uk/", "uk,co,foo)/"),
        ("https://x.com", "com,x)/"),             # empty path -> '/'
        ("https://x.com/p?", "com,x)/p"),         # empty query drops '?'
        ("https://user@x.com:8080/z?y=1&x=2", "com,x)/z?x=2&y=1"),
        ("mailto:a@b.c", None),                   # non-http(s) -> NULL
        ("not a url", None),
    ]
    df = spark.createDataFrame(
        [(u,) for u, _ in cases], "url string"
    ).select("url", urls.surt_urlkey(F.col("url")).alias("k"))
    got = {r["url"]: r["k"] for r in df.collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_surt_urlkey_mirrors_key_identically(spark):
    # the canonicalization PURPOSE: mirrors of one page key the same
    mirrors = [
        "https://www.example.com/A/B?x=1&y=2",
        "http://EXAMPLE.com:8080/a/b?y=2&x=1",
        "https://www3.example.com/a/b?X=1&Y=2#top",
    ]
    df = spark.createDataFrame([(u,) for u in mirrors], "url string")
    keys = {
        r["k"]
        for r in df.select(urls.surt_urlkey(F.col("url")).alias("k")).collect()
    }
    assert keys == {"com,example)/a/b?x=1&y=2"}


def test_fetch_schedule_waves_and_defaults(spark):
    frontier = spark.createDataFrame(
        [
            ("a.com", "https://a.com/1"),
            ("a.com", "https://a.com/2"),
            ("a.com", "https://a.com/3"),
            ("b.com", "https://b.com/1"),
            ("b.com", "https://b.com/2"),
            ("c.com", "https://c.com/1"),
        ],
        "host string, url string",
    )
    delays = spark.createDataFrame(
        [("a.com", 2.5), ("b.com", None)], "host string, crawl_delay double"
    )
    out = urls.fetch_schedule(frontier, delays, default_delay=1.0)
    got = {
        (r["host"], r["wave"]): r["fetch_offset_s"]
        for r in out.collect()
    }
    assert got == {
        ("a.com", 1): 0.0, ("a.com", 2): 2.5, ("a.com", 3): 5.0,
        ("b.com", 1): 0.0, ("b.com", 2): 1.0,  # NULL delay -> default
        ("c.com", 1): 0.0,                     # absent host -> default
    }


def test_host_backoff_and_schedule_fold(spark):
    """host_backoff: 429/503 responses fold Retry-After (delta-seconds
    OR HTTP-date vs a pinned now; absent -> default penalty) into a
    per-host MAX penalty, and fetch_schedule(backoff=...) shifts the
    whole host's wave train out by it."""
    responses = spark.createDataFrame(
        [
            ("https://a.com/x", 429, "120"),  # delta-seconds
            ("https://a.com/y", 503, None),  # default penalty
            # HTTP-date: 300 s past the pinned now (Feb 1 2024 = Thu)
            ("https://b.com/x", 429, "Thu, 01 Feb 2024 00:05:00 GMT"),
            # a date BEFORE now clamps to 0
            ("https://c.com/x", 503, "Wed, 31 Jan 2024 23:00:00 GMT"),
            ("https://d.com/ok", 200, None),  # not rate-limited
            # hostile/malformed values degrade to the default — a
            # negative delta must not ACCELERATE the re-hit, NaN must
            # not poison the MAX, Infinity must not park the host
            ("https://e.com/x", 429, "soon-ish"),
            ("https://f.com/x", 429, "-300"),
            ("https://g.com/x", 429, "NaN"),
            ("https://g.com/y", 429, "600"),
            ("https://h.com/x", 503, "Infinity"),
        ],
        "target_uri string, http_status int, http_retry_after string",
    )
    bk = {
        r["host"]: (r["n_rate_limited"], r["backoff_s"])
        for r in urls.host_backoff(
            responses, now="2024-02-01 00:00:00", default_penalty_s=45.0
        ).collect()
    }
    assert bk == {
        "a.com": (2, 120.0),  # max(120, default 45)
        "b.com": (1, 300.0),
        "c.com": (1, 0.0),
        "e.com": (1, 45.0),  # unparseable -> default, not 0
        "f.com": (1, 45.0),  # negative delta -> default
        "g.com": (2, 600.0),  # NaN -> default 45; the valid 600 wins
        "h.com": (1, 45.0),  # Infinity -> default
    }
    frontier = spark.createDataFrame(
        [
            ("a.com", "https://a.com/1"),
            ("a.com", "https://a.com/2"),
            ("d.com", "https://d.com/1"),
        ],
        "host string, url string",
    )
    delays = spark.createDataFrame(
        [("a.com", 2.0)], "host string, crawl_delay double"
    )
    backoff = urls.host_backoff(
        responses, now="2024-02-01 00:00:00", default_penalty_s=45.0
    )
    got = {
        (r["host"], r["wave"]): r["fetch_offset_s"]
        for r in urls.fetch_schedule(
            frontier, delays, backoff=backoff
        ).collect()
    }
    assert got == {
        ("a.com", 1): 120.0,  # wave train shifted by the penalty
        ("a.com", 2): 122.0,
        ("d.com", 1): 0.0,  # clean host unaffected
    }


def test_host_backoff_http_date_is_timezone_proof(spark):
    """r15 (r14 advice): the IMF-fixdate branch resolves to a true UTC
    instant via field extraction + make_timestamp('UTC') — the penalty
    must not shift when the SESSION time zone is not UTC (the old
    'GMT'-literal to_timestamp read the fields as session-zone wall
    time), and `now` is interpreted as UTC whether naive or
    offset-qualified."""
    responses = spark.createDataFrame(
        [
            ("https://b.com/x", 429, "Thu, 01 Feb 2024 00:05:00 GMT"),
            # malformed fields survive the regex but not the calendar:
            # try_make_timestamp degrades them to the default penalty
            ("https://i.com/x", 429, "Fri, 99 Feb 2024 00:05:00 GMT"),
        ],
        "target_uri string, http_status int, http_retry_after string",
    )
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        bk = {
            r["host"]: r["backoff_s"]
            for r in urls.host_backoff(
                responses, now="2024-02-01 00:00:00", default_penalty_s=45.0
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert bk == {"b.com": 300.0, "i.com": 45.0}
    # an offset-qualified now is honored as that instant
    bk2 = {
        r["host"]: r["backoff_s"]
        for r in urls.host_backoff(
            responses,
            now="2024-01-31T19:00:00-05:00",  # == 2024-02-01T00:00Z
            default_penalty_s=45.0,
        ).collect()
    }
    assert bk2["b.com"] == 300.0


def test_fetch_schedule_validation(spark):
    frontier = spark.createDataFrame(
        [("a.com", "u", 1)], "host string, url string, wave int"
    )
    delays = spark.createDataFrame(
        [("a.com", 1.0)], "host string, crawl_delay double"
    )
    with pytest.raises(ValueError, match="output columns"):
        urls.fetch_schedule(frontier, delays)
    with pytest.raises(ValueError, match="default_delay"):
        urls.fetch_schedule(
            frontier.drop("wave"), delays, default_delay=-1.0
        )


def _rds(p):
    """RFC 3986 §5.2.4 remove_dot_segments, verbatim — the reference
    the operator's bounded regex collapse must reproduce."""
    inp, out = p, []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            seg, inp = (inp, "") if i == -1 else (inp[:i], inp[i:])
            out.append(seg)
    return "".join(out)


def test_resolve_url_matches_rfc_reference(spark):
    """resolve_url == urljoin + RFC 3986 §5.2.4 normalization over a
    600-case seeded-random domain of dotty paths, every href form and
    query/fragment combos.  The reference is urllib.parse.urljoin with
    remove_dot_segments applied to the result path (urljoin itself
    skips §5.2.2 normalization for authority-bearing references —
    browsers and the RFC normalize, so does this operator).  Domain
    exclusions, each a DELIBERATE divergence documented on the
    operator: empty path segments ('a//b' — urljoin drops them, RFC
    preserves), bare '?' (urljoin no-op quirk), empty/fragment-only
    hrefs (NULL by design)."""
    import random
    from urllib.parse import urljoin, urlsplit, urlunsplit

    rng = random.Random(20260816)
    alpha = "abc123.-_~"

    def seg():
        return rng.choice([".", "..", "...", None]) or "".join(
            rng.choice(alpha) for _ in range(rng.randint(1, 4))
        )

    def base():
        p = "/".join(seg() for _ in range(rng.randint(0, 4)))
        path = "/" + p if p else rng.choice(["", "/"])
        q = rng.choice(["", "?q=1", "?a=1&b=2"])
        return f"https://h{rng.randint(1, 3)}.example{path}{q}"

    def href():
        kind = rng.random()
        p = "/".join(seg() for _ in range(rng.randint(1, 5)))
        q = rng.choice(["", "?x=2", "?b=2&a=1"])
        frag = rng.choice(["", "#f"])
        if kind < 0.45:
            return f"{p}{q}{frag}"
        if kind < 0.65:
            return f"/{p}{q}{frag}"
        if kind < 0.75:
            return f"//o{rng.randint(1, 2)}.net/{p}{q}{frag}"
        if kind < 0.9:
            return f"https://abs.org/{p}{q}{frag}"
        return f"{q or '?z=1'}{frag}"

    def in_domain(b, h):
        if "//" in urlsplit(b).path:
            return False
        hp = h.split("?")[0].split("#")[0]
        if hp.startswith("//"):
            rest = hp[2:]
            rest = rest[rest.find("/"):] if "/" in rest else ""
            if "//" in rest:
                return False
        elif "//" in hp:
            return False
        return h.split("#")[0] not in ("", "?")

    cases = []
    while len(cases) < 600:
        b, h = base(), href()
        if in_domain(b, h):
            cases.append((b, h))

    def expected(b, h):
        r = urljoin(b, h)
        sp = urlsplit(r)
        return urlunsplit((sp.scheme, sp.netloc, _rds(sp.path), sp.query, ""))

    df = spark.createDataFrame(cases, "base string, href string")
    rows = df.select(
        "base", "href", urls.resolve_url(F.col("base"), F.col("href")).alias("r")
    ).collect()
    bad = [
        (r["base"], r["href"], r["r"], expected(r["base"], r["href"]))
        for r in rows
        if r["r"] != expected(r["base"], r["href"])
    ]
    assert not bad, bad[:5]


def test_recrawl_priority(spark):
    """Change-interval estimation: span over observed digest changes
    (capture order by ts), default interval when no change was ever
    observed (incl. single-capture keys), due = age / interval."""
    from sample_dms_s3_kinesis_spark.operators.urls import recrawl_priority

    rows = [
        # k1: two captures, changed -> interval = span = 10 days
        ("k1", "20240101000000", "d1"),
        ("k1", "20240111000000", "d2"),
        # k2: three captures, one change across a 20-day span
        ("k2", "20240101000000", "a"),
        ("k2", "20240111000000", "a"),
        ("k2", "20240121000000", "b"),
        # k3: never changed -> default interval
        ("k3", "20240101000000", "x"),
        ("k3", "20240121000000", "x"),
        # k4: single capture -> default interval
        ("k4", "20240601000000", "y"),
        # k5: two same-second captures with different digests -> span 0;
        # interval clamps to 1 s so the key is maximally due instead of
        # due=NULL dropping it from a sort-descending budget cut
        ("k5", "20240601000000", "p"),
        ("k5", "20240601000000", "q"),
    ]
    df = spark.createDataFrame(
        rows, "urlkey string, ts string, digest string"
    )
    out = {
        r["urlkey"]: r
        for r in recrawl_priority(
            df, now="2024-07-01 00:00:00", default_interval_s=30 * 86400
        ).collect()
    }
    day = 86400
    assert out["k1"]["n_captures"] == 2
    assert out["k1"]["n_changes"] == 1
    assert out["k1"]["interval_s"] == 10 * day
    assert out["k1"]["age_s"] == 172 * day  # Jan 11 -> Jul 1
    assert out["k1"]["due"] == round(172 / 10, 4)
    assert out["k2"]["n_changes"] == 1
    assert out["k2"]["interval_s"] == 20 * day
    assert out["k3"]["n_changes"] == 0
    assert out["k3"]["interval_s"] == 30 * day  # default
    assert out["k4"]["n_captures"] == 1
    assert out["k4"]["interval_s"] == 30 * day
    assert out["k4"]["age_s"] == 30 * day
    assert out["k4"]["due"] == 1.0  # exactly due
    assert out["k5"]["n_changes"] == 1
    assert out["k5"]["interval_s"] == 1  # span 0 clamped, not NULL
    assert out["k5"]["due"] == float(30 * day)  # maximally due, sorts first

    import pytest as _pytest

    with _pytest.raises(ValueError, match="default_interval_s"):
        recrawl_priority(df, now="2024-07-01 00:00:00",
                         default_interval_s=0)
