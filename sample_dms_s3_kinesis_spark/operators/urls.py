"""URL / domain curation operators: parse, normalize, registered-domain
extraction and per-domain frequency caps — the web-crawl provenance
layer every large corpus pipeline applies before content-level dedup
(RefinedWeb/C4-style: cap documents per registered domain so a single
mirror farm cannot dominate the training mix).

Pure Catalyst expressions (regexp + split/slice + one window for the
cap), RE2/Java-identical regexes so the DuckDB oracle replays them
byte-for-byte.  The cap is one hash-partitioned window over the
registered domain — no shuffle beyond it, scales linearly; heavy-hitter
domains are exactly the rows the cap discards, so skew self-resolves.

Reference note: the reference has no URL surface (SURVEY §2.8); this
extends the engine per the north star in BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# scheme://[userinfo@]host[:port][/path][?query][#fragment] — RE2-safe
# (no lookaround); an optional userinfo@ is skipped before the host
# (else 'a@spam.com', 'b@spam.com', ... would each mint a fresh
# "domain" and evade the per-domain cap), and the host class excludes
# ':' '/' '?' '#' '@' so neither a port nor userinfo leaks in.
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?"
_HOST_RE = _AUTH + r"([^/?#:@]+)"
# the digits must run to a path/query/fragment delimiter or the end of
# the authority (RE2-safe, no lookaround) — else a malformed authority
# like 'https://x.com:80abc/' would report port 80 with the invalid
# trailing 'abc' silently dropped
_PORT_RE = _AUTH + r"[^/?#:@]+:([0-9]+)(?:[/?#]|$)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored through the authority+path: a '?' AFTER the fragment
# delimiter is fragment content, not a query (RFC 3986), and a '?' in
# a non-URL string must not invent one
_QUERY_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^?#]*\?([^#]*)"

# Second-level public suffixes we recognize (a deterministic, documented
# subset of the public-suffix list: the common ccTLD registries).  A
# host ending in one of these keeps THREE labels as its registered
# domain; everything else keeps two.
SECOND_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
]


def url_scheme(col: Column) -> Column:
    """Lowercased scheme, '' when the value is not a parseable URL."""
    return F.lower(F.regexp_extract(col, _SCHEME_RE, 1))


def url_host(col: Column) -> Column:
    """Lowercased hostname, userinfo/port-free, trailing root-dot
    stripped ('example.com.' is the same site as 'example.com' — and
    an un-stripped empty last label would collapse every FQDN-form
    host to the bare TLD in registered_domain); '' when not
    parseable."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(col, _HOST_RE, 1)), r"\.+$", ""
    )


def url_port(col: Column) -> Column:
    """Explicit port as int, NULL when absent."""
    p = F.regexp_extract(col, _PORT_RE, 1)
    return F.when(p != "", p.cast("int"))


def url_path(col: Column) -> Column:
    return F.regexp_extract(col, _PATH_RE, 1)


def url_query(col: Column) -> Column:
    return F.regexp_extract(col, _QUERY_RE, 1)


def idn_ascii_host_py(host: str) -> str:
    """Fold a host to its canonical IDNA ASCII (ACE) form: lowercase,
    NFC-normalize, RFC 3492 punycode-encode each non-ASCII label
    (stdlib ``punycode`` codec) — so ``münchen.de``, ``MÜNCHEN.de``
    and ``xn--mnchen-3ya.de`` all key as ``xn--mnchen-3ya.de``.  The
    mapping is UTS46-NON-TRANSITIONAL-style (r15 review sweep #6):
    ``ß``/``ς`` are PRESERVED and encode into their own ACE labels —
    ``straße.de`` → ``xn--strae-oqa.de`` — matching what browsers and
    pywb/CDX urlkeys produce today (the IDNA2003 codec's ß→ss mapping
    would key such hosts differently from their externally-produced
    ACE forms).  ACE (not Unicode) is the canonical direction because
    every downstream consumer — SURT urlkeys, CDX sort order,
    blocklists, per-host caps — is ASCII-keyed.  Labels the codec
    rejects pass through lowercased — they are still hostnames, just
    not IDNs; the fold must never turn a weird host into a crash or a
    collision.  (Full UTS46 table mapping — width folding, disallowed
    sets — is out of scope; lowercase+NFC covers the folding that
    affects host identity.)"""
    import unicodedata

    h = host.strip().lower().rstrip(".")
    if h.isascii():
        return h
    out = []
    for label in h.split("."):
        if label.isascii():
            out.append(label)
        else:
            norm = unicodedata.normalize("NFC", label)
            try:
                out.append(
                    "xn--" + norm.encode("punycode").decode("ascii")
                )
            except UnicodeError:
                out.append(label)
    return ".".join(out)


_ASCII_RE = r"^\p{ASCII}*$"


def _ascii_host_norm(col: Column) -> Column:
    """The ASCII half of the fold as pure Catalyst: lowercase, trim,
    trailing root-dots stripped — MUST mirror idn_ascii_host_py's
    ASCII path exactly (r15 review sweep #4: an unnormalized ASCII
    branch minted separate identities for 'Example.COM.' vs
    'example.com' while non-ASCII spellings folded)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\.+$", "")


def _fold_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fold_fn(hosts):
        return hosts.map(
            lambda h: idn_ascii_host_py(h) if h is not None else None
        )

    # real annotation objects: the module-wide `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf
    # cannot resolve from another module's namespace
    _fold_fn.__annotations__ = {"hosts": pd.Series, "return": pd.Series}
    return pandas_udf(_fold_fn, "string")


def fold_idn_host(col: Column) -> Column:
    """Column form of :func:`idn_ascii_host_py`: ASCII hosts normalize
    in Catalyst (:func:`_ascii_host_norm`), the rest through an
    Arrow-batched pandas UDF.  COST NOTE (r15 review sweep #3): the
    when() only selects the OUTPUT per row — Spark still extracts the
    UDF into an unconditional ArrowEvalPython projection, so every row
    pays the Arrow round trip.  For corpus-scale frames use
    :func:`fold_idn_hosts` (a DataFrame split-union that genuinely
    keeps ASCII rows out of Python); this column form is for small
    frames (blocklist entries) and column-only contexts
    (:func:`surt_urlkey`).  NULL stays NULL."""
    return F.when(col.isNull(), F.lit(None).cast("string")).when(
        col.rlike(_ASCII_RE), _ascii_host_norm(col)
    ).otherwise(_fold_udf()(col))


def fold_idn_hosts(
    df: DataFrame, host: Column, out_col: str
) -> DataFrame:
    """Append ``out_col`` = the canonical ACE fold of ``host``, with
    the all-ASCII fast path (the overwhelming majority of real hosts)
    GENUINELY staying in Catalyst: the frame splits on an ASCII probe,
    only the non-ASCII slice runs the Arrow UDF, and the halves
    re-union.  The idn=True frame paths (:func:`domain_blocklist`,
    :func:`domain_caps`) route through this."""
    is_ascii = host.isNull() | host.rlike(_ASCII_RE)
    a = df.filter(is_ascii).withColumn(
        out_col,
        F.when(host.isNotNull(), _ascii_host_norm(host)),
    )
    b = df.filter(~F.coalesce(is_ascii, F.lit(True))).withColumn(
        out_col, _fold_udf()(host)
    )
    return a.unionByName(b)


def registered_domain(host: Column) -> Column:
    """Registered (pay-level) domain of a lowercased host: the last two
    labels, or three when the last two form a recognized second-level
    public suffix.  Hosts with fewer labels pass through unchanged."""
    labels = F.split(host, r"\.", -1)
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    sl = F.array(*[F.lit(s) for s in SECOND_LEVEL_SUFFIXES])
    return F.when(n <= 2, host).otherwise(
        F.when(F.array_contains(sl, last2), last3).otherwise(last2)
    )


def parse_urls(
    df: DataFrame, *, url_col: str = "url", prefix: str = "url_"
) -> DataFrame:
    """Append parsed URL columns: {prefix}scheme/host/port/path/query
    and {prefix}domain (registered domain).  One narrow projection."""
    c = F.col(url_col)
    host = url_host(c)
    return df.select(
        "*",
        url_scheme(c).alias(f"{prefix}scheme"),
        host.alias(f"{prefix}host"),
        url_port(c).alias(f"{prefix}port"),
        url_path(c).alias(f"{prefix}path"),
        url_query(c).alias(f"{prefix}query"),
        registered_domain(host).alias(f"{prefix}domain"),
    )


def domain_blocklist(
    df: DataFrame,
    blocked,
    *,
    url_col: str = "url",
    domain_col: str | None = None,
    keep_col: str = "kept",
    idn: bool = False,
) -> DataFrame:
    """RefinedWeb-style domain blocklist: flag (not drop) rows whose
    REGISTERED domain is on ``blocked`` — subdomain evasion is closed
    by construction, since ``cdn.evil.com`` and ``evil.com`` share a
    registered domain.  Callers filter on ``keep_col`` or route the
    overflow to an exceptions channel (the flag-not-drop contract every
    curation gate in this engine keeps).

    ``blocked`` is a Python sequence of domains (small lists become an
    IN literal — Catalyst folds it into the scan) or a one-column
    DataFrame for the multi-million-entry lists real curation uses
    (broadcast LEFT join — blocklists are domain-cardinality, tiny
    next to the corpus).  Entries are normalized to lowercase
    registered domains on BOTH paths — host-shaped ('cdn.evil.com'),
    FQDN-shaped ('evil.com.'), URL-shaped ('https://u@evil.com:8080/x')
    and bare-domain entries all block the same registered domain.
    Rows whose domain is NULL (unparseable URL) are kept on both
    paths — they are the URL parser's problem, not the blocklist's.

    Pass ``domain_col`` when the frame already carries the registered
    domain (e.g. from :func:`parse_urls`).

    ``idn=True`` folds hosts AND entries to canonical IDNA ASCII
    before the registered-domain key, closing the IDN-spelling evasion
    where ``xn--mnchen-3ya.de`` and its Unicode spelling read as
    different domains (r15, verdict r14 #4).  The DATA side folds via
    :func:`fold_idn_hosts` — a split-union, so ASCII rows genuinely
    never leave Catalyst; entries fold column-wise (entry frames are
    domain-cardinality, the Arrow cost is trivial).  Off by default so
    the common path stays pure Catalyst (DuckDB-replayable, no Arrow
    nodes in the plan)."""
    _tag = "_idn_fold_v7k2"
    if idn:
        if _tag in df.columns:
            raise ValueError(
                f"input columns collide with internal names: ['{_tag}']"
            )
        src = (
            F.col(domain_col)
            if domain_col is not None
            else url_host(F.col(url_col))
        )
        df = fold_idn_hosts(df, src, _tag)
        dom = (
            F.col(_tag)
            if domain_col is not None
            else registered_domain(F.col(_tag))
        )
    else:
        dom = (
            F.col(domain_col)
            if domain_col is not None
            else registered_domain(url_host(F.col(url_col)))
        )
    if isinstance(blocked, DataFrame):
        bcols = blocked.columns
        if len(bcols) != 1:
            raise ValueError(
                f"blocklist frame must have exactly 1 column, got {bcols}"
            )
        clash = {"_dom_bl", "_bl_dom"} & set(df.columns)
        if clash:
            raise ValueError(
                f"input columns collide with internal names: {sorted(clash)}"
            )
        bl = (
            blocked.select(
                _normalize_blocklist_entry_col(
                    F.col(bcols[0]), idn=idn
                ).alias("_bl_dom")
            )
            # empty after normalization (blank entry) must not match
            # the ""-domain rows unparseable URLs produce — same rule
            # as the list path's - {""}
            .filter(F.col("_bl_dom") != "")
            .distinct()
        )
        joined = df.withColumn("_dom_bl", dom).join(
            F.broadcast(bl),
            F.col("_dom_bl") == F.col("_bl_dom"),
            "left",
        )
        out = joined.withColumn(
            keep_col, F.col("_bl_dom").isNull().cast("int")
        ).drop("_dom_bl", "_bl_dom")
        return out.drop(_tag) if idn else out
    entries = sorted(
        {_normalize_blocklist_entry_py(str(b), idn=idn) for b in blocked}
        - {""}
    )
    if not entries:
        out = df.withColumn(keep_col, F.lit(1))
        return out.drop(_tag) if idn else out
    # NULL domain -> isin is NULL -> keep (parity with the frame path,
    # where a NULL join key simply misses)
    out = df.withColumn(
        keep_col, F.coalesce((~dom.isin(entries)).cast("int"), F.lit(1))
    )
    return out.drop(_tag) if idn else out


# Blocklist entries arrive in the wild as bare domains, hosts, FQDNs
# with trailing root-dots, or full URLs.  Both normalizers apply the
# same chain: lowercase -> strip scheme -> cut at path/query/fragment
# -> drop userinfo -> drop port -> strip trailing dots -> registered
# domain.  (Kept in lockstep; the list/frame agreement test pins it.)


def _normalize_blocklist_entry_col(c: Column, *, idn: bool = False) -> Column:
    e = F.lower(F.trim(c))
    e = F.regexp_replace(e, r"^[a-z][a-z0-9+.-]*://", "")
    e = F.regexp_replace(e, r"[/?#].*$", "")
    e = F.regexp_replace(e, r"^[^@]*@", "")
    e = F.regexp_replace(e, r":[0-9]*$", "")
    e = F.regexp_replace(e, r"\.+$", "")
    if idn:
        e = fold_idn_host(e)
    return registered_domain(e)


def _normalize_blocklist_entry_py(entry: str, *, idn: bool = False) -> str:
    import re as _re

    e = entry.strip().lower()
    e = _re.sub(r"^[a-z][a-z0-9+.-]*://", "", e)
    e = _re.sub(r"[/?#].*$", "", e)
    e = _re.sub(r"^[^@]*@", "", e)
    e = _re.sub(r":[0-9]*$", "", e)
    e = _re.sub(r"\.+$", "", e)
    if idn:
        e = idn_ascii_host_py(e)
    return _registered_domain_py(e)


def _registered_domain_py(host: str) -> str:
    """Python twin of :func:`registered_domain` for normalizing
    driver-side blocklist entries (same last-2/last-3 + second-level
    suffix rule)."""
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    last2 = ".".join(labels[-2:])
    if last2 in SECOND_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return last2


def domain_caps(
    df: DataFrame,
    *,
    url_col: str = "url",
    domain_col: str | None = None,
    max_per_domain: int,
    order_col: str = "doc_id",
    keep_col: str = "kept",
    idn: bool = False,
) -> DataFrame:
    """Per-registered-domain frequency cap: flag (not drop) the first
    ``max_per_domain`` rows per domain in deterministic ``order_col``
    order — callers filter on ``keep_col`` or route the overflow to an
    exceptions channel.  One window over the domain key; the domains
    whose row counts would skew the shuffle are exactly the capped
    ones, and rank-k selection stops mattering past the cap.

    Pass ``domain_col`` when the frame already carries the registered
    domain (e.g. from :func:`parse_urls`) — else the full parse chain
    re-evaluates per row just to key the window.

    ``idn=True`` folds the host to canonical IDNA ASCII before the
    domain key — via the :func:`fold_idn_hosts` split-union, so ASCII
    rows genuinely never leave Catalyst — and mirror IDN spellings of
    one domain share one cap (r15, verdict r14 #4; off by default —
    pure-Catalyst path)."""
    if max_per_domain < 1:
        raise ValueError(
            f"max_per_domain must be >= 1, got {max_per_domain}"
        )
    _tag = "_idn_fold_v7k2"
    if idn:
        if _tag in df.columns:
            raise ValueError(
                f"input columns collide with internal names: ['{_tag}']"
            )
        src = (
            F.col(domain_col)
            if domain_col is not None
            else url_host(F.col(url_col))
        )
        df = fold_idn_hosts(df, src, _tag)
        dom = (
            F.col(_tag)
            if domain_col is not None
            else registered_domain(F.col(_tag))
        )
    else:
        dom = (
            F.col(domain_col)
            if domain_col is not None
            else registered_domain(url_host(F.col(url_col)))
        )
    w = Window.partitionBy(dom).orderBy(F.col(order_col).asc())
    out = df.withColumn(
        keep_col,
        (F.row_number().over(w) <= F.lit(max_per_domain)).cast("int"),
    )
    return out.drop(_tag) if idn else out


def domain_caps_against(
    new_df: DataFrame,
    corpus_df: DataFrame,
    *,
    url_col: str = "url",
    domain_col: str | None = None,
    max_per_domain: int,
    order_col: str = "doc_id",
    keep_col: str = "kept",
    idn: bool = False,
) -> DataFrame:
    """Incremental per-domain frequency cap — the admission-gate twin
    of :func:`domain_caps` (same pattern as ``dedup_against``): a new
    row is kept iff its rank within its registered domain, counting
    rows ALREADY ADMITTED to ``corpus_df`` plus earlier new rows in
    ``order_col`` order, stays within ``max_per_domain``.  A domain
    that already filled its budget in the corpus admits nothing.

    Cost: one aggregate over the corpus (domain -> count; output is
    domain-cardinality-sized, tiny next to the corpus), one join of
    the new batch against it, one window over the new batch.  The
    corpus ships COUNTS, never rows — the incremental contract every
    ``_against`` gate in this engine keeps.

    ``idn=True`` folds hosts to canonical IDNA ASCII on BOTH frames
    (via the :func:`fold_idn_hosts` split-union — ASCII rows stay in
    Catalyst) before the domain key, so a domain that filled its
    budget under one IDN spelling admits nothing under another."""
    if max_per_domain < 1:
        raise ValueError(
            f"max_per_domain must be >= 1, got {max_per_domain}"
        )
    _idn_tag = "_idn_fold_v7k2"
    if idn:
        clash0 = {_idn_tag} & (
            set(new_df.columns) | set(corpus_df.columns)
        )
        if clash0:
            raise ValueError(
                f"input columns collide with internal names: "
                f"{sorted(clash0)}"
            )

        def _src(frame):
            if domain_col is not None and domain_col in frame.columns:
                return F.col(domain_col)
            return url_host(F.col(url_col))

        corpus_df = fold_idn_hosts(corpus_df, _src(corpus_df), _idn_tag)
        new_df = fold_idn_hosts(new_df, _src(new_df), _idn_tag)

    def _dom(df_cols_have_domain: bool):
        if idn:
            if domain_col is not None and df_cols_have_domain:
                return F.col(_idn_tag)
            return registered_domain(F.col(_idn_tag))
        if domain_col is not None and df_cols_have_domain:
            return F.col(domain_col)
        return registered_domain(url_host(F.col(url_col)))

    # collision-proof internal names (the bloom_probe lesson: a prefix
    # convention silently clobbers same-named caller columns).  Fixed
    # random tag, not per-call uuid — per-call randomness would make
    # column names and query plans nondeterministic run-to-run (noisy
    # plan diffs/fingerprints) without buying extra collision safety.
    tag = "v7k2"
    c_dom, c_rk, c_prior = f"_dom_{tag}", f"_rk_{tag}", f"_prior_{tag}"
    clash = {c_dom, c_rk, c_prior} & (
        set(new_df.columns) | set(corpus_df.columns)
    )
    if clash:
        raise ValueError(
            f"input columns collide with internal names: {sorted(clash)}"
        )

    prior = (
        corpus_df.select(
            _dom(domain_col in corpus_df.columns).alias(c_dom)
        )
        .groupBy(c_dom)
        .agg(F.count(F.lit(1)).alias(c_prior))
    )
    dom_new = _dom(domain_col in new_df.columns)
    w = Window.partitionBy(dom_new).orderBy(F.col(order_col).asc())
    ranked = new_df.withColumn(c_rk, F.row_number().over(w)).withColumn(
        c_dom, dom_new
    )
    return (
        ranked.join(prior, c_dom, "left")
        .withColumn(
            keep_col,
            (
                F.col(c_rk) + F.coalesce(F.col(c_prior), F.lit(0))
                <= F.lit(max_per_domain)
            ).cast("int"),
        )
        .drop(c_rk, c_dom, c_prior, *([_idn_tag] if idn else []))
    )


# --------------------------------------------------------------------
# Relative-URL resolution (RFC 3986 §5, deterministic subset)
# --------------------------------------------------------------------

# a leading scheme, per RFC 3986 §3.1 (also what _SCHEME_RE accepts)
_ANY_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:"
# scheme://authority — the origin prefix of an absolute URL
_ORIGIN_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
# a path segment that is NOT '.' and NOT '..': either it contains a
# non-dot char, or it is three-plus dots ('...' is a regular name).
# RE2/Java-safe (no lookaround) so an oracle could replay it.
_NON_DOT_SEG = r"(?:[^/]*[^/.][^/]*|\.{3,})"
# passes of dot-segment collapse: each pass removes one '<seg>/../'
# nesting level everywhere in the string, so N passes fully normalize
# paths up to N levels deep — far beyond anything a real page links.
_DOT_SEGMENT_PASSES = 10


def _collapse_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 remove_dot_segments over an absolute path,
    as a bounded chain of regexp_replace passes (plan-size constant:
    ``_DOT_SEGMENT_PASSES`` small regexes, no UDF, no explode).  A
    path nested deeper than the bound keeps its residual dot-segments
    (deterministic, never wrong — just not fully collapsed)."""
    c = path
    for _ in range(_DOT_SEGMENT_PASSES):
        # './' segments (incl. a leading one) and '<seg>/../' pairs
        c = F.regexp_replace(c, r"/\.(?:/|$)", "/")
        c = F.regexp_replace(c, rf"/{_NON_DOT_SEG}/\.\.(?:/|$)", "/")
        # root-level '..' has nothing to pop: '/../' -> '/' (RFC)
        c = F.regexp_replace(c, r"^/\.\.(?:/|$)", "/")
    return c


def resolve_url(base: Column, href: Column) -> Column:
    """Resolve an href found on the page at ``base`` (an absolute
    http(s) URL) into an absolute fetchable URL, or NULL when the href
    is not a fetch target.  The deterministic RFC 3986 §5 subset a
    link-discovery frontier needs:

    - fragment-only (``#top``) and empty hrefs -> NULL (same page);
    - absolute http(s) hrefs pass through with their path's
      dot-segments collapsed (RFC 3986 §5.2.2 normalizes absolute
      references too); other schemes (``mailto:``, ``javascript:``,
      ``tel:`` ...) -> NULL (not fetchable);
    - ``//host/p`` (protocol-relative) inherits the base scheme;
    - ``/p`` (root-relative) joins the base origin;
    - ``?q`` (query-only) replaces the base query, keeping its path;
    - anything else is path-relative: merged onto the base path's
      directory, then dot-segments collapse
      (:func:`_collapse_dot_segments`, bounded passes) — over the
      PATH only, never the query (``../x?p=a/..`` keeps its query
      byte-for-byte);
    - the fragment is stripped from every result (RFC: fragments are
      client-side only and would mint spurious frontier URLs).

    Verified against ``urllib.parse.urljoin`` over a randomized domain
    (`tests/test_url_ops.py`); the two deliberate divergences are
    documented there (urljoin drops empty path segments and treats a
    bare ``?`` as a no-op — this operator keeps RFC/browser
    semantics for both).

    Pure Catalyst: regexp extract/replace chains only — no UDF, no
    shuffle; scales as a narrow projection."""
    h = F.regexp_replace(F.trim(href), r"#.*$", "")  # strip fragment
    origin = F.regexp_extract(base, _ORIGIN_RE, 1)
    base_nofrag = F.regexp_replace(base, r"#.*$", "")
    base_noquery = F.regexp_replace(base_nofrag, r"\?.*$", "")
    # the base path ('' -> '/'), and its directory prefix
    base_path = F.regexp_extract(base_nofrag, _PATH_RE, 1)
    base_path = F.when(base_path == "", F.lit("/")).otherwise(base_path)
    base_dir = F.regexp_replace(base_path, r"[^/]*$", "")
    scheme = url_scheme(base)

    from sample_dms_s3_kinesis_spark.operators.text import _bind

    # First assemble the UN-normalized absolute target per branch, then
    # run the origin/path/query split and the dot-segment collapse ONCE
    # on the result — inlining the collapse chain per branch would grow
    # the expression tree ~4x (it is the bulk of this operator's cost,
    # and Catalyst does not CSE across when() branches).
    pre = (
        F.when(h.rlike(r"^(?i)https?://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .when(h.startswith("?"), F.concat(base_noquery, h))
        .otherwise(F.concat(origin, base_dir, h))
    )

    # dot-segment collapse over the PATH only, never the query
    # ('../x?p=a/..' keeps its query byte-for-byte); RFC 3986 §5.2.2
    # normalizes absolute and protocol-relative references too.
    # `pre` is BOUND (text._bind): the assembly references it three
    # times and the final guard references the whole result twice —
    # inlined, the tree multiplies ~6x, which both re-runs the regex
    # chains per reference and blows whole-stage codegen past janino's
    # 64 KB method limit on any plan that projects resolve_url next to
    # a parse (the stage then silently drops to interpreted eval).
    def _assemble(p: Column) -> Column:
        return F.concat(
            F.regexp_extract(p, _ORIGIN_RE, 1),
            _collapse_dot_segments(
                F.regexp_extract(
                    F.regexp_extract(p, r"^([^?]*)", 1), _PATH_RE, 1
                )
            ),
            F.regexp_replace(p, r"^[^?]*", ""),
        )

    out = (
        F.when(h == "", F.lit(None).cast("string"))
        .when(
            h.rlike(_ANY_SCHEME_RE) & ~h.rlike(r"^(?i)https?://"),
            F.lit(None).cast("string"),
        )
        .otherwise(_bind(pre, _assemble))
    )
    # a base that is not an absolute http(s) URL cannot anchor
    # relative resolution — NULL the relative branches, keep absolutes
    return _bind(
        out,
        lambda o: F.when(
            base.rlike(r"^(?i)https?://") | o.rlike(r"^(?i)https?://"),
            o,
        ),
    )


# --------------------------------------------------------------------
# SURT urlkey (the CDX index key form)
# --------------------------------------------------------------------


def surt_urlkey(url: Column, *, idn: bool = False) -> Column:
    """Canonical SURT-form index key for an http(s) URL — the ``urlkey``
    convention CDX indexes sort on (`sources/crawl.py:read_cdx`):
    ``com,example)/path?a=1&b=2``.  Canonicalization (the deterministic
    core of pywb's canonicalize, public convention):

    - host lowercased, a leading ``www.``/``www<digits>.`` label
      stripped, labels REVERSED and joined with ``,``;
    - ``)`` then the path (``/`` when empty), lowercased;
    - query parameters sorted bytewise and re-joined with ``&`` after
      ``?`` (an empty query drops the ``?``); fragment dropped;
    - the scheme, userinfo and an explicit port never appear (two
      mirrors of one site on different ports key identically).

    NULL for non-http(s) inputs.  Pure Catalyst (split / reverse /
    array_sort / join) — a narrow projection, no shuffle.  ``idn=True``
    folds the host to canonical IDNA ASCII first (r15, verdict r14 #4:
    ``xn--mnchen-3ya.de`` and its Unicode spelling must key
    identically — mirror collapse and per-host budgets hang off this
    key); opt-in so the default path stays Catalyst-pure."""
    host = url_host(url)
    if idn:
        host = fold_idn_host(host)
    host = F.regexp_replace(host, r"^www[0-9]*\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.", -1)), ",")
    path = F.lower(url_path(url))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.lower(url_query(url))
    qsorted = F.array_join(F.array_sort(F.split(q, "&", -1)), "&")
    key = F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(qsorted == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), qsorted)
        ),
    )
    return F.when(url.rlike(r"^(?i)https?://") & (host != ""), key)


# --------------------------------------------------------------------
# Politeness-aware fetch scheduling
# --------------------------------------------------------------------

# RFC 9110 IMF-fixdate after the weekday prefix is stripped:
# "16 Aug 2026 22:00:00 GMT".  Month names are protocol-fixed English
# tokens (never locale text) — matched literally so the parse works
# identically on every JVM locale.
_IMF_MONTHS = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]
_IMF_FIXDATE_RE = (
    r"^(\d{1,2}) (" + "|".join(_IMF_MONTHS) + r") (\d{4}) "
    r"(\d{2}):(\d{2}):(\d{2}) GMT$"
)


def host_backoff(
    responses: DataFrame,
    *,
    now: str,
    default_penalty_s: float = 45.0,
    host_col: str = "host",
) -> DataFrame:
    """Per-host rate-limit penalties off `sources/crawl.py:
    warc_responses` output: every 429 (Too Many Requests) / 503
    (Service Unavailable) response contributes a penalty — its
    ``Retry-After`` value when present (RFC 9110 §10.2.3: either
    delta-seconds or an HTTP-date, resolved against the pinned ``now``
    and clamped to ≥ 0), else ``default_penalty_s`` — and the host's
    ``backoff_s`` is the MAX across them (the most conservative server
    signal wins).  Output: one row per rate-limited host —
    ``(host, n_rate_limited, backoff_s)``.

    Feed into :func:`fetch_schedule` (``backoff=``) so a 429ing host's
    whole wave train shifts out instead of being re-hit on the same
    cadence.  ``now`` is a caller-pinned ISO timestamp — never wall
    clock, so plans replay deterministically — and is interpreted as
    UTC (naive strings get UTC attached; an explicit offset is
    honored), matching the HTTP-date side: IMF-fixdate is GMT by
    definition and is resolved to a true UTC instant via field
    extraction + ``try_make_timestamp(..., 'UTC')``, so the delta is
    correct under ANY session time zone and ANY JVM locale (r15, the
    r14 advice: the old ``'GMT'``-literal ``to_timestamp`` parse read
    the fields in session-zone wall time, and its ``MMM`` month names
    silently failed on non-English JVM locales, degrading every
    HTTP-date to the default penalty).  Pure Catalyst: a status-range
    filter, a per-row parse (strict 1*DIGIT pattern for delta-seconds,
    strict IMF-fixdate for HTTP-dates; the obsolete RFC 850/asctime
    forms degrade to the default penalty), one partial-aggregating
    groupBy on the host — one shuffle of host-cardinality rows."""
    from datetime import datetime, timezone

    now_dt = datetime.fromisoformat(now)
    if now_dt.tzinfo is None:
        now_dt = now_dt.replace(tzinfo=timezone.utc)
    now_epoch = now_dt.timestamp()
    rl = responses.filter(F.col("http_status").isin(429, 503))
    # RFC 9110 delta-seconds is 1*DIGIT — the strict pattern (not a
    # bare try_cast) so a hostile '-300' cannot ACCELERATE its own
    # re-hit, 'NaN' cannot poison the per-host MAX, and 'Infinity'
    # cannot park the host forever; anything non-conforming degrades
    # to the HTTP-date parse and then the default penalty
    delta = F.when(
        F.col("http_retry_after").rlike(r"^[0-9]{1,9}$"),
        F.col("http_retry_after").cast("double"),
    )
    # Locale-proof IMF-fixdate parse: strip the weekday prefix
    # (Spark's post-3.0 parser rejects EEE anyway), extract the fields
    # with an English-month regex (IMF-fixdate month names are
    # protocol-fixed English, NOT locale text), map the month through
    # array_position, and build the instant in UTC explicitly.
    # try_make_timestamp: a malformed value from a hostile server
    # (day 99, out-of-range minutes) must degrade to the default
    # penalty, not abort the scan (ANSI mode).
    stripped = F.regexp_replace(
        F.col("http_retry_after"), r"^[A-Za-z]{3}, ", ""
    )
    part = lambda i: F.regexp_extract(stripped, _IMF_FIXDATE_RE, i)
    mon = F.array_position(
        F.array(*[F.lit(m) for m in _IMF_MONTHS]), part(2)
    ).cast("int")
    http_date = F.when(
        part(2) != "",
        F.try_make_timestamp(
            part(3).cast("int"),
            mon,
            part(1).cast("int"),
            part(4).cast("int"),
            part(5).cast("int"),
            part(6).cast("decimal(16,6)"),
            F.lit("UTC"),
        ),
    )
    date_s = (
        F.unix_timestamp(http_date) - F.lit(float(now_epoch))
    ).cast("double")
    penalty = F.coalesce(
        delta,
        # guard the greatest(): it SKIPS nulls, so an unparseable date
        # would otherwise yield 0.0 instead of the default penalty
        F.when(http_date.isNotNull(), F.greatest(date_s, F.lit(0.0))),
        F.lit(float(default_penalty_s)),
    )
    return (
        rl.select(
            url_host(F.col("target_uri")).alias(host_col),
            penalty.alias("_penalty"),
        )
        .groupBy(host_col)
        .agg(
            F.count(F.lit(1)).alias("n_rate_limited"),
            F.max("_penalty").alias("backoff_s"),
        )
    )


def fetch_schedule(
    frontier: DataFrame,
    delays: DataFrame,
    *,
    host_col: str = "host",
    order_col: str = "url",
    delay_col: str = "crawl_delay",
    default_delay: float = 1.0,
    wave_col: str = "wave",
    offset_col: str = "fetch_offset_s",
    backoff: DataFrame | None = None,
) -> DataFrame:
    """Assign every frontier URL a per-host fetch wave and a scheduled
    start offset honoring robots Crawl-delay — the step between frontier
    construction (`q_frontier_pipeline` / `q_cdx_selection_pipeline`)
    and the fetch tier: requests to one host are serialized
    ``crawl_delay`` seconds apart while hosts proceed in parallel.

    ``delays`` is a (host, crawl_delay) frame — the output of
    `operators/robots.py:robots_crawl_delays`; hosts missing from it
    (or with a NULL delay) use ``default_delay``.  ``wave`` is the
    1-based position within the host (deterministic ``order_col``
    order); ``fetch_offset_s = (wave - 1) * delay``.

    ``backoff`` (optional) is a (host, backoff_s) frame — the output
    of :func:`host_backoff`: a rate-limited host's entire wave train
    shifts out by its penalty (``fetch_offset_s += backoff_s``), so a
    429ing host is not re-hit on the same cadence while clean hosts
    are unaffected.

    Cost: one or two broadcast joins (delays and backoff are both
    host-cardinality — tiny next to the frontier) + one window
    partitioned by host; the window's skew is bounded by the per-host
    caps every frontier in this engine applies upstream."""
    if default_delay < 0:
        raise ValueError(f"default_delay must be >= 0, got {default_delay}")
    clash = {
        wave_col,
        offset_col,
        f"_delay_{wave_col}",
        f"_bk_{wave_col}",
    } & set(frontier.columns)
    if clash:
        raise ValueError(
            f"frontier already carries output columns: {sorted(clash)}"
        )
    d = delays.select(
        F.col(host_col),
        F.col(delay_col).cast("double").alias(f"_delay_{wave_col}"),
    )
    w = Window.partitionBy(F.col(host_col)).orderBy(F.col(order_col).asc())
    staged = frontier.join(F.broadcast(d), host_col, "left")
    base_off = (F.col(wave_col) - 1).cast("double") * F.coalesce(
        F.col(f"_delay_{wave_col}"), F.lit(float(default_delay))
    )
    if backoff is not None:
        b = backoff.select(
            F.col(host_col),
            F.col("backoff_s").cast("double").alias(f"_bk_{wave_col}"),
        )
        staged = staged.join(F.broadcast(b), host_col, "left")
        base_off = base_off + F.coalesce(
            F.col(f"_bk_{wave_col}"), F.lit(0.0)
        )
    out = (
        staged.withColumn(wave_col, F.row_number().over(w))
        .withColumn(offset_col, base_off)
        .drop(f"_delay_{wave_col}", f"_bk_{wave_col}")
    )
    return out


# --------------------------------------------------------------------
# Redirect-chain resolution
# --------------------------------------------------------------------


def follow_redirects(
    edges: DataFrame,
    *,
    src_col: str = "url",
    dst_col: str = "redirect_target",
    max_hops: int = 8,
) -> DataFrame:
    """Collapse redirect chains: walk each source URL through the
    redirect map until a URL that redirects no further, or the hop
    bound.  One output row per distinct source in ``edges``:

    - ``url`` — the chain's starting URL;
    - ``final_url`` — where the walk stopped (the landing URL when
      ``resolved``, else just the position after ``max_hops`` steps);
    - ``hops`` — steps taken (1 = a single redirect);
    - ``resolved`` — true when ``final_url`` is not itself a redirect
      source: the walk genuinely landed.  False means the bound cut it
      off — a loop (a→b→a) or a chain longer than ``max_hops``, both of
      which a fetch tier treats as dead (browsers give up around 20).

    ``edges`` is a redirect map — e.g. `sources/crawl.py:redirect_edges`
    output.  A source with several recorded targets (recrawls that
    captured different hops) follows the lexicographically smallest,
    deterministically; pre-aggregate latest-capture-wins upstream if
    that is the contract you want.

    Cost: one groupBy to functionalize the map, then ``max_hops - 1``
    equi-joins on the current-position key (chains advance in lockstep;
    a finished chain's position has no outgoing edge, so its join rows
    are simply absent) and one final left join for the ``resolved``
    flag.  Lineage is cut every few rounds so the plan stays bounded.
    No collect, no UDF; shuffle volume per round is the still-walking
    frontier, which real redirect data (chain length ~1-3) empties
    after a couple of rounds."""
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    from sample_dms_s3_kinesis_spark.operators.dedup import _cut_lineage

    # cut BEFORE the groupBy: the upstream plan is typically the WARC
    # parse + RFC 3986 resolve chain, and inlined into the aggregate's
    # sort it blows codegen past janino's 64 KB method limit (the
    # whole stage silently drops to interpreted eval — a quiet perf
    # cliff; the thin projection alone stays codegen'd).  The cut also
    # gives every one of the max_hops joins below a leaf input instead
    # of re-inlining the parse per round.
    e = _cut_lineage(
        edges.select(F.col(src_col), F.col(dst_col)).filter(
            F.col(dst_col).isNotNull()
        )
    )
    e = (
        e.groupBy(src_col)
        .agg(F.min(dst_col).alias("_edst"))
        .withColumnRenamed(src_col, "_esrc")
    )
    e = _cut_lineage(e)
    state = e.select(
        F.col("_esrc").alias("url"),
        F.col("_edst").alias("final_url"),
        F.lit(1).cast("long").alias("hops"),
    )
    for i in range(max_hops - 1):
        j = state.join(
            e, state["final_url"] == e["_esrc"], "left"
        )
        state = j.select(
            "url",
            F.coalesce(F.col("_edst"), F.col("final_url")).alias(
                "final_url"
            ),
            (
                F.col("hops")
                + F.col("_edst").isNotNull().cast("long")
            ).alias("hops"),
        )
        if i % 3 == 2:
            state = _cut_lineage(state)
    return state.join(
        e.select(
            F.col("_esrc").alias("final_url"),
            F.lit(False).alias("resolved"),
        ),
        "final_url",
        "left",
    ).select(
        "url",
        "final_url",
        "hops",
        F.coalesce(F.col("resolved"), F.lit(True)).alias("resolved"),
    )


# --------------------------------------------------------------------
# Recrawl scheduling from capture history
# --------------------------------------------------------------------


def recrawl_priority(
    captures: DataFrame,
    *,
    now: str,
    key_col: str = "urlkey",
    ts_col: str = "ts",
    digest_col: str = "digest",
    ts_format: str = "yyyyMMddHHmmss",
    default_interval_s: int = 30 * 86400,
) -> DataFrame:
    """Per-URL recrawl scheduling from CDX-style capture history — the
    refresh policy that closes the crawl loop in TIME (fetch → ingest
    → discover → schedule → REFETCH): pages observed to change often
    come due sooner.

    One row per ``key_col``:

    - ``n_captures`` / ``n_changes`` — captures seen, and how many
      CHANGED content (consecutive-capture digest inequality, capture
      order by ``ts_col``);
    - ``first_ts`` / ``last_ts`` — observation span;
    - ``interval_s`` — estimated change interval: elapsed span over
      observed changes, FLOORED to an integer (convention shared with
      the DuckDB oracles: both sides floor, never round-to-nearest)
      and clamped to ≥ 1 s so same-second changes (span 0) mark the
      key maximally due instead of a NULL ``due`` silently dropping it
      from a sort-descending budget cut; keys with no observed change
      (or a single capture) fall back to ``default_interval_s``;
    - ``age_s`` — seconds since the last capture, against ``now`` (an
      ISO timestamp string, pinned by the caller — never wall clock,
      so plans replay deterministically);
    - ``due`` — ``age_s / interval_s``, rounded to 4 decimals: ≥ 1
      means the page is expected to have changed since its last
      capture.  Sort descending and cut at the fetch budget.

    Cost: one window (lag per key, ordered by capture time) + one
    groupBy — both partition on the key, one shuffle total; scales
    linearly in captures.  Pure Catalyst; DuckDB-replayable."""
    if default_interval_s <= 0:
        raise ValueError(
            f"default_interval_s must be > 0, got {default_interval_s}"
        )
    t = F.to_timestamp(F.col(ts_col).cast("string"), ts_format)
    base = captures.select(
        F.col(key_col), t.alias("_t"), F.col(digest_col).alias("_d")
    )
    w = Window.partitionBy(key_col).orderBy(F.col("_t"))
    prev = F.lag("_d").over(w)
    staged = base.withColumn(
        "_chg", (prev.isNotNull() & (F.col("_d") != prev)).cast("long")
    )
    agg = staged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.sum("_chg").alias("n_changes"),
        F.min("_t").alias("first_ts"),
        F.max("_t").alias("last_ts"),
    )
    span = F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")
    interval = F.when(
        F.col("n_changes") > 0,
        F.greatest(
            F.floor(span / F.col("n_changes")).cast("long"), F.lit(1)
        ),
    ).otherwise(F.lit(int(default_interval_s)))
    age = F.unix_timestamp(F.lit(now).cast("timestamp")) - F.unix_timestamp(
        "last_ts"
    )
    return agg.select(
        key_col,
        "n_captures",
        "n_changes",
        "first_ts",
        "last_ts",
        interval.alias("interval_s"),
        age.alias("age_s"),
        F.round(age / interval, 4).alias("due"),
    )
