"""robots.txt parsing and allow/deny decisions (RFC 9309 subset).

Crawl curation needs robots compliance twice: the crawler honors it at
fetch time, and the CURATION side re-checks it when a corpus arrives
from a third-party crawl whose politeness is unknown (licensing/ToS
audits key on exactly this).  Reference parity: like the other crawl
operators this is schema-on-read over fetched objects — the reference
binds containerized objects to rows the same way (run.py:162-164).

Semantics implemented (the deterministic RFC 9309 core):
- ``#`` starts a comment; blank lines are separators.
- Directives are case-insensitive ``User-agent`` / ``Allow`` /
  ``Disallow``; unknown directives are ignored.
- Consecutive ``User-agent`` lines form ONE group header; the rules
  that follow attach to every agent in the header.
- Agent selection: if any group names the requested agent exactly
  (case-insensitive), only those groups apply; otherwise the ``*``
  groups apply; otherwise everything is allowed.
- Matching: patterns are path prefixes with ``*`` wildcards and an
  optional ``$`` end anchor (translated to SQL LIKE, which both Spark
  and DuckDB evaluate identically with explicit escapes).
- Precedence: the LONGEST matching pattern wins; on a length tie,
  ``Allow`` wins.  No matching rule ⇒ allowed.
- An empty ``Disallow:`` value means "no restriction" (RFC).  The
  VALUE is dropped, but the GROUP survives: a group whose only rule
  is ``Disallow:`` (the common allow-all idiom) emits one sentinel
  row per agent with NULL directive/pattern, so an exact-agent
  allow-all group still shadows the ``*`` groups in
  :func:`robots_decisions` instead of vanishing at parse time.

Scale notes: parsing is posexplode + two windows PER HOST KEY (robots
files are small and per-host, so the window partitions are tiny and
uniformly distributed); decisions are a broadcast-or-shuffle equi-join
on the host key followed by a per-(page, rule) LIKE and one
aggregation — no UDFs anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Every directive the parsers understand; grouping considers all of
# them EXCEPT sitemap, which is group-independent per sitemaps.org.
_KNOWN_DIRECTIVES = (
    "user-agent",
    "allow",
    "disallow",
    "crawl-delay",
    "sitemap",
)


def _parsed_lines(
    df: DataFrame,
    content_col: str,
    key_cols: Sequence[str],
) -> DataFrame:
    """Shared front half of every robots.txt parser: comment strip,
    RFC-whitespace trim (tabs count) and directive/value split.
    Returns (*key_cols, _pos, _key, _val) for every recognized
    directive line."""
    keys = [F.col(k) for k in key_cols]
    lines = df.select(
        *keys,
        F.posexplode(
            F.split(F.coalesce(F.col(content_col), F.lit("")), "\n", -1)
        ).alias("_pos", "_line"),
    )
    # regexp trims, not F.trim: RFC whitespace includes TABS around
    # the colon and the value (WS = %x20 / %x09) and F.trim strips
    # spaces only — a '\t/private' pattern would silently never match
    cleaned = lines.select(
        *keys,
        "_pos",
        F.regexp_replace(
            F.regexp_replace("_line", "#.*$", ""), r"^\s+|\s+$", ""
        ).alias("_l"),
    )
    return cleaned.select(
        *keys,
        "_pos",
        F.lower(F.regexp_extract("_l", r"^([A-Za-z-]+)\s*:", 1)).alias(
            "_key"
        ),
        F.regexp_replace(
            F.regexp_extract("_l", r"^[A-Za-z-]+\s*:(.*)$", 1),
            r"^\s+|\s+$",
            "",
        ).alias("_val"),
    ).filter(F.col("_key").isin(*_KNOWN_DIRECTIVES))


def _grouped_lines(
    df: DataFrame,
    content_col: str,
    key_cols: Sequence[str],
) -> DataFrame:
    """:func:`_parsed_lines` plus RFC group ids (consecutive
    User-agent lines share one group; ANY recognized rule line —
    allow/disallow/crawl-delay — in between ends the header block, so
    the next User-agent opens a NEW group).  Group detection must see
    EVERY grouping directive: filtering to a caller's subset first
    made rule-separated headers look consecutive and merged unrelated
    groups (an agent inherited another group's Crawl-delay).  Sitemap
    lines are group-independent and excluded from the walk."""
    parsed = _parsed_lines(df, content_col, key_cols).filter(
        F.col("_key") != "sitemap"
    )
    # Window per robots file — tiny partitions, uniform across hosts.
    w = Window.partitionBy(*key_cols).orderBy("_pos")
    return parsed.withColumn(
        "_start",
        (
            (F.col("_key") == "user-agent")
            & (
                F.coalesce(F.lag("_key").over(w), F.lit(""))
                != "user-agent"
            )
        ).cast("int"),
    ).withColumn("_gid", F.sum("_start").over(w))


def _shadow_filter(
    df: DataFrame, agent: str, key_cols: Sequence[str]
) -> DataFrame:
    """RFC 9309 agent selection over any frame carrying an ``agent``
    column: per key, keep exact-``agent`` rows when any exist, else
    the ``*`` rows (exact-agent groups shadow the wildcard).  Shared
    by :func:`robots_decisions` and :func:`robots_crawl_delays` so the
    selection rule can never drift between them.  Adds and removes an
    internal ``_rk`` column."""
    a = agent.lower()
    mine = df.filter(F.col("agent").isin(a, "*"))
    best = mine.groupBy(*key_cols).agg(
        F.min(F.when(F.col("agent") == a, 0).otherwise(1)).alias("_rk")
    )
    return (
        mine.join(best, list(key_cols))
        .filter(
            F.when(F.col("_rk") == 0, F.col("agent") == a).otherwise(
                F.col("agent") == "*"
            )
        )
        .drop("_rk")
    )


def parse_robots(
    df: DataFrame,
    *,
    content_col: str = "robots_txt",
    key_cols: Sequence[str] = ("host",),
) -> DataFrame:
    """Parse robots.txt contents into one row per (agent, rule).

    Input: one row per robots.txt file with ``key_cols`` identifying
    it (normally the host) and ``content_col`` holding the raw text.
    Output: (*key_cols, agent, directive, pattern, rule_order) — one
    row per agent × rule in its group, ``directive`` in
    ('allow', 'disallow'), ``rule_order`` the line position (stable
    tie-break material).  Group structure follows the RFC: consecutive
    User-agent lines share the rules that follow them.  A group with
    no effective rules (empty ``Disallow:`` only, or no rule lines at
    all) emits ONE row per agent with NULL directive/pattern/
    rule_order — a presence sentinel that never matches a path but
    keeps the group visible to agent selection downstream.
    """
    keys = [F.col(k) for k in key_cols]
    grouped = _grouped_lines(df, content_col, key_cols)
    agents = grouped.filter(F.col("_key") == "user-agent").select(
        *keys,
        F.col("_gid"),
        F.lower(F.col("_val")).alias("agent"),
    )
    # empty Disallow means "no restriction" (RFC) — and an empty Allow
    # matches nothing either way — both drop here
    rules = grouped.filter(
        F.col("_key").isin("allow", "disallow") & (F.col("_val") != "")
    ).select(
        *keys,
        F.col("_gid"),
        F.col("_key").alias("directive"),
        F.col("_val").alias("pattern"),
        F.col("_pos").alias("rule_order"),
    )
    # LEFT join: a rule-less group (e.g. the allow-all idiom
    # 'User-agent: x\nDisallow:') must still emit its agents as
    # sentinel rows, or an exact-agent allow-all group would vanish
    # and robots_decisions would wrongly fall back to the '*' group
    return agents.join(rules, [*key_cols, "_gid"], "left").select(
        *key_cols, "agent", "directive", "pattern", "rule_order"
    )


def robots_decisions(
    pages: DataFrame,
    rules: DataFrame,
    *,
    agent: str = "*",
    url_path_col: str = "url_path",
    key_cols: Sequence[str] = ("host",),
    keep_col: str = "allowed",
) -> DataFrame:
    """Allow/deny decision per page for ``agent`` against parsed
    ``rules`` (output of :func:`parse_robots`).

    Agent selection per host: exact-agent groups when any exist, else
    the ``*`` groups, else allowed.  Longest matching pattern wins;
    Allow wins length ties; no match ⇒ allowed.  Flag-not-drop
    (``keep_col``), like every curation gate here.  Returns ONE row
    per distinct (*key_cols, url_path) — decisions are a property of
    the path, so callers join the flag back onto their page frame.

    Plan shape: one equi-join pages × host rules (rules frames are
    host-cardinality — broadcast when small), LIKE per candidate rule,
    then a max_by aggregation back to one row per page.
    """
    a = agent.lower()
    keys = list(key_cols)
    clash = (
        {"directive", "pattern", "_plen", "_like", "_hit"}
        & set(pages.columns)
    )
    if clash:
        raise ValueError(
            f"pages columns collide with internal names: {sorted(clash)}"
        )
    # exact-agent groups shadow '*' groups per host (shared rule)
    chosen = _shadow_filter(rules, a, keys)
    # pattern → LIKE: escape \ % _ , '*' → '%', trailing '$' anchors.
    # The anchor '$' is stripped from the ORIGINAL pattern BEFORE
    # escaping — stripping after escaping broke 'foo\$' (the escape
    # pass doubled the backslash, then the strip regex ate one
    # backslash with the '$', leaving a dangling LIKE escape that
    # throws at execution on one odd robots line).  In robots.txt a
    # backslash is an ordinary path byte, so 'foo\$' is the path
    # 'foo\' anchored at end.
    anchored = F.col("pattern").endswith("$")
    base = F.when(
        anchored,
        F.col("pattern").substr(F.lit(1), F.length("pattern") - 1),
    ).otherwise(F.col("pattern"))
    esc = F.regexp_replace(base, r"([\\%_])", r"\\$1")
    esc = F.regexp_replace(esc, r"\*", "%")
    like_pat = F.when(anchored, esc).otherwise(
        F.concat(esc, F.lit("%"))
    )
    prepared = chosen.select(
        *keys,
        "directive",
        "pattern",
        F.length("pattern").alias("_plen"),
        like_pat.alias("_like"),
    )
    # page × rule candidates within the host key; LIKE with explicit
    # backslash escape (Spark's default; DuckDB needs it spelled out,
    # which the oracle twin does)
    joined = pages.join(prepared, keys, "left").withColumn(
        "_hit",
        F.col("_like").isNotNull()
        & F.expr(f"{url_path_col} LIKE _like ESCAPE '\\\\'"),
    )
    decided = joined.groupBy(*keys, url_path_col).agg(
        F.max_by(
            F.col("directive") == "allow",
            F.when(
                F.col("_hit"),
                # longest pattern wins; Allow beats Disallow on ties
                F.struct(
                    F.col("_plen").alias("l"),
                    (F.col("directive") == "allow")
                    .cast("int")
                    .alias("a"),
                ),
            ),
        ).alias("_verdict"),
        F.max(F.col("_hit").cast("int")).alias("_any"),
    )
    return decided.select(
        *keys,
        url_path_col,
        F.when(F.coalesce(F.col("_any"), F.lit(0)) == 0, F.lit(1))
        .otherwise(F.col("_verdict").cast("int"))
        .alias(keep_col),
    )


def robots_crawl_delays(
    df: DataFrame,
    *,
    agent: str = "*",
    content_col: str = "robots_txt",
    key_cols: Sequence[str] = ("host",),
) -> DataFrame:
    """Per-host ``Crawl-delay`` for ``agent`` (the de-facto politeness
    extension most crawlers honor even though RFC 9309 omits it).
    Agent selection matches :func:`robots_decisions`: exact-agent
    groups shadow ``*`` groups.  Returns (*key_cols, crawl_delay
    double) for hosts whose applicable groups declare one — the
    STRICTEST (max) delay when several applicable groups disagree;
    non-numeric values are ignored (try_cast).  Hosts with no
    applicable delay emit no row: callers left-join and treat NULL as
    'no delay requested'."""
    a = agent.lower()
    grouped = _grouped_lines(df, content_col, key_cols)
    agents = grouped.filter(F.col("_key") == "user-agent").select(
        *key_cols, "_gid", F.lower(F.col("_val")).alias("agent")
    )
    delays = grouped.filter(
        (F.col("_key") == "crawl-delay")
        & F.col("_val").try_cast("double").isNotNull()
    ).select(
        *key_cols, "_gid", F.col("_val").try_cast("double").alias("_delay")
    )
    # Agent selection ranks over GROUP PRESENCE, not delay presence:
    # an exact-agent group whose only Crawl-delay is invalid (or that
    # declares none) must still shadow the '*' group — ranking the
    # joined frame let the '*' delay leak through, the same
    # vanishing-group defect parse_robots' sentinel rows fix.
    chosen = _shadow_filter(agents, a, key_cols)
    return (
        chosen.join(delays, [*key_cols, "_gid"])
        .groupBy(*key_cols)
        .agg(F.max("_delay").alias("crawl_delay"))
    )


def robots_sitemaps(
    df: DataFrame,
    *,
    content_col: str = "robots_txt",
    key_cols: Sequence[str] = ("host",),
) -> DataFrame:
    """Per-host ``Sitemap`` URLs.  Sitemap lines are GROUP-INDEPENDENT
    per RFC 9309 §2.3 / sitemaps.org (they may appear anywhere in the
    file and apply to every agent), so no group machinery — one output
    row per (host, sitemap) with the line position for stable
    ordering."""
    return (
        _parsed_lines(df, content_col, key_cols)
        .filter((F.col("_key") == "sitemap") & (F.col("_val") != ""))
        .select(
            *key_cols,
            F.col("_val").alias("sitemap"),
            F.col("_pos").alias("line_no"),
        )
    )
