"""robots.txt parse + decision semantics vs hand-worked expectations
(RFC 9309 core: grouping, agent precedence, longest-match, Allow tie
wins, * wildcard, $ anchor, comments, empty Disallow)."""

from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import robots

ROBOTS_A = """\
# politeness file for host a
User-agent: *
Disallow: /private
Allow: /private/ok

User-Agent: goodbot
User-agent: nicebot
Disallow: /tmp/
Allow: /tmp/*.html$

User-agent: badbot
Disallow: /
"""

ROBOTS_B = """\
User-agent: *
Disallow:
Unknown-directive: ignored
disallow: /b%20dir
"""


def _frames(spark):
    files = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
        "host string, robots_txt string",
    )
    return robots.parse_robots(files)


def test_parse_groups_and_directives(spark):
    rules = _frames(spark)
    got = {
        (r["host"], r["agent"], r["directive"], r["pattern"])
        for r in rules.collect()
    }
    assert got == {
        ("a.com", "*", "disallow", "/private"),
        ("a.com", "*", "allow", "/private/ok"),
        # consecutive User-agent headers share ONE group's rules
        ("a.com", "goodbot", "disallow", "/tmp/"),
        ("a.com", "goodbot", "allow", "/tmp/*.html$"),
        ("a.com", "nicebot", "disallow", "/tmp/"),
        ("a.com", "nicebot", "allow", "/tmp/*.html$"),
        ("a.com", "badbot", "disallow", "/"),
        # empty Disallow dropped (no restriction); unknown directive
        # ignored; lowercase directive key accepted
        ("b.com", "*", "disallow", "/b%20dir"),
    }


def _decide(spark, agent, paths):
    pages = spark.createDataFrame(
        [("a.com", p) for p in paths], "host string, url_path string"
    )
    out = robots.robots_decisions(
        pages, _frames(spark), agent=agent
    ).collect()
    return {r["url_path"]: r["allowed"] for r in out}


def test_star_agent_longest_match_and_tie(spark):
    got = _decide(
        spark,
        "*",
        ["/", "/public/x", "/private", "/private/no", "/private/ok/f"],
    )
    # /private* disallowed EXCEPT the longer /private/ok allow
    assert got == {
        "/": 1,
        "/public/x": 1,
        "/private": 0,
        "/private/no": 0,
        "/private/ok/f": 1,
    }


def test_specific_agent_shadows_star(spark):
    # goodbot has its own group -> '*' rules do NOT apply
    got = _decide(
        spark,
        "goodbot",
        ["/private/no", "/tmp/x", "/tmp/page.html", "/tmp/page.html?q"],
    )
    assert got == {
        "/private/no": 1,  # '*' group shadowed
        "/tmp/x": 0,
        # wildcard + $ anchor: allow /tmp/*.html$ beats /tmp/ (longer)
        "/tmp/page.html": 1,
        "/tmp/page.html?q": 0,  # anchor: not an .html-terminal path
    }


def test_unknown_agent_falls_back_to_star_and_badbot_blocked(spark):
    got = _decide(spark, "somebot", ["/private/no", "/tmp/x"])
    assert got == {"/private/no": 0, "/tmp/x": 1}
    got = _decide(spark, "BadBot", ["/", "/anything"])
    assert got == {"/": 0, "/anything": 0}


def test_host_without_rules_allows_everything(spark):
    pages = spark.createDataFrame(
        [("b.com", "/b%20dir/x"), ("b.com", "/free"), ("c.com", "/y")],
        "host string, url_path string",
    )
    out = robots.robots_decisions(pages, _frames(spark), agent="*")
    got = {(r["host"], r["url_path"]): r["allowed"] for r in out.collect()}
    # LIKE metacharacters in the pattern are escaped: %20 is literal
    assert got == {
        ("b.com", "/b%20dir/x"): 0,
        ("b.com", "/free"): 1,
        ("c.com", "/y"): 1,  # no robots for host at all
    }


def test_tab_whitespace_and_collision_guard(spark):
    """RFC WS includes tabs: a tab after the colon (or around the
    line) must not leak into the pattern/agent value; internal-name
    collisions on the pages frame fail loudly."""
    files = spark.createDataFrame(
        [("t.com", "User-agent:\t*\n\tDisallow:\t/private\t\n")],
        "host string, robots_txt string",
    )
    rules = robots.parse_robots(files)
    got = {
        (r["agent"], r["directive"], r["pattern"])
        for r in rules.collect()
    }
    assert got == {("*", "disallow", "/private")}
    pages = spark.createDataFrame(
        [("t.com", "/private/x"), ("t.com", "/pub")],
        "host string, url_path string",
    )
    out = {
        r["url_path"]: r["allowed"]
        for r in robots.robots_decisions(pages, rules).collect()
    }
    assert out == {"/private/x": 0, "/pub": 1}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="pattern"):
        robots.robots_decisions(
            pages.withColumn("pattern", F.lit(1)), rules
        )


def test_empty_disallow_group_shadows_star(spark):
    """RFC allow-all idiom: an exact-agent group whose ONLY rule is an
    empty 'Disallow:' must still shadow the '*' group (the group emits
    a sentinel row instead of vanishing at parse time)."""
    files = spark.createDataFrame(
        [
            (
                "s.com",
                "User-agent: *\nDisallow: /\n\n"
                "User-agent: nicebot\nDisallow:\n",
            )
        ],
        "host string, robots_txt string",
    )
    rules = robots.parse_robots(files)
    # sentinel row: agent present, NULL directive/pattern/rule_order
    sent = rules.filter(F.col("agent") == "nicebot").collect()
    assert len(sent) == 1
    assert sent[0]["directive"] is None
    assert sent[0]["pattern"] is None
    assert sent[0]["rule_order"] is None
    pages = spark.createDataFrame(
        [("s.com", "/"), ("s.com", "/anything/x")],
        "host string, url_path string",
    )
    got = {
        r["url_path"]: r["allowed"]
        for r in robots.robots_decisions(
            pages, rules, agent="nicebot"
        ).collect()
    }
    # nicebot's allow-all group shadows the '*' deny-all group
    assert got == {"/": 1, "/anything/x": 1}
    star = {
        r["url_path"]: r["allowed"]
        for r in robots.robots_decisions(pages, rules, agent="*").collect()
    }
    assert star == {"/": 0, "/anything/x": 0}


def test_backslash_patterns_do_not_break_like(spark):
    """A robots pattern ending in '\\$' is the path '...\\' anchored at
    end (backslash is an ordinary path byte in robots.txt); a bare
    trailing '\\' is an unanchored prefix.  Neither may produce a
    dangling LIKE escape (which would throw at execution)."""
    files = spark.createDataFrame(
        [
            (
                "bs.com",
                "User-agent: *\nDisallow: /dir\\$\nDisallow: /raw\\\n",
            )
        ],
        "host string, robots_txt string",
    )
    rules = robots.parse_robots(files)
    got = {
        (r["directive"], r["pattern"]) for r in rules.collect()
    }
    assert got == {
        ("disallow", "/dir\\$"),
        ("disallow", "/raw\\"),
    }
    pages = spark.createDataFrame(
        [
            ("bs.com", "/dir\\"),      # exact anchored match -> deny
            ("bs.com", "/dir\\more"),  # anchor: longer path allowed
            ("bs.com", "/dir"),        # shorter -> allowed
            ("bs.com", "/raw\\x"),     # unanchored prefix -> deny
            ("bs.com", "/rawx"),       # prefix requires the backslash
        ],
        "host string, url_path string",
    )
    got = {
        r["url_path"]: r["allowed"]
        for r in robots.robots_decisions(pages, rules).collect()
    }
    assert got == {
        "/dir\\": 0,
        "/dir\\more": 1,
        "/dir": 1,
        "/raw\\x": 0,
        "/rawx": 1,
    }


def test_crawl_delay_and_sitemaps(spark):
    """Crawl-delay: exact-agent shadowing, strictest-of-many,
    non-numeric ignored, no-delay hosts emit no row; Sitemap lines are
    group-independent and keep file order."""
    files = spark.createDataFrame(
        [
            (
                "cd.com",
                "User-agent: *\nCrawl-delay: 2\n\n"
                "User-agent: nicebot\nCrawl-delay: 0.25\n"
                "Crawl-delay: 0.5\n"
                "Sitemap: https://cd.com/a.xml\n"
                "Sitemap: https://cd.com/b.xml\n",
            ),
            ("bad.com", "User-agent: *\nCrawl-delay: soon\n"),
            ("none.com", "User-agent: *\nDisallow: /x\n"),
        ],
        "host string, robots_txt string",
    )
    got = {
        r["host"]: r["crawl_delay"]
        for r in robots.robots_crawl_delays(files, agent="nicebot").collect()
    }
    # exact group shadows '*' (2 never applies); max of 0.25/0.5 wins
    assert got == {"cd.com": 0.5}
    star = {
        r["host"]: r["crawl_delay"]
        for r in robots.robots_crawl_delays(files, agent="*").collect()
    }
    assert star == {"cd.com": 2.0}

    maps = robots.robots_sitemaps(files).orderBy("host", "line_no")
    assert [(r["host"], r["sitemap"]) for r in maps.collect()] == [
        ("cd.com", "https://cd.com/a.xml"),
        ("cd.com", "https://cd.com/b.xml"),
    ]


def test_crawl_delay_group_isolation(spark):
    """Two regressions caught by review: (1) groups separated only by
    rule lines must NOT merge — an agent never inherits another
    group's Crawl-delay; (2) an exact-agent group with no VALID delay
    still shadows '*' (no delay leaks through)."""
    files = spark.createDataFrame(
        [
            (
                "g1.com",
                # rule line between headers: two distinct groups
                "User-agent: googlebot\nDisallow: /x\n"
                "User-agent: slowbot\nCrawl-delay: 10\n",
            ),
            (
                "g2.com",
                # exact group's delay invalid -> shadows '*' anyway
                "User-agent: fastbot\nCrawl-delay: zz\n\n"
                "User-agent: *\nCrawl-delay: 10\n",
            ),
        ],
        "host string, robots_txt string",
    )
    got = {
        r["host"]: r["crawl_delay"]
        for r in robots.robots_crawl_delays(
            files, agent="googlebot"
        ).collect()
    }
    assert "g1.com" not in got  # googlebot's group declares no delay
    fast = {
        r["host"]: r["crawl_delay"]
        for r in robots.robots_crawl_delays(
            files, agent="fastbot"
        ).collect()
    }
    assert "g2.com" not in fast  # '*' delay must not leak to fastbot
    star = {
        r["host"]: r["crawl_delay"]
        for r in robots.robots_crawl_delays(files, agent="*").collect()
    }
    assert star == {"g2.com": 10.0}
    # slowbot reads its own group's delay on g1 and, having no exact
    # group on g2, correctly falls back to g2's '*' delay
    slow = {
        r["host"]: r["crawl_delay"]
        for r in robots.robots_crawl_delays(
            files, agent="slowbot"
        ).collect()
    }
    assert slow == {"g1.com": 10.0, "g2.com": 10.0}


def _ref_decide(txt, agent, path):
    """Pure-Python reference for robots_decisions — the documented
    RFC 9309 subset implemented directly (comment strip, tab-aware
    trim, consecutive-UA grouping with rule lines ending the header,
    empty-Disallow drop with group-presence retention, exact-agent
    shadowing across ALL groups, '*'-wildcard + '$'-anchor matching,
    longest-ORIGINAL-pattern precedence with Allow winning ties, no
    match => allowed)."""
    import re

    known = {"user-agent", "allow", "disallow", "crawl-delay", "sitemap"}
    parsed = []
    for line in (txt or "").split("\n"):
        l = re.sub(r"#.*$", "", line)
        l = re.sub(r"^\s+|\s+$", "", l)
        m = re.match(r"^([A-Za-z-]+)\s*:(.*)$", l, re.S)
        if not m:
            continue
        key = m.group(1).lower()
        if key not in known:
            continue
        parsed.append((key, re.sub(r"^\s+|\s+$", "", m.group(2))))
    groups, gid, prev = {}, 0, ""
    for k, v in ((k, v) for k, v in parsed if k != "sitemap"):
        if k == "user-agent" and prev != "user-agent":
            gid += 1
        prev = k
        g = groups.setdefault(gid, {"agents": [], "rules": []})
        if k == "user-agent":
            g["agents"].append(v.lower())
        elif k in ("allow", "disallow") and v != "":
            g["rules"].append((k, v))
    a = agent.lower()

    def rows(sel):
        return [
            r
            for g in groups.values()
            if sel in g["agents"]
            for r in g["rules"]
        ]

    exact = any(a in g["agents"] for g in groups.values())
    best = None
    for d, pat in rows(a) if exact else rows("*"):
        anchored = pat.endswith("$")
        base = pat[:-1] if anchored else pat
        rx = (
            "^"
            + "".join(".*" if c == "*" else re.escape(c) for c in base)
            + ("$" if anchored else "")
        )
        if re.match(rx, path, re.S):
            key = (len(pat), 1 if d == "allow" else 0)
            if best is None or key > best[0]:
                best = (key, d)
    return 1 if best is None or best[1] == "allow" else 0


def test_robots_decisions_match_python_reference(spark):
    """robots_decisions == the pure-Python RFC reference over a
    seeded-random domain of robots files (consecutive/repeated UA
    headers, tab/space value whitespace, comments, empty Disallow,
    Crawl-delay and Sitemap interleaving, junk lines, wildcard and
    anchored patterns) × random paths × present/absent/'*' agents.
    A 200-file development probe ran 0/3432 divergences; this pins a
    reduced domain permanently."""
    import random

    rng = random.Random(777)
    ags = ["foo", "bar", "*", "baz-bot"]
    ws = [" ", "\t", ""]

    def rpath():
        return "/" + "/".join(
            rng.choice(["a", "b", "priv", "x1", "deep/a"])
            for _ in range(rng.randint(0, 3))
        )

    def rpat():
        p = "/" + "".join(
            rng.choice(["a", "b", "priv", "*", "/", "x"])
            for _ in range(rng.randint(0, 5))
        )
        if rng.random() < 0.3:
            p += "$"
        if rng.random() < 0.05:
            p = ""
        return p

    def rfile():
        lines = []
        for _ in range(rng.randint(1, 5)):
            for _ in range(rng.randint(1, 2)):
                lines.append(
                    "User-agent:" + rng.choice(ws) + rng.choice(ags)
                    + rng.choice(["", " # c"])
                )
            for _ in range(rng.randint(0, 4)):
                kind = rng.random()
                if kind < 0.45:
                    lines.append("Allow: " + rpat())
                elif kind < 0.9:
                    lines.append(
                        "Disallow:" + rng.choice(ws) + rpat()
                    )
                elif kind < 0.95:
                    lines.append("Crawl-delay: 2")
                else:
                    lines.append("Disallow:")
            if rng.random() < 0.3:
                lines.append("")
            if rng.random() < 0.2:
                lines.append("Sitemap: https://h/s.xml")
            if rng.random() < 0.2:
                lines.append("junk line without colon")
        return "\n".join(lines)

    files = [("h%d.com" % i, rfile()) for i in range(80)]
    pages = [(h, rpath()) for h, _ in files for _ in range(4)]
    rules = robots.parse_robots(
        spark.createDataFrame(files, "host string, robots_txt string")
    )
    pg = spark.createDataFrame(
        pages, "host string, url_path string"
    ).distinct()
    txt = dict(files)
    for agent in ("foo", "nope"):
        dec = robots.robots_decisions(pg, rules, agent=agent)
        got = {
            (r["host"], r["url_path"]): r["allowed"]
            for r in dec.collect()
        }
        bad = [
            (h, p, got[(h, p)], _ref_decide(txt[h], agent, p))
            for (h, p) in got
            if got[(h, p)] != _ref_decide(txt[h], agent, p)
        ]
        assert not bad, bad[:5]
