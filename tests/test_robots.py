"""robots.txt (functions/robots.py): ordered-policy conformance
against stdlib urllib.robotparser on randomized rule sets, RFC 9309
longest-match goldens, group selection, and parser edge cases."""

from __future__ import annotations

import random
from urllib.robotparser import RobotFileParser

import pytest

from setup_harvest_action_spark.functions.robots import (
    ROBOTS_TXT,
    can_fetch,
    parse_robots,
)

_SEGS = ["articles", "private", "tmp", "api", "img", "draft", "public"]


def _random_robots(rng: random.Random) -> str:
    lines = []
    for agent in (["testbot"] if rng.random() < 0.7 else []) + ["*"]:
        lines.append(f"User-agent: {agent}")
        for _ in range(rng.randrange(2, 7)):
            kind = rng.choice(["Allow", "Disallow"])
            depth = rng.randrange(1, 3)
            path = "/" + "/".join(rng.choice(_SEGS) for _ in range(depth))
            if rng.random() < 0.5:
                path += "/"
            lines.append(f"{kind}: {path}")
        if rng.random() < 0.3:
            lines.append("Disallow:")  # empty = allow-all rule line
        lines.append("")
    return "\n".join(lines)


def _random_path(rng: random.Random) -> str:
    depth = rng.randrange(1, 4)
    p = "/" + "/".join(rng.choice(_SEGS) for _ in range(depth))
    if rng.random() < 0.4:
        p += f"/page{rng.randrange(10)}"
    return p


def test_ordered_policy_matches_stdlib_robotparser():
    """First-match-in-file-order semantics, byte-for-byte against
    CPython's parser across 60 randomized rule sets × 40 paths (rule
    sets have at most one specific group plus '*', the structure both
    group-selection strategies agree on)."""
    rng = random.Random(4711)
    for _ in range(60):
        text = _random_robots(rng)
        ours = parse_robots(text)
        ref = RobotFileParser()
        ref.parse(text.splitlines())
        for _ in range(40):
            path = _random_path(rng)
            for agent in ("testbot", "otherbot"):
                want = ref.can_fetch(agent, path)
                got = can_fetch(ours, agent, path, policy="ordered")
                assert got == want, (text, agent, path)


def test_longest_match_goldens():
    parsed = parse_robots(ROBOTS_TXT)
    cases = [
        ("/articles/7", True),  # plain allow
        ("/private/7", False),  # plain disallow
        ("/private/public/7", True),  # Allow carves out a subtree
        ("/articles/draft7", False),  # longer Disallow overrides Allow
        ("/tmp/page7", False),
        ("/elsewhere", True),  # unmatched → allowed
        # RFC 9309 §2.2.3 pattern syntax (the r14 advice item):
        ("/cache/7.tmp", False),  # '/*.tmp$' wildcard Disallow hits
        ("/cache/7.tmp.bak", True),  # '$' anchors — no match
        ("/doc/a.pdf", True),  # '*' Allow /downloads/*.pdf doesn't leak
        ("/downloads/file7.pdf", True),  # '*' Allow (len 16) beats
        ("/downloads/file7.txt", False),  # literal Disallow (len 11)
    ]
    for path, want in cases:
        assert can_fetch(parsed, "spark-graft-crawler", path) == want, path


def test_rfc9309_pattern_matching():
    """'*'/'$' semantics in isolation: the advice item's exact case —
    'Disallow: /*.pdf$' must block /doc/a.pdf — plus literal-'$'
    mid-pattern, empty-'*' runs, and multi-'*' patterns."""
    from setup_harvest_action_spark.functions.robots import rule_matches

    p = parse_robots("User-agent: *\nDisallow: /*.pdf$\n")
    assert not can_fetch(p, "anybot", "/doc/a.pdf")
    assert can_fetch(p, "anybot", "/doc/a.pdfx")  # anchored miss
    assert rule_matches("/*.pdf$", "/a.pdf")
    assert rule_matches("/a*b", "/ab")  # '*' matches empty
    assert rule_matches("/a*b*c", "/aXbYc")
    assert not rule_matches("/a*b", "/ba")  # anchored at path start
    assert rule_matches("/p$q", "/p$q-literal")  # mid-'$' is literal
    assert not rule_matches("/p$q", "/pq")
    # ordered policy stays literal (stdlib parity): '*' not special
    assert can_fetch(p, "anybot", "/doc/a.pdf", policy="ordered")


def test_group_selection_and_metadata():
    parsed = parse_robots(ROBOTS_TXT)
    # the badbot group (Disallow: /) applies to matching agents only
    assert not can_fetch(parsed, "BadBot/2.0 (+http://bad)", "/articles/1")
    assert can_fetch(parsed, "goodbot", "/articles/1")
    assert parsed["sitemaps"] == ["https://corpus.example/sitemap.xml"]
    star = [g for g in parsed["groups"] if "*" in g["agents"]][0]
    assert star["crawl_delay"] == 2.0


def test_parser_edges():
    # comments, blank-separated groups, rules before any agent, and a
    # User-agent line after rules starting a new group
    text = (
        "Disallow: /orphan/\n"  # orphan rule: ignored
        "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
        "User-agent: c  # trailing comment\nAllow: /x/\nDisallow: /\n"
    )
    p = parse_robots(text)
    assert len(p["groups"]) == 2
    assert p["groups"][0]["agents"] == ["a", "b"]
    assert not can_fetch(p, "b", "/x/1", policy="ordered")
    assert can_fetch(p, "c", "/x/1", policy="ordered")
    assert not can_fetch(p, "c", "/y", policy="ordered")
    with pytest.raises(ValueError):
        can_fetch(p, "a", "/x", policy="nonsense")


def test_host_keyed_robots_policies():
    """r16: the per-host dimension's seven policies, decision-pinned
    at the matcher level (the catalog oracle replays them only as
    regexes — this pins the ruleset → decision mapping itself,
    including host1's group selection where picking the '*' fallback
    instead of the crawler's own group would block everything)."""
    from setup_harvest_action_spark.functions.robots import (
        can_fetch,
        parse_robots,
    )
    from setup_harvest_action_spark.functions.webgraph import (
        FRONTIER_AGENT,
        HOST_ROBOTS,
    )

    def ok(host, path):
        return can_fetch(parse_robots(HOST_ROBOTS[host]), FRONTIER_AGENT, path)

    # host0: wildcard + '$' — doc paths ending in 7 blocked
    assert not ok("host0", "/doc/7") and not ok("host0", "/doc/107")
    assert ok("host0", "/doc/70") and ok("host0", "/doc/8")
    # host1: OUR group blocks only /doc/1*; '*' group blocks all
    assert not ok("host1", "/doc/1") and not ok("host1", "/doc/199")
    assert ok("host1", "/doc/2") and ok("host1", "/doc/0")
    other = parse_robots(HOST_ROBOTS["host1"])
    assert not can_fetch(other, "some-other-bot", "/doc/2")  # '*' group
    # host2: Allow /doc/2 (6 octets) out-ranks Disallow /doc/ (5)
    assert ok("host2", "/doc/2") and ok("host2", "/doc/25")
    assert not ok("host2", "/doc/3") and not ok("host2", "/doc/12")
    # host3: empty Disallow = allow everything
    assert ok("host3", "/doc/0") and ok("host3", "/anything")
    # host4: block-all
    assert not ok("host4", "/doc/0") and not ok("host4", "/")
    # host5: mid-pattern wildcard — any 3 after /doc/
    assert not ok("host5", "/doc/3") and not ok("host5", "/doc/13")
    assert not ok("host5", "/doc/31") and ok("host5", "/doc/124")
    # host6: anchored Allow carve-out — only paths ending in 0
    assert ok("host6", "/doc/0") and ok("host6", "/doc/10")
    assert not ok("host6", "/doc/1") and not ok("host6", "/doc/105")


def test_codegen_admission_equals_matcher_and_dimension_join(spark):
    """r16: the codegen'd admission column (robots_admission_expr),
    the Python matcher (can_fetch), and the broadcast-dimension-join
    path (robots_admit) must agree on every URL — across every
    per-host policy and a randomized path population that includes
    wildcard-hit, anchor-hit, and group-selection cases."""
    import random

    import pyspark.sql.functions as F

    from setup_harvest_action_spark.functions.robots import (
        can_fetch,
        parse_robots,
    )
    from setup_harvest_action_spark.functions.webgraph import (
        FRONTIER_AGENT,
        HOST_ROBOTS,
        robots_admission_expr,
        robots_admit,
        robots_dimension,
    )

    rng = random.Random(42)
    rows = []
    for i in range(400):
        h = f"host{rng.randrange(7)}"
        d = rng.randrange(0, 250)
        rows.append((h, f"https://{h}.example/doc/{d}"))
    urls = spark.createDataFrame(rows, "host string, url string").distinct()

    got_codegen = {
        r["url"]
        for r in urls.filter(
            robots_admission_expr(
                F.col("host"),
                F.regexp_extract("url", r"^https://[^/]+(/.*)$", 1),
            )
        ).collect()
    }
    got_join = {
        r["url"]
        for r in robots_admit(urls, robots_dimension(spark)).collect()
    }
    parsed = {h: parse_robots(t) for h, t in HOST_ROBOTS.items()}
    want = {
        u
        for h, u in urls.collect()
        if can_fetch(parsed[h], FRONTIER_AGENT, "/" + u.split("/", 3)[3])
    }
    assert got_codegen == want
    assert got_join == want
    assert want and len(want) < urls.count()  # both classes populated


def test_crawl_delays_come_from_the_selected_group():
    """r16: Crawl-delay is interpreted per the AGENT's group — host1's
    '*' fallback carries a decoy 99s delay that must not leak onto our
    crawler (whose own group declares none → default), while declared
    delays flow through and undeclared hosts default."""
    from setup_harvest_action_spark.functions.webgraph import (
        CRAWL_DEFAULT_DELAY,
        crawl_delays,
    )

    d = crawl_delays()
    assert d["host0"] == 2.0 and d["host2"] == 5.0
    assert d["host5"] == 10.0 and d["host6"] == 0.5
    assert d["host1"] == CRAWL_DEFAULT_DELAY  # decoy not leaked
    assert d["host3"] == CRAWL_DEFAULT_DELAY
    # another agent DOES get host1's '*' group delay
    assert crawl_delays(agent="some-other-bot")["host1"] == 99.0


# --- r17 post-close: RFC 9309 §2.3.1 availability semantics ------------------


def test_policy_from_fetch_availability_semantics():
    from setup_harvest_action_spark.functions.robots import (
        BLOCK_ALL_ROBOTS,
        can_fetch,
        parse_robots,
        policy_from_fetch,
    )

    file_policy = "User-agent: *\nDisallow: /doc/\n"
    # available: the body governs
    assert policy_from_fetch(200, file_policy) == file_policy
    # unavailable (4xx): MAY access anything — empty policy
    for st in (400, 403, 404, 410):
        p = parse_robots(policy_from_fetch(st, file_policy))
        assert can_fetch(p, "any-agent", "/doc/1")
    # unreachable (5xx): MUST assume complete disallow
    for st in (500, 503, 599):
        assert policy_from_fetch(st, file_policy) == BLOCK_ALL_ROBOTS
        p = parse_robots(BLOCK_ALL_ROBOTS)
        assert not can_fetch(p, "any-agent", "/")
    # r18 (r17 advice): 1xx/3xx are outside the availability model —
    # silently returning block-all would misclassify a redirect; the
    # caller must resolve redirects first (RFC 9309 §2.3.1.2)
    import pytest

    for st in (100, 101, 300, 301, 302, 304, 307, 308):
        with pytest.raises(ValueError, match="outside the modeled"):
            policy_from_fetch(st, file_policy)


def test_robots_policies_from_capture_follows_redirects():
    """r18: RFC 9309 §2.3.1.2 — a 301'd robots.txt's policy applies
    (read from the terminal record); loop / >5 hops / dangling mean
    the file could not be OBTAINED -> unavailable -> allow-all; a 5xx
    terminal after a redirect still maps to block-all; non-robots
    start URIs never produce entries."""
    from setup_harvest_action_spark.functions.robots import (
        BLOCK_ALL_ROBOTS,
        robots_policies_from_capture,
    )
    from setup_harvest_action_spark.sources.warc import (
        _pack,
        _record,
        http_response,
        parse_warc,
    )

    policy = "User-agent: *\nDisallow: /doc/\n"

    def rec(uri, *, status=200, body="", location=None):
        return _record(
            "response",
            http_response(
                body=body.encode(),
                status=status,
                content_type="text/plain; charset=utf-8",
                location=location,
            ),
            uri=uri,
            record_id=None,
            content_type="application/http;msgtype=response",
        )

    recs = [
        rec("https://a.example/robots.txt", status=301, location="/r.txt"),
        rec("https://a.example/r.txt", body=policy),
        rec("https://b.example/robots.txt", status=302, location="/x"),
        rec("https://b.example/x", status=302, location="/robots.txt"),
        rec("https://c.example/robots.txt", status=301, location="/gone"),
        # a redirect INTO a 5xx: the fetch completed -> unreachable
        rec("https://e.example/robots.txt", status=301, location="/r"),
        rec("https://e.example/r", status=503),
        # a page that is not a robots start URI
        rec("https://a.example/doc/1", body="<p>hi</p>"),
    ]
    out = robots_policies_from_capture(parse_warc(_pack(recs, "plain")))
    assert out == {
        "a": policy,
        "b": "",  # loop -> unavailable -> allow all
        "c": "",  # dangling -> unavailable -> allow all
        "e": BLOCK_ALL_ROBOTS,  # terminal 503 -> unreachable
    }


def test_robots_unavailable_frontier_flips_only_the_fetch_failed_hosts(
    spark,
):
    """host2 (404) must admit paths its FILE policy blocked; host3
    (503) must vanish although its file policy allowed everything;
    every other host must match the normal fetch leg exactly."""
    from setup_harvest_action_spark.functions.webgraph import (
        q_pipeline_robots_fetch,
        q_pipeline_robots_unavailable,
    )

    SF = "/root/testdata/sf0.001"
    normal = {
        (r["host"], r["url"]) for r in q_pipeline_robots_fetch(spark, SF).collect()
    }
    flipped = {
        (r["host"], r["url"])
        for r in q_pipeline_robots_unavailable(spark, SF).collect()
    }
    assert not any(h == "host3" for h, _ in flipped)
    assert any(h == "host3" for h, _ in normal)
    h2 = {u for h, u in flipped if h == "host2"}
    assert h2 and any("/doc/2" not in u.split(".example", 1)[1] for u in h2)
    others_n = {(h, u) for h, u in normal if h not in ("host2", "host3")}
    others_f = {(h, u) for h, u in flipped if h not in ("host2", "host3")}
    assert others_n == others_f
