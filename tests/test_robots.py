"""RFC 9309 robots.txt evaluation (sources/robots.py)."""

from __future__ import annotations

import pytest

from incident_pii_redactor_spark.sources.robots import (
    RobotsMatcher,
    parse_robots,
    robots_filter,
)

BASIC = """
# comments are ignored
User-agent: *
Disallow: /private/
Allow: /private/public-page.html
Disallow: /search
Disallow: /tmp/$
"""

GROUPS = """
User-agent: examplebot
Disallow: /only-for-example/

User-agent: *
Disallow: /everyone-blocked/

User-agent: examplebot-news
Disallow: /news-blocked/
"""


def test_longest_match_and_allow_wins():
    m = RobotsMatcher(BASIC)
    assert not m.allowed("/private/secret.html")
    # Allow is longer than Disallow: /private/ -> allowed
    assert m.allowed("/private/public-page.html")
    assert not m.allowed("/search?q=x")
    # robots patterns are PREFIX matches (RFC 9309 §2.2.2): '/search'
    # also blocks '/searchable'
    assert not m.allowed("/searchable")


def test_prefix_wildcard_and_anchor():
    m = RobotsMatcher(BASIC)
    # '$' anchors: /tmp/ exactly is blocked, /tmp/x is not
    assert not m.allowed("/tmp/")
    assert m.allowed("/tmp/x")
    w = RobotsMatcher("User-agent: *\nDisallow: /*.pdf$\n")
    assert not w.allowed("/docs/manual.pdf")
    assert w.allowed("/docs/manual.pdf.html")


def test_group_selection_specific_beats_star():
    assert parse_robots(GROUPS, "examplebot") == [
        (False, "/only-for-example/")]
    assert parse_robots(GROUPS, "examplebot-news") == [
        (False, "/news-blocked/")]
    assert parse_robots(GROUPS, "otherbot") == [
        (False, "/everyone-blocked/")]
    # specific group wins: star rules do NOT merge in (RFC 9309 §2.2.1)
    m = RobotsMatcher(GROUPS, "examplebot")
    assert m.allowed("/everyone-blocked/x")


def test_edge_cases():
    # empty Disallow = allow-all; missing robots = allow-all
    assert RobotsMatcher("User-agent: *\nDisallow:\n").allowed("/x")
    assert RobotsMatcher("").allowed("/anything")
    # robots.txt itself always fetchable
    assert RobotsMatcher("User-agent: *\nDisallow: /\n") \
        .allowed("/robots.txt")
    # shared rules for stacked user-agent lines
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
    assert not RobotsMatcher(txt, "b").allowed("/x/1")


def test_robots_filter_spark(spark):
    robots = spark.createDataFrame(
        [("site00.example0.com",
          "User-agent: *\nDisallow: /private/\nAllow: /private/ok.html\n"),
         ("site01.example1.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string")
    frontier = spark.createDataFrame(
        [(1, "https://site00.example0.com/articles/a.html"),
         (2, "https://site00.example0.com/private/secret"),
         (3, "https://site00.example0.com/private/ok.html"),
         (4, "https://SITE01.example1.com/anything"),
         (5, "https://no-robots.example9.com/x")],
        "id int, url string")
    got = {r["id"]: r["robots_allowed"]
           for r in robots_filter(frontier, robots).collect()}
    assert got == {1: True, 2: False, 3: True, 4: False, 5: True}
    out = robots_filter(frontier, robots)
    assert out.columns == ["id", "url", "robots_allowed"]


def test_robots_filter_mixed_case_scheme(spark):
    """RFC 3986 §3.1: schemes are case-insensitive — HTTP://Host/x must
    resolve the same host and hit the robots join (ADVICE round 5: the
    lowercase-only scheme regex yielded an empty host, so mixed-case
    URLs bypassed robots entirely)."""
    robots = spark.createDataFrame(
        [("blocked.example.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string")
    frontier = spark.createDataFrame(
        [(1, "HTTP://Blocked.example.com/secret"),
         (2, "hTtPs://blocked.example.com/also"),
         (3, "https://open.example.com/fine")],
        "id int, url string")
    got = {r["id"]: r["robots_allowed"]
           for r in robots_filter(frontier, robots).collect()}
    assert got == {1: False, 2: False, 3: True}


def test_robots_filter_rejects_colliding_columns(spark):
    robots = spark.createDataFrame(
        [("h.example.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string")
    frontier = spark.createDataFrame(
        [("https://h.example.com/x", "oops")], "url string, _host string")
    import pytest

    with pytest.raises(ValueError, match="_host"):
        robots_filter(frontier, robots)


def test_duplicate_agent_groups_combine():
    """RFC 9309 §2.2.1: multiple groups naming the same agent merge
    their rules (review round 5)."""
    txt = ("User-agent: foobot\nDisallow: /a\n\n"
           "User-agent: foobot\nDisallow: /b\n")
    m = RobotsMatcher(txt, "foobot")
    assert not m.allowed("/a")
    assert not m.allowed("/b")
    assert m.allowed("/c")
