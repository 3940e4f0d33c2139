"""F5 robots.txt parsing + longest-match gating (SURVEY.md §2.2)."""

from __future__ import annotations

from crawler_spark.operators.robots import parse_robots, robots_allowed, path_of

BODY = """
# comment
User-agent: googlebot
Disallow: /only-google

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp/*
Crawl-delay: 2.5

User-agent: other
Disallow: /
"""


def test_parse_star_group_only():
    allow, deny, delay = parse_robots(BODY)
    assert allow == ["/private/ok"]
    assert deny == ["/private", "/tmp/*"]
    assert delay == 2500


def test_longest_match_wins():
    allow, deny, _ = parse_robots(BODY)
    assert not robots_allowed("/private/x", allow, deny)
    assert robots_allowed("/private/ok/x", allow, deny)       # carve-back
    assert robots_allowed("/public", allow, deny)
    assert not robots_allowed("/tmp/anything", allow, deny)   # wildcard


def test_grouped_user_agents():
    body = "User-agent: a\nUser-agent: *\nDisallow: /x"
    allow, deny, _ = parse_robots(body)
    assert deny == ["/x"]


def test_empty_disallow_allows_all():
    allow, deny, _ = parse_robots("User-agent: *\nDisallow:")
    assert deny == [] and robots_allowed("/anything", allow, deny)


def test_dollar_anchor():
    allow, deny, _ = parse_robots("User-agent: *\nDisallow: /*.pdf$")
    assert not robots_allowed("/doc.pdf", allow, deny)
    assert robots_allowed("/doc.pdfx", allow, deny)


def test_path_of():
    assert path_of("http://h/p1?q=1") == "/p1?q=1"
    assert path_of("http://h") == "/"


def test_absent_body():
    allow, deny, delay = parse_robots("")
    assert allow == [] and deny == [] and delay == 0
