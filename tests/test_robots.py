"""robots.txt (RFC 9309) + sitemap tests: group selection, precedence,
wildcards/anchors, malformed input, and the Spark filter operator."""

import pytest

from memvid_spark.sources.robots import (
    can_fetch,
    parse_robots,
    robots_filter,
    sitemap_urls,
)

ROBOTS = """# policy
User-agent: *
Disallow: /private/
Allow: /private/public
Disallow: /tmp$
Disallow: /*.pdf$

User-agent: memvidbot
User-agent: otherbot
Disallow: /bots-only/
Allow: /

Sitemap: https://x.example/sitemap.xml
"""


def test_star_group_precedence_and_anchors():
    g = parse_robots(ROBOTS)
    assert can_fetch(g, "randombot", "/open")
    assert not can_fetch(g, "randombot", "/private/x")
    assert can_fetch(g, "randombot", "/private/public/x")  # longest allow wins
    assert not can_fetch(g, "randombot", "/tmp")
    assert can_fetch(g, "randombot", "/tmpX")  # $ anchors
    assert not can_fetch(g, "randombot", "/doc/file.pdf")  # * wildcard
    assert can_fetch(g, "randombot", "/doc/file.pdfx")


def test_specific_group_replaces_star():
    g = parse_robots(ROBOTS)
    # memvidbot's own group: star rules do NOT apply
    assert can_fetch(g, "memvidbot/1.0 (+https://ex)", "/private/x")
    assert not can_fetch(g, "otherbot", "/bots-only/a")


def test_most_specific_agent_token_wins():
    g = parse_robots(
        "User-agent: bot\nDisallow: /a\n\n"
        "User-agent: megabot\nDisallow: /b\n"
    )
    # UA 'megabot/2' matches both tokens; the longer one governs
    assert can_fetch(g, "megabot/2", "/a")
    assert not can_fetch(g, "megabot/2", "/b")


def test_malformed_and_edge_inputs():
    assert can_fetch(parse_robots(""), "any", "/x")  # no rules → allowed
    g = parse_robots("Disallow: /orphan\nUser-agent: *\nDisallow:\n")
    assert can_fetch(g, "any", "/orphan")  # orphan rule ignored
    assert can_fetch(g, "any", "/anything")  # empty disallow = allow all


def test_sitemap_urlset_and_index():
    sm = (
        '<?xml version="1.0"?>'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>https://x/a.xml</loc><lastmod>2024-02-02</lastmod>"
        "</sitemap><sitemap><loc>https://x/b.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    assert sitemap_urls(sm) == [
        ("https://x/a.xml", "2024-02-02"), ("https://x/b.xml", None),
    ]
    with pytest.raises(Exception):
        sitemap_urls("<notxml")


def test_robots_filter_operator(spark):
    pages = spark.createDataFrame(
        [("a.ex", "/private/x"), ("a.ex", "/ok"), ("b.ex", "/private/x")],
        "domain string, path string",
    )
    policies = spark.createDataFrame(
        [("a.ex", "User-agent: *\nDisallow: /private/\n")],
        "domain string, robots string",
    )
    rows = {(r["domain"], r["path"]): r["allowed"]
            for r in robots_filter(pages, policies).collect()}
    assert rows == {
        ("a.ex", "/private/x"): 0,
        ("a.ex", "/ok"): 1,
        ("b.ex", "/private/x"): 1,  # no policy for b.ex → allowed
    }
