"""Crawl-policy parsing: robots.txt (RFC 9309) and XML sitemaps.

A compliant web-corpus pipeline filters fetched pages against the
site's declared policy BEFORE they enter training data — retroactive
robots filtering is a standard Common-Crawl-derivative step. This
module implements the deterministic core: group selection by
user-agent (most-specific group wins, '*' fallback), rule matching
with RFC 9309 semantics ('*' wildcards, '$' end anchor,
longest-pattern precedence, allow wins ties), and sitemap extraction
(urlset/sitemapindex via stdlib ElementTree, namespace-tolerant).

Scale: policies are per-domain — a tiny broadcast table next to the
page corpus; ``robots_filter`` evaluates page paths against their
domain's compiled rules inside Arrow batches.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame


def parse_robots(text: str) -> dict[str, list[tuple[bool, str]]]:
    """{user-agent (lowercase): [(is_allow, pattern), ...]} in file
    order. Groups listing several user-agents share their rules;
    comments and unknown directives are ignored."""
    groups: dict[str, list[tuple[bool, str]]] = {}
    current: list[str] = []
    rules_started = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if rules_started:
                current = []
                rules_started = False
            current.append(value.lower())
            for ua in current:
                groups.setdefault(ua, [])
        elif field in ("allow", "disallow"):
            rules_started = True
            if not current:
                continue  # rules before any user-agent line: ignored
            if value == "" and field == "disallow":
                continue  # empty disallow = allow all (no rule)
            for ua in current:
                groups.setdefault(ua, []).append((field == "allow", value))
        elif field == "sitemap":
            groups.setdefault("*sitemaps*", []).append((True, value))
    return groups


def _pattern_rx(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = "".join(".*" if c == "*" else re.escape(c) for c in pattern)
    return re.compile("^" + rx + ("$" if anchored else ""))


def can_fetch(groups: dict, user_agent: str, path: str) -> bool:
    """RFC 9309 decision: pick the group for the most specific matching
    user-agent token (longest substring match, else '*'); among its
    rules the LONGEST matching pattern wins, allow beating disallow on
    equal length; no matching rule → allowed."""
    ua = user_agent.lower()
    candidates = [g for g in groups if g != "*sitemaps*" and g != "*" and g in ua]
    if candidates:
        group = groups[max(candidates, key=len)]
    elif "*" in groups:
        group = groups["*"]
    else:
        return True
    best_len = -1
    allowed = True
    for is_allow, pattern in group:
        if _pattern_rx(pattern).match(path):
            score = len(pattern)
            if score > best_len or (score == best_len and is_allow and not allowed):
                best_len = score
                allowed = is_allow
    return allowed


def sitemap_urls(xml_text: str) -> list[tuple[str, str | None]]:
    """[(loc, lastmod)] from a urlset or sitemapindex document,
    namespace-tolerant (matches on local names)."""
    root = ET.fromstring(xml_text)
    out: list[tuple[str, str | None]] = []
    for el in root.iter():
        if el.tag.rsplit("}", 1)[-1] in ("url", "sitemap"):
            loc = lastmod = None
            for child in el:
                name = child.tag.rsplit("}", 1)[-1]
                if name == "loc":
                    loc = (child.text or "").strip()
                elif name == "lastmod":
                    lastmod = (child.text or "").strip()
            if loc:
                out.append((loc, lastmod))
    return out


ROBOTS_SCHEMA = "domain string, path string, user_agent string, allowed int"


def robots_filter(
    pages: DataFrame, policies: DataFrame, user_agent: str = "memvidbot"
) -> DataFrame:
    """Evaluate (domain, path) pages against their domain's robots.txt
    (policies: (domain, robots string)); one compiled policy per domain
    per batch. Output: pages columns + allowed int."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            cache: dict[str, dict] = {}
            allowed = []
            for dom, path, robots in zip(
                pdf["domain"], pdf["path"], pdf["robots"]
            ):
                g = cache.get(dom)
                if g is None:
                    g = parse_robots(robots or "")
                    cache[dom] = g
                allowed.append(int(can_fetch(g, user_agent, path)))
            out = pdf[["domain", "path"]].copy()
            out["user_agent"] = user_agent
            out["allowed"] = allowed
            yield out

    joined = pages.join(policies, "domain", "left")
    return joined.mapInPandas(run, ROBOTS_SCHEMA)
