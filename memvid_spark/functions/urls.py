"""URL normalization & decomposition — pure JVM-side column algebra.

The dedup/grouping keys of a web-scale corpus (after WARC ingestion,
sources/warc.py): canonicalize scheme/host case, strip default ports
and fragments, default the empty path to '/', split out the
registrable-ish domain and path. Everything is regexp_extract /
string builtins — whole-stage codegen, no Python in the hot path, so
these run at scan speed over billions of URLs.

Scope note: full RFC 3986 canonicalization (percent-encoding case,
dot-segment removal) and the public-suffix list are deliberately out —
they need lookup tables a deployment injects; the operators here are
the deterministic, list-free core. Query strings pass through
untouched (reordering parameters changes semantics on many sites).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def url_scheme(url) -> Column:
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))


def url_host(url) -> Column:
    return F.lower(F.regexp_extract(url, r"^[^:]+://([^/?#:]+)", 1))


def url_port(url) -> Column:
    return F.regexp_extract(url, r"^[^:]+://[^/?#:]+:(\d+)", 1)


def url_path(url) -> Column:
    p = F.regexp_extract(url, r"^[^:]+://[^/?#]+([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query(url) -> Column:
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def url_domain(url) -> Column:
    """Host with a leading www. stripped — the grouping key for
    per-site statistics (swap in a public-suffix table for eTLD+1)."""
    return F.regexp_replace(url_host(url), r"^www\.", "")


def url_normalize(url) -> Column:
    """Canonical form: lowercase scheme+host, default ports (80/http,
    443/https) stripped, fragment dropped, empty path → '/', query kept
    verbatim."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    q = url_query(url)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        url_path(url),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
