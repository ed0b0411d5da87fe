"""WARC parser + URL normalization tests: hand-written archive bytes
(not the repo writer's layout quirks), multi-member gzip, framing
errors, and the URL column algebra over adversarial inputs."""

import gzip

import pytest
from pyspark.sql import functions as F

from memvid_spark.functions.urls import (
    url_domain,
    url_host,
    url_normalize,
    url_path,
    url_query,
)
from memvid_spark.sources.warc import (
    gunzip_members,
    warc_parse,
    warc_records,
    warc_write,
)

# hand-written WARC (CRLF framing straight from ISO 28500 examples;
# header case varied — field names are case-insensitive)
HAND_WARC = (
    b"WARC/1.1\r\n"
    b"WARC-Type: warcinfo\r\n"
    b"Content-Length: 18\r\n"
    b"\r\n"
    b"software: example\n"
    b"\r\n\r\n"
    b"WARC/1.0\r\n"
    b"warc-type: response\r\n"
    b"WARC-TARGET-URI: http://x.test/a\r\n"
    b"WARC-Date: 2023-05-06T07:08:09Z\r\n"
    b"content-length: 86\r\n"
    b"\r\n"
    b"HTTP/1.1 301 Moved Permanently\r\n"
    b"Content-Type: text/html; charset=UTF-8\r\n"
    b"\r\n"
    b"<a>moved</a>"
    b"\r\n\r\n"
)


def test_hand_written_warc():
    recs = warc_parse(HAND_WARC)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    r = recs[1]
    assert r["uri"] == "http://x.test/a"
    assert r["date"] == "2023-05-06T07:08:09Z"
    assert r["http_status"] == 301
    assert r["mime"] == "text/html"  # charset parameter stripped
    assert r["body"] == b"<a>moved</a>"


def test_gzip_member_walk():
    # two members, each one record — the Common Crawl layout
    payload = gzip.compress(HAND_WARC[: HAND_WARC.find(b"\r\n\r\nWARC/1.0") + 4])
    second = HAND_WARC[HAND_WARC.find(b"WARC/1.0") :]
    payload += gzip.compress(second)
    assert gunzip_members(payload) != payload
    recs = warc_parse(payload)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    with pytest.raises(ValueError, match="gzip"):
        gunzip_members(payload[:-5])


def test_framing_errors():
    with pytest.raises(ValueError, match="version"):
        warc_parse(b"NOT-WARC\r\n\r\n")
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        warc_parse(bad)
    trunc = b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 99\r\n\r\nshort"
    with pytest.raises(ValueError, match="truncated"):
        warc_parse(trunc)


def test_warc_records_operator(spark):
    recs = [
        {"warc_type": "warcinfo", "block": b"k: v\r\n"},
        {"warc_type": "response", "uri": "http://t.test/1",
         "date": "2024-02-03T04:05:06Z", "http_status": 200,
         "mime": "text/plain", "body": "café body".encode()},
    ]
    archives = spark.createDataFrame(
        [(9, bytearray(warc_write(recs, gzip_members=True)))],
        "archive_id long, payload binary",
    )
    rows = warc_records(archives).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["archive_id"], r["rec_index"], r["http_status"]) == (9, 0, 200)
    assert r["body"] == "café body" and r["body_len"] == len("café body".encode())


URL_CASES = [
    # (input, norm, domain, path, query)
    ("HTTP://WWW.Ex.COM:80/A/B?x=1#f", "http://www.ex.com/A/B?x=1",
     "ex.com", "/A/B", "x=1"),
    ("https://Ex.com:443", "https://ex.com/", "ex.com", "/", ""),
    ("https://ex.com:8443/p", "https://ex.com:8443/p", "ex.com", "/p", ""),
    ("http://ex.com/#only-frag", "http://ex.com/", "ex.com", "/", ""),
    ("ftp://Files.Ex.com/pub", "ftp://files.ex.com/pub",
     "files.ex.com", "/pub", ""),
    ("http://ex.com/a?b=2&a=1", "http://ex.com/a?b=2&a=1",
     "ex.com", "/a", "b=2&a=1"),  # query order preserved
]


def test_url_normalize_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, *_ ) in enumerate(URL_CASES)], "i long, url string"
    )
    out = (
        df.select(
            "i",
            url_normalize(F.col("url")).alias("n"),
            url_domain(F.col("url")).alias("d"),
            url_path(F.col("url")).alias("p"),
            url_query(F.col("url")).alias("q"),
            url_host(F.col("url")).alias("h"),
        )
        .orderBy("i")
        .collect()
    )
    for row, (u, n, d, p, q) in zip(out, URL_CASES):
        assert row["n"] == n, (u, row["n"])
        assert row["d"] == d and row["p"] == p and row["q"] == q


def test_facade_put_warc_and_gzip_transparency(spark):
    import gzip

    from memvid_spark.api import MemvidSpark

    recs = [
        {"warc_type": "response", "uri": "http://w.test/page1",
         "date": "2024-01-01T00:00:00Z", "http_status": 200,
         "mime": "text/html",
         "body": b"<html><body><h1>Title One</h1><p>body one text</p></body></html>"},
        {"warc_type": "request", "uri": "http://w.test/page1",
         "block": b"GET / HTTP/1.1\r\n"},
        {"warc_type": "response", "uri": "http://w.test/page2",
         "date": "2024-01-01T00:00:01Z", "http_status": 200,
         "mime": "text/plain", "body": b"plain body two"},
    ]
    mv = MemvidSpark(spark)
    ids = mv.put_warc(warc_write(recs, gzip_members=True))
    assert len(ids) == 2 and all(i is not None for i in ids)
    docs = {r["source"]: r["text"] for r in mv.docs().collect()}
    assert docs["http://w.test/page1"] == "Title One\nbody one text"
    assert docs["http://w.test/page2"] == "plain body two"

    # gzip-wrapped single document: put_bytes decompresses + re-sniffs
    gz = gzip.compress("gzipped markdown body".encode())
    did = mv.put_bytes(gz, uri="mv2://d/x.md.gz")
    assert did is not None
    texts = {r["doc_id"]: r["text"] for r in mv.docs().collect()}
    assert texts[did] == "gzipped markdown body"
