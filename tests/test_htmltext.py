"""HTML extraction + boilerplate-line removal tests over hand-written
markup (malformed tags, nested skips, entities, void elements)."""

import pytest
from pyspark.sql import functions as F

from memvid_spark.operators.dedup import drop_boilerplate_lines
from memvid_spark.sources.htmltext import (
    html_extract,
    html_links,
    html_title,
    html_to_text,
)


def test_basic_structure():
    m = ("<html><head><title>T</title><style>.x{}</style></head><body>"
         "<h1>Head</h1><p>One <b>two</b> three.</p><div>Four</div>"
         "</body></html>")
    assert html_to_text(m) == "Head\nOne two three.\nFour"
    assert html_title(m) == "T"


def test_inline_tags_do_not_inject_spaces():
    assert html_to_text("<p>See <a href='/a'>link</a>.</p>") == "See link."
    assert html_to_text("<p>un<b>broken</b>word</p>") == "unbrokenword"


def test_skip_subtrees_whole():
    m = ("<body><script>if (a<b) { x('<p>no</p>'); }</script>"
         "<noscript><div>hidden <b>deep</b></div></noscript>"
         "<svg><text>vector label</text></svg><p>real</p></body>")
    t = html_to_text(m)
    assert t == "real"


def test_entities_and_charrefs():
    assert html_to_text("<p>a &amp; b &lt;c&gt; &#65;&nbsp;end</p>") == "a & b <c> A end"


def test_links_and_title_inside_head():
    m = ("<head><title>Deep  Title</title></head><body>"
         "<a href='/1'>x</a><a name='no-href'>y</a><a href='/2'>z</a></body>")
    assert html_title(m) == "Deep Title"
    assert html_links(m) == ["/1", "/2"]


def test_malformed_html_does_not_crash():
    # unclosed tags, stray brackets, bad nesting — parse must complete
    t = html_to_text("<p>a<div>b</p>c<<<>>><b>d")
    assert "a" in t and "d" in t


def test_html_extract_operator(spark):
    docs = spark.createDataFrame(
        [(1, "<html><head><title>X</title></head><body><p>Hi <a href='/y'>y</a></p></body></html>"),
         (2, None)],
        "doc_id long, markup string",
    )
    rows = {r["doc_id"]: r for r in html_extract(docs).collect()}
    assert rows[1]["title"] == "X" and rows[1]["text"] == "Hi y"
    assert rows[1]["n_links"] == 1 and rows[1]["links"] == ["/y"]
    assert rows[2]["text"] == "" and rows[2]["title"] is None


def test_drop_boilerplate_lines(spark):
    docs = spark.createDataFrame(
        [(i, f"unique {i}\nfooter line\nbody {i % 2}") for i in range(10)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           drop_boilerplate_lines(docs, min_df=6).collect()}
    # 'footer line' df=10 → dropped; 'body 0'/'body 1' df=5 → kept
    assert out[0]["text"] == "unique 0\nbody 0"
    assert out[1]["text"] == "unique 1\nbody 1"
    assert all(r["n_lines"] == 2 for r in out.values())
    # tighter threshold drops the body lines too
    out2 = {r["doc_id"]: r for r in
            drop_boilerplate_lines(docs, min_df=5).collect()}
    assert out2[3]["text"] == "unique 3"
    # order preservation with interleaved boilerplate
    docs2 = spark.createDataFrame(
        [(i, "common\nfirst {}\ncommon\nsecond {}".format(i, i))
         for i in range(4)],
        "doc_id long, text string",
    )
    out3 = {r["doc_id"]: r for r in
            drop_boilerplate_lines(docs2, min_df=3).collect()}
    assert out3[2]["text"] == "first 2\nsecond 2"
