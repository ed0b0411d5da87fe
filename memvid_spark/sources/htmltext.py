"""HTML → text extraction: the step between WARC ingestion
(sources/warc.py) and the text pipeline (quality gates, dedup, BPE) in
a web-scale training corpus.

Pure stdlib (html.parser.HTMLParser): script/style/template/noscript
subtrees dropped whole, block-level elements become line breaks, inline
markup dissolves, character/entity references decode, whitespace
normalizes per text run. Also extracted: <title> and outgoing hrefs
(the link graph feeds PageRank-style quality priors and crawl-frontier
dedup). This is the deterministic core of a trafilatura-style
extractor — boilerplate REMOVAL is corpus-statistical and lives in the
line-dedup operator, not here.

Scale: one document per row, parse per Arrow batch in mapInPandas,
columnar out; the parser is single-pass and allocation-light.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame

_SKIP = {"script", "style", "template", "noscript", "svg", "head"}
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
    "footer", "nav", "main", "aside", "blockquote", "pre", "hr",
    "figure", "figcaption", "form",
}


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.links: list[str] = []
        self.title_parts: list[str] = []
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
            return
        if tag == "title":
            self._in_title = True  # <title> lives inside skipped <head>
        if self._skip_depth:
            return  # tags inside skipped subtrees emit nothing
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
        if tag in _BLOCK:
            self.parts.append(None)  # block marker

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "title":
            self._in_title = False
        if self._skip_depth:
            return
        if tag in _BLOCK:
            self.parts.append(None)  # block marker

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _SKIP:  # void elements: don't unbalance skip depth
            self.handle_endtag(tag)

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
            return
        if self._skip_depth:
            return
        if data:
            # raw append — inline tags must not inject spaces
            # ("<a>link</a>." stays "link."); whitespace normalizes
            # per line in _lines()
            self.parts.append(data)

    def _lines(self) -> list[str]:
        lines: list[str] = []
        cur: list[str] = []
        for part in self.parts:
            if part is None:
                joined = " ".join("".join(cur).split())
                if joined:
                    lines.append(joined)
                cur = []
            else:
                cur.append(part)
        joined = " ".join("".join(cur).split())
        if joined:
            lines.append(joined)
        return lines


def html_to_text(markup: str) -> str:
    """Visible text: skip subtrees dropped, block tags → newlines,
    whitespace normalized per run, adjacent inline runs joined with a
    single space, blank-line runs collapsed."""
    ex = _Extractor()
    ex.feed(markup)
    ex.close()
    return "\n".join(ex._lines())


def html_title(markup: str) -> str | None:
    ex = _Extractor()
    ex.feed(markup)
    ex.close()
    t = " ".join(" ".join(ex.title_parts).split())
    return t or None


def html_links(markup: str) -> list[str]:
    ex = _Extractor()
    ex.feed(markup)
    ex.close()
    return ex.links


HTML_SCHEMA = (
    "doc_id long, title string, text string, n_chars int, n_links int, "
    "links array<string>"
)


def html_extract(docs: DataFrame, markup_col: str = "markup") -> DataFrame:
    """(doc_id, title, text, n_chars, n_links, links) per document —
    real parse per Arrow batch."""

    def run(batches):
        import pandas as pd

        cols = ["doc_id", "title", "text", "n_chars", "n_links", "links"]
        for pdf in batches:
            rows = []
            for did, markup in zip(pdf["doc_id"], pdf[markup_col]):
                ex = _Extractor()
                ex.feed(markup or "")
                ex.close()
                text = "\n".join(ex._lines())
                title = " ".join(" ".join(ex.title_parts).split()) or None
                rows.append(
                    (int(did), title, text, len(text), len(ex.links), ex.links)
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(run, HTML_SCHEMA)
