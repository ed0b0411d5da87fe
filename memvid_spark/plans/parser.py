"""memvid query-language parser → Catalyst Column predicates.

Reimplements the reference grammar (src/search/parser.rs:8-76):

    query    := or_expr
    or_expr  := and_expr (OR and_expr)*
    and_expr := not_expr ((AND)? not_expr)*      -- implicit AND (":286-299")
    not_expr := NOT not_expr | primary
    primary  := '(' or_expr ')' | term
    term     := field ':' value | field ':' '[' v TO v ']' | phrase | wildcard | word

Terms compile straight to Column predicates, so Catalyst gets one boolean
tree it can simplify, reorder, and push to the parquet scan — the
reference's post-retrieval AST re-evaluation pass
(src/memvid/search/tantivy.rs:162-182) is unnecessary here because the
filter IS the query (SURVEY §2.2).

Word-cleaning parity with TextTerm::from_word (parser.rs:401-422):
lowercase; a trailing '?' is punctuation (stripped), embedded '?' / '*'
make a wildcard.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, functions as F

from ..functions.text import tokens


# --- AST ---------------------------------------------------------------------


@dataclass
class Word:
    text: str


@dataclass
class Phrase:
    text: str


@dataclass
class Wildcard:
    pattern: str  # with * and ?


@dataclass
class Field:
    name: str
    value: str


@dataclass
class DateRange:
    field: str
    lo: str | None  # ISO prefix or None for open bound
    hi: str | None


@dataclass
class Not:
    child: object


@dataclass
class And:
    children: list = dc_field(default_factory=list)


@dataclass
class Or:
    children: list = dc_field(default_factory=list)


# --- Lexer -------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
      (?P<lparen>\() |
      (?P<rparen>\)) |
      (?P<phrase>"(?P<phrase_body>[^"]*)") |
      (?P<range>(?P<rfield>[A-Za-z_][\w.]*):\[(?P<lo>[^\s\]]+)\s+TO\s+(?P<hi>[^\s\]]+)\]) |
      (?P<field>(?P<fname>[A-Za-z_][\w.]*):(?P<fvalue>[^\s()]+)) |
      (?P<word>[^\s()]+)
    )
    """,
    re.VERBOSE,
)


def _lex(q: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        if m.group("lparen"):
            out.append(("(", None))
        elif m.group("rparen"):
            out.append((")", None))
        elif m.group("phrase") is not None:
            out.append(("phrase", m.group("phrase_body")))
        elif m.group("range") is not None:
            out.append(("range", (m.group("rfield"), m.group("lo"), m.group("hi"))))
        elif m.group("field") is not None:
            out.append(("field", (m.group("fname"), m.group("fvalue"))))
        else:
            w = m.group("word")
            if w.upper() in ("AND", "OR", "NOT"):
                out.append((w.upper(), None))
            else:
                out.append(("word", w))
    return out


# --- Parser ------------------------------------------------------------------


class QueryParseError(ValueError):
    pass


KNOWN_FIELDS = {"uri", "scope", "track", "tag", "label", "date", "source", "lang"}


class _Parser:
    def __init__(self, toks: list[tuple[str, object]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.i < len(self.toks):
            raise QueryParseError(f"trailing tokens at {self.i}: {self.toks[self.i:]}")
        return node

    def or_expr(self):
        children = [self.and_expr()]
        while self.peek()[0] == "OR":
            self.next()
            children.append(self.and_expr())
        return children[0] if len(children) == 1 else Or(children)

    def and_expr(self):
        children = [self.not_expr()]
        while True:
            kind, _ = self.peek()
            if kind == "AND":
                self.next()
                children.append(self.not_expr())
            elif kind in ("word", "phrase", "field", "range", "(", "NOT"):
                # implicit AND between adjacent terms (parser.rs:286-299)
                children.append(self.not_expr())
            else:
                break
        if len(children) == 1:
            return children[0]
        # flatten nested ANDs (parser.rs:272-299)
        flat: list = []
        for c in children:
            flat.extend(c.children if isinstance(c, And) else [c])
        return And(flat)

    def not_expr(self):
        if self.peek()[0] == "NOT":
            self.next()
            return Not(self.not_expr())
        return self.primary()

    def primary(self):
        kind, val = self.next()
        if kind == "(":
            node = self.or_expr()
            if self.next()[0] != ")":
                raise QueryParseError("expected ')'")
            return node
        if kind == "phrase":
            return Phrase(val.lower())
        if kind == "range":
            f, lo, hi = val
            return DateRange(f.lower(), None if lo == "*" else lo, None if hi == "*" else hi)
        if kind == "field":
            name, value = val
            if name.lower() in KNOWN_FIELDS:
                return Field(name.lower(), value)
            # unknown field prefix → treated as a literal word (whitelist
            # semantics, parser.rs:425-438)
            return _clean_word(f"{name}:{value}")
        if kind == "word":
            return _clean_word(val)
        raise QueryParseError(f"unexpected token {kind}")


def _clean_word(w: str):
    w = w.lower()
    if w.endswith("?"):  # trailing ? is punctuation (parser.rs:401-422)
        w = w[:-1]
    if "*" in w or "?" in w:
        return Wildcard(w)
    w = re.sub(r"[^a-z0-9]+", "", w)
    if not w:
        raise QueryParseError("empty term")
    return Word(w)


def parse_query(q: str):
    """Parse to AST. Raises QueryParseError on empty/invalid input
    (empty queries rejected, search/mod.rs:72-76)."""
    toks = _lex(q)
    if not toks:
        raise QueryParseError("empty query")
    return _Parser(toks).parse()


# --- Compile to Column -------------------------------------------------------

DEFAULT_FIELD_COLS = {"uri": "source", "source": "source", "lang": "lang", "track": "lang"}


def compile_predicate(
    node,
    text_col: str = "text",
    field_cols: dict[str, str] | None = None,
    date_col: str | None = None,
) -> Column:
    """Compile an AST into one boolean Column over a document DataFrame.

    - Word → token-set membership (tokenizer parity with the index side)
    - Phrase → lowercase substring
    - Wildcard → any token matches the anchored regex
    - Field → equality on the mapped column; ``scope:`` → prefix
    - DateRange → bounds on ``date_col`` (granularity Y / Y-M / Y-M-D,
      parser.rs:440-496)
    """
    fc = {**DEFAULT_FIELD_COLS, **(field_cols or {})}
    toks = tokens(text_col)

    def go(n) -> Column:
        if isinstance(n, Word):
            return F.array_contains(toks, n.text)
        if isinstance(n, Phrase):
            return F.lower(F.col(text_col)).contains(n.text)
        if isinstance(n, Wildcard):
            regex = "^" + re.escape(n.pattern).replace("\\*", ".*").replace("\\?", ".") + "$"
            return F.exists(toks, lambda x: x.rlike(regex))
        if isinstance(n, Field):
            if n.name == "scope":
                return F.col(fc.get("uri", "source")).startswith(n.value)
            if n.name in ("tag", "label"):
                col = fc.get(n.name)
                if col is None:
                    raise QueryParseError(f"no column mapped for field {n.name!r}")
                return F.array_contains(F.col(col), n.value)
            col = fc.get(n.name)
            if col is None:
                raise QueryParseError(f"no column mapped for field {n.name!r}")
            return F.col(col) == n.value
        if isinstance(n, DateRange):
            if date_col is None:
                raise QueryParseError("date range used but no date_col configured")
            conds = []
            if n.lo is not None:
                conds.append(F.col(date_col) >= F.lit(_date_lo(n.lo)))
            if n.hi is not None:
                conds.append(F.col(date_col) < F.lit(_date_hi(n.hi)))
            if not conds:
                return F.lit(True)
            out = conds[0]
            for c in conds[1:]:
                out = out & c
            return out
        if isinstance(n, Not):
            return ~go(n.child)
        if isinstance(n, And):
            out = go(n.children[0])
            for c in n.children[1:]:
                out = out & go(c)
            return out
        if isinstance(n, Or):
            out = go(n.children[0])
            for c in n.children[1:]:
                out = out | go(c)
            return out
        raise QueryParseError(f"unknown node {n!r}")

    return go(node)


def _expand(prefix: str, lo: bool) -> str:
    """Y / Y-M / Y-M-D granularity → inclusive-lo / exclusive-hi ISO date."""
    parts = prefix.split("-")
    if len(parts) == 1:
        y = int(parts[0])
        return f"{y:04d}-01-01" if lo else f"{y + 1:04d}-01-01"
    if len(parts) == 2:
        y, m = int(parts[0]), int(parts[1])
        if lo:
            return f"{y:04d}-{m:02d}-01"
        m += 1
        if m == 13:
            y, m = y + 1, 1
        return f"{y:04d}-{m:02d}-01"
    y, m, d = int(parts[0]), int(parts[1]), int(parts[2])
    if lo:
        return f"{y:04d}-{m:02d}-{d:02d}"
    from datetime import date, timedelta

    nxt = date(y, m, d) + timedelta(days=1)
    return nxt.isoformat()


def _date_lo(p: str) -> str:
    return _expand(p, lo=True)


def _date_hi(p: str) -> str:
    return _expand(p, lo=False)


def search_filter(
    docs,
    query: str,
    text_col: str = "text",
    field_cols: dict[str, str] | None = None,
    date_col: str | None = None,
):
    """Parse + compile + filter in one step — the engine's query front door."""
    ast = parse_query(query)
    return docs.filter(compile_predicate(ast, text_col, field_cols, date_col))
