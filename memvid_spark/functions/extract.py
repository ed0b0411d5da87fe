"""Ingest-side enrichment scalar functions: auto-tagging, date
extraction, PII masking, URI helpers.

Reference lineage:
- auto_tag / extract_dates PutOptions (src/analysis/auto_tag.rs, test
  src/lib.rs:873-894)
- PII masking: regex detect/mask emails, phones, SSNs at query time
  (src/pii.rs:30-71)
- infer_title_from_uri (src/lib.rs:485-537), default_uri
  `mv2://frames/{id}` (src/lib.rs:481-483)

All pure Column expressions (regexp_* / initcap / concat) — JVM-side,
SQL-twin-able.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# rule -> tag: presence of any keyword assigns the tag (auto_tag.rs is a
# 436-LoC rule catalog; the mechanism is keyword→tag rules)
AUTO_TAG_RULES: list[tuple[str, list[str]]] = [
    ("storage", ["table", "row", "column"]),
    ("exec", ["scan", "join", "merge", "sort", "hash"]),
    ("perf", ["fast", "slow", "big", "small"]),
    ("vector", ["vector"]),
    ("streaming", ["stream", "batch", "window"]),
]

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
ISO_DATE_RE = r"[0-9]{4}-[0-9]{2}-[0-9]{2}"


def auto_tags(text_col: Column | str) -> Column:
    """Array of rule tags whose keyword list intersects the token set.

    Twin SQL built by sql_auto_tags() below.
    """
    from .text import tokens

    toks = tokens(text_col)
    parts = [
        F.when(
            F.arrays_overlap(toks, F.array(*[F.lit(k) for k in kws])), F.lit(tag)
        )
        for tag, kws in AUTO_TAG_RULES
    ]
    return F.array_compact(F.array(*parts))


def sql_auto_tags(x: str) -> str:
    from .text import SQL_TOKENS

    toks = SQL_TOKENS.format(x=x)
    parts = ", ".join(
        f"CASE WHEN len(list_intersect({toks}, "
        f"[{','.join(repr(k) for k in kws)}])) > 0 THEN '{tag}' END"
        for tag, kws in AUTO_TAG_RULES
    )
    return f"list_filter([{parts}], t -> t IS NOT NULL)"


def extract_dates(text_col: Column | str) -> Column:
    """All ISO dates mentioned in the text (content_dates analogue)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(c, F.lit(ISO_DATE_RE), 0)


def mask_pii(text_col: Column | str) -> Column:
    """Mask emails, SSNs, then phones (src/pii.rs:30-71 order: most
    specific first — SSN before phone since both are digit-dash shapes)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    masked = F.regexp_replace(c, EMAIL_RE, "[EMAIL]")
    masked = F.regexp_replace(masked, SSN_RE, "[SSN]")
    return F.regexp_replace(masked, PHONE_RE, "[PHONE]")


def sql_mask_pii(x: str) -> str:
    return (
        f"regexp_replace(regexp_replace(regexp_replace({x}, "
        f"'{EMAIL_RE}', '[EMAIL]', 'g'), "
        f"'{SSN_RE}', '[SSN]', 'g'), "
        f"'{PHONE_RE}', '[PHONE]', 'g')"
    )


def default_uri(id_col: Column | str) -> Column:
    """`mv2://frames/{id}` (src/lib.rs:481-483)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.concat(F.lit("mv2://frames/"), c.cast("string"))


def infer_title_from_uri(uri_col: Column | str) -> Column:
    """Last path segment, extension stripped, separators → spaces,
    Title Case (src/lib.rs:485-537)."""
    c = F.col(uri_col) if isinstance(uri_col, str) else uri_col
    base = F.element_at(F.split(c, "/"), -1)
    noext = F.regexp_replace(base, r"\.[A-Za-z0-9]+$", "")
    words = F.regexp_replace(noext, r"[-_]+", " ")
    return F.initcap(words)
