"""Text scalar functions — tokenizer, stopwords, quality metrics.

Reference semantics: memvid tokenizes by splitting on non-alphanumerics and
lowercasing (src/types/sketch_track.rs:650-666, src/lex.rs:156). The same
tokenizer MUST be used on both the index build path and the query path
(SURVEY §4 "stemming at index AND query time must agree") — so it lives
here, once, as a pure Column expression (JVM-side, whole-stage codegen;
no Python UDF in the hot path).

Every function here has an exact ANSI-SQL twin used by the DuckDB oracle
(see registry.py) — changes must keep the two in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Small fixed stopword list (reference keeps one in src/memvid/ask.rs:879-891;
# ours is trimmed to the synthetic corpus vocabulary).
STOPWORDS = ["the", "a", "and", "or", "of", "to", "in", "is", "it", "for"]


def tokens(col: Column | str) -> Column:
    """Lowercased alnum tokens; empty strings dropped.

    Twin SQL: list_filter(string_split_regex(lower(x),'[^a-z0-9]+'), t -> t<>'')
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def stopword_count(col: Column | str) -> Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(col), lambda x: F.array_contains(stop, x)))


def punct_ratio(col: Column | str) -> Column:
    """Share of characters that are not [a-zA-Z0-9 ].

    Twin SQL: length(regexp_replace(x,'[a-zA-Z0-9 ]','','g')) / nullif(length(x),0)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, "[a-zA-Z0-9 ]", "")) / F.nullif(
        F.length(c), F.lit(0)
    )


def avg_token_len(col: Column | str) -> Column:
    """Mean token length (NULL for token-free text).

    Twin SQL uses the same two aggregates: sum(len)/nullif(count,0).
    """
    t = tokens(col)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return total / F.nullif(F.size(t), F.lit(0)).cast("double")


def quality_score(col: Column | str) -> Column:
    """Deterministic doc-quality heuristic in [0,1]:

    0.5 * clamp(token_count/100) + 0.3 * (1 - stopword_ratio) + 0.2 * (1 - punct_ratio)

    Mirrors the reference's ingest-side quality gates (skip empty/huge
    payloads, src/memvid/search/api.rs:938-1034) generalized into a score.
    """
    tc = token_count(col).cast("double")
    stop_ratio = stopword_count(col) / F.nullif(tc, F.lit(0.0))
    pr = punct_ratio(col)
    return F.round(
        F.least(tc / F.lit(100.0), F.lit(1.0)) * 0.5
        + (F.lit(1.0) - F.coalesce(stop_ratio, F.lit(0.0))) * 0.3
        + (F.lit(1.0) - F.coalesce(pr, F.lit(0.0))) * 0.2,
        6,
    )


def lang_guess(col: Column | str) -> Column:
    """N-gram-free language heuristic: English stopword density.

    A real deployment plugs a fastText/CLD model in via pandas UDF; the
    correctness-tier heuristic is deterministic and SQL-expressible.
    """
    tc = token_count(col).cast("double")
    ratio = stopword_count(col) / F.nullif(tc, F.lit(0.0))
    return F.when(F.coalesce(ratio, F.lit(0.0)) >= 0.05, F.lit("en")).otherwise(
        F.lit("other")
    )


# --- SQL twins (kept adjacent so drift is visible in review) -----------------

SQL_TOKENS = "list_filter(string_split_regex(lower({x}),'[^a-z0-9]+'), t -> t<>'')"
SQL_STOPWORDS_LIST = "[" + ",".join(f"'{s}'" for s in STOPWORDS) + "]"
