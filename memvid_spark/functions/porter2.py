"""Snowball English stemmer ("Porter2") in three parity tiers.

The reference indexes through Tantivy's English Snowball stemmer
(src/search/tantivy/schema.rs:7-14) and stems query terms identically
(src/memvid/search/tantivy.rs:38-46). functions/porter.py supplies the
classic Porter 1980 ancestor; THIS module implements the Snowball
English refinements the reference actually runs — exceptional forms
(skies→sky, dying→die, news→news), R1/R2 regions instead of the
measure, the y→Y consonant marking, li-/ogi- special rules, and the
short-syllable e-restoration — from the published algorithm
description.

Same architecture as porter.py (single source of truth, one emitter):

- :func:`stem_py` — driver-side Python (query terms);
- :func:`step_exprs` — dialect-parameterized SQL generator consumed by
  BOTH Spark (``F.expr``) and the DuckDB oracle — parity by
  construction.

Porter2 is actually LIGHTER in SQL than Porter1: R1/R2 are fixed
absolute offsets computed once (suffix-only edits never shift the
prefix), so rule conditions are integer comparisons plus local char
tests — no per-step consonant/vowel regexp passes.

Tokens here come from the [a-z0-9]+ tokenizer, so the apostrophe rules
(step 0, initial-') are implemented in the Python tier only and
omitted from the SQL tier where inputs cannot contain quotes.

Scale posture: identical to porter.py — stem the DISTINCT vocabulary
(dictionary pattern), broadcast-join back; the expression evaluates
O(|vocab|) times, never O(corpus tokens); everything JVM-side.
"""

from __future__ import annotations

VOWELS = "aeiouy"  # after marking, consonant-y is uppercase Y
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDINGS = "cdeghkmnrt"

# whole-word exceptional forms, applied before anything else
EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# invariant after step 1a
EXCEPTIONS2 = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}

# (suffix, replacement) — longest-match wins; conditions in the code
STEP2 = [
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"),
    ("tional", "tion"), ("biliti", "ble"), ("lessli", "less"),
    ("entli", "ent"), ("ation", "ate"), ("alism", "al"),
    ("aliti", "al"), ("ousli", "ous"), ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
]
STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", ""), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]
STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
]


# ---------------------------------------------------------------------------
# Python tier
# ---------------------------------------------------------------------------


def _mark(word: str) -> str:
    """Initial y, or y after a vowel, becomes consonant Y."""
    out = []
    for i, ch in enumerate(word):
        if ch == "y" and (i == 0 or out[i - 1] in VOWELS):
            out.append("Y")
        else:
            out.append(ch)
    return "".join(out)


def _regions(marked: str, original: str) -> tuple[int, int]:
    """(p1, p2): counts of chars before R1/R2 (len(w) → null region)."""
    n = len(marked)
    p1 = n
    for pre, k in (("gener", 5), ("commun", 6), ("arsen", 5)):
        if original.startswith(pre):
            p1 = min(k, n)
            break
    else:
        for i in range(1, n):
            if marked[i] not in VOWELS and marked[i - 1] in VOWELS:
                p1 = i + 1
                break
    p2 = n
    for i in range(p1 + 1, n):
        if marked[i] not in VOWELS and marked[i - 1] in VOWELS:
            p2 = i + 1
            break
    return p1, p2


def _ends_short_syllable(w: str) -> bool:
    if len(w) >= 3:
        a, b, c = w[-3], w[-2], w[-1]
        if b in VOWELS and c not in VOWELS and c not in "wxY" and a not in VOWELS:
            return True
    return len(w) == 2 and w[0] in VOWELS and w[1] not in VOWELS


def _contains_vowel(part: str) -> bool:
    return any(ch in VOWELS for ch in part)


def stem_py(word: str) -> str:
    """Snowball English stem of a lowercase token."""
    w = word.lstrip("'")
    if len(w) <= 2:
        return w
    if w in EXCEPTIONS1:
        return EXCEPTIONS1[w]
    w = _mark(w)
    p1, p2 = _regions(w, word)

    # step 0: 's'' / 's / '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if _contains_vowel(w[:-2]):
            w = w[:-1]
    if w in EXCEPTIONS2:
        return w
    # step 1b
    fired = False
    if w.endswith("eedly"):
        if len(w) - 5 >= p1:
            w = w[:-3]
    elif w.endswith("eed"):
        if len(w) - 3 >= p1:
            w = w[:-1]
    elif w.endswith(("ingly", "edly", "ing", "ed")):
        suf = next(
            s for s in ("ingly", "edly", "ing", "ed") if w.endswith(s)
        )
        if _contains_vowel(w[: -len(suf)]):
            w = w[: -len(suf)]
            fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif w.endswith(DOUBLES):
            w = w[:-1]
        elif p1 == len(w) and _ends_short_syllable(w):
            w += "e"
    # step 1c
    if (
        len(w) >= 3
        and w[-1] in ("y", "Y")
        and w[-2] not in VOWELS
    ):
        w = w[:-1] + "i"
    # step 2 (longest match; fire only if in R1)
    for suf, repl in STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                if suf == "ogi":
                    if w[-4:-3] == "l":
                        w = w[: -len(suf)] + repl
                elif suf == "li":
                    if w[-3:-2] in LI_ENDINGS:
                        w = w[: -len(suf)] + repl
                else:
                    w = w[: -len(suf)] + repl
            break
    # step 3
    for suf, repl in STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                if suf == "ative":
                    if len(w) - 5 >= p2:
                        w = w[:-5]
                else:
                    w = w[: -len(suf)] + repl
            break
    # step 4
    for suf in STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= p2:
                if suf == "ion":
                    if w[-4:-3] in ("s", "t"):
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break
    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= p2 or (
            len(w) - 1 >= p1 and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= p2:
        w = w[:-1]
    return w.replace("Y", "y")


# ---------------------------------------------------------------------------
# SQL tier (one emitter, two dialects)
# ---------------------------------------------------------------------------


_V = "('a','e','i','o','u','y')"


def _strip(x: str, n: int) -> str:
    return f"substr({x}, 1, length({x}) - {n})"


def _at_end(x: str, k: int, skip: int = 0) -> str:
    """Char k positions from the end (k=1 → last), after dropping
    ``skip`` trailing chars."""
    return f"substr({x}, length({x}) - {skip + k - 1}, 1)"


def _has_vowel(x: str, dialect: str) -> str:
    if dialect == "spark":
        return f"({x} rlike '[aeiouy]')"
    return f"regexp_matches({x}, '[aeiouy]')"


def _ends_short_sql(w: str, skip: int = 0) -> str:
    """ends-in-short-syllable test on w minus ``skip`` trailing chars."""
    ln = f"(length({w}) - {skip})" if skip else f"length({w})"
    c1, c2, c3 = (_at_end(w, k, skip) for k in (1, 2, 3))
    return (
        f"(({ln} >= 3 AND {c2} IN {_V} AND {c1} NOT IN {_V} AND "
        f"{c1} NOT IN ('w','x','Y') AND {c3} NOT IN {_V})"
        f" OR ({ln} = 2 AND substr({w}, 1, 1) IN {_V} AND "
        f"{c1} NOT IN {_V}))"
    )


def _rule_case_p2(
    x: str, rules, region_col: str, short: str, dialect: str
) -> str:
    """Longest-match CASE for steps 2-4: the longest matching suffix
    wins; its region/extra condition failing means NO change (Snowball
    among() semantics)."""
    branches = []
    for item in rules:
        suf, repl = item if isinstance(item, tuple) else (item, "")
        n = len(suf)
        in_region = f"length({x}) - {n} >= {region_col}"
        extra = ""
        if suf == "ogi":
            extra = f" AND {_at_end(x, 4)} = 'l'"
        elif suf == "li":
            extra = (
                f" AND {_at_end(x, 3)} IN "
                "('c','d','e','g','h','k','m','n','r','t')"
            )
        elif suf == "ion":
            extra = f" AND {_at_end(x, 4)} IN ('s','t')"
        elif suf == "ative":
            extra = f" AND length({x}) - 5 >= p_p2"
        then = f"{_strip(x, n)} || '{repl}'" if repl else _strip(x, n)
        branches.append(
            f"WHEN {x} LIKE '%{suf}' THEN "
            f"(CASE WHEN {in_region}{extra} THEN {then} ELSE {x} END)"
        )
    return (
        f"CASE WHEN {short} THEN {x} ELSE (CASE "
        + " ".join(branches)
        + f" ELSE {x} END) END"
    )


def step_exprs(col: str, dialect: str) -> list[tuple[str, str]]:
    """Emit [(column_name, sql_expr)]; chain with withColumn (Spark) or
    nested selects (DuckDB). Final column: ``p_out``."""
    assert dialect in ("spark", "duck")
    g = "" if dialect == "spark" else ", 'g'"
    br = "$1" if dialect == "spark" else "\\1"
    out: list[tuple[str, str]] = []
    short = f"length({col}) <= 2"

    # exceptional forms (checked on the raw token)
    exc = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in EXCEPTIONS1.items()
    )
    out.append(("p_exc1", f"CASE {col} {exc} ELSE NULL END"))

    # consonant-y marking, CV mask (for regions only), R1/R2 offsets
    out.append(("p_mk", (
        f"regexp_replace(regexp_replace({col}, '^y', 'Y'{g}), "
        f"'([aeiouy])y', '{br}Y'{g})"
    )))
    out.append(("p_cv", (
        f"regexp_replace(regexp_replace(p_mk, '[aeiouy]', 'V'{g}), "
        f"'[^V]', 'C'{g})"
    )))
    out.append(("p_p1", (
        f"CASE WHEN {col} LIKE 'gener%' THEN least(5, length({col}))"
        f" WHEN {col} LIKE 'commun%' THEN least(6, length({col}))"
        f" WHEN {col} LIKE 'arsen%' THEN least(5, length({col}))"
        f" WHEN instr(p_cv, 'VC') > 0 THEN instr(p_cv, 'VC') + 1"
        f" ELSE length(p_mk) END"
    )))
    out.append(("p_rel2", "instr(substr(p_cv, p_p1 + 1), 'VC')"))
    out.append(("p_p2", (
        "CASE WHEN p_rel2 > 0 THEN p_p1 + p_rel2 + 1"
        " ELSE length(p_mk) END"
    )))

    # step 1a (tokens are [a-z0-9]+ — no apostrophes, step 0 omitted)
    w = "p_mk"
    out.append(("p_1a", (
        f"CASE WHEN {short} THEN {w}"
        f" WHEN {w} LIKE '%sses' THEN {_strip(w, 2)}"
        f" WHEN {w} LIKE '%ied' OR {w} LIKE '%ies' THEN"
        f" (CASE WHEN length({w}) > 4 THEN {_strip(w, 2)}"
        f" ELSE {_strip(w, 1)} END)"
        f" WHEN {w} LIKE '%us' OR {w} LIKE '%ss' THEN {w}"
        f" WHEN {w} LIKE '%s' AND"
        f" {_has_vowel(f'substr({w}, 1, length({w}) - 2)', dialect)}"
        f" THEN {_strip(w, 1)}"
        f" ELSE {w} END"
    )))
    inv2 = ", ".join(f"'{x}'" for x in sorted(EXCEPTIONS2))
    out.append(("p_inv2", f"p_1a IN ({inv2})"))

    # step 1b: removal + fired flag + fixups
    w = "p_1a"

    def hasv(n: int) -> str:
        return _has_vowel(f"substr({w}, 1, length({w}) - {n})", dialect)

    in_r1 = lambda n: f"length({w}) - {n} >= p_p1"  # noqa: E731
    out.append(("p_1b0", (
        f"CASE WHEN {short} THEN {w}"
        f" WHEN {w} LIKE '%eedly' THEN (CASE WHEN {in_r1(5)}"
        f" THEN {_strip(w, 3)} ELSE {w} END)"
        f" WHEN {w} LIKE '%ingly' THEN (CASE WHEN {hasv(5)}"
        f" THEN {_strip(w, 5)} ELSE {w} END)"
        f" WHEN {w} LIKE '%edly' THEN (CASE WHEN {hasv(4)}"
        f" THEN {_strip(w, 4)} ELSE {w} END)"
        f" WHEN {w} LIKE '%eed' THEN (CASE WHEN {in_r1(3)}"
        f" THEN {_strip(w, 1)} ELSE {w} END)"
        f" WHEN {w} LIKE '%ing' THEN (CASE WHEN {hasv(3)}"
        f" THEN {_strip(w, 3)} ELSE {w} END)"
        f" WHEN {w} LIKE '%ed' THEN (CASE WHEN {hasv(2)}"
        f" THEN {_strip(w, 2)} ELSE {w} END)"
        f" ELSE {w} END"
    )))
    out.append(("p_1bf", (
        f"(NOT ({short})) AND {w} NOT LIKE '%eedly'"
        f" AND {w} NOT LIKE '%eed' AND ("
        f"({w} LIKE '%ingly' AND {hasv(5)})"
        f" OR ({w} NOT LIKE '%ingly' AND {w} LIKE '%edly' AND {hasv(4)})"
        f" OR ({w} NOT LIKE '%ingly' AND {w} NOT LIKE '%edly'"
        f" AND {w} LIKE '%ing' AND {hasv(3)})"
        f" OR ({w} NOT LIKE '%ingly' AND {w} NOT LIKE '%edly'"
        f" AND {w} NOT LIKE '%ing' AND {w} LIKE '%ed' AND {hasv(2)}))"
    )))
    w = "p_1b0"
    doubles = " OR ".join(f"{w} LIKE '%{d}'" for d in DOUBLES)
    out.append(("p_1b", (
        f"CASE WHEN NOT p_1bf THEN {w}"
        f" WHEN {w} LIKE '%at' OR {w} LIKE '%bl' OR {w} LIKE '%iz'"
        f" THEN {w} || 'e'"
        f" WHEN {doubles} THEN {_strip(w, 1)}"
        f" WHEN p_p1 = length({w}) AND {_ends_short_sql(w)}"
        f" THEN {w} || 'e'"
        f" ELSE {w} END"
    )))

    # step 1c
    w = "p_1b"
    out.append(("p_1c", (
        f"CASE WHEN {short} THEN {w}"
        f" WHEN ({w} LIKE '%y' OR {w} LIKE '%Y') AND length({w}) >= 3"
        f" AND {_at_end(w, 2)} NOT IN {_V}"
        f" THEN {_strip(w, 1)} || 'i' ELSE {w} END"
    )))

    # steps 2-4
    out.append(("p_2", _rule_case_p2("p_1c", STEP2, "p_p1", short, dialect)))
    out.append(("p_3", _rule_case_p2("p_2", STEP3, "p_p1", short, dialect)))
    out.append(("p_4", _rule_case_p2(
        "p_3", [(s, "") for s in STEP4], "p_p2", short, dialect
    )))

    # step 5
    w = "p_4"
    out.append(("p_5a", (
        f"CASE WHEN {short} THEN {w}"
        f" WHEN {w} LIKE '%e' AND (length({w}) - 1 >= p_p2"
        f" OR (length({w}) - 1 >= p_p1"
        f" AND NOT {_ends_short_sql(w, skip=1)}))"
        f" THEN {_strip(w, 1)} ELSE {w} END"
    )))
    w = "p_5a"
    out.append(("p_fin", (
        f"CASE WHEN {short} THEN {w}"
        f" WHEN {w} LIKE '%ll' AND length({w}) - 1 >= p_p2"
        f" THEN {_strip(w, 1)} ELSE {w} END"
    )))
    out.append(("p_out", (
        f"CASE WHEN {short} THEN {col}"
        f" WHEN p_exc1 IS NOT NULL THEN p_exc1"
        f" WHEN p_inv2 THEN p_1a"
        f" ELSE replace(p_fin, 'Y', 'y') END"
    )))
    return out


def duck_vocab_cte(token_expr: str, source_sql: str) -> str:
    """DuckDB CTE text computing (token, stem) over a vocabulary query:
    ``source_sql`` must yield DISTINCT lowercase tokens as ``token``."""
    cols = step_exprs("token", "duck")
    body = f"SELECT token FROM ({source_sql})"
    for name, expr in cols:
        body = f"SELECT *, {expr} AS {name} FROM ({body})"
    return f"SELECT token, p_out AS stem FROM ({body})"


def spark_stem_vocab(vocab, token_col: str = "token", materialize: bool = True):
    """(token, stem) over a distinct-token DataFrame — chained JVM-side
    expressions, no Python in the path. Broadcast-join back to the
    corpus (dictionary pattern); localCheckpoint cuts the lineage so the
    generated chain never re-enters downstream optimizer passes (the
    1 GiB driver-heap constraint — see porter.py)."""
    from pyspark.sql import functions as F

    df = vocab
    for name, expr in step_exprs(token_col, "spark"):
        df = df.withColumn(name, F.expr(expr))
    df = df.select(token_col, F.col("p_out").alias("stem"))
    return df.localCheckpoint(eager=True) if materialize else df
