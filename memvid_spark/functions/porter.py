"""Full Porter stemmer (Porter 1980) in three parity tiers.

The reference indexes through Tantivy's English Snowball stemmer
(src/search/tantivy/schema.rs:7-14) and stems query terms the same way
(src/memvid/search/tantivy.rs:38-46). This module supplies the classic
Porter algorithm — the published ancestor of that stemmer — as:

- :func:`stem_py` — driver-side Python (query terms);
- :func:`step_exprs` — a dialect-parameterized SQL generator emitting
  one chained column expression per algorithm step, consumed by BOTH
  the Spark side (``F.expr`` on ``dialect='spark'``) and the DuckDB
  oracle (``dialect='duck'``) — parity by construction, the same
  emitter writes both sides.

Scale posture: the SQL tiers are meant to run over the DISTINCT token
vocabulary (dictionary pattern — stem once per vocab entry, broadcast
join back to the corpus), so the sizeable generated expression is
evaluated O(|vocab|) times, never O(corpus tokens). Everything stays
JVM-side on Spark; no Python in the executor path.

Algorithm data is the single source of truth: the per-step suffix rule
tables below drive all tiers. Longest-suffix-match-wins within a step;
if the longest match's condition fails, no rule in that step applies
(Porter's "only one rule from each step").
"""

from __future__ import annotations

# (suffix, replacement, condition) — condition: None, 'm>0', 'm>1'.
STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]

VOWELS = "aeiou"


# ---------------------------------------------------------------------------
# Python tier
# ---------------------------------------------------------------------------


def _cv(word: str) -> str:
    """Consonant/vowel form: vowels → v, y-after-consonant → v, rest → c."""
    out = []
    for i, ch in enumerate(word):
        if ch in VOWELS:
            out.append("v")
        elif ch == "y" and i > 0 and out[-1] != "v":
            out.append("v")
        else:
            out.append("c")
    return "".join(out)


def _m(stem: str) -> int:
    """Porter measure: number of VC sequences."""
    return _cv(stem).count("vc")


def _has_vowel(stem: str) -> bool:
    return "v" in _cv(stem)


def _doublec(word: str) -> bool:
    return len(word) >= 2 and word[-1] == word[-2] and _cv(word)[-1] == "c"


def _cvc(word: str) -> bool:
    if len(word) < 3 or word[-1] in "wxy":
        return False
    return _cv(word)[-3:] == "cvc"


def stem_py(word: str) -> str:
    """Full Porter stem of a lowercase token."""
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    fixup = False
    if w.endswith("eed"):
        if _m(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        fixup = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        fixup = True
    if fixup:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _doublec(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _m(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # steps 2-3: longest suffix match; condition m(stem) > 0
    for table in (STEP2, STEP3):
        for suf, repl in sorted(table, key=lambda r: -len(r[0])):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if _m(stem) > 0:
                    w = stem + repl
                break
    # step 4: longest suffix match; m(stem) > 1; 'ion' needs stem ending s/t
    for suf in sorted(STEP4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _m(stem) > 1 and (suf != "ion" or stem.endswith(("s", "t"))):
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _m(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _m(w) > 1 and _doublec(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# SQL tier (one emitter, two dialects)
# ---------------------------------------------------------------------------


def _sql_cv(x: str, dialect: str) -> str:
    """CV-form of expression x — three regexp passes: vowels→v,
    y-after-non-v→v (left-to-right global handles yy chains), rest→c."""
    br = "$1" if dialect == "spark" else "\\1"
    g = "" if dialect == "spark" else ", 'g'"
    # markers are uppercase V/C so they cannot collide with the (lowercase)
    # letters of the token itself — 'revival' must not read its own 'v's
    s1 = f"regexp_replace({x}, '[aeiou]', 'V'{g})"
    s2 = f"regexp_replace({s1}, '([^V])y', '{br}V'{g})"
    return f"regexp_replace({s2}, '[^V]', 'C'{g})"


def _sql_m(x: str, dialect: str) -> str:
    cv = _sql_cv(x, dialect)
    return f"((length({cv}) - length(replace({cv}, 'VC', ''))) / 2)"


def _sql_has_vowel(x: str, dialect: str) -> str:
    return f"({_sql_cv(x, dialect)} LIKE '%V%')"


def _sql_doublec(x: str, dialect: str) -> str:
    return (
        f"(length({x}) >= 2 AND substr({x}, length({x}), 1) = "
        f"substr({x}, length({x}) - 1, 1) AND "
        f"right({_sql_cv(x, dialect)}, 1) = 'C')"
    )


def _sql_cvc(x: str, dialect: str) -> str:
    return (
        f"(length({x}) >= 3 AND right({x}, 1) NOT IN ('w','x','y') AND "
        f"right({_sql_cv(x, dialect)}, 3) = 'CVC')"
    )


def _strip(x: str, n: int) -> str:
    return f"substr({x}, 1, length({x}) - {n})"


def _m_of(cvx: str, extra_strip: int = 0) -> str:
    """Measure from a precomputed CV column, optionally on the stem with
    ``extra_strip`` suffix chars removed. The CV form is prefix-stable
    (vowel-ness of position i depends only on chars <= i), so
    cv(w[:k]) == cv(w)[:k] — one regexp pass per step serves every rule."""
    x = cvx if extra_strip == 0 else _strip(cvx, extra_strip)
    return f"((length({x}) - length(replace({x}, 'VC', ''))) / 2)"


def _hv_of(cvx: str, extra_strip: int = 0) -> str:
    x = cvx if extra_strip == 0 else _strip(cvx, extra_strip)
    return f"({x} LIKE '%V%')"


def _doublec_of(w: str, cvx: str) -> str:
    return (
        f"(length({w}) >= 2 AND substr({w}, length({w}), 1) = "
        f"substr({w}, length({w}) - 1, 1) AND right({cvx}, 1) = 'C')"
    )


def _cvc_of(w: str, cvx: str, extra_strip: int = 0) -> str:
    n = extra_strip
    last = f"substr({w}, length({w}) - {n}, 1)" if n else f"right({w}, 1)"
    cv3 = (
        f"right({_strip(cvx, n)}, 3)" if n else f"right({cvx}, 3)"
    )
    return (
        f"(length({w}) >= {3 + n} AND {last} NOT IN ('w','x','y') AND "
        f"{cv3} = 'CVC')"
    )


def _rule_case(x: str, cvx: str, rules, min_m: int, short: str) -> str:
    """Longest-match CASE: first (longest) matching suffix wins; its
    measure condition failing means no change. 'ion' additionally needs
    the stem to end s/t (step 4)."""
    branches = []
    for suf, repl in sorted(rules, key=lambda r: -len(r[0])):
        n = len(suf)
        stem = _strip(x, n)
        ok = f"length({x}) > {n} AND {_m_of(cvx, n)} > {min_m}"
        if suf == "ion":
            ok += f" AND substr({x}, length({x}) - {n}, 1) IN ('s','t')"
        then = f"{stem} || '{repl}'" if repl else stem
        branches.append(
            f"WHEN {x} LIKE '%{suf}' THEN "
            f"(CASE WHEN {ok} THEN {then} ELSE {x} END)"
        )
    return (
        f"CASE WHEN {short} THEN {x} ELSE (CASE "
        + " ".join(branches)
        + f" ELSE {x} END) END"
    )


def step_exprs(col: str, dialect: str) -> list[tuple[str, str]]:
    """Emit [(column_name, sql_expr)] — each expr references previously
    emitted columns; chain with withColumn (Spark) or nested selects
    (DuckDB). Heavy regexp work appears ONCE per step as a cv_* helper
    column; every rule condition is a cheap substring on it. The final
    column is ``p_out``."""
    assert dialect in ("spark", "duck")
    out: list[tuple[str, str]] = []
    # guard: tokens of length <= 2 pass through every step untouched
    short = f"length({col}) <= 2"

    # step 1a
    w = col
    out.append(("p_1a", (
        f"CASE WHEN {short} THEN {w}"
        f" WHEN {w} LIKE '%sses' THEN {_strip(w, 2)}"
        f" WHEN {w} LIKE '%ies' THEN {_strip(w, 2)}"
        f" WHEN {w} LIKE '%ss' THEN {w}"
        f" WHEN {w} LIKE '%s' THEN {_strip(w, 1)}"
        f" ELSE {w} END"
    )))
    out.append(("cv_1a", _sql_cv("p_1a", dialect)))

    # step 1b base + fired flag (ed/ing removal; eed handled inline)
    w, cv = "p_1a", "cv_1a"
    out.append(("p_1b0", (
        f"CASE WHEN {short} THEN {w}"
        f" WHEN {w} LIKE '%eed' THEN "
        f"(CASE WHEN {_m_of(cv, 3)} > 0 THEN {_strip(w, 1)} ELSE {w} END)"
        f" WHEN {w} LIKE '%ed' AND {_hv_of(cv, 2)} THEN {_strip(w, 2)}"
        f" WHEN {w} LIKE '%ing' AND {_hv_of(cv, 3)} THEN {_strip(w, 3)}"
        f" ELSE {w} END"
    )))
    out.append(("p_1bf", (
        f"(NOT ({short})) AND (({w} NOT LIKE '%eed' AND {w} LIKE '%ed'"
        f" AND {_hv_of(cv, 2)})"
        f" OR ({w} NOT LIKE '%eed' AND NOT ({w} LIKE '%ed'"
        f" AND {_hv_of(cv, 2)}) AND {w} LIKE '%ing'"
        f" AND {_hv_of(cv, 3)}))"
    )))
    out.append(("cv_1b0", _sql_cv("p_1b0", dialect)))
    w, cv = "p_1b0", "cv_1b0"
    out.append(("p_1b", (
        f"CASE WHEN NOT p_1bf THEN {w}"
        f" WHEN {w} LIKE '%at' OR {w} LIKE '%bl' OR {w} LIKE '%iz'"
        f" THEN {w} || 'e'"
        f" WHEN {_doublec_of(w, cv)} AND right({w}, 1) NOT IN ('l','s','z')"
        f" THEN {_strip(w, 1)}"
        f" WHEN {_m_of(cv)} = 1 AND {_cvc_of(w, cv)} THEN {w} || 'e'"
        f" ELSE {w} END"
    )))
    out.append(("cv_1b", _sql_cv("p_1b", dialect)))

    # step 1c
    w, cv = "p_1b", "cv_1b"
    out.append(("p_1c", (
        f"CASE WHEN {short} THEN {w}"
        f" WHEN {w} LIKE '%y' AND {_hv_of(cv, 1)}"
        f" THEN {_strip(w, 1)} || 'i' ELSE {w} END"
    )))
    out.append(("cv_1c", _sql_cv("p_1c", dialect)))

    # steps 2, 3 (m > 0), 4 (m > 1; 'ion' needs stem ending s/t)
    out.append(("p_2", _rule_case("p_1c", "cv_1c", STEP2, 0, short)))
    out.append(("cv_2", _sql_cv("p_2", dialect)))
    out.append(("p_3", _rule_case("p_2", "cv_2", STEP3, 0, short)))
    out.append(("cv_3", _sql_cv("p_3", dialect)))
    out.append(("p_4", _rule_case("p_3", "cv_3", [(s, "") for s in STEP4], 1, short)))
    out.append(("cv_4", _sql_cv("p_4", dialect)))

    # step 5a: drop final e if m(stem)>1, or m(stem)=1 and not cvc(stem)
    w, cv = "p_4", "cv_4"
    out.append(("p_5a", (
        f"CASE WHEN {short} THEN {w}"
        f" WHEN {w} LIKE '%e' AND ({_m_of(cv, 1)} > 1 OR ({_m_of(cv, 1)} = 1"
        f" AND NOT {_cvc_of(w, cv, 1)})) THEN {_strip(w, 1)} ELSE {w} END"
    )))
    # p_5a is always a prefix of p_4, so cv_4's prefix serves step 5b
    out.append(("cv_5a", f"substr(cv_4, 1, length(p_5a))"))

    # step 5b: m>1, double consonant, ends l -> single l
    w, cv = "p_5a", "cv_5a"
    out.append(("p_out", (
        f"CASE WHEN {short} THEN {w}"
        f" WHEN {_m_of(cv)} > 1 AND {_doublec_of(w, cv)} AND {w} LIKE '%l'"
        f" THEN {_strip(w, 1)} ELSE {w} END"
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
    expressions, no Python in the path. Broadcast-join the result back
    to the corpus (dictionary pattern).

    ``materialize`` localCheckpoints the dictionary: the stem table is a
    derived artifact consumed by multiple plan branches, and cutting the
    lineage here keeps the sizeable step-expression chain out of every
    downstream optimizer pass (a 1 GiB driver heap dies re-transforming
    it otherwise). Vocab-sized data, so the checkpoint is cheap at any
    corpus scale."""
    from pyspark.sql import functions as F

    df = vocab
    for name, expr in step_exprs(token_col, "spark"):
        df = df.withColumn(name, F.expr(expr))
    df = df.select(token_col, F.col("p_out").alias("stem"))
    return df.localCheckpoint(eager=True) if materialize else df
