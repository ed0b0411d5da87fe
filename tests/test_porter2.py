"""Snowball English (Porter2): hand-traced golden vectors from the
published algorithm description (exceptional forms, R1/R2 conditions,
y-marking, short-syllable e-restoration), the Porter1-vs-Porter2
delta classes the round-2 verdict called out, and 3-way tier parity
(Python / Spark expression chain / DuckDB chain) — one emitter writes
both SQL tiers, so parity pins the generator itself."""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from memvid_spark.functions import porter
from memvid_spark.functions.porter2 import (
    duck_vocab_cte,
    spark_stem_vocab,
    stem_py,
)

# Every value hand-traced against the published Snowball English spec.
GOLDEN = {
    # exceptional forms (whole word)
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "atlas": "atlas", "cosmos": "cosmos", "bias": "bias",
    "andes": "andes",
    # post-1a invariants
    "inning": "inning", "innings": "inning", "exceed": "exceed",
    "proceed": "proceed", "succeed": "succeed", "herring": "herring",
    # step 1a: ied/ies length split, s-rule, us/ss
    "ties": "tie", "cries": "cri", "ponies": "poni", "died": "die",
    "studied": "studi", "caresses": "caress", "gaps": "gap", "gas": "gas",
    "this": "this", "kiwis": "kiwi", "consensus": "consensus",
    # step 1b: eed in R1, ed/ing + fixups (at/bl/iz, double, short-word e)
    "agreed": "agre", "feed": "feed", "hoping": "hope", "hopping": "hop",
    "hoped": "hope", "meeting": "meet", "meetings": "meet",
    "conflated": "conflat", "fizzed": "fizz", "falling": "fall",
    "tanned": "tan", "luxuriated": "luxuri",
    # y-marking interactions
    "crying": "cri", "saying": "say", "sayings": "say", "eying": "eye",
    "happy": "happi", "enjoy": "enjoy", "yellow": "yellow",
    # R1 prefix overrides
    "generous": "generous", "generate": "generat", "general": "general",
    "communism": "communism", "communication": "communic",
    "arsenic": "arsenic",
    # steps 2-4 region conditions
    "conditional": "condit", "rational": "ration", "beautiful": "beauti",
    "argument": "argument", "adjustment": "adjust",
    "effectiveness": "effect", "nationalism": "nation",
    # step 5
    "rate": "rate", "controll": "control", "roll": "roll",
}

# Where Porter 1980 and Snowball English disagree — the recall-relevant
# delta the verdict asked to pin (reference stems with Snowball).
PORTER1_DELTAS = {
    # word: (porter1, porter2)
    "skies": ("ski", "sky"),
    "dying": ("dy", "die"),
    "lying": ("ly", "lie"),
    "news": ("new", "news"),
    "ties": ("ti", "tie"),
    "early": ("earli", "earli"),  # same — listed to pin it stays same
    "proceed": ("proce", "proceed"),
    "herring": ("her", "herring"),
    "succeed": ("succe", "succeed"),
}

DICT_WORDS = """generalizations oscillators running runner easily quickly
argued arguing dies lies agreement disagreement university universities
maximum optimization probabilistic syzygy sprayed enjoyment vivid revive
survival avoidance seventeen psychology knitting knotting daily gravity
gravitational universally national denationalization conspirator
conspiracy conclusion exclusion ineffectively hopelessness owed owing
played playing strayed analogously radically vileness formative
formalize electricity electrical hopeful goodness revival allowance
inference airliner gyroscopic adjustable defensible irritant replacement
dependent adoption activate angularity homologous effective bowdlerize
probate cease sensibility sensitivity fully singularly outings cannings
earrings rapidly lessly fluently dumbly mostly cheaply
the a is be by i no so we us ss
""".split()


def test_golden_vectors():
    for w, want in GOLDEN.items():
        assert stem_py(w) == want, (w, stem_py(w), want)


def test_porter1_deltas():
    for w, (p1, p2) in PORTER1_DELTAS.items():
        assert porter.stem_py(w) == p1, (w, porter.stem_py(w), p1)
        assert stem_py(w) == p2, (w, stem_py(w), p2)


def test_short_tokens_pass_through():
    for w in ("a", "is", "by", "ox", ""):
        assert stem_py(w) == w


def _duck_stems(words):
    con = duckdb.connect()
    con.execute("CREATE TABLE v AS SELECT unnest(?) AS token", [list(words)])
    sql = duck_vocab_cte("token", "SELECT token FROM v")
    return dict(con.execute(sql).fetchall())


def test_three_way_parity_dictionary(spark):
    words = sorted(set(list(GOLDEN) + DICT_WORDS))
    duck = _duck_stems(words)
    vocab = spark.createDataFrame([(w,) for w in words], "token string")
    jvm = {r.token: r.stem for r in spark_stem_vocab(vocab).collect()}
    for w in words:
        assert duck[w] == stem_py(w), ("duck", w, duck[w], stem_py(w))
        assert jvm[w] == stem_py(w), ("spark", w, jvm[w], stem_py(w))


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=0, max_size=14))
def test_duck_python_parity_fuzz(word):
    duck = _duck_stems([word]) if word else {}
    if word:
        assert duck[word] == stem_py(word), (word, duck[word], stem_py(word))


def test_stems_are_stable_under_restemming():
    # stemming a stem never grows it (fixpoint-ish sanity)
    for w in list(GOLDEN) + DICT_WORDS:
        s = stem_py(w)
        assert len(stem_py(s)) <= len(s)
