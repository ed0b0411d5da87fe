"""Grammar & precedence golden tests mirroring the reference's parser
unit tests (src/search/parser.rs:523-726)."""

import pytest

from memvid_spark.plans.parser import (
    And,
    DateRange,
    Field,
    Not,
    Or,
    Phrase,
    QueryParseError,
    Wildcard,
    Word,
    parse_query,
    _date_lo,
    _date_hi,
)


def test_single_word():
    assert parse_query("hello") == Word("hello")


def test_implicit_and():
    ast = parse_query("machine learning")
    assert ast == And([Word("machine"), Word("learning")])


def test_explicit_and_or_precedence():
    # OR binds loosest: a AND b OR c == (a AND b) OR c
    ast = parse_query("a AND b OR c")
    assert ast == Or([And([Word("a"), Word("b")]), Word("c")])


def test_parens_override():
    ast = parse_query("a AND (b OR c)")
    assert ast == And([Word("a"), Or([Word("b"), Word("c")])])


def test_not():
    assert parse_query("NOT slow") == Not(Word("slow"))
    assert parse_query("fast NOT slow") == And([Word("fast"), Not(Word("slow"))])


def test_phrase():
    assert parse_query('"machine learning"') == Phrase("machine learning")


def test_implicit_and_flattens():
    # nested ANDs merge into one n-ary AND (parser.rs:272-299)
    ast = parse_query("a b c")
    assert ast == And([Word("a"), Word("b"), Word("c")])


def test_field_filters():
    assert parse_query("lang:en") == Field("lang", "en")
    assert parse_query("source:src3 vector") == And(
        [Field("source", "src3"), Word("vector")]
    )


def test_unknown_field_is_word():
    # unknown field prefixes degrade to literal words (parser.rs:425-438)
    ast = parse_query("nosuch:thing")
    assert isinstance(ast, (Word, Wildcard))


def test_date_range():
    ast = parse_query("date:[2024-01 TO 2024-03]")
    assert ast == DateRange("date", "2024-01", "2024-03")


def test_date_open_bounds():
    ast = parse_query("date:[* TO 2024]")
    assert ast == DateRange("date", None, "2024")


def test_wildcard():
    assert parse_query("mach*") == Wildcard("mach*")
    assert parse_query("mach?ne") == Wildcard("mach?ne")


def test_trailing_question_stripped():
    # trailing '?' is punctuation, not a wildcard (parser.rs:401-422)
    assert parse_query("learning?") == Word("learning")


def test_lowercasing():
    assert parse_query("Hello WORLD") == And([Word("hello"), Word("world")])


def test_empty_rejected():
    with pytest.raises(QueryParseError):
        parse_query("")
    with pytest.raises(QueryParseError):
        parse_query("   ")


def test_unbalanced_paren_rejected():
    with pytest.raises(QueryParseError):
        parse_query("(a OR b")


def test_date_granularity_expansion():
    assert _date_lo("2024") == "2024-01-01" and _date_hi("2024") == "2025-01-01"
    assert _date_lo("2024-02") == "2024-02-01" and _date_hi("2024-02") == "2024-03-01"
    assert _date_lo("2024-12") == "2024-12-01" and _date_hi("2024-12") == "2025-01-01"
    assert _date_hi("2024-02-28") == "2024-02-29"  # leap year


def test_compiled_filter_end_to_end(spark):
    from memvid_spark.plans.parser import search_filter

    docs = spark.createDataFrame(
        [
            (1, "the fast hash join wins", "en", "src1"),
            (2, "slow merge sort table", "en", "src2"),
            (3, "hash table scan", "fr", "src1"),
            (4, "a vector index", "en", "src1"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = lambda q: sorted(
        r.doc_id for r in search_filter(docs, q).select("doc_id").collect()
    )
    assert got("hash") == [1, 3]
    assert got("hash join") == [1]  # implicit AND
    assert got("hash OR vector") == [1, 3, 4]
    assert got("hash NOT join") == [3]
    assert got('"hash table"') == [3]
    assert got("lang:en hash") == [1]
    assert got("source:src1 NOT vector") == [1, 3]
    assert got("ha*") == [1, 3]
    assert got("m?rge") == [2]


def test_grapheme_truncation_keeps_combining_marks(spark):
    """'e' + COMBINING ACUTE is ONE grapheme: truncating at 2 clusters
    must keep the accent with its base (src/text.rs grapheme safety)."""
    from memvid_spark.functions.text import normalize_text, truncate_graphemes

    s = "éabc"  # é (2 codepoints) + abc
    docs = spark.createDataFrame([(1, s)], "doc_id long, t string")
    out = docs.select(truncate_graphemes("t", 2).alias("x")).collect()[0].x
    assert out == "éa"  # 2 clusters = é + a, accent kept
    norm = docs.select(normalize_text("t").alias("x")).collect()[0].x
    assert norm == s  # already lowercase, no whitespace runs


def test_stemmer_parity_and_conflation(spark):
    """Index-side column stemmer and query-side driver twin must agree
    (SURVEY §7 'stemmer parity'); plural/gerund forms conflate."""
    from pyspark.sql import functions as F

    from memvid_spark.functions.text import stem, stem_py

    words = ["tables", "table", "windows", "caresses", "ponies", "less",
             "joined", "merging", "relational", "dup"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    spark_side = {r.w: r.s for r in df.select("w", stem("w").alias("s")).collect()}
    for w in words:
        assert spark_side[w] == stem_py(w), w
    assert stem_py("tables") == stem_py("table") == "table"
    assert stem_py("less") == "less"  # ss guard
    assert stem_py("relational") == "relate"
