"""Pin the codegen n-gram builder (functions/text.py ngram_rows) to the
interpreted higher-order-function construction it replaced, and the
Carter-Wegman minhash family's portability contracts.

ngram_rows is the shared hot path under MinHash shingles (q22),
decontamination n-grams (q94/q109/q153), exact-substring passage
windows (q145) and rolling fingerprints (q43) — an off-by-one in the
slice/zip/filter would silently change every one of them, so the
reference twin here is the literal transform(sequence(...)) expression
the reference pipelines used before round 6.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from memvid_spark.functions.text import ngram_rows, tokens


CORPUS = [
    (0, ""),                                  # empty text
    (1, "one"),                               # shorter than any n > 1
    (2, "alpha beta"),                        # exactly 2 tokens
    (3, "alpha beta gamma"),                  # exactly 3 tokens
    (4, "a b c d e f g h i j"),               # long, all distinct
    (5, "dup dup dup dup"),                   # repeated token => dup grams
    (6, "Mixed CASE, punct!! and   spaces"),  # tokenizer normalization
    (7, "x1 y2 z3 x1 y2 z3 x1 y2"),           # repeated trigrams
]


def _hof_reference(docs, n):
    """The pre-round-6 interpreted construction, kept as the oracle."""
    toks = tokens("text")
    grams = F.when(
        F.size(F.col("_toks")) >= n,
        F.expr(
            f"transform(sequence(1, size(_toks) - {n - 1}), "
            f"i -> array_join(slice(_toks, i, {n}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col("doc_id"), toks.alias("_toks"))
        .select(F.col("doc_id"), F.explode(grams).alias("gram"))
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.mark.parametrize("n", [1, 2, 3, 8])
def test_ngram_rows_matches_hof_reference(spark, docs, n):
    got = sorted(
        (r.doc_id, r.gram) for r in ngram_rows(docs, n).collect()
    )
    want = sorted(
        (r.doc_id, r.gram) for r in _hof_reference(docs, n).collect()
    )
    assert got == want


def test_ngram_rows_positions_are_1_based_and_dense(spark, docs):
    rows = ngram_rows(docs, 3, with_pos=True).collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    for doc_id, positions in by_doc.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), doc_id
    # doc 4 has 10 tokens -> 8 trigrams at pos 1..8
    assert sorted(by_doc[4]) == list(range(1, 9))


def test_ngram_rows_keep_cols_ride_along(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d", "en"), (2, "x y z", "de")],
        "doc_id long, text string, lang string",
    )
    rows = ngram_rows(docs, 2, keep_cols=("lang",)).collect()
    assert {(r.doc_id, r.lang) for r in rows} == {(1, "en"), (2, "de")}
    assert len(rows) == 3 + 2


def test_minhash_family_matches_duckdb_twin(spark):
    """hash64_affine (Spark) and hash64_affine_sql (the oracle twin) are
    generated from the same constants — verify they agree bit-for-bit
    through DuckDB, including the Carter-Wegman mod."""
    duckdb = pytest.importorskip("duckdb")
    from memvid_spark.functions.hashing import (
        hash64,
        hash64_affine,
        hash64_affine_sql,
    )

    words = ["alpha", "beta gamma", "x", "42", "the quick brown fox"]
    docs = spark.createDataFrame([(w,) for w in words], "s string")
    got = docs.select(
        "s", *[hash64_affine(hash64(F.col("s")), k).alias(f"h{k}") for k in range(8)]
    ).collect()
    con = duckdb.connect()
    h = "('0x' || substr(md5(s), 1, 15))::bigint"
    exprs = ", ".join(hash64_affine_sql(h, k) + f" AS h{k}" for k in range(8))
    for row in got:
        want = con.execute(
            f"SELECT {exprs} FROM (SELECT ? AS s)", [row.s]
        ).fetchone()
        assert tuple(row[f"h{k}"] for k in range(8)) == want, row.s


def test_minhash_family_decorrelated_argmins(spark):
    """The mod is load-bearing: over a pool of random-ish hashes the
    argmin must NOT coincide across all family members (without the mod
    it does, and LSH band keys collide quadratically)."""
    from memvid_spark.functions.hashing import MINHASH_FAMILY, _MERSENNE31

    pool = [
        int(hashlib.md5(f"tok{i}".encode()).hexdigest()[:15], 16)
        for i in range(500)
    ]

    def member(h: int, s: int) -> int:
        a, b, c = MINHASH_FAMILY[s]
        return (a * (h >> 30) + b * (h & ((1 << 30) - 1)) + c) % _MERSENNE31

    argmins = {
        s: min(range(len(pool)), key=lambda i: member(pool[i], s))
        for s in range(8)
    }
    assert len(set(argmins.values())) >= 4  # near-independent minima
