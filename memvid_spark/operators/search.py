"""Lexical search operators: postings build, TF scoring, BM25, boolean AND.

Reference lineage:
- legacy lex scoring = occurrence count + 1000.0 phrase bonus, sort desc
  (src/lex.rs:264-296)
- BM25 via Tantivy TopDocs (src/search/tantivy/engine.rs:265-290)
- implicit-AND semantics (src/search/parser.rs:286-299,
  tests/test_implicit_and.rs)

Scale design (100 TB posture):
- ``build_postings`` is ONE shuffle (groupBy doc,token with map-side
  partial aggregation). At scale it would be written out partitioned/
  bucketed by ``token`` so query-time term lookups are pruned scans.
- Query terms are a tiny in-filter / broadcast — scoring never shuffles
  the corpus; only the per-doc score aggregation does (one groupBy on
  doc_id, map-side combinable).
- Top-k uses orderBy().limit(k) → Spark's TakeOrderedAndProject: per-
  partition heaps + driver merge of k rows, no full sort.
- Every ordering carries a total order (score DESC, doc_id ASC): Spark's
  sort is not stable across partitions, the reference is single-threaded
  (SURVEY §7 "per-row tie-breaking").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import tokens

PHRASE_BONUS = 1000.0  # src/lex.rs:281 — phrase hit adds 1000.0
BM25_K1 = 1.2
BM25_B = 0.75


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: Sequence[str] | None = None,
) -> DataFrame:
    """(doc_id, token, tf) term-frequency postings derived from the corpus.

    Rebuildable from the content table exactly as memvid rebuilds its
    Tantivy index from the TOC (src/memvid/search/api.rs:1038-1106).

    ``vocab`` restricts to a term set *inside the array before explode* —
    for a query-time scoring pass only the query terms ever leave the
    tokenizer, so the exploded row count is O(matches), not O(corpus
    tokens). (Catalyst cannot push a post-explode filter back through
    the generator, so we do it structurally.)
    """
    toks = tokens(text_col)
    if vocab is not None:
        vset = F.array(*[F.lit(v) for v in sorted({t.lower() for t in vocab})])
        toks = F.filter(toks, lambda x: F.array_contains(vset, x))
    return (
        docs.select(F.col(id_col), F.explode(toks).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )


def doc_lengths(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(F.col(id_col), F.size(tokens(text_col)).alias("dl"))


def lex_topk(
    docs: DataFrame,
    terms: Sequence[str],
    phrase: str | None = None,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Legacy lex scoring: total occurrences of query terms (+1000 if the
    exact phrase substring occurs), top-k. Only rows with score>0 rank.
    """
    toks = tokens(text_col)
    occ = None
    for t in terms:
        this = F.size(F.filter(toks, lambda x: x == F.lit(t.lower())))
        occ = this if occ is None else occ + this
    score = occ.cast("double")
    if phrase:
        score = score + F.when(
            F.lower(F.col(text_col)).contains(phrase.lower()), F.lit(PHRASE_BONUS)
        ).otherwise(F.lit(0.0))
    return (
        docs.select(F.col(id_col), score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def implicit_and_match(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Docs whose token set contains EVERY query term (implicit AND)."""
    toks = tokens(text_col)
    pred = None
    for t in terms:
        this = F.array_contains(toks, t.lower())
        pred = this if pred is None else (pred & this)
    return docs.filter(pred).select(F.col(id_col))


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Exact BM25 over the corpus for a bag of query terms.

    Plan shape: postings (1 shuffle) → filter to query terms (tiny) →
    join broadcast df/N stats → per-doc sum (1 small shuffle) → top-k.
    idf = ln(1 + (N - df + 0.5)/(df + 0.5))  [Robertson/Lucene form]
    """
    terms_lc = sorted({t.lower() for t in terms})
    # postings feed both the df stats and the scoring join; doc lengths
    # feed both avgdl and the per-posting join. Recompute per consumer
    # stays inside codegen (vocab-filtered explode is O(matches)); at
    # warehouse scale these are the materialized postings/lengths tables.
    post = build_postings(docs, id_col, text_col, vocab=terms_lc)
    dl = doc_lengths(docs, id_col, text_col)
    stats = docs.agg(
        F.count("*").alias("n_docs"),
    )
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    df_tbl = post.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        post.join(F.broadcast(df_tbl), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def recency_boosted(
    hits: DataFrame,
    score_col: str = "score",
    ts_col: str = "ts_days",
    half_life_days: float = 30.0,
    lex_weight: float = 0.4,
) -> DataFrame:
    """Recency boost relative to the newest hit in the result set
    (src/memvid/search/tantivy.rs:201-238):

    combined = 0.4*s + 0.6*s*exp(-ln2 * age / half_life)
    """
    w = Window.partitionBy()
    age = F.max(F.col(ts_col)).over(w) - F.col(ts_col)
    decay = F.exp(F.lit(-0.6931471805599453 / half_life_days) * age)
    combined = F.lit(lex_weight) * F.col(score_col) + F.lit(1 - lex_weight) * F.col(
        score_col
    ) * decay
    return hits.withColumn("combined", F.round(combined, 6))


def bm25f_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    title_tokens: int = 4,
    title_weight: int = 3,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Field-weighted BM25 (BM25F, simplified Robertson form): term
    frequencies and document lengths combine across fields with integer
    field weights BEFORE one shared saturation — a title hit counts
    ``title_weight`` times a body hit. The reference approximates field
    weighting by OR-ing exact tags/uri/track matches into the content
    query (src/search/tantivy/query.rs:172-217); BM25F is the principled
    form of the same idea, and the integer weighted-tf keeps the score
    algebra bit-portable to the SQL twin.

    Fields here: title = the first ``title_tokens`` tokens (the
    infer_title_from_uri convention), body = the rest. df/idf stay
    per-term over whole docs (field-independent, the standard choice).

    Plan shape identical to bm25_topk: vocab-filtered explodes,
    broadcast stats, one scoring groupBy, top-k.
    """
    terms_lc = sorted({t.lower() for t in terms})
    vset = F.array(*[F.lit(v) for v in terms_lc])
    toks = tokens(text_col)
    title = F.slice(toks, 1, title_tokens)
    body = F.slice(
        toks, title_tokens + 1,
        F.greatest(F.size(toks) - title_tokens, F.lit(0)),
    )

    def field_post(field_col, alias):
        kept = F.filter(field_col, lambda x: F.array_contains(vset, x))
        return (
            docs.select(F.col(id_col), F.explode(kept).alias("token"))
            .groupBy(id_col, "token")
            .agg(F.count("*").alias(alias))
        )

    tp = field_post(title, "tf_t")
    bp = field_post(body, "tf_b")
    post = (
        tp.join(bp, [id_col, "token"], "full")
        .fillna(0, ["tf_t", "tf_b"])
        .withColumn(
            "wtf", title_weight * F.col("tf_t") + F.col("tf_b")
        )
    )
    # weighted doc length: same field weights over ALL tokens
    wdl = docs.select(
        F.col(id_col),
        (
            title_weight * F.least(F.size(toks), F.lit(title_tokens))
            + F.greatest(F.size(toks) - title_tokens, F.lit(0))
        ).alias("wdl"),
    )
    stats = docs.agg(F.count("*").alias("n_docs"))
    avgdl = wdl.agg(F.avg("wdl").alias("avgdl"))
    df_tbl = post.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        post.join(F.broadcast(df_tbl), "token")
        .join(wdl, id_col)
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("wtf") * (k1 + 1))
            / (F.col("wtf")
               + k1 * (1 - b + b * F.col("wdl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
