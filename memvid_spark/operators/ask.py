"""ask() — the RAG retrieval pipeline (src/memvid/ask.rs:23-420).

Deterministic re-expression of the reference's pipeline stages
(SURVEY §3.2); the rerank stack order matters and is replicated exactly:
retrieve lists → RRF fuse → token-presence reorder → extremes promotion →
diversification → semantic rerank → corrections last.

Driver/executor split: question sanitization, classification, and query
rewriting are cheap string work on the driver (as in the reference);
every retrieval list is a DataFrame pipeline; fusion/rerank are
union+groupBy+window; only the final k rows are collected.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vector import cosine
from . import rrf as rrf_mod
from . import search as search_mod

# Question-sanitization drop list: the reference's full stopword catalog
# (ask.rs is_stopword:879-899, used by sanitize_question_for_lexical
# :901-938) plus the wh/filler words its question rewriting also strips
# ("whose", "about", "tell" — ask.rs:23-120 query preparation).
from ..functions.text import STOPWORDS as _REF_STOPWORDS

_WH_WORDS = set(_REF_STOPWORDS) | {"whose", "about", "tell"}

_AGGREGATION_KW = {"all", "every", "list", "count", "many", "total"}
_RECENCY_KW = {"latest", "newest", "recent", "last", "current", "now"}
_UPDATE_KW = {"changed", "change", "updated", "update", "corrected", "still"}
_ANALYTICAL_KW = {"why", "explain", "analyze", "compare", "difference"}


def sanitize_question(question: str) -> list[str]:
    """Question → content terms: lowercase, strip punctuation, drop
    wh-words/stopwords (ask.rs:892-958)."""
    words = re.split(r"[^a-z0-9]+", question.lower())
    return [w for w in words if w and w not in _WH_WORDS]


def classify_question(question: str) -> str:
    """Keyword heuristics → aggregation | recency | update | analytical |
    plain (ask.rs:1011-1263). First match wins in the reference's order."""
    toks = set(re.split(r"[^a-z0-9]+", question.lower()))
    if toks & _UPDATE_KW:
        return "update"
    if toks & _AGGREGATION_KW:
        return "aggregation"
    if toks & _RECENCY_KW:
        return "recency"
    if toks & _ANALYTICAL_KW:
        return "analytical"
    return "plain"


def effective_top_k(kind: str, top_k: int) -> int:
    """aggregation×5, analytical×3, recency/update×2 (ask.rs:39-57)."""
    mult = {"aggregation": 5, "analytical": 3, "recency": 2, "update": 2}.get(kind, 1)
    return top_k * mult


@dataclass
class AskResult:
    question: str
    kind: str
    terms: list[str]
    hits: DataFrame  # (doc_id, rrf, n_lists, score?, snippet)
    citations: list = dc_field(default_factory=list)
    answer: str = ""


def retrieve_lists(
    docs: DataFrame,
    terms: list[str],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    embeddings: DataFrame | None = None,
    query_vec: list[float] | None = None,
    vec_list_fn=None,
) -> list[DataFrame]:
    """Candidate lists (ask.rs:211-297): BM25 base, OR-expanded lexical,
    optional vector k-NN. Each list is (id, rank).

    ``vec_list_fn(k) -> DataFrame(id_col, score)`` supplies the vector
    list instead of the inline exact cosine scan — the hook the facade
    uses to route through its ANN serving tier past the reference's
    brute-vs-HNSW engage threshold (src/vec.rs:22-23, 57-60). RRF
    consumes RANKS, so the callable only has to order higher-is-better
    on ``score``; the retrieval fusion is metric-agnostic."""
    order = [F.col("score").desc(), F.col(id_col).asc()]
    lists = [
        rrf_mod.with_rank(
            search_mod.bm25_topk(docs, terms, k=k, id_col=id_col, text_col=text_col),
            order,
            id_col,
        ),
        rrf_mod.with_rank(
            search_mod.lex_topk(docs, terms, k=k, id_col=id_col, text_col=text_col),
            order,
            id_col,
        ),
    ]
    if vec_list_fn is not None:
        lists.append(rrf_mod.with_rank(vec_list_fn(k), order, id_col))
    elif embeddings is not None and query_vec is not None:
        vec_hits = (
            embeddings.select(
                F.col("vec_id").alias(id_col),
                F.round(cosine("embedding", query_vec), 6).alias("score"),
            )
            .orderBy(*order)
            .limit(k)
        )
        lists.append(rrf_mod.with_rank(vec_hits, order, id_col))
    return lists


def token_presence_reorder(
    fused: DataFrame, docs: DataFrame, terms: list[str], id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Prefer hits containing more distinct query tokens (ask.rs:308-324):
    stable re-sort by (n_present desc, rrf desc, id)."""
    from ..functions.text import tokens_pinned

    present = None
    for t in terms:
        this = F.array_contains(F.col("_toks"), t.lower()).cast("int")
        present = this if present is None else present + this
    # pinned tokenize: one regex split per row however many terms the
    # per-term membership tests read (see functions.text.pin_expr)
    presence = docs.select(
        F.col(id_col), tokens_pinned(text_col).alias("_toks")
    ).select(F.col(id_col), present.alias("n_present"))
    return (
        fused.join(presence, id_col, "left")
        .fillna({"n_present": 0})
        .orderBy(
            F.col("n_present").desc(), F.col("rrf").desc(), F.col(id_col).asc()
        )
    )


def diversify(
    hits: DataFrame, group_col: str, cap: int, id_col: str = "doc_id"
) -> DataFrame:
    """Cap hits per group (session/uri-prefix diversification,
    ask.rs:1300-1334)."""
    w = Window.partitionBy(group_col).orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return (
        hits.withColumn("_dr", F.row_number().over(w))
        .filter(F.col("_dr") <= cap)
        .drop("_dr")
    )


def semantic_rerank(
    hits: DataFrame,
    embeddings: DataFrame,
    query_vec: list[float],
    blend: float = 0.5,
    score_col: str = "score",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    prune: bool = False,
) -> DataFrame:
    """Semantic rerank (reorder_hits_with_semantic_scores,
    ask.rs:712-830): blend the lexical score with cosine(query, doc)
    and re-sort. The lexical score is min-max normalized within the hit
    set first (window over k rows — tiny) so the two signals share a
    scale; hits without an embedding keep their normalized score.

    combined = (1-blend)·norm_score + blend·cos;
    output: hits + cos, combined, re-ranked.

    ``prune=True`` broadcasts the ≤k hit ids and semi-joins the
    embeddings table down to them BEFORE computing cosine — O(hits),
    not O(corpus), matching the reference's per-hit rerank loop
    (ask.rs:712-830 scores only the hit list). This is the warehouse
    shape: at 100 TB a full embedding scan per query is the bottleneck
    (probe-measured 81× wall at 100× data). The default keeps the plain
    join for callers whose ``embeddings`` is already hit-sized; the
    result is identical either way (the join is a left join on the same
    key, pruning only drops rows that could never match).
    """
    from ..functions.vector import cosine

    w = Window.partitionBy()
    lo, hi = F.min(score_col).over(w), F.max(score_col).over(w)
    norm = F.when(hi == lo, F.lit(1.0)).otherwise(
        (F.col(score_col) - lo) / (hi - lo)
    )
    if prune:
        embeddings = embeddings.join(
            F.broadcast(hits.select(F.col(id_col).alias(vec_id_col)).distinct()),
            vec_id_col,
            "left_semi",
        )
    emb = embeddings.select(
        F.col(vec_id_col).alias(id_col),
        F.round(cosine("embedding", query_vec), 6).alias("cos"),
    )
    combined = F.round(
        (1 - blend) * F.col("norm_score")
        + blend * F.coalesce(F.col("cos"), F.col("norm_score")),
        6,
    )
    out = (
        hits.withColumn("norm_score", F.round(norm, 6))
        .join(emb, id_col, "left")
        .withColumn("combined", combined)
    )
    wr = Window.orderBy(F.col("combined").desc(), F.col(id_col).asc())
    return out.withColumn("sem_rank", F.row_number().over(wr))


def promote_corrections(
    hits: DataFrame,
    uri_col: str = "uri",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Correction promotion (ask.rs:1437-1494): hits whose uri lives
    under ``mv2://correction/`` float to the top — newest correction
    first (corr_ts from the uri), then everything else by score. Runs
    LAST in the rerank stack because corrections override everything.

    Output keeps all input columns + is_correction, corr_ts, final_rank.
    """
    is_corr = F.col(uri_col).startswith("mv2://correction/").cast("int")
    corr_ts = F.when(
        is_corr == 1,
        F.regexp_extract(F.col(uri_col), r"mv2://correction/(\d+)", 1).cast("long"),
    ).otherwise(F.lit(-1))
    w = Window.orderBy(
        F.col("is_correction").desc(),
        F.col("corr_ts").desc(),
        F.col(score_col).desc(),
        F.col(id_col).asc(),
    )
    return (
        hits.withColumn("is_correction", is_corr)
        .withColumn("corr_ts", corr_ts)
        .withColumn("final_rank", F.row_number().over(w))
    )


def promote_extremes(
    hits: DataFrame,
    pool: DataFrame,
    ts_col: str = "ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temporal-extremes promotion (ask.rs:1500+): guarantee the
    earliest and latest documents of the candidate pool appear in the
    hit set for update/recency questions. The extremes are two global
    min/max rows (computed with one tiny aggregate, broadcast back);
    existing hits keep their columns, promoted rows join with
    is_extreme = 1.

    Output: hits' columns + is_extreme.
    """
    bounds = pool.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    )
    extremes = (
        pool.join(F.broadcast(bounds))
        .filter((F.col(ts_col) == F.col("lo")) | (F.col(ts_col) == F.col("hi")))
        .drop("lo", "hi")
        .select(*hits.columns)
    )
    tagged = hits.withColumn("is_extreme", F.lit(0))
    promoted = extremes.withColumn("is_extreme", F.lit(1))
    return (
        tagged.unionByName(promoted)
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.col("is_extreme").desc())
            ),
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def snippet_slices(
    docs: DataFrame,
    phrase: str,
    window: int = 160,
    max_snippets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ranked snippet slices — full compute_snippet_slices parity
    (src/lex.rs:537-607, called with window=160 max_snippets=3 at
    lex.rs:166 and tantivy.rs:185-190): every phrase occurrence expands
    by ±window/2, snaps outward to sentence boundaries (last .!?\\n
    before the start then skip whitespace; first .!? after the end —
    after the char — or \\n — at it), slices merge when the next start
    is within 20 chars of the running merged end, and the first
    max_snippets merged slices survive ('\\n' → ' ' in the output,
    build_snippets lex.rs:433-442). Docs without an occurrence are
    omitted (the caller's no-match fallback is `snippet()` below).

    Scale shape: occurrences come from split-by-phrase + posexplode —
    the explode factor is the per-doc occurrence count, never per-char —
    and every window is keyed by doc, so the whole operator is one scan
    plus doc-local window work.

    Output: (id_col, slice_rank, snippet_start, snippet).
    """
    L = len(phrase)
    half = window // 2
    parts = F.split(F.lower(F.col(text_col)), re.escape(phrase.lower()))
    occ = (
        docs.select(
            F.col(id_col),
            F.col(text_col).alias("_text"),
            F.length(text_col).alias("_tlen"),
            F.size(parts).alias("_np"),
            F.posexplode(parts).alias("_i", "_part"),
        )
        .filter(F.col("_i") < F.col("_np") - 1)
    )
    wcum = (
        Window.partitionBy(id_col)
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    occ = occ.withColumn(
        "_start", F.sum(F.length("_part")).over(wcum) + F.col("_i") * L
    )
    s0 = F.greatest(F.col("_start") - half, F.lit(0))
    e0 = F.least(F.col("_start") + L + half, F.col("_tlen"))
    # sentence_start_before: last [.!?\n] in text[0:s0), position after it,
    # then skip ASCII whitespace; no boundary → keep s0
    prefix = F.substring("_text", 1, s0)
    p_rev = F.instr(F.reverse(F.translate(prefix, "!?\n", "...")), ".")
    cand = s0 - p_rev + 1
    ws = F.length(
        F.regexp_extract(
            F.substring("_text", cand + 1, F.col("_tlen")), r"^[ \t\n\r\f]*", 0
        )
    )
    s1 = F.when(p_rev > 0, cand + ws).otherwise(s0)
    # sentence_end_after: first [.!?] in text[e0:] → after it; first \n → at
    # it; whichever scans first; none → keep e0
    tail = F.substring("_text", e0 + 1, F.col("_tlen"))
    t1 = F.instr(F.translate(tail, "!?", ".."), ".")
    t2 = F.instr(tail, "\n")
    e1 = (
        F.when((t1 > 0) & ((t2 == 0) | (t1 < t2)), e0 + t1)
        .when(t2 > 0, e0 + t2 - 1)
        .otherwise(e0)
    )
    snapped = occ.select(
        id_col, "_text", "_i", s1.alias("_s"), e1.alias("_e")
    ).filter(F.col("_e") > F.col("_s"))
    worder = Window.partitionBy(id_col).orderBy("_i")
    prev_end = F.max("_e").over(worder.rowsBetween(Window.unboundedPreceding, -1))
    isles = snapped.withColumn(
        "_new", (prev_end.isNull() | (F.col("_s") > prev_end + 20)).cast("int")
    ).withColumn(
        "_island", F.sum("_new").over(worder.rowsBetween(Window.unboundedPreceding, 0))
    )
    # the reference stops scanning once max_snippets slices exist, so the
    # last surviving slice never absorbs later occurrences: islands past
    # the cap drop entirely, the cap island keeps only its creator
    rn = F.row_number().over(Window.partitionBy(id_col, "_island").orderBy("_i"))
    kept = (
        isles.filter(F.col("_island") <= max_snippets)
        .withColumn("_rn", rn)
        .filter((F.col("_island") < max_snippets) | (F.col("_rn") == 1))
    )
    return (
        kept.groupBy(id_col, F.col("_island").alias("slice_rank"))
        .agg(
            F.first("_text").alias("_text"),
            F.min("_s").alias("snippet_start"),
            F.max("_e").alias("_e"),
        )
        .select(
            id_col,
            F.col("slice_rank").cast("long").alias("slice_rank"),
            F.col("snippet_start").cast("long").alias("snippet_start"),
            F.translate(
                F.substring(
                    "_text", F.col("snippet_start") + 1, F.col("_e") - F.col("snippet_start")
                ),
                "\n",
                " ",
            ).alias("snippet"),
        )
    )


def snippet(text_col, phrase: str, radius: int = 30):
    """Window around the first phrase occurrence (compute_snippet_slices
    analogue, src/lex.rs; used at tantivy.rs:185-190)."""
    lower = F.lower(text_col if isinstance(text_col, F.Column) else F.col(text_col))
    pos = F.locate(phrase.lower(), lower)  # 1-based; 0 if absent
    start = F.greatest(pos - radius, F.lit(1))
    return F.when(
        pos > 0,
        F.substring(lower, start, F.lit(len(phrase) + 2 * radius)),
    ).otherwise(F.substring(lower, 1, 2 * radius))


def ask(
    docs: DataFrame,
    question: str,
    top_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    embeddings: DataFrame | None = None,
    query_vec: list[float] | None = None,
    uri_col: str | None = None,
    vec_list_fn=None,
) -> AskResult:
    """Full pipeline; returns hits DataFrame + extractive answer
    (synthesize_answer = top-3 snippets stitched, ask.rs:779-814).
    When ``uri_col`` is given, correction promotion runs LAST
    (ask.rs:367-369): correction documents override every other rerank.
    ``vec_list_fn`` — see :func:`retrieve_lists`."""
    kind = classify_question(question)
    k = effective_top_k(kind, top_k)

    def run(terms: list[str]):
        lists = retrieve_lists(
            docs, terms, k * 4, id_col, text_col, embeddings, query_vec,
            vec_list_fn,
        )
        fused = rrf_mod.rrf_fuse(lists, id_col=id_col, k=k * 2)
        fused = token_presence_reorder(fused, docs, terms, id_col, text_col)
        if kind == "aggregation" and group_col is not None:
            fused = fused.join(
                docs.select(F.col(id_col), F.col(group_col)), id_col, "left"
            )
            fused = diversify(fused, group_col, cap=2, id_col=id_col).drop(group_col)
        phrase = " ".join(terms[:2]) if terms else ""
        hits = (
            fused.join(docs.select(F.col(id_col), F.col(text_col)), id_col)
            .withColumn("snippet", snippet(F.col(text_col), phrase))
            .drop(text_col)
            .orderBy(
                F.col("n_present").desc(), F.col("rrf").desc(), F.col(id_col).asc()
            )
            .limit(top_k)
        )
        if uri_col is not None:
            decorated = hits.join(
                docs.select(F.col(id_col), F.col(uri_col)), id_col, "left"
            )
            hits = (
                promote_corrections(
                    decorated, uri_col=uri_col, score_col="rrf", id_col=id_col
                )
                .orderBy("final_rank")
                .drop(uri_col)
            )
        return hits, hits.collect()

    terms = sanitize_question(question)
    hits, rows = run(terms)
    if not rows and terms:
        # fallback ladder (ask.rs:129-209): singular/plural expansion.
        # Driven off the final collected rows — no dedicated emptiness
        # probe job; the common non-empty path costs exactly one action.
        terms = expand_plural_variants(terms)
        hits, rows = run(terms)
    out = AskResult(question=question, kind=kind, terms=terms, hits=hits)
    out.citations = [(r[id_col], r["rrf"]) for r in rows]
    out.answer = " … ".join(r["snippet"] for r in rows[:3])
    return out


def expand_plural_variants(terms: list[str]) -> list[str]:
    """Singular/plural query expansion (ask.rs:959-997): for each term
    emit its variants — strip/add 's', 'es', 'ies'↔'y' — preserving
    first-seen order, deduped. Driver-side, feeds the OR-expanded
    retrieval list in the fallback ladder."""
    out: list[str] = []
    seen: set[str] = set()

    def add(w: str) -> None:
        if w and len(w) > 1 and w not in seen:
            seen.add(w)
            out.append(w)

    for t in terms:
        add(t)
        if t.endswith("ies"):
            add(t[:-3] + "y")
        elif t.endswith("es"):
            add(t[:-2])
            add(t[:-1])
        elif t.endswith("s"):
            add(t[:-1])
        elif t.endswith("y"):
            add(t[:-1] + "ies")
            add(t + "s")
        else:
            add(t + "s")
            add(t + "es")
    return out


# Reranker registry (RerankerKind / Reranker pluggability, lib.rs:260-268):
# retrieval pipelines look rerankers up by kind; deployments register
# their own with register_reranker.
RERANKERS: dict[str, object] = {}


def register_reranker(kind: str, fn) -> None:
    RERANKERS[kind] = fn


def get_reranker(kind: str):
    if kind not in RERANKERS:
        raise KeyError(
            f"unknown reranker kind {kind!r}; registered: {sorted(RERANKERS)}"
        )
    return RERANKERS[kind]


register_reranker("semantic", semantic_rerank)
register_reranker("corrections", promote_corrections)
register_reranker("extremes", promote_extremes)
register_reranker("diversify", diversify)
register_reranker("token_presence", token_presence_reorder)
