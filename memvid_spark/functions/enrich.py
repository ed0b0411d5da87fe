"""Enrichment: SPO triplet extraction and named-entity heuristics.

Reference: the rules-based triplet extractor — a regex pattern catalog
producing (subject, predicate, object) knowledge triples
(src/triplet/extractor.rs:20-150; pattern corpus src/enrich/rules.rs,
1244 LoC) — and DistilBERT NER with PER/ORG/LOC/MISC classes at
confidence ≥ 0.5 (src/analysis/ner.rs:1-55). The ONNX model is out of
correctness scope (SURVEY non-goals); the shipped classifier is the
deterministic rule tier — proper-case tokens classified by suffix
(``Inc/Corp/Labs``→ORG) and immediate context (``at X``→ORG,
``in X``→LOC, default PER) — mirroring the reference's hybrid mode
where rules run when the model is absent.

The pattern catalog is a module constant consumed by the Spark
expressions AND the oracle SQL, so engine and oracle cannot drift.
Everything is regexp/contains column expressions — JVM-side, scale-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ENTITY = "[A-Z][A-Za-z0-9]*"

# (pattern with subject/object capture groups, predicate / mesh LinkType)
TRIPLET_PATTERNS: list[tuple[str, str]] = [
    (f"({ENTITY}) works at ({ENTITY})", "WorksAt"),
    (f"({ENTITY}) lives in ({ENTITY})", "LivesIn"),
    (f"({ENTITY}) likes ({ENTITY})", "Likes"),
    (f"({ENTITY}) founded ({ENTITY})", "Founded"),
]

ORG_SUFFIX_RE = "(Inc|Corp|Labs|Gmbh)$"
NER_CONF_CONTEXT = 0.9  # suffix or preposition-context rule fired
NER_CONF_DEFAULT = 0.6  # bare proper-case token


def _cap_sql(text_col: str, i: int) -> str:
    w = f"coalesce(try_element_at(split({text_col}, ' '), {i}), 'pad{i}')"
    return f"concat(upper(substr({w}, 1, 1)), substr({w}, 2))"


def render_person_sentences(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic scaffolding: proper-cased words from each doc woven
    into the patterns the extractor targets."""
    c = [_cap_sql(text_col, i) for i in range(1, 7)]
    sent = F.expr(
        f"concat({c[0]}, ' works at ', {c[1]}, 'Corp. ', "
        f"{c[2]}, ' lives in ', {c[3]}, '. ', "
        f"{c[4]}, ' likes ', {c[5]}, '.')"
    )
    return docs.select("doc_id", sent.alias("sentence"))


def spo_triplets(
    docs: DataFrame, text_col: str = "sentence", id_col: str = "doc_id"
) -> DataFrame:
    """All-match SPO extraction: per catalog pattern, find every match
    (regexp_extract_all on group 0), then split the groups out of each
    match. Output: (doc_id, subject, predicate, object)."""
    parts = []
    for pat, pred in TRIPLET_PATTERNS:
        m = docs.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
            ).alias("m"),
        )
        parts.append(
            m.select(
                id_col,
                F.regexp_extract("m", pat, 1).alias("subject"),
                F.lit(pred).alias("predicate"),
                F.regexp_extract("m", pat, 2).alias("object"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ner_entities(
    docs: DataFrame, text_col: str = "sentence", id_col: str = "doc_id"
) -> DataFrame:
    """Rule-tier NER: proper-case tokens classified by org suffix, then
    ``at``/``in`` context (plain substring contains — portable), default
    PER; confidence mirrors rule strength (ner.rs keeps conf ≥ 0.5).

    Output: (doc_id, entity, kind, confidence) distinct.
    """
    toks = docs.select(
        F.col(id_col),
        F.col(text_col).alias("_s"),
        F.explode(F.split(F.col(text_col), " ")).alias("raw"),
    )
    cand = toks.withColumn(
        "entity", F.regexp_extract("raw", f"^({ENTITY})", 1)
    ).filter(F.col("entity") != "")
    at_ctx = F.col("_s").contains(F.concat(F.lit("at "), F.col("entity")))
    in_ctx = F.col("_s").contains(F.concat(F.lit("in "), F.col("entity")))
    suffix = F.col("entity").rlike(ORG_SUFFIX_RE)
    kind = (
        F.when(suffix, "ORG")
        .when(at_ctx, "ORG")
        .when(in_ctx, "LOC")
        .otherwise("PER")
    )
    conf = F.when(suffix | at_ctx | in_ctx, NER_CONF_CONTEXT).otherwise(
        NER_CONF_DEFAULT
    )
    return cand.select(
        id_col, "entity", kind.alias("kind"), conf.alias("confidence")
    ).distinct()


def ner_entities_model(
    docs: DataFrame,
    tagger_factory,
    text_col: str = "sentence",
    id_col: str = "doc_id",
    min_confidence: float = 0.5,
) -> DataFrame:
    """Model-tier NER seam (src/analysis/ner.rs:1-55 — DistilBERT
    token classification, PER/ORG/LOC/MISC at confidence ≥ 0.5). The
    model is an injection point: ``tagger_factory()`` runs ONCE per
    task executor-side (the model never pickles through the closure —
    the BatchModelEmbedder convention) and returns
    ``fn(texts: list[str]) -> list[list[(entity, kind, confidence)]]``.
    With HF ``transformers`` installed,
    ``hf_ner_tagger_factory()`` is a ready-made real-model factory.

    Output matches the rule tier exactly — (doc_id, entity, kind,
    confidence) distinct, confidence filtered at ``min_confidence`` —
    so the reference's hybrid mode (model when present, rules when
    absent) is one callsite swap.
    """
    schema = f"{id_col} long, entity string, kind string, confidence double"

    def run(batches):
        import pandas as pd

        tag = tagger_factory()
        for pdf in batches:
            rows = []
            texts = ["" if t is None else str(t) for t in pdf[text_col]]
            for did, ents in zip(pdf[id_col], tag(texts)):
                for entity, kind, conf in ents:
                    if conf >= min_confidence:
                        rows.append((int(did), entity, kind, round(float(conf), 6)))
            yield pd.DataFrame(
                rows, columns=[id_col, "entity", "kind", "confidence"]
            )

    return (
        docs.select(id_col, text_col).mapInPandas(run, schema).distinct()
    )


def hf_ner_tagger_factory(model: str = "dslim/bert-base-NER"):
    """Real-model tagger factory for :func:`ner_entities_model`: builds
    a HuggingFace token-classification pipeline executor-side and maps
    its B-/I- tags onto the engine's PER/ORG/LOC/MISC kinds
    (ner.rs:1-55's label set). Requires ``transformers`` — callers gate
    on availability (the test suite skipifs, mirroring the
    sentence-transformers seam)."""

    def build():
        from transformers import pipeline

        nlp = pipeline(
            "ner", model=model, aggregation_strategy="simple"
        )

        def tag(texts: list[str]):
            out = []
            for res in nlp(texts):
                out.append(
                    [
                        (
                            r["word"],
                            {"PER": "PER", "ORG": "ORG", "LOC": "LOC"}.get(
                                r["entity_group"], "MISC"
                            ),
                            float(r["score"]),
                        )
                        for r in res
                    ]
                )
            return out

        return tag

    return build


def edges_from_triplets(trips: DataFrame) -> DataFrame:
    """Feed the Logic-Mesh: triples become typed edges
    (logic_mesh.rs LinkType; confidence 1.0 for rule extractions)."""
    return trips.select(
        F.col("subject").alias("src"),
        F.col("object").alias("dst"),
        F.col("predicate").alias("link_type"),
        F.col("doc_id").alias("frame_id"),
        F.lit(1.0).alias("confidence"),
    )


def enrich_documents(docs: DataFrame) -> DataFrame:
    """EnrichmentEngine pipeline (the EnrichmentEngine trait +
    RulesEngine, src/lib.rs:255, src/enrich/engine.rs; progressive
    enrichment_state Searchable→Enriched, src/types/frame.rs:227-230):
    one composed pass of the rule enrichers — auto-tagging, content-date
    extraction, NER, triplet extraction — emitting per-doc enrichment
    counts and the advanced state.

    Output: (doc_id, n_tags, n_dates, n_entities, n_triplets,
    enrichment_state).
    """
    from .extract import auto_tags, extract_dates

    base = docs.select(
        "doc_id",
        F.size(auto_tags("text")).alias("n_tags"),
        F.size(extract_dates("text")).alias("n_dates"),
    )
    sents = render_person_sentences(docs)
    ents = (
        ner_entities(sents)
        .groupBy("doc_id")
        .agg(F.count_distinct("entity").cast("long").alias("n_entities"))
    )
    trips = (
        spo_triplets(sents)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_triplets"))
    )
    return (
        base.join(ents, "doc_id", "left")
        .join(trips, "doc_id", "left")
        .select(
            "doc_id",
            "n_tags",
            "n_dates",
            F.coalesce("n_entities", F.lit(0)).alias("n_entities"),
            F.coalesce("n_triplets", F.lit(0)).alias("n_triplets"),
            F.lit("Enriched").alias("enrichment_state"),
        )
    )
