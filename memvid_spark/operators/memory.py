"""Memory-card (fact-track) operators: version semantics, slot
aggregation, occurrence counts, schema inference.

Reference lineage:
- MemoryCard: (entity, slot, value, version_relation ∈
  Updates|Extends|Retracts, effective ts) — src/types/memory_card.rs:176-240
- current view excludes slots whose LATEST card is a retraction
  (supersedes logic, memory_card.rs:248-283; get_current_memory
  memory.rs:222-224)
- aggregate_memory_slot / count_memory_occurrences (memory.rs:269-293)
- schema inference: per-slot value-type histogram + cardinality vote
  (src/types/schema.rs:478-520, src/memvid/memory.rs:434-530)

The engine treats any (entity, slot, value, relation, ts, seq) DataFrame
as a card stream. ``cards_from_events`` derives a deterministic demo
stream from the driver's events table.

Scale: everything is one window or one groupBy keyed on (entity, slot) —
a single uniform shuffle; schema inference is a two-level aggregation
with map-side partial combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

NUMBER_RE = r"^-?[0-9]+(\.[0-9]+)?$"
DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
BOOL_RE = r"^(true|false)$"


def cards_from_events(events: DataFrame) -> DataFrame:
    """Deterministic card stream over the events table:
    entity=user, slot=event_type, mixed-type values, version relations.

    Twin SQL lives in registry.py (SQL_CARDS).
    """
    value = (
        F.when(F.col("event_id") % 4 == 0, F.col("value").cast("string"))
        .when(
            F.col("event_id") % 4 == 1,
            F.date_format(F.timestamp_micros(F.expr("ts div 1000")), "yyyy-MM-dd"),
        )
        .when(F.col("event_id") % 4 == 2, F.col("props"))
        .otherwise(F.col("event_type"))
    )
    relation = (
        F.when(F.col("value") < 10.0, F.lit("Retracts"))
        .when(F.col("event_id") % 3 == 0, F.lit("Updates"))
        .otherwise(F.lit("Extends"))
    )
    polarity = F.when(F.col("event_id") % 5 == 0, "Negative").otherwise(
        "Positive"
    )  # memory_card.rs:116-127: facts carry polarity ("is NOT y")
    return events.select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("entity"),
        F.col("event_type").alias("slot"),
        value.alias("value"),
        relation.alias("version_relation"),
        polarity.alias("polarity"),
        F.col("ts"),
        F.col("event_id").alias("seq"),
    )


def current_cards(cards: DataFrame) -> DataFrame:
    """Latest card per (entity, slot); slots whose latest card is a
    retraction disappear from the current view (memory.rs:222-224)."""
    w = Window.partitionBy("entity", "slot").orderBy(
        F.col("ts").desc(), F.col("seq").desc()
    )
    return (
        cards.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("version_relation") != "Retracts"))
        .drop("_rn")
    )


def memory_at_time(cards: DataFrame, ts_upper: int) -> DataFrame:
    """As-of view: same semantics evaluated on cards with ts < bound
    (memory.rs:236-243)."""
    return current_cards(cards.filter(F.col("ts") < F.lit(ts_upper)))


def aggregate_memory_slot(cards: DataFrame) -> DataFrame:
    """Distinct-value summary per (entity would be too wide — per slot):
    n_cards, n_entities, n_distinct_values, min/max value
    (aggregate_memory_slot, memory.rs:269-271)."""
    return cards.groupBy("slot").agg(
        F.count("*").alias("n_cards"),
        F.countDistinct("entity").alias("n_entities"),
        F.countDistinct("value").alias("n_values"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def count_memory_occurrences(
    cards: DataFrame, entity_prefix: str | None = None, value_contains: str | None = None
) -> DataFrame:
    """Card counts per (entity, slot), optional value-substring filter
    (memory.rs:285-293)."""
    d = cards
    if entity_prefix:
        d = d.filter(F.col("entity").startswith(entity_prefix))
    if value_contains:
        d = d.filter(F.col("value").contains(value_contains))
    return d.groupBy("entity", "slot").agg(F.count("*").alias("n"))


def infer_schemas(cards: DataFrame) -> DataFrame:
    """Per-slot predicate schema: majority value type (number | date |
    boolean | string, ties broken by that order), cardinality
    (Single iff no entity ever holds >1 distinct value), counts.

    schema.rs:478-520 votes over observed values; Spark: two aggregations
    with a CASE-WHEN type classifier.
    """
    typed = cards.withColumn(
        "vtype",
        F.when(F.col("value").rlike(NUMBER_RE), "number")
        .when(F.col("value").rlike(DATE_RE), "date")
        .when(F.lower(F.col("value")).rlike(BOOL_RE), "boolean")
        .otherwise("string"),
    )
    votes = typed.groupBy("slot").agg(
        F.count("*").alias("n_cards"),
        F.sum((F.col("vtype") == "number").cast("long")).alias("n_number"),
        F.sum((F.col("vtype") == "date").cast("long")).alias("n_date"),
        F.sum((F.col("vtype") == "boolean").cast("long")).alias("n_boolean"),
        F.sum((F.col("vtype") == "string").cast("long")).alias("n_string"),
    )
    inferred = votes.withColumn(
        "value_type",
        F.when(
            (F.col("n_number") >= F.col("n_date"))
            & (F.col("n_number") >= F.col("n_boolean"))
            & (F.col("n_number") >= F.col("n_string")),
            "number",
        )
        .when(
            (F.col("n_date") >= F.col("n_boolean"))
            & (F.col("n_date") >= F.col("n_string")),
            "date",
        )
        .when(F.col("n_boolean") >= F.col("n_string"), "boolean")
        .otherwise("string"),
    )
    per_entity = (
        cards.groupBy("slot", "entity")
        .agg(F.countDistinct("value").alias("nv"))
        .groupBy("slot")
        .agg(F.max("nv").alias("max_per_entity"))
    )
    return inferred.join(per_entity, "slot").select(
        "slot",
        "n_cards",
        "value_type",
        F.when(F.col("max_per_entity") <= 1, "Single")
        .otherwise("Multiple")
        .alias("cardinality"),
        "n_number",
        "n_date",
        "n_boolean",
        "n_string",
    )


def validate_cards(cards: DataFrame, schemas: DataFrame) -> DataFrame:
    """Strict-mode insert validation (memory.rs:367-430): a card is
    rejected when its slot has no registered schema (``unknown_slot``)
    or its value's detected type deviates from the slot's registered
    type (``type_mismatch``). Uses the SAME classifier as inference so
    a freshly-inferred registry accepts exactly the data it was
    inferred from, minus drift.

    ``schemas``: (slot, value_type) — e.g. from :func:`infer_schemas`.
    Output: (entity, slot, value, vtype, expected, violation) —
    violating cards only.
    """
    typed = cards.withColumn(
        "vtype",
        F.when(F.col("value").rlike(NUMBER_RE), "number")
        .when(F.col("value").rlike(DATE_RE), "date")
        .when(F.lower(F.col("value")).rlike(BOOL_RE), "boolean")
        .otherwise("string"),
    )
    reg = schemas.select("slot", F.col("value_type").alias("expected"))
    joined = typed.join(F.broadcast(reg), "slot", "left")
    violation = (
        F.when(F.col("expected").isNull(), "unknown_slot")
        .when(F.col("vtype") != F.col("expected"), "type_mismatch")
    )
    return (
        joined.withColumn("violation", violation)
        .filter(F.col("violation").isNotNull())
        .select(
            "entity", "slot", "value", "vtype",
            F.coalesce("expected", F.lit("")).alias("expected"),
            "violation",
        )
    )


def current_values(cards: DataFrame) -> DataFrame:
    """Multi-value current view honoring the full relation algebra
    (memory_card.rs:76-90): ``Updates`` replaces the slot's value set,
    ``Extends`` adds to it, ``Retracts`` clears it. The current set is
    the last non-Extends card's value (if it was an Updates) plus every
    Extends card after that reset point. One window, no self-join.

    Output: (entity, slot, value) — possibly several rows per pair.
    """
    w = Window.partitionBy("entity", "slot")
    reset = F.max(
        F.when(
            F.col("version_relation") != "Extends",
            F.struct("ts", "seq", "version_relation"),
        )
    ).over(w)
    after_reset = reset.isNull() | (
        (F.col("ts") > reset["ts"])
        | ((F.col("ts") == reset["ts"]) & (F.col("seq") > reset["seq"]))
    )
    is_reset_row = (
        (F.col("ts") == reset["ts"])
        & (F.col("seq") == reset["seq"])
        & (F.col("version_relation") == "Updates")
    )
    keep = (
        is_reset_row
        | ((F.col("version_relation") == "Extends") & after_reset)
    )
    return cards.withColumn("_keep", keep).filter("_keep").select(
        "entity", "slot", "value"
    )


def cardinality_violations(cards: DataFrame, schemas: DataFrame) -> DataFrame:
    """Cardinality enforcement (schema.rs:87-95 Single/Multiple;
    validation :257-476): a ``Single`` slot is violated when an entity
    currently holds more than one distinct value — i.e. Extends cards
    accumulated in a slot the registry declares single-valued.
    Historical (superseded) values are fine; concurrency is not.

    ``schemas``: (slot, cardinality). Output:
    (entity, slot, n_values, cardinality) — violating pairs only.
    """
    per_pair = current_values(cards).groupBy("entity", "slot").agg(
        F.count_distinct("value").cast("long").alias("n_values")
    )
    reg = schemas.select("slot", "cardinality")
    return (
        per_pair.join(F.broadcast(reg), "slot")
        .filter((F.col("cardinality") == "Single") & (F.col("n_values") > 1))
        .select("entity", "slot", "n_values", "cardinality")
    )


def classify_value(value: str) -> str:
    """Driver-side twin of the CASE-WHEN value-type classifier used by
    :func:`infer_schemas`/:func:`validate_cards` — the facade's strict
    single-card gate (validate_card, memory.rs:392-409) classifies one
    value without a job."""
    import re

    if re.fullmatch(r"-?[0-9]+(\.[0-9]+)?", value):
        return "number"
    if re.fullmatch(r"[0-9]{4}-[0-9]{2}-[0-9]{2}", value):
        return "date"
    if re.fullmatch(r"(true|false)", value.lower()):
        return "boolean"
    return "string"


def schema_summary(cards: DataFrame, registered: DataFrame | None = None) -> DataFrame:
    """Per-slot display summary (schema_summary, memory.rs:513-560):
    the inferred schema plus value/unique/entity counts and whether the
    slot is explicitly registered. One extra groupBy joined on slot —
    both sides are slot-keyed aggregates, a broadcast-sized dimension.
    """
    inf = infer_schemas(cards)
    stats = cards.groupBy("slot").agg(
        F.count_distinct("value").cast("long").alias("n_unique_values"),
        F.count_distinct("entity").cast("long").alias("n_entities"),
    )
    out = inf.join(stats, "slot")
    if registered is not None:
        reg = registered.select("slot", F.lit(True).alias("registered"))
        out = out.join(F.broadcast(reg), "slot", "left").withColumn(
            "registered", F.coalesce("registered", F.lit(False))
        )
    else:
        out = out.withColumn("registered", F.lit(False))
    return out.select(
        "slot", "value_type", "cardinality", "n_cards",
        "n_unique_values", "n_entities", "registered",
    )
