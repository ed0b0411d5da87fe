"""Facade schema registry: register / strict-mode gate / inference /
summary (src/memvid/memory.rs:336-560, src/types/schema.rs)."""

from __future__ import annotations

import pytest

from memvid_spark.api import MemvidSpark


def _seed_cards(mv: MemvidSpark) -> None:
    mv.remember("ada", "age", "36", kind="Fact")
    mv.remember("ada", "age", "37", kind="Fact")
    mv.remember("ada", "likes", "proofs", relation="Extends", kind="Preference")
    mv.remember("ada", "likes", "engines", relation="Extends", kind="Preference")
    mv.remember("grace", "born", "1906-12-09", kind="Fact")
    mv.remember("grace", "active", "true", kind="Fact")


def test_register_and_validate_single_card(spark):
    mv = MemvidSpark(spark)
    mv.register_schema("age", "number")
    mv.register_schema("born", "date")
    assert mv.validate_card("age", "36") is None
    assert mv.validate_card("age", "thirty-six") == "type_mismatch"
    assert mv.validate_card("unregistered", "x") == "unknown_slot"
    with pytest.raises(ValueError):
        mv.register_schema("bad", "integer")
    with pytest.raises(ValueError):
        mv.register_schema("bad", "number", cardinality="Many")


def test_strict_mode_gates_remember(spark):
    mv = MemvidSpark(spark)
    mv.register_schema("age", "number")
    assert not mv.is_schema_strict()
    mv.remember("ada", "nickname", "countess")  # lax: unknown slot ok
    mv.set_schema_strict(True)
    with pytest.raises(ValueError, match="unknown_slot"):
        mv.remember("ada", "nickname", "countess")
    with pytest.raises(ValueError, match="type_mismatch"):
        mv.remember("ada", "age", "thirty-six")
    mv.remember("ada", "age", "36")  # valid card still lands
    assert mv.memories_stats()["card_count"] == 2


def test_infer_and_register_inferred(spark):
    mv = MemvidSpark(spark)
    _seed_cards(mv)
    inf = {r.slot: r for r in mv.infer_schemas().collect()}
    assert inf["age"].value_type == "number"
    assert inf["born"].value_type == "date"
    assert inf["active"].value_type == "boolean"
    assert inf["likes"].value_type == "string"
    assert inf["likes"].cardinality == "Multiple"  # two distinct values held
    assert inf["age"].cardinality == "Multiple"  # two values observed per entity

    n = mv.register_inferred_schemas()
    assert n == 4
    # second run registers nothing new without overwrite
    assert mv.register_inferred_schemas() == 0
    assert mv.register_inferred_schemas(overwrite=True) == 4
    # registry now accepts exactly the data it was inferred from
    assert mv.validate_cards().count() == 0


def test_validate_cards_distributed(spark):
    mv = MemvidSpark(spark)
    _seed_cards(mv)
    mv.register_schema("age", "number")
    rows = mv.validate_cards().collect()
    by_slot = {(r.slot, r.violation) for r in rows}
    # likes/born/active are unregistered; ages are fine
    assert ("likes", "unknown_slot") in by_slot
    assert ("born", "unknown_slot") in by_slot
    assert not any(s == "age" for s, _ in by_slot)


def test_schema_summary_and_clear(spark):
    mv = MemvidSpark(spark)
    _seed_cards(mv)
    mv.register_schema("age", "number")
    summ = {r.slot: r for r in mv.schema_summary().collect()}
    assert summ["age"].registered and not summ["likes"].registered
    assert summ["likes"].n_unique_values == 2
    assert summ["age"].n_cards == 2 and summ["age"].n_entities == 1
    mv.clear_memories()
    assert mv.memories_stats()["card_count"] == 0
    ro_error = None
    mv._read_only = True
    try:
        mv.clear_memories()
    except PermissionError as e:
        ro_error = e
    assert ro_error is not None


def test_cardinality_violations_facade(spark):
    mv = MemvidSpark(spark)
    mv.remember("ada", "email", "a@x.io", relation="Extends")
    mv.remember("ada", "email", "b@x.io", relation="Extends")
    mv.register_schema("email", "string", cardinality="Single")
    v = mv.cardinality_violations().collect()
    assert len(v) == 1 and v[0].entity == "ada" and v[0].n_values == 2
