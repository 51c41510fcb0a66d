"""Single-slot persist registry: bounded caching with lineage intact."""

from __future__ import annotations

from lshrs_spark.cache import persist_slot, release_slots


def test_persist_slot_evicts_previous_occupant(spark):
    a = persist_slot(spark.range(10), "test.slot")
    assert a.storageLevel.useMemory
    b = persist_slot(spark.range(20), "test.slot")
    assert not a.storageLevel.useMemory  # previous occupant unpersisted
    assert b.storageLevel.useMemory
    release_slots()
    assert not b.storageLevel.useMemory


def test_release_slots_idempotent(spark):
    persist_slot(spark.range(5), "test.slot2")
    release_slots()
    release_slots()  # no error on empty registry
