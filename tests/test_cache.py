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


def test_materialize_slot_bounds_storage(spark, tmp_path):
    import os

    from lshrs_spark.cache import materialize_slot

    df = spark.range(100).withColumnRenamed("id", "x")
    base = str(tmp_path / "mat")
    out1 = materialize_slot(df, "t.slot", base_dir=base)
    assert out1.count() == 100
    gen_dirs = [d for d in os.listdir(base) if d.startswith("t_slot_gen")]
    assert len(gen_dirs) == 1
    out2 = materialize_slot(out1.filter("x < 50"), "t.slot", base_dir=base)
    assert out2.count() == 50
    gen_dirs = [d for d in os.listdir(base) if d.startswith("t_slot_gen")]
    assert gen_dirs == ["t_slot_gen2"]     # generation 1 deleted
    # lineage is truncated: the plan reads parquet, no upstream ops
    plan = out2._jdf.queryExecution().analyzed().toString()
    assert "Filter" not in plan


def test_release_slots_keeps_materializations_by_default(spark, tmp_path):
    """A long-lived driver freeing cache memory must NOT invalidate live
    materialize_slot DataFrames (their lineage is truncated — deleting
    the backing files would be unrecoverable, ADVICE r2)."""
    from lshrs_spark.cache import materialize_slot

    base = str(tmp_path / "mat")
    out = materialize_slot(spark.range(30).withColumnRenamed("id", "x"),
                           "t.keep", base_dir=base)
    persist_slot(spark.range(5), "t.cache")
    release_slots(spark)                       # default: caches only
    assert out.count() == 30                   # still readable
    release_slots(spark, include_materializations=True)
    import os
    assert not any(d.startswith("t_keep") for d in os.listdir(base))
