"""Similarity joins: exact baseline vs LSH-accelerated."""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_spark import LSHConfig
from lshrs_spark.operators.simjoin import (
    candidate_pairs,
    exact_similarity_join,
    similarity_join,
)
from lshrs_spark.operators.index import build_index

CFG = LSHConfig(dim=16, num_perm=32, num_bands=8, rows_per_band=4, seed=42)


@pytest.fixture()
def vec_df(spark, rng):
    base = rng.standard_normal((10, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # id 10 = near-copy of id 0, id 11 = exact copy of id 1
    rows.append((10, [float(x) for x in base[0] + 0.01 * rng.standard_normal(16).astype(np.float32)]))
    rows.append((11, [float(x) for x in base[1]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_exact_similarity_join_finds_planted(vec_df):
    out = {(r.id_a, r.id_b): r.score for r in
           exact_similarity_join(vec_df, 0.95).collect()}
    assert out[(1, 11)] == pytest.approx(1.0)
    assert (0, 10) in out and out[(0, 10)] > 0.95


def test_lsh_similarity_join_finds_planted(vec_df):
    out = {(r.id_a, r.id_b) for r in
           similarity_join(vec_df, CFG, 0.95).collect()}
    assert (1, 11) in out
    assert (0, 10) in out


def test_lsh_join_subset_of_exact(vec_df):
    lsh = {(r.id_a, r.id_b) for r in similarity_join(vec_df, CFG, 0.5).collect()}
    exact = {(r.id_a, r.id_b) for r in exact_similarity_join(vec_df, 0.5).collect()}
    assert lsh <= exact


def test_max_bucket_size_prunes(vec_df):
    idx = build_index(vec_df, CFG, "vec_id", "embedding")
    all_pairs = candidate_pairs(idx).count()
    capped = candidate_pairs(idx, max_bucket_size=1).count()
    assert capped == 0 <= all_pairs


def test_degenerate_hot_bucket_dropped(spark):
    """A corpus of identical vectors collapses into ONE bucket per band —
    the quadratic-blowup case. max_bucket_size must drop it outright and
    complete (empty result beats an O(n^2) pair explosion)."""
    import numpy as np

    from lshrs_spark import LSHConfig
    from lshrs_spark.operators.simjoin import similarity_join

    v = [float(x) for x in np.arange(8)]
    df = spark.createDataFrame(
        [(i, v) for i in range(500)], "vec_id long, embedding array<float>"
    )
    cfg = LSHConfig(dim=8, num_perm=16, num_bands=4, rows_per_band=4, seed=7)
    out = similarity_join(df, cfg, 0.5, max_bucket_size=100)
    assert out.count() == 0  # every bucket exceeds the cap -> dropped
    # without the cap the same corpus yields ~n^2/2 pairs — cap on
    # a small slice to keep the test fast
    some = similarity_join(df.limit(30), cfg, 0.5, max_bucket_size=2000)
    assert some.count() == 30 * 29 / 2
