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
