"""MLlib LSH interop: seeded approxSimilarityJoin wrappers find planted
near-duplicates."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture()
def vec_df(spark, rng):
    base = rng.standard_normal((20, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows.append((20, [float(x) for x in base[0]]))  # exact copy of 0
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brp_cosine_join_finds_copy(vec_df):
    from lshrs_spark.mllib_interop import brp_cosine_join

    out = {(r.id_a, r.id_b): r.score for r in
           brp_cosine_join(vec_df, 0.95).collect()}
    assert (0, 20) in out
    assert out[(0, 20)] == pytest.approx(1.0, abs=1e-6)


def test_mllib_minhash_finds_duplicate_docs(spark):
    from lshrs_spark.mllib_interop import mllib_minhash_pairs

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "one two three four five six seven eight nine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.distance for r in
             mllib_minhash_pairs(docs, 0.8).collect()}
    assert pairs.get((0, 1)) == pytest.approx(0.0, abs=1e-9)
    assert (0, 2) not in pairs
