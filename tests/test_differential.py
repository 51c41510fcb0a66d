"""End-to-end differential test: our Spark engine vs the reference
pipeline (its real hasher + an in-memory dict standing in for its Redis
bucket store) on the driver's embeddings table. Same seed, same config →
identical candidate sets, collision counts, and top-k order."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from lshrs_spark import LSHRS
from tests.conftest import load_reference_hasher

DIM, BANDS, ROWS, SEED = 64, 16, 4, 42


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    ids = [r.vec_id for r in rows]
    vecs = np.array([r.embedding for r in rows], dtype=np.float32)
    return ids, vecs


def reference_topk(ids, vecs, query, k):
    """The reference query pipeline, verbatim semantics: hash per band,
    union bucket members per band collision, sort by (-count, id), cut to
    k (``/root/reference/lshrs/core/main.py:1088-1111,614-622``)."""
    ref = load_reference_hasher()
    hasher = ref.LSHHasher(num_bands=BANDS, rows_per_band=ROWS, dim=DIM, seed=SEED)
    buckets: dict[tuple[int, bytes], set] = defaultdict(set)
    for i, v in zip(ids, vecs):
        for band, sig in enumerate(hasher.hash_vector(v).bands):
            buckets[(band, sig)].add(i)
    counts: dict[int, int] = defaultdict(int)
    for band, sig in enumerate(hasher.hash_vector(query).bands):
        for cand in buckets.get((band, sig), ()):
            counts[cand] += 1
    ordered = sorted(counts, key=lambda i: (-counts[i], i))
    return ordered[:k], counts


def test_topk_matches_reference_pipeline(spark, corpus):
    ids, vecs = corpus
    lsh = LSHRS(spark, DIM, num_perm=BANDS * ROWS, num_bands=BANDS,
                rows_per_band=ROWS, seed=SEED)
    lsh.index(ids, vecs)
    for qi in (0, 7, 123, 499):
        expected, counts = reference_topk(ids, vecs, vecs[qi], 10)
        got = lsh.get_top_k(vecs[qi], 10)
        assert got == expected, f"divergence for query {qi}"


def test_collision_counts_match_reference(spark, corpus):
    ids, vecs = corpus
    lsh = LSHRS(spark, DIM, num_perm=BANDS * ROWS, num_bands=BANDS,
                rows_per_band=ROWS, seed=SEED)
    lsh.index(ids, vecs)
    _, counts = reference_topk(ids, vecs, vecs[3], 10)
    got = {
        r.id: r.collisions
        for r in lsh._candidates_df(vecs[3]).collect()
    }
    assert got == dict(counts)
