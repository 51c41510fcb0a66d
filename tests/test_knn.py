"""kNN tiers: brute force, IVF partition pruning, recall measurement."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lshrs_spark.operators.knn import (
    brute_force_topk,
    ivf_assign,
    ivf_centroids_by_id,
    ivf_topk,
    recall_at_k,
)


@pytest.fixture()
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture()
def queries(emb):
    return emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def test_brute_force_self_retrieval(emb, queries):
    out = brute_force_topk(emb, queries, 5)
    top1 = {r.qid: r.id for r in out.filter("rank = 1").collect()}
    assert top1 == {0: 0, 1: 1, 2: 2}


def test_ivf_assign_covers_all(emb):
    cents = ivf_centroids_by_id(emb, 8)
    assign = ivf_assign(emb, cents)
    assert assign.count() == emb.count()
    assert assign.select("centroid_id").distinct().count() <= 8
    # a centroid vector is assigned to itself
    self_rows = {r.id: r.centroid_id for r in assign.filter("id < 8").collect()}
    assert all(self_rows[i] == i for i in range(8))


def test_ivf_topk_finds_self(emb, queries):
    cents = ivf_centroids_by_id(emb, 8)
    out = ivf_topk(emb, cents, queries, k=5, nprobe=3)
    top1 = {r.qid: r.id for r in out.filter("rank = 1").collect()}
    assert top1 == {0: 0, 1: 1, 2: 2}


def test_recall_full_and_partial(spark):
    exact = spark.createDataFrame(
        [(0, i, i + 1) for i in range(10)], "qid long, id long, rank long"
    )
    assert recall_at_k(exact, exact, 10).collect()[0].recall == pytest.approx(1.0)
    half = spark.createDataFrame(
        [(0, i, i + 1) for i in range(5)] + [(0, 100 + i, 6 + i) for i in range(5)],
        "qid long, id long, rank long",
    )
    assert recall_at_k(half, exact, 10).collect()[0].recall == pytest.approx(0.5)


def test_kmeans_improves_over_id_sample(spark):
    """Lloyd's iterations must not worsen cosine inertia vs the id-sample
    init, and the centroids plug straight into ivf_topk."""
    from pyspark.sql import functions as F

    from lshrs_spark.functions.vector import cosine_similarity
    from lshrs_spark.operators.knn import (
        ivf_centroids_by_id,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def inertia(cents):
        scored = emb.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("cvec")).alias("cs"),
        )
        best = scored.groupBy("vec_id").agg(F.max("cs").alias("best"))
        return best.agg(F.avg("best")).first()[0]

    init = ivf_centroids_by_id(emb, 8)
    km = kmeans_centroids(emb, 8, iterations=2)
    assert km.count() <= 8  # empty centroids may drop
    assert inertia(km) >= inertia(init) - 1e-9
    # same downstream plan as any centroid set
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = ivf_topk(emb, km, queries, k=5, nprobe=2)
    assert out.count() == 5


def test_kmeans_deterministic(spark):
    from lshrs_spark.operators.knn import kmeans_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = kmeans_centroids(emb, 4, iterations=2).orderBy("centroid_id").collect()
    b = kmeans_centroids(emb, 4, iterations=2).orderBy("centroid_id").collect()
    assert [(r.centroid_id, r.cvec) for r in a] == [
        (r.centroid_id, r.cvec) for r in b
    ]
