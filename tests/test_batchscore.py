"""Bit-exactness tests for the r14 Arrow scoring kernels
(``functions.batchscore``) against the Catalyst higher-order-function
plans they replaced: same rows, same IEEE-754 score bits, same
ordering — including the NULL / zero-norm / width-mismatch edges the
fold semantics define."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lshrs_spark.functions.vector import (
    dot_product,
    l2_norm,
    l2_normalize,
    unit_or_null,
)


@pytest.fixture(scope="module")
def vec_df(spark, rng):
    """60 Gaussian vectors (dim 16) plus the edge rows: a NULL vector,
    a zero vector, and a width-mismatched vector."""
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(16)])
        for i in range(60)
    ]
    rows.append((60, None))
    rows.append((61, [0.0] * 16))
    rows.append((62, [1.0] * 8))  # short row: zip_with pads -> NULL dot
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def q_df(spark, rng):
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(16)])
        for i in range(5)
    ]
    rows.append((5, [0.0] * 16))  # zero-norm query -> NULL scores
    return spark.createDataFrame(rows, "qid long, qvec array<double>")


def _legacy_brute(vectors, queries, k, normalize):
    unit = unit_or_null
    if normalize:
        v = vectors.select(F.col("vec_id").cast("long").alias("id"),
                           unit(F.col("embedding")).alias("_v"))
        q = F.broadcast(queries.select(
            F.col("qid").cast("long").alias("qid"),
            unit(F.col("qvec")).alias("_q")))
    else:
        v = vectors.select(F.col("vec_id").cast("long").alias("id"),
                           F.col("embedding").alias("_v"))
        q = F.broadcast(queries.select(
            F.col("qid").cast("long").alias("qid"),
            F.col("qvec").alias("_q")))
    scored = v.crossJoin(q).select(
        "qid", "id", dot_product(F.col("_q"), F.col("_v")).alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "id", "score", "rank"))


def test_brute_force_topk_bit_exact_vs_legacy_plan(spark, vec_df, q_df):
    from lshrs_spark.operators.knn import brute_force_topk

    new = sorted(map(tuple, brute_force_topk(vec_df, q_df, 7).collect()))
    old = sorted(map(tuple, _legacy_brute(vec_df, q_df, 7, True).collect()))
    assert new == old  # tuple equality == bit equality for floats


def test_mips_topk_bit_exact_vs_legacy_plan(spark, vec_df, q_df):
    from lshrs_spark.operators.knn import mips_topk

    new = sorted(map(tuple, mips_topk(vec_df, q_df, 7).collect()))
    old = sorted(map(tuple, _legacy_brute(vec_df, q_df, 7, False).collect()))
    assert new == old


def test_ivf_assign_matches_window_plan(spark, vec_df):
    from lshrs_spark.operators.knn import (
        _nearest_centroids,
        ivf_assign,
        ivf_centroids_by_id,
    )

    cents = ivf_centroids_by_id(vec_df.filter("embedding is not null"), 6)
    new = sorted(map(tuple, ivf_assign(vec_df, cents).collect()))
    pts = vec_df.select(
        F.col("vec_id").cast("long").alias("id"),
        unit_or_null(F.col("embedding")).alias("_v"))
    old = sorted(map(tuple, _nearest_centroids(
        pts, cents, 1, "id", "_v").select("id", "centroid_id").collect()))
    assert new == old
    # NULL / zero-norm / short rows all land on the smallest centroid id
    # (all-NULL score row: desc nulls-last + id tiebreak)
    small = min(r[1] for r in new)
    got = {r[0]: r[1] for r in new}
    assert got[60] == small and got[61] == small and got[62] == small


def test_rerank_bit_exact_vs_legacy_expression(spark, vec_df, q_df):
    from lshrs_spark.operators.probe import rerank

    cands = (vec_df.crossJoin(q_df.select("qid"))
             .select("qid", F.col("vec_id").alias("id"),
                     F.lit(3).cast("long").alias("collisions")))
    new = sorted(map(tuple, rerank(cands, vec_df, q_df).collect()))
    vecs = vec_df.select(F.col("vec_id").cast("long").alias("id"),
                         F.col("embedding").alias("_cvec"))
    qn = F.broadcast(q_df.select(
        "qid", l2_normalize(F.col("qvec"), on_zero="null").alias("_qvec")))
    denom = l2_norm(F.col("_cvec"))
    score = F.when(
        denom > 0, dot_product(F.col("_qvec"), F.col("_cvec")) / denom)
    old = sorted(map(tuple, cands.join(vecs, "id").join(qn, "qid")
                 .select("qid", "id", "collisions", score.alias("score"))
                 .collect()))
    assert new == old


def test_collect_bound_falls_back_to_catalyst_plan(spark, vec_df, q_df,
                                                   monkeypatch):
    """Above MAX_COLLECT_ROWS the Arrow path must refuse the collect and
    the legacy crossJoin plan must serve the same results."""
    import lshrs_spark.functions.batchscore as B
    from lshrs_spark.operators.knn import brute_force_topk

    before = sorted(map(tuple, brute_force_topk(vec_df, q_df, 4).collect()))
    monkeypatch.setattr(B, "MAX_COLLECT_ROWS", 2)
    after_df = brute_force_topk(vec_df, q_df, 4)
    assert "MapInArrow" not in after_df._jdf.queryExecution().toString()
    assert sorted(map(tuple, after_df.collect())) == before
