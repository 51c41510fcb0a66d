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


def test_element_null_scores_null_not_nan(spark, q_df):
    """ADVICE r14: an element-level NULL inside a vector must score
    NULL (Catalyst's fold semantics — sorts LAST under desc), never
    NaN (which sorts first and would flip the row to rank 1)."""
    from lshrs_spark.operators.knn import brute_force_topk, mips_topk

    rows = [(int(i), [float(i + j) / 7.0 for j in range(8)])
            for i in range(10)]
    rows.append((10, [1.0] * 7 + [None]))  # element NULL
    vec = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [0.5] * 7 + [None])],  # element-NULL query too
        "qid long, qvec array<double>")
    for fn, normalize in ((brute_force_topk, True), (mips_topk, False)):
        new = sorted(map(tuple, fn(vec, q, 11).collect()))
        old = sorted(map(tuple, _legacy_brute(vec, q, 11, normalize).collect()))
        assert new == old
        # the element-NULL row must rank LAST for the healthy query
        got = {(r[0], r[1]): r[3] for r in new}
        assert got[(0, 10)] == 11
        # the element-NULL query scores NULL everywhere -> id-ordered
        q1 = sorted((r[3], r[1]) for r in new if r[0] == 1)
        assert q1 == [(i + 1, i) for i in range(11)]


def test_dot_pairs_mixed_width_batch_scores_per_pair(spark):
    """ADVICE r14 (medium): make_dot_pairs_fn must score every pair
    whose two sides share a width — whatever OTHER widths the batch
    holds — exactly like the Catalyst dot_product it replaces, and
    independent of row order."""
    from lshrs_spark.functions.batchscore import make_dot_pairs_fn

    rows = [
        (1, 2, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),       # width 3
        (3, 4, [1.0, 2.0], [3.0, 4.0]),                  # width 2 pair
        (5, 6, [1.0, 2.0, 3.0], [1.0, 2.0]),             # width mismatch
        (7, 8, None, [1.0, 2.0]),                        # NULL side
        (9, 10, [1.0, None], [2.0, 3.0]),                # element NULL
        (11, 12, [0.25, 0.5, 0.125], [8.0, 4.0, 2.0]),   # width 3 again
    ]
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, va array<double>, vb array<double>")
    fn, schema = make_dot_pairs_fn()
    got = {(r.id_a, r.id_b): r.score
           for r in df.mapInArrow(fn, schema).collect()}
    exact = {(r.id_a, r.id_b): r.score for r in df.select(
        "id_a", "id_b",
        dot_product(F.col("va"), F.col("vb")).alias("score")).collect()}
    assert got == exact
    assert got[(3, 4)] == 11.0          # off-batch-width pair SCORES
    assert got[(5, 6)] is None and got[(7, 8)] is None
    assert got[(9, 10)] is None         # element NULL -> NULL, not NaN


def test_duplicate_qids_fall_back_to_catalyst(spark, vec_df):
    """ADVICE r14: the searchsorted kernels bind one query row per
    qid; a duplicate-qid batch must fall back to the join plan (which
    emits one scored row per duplicate)."""
    from lshrs_spark.operators.knn import brute_force_topk

    q = spark.createDataFrame(
        [(0, [1.0] * 16), (0, [2.0] * 16), (1, [0.5] * 16)],
        "qid long, qvec array<double>")
    out = brute_force_topk(vec_df, q, 4)
    assert "MapInArrow" not in out._jdf.queryExecution().toString()
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, _legacy_brute(vec_df, q, 4, True).collect()))
