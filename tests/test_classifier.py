"""Hashed-feature logistic regression: learning + determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lshrs_spark.operators import classifier as C


@pytest.fixture()
def labeled_docs(spark):
    # perfectly separable vocabularies: positive docs use animal
    # words, negative docs use mineral words
    pos = [(i, f"cat dog bird fish cat{i % 3} dog", 1) for i in range(20)]
    neg = [(100 + i, f"rock iron coal slate rock{i % 3} iron", 0)
           for i in range(20)]
    return spark.createDataFrame(
        pos + neg, "doc_id long, text string, label int"
    )


def test_classifier_learns_separable_vocab(labeled_docs):
    feats = C.hashed_features(
        labeled_docs, F.col("label") == 1, dim=256
    )
    w = C.train_logreg_hashed(feats, steps=8, lr=1.0)
    probs = {r.id: r.prob for r in C.score_logreg(feats, w).collect()}
    pos_probs = [probs[i] for i in range(20)]
    neg_probs = [probs[100 + i] for i in range(20)]
    assert min(pos_probs) > 0.5
    assert max(neg_probs) < 0.5
    assert min(pos_probs) - max(neg_probs) > 0.2   # real margin, not luck


def test_classifier_deterministic(labeled_docs):
    feats = C.hashed_features(labeled_docs, F.col("label") == 1, dim=256)
    a = sorted((r.b, round(r.w, 10)) for r in
               C.train_logreg_hashed(feats, steps=3, lr=0.5).collect())
    b = sorted((r.b, round(r.w, 10)) for r in
               C.train_logreg_hashed(feats, steps=3, lr=0.5).collect())
    assert a == b


def test_classifier_scores_unseen_docs(labeled_docs, spark):
    feats = C.hashed_features(labeled_docs, F.col("label") == 1, dim=256)
    w = C.train_logreg_hashed(feats, steps=8, lr=1.0)
    unseen = spark.createDataFrame(
        [(900, "cat dog fish", -1), (901, "rock coal slate", -1)],
        "doc_id long, text string, label int",
    )
    ufeats = C.hashed_features(unseen, F.lit(0) == 1, dim=256)
    got = {r.id: r.prob for r in C.score_logreg(ufeats, w).collect()}
    assert got[900] > 0.5 > got[901]


def test_classifier_validations(labeled_docs):
    with pytest.raises(ValueError):
        C.hashed_features(labeled_docs, F.col("label") == 1, dim=1)
    feats = C.hashed_features(labeled_docs, F.col("label") == 1, dim=16)
    with pytest.raises(ValueError):
        C.train_logreg_hashed(feats, steps=0)
