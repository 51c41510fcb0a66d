"""Hashed-feature linear classifier — the fastText-style quality /
language / domain scorer of a corpus pipeline, trained INSIDE Spark.

The standard corpus-filtering recipe trains a cheap linear model over
hashed bag-of-token features (quality classifiers in the Common
Crawl / web-corpus literature) and scores every document with it. Both
halves are DataFrame programs here:

* **Features** — each document becomes its DISTINCT set of hashed
  token buckets (``h48(token) % dim``; the hashing trick, so the
  feature space is fixed-width with no vocabulary build/broadcast).
  One explode + distinct: shuffle ∝ corpus tokens, state ∝ nothing.
* **Training** — full-batch gradient descent on logistic loss. One
  step = two hash aggregations: per-document margin ``z = Σ w_b``
  (join features to the weight table), then per-bucket gradient
  ``g_b = Σ (σ(z) - y) / n``. The weight table is ≤ ``dim`` rows
  (2^18 buckets ≈ 1 MB) — always the broadcast side of the feature
  join, so a step never shuffles the corpus; feature rows are
  persisted once and reused by every step. Deterministic: zero-init,
  fixed lr, full batch — no SGD sampling order to drift, which is
  what lets the DuckDB oracle replay training exactly.
* **Scoring** — the same margin join with the final weights.

Gradient-descent-as-joins is the classic pre-MLlib Spark LR pattern;
``steps`` is small (quality classifiers converge in a handful of
full-batch steps at these dimensions — and each step is a fixed-size
job, so the cost model is steps × one aggregation pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import persist_slot
from ..functions.text import h48, tokens_col

__all__ = ["hashed_features", "train_logreg_hashed", "score_logreg"]


def hashed_features(
    docs: DataFrame,
    label: Column,
    dim: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, y, b)``: one row per document per distinct feature
    bucket, ``y`` the 0/1 training label. Binary presence features
    (a bucket fires once however many tokens hash into it)."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    return docs.select(
        F.col(id_col).cast("long").alias("id"),
        label.cast("double").alias("y"),
        F.explode(
            F.array_distinct(
                F.transform(
                    tokens_col(F.col(text_col)),
                    lambda t: h48(t) % dim,
                )
            )
        ).alias("b"),
    ).distinct()


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _margins(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """``(id, y, z)`` — per-document margin under the weight table."""
    return (
        feats.join(F.broadcast(weights), "b", "left")
        .groupBy("id", "y")
        .agg(F.coalesce(F.sum("w"), F.lit(0.0)).alias("z"))
    )


def train_logreg_hashed(
    feats: DataFrame,
    steps: int = 2,
    lr: float = 0.5,
) -> DataFrame:
    """Full-batch GD on logistic loss from zero init; returns the
    weight table ``(b, w)`` (only touched buckets — absent = 0).
    ``feats`` is persisted here (every step scans it twice).

    The weight vector round-trips through the driver each step —
    deliberately. It is ≤ ``dim`` rows (driver-size BY CONSTRUCTION:
    the hashing trick fixes the feature width independent of corpus
    or vocabulary size), and materializing it per step is what keeps
    each step's logical plan flat. The pure-DataFrame formulation
    (weights_{t+1} as a join over weights_t) references weights_t
    twice per step, so the LOGICAL plan doubles every iteration —
    caching materializes data but not lineage, and by step ~6 merely
    printing the plan overflows the heap. Gradients — the part that
    scans the corpus — stay fully distributed."""
    if steps < 1:
        raise ValueError("steps must be >= 1")
    feats = persist_slot(feats, "classifier.feats", eager=True)
    n = feats.select("id").distinct().count()
    spark = feats.sparkSession
    w: dict[int, float] = {}
    for _ in range(steps):
        wdf = spark.createDataFrame(
            list(w.items()) or [(0, 0.0)][:0], "b long, w double"
        )
        m = _margins(feats, wdf)
        resid = m.select(
            "id", (_sigmoid(F.col("z")) - F.col("y")).alias("r")
        )
        grad = (
            feats.join(resid, "id")
            .groupBy("b")
            .agg((F.sum("r") / F.lit(float(n))).alias("g"))
        ).collect()
        for row in grad:
            w[row.b] = w.get(row.b, 0.0) - lr * row.g
    return spark.createDataFrame(
        sorted(w.items()), "b long, w double"
    )


def score_logreg(
    feats: DataFrame,
    weights: DataFrame,
    *,
    round_decimals: int = 5,
) -> DataFrame:
    """``(id, prob)``: σ(margin) per document under a weight table."""
    return _margins(feats, weights).select(
        "id",
        F.round(_sigmoid(F.col("z")), round_decimals).alias("prob"),
    )
