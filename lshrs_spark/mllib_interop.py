"""MLlib LSH interop (SURVEY.md §7.1): Spark ships two LSH families —
``BucketedRandomProjectionLSH`` (Euclidean) and ``MinHashLSH`` (Jaccard
over sparse binary vectors). They power ``approxSimilarityJoin`` /
``approxNearestNeighbors`` at scale with seeded determinism.

Our SRP path (``hashing``/``operators``) stays the reference-semantics
core — MLlib has no sign-random-projection hasher — but for
Euclidean/Jaccard workloads these wrappers plug the corpus straight into
the built-in implementations. On L2-NORMALIZED vectors, Euclidean
distance is monotone in cosine (``d² = 2 - 2cos``), so the BRP join
doubles as a cosine join: threshold ``cos >= t`` maps to
``d <= sqrt(2 - 2t)``."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["brp_cosine_join", "mllib_minhash_pairs"]


def _to_normalized_vectors(df: DataFrame, id_col: str, vector_col: str) -> DataFrame:
    from pyspark.ml.feature import Normalizer
    from pyspark.ml.functions import array_to_vector

    vecs = df.select(
        F.col(id_col).cast("long").alias("id"),
        array_to_vector(F.col(vector_col).cast("array<double>")).alias("raw"),
    )
    return Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(vecs)


def brp_cosine_join(
    df: DataFrame,
    cosine_threshold: float,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    *,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Cosine similarity join via MLlib BucketedRandomProjectionLSH on
    L2-normalized vectors. Returns ``(id_a, id_b, score)`` with
    ``score = cosine >= cosine_threshold`` (id_a < id_b)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    normalized = _to_normalized_vectors(df, id_col, vector_col)
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(normalized)
    dist_threshold = math.sqrt(max(0.0, 2.0 - 2.0 * cosine_threshold))
    joined = model.approxSimilarityJoin(
        normalized, normalized, dist_threshold, distCol="dist"
    )
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            (1.0 - F.col("dist") * F.col("dist") / 2.0).alias("score"),
        )
    )


def mllib_minhash_pairs(
    df: DataFrame,
    jaccard_threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_n: int = 3,
    num_features: int = 1 << 18,
    num_hash_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-dup document pairs via HashingTF(binary) over token shingles +
    MinHashLSH.approxSimilarityJoin. Returns ``(id_a, id_b, distance)``
    with Jaccard distance <= 1 - threshold (id_a < id_b)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from .functions.text import token_shingles_col

    sh = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.array_distinct(token_shingles_col(F.col(text_col), shingle_n)).alias("sh"),
    ).filter(F.size("sh") > 0)
    tf = HashingTF(
        inputCol="sh", outputCol="features", numFeatures=num_features, binary=True
    )
    feat = tf.transform(sh)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables,
        seed=seed,
    ).fit(feat)
    joined = model.approxSimilarityJoin(
        feat, feat, 1.0 - jaccard_threshold, distCol="distance"
    )
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.col("distance"),
        )
    )
