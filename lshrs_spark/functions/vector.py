"""Vector math as Catalyst column expressions (no Python UDFs).

Reference analogues: ``/root/reference/lshrs/utils/similarity.py:26-90``
(cosine) and ``/root/reference/lshrs/utils/norm.py:4-61`` (L2 normalize).
Everything here is built from Spark higher-order functions so it stays
inside whole-stage codegen — the NumPy matmul of the reference becomes a
JVM-side fused loop over the array column, which is the scalable shape for
a 100 TB scan (no Python worker round-trip per row).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "l2_normalize",
    "unit_or_null",
]


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise product + sum, computed in float64."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(
        F.aggregate(_as_double(v), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in [-1, 1]; null when either norm is zero (callers
    that need the reference's hard error wrap this with a raise)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)


def unit_or_null(v: Column) -> Column:
    """Unit-normalized double array; null for zero vectors (they score
    null downstream and fall out of threshold filters — same outcome as
    cosine's null-on-zero-denominator). THE normalize-once policy for
    pairwise scoring: normalize at projection time (n rows), score pairs
    with a plain dot product (pairs >> rows in every join strategy)."""
    return l2_normalize(v, on_zero="null")


def l2_normalize(v: Column, *, on_zero: str = "error") -> Column:
    """``v / ||v||``; zero vectors either raise (reference contract,
    ``norm.py:56-57``) or become null (``on_zero="null"``)."""
    n = l2_norm(v)
    scaled = F.transform(_as_double(v), lambda x: x / n)
    if on_zero == "null":
        return F.when(n > 0, scaled)
    return F.when(n > 0, scaled).otherwise(
        F.raise_error(F.lit("Cannot normalize a zero vector"))
    )
