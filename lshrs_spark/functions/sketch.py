"""Distinct-count sketching — K-Minimum-Values (KMV) estimator.

The reference has no approximate sketches (SURVEY.md §2.6; its LSH
signatures are the only sketch in the tree). Spark's built-in
``approx_count_distinct`` (HyperLogLog++) is the right default in
production, but its register merges are engine-specific, so a DuckDB
oracle cannot recompute it. KMV is the *deterministic* alternative: with
a shared portable hash, the k smallest distinct hash values — and hence
the estimate ``(k-1) / r_k`` with ``r_k`` the k-th smallest normalized
hash — are identical in any engine, which makes the sketch itself
oracle-checkable (``entries.sketch_distinct_users``).

Scale shape: a ``distinct`` shuffle on ``(groups, hash)`` followed by a
windowed top-k (Spark executes the rank filter with WindowGroupLimit
pushdown — partial top-k before the shuffle), then a tiny per-group
aggregate. No unbounded ``collect_set`` state anywhere, so a group with
billions of distinct members costs the same memory as a small one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmv_distinct", "KMV_HASH_SPACE"]

# functions.text.h48 hashes into [0, 2^48)
KMV_HASH_SPACE = float(1 << 48)


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    hash_col,
    *,
    k: int = 64,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group KMV distinct-count estimate from a 48-bit hash column
    expression. Exact below ``k`` distinct values; relative error
    ~ ``1/sqrt(k-2)`` above. Returns ``(*group_cols, out_col)``.

    ``floor`` (not ``round``) finalizes the estimate so engines with
    different rounding modes agree bit-for-bit.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    group_cols = list(group_cols)
    d = df.select(*group_cols, hash_col.alias("_hv")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("_hv"))
    kept = d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"), F.max("_hv").alias("_rk")
    )
    est = (
        F.when(F.col("_n") < k, F.col("_n"))
        .otherwise(F.floor(F.lit((k - 1) * KMV_HASH_SPACE) / F.col("_rk")))
        .cast("long")
    )
    return agg.select(*group_cols, est.alias(out_col))
