"""Parquet vector source (reference S1: ``/root/reference/lshrs/io/
parquet.py:47-227``).

The reference hand-rolls columnar projection, batching and schema checks on
PyArrow; Spark's parquet reader provides all three (vectorized scan, column
pruning, predicate pushdown), so this module only keeps the *contract*:
validate that the requested columns exist, coerce the vector column to
``array<float>``, and surface the same error types."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["load_parquet_vectors", "load_orc_vectors"]


def load_parquet_vectors(
    spark: SparkSession,
    source: str,
    *,
    index_column: str = "index",
    vector_column: str = "vector",
    limit: int | None = None,
    **_ignored,
) -> tuple[DataFrame, str, str]:
    """Read ``(index_column, vector_column)`` from a parquet file/dir.

    Returns ``(df, id_col, vector_col)`` for the ingest dispatcher.
    Missing columns raise ``ValueError`` like the reference
    (``io/parquet.py:199-201``)."""
    df = spark.read.parquet(source)
    missing = [c for c in (index_column, vector_column) if c not in df.columns]
    if missing:
        raise ValueError(
            f"Missing required columns in parquet source: {missing}; "
            f"available: {df.columns}"
        )
    out = df.select(
        F.col(index_column),
        F.col(vector_column).cast("array<float>").alias(vector_column),
    )
    if limit is not None:
        out = out.limit(limit)
    return out, index_column, vector_column


def load_orc_vectors(
    spark: SparkSession,
    source: str,
    *,
    index_column: str = "index",
    vector_column: str = "vector",
    limit: int | None = None,
    **_ignored,
) -> tuple[DataFrame, str, str]:
    """ORC twin of :func:`load_parquet_vectors` — same contract, same
    errors; Spark's native ORC reader brings the identical vectorized
    scan / pruning / pushdown machinery (no extra packages)."""
    df = spark.read.orc(source)
    missing = [c for c in (index_column, vector_column) if c not in df.columns]
    if missing:
        raise ValueError(
            f"Missing required columns in orc source: {missing}; "
            f"available: {df.columns}"
        )
    out = df.select(
        F.col(index_column),
        F.col(vector_column).cast("array<float>").alias(vector_column),
    )
    if limit is not None:
        out = out.limit(limit)
    return out, index_column, vector_column
