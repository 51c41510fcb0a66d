"""JSONL + CSV vector sources — beyond-reference ingest formats (the
reference dispatches only parquet/postgres, ``core/main.py:1159-1196``;
JSONL is the de-facto ML corpus interchange format and CSV the
lowest-common-denominator export, so a complete pipeline engine accepts
both). Contract identical to :mod:`.parquet`: validate requested
columns, coerce the vector column to ``array<float>``, raise
``ValueError`` on missing columns.

CSV cannot carry arrays natively; the vector cell is accepted as a
delimited string — ``"1.0,2.0,3.0"``, ``"[1.0, 2.0]"`` or
``"{1.0,2.0}"`` — mirroring the reference's PostgreSQL array-string
decoding (``io/postgres.py:190-203``, same brace convention). Parsing
is pure Catalyst (regexp strip + split + cast), no Python in the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["load_jsonl_vectors", "load_csv_vectors"]


def _require(df: DataFrame, fmt: str, cols: tuple[str, ...]) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"Missing required columns in {fmt} source: {missing}; "
            f"available: {df.columns}"
        )


def load_jsonl_vectors(
    spark: SparkSession,
    source: str,
    *,
    index_column: str = "index",
    vector_column: str = "vector",
    limit: int | None = None,
    **_ignored,
) -> tuple[DataFrame, str, str]:
    """Read ``(index_column, vector_column)`` from newline-delimited
    JSON. Spark's JSON reader infers the array element type; the vector
    is coerced to ``array<float>`` like every other source."""
    df = spark.read.json(source)
    _require(df, "jsonl", (index_column, vector_column))
    out = df.select(
        F.col(index_column),
        F.col(vector_column).cast("array<float>").alias(vector_column),
    )
    if limit is not None:
        out = out.limit(limit)
    return out, index_column, vector_column


def load_csv_vectors(
    spark: SparkSession,
    source: str,
    *,
    index_column: str = "index",
    vector_column: str = "vector",
    limit: int | None = None,
    header: bool = True,
    **_ignored,
) -> tuple[DataFrame, str, str]:
    """Read ``(index_column, vector_column)`` from CSV with the vector
    cell as a delimited string (optionally ``[...]``/``{...}``-wrapped,
    the reference's array-string convention)."""
    df = spark.read.option("header", "true" if header else "false").csv(source)
    _require(df, "csv", (index_column, vector_column))
    cleaned = F.regexp_replace(
        F.col(vector_column), r'[\[\]{}()" ]', ""
    )
    arr = F.when(cleaned == "", F.lit(None)).otherwise(
        F.transform(F.split(cleaned, ","), lambda x: x.cast("float"))
    )
    out = df.select(
        F.col(index_column).cast("long").alias(index_column),
        arr.alias(vector_column),
    )
    if limit is not None:
        out = out.limit(limit)
    return out, index_column, vector_column
