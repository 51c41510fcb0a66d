"""Sources: dispatch aliases and JDBC pushdown-query assembly (reference
S2/S3 contract — no live database in the container, so the JDBC test
covers option plumbing, not execution)."""

from __future__ import annotations

import pytest

from lshrs_spark.sources.dispatch import resolve_loader
from lshrs_spark.sources.jdbc import build_pushdown_query, load_postgres_vectors
from lshrs_spark.sources.parquet import load_parquet_vectors


def test_dispatch_aliases():
    assert resolve_loader("parquet") is load_parquet_vectors
    assert resolve_loader("PQ") is load_parquet_vectors
    assert resolve_loader("postgres") is load_postgres_vectors
    assert resolve_loader(" pg ") is load_postgres_vectors


def test_dispatch_unknown_format():
    with pytest.raises(ValueError, match="Unsupported format"):
        resolve_loader("csv")


def test_pushdown_query_assembly():
    assert (
        build_pushdown_query("vectors", "id", "embedding")
        == "SELECT id, embedding FROM vectors"
    )
    q = build_pushdown_query(
        "t", "i", "v", where_clause="i > 5", order_by="i DESC", limit=7
    )
    assert q == "SELECT i, v FROM t WHERE i > 5 ORDER BY i DESC LIMIT 7"
    assert (
        build_pushdown_query("t", "i", "v", fetch_query="SELECT 1")
        == "SELECT 1"
    )


def test_postgres_requires_connection_info(spark):
    with pytest.raises(ValueError, match="url= or dsn="):
        load_postgres_vectors(spark)
