"""Driver-contract guards over the queries()/oracle_sql() registry."""

from __future__ import annotations

import inspect

import pytest

from lshrs_spark.entries import ORACLES, QUERIES, register


def test_every_entry_has_an_oracle():
    """The correctness gate compares every entry against DuckDB; an
    entry without an oracle silently downgrades to rows-only."""
    missing = sorted(set(QUERIES) - set(ORACLES))
    assert missing == [], f"entries without oracle SQL: {missing}"


def test_every_entry_takes_spark_and_sfdir():
    for name, fn in QUERIES.items():
        params = list(inspect.signature(fn).parameters)
        assert params[:2] == ["spark", "sf_dir"], (name, params)


def test_duplicate_registration_rejected():
    name = sorted(QUERIES)[0]
    with pytest.raises(ValueError, match="duplicate"):
        @register(name, "SELECT 1")
        def clobber(spark, sf_dir):  # pragma: no cover
            raise AssertionError


def test_oracle_sql_mentions_only_known_tables():
    """Oracles run against the driver's pre-registered views; a typo'd
    table name would fail only at gate time — catch it here."""
    known = {"region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events", "documents", "embeddings"}
    import re

    for name, sql in ORACLES.items():
        for m in re.finditer(r"\b(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)\b",
                             sql, re.IGNORECASE):
            tbl = m.group(1).lower()
            # CTE names and derived aliases are fine; only flag
            # TPC-H-ish names that are *close* to a known table but not it
            assert tbl in known or tbl not in {
                "lineitems", "order", "customers", "document", "event",
                "embedding", "suppliers", "parts",
            }, (name, tbl)
