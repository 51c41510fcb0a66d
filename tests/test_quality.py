"""check_constraints: one-pass data-contract evaluation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lshrs_spark.operators.quality import (
    check_constraints,
    row_rule,
    unique_rule,
)


def test_constraints_report(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", -1), (2, None, 3), (4, "d", 100)],
        ["id", "s", "v"],
    )
    got = {
        r.rule: (r.n_rows, r.n_violations, r.passed)
        for r in check_constraints(df, [
            row_rule("id_not_null", F.col("id").isNotNull()),
            unique_rule("id_unique", "id"),
            row_rule("s_present", F.col("s").isNotNull()),
            row_rule("v_nonneg", F.col("v") >= 0),
        ]).collect()
    }
    assert got == {
        "id_not_null": (4, 0, True),
        "id_unique": (4, 1, False),       # id=2 twice
        "s_present": (4, 1, False),
        "v_nonneg": (4, 1, False),
    }


def test_null_predicate_counts_as_violation(spark):
    # v > 0 is NULL for a NULL v — an unknown must not pass the gate
    df = spark.createDataFrame([(None,), (3,)], "v int")
    r = check_constraints(df, [row_rule("v_pos", F.col("v") > 0)]).first()
    assert (r.n_violations, r.passed) == (1, False)


def test_single_scan_for_row_rules(spark):
    from lshrs_spark.plans.inspect import physical_plan

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = physical_plan(check_constraints(df, [
        row_rule("a", F.col("doc_id").isNotNull()),
        row_rule("b", F.length("text") > 0),
        row_rule("c", F.col("n_chars") >= 0),
    ]))
    import re

    # formatted plans print each node twice (tree + "(n) Node" detail)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_rules_validation(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError):
        check_constraints(df, [])
    with pytest.raises(ValueError):
        unique_rule("x")
