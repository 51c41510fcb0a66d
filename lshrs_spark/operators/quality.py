"""Data-quality constraint checking — the contract gate between
pipeline stages.

A corpus rebuild is promoted only if it satisfies its data contract
(ids present and unique, payloads non-null, value domains respected,
sizes within bounds). This module evaluates a rule set in ONE pass over
the data: every row-level rule compiles to a conditional count inside
the same aggregation (one scan, one tiny result row), and set-level
rules (uniqueness) add one distinct-count aggregation each. The output
is a per-rule report ``(rule, n_rows, n_violations, passed)`` — small
enough to assert on in a promotion gate or land in a metrics table.

Row-level rules are plain Catalyst boolean Columns (codegen'd, zero
Python), so checking 100 TB costs one scan regardless of how many rules
ride along.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "row_rule",
    "unique_rule",
    "check_constraints",
]


def row_rule(name: str, satisfied: Column) -> tuple:
    """A per-row constraint: ``satisfied`` is a boolean Column that must
    hold on every row (NULL counts as a violation — an unknown is not a
    pass)."""
    return ("row", name, satisfied)


def unique_rule(name: str, *cols: str) -> tuple:
    """A set-level constraint: the column tuple must be unique across
    the whole input (violations = n_rows - n_distinct)."""
    if not cols:
        raise ValueError("unique_rule needs at least one column")
    return ("unique", name, list(cols))


def check_constraints(df: DataFrame, rules: Sequence[tuple]) -> DataFrame:
    """Evaluate the rule set and return one report row per rule:
    ``(rule, n_rows, n_violations, passed)``. All row rules share a
    single aggregation pass; each uniqueness rule adds one
    count-distinct aggregate to the same pass (Spark rewrites multiple
    distinct aggregates with one expand — still one scan)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")]
    names = []
    for kind, name, payload in rules:
        names.append(name)
        if kind == "row":
            aggs.append(
                F.sum(
                    F.when(F.coalesce(payload, F.lit(False)), 0).otherwise(1)
                ).cast("long").alias(f"_v_{len(names) - 1}")
            )
        elif kind == "unique":
            aggs.append(
                F.count_distinct(*[F.col(c) for c in payload])
                .alias(f"_d_{len(names) - 1}")
            )
        else:
            raise ValueError(f"unknown rule kind: {kind!r}")
    row = df.agg(*aggs)
    selects = []
    for i, (kind, name, _payload) in enumerate(rules):
        viol = (
            F.col(f"_v_{i}")
            if kind == "row"
            else (F.col("_n") - F.col(f"_d_{i}")).cast("long")
        )
        selects.append(
            F.struct(
                F.lit(name).alias("rule"),
                F.col("_n").cast("long").alias("n_rows"),
                viol.alias("n_violations"),
                (viol == 0).alias("passed"),
            )
        )
    return row.select(
        F.explode(F.array(*selects)).alias("r")
    ).select("r.rule", "r.n_rows", "r.n_violations", "r.passed")
