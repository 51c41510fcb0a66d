"""SQL surface: register the engine's functions so plain ``spark.sql``
users can call them — a capability the reference lacks entirely (it has
no query language; SURVEY.md §2.6).

* ``<prefix>_srp_sigs(vector)`` — the Arrow-vectorized SRP signature UDF.
* ``<prefix>_cosine(a, b)``, ``<prefix>_dot(a, b)``, ``<prefix>_l2norm(v)``
  — registered as SQL scalar functions (``CREATE TEMPORARY FUNCTION ...
  RETURN <higher-order expression>``), so they stay JVM-side/codegen'd
  even when called from SQL text.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .config import LSHConfig

__all__ = ["register_sql_functions"]


def register_sql_functions(
    spark: SparkSession, cfg: LSHConfig, *, prefix: str = "lshrs"
) -> list[str]:
    """Register engine functions for SQL use; returns the names."""
    # Build the same pandas_udf the DataFrame path uses and register it
    # (the broadcast projection matrix is cached per config).
    from . import hashing as H

    bproj = H._broadcast_proj(spark, cfg)
    dim, num_bands, rows_per_band = cfg.dim, cfg.num_bands, cfg.rows_per_band
    use_f32 = cfg.dtype == "float32"

    @F.pandas_udf("array<bigint>")
    def srp_sigs(s: pd.Series) -> pd.Series:
        import numpy as _np

        if s.empty:
            return pd.Series([], dtype=object)
        dt = _np.float32 if use_f32 else _np.float64
        mat = _np.stack(s.to_numpy()).astype(dt, copy=False)
        if mat.ndim != 2 or mat.shape[1] != dim:
            raise ValueError(f"vector dimension mismatch: expected {dim}")
        bits = (mat @ bproj.value) > 0
        weights = 1 << _np.arange(rows_per_band, dtype=_np.int64)
        sigs = bits.reshape(len(mat), num_bands, rows_per_band).astype(
            _np.int64) @ weights
        return pd.Series(list(sigs))

    names = []
    spark.udf.register(f"{prefix}_srp_sigs", srp_sigs)
    names.append(f"{prefix}_srp_sigs")

    sql_udfs = {
        f"{prefix}_dot": (
            "(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE RETURN "
            "aggregate(zip_with(a, b, (x, y) -> cast(x AS DOUBLE) * cast(y AS DOUBLE)), "
            "cast(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        ),
        f"{prefix}_l2norm": (
            "(v ARRAY<FLOAT>) RETURNS DOUBLE RETURN "
            "sqrt(aggregate(v, cast(0.0 AS DOUBLE), "
            "(acc, x) -> acc + cast(x AS DOUBLE) * cast(x AS DOUBLE)))"
        ),
        f"{prefix}_cosine": (
            # zero-denominator guard mirrors the DataFrame twin
            # cosine_similarity (NULL, not DIVIDE_BY_ZERO under ANSI mode)
            "(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE RETURN "
            f"CASE WHEN {prefix}_l2norm(a) * {prefix}_l2norm(b) > 0 "
            f"THEN {prefix}_dot(a, b) / ({prefix}_l2norm(a) * {prefix}_l2norm(b)) END"
        ),
    }
    for name, body in sql_udfs.items():
        spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
        spark.sql(f"CREATE TEMPORARY FUNCTION {name}{body}")
        names.append(name)
    return names
