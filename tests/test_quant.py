"""Scalar quantization: roundtrip bounds, constant dims, shuffle-free plan."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from lshrs_spark.operators.quant import (
    dequantize_col,
    dim_minmax,
    quantization_params,
    quantize_col,
)


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_roundtrip_error_bounded_by_half_step(spark):
    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((200, 8)).astype(np.float32)
    df = _df(spark, vecs)
    lo, hi = quantization_params(df)
    recon = dequantize_col(quantize_col(F.col("embedding"), lo, hi), lo, hi)
    err = df.select(
        F.posexplode(
            F.zip_with(
                F.transform(F.col("embedding"), lambda x: x.cast("double")),
                recon,
                lambda x, y: F.abs(x - y),
            )
        ).alias("pos", "e")
    )
    max_err = {r.pos: r.e for r in
               err.groupBy("pos").agg(F.max("e").alias("e")).collect()}
    for d in range(8):
        half_step = (hi[d] - lo[d]) / 255.0 / 2.0
        assert max_err[d] <= half_step + 1e-12


def test_constant_dimension_codes_to_zero_and_reconstructs(spark):
    vecs = [[1.0, 5.0], [2.0, 5.0], [3.0, 5.0]]
    df = _df(spark, vecs)
    lo, hi = quantization_params(df)
    assert (lo[1], hi[1]) == (5.0, 5.0)
    out = df.select(
        quantize_col(F.col("embedding"), lo, hi).alias("c"),
        dequantize_col(
            quantize_col(F.col("embedding"), lo, hi), lo, hi
        ).alias("r"),
    ).collect()
    for row in out:
        assert row.c[1] == 0
        assert row.r[1] == 5.0  # lo + 0 -> exact for constant dims


def test_quantize_map_is_shuffle_free(spark):
    """The whole quantize/dequantize pipeline must be a narrow map —
    parameters are inlined literals, never a join (the 100 TB shape)."""
    rng = np.random.default_rng(22)
    df = _df(spark, rng.standard_normal((50, 4)).astype(np.float32))
    lo, hi = quantization_params(df)
    q = df.select(
        "vec_id", dequantize_col(
            quantize_col(F.col("embedding"), lo, hi), lo, hi
        ).alias("r")
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_dim_minmax_matches_numpy(spark):
    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((100, 6)).astype(np.float32)
    df = _df(spark, vecs)
    got = {r.dim: (r.lo, r.hi) for r in dim_minmax(df).collect()}
    v64 = vecs.astype(np.float64)
    for d in range(6):
        assert got[d + 1][0] == v64[:, d].min()
        assert got[d + 1][1] == v64[:, d].max()
