"""Covariance + PCA over an embedding column — the dimensionality
preprocessing step of a vector pipeline (whitened/reduced vectors make
both SRP-LSH and PQ codebooks noticeably better behaved).

Spark-first split of the work:

* :func:`covariance_matrix` — the O(n·d²) part runs as DataFrame
  aggregations: one ``posexplode`` to ``(id, i, x_i)``, an id-equi-join
  to form pairwise products, and a ``groupBy (i, j)`` average with
  map-side partial aggregation — the shuffle carries d² cells per
  partition, never n·d² rows. This is the piece that must scale and the
  piece a SQL oracle recomputes (`emb_covariance`).
* :func:`pca_components` — the O(d³) eigendecomposition of the (tiny,
  d×d) collected covariance happens driver-side in numpy: iterative
  eigensolvers are exactly the kind of scalar math that does NOT belong
  in a distributed plan. Deterministic: ``numpy.linalg.eigh`` on a
  symmetric matrix with a fixed sign convention (largest-|component|
  coordinate made positive).
* :func:`pca_project` — projection back onto the corpus is pure
  Catalyst (one ``aggregate(zip_with(...))`` dot product per retained
  component, components inlined as literals — same recipe as the SRP
  projection oracle), so it runs inside whole-stage codegen with no
  Python and no shuffle.

Reference scope note: the reference engine (mxngjxa/lshrs) has no
dimensionality preprocessing — this module belongs to the
beyond-reference pipeline surface.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["covariance_matrix", "pca_components", "pca_project", "pca_whiten"]


def covariance_matrix(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    round_decimals: int | None = None,
    upper_only: bool = True,
) -> DataFrame:
    """Population covariance ``(i, j, cov)`` of the embedding
    coordinates (1-based dims, ``i <= j`` when ``upper_only`` — the
    matrix is symmetric). ``cov = E[x_i x_j] - E[x_i] E[x_j]``."""
    x = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(
            F.transform(F.col(vector_col), lambda v: v.cast("double"))
        ).alias("p", "x"),
    ).select("id", (F.col("p") + 1).alias("i"), "x")
    a = x.select("id", F.col("i"), F.col("x"))
    b = x.select("id", F.col("i").alias("j"), F.col("x").alias("y"))
    pairs = a.join(b, "id")
    if upper_only:
        pairs = pairs.filter(F.col("i") <= F.col("j"))
    exy = pairs.groupBy("i", "j").agg(F.avg(F.col("x") * F.col("y")).alias("exy"))
    means = x.groupBy("i").agg(F.avg("x").alias("m"))
    cov = (
        exy.join(means.select(F.col("i"), F.col("m").alias("mi")), "i")
        .join(means.select(F.col("i").alias("j"), F.col("m").alias("mj")), "j")
        .select(
            F.col("i").cast("long"),
            F.col("j").cast("long"),
            (F.col("exy") - F.col("mi") * F.col("mj")).alias("cov"),
        )
    )
    if round_decimals is not None:
        cov = cov.select("i", "j", F.round("cov", round_decimals).alias("cov"))
    return cov


def pca_components(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-``k`` principal components of the embedding corpus:
    ``(components, variances, means)`` with ``components`` shaped
    ``(k, d)`` (rows = descending eigenvalue order), ``variances`` the
    matching eigenvalues, and ``means`` the per-coordinate corpus means
    (PCA projects CENTERED data — pass them to :func:`pca_project`).
    The covariance is computed distributed, collected (d×d — tiny), and
    eigendecomposed driver-side. Deterministic sign: each component's
    largest-|coordinate| entry is made positive."""
    rows = covariance_matrix(
        df, id_col=id_col, vector_col=vector_col, upper_only=True
    ).collect()
    d = max(int(r.j) for r in rows)
    if not 1 <= k <= d:
        raise ValueError(f"need 1 <= k <= dim, got k={k} dim={d}")
    cov = np.zeros((d, d))
    for r in rows:
        cov[r.i - 1, r.j - 1] = r.cov
        cov[r.j - 1, r.i - 1] = r.cov
    mrows = (
        df.select(
            F.posexplode(
                F.transform(F.col(vector_col), lambda v: v.cast("double"))
            ).alias("p", "x")
        )
        .groupBy("p")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    means = np.zeros(d)
    for r in mrows:
        means[r.p] = r.m
    vals, vecs = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                  # (k, d)
    for c in comps:                           # deterministic sign
        if c[int(np.argmax(np.abs(c)))] < 0:
            c *= -1.0
    return comps, vals[order], means


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray | None = None,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    out_col: str = "projected",
    round_decimals: int | None = None,
) -> DataFrame:
    """``(id, out_col)``: embeddings (centered by ``mean`` when given)
    projected onto the given ``(k, d)`` component rows. Components and
    mean are inlined as literal arrays (they are model parameters, like
    the SRP hyperplanes), so the whole projection is codegen'd dot
    products — no Python, no shuffle, no broadcast table."""
    comps = np.asarray(components, dtype=np.float64)
    v = F.transform(F.col(vector_col), lambda x: x.cast("double"))
    if mean is not None:
        mlit = F.array(*[F.lit(float(x)) for x in np.asarray(mean)])
        v = F.zip_with(v, mlit, lambda x, y: x - y)
    dots = []
    for c in comps:
        lit = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(v, lit, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if round_decimals is not None:
            dot = F.round(dot, round_decimals)
        dots.append(dot)
    return df.select(
        F.col(id_col).cast("long").alias("id"), F.array(*dots).alias(out_col)
    )


def pca_whiten(
    df: DataFrame,
    components: np.ndarray,
    variances: np.ndarray,
    mean: np.ndarray,
    *,
    eps: float = 1e-9,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    out_col: str = "whitened",
    round_decimals: int | None = None,
) -> DataFrame:
    """PCA whitening: centered projection with each component scaled to
    unit variance (``1/sqrt(lambda_k + eps)``) — the preprocessing that
    makes SRP-LSH hyperplanes and PQ subspace codebooks see an isotropic
    cloud instead of one dominated by the top principal directions.
    Implemented by scaling the component rows driver-side and reusing
    the codegen'd literal projection — same plan shape, zero extra
    cost."""
    comps = np.asarray(components, dtype=np.float64)
    scale = 1.0 / np.sqrt(np.asarray(variances, dtype=np.float64) + eps)
    return pca_project(
        df,
        comps * scale[:, None],
        mean,
        id_col=id_col,
        vector_col=vector_col,
        out_col=out_col,
        round_decimals=round_decimals,
    )
