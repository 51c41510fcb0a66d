"""Covariance / PCA / projection: distributed aggregation vs numpy."""

from __future__ import annotations

import numpy as np

from lshrs_spark.operators.pca import (
    covariance_matrix,
    pca_components,
    pca_project,
    pca_whiten,
)


def _corpus(spark, n=200, d=8, seed=71):
    rng = np.random.default_rng(seed)
    # anisotropic: one dominant direction, so PC1 is unambiguous
    base = rng.standard_normal((n, d))
    base[:, 0] *= 5.0
    base[:, 1] *= 2.0
    X = base @ np.linalg.qr(rng.standard_normal((d, d)))[0]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    return df, X.astype(np.float32).astype(np.float64)


def test_covariance_matches_numpy(spark):
    df, X = _corpus(spark)
    got = {(r.i, r.j): r.cov for r in covariance_matrix(df).collect()}
    want = np.cov(X, rowvar=False, bias=True)   # population covariance
    for (i, j), c in got.items():
        assert abs(c - want[i - 1, j - 1]) < 1e-6, (i, j)
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2          # upper triangle only


def test_pca_components_deterministic_and_ordered(spark):
    df, X = _corpus(spark)
    comps, vals, means = pca_components(df, 3)
    comps2, vals2, _ = pca_components(df, 3)
    assert np.allclose(comps, comps2) and np.allclose(vals, vals2)
    assert vals[0] >= vals[1] >= vals[2] > 0
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-8)  # orthonormal
    nw_vals, nw_vecs = np.linalg.eigh(np.cov(X, rowvar=False, bias=True))
    assert abs(vals[0] - nw_vals[-1]) < 1e-5     # top eigenvalue agrees
    assert abs(abs(comps[0] @ nw_vecs[:, -1]) - 1.0) < 1e-5


def test_pca_project_matches_numpy(spark):
    df, X = _corpus(spark)
    comps, _, means = pca_components(df, 2)
    got = {r.id: np.array(r.projected) for r in
           pca_project(df, comps, means).collect()}
    want = (X - X.mean(axis=0)) @ comps.T
    for i, v in got.items():
        assert np.allclose(v, want[i], atol=1e-5), i
    # projected variance concentrates in PC1
    P = np.stack([got[i] for i in sorted(got)])
    assert P[:, 0].var() > P[:, 1].var()


def test_pca_whiten_unit_variance(spark):
    df, X = _corpus(spark)
    comps, vals, means = pca_components(df, 4)
    W = np.stack([np.array(r.whitened) for r in
                  pca_whiten(df, comps, vals, means).orderBy("id").collect()])
    assert np.allclose(W.var(axis=0), 1.0, atol=1e-3)   # isotropic
    assert np.allclose(W.mean(axis=0), 0.0, atol=1e-6)  # centered


def test_whitening_helps_pq_on_anisotropic_data(spark):
    """The reason pca_whiten exists in this engine: on a strongly
    anisotropic cloud, PQ codebooks trained on whitened vectors recall
    at least as well as on raw vectors (subspace quantizers stop being
    dominated by the top principal directions)."""
    from lshrs_spark.operators.knn import pq_adc_topk, pq_codebooks, pq_encode

    df, X = _corpus(spark, n=300, d=8, seed=83)

    def recall(vec_df, vecs, vec_col):
        cb = pq_codebooks(vec_df, m=4, k=8, dim=8, iterations=1,
                          vector_col=vec_col, id_col="id")
        codes = pq_encode(vec_df, cb, m=4, dim=8,
                          vector_col=vec_col, id_col="id")
        hits = 0
        for qi in (5, 50, 150):
            got = {r.id for r in
                   pq_adc_topk([float(x) for x in vecs[qi]], cb, codes,
                               10, m=4, dim=8).collect()}
            d2 = ((vecs - vecs[qi]) ** 2).sum(axis=1)
            exact = set(np.argsort(d2, kind="stable")[:10].tolist())
            hits += len(got & exact)
        return hits / 30.0

    raw = df.selectExpr("vec_id AS id", "embedding")
    r_raw = recall(raw, X, "embedding")

    comps, vals, means = pca_components(df, 8)
    wdf = pca_whiten(df, comps, vals, means)
    W = np.stack([np.array(r.whitened) for r in wdf.orderBy("id").collect()])
    r_white = recall(wdf, W, "whitened")
    # whitening must not hurt, and both must be meaningfully better
    # than chance (10/300)
    assert r_white >= r_raw - 1e-9
    assert r_white > 0.2 and r_raw > 0.03
