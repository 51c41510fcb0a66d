"""Hashing: determinism, packing, and bit-compatibility with the reference
(`/root/reference/lshrs/hash/lsh.py` — differential test, not a port)."""

from __future__ import annotations

import numpy as np
import pytest

from lshrs_spark import LSHConfig
from lshrs_spark.hashing import (
    band_matrices,
    hash_vectors_local,
    hash_vectors_local_long,
    projection_matrix,
    with_signatures,
)
from tests.conftest import load_reference_hasher

CFG = LSHConfig(dim=32, num_perm=16, num_bands=4, rows_per_band=4, seed=42)


def test_projection_matrices_deterministic():
    a = projection_matrix(CFG)
    b = projection_matrix(CFG)
    assert a.shape == (16, 32)
    np.testing.assert_array_equal(a, b)
    c = projection_matrix(CFG.with_(seed=43))
    assert not np.array_equal(a, c)


def test_signature_length_matches_reference_contract():
    cfg = LSHConfig(dim=16, num_perm=24, num_bands=2, rows_per_band=12, seed=1)
    sigs = hash_vectors_local(np.ones((1, 16)), cfg)[0]
    assert len(sigs) == 2
    assert all(len(s) == 2 for s in sigs)  # ceil(12/8) = 2 bytes


def test_bit_compatibility_with_reference(rng):
    ref = load_reference_hasher()
    for dim, b, r, seed in [(32, 4, 4, 42), (64, 8, 16, 42), (48, 3, 8, 7)]:
        cfg = LSHConfig(dim=dim, num_perm=b * r, num_bands=b, rows_per_band=r,
                        seed=seed)
        hasher = ref.LSHHasher(num_bands=b, rows_per_band=r, dim=dim, seed=seed)
        vecs = rng.standard_normal((20, dim)).astype(np.float32)
        ours = hash_vectors_local(vecs, cfg)
        for i in range(len(vecs)):
            theirs = hasher.hash_vector(vecs[i])
            assert ours[i] == tuple(theirs.bands), f"mismatch dim={dim} b={b} r={r} row={i}"


def test_long_and_binary_packing_agree(rng):
    vecs = rng.standard_normal((10, 32)).astype(np.float32)
    longs = hash_vectors_local_long(vecs, CFG)
    bins = hash_vectors_local(vecs, CFG)
    for i in range(10):
        for band in range(CFG.num_bands):
            expected = int.from_bytes(bins[i][band], "little")
            assert longs[i][band] == expected


def test_spark_signatures_match_local(spark, rng):
    vecs = rng.standard_normal((25, 32)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = (
        with_signatures(df, CFG, "embedding")
        .select("vec_id", "sigs")
        .collect()
    )
    local = hash_vectors_local_long(vecs, CFG)
    for row in rows:
        np.testing.assert_array_equal(np.array(row.sigs), local[row.vec_id])


def test_spark_binary_signatures_match_reference(spark, rng):
    ref = load_reference_hasher()
    hasher = ref.LSHHasher(num_bands=4, rows_per_band=4, dim=32, seed=42)
    vecs = rng.standard_normal((10, 32)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = (
        with_signatures(df, CFG, "embedding", sig_kind="binary")
        .select("vec_id", "sigs")
        .collect()
    )
    for row in rows:
        expected = hasher.hash_vector(vecs[row.vec_id])
        assert tuple(bytes(s) for s in row.sigs) == tuple(expected.bands)


def test_dim_mismatch_raises(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="dimension mismatch"):
        with_signatures(df, CFG, "embedding").collect()


def test_band_matrices_are_float32_by_default():
    assert all(m.dtype == np.float32 for m in band_matrices(CFG))
    cfg64 = CFG.with_(dtype="float64")
    assert all(m.dtype == np.float64 for m in band_matrices(cfg64))


def test_multiprobe_keys_flip_exactly_one_closest_margin_bit():
    """Multi-probe perturbations: num_bands*extra keys per query, each
    differing from the exact band signature in EXACTLY one bit, flipped
    in ascending |projection margin| order."""
    from lshrs_spark.config import LSHConfig
    from lshrs_spark.hashing import (
        hash_vectors_local,
        hash_vectors_local_long,
        multiprobe_keys_local,
        projection_matrix,
    )

    cfg = LSHConfig(dim=16, num_perm=16, num_bands=4, rows_per_band=4,
                    seed=42, dtype="float64")
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((5, 16))

    exact = hash_vectors_local_long(vecs, cfg)
    keys = multiprobe_keys_local(vecs, cfg, 2)
    z = np.abs(vecs @ projection_matrix(cfg).T).reshape(5, 4, 4)
    for i, qkeys in enumerate(keys):
        assert len(qkeys) == 4 * 2
        for b, sig in qkeys:
            diff = int(exact[i, b]) ^ sig
            assert diff != 0 and (diff & (diff - 1)) == 0   # one bit
            j = diff.bit_length() - 1
            # the flipped bit is among the 2 smallest margins of band b
            order = np.argsort(z[i, b], kind="stable")[:2]
            assert j in order
    # extra=0 -> no keys; extra > rows_per_band clamps
    assert multiprobe_keys_local(vecs, cfg, 0) == [[] for _ in range(5)]
    assert all(
        len(k) == 4 * 4 for k in multiprobe_keys_local(vecs, cfg, 99)
    )

    # binary kind agrees with the long kind bit-for-bit
    kb = multiprobe_keys_local(vecs, cfg, 2, sig_kind="binary")
    exact_b = hash_vectors_local(vecs, cfg)
    for i in range(5):
        longs = {(b, s) for b, s in keys[i]}
        for b, sb in kb[i]:
            as_long = int.from_bytes(sb, "little")
            assert (b, as_long) in longs
        assert len(kb[i]) == len(keys[i])
    with pytest.raises(ValueError, match=">= 0"):
        multiprobe_keys_local(vecs, cfg, -1)


def test_signatures_col_multiprobe_binary_parity(spark):
    """The binary-sig multiprobe UDF must emit exactly the exact
    signatures + multiprobe_keys_local's byte-flip keys (rows_per_band
    >= 64 configs use this path); negative multiprobe raises."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from lshrs_spark.config import LSHConfig
    from lshrs_spark.hashing import (
        hash_vectors_local,
        multiprobe_keys_local,
        with_signatures,
    )

    cfg = LSHConfig(dim=16, num_perm=16, num_bands=2, rows_per_band=8,
                    seed=7)
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((6, 16)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    T_ = 2
    out = with_signatures(df, cfg, sig_kind="binary", multiprobe=T_)
    rows = {r.vec_id: [bytes(b) for b in r.sigs] for r in out.collect()}
    for i, v in enumerate(vecs):
        got = rows[i]
        assert len(got) == cfg.num_bands * (1 + T_)
        exact = list(hash_vectors_local(v[None, :], cfg)[0])
        # band-major layout: exact tier first, band = pos % num_bands
        assert got[: cfg.num_bands] == exact
        extra = {(b, s) for b, s in
                 multiprobe_keys_local(v[None, :], cfg, T_,
                                       sig_kind="binary")[0]}
        got_extra = {(p % cfg.num_bands, s)
                     for p, s in enumerate(got[cfg.num_bands:],
                                           start=cfg.num_bands)}
        assert got_extra == extra
    with pytest.raises(ValueError, match="multiprobe"):
        with_signatures(df, cfg, sig_kind="binary", multiprobe=-1)
