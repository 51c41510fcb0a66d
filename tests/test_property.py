"""Property-based tests (hypothesis) for the driver-side math: packing
round-trips, planner invariants, S-curve shape."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lshrs_spark import LSHConfig
from lshrs_spark.hashing import hash_vectors_local, hash_vectors_local_long
from lshrs_spark.planner import (
    compute_collision_probability,
    compute_false_rates,
    compute_lsh_threshold,
    get_optimal_config,
)


@settings(max_examples=25, deadline=None)
@given(
    dim=st.integers(4, 48),
    bands=st.integers(1, 6),
    rows=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_long_and_binary_packing_always_agree(dim, bands, rows, seed, data):
    """little-endian long packing == int.from_bytes(packed bytes) for any
    config and any vector."""
    cfg = LSHConfig(dim=dim, num_perm=bands * rows, num_bands=bands,
                    rows_per_band=rows, seed=seed)
    raw = data.draw(
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=32),
            min_size=dim, max_size=dim,
        )
    )
    vec = np.array(raw, dtype=np.float32)
    if not np.any(vec):
        vec[0] = 1.0
    longs = hash_vectors_local_long(vec, cfg)[0]
    byts = hash_vectors_local(vec, cfg)[0]
    for b in range(bands):
        assert longs[b] == int.from_bytes(byts[b], "little")
        assert 0 <= longs[b] < (1 << rows)


@settings(max_examples=50, deadline=None)
@given(num_perm=st.integers(1, 2048), t=st.floats(0.05, 0.99))
def test_optimal_config_always_factors_exactly(num_perm, t):
    b, r = get_optimal_config(num_perm, t)
    assert b >= 1 and r >= 1
    assert b * r == num_perm


@settings(max_examples=50, deadline=None)
@given(b=st.integers(1, 512), r=st.integers(1, 128))
def test_threshold_in_unit_interval(b, r):
    t = compute_lsh_threshold(b, r)
    assert 0.0 < t <= 1.0


@settings(max_examples=30, deadline=None)
@given(
    b=st.integers(1, 64),
    r=st.integers(1, 32),
    s1=st.floats(0.0, 1.0),
    s2=st.floats(0.0, 1.0),
)
def test_scurve_monotone_and_bounded(b, r, s1, s2):
    lo, hi = sorted((s1, s2))
    p_lo = compute_collision_probability(lo, b, r)
    p_hi = compute_collision_probability(hi, b, r)
    assert -1e-12 <= p_lo <= 1 + 1e-12
    assert p_hi >= p_lo - 1e-12


@settings(max_examples=20, deadline=None)
@given(b=st.integers(1, 64), r=st.integers(1, 32), t=st.floats(0.05, 0.95))
def test_false_rates_within_interval_mass(b, r, t):
    fp, fn = compute_false_rates(b, r, t)
    assert -1e-9 <= fp <= t + 1e-9
    assert -1e-9 <= fn <= (1 - t) + 1e-9
    assert math.isfinite(fp) and math.isfinite(fn)
