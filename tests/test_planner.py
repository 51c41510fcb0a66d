"""Parameter planner: closed-form checks mirroring the reference test
strategy (SURVEY.md §5: `tests/test_lshrs.py:164-196`)."""

from __future__ import annotations

import math

import pytest

from lshrs_spark.planner import (
    compute_collision_probability,
    compute_false_rates,
    compute_lsh_threshold,
    config_analysis,
    find_optimal_br,
    get_optimal_config,
)


def test_threshold_closed_form():
    for b, r in [(16, 8), (64, 64), (10, 10)]:
        assert compute_lsh_threshold(b, r) == pytest.approx((1 / b) ** (1 / r))


def test_scurve_monotone_increasing():
    probs = [compute_collision_probability(s / 20, 16, 8) for s in range(21)]
    assert all(b >= a - 1e-12 for a, b in zip(probs, probs[1:]))
    assert probs[0] == pytest.approx(0.0)
    assert probs[-1] == pytest.approx(1.0)


def test_false_rates_bounds():
    fp, fn = compute_false_rates(16, 8, 0.7)
    assert 0.0 <= fp <= 0.7 + 1e-9   # integral over [0, t] of a [0,1] fn
    assert 0.0 <= fn <= 0.3 + 1e-9   # integral over [t, 1]
    # tighter bands -> harsher curve -> lower FP at same threshold
    fp_strict, _ = compute_false_rates(4, 32, 0.7)
    assert fp_strict < fp


def test_precomputed_table_checkpoints():
    assert get_optimal_config(4096, 0.9) == (64, 64)
    assert get_optimal_config(16384, 0.8) == (512, 32)


def test_optimal_config_always_factors():
    for num_perm in [128, 100, 96, 37, 4096]:
        for t in [0.3, 0.5, 0.8, 0.95]:
            b, r = get_optimal_config(num_perm, t)
            assert b * r == num_perm


def test_find_optimal_br_threshold_within_tolerance():
    cfg = find_optimal_br(4096, 0.9, tolerance=0.05)
    assert cfg is not None
    b, r = cfg
    assert abs(compute_lsh_threshold(b, r) - 0.9) <= 0.05


def test_find_optimal_br_none_when_impossible():
    # prime num_perm only factors as 1 x p / p x 1 — thresholds ~0 or ~1
    assert find_optimal_br(13, 0.5, tolerance=0.01) is None


def test_config_analysis_report():
    rep = config_analysis(128, 0.5)
    assert rep["bands"] * rep["rows_per_band"] == 128
    assert 0 < rep["actual_threshold"] < 1
    assert math.isfinite(rep["false_positive_rate"])
    assert rep["collision_probability"][0.99] > rep["collision_probability"][0.1]


def test_multiprobe_collision_probability_bounds():
    """Planner-side multi-probe bounds: extra=0 degenerates to the
    exact-probe S-curve, bounds are ordered and monotone in extra, and
    extra=r makes them coincide (every single-mismatch recovered)."""
    from lshrs_spark.planner import (
        compute_collision_probability,
        compute_multiprobe_collision_probability,
    )

    b, r = 8, 16
    for s in (0.3, 0.6, 0.85, 0.95):
        base = compute_collision_probability(s, b, r)
        lo0, hi0 = compute_multiprobe_collision_probability(s, b, r, 0)
        assert lo0 == hi0 == pytest.approx(base)
        prev_lo = base
        for extra in (1, 2, 4, 16):
            lo, hi = compute_multiprobe_collision_probability(s, b, r, extra)
            assert base <= lo <= hi <= 1.0
            assert lo >= prev_lo - 1e-15          # monotone in extra
            prev_lo = lo
        lo_full, hi_full = compute_multiprobe_collision_probability(
            s, b, r, r
        )
        assert lo_full == pytest.approx(hi_full)
        # clamping: extra beyond r changes nothing
        assert compute_multiprobe_collision_probability(
            s, b, r, 99
        ) == pytest.approx((lo_full, hi_full))
    with pytest.raises(ValueError):
        compute_multiprobe_collision_probability(0.5, b, r, -1)
