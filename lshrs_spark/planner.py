"""LSH parameter planning: choose (bands, rows_per_band) for a threshold.

Driver-side pure math — the only true "optimizer" the reference has
(``/root/reference/lshrs/utils/br.py``). Semantics preserved:

* S-curve collision probability ``P(s) = 1 - (1 - s^r)^b``
  (``br.py:120-159``).
* Threshold approximation ``t ~= (1/b)^(1/r)`` (``br.py:81-117``).
* False-positive / false-negative rates are the *unnormalized* integrals
  ``FP = int_0^t P(s) ds`` and ``FN = int_t^1 (1 - P(s)) ds``
  (``br.py:162-220`` — note the reference's docstring mentions dividing by
  the interval length but its code does not; we match the code).
* ``find_optimal_br``: exhaustive search over factorizations ``b*r =
  num_perm`` in both orientations, threshold within ``±tolerance``,
  minimizing ``FP + FN``; ``None`` when nothing qualifies (``br.py:223-322``).
* ``get_optimal_config``: precomputed table -> search -> sqrt-heuristic
  fallback (``br.py:325-395``).

Differences: quadrature is fixed-order Gauss-Legendre on numpy (scipy is
not available in this environment); accuracy ~1e-10 for these smooth
integrands, far below the 1e-2 scale the scores are compared at.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

__all__ = [
    "compute_lsh_threshold",
    "compute_collision_probability",
    "compute_false_rates",
    "find_optimal_br",
    "get_optimal_config",
    "config_analysis",
    "PRECOMPUTED_CONFIGS",
]

# Exhaustively pre-searched (bands, rows) per (num_perm, threshold); values
# match the reference's published table (``br.py:38-78``) so
# ``get_optimal_config`` returns identical configs for the common sizes.
PRECOMPUTED_CONFIGS: dict[int, dict[float, tuple[int, int]]] = {
    4096: {0.5: (512, 8), 0.7: (256, 16), 0.85: (128, 32), 0.9: (64, 64), 0.95: (32, 128)},
    8192: {0.4: (1024, 8), 0.7: (512, 16), 0.8: (256, 32), 0.85: (256, 32), 0.9: (128, 64), 0.95: (64, 128)},
    16384: {0.4: (2048, 8), 0.6: (1024, 16), 0.8: (512, 32), 0.85: (512, 32), 0.9: (256, 64), 0.95: (128, 128)},
    32768: {0.4: (4096, 8), 0.6: (2048, 16), 0.8: (1024, 32), 0.85: (1024, 32), 0.9: (512, 64), 0.95: (256, 128)},
    65536: {0.3: (8192, 8), 0.6: (4096, 16), 0.8: (2048, 32), 0.85: (1024, 64), 0.9: (1024, 64), 0.95: (512, 128)},
}

_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(128)


def compute_lsh_threshold(b: int, r: int) -> float:
    """Approximate S-curve inflection point ``t ~= (1/b)^(1/r)``."""
    return (1.0 / b) ** (1.0 / r)


def compute_collision_probability(similarity: float, b: int, r: int) -> float:
    """``P(collision) = 1 - (1 - s^r)^b`` for true similarity ``s``."""
    return 1.0 - (1.0 - similarity**r) ** b


def _scurve(s: np.ndarray, b: int, r: int) -> np.ndarray:
    # exp(b * log1p(-s^r)) is the stable form of (1 - s^r)^b for large b, r.
    sr = np.power(np.clip(s, 0.0, 1.0), r)
    with np.errstate(divide="ignore"):
        not_any_band = np.where(sr >= 1.0, 0.0, np.exp(b * np.log1p(-sr)))
    return 1.0 - not_any_band


def _integrate(f, lo: float, hi: float) -> float:
    """Fixed 128-node Gauss-Legendre quadrature of ``f`` on ``[lo, hi]``."""
    if hi <= lo:
        return 0.0
    mid = 0.5 * (hi + lo)
    half = 0.5 * (hi - lo)
    return float(half * np.sum(_GL_WEIGHTS * f(mid + half * _GL_NODES)))


def compute_multiprobe_collision_probability(
    similarity: float, b: int, r: int, extra: int
) -> tuple[float, float]:
    """``(lower, upper)`` bounds on ``P(>= 1 probed bucket collides)``
    under multi-probe LSH with ``extra`` single-bit flips per band
    (``hashing.multiprobe_keys_local``) — the planner-side companion
    to the measured ``lsh_multiprobe_recall`` gauge. Same ``s``
    convention as :func:`compute_collision_probability` (per-bit
    agreement probability). A band's exact key matches with ``s^r``;
    the single-bit-mismatch mass ``r*(1-s)*s^(r-1)`` is additionally
    recovered only when the mismatched bit is among the ``extra``
    flipped ones. Margin-guided flipping recovers at least the
    uniform-choice fraction ``extra/r`` of that mass (LOWER bound) and
    at most all of it (UPPER bound, perfect margin prediction —
    tight in practice for near-threshold neighbors, whose mismatched
    bit is almost always the closest-margin one). Two-bit mismatches
    are never recovered by single-flip probes, so both bounds ignore
    them. Use the bounds to size ``extra`` for a recall target before
    paying for the measured gauge on a real corpus."""
    if extra < 0:
        raise ValueError("extra must be >= 0")
    extra = min(extra, r)
    p_exact = similarity**r
    single = r * (1.0 - similarity) * similarity ** (r - 1)
    lo_band = p_exact + (extra / r) * single
    hi_band = p_exact + (single if extra else 0.0)
    return (
        1.0 - (1.0 - lo_band) ** b,
        1.0 - (1.0 - hi_band) ** b,
    )


def compute_false_rates(b: int, r: int, threshold: float) -> tuple[float, float]:
    """(FP, FN) = (∫₀ᵗ P(s) ds, ∫ₜ¹ 1-P(s) ds), uniform-similarity model."""
    fp = _integrate(lambda s: _scurve(s, b, r), 0.0, threshold)
    fn = _integrate(lambda s: 1.0 - _scurve(s, b, r), threshold, 1.0)
    return fp, fn


def _factor_pairs(num_perm: int):
    """Yield (b, r) with b*r == num_perm, small-r orientation first then
    small-b, matching the reference's two-pass enumeration order."""
    root = int(math.isqrt(num_perm))
    for r in range(1, root + 1):
        if num_perm % r == 0:
            yield num_perm // r, r
    for b in range(1, root + 1):
        if num_perm % b == 0:
            yield b, num_perm // b


def find_optimal_br(
    num_perm: int, target_threshold: float, tolerance: float = 0.05
) -> Optional[tuple[int, int]]:
    """Exhaustively search factorizations of ``num_perm`` for the (b, r)
    whose threshold lies within ``±tolerance`` of the target and whose
    FP+FN score is minimal; ``None`` if no factorization qualifies."""
    best: Optional[tuple[int, int]] = None
    best_score = math.inf
    for b, r in _factor_pairs(num_perm):
        if abs(compute_lsh_threshold(b, r) - target_threshold) > tolerance:
            continue
        fp, fn = compute_false_rates(b, r, target_threshold)
        if fp + fn < best_score:
            best_score = fp + fn
            best = (b, r)
    return best


def get_optimal_config(num_perm: int, target_threshold: float = 0.5) -> tuple[int, int]:
    """Three-tier (b, r) selection: precomputed table (threshold within
    0.05) -> exhaustive search -> sqrt heuristic with exact-factorization
    fix-up. Always returns ``b * r == num_perm``."""
    table = PRECOMPUTED_CONFIGS.get(num_perm)
    if table:
        closest = min(table, key=lambda t: abs(t - target_threshold))
        if abs(closest - target_threshold) <= 0.05:
            return table[closest]

    found = find_optimal_br(num_perm, target_threshold)
    if found:
        return found

    b = int(math.isqrt(num_perm))
    r = num_perm // b
    while b * r != num_perm:
        b -= 1
        if num_perm % b == 0:
            r = num_perm // b
    return b, r


def config_analysis(num_perm: int, target_threshold: float = 0.5) -> dict:
    """Diagnostic report for a chosen config (reference analogue:
    ``print_config_analysis``, ``br.py:398-465``) — returned as a dict so
    callers/tests can assert on it instead of parsing stdout."""
    b, r = get_optimal_config(num_perm, target_threshold)
    actual = compute_lsh_threshold(b, r)
    fp, fn = compute_false_rates(b, r, target_threshold)
    curve = {
        round(s, 2): compute_collision_probability(s, b, r)
        for s in (0.1, 0.3, 0.5, 0.7, 0.8, 0.9, 0.95, 0.99)
    }
    return {
        "num_perm": num_perm,
        "target_threshold": target_threshold,
        "bands": b,
        "rows_per_band": r,
        "actual_threshold": actual,
        "false_positive_rate": fp,
        "false_negative_rate": fn,
        "collision_probability": curve,
    }
