"""LSH configuration for the Spark-native engine.

Parity target: the constructor contract of the reference orchestrator
(``/root/reference/lshrs/core/main.py:154-266``): ``num_bands *
rows_per_band == num_perm`` is enforced, auto-configuration kicks in when
either band parameter is omitted, and validation errors use the same
messages so callers can port their error handling unchanged.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Optional


@dataclass(frozen=True)
class LSHConfig:
    """Immutable LSH parameters.

    Attributes:
        dim: vector dimensionality (immutable per index).
        num_perm: total number of hyperplanes (= num_bands * rows_per_band).
        num_bands: number of bands; auto-configured if None.
        rows_per_band: hyperplanes per band; auto-configured if None.
        similarity_threshold: target cosine threshold used by auto-config.
        seed: RNG seed for the projection matrices (reproducible).
        dtype: "float32" (bit-compatible with the reference) or "float64"
            (used for oracle-parity paths where DuckDB computes in double).
        buffer_size: single-ingest buffer threshold — ``ingest()`` flushes
            automatically once this many vectors are pending (reference
            contract: ``lshrs/core/main.py:158-173,1131-1143``).
    """

    dim: int
    num_perm: int = 128
    num_bands: Optional[int] = None
    rows_per_band: Optional[int] = None
    similarity_threshold: float = 0.5
    seed: int = 42
    dtype: str = "float32"
    buffer_size: int = 10_000

    def __post_init__(self) -> None:
        if self.dim <= 0:
            raise ValueError("Vector dimensionality must be greater than zero")
        if self.num_perm <= 0:
            raise ValueError("num_perm must be greater than zero")
        if self.buffer_size <= 0:
            raise ValueError("buffer_size must be greater than zero")
        if self.dtype not in ("float32", "float64"):
            raise ValueError(f"unsupported dtype: {self.dtype}")
        if self.num_bands is None or self.rows_per_band is None:
            from .planner import get_optimal_config

            b, r = get_optimal_config(self.num_perm, self.similarity_threshold)
            object.__setattr__(self, "num_bands", b)
            object.__setattr__(self, "rows_per_band", r)
        if self.num_bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                "num_bands * rows_per_band must equal num_perm "
                f"(received {self.num_bands} * {self.rows_per_band} != {self.num_perm})"
            )

    @property
    def sig_bytes(self) -> int:
        """Packed byte length of one band signature."""
        return math.ceil(self.rows_per_band / 8)

    @property
    def use_long_sig(self) -> bool:
        """Long-typed signatures are join-friendlier; valid when the packed
        band fits into a non-negative int64 (< 64 bits)."""
        return self.rows_per_band < 64

    def with_(self, **kw) -> "LSHConfig":
        return replace(self, **kw)

    def to_dict(self) -> dict:
        return {
            "dim": self.dim,
            "num_perm": self.num_perm,
            "num_bands": self.num_bands,
            "rows_per_band": self.rows_per_band,
            "similarity_threshold": self.similarity_threshold,
            "seed": self.seed,
            "dtype": self.dtype,
            "buffer_size": self.buffer_size,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "LSHConfig":
        return cls(**{k: d[k] for k in (
            "dim", "num_perm", "num_bands", "rows_per_band",
            "similarity_threshold", "seed", "dtype", "buffer_size") if k in d})
