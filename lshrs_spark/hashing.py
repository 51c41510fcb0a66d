"""Sign-random-projection (SRP) LSH signatures as a Spark column transform.

Semantics parity with the reference hasher
(``/root/reference/lshrs/hash/lsh.py:18-247``):

* projection matrices: per-band ``rng.standard_normal((rows_per_band, dim))``
  drawn from one ``np.random.default_rng(seed)`` stream, cast to float32 —
  reproducing that exact draw order makes our signatures bit-identical to
  the reference for the same ``(seed, dim, num_bands, rows_per_band)``.
* signature bit ``j`` of band ``b`` is ``1`` iff ``P[b,j] @ v > 0``;
  bits are packed little-endian (bit ``j`` -> weight ``2**j``), matching
  ``np.packbits(..., bitorder="little")``.

Spark-first differences (not a port):

* The per-vector Python loop of the reference
  (``lshrs/hash/lsh.py:169``, ``lshrs/core/main.py:513-515``) is replaced by
  ONE Arrow-vectorized pandas_udf doing a single ``(batch, dim) @ (dim,
  num_perm)`` matmul per Arrow batch for all bands at once.
* The stacked ``(num_perm, dim)`` matrix ships to executors via a Spark
  broadcast variable — never regenerated per task, never pickled per row.
* Signatures are emitted either as ``array<bigint>`` (``rows_per_band < 64``,
  join-friendly, used for the bucket index) or ``array<binary>`` (packed
  bytes, bit-identical to the reference's per-band ``bytes``).

Implementation note: the pandas_udf closures deliberately capture only
plain ints and the broadcast handle (no package objects), so cloudpickle
ships them fully by value and Python workers never need this package on
their ``sys.path`` — the driver harness owns the SparkSession.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import LSHConfig

__all__ = [
    "projection_matrix",
    "band_matrices",
    "signatures_col",
    "with_signatures",
    "hash_vectors_local",
    "hash_vectors_local_long",
    "multiprobe_keys_local",
]

# One broadcast per (spark app, config) — avoids re-broadcasting the matrix
# for every query when many operators share a config.
_BCAST_CACHE: dict = {}


def band_matrices(cfg: LSHConfig) -> list[np.ndarray]:
    """Per-band ``(rows_per_band, dim)`` matrices, identical draw order to the
    reference (``lshrs/hash/lsh.py:93-94``)."""
    rng = np.random.default_rng(cfg.seed)
    mats = [
        rng.standard_normal((cfg.rows_per_band, cfg.dim))
        for _ in range(cfg.num_bands)
    ]
    if cfg.dtype == "float32":
        mats = [m.astype(np.float32) for m in mats]
    return mats


def projection_matrix(cfg: LSHConfig) -> np.ndarray:
    """All bands stacked into one ``(num_perm, dim)`` matrix: row
    ``b * rows_per_band + j`` is hyperplane ``j`` of band ``b``."""
    return np.vstack(band_matrices(cfg))


def _broadcast_proj(spark: SparkSession, cfg: LSHConfig):
    # Key on applicationId (unique per context), NOT id(sparkContext):
    # CPython reuses freed addresses, so id() can collide after a
    # stop()/restart and hand back a destroyed broadcast.
    app = spark.sparkContext.applicationId
    key = (app, cfg.seed, cfg.dim, cfg.num_bands,
           cfg.rows_per_band, cfg.dtype)
    # Evict entries from other (stopped) contexts so repeated
    # stop()/restart cycles don't accumulate dead broadcasts + their
    # driver-side projection matrices.
    for stale in [k for k in _BCAST_CACHE if k[0] != app]:
        del _BCAST_CACHE[stale]
    b = _BCAST_CACHE.get(key)
    if b is None:
        np_dtype = np.float32 if cfg.dtype == "float32" else np.float64
        mat = np.ascontiguousarray(projection_matrix(cfg).T, dtype=np_dtype)
        b = spark.sparkContext.broadcast(mat)
        _BCAST_CACHE[key] = b
    return b


def signatures_col(
    spark: SparkSession,
    cfg: LSHConfig,
    vector_col: str = "embedding",
    *,
    sig_kind: Optional[str] = None,
    multiprobe: int = 0,
) -> Column:
    """Column expression computing SRP band signatures for a vector column.

    ``sig_kind``: "long" (default when ``rows_per_band < 64``) -> the column
    is ``array<bigint>`` with one little-endian packed value per band;
    "binary" -> ``array<binary>`` bit-identical to the reference signatures.

    ``multiprobe=T`` (DataFrame twin of :func:`multiprobe_keys_local`)
    appends, per band, the ``T`` closest-margin single-bit-flip
    perturbation keys to the array — margins are a free byproduct of the
    same matmul, so the corpus-scale probe job gets the multi-probe
    recall knob without a second projection pass or a local
    ``collect``. Array layout: ``[exact band 0..B-1, flip t=0 band
    0..B-1, flip t=1 band 0..B-1, ...]`` — position ``p`` belongs to
    band ``p % num_bands`` (what :func:`~lshrs_spark.operators.index.
    build_index` relies on when exploding)."""
    if sig_kind is None:
        sig_kind = "long" if cfg.use_long_sig else "binary"
    if sig_kind == "long" and not cfg.use_long_sig:
        raise ValueError("long signatures need rows_per_band < 64")
    if multiprobe < 0:
        raise ValueError("multiprobe must be >= 0")

    bproj = _broadcast_proj(spark, cfg)
    dim = cfg.dim
    num_bands = cfg.num_bands
    rows_per_band = cfg.rows_per_band
    use_f32 = cfg.dtype == "float32"
    n_extra = min(multiprobe, rows_per_band)

    if sig_kind == "long":

        @F.pandas_udf(T.ArrayType(T.LongType(), containsNull=False))
        def srp_long(s: pd.Series) -> pd.Series:
            import numpy as _np

            if s.empty:
                return pd.Series([], dtype=object)
            dt = _np.float32 if use_f32 else _np.float64
            mat = _np.stack(s.to_numpy()).astype(dt, copy=False)
            if mat.ndim != 2 or mat.shape[1] != dim:
                raise ValueError(
                    f"vector dimension mismatch: expected {dim}, got {mat.shape}"
                )
            z = mat @ bproj.value
            bits = z > 0
            weights = 1 << _np.arange(rows_per_band, dtype=_np.int64)
            sigs = bits.reshape(len(mat), num_bands, rows_per_band).astype(
                _np.int64) @ weights
            if n_extra == 0:
                return pd.Series(list(sigs))
            # same margin/tie-break rule as multiprobe_keys_local:
            # ascending |margin|, stable on equal margins
            margins = _np.abs(z).reshape(len(mat), num_bands, rows_per_band)
            order = _np.argsort(margins, axis=2, kind="stable")[:, :, :n_extra]
            flips = sigs[:, :, None] ^ (
                _np.int64(1) << order.astype(_np.int64)
            )                                             # (n, B, T)
            flat = _np.concatenate(
                [sigs, flips.transpose(0, 2, 1).reshape(len(mat), -1)], axis=1
            )
            return pd.Series(list(flat))

        return srp_long(F.col(vector_col))

    @F.pandas_udf(T.ArrayType(T.BinaryType(), containsNull=False))
    def srp_binary(s: pd.Series) -> pd.Series:
        import numpy as _np

        if s.empty:
            return pd.Series([], dtype=object)
        dt = _np.float32 if use_f32 else _np.float64
        mat = _np.stack(s.to_numpy()).astype(dt, copy=False)
        if mat.ndim != 2 or mat.shape[1] != dim:
            raise ValueError(
                f"vector dimension mismatch: expected {dim}, got {mat.shape}"
            )
        z = mat @ bproj.value
        bits = z > 0
        banded = bits.reshape(len(mat), num_bands, rows_per_band)
        packed = _np.packbits(banded, axis=2, bitorder="little")
        if n_extra == 0:
            return pd.Series(
                [[bytes(packed[i, b]) for b in range(num_bands)]
                 for i in range(len(mat))]
            )
        margins = _np.abs(z).reshape(len(mat), num_bands, rows_per_band)
        order = _np.argsort(margins, axis=2, kind="stable")[:, :, :n_extra]
        out = []
        for i in range(len(mat)):
            row = [bytes(packed[i, b]) for b in range(num_bands)]
            for t in range(n_extra):
                for b in range(num_bands):
                    j = int(order[i, b, t])
                    ba = bytearray(packed[i, b].tobytes())
                    ba[j // 8] ^= 1 << (j % 8)
                    row.append(bytes(ba))
            out.append(row)
        return pd.Series(out)

    return srp_binary(F.col(vector_col))


def with_signatures(
    df: DataFrame,
    cfg: LSHConfig,
    vector_col: str = "embedding",
    out_col: str = "sigs",
    *,
    sig_kind: Optional[str] = None,
    multiprobe: int = 0,
) -> DataFrame:
    """Append the band-signature array column to ``df``."""
    spark = df.sparkSession
    return df.withColumn(
        out_col,
        signatures_col(spark, cfg, vector_col, sig_kind=sig_kind,
                       multiprobe=multiprobe),
    )


def _local_bits(vectors: np.ndarray, cfg: LSHConfig) -> np.ndarray:
    vectors = np.asarray(
        vectors, dtype=np.float32 if cfg.dtype == "float32" else np.float64
    )
    if vectors.ndim == 1:
        vectors = vectors[None, :]
    if vectors.shape[1] != cfg.dim:
        raise ValueError(
            f"vector dimension mismatch: expected {cfg.dim}, got {vectors.shape[1]}"
        )
    return (vectors @ projection_matrix(cfg).T) > 0


def hash_vectors_local(vectors: np.ndarray, cfg: LSHConfig) -> list[tuple[bytes, ...]]:
    """Driver-side signatures as per-band packed ``bytes`` — the exact shape
    of the reference ``HashSignatures.bands`` for differential testing, and
    for hashing single query vectors without a Spark job."""
    bits = _local_bits(vectors, cfg)
    banded = bits.reshape(len(bits), cfg.num_bands, cfg.rows_per_band)
    packed = np.packbits(banded, axis=2, bitorder="little")
    return [
        tuple(bytes(packed[i, b]) for b in range(cfg.num_bands))
        for i in range(len(bits))
    ]


def hash_vectors_local_long(vectors: np.ndarray, cfg: LSHConfig) -> np.ndarray:
    """Driver-side long-packed signatures, shape ``(n, num_bands)``."""
    if not cfg.use_long_sig:
        raise ValueError(
            "long signatures need rows_per_band < 64 "
            f"(got {cfg.rows_per_band}); use hash_vectors_local (binary)"
        )
    bits = _local_bits(vectors, cfg)
    weights = 1 << np.arange(cfg.rows_per_band, dtype=np.int64)
    return bits.reshape(len(bits), cfg.num_bands, cfg.rows_per_band).astype(
        np.int64) @ weights


def multiprobe_keys_local(
    vectors: np.ndarray, cfg: LSHConfig, extra: int,
    *, sig_kind: str | None = None,
) -> list:
    """EXTRA probe keys per query for multi-probe LSH (Lv et al.,
    VLDB 2007): for each band, the ``extra`` single-bit-flip
    perturbations of the band signature, flipping bits in ascending
    ``|projection margin|`` order — the hyperplanes the query sits
    closest to, i.e. the bits most likely to differ on a true
    near-neighbor. Probing these buckets raises recall WITHOUT more
    hash tables (bands) or a second index: the same O(1) pruned
    lookups, just ``num_bands * extra`` more of them. Size ``extra``
    with the analytic bounds of
    :func:`lshrs_spark.planner.compute_multiprobe_collision_probability`
    and validate on a corpus with the ``lsh_multiprobe_recall`` gauge.

    Returns one list per query of ``(band, sig)`` keys — the exact
    signatures are NOT included (callers already have them from
    ``hash_vectors_local[_long]``; this returns only the additions).
    ``sig_kind`` follows the index layout: ``"long"`` (default when
    ``rows_per_band < 64``) XORs the packed int64, ``"binary"`` flips
    the bit inside the little-bitorder packed bytes."""
    if extra < 0:
        raise ValueError("extra must be >= 0")
    if sig_kind is None:
        sig_kind = "long" if cfg.use_long_sig else "binary"
    vectors = np.atleast_2d(np.asarray(
        vectors, dtype=np.float32 if cfg.dtype == "float32" else np.float64
    ))
    r = cfg.rows_per_band
    extra = min(extra, r)
    if extra == 0:
        return [[] for _ in range(len(vectors))]
    # ONE projection pass: the same expression as _local_bits yields
    # both the bits (sign) and the margins (magnitude), so the exact
    # signatures are packed here from z rather than re-running the
    # matmul inside hash_vectors_local[_long]
    z = vectors @ projection_matrix(cfg).T
    bits = (z > 0).reshape(len(vectors), cfg.num_bands, r)
    margins = np.abs(z).reshape(len(vectors), cfg.num_bands, r)
    # stable: equal margins keep ascending bit order, matching the
    # oracle's ORDER BY abs(margin), j
    order = np.argsort(margins, axis=2, kind="stable")
    out: list = []
    if sig_kind == "long":
        weights = 1 << np.arange(r, dtype=np.int64)
        sigs = bits.astype(np.int64) @ weights          # (n, bands)
        for i in range(len(vectors)):
            keys = []
            for b in range(cfg.num_bands):
                for t in range(extra):
                    j = int(order[i, b, t])
                    keys.append((b, int(sigs[i, b]) ^ (1 << j)))
            out.append(keys)
    else:
        packed = np.packbits(bits, axis=2, bitorder="little")
        for i in range(len(vectors)):
            keys = []
            for b in range(cfg.num_bands):
                for t in range(extra):
                    j = int(order[i, b, t])
                    ba = bytearray(bytes(packed[i, b]))
                    ba[j // 8] ^= 1 << (j % 8)
                    keys.append((b, bytes(ba)))
            out.append(keys)
    return out
