"""DuckDB oracle-SQL generators.

The driver validates every ``queries()`` entry against an ANSI-SQL oracle
run by DuckDB over the same parquet tables. LSH signatures are normally
computed by a seeded NumPy projection — not something DuckDB can generate —
so for oracle-checked entries we use a small config and *inline the exact
projection hyperplanes as SQL array literals*, making the oracle recompute
signatures from first principles via ``list_dot_product``.

Precision contract: oracle entries use ``dtype="float64"`` configs so both
engines do the identical double-precision matmul over the same float32
parquet values (divergence ~1e-16, sign flips at the ``> 0`` threshold
require |dot| < 1e-12 — not observed on the test corpus; scores compared
after ROUND(...,5)).
"""

from __future__ import annotations

from .config import LSHConfig
from .hashing import projection_matrix

__all__ = ["ORACLE_CFG", "sig_band_expr", "sigs_cte", "h48_sql", "cosine_sql"]

# Small config for oracle-checked LSH entries: 4 bands x 8 rows over dim 64.
# float64 so DuckDB (always double) and our pandas_udf agree bit-for-bit.
ORACLE_CFG = LSHConfig(
    dim=64, num_perm=32, num_bands=4, rows_per_band=8, seed=42, dtype="float64"
)


def _array_literal(row) -> str:
    return "[" + ",".join(repr(float(x)) for x in row) + "]::DOUBLE[]"


def sig_band_expr(cfg: LSHConfig, band: int, emb_col: str = "embedding") -> str:
    """Little-endian packed band signature as a DuckDB BIGINT expression:
    bit j set iff ``hyperplane[band*r+j] . v > 0`` — mirrors
    ``hashing.signatures_col`` exactly."""
    proj = projection_matrix(cfg)
    r = cfg.rows_per_band
    terms = []
    for j in range(r):
        lit = _array_literal(proj[band * r + j])
        terms.append(
            f"(CASE WHEN list_dot_product({emb_col}, {lit}) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")::BIGINT"


def sigs_cte(
    cfg: LSHConfig,
    table: str = "embeddings",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """CTE body producing ``(id, band, sig)`` for every row of ``table`` —
    the SQL twin of ``operators.index.build_index``."""
    base_cols = ", ".join(
        f"{sig_band_expr(cfg, b, emb_col)} AS s{b}" for b in range(cfg.num_bands)
    )
    unions = " UNION ALL ".join(
        f"SELECT id, {b} AS band, s{b} AS sig FROM _sigbase"
        for b in range(cfg.num_bands)
    )
    return (
        f"_sigbase AS (SELECT {id_col} AS id, {base_cols} FROM {table}), "
        f"sigs AS ({unions})"
    )


def hexint_sql(hex_expr: str, nchars: int) -> str:
    """Parse the first ``nchars`` hex characters of a string expression
    into a BIGINT (nchars <= 15 to stay in int64). The outer ::BIGINT
    matters: DuckDB's list_sum yields HUGEINT, which pandas widens to
    float64 and the driver's schema compare would flag."""
    return (
        f"(list_sum(list_transform(generate_series(1,{nchars}), "
        f"i -> (strpos('0123456789abcdef', substr({hex_expr},i,1))-1)::BIGINT"
        f" << (({nchars}-i)*4))))::BIGINT"
    )


def h48_sql(expr: str) -> str:
    """Portable 48-bit string hash — the DuckDB twin of
    ``functions.text.h48`` (int of first 12 hex chars of md5)."""
    return hexint_sql(f"md5({expr})", 12)


def cosine_sql(a: str, b: str) -> str:
    """Double-precision cosine similarity (twin of
    ``functions.vector.cosine_similarity``)."""
    return (
        f"(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))))"
    )
