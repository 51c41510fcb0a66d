"""NumPy ``.npy`` vector source (beyond-reference: the single-file
interchange format embeddings most often arrive in).

A ``.npy`` file is one dense ``(n, d)`` matrix — there is no row group,
column chunk, or split metadata, so naive loading reads the whole matrix
into the DRIVER and ships it through ``createDataFrame``. This loader
instead parallelizes over ROW RANGES: the driver memory-maps the file
only to validate the header and learn ``(n, d)``; each Arrow batch task
then memory-maps the same file on the executor and slices ITS contiguous
row range — no full materialization anywhere, I/O parallelism =
``partitions``. Requires the path to be readable from every executor
(local/NFS/fuse — the same contract as every mmap-able format).

The generator closure is self-contained (path + column-name strings +
numpy/pandas imports) because workers cannot import ``lshrs_spark``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

__all__ = ["load_npy_vectors"]


def load_npy_vectors(
    spark: SparkSession,
    source: str,
    *,
    index_column: str = "index",
    vector_column: str = "vector",
    limit: int | None = None,
    partitions: int | None = None,
    **_ignored,
) -> tuple[DataFrame, str, str]:
    """Read an ``(n, d)`` float ``.npy`` matrix as
    ``(index_column: long, vector_column: array<float>)`` with row index
    = row id. Returns ``(df, id_col, vector_col)`` for the ingest
    dispatcher; malformed shapes raise ``ValueError`` like the other
    sources."""
    header = np.load(source, mmap_mode="r")
    if header.ndim != 2:
        raise ValueError(
            f"npy source must be a 2-D (n, d) matrix, got shape "
            f"{header.shape}"
        )
    n = header.shape[0]
    if limit is not None:
        n = min(n, max(0, limit))
    parts = partitions or spark.sparkContext.defaultParallelism
    parts = max(1, min(parts, n or 1))
    path = str(source)
    idc, vcc = str(index_column), str(vector_column)

    def batches(it):
        import numpy as _np
        import pandas as _pd

        mat = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if mat is None:
                mat = _np.load(path, mmap_mode="r")
            ids = pdf["id"].to_numpy()
            lo, hi = int(ids.min()), int(ids.max()) + 1
            block = _np.asarray(mat[lo:hi], dtype=_np.float32)
            yield _pd.DataFrame(
                {idc: ids, vcc: [block[i - lo] for i in ids]}
            )

    df = spark.range(0, n, 1, parts).mapInPandas(
        batches, schema=f"{idc} long, {vcc} array<float>"
    )
    return df, index_column, vector_column
