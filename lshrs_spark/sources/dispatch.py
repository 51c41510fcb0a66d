"""Format-string -> loader dispatch (reference S3: ``_resolve_loader``,
``/root/reference/lshrs/core/main.py:1159-1196``): case-insensitive,
``postgres``/``pg`` and ``parquet``/``pq`` aliases, ``ValueError`` on
anything else. Beyond the reference's two formats, JSONL (the ML-corpus
interchange format) and CSV (array-string cells) dispatch to
:mod:`.delimited`, ORC to Spark's native reader, and ``.npy`` matrices
to the range-parallel mmap loader in :mod:`.npy`."""

from __future__ import annotations

from .delimited import load_csv_vectors, load_jsonl_vectors
from .jdbc import load_postgres_vectors
from .npy import load_npy_vectors
from .parquet import load_orc_vectors, load_parquet_vectors

__all__ = ["resolve_loader"]

_LOADERS = {
    "parquet": load_parquet_vectors,
    "pq": load_parquet_vectors,
    "postgres": load_postgres_vectors,
    "pg": load_postgres_vectors,
    "jsonl": load_jsonl_vectors,
    "json": load_jsonl_vectors,
    "csv": load_csv_vectors,
    "orc": load_orc_vectors,
    "npy": load_npy_vectors,
    "numpy": load_npy_vectors,
}


def resolve_loader(format: str):
    key = (format or "").strip().lower()
    loader = _LOADERS.get(key)
    if loader is None:
        raise ValueError(
            f"Unsupported format: {format!r}. Supported formats: "
            "'postgres' ('pg'), 'parquet' ('pq'), 'jsonl' ('json'), "
            "'csv', 'orc', 'npy' ('numpy')"
        )
    return loader
