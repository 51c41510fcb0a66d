from .dispatch import resolve_loader  # noqa: F401
from .parquet import load_parquet_vectors  # noqa: F401
from .jdbc import load_postgres_vectors  # noqa: F401
