"""lshrs_spark — a PySpark-native rebuild of the query/data-processing
capabilities of ``mxngjxa/lshrs`` (SRP-LSH approximate nearest-neighbor
search), extended with the operators a large-scale training-data pipeline
needs (dedup, similarity join/search, text analysis, streaming ingest).

Reference: ``/root/reference/`` — semantics only; the execution engine is
Spark DataFrame/Catalyst, not a port (see SURVEY.md).
"""

from .config import LSHConfig  # noqa: F401
from .planner import (  # noqa: F401
    compute_lsh_threshold,
    compute_collision_probability,
    compute_false_rates,
    find_optimal_br,
    get_optimal_config,
)
from .hashing import (  # noqa: F401
    band_matrices,
    projection_matrix,
    signatures_col,
    with_signatures,
    hash_vectors_local,
    hash_vectors_local_long,
)
from .core import LSHRS  # noqa: F401

__version__ = "0.1.0"
