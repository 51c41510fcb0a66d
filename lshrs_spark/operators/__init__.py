from .index import build_index, write_index, read_index, validate_vectors  # noqa: F401
from .probe import (  # noqa: F401
    query_signatures_df,
    candidates,
    top_k,
    rerank,
    top_p_cutoff,
)
