from .vector import cosine_similarity, dot_product, l2_norm, l2_normalize  # noqa: F401
from .text import (  # noqa: F401
    tokens_col,
    token_count_col,
    char_ngrams_col,
    token_shingles_col,
    quality_score_cols,
    language_id_col,
    fingerprint_col,
)
