from .distance import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    squared_l2,
)
from .hashing import portable_hash64, query_digest  # noqa: F401
