from .distance import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    squared_l2,
)
from .hashing import portable_hash64, query_digest  # noqa: F401
from .repetition import (  # noqa: F401
    dup_line_frac,
    dup_paragraph_frac,
    repetition_flagged,
    top_bigram_frac,
)
