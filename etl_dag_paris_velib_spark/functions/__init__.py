from .scalar import epoch_to_ts, surrogate_key, with_lineage
from .text import (
    normalized_text,
    shingles,
    token_count,
    tokens,
    word_shingles,
)
from .vector import cosine_similarity, dot, l2_norm

__all__ = [
    "epoch_to_ts",
    "surrogate_key",
    "with_lineage",
    "normalized_text",
    "shingles",
    "token_count",
    "tokens",
    "word_shingles",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
