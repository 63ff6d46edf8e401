"""Composite operators built on DataFrame primitives: as-of join, the
dedup family, similarity search, text analysis, multimodal plumbing."""

from .asof import asof_join
from .dedup import bow_dedup, exact_dedup, keep_first, keep_first_grouped
from .multimodal import decode_media, extract_features, sample_frames
from .similarity import (
    all_pairs_nn,
    brute_force_topk,
    ivf_topk,
    make_query_set,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .textstats import (
    chunk_documents,
    predicted_language,
    quality_features,
    winnow_fingerprints,
)

__all__ = [
    "asof_join",
    "bow_dedup",
    "exact_dedup",
    "keep_first",
    "keep_first_grouped",
    "decode_media",
    "extract_features",
    "sample_frames",
    "all_pairs_nn",
    "brute_force_topk",
    "ivf_topk",
    "make_query_set",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "chunk_documents",
    "predicted_language",
    "quality_features",
    "winnow_fingerprints",
]
