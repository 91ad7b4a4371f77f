from .text import (
    token_count,
    text_quality_features,
    language_id,
    fingerprint,
)
from .dedup_text import (
    exact_text_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash64,
    simhash_near_dups,
    ngram_jaccard_pairs,
)
from .similarity import cosine_topk_bruteforce, lsh_bucketed_topk

__all__ = [
    "token_count", "text_quality_features", "language_id", "fingerprint",
    "exact_text_dedup", "minhash_signatures", "minhash_lsh_candidates",
    "simhash64", "simhash_near_dups", "ngram_jaccard_pairs",
    "cosine_topk_bruteforce", "lsh_bucketed_topk",
]
