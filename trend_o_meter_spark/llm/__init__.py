"""LLM-training-data pipeline operators (BASELINE.json north star).

Beyond the reference's own surface: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search over embeddings (brute-force
cosine top-k + LSH/IVF scale paths), text analysis (language id, quality
scoring, token counting, fingerprinting), and multimodal binary-column
plumbing.  All designed shuffle-safe for 100 TB: no driver-side collects,
candidate generation via bucket joins rather than cross joins.
"""

from .dedup import exact_dedup, minhash_signatures, minhash_lsh_pairs, ngram_jaccard_pairs, simhash
from .similarity import cosine_topk, ivf_assign
from .text import text_stats, lang_id, token_count, fingerprint

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk",
    "ivf_assign",
    "text_stats",
    "lang_id",
    "token_count",
    "fingerprint",
]
