from grower_spark.operators.dedup import (
    exact_dedup,
    shingles,
    minhash_signature,
    minhash_lsh_pairs,
    simhash,
    simhash_dedup_pairs,
    ngram_jaccard_pairs,
)
from grower_spark.operators.similarity import cosine, cosine_topk, lsh_planes, lsh_ann_topk
from grower_spark.operators.text import (
    token_stats,
    regex_token_count,
    language_id,
    quality_signals,
    fingerprint60,
)
from grower_spark.operators.multimodal import attach_binary, binary_meta, decode_images

__all__ = [
    "exact_dedup",
    "shingles",
    "minhash_signature",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "cosine",
    "cosine_topk",
    "lsh_planes",
    "lsh_ann_topk",
    "token_stats",
    "regex_token_count",
    "language_id",
    "quality_signals",
    "fingerprint60",
    "attach_binary",
    "binary_meta",
    "decode_images",
]
