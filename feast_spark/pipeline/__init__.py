from feast_spark.pipeline.dedup_text import (
    exact_dedup_docs,
    exact_dup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from feast_spark.pipeline.graph import (
    connected_components,
    dedup_groups_from_pairs,
    kmeans,
)
from feast_spark.pipeline.sampling import (
    deterministic_sample,
    replicated_sample,
    leakage_safe_split,
    mixture_weights,
    pack_sequences,
    stratified_sample,
)
from feast_spark.pipeline.similarity import (
    brute_force_topk,
    embedding_dup_pairs,
    ivf_topk,
    lsh_topk,
)
from feast_spark.pipeline.text import (
    detect_language,
    doc_fingerprint,
    portable_hash64,
    quality_features,
    token_count,
    word_tokens,
)

__all__ = [
    "brute_force_topk",
    "connected_components",
    "dedup_groups_from_pairs",
    "kmeans",
    "deterministic_sample",
    "replicated_sample",
    "leakage_safe_split",
    "mixture_weights",
    "pack_sequences",
    "stratified_sample",
    "detect_language",
    "doc_fingerprint",
    "exact_dup_groups",
    "lsh_candidate_pairs",
    "lsh_topk",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "portable_hash64",
    "quality_features",
    "simhash",
    "token_count",
    "word_tokens",
]
