"""Scale-out operators beyond the reference's surface: dedup, similarity
search, text analysis, multimodal plumbing, interval joins."""

from exon_spark.operators.dedup import (
    decontaminate,
    dedup_against,
    dup_clusters,
    dup_ngram_coverage,
    exact_dedup,
    minhash_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    jaccard_verify,
    ngram_jaccard_pairs,
    shingle_rows,
    simhash,
    simhash_pairs,
)
from exon_spark.operators.multimodal import decode_media, with_media_payload
from exon_spark.operators.sampling import hash_sample, stratified_mix, token_budget_cap
from exon_spark.operators.similarity import (
    cosine,
    cosine_topk,
    embedding_cosine_dups,
    ivf_ann_topk,
    ivf_fit_centroids,
    lsh_ann_topk,
)
from exon_spark.operators.text import (
    bm25_search,
    fingerprint,
    lang_id,
    pii_stats,
    quality_signals,
    text_stats,
    unigram_logppl,
)

__all__ = [
    "bm25_search",
    "dedup_against",
    "token_budget_cap",
    "unigram_logppl",
    "decontaminate",
    "dup_clusters",
    "dup_ngram_coverage",
    "quality_signals",
    "exact_dedup",
    "hash_sample",
    "stratified_mix",
    "minhash_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_verify",
    "ngram_jaccard_pairs",
    "shingle_rows",
    "simhash",
    "simhash_pairs",
    "cosine",
    "cosine_topk",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "ivf_fit_centroids",
    "embedding_cosine_dups",
    "fingerprint",
    "lang_id",
    "pii_stats",
    "text_stats",
    "decode_media",
    "with_media_payload",
]
