"""Tier C operators: LLM-data-pipeline operations at 100 TB scale
(SURVEY.md §2.C) — dedup, similarity search, text analysis, as-of
joins, multimodal columns."""

from dust_spark.operators.asof import asof_aggregate, asof_join
from dust_spark.operators.dedup import (
    dedup_lines,
    decontaminate,
    exact_dedup,
    exact_dedup_count,
    minhash_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_table,
    simhash_table_portable,
    span_dup_fraction,
)
from dust_spark.operators.graph import cluster_dedup, connected_components
from dust_spark.operators.multimodal import (
    attach_media,
    decode_media,
    media_stats,
    resize_images,
    sample_frames,
)
from dust_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    train_val_test_split,
    weighted_interleave,
)
from dust_spark.operators.rollup import hypertable_rollup
from dust_spark.operators.skew import salted_agg, salted_avg, salted_join
from dust_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup,
    ivf_topk,
    kmeans_centroids,
    quantize_vectors,
    rp_lsh_topk,
)
from dust_spark.operators.text import (
    bpe_ish_token_count,
    chunk_documents,
    clean_text,
    tf_idf,
    fingerprint,
    lang_id,
    pack_sequences,
    redact_pii,
    repetition_score,
    quality_scores,
    rolling_hash_fingerprint,
    token_count,
    top_domains,
)

__all__ = [
    "asof_join",
    "asof_aggregate",
    "exact_dedup",
    "exact_dedup_count",
    "minhash_dedup",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "simhash_table",
    "attach_media",
    "decode_media",
    "media_stats",
    "resize_images",
    "sample_frames",
    "cosine_topk",
    "embedding_near_dup",
    "ivf_topk",
    "kmeans_centroids",
    "quantize_vectors",
    "rp_lsh_topk",
    "bpe_ish_token_count",
    "fingerprint",
    "lang_id",
    "pack_sequences",
    "repetition_score",
    "quality_scores",
    "rolling_hash_fingerprint",
    "token_count",
    "tf_idf",
    "salted_agg",
    "salted_avg",
    "salted_join",
    "hash_sample",
    "train_val_test_split",
    "stratified_hash_sample",
    "weighted_interleave",
    "clean_text",
    "chunk_documents",
    "connected_components",
    "cluster_dedup",
    "decontaminate",
    "dedup_lines",
    "hypertable_rollup",
    "redact_pii",
    "simhash_table_portable",
    "span_dup_fraction",
    "top_domains",
]
