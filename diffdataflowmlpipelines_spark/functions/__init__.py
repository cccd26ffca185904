from diffdataflowmlpipelines_spark.functions.dedup import (
    dup_clusters,
    dup_clusters_star,
    embedding_near_dups,
    exact_dedup,
    jaccard_pairs,
    lsh_band_buckets,
    md5_hash60,
    minhash_lsh_candidates,
    minhash_signatures,
    minhash_signatures_rowwise,
    simhash,
    word_shingles,
)
from diffdataflowmlpipelines_spark.functions.multimodal import (
    extract_media_features,
    frame_sample_plan,
    synthetic_media_df,
)
from diffdataflowmlpipelines_spark.functions.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from diffdataflowmlpipelines_spark.functions.sketches import (
    count_min_estimate,
    count_min_sketch,
    windowed_count_min,
)
from diffdataflowmlpipelines_spark.functions.cep import event_funnel, funnel_cascade
from diffdataflowmlpipelines_spark.functions.sampling import (
    mixture_weights,
    stratified_sample,
)
from diffdataflowmlpipelines_spark.functions.text import (
    bpe_ish_token_count,
    redact_pii,
    quality_features,
    simple_language_id,
    token_count,
    tokenize,
    word_fingerprint,
)
from diffdataflowmlpipelines_spark.functions.vectorizers import (
    CountVectorizer,
    HashVectorizer,
    TfidfTransformer,
    tfidf_pairs,
    token_counts,
)

__all__ = [
    "CountVectorizer",
    "HashVectorizer",
    "TfidfTransformer",
    "bpe_ish_token_count",
    "cosine_topk",
    "count_min_estimate",
    "count_min_sketch",
    "dup_clusters",
    "event_funnel",
    "funnel_cascade",
    "dup_clusters_star",
    "embedding_near_dups",
    "exact_dedup",
    "extract_media_features",
    "frame_sample_plan",
    "ivf_topk",
    "jaccard_pairs",
    "lsh_band_buckets",
    "lsh_topk",
    "md5_hash60",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "minhash_signatures_rowwise",
    "mixture_weights",
    "quality_features",
    "redact_pii",
    "simhash",
    "stratified_sample",
    "simple_language_id",
    "synthetic_media_df",
    "tfidf_pairs",
    "token_count",
    "token_counts",
    "tokenize",
    "windowed_count_min",
    "word_fingerprint",
    "word_shingles",
]
