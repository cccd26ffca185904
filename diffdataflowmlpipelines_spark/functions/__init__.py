from diffdataflowmlpipelines_spark.functions.text import (
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
    "quality_features",
    "simple_language_id",
    "tfidf_pairs",
    "token_count",
    "token_counts",
    "tokenize",
    "word_fingerprint",
]
