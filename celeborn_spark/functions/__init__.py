"""Column-function facade: the engine's scalar/array vocabulary in one
namespace (SURVEY.md §7 package layout).

    from celeborn_spark import functions as CF
    df.select(CF.token_count("text"), CF.content_hash("text"))
"""

from celeborn_spark.operators.textops import (
    tokens,
    token_count,
    stopword_count,
    stopword_ratio,
    avg_token_len,
    quality_score,
    lang_id,
    doc_fingerprint,
    bigrams,
    distinct_token_ratio,
)
from celeborn_spark.operators.dedup import (
    content_hash,
    word_shingles,
    shingles_from_tokens,
    minhash_signature,
    hamming64,
)
from celeborn_spark.operators.similarity import (
    dot,
    l2_norm,
    cosine,
    as_double_array,
)
from celeborn_spark.operators.kmeans import l2_dist
from celeborn_spark.operators.curriculum import u01

__all__ = [
    "tokens",
    "token_count",
    "stopword_count",
    "stopword_ratio",
    "avg_token_len",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "bigrams",
    "distinct_token_ratio",
    "content_hash",
    "word_shingles",
    "shingles_from_tokens",
    "minhash_signature",
    "hamming64",
    "dot",
    "l2_norm",
    "cosine",
    "as_double_array",
    "l2_dist",
    "u01",
]
