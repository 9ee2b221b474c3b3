"""Scalar/vector/text function library (SURVEY.md §2.6).

Everything here is a Column-in/Column-out builder over built-in
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd) unless
explicitly named ``*_pandas`` — those are Arrow-batched pandas_udfs for
the paths where built-ins genuinely lose (wide fixed-dim float math).
"""

from merkonvectordb_spark.functions.vector import (
    cosine_similarity,
    cosine_similarity_pandas,
    dot_product,
    l2_norm,
    l2_normalize,
    vector_literal,
)
from merkonvectordb_spark.functions.text import (
    bpe_token_count,
    doc_fingerprint,
    lang_id,
    ngrams,
    quality_score,
    token_count,
    tokenize,
    word_shingles,
)

__all__ = [
    "cosine_similarity",
    "cosine_similarity_pandas",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "vector_literal",
    "bpe_token_count",
    "doc_fingerprint",
    "lang_id",
    "ngrams",
    "quality_score",
    "token_count",
    "tokenize",
    "word_shingles",
]
