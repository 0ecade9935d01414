"""Column-expression helpers (all JVM-side built-ins — no Python UDFs)."""

from ic_spark.functions.vectors import cosine_similarity, dot, l2_norm
from ic_spark.functions.text import (
    tokens,
    token_count,
    word_shingles,
    doc_fingerprint,
    quality_score,
    langid_heuristic,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "tokens",
    "token_count",
    "word_shingles",
    "doc_fingerprint",
    "quality_score",
    "langid_heuristic",
]
