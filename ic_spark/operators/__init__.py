"""Operators Spark lacks natively, composed Spark-first.

Each operator is a DataFrame → DataFrame function built from built-in
operators (joins, windows, higher-order array functions); Python/Pandas
UDFs appear only where semantics genuinely require them (none so far —
the multimodal decode stubs use mapInPandas for the Arrow-batch
plumbing, with the actual codec stubbed).
"""

from ic_spark.operators.asof import asof_join
from ic_spark.operators.topk import grouped_top_k
from ic_spark.operators.dedup import (
    exact_dedup,
    fingerprint_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash,
    token_jaccard_pairs,
)
from ic_spark.operators.similarity import (
    brute_force_top_k,
    hyperplane_lsh_buckets,
    lsh_top_k,
)

__all__ = [
    "asof_join",
    "brute_force_top_k",
    "exact_dedup",
    "fingerprint_dedup",
    "grouped_top_k",
    "hyperplane_lsh_buckets",
    "lsh_top_k",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "simhash",
    "token_jaccard_pairs",
]
