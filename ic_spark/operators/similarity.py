"""Similarity search over embedding columns (``array<float>``).

Two strategies:

- **brute_force_top_k** — the exact baseline: broadcast the (small)
  query set against the corpus, cosine via codegen expressions, grouped
  top-k with shuffle-side partial limits.  Scales linearly in corpus
  size; right up to ~10^9 corpus × ~10^3 queries on a real cluster
  because the corpus is never shuffled (broadcast join + map-side
  window partials).
- **hyperplane LSH** — the scale path: sign-of-dot-product with R
  fixed random hyperplanes buckets vectors so only same-bucket pairs
  are compared.  Bucketing is an expression over the scan; the join is
  an equi-join on the bucket id.  Recall is tunable via number of
  hyperplanes / multi-probe; exactness is traded for a corpus-sized →
  bucket-sized candidate set.

Hyperplanes are generated driver-side from a fixed seed (numpy) and
inlined as literal arrays — deterministic across runs and executors.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ic_spark.functions.vectors import cosine_similarity, dot
from ic_spark.operators.topk import grouped_top_k


def brute_force_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine), k per query.

    The query side is broadcast (it must be small — the typical ANN
    serving/eval shape); the corpus side streams through codegen.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__qv"), F.col("__cv")).alias("__cos"),
        )
    )
    return (
        grouped_top_k(
            scored,
            ["query_id"],
            [F.col("__cos").desc(), F.col("neighbor_id").asc()],
            k,
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__cos"), 6).alias("cosine"),
            "rank",
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hyperplane_lsh_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Attach a sign-pattern bucket id (0..2^n_planes-1) to each row.

    Pure expression: n_planes dot products + bit packing, inside the
    scan.  Identical hyperplanes on every call with the same seed.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(F.col(vec_col), plane) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(bit)
    return df.withColumn(bucket_col, bucket)


def lsh_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: compare only same-bucket (query, corpus) pairs.

    With the equi-join on bucket, the candidate set per query shrinks by
    ~2^n_planes; recall loss is the standard LSH trade.  ``multiprobe``
    additionally probes every Hamming-1 neighbor bucket of each query
    (cheap: queries are the small side), multiplying candidate coverage
    by (n_planes+1) while the corpus side stays a single bucket key —
    the standard recall knob without touching the big side.
    """
    cb = hyperplane_lsh_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        dim,
        n_planes,
        seed,
    )
    qb = hyperplane_lsh_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "__qv",
        dim,
        n_planes,
        seed,
    )
    if multiprobe:
        # Probe the exact bucket plus each single-bit flip.
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(n_planes)
            ],
        )
        qb = qb.withColumn("bucket", F.explode(probes))
    scored = (
        cb.join(F.broadcast(qb), on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__qv"), F.col("__cv")).alias("__cos"),
        )
        # A pair can meet in several probe buckets — dedupe before rank.
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return grouped_top_k(
        scored, ["query_id"], [F.col("__cos").desc(), F.col("neighbor_id").asc()], k
    ).select(
        "query_id", "neighbor_id", F.round(F.col("__cos"), 6).alias("cosine"), "rank"
    )
