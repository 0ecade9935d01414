"""ic_spark — a PySpark-native analytics engine with the capabilities of
nimtable/IC (BergLoom), re-expressed Spark-first.

The reference is an Iceberg merge-on-read compaction runtime (Rust +
DataFusion).  This package provides:

- ``ic_spark.compaction`` — the reference's one real query shape
  (merge-on-read rewrite: scan + position/equality anti-joins + rewrite),
  plus manifest/snapshot management (reference:
  ``core/src/compaction/mod.rs``).
- ``ic_spark.queries`` — the declared analytic query surface (joins,
  aggregations, windows, sorts, set ops, scalar fns) with DuckDB oracles.
- ``ic_spark.operators`` — operators Spark lacks natively, composed
  Spark-first: as-of join, top-k, dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), similarity search, text analysis, multimodal plumbing.
- ``ic_spark.streaming`` — Structured Streaming slice over the ``events``
  fixture.

Everything is DataFrame/SQL-first; Python UDFs only where built-ins
genuinely can't express the semantics (and then Arrow-batched).
"""

from ic_spark.session import get_spark

__all__ = ["get_spark"]
