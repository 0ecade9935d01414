"""Bucketed tables: co-located joins and aggregations without shuffle.

``bucketBy(n, key)`` at write time hash-partitions rows into a fixed
number of buckets per partition and records the layout in the catalog;
a later join or aggregation on the bucket key reads both sides already
co-partitioned — Catalyst drops the Exchange entirely.  At 100 TB this
converts the single biggest cost of a repeated fact-fact join (two full
shuffles, every run) into a one-time cost at ingest.

Rules that make it work (and that `write_bucketed` enforces):
- both join sides must share bucket COUNT and KEY;
- bucketed writes must go through ``saveAsTable`` (the layout lives in
  the catalog, not the files);
- ``spark.sql.sources.bucketing.enabled`` must stay on (default), and
  AQE respects bucketed distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.

    Sorting within buckets additionally enables merge-join without a
    sort step (the Iceberg analog is a sorted table write-order).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
