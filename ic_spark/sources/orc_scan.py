"""Distributed ORC scans with exact per-file row positions.

Spark's native ORC reader is vectorized and splittable but exposes no
``row_index`` metadata column (that is Parquet-only), so merge-on-read
position deletes over ORC data files could not be expressed — the
planner honestly rejected them (SURVEY §2.1 O1 lists ORC among the
reference's scan formats: ``core/src/parser/proto.rs:282-289``).

This module closes that gap the same way ``sources/avro_scan.py`` does
for Avro: a ``binaryFile`` scan distributes whole files to executors,
``pyarrow.orc`` decodes them there, and the running record index per
file — the reference's ``index_start`` accumulation
(``iceberg_file_task_scan.rs:234-247``) — is emitted alongside the
rows.  Parallelism is per-file; plain (non-positional) ORC scans keep
Spark's native reader, which is strictly better when positions aren't
needed.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

FILE_PATH_COL = "_orc_file_path"
POS_COL = "_orc_pos"


def orc_schema(spark: SparkSession, path: str) -> StructType:
    """Driver-side schema discovery via Spark's native reader (footer
    metadata only)."""
    return spark.read.orc(path).schema


def read_orc_distributed(
    spark: SparkSession,
    paths: list[str] | str,
    schema: StructType | None = None,
    columns: list[str] | None = None,
    with_path_pos: bool = False,
    batch_rows: int = 65536,
) -> DataFrame:
    """Read ORC files into a DataFrame with optional (file_path, pos).

    ``schema`` (Spark) overrides discovery; ``columns`` prunes at the
    pyarrow reader (ORC is columnar — pruning is real, unlike Avro).
    ``with_path_pos=True`` appends ``_orc_file_path`` / ``_orc_pos``
    (running record index per file, file order) for merge-on-read
    hidden columns.
    """
    import pandas as pd

    if isinstance(paths, str):
        paths = [paths]
    if not paths:
        raise ValueError("no paths")

    if schema is None:
        schema = orc_schema(spark, paths[0])
    field_names = [f.name for f in schema.fields]
    if columns:
        wanted = set(columns)
        field_names = [c for c in field_names if c in wanted]
        schema = StructType([f for f in schema.fields if f.name in wanted])

    out_schema = schema
    if with_path_pos:
        out_schema = StructType(
            list(schema.fields)
            + [
                StructField(FILE_PATH_COL, StringType(), False),
                StructField(POS_COL, LongType(), False),
            ]
        )

    def decode_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.orc as orc

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                f = orc.ORCFile(pa.BufferReader(bytes(content)))
                # Column pruning happens at the ORC reader; positions
                # are the running row index across stripes in file
                # order (stripes read sequentially).
                pos = 0
                for i in range(f.nstripes):
                    stripe = f.read_stripe(i, columns=field_names or None)
                    tbl = pa.Table.from_batches([stripe])
                    for start in range(0, max(tbl.num_rows, 1), batch_rows):
                        chunk = tbl.slice(start, batch_rows)
                        if chunk.num_rows == 0 and tbl.num_rows > 0:
                            continue
                        out = chunk.select(field_names).to_pandas() if field_names else pd.DataFrame(index=range(chunk.num_rows))
                        if with_path_pos:
                            out[FILE_PATH_COL] = str(path)
                            out[POS_COL] = range(pos + start, pos + start + len(out))
                        yield out
                    pos += tbl.num_rows

    files = spark.read.format("binaryFile").load(paths)
    return files.select("path", "content").mapInPandas(
        decode_files, schema=out_schema
    )
