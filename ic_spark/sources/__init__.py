"""Source/sink surface (reference O1/O13: Parquet/Avro/ORC file tasks)."""

from ic_spark.sources.formats import (
    SUPPORTED_READ_FORMATS,
    read_files,
    write_files,
)

__all__ = ["SUPPORTED_READ_FORMATS", "read_files", "write_files"]
