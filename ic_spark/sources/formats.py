"""File-format readers/writers.

The reference scans Parquet/Avro/ORC file tasks (format enum at
``core/src/parser/proto.rs:282-289``) and writes Parquet data files
(``core/src/executor/datafusion/mod.rs:152-190``).  Spark covers all
three natively (Avro via the ``spark-avro`` module — gated: not bundled
in every distribution), plus JSON/CSV for ingest convenience.

All readers go through the DataSource V2 path → vectorized scans,
column pruning, predicate pushdown.  ``read_files`` accepts an explicit
schema: at 100 TB, schema inference is a full extra pass over data —
never rely on it in production paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

SUPPORTED_READ_FORMATS = (
    "parquet",
    "orc",
    "json",
    "csv",
    "avro",
    # Ingest formats beyond the reference's enum: raw text (one row per
    # line — JSONL pre-split, log ingest) and binaryFile (whole-file
    # bytes + path/length/modtime — the ingest path for multimodal
    # payload columns; see operators/multimodal.py).
    "text",
    "binaryfile",
)


def _avro_available(spark: SparkSession) -> bool:
    """Probe the JVM classloader for the spark-avro module directly —
    exception-message sniffing on a fake load path is brittle across
    Spark versions."""
    try:
        # AvroDataSourceV2 is the provider the "avro" format resolves
        # to; AvroFileFormat alone ships with core and proves nothing.
        # Utils.classForName resolves against Spark's mutable context
        # classloader — plain java.lang.Class.forName ran against the
        # py4j gateway loader and missed spark-avro added via
        # spark.jars/--packages (r9 review find).
        spark._jvm.org.apache.spark.util.Utils.classForName(  # noqa: SLF001
            "org.apache.spark.sql.avro.AvroDataSourceV2", True, False
        )
        return True
    except Exception:  # noqa: BLE001 — Py4JJavaError(ClassNotFound)
        return False


def read_files(
    spark: SparkSession,
    paths: list[str] | str,
    file_format: str = "parquet",
    schema: StructType | None = None,
    **options,
) -> DataFrame:
    """Read files of a supported format into a DataFrame.

    Avro resolves to the JVM spark-avro module when present (the scale
    path: splittable, vectorized) and otherwise to the distributed
    pure-Python codec fallback (sources/avro_scan.py) — the format
    works in every environment.
    """
    fmt = file_format.lower()
    if fmt not in SUPPORTED_READ_FORMATS:
        raise ValueError(f"unsupported format: {file_format}")
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        # Inference needs an extra pass; allow it for convenience
        # formats but surface the choice via option.
        options.setdefault("inferSchema", "true")
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt == "avro":
        if not _avro_available(spark):
            # Distributed pure-Python fallback: binaryFile scan +
            # mapInArrow codec (sources/avro_scan.py).  Per-file
            # parallelism — the JVM module (splittable, vectorized) is
            # preferred whenever its class is on the classpath.  The
            # fallback supports no reader options: silently ignoring
            # e.g. pathGlobFilter or avroSchema would scan files and
            # columns the caller explicitly excluded (r9 review find).
            if options:
                raise ValueError(
                    "avro options are not supported by the pure-Python "
                    f"fallback (spark-avro absent): {sorted(options)}"
                )
            from ic_spark.sources.avro_scan import read_avro_distributed

            return read_avro_distributed(spark, paths, schema=schema)
        return reader.format("avro").options(**options).load(paths)
    if fmt == "binaryfile":
        # binaryFile ignores user schemas (fixed: path/modificationTime/
        # length/content) and is read-only.
        return spark.read.format("binaryFile").options(**options).load(paths)
    if fmt == "parquet":
        # parquet() is the one true-varargs reader.
        return reader.options(**options).parquet(*paths)
    # ONE positional list, never *paths: pyspark's orc/json/csv/text
    # take (path, <keyword params>...), so a splatted second path binds
    # to mergeSchema/schema/wholetext — only the first file is scanned,
    # silent data loss (r9 review find; same trap the planner documents
    # for reader.orc).
    return getattr(reader.options(**options), fmt)(list(paths))


def write_files(
    df: DataFrame,
    path: str,
    file_format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_partitions: int | None = None,
    **options,
) -> None:
    """Write a DataFrame as files; partitioned layouts repartition by
    the partition columns first (bounded file count — reference fanout
    writer O14)."""
    fmt = file_format.lower()
    if fmt == "binaryfile":
        raise ValueError("binaryFile is a read-only format")
    if fmt == "csv":
        options.setdefault("header", "true")  # symmetric with read_files
    out = df
    if partition_by:
        out = df.repartition(*partition_by)
    elif target_partitions:
        out = df.repartition(target_partitions)
    writer = out.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "avro":
        if not _avro_available(df.sparkSession):
            # The read side has a distributed pure-Python fallback; the
            # write side stays gated — the reference writes Parquet only
            # (core/src/executor/datafusion/mod.rs:152-190), and a
            # Python-side distributed writer could not match JVM
            # committer semantics (task attempts, rename protocols).
            raise NotImplementedError(
                "Avro writes require the spark-avro module; "
                "use sources.avro_io.write_container for metadata-scale files"
            )
        writer.format("avro").save(path)
    else:
        getattr(writer, fmt)(path)
