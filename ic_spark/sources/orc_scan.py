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

    Arrow end to end (``mapInArrow``): the pandas bridge silently
    coerces nullable int columns to float64 (precision loss above
    2**53) and collapses float NaN to null on the return boundary —
    the corruption class ``tests/test_datafile_write_fuzz.py`` pinned
    for the writer/Avro paths. Stripes decode as Arrow record batches
    and stay Arrow; positions are appended as int64 Arrow arrays.
    """
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
    if not field_names and not with_path_pos:
        # Arrow batches cannot carry rows without columns, so a
        # zero-column projection would silently return 0 rows —
        # refuse instead (no production caller builds this shape).
        raise ValueError(
            "read_orc_distributed: empty projection (no requested "
            "column exists in the schema and with_path_pos=False)"
        )

    out_schema = schema
    if with_path_pos:
        out_schema = StructType(
            list(schema.fields)
            + [
                StructField(FILE_PATH_COL, StringType(), False),
                StructField(POS_COL, LongType(), False),
            ]
        )

    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_out = to_arrow_schema(out_schema)

    def decode_files(batches):
        import os as _os

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.orc as orc

        def _valid_zone(name):
            """Resolvable tz database name, or None."""
            if not name:
                return None
            try:
                import zoneinfo

                zoneinfo.ZoneInfo(name)
                return name
            except Exception:
                return None

        def local_tz_name():
            """tz-database name of the worker's OS timezone (pyarrow's
            ORC reader renders plain ORC timestamps as LOCAL
            wall-clock, matching Spark's JVM-default-tz semantics).
            Candidates in libc's own precedence: $TZ (IANA or legacy
            names like EST5EDT; path forms reduce to the zoneinfo
            suffix), then /etc/timezone, then the /etc/localtime
            symlink.  Every candidate is validated against the tz
            database — an unresolvable name must fall through, not
            blow up assume_timezone on the executor."""
            tz = (_os.environ.get("TZ") or "").lstrip(":")
            if tz.startswith("/") and "/zoneinfo/" in tz:
                tz = tz.split("/zoneinfo/", 1)[1]
            name = _valid_zone(tz)
            if name:
                return name
            try:
                with open("/etc/timezone") as f:
                    name = _valid_zone(f.read().strip())
                    if name:
                        return name
            except OSError:
                pass
            try:
                lt = _os.path.realpath("/etc/localtime")
                if "/zoneinfo/" in lt:
                    name = _valid_zone(lt.split("/zoneinfo/", 1)[1])
                    if name:
                        return name
            except OSError:
                pass
            return "UTC"

        # One resolution per task, not per column per stripe.
        local_tz = local_tz_name()

        for rb in batches:
            tbl_in = pa.table(rb)
            for path, content in zip(
                tbl_in.column("path").to_pylist(),
                tbl_in.column("content").to_pylist(),
            ):
                f = orc.ORCFile(pa.BufferReader(bytes(content)))
                # Column pruning happens at the ORC reader; positions
                # are the running row index across stripes in file
                # order (stripes read sequentially).  Files written
                # before a column was added simply lack it: read the
                # intersection and NULL-FILL the rest (the native
                # reader and the Avro sibling both do; a missing
                # column crashed the whole task here — r9 review
                # find).  A position-only projection reads exactly ONE
                # column for row counts instead of decoding every
                # column of every stripe (r9 review find).
                avail = set(f.schema.names)
                read_cols = [c for c in field_names if c in avail]
                if not read_cols and f.schema.names:
                    read_cols = [f.schema.names[0]]
                pos = 0
                for i in range(f.nstripes):
                    stripe = f.read_stripe(i, columns=read_cols or None)
                    tbl = pa.Table.from_batches([stripe])
                    for start in range(0, max(tbl.num_rows, 1), batch_rows):
                        chunk = tbl.slice(start, batch_rows)
                        if chunk.num_rows == 0 and tbl.num_rows > 0:
                            continue
                        n = chunk.num_rows
                        arrays = []
                        for name in field_names:
                            want = arrow_out.field(name).type
                            if name not in avail:
                                arrays.append(pa.nulls(n, type=want))
                                continue
                            col = chunk.column(name).combine_chunks()
                            if col.type != want:
                                if (
                                    pa.types.is_timestamp(col.type)
                                    and col.type.tz is None
                                    and pa.types.is_timestamp(want)
                                    and want.tz is not None
                                ):
                                    # Plain ORC timestamps decode as
                                    # LOCAL wall-clock (reader-tz
                                    # semantics — verified: a non-UTC
                                    # OS tz shifts the naive value by
                                    # the offset).  A direct cast to
                                    # the tz-aware target would
                                    # reinterpret that wall time as
                                    # UTC; pin the instant first.
                                    # DST-edge wall times must stay
                                    # total, not raise (Spark maps
                                    # ambiguous locals to the earlier
                                    # instant).
                                    col = pc.assume_timezone(
                                        col,
                                        local_tz,
                                        ambiguous="earliest",
                                        nonexistent="earliest",
                                    )
                                # timestamp_instant (tz-aware) or
                                # int64-encoded NTZ micros: cast
                                # preserves the stored value without a
                                # pandas round-trip.
                                col = col.cast(want)
                            arrays.append(col)
                        if with_path_pos:
                            arrays.append(
                                pa.array([str(path)] * n, type=pa.string())
                            )
                            arrays.append(
                                pa.array(
                                    range(pos + start, pos + start + n),
                                    type=pa.int64(),
                                )
                            )
                        yield pa.RecordBatch.from_arrays(
                            arrays, schema=arrow_out
                        )
                    pos += tbl.num_rows

    files = spark.read.format("binaryFile").load(paths)
    return files.select("path", "content").mapInArrow(
        decode_files, schema=out_schema
    )
