"""Metadata tables: the table's own manifest exposed as DataFrames.

Iceberg exposes ``db.table.snapshots`` / ``.files`` / ``.history`` as
queryable relations; users inspect table health (file counts, delete
ratios, snapshot lineage) with plain SQL instead of parsing manifests.
Same surface here over ``ManifestTable``.

Scale note: metadata is manifest-sized (file ENTRIES, not data), so
``createDataFrame`` from the driver is the right plan — this is the
same driver-side listing every engine's scan planning already does.
A 100 TB table with 1 GB files is ~100k entries, well within driver
memory; the result is a DataFrame so downstream filters/joins (e.g.
"files with deletes attached") run in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ic_spark.compaction.manifest import ManifestTable

_SNAPSHOTS_SCHEMA = StructType(
    [
        StructField("snapshot_id", LongType(), False),
        StructField("timestamp_ms", LongType(), False),
        StructField("is_current", StringType(), False),
        StructField("total_files", IntegerType(), False),
        StructField("data_files", IntegerType(), False),
        StructField("position_delete_files", IntegerType(), False),
        StructField("equality_delete_files", IntegerType(), False),
        StructField("total_size_bytes", LongType(), False),
    ]
)

_FILES_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("content", StringType(), False),
        StructField("sequence_number", LongType(), False),
        StructField("equality_ids", ArrayType(StringType()), True),
        StructField("file_size_in_bytes", LongType(), False),
    ]
)

_HISTORY_SCHEMA = StructType(
    [
        StructField("snapshot_id", LongType(), False),
        StructField("timestamp_ms", LongType(), False),
        StructField("parent_id", LongType(), True),
        StructField("files_added", IntegerType(), False),
        StructField("files_removed", IntegerType(), False),
    ]
)


_REFS_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("snapshot_id", LongType(), False),
        StructField("type", StringType(), False),
    ]
)


def read_metadata_table(
    spark: SparkSession, table: ManifestTable, kind: str
) -> DataFrame:
    """``kind`` in {"snapshots", "files", "history", "refs"} — the
    Iceberg metadata-table surface (snapshots / data_files / history /
    refs)."""
    if kind == "refs":
        rows = [(n, sid, "tag") for n, sid in sorted(table.refs().items())]
        return spark.createDataFrame(rows, _REFS_SCHEMA)
    snaps = table.snapshots()
    current = table.current_snapshot()
    cur_id = current.snapshot_id if current else None

    if kind == "snapshots":
        rows = []
        for s in snaps:
            by = {"DATA": 0, "POSITION_DELETES": 0, "EQUALITY_DELETES": 0}
            size = 0
            for f in s.files:
                by[f.get("content", "DATA")] += 1
                size += f.get("file_size_in_bytes", 0)
            rows.append(
                (
                    s.snapshot_id,
                    s.timestamp_ms,
                    "true" if s.snapshot_id == cur_id else "false",
                    len(s.files),
                    by["DATA"],
                    by["POSITION_DELETES"],
                    by["EQUALITY_DELETES"],
                    size,
                )
            )
        return spark.createDataFrame(rows, _SNAPSHOTS_SCHEMA)

    if kind == "files":
        if current is None:
            return spark.createDataFrame([], _FILES_SCHEMA)
        rows = [
            (
                f["path"],
                f.get("content", "DATA"),
                f.get("sequence_number", 0),
                list(f.get("equality_ids", [])) or None,
                f.get("file_size_in_bytes", 0),
            )
            for f in current.files
        ]
        return spark.createDataFrame(rows, _FILES_SCHEMA)

    if kind == "history":
        rows = []
        prev_paths: set[str] = set()
        prev_id = None
        for s in snaps:
            paths = {f["path"] for f in s.files}
            rows.append(
                (
                    s.snapshot_id,
                    s.timestamp_ms,
                    prev_id,
                    len(paths - prev_paths),
                    len(prev_paths - paths),
                )
            )
            prev_paths, prev_id = paths, s.snapshot_id
        return spark.createDataFrame(rows, _HISTORY_SCHEMA)

    raise ValueError(f"unknown metadata table kind: {kind!r}")


def snapshot_diff(
    spark: SparkSession,
    table: ManifestTable,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """File-level CDC between two snapshots: one row per file that was
    added or removed, with its content type — what a downstream sync
    job consumes to mirror table changes without a full re-scan."""
    frm = table.snapshot_at(from_snapshot_id)
    if frm is None:
        raise ValueError(f"snapshot {from_snapshot_id} not found")
    to = (
        table.current_snapshot()
        if to_snapshot_id is None
        else table.snapshot_at(to_snapshot_id)
    )
    if to is None:
        raise ValueError(f"snapshot {to_snapshot_id} not found")
    old = {f["path"]: f for f in frm.files}
    new = {f["path"]: f for f in to.files}
    schema = StructType(
        [
            StructField("change", StringType(), False),
            StructField("path", StringType(), False),
            StructField("content", StringType(), False),
            StructField("sequence_number", LongType(), False),
        ]
    )
    rows = [
        ("added", p, f.get("content", "DATA"), f.get("sequence_number", 0))
        for p, f in new.items()
        if p not in old
    ] + [
        ("removed", p, f.get("content", "DATA"), f.get("sequence_number", 0))
        for p, f in old.items()
        if p not in new
    ]
    return spark.createDataFrame(rows, schema)
