"""Regression tests for the round-3 ADVICE findings.

Each test pins one reviewed hazard:
1. merge_into's file-touch probe must resolve key columns through the
   table's current schema + name-mapping (renamed key columns).
2. Deletion-vector broadcast sizing must use blob cardinality, not the
   compressed puffin byte size.
3. manifest_dv_delete_sink's key probe must be format-aware (avro data
   files) instead of a raw parquet read.
4. A streaming replay of a superseded DV batch must not overwrite the
   old puffin file (older snapshots still reference it).
5. The distributed Avro scan must build logical-type converters per
   file, not from the first file's writer schema.
"""

from __future__ import annotations

import pytest
import datetime
import os

import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

from ic_spark.compaction.deletes import commit_deletion_vectors, read_table
from ic_spark.compaction.manifest import ManifestTable
from ic_spark.compaction.request import FileContent, FileScanTask
from ic_spark.compaction.writer import _stats_from_footer
from ic_spark.sources.avro_io import write_container


def _seed_spec_table(spark, tmp_path, name="t"):
    from ic_spark.compaction.iceberg_meta import IcebergTable

    loc = str(tmp_path / name)
    df = spark.range(0, 20).select("id", (F.col("id") + 100).alias("v"))
    tbl = IcebergTable.create(loc, df.schema)
    d = str(tmp_path / f"{name}-seed")
    df.coalesce(1).write.parquet(d)
    f = next(
        os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet")
    )
    rc, cs, _ = _stats_from_footer(f, d)
    tbl.append_snapshot(
        [
            {
                "path": f,
                "content": "DATA",
                "record_count": rc,
                "file_size_in_bytes": os.path.getsize(f),
                "column_stats": cs,
            }
        ]
    )
    return tbl


@pytest.mark.slow
def test_merge_into_after_key_rename(spark, tmp_path):
    """MERGE keyed on a RENAMED column: the touch probe must read old
    parquet footers (written under the old name) through the
    name-mapping, find the touched file, and apply the merge."""
    from ic_spark.compaction.rowops import merge_into

    tbl = _seed_spec_table(spark, tmp_path, "ren")
    tbl.rename_column("id", "ident")

    src = spark.createDataFrame([(4, -4), (40, -40)], "ident long, v long")
    stats = merge_into(spark, tbl, src, ["ident"])
    assert stats["rewritten_files_count"] == 1  # probe found the seed file
    rows = {r.ident: r.v for r in read_table(spark, tbl).collect()}
    assert rows[4] == -4 and rows[40] == -40 and len(rows) == 21


def test_dv_broadcast_sizing_by_cardinality(spark):
    """A tiny puffin file holding a huge roaring bitmap must NOT get the
    broadcast hint; a small-cardinality one must.  Unknown cardinality
    (0) must defer to AQE (no hint)."""
    from ic_spark.compaction.planner import (
        BROADCAST_DELETE_BYTES,
        _DV_ROW_BYTES,
        _maybe_broadcast,
    )

    df = spark.range(1)
    big_rows = BROADCAST_DELETE_BYTES // _DV_ROW_BYTES + 1
    tiny_file_huge_bitmap = FileScanTask(
        data_file_path="x.puffin",
        content=FileContent.POSITION_DELETES,
        file_format="puffin",
        file_size_in_bytes=4096,  # compressed bytes lie about row count
        record_count=big_rows,
    )
    assert _maybe_broadcast(df, [tiny_file_huge_bitmap]) is df

    small = FileScanTask(
        data_file_path="y.puffin",
        content=FileContent.POSITION_DELETES,
        file_format="puffin",
        file_size_in_bytes=4096,
        record_count=1000,
    )
    assert _maybe_broadcast(df, [small]) is not df  # hinted

    unknown = FileScanTask(
        data_file_path="z.puffin",
        content=FileContent.POSITION_DELETES,
        file_format="puffin",
        file_size_in_bytes=64,
        record_count=0,
    )
    assert _maybe_broadcast(df, [unknown]) is df  # defer to AQE

    # Plain parquet delete files keep the byte-size heuristic.
    pq = FileScanTask(
        data_file_path="p.parquet",
        content=FileContent.POSITION_DELETES,
        file_size_in_bytes=1 << 20,
    )
    assert _maybe_broadcast(df, [pq]) is not df


@pytest.mark.slow
def test_dv_task_record_count_sums_per_vector_entries(spark, tmp_path):
    """Spec-metadata tables expand one puffin file into per-vector
    manifest entries; the deduped scan task must carry the SUM of the
    vector cardinalities so broadcast sizing sees the total."""
    from ic_spark.compaction.deletes import write_deletion_vectors
    from ic_spark.compaction.iceberg_meta import IcebergTable

    # Two data files -> the DV commit packs two vectors into one puffin.
    loc = str(tmp_path / "dvsum")
    df = spark.range(0, 20).select("id", (F.col("id") + 100).alias("v"))
    tbl = IcebergTable.create(loc, df.schema)
    entries = []
    for lo, hi in ((0, 10), (10, 20)):
        d = str(tmp_path / f"dvsum-seed-{lo}")
        df.where((F.col("id") >= lo) & (F.col("id") < hi)).coalesce(
            1
        ).write.parquet(d)
        f = next(
            os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet")
        )
        rc, cs, _ = _stats_from_footer(f, d)
        entries.append(
            {
                "path": f,
                "content": "DATA",
                "record_count": rc,
                "file_size_in_bytes": os.path.getsize(f),
                "column_stats": cs,
            }
        )
    tbl.append_snapshot(entries)
    write_deletion_vectors(spark, tbl, F.col("id").isin(1, 2, 11, 12))
    _, pos, _ = tbl.scan_tasks()
    puffins = [t for t in pos if t.file_format == "puffin"]
    assert len(puffins) == 1
    assert puffins[0].record_count == 4


def test_dv_delete_sink_over_avro_data(spark, tmp_path):
    """CDC DV deletes against a table whose data files are AVRO: the key
    probe must go through the format-aware scan."""
    from ic_spark.streaming.sink import manifest_dv_delete_sink

    root = str(tmp_path / "avro_tbl")
    os.makedirs(root)
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "id", "type": "long"}, {"name": "v", "type": "long"}],
    }
    p = os.path.join(root, "part-0.avro")
    write_container(p, schema, [{"id": i, "v": i * 10} for i in range(10)])
    table = ManifestTable(root)
    table.append_snapshot(
        [
            {
                "path": p,
                "content": "DATA",
                "file_format": "avro",
                "file_size_in_bytes": os.path.getsize(p),
            }
        ]
    )
    sink = manifest_dv_delete_sink(table, ["id"])
    sink(spark.createDataFrame([(3,), (7,)], "id long"), 0)
    got = sorted(r.id for r in read_table(spark, table).collect())
    assert got == [i for i in range(10) if i not in (3, 7)]


def test_dv_replay_never_overwrites_superseded_puffin(spark, tmp_path):
    """Replaying a DV batch whose puffin was superseded must write a
    FRESH file: the original bytes stay intact for older snapshots'
    time-travel reads."""
    tbl = _seed_spec_table(spark, tmp_path, "replay")

    def matches(ids):
        data, _, _ = tbl.scan_tasks()
        from ic_spark.compaction.planner import _scan_with_hidden_cols
        from ic_spark.compaction.request import (
            SYS_HIDDEN_FILE_PATH,
            SYS_HIDDEN_POS,
        )

        return (
            _scan_with_hidden_cols(spark, data, with_pos=True)
            .where(F.col("id").isin(*ids))
            .select(
                F.col(SYS_HIDDEN_FILE_PATH).alias("file_path"),
                F.col(SYS_HIDDEN_POS).alias("pos"),
            )
        )

    snap1 = commit_deletion_vectors(spark, tbl, matches([1, 2]), tag="b0")
    first = os.path.join(str(tmp_path / "replay"), "dv-b0", "deletes.puffin")
    assert os.path.exists(first)
    original = open(first, "rb").read()

    # A later delete supersedes b0's puffin in the current snapshot.
    commit_deletion_vectors(spark, tbl, matches([5]))

    # Crash-replay of b0 with a bigger match set: must land elsewhere.
    commit_deletion_vectors(spark, tbl, matches([1, 2, 3]), tag="b0")
    assert open(first, "rb").read() == original
    retry = os.path.join(str(tmp_path / "replay"), "dv-b0-r1", "deletes.puffin")
    assert os.path.exists(retry)
    # Time travel to snap1 still sees exactly b0's original delete set.
    old = sorted(
        r.id for r in read_table(spark, tbl, snapshot_id=snap1).collect()
    )
    assert old == [i for i in range(20) if i not in (1, 2)]
    # Current snapshot applies the union.
    cur = sorted(r.id for r in read_table(spark, tbl).collect())
    assert cur == [i for i in range(20) if i not in (1, 2, 3, 5)]


def test_avro_per_file_logical_converters(spark, tmp_path):
    """Two files with DIFFERENT writer schemas (timestamp-micros vs
    -millis after evolution) must each decode with their own logical
    converters — not the first file's."""
    from ic_spark.sources.avro_scan import read_avro_distributed

    ts = datetime.datetime(2024, 5, 17, 12, 30, 0)
    epoch = datetime.datetime(1970, 1, 1)
    micros = int((ts - epoch).total_seconds() * 1_000_000)

    s_micros = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "local-timestamp-micros"},
            },
        ],
    }
    s_millis = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "local-timestamp-millis"},
            },
        ],
    }
    p1 = str(tmp_path / "a.avro")
    p2 = str(tmp_path / "b.avro")
    write_container(p1, s_micros, [{"id": 1, "ts": micros}])
    write_container(p2, s_millis, [{"id": 2, "ts": micros // 1000}])

    out_schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("ts", TimestampNTZType(), False),
        ]
    )
    rows = {
        r.id: r.ts
        for r in read_avro_distributed(
            spark, [p1, p2], schema=out_schema
        ).collect()
    }
    assert rows[1] == ts
    assert rows[2] == ts  # was 1000x off before per-file converters
