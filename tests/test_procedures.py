"""Iceberg CALL-procedure façade (compaction/procedures.py)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from ic_spark.compaction import ManifestTable
from ic_spark.compaction.deletes import read_table, write_equality_deletes
from ic_spark.compaction.procedures import call
from ic_spark.compaction.writer import _stats_from_footer


@pytest.fixture()
def proc_table(spark, tmp_path):
    table = ManifestTable(str(tmp_path / "tbl"))
    entries = []
    for i in range(3):  # three small files → binpack fodder
        d = str(tmp_path / f"d{i}")
        spark.range(i * 20, (i + 1) * 20).coalesce(1).write.parquet(d)
        f = next(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))
        rc, cs, _ = _stats_from_footer(f, d)
        entries.append(
            {"path": f, "sequence_number": 1, "content": "DATA",
             "file_size_in_bytes": os.path.getsize(f),
             "record_count": rc, "column_stats": cs}
        )
    table.append_snapshot(entries)
    return table


def test_call_dispatch_and_maintenance_cycle(spark, proc_table):
    table = proc_table
    write_equality_deletes(
        spark, table, spark.createDataFrame([(5,)], "id long"), ["id"]
    )
    out = call(spark, "convert_equality_deletes", table=table, to_dvs=True)
    assert out["delete_rows"] == 1
    out = call(spark, "system.rewrite_data_files", table=table, strategy="binpack")
    assert out["rewritten_data_files_count"] == 3
    out = call(spark, "rewrite_data_files", table=table, strategy="full")
    assert out["added_data_files_count"] >= 1
    assert read_table(spark, table).count() == 59

    out = call(spark, "expire_snapshots", table=table)
    assert out["deleted_data_files_count"] > 0
    out = call(spark, "analyze_table", table=table)
    assert out["row-count"] == 59

    anc = call(spark, "ancestors_of", table=table)
    assert anc["snapshot_ids"][-1] == table.current_snapshot().snapshot_id

    with pytest.raises(ValueError, match="unknown procedure"):
        call(spark, "mystery", table=table)
    with pytest.raises(ValueError, match="binpack\\|full"):
        call(spark, "rewrite_data_files", table=table, strategy="sort")


def test_call_rollback_to_snapshot(spark, proc_table, tmp_path):
    """Rollback points main at an earlier snapshot on BOTH flavors."""
    from ic_spark.compaction.iceberg_meta import IcebergTable

    table = proc_table
    first = table.current_snapshot().snapshot_id
    d = str(tmp_path / "extra")
    spark.range(500, 510).coalesce(1).write.parquet(d)
    f = next(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))
    table.append_snapshot(
        [{"path": f, "sequence_number": 2, "content": "DATA",
          "file_size_in_bytes": os.path.getsize(f)}]
    )
    assert read_table(spark, table).count() == 70
    out = call(spark, "rollback_to_snapshot", table=table, snapshot_id=first)
    assert out["current_snapshot_id"] == first
    assert read_table(spark, table).count() == 60
    with pytest.raises(ValueError, match="not found"):
        call(spark, "rollback_to_snapshot", table=table, snapshot_id=999)

    df = spark.range(5)
    spec = IcebergTable.create(str(tmp_path / "rb_spec"), df.schema)
    d2 = str(tmp_path / "rb_seed")
    df.coalesce(1).write.parquet(d2)
    f2 = next(os.path.join(d2, n) for n in os.listdir(d2) if n.endswith(".parquet"))
    spec.append_snapshot([{"path": f2, "content": "DATA", "record_count": 5,
                           "file_size_in_bytes": os.path.getsize(f2)}])
    s1 = spec.current_snapshot_id()
    spec.append_snapshot([{"path": f2, "content": "DATA", "record_count": 5,
                           "file_size_in_bytes": os.path.getsize(f2)}])
    assert read_table(spark, spec).count() == 10
    spec.rollback_to_snapshot(s1)
    assert read_table(spark, spec).count() == 5


def test_call_fast_forward(spark, proc_table, tmp_path):
    table = proc_table
    d = str(tmp_path / "branchfile")
    spark.range(100, 105).coalesce(1).write.parquet(d)
    f = next(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))
    table.append_snapshot(
        [{"path": f, "sequence_number": 2, "content": "DATA",
          "file_size_in_bytes": os.path.getsize(f)}],
        branch="wip",
    )
    out = call(spark, "fast_forward", table=table, branch="wip")
    assert out["latest_snapshot_id"] == table.current_snapshot().snapshot_id
    assert read_table(spark, table).count() == 65
