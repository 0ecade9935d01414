"""Regression tests for the round-4 ADVICE findings (fixed round 5).

1. changelog.py: equality-delete DELETE emission must not re-report
   rows that were already hidden before the commit (net per-commit
   change — Iceberg changelog semantics).
2. changelog.py: scans must carry name_mapping/schema_history so
   evolved-spec tables emit real values, not silent NULLs.
3. sql_catalog.py: commit metadata files are collision-free
   (<version>-<uuid>), so a crash between file write and pointer CAS
   can never wedge the table.
4. sql_catalog.py: identifier validation rejects traversal segments and
   purge refuses locations outside the warehouse.
5. sql_catalog.py: duplicate create_namespace surfaces as ValueError
   even under the serialized check+insert.
"""

from __future__ import annotations

import os
import sqlite3

import pyspark.sql.functions as F
import pytest

from ic_spark.compaction.changelog import read_changelog
from ic_spark.compaction.deletes import (
    merge_upsert,
    write_position_deletes,
)
from ic_spark.compaction.iceberg_meta import IcebergTable
from ic_spark.compaction.manifest import CommitConflictError
from ic_spark.compaction.sql_catalog import SqlCatalog
from ic_spark.compaction.writer import _stats_from_footer


def _append(spark, tbl, df, tmp_path, tag):
    d = str(tmp_path / f"seed_{tag}")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    f = next(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))
    rc, cs, _ = _stats_from_footer(f, d)
    return tbl.append_snapshot(
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


def _mk(spark, tmp_path, tag):
    root = str(tmp_path / f"spec_{tag}")
    df = spark.range(0, 20).select("id", (F.col("id") % 4).alias("k"))
    tbl = IcebergTable.create(root, df.schema)
    snap0 = _append(spark, tbl, df, tmp_path, f"{tag}_0")
    return tbl, snap0


def _changes(df):
    return sorted(
        (r._change_type, r.id, r.k, r._change_ordinal) for r in df.collect()
    )


# -- changelog: no spurious DELETE for already-hidden rows -------------


def test_changelog_eq_delete_skips_position_hidden_row(spark, tmp_path):
    """A row hidden by an earlier position delete that also matches a
    later equality-delete key must NOT be re-emitted as DELETE."""
    tbl, snap0 = _mk(spark, tmp_path, "eqpos")
    write_position_deletes(spark, tbl, F.col("id") == 5)  # commit 0
    merge_upsert(  # commit 1: eq-delete key id=5 + insert replacement
        spark, tbl, spark.createDataFrame([(5, 99)], "id long, k long"), ["id"]
    )
    got = _changes(read_changelog(spark, tbl, snap0))
    assert got == sorted(
        [("DELETE", 5, 1, 0), ("INSERT", 5, 99, 1)]
    )  # no ("DELETE", 5, 1, 1)


def test_changelog_eq_delete_skips_eq_hidden_row(spark, tmp_path):
    """Upserting the same key twice: the second commit deletes only the
    first replacement, never the original row the first upsert already
    hid (strict-seq guard alone would match both)."""
    tbl, snap0 = _mk(spark, tmp_path, "eqeq")
    merge_upsert(
        spark, tbl, spark.createDataFrame([(6, 60)], "id long, k long"), ["id"]
    )
    merge_upsert(
        spark, tbl, spark.createDataFrame([(6, 61)], "id long, k long"), ["id"]
    )
    got = _changes(read_changelog(spark, tbl, snap0))
    assert got == sorted(
        [
            ("DELETE", 6, 2, 0),   # original row (k = 6 % 4)
            ("INSERT", 6, 60, 0),
            ("DELETE", 6, 60, 1),  # first replacement only
            ("INSERT", 6, 61, 1),
        ]
    )


def test_changelog_pos_delete_skips_eq_hidden_row(spark, tmp_path):
    """A position delete landing on a row an earlier equality delete
    already hid emits nothing for that row."""
    tbl, snap0 = _mk(spark, tmp_path, "poseq")
    merge_upsert(  # hides original id=5 (k=1) behind an eq delete
        spark, tbl, spark.createDataFrame([(5, 99)], "id long, k long"), ["id"]
    )
    write_position_deletes(spark, tbl, F.col("k") == 1)
    got = _changes(read_changelog(spark, tbl, snap0))
    want = [("DELETE", 5, 1, 0), ("INSERT", 5, 99, 0)] + [
        ("DELETE", i, 1, 1) for i in (1, 9, 13, 17)  # NOT original id=5
    ]
    assert got == sorted(want)


def test_changelog_reads_renamed_columns_from_old_files(spark, tmp_path):
    """Evolved spec table: changelog scans must resolve pre-rename
    footer names via name_mapping/schema_history instead of silently
    null-filling emitted CDC rows."""
    root = str(tmp_path / "spec_evo")
    df = spark.range(0, 10).select(
        "id", F.concat(F.lit("n"), F.col("id")).alias("note")
    )
    tbl = IcebergTable.create(root, df.schema)
    snap0 = _append(spark, tbl, df, tmp_path, "evo_0")
    tbl.rename_column("note", "remark")
    write_position_deletes(spark, tbl, F.col("id") == 2)
    log = read_changelog(spark, tbl, snap0)
    rows = [(r._change_type, r.id, r.remark) for r in log.collect()]
    assert rows == [("DELETE", 2, "n2")]  # value present, not NULL


# -- sql catalog: crash-safe commits, identifier hygiene ---------------


def _cat_table(spark, cat, tmp_path, tag):
    cat.create_namespace("db")
    schema = spark.createDataFrame([], "id long, bucket long").schema
    tbl = cat.create_table("db", tag, schema)
    df = spark.range(0, 20).select("id", (F.col("id") % 5).alias("bucket"))
    _append(spark, tbl, df, tmp_path, f"cat_{tag}")
    return tbl


def test_sql_catalog_orphan_metadata_never_wedges(spark, tmp_path):
    """A crash after the metadata-file write but before the pointer CAS
    leaves an orphan; the collision-free <version>-<uuid> names mean the
    next commit succeeds regardless."""
    cat = SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"))
    tbl = _cat_table(spark, cat, tmp_path, "t")
    assert tbl.version() == 2

    # Simulate pre-crash orphans at every name an old-style committer
    # could collide with.
    for orphan in ("v3.metadata.json", "v3-deadbeefdeadbeef.metadata.json"):
        with open(os.path.join(tbl.metadata_dir, orphan), "w") as f:
            f.write("{}")

    df = spark.range(20, 25).select("id", (F.col("id") % 5).alias("bucket"))
    _append(spark, tbl, df, tmp_path, "cat_t2")  # must not conflict
    assert tbl.version() == 3
    pointer = cat._pointer("db", "t")
    assert os.path.basename(pointer).startswith("v3-")
    assert os.path.getsize(pointer) > 2  # not one of the orphan stubs

    # A stale racer still loses cleanly and a reload commits fine.
    stale = cat.load_table("db", "t")
    fresh = cat.load_table("db", "t")
    df2 = spark.range(25, 30).select("id", (F.col("id") % 5).alias("bucket"))
    _append(spark, fresh, df2, tmp_path, "cat_t3")
    with pytest.raises(CommitConflictError):
        stale._commit_metadata(stale.metadata(), 3)
    _append(spark, cat.load_table("db", "t"), df2, tmp_path, "cat_t4")
    assert cat.load_table("db", "t").version() == 5


def test_sql_catalog_rejects_traversal_identifiers(spark, tmp_path):
    cat = SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"))
    for bad_ns in ("..", "a/..", "../up", "a/b", ""):
        with pytest.raises(ValueError, match="bad namespace"):
            cat.create_namespace(bad_ns)
    cat.create_namespace("db")
    schema = spark.createDataFrame([], "id long").schema
    for bad in ("..", "t/../x", "a/b", ""):
        with pytest.raises(ValueError, match="bad table name"):
            cat.create_table("db", bad, schema)
    cat.create_table("db", "t", schema)
    with pytest.raises(ValueError, match="bad table name"):
        cat.rename_table("db", "t", "db", "..")
    # dotted multi-segment names stay legal
    cat.create_namespace("a.b")


def test_sql_catalog_purge_refuses_outside_warehouse(spark, tmp_path):
    cat = SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"))
    cat.create_namespace("db")
    outside = tmp_path / "precious"
    outside.mkdir()
    (outside / "keep.txt").write_text("do not delete")
    # A hostile/corrupt catalog row pointing outside the warehouse.
    with sqlite3.connect(str(tmp_path / "cat.db")) as con:
        con.execute(
            "INSERT INTO iceberg_tables VALUES (?,?,?,?,NULL)",
            (
                cat.name,
                "db",
                "evil",
                str(outside / "metadata" / "v1.metadata.json"),
            ),
        )
    with pytest.raises(ValueError, match="outside warehouse"):
        cat.drop_table("db", "evil", purge=True)
    assert (outside / "keep.txt").exists()


@pytest.mark.slow
def test_dv_commit_auto_routes_distributed_on_file_count(
    spark, tmp_path, monkeypatch
):
    """commit_deletion_vectors defaults to the executor-side path above
    the file-count threshold — same table state, no driver blob collect
    for wide deletes (round-4 VERDICT #2)."""
    import ic_spark.compaction.deletes as deletes
    from ic_spark.compaction.deletes import read_table, write_deletion_vectors
    from ic_spark.compaction.manifest import ManifestTable
    from ic_spark.sources.puffin import DV_BLOB_TYPE, read_puffin

    def mk(name):
        table = ManifestTable(str(tmp_path / name))
        df = spark.range(0, 90).select("id", (F.col("id") % 9).alias("bucket"))
        entries = []
        for i in range(3):
            d = str(tmp_path / f"{name}_data{i}")
            df.where(f"id % 3 = {i}").coalesce(1).write.parquet(d)
            f = next(
                os.path.join(d, n)
                for n in os.listdir(d)
                if n.endswith(".parquet")
            )
            entries.append(
                {
                    "path": f,
                    "sequence_number": 1,
                    "content": "DATA",
                    "file_size_in_bytes": os.path.getsize(f),
                }
            )
        table.append_snapshot(entries)
        return table

    def dv_layout(table):
        _, pos, _ = table.scan_tasks()
        names = sorted(os.path.basename(t.data_file_path) for t in pos)
        blobs = {}
        for t in pos:
            for b in read_puffin(t.data_file_path):
                if b.type == DV_BLOB_TYPE:
                    ref = os.path.dirname(b.properties["referenced-data-file"])
                    blobs[ref.rsplit("_data", 1)[-1]] = b.data
        return names, blobs

    # 3 files, threshold 2 -> routes DISTRIBUTED without being asked.
    monkeypatch.setattr(deletes, "DV_DISTRIBUTED_FILE_THRESHOLD", 2)
    t_auto = mk("auto")
    write_deletion_vectors(spark, t_auto, F.col("bucket") == 4)
    auto_names, auto_blobs = dv_layout(t_auto)
    assert all(n.startswith("part-") for n in auto_names)  # executor layout

    # Threshold above the file count -> stays on the driver path,
    # byte-identical bitmaps either way.
    monkeypatch.setattr(deletes, "DV_DISTRIBUTED_FILE_THRESHOLD", 100)
    t_drv = mk("drv")
    write_deletion_vectors(spark, t_drv, F.col("bucket") == 4)
    drv_names, drv_blobs = dv_layout(t_drv)
    assert drv_names == ["deletes.puffin"]
    assert auto_blobs == drv_blobs
    assert sorted(r.id for r in read_table(spark, t_auto).collect()) == sorted(
        r.id for r in read_table(spark, t_drv).collect()
    )


def test_sql_catalog_duplicate_namespace_is_valueerror(spark, tmp_path):
    cat = SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"))
    cat.create_namespace("db")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_namespace("db")
