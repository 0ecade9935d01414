"""Copy-on-write row operations: DELETE / UPDATE / MERGE INTO
(compaction/rowops.py) — file-level rewrite granularity, atomic commit,
no resurrection of MoR-deleted rows."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from ic_spark.compaction import ManifestTable
from ic_spark.compaction.deletes import read_table, write_position_deletes
from ic_spark.compaction.rowops import delete_where, merge_into, update_where
from ic_spark.compaction.writer import _stats_from_footer


def _entry(path: str, seq: int = 1) -> dict:
    record_count, column_stats, _ = _stats_from_footer(path, os.path.dirname(path))
    return {
        "path": path,
        "sequence_number": seq,
        "content": "DATA",
        "file_size_in_bytes": os.path.getsize(path),
        "record_count": record_count,
        "column_stats": column_stats,
    }


@pytest.fixture()
def id_table(spark, tmp_path):
    """Three data files with disjoint id ranges (stats-prunable):
    [0,10), [10,20), [20,30); value = id * 10."""
    table = ManifestTable(str(tmp_path / "tbl"))
    entries = []
    for i in range(3):
        df = spark.range(i * 10, (i + 1) * 10).select(
            F.col("id"), (F.col("id") * 10).alias("value")
        )
        d = str(tmp_path / f"data{i}")
        df.coalesce(1).write.parquet(d)
        f = next(
            os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet")
        )
        entries.append(_entry(f))
    table.append_snapshot(entries)
    return table


def _live_paths(table) -> set[str]:
    return {f["path"] for f in table.current_snapshot().files}


def test_delete_where_rewrites_only_matching_files(spark, id_table):
    before = _live_paths(id_table)
    stats = delete_where(spark, id_table, [("id", ">=", 12), ("id", "<=", 14)])
    assert stats["rewritten_files_count"] == 1  # stats prune: one file hit
    after = _live_paths(id_table)
    # The two untouched files keep their exact original paths.
    assert len(before & after) == 2
    out = read_table(spark, id_table)
    ids = sorted(r.id for r in out.collect())
    assert ids == [i for i in range(30) if not 12 <= i <= 14]


def test_delete_where_no_match_is_noop(spark, id_table):
    snap = id_table.current_snapshot().snapshot_id
    stats = delete_where(spark, id_table, [("id", ">=", 100)])
    assert stats["rewritten_files_count"] == 0
    assert id_table.current_snapshot().snapshot_id == snap


def test_delete_where_does_not_resurrect_mor_deletes(spark, id_table):
    """A position-deleted row in a rewritten file must stay gone, and
    rewritten rows must be immune to older equality deletes."""
    write_position_deletes(spark, id_table, F.col("id") == 13)
    assert read_table(spark, id_table).where("id = 13").count() == 0
    delete_where(spark, id_table, [("id", "=", 11)])
    ids = sorted(r.id for r in read_table(spark, id_table).collect())
    assert 13 not in ids and 11 not in ids
    assert len(ids) == 28


def test_update_where_assignments(spark, id_table):
    stats = update_where(
        spark,
        id_table,
        [("id", ">=", 20)],
        {"value": "value + 1"},
    )
    assert stats["rewritten_files_count"] == 1  # only the [20,30) file
    rows = {r.id: r.value for r in read_table(spark, id_table).collect()}
    assert len(rows) == 30
    for i in range(30):
        assert rows[i] == i * 10 + (1 if i >= 20 else 0)


def test_update_where_rejects_unknown_column(spark, id_table):
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(spark, id_table, [("id", "=", 1)], {"nope": "1"})


def test_merge_into_update_and_insert(spark, id_table):
    source = spark.createDataFrame(
        [(5, 5000), (25, 25000), (40, 40000)], "id long, value long"
    )
    before = _live_paths(id_table)
    stats = merge_into(spark, id_table, source, ["id"])
    after = _live_paths(id_table)
    # File [10,20) holds no source key: untouched.
    assert any(p in after for p in before)
    rows = {r.id: r.value for r in read_table(spark, id_table).collect()}
    assert len(rows) == 31  # 30 + 1 insert
    assert rows[5] == 5000 and rows[25] == 25000  # matched → updated
    assert rows[40] == 40000  # not matched → inserted
    assert rows[6] == 60  # neighbors untouched
    assert stats["rewritten_files_count"] == 2  # files [0,10) and [20,30)


def test_merge_into_delete_matched(spark, id_table):
    source = spark.createDataFrame([(7,), (8,)], "id long")
    stats = merge_into(
        spark,
        id_table,
        source,
        ["id"],
        when_matched="delete",
        insert_not_matched=False,
    )
    assert stats["rewritten_files_count"] == 1
    ids = sorted(r.id for r in read_table(spark, id_table).collect())
    assert ids == [i for i in range(30) if i not in (7, 8)]


def test_merge_into_partial_assignments(spark, id_table):
    """WHEN MATCHED THEN UPDATE SET value = value + src.delta — source
    carries only keys + referenced columns, not the full table row."""
    source = spark.createDataFrame(
        [(5, 1000), (25, 2000), (99, 3000)], "id long, delta long"
    )
    stats = merge_into(
        spark,
        id_table,
        source,
        ["id"],
        update_assignments={"value": "value + src.delta"},
        insert_not_matched=False,
    )
    assert stats["rewritten_files_count"] == 2
    rows = {r.id: r.value for r in read_table(spark, id_table).collect()}
    assert len(rows) == 30  # no inserts
    assert rows[5] == 50 + 1000 and rows[25] == 250 + 2000
    assert rows[6] == 60  # unmatched rows untouched
    with pytest.raises(ValueError, match="merge key"):
        merge_into(
            spark, id_table, source, ["id"],
            update_assignments={"id": "id + 1"}, insert_not_matched=False,
        )


def test_merge_source_wider_types_conform_to_table_schema(spark, tmp_path):
    """A source with wider column types (long where the table stores
    int) must not upcast the rewrite — regression: the union wrote
    bigint files that later reads rejected as non-promotable."""
    df = spark.range(0, 20).select(
        F.col("id").cast("int").alias("id"), F.lit(1).cast("int").alias("v")
    )
    table = ManifestTable(str(tmp_path / "tbl"))
    d = str(tmp_path / "seed")
    df.coalesce(1).write.parquet(d)
    f = next(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))
    table.append_snapshot([_entry(f)])
    src = spark.createDataFrame([(3, 99), (500, 5)], "id long, v long")  # wider
    merge_into(spark, table, src, ["id"])
    out = read_table(spark, table)  # read enforces the int schema
    rows = {r.id: r.v for r in out.collect()}
    assert rows[3] == 99 and rows[500] == 5 and len(rows) == 21
    assert out.schema["v"].dataType.simpleString() == "int"


def test_merge_into_pure_insert(spark, id_table):
    source = spark.createDataFrame([(100, 1), (101, 2)], "id long, value long")
    before = _live_paths(id_table)
    stats = merge_into(spark, id_table, source, ["id"])
    # No key matched, but the insert rides the standard rewrite with
    # the smallest live file as carrier (r9: the old raw-write path
    # bypassed partition fanout, lineage, and remote-FS routing) —
    # exactly one file is rewritten, all its rows carried.
    assert stats["rewritten_files_count"] == 1
    assert stats["added_files_count"] >= 1
    assert len(before - _live_paths(id_table)) == 1  # only the carrier
    rows = {r.id: r.value for r in read_table(spark, id_table).collect()}
    assert len(rows) == 32 and rows[100] == 1 and rows[101] == 2


def test_rowops_preserve_partition_layout(spark, tmp_path):
    """A COW rewrite over a table with a derived-column default spec
    re-fanouts under that spec (like full_compact) — new entries carry
    spec_id + partition values, so pruning keeps working."""
    table = ManifestTable(str(tmp_path / "tbl"))
    spec_id = table.update_partition_spec(
        [{"name": "id_bucket", "source": "id", "transform": "truncate", "width": 10}]
    )
    df = spark.range(0, 40).select("id", (F.col("id") * 10).alias("value"))
    d = str(tmp_path / "seed")
    df.coalesce(1).write.parquet(d)
    f = next(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))
    table.append_snapshot([_entry(f)])

    delete_where(spark, table, [("id", ">=", 0), ("id", "<", 5)])
    files = table.current_snapshot().files
    new_entries = [e for e in files if e["path"] != f]
    assert new_entries, "rewrite produced no entries"
    for e in new_entries:
        assert e.get("spec_id") == spec_id
        assert "id_bucket" in e.get("partition", {})
    assert read_table(spark, table).count() == 35
    # stats-pruned read over the partitioned layout still correct
    assert (
        read_table(spark, table, where=[("id", ">=", 30)]).count() == 10
    )


def test_rowops_over_spec_metadata_table(spark, tmp_path):
    """COW ops duck-type over the spec-format Iceberg metadata table:
    delete + merge on an IcebergTable with Avro manifests."""
    from ic_spark.compaction.iceberg_meta import IcebergTable

    loc = str(tmp_path / "spec_tbl")
    df = spark.range(0, 20).select("id", (F.col("id") + 100).alias("v"))
    tbl = IcebergTable.create(loc, df.schema)
    d = str(tmp_path / "seed")
    df.coalesce(1).write.parquet(d)
    f = next(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))
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
    delete_where(spark, tbl, [("id", "=", 3)])
    src = spark.createDataFrame([(4, -4), (40, -40)], "id long, v long")
    merge_into(spark, tbl, src, ["id"])
    rows = {r.id: r.v for r in read_table(spark, tbl).collect()}
    assert 3 not in rows
    assert rows[4] == -4 and rows[40] == -40
    assert len(rows) == 20  # 20 - 1 deleted + 1 inserted


def test_merge_into_oracle(spark, id_table):
    """Full MERGE semantics vs a DuckDB MERGE-equivalent query."""
    src_rows = [(3, 333), (13, 1313), (23, 2323), (77, 7777)]
    source = spark.createDataFrame(src_rows, "id long, value long")
    merge_into(spark, id_table, source, ["id"])
    got = sorted(
        (r.id, r.value) for r in read_table(spark, id_table).collect()
    )
    import duckdb

    con = duckdb.connect()
    con.execute(
        'CREATE TABLE t AS SELECT i::BIGINT AS id, (i*10)::BIGINT AS "value" '
        "FROM range(30) r(i)"
    )
    con.execute(
        'CREATE TABLE s(id BIGINT, "value" BIGINT); INSERT INTO s VALUES '
        + ",".join(f"({a},{b})" for a, b in src_rows)
    )
    want = con.execute(
        """
        SELECT id, COALESCE(s."value", t."value") AS v
        FROM t FULL OUTER JOIN s USING (id) ORDER BY 1
        """
    ).fetchall()
    assert got == [(int(a), int(b)) for a, b in want]


def test_update_where_multi_column_old_row_semantics(spark, id_table):
    """SQL UPDATE evaluates the predicate AND every RHS against the OLD
    row.  Sequential withColumn re-resolved both against already-
    mutated columns — {'id': …, 'value': 'id'} wrote value = new_id and
    a self-invalidating first assignment left later columns unset
    (r9 review find, confirmed by execution)."""
    # Assign BOTH columns where id = 5: id -> 500, value -> old id.
    update_where(
        spark,
        id_table,
        [("id", "=", 5)],
        {"id": "500", "value": "id"},
    )
    rows = {r.id: r.value for r in read_table(spark, id_table).collect()}
    assert 5 not in rows
    assert rows[500] == 5, "RHS must see the OLD id, not the updated one"
    # Self-referencing swap-like updates: both RHS see old values.
    update_where(
        spark,
        id_table,
        [("id", "=", 7)],
        {"id": "value", "value": "id + 1"},
    )
    rows = {r.id: r.value for r in read_table(spark, id_table).collect()}
    assert rows[70] == 8  # id := old value (70), value := old id + 1


def test_merge_into_duplicate_source_keys_raises(spark, id_table):
    """Spark/Iceberg MERGE raises a cardinality violation when one
    target row matches multiple source rows; silently fanning the
    target row out once per duplicate grew the table on every merge
    (r9 review find)."""
    dup = spark.createDataFrame(
        [(5, 1), (5, 2), (100, 3)], "id long, value long"
    )
    with pytest.raises(ValueError, match="cardinality"):
        merge_into(spark, id_table, dup, ["id"])
    # delete-only merges anti-join and are insensitive to duplicates
    stats = merge_into(
        spark, id_table, dup, ["id"],
        when_matched="delete", insert_not_matched=False,
    )
    assert stats["rewritten_files_count"] == 1
    assert 5 not in {r.id for r in read_table(spark, id_table).collect()}
