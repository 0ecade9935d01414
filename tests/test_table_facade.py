"""Unified Table façade (ic_spark/table.py): one handle end to end."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ic_spark.table import Table


@pytest.mark.slow
def test_facade_full_lifecycle_spec_flavor(spark, tmp_path):
    """create → append → DV delete → merge → analyze → compact → read,
    all through one handle over spec metadata."""
    df = spark.range(0, 200).select("id", (F.col("id") % 10).alias("g"))
    t = Table.create(spark, str(tmp_path / "t"), df.schema)
    t.append(df)
    assert t.count() == 200
    assert isinstance(t.inner.metadata(), dict)  # spec flavor

    t.write_deletion_vectors(F.col("g") == 9)
    assert t.count() == 180
    t.merge(
        spark.createDataFrame([(5, -5), (1000, -1)], "id long, g long"), ["id"]
    )
    rows = {r.id: r.g for r in t.read().collect()}
    assert rows[5] == -5 and rows[1000] == -1 and len(rows) == 181

    entry = t.analyze()
    assert entry["row-count"] == 181
    est = t.ndv_estimates()
    assert abs(est["id"] - 181) / 181 < 0.06

    t.compact()
    assert t.count() == 181
    files = t.metadata_table("files")
    assert files.where("content != 'DATA'").count() == 0  # deletes folded

    # auto-detect reload
    t2 = Table.at(spark, str(tmp_path / "t"))
    assert t2.count() == 181 and hasattr(t2.inner, "metadata")


def test_facade_json_flavor_cow_and_travel(spark, tmp_path):
    df = spark.range(0, 50).select("id", (F.col("id") * 2).alias("v"))
    t = Table.create(spark, str(tmp_path / "j"), df.schema, spec_metadata=False)
    t.append(df)
    first = t.inner.current_snapshot().snapshot_id
    t.delete_where([("id", "<", 5)])
    t.update_where([("id", "=", 10)], {"v": "v + 1"})
    rows = {r.id: r.v for r in t.read().collect()}
    assert len(rows) == 45 and rows[10] == 21
    # snapshot time travel through the same handle
    assert t.read(snapshot_id=first).count() == 50
    # branch write + fast forward
    extra = spark.range(100, 103).select("id", (F.col("id") * 2).alias("v"))
    t.append(extra, branch="wip")
    assert t.count() == 45
    t.fast_forward("wip")
    assert t.count() == 48
    out = t.call("rewrite_data_files", strategy="full")
    assert out["added_data_files_count"] >= 1
    assert t.count() == 48


def test_facade_schema_ddl(spark, tmp_path):
    """DDL through the handle: rename + widen + add, then a read that
    resolves old files under the new schema."""
    df = spark.range(0, 10).select(F.col("id").cast("int").alias("id"))
    t = Table.create(spark, str(tmp_path / "ddl"), df.schema)
    t.append(df)
    t.rename_column("id", "item_id")
    t.promote_column("item_id", __import__("pyspark.sql.types", fromlist=["LongType"]).LongType())
    t.add_column("note", __import__("pyspark.sql.types", fromlist=["StringType"]).StringType())
    out = t.read()
    assert out.columns == ["item_id", "note"]
    rows = out.collect()
    assert sorted(r.item_id for r in rows) == list(range(10))
    assert all(r.note is None for r in rows)
    # predicate delete resolves the CURRENT name over old-schema files
    t.append(spark.createDataFrame([(100, "x")], "item_id long, note string"))
    t.write_deletion_vectors(F.col("item_id") < 3)
    ids = sorted(r.item_id for r in t.read().collect())
    assert ids == [3, 4, 5, 6, 7, 8, 9, 100]
    # COW ops also rewrite old-schema files under the current names
    t.update_where([("item_id", "=", 4)], {"note": "'touched'"})
    t.delete_where([("item_id", "=", 9)])
    rows = {r.item_id: r.note for r in t.read().collect()}
    assert rows[4] == "touched" and 9 not in rows and len(rows) == 7


def test_facade_append_conforms_types(spark, tmp_path):
    """Appending a wider-typed frame casts onto the table schema."""
    base = spark.range(1).select(F.col("id").cast("int").alias("id"))
    t = Table.create(spark, str(tmp_path / "c"), base.schema)
    t.append(spark.range(5, 8))  # long ids into an int table
    out = t.read()
    assert out.schema["id"].dataType.simpleString() == "int"
    assert sorted(r.id for r in out.collect()) == [5, 6, 7]


def test_facade_passthrough_and_errors(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "p"), spark.range(1).schema)
    with pytest.raises(ValueError):
        t.read()  # empty table
    assert t.refs() == {}  # __getattr__ passthrough to the inner table


def test_full_compact_preserves_identity_partition_layout(spark, tmp_path):
    """Identity-partitioned tables (spec field name == source, the
    standard Iceberg shape) previously compacted into UNPARTITIONED
    files with null manifest partition values — the table's own
    maintenance destroyed its declared layout and all partition pruning
    (r9 review find, confirmed by execution).  The fanout writer now
    routes identity dirs through a prefixed derived column: values are
    recorded under the spec names, pruning works, and the source column
    stays in the data pages."""
    import os

    from ic_spark.table import Table

    df = spark.createDataFrame(
        [(i, f"r{i % 3}") for i in range(30)], "id long, region string"
    )
    for flavor, spec_metadata in (("spec", True), ("json", False)):
        t = Table.create(
            spark,
            str(tmp_path / f"t_{flavor}"),
            df.schema,
            partition_by=["region"],
            spec_metadata=spec_metadata,
        )
        t.append(df)
        t.compact()
        data, _, _ = t.inner.scan_tasks()
        vals = {
            (x.partition_values or {}).get("region") for x in data
        }
        assert vals == {"r0", "r1", "r2"}, (flavor, vals)
        pruned, _, _ = t.inner.scan_tasks(
            data_filter=[("region", "=", "r1")]
        )
        assert len(pruned) < len(data), flavor
        raw = spark.read.parquet(data[0].data_file_path)
        assert "region" in raw.columns, flavor  # source stays in pages
        assert t.read().count() == 30, flavor


def test_json_flavor_create_registers_schema_and_spec(spark, tmp_path):
    """Table.create(spec_metadata=False) previously DISCARDED the
    schema and partition_by silently (r9 review find)."""
    from ic_spark.table import Table

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    t = Table.create(
        spark,
        str(tmp_path / "j"),
        df.schema,
        partition_by=["v"],
        spec_metadata=False,
    )
    assert t.inner.schema() is not None
    assert t.inner.partition_spec() == [
        {"name": "v", "source": "v", "transform": "identity"}
    ]
    t.append(df)
    assert t.read().count() == 1


def test_branch_appends_get_increasing_sequence_numbers(spark, tmp_path):
    """Successive branch appends derived their sequence from MAIN's
    unchanged head and all stamped the same number, breaking the
    strictly-increasing invariant the equality-delete `<` guard needs
    after fast_forward (r9 review find)."""
    from ic_spark.table import Table

    df = spark.createDataFrame([(1,)], "id long")
    t = Table.create(
        spark, str(tmp_path / "b"), df.schema, spec_metadata=False
    )
    t.append(df)
    t.append(spark.createDataFrame([(2,)], "id long"), branch="dev")
    t.append(spark.createDataFrame([(3,)], "id long"), branch="dev")
    head = t.inner._load()["refs"]["dev"]
    snap = t.inner.snapshot_at(head)
    seqs = sorted({f["sequence_number"] for f in snap.files})
    assert seqs == [1, 2, 3], seqs
