"""sqlite3-backed SQL catalog (compaction/sql_catalog.py) — the JDBC
catalog flavor the reference's integration test uses with Postgres
(/root/reference/core/src/compaction/mod.rs:183-202), plus a
catalog-PARAMETRIZED lifecycle proving all three flavors (Hadoop /
REST / SQL) expose the same load/commit/compare-and-swap contract over
full_compact."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from ic_spark.compaction import Compaction
from ic_spark.compaction.deletes import (
    read_table,
    write_deletion_vectors,
    write_equality_deletes,
)
from ic_spark.compaction.manifest import CommitConflictError
from ic_spark.compaction.sql_catalog import SqlCatalog
from ic_spark.compaction.writer import _stats_from_footer


def _seed(spark, tbl, tmp_path, tag, lo=0, hi=20):
    df = spark.range(lo, hi).select("id", (F.col("id") % 5).alias("bucket"))
    d = str(tmp_path / f"seed_{tag}")
    df.coalesce(1).write.mode("overwrite").parquet(d)
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
    return df


def test_sql_catalog_namespace_and_table_lifecycle(spark, tmp_path):
    cat = SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"))
    assert cat.list_namespaces() == []
    cat.create_namespace("analytics")
    assert cat.list_namespaces() == ["analytics"]
    with pytest.raises(ValueError, match="already exists"):
        cat.create_namespace("analytics")

    schema = spark.createDataFrame([], "id long, bucket long").schema
    tbl = cat.create_table("analytics", "events", schema)
    assert cat.list_tables("analytics") == ["events"]
    with pytest.raises(ValueError, match="already exists"):
        cat.create_table("analytics", "events", schema)

    _seed(spark, tbl, tmp_path, "sql1")
    loaded = cat.load_table("analytics", "events")
    assert read_table(spark, loaded).count() == 20
    # pointer advanced through the catalog, not version-hint
    assert loaded.version() == 2

    # rename moves only the catalog row
    cat.create_namespace("prod")
    cat.rename_table("analytics", "events", "prod", "events2")
    assert cat.list_tables("prod") == ["events2"]
    assert cat.list_tables("analytics") == []
    moved = cat.load_table("prod", "events2")
    assert read_table(spark, moved).count() == 20

    cat.drop_table("prod", "events2")
    with pytest.raises(ValueError, match="not found"):
        cat.load_table("prod", "events2")


def test_sql_catalog_commit_cas_one_winner(spark, tmp_path):
    """Two handles race a commit from the same base version: the SQL
    CAS lets exactly one win; the loser raises CommitConflictError and
    the winner's state is intact."""
    cat = SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"))
    cat.create_namespace("db")
    schema = spark.createDataFrame([], "id long, bucket long").schema
    tbl = cat.create_table("db", "t", schema)
    _seed(spark, tbl, tmp_path, "race")

    h1 = cat.load_table("db", "t")
    h2 = cat.load_table("db", "t")
    base = h1.version()
    _seed(spark, h1, tmp_path, "race_w", lo=100, hi=110)  # h1 commits
    assert h1.version() == base + 1
    # h2 drives its commit against the stale pointer via the low-level
    # path (its append would re-read the current pointer and succeed,
    # which is the normal retry; the CAS itself must reject staleness).
    with pytest.raises(CommitConflictError):
        h2._commit_metadata(h2.metadata(), expected_version=base)
    # winner state survives
    assert read_table(spark, cat.load_table("db", "t")).count() == 30


@pytest.fixture(params=["hadoop", "rest", "sql"])
def any_catalog_table(request, spark, tmp_path):
    """One table handle per catalog flavor, same duck-typed surface."""
    schema = spark.createDataFrame([], "id long, bucket long").schema
    if request.param == "hadoop":
        from ic_spark.compaction.iceberg_meta import IcebergTable

        yield IcebergTable.create(str(tmp_path / "hadoop_t"), schema), None
    elif request.param == "sql":
        cat = SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"))
        cat.create_namespace("db")
        yield cat.create_table("db", "t", schema), None
    else:
        from ic_spark.compaction.rest_catalog import (
            RestCatalog,
            RestCatalogServer,
        )

        server = RestCatalogServer(str(tmp_path / "warehouse")).start()
        client = RestCatalog(f"http://127.0.0.1:{server.port}")
        client.create_namespace("db")
        try:
            yield client.create_table("db", "t", schema), server
        finally:
            server.stop()


def test_catalog_parametrized_lifecycle_full_compact(
    spark, tmp_path, any_catalog_table
):
    """The reference's integration shape over EVERY catalog flavor:
    load -> append -> equality delete -> deletion vectors ->
    full_compact -> read; delete files folded, results identical."""
    tbl, _server = any_catalog_table
    _seed(spark, tbl, tmp_path, "lc1", 0, 30)
    _seed(spark, tbl, tmp_path, "lc2", 30, 60)

    write_equality_deletes(
        spark,
        tbl,
        spark.createDataFrame([(7,), (8,)], "id long"),
        ["id"],
    )
    write_deletion_vectors(spark, tbl, F.col("bucket") == 4)

    expected = sorted(
        i for i in range(60) if i not in (7, 8) and i % 5 != 4
    )
    assert sorted(r.id for r in read_table(spark, tbl).collect()) == expected

    resp = Compaction(spark).full_compact(tbl)
    assert resp.stat.rewritten_files_count >= 2
    data, pos, eq = tbl.scan_tasks()
    assert pos == [] and eq == []  # deletes folded
    assert sorted(r.id for r in read_table(spark, tbl).collect()) == expected

    # snapshot expiration works through every flavor too
    tbl.expire_snapshots()
    assert sorted(r.id for r in read_table(spark, tbl).collect()) == expected


# ------------------------------------------------- namespace properties


@pytest.fixture(params=["sql", "rest", "dir"])
def ns_catalog(request, tmp_path):
    """One namespace-properties surface per catalog flavor: the sqlite
    JDBC-schema catalog, the REST client over HTTP, and the REST
    server's directory backend driven directly (the Hadoop-warehouse
    flavor).  All three expose create_namespace(properties=...) /
    namespace_properties / update_namespace_properties /
    drop_namespace with the same response shapes; only the error TYPE
    differs (ValueError vs RestError), normalized here."""
    if request.param == "sql":
        yield SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh")), ValueError
    elif request.param == "rest":
        from ic_spark.compaction.rest_catalog import (
            RestCatalog,
            RestCatalogServer,
            RestError,
        )

        server = RestCatalogServer(str(tmp_path / "warehouse")).start()
        try:
            yield RestCatalog(f"http://127.0.0.1:{server.port}"), RestError
        finally:
            server.stop()
    else:
        from ic_spark.compaction.rest_catalog import CatalogBackend, RestError

        backend = CatalogBackend(str(tmp_path / "warehouse"))

        class DirCatalog:
            """Directory backend with the client-shaped surface."""

            def create_namespace(self, ns, properties=None):
                backend.create_namespace([ns], properties)

            def namespace_properties(self, ns):
                return backend.load_namespace(ns)["properties"]

            def update_namespace_properties(
                self, ns, updates=None, removals=None
            ):
                return backend.update_namespace_properties(
                    ns, updates or {}, removals or []
                )

            def drop_namespace(self, ns):
                backend.drop_namespace(ns)

            def create_table(self, ns, name, schema):
                from ic_spark.compaction.iceberg_meta import schema_to_iceberg

                return backend.create_table(
                    ns, {"name": name, "schema": schema_to_iceberg(schema)}
                )

            def drop_table(self, ns, name):
                backend.drop_table(ns, name, False)

        yield DirCatalog(), RestError


def test_namespace_properties_parametrized(spark, ns_catalog):
    """create-with-properties, read-back, update/remove with the REST
    UpdateNamespacePropertiesResponse contract, overlap rejection, and
    drop-refuses-non-empty — identical across all three flavors."""
    cat, err = ns_catalog
    cat.create_namespace("db", properties={"owner": "ic", "tier": "gold"})
    assert cat.namespace_properties("db") == {"owner": "ic", "tier": "gold"}

    resp = cat.update_namespace_properties(
        "db", updates={"tier": "silver", "ttl": "7d"}, removals=["owner", "ghost"]
    )
    assert resp["updated"] == ["tier", "ttl"]
    assert resp["removed"] == ["owner"]
    assert resp["missing"] == ["ghost"]
    assert cat.namespace_properties("db") == {"tier": "silver", "ttl": "7d"}

    # a key in both updates and removals is a contract violation
    with pytest.raises(err, match="both"):
        cat.update_namespace_properties(
            "db", updates={"x": "1"}, removals=["x"]
        )

    # unknown namespace surfaces as not-found
    with pytest.raises(err, match="not found"):
        cat.namespace_properties("nope")

    # drop refuses a namespace that still holds a table
    schema = spark.createDataFrame([], "id long").schema
    cat.create_table("db", "t", schema)
    with pytest.raises(err, match="not empty"):
        cat.drop_namespace("db")
    cat.drop_table("db", "t")
    cat.drop_namespace("db")
    with pytest.raises(err, match="not found"):
        cat.namespace_properties("db")


def test_sql_catalog_clean_orphan_metadata(spark, tmp_path):
    """Losing-racer / crashed-commit metadata files are listed and
    removable; the pointer chain (current + metadata-log) survives."""
    import os

    cat = SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"))
    cat.create_namespace("db")
    schema = spark.createDataFrame([], "id long, bucket long").schema
    tbl = cat.create_table("db", "t", schema)
    _seed(spark, tbl, tmp_path, "om1")
    _seed(spark, tbl, tmp_path, "om2", 20, 40)

    # orphans: a crashed commit and a losing racer at various versions
    for name in (
        "v2-deadbeefcafef00d.metadata.json",
        "v3-0123456789abcdef.metadata.json",
    ):
        with open(os.path.join(tbl.metadata_dir, name), "w") as f:
            f.write("{}")

    orphans = tbl.clean_orphan_metadata(older_than_s=0)
    assert sorted(os.path.basename(p) for p in orphans) == [
        "v2-deadbeefcafef00d.metadata.json",
        "v3-0123456789abcdef.metadata.json",
    ]
    # still on disk (dry run), then actually delete
    assert all(os.path.exists(p) for p in orphans)
    tbl.clean_orphan_metadata(older_than_s=0, delete=True)
    assert not any(os.path.exists(p) for p in orphans)
    # live chain intact: table still loads and commits
    assert read_table(spark, cat.load_table("db", "t")).count() == 40
    _seed(spark, cat.load_table("db", "t"), tmp_path, "om3", 40, 50)
    assert cat.load_table("db", "t").version() == 4
    # a fresh file inside the cutoff window is protected
    with open(os.path.join(tbl.metadata_dir, "v9-ffff0000ffff0000.metadata.json"), "w") as f:
        f.write("{}")
    assert tbl.clean_orphan_metadata() == []


def test_recreate_after_pointer_only_rename(spark, tmp_path):
    """rename_table moves only the catalog row; a later create of the
    OLD name must pick a fresh location instead of failing forever on
    the stale files (r9 review find)."""
    from ic_spark.compaction.sql_catalog import SqlCatalog

    cat = SqlCatalog(str(tmp_path / "wh"), str(tmp_path / "cat.db"))
    cat.create_namespace("ns")
    schema = spark.createDataFrame([], "id long").schema
    cat.create_table("ns", "a", schema)
    cat.rename_table("ns", "a", "ns", "b")
    assert cat.list_tables("ns") == ["b"]
    t2 = cat.create_table("ns", "a", schema)  # must not collide
    assert sorted(cat.list_tables("ns")) == ["a", "b"]
    assert t2.version() == 1


def test_sql_table_metadata_version_pin_conflicts_when_moved(spark, tmp_path):
    """The version-then-metadata commit discipline: asking the pointer
    catalog for a version it no longer points at raises the retryable
    conflict instead of returning a different version's metadata."""
    from ic_spark.compaction.manifest import CommitConflictError
    from ic_spark.compaction.sql_catalog import SqlCatalog

    cat = SqlCatalog(str(tmp_path / "wh"), str(tmp_path / "cat.db"))
    cat.create_namespace("ns")
    schema = spark.createDataFrame([], "id long").schema
    t = cat.create_table("ns", "t", schema)
    assert t.metadata(1)["table-uuid"]
    with pytest.raises(CommitConflictError, match="moved"):
        t.metadata(99)
