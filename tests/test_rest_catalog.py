"""Iceberg REST catalog server + client (compaction/rest_catalog.py)."""

from __future__ import annotations

import os

import pytest

from ic_spark.compaction.rest_catalog import RestCatalog, RestCatalogServer, RestError


@pytest.fixture()
def catalog(tmp_path):
    server = RestCatalogServer(str(tmp_path / "warehouse")).start()
    try:
        yield RestCatalog(f"http://127.0.0.1:{server.port}")
    finally:
        server.stop()


def test_namespace_and_table_lifecycle(spark, catalog, tmp_path):
    assert catalog.config() == {"defaults": {}, "overrides": {}}
    assert catalog.list_namespaces() == []
    catalog.create_namespace("analytics")
    assert catalog.list_namespaces() == [["analytics"]]
    with pytest.raises(RestError) as e:
        catalog.create_namespace("analytics")
    assert e.value.code == 409

    schema = spark.createDataFrame([], "id long, v string").schema
    tbl = catalog.create_table("analytics", "events", schema)
    assert catalog.list_tables("analytics") == ["events"]
    assert tbl.schema() == schema
    with pytest.raises(RestError) as e:
        catalog.create_table("analytics", "events", schema)
    assert e.value.code == 409

    # the returned handle is a full IcebergTable: write + read through it
    from ic_spark.compaction import Compaction
    from ic_spark.compaction.deletes import read_table

    d = str(tmp_path / "seed")
    spark.createDataFrame([(1, "a"), (2, "b")], schema).coalesce(1).write.parquet(d)
    f = next(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))
    tbl.append_snapshot(
        [{"path": f, "content": "DATA", "record_count": 2,
          "file_size_in_bytes": os.path.getsize(f)}]
    )
    loaded = catalog.load_table("analytics", "events")
    assert sorted(r.id for r in read_table(spark, loaded).collect()) == [1, 2]
    Compaction(spark).full_compact(loaded)
    assert read_table(spark, loaded).count() == 2

    catalog.drop_table("analytics", "events")
    with pytest.raises(RestError) as e:
        catalog.load_table("analytics", "events")
    assert e.value.code == 404
    assert catalog.list_tables("analytics") == []


def test_commit_table_requirements_and_updates(spark, catalog):
    catalog.create_namespace("ns")
    schema = spark.createDataFrame([], "id long").schema
    catalog.create_table("ns", "t", schema)
    meta = catalog.load_metadata("ns", "t")
    uuid = meta["table-uuid"]

    # add a snapshot + move main, gated on the current (empty) state
    snap = {
        "snapshot-id": 777,
        "sequence-number": 1,
        "timestamp-ms": 1,
        "manifest-list": "/nonexistent.avro",
        "summary": {"operation": "append"},
    }
    out = catalog.commit_table(
        "ns",
        "t",
        requirements=[
            {"type": "assert-table-uuid", "uuid": uuid},
            {"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": None},
        ],
        updates=[
            {"type": "add-snapshot", "snapshot": snap},
            {"type": "set-snapshot-ref", "ref-name": "main", "snapshot-id": 777},
            {"type": "set-properties", "updates": {"owner": "etl"}},
        ],
    )
    assert out["metadata"]["current-snapshot-id"] == 777
    assert out["metadata"]["properties"]["owner"] == "etl"

    # stale expectation now → 409 (CommitFailedException contract)
    with pytest.raises(RestError) as e:
        catalog.commit_table(
            "ns",
            "t",
            requirements=[
                {"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": None}
            ],
            updates=[],
        )
    assert e.value.code == 409

    # wrong uuid → 409; unknown update type → 400
    with pytest.raises(RestError) as e:
        catalog.commit_table(
            "ns", "t",
            requirements=[{"type": "assert-table-uuid", "uuid": "nope"}],
            updates=[],
        )
    assert e.value.code == 409
    with pytest.raises(RestError) as e:
        catalog.commit_table(
            "ns", "t", requirements=[], updates=[{"type": "mystery"}]
        )
    assert e.value.code == 400

    # remove-properties round-trip
    catalog.commit_table(
        "ns", "t", requirements=[],
        updates=[{"type": "remove-properties", "removals": ["owner"]}],
    )
    assert "owner" not in catalog.load_metadata("ns", "t").get("properties", {})


def test_rename_table(spark, catalog):
    catalog.create_namespace("a")
    catalog.create_namespace("b")
    schema = spark.createDataFrame([], "id long").schema
    catalog.create_table("a", "t1", schema)
    catalog.rename_table("a", "t1", "b", "t2")
    assert catalog.list_tables("a") == [] and catalog.list_tables("b") == ["t2"]
    assert catalog.load_table("b", "t2").schema() == schema
    catalog.create_table("a", "t1", schema)
    with pytest.raises(RestError) as e:  # destination taken
        catalog.rename_table("a", "t1", "b", "t2")
    assert e.value.code == 409
    with pytest.raises(RestError) as e:  # source missing
        catalog.rename_table("a", "ghost", "b", "t3")
    assert e.value.code == 404


def test_commit_statistics_updates(spark, catalog):
    catalog.create_namespace("s")
    catalog.create_table("s", "t", spark.range(1).schema)
    st = {
        "snapshot-id": 1,
        "statistics-path": "/stats/x.puffin",
        "file-size-in-bytes": 10,
        "blob-metadata": [],
    }
    out = catalog.commit_table(
        "s", "t", requirements=[], updates=[{"type": "set-statistics", "statistics": st}]
    )
    assert out["metadata"]["statistics"] == [st]
    # re-set for the same snapshot replaces, not stacks
    st2 = dict(st, **{"statistics-path": "/stats/y.puffin"})
    out = catalog.commit_table(
        "s", "t", requirements=[], updates=[{"type": "set-statistics", "statistics": st2}]
    )
    assert out["metadata"]["statistics"] == [st2]
    out = catalog.commit_table(
        "s", "t", requirements=[], updates=[{"type": "remove-statistics", "snapshot-id": 1}]
    )
    assert out["metadata"]["statistics"] == []


def test_concurrent_commit_race_one_loses(spark, catalog):
    """Two racing commitTable calls: exactly one succeeds, the loser
    gets 409 — the REST CommitFailedException contract end to end."""
    import threading

    catalog.create_namespace("race")
    catalog.create_table("race", "t", spark.range(1).schema)
    results = []

    def commit(tag):
        try:
            catalog.commit_table(
                "race", "t", requirements=[],
                updates=[{"type": "set-properties", "updates": {"who": tag}}],
            )
            results.append(("ok", tag))
        except RestError as e:
            results.append(("err", e.code))

    # serialize on the server's version commit: fire many racers
    threads = [threading.Thread(target=commit, args=(str(i),)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    oks = [r for r in results if r[0] == "ok"]
    errs = [r for r in results if r[0] == "err"]
    assert len(oks) + len(errs) == 6 and len(oks) >= 1
    assert all(code == 409 for _, code in errs)


def test_rest_routes_errors(catalog):
    with pytest.raises(RestError) as e:
        catalog.list_tables("ghost")
    assert e.value.code == 404
    with pytest.raises(RestError) as e:
        catalog._call("GET", "/v1/unknown")
    assert e.value.code == 404


def test_rest_rejects_path_traversal_names(spark, catalog, tmp_path):
    """Catalog names are filesystem path segments: '.'/'..'/dotted or
    encoded-traversal names must be rejected everywhere, or a purge
    drop of a table named '..' rmtree's the whole warehouse (r9 review
    find, confirmed by execution against the pre-fix code)."""
    catalog.create_namespace("ns")
    schema = spark.createDataFrame([], "id long").schema
    catalog.create_table("ns", "t", schema)
    for bad in ("..", ".", "a.b", "a/b", ""):
        with pytest.raises(RestError) as e:
            catalog.create_table("ns", bad, schema)
        assert e.value.code == 400, bad
    with pytest.raises(RestError) as e:
        catalog.create_namespace("..")
    assert e.value.code == 400
    with pytest.raises(RestError) as e:
        catalog.create_namespace("/tmp/evil")
    assert e.value.code == 400
    # encoded traversal on lookup routes resolves to 404, never a path
    import urllib.error
    import urllib.request

    for url in ("namespaces/%2e%2e", "namespaces/ns/tables/%2e%2e"):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{catalog.uri}/v1/{url}")
        assert e.value.code == 404, url
    # warehouse intact
    assert catalog.list_tables("ns") == ["t"]


def test_rest_commit_updates_snapshot_log_for_time_travel(spark, catalog):
    """add-snapshot + set-snapshot-ref through the REST commit route
    must maintain snapshot-log / last-updated-ms / last-sequence-number
    like every internal commit path — TIMESTAMP AS OF plans exclusively
    from snapshot-log and REST-committed snapshots were invisible to it
    (r9 review find)."""
    catalog.create_namespace("tt")
    schema = spark.createDataFrame([], "id long").schema
    tbl = catalog.create_table("tt", "t", schema)
    snap = {
        "snapshot-id": 4242,
        "sequence-number": 7,
        "timestamp-ms": 1_700_000_000_000,
        "manifest-list": "/nonexistent.avro",
        "summary": {"operation": "append"},
    }
    catalog.commit_table(
        "tt", "t",
        requirements=[],
        updates=[
            {"type": "add-snapshot", "snapshot": snap},
            {"type": "set-snapshot-ref", "ref-name": "main",
             "snapshot-id": 4242},
        ],
    )
    fresh = catalog.load_table("tt", "t")
    assert fresh.snapshot_id_as_of(1_700_000_000_001) == 4242
    meta = fresh.metadata()
    assert meta["last-sequence-number"] >= 7
    assert any(
        e["snapshot-id"] == 4242 for e in meta.get("snapshot-log", [])
    )


def test_rest_non_purge_drop_create_drop_cycle(spark, catalog):
    """A second create+drop cycle of the same table name must not 500
    on the leftover '.dropped' directory (r9 review find — os.replace
    hit ENOTEMPTY and the table could never be dropped again)."""
    catalog.create_namespace("cyc")
    schema = spark.createDataFrame([], "id long").schema
    for _ in range(3):
        catalog.create_table("cyc", "t", schema)
        catalog.drop_table("cyc", "t", purge=False)
        assert catalog.list_tables("cyc") == []
