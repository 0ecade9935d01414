"""Iceberg views (compaction/views.py) + REST view routes."""

from __future__ import annotations

import pytest

from ic_spark.compaction.views import IcebergView

from tests.conftest import SF_DIR


@pytest.fixture()
def nation_view_src(spark):
    spark.read.parquet(f"{SF_DIR}/nation.parquet").createOrReplaceTempView(
        "v_nation"
    )


def test_view_create_resolve_replace_history(spark, tmp_path, nation_view_src):
    loc = str(tmp_path / "v1")
    view = IcebergView.create(
        loc, "SELECT n_nationkey, n_name FROM v_nation WHERE n_regionkey = 0"
    )
    meta = view.metadata()
    assert meta["format-version"] == 1 and "view-uuid" in meta
    n0 = view.resolve(spark).count()
    assert n0 == spark.sql(
        "SELECT * FROM v_nation WHERE n_regionkey = 0"
    ).count()

    # CREATE OR REPLACE: new current version, old retained
    v2 = view.replace("SELECT n_nationkey FROM v_nation")
    assert v2 == 2 and view.metadata()["current-version-id"] == 2
    assert view.resolve(spark).count() == 25
    assert view.resolve(spark, version_id=1).count() == n0  # time travel
    assert len(view.metadata()["versions"]) == 2
    assert [e["version-id"] for e in view.metadata()["version-log"]] == [1, 2]

    # register exposes it to SQL
    view.register(spark, "reg_view")
    assert spark.sql("SELECT count(*) c FROM reg_view").collect()[0].c == 25

    with pytest.raises(ValueError, match="version 9"):
        view.sql_for(version_id=9)
    with pytest.raises(ValueError, match="already exists"):
        IcebergView.create(loc, "SELECT 1")


def test_rest_view_routes(spark, tmp_path, nation_view_src):
    from ic_spark.compaction.rest_catalog import (
        RestCatalog,
        RestCatalogServer,
        RestError,
    )

    server = RestCatalogServer(str(tmp_path / "wh")).start()
    try:
        cat = RestCatalog(f"http://127.0.0.1:{server.port}")
        cat.create_namespace("ns")
        cat.create_view("ns", "top_nations", "SELECT n_name FROM v_nation LIMIT 5")
        assert cat.list_views("ns") == ["top_nations"]
        view = cat.load_view("ns", "top_nations")
        assert view.resolve(spark).count() == 5
        cat.replace_view("ns", "top_nations", "SELECT n_name FROM v_nation")
        assert cat.load_view("ns", "top_nations").resolve(spark).count() == 25

        # views and tables don't shadow each other in listings
        cat.create_table("ns", "t", spark.range(1).schema)
        assert cat.list_tables("ns") == ["t"]
        assert cat.list_views("ns") == ["top_nations"]
        with pytest.raises(RestError) as e:  # a view is not a table
            cat.load_table("ns", "top_nations")
        assert e.value.code == 404

        cat.drop_view("ns", "top_nations")
        assert cat.list_views("ns") == []
        with pytest.raises(RestError) as e:
            cat.load_view("ns", "top_nations")
        assert e.value.code == 404
    finally:
        server.stop()


def test_view_replace_conflict_on_version_race(tmp_path, spark, nation_view_src):
    """Two handles replacing concurrently: the O_EXCL version commit
    lets exactly one win; the loser gets CommitConflictError."""
    from ic_spark.compaction.manifest import CommitConflictError

    loc = str(tmp_path / "race_view")
    a = IcebergView.create(loc, "SELECT 1 AS x")
    b = IcebergView(loc)
    a.replace("SELECT 2 AS x")
    with pytest.raises(CommitConflictError):
        # b read v1 metadata; its replace targets v2 which a already wrote
        meta = b.metadata()  # fresh read would succeed; replay a's race:
        stale = dict(meta)
        b._commit_metadata(stale, expected_version=1)
    # winner's state intact
    assert a.metadata()["current-version-id"] == 2
