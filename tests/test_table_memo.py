"""load_table's lazy-DataFrame memo: plan reuse, never result reuse.

The memo caches the *unexecuted* DataFrame per (session, realpath,
mtime_ns, size) so repeated query construction skips ~0.1 s of driver
py4j/DataSource work per table.  These tests pin the two properties
that make it safe: a hit returns the same lazy plan (and every action
still reads the files as they are NOW), and any rewrite of the fixture
changes the stat key so the next load is fresh.
"""

import os
import shutil

import pytest

from ic_spark.tables import _DF_MEMO, load_table


@pytest.fixture
def tmp_sf_dir(spark, tmp_path):
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.range(0, 100).selectExpr("id as c_custkey", "id * 2 as c_nationkey")\
        .coalesce(1).write.parquet(os.path.join(d, "customer.parquet"))
    return d


def test_memo_hit_returns_same_plan(spark, tmp_sf_dir):
    a = load_table(spark, tmp_sf_dir, "customer")
    b = load_table(spark, tmp_sf_dir, "customer")
    assert a is b  # same lazy plan object — no result materialization
    assert a.count() == 100


def test_overwrite_invalidates(spark, tmp_sf_dir):
    a = load_table(spark, tmp_sf_dir, "customer")
    assert a.count() == 100
    # Rewrite the fixture in place (what the bench's scaled-data
    # regeneration does): dir mtime changes, so the memo must refresh.
    path = os.path.join(tmp_sf_dir, "customer.parquet")
    shutil.rmtree(path)
    spark.range(0, 37).selectExpr("id as c_custkey", "id as c_nationkey")\
        .coalesce(1).write.parquet(path)
    b = load_table(spark, tmp_sf_dir, "customer")
    assert b.count() == 37


def test_missing_path_not_memoized(spark, tmp_path):
    before = len(_DF_MEMO)
    with pytest.raises(Exception):
        load_table(spark, str(tmp_path / "nope"), "customer")
    assert len(_DF_MEMO) == before
