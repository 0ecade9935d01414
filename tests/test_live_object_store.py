"""Live object-store smoke (VERDICT r11 #6): the injected-FS evidence
becomes deployment evidence whenever an environment offers a real
S3-compatible endpoint (MinIO, localstack, real S3).

Skipped by default — the build sandbox has no network.  To run::

    export IC_SPARK_S3_TEST_ENDPOINT=http://127.0.0.1:9000
    export IC_SPARK_S3_TEST_BUCKET=ic-spark-test        # must exist
    export IC_SPARK_S3_TEST_ACCESS_KEY=minioadmin
    export IC_SPARK_S3_TEST_SECRET_KEY=minioadmin

The test drives the METADATA plane (the part this repo owns — data
files would additionally need s3a jars on the Spark classpath, which
is a deployment concern, so the lifecycle here writes its parquet
locally and commits metadata remotely: the dual-plane split
``tests/test_metadata_fileio.py`` exercises via injection)."""

from __future__ import annotations

import os
import uuid

import pytest

_ENDPOINT = os.environ.get("IC_SPARK_S3_TEST_ENDPOINT")
_BUCKET = os.environ.get("IC_SPARK_S3_TEST_BUCKET")

pytestmark = pytest.mark.skipif(
    not (_ENDPOINT and _BUCKET),
    reason="no live object store configured "
    "(set IC_SPARK_S3_TEST_ENDPOINT and IC_SPARK_S3_TEST_BUCKET)",
)


def _fio():
    return {
        "props": {
            "s3.endpoint": _ENDPOINT,
            "s3.access-key-id": os.environ.get(
                "IC_SPARK_S3_TEST_ACCESS_KEY", "minioadmin"
            ),
            "s3.secret-access-key": os.environ.get(
                "IC_SPARK_S3_TEST_SECRET_KEY", "minioadmin"
            ),
        }
    }


def test_metafs_lifecycle_against_live_store():
    """MetaFS primitives against the real endpoint: atomic JSON
    publish, exclusive create (probe-then-PUT flavor), listing,
    normalize() membership keys, recursive walk, unlink."""
    from ic_spark.compaction.metafs import MetaFS

    root = f"s3://{_BUCKET}/metafs-{uuid.uuid4().hex[:8]}"
    mfs = MetaFS(root, _fio())
    assert not mfs.is_local

    mfs.write_json_atomic(mfs.path("state", "manifest.json"), {"v": 1})
    assert mfs.read_json(mfs.path("state", "manifest.json")) == {"v": 1}
    # caller-spelled URI and within-FS spelling land on one key
    spelled = f"{root}/state/manifest.json"
    assert mfs.normalize(spelled) == mfs.normalize(mfs.path("state", "manifest.json"))

    mfs.create_exclusive(mfs.path("v1.lock"), b"1")
    with pytest.raises(FileExistsError):
        mfs.create_exclusive(mfs.path("v1.lock"), b"2")

    files = mfs.walk_files(mfs.path("state"))
    assert any(f.endswith("manifest.json") for f in files)
    mfs.unlink(mfs.path("v1.lock"))
    assert not mfs.exists(mfs.path("v1.lock"))
    mfs.delete_dir(mfs.path("state"))


def test_iceberg_metadata_commits_against_live_store():
    """Hadoop-flavor table metadata on the real store: gated without a
    declaration, exact single-writer with one; version files, hint
    swap, and conflict detection all through the live connector."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from ic_spark.compaction.iceberg_meta import IcebergTable
    from ic_spark.compaction.manifest import CommitConflictError
    from ic_spark.compaction.metafs import UnsafeRemoteCommitError

    loc = f"s3://{_BUCKET}/tbl-{uuid.uuid4().hex[:8]}"
    schema = StructType([StructField("id", IntegerType())])

    with pytest.raises(UnsafeRemoteCommitError):
        IcebergTable.create(loc, schema, file_io=_fio())

    tbl = IcebergTable.create(loc, schema, file_io=_fio(), single_writer=True)
    assert tbl.version() == 1
    meta = tbl.metadata()
    tbl._commit_metadata(dict(meta), expected_version=1)
    assert tbl.version() == 2
    with pytest.raises(CommitConflictError):
        tbl._commit_metadata(dict(meta), expected_version=1)
