"""Iceberg views: spec-format view metadata + SQL resolution.

The Iceberg view spec (format-version 1) stores a view as versioned
metadata JSON: each version carries SQL representations per dialect, a
schema id, and a summary; ``current-version-id`` flips atomically and
the full version history is retained (view time travel / audit).  Same
Hadoop-layout commit discipline as ``IcebergTable``: O_EXCL version
files + a hint swap, losers conflict.

``resolve`` turns the current (or any historical) version into a
DataFrame by executing its SQL against the session — table names in
the SQL resolve against registered temp views / catalog tables, which
is exactly how engines consume Iceberg views.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from ic_spark.compaction.manifest import CommitConflictError


class IcebergView:
    """A Hadoop-layout Iceberg view (view-spec v1 metadata)."""

    def __init__(
        self,
        location: str,
        file_io: dict | None = None,
        *,
        single_writer: bool = False,
    ):
        from ic_spark.compaction.metafs import MetaFS

        self.file_io = file_io
        self._single_writer = single_writer
        self._mfs = MetaFS(location, file_io)
        self.root = self._mfs.root if self._mfs.is_local else location
        self.metadata_dir = os.path.join(self.root, "metadata")

    # -- creation / loading -------------------------------------------

    @classmethod
    def create(
        cls,
        location: str,
        sql: str,
        dialect: str = "spark",
        properties: dict | None = None,
        file_io: dict | None = None,
        single_writer: bool = False,
    ) -> "IcebergView":
        view = cls(location, file_io=file_io, single_writer=single_writer)
        if view.version() is not None:
            raise ValueError(f"view already exists at {location}")
        now = int(time.time() * 1000)
        meta = {
            "view-uuid": str(uuid.uuid4()),
            "format-version": 1,
            "location": location,
            "properties": properties or {},
            "schemas": [],
            "current-version-id": 1,
            "versions": [cls._version_entry(1, sql, dialect, now, "create")],
            "version-log": [{"timestamp-ms": now, "version-id": 1}],
        }
        view._commit_metadata(meta, expected_version=None)
        return view

    @staticmethod
    def _version_entry(
        version_id: int, sql: str, dialect: str, now: int, operation: str
    ) -> dict:
        return {
            "version-id": version_id,
            "timestamp-ms": now,
            "schema-id": -1,  # schema derived at resolve time
            "summary": {"operation": operation},
            "representations": [
                {"type": "sql", "sql": sql, "dialect": dialect}
            ],
            "default-namespace": [],
        }

    # -- metadata persistence (same pattern as IcebergTable) ----------

    def version(self) -> int | None:
        hint = os.path.join(self.metadata_dir, "version-hint.text")
        if not self._mfs.exists(hint):
            return None
        return int(self._mfs.read_text(hint).strip())

    def metadata(self, version: int | None = None) -> dict:
        v = self.version() if version is None else version
        if v is None:
            raise ValueError(f"no iceberg view at {self.root}")
        return self._mfs.read_json(
            os.path.join(self.metadata_dir, f"v{v}.metadata.json")
        )

    def _commit_metadata(self, meta: dict, expected_version: int | None) -> None:
        # Same seam discipline as IcebergTable._commit_metadata: local
        # keeps O_EXCL byte-for-byte; object-store exclusive create is
        # probe-then-PUT, so it is gated behind an explicit
        # single-writer declaration (see compaction/metafs).
        from ic_spark.compaction.metafs import check_remote_commit_safety

        check_remote_commit_safety(
            self._mfs, self._single_writer, meta.get("properties"), "view metadata"
        )
        self._mfs.makedirs(self.metadata_dir)
        current = self.version()
        if current != expected_version:
            raise CommitConflictError(
                f"view moved: expected metadata v{expected_version}, found v{current}"
            )
        new_version = (expected_version or 0) + 1
        path = os.path.join(self.metadata_dir, f"v{new_version}.metadata.json")
        try:
            self._mfs.create_exclusive(
                path, json.dumps(meta, indent=1).encode("utf-8")
            )
        except FileExistsError:
            raise CommitConflictError(
                f"concurrent commit: view metadata v{new_version} already exists"
            ) from None
        hint = os.path.join(self.metadata_dir, "version-hint.text")
        self._mfs.write_atomic(
            hint, str(new_version).encode("utf-8"), suffix=f".tmp{new_version}"
        )

    # -- view versions -------------------------------------------------

    def current_version(self) -> dict:
        meta = self.metadata()
        return next(
            v
            for v in meta["versions"]
            if v["version-id"] == meta["current-version-id"]
        )

    def sql_for(self, version_id: int | None = None, dialect: str = "spark") -> str:
        meta = self.metadata()
        vid = version_id if version_id is not None else meta["current-version-id"]
        version = next(
            (v for v in meta["versions"] if v["version-id"] == vid), None
        )
        if version is None:
            raise ValueError(f"view version {vid} not found")
        rep = next(
            (
                r
                for r in version["representations"]
                if r["type"] == "sql" and r.get("dialect") == dialect
            ),
            None,
        )
        if rep is None:
            raise ValueError(f"no {dialect!r} SQL representation in version {vid}")
        return rep["sql"]

    def replace(self, sql: str, dialect: str = "spark") -> int:
        """CREATE OR REPLACE VIEW: a NEW version becomes current; the
        old version stays in history (view time travel)."""
        # VERSION FIRST, then that exact version's metadata: the reverse
        # order let a concurrent replace land between the reads, pairing
        # stale metadata with a fresh expected_version — the CAS passed
        # and the racer's version vanished from history (r9 review find).
        version = self.version()
        meta = dict(self.metadata(version))
        now = int(time.time() * 1000)
        new_id = max(v["version-id"] for v in meta["versions"]) + 1
        meta["versions"] = list(meta["versions"]) + [
            self._version_entry(new_id, sql, dialect, now, "replace")
        ]
        meta["current-version-id"] = new_id
        meta["version-log"] = list(meta.get("version-log", [])) + [
            {"timestamp-ms": now, "version-id": new_id}
        ]
        self._commit_metadata(meta, expected_version=version)
        return new_id

    def resolve(
        self, spark: SparkSession, version_id: int | None = None
    ) -> DataFrame:
        """Execute the view's SQL (current or a historical version)."""
        return spark.sql(self.sql_for(version_id))

    def register(
        self, spark: SparkSession, name: str, version_id: int | None = None
    ) -> DataFrame:
        """Expose the view to SQL as a session temp view."""
        df = self.resolve(spark, version_id)
        df.createOrReplaceTempView(name)
        return df
