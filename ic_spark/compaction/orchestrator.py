"""Compaction orchestrator — full-table compaction end to end.

Semantic port of ``Compaction::full_compact``
(reference ``core/src/compaction/mod.rs:43-79``):

  load table → enumerate old files → plan scan tasks → rewrite
  (MoR plan + write) → commit rewrite transaction → stats.

The table abstraction is :class:`ic_spark.compaction.manifest.ManifestTable`
(JSON manifest with atomic swap) standing in for the Iceberg catalog.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from ic_spark.compaction.manifest import ManifestTable
from ic_spark.compaction.request import (
    RewriteFilesRequest,
    RewriteFilesResponse,
)
from ic_spark.compaction.writer import rewrite_files


class Compaction:
    """Full-table compaction against a ManifestTable."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def full_compact(
        self,
        table: ManifestTable,
        schema: StructType,
        partition_by: list[str] | None = None,
        target_partitions: int = 4,
    ) -> RewriteFilesResponse:
        """Reference mod.rs:43-79: plan → rewrite → commit swap."""
        data, pos, eq = table.scan_tasks()
        if not data:
            return RewriteFilesResponse()
        # New files land in a unique subdir — the commit is the only
        # point old readers switch over (snapshot isolation).
        out_dir = os.path.join(table.root, f"data-{uuid.uuid4().hex[:12]}")
        request = RewriteFilesRequest(
            schema=schema,
            data_files=data,
            position_delete_files=pos,
            equality_delete_files=eq,
            dir_path=out_dir,
            partition_by=partition_by or [],
            target_partitions=target_partitions,
        )
        response = rewrite_files(self.spark, request)

        removed = {t.data_file_path for t in data + pos + eq}
        added = [
            {
                "path": f.file_path,
                "sequence_number": max((t.sequence_number for t in data + eq), default=0) + 1,
                "content": "DATA",
                "file_size_in_bytes": f.file_size_in_bytes,
            }
            for f in response.data_files
        ]
        table.commit_rewrite(added, removed)
        return response

    def expire_snapshot(self, table: ManifestTable) -> list[str]:
        return table.expire_snapshots()
