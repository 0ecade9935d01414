"""Merge-on-read compaction — the reference engine's core capability.

Reference: ``core/src/compaction/mod.rs`` (orchestrator),
``core/src/executor/datafusion/datafusion_processor.rs`` (plan build),
``core/src/executor/datafusion/iceberg_file_task_scan.rs`` (scan +
hidden columns), ``core/src/executor/datafusion/mod.rs`` (write).
"""

from ic_spark.compaction.request import (
    EqualityDeleteGroup,
    FileScanTask,
    RewriteFilesRequest,
    RewriteFilesResponse,
    RewriteFilesStat,
)
from ic_spark.compaction.planner import build_merge_on_read
from ic_spark.compaction.writer import rewrite_files
from ic_spark.compaction.iceberg_meta import IcebergTable
from ic_spark.compaction.manifest import ManifestTable
from ic_spark.compaction.orchestrator import Compaction

__all__ = [
    "Compaction",
    "EqualityDeleteGroup",
    "FileScanTask",
    "IcebergTable",
    "ManifestTable",
    "RewriteFilesRequest",
    "RewriteFilesResponse",
    "RewriteFilesStat",
    "build_merge_on_read",
    "rewrite_files",
]
