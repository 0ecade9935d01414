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
from ic_spark.compaction.procedures import call
from ic_spark.compaction.rest_catalog import RestCatalog, RestCatalogServer
from ic_spark.compaction.rowops import delete_where, merge_into, update_where
from ic_spark.compaction.stats import analyze_incremental, analyze_table
from ic_spark.compaction.views import IcebergView

__all__ = [
    "Compaction",
    "EqualityDeleteGroup",
    "FileScanTask",
    "IcebergTable",
    "ManifestTable",
    "RewriteFilesRequest",
    "RewriteFilesResponse",
    "RewriteFilesStat",
    "IcebergView",
    "RestCatalog",
    "RestCatalogServer",
    "analyze_incremental",
    "analyze_table",
    "build_merge_on_read",
    "call",
    "delete_where",
    "merge_into",
    "rewrite_files",
    "update_where",
]
