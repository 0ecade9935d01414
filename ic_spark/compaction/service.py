"""Remote-execution surface: request decode → rewrite → response encode.

Mirror of the reference's gRPC ``CompactorService``
(``core/proto/iceberg.proto:224-227``, ``services/compactor/src/rpc.rs:27-55``)
and its proto decode/encode layer (``core/src/parser/proto.rs:36-154,
380-434``), re-expressed as a transport-agnostic JSON contract: the
service decodes a fully-described rewrite request (schema + file scan
tasks), executes it, and returns new data-file metadata.  Like the
reference, the service does NOT commit — the caller owns the
transaction (rpc.rs leaves the catalog untouched).

The network transport lives in ``ic_spark.compaction.transport``
(stdlib HTTP server speaking JSON or the protobuf wire format from
``ic_spark.compaction.proto``; gRPC where grpcio exists).
"""

from __future__ import annotations

from dataclasses import asdict
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from ic_spark.compaction.request import (
    FileContent,
    FileScanTask,
    RewriteFilesRequest,
    RewriteFilesResponse,
)
from ic_spark.compaction.writer import rewrite_files


def decode_request(payload: dict[str, Any]) -> RewriteFilesRequest:
    """JSON → RewriteFilesRequest.

    Expected shape (analog of PbRewriteFilesRequest):
    {
      "schema": <StructType.jsonValue()>,
      "dir_path": str,
      "data_files": [{"path", "sequence_number"}...],
      "position_delete_files": [{"path"}...],
      "equality_delete_files": [{"path", "sequence_number", "equality_ids"}...],
      "partition_by": [col...], "target_partitions": int,
    }
    """
    schema = StructType.fromJson(payload["schema"])
    schema_history = payload.get("schema_history")
    if schema_history and not isinstance(
        next(iter(schema_history.get("schemas", {}).values()), ()), tuple
    ):
        # JSON payloads carry field types as Spark type-JSON values;
        # the planner's internal form holds DataType objects.
        from pyspark.sql.types import _parse_datatype_json_value

        schema_history = {
            "current_id": schema_history["current_id"],
            "schemas": {
                int(k): tuple(
                    (f[0], f[1], _parse_datatype_json_value(f[2]), f[3])
                    for f in v
                )
                for k, v in schema_history["schemas"].items()
            },
        }

    def tasks(key: str, content: FileContent) -> list[FileScanTask]:
        return [
            FileScanTask(
                data_file_path=t["path"],
                sequence_number=t.get("sequence_number", 0),
                content=content,
                equality_ids=tuple(t.get("equality_ids", ())),
                file_size_in_bytes=t.get("file_size_in_bytes", 0),
                file_format=t.get("file_format", "parquet"),
                # per-task evolution/lineage/partition metadata the
                # engine supports must survive the JSON transport —
                # silently dropping them null-filled identity partition
                # columns and degraded field-id resolution (r9 review
                # find)
                partition_values=t.get("partition_values"),
                write_schema_id=t.get("write_schema_id"),
                first_row_id=t.get("first_row_id"),
            )
            for t in payload.get(key, [])
        ]

    return RewriteFilesRequest(
        schema=schema,
        data_files=tasks("data_files", FileContent.DATA),
        position_delete_files=tasks("position_delete_files", FileContent.POSITION_DELETES),
        equality_delete_files=tasks("equality_delete_files", FileContent.EQUALITY_DELETES),
        dir_path=payload["dir_path"],
        partition_by=list(payload.get("partition_by", [])),
        target_partitions=int(payload.get("target_partitions", 4)),
        data_file_prefix=str(payload.get("data_file_prefix", "10")),
        max_records_per_file=int(payload.get("max_records_per_file", 0)),
        file_io=payload.get("file_io"),
        partition_spec=payload.get("partition_spec"),
        sort_order=payload.get("sort_order"),
        sort_order_id=int(payload.get("sort_order_id", 0)),
        zorder_by=payload.get("zorder_by"),
        data_file_format=payload.get("data_file_format", "parquet"),
        schema_history=schema_history,
        bloom_filter_cols=payload.get("bloom_filter_cols"),
        bloom_filter_ndv=payload.get("bloom_filter_ndv"),
        compression=payload.get("compression"),
        name_mapping=payload.get("name_mapping"),
    )


def encode_response(response: RewriteFilesResponse) -> dict[str, Any]:
    """RewriteFilesResponse → JSON (analog of the proto encoder)."""
    return {
        "data_files": [asdict(f) for f in response.data_files],
        "stat": asdict(response.stat),
    }


class CompactorService:
    """The reference's service surface: RewriteFiles + Echo."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def rewrite_files(self, payload: dict[str, Any]) -> dict[str, Any]:
        request = decode_request(payload)
        response = rewrite_files(self.spark, request)
        return encode_response(response)

    def echo(self, message: str) -> str:
        """Liveness probe (reference Echo RPC)."""
        return message
