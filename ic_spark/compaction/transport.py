"""Network transport for ``CompactorService`` — the reference's entry
point B (tonic gRPC server: ``services/compactor/src/rpc.rs:27-55``,
``server.rs:23-33``, ``bin/main.rs:25-47``).

The container ships no grpcio, so the default transport is a stdlib
ThreadingHTTPServer speaking the SAME two RPCs over HTTP POST:

    POST /compactor.CompactorService/RewriteFiles
    POST /compactor.CompactorService/Echo

with the body either the protobuf wire format from
``ic_spark.compaction.proto`` (``Content-Type: application/x-protobuf``,
the reference's exact message shapes) or the JSON analog from
``ic_spark.compaction.service`` (``application/json``).  Where grpcio
IS available, ``serve_grpc`` wires the same codec into a real gRPC
server — generic method handlers, no codegen needed.

Like the reference, the server executes the rewrite and returns file
metadata but never commits — the caller owns the table transaction.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import SparkSession

from ic_spark.compaction import proto
from ic_spark.compaction.service import CompactorService, decode_request, encode_response
from ic_spark.compaction.writer import rewrite_files

_PROTO_CT = "application/x-protobuf"


class _Handler(BaseHTTPRequestHandler):
    service: CompactorService  # set by make_server

    def log_message(self, *args):  # quiet test output
        pass

    def _reply(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self) -> None:  # noqa: N802 (stdlib naming)
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        ctype = self.headers.get("Content-Type", "application/json")
        method = self.path.rsplit("/", 1)[-1]
        try:
            if method == "Echo":
                if ctype == _PROTO_CT:
                    msg = proto.decode("EchoRequest", body).get("message", "")
                    out = proto.encode("EchoResponse", {"message": self.service.echo(msg)})
                else:
                    msg = json.loads(body or b"{}").get("message", "")
                    out = json.dumps({"message": self.service.echo(msg)}).encode()
                self._reply(200, out, ctype)
            elif method == "RewriteFiles":
                if ctype == _PROTO_CT:
                    request = proto.request_from_proto(body)
                    response = rewrite_files(self.service.spark, request)
                    out = proto.response_to_proto(response, request.schema)
                else:
                    out = json.dumps(self.service.rewrite_files(json.loads(body))).encode()
                self._reply(200, out, ctype)
            else:
                self._reply(404, f"unknown rpc: {method}".encode(), "text/plain")
        except Exception as exc:  # noqa: BLE001 — surface as 500, keep serving
            self._reply(500, str(exc).encode(), "text/plain")


class CompactorServer:
    """In-process server handle: ``start()`` → ``port``; ``stop()``."""

    def __init__(self, spark: SparkSession, host: str = "127.0.0.1", port: int = 0):
        handler = type("BoundHandler", (_Handler,), {"service": CompactorService(spark)})
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "CompactorServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def call(
    host: str, port: int, method: str, payload: bytes | dict[str, Any], use_proto: bool
) -> bytes | dict[str, Any]:
    """Minimal client for the two RPCs (tests / smoke scripts)."""
    from urllib.request import Request, urlopen

    if use_proto:
        body, ctype = payload, _PROTO_CT
    else:
        body, ctype = json.dumps(payload).encode(), "application/json"
    req = Request(
        f"http://{host}:{port}/compactor.CompactorService/{method}",
        data=body,
        headers={"Content-Type": ctype},
        method="POST",
    )
    with urlopen(req) as resp:
        raw = resp.read()
    return raw if use_proto else json.loads(raw)


def serve_grpc(spark: SparkSession, port: int = 50051):
    """Real gRPC transport where grpcio exists (absent in this
    container — the HTTP transport above is the tested path).

    Uses generic RPC handlers with the hand-rolled codec as the
    (de)serializer, mirroring rpc.rs's two methods 1:1.
    """
    try:
        import grpc  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover — env without grpcio
        raise ImportError(
            "grpcio is not installed; use CompactorServer (HTTP) instead"
        ) from exc

    service = CompactorService(spark)

    def _rewrite(request_bytes: bytes, _ctx) -> bytes:
        request = proto.request_from_proto(request_bytes)
        return proto.response_to_proto(
            rewrite_files(spark, request), request.schema
        )

    def _echo(request_bytes: bytes, _ctx) -> bytes:
        msg = proto.decode("EchoRequest", request_bytes).get("message", "")
        return proto.encode("EchoResponse", {"message": service.echo(msg)})

    handlers = grpc.method_handlers_generic_handler(
        "compactor.CompactorService",
        {
            "RewriteFiles": grpc.unary_unary_rpc_method_handler(
                _rewrite,
                request_deserializer=lambda b: b,
                response_serializer=lambda b: b,
            ),
            "Echo": grpc.unary_unary_rpc_method_handler(
                _echo,
                request_deserializer=lambda b: b,
                response_serializer=lambda b: b,
            ),
        },
    )
    server = grpc.server(
        __import__("concurrent.futures", fromlist=["ThreadPoolExecutor"]).ThreadPoolExecutor(
            max_workers=4
        )
    )
    server.add_generic_rpc_handlers((handlers,))
    server.add_insecure_port(f"[::]:{port}")
    server.start()
    return server


__all__ = ["CompactorServer", "call", "serve_grpc", "decode_request", "encode_response"]
