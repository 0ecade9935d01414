"""Compactor server entry point — ``python -m ic_spark.compaction``.

Analog of the reference's service binary
(``services/compactor/src/bin/main.rs:25-47``: read host/port config,
start the RPC server, serve until stopped).  Starts a local
SparkSession and the HTTP transport (gRPC via ``--grpc`` where grpcio
is installed).
"""

from __future__ import annotations

import argparse
import signal
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m ic_spark.compaction",
        description="Serve the compactor RewriteFiles/Echo RPCs",
    )
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument(
        "--grpc", action="store_true", help="serve gRPC instead of HTTP (needs grpcio)"
    )
    args = parser.parse_args(argv)

    from ic_spark.session import get_spark

    spark = get_spark("ic_spark-compactor")
    if args.grpc:
        from ic_spark.compaction.transport import serve_grpc

        server = serve_grpc(spark, args.port)
        print(f"compactor gRPC server on :{args.port}", flush=True)
        server.wait_for_termination()
        return 0

    from ic_spark.compaction.transport import CompactorServer

    server = CompactorServer(spark, args.host, args.port).start()
    print(f"compactor HTTP server on {args.host}:{server.port}", flush=True)
    stop = {"flag": False}

    def handle(_sig, _frm):
        stop["flag"] = True

    signal.signal(signal.SIGTERM, handle)
    signal.signal(signal.SIGINT, handle)
    try:
        while not stop["flag"]:
            signal.pause()
    finally:
        server.stop()
        print("compactor server stopped", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
