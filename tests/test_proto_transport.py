"""Protobuf wire-format codec + network transport tests.

Mirrors the reference's proto round-trip tests
(core/src/parser/proto.rs:549-786: nested schema decode, task lists,
equality ids) and its tonic server surface (services/compactor/src/
rpc.rs:27-55) — here over the stdlib HTTP transport with both JSON and
proto bodies.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from ic_spark.compaction import proto
from ic_spark.compaction.request import (
    FileContent,
    FileScanTask,
    RewriteFilesRequest,
)


# ------------------------------------------------------------ wire level


def test_varint_roundtrip_edges():
    for n in (0, 1, 127, 128, 300, 2**31 - 1, 2**63 - 1):
        buf = proto._enc_varint(n)
        got, i = proto._dec_varint(buf, 0)
        assert got == n and i == len(buf)
    # negative int64 → 10-byte two's complement, decoded back signed
    buf = proto._enc_varint(-3)
    assert len(buf) == 10
    got, _ = proto._dec_varint(buf, 0)
    assert proto._signed(got) == -3


def test_packed_and_unpacked_repeated_decode():
    msg = proto.encode(
        "FileScanTaskDescriptor", {"data_file_path": "/x", "equality_ids": [1, 2, 300]}
    )
    d = proto.decode("FileScanTaskDescriptor", msg)
    assert d["equality_ids"] == [1, 2, 300]
    # hand-build UNPACKED encoding of field 9 (proto2-style writers)
    unpacked = (
        proto._tag(9, 0) + proto._enc_varint(1) + proto._tag(9, 0) + proto._enc_varint(2)
    )
    assert proto.decode("FileScanTaskDescriptor", unpacked)["equality_ids"] == [1, 2]


def test_unknown_fields_skipped():
    body = proto.encode("EchoRequest", {"message": "hi"})
    extra = proto._tag(99, 0) + proto._enc_varint(7)  # unknown varint field
    assert proto.decode("EchoRequest", extra + body)["message"] == "hi"


# ------------------------------------------------------- schema bridge


def test_nested_schema_roundtrip():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("price", T.DecimalType(18, 2), True),
            T.StructField("tags", T.ArrayType(T.StringType(), True), True),
            T.StructField(
                "props", T.MapType(T.StringType(), T.DoubleType(), True), True
            ),
            T.StructField(
                "addr",
                T.StructType(
                    [
                        T.StructField("street", T.StringType(), True),
                        T.StructField("zip", T.IntegerType(), False),
                    ]
                ),
                True,
            ),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("ts_ntz", T.TimestampNTZType(), True),
            T.StructField("raw", T.BinaryType(), True),
        ]
    )
    wire = proto.encode("SchemaDescriptor", proto.schema_to_proto(schema))
    back = proto.schema_from_proto(proto.decode("SchemaDescriptor", wire))
    assert back == schema


def test_schema_field_ids_are_sequential_depth_first():
    schema = T.StructType(
        [
            T.StructField("a", T.ArrayType(T.IntegerType()), True),
            T.StructField("b", T.LongType(), True),
        ]
    )
    d = proto.schema_to_proto(schema)
    assert d["fields"][0]["id"] == 1  # a
    assert d["fields"][0]["list"]["id"] == 2  # a.element
    assert d["fields"][1]["id"] == 3  # b


# ------------------------------------------------------ request bridge


def _schema():
    return T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("dec", T.DoubleType(), True),
        ]
    )


def test_request_proto_roundtrip():
    req = RewriteFilesRequest(
        schema=_schema(),
        data_files=[
            FileScanTask("/d/a.parquet", sequence_number=1, file_size_in_bytes=100),
            FileScanTask("/d/b.parquet", sequence_number=2),
        ],
        position_delete_files=[
            FileScanTask("/d/p.parquet", content=FileContent.POSITION_DELETES)
        ],
        equality_delete_files=[
            FileScanTask(
                "/d/e.parquet",
                sequence_number=3,
                content=FileContent.EQUALITY_DELETES,
                equality_ids=("id", "name"),
            )
        ],
        dir_path="/out",
        partition_by=["name"],
        target_partitions=7,
        max_records_per_file=1000,
    )
    back = proto.request_from_proto(proto.request_to_proto(req))
    assert back.schema == req.schema
    assert back.dir_path == "/out"
    assert back.partition_by == ["name"]
    assert back.target_partitions == 7
    assert back.max_records_per_file == 1000
    assert [t.data_file_path for t in back.data_files] == ["/d/a.parquet", "/d/b.parquet"]
    assert back.data_files[0].sequence_number == 1
    assert back.data_files[0].file_size_in_bytes == 100
    assert back.position_delete_files[0].content is FileContent.POSITION_DELETES
    eq = back.equality_delete_files[0]
    assert eq.equality_ids == ("id", "name")  # ids → names via schema
    assert eq.sequence_number == 3


def test_response_proto_roundtrip():
    from ic_spark.compaction.request import (
        DataFileMeta,
        RewriteFilesResponse,
        RewriteFilesStat,
    )

    resp = RewriteFilesResponse(
        data_files=[
            DataFileMeta(
                file_path="/out/f1.parquet",
                file_format="parquet",
                record_count=27,
                file_size_in_bytes=1234,
                column_stats={
                    "id": {"null_count": 0, "min": 2, "max": 29},
                    "name": {"null_count": 1, "min": "a", "max": "z"},
                },
            )
        ],
        stat=RewriteFilesStat(5, 1, 999, 0),
    )
    wire = proto.response_to_proto(resp, _schema())
    back = proto.response_from_proto(wire, _schema())
    f = back.data_files[0]
    assert f.file_path == "/out/f1.parquet" and f.record_count == 27
    assert f.column_stats["id"] == {"null_count": 0, "min": "2", "max": "29"}
    assert f.column_stats["name"]["max"] == "z"
    assert back.stat.rewritten_files_count == 5
    assert back.stat.rewritten_bytes == 999


# -------------------------------------------------------- transport e2e


@pytest.fixture()
def fixture_files(spark, tmp_path):
    src = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id int, val string")
    data_dir = str(tmp_path / "t_data")
    src.coalesce(1).write.parquet(data_dir)
    data_file = next(
        os.path.join(data_dir, f) for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    pd = spark.createDataFrame(
        [("file:" + data_file, 0)], "sys_hidden_file_path string, sys_hidden_pos long"
    )
    pd_dir = str(tmp_path / "t_pd")
    pd.coalesce(1).write.parquet(pd_dir)
    pd_file = next(
        os.path.join(pd_dir, f) for f in os.listdir(pd_dir) if f.endswith(".parquet")
    )
    return src, data_file, pd_file


def test_http_transport_json_and_proto(spark, tmp_path, fixture_files):
    from ic_spark.compaction.transport import CompactorServer, call

    src, data_file, pd_file = fixture_files
    server = CompactorServer(spark).start()
    try:
        # Echo over both codecs (liveness probe, rpc.rs Echo).
        assert call("127.0.0.1", server.port, "Echo", {"message": "ping"}, False) == {
            "message": "ping"
        }
        raw = call(
            "127.0.0.1",
            server.port,
            "Echo",
            proto.encode("EchoRequest", {"message": "pong"}),
            True,
        )
        assert proto.decode("EchoResponse", raw)["message"] == "pong"

        # RewriteFiles over JSON.
        out = call(
            "127.0.0.1",
            server.port,
            "RewriteFiles",
            {
                "schema": src.schema.jsonValue(),
                "dir_path": str(tmp_path / "json_out"),
                "data_files": [{"path": data_file, "sequence_number": 1}],
                "position_delete_files": [{"path": pd_file}],
                "target_partitions": 1,
            },
            False,
        )
        assert out["stat"]["rewritten_files_count"] == 2
        back = spark.read.parquet(str(tmp_path / "json_out"))
        assert sorted(r.id for r in back.collect()) == list(range(1, 10))

        # RewriteFiles over the protobuf wire format.
        req = RewriteFilesRequest(
            schema=src.schema,
            data_files=[FileScanTask(data_file, sequence_number=1)],
            position_delete_files=[
                FileScanTask(pd_file, content=FileContent.POSITION_DELETES)
            ],
            dir_path=str(tmp_path / "proto_out"),
            target_partitions=1,
        )
        raw = call(
            "127.0.0.1",
            server.port,
            "RewriteFiles",
            proto.request_to_proto(req),
            True,
        )
        resp = proto.response_from_proto(raw, src.schema)
        assert resp.stat.rewritten_files_count == 2
        assert sum(f.record_count for f in resp.data_files) == 9
        back = spark.read.parquet(str(tmp_path / "proto_out"))
        assert sorted(r.id for r in back.collect()) == list(range(1, 10))
    finally:
        server.stop()


def test_transport_unknown_rpc_is_404(spark):
    from urllib.error import HTTPError
    from urllib.request import Request, urlopen

    from ic_spark.compaction.transport import CompactorServer

    server = CompactorServer(spark).start()
    try:
        req = Request(
            f"http://127.0.0.1:{server.port}/compactor.CompactorService/Nope",
            data=b"{}",
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with pytest.raises(HTTPError) as e:
            urlopen(req)
        assert e.value.code == 404
    finally:
        server.stop()


def test_file_io_builder_roundtrip_and_hadoop_conf(spark):
    from ic_spark.sources.fileio import apply_file_io

    req = RewriteFilesRequest(
        schema=_schema(),
        dir_path="s3a://bucket/out",
        file_io={
            "scheme": "s3a",
            "props": {
                "s3.endpoint": "http://minio:9000",
                "s3.access-key-id": "AK",
                "s3.secret-access-key": "SK",
                "s3.path-style-access": "true",
                "custom-flag": "7",
            },
        },
    )
    back = proto.request_from_proto(proto.request_to_proto(req))
    assert back.file_io == req.file_io
    assert back.dir_path == "s3a://bucket/out"

    applied = apply_file_io(spark, back.file_io["scheme"], back.file_io["props"])
    assert applied["fs.s3a.endpoint"] == "http://minio:9000"
    assert applied["fs.s3a.access.key"] == "AK"
    assert applied["fs.s3a.path.style.access"] == "true"
    assert applied["fs.s3a.custom-flag"] == "7"  # unknown → pass-through
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://minio:9000"
    assert hconf.get("fs.s3a.secret.key") == "SK"


def test_partition_spec_proto_roundtrip():
    spec = [
        {"name": "id_bucket", "source": "id", "transform": "bucket", "n": 16},
        {"name": "name_pre", "source": "name", "transform": "truncate", "width": 2},
        {"name": "id_ident", "source": "id", "transform": "identity"},
        {"name": "nil", "source": "dec", "transform": "void"},
    ]
    req = RewriteFilesRequest(schema=_schema(), dir_path="/o", partition_spec=spec)
    back = proto.request_from_proto(proto.request_to_proto(req))
    assert back.partition_spec == spec


def test_partition_spec_transform_write(spark, tmp_path, fixture_files):
    """Transform-aware fanout: partition dirs carry the DERIVED value,
    data files keep the source column."""
    import os as _os

    from ic_spark.compaction.writer import rewrite_files

    src, data_file, _ = fixture_files
    req = RewriteFilesRequest(
        schema=src.schema,
        data_files=[FileScanTask(data_file, sequence_number=1)],
        dir_path=str(tmp_path / "pspec_out"),
        partition_spec=[
            {"name": "id_bucket", "source": "id", "transform": "bucket", "n": 2}
        ],
    )
    resp = rewrite_files(spark, req)
    dirs = [p for p in _os.listdir(tmp_path / "pspec_out") if p.startswith("id_bucket=")]
    assert sorted(dirs) == ["id_bucket=0", "id_bucket=1"]
    back = spark.read.parquet(str(tmp_path / "pspec_out"))
    assert sorted(r.id for r in back.collect()) == list(range(10))
    assert "val" in back.columns  # source columns intact in the data
    assert sum(f.record_count for f in resp.data_files) == 10
    # partition value recorded per output file
    assert all(f.partition_values.get("id_bucket") in ("0", "1") for f in resp.data_files)


def test_sort_order_write_and_roundtrip(spark, tmp_path, fixture_files):
    """Sorted writes: rows locally ordered within each file so footer
    min/max on the sort columns are disjoint; sort_order_id travels on
    the request (config map) and comes back on each DataFile."""
    from ic_spark.compaction.writer import rewrite_files

    src, data_file, _ = fixture_files
    req = RewriteFilesRequest(
        schema=src.schema,
        data_files=[FileScanTask(data_file, sequence_number=1)],
        dir_path=str(tmp_path / "sorted_out"),
        target_partitions=2,
        sort_order=[{"column": "id", "desc": True, "nulls_first": False}],
        sort_order_id=7,
    )
    back = proto.request_from_proto(proto.request_to_proto(req))
    assert back.sort_order == req.sort_order
    assert back.sort_order_id == 7

    resp = rewrite_files(spark, req)
    assert all(f.sort_order_id == 7 for f in resp.data_files)
    wire = proto.response_from_proto(proto.response_to_proto(resp, src.schema), src.schema)
    assert all(f.sort_order_id == 7 for f in wire.data_files)

    # Each written file is internally descending by id.
    import pyarrow.parquet as pq

    for f in resp.data_files:
        ids = pq.read_table(f.file_path, columns=["id"])["id"].to_pylist()
        assert ids == sorted(ids, reverse=True)
    # All rows present.
    out = spark.read.parquet(str(tmp_path / "sorted_out"))
    assert sorted(r.id for r in out.collect()) == list(range(10))


def test_transport_serves_concurrent_requests(spark):
    """ThreadingHTTPServer handles parallel RPCs — a hung client must
    not block others (the reference server is async tonic)."""
    import concurrent.futures

    from ic_spark.compaction.transport import CompactorServer, call

    server = CompactorServer(spark).start()
    try:
        with concurrent.futures.ThreadPoolExecutor(8) as pool:
            futs = [
                pool.submit(
                    call, "127.0.0.1", server.port, "Echo", {"message": f"m{i}"}, False
                )
                for i in range(16)
            ]
            got = sorted(f.result(timeout=30)["message"] for f in futs)
        assert got == sorted(f"m{i}" for i in range(16))
    finally:
        server.stop()


def test_proto_wire_r9_roundtrips_and_gates(spark):
    """r9 review finds on the proto wire: comma-bearing partition_by
    survives (JSON-encoded like bloom_filter_cols), zorder_by rides the
    config map, response files keep their real format + partition
    values, and puffin (DV) tasks fail with a routable message instead
    of KeyError."""
    from ic_spark.compaction.request import (
        DataFileMeta,
        FileContent,
        FileScanTask,
        RewriteFilesResponse,
        RewriteFilesStat,
    )

    schema = _schema()
    req = RewriteFilesRequest(
        schema=schema,
        dir_path="/o",
        partition_by=["a,b"],
        zorder_by=["id", "name"],
        data_files=[FileScanTask("/d.parquet", sequence_number=1)],
    )
    back = proto.request_from_proto(proto.request_to_proto(req))
    assert back.partition_by == ["a,b"]
    assert back.zorder_by == ["id", "name"]

    # legacy comma-join payloads still decode (back-compat)
    raw = proto.request_to_proto(
        RewriteFilesRequest(schema=schema, dir_path="/o")
    )
    import ic_spark.compaction.proto as proto_mod

    assert proto_mod._parse_partition_by("a,b") == ["a", "b"]
    assert proto_mod._parse_partition_by('["a,b"]') == ["a,b"]
    assert proto_mod._parse_partition_by(None) == []

    # response: format + partition values survive
    resp = RewriteFilesResponse(
        data_files=[
            DataFileMeta(
                file_path="/x.orc",
                file_format="orc",
                record_count=1,
                file_size_in_bytes=2,
                partition_values={"region": "r1"},
            )
        ],
        stat=RewriteFilesStat(1, 1, 2, 0),
    )
    rb = proto.response_from_proto(proto.response_to_proto(resp, schema), schema)
    assert rb.data_files[0].file_format == "orc"
    assert rb.data_files[0].partition_values == {"region": "r1"}

    # puffin tasks: clear gate, not KeyError
    dv = FileScanTask(
        "/x.puffin",
        sequence_number=2,
        content=FileContent.POSITION_DELETES,
        file_format="puffin",
    )
    with pytest.raises(ValueError, match="proto wire"):
        proto.request_to_proto(
            RewriteFilesRequest(
                schema=schema, dir_path="/o", position_delete_files=[dv]
            )
        )
    assert raw  # silence unused warnings
