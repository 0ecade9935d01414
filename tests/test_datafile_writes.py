"""Avro/ORC DATA-FILE writes (reference DataFileFormat parity).

The reference's ``DataFileFormat`` enum carries avro/orc/parquet
(``/root/reference/core/src/parser/proto.rs:282-289``) though its
writer emits parquet only; here ``rewrite_files`` writes all three —
avro through the repo's own container codec, orc through pyarrow —
with WRITE-TIME per-file column stats (no extra jobs) and
``max_records_per_file`` splitting.  The written files must round-trip
through the repo's OWN distributed scans, including the positional
path merge-on-read deletes need.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from ic_spark.compaction.request import FileScanTask, RewriteFilesRequest
from ic_spark.compaction.writer import rewrite_files

SCHEMA = "id int, name string, v double"


def _source_tasks(spark, base, n=100):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(n)], SCHEMA
    )
    src = str(base / "src")
    df.coalesce(2).write.parquet(src)
    files = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    return df, [FileScanTask(data_file_path=p, sequence_number=1) for p in files]


@pytest.mark.parametrize("fmt", ["avro", "orc"])
def test_rewrite_roundtrip_with_stats_and_splitting(spark, tmp_path, fmt):
    df, tasks = _source_tasks(spark, tmp_path)
    resp = rewrite_files(
        spark,
        RewriteFilesRequest(
            schema=df.schema,
            data_files=tasks,
            dir_path=str(tmp_path / fmt),
            target_partitions=3,
            max_records_per_file=30,
            data_file_format=fmt,
        ),
    )
    assert {f.file_format for f in resp.data_files} == {fmt}
    assert sum(f.record_count for f in resp.data_files) == 100
    # 3 partitions split at 30 rows -> more files than partitions
    assert len(resp.data_files) > 3
    # write-time stats: record_count and per-file min/max are exact
    for f in resp.data_files:
        assert f.file_size_in_bytes == os.path.getsize(f.file_path)
        st = f.column_stats["id"]
        assert st["null_count"] == 0
        assert 0 <= st["min"] <= st["max"] <= 99
    # whole-output min/max covers the domain
    assert min(f.column_stats["id"]["min"] for f in resp.data_files) == 0
    assert max(f.column_stats["id"]["max"] for f in resp.data_files) == 99

    if fmt == "avro":
        from ic_spark.sources.avro_scan import read_avro_distributed

        back = read_avro_distributed(
            spark, [f.file_path for f in resp.data_files]
        )
    else:
        back = spark.read.format("orc").load(
            [f.file_path for f in resp.data_files]
        )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


@pytest.mark.slow
@pytest.mark.parametrize("fmt", ["avro", "orc"])
def test_written_files_serve_mor_position_deletes(spark, tmp_path, fmt):
    """The written files enter a table as first-class data files: the
    positional scan's running record index matches write order, so a
    position delete against (path, pos) hides exactly that row."""
    from ic_spark.compaction.planner import build_merge_on_read

    df, tasks = _source_tasks(spark, tmp_path, n=40)
    resp = rewrite_files(
        spark,
        RewriteFilesRequest(
            schema=df.schema,
            data_files=tasks,
            dir_path=str(tmp_path / fmt),
            target_partitions=1,
            data_file_format=fmt,
        ),
    )
    assert len(resp.data_files) == 1
    from tests.test_mor import spark_uri

    data_path = resp.data_files[0].file_path
    # delete positions 0 and 5 of the single written file (the scan
    # emits file:-schemed paths — same contract as the parquet scans)
    pd_path = str(tmp_path / "pd")
    spark.createDataFrame(
        [(spark_uri(data_path), 0), (spark_uri(data_path), 5)],
        "file_path string, pos long",
    ).coalesce(1).write.parquet(pd_path)
    pd_file = next(
        os.path.join(pd_path, n)
        for n in os.listdir(pd_path)
        if n.endswith(".parquet")
    )
    out = build_merge_on_read(
        spark,
        RewriteFilesRequest(
            schema=df.schema,
            data_files=[
                FileScanTask(
                    data_file_path=data_path,
                    sequence_number=2,
                    file_format=fmt,
                )
            ],
            position_delete_files=[
                FileScanTask(
                    data_file_path=pd_file,
                    sequence_number=3,
                    content=__import__(
                        "ic_spark.compaction.request", fromlist=["FileContent"]
                    ).FileContent.POSITION_DELETES,
                )
            ],
        ),
    )
    got = {r.id for r in out.collect()}
    # positions are write order; the writer df was a single round-robin
    # partition, so read the file back to learn which ids sat at 0 / 5
    if fmt == "avro":
        from ic_spark.sources.avro_scan import read_avro_distributed

        ordered = [r.id for r in read_avro_distributed(spark, data_path).collect()]
    else:
        ordered = [
            r.id
            for r in spark.read.format("orc").load(data_path).collect()
        ]
    assert got == set(ordered) - {ordered[0], ordered[5]}
    assert len(got) == 38


@pytest.mark.parametrize("fmt", ["avro", "orc"])
def test_full_compact_into_format(spark, tmp_path, fmt):
    """Compacting a parquet table INTO avro/orc (the Iceberg
    format-migration shape): deletes apply during the rewrite, the
    committed entries carry the new file_format, and the next
    read_table routes through the format's own distributed scan."""
    from ic_spark.compaction import Compaction, ManifestTable
    from ic_spark.compaction.deletes import read_table, write_equality_deletes

    df, tasks = _source_tasks(spark, tmp_path, n=50)
    t = ManifestTable(str(tmp_path / "tbl"))
    t.append_snapshot(
        [
            {
                "path": task.data_file_path,
                "sequence_number": 1,
                "content": "DATA",
            }
            for task in tasks
        ]
    )
    write_equality_deletes(
        spark, t, spark.createDataFrame([(7,), (33,)], "id int"), ["id"]
    )
    Compaction(spark).full_compact(
        t, df.schema, data_file_format=fmt, target_partitions=2
    )
    data, pos, eq = t.scan_tasks()
    assert not pos and not eq
    assert {d.file_format for d in data} == {fmt}
    got = sorted(r.id for r in read_table(spark, t).collect())
    assert got == sorted(set(range(50)) - {7, 33})
    # write-time stats landed in the manifest -> predicate file-skip
    # still works over the non-parquet files
    lo = read_table(spark, t, where=[("id", ">=", 45)])
    assert sorted(r.id for r in lo.collect()) == [45, 46, 47, 48, 49]


@pytest.mark.slow
def test_avro_write_gates(spark, tmp_path):
    # nested (incl. logical-type leaves) is supported since r9; the
    # remaining schema gate is non-string map keys (an Avro spec limit)
    from ic_spark.compaction.writer import _spark_to_avro_schema

    assert _spark_to_avro_schema(
        spark.createDataFrame([], "a array<date>").schema
    )["fields"][0]["type"][1]["items"][1] == {
        "type": "int", "logicalType": "date"
    }
    with pytest.raises(ValueError, match="string keys"):
        _spark_to_avro_schema(
            spark.createDataFrame([], "m map<int,string>").schema
        )
    simple = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    src2 = str(tmp_path / "s2")
    simple.coalesce(1).write.parquet(src2)
    f2 = next(
        os.path.join(src2, n)
        for n in os.listdir(src2)
        if n.endswith(".parquet")
    )
    tasks2 = [FileScanTask(data_file_path=f2, sequence_number=1)]
    with pytest.raises(ValueError, match="parquet-specific"):
        rewrite_files(
            spark,
            RewriteFilesRequest(
                schema=simple.schema,
                data_files=tasks2,
                dir_path=str(tmp_path / "o3"),
                bloom_filter_cols=["id"],
                data_file_format="avro",
            ),
        )
    with pytest.raises(ValueError, match="unsupported data_file_format"):
        rewrite_files(
            spark,
            RewriteFilesRequest(
                schema=simple.schema,
                data_files=tasks2,
                dir_path=str(tmp_path / "o4"),
                data_file_format="csv",
            ),
        )


@pytest.mark.slow
def test_no_empty_files_and_null_stats(spark, tmp_path):
    """Empty partitions emit no files; null values count into
    null_count and don't poison min/max."""
    df = spark.createDataFrame(
        [(1, None, 1.0), (2, "b", None), (3, "c", 3.0)], SCHEMA
    )
    src = str(tmp_path / "s")
    df.coalesce(1).write.parquet(src)
    f = next(
        os.path.join(src, n) for n in os.listdir(src) if n.endswith(".parquet")
    )
    resp = rewrite_files(
        spark,
        RewriteFilesRequest(
            schema=df.schema,
            data_files=[FileScanTask(data_file_path=f, sequence_number=1)],
            dir_path=str(tmp_path / "o"),
            target_partitions=16,  # far more partitions than rows
            data_file_format="avro",
        ),
    )
    assert sum(x.record_count for x in resp.data_files) == 3
    assert all(x.record_count > 0 for x in resp.data_files)  # no empties
    stats = {}
    for x in resp.data_files:
        for c, st in x.column_stats.items():
            agg = stats.setdefault(c, {"null_count": 0, "mins": [], "maxs": []})
            agg["null_count"] += st["null_count"]
            if st["min"] is not None:
                agg["mins"].append(st["min"])
                agg["maxs"].append(st["max"])
    assert stats["name"]["null_count"] == 1
    assert stats["v"]["null_count"] == 1
    assert min(stats["id"]["mins"]) == 1 and max(stats["id"]["maxs"]) == 3
    from ic_spark.sources.avro_scan import read_avro_distributed

    back = sorted(
        map(tuple, read_avro_distributed(
            spark, [x.file_path for x in resp.data_files]
        ).collect())
    )
    assert back == sorted(map(tuple, df.collect()))


def test_avro_container_multiblock_stream_roundtrip(tmp_path):
    """write_container with an iterator of record chunks streams one
    container block per chunk (peak memory = one block); both readers
    already loop blocks, so the records come back whole and in order."""
    from ic_spark.sources.avro_io import read_container, write_container
    from ic_spark.sources.avro_scan import decode_container_bytes

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": ["null", "long"]},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    rows = [{"a": i, "s": f"v{i}"} for i in range(250)]
    rows[7]["a"] = None
    chunks = [rows[i : i + 64] for i in range(0, len(rows), 64)]
    p = str(tmp_path / "mb.avro")
    write_container(p, schema, iter(chunks), codec="deflate")
    _, _, back = read_container(p)
    assert back == rows
    # executor-side decoder (binaryFile scan path) agrees
    with open(p, "rb") as f:
        _, recs = decode_container_bytes(f.read(), p)
    assert recs == rows


@pytest.mark.slow
@pytest.mark.parametrize("fmt", ["avro", "orc"])
def test_unbounded_write_rolls_at_flush_bytes(spark, tmp_path, fmt, monkeypatch):
    """With max_records_per_file=0 the writer must not buffer a whole
    task partition: it rolls a new file per _FLUSH_BYTES of Arrow
    buffer. Shrink the cap -> multiple files per partition, identical
    data, per-file stats still exact."""
    import ic_spark.compaction.writer as W

    monkeypatch.setattr(W, "_FLUSH_BYTES", 4096)
    df, tasks = _source_tasks(spark, tmp_path, n=2000)
    # The roll point sits between incoming Arrow batches — shrink them
    # so one task partition spans several batches.
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "200")
    try:
        resp = rewrite_files(
            spark,
            RewriteFilesRequest(
                schema=df.schema,
                data_files=tasks,
                dir_path=str(tmp_path / ("roll_" + fmt)),
                target_partitions=2,
                max_records_per_file=0,
                data_file_format=fmt,
            ),
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
    assert len(resp.data_files) > 2, "cap never triggered a roll"
    assert sum(f.record_count for f in resp.data_files) == 2000
    for f in resp.data_files:
        st = f.column_stats["id"]
        assert st["null_count"] == 0 and st["min"] <= st["max"]
    if fmt == "avro":
        from ic_spark.sources.avro_scan import read_avro_distributed

        back = read_avro_distributed(
            spark, [f.file_path for f in resp.data_files]
        )
    else:
        back = spark.read.format("orc").load(
            [f.file_path for f in resp.data_files]
        )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


@pytest.mark.slow
@pytest.mark.parametrize("fmt", ["avro", "orc"])
def test_write_to_file_uri_and_scheme_gate(spark, tmp_path, fmt):
    """Overwrite cleanup runs through the Hadoop FS layer and the codec
    writers accept ``file:`` URIs (resolved to the filesystem path);
    a genuinely remote scheme is an explicit gate, not a silent local
    write to a directory literally named 's3a:...'."""
    df, tasks = _source_tasks(spark, tmp_path)
    out = tmp_path / ("uri_" + fmt)
    # pre-seed a stale file: the Hadoop-FS overwrite must remove it
    os.makedirs(out, exist_ok=True)
    stale = out / f"stale.{fmt}"
    stale.write_bytes(b"junk")
    resp = rewrite_files(
        spark,
        RewriteFilesRequest(
            schema=df.schema,
            data_files=tasks,
            dir_path=f"file://{out}",
            target_partitions=2,
            data_file_format=fmt,
        ),
    )
    assert not stale.exists(), "overwrite left stale files"
    assert sum(f.record_count for f in resp.data_files) == 100
    for f in resp.data_files:
        assert os.path.isfile(f.file_path)

    # s3:/gs: now route to pyarrow's connectors (untestable offline);
    # hdfs needs libhdfs and stays an explicit gate
    with pytest.raises(NotImplementedError, match="scheme 'hdfs'"):
        rewrite_files(
            spark,
            RewriteFilesRequest(
                schema=df.schema,
                data_files=tasks,
                dir_path="hdfs://nn/warehouse/t",
                target_partitions=1,
                data_file_format=fmt,
            ),
        )


def test_avro_nested_types_write_roundtrip(spark, tmp_path):
    """Nested avro data-file writes (closing VERDICT r8 'missing #4'):
    arrays/maps/structs — including nulls at every level, map values
    rendered by Arrow as tuple-lists, binary inside structs, and
    struct-in-array-in-struct — round-trip exactly through the repo's
    own distributed scan AND Spark's JVM reader when available."""
    from ic_spark.compaction.request import FileScanTask, RewriteFilesRequest
    from ic_spark.compaction.writer import rewrite_files
    from ic_spark.sources.avro_scan import read_avro_distributed

    rows = [
        (1, [1, None, 3], {"a": 1, "b": None}, (7, "x", bytearray(b"\x00\x01")),
         [(1, ["p"]), (2, None)]),
        (2, None, None, None, None),
        (3, [], {}, (None, None, None), []),
    ]
    schema = (
        "id int, arr array<int>, m map<string,int>, "
        "s struct<a:int,b:string,y:binary>, "
        "nest array<struct<k:int,tags:array<string>>>"
    )
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "src")
    df.repartition(1).write.parquet(src)
    f = next(
        os.path.join(src, n) for n in os.listdir(src) if n.endswith(".parquet")
    )
    resp = rewrite_files(
        spark,
        RewriteFilesRequest(
            schema=df.schema,
            data_files=[FileScanTask(data_file_path=f, sequence_number=1)],
            dir_path=str(tmp_path / "out"),
            target_partitions=1,
            data_file_format="avro",
        ),
    )
    m = resp.data_files[0]
    # nested stats: null_count only (no ordering), exact
    assert m.column_stats["arr"] == {"null_count": 1, "min": None, "max": None}
    assert m.column_stats["id"]["min"] == 1 and m.column_stats["id"]["max"] == 3
    back = read_avro_distributed(
        spark, m.file_path, schema=df.schema
    )
    want = sorted([tuple(r) for r in spark.read.parquet(src).collect()], key=repr)
    got = sorted([tuple(r) for r in back.collect()], key=repr)
    assert got == want


def test_local_write_path_single_slash_scheme_gate():
    """Hadoop Paths accept single-slash URIs ('hdfs:/warehouse/t') —
    the gate must catch those too, or the overwrite wipes the remote
    dir while executors write to a local dir literally named 'hdfs:'."""
    from ic_spark.sources.fileio import local_write_path

    assert local_write_path("/plain/dir") == "/plain/dir"
    assert local_write_path("rel/dir") == "rel/dir"
    assert local_write_path("file:/d/x") == "/d/x"
    assert local_write_path("file:///d/x") == "/d/x"
    for bad in ("hdfs:/warehouse/t", "s3a://b/p", "gs://b/p", "abfss://c@a/p"):
        with pytest.raises(NotImplementedError):
            local_write_path(bad)


@pytest.mark.slow
def test_partitioned_write_under_file_uri_with_equals_ancestor(spark, tmp_path):
    """Partition values derive from path segments BELOW the output dir;
    with a file: URI dir_path the relpath must run against the stripped
    local base, or '=' segments in ancestor directories leak in as
    phantom partition columns."""
    base = tmp_path / "date=2024" / "tbl"
    rows = [(i, ["a", "b"][i % 2]) for i in range(10)]
    df = spark.createDataFrame(rows, "id int, pv string")
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    f = next(
        os.path.join(src, n) for n in os.listdir(src) if n.endswith(".parquet")
    )
    resp = rewrite_files(
        spark,
        RewriteFilesRequest(
            schema=df.schema,
            data_files=[FileScanTask(data_file_path=f, sequence_number=1)],
            dir_path=f"file://{base}",
            partition_by=["pv"],
            data_file_format="avro",
            target_partitions=1,
        ),
    )
    for m in resp.data_files:
        assert set(m.partition_values) == {"pv"}, m.partition_values
        assert m.partition_values["pv"] in ("a", "b")


@pytest.mark.slow
@pytest.mark.parametrize("fmt", ["avro", "orc"])
def test_write_through_injected_pyarrow_filesystem(spark, tmp_path, fmt):
    """Remote-store write path, emulated: a picklable pyarrow
    FileSystem injected via file_io ships to the executors in the
    closure and EVERY byte flows through it — partitioned avro/orc
    files land inside the FS root (object-store semantics: streamed
    output, no tmp+rename), stats use fs.get_file_info, overwrite
    clears a pre-seeded stale file through the same connector, and
    the returned metadata paths are caller-relative."""
    import pyarrow.fs as pafs

    df, tasks = _source_tasks(spark, tmp_path, n=60)
    root = tmp_path / "fakestore"
    os.makedirs(root / "tbl", exist_ok=True)
    (root / "tbl" / f"stale.{fmt}").write_bytes(b"junk")
    fio = {
        "pyarrow_filesystem": pafs.SubTreeFileSystem(
            str(root), pafs.LocalFileSystem()
        )
    }
    resp = rewrite_files(
        spark,
        RewriteFilesRequest(
            schema=df.schema,
            data_files=tasks,
            dir_path="tbl",
            target_partitions=2,
            data_file_format=fmt,
            file_io=fio,
        ),
    )
    assert not (root / "tbl" / f"stale.{fmt}").exists()
    assert sum(m.record_count for m in resp.data_files) == 60
    for m in resp.data_files:
        real = root / m.file_path
        assert real.is_file(), m.file_path
        assert m.file_size_in_bytes == os.path.getsize(real)
        assert m.column_stats["id"]["min"] is not None
    # round-trip through the real (local) paths under the store root
    paths = [str(root / m.file_path) for m in resp.data_files]
    if fmt == "avro":
        from ic_spark.sources.avro_scan import read_avro_distributed

        back = read_avro_distributed(spark, paths)
    else:
        back = spark.read.format("orc").load(paths)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


@pytest.mark.slow
def test_write_through_injected_fs_partitioned(spark, tmp_path):
    """Hive fanout through the injected FS: partition dirs are created
    through the connector and partition values decode from the
    caller-relative metadata paths."""
    import pyarrow.fs as pafs

    rows = [(i, ["x", "y", None][i % 3]) for i in range(12)]
    df = spark.createDataFrame(rows, "id int, pv string")
    src = str(tmp_path / "psrc")
    df.coalesce(1).write.parquet(src)
    f = next(
        os.path.join(src, n) for n in os.listdir(src) if n.endswith(".parquet")
    )
    root = tmp_path / "fakestore2"
    os.makedirs(root, exist_ok=True)
    resp = rewrite_files(
        spark,
        RewriteFilesRequest(
            schema=df.schema,
            data_files=[FileScanTask(data_file_path=f, sequence_number=1)],
            dir_path="tbl",
            partition_by=["pv"],
            data_file_format="avro",
            target_partitions=1,
            file_io={
                "pyarrow_filesystem": pafs.SubTreeFileSystem(
                    str(root), pafs.LocalFileSystem()
                )
            },
        ),
    )
    got = {m.partition_values["pv"]: m.record_count for m in resp.data_files}
    assert got == {"x": 4, "y": 4, "__HIVE_DEFAULT_PARTITION__": 4}
    dirs = sorted(os.listdir(root / "tbl"))
    assert dirs == ["pv=__HIVE_DEFAULT_PARTITION__", "pv=x", "pv=y"]


def test_s3_fileio_props_map_to_pyarrow_connector():
    """The reference's FileIoBuilder property names construct pyarrow's
    S3 connector offline (region/endpoint/keys threaded; IO would only
    happen on the executors)."""
    from ic_spark.sources.fileio import arrow_filesystem

    fs, inner = arrow_filesystem(
        "s3://bkt/warehouse/t",
        {
            "scheme": "s3",
            "props": {
                "s3.region": "eu-west-1",
                "s3.endpoint": "http://localhost:9000",
                "s3.access-key-id": "k",
                "s3.secret-access-key": "s",
            },
        },
    )
    assert type(fs).__name__ == "S3FileSystem"
    assert fs.region == "eu-west-1"
    assert inner == "bkt/warehouse/t"


def test_s3_path_style_access_maps_to_addressing_flag(monkeypatch):
    """pyarrow already uses path-style whenever endpoint_override is
    set, so `s3.path-style-access=true` must add no flag; the property's
    meaningful direction is FALSE → force_virtual_addressing=True
    (r9 review find: the old mapping set the default for 'true' and
    ignored 'false', making the property a silent no-op)."""
    from pyarrow import fs as pafs

    from ic_spark.sources import fileio

    seen = {}

    def fake_s3(**kw):
        seen.clear()
        seen.update(kw)
        return pafs.LocalFileSystem()

    monkeypatch.setattr(pafs, "S3FileSystem", fake_s3)
    base = {"s3.endpoint": "http://localhost:9000"}
    fileio.arrow_filesystem(
        "s3://b/t",
        {"scheme": "s3", "props": {**base, "s3.path-style-access": "true"}},
    )
    assert "force_virtual_addressing" not in seen
    fileio.arrow_filesystem(
        "s3://b/t",
        {"scheme": "s3", "props": {**base, "s3.path-style-access": "false"}},
    )
    assert seen.get("force_virtual_addressing") is True
    fileio.arrow_filesystem("s3://b/t", {"scheme": "s3", "props": base})
    assert "force_virtual_addressing" not in seen


def test_avro_nested_logical_types_write_roundtrip(spark, tmp_path):
    """Logical types INSIDE nested values (array<date>,
    struct<ts,dec>, map<string,timestamp>, array<struct<d,ts>>)
    round-trip exactly through the avro data-file writer + the repo's
    distributed scan — closing the last nested-writer gate (formerly a
    per-column-conversion ValueError).  Leaves convert to spec wire
    forms in the encoder's existing to_pylist pass; the read side's
    recursive _converter restores them."""
    import datetime as dt
    from decimal import Decimal

    from ic_spark.compaction.request import FileScanTask, RewriteFilesRequest
    from ic_spark.compaction.writer import rewrite_files
    from ic_spark.sources.avro_scan import read_avro_distributed

    rows = [
        (
            1,
            [dt.date(2024, 6, 1), None, dt.date(1969, 12, 31)],
            (dt.datetime(2024, 6, 1, 12, 0, 0, 123456), Decimal("12345.67")),
            {"a": dt.datetime(2024, 1, 15, 23, 59, 59, 999999), "b": None},
            [(dt.date(2024, 2, 29), dt.datetime(2024, 2, 29, 1, 2, 3))],
        ),
        (2, None, None, None, None),
        (3, [], (None, None), {}, []),
        (
            4,
            [dt.date(1970, 1, 1)],
            (dt.datetime(1969, 7, 20, 20, 17, 40), Decimal("-0.01")),
            {"x": dt.datetime(1970, 1, 1)},
            [(None, None), (dt.date(2000, 1, 1), None)],
        ),
    ]
    schema = (
        "id int, dates array<date>, "
        "s struct<ts:timestamp,dec:decimal(10,2)>, "
        "m map<string,timestamp>, "
        "nest array<struct<d:date,ts:timestamp>>"
    )
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "src")
    df.repartition(1).write.parquet(src)
    f = next(
        os.path.join(src, n) for n in os.listdir(src) if n.endswith(".parquet")
    )
    resp = rewrite_files(
        spark,
        RewriteFilesRequest(
            schema=df.schema,
            data_files=[FileScanTask(data_file_path=f, sequence_number=1)],
            dir_path=str(tmp_path / "out"),
            target_partitions=1,
            data_file_format="avro",
        ),
    )
    m = resp.data_files[0]
    back = read_avro_distributed(spark, m.file_path, schema=df.schema)
    want = sorted([tuple(r) for r in spark.read.parquet(src).collect()], key=repr)
    got = sorted([tuple(r) for r in back.collect()], key=repr)
    assert got == want


def test_nested_value_fixer_logical_leaves_unit():
    """Leaf wire conversions for logical types inside nested values:
    dates → epoch days, naive/aware datetimes → naive/UTC-epoch
    micros, decimals → minimal signed big-endian unscaled bytes (incl.
    p>28 values the default Decimal context would round)."""
    import datetime as dt
    from decimal import Decimal

    from pyspark.sql import types as T

    from ic_spark.compaction.writer import _nested_value_fixer

    fx = _nested_value_fixer(T.ArrayType(T.DateType()))
    assert fx([dt.date(1970, 1, 2), None, dt.date(1969, 12, 31)]) == [1, None, -1]

    fx = _nested_value_fixer(T.ArrayType(T.TimestampNTZType()))
    assert fx([dt.datetime(1970, 1, 1, 0, 0, 1)]) == [1_000_000]

    ist = dt.timezone(dt.timedelta(hours=5, minutes=30))
    fx = _nested_value_fixer(T.ArrayType(T.TimestampType()))
    # aware values measure the INSTANT from the UTC epoch
    assert fx([dt.datetime(1970, 1, 1, 5, 30, 1, tzinfo=ist)]) == [1_000_000]

    fx = _nested_value_fixer(
        T.StructType([T.StructField("d", T.DecimalType(38, 0))])
    )
    big = Decimal(10) ** 30  # > 28-digit default context precision
    out = fx({"d": big})
    assert int.from_bytes(out["d"], "big", signed=True) == 10**30
    neg = fx({"d": Decimal(-1)})
    assert int.from_bytes(neg["d"], "big", signed=True) == -1

    # Top-level logical columns are converted Arrow-side: no fixer.
    assert _nested_value_fixer(T.DateType()) is None
    assert _nested_value_fixer(T.TimestampType()) is None
