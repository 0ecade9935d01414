"""Distributed Avro data-file scans (sources/avro_scan.py).

The reference scans Avro file tasks (DataFileFormat enum 0=Avro,
reference core/src/parser/proto.rs:282-289); spark-avro is absent in
this container, so reads go through the binaryFile + mapInPandas
pure-Python codec path — these tests prove that path end-to-end,
including merge-on-read hidden columns over Avro data files.
"""

from __future__ import annotations

import datetime
import decimal
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ic_spark.compaction.planner import build_merge_on_read
from ic_spark.compaction.request import FileContent, FileScanTask, RewriteFilesRequest
from ic_spark.sources.avro_io import write_container
from ic_spark.sources.avro_scan import (
    avro_to_spark_schema,
    read_avro_distributed,
    read_header,
)
from ic_spark.sources.formats import read_files, write_files

SIMPLE_SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
    ],
}


def _write_simple(tmp_path, n_files=2, rows_per_file=3):
    paths = []
    k = 0
    for i in range(n_files):
        recs = []
        for _ in range(rows_per_file):
            recs.append(
                {
                    "id": k,
                    "name": None if k % 3 == 2 else f"n{k}",
                    "score": k * 0.5,
                }
            )
            k += 1
        p = str(tmp_path / f"part-{i}.avro")
        write_container(p, SIMPLE_SCHEMA, recs, codec="deflate" if i % 2 else "null")
        paths.append(p)
    return paths


def test_avro_read_files_fallback(spark, tmp_path):
    """read_files("avro") works without spark-avro via the distributed
    codec fallback; schema comes from the writer schema."""
    paths = _write_simple(tmp_path)
    df = read_files(spark, paths, "avro")
    assert [f.name for f in df.schema.fields] == ["id", "name", "score"]
    assert isinstance(df.schema["id"].dataType, LongType)
    rows = sorted(df.collect(), key=lambda r: r.id)
    assert len(rows) == 6
    assert rows[2].name is None and rows[1].name == "n1"
    assert rows[5].score == 2.5


def test_avro_logical_and_nested_types(spark, tmp_path):
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
            {
                "name": "amt",
                "type": {
                    "type": "bytes",
                    "logicalType": "decimal",
                    "precision": 10,
                    "scale": 2,
                },
            },
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {
                "name": "pt",
                "type": {
                    "type": "record",
                    "name": "pt_t",
                    "fields": [
                        {"name": "x", "type": "int"},
                        {"name": "y", "type": "int"},
                    ],
                },
            },
        ],
    }
    unscaled = 123456  # 1234.56
    recs = [
        {
            "d": 19723,  # 2024-01-01
            "ts": 1_704_110_400_000_000,  # 2024-01-01T12:00:00Z
            "amt": unscaled.to_bytes(4, "big", signed=True),
            "tags": ["a", "b"],
            "props": {"k": 7},
            "pt": {"x": 1, "y": 2},
        }
    ]
    p = str(tmp_path / "typed.avro")
    write_container(p, schema, recs)
    df = read_avro_distributed(spark, p)
    row = df.collect()[0]
    assert row.d == datetime.date(2024, 1, 1)
    assert row.ts == datetime.datetime(2024, 1, 1, 12, 0, 0)
    assert row.amt == decimal.Decimal("1234.56")
    assert row.tags == ["a", "b"] and row.props == {"k": 7}
    assert row.pt.x == 1 and row.pt.y == 2


def test_avro_schema_discovery_and_null_fill(spark, tmp_path):
    """An enforced wider Spark schema null-fills columns absent from the
    file — same added-column semantics as the Parquet evolution path."""
    paths = _write_simple(tmp_path, n_files=1)
    assert avro_to_spark_schema(read_header(paths[0])).fieldNames() == [
        "id",
        "name",
        "score",
    ]
    wider = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("added", IntegerType()),
        ]
    )
    df = read_avro_distributed(spark, paths, schema=wider)
    rows = df.collect()
    assert all(r.added is None for r in rows)
    assert sorted(r.id for r in rows) == [0, 1, 2]


def test_avro_path_pos_hidden_columns(spark, tmp_path):
    """Positions are the running record index per file in decode order —
    the reference's index_start accumulation."""
    paths = _write_simple(tmp_path, n_files=2, rows_per_file=4)
    df = read_avro_distributed(spark, paths, with_path_pos=True)
    per_file = {}
    for r in df.collect():
        per_file.setdefault(r._avro_file_path, []).append((r._avro_pos, r.id))
    assert len(per_file) == 2
    for pairs in per_file.values():
        poss = [p for p, _ in sorted(pairs)]
        ids = [i for _, i in sorted(pairs)]
        assert poss == [0, 1, 2, 3]
        assert ids == sorted(ids)  # pos follows decode (write) order


@pytest.mark.slow
def test_mor_over_avro_data_files(spark, tmp_path):
    """Merge-on-read with BOTH delete flavors over Avro data files:
    position deletes hit exact (file, pos) pairs; equality deletes obey
    the strict sequence guard."""
    paths = _write_simple(tmp_path, n_files=2, rows_per_file=4)  # ids 0..7
    user_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    # Position-delete file (parquet, fixed 2-col schema): kill pos 1 of file 0.
    pos_del = spark.createDataFrame(
        [(f"file:{paths[0]}", 1)], "file_path string, pos long"
    )
    pdpath = str(tmp_path / "pos_del")
    pos_del.coalesce(1).write.parquet(pdpath)
    # Equality-delete file at seq 5 on id: kills id=6 (data seq 1 < 5)
    eq_del = spark.createDataFrame([(6,), (99,)], "id long")
    edpath = str(tmp_path / "eq_del")
    eq_del.coalesce(1).write.parquet(edpath)

    request = RewriteFilesRequest(
        schema=user_schema,
        data_files=[
            FileScanTask(p, sequence_number=1, file_format="avro") for p in paths
        ],
        position_delete_files=[FileScanTask(pdpath, content=FileContent.POSITION_DELETES)],
        equality_delete_files=[
            FileScanTask(
                edpath,
                sequence_number=5,
                content=FileContent.EQUALITY_DELETES,
                equality_ids=("id",),
            )
        ],
        dir_path=str(tmp_path / "out"),
    )
    out = build_merge_on_read(spark, request)
    assert out.columns == ["id", "name", "score"]
    ids = sorted(r.id for r in out.collect())
    assert ids == [0, 2, 3, 4, 5, 7]  # pos-delete killed 1, eq-delete killed 6


@pytest.mark.slow
def test_mor_mixed_parquet_and_avro_groups(spark, tmp_path):
    """One request mixing Parquet and Avro data files — per-(seq, format)
    scan groups union into one plan."""
    avro_paths = _write_simple(tmp_path, n_files=1, rows_per_file=3)  # ids 0..2
    pq = spark.createDataFrame(
        [(10, "p10", 1.0), (11, "p11", 2.0)], "id long, name string, score double"
    )
    pqdir = tmp_path / "data_pq"
    pq.coalesce(1).write.parquet(str(pqdir))
    pqpath = str(next(pqdir.glob("part-*.parquet")))  # a task names a FILE
    user_schema = pq.schema
    request = RewriteFilesRequest(
        schema=user_schema,
        data_files=[
            FileScanTask(avro_paths[0], sequence_number=1, file_format="avro"),
            FileScanTask(pqpath, sequence_number=2, file_format="parquet"),
        ],
        dir_path=str(tmp_path / "out"),
    )
    out = build_merge_on_read(spark, request)
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 10, 11]


@pytest.mark.slow
def test_mor_orc_equality_and_position_deletes(spark, tmp_path):
    orc = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    )
    opath = str(tmp_path / "data_orc")
    orc.coalesce(1).write.orc(opath)
    eq_del = spark.createDataFrame([(2,)], "id long")
    edpath = str(tmp_path / "eq_del")
    eq_del.coalesce(1).write.parquet(edpath)
    schema = orc.schema
    request = RewriteFilesRequest(
        schema=schema,
        data_files=[FileScanTask(opath, sequence_number=1, file_format="orc")],
        equality_delete_files=[
            FileScanTask(
                edpath,
                sequence_number=5,
                content=FileContent.EQUALITY_DELETES,
                equality_ids=("id",),
            )
        ],
        dir_path=str(tmp_path / "out"),
    )
    out = build_merge_on_read(spark, request)
    assert sorted(r.id for r in out.collect()) == [1, 3]

    # Position deletes over ORC now work (r4): the positional scan
    # routes through the distributed pyarrow.orc codec, whose per-file
    # running index matches native row order.  Delete the 2nd row by
    # position — the scan's file path is the binaryFile URI form.
    part = next(
        os.path.join(opath, n) for n in os.listdir(opath) if n.endswith(".orc")
    )
    second_id = spark.read.orc(part).collect()[1].id
    pos_del = spark.createDataFrame(
        [(f"file:{part}", 1)], "fp string, pos long"
    )
    pdpath = str(tmp_path / "pos_del")
    pos_del.coalesce(1).write.parquet(pdpath)
    req2 = RewriteFilesRequest(
        schema=schema,
        data_files=[FileScanTask(opath, sequence_number=1, file_format="orc")],
        position_delete_files=[
            FileScanTask(pdpath, content=FileContent.POSITION_DELETES)
        ],
        dir_path=str(tmp_path / "out2"),
    )
    got = sorted(r.id for r in build_merge_on_read(spark, req2).collect())
    assert got == sorted({1, 2, 3} - {second_id})


@pytest.mark.slow
def test_mixed_format_table_deletes_and_merge(spark, tmp_path):
    """Predicate deletes and MERGE over a table holding BOTH avro and
    parquet data files: the probe/delete scans are format-aware, so
    rows in avro files are found, deleted and updated too."""
    from ic_spark.compaction import ManifestTable
    from ic_spark.compaction.deletes import read_table, write_position_deletes
    from ic_spark.compaction.rowops import merge_into

    table = ManifestTable(str(tmp_path / "mixed"))
    # avro file: ids 0..5 (names n0..n5, scores), parquet file: ids 100..104
    apath = str(tmp_path / "a.avro")
    write_container(
        apath,
        SIMPLE_SCHEMA,
        [{"id": i, "name": f"n{i}", "score": float(i)} for i in range(6)],
    )
    pq = spark.createDataFrame(
        [(100 + i, f"p{i}", float(i)) for i in range(5)],
        "id long, name string, score double",
    )
    pdir = tmp_path / "pqdata"
    pq.coalesce(1).write.parquet(str(pdir))
    ppath = str(next(pdir.glob("part-*.parquet")))
    table.append_snapshot(
        [
            {"path": apath, "sequence_number": 1, "content": "DATA",
             "file_size_in_bytes": os.path.getsize(apath), "file_format": "avro"},
            {"path": ppath, "sequence_number": 1, "content": "DATA",
             "file_size_in_bytes": os.path.getsize(ppath)},
        ]
    )
    # delete one row from EACH format in one predicate write
    write_position_deletes(spark, table, F.col("id").isin(2, 101))
    ids = sorted(r.id for r in read_table(spark, table).collect())
    assert 2 not in ids and 101 not in ids and len(ids) == 9

    # merge: update a key living in the avro file + insert a new one
    src = spark.createDataFrame(
        [(4, "UPDATED", 9.9), (500, "NEW", 1.0)],
        "id long, name string, score double",
    )
    merge_into(spark, table, src, ["id"])
    rows = {r.id: r.name for r in read_table(spark, table).collect()}
    assert rows[4] == "UPDATED" and rows[500] == "NEW"
    assert len(rows) == 10 and 2 not in rows


def test_avro_write_stays_gated(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(NotImplementedError, match="spark-avro"):
        write_files(df, str(tmp_path / "nope"), "avro")


def test_file_format_survives_proto_roundtrip(spark):
    from ic_spark.compaction.proto import request_from_proto, request_to_proto

    schema = StructType([StructField("id", LongType())])
    req = RewriteFilesRequest(
        schema=schema,
        data_files=[
            FileScanTask("/a.avro", sequence_number=3, file_format="avro"),
            FileScanTask("/b.parquet", sequence_number=3, file_format="parquet"),
            FileScanTask("/c.orc", sequence_number=3, file_format="orc"),
        ],
        dir_path="/out",
    )
    back = request_from_proto(request_to_proto(req))
    assert [t.file_format for t in back.data_files] == ["avro", "parquet", "orc"]


@pytest.mark.slow
def test_avro_distributed_roundtrip_property(spark, tmp_path):
    """Randomized rows (nullable strings, longs, doubles incl. edge
    values) survive write_container → distributed scan bit-exact."""
    from hypothesis import given, settings, strategies as st

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
        ],
    }

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                st.one_of(st.none(), st.text(max_size=20)),
                st.one_of(
                    st.floats(allow_nan=False, allow_infinity=True),
                    st.sampled_from([0.0, -0.0, 1e308, -1e308]),
                ),
            ),
            min_size=1,
            max_size=50,
        )
    )
    def check(rows):
        import uuid as _uuid

        p = str(tmp_path / f"prop-{_uuid.uuid4().hex}.avro")
        write_container(
            p, schema, [{"k": k, "s": s, "d": d} for k, s, d in rows]
        )
        got = sorted(
            ((r.k, r.s, r.d) for r in read_avro_distributed(spark, p).collect()),
            key=repr,
        )
        assert got == sorted(rows, key=repr)

    check()


def test_avro_scan_preserves_double_nan(spark, tmp_path):
    """Float NaN is a VALUE, distinct from null, end to end.  The old
    mapInPandas decode bridge collapsed NaN to null on the way back to
    the JVM (pandas from_pandas semantics); the mapInArrow path keeps
    the distinction, matching what Spark's parquet scan does."""
    import math

    p = str(tmp_path / "nan.avro")
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "int"},
            {"name": "d", "type": ["null", "double"]},
        ],
    }
    write_container(
        p,
        schema,
        [
            {"k": 1, "d": float("nan")},
            {"k": 2, "d": None},
            {"k": 3, "d": 2.5},
        ],
    )
    rows = {r.k: r.d for r in read_avro_distributed(spark, p).collect()}
    assert math.isnan(rows[1])
    assert rows[2] is None
    assert rows[3] == 2.5
    # and the declared Spark-side semantics hold: NaN is not filtered
    # by IS NULL, but IS caught by isnan()
    df = read_avro_distributed(spark, p)
    assert df.where(F.col("d").isNull()).count() == 1
    assert df.where(F.isnan("d")).count() == 1


def test_r9_source_edges(spark, tmp_path):
    """r9 review pins on the source layer: multi-path orc/json reads
    scan EVERY path (a splatted second path previously bound to a
    keyword slot — only the first file was read, silent data loss);
    explicit-schema avro scans skip the driver-local header read (it
    crashed on remote URIs/globs); empty avro projections raise like
    the ORC guard; positional ORC scans null-fill columns absent from
    old files instead of crashing the task; time-millis scales to the
    documented micros-since-midnight mapping."""
    import os

    import pyspark.sql.functions as F

    from ic_spark.sources.avro_scan import read_avro_distributed
    from ic_spark.sources.formats import read_files
    from ic_spark.sources.orc_scan import read_orc_distributed

    # multi-path reads (orc shown; the fix covers json/csv/text too)
    a, b = str(tmp_path / "oa"), str(tmp_path / "ob")
    spark.range(0, 5).coalesce(1).write.orc(a)
    spark.range(5, 10).coalesce(1).write.orc(b)
    fa = next(os.path.join(a, n) for n in os.listdir(a) if n.endswith(".orc"))
    fb = next(os.path.join(b, n) for n in os.listdir(b) if n.endswith(".orc"))
    assert read_files(spark, [fa, fb], "orc").count() == 10

    # avro: schema-supplied scan must not read the header on the driver
    df = spark.range(0, 4).selectExpr("id", "id * 2 AS v")
    resp_dir = str(tmp_path / "av")
    from ic_spark.compaction.request import FileScanTask, RewriteFilesRequest
    from ic_spark.compaction.writer import rewrite_files

    pq_dir = str(tmp_path / "pq")
    df.coalesce(1).write.parquet(pq_dir)
    pq = next(
        os.path.join(pq_dir, n)
        for n in os.listdir(pq_dir)
        if n.endswith(".parquet")
    )
    resp = rewrite_files(
        spark,
        RewriteFilesRequest(
            schema=df.schema,
            data_files=[FileScanTask(pq, sequence_number=1)],
            dir_path=resp_dir,
            data_file_format="avro",
            target_partitions=1,
        ),
    )
    avro_path = resp.data_files[0].file_path
    import ic_spark.sources.avro_scan as avscan

    orig = avscan.read_header
    avscan.read_header = lambda p: (_ for _ in ()).throw(
        AssertionError("driver header read with explicit schema")
    )
    try:
        n = read_avro_distributed(spark, avro_path, schema=df.schema).count()
    finally:
        avscan.read_header = orig
    assert n == 4

    # empty avro projection raises (same contract as the ORC scan)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty projection"):
        read_avro_distributed(
            spark, avro_path, schema=df.schema, columns=["nope"]
        )

    # positional ORC: files missing a projected column null-fill
    from pyspark.sql.types import LongType, StructField, StructType

    wider = StructType(
        [StructField("id", LongType()), StructField("extra", LongType())]
    )
    out = read_orc_distributed(
        spark, [fa], schema=wider, with_path_pos=True
    )
    rows = out.select("id", "extra", "_orc_pos").collect()
    assert len(rows) == 5 and all(r.extra is None for r in rows)
    assert sorted(r._orc_pos for r in rows) == list(range(5))
