"""Round-4 scan-gap closures:

1. ORC position deletes — the planner routes positional scans over ORC
   data files through the distributed pyarrow.orc codec scan
   (sources/orc_scan.py), closing the honest NotImplementedError gate
   (Spark's row_index metadata column is Parquet-only).
2. Equality-delete files written BEFORE a key-column rename — their
   scan resolves the key through the write-schema history, so old
   delete files keep deleting after evolution.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from ic_spark.compaction.deletes import (
    read_table,
    write_equality_deletes,
    write_position_deletes,
)
from ic_spark.compaction.manifest import ManifestTable
from ic_spark.compaction.request import (
    FileContent,
    FileScanTask,
    RewriteFilesRequest,
)
from ic_spark.compaction.writer import _stats_from_footer


def _one_orc(spark, tmp_path, df, tag):
    d = str(tmp_path / tag)
    df.coalesce(1).write.mode("overwrite").orc(d)
    return next(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".orc"))


def test_orc_position_deletes_apply(spark, tmp_path):
    """MoR position deletes over ORC data files: positions computed by
    the distributed ORC codec scan match, the anti-join removes exactly
    the targeted rows."""
    from ic_spark.compaction.planner import build_merge_on_read

    df = spark.range(0, 100).select("id", (F.col("id") * 3).alias("v"))
    orc_file = _one_orc(spark, tmp_path, df, "data")

    table = ManifestTable(str(tmp_path / "t"))
    table.append_snapshot(
        [
            {
                "path": orc_file,
                "sequence_number": 1,
                "content": "DATA",
                "file_format": "orc",
                "file_size_in_bytes": os.path.getsize(orc_file),
            }
        ]
    )
    # Predicate-driven position-delete WRITE over the orc table (the
    # probe scan itself exercises the positional orc path).
    write_position_deletes(spark, table, F.col("id") % 10 == 7)
    out = read_table(spark, table)
    got = sorted(r.id for r in out.collect())
    assert got == [i for i in range(100) if i % 10 != 7]

    # Mixed formats: parquet + orc data files under one request, both
    # with position deletes applied.
    pq_dir = str(tmp_path / "pq")
    spark.range(100, 150).select("id", (F.col("id") * 3).alias("v")).coalesce(
        1
    ).write.parquet(pq_dir)
    pq = next(
        os.path.join(pq_dir, n)
        for n in os.listdir(pq_dir)
        if n.endswith(".parquet")
    )
    table.append_snapshot(
        [
            {
                "path": pq,
                "sequence_number": 2,
                "content": "DATA",
                "file_size_in_bytes": os.path.getsize(pq),
            }
        ]
    )
    write_position_deletes(spark, table, F.col("id").isin(120, 130))
    got = sorted(r.id for r in read_table(spark, table).collect())
    # rows 100-149 were appended AFTER the first delete, so only the
    # second delete touches them.
    assert got == [i for i in range(100) if i % 10 != 7] + [
        i for i in range(100, 150) if i not in (120, 130)
    ]


def test_orc_positions_match_native_row_order(spark, tmp_path):
    """The codec scan's _orc_pos must equal the native reader's row
    order — deleting 'the nth row of the file' is only meaningful if
    both sides agree on n."""
    from ic_spark.sources.orc_scan import read_orc_distributed

    df = spark.range(0, 5000).select(
        "id", F.concat(F.lit("x"), F.col("id")).alias("s")
    )
    orc_file = _one_orc(spark, tmp_path, df, "order")
    dist = read_orc_distributed(spark, [orc_file], with_path_pos=True)
    ordered = [
        r.id for r in sorted(dist.collect(), key=lambda r: r._orc_pos)
    ]
    native = [r.id for r in spark.read.orc(orc_file).collect()]
    assert ordered == native


def test_equality_delete_written_before_rename_still_applies(spark, tmp_path):
    """Equality-delete files carry the key column under its OLD name
    after a rename; the scan must resolve it through the write-schema
    history instead of failing on the current name."""
    from ic_spark.compaction.iceberg_meta import IcebergTable

    loc = str(tmp_path / "spec_eq")
    df = spark.range(0, 30).select("id", (F.col("id") + 100).alias("v"))
    tbl = IcebergTable.create(loc, df.schema)
    d = str(tmp_path / "spec_eq_seed")
    df.coalesce(1).write.parquet(d)
    f = next(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))
    rc, cs, _ = _stats_from_footer(f, d)
    tbl.append_snapshot(
        [
            {
                "path": f,
                "content": "DATA",
                "record_count": rc,
                "file_size_in_bytes": os.path.getsize(f),
                "column_stats": cs,
            }
        ]
    )
    # Equality delete on the ORIGINAL key name.
    write_equality_deletes(
        spark, tbl, spark.createDataFrame([(3,), (4,)], "id long"), ["id"]
    )
    # Rename the key column afterwards.
    tbl.rename_column("id", "ident")
    rows = sorted(r.ident for r in read_table(spark, tbl).collect())
    assert rows == [i for i in range(30) if i not in (3, 4)]

    # New deletes keyed by the CURRENT name still work too.
    write_equality_deletes(
        spark, tbl, spark.createDataFrame([(5,)], "ident long"), ["ident"]
    )
    rows = sorted(r.ident for r in read_table(spark, tbl).collect())
    assert rows == [i for i in range(30) if i not in (3, 4, 5)]


@pytest.mark.slow
def test_position_delete_files_use_spec_column_names(spark, tmp_path):
    """New position-delete files carry the Iceberg spec's column names
    (file_path, pos) so real Iceberg readers interop; tables mixing
    spec-named and legacy sys_hidden_* delete files still read
    correctly (per-flavor grouped scan — a single mixed read would
    silently null one flavor)."""
    import pyarrow.parquet as pq

    table = ManifestTable(str(tmp_path / "specnames"))
    d = str(tmp_path / "sn_data")
    spark.range(0, 50).coalesce(1).write.parquet(d)
    f = next(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))
    table.append_snapshot(
        [{"path": f, "sequence_number": 1, "content": "DATA",
          "file_size_in_bytes": os.path.getsize(f)}]
    )
    write_position_deletes(spark, table, F.col("id") < 5)
    _, pos, _ = table.scan_tasks()
    assert pq.read_schema(pos[0].data_file_path).names[:2] == ["file_path", "pos"]

    # Legacy-named delete file targeting rows 10-11 of the same file.
    legacy = spark.createDataFrame(
        [(f"file:{f}", 10), (f"file:{f}", 11)],
        "sys_hidden_file_path string, sys_hidden_pos long",
    )
    ld = str(tmp_path / "sn_legacy")
    legacy.coalesce(1).write.parquet(ld)
    lf = next(os.path.join(ld, n) for n in os.listdir(ld) if n.endswith(".parquet"))
    table.append_snapshot(
        [{"path": lf, "sequence_number": 2, "content": "POSITION_DELETES",
          "file_size_in_bytes": os.path.getsize(lf)}]
    )
    got = sorted(r.id for r in read_table(spark, table).collect())
    assert got == [i for i in range(50) if i >= 5 and i not in (10, 11)]

    # Maintenance merges both flavors into one spec-named file.
    from ic_spark.compaction import Compaction

    stats = Compaction(spark).rewrite_position_deletes(table)
    assert stats["merged"] == 2 and stats["kept_rows"] == 7
    _, pos, _ = table.scan_tasks()
    assert len(pos) == 1
    assert pq.read_schema(pos[0].data_file_path).names[:2] == ["file_path", "pos"]
    got = sorted(r.id for r in read_table(spark, table).collect())
    assert got == [i for i in range(50) if i >= 5 and i not in (10, 11)]


def test_directory_referenced_tasks(spark, tmp_path):
    """Tasks may reference a directory write instead of single files:
    the footer name sniff and the schema validation both resolve a part
    file inside; the MoR plan reads the directory through Spark."""
    from ic_spark.compaction.planner import build_merge_on_read

    df = spark.range(0, 30).select("id")
    dd = str(tmp_path / "dir_data")
    df.coalesce(1).write.parquet(dd)
    part = next(os.path.join(dd, n) for n in os.listdir(dd) if n.endswith(".parquet"))
    third = spark.read.parquet(part).collect()[3].id

    pd_dir = str(tmp_path / "dir_pdel")
    spark.createDataFrame(
        [(f"file:{part}", 3)], "fp string, pos long"  # non-spec names too
    ).coalesce(1).write.parquet(pd_dir)

    req = RewriteFilesRequest(
        schema=df.schema,
        data_files=[FileScanTask(dd, sequence_number=1)],
        position_delete_files=[
            FileScanTask(pd_dir, content=FileContent.POSITION_DELETES)
        ],
    )
    got = sorted(r.id for r in build_merge_on_read(spark, req).collect())
    assert got == sorted(set(range(30)) - {third})


def test_orc_empty_projection_refused(spark, tmp_path):
    """Arrow batches can't carry rows without columns; a zero-column
    projection must refuse loudly instead of returning 0 rows."""
    from ic_spark.sources.orc_scan import read_orc_distributed

    orc_file = _one_orc(
        spark, tmp_path, spark.range(0, 10).select("id"), "empty_proj"
    )
    with pytest.raises(ValueError, match="empty projection"):
        read_orc_distributed(
            spark, [orc_file], columns=["nope"], with_path_pos=False
        )


@pytest.mark.slow
def test_orc_distributed_timestamps_match_native_under_non_utc_os_tz(tmp_path):
    """Plain ORC timestamps decode as reader-LOCAL wall-clock (Spark's
    JVM-default-tz semantics; pyarrow matches).  The distributed scan
    must pin the instant with assume_timezone(local) before casting to
    Spark's tz-aware Arrow type — a direct cast reinterprets local wall
    time as UTC, shifting every value by the OS offset (r9 review find:
    +5h30m under TZ=Asia/Kolkata).  Runs in a subprocess because the
    timezone must be set before the JVM starts."""
    import subprocess
    import sys

    script = r"""
import datetime as dt, glob, os, sys, tempfile
from pyspark.sql import SparkSession, functions as F
from pyspark.sql import types as T
spark = (SparkSession.builder.master("local[2]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate())
sch = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("tsn", T.TimestampNTZType()),
])
rows = [
    (1, dt.datetime(2024, 6, 1, 12, 0, 0), dt.datetime(2024, 6, 1, 12, 0, 0)),
    (2, dt.datetime(2024, 1, 15, 23, 59, 59, 123456),
        dt.datetime(2024, 1, 15, 23, 59, 59, 123456)),
    (3, None, None),
]
d = tempfile.mkdtemp()
p = os.path.join(d, "t.orc")
spark.createDataFrame(rows, sch).write.orc(p)
files = glob.glob(p + "/*.orc")
native = sorted(
    (r.id, r.e, r.s)
    for r in spark.read.orc(p)
    .select("id", F.col("ts").cast("long").alias("e"),
            F.col("tsn").cast("string").alias("s")).collect()
)
from ic_spark.sources.orc_scan import read_orc_distributed
dist = sorted(
    (r.id, r.e, r.s)
    for r in read_orc_distributed(spark, files, schema=sch)
    .select("id", F.col("ts").cast("long").alias("e"),
            F.col("tsn").cast("string").alias("s")).collect()
)
assert dist == native, f"dist={dist} native={native}"
spark.stop()
print("TZ_OK")
"""
    env = dict(os.environ, TZ="Asia/Kolkata")
    env.pop("SPARK_HOME", None)
    out = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "TZ_OK" in out.stdout, out.stdout + "\n" + out.stderr[-3000:]
