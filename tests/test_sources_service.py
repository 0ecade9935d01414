"""Source formats, LPT scheduler, and the compactor service surface."""

from __future__ import annotations

import random

import pytest

from ic_spark.compaction.service import CompactorService
from ic_spark.plans.scheduling import split_n_groups
from ic_spark.sources.formats import read_files, write_files

from tests.conftest import SF_DIR, normalize


def test_roundtrip_formats(spark, tmp_path):
    df = read_files(spark, f"{SF_DIR}/nation.parquet", "parquet")
    want = normalize(map(tuple, df.collect()))
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / f"rt_{fmt}")
        write_files(df, path, fmt, target_partitions=2)
        back = read_files(spark, path, fmt, schema=df.schema)
        got = normalize(map(tuple, back.collect()))
        assert got == want, f"round-trip mismatch for {fmt}"


def test_text_and_binaryfile_formats(spark, tmp_path):
    """text: one row per line round-trip; binaryFile: whole-file bytes +
    metadata (the multimodal ingest path), read-only."""
    lines = spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], "value string")
    tpath = str(tmp_path / "rt_text")
    write_files(lines, tpath, "text", target_partitions=1)
    back = read_files(spark, tpath, "text")
    assert sorted(r.value for r in back.collect()) == ["alpha", "beta", "gamma"]

    blob = tmp_path / "payload.bin"
    blob.write_bytes(b"\x00\x01binary-payload\xff")
    bdf = read_files(spark, str(tmp_path), "binaryFile", pathGlobFilter="*.bin")
    rows = bdf.collect()
    assert len(rows) == 1
    assert rows[0].length == 17 and bytes(rows[0].content) == blob.read_bytes()
    assert rows[0].path.endswith("payload.bin")
    with pytest.raises(ValueError, match="read-only"):
        write_files(bdf, str(tmp_path / "nope"), "binaryFile")


def test_avro_reads_via_fallback(spark, tmp_path):
    """Avro reads no longer gate on spark-avro: the distributed
    pure-Python codec path serves them (full coverage in
    tests/test_avro_scan.py).  A missing path still fails fast."""
    from ic_spark.sources.avro_io import write_container

    p = str(tmp_path / "one.avro")
    write_container(
        p,
        {"type": "record", "name": "r", "fields": [{"name": "v", "type": "long"}]},
        [{"v": 41}, {"v": 1}],
    )
    assert sorted(r.v for r in read_files(spark, p, "avro").collect()) == [1, 41]
    with pytest.raises(Exception):
        read_files(spark, str(tmp_path / "nope"), "avro")


def test_read_multiple_paths(spark):
    df = read_files(
        spark, [f"{SF_DIR}/nation.parquet", f"{SF_DIR}/nation.parquet"], "parquet"
    )
    assert df.count() == 50  # both paths scanned


# ---------------------------------------------------------- scheduler


def test_lpt_balance_and_determinism():
    rng = random.Random(7)
    tasks = [(i, rng.randrange(1, 1000)) for i in range(200)]
    first = split_n_groups(tasks, 8, weight=lambda t: t[1])
    # deterministic over many repetitions (reference pins 10k reps)
    for _ in range(1000):
        assert split_n_groups(tasks, 8, weight=lambda t: t[1]) == first
    # balanced: max group weight within (max_task + avg) bound (LPT bound)
    weights = [sum(w for _, w in g) for g in first]
    avg = sum(weights) / len(weights)
    max_task = max(w for _, w in tasks)
    assert max(weights) <= avg + max_task


def test_lpt_skewed_isolates_giant():
    tasks = [("giant", 10_000)] + [(f"t{i}", 10) for i in range(30)]
    groups = split_n_groups(tasks, 4, weight=lambda t: t[1])
    giant_group = next(g for g in groups if ("giant", 10_000) in g)
    assert len(giant_group) == 1  # nothing co-scheduled with the giant


def test_lpt_edge_cases():
    assert split_n_groups([], 3, weight=lambda t: 1) == [[], [], []]
    assert split_n_groups([("a", 5)], 3, weight=lambda t: t[1]) == [[("a", 5)], [], []]
    with pytest.raises(ValueError):
        split_n_groups([("a", 1)], 0, weight=lambda t: t[1])


# ------------------------------------------------------------ service


@pytest.mark.slow
def test_service_rewrite_files_json_contract(spark, tmp_path):
    # Build a tiny data file + position-delete file.
    src = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id int, val string"
    )
    data_dir = str(tmp_path / "svc_data")
    src.coalesce(1).write.parquet(data_dir)
    import os

    data_file = next(
        os.path.join(data_dir, f) for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    pd = spark.createDataFrame(
        [("file:" + data_file, 0)], "sys_hidden_file_path string, sys_hidden_pos long"
    )
    pd_dir = str(tmp_path / "svc_pd")
    pd.coalesce(1).write.parquet(pd_dir)
    pd_file = next(
        os.path.join(pd_dir, f) for f in os.listdir(pd_dir) if f.endswith(".parquet")
    )

    svc = CompactorService(spark)
    assert svc.echo("ping") == "ping"
    out = svc.rewrite_files(
        {
            "schema": src.schema.jsonValue(),
            "dir_path": str(tmp_path / "svc_out"),
            "data_files": [{"path": data_file, "sequence_number": 1}],
            "position_delete_files": [{"path": pd_file}],
            "target_partitions": 1,
        }
    )
    assert out["stat"]["rewritten_files_count"] == 2
    assert out["stat"]["added_files_count"] >= 1
    assert all(f["file_format"] == "parquet" for f in out["data_files"])
    back = spark.read.parquet(str(tmp_path / "svc_out"))
    assert sorted(r.id for r in back.collect()) == list(range(1, 10))  # row 0 deleted


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Joining two tables bucketed on the join key must not shuffle
    either side (no Exchange above the scans)."""
    import pyspark.sql.functions as F

    from ic_spark.sources.bucketed import read_bucketed, write_bucketed

    li = read_files(spark, f"{SF_DIR}/lineitem.parquet", "parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = read_files(spark, f"{SF_DIR}/orders.parquet", "parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
    )
    bl, bo = read_bucketed(spark, "b_lineitem"), read_bucketed(spark, "b_orders")
    # disable broadcast so the co-located layout is what saves the shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(bo, on="l_orderkey")
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = joined._jdf.queryExecution().explainString(mode)
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        # results still correct vs plain join
        plain = li.join(
            o.withColumnRenamed("o_orderkey", "l_orderkey"), on="l_orderkey"
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
