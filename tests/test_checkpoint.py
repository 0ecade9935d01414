"""stable_checkpoint (VERDICT r10 #5): localCheckpoint's unreplicated
blocks don't survive executor loss on a real cluster; with a configured
checkpoint dir the operators upgrade to reliable checkpoints."""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def _restore_no_checkpoint_dir(sc):
    """Clear the context's checkpoint dir (no public unset API): the
    shared test SparkContext must leave this test as it entered."""
    empty = sc._jvm.scala.Option.empty()  # noqa: SLF001
    getattr(sc._jsc.sc(), "checkpointDir_$eq")(empty)  # noqa: SLF001


def test_stable_checkpoint_local_without_dir(spark):
    from ic_spark.plans.checkpoint import stable_checkpoint

    assert spark.sparkContext.getCheckpointDir() is None
    out = stable_checkpoint(spark.range(100).withColumn("x", F.col("id") * 2))
    assert out.count() == 100
    # plan is truncated either way — downstream reuse computes once
    assert out.where("x >= 0").count() == 100


def test_stable_checkpoint_reliable_with_dir(spark, tmp_path):
    from ic_spark.plans.checkpoint import stable_checkpoint

    sc = spark.sparkContext
    ckdir = str(tmp_path / "ck")
    sc.setCheckpointDir(ckdir)
    try:
        out = stable_checkpoint(
            spark.range(50).withColumn("x", F.col("id") + 1)
        )
        assert out.count() == 50
        # reliable checkpoint data landed in the configured dir — the
        # cluster-durable flavor, not executor-local blocks
        found = [
            os.path.join(r, n)
            for r, _d, files in os.walk(ckdir)
            for n in files
        ]
        assert found, "no reliable checkpoint files written"
        assert out.where("x > 0").count() == 50
    finally:
        _restore_no_checkpoint_dir(sc)
    assert sc.getCheckpointDir() is None


def test_pack_shards_under_checkpoint_dir(spark, tmp_path):
    """An operator using the helper stays correct under the reliable
    flavor (same shard assignment either way)."""
    from ic_spark.operators.packing import pack_shards

    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("tokens")
    )
    local = pack_shards(df, "tokens", ["doc_id"], 100)
    want = sorted((r.doc_id, r.shard_id) for r in local.collect())

    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ck2"))
    try:
        reliable = pack_shards(df, "tokens", ["doc_id"], 100)
        got = sorted((r.doc_id, r.shard_id) for r in reliable.collect())
    finally:
        _restore_no_checkpoint_dir(sc)
    assert got == want


def test_reliable_checkpoint_warns_without_cleaner_config(spark, tmp_path):
    """r11 ADVICE: Spark never deletes reliable checkpoint data unless
    spark.cleaner.referenceTracking.cleanCheckpoints=true (a
    SparkContext-creation-time config) — stable_checkpoint must warn
    once per session when a dir is configured without it."""
    import warnings as _w

    from ic_spark.plans import checkpoint as ck

    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ckw"))
    try:
        assert (
            sc.getConf()
            .get("spark.cleaner.referenceTracking.cleanCheckpoints", "false")
            .lower()
            != "true"
        )
        ck._warned_no_cleanup = False
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            ck.stable_checkpoint(spark.range(10)).count()
            ck.stable_checkpoint(spark.range(10)).count()  # once only
        hits = [
            c for c in caught if "cleanCheckpoints" in str(c.message)
        ]
        assert len(hits) == 1
        assert issubclass(hits[0].category, RuntimeWarning)
    finally:
        ck._warned_no_cleanup = False
        _restore_no_checkpoint_dir(sc)
