"""Physical-plan regression tests: the plan properties that matter at
100 TB must survive refactors — filters reaching the parquet scan,
column pruning, broadcast joins where a side is small, and no
nested-loop joins sneaking into keyed paths.
"""

from __future__ import annotations

import pytest

from ic_spark.queries import REGISTRY

from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q1_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # filter reached parquet
    # pruned: the 11-column table reads only the 7 needed columns
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_q3_broadcasts_dimensions(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # pushed to scan


def test_mor_anti_joins_are_broadcast(spark):
    plan = plan_of(spark, "mor_full_merge_on_read")
    assert plan.count("BroadcastHashJoin LeftAnti") == 3  # pos + 2 eq groups
    assert "SortMergeJoin LeftAnti" not in plan  # data side never shuffles


def test_topk_uses_window_group_limit(spark):
    """Grouped top-k must push partial limits into the shuffle
    (WindowGroupLimit) — shuffle O(groups×k), not O(rows)."""
    plan = plan_of(spark, "window_topk_revenue_per_brand")
    assert "WindowGroupLimit" in plan


def test_interval_join_avoids_nested_loop(spark):
    plan = plan_of(spark, "range_join_error_windows")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_exact_prunes_to_needed_columns(spark):
    plan = plan_of(spark, "dedup_exact")
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "text" in read_schema and "lang" not in read_schema


def test_broadcast_hint_gated_by_dim_size(spark, monkeypatch):
    """Broadcast hints on SF-scaled dims must be withheld when the
    backing file is large — a hard hint cannot be demoted by AQE and
    OOMs the driver at 100× scale."""
    import ic_spark.tables as T

    sdf = REGISTRY["q5_local_supplier_volume"].fn(spark, SF_DIR)
    hinted = sdf._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in hinted  # tiny fixture: hint fires

    monkeypatch.setattr(T, "_BROADCAST_HINT_BYTES", 0)
    s = T.load_table(spark, SF_DIR, "supplier")
    # SF-scaled dim over threshold: no hint emitted.
    assert "ResolvedHint" not in T.maybe_broadcast(
        s, SF_DIR, "supplier"
    )._jdf.queryExecution().analyzed().toString()
    # Constant-size dims stay hinted regardless of threshold.
    n = T.load_table(spark, SF_DIR, "nation")
    assert "ResolvedHint" in T.maybe_broadcast(
        n, SF_DIR, "nation"
    )._jdf.queryExecution().analyzed().toString()


def test_dynamic_partition_pruning_on_partitioned_table(spark, tmp_path):
    """A partitioned fact joined to a filtered dim must prune partitions
    at runtime (DPP): the fact scan's PartitionFilters carries a
    dynamicpruning subquery instead of reading every partition — at
    100 TB the difference between scanning one day and the whole table."""
    import pyspark.sql.functions as F

    fact_dir = str(tmp_path / "fact")
    spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 10).alias("pkey"), (F.col("id") * 2).alias("v")
    ).write.partitionBy("pkey").parquet(fact_dir)
    dim = spark.createDataFrame([(3, "three"), (7, "seven")], "pkey long, name string")

    fact = spark.read.parquet(fact_dir)
    joined = fact.join(dim.where(F.col("name") == "three"), on="pkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() == 1000  # only partition pkey=3


def test_stratified_sample_uses_window_group_limit(spark):
    plan = plan_of(spark, "sample_corpus_mix")
    assert "WindowGroupLimit" in plan  # shuffle O(strata x n), not corpus


def test_pii_scrub_is_map_only(spark):
    plan = plan_of(spark, "text_pii_scrub")
    assert "Exchange" not in plan  # regexp chain fuses into the scan
    # Only the two needed columns are read.
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "doc_id" in read and "text" in read and "lang" not in read


def test_chunking_is_map_only(spark):
    plan = plan_of(spark, "text_chunk_documents")
    assert "Exchange" not in plan  # posexplode inherits scan partitions
    assert "Generate" in plan


def test_repetition_stats_partial_aggregates(spark):
    plan = plan_of(spark, "text_repetition_stats")
    # The (doc, token) count must combine map-side before the shuffle:
    # partial HashAggregate precedes every Exchange.
    assert plan.count("Exchange hashpartitioning") <= 4
    assert "partial_count" in plan or "partial_sum" in plan.lower() or "HashAggregate" in plan
