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


def test_substring_spans_prunes_and_avoids_cartesian(spark):
    """The span pipeline reads only (doc_id, text), joins grams on the
    8-byte hash key (no nested loop), and windows over hit positions."""
    plan = plan_of(spark, "dedup_substring_spans")
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "source" not in read  # pruned
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "xxhash64" in plan  # grams reduced to hash keys pre-shuffle


def test_decontaminate_broadcasts_eval_grams(spark):
    """The eval gram set is the small probe side: it must broadcast (or
    at worst hash-join) — the train side never pays a pairwise term."""
    plan = plan_of(spark, "pipeline_decontaminate")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan  # probe + kill joins


def _lsh_plan(spark, **kw):
    from ic_spark.operators.dedup import minhash_lsh_candidates, minhash_signatures
    from ic_spark.tables import load_table

    d = load_table(spark, SF_DIR, "documents")
    sigs = minhash_signatures(d, "doc_id", "text", num_hashes=64, shingle_n=3)
    df = minhash_lsh_candidates(sigs, **kw)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_salted_lsh_spreads_cells_explicitly(spark):
    """The salted candidate self-join (in-plan detection flavor) must
    carry the explicit cell-key repartition (REPARTITION_BY_NUM) so AQE
    cannot coalesce a hot bucket's cells back into one task, and the
    hot-detection side must ride a broadcast left join."""
    plan = _lsh_plan(spark, bucket_target=64, salt="always")
    assert "REPARTITION_BY_NUM" in plan
    assert "BroadcastHashJoin LeftOuter" in plan  # in-plan hot detection
    assert "ShuffledHashJoin" in plan             # cell-key self-join


def test_lsh_uniform_auto_takes_plain_join(spark):
    """PAY-AS-YOU-GO pin: on a uniform corpus the auto probe must pick
    the PLAIN banded join — no broadcast left join, no cell explode
    beyond the band explode, zero salting overhead (the r6 fix for the
    1.3x uniform-headline regression the always-on detection cost)."""
    plan = _lsh_plan(spark)  # default bucket_target: nothing is hot
    assert "BroadcastHashJoin LeftOuter" not in plan
    assert "__c1" not in plan and "__s" not in plan  # no salt/cell cols


def test_lsh_hot_auto_salts_with_literal_and_reuses_exchange(spark):
    """On a hot corpus the auto probe salts via a broadcast LITERAL hot
    table (no full bucket-size aggregate anywhere in the plan) and both
    self-join sides read ONE reused exchange — the salted stage is
    computed once, with no persist (no cache-manager entry)."""
    import pyspark.sql.functions as F

    from ic_spark.operators.dedup import minhash_lsh_candidates

    # 300 identical signatures -> one certainly-sampled hot bucket.
    sigs = spark.range(300).select(
        F.col("id"),
        F.array(*[F.lit(i * 7 + 3) for i in range(64)]).alias("sig"),
    )
    df = minhash_lsh_candidates(sigs, bucket_target=16)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin LeftOuter" in plan   # literal hot side
    assert "REPARTITION_BY_NUM" in plan
    # literal path: no full-corpus HashAggregate feeding the broadcast
    bcast = plan.split("BroadcastExchange")[1]
    assert "HashAggregate" not in bcast.split("\n\n")[0]
    spark.catalog.clearCache()
    df.collect()  # materialize THIS query execution so AQE finalizes
    final = df._jdf.queryExecution().explainString(mode)
    assert "ReusedExchange" in final
    # Repeated calls leave NO session cache entries (the r5 shape
    # persisted one plan per call and never released it).
    minhash_lsh_candidates(sigs, bucket_target=16).count()
    minhash_lsh_candidates(sigs, bucket_target=16, salt="always").count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
