"""Window frames, percentiles, array aggregation, regexp scalar
functions, outer-join shapes, and embedding-cosine near-dup pairs —
widening the §2 category coverage with oracle-checked queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window

from ic_spark.functions.vectors import cosine_similarity
from ic_spark.queries.registry import query
from ic_spark.queries.tpch import DEC
from ic_spark.tables import load_table


@query(
    "window_range_frame_trailing_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_30d_spend
    FROM orders
    """,
)
def window_range_frame_trailing_spend(spark: SparkSession, sf_dir: str):
    """Trailing-30-day spend per customer — a RANGE (value-based) frame,
    not ROWS: all orders within 30 days are summed regardless of count,
    and same-day orders share one frame."""
    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days.cast("long"))
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias(
            "trailing_30d_spend"
        ),
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FIRST_VALUE(l_partkey) OVER w AS first_part,
           LAST_VALUE(l_partkey) OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_part,
           NTH_VALUE(l_partkey, 2) OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_part
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str):
    """(l_orderkey, l_linenumber) is NOT unique in the fixture — the
    window order adds l_partkey so the projected value is total-ordered
    (a non-total window order makes first/last/nth nondeterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    w_default = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    w_full = w_default.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_partkey").over(w_default).alias("first_part"),
        F.last("l_partkey").over(w_full).alias("last_part"),
        F.nth_value("l_partkey", 2).over(w_full).alias("second_part"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str):
    """Exact interpolated percentiles (Spark ``percentile`` == SQL
    percentile_cont semantics — NOT the approximate sketch)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 6).alias("p75"),
    )


@query(
    "agg_filtered_counts",
    oracle="""
    SELECT n_regionkey,
           COUNT(*) AS n_nations,
           COUNT(*) FILTER (WHERE n_nationkey % 2 = 0) AS n_even
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_filtered_counts(spark: SparkSession, sf_dir: str):
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.count(F.when(F.col("n_nationkey") % 2 == 0, 1)).alias("n_even"),
    )


@query(
    "agg_array_collect",
    oracle="""
    SELECT p_brand,
           array_to_string(list_sort(list(p_size)), ',') AS sizes,
           array_to_string(list_sort(list_distinct(list(p_type))), ',') AS types
    FROM part GROUP BY p_brand
    """,
)
def agg_array_collect(spark: SparkSession, sf_dir: str):
    """Array aggregation; sorted so the result is order-deterministic
    (collect_list order is not guaranteed under parallel agg), then
    serialized to a joined string — list-valued cells are unhashable in
    the driver's pandas canonicalizer."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.array_join(
            F.array_sort(F.collect_list("p_size")).cast("array<string>"), ","
        ).alias("sizes"),
        F.array_join(
            F.array_sort(F.array_distinct(F.collect_list("p_type"))), ","
        ).alias("types"),
    )


@query(
    "scalar_regexp_functions",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([0-9]+)', 1) AS first_number,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           translate(p_brand, '#', '-') AS brand_dash,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_type) AS type_rev,
           COALESCE(NULLIF(p_type, 'PROMO'), 'is-promo') AS type_or_flag
    FROM part
    """,
)
def scalar_regexp_functions(spark: SparkSession, sf_dir: str):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([0-9]+)", 1).alias("first_number"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_type").alias("type_rev"),
        F.coalesce(F.nullif("p_type", F.lit("PROMO")), F.lit("is-promo")).alias(
            "type_or_flag"
        ),
    )


@query(
    "join_full_outer_balance",
    oracle="""
    WITH spend AS (
        SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    ),
    rich AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9500)
    SELECT COALESCE(r.c_custkey, s.o_custkey) AS custkey, r.c_acctbal, s.spend
    FROM rich r FULL OUTER JOIN spend s ON r.c_custkey = s.o_custkey
    """,
)
def join_full_outer_balance(spark: SparkSession, sf_dir: str):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        o.where(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("spend"))
    )
    rich = c.where(F.col("c_acctbal") > 9500).select("c_custkey", "c_acctbal")
    return rich.join(spend, rich.c_custkey == spend.o_custkey, "full_outer").select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        "c_acctbal",
        "spend",
    )


@query(
    "join_cross_small",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def join_cross_small(spark: SparkSession, sf_dir: str):
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str):
    """Embedding-cosine near-dup pairs, label-blocked (the block bounds
    the self-join quadratic cost; at scale the block would be an LSH
    bucket instead of a label — see hyperplane_lsh_buckets)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("label"), F.col("embedding").alias("__ea")
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("__bl"),
        F.col("embedding").alias("__eb"),
    )
    cos = cosine_similarity(F.col("__ea"), F.col("__eb"))
    return (
        a.join(b, (F.col("label") == F.col("__bl")) & (F.col("id_a") < F.col("id_b")))
        .where(cos >= 0.35)
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
    )


@query(
    "range_join_error_windows",
    oracle="""
    WITH w AS (
        SELECT event_id AS error_id, ts AS w_start, ts + INTERVAL 10 MINUTE AS w_end
        FROM events WHERE event_type = 'error'
    )
    SELECT e.event_id, w.error_id
    FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
    """,
)
def range_join_error_windows(spark: SparkSession, sf_dir: str):
    """Keyless interval join: events falling inside any 10-minute
    window opened by an 'error' event — bucketed to avoid the
    nested-loop cross product (see operators/rangejoin.py)."""
    from ic_spark.operators.rangejoin import interval_join

    e = load_table(spark, sf_dir, "events")
    w = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    joined = interval_join(
        e.select("event_id", "ts"),
        w,
        left_time="ts",
        right_start="w_start",
        right_end="w_end",
        bucket_width_seconds=600,
    )
    return joined.select("event_id", "error_id")


@query(
    "range_join_left_unmatched",
    oracle="""
    WITH w AS (
        SELECT event_id AS error_id, ts AS w_start, ts + INTERVAL 10 MINUTE AS w_end
        FROM events WHERE event_type = 'error'
    )
    SELECT e.event_id, w.error_id
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') e
    LEFT JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
    """,
)
def range_join_left_unmatched(spark: SparkSession, sf_dir: str):
    """Keyless LEFT interval join: purchases matched into 10-minute
    error windows, with purchases outside every window null-extended.
    Exercises the correctness-subtle outer path of the bucketed
    interval join (inner matches ∪ anti-join null-extension — a naive
    outer join over the replicated buckets would emit one null row per
    probed bucket; see operators/rangejoin.py)."""
    from ic_spark.operators.rangejoin import interval_join

    e = load_table(spark, sf_dir, "events")
    w = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    joined = interval_join(
        e.where(F.col("event_type") == "purchase").select("event_id", "ts"),
        w,
        left_time="ts",
        right_start="w_start",
        right_end="w_end",
        bucket_width_seconds=600,
        how="left",
    )
    return joined.select("event_id", "error_id")


@query(
    "scalar_map_functions",
    oracle="""
    WITH m AS (
        SELECT s_suppkey,
               MAP(['name', 'nation'], [s_name, CAST(s_nationkey AS VARCHAR)]) AS info
        FROM supplier
    )
    SELECT s_suppkey,
           info['name'][1] AS name_val,
           info['nation'][1] AS nation_val,
           array_to_string(list_sort(map_keys(info)), ',') AS keys,
           CAST(cardinality(info) AS BIGINT) AS n_entries
    FROM m
    """,
)
def scalar_map_functions(spark: SparkSession, sf_dir: str):
    """Map construction/access — map/array output columns are serialized
    to strings (map iteration order is engine-specific and list cells
    are unhashable in the driver's pandas canonicalizer; scalars
    extracted from the map are portable)."""
    s = load_table(spark, sf_dir, "supplier")
    m = F.map_from_arrays(
        F.array(F.lit("name"), F.lit("nation")),
        F.array(F.col("s_name"), F.col("s_nationkey").cast("string")),
    )
    return s.select(
        "s_suppkey",
        F.element_at(m, "name").alias("name_val"),
        F.element_at(m, "nation").alias("nation_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
        F.size(m).cast("long").alias("n_entries"),
    )


@query(
    "agg_correlation",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_discount), 4) AS qty_disc_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_correlation(spark: SparkSession, sf_dir: str):
    """Bivariate statistics (rounded to 4 digits: the running-moment
    accumulation differs in summation order between engines; agreement
    to ~1e-10 relative is expected, 4 digits is safely inside it)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("qty_disc_covar"),
    )


@query(
    "q21_multi_supplier_orders",
    oracle="""
    SELECT s.s_name, COUNT(DISTINCT l.l_orderkey) AS waiting_orders
    FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l.l_orderkey AND l2.l_suppkey <> l.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l.l_orderkey AND l3.l_suppkey <> l.l_suppkey
          AND l3.l_shipdate > l.l_shipdate
    )
    GROUP BY s.s_name
    """,
)
def q21_multi_supplier_orders(spark: SparkSession, sf_dir: str):
    """Q21 reshaped: per supplier, orders it shares with other suppliers
    where it shipped strictly last (EXISTS + NOT EXISTS = semi + anti
    join composition)."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    base = s.join(li, s.s_suppkey == li.l_suppkey)
    with_other = base.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    not_last = with_other.join(
        l3,
        (F.col("l_orderkey") == F.col("k3"))
        & (F.col("l_suppkey") != F.col("s3"))
        & (F.col("d3") > F.col("l_shipdate")),
        "left_anti",
    )
    return not_last.groupBy("s_name").agg(
        F.countDistinct("l_orderkey").alias("waiting_orders")
    )


@query(
    "window_percent_cume",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER w, 6) AS bal_pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS bal_cume_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def window_percent_cume(spark: SparkSession, sf_dir: str):
    """Distribution window functions (percent_rank / cume_dist) —
    rounds to 6 so the k/(n-1) doubles hash identically cross-engine."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


@query(
    "unpivot_returnflag_metrics",
    oracle="""
    WITH base AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
               CAST(COUNT(*) AS DOUBLE) AS n_items
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value FROM base
    UNPIVOT (value FOR metric IN (total_qty, total_price, n_items))
    """,
)
def unpivot_returnflag_metrics(spark: SparkSession, sf_dir: str):
    """Wide->long unpivot (melt) of per-returnflag aggregates — the
    inverse of pivot_returnflag_revenue; Spark's native unpivot operator
    (no UNION ALL re-scan: one pass, rows fan out in the projection)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty"),
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("total_price"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    return base.unpivot(
        ["l_returnflag"], ["total_qty", "total_price", "n_items"], "metric", "value"
    )


@query(
    "agg_median_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           CAST(MEDIAN(CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS med_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_median_grouping_id(spark: SparkSession, sf_dir: str):
    """Exact median + grouping_id over a rollup: grouping_id's bit
    pattern (which columns are aggregated away) matches DuckDB's
    GROUPING(); median is the exact interpolated percentile both
    engines define identically for doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.median(F.col("l_quantity").cast("double")).alias("med_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "med_qty", "n")
    )


@query(
    "scalar_null_semantics",
    oracle="""
    SELECT o_orderkey,
           (o_orderstatus IS NOT DISTINCT FROM NULLIF(o_orderstatus, 'F'))
               AS not_finished,
           COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'urgent!') AS demoted,
           CASE WHEN NULLIF(o_orderstatus, 'F') IS NULL THEN -1
                ELSE o_custkey END AS cust_nvl
    FROM orders WHERE o_orderkey < 2000
    """,
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str):
    """Null-safe comparison (<=> == IS NOT DISTINCT FROM, exercised
    against genuinely-null values via NULLIF), COALESCE/NULLIF chains,
    and explicit null defaulting — the null-semantics corner of the
    scalar surface."""
    o = load_table(spark, sf_dir, "orders")
    st_null = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return o.where(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        F.col("o_orderstatus").eqNullSafe(st_null).alias("not_finished"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("urgent!")
        ).alias("demoted"),
        F.when(st_null.isNull(), F.lit(-1))
        .otherwise(F.col("o_custkey"))
        .alias("cust_nvl"),
    )


@query(
    "overlap_join_error_purchase",
    oracle="""
    WITH e AS (
        SELECT event_id AS error_id, ts AS es, ts + INTERVAL 10 MINUTE AS ee
        FROM events WHERE event_type = 'error'
    ),
    p AS (
        SELECT event_id AS purchase_id, ts AS ps, ts + INTERVAL 5 MINUTE AS pe
        FROM events WHERE event_type = 'purchase'
    )
    SELECT e.error_id, p.purchase_id
    FROM e JOIN p ON e.es < p.pe AND p.ps < e.ee
    """,
)
def overlap_join_error_purchase(spark: SparkSession, sf_dir: str):
    """Keyless interval-OVERLAP join: 10-minute error windows crossed
    with 5-minute purchase windows wherever they intersect — bucketed
    (1 h buckets) with canonical-bucket emission, so the theta join
    never becomes a cross product and no dedup pass re-shuffles the
    output."""
    from ic_spark.operators.rangejoin import overlap_join

    ev = load_table(spark, sf_dir, "events")
    e = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("es"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTE")).alias("ee"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("ps"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTE")).alias("pe"),
    )
    return overlap_join(
        e, p, "es", "ee", "ps", "pe", bucket_width_seconds=3600
    ).select("error_id", "purchase_id")
