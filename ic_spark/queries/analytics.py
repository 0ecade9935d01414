"""Window / grouping / set-op / scalar-function / time-series queries.

Covers the operator categories the reference delegates entirely to its
SQL engine (SURVEY.md §2.2): windows, rollup/cube/grouping sets,
set operations, scalar function library, JSON access, as-of join, and
sessionization.  Every query has a DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window

from ic_spark.operators.asof import asof_join
from ic_spark.operators.topk import grouped_top_k
from ic_spark.queries.registry import query
from ic_spark.queries.tpch import DEC, SQL_DEC, _d, _disc_price, _dsum, SQL_DISC_PRICE
from ic_spark.tables import load_table, maybe_broadcast


# ------------------------------------------------------------- windows

@query(
    "window_topk_revenue_per_brand",
    oracle=f"""
    SELECT p_brand, l_partkey, revenue, rank FROM (
        SELECT p.p_brand, l.l_partkey,
               CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
               ROW_NUMBER() OVER (
                 PARTITION BY p.p_brand
                 ORDER BY CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) DESC, l.l_partkey ASC
               ) AS rank
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, l.l_partkey
    ) WHERE rank <= 3
    """,
    headline=True,
)
def window_topk_revenue_per_brand(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    per_part = (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(_dsum(_disc_price()).alias("revenue"))
    )
    return grouped_top_k(
        per_part, ["p_brand"], [F.col("revenue").desc(), F.col("l_partkey").asc()], 3
    ).select("p_brand", "l_partkey", "revenue", "rank")


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_d("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "window_lag_lead_delta",
    oracle="""
    SELECT event_id, user_id, ts, value,
           ROUND(value - LAG(value) OVER w, 6) AS delta_prev,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_delta(spark: SparkSession, sf_dir: str):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           RANK()       OVER w AS bal_rank,
           DENSE_RANK() OVER w AS bal_dense_rank,
           NTILE(4)     OVER w AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str):
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


# ---------------------------------------------- grouping-set variants

@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {SQL_DEC})) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _dsum(_d("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS {SQL_DEC})) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        _dsum(_d("l_extendedprice")).alias("sum_price")
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS {SQL_DEC})) AS DOUBLE) AS sum_total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS sum_total
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_stats_moments",
    oracle="""
    SELECT o_orderstatus,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS std_price,
           ROUND(MIN(o_totalprice), 4) AS min_price,
           ROUND(MAX(o_totalprice), 4) AS max_price,
           ROUND(MEDIAN(o_totalprice), 4) AS median_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("std_price"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
    )


# ------------------------------------------------------------- set ops

@query(
    "setop_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 50000
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.where(F.col("o_totalprice") > 50000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(big)


@query(
    "setop_except",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def setop_except(spark: SparkSession, sf_dir: str):
    """Recent (2000+) orderers who never placed a 400k+ order.  (Every
    fixture customer has SOME order, so the naive customers-minus-
    orderers EXCEPT is structurally empty — no evidence.)"""
    o = load_table(spark, sf_dir, "orders")
    recent = o.where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    big = o.where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return recent.subtract(big)


@query(
    "setop_union_all",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str):
    """Multiset union: rows in both branches appear twice."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    big = o.where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return urgent.unionAll(big)


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    EXCEPT ALL
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str):
    """Multiset difference: each right occurrence cancels ONE left
    occurrence (a customer with 3 recent orders and 1 big order keeps
    2 rows) — distinct semantics from the EXCEPT DISTINCT query."""
    o = load_table(spark, sf_dir, "orders")
    recent = o.where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    big = o.where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return recent.exceptAll(big)


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rich = c.where(F.col("c_acctbal") > 9000).select("c_custkey")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return rich.union(urgent).distinct()


# --------------------------------------------------- scalar functions

@query(
    "scalar_string_date_math",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           SUBSTR(p_name, 1, 8) AS name_prefix,
           LENGTH(p_name) AS name_len,
           CONCAT_WS(':', p_brand, p_type) AS brand_type,
           ROUND(p_retailprice * 1.1, 4) AS price_with_tax,
           CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS size_class,
           ABS(p_size - 25) AS size_dist
    FROM part
    """,
)
def scalar_string_date_math(spark: SparkSession, sf_dir: str):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 4).alias("price_with_tax"),
        F.when(F.col("p_size") < 10, "S")
        .when(F.col("p_size") < 30, "M")
        .otherwise("L")
        .alias("size_class"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
    )


@query(
    "scalar_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
           CAST(EXTRACT(day FROM o_orderdate) AS INT) AS o_day,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS o_quarter,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders
    """,
)
def scalar_date_parts(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str):
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


# ----------------------------------------------------- time series

@query(
    "events_tumbling_window",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    headline=True,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str):
    """Tumbling 1-hour window — the batch shape of the Structured
    Streaming windowed agg (same F.window op runs under readStream;
    see ic_spark/streaming)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_sessionization",
    oracle="""
    WITH marks AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM marks
    )
    SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           ROUND(SUM(value), 4) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str):
    """Gap-based sessionization (30-min inactivity): lag → new-session
    marker → running sum = session id.  One shuffle on user_id; the
    same semantics as Structured Streaming's session_window."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag("ts").over(w)
    # Full-precision 30-min gap via timestamp+interval comparison: works
    # for both TIMESTAMP and TIMESTAMP_NTZ (the fixtures store µs
    # without tz, which a stock ANSI session reads as NTZ — where
    # unix_micros/cast-to-long are analysis errors), and matches the
    # oracle's epoch_us delta exactly on fractional-second boundaries.
    new_session = (
        F.when(
            prev.isNull()
            | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0)
    )
    marks = e.select("user_id", "ts", "event_id", "value", new_session.alias("new_session"))
    run = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = marks.select(
        "user_id", "ts", "value", F.sum("new_session").over(run).alias("session_id")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


@query(
    "asof_join_latest_order",
    oracle="""
    WITH o1 AS (
        SELECT * FROM orders
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                   ORDER BY o_orderkey DESC) = 1
    )
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
    FROM events e
    ASOF LEFT JOIN o1 o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    headline=True,
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str):
    """For each event, the user's most recent order at event time —
    implemented with the union-window as-of operator (one shuffle,
    no range-join explosion).  The right side is first made unique per
    (user, time) — ASOF on a non-unique time key is ambiguous in any
    engine."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    o1 = (
        o.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    joined = asof_join(
        e.select("event_id", "user_id", "ts"),
        o1.select(F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice"),
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_payload=["o_orderkey", "o_totalprice"],
    )
    return joined.select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")
