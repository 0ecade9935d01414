"""Second batch of TPC-H-family queries, reshaped to the fixture schema
(no partsupp / commitdate / receiptdate — see FIXTURES.md §A).

Same discipline as tpch.py: decimal-exact money sums, broadcast dims,
deterministic tiebreaks on every top-k.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window

from ic_spark.queries.registry import query
from ic_spark.queries.tpch import DEC, SQL_DEC, SQL_DISC_PRICE, _d, _disc_price, _dsum
from ic_spark.tables import load_table, maybe_broadcast


@query(
    "q2_min_acctbal_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    ranked AS (
        SELECT ps.l_partkey, s.s_suppkey, s.s_name, s.s_acctbal,
               ROW_NUMBER() OVER (PARTITION BY ps.l_partkey
                                  ORDER BY s.s_acctbal ASC, s.s_suppkey ASC) AS rn
        FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    )
    SELECT l_partkey, s_suppkey, s_name, s_acctbal
    FROM ranked WHERE rn = 1
    """,
)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str):
    """Q2 reshaped: per part, the shipping supplier with minimum account
    balance (part-supplier relation derived from lineitem)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    joined = ps.join(maybe_broadcast(s, sf_dir, "supplier"), ps.l_suppkey == s.s_suppkey)
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_partkey", "s_suppkey", "s_name", "s_acctbal")
    )


@query(
    "q4_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str):
    """Q4 reshaped: orders containing a lineitem shipped >90 days after
    the order date (semi-join = EXISTS)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        o.join(li, li.l_orderkey == o.o_orderkey, "inner")
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("o_orderkey")
        .distinct()
    )
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(late, on="o_orderkey", how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH volumes AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               {SQL_DISC_PRICE} AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
          JOIN orders o   ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
          JOIN region r   ON cn.n_regionkey = r.r_regionkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                               ELSE CAST(0 AS {SQL_DEC}) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM volumes GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str):
    """Q8 reshaped: NATION_7 suppliers' share of revenue to EUROPE
    customers, by order year."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vols = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(r.where(F.col("r_name") == "EUROPE")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(
        F.lit(0).cast(DEC)
    )
    return vols.groupBy("o_year").agg(
        F.round(F.sum(nat).cast("double") / F.sum("volume").cast("double"), 6).alias(
            "mkt_share"
        )
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT sn.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM({SQL_DISC_PRICE}
                 - CAST(p.p_retailprice AS {SQL_DEC}) * CAST(0.8 AS {SQL_DEC})
                   * CAST(l.l_quantity AS {SQL_DEC})) AS DOUBLE) AS profit
    FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str):
    """Q9 reshaped: profit = revenue - 0.8*retailprice*qty (no
    ps_supplycost in the fixture; 0.8*retail stands in as unit cost)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    cost = _d("p_retailprice") * F.lit(0.8).cast(DEC) * _d("l_quantity")
    return (
        li.join(maybe_broadcast(p.where(F.col("p_name").like("%gear%")), sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(_dsum(_disc_price() - cost).alias("profit"))
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(SUM(CASE WHEN l.l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS big_line_count,
           CAST(SUM(CASE WHEN l.l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS small_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderpriority
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias("big_line_count"),
            F.sum(F.when(F.col("l_quantity") <= 25, 1).otherwise(0)).alias("small_line_count"),
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_dsum(_disc_price()).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        maybe_broadcast(s, sf_dir, "supplier")
        .join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_parts_supplier_count",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(
            maybe_broadcast(
                p.where(
                    (F.col("p_brand") != "Brand#1")
                    & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
                ),
                sf_dir,
                "part",
            ),
            ps.l_partkey == p.p_partkey,
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS {SQL_DEC})) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < a.half_avg
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str):
    """Q17: correlated avg subquery → join against per-part aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(maybe_broadcast(p.where(F.col("p_brand") == "Brand#3"), sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(part_avg.withColumnRenamed("l_partkey", "pa_key"), F.col("l_partkey") == F.col("pa_key"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg((_dsum(_d("l_extendedprice")) / 7.0).alias("avg_yearly"))
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str):
    """Q22 reshaped: above-average-balance customers with no RECENT
    (2000+) orders, grouped by nation (scalar subquery + anti join).
    The recency filter keeps the result non-degenerate — every fixture
    customer has at least one all-time order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    recent = o.where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS {SQL_DEC})) AS qty
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    vals AS (
        SELECT ps.l_partkey,
               SUM(ps.qty * CAST(p.p_retailprice AS {SQL_DEC})) AS value
        FROM ps
          JOIN supplier s ON ps.l_suppkey = s.s_suppkey
          JOIN nation n   ON s.s_nationkey = n.n_nationkey
          JOIN part p     ON ps.l_partkey = p.p_partkey
        WHERE n.n_name = 'NATION_1'
        GROUP BY ps.l_partkey
    )
    SELECT l_partkey AS ps_partkey, CAST(value AS DOUBLE) AS value
    FROM vals
    WHERE value > (SELECT SUM(value) * 0.001 FROM vals)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str):
    """Q11 reshaped (no partsupp in the fixture): the part-supplier
    relation and its 'stock value' derive from lineitem quantities ×
    part retail price; keep parts whose NATION_1 value exceeds 0.1% of
    the national total (HAVING over a scalar aggregate of the same
    derived table)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_d("l_quantity")).alias("qty")
    )
    vals = (
        ps.join(maybe_broadcast(s, sf_dir, "supplier"), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n.where(F.col("n_name") == "NATION_1")), F.col("s_nationkey") == n.n_nationkey)
        .join(maybe_broadcast(p, sf_dir, "part"), ps.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("qty") * _d("p_retailprice")).alias("value"))
    )
    threshold = vals.agg((F.sum("value") * F.lit(0.001)).alias("t"))
    return (
        vals.crossJoin(F.broadcast(threshold))
        .where(F.col("value") > F.col("t"))
        .select(F.col("l_partkey").alias("ps_partkey"), F.col("value").cast("double").alias("value"))
    )


@query(
    "q20_potential_promotion",
    oracle=f"""
    WITH shipped AS (
        SELECT l.l_suppkey, SUM(CAST(l.l_quantity AS {SQL_DEC})) AS qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE '%gear%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
    WHERE n.n_name = 'NATION_2'
      AND sh.qty > (SELECT 0.8 * AVG(qty) FROM shipped)
    ORDER BY s.s_name
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str):
    """Q20 reshaped (no partsupp availqty): NATION_2 suppliers who
    shipped more than 80% of the average supplier quantity of gear
    parts in 1997 (semi-join shape + scalar subquery threshold)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    shipped = (
        li.join(maybe_broadcast(p.where(F.col("p_name").like("%gear%")), sf_dir, "part"), li.l_partkey == p.p_partkey)
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_d("l_quantity")).alias("qty"))
    )
    avg_qty = shipped.agg((F.lit(0.8) * F.avg("qty")).alias("aq"))
    return (
        shipped.crossJoin(F.broadcast(avg_qty))
        .where(F.col("qty") > F.col("aq"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n.where(F.col("n_name") == "NATION_2")), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
