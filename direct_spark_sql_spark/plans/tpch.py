"""TPC-H-style analytical queries over the driver star schema.

These are the bench headline queries (BASELINE.md): classic shapes —
scan-heavy aggregation, multi-way star joins, semi-join correlation,
top-k — adapted to the driver's column subset (FIXTURES.md Part B,
orders span 1995-2001).

Scale posture (the part the reference, being single-partition, never had —
reference pins shuffle.partitions=1, DirectSparkSession.scala:326-337):

- Dimension tables (region, nation, supplier, part, customer at small SF)
  are joined with ``F.broadcast`` hints — no shuffle of the fact table for
  those joins; at 100 TB the lineitem/orders join still shuffles, and AQE
  (enabled in the session preset) coalesces / skew-splits it at runtime.
- Filters are applied on the base scans *before* joins so Catalyst pushes
  them into the parquet readers (check: PushedFilters in explain).
- Aggregations are expressed as groupBy().agg() → Catalyst plans
  partial (map-side) + final hash aggregation automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from direct_spark_sql_spark.plans.base import (
    CHARGE_SQL,
    DEC_OUT,
    DEC_PRICE,
    DEC_QTY,
    DEC_RATE,
    Query,
    REVENUE_SQL,
)
from direct_spark_sql_spark.sources.registry import load_table


def _revenue() -> F.Column:
    """Exact-decimal revenue term; see base.REVENUE_SQL for the oracle twin
    (and for why the (1 - discount) factor is pinned to DECIMAL(8,4))."""
    return F.col("l_extendedprice").cast(DEC_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(DEC_RATE)
    ).cast("decimal(8,4)")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report (reference executes the same shape
    through HashAggregateDirectExec, HashAggregateDirectExec.scala:32-136)."""
    l = load_table(spark, sf_dir, "lineitem")
    charge = _revenue() * (F.lit(1) + F.col("l_tax").cast(DEC_RATE)).cast("decimal(8,4)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC_QTY)).cast(DEC_OUT).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC_PRICE)).cast(DEC_OUT).cast("double").alias("sum_base_price"),
            F.sum(_revenue()).cast(DEC_OUT).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast(DEC_OUT).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast(DEC_QTY)).cast(DEC_OUT).cast("double") / F.count(F.lit(1)))
            .alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast(DEC_PRICE)).cast(DEC_OUT).cast("double") / F.count(F.lit(1)))
            .alias("avg_price"),
            (F.sum(F.col("l_discount").cast(DEC_RATE)).cast(DEC_OUT).cast("double") / F.count(F.lit(1)))
            .alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DECIMAL(24,2)) AS DOUBLE)       AS sum_qty,
       CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE)  AS sum_base_price,
       CAST(CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DECIMAL(24,2)) AS DOUBLE)                           AS sum_disc_price,
       CAST(CAST(ROUND(SUM({CHARGE_SQL}), 2) AS DECIMAL(24,2)) AS DOUBLE)                            AS sum_charge,
       CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) / COUNT(*)      AS avg_qty,
       CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(7,4))), 2) AS DECIMAL(24,2)) AS DOUBLE) / COUNT(*)       AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped-orders revenue top-10.  Customer is the small
    side → broadcast; orders⋈lineitem is the big shuffle and carries only
    pruned columns."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast(DEC_OUT).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_ORACLE = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DECIMAL(24,2)) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where supplier and customer share the
    nation.  All dimensions broadcast; the only fact-side shuffle is
    orders⋈lineitem."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    # Pre-reduce the LINEITEM side before the l⋈o join (r13, guide §2.3):
    # every surviving row has its supplier in an ASIA nation, so
    # broadcasting the ASIA-restricted supplier dim into lineitem FIRST
    # drops ~80% of l (1 of 5 regions) map-side — no new shuffle at any
    # scale, and the big side of the orderkey join shrinks ~5×.  The
    # customer side keeps the original post-join broadcast shape (pushing
    # a dim into o makes o's size opaque to the planner and turned the
    # orderkey join into a shuffle at sf0.1 — measured +0.45 s and a
    # shuffle-pin break — while o is the small side anyway).  The
    # c_nationkey = s_nationkey equality rides the customer broadcast
    # join as before; inner joins and filters commute, so the result is
    # identical.
    n_asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    s_asia = s.join(
        F.broadcast(n_asia), s.s_nationkey == n_asia.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    lf = l.join(F.broadcast(s_asia), l.l_suppkey == s_asia.s_suppkey)
    return (
        lf.join(o, lf.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(c),
            (F.col("o_custkey") == c.c_custkey)
            & (c.c_nationkey == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast(DEC_OUT).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_ORACLE = f"""
SELECT n_name, CAST(CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DECIMAL(24,2)) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-pass filtered global aggregate — pure scan
    throughput; every predicate reaches the parquet reader."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.col("l_extendedprice").cast(DEC_PRICE)
                    * F.col("l_discount").cast(DEC_RATE)
                ),
                F.lit(0),
            )
            .cast(DEC_OUT)
            .cast("double")
            .alias("revenue")
        )
    )


Q6_ORACLE = """
SELECT CAST(CAST(ROUND(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(7,4))), 0), 2) AS DECIMAL(24,2)) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.04 AND l_discount <= 0.06
  AND l_quantity < 24
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts by priority where some line item shipped
    late (> 30 days after order date).

    r13 (guide §2.3 aggregate-before-join): the correlated EXISTS only
    needs each order's LATEST ship date — ``EXISTS(line: shipdate >
    odate+30)  <=>  MAX(shipdate) > odate+30`` (MAX ignores NULL
    shipdates exactly as the EXISTS predicate rejects them) — so
    lineitem collapses map-side to one (orderkey, max_shipdate) row per
    order before any join, instead of the semi-join building a hash
    relation over every raw lineitem row.  Inner join ≡ semi here: the
    aggregate side has exactly one row per orderkey."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    lmax = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("__max_ship"))
    )
    late = o.join(lmax, o.o_orderkey == lmax.l_orderkey).filter(
        F.col("__max_ship") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned revenue; broadcast nation,
    shuffle orders⋈lineitem only."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast(DEC_OUT).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DECIMAL(24,2)) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_region_year_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order volume by region and year — star rollup over broadcast dims."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC_PRICE)).cast(DEC_OUT).cast("double").alias("total_volume"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy("r_name", "order_year")
    )


Q_REGION_YEAR_ORACLE = """
SELECT r_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) AS total_volume,
       COUNT(*) AS order_count
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, order_year
ORDER BY r_name, order_year
"""


def q_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 part brands by revenue (broadcast part dim into lineitem)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount", "l_quantity"
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(_revenue()).cast(DEC_OUT).cast("double").alias("revenue"),
            F.sum(F.col("l_quantity").cast(DEC_QTY)).cast(DEC_OUT).cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("revenue"), "p_brand")
        .limit(10)
    )


Q_TOP_PARTS_ORACLE = f"""
SELECT p_brand,
       CAST(CAST(ROUND(SUM({REVENUE_SQL}), 2) AS DECIMAL(24,2)) AS DOUBLE) AS revenue,
       CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) AS total_qty
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY revenue DESC, p_brand
LIMIT 10
"""


QUERIES = [
    Query("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE, ("tpch", "agg"), bench=True,
          doc="TPC-H Q1 pricing summary (scan + hash agg)"),
    Query("q3_shipping_priority", q3_shipping_priority, Q3_ORACLE, ("tpch", "join", "topk"),
          bench=True, doc="TPC-H Q3 3-way join + top-k"),
    Query("q4_order_priority", q4_order_priority, Q4_ORACLE, ("tpch", "join", "semi"),
          bench=True, doc="TPC-H Q4 EXISTS semi-join"),
    Query("q5_local_supplier_volume", q5_local_supplier_volume, Q5_ORACLE, ("tpch", "join"),
          bench=True, doc="TPC-H Q5 6-way star join"),
    Query("q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE, ("tpch", "agg"), bench=True,
          doc="TPC-H Q6 filtered global agg"),
    Query("q10_returned_items", q10_returned_items, Q10_ORACLE, ("tpch", "join", "topk"),
          bench=True, doc="TPC-H Q10 returned-items top-20"),
    Query("q_region_year_volume", q_region_year_volume, Q_REGION_YEAR_ORACLE, ("tpch", "join"),
          bench=True, doc="order volume by region x year"),
    Query("q_top_parts", q_top_parts, Q_TOP_PARTS_ORACLE, ("tpch", "join", "topk"),
          doc="top part brands by revenue"),
]
