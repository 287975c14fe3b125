"""TPC-H queries 2,7,8,9,11-22 adapted to the driver star schema.

The driver testdata (FIXTURES.md Part B) is a column *subset* of TPC-H —
no ``partsupp`` table, no ``l_shipmode/l_commitdate/l_receiptdate``, no
``c_phone/p_container`` — so the queries that need those are **adapted**:
the query *shape* (correlated scalar subquery, NOT EXISTS double
correlation, HAVING-over-subquery, conditional aggregation, distribution
of counts) is preserved on the columns that exist.  Each docstring names
the substitution.

Reference parity note: the reference engine executes all of these shapes
through Catalyst (it reuses the full analyzer/optimizer,
DirectSessionStateBuilder.scala:49-109) *except* scalar subqueries, which
it explicitly rejects (DirectPlanConverter.scala:34-47) — q2/q11/q14/q15/
q17/q22 here are therefore a deliberate superset (SURVEY.md §4.2).

Scale posture, same rules as tpch.py: dimension sides broadcast, filters
applied on base scans for parquet pushdown, aggregates via groupBy().agg()
for map-side partials.  Correlated subqueries are expressed as joins
against broadcast aggregates where the aggregate is small (per-part /
per-supplier), so no nested-loop re-execution per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from direct_spark_sql_spark.plans.base import (
    DEC_OUT,
    DEC_PRICE,
    DEC_QTY,
    DEC_RATE,
    Query,
    REVENUE_SQL,
    sum_money,
    sum_money_sql,
)
from direct_spark_sql_spark.sources.registry import load_table


def _revenue() -> F.Column:
    return F.col("l_extendedprice").cast(DEC_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(DEC_RATE)
    ).cast("decimal(8,4)")


# ---------------------------------------------------------------------------
# Q2 (adapted): min-price supplier per part.  TPC-H Q2 finds the min-cost
# partsupp supplier; with no partsupp table the part↔supplier relation goes
# through lineitem and "cost" becomes the minimum extended price ever
# charged for the part.  Shape kept: correlated MIN subquery → equality.
# ---------------------------------------------------------------------------

def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 10) & (F.col("p_type") == "SMALL"))
        .select("p_partkey", "p_name")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    # correlated MIN as a broadcastable per-part aggregate (tiny: one row
    # per qualifying part), instead of re-running a subquery per probe row.
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    min_price = lp.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        lp.join(
            F.broadcast(min_price),
            (lp.l_partkey == min_price.l_partkey)
            & (lp.l_extendedprice == min_price.min_price),
        )
        .join(F.broadcast(s), lp.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "min_price")
        .orderBy("p_partkey", "s_name")
    )


Q2_ORACLE = """
SELECT p_partkey, p_name, s_name, l_extendedprice AS min_price
FROM part
JOIN lineitem ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size = 10 AND p_type = 'SMALL'
  AND l_extendedprice = (
    SELECT MIN(l2.l_extendedprice) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
ORDER BY p_partkey, s_name
"""


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations (all columns present).
# ---------------------------------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    # Pre-reduce the LINEITEM side before the l⋈o join (r13, guide §2.3):
    # the final pair filter only admits supplier nations {3, 7}, so
    # broadcasting the nation-restricted supplier dim into lineitem FIRST
    # drops ~92% of l (2 of 25 nations) map-side — no new shuffle at any
    # scale, and the big side of the orderkey join shrinks ~12×.  The
    # customer side keeps the original post-join broadcast shape: pushing
    # the dim into o instead makes o's size opaque to the planner and
    # turned the orderkey join into a shuffle at sf0.1 (measured +0.4 s
    # and a 900 B → MB shuffle-pin break), while o is the *small* side
    # anyway.  Inner joins and filters commute, so the surviving pairs —
    # and the exact decimal revenue sums — are identical.
    two = ("NATION_3", "NATION_7")
    sn = s.join(
        F.broadcast(n1.filter(F.col("supp_nation").isin(*two))),
        F.col("s_nationkey") == F.col("n1_key"),
    ).select("s_suppkey", "supp_nation")
    lf = l.join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
    pair = (
        lf.join(o, lf.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        pair.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(sum_money(_revenue()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       {sum_money_sql(REVENUE_SQL)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8: national market share within a region for one part type.
# ---------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _revenue().alias("volume"),
            F.col("supp_nation"),
        )
    )
    # market share = NATION_5 volume / total volume, per year; both sums are
    # exact decimals cast to double, then one IEEE division — deterministic.
    return (
        vol.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
                        F.lit(0).cast("decimal(23,6)")
                    )
                )
                .cast(DEC_OUT)
                .cast("double")
                / F.sum("volume").cast(DEC_OUT).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_ORACLE = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       {sum_money_sql(f"CASE WHEN n2.n_name = 'NATION_5' THEN {REVENUE_SQL} ELSE CAST(0 AS DECIMAL(23,6)) END")}
       / {sum_money_sql(REVENUE_SQL)} AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 (adapted): product-line profit by nation and year.  TPC-H Q9's cost
# term is ps_supplycost; with no partsupp we charge 80% of p_retailprice
# per unit instead: profit = revenue − 0.8·retail·qty.  Shape kept:
# like-filter on p_name, 6-way join, group by (nation, year).
# ---------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    cost = (
        F.col("p_retailprice").cast(DEC_PRICE)
        * F.col("l_quantity").cast(DEC_QTY)
    ).cast("decimal(27,4)") * F.lit("0.8").cast("decimal(2,1)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(sum_money(_revenue().cast("decimal(30,5)") - cost).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_ORACLE = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       {sum_money_sql(
           f"CAST({REVENUE_SQL} AS DECIMAL(30,5))"
           " - CAST(CAST(p_retailprice AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(27,4))"
           " * CAST('0.8' AS DECIMAL(2,1))"
       )} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q11 (adapted): important-part value concentration.  partsupp value →
# lineitem revenue per part; HAVING compares against a scalar-subquery
# fraction of the global total (the reference rejects scalar subqueries —
# superset, SURVEY.md §4.2).
# ---------------------------------------------------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    per_part = l.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(DEC_PRICE)).alias("value_dec")
    )
    # global total as a 1-row broadcast (Spark plans the cross join as BNLJ
    # with a single build row — no shuffle of per_part).
    total = per_part.agg(
        F.sum("value_dec").cast(DEC_OUT).cast("double").alias("total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec").cast(DEC_OUT).cast("double") > F.col("total") * 0.0006
        )
        .select(
            "l_partkey",
            F.col("value_dec").cast(DEC_OUT).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


_Q11_VALUE = sum_money_sql("CAST(l_extendedprice AS DECIMAL(14,2))")

Q11_ORACLE = f"""
SELECT l_partkey,
       {_Q11_VALUE} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING {_Q11_VALUE} > (
  SELECT {_Q11_VALUE} * 0.0006 FROM lineitem
)
ORDER BY part_value DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# Q12 (adapted): shipping-mode priority classes.  No l_shipmode/commitdate:
# group by l_linestatus instead, same conditional-aggregation shape
# (SUM(CASE WHEN priority high THEN 1 ELSE 0)).
# ---------------------------------------------------------------------------

def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q13: distribution of orders per customer (left outer join + two-level
# aggregation; the c_comment NOT LIKE filter becomes an o_orderpriority
# exclusion).
# ---------------------------------------------------------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_orderkey", "o_custkey")
    )
    # Aggregate before the join (r13, guide §2.3): count orders per
    # custkey FIRST (map-side combinable — the shuffle carries one
    # (custkey, count) row per customer instead of every order row), then
    # left-join customer and coalesce the missing side to 0.  A customer
    # with no qualifying orders had c_count = COUNT(o_orderkey) = 0 in
    # the old left-outer + count form, and gets coalesce(NULL, 0) = 0
    # here; matched customers get the identical BIGINT count.
    per_cust_o = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_ord"))
    per_cust = c.join(
        per_cust_o, c.c_custkey == per_cust_o.o_custkey, "left_outer"
    ).select(F.coalesce(F.col("n_ord"), F.lit(0).cast("long")).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14: promo revenue percentage (p_type = 'PROMO' is a whole category here,
# not a prefix).
# ---------------------------------------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(
        F.lit(0).cast("decimal(23,6)")
    )
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast(DEC_OUT).cast("double")
            / F.sum(_revenue()).cast(DEC_OUT).cast("double")
        ).alias("promo_revenue")
    )


Q14_ORACLE = f"""
SELECT 100.0 * {sum_money_sql(f"CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} ELSE CAST(0 AS DECIMAL(23,6)) END")}
       / {sum_money_sql(REVENUE_SQL)} AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


# ---------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue — derived revenue view + scalar
# MAX subquery (reference rejects scalar subqueries; superset).
# ---------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        sum_money(_revenue()).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {sum_money_sql(REVENUE_SQL)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q16 (adapted): supplier diversity per part group.  partsupp → distinct
# l_suppkey from lineitem; the "complaints" exclusion subquery keeps the
# NOT IN shape using s_acctbal < 0.
# ---------------------------------------------------------------------------

def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") != "PROMO") & (F.col("p_size").isin(1, 5, 10, 15, 20)))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q17 (adapted): small-quantity revenue.  p_container → p_size; the
# correlated 0.5·AVG(l_quantity) per part is computed as a broadcast
# aggregate (one row per part) — no per-row subquery re-execution.
# ---------------------------------------------------------------------------

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    avg_qty = lp.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        lp.join(F.broadcast(avg_qty), lp.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC_PRICE)).cast(DEC_OUT).cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


Q17_ORACLE = """
SELECT CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1' AND p_size < 15
  AND l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


# ---------------------------------------------------------------------------
# Q18: large-volume customers (IN subquery over GROUP BY ... HAVING).
# ---------------------------------------------------------------------------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 (guide §1.2): the per-order quantity aggregate IS the output's
    total_qty, so lineitem is scanned and shuffled ONCE — the old plan
    semi-joined on the aggregate and then re-joined raw lineitem to
    re-sum the very same groups.  The HAVING filter keeps the original
    raw-double ``SUM(l_quantity) > 150`` (matching the oracle's
    subquery); total_qty keeps the exact decimal funnel, computed in the
    same aggregate over the same rows — values identical, one lineitem
    pass instead of two.  Each surviving order is one row in o and one
    group in the old final groupBy, so the join emits exactly the old
    result rows."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.sum(F.col("l_quantity").cast(DEC_QTY)).cast(DEC_OUT).cast("double").alias("total_qty"),
        )
        .filter(F.col("qty") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"), "total_qty")
    )
    return (
        o.join(big, o.o_orderkey == F.col("big_orderkey"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 (adapted): disjunctive predicate revenue.  p_container/l_shipmode →
# p_size and l_quantity bands; keeps the OR-of-ANDs residual on an
# equi-join, which Catalyst evaluates as a post-join filter on a hash join.
# ---------------------------------------------------------------------------

def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#10") & (F.col("p_size").between(5, 20))
           & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_brand") == "Brand#20") & (F.col("p_size").between(10, 40))
           & (F.col("l_quantity").between(20, 40)))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(sum_money(_revenue()).alias("revenue"))
    )


Q19_ORACLE = f"""
SELECT {sum_money_sql(REVENUE_SQL)} AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 10  AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#10' AND p_size BETWEEN 5 AND 20  AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 40)
"""


# ---------------------------------------------------------------------------
# Q20 (adapted): suppliers with significant volume in a year — nested
# IN-subquery with aggregation + HAVING, then a semi join into supplier.
# ---------------------------------------------------------------------------

def q20_active_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_nationkey") < 10
    ).select("n_nationkey", "n_name")
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_quantity")
    )
    active = (
        l.groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 500)
        .select(F.col("l_suppkey").alias("active_key"))
    )
    return (
        s.join(active, s.s_suppkey == F.col("active_key"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


Q20_ORACLE = """
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_nationkey < 10
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey HAVING SUM(l_quantity) > 500
  )
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q21 (adapted): suppliers alone at fault.  Late-delivery columns are
# absent; l_returnflag='R' marks the "failed" line.  Shape kept exactly:
# EXISTS (another supplier in the same order) AND NOT EXISTS (another
# supplier whose line also failed) — double-correlated self joins, executed
# as semi + anti hash joins.
# ---------------------------------------------------------------------------

def q21_suppliers_at_fault(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Examined r13, deliberately left as semi + anti joins: the
    per-order-aggregate rewrite (join each R row to (n_supp, n_r_supp)
    per order, filter n_supp >= 2 AND n_r_supp = 1 — provably
    row-identical to the EXISTS/NOT EXISTS pair, oracle-verified
    bit-exact at sf0.01 + sf0.1) was measured 0.66 → 0.93 s at sf0.1 and
    is NOT clearly fewer bytes at scale either: lineitem carries ~1 line
    per (order, supplier), so the (order, supplier) grain barely
    collapses map-side and the agg shuffles ≈ the same volume the
    semi/anti passes do, while locally it replaces two broadcast
    hash joins with two real exchanges (15 KB → ~15 MB shuffle)."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = l.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = l.alias("l2")
    l3 = l.filter(F.col("l_returnflag") == "R").alias("l3")
    base = l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
    with_other = base.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    alone_at_fault = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        alone_at_fault.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q22 (adapted): wealthy idle customers.  c_phone country code →
# c_nationkey % 7, and "never ordered" → "no order since 2001" (the
# generated data gives every customer at least one order).  Keeps both
# correlations: scalar AVG subquery over a filtered set + NOT EXISTS anti
# join against a filtered orders subquery.
# ---------------------------------------------------------------------------

def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.pmod(F.col("c_nationkey"), F.lit(7)).alias("cntrycode")
    ).filter(F.col("cntrycode").isin(1, 2, 3))
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC_PRICE)).cast(DEC_OUT).cast("double")
         / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC_PRICE)).cast(DEC_OUT).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_ORACLE = """
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) AS totacctbal
FROM (
  SELECT c_custkey, c_acctbal, c_nationkey % 7 AS cntrycode
  FROM customer
  WHERE c_nationkey % 7 IN (1, 2, 3)
) c
WHERE c_acctbal > (
  SELECT CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) / COUNT(*)
  FROM customer
  WHERE c_acctbal > 0.0 AND c_nationkey % 7 IN (1, 2, 3)
)
AND NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
)
GROUP BY cntrycode
ORDER BY cntrycode
"""


QUERIES = [
    Query("q2_min_price_supplier", q2_min_price_supplier, Q2_ORACLE,
          ("tpch", "subquery"), doc="Q2 adapted: correlated MIN subquery"),
    Query("q7_volume_shipping", q7_volume_shipping, Q7_ORACLE,
          ("tpch", "join"), bench=True, doc="Q7 nation-pair volume"),
    Query("q8_market_share", q8_market_share, Q8_ORACLE,
          ("tpch", "join"), doc="Q8 market share (8-way join + cond agg)"),
    Query("q9_product_profit", q9_product_profit, Q9_ORACLE,
          ("tpch", "join"), bench=True, doc="Q9 adapted: profit by nation/year"),
    Query("q11_important_parts", q11_important_parts, Q11_ORACLE,
          ("tpch", "subquery"), doc="Q11 adapted: HAVING over scalar subquery"),
    Query("q12_priority_lines", q12_priority_lines, Q12_ORACLE,
          ("tpch", "agg"), doc="Q12 adapted: conditional aggregation"),
    Query("q13_customer_distribution", q13_customer_distribution, Q13_ORACLE,
          ("tpch", "join", "agg"), bench=True, doc="Q13 order-count distribution"),
    Query("q14_promo_revenue", q14_promo_revenue, Q14_ORACLE,
          ("tpch", "agg"), doc="Q14 promo revenue percent"),
    Query("q15_top_supplier", q15_top_supplier, Q15_ORACLE,
          ("tpch", "subquery"), doc="Q15 view + scalar MAX subquery"),
    Query("q16_parts_supplier_count", q16_parts_supplier_count, Q16_ORACLE,
          ("tpch", "agg"), doc="Q16 adapted: NOT IN + count distinct"),
    Query("q17_small_quantity", q17_small_quantity, Q17_ORACLE,
          ("tpch", "subquery"), doc="Q17 adapted: correlated AVG subquery"),
    Query("q18_large_orders", q18_large_orders, Q18_ORACLE,
          ("tpch", "join", "subquery"), bench=True, doc="Q18 IN-subquery w/ HAVING"),
    Query("q19_disjunctive_filter", q19_disjunctive_filter, Q19_ORACLE,
          ("tpch", "join"), doc="Q19 adapted: OR-of-ANDs residual"),
    Query("q20_active_suppliers", q20_active_suppliers, Q20_ORACLE,
          ("tpch", "subquery"), doc="Q20 adapted: nested IN + HAVING"),
    Query("q21_suppliers_at_fault", q21_suppliers_at_fault, Q21_ORACLE,
          ("tpch", "join", "subquery"), bench=True,
          doc="Q21 adapted: EXISTS + NOT EXISTS self joins"),
    Query("q22_idle_customers", q22_idle_customers, Q22_ORACLE,
          ("tpch", "subquery"), doc="Q22 adapted: scalar AVG + NOT EXISTS"),
]
