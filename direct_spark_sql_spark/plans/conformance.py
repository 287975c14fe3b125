"""Conformance corpus: the reference engine's tested operator surface.

Each query here corresponds to a capability the reference exercises in its
own suite (DirectExecSuite.scala, see SURVEY.md §5) — all seven join types,
hash/object/sort aggregation, grouping sets / rollup / cube, the window
frame families, sorts + top-k, set operations, lateral view explode,
one-row relation, scalar subqueries (a superset: the reference *rejects*
those, DirectPlanConverter.scala:34-47), conditional expressions, and
date/time arithmetic — re-expressed over the driver star schema with a
DuckDB oracle for each.

Everything here is pure DataFrame/SQL: Catalyst plans the join strategy
(broadcast where a side is small, else shuffle hash / sort-merge under
AQE), and whole-stage codegen fuses the pipelines — the machinery the
reference hand-built (DirectWholeStageCodegenExec.scala) is inherited.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from direct_spark_sql_spark.plans.base import DEC_OUT, DEC_PRICE, DEC_QTY, Query
from direct_spark_sql_spark.sources.registry import load_table


# ---------------------------------------------------------------------------
# Joins — all seven types of the reference's hash/NLJ paths
# (DirectHashJoin.scala:27-243, NestedLoopJoinDirectExec.scala:33-362).
# ---------------------------------------------------------------------------

def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    )


JOIN_INNER_ORACLE = """
SELECT n_nationkey, n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY n_nationkey
"""


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        c.join(agg, c.c_custkey == agg.o_custkey, "left")
        .select("c_custkey", "c_name", F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
        .orderBy("c_custkey")
    )


JOIN_LEFT_ORACLE = """
SELECT c_custkey, c_name, COALESCE(n_orders, 0) AS n_orders
FROM customer LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
) t ON c_custkey = o_custkey
ORDER BY c_custkey
"""


def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .select("c_custkey", F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
        .orderBy("c_custkey")
    )


JOIN_RIGHT_ORACLE = """
SELECT c_custkey, COALESCE(n_orders, 0) AS n_orders
FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) t
RIGHT JOIN customer ON o_custkey = c_custkey
ORDER BY c_custkey
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer — the reference could only run this through its nested-loop
    path (DirectHashJoin.scala:49-50 throws for FullOuter); Spark's sort-merge
    full join is a strict superset."""
    cust_nations = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp_nations = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cust_nations.join(
            supp_nations, cust_nations.c_nationkey == supp_nations.s_nationkey, "full"
        )
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


JOIN_FULL_ORACLE = """
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) c
FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
  ON c_nationkey = s_nationkey
ORDER BY nationkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that have at least one open order (left-semi,
    reference: DirectHashJoin.scala:169-182)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
ORDER BY c_custkey
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all (left-anti,
    reference: DirectHashJoin.scala:202-214)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def join_existence_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → existence join (reference: DirectHashJoin.scala:184-200);
    written in SQL because that is how the existence form arises."""
    from direct_spark_sql_spark.plans.base import sql_query

    return sql_query(
        spark,
        sf_dir,
        """
        SELECT s_suppkey, s_name,
               s_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)
                 AS has_rich_customer
        FROM supplier ORDER BY s_suppkey
        """,
    )


JOIN_EXISTENCE_ORACLE = """
SELECT s_suppkey, s_name,
       s_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)
         AS has_rich_customer
FROM supplier ORDER BY s_suppkey
"""


def join_nonequi_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (banded): parts priced within a size-dependent band —
    the reference routes these to BroadcastNestedLoopJoin
    (NestedLoopJoinDirectExec.scala); Spark does the same with an explicit
    broadcast of the small bands side."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [(1, 0.0, 500.0), (2, 500.0, 1000.0), (3, 1000.0, 1500.0), (4, 1500.0, 1e9)],
        "band_id int, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band_id")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("band_id")
    )


JOIN_NONEQUI_ORACLE = """
SELECT band_id, COUNT(*) AS n_parts
FROM part
JOIN (VALUES (1, 0.0, 500.0), (2, 500.0, 1000.0), (3, 1000.0, 1500.0), (4, 1500.0, 1e9))
     AS bands(band_id, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band_id ORDER BY band_id
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two smallest dims (reference falls back to
    vanilla CartesianProductExec, DirectPlanConverter.scala:198-199)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    return r.crossJoin(s).orderBy("r_name", "s_suppkey")


JOIN_CROSS_ORACLE = "SELECT r_name, s_suppkey FROM region CROSS JOIN supplier ORDER BY r_name, s_suppkey"


# ---------------------------------------------------------------------------
# Aggregation — hash agg, distinct, object-hash (collect), sort agg,
# empty-input global agg corner, grouping sets / rollup / cube.
# ---------------------------------------------------------------------------

def agg_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC_PRICE)).cast(DEC_OUT).cast("double").alias("total_bal"),
            F.min(F.col("c_acctbal")).alias("min_bal"),
            F.max(F.col("c_acctbal")).alias("max_bal"),
            (F.sum(F.col("c_acctbal").cast(DEC_PRICE)).cast(DEC_OUT).cast("double") / F.count(F.lit(1)))
            .alias("avg_bal"),
        )
        .orderBy("c_mktsegment")
    )


AGG_GROUP_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) AS total_bal,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal,
       CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) / COUNT(*) AS avg_bal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate → Catalyst Expand rewrite (reference:
    ExpandDirectExec.scala + Catalyst's RewriteDistinctAggregates)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


AGG_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_empty_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate over empty input emits exactly one default row —
    the corner the reference special-cases (HashAggregateDirectExec.scala:101-103)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.lit(1) == F.lit(0))
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.max("l_shipdate").alias("max_ship"),
    )


AGG_EMPTY_ORACLE = """
SELECT COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty, MAX(l_shipdate) AS max_ship
FROM lineitem WHERE 1 = 0
"""


def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-hash aggregation (collect_list is a TypedImperativeAggregate —
    reference: ObjectHashAggregateDirectExec.scala); joined to a string for a
    deterministic, oracle-comparable rendering."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("n_regionkey")
    )


AGG_COLLECT_ORACLE = """
SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS → ExpandExec (reference: ExpandDirectExec.scala:33-77,
    test DirectExecSuite.scala:181-189)."""
    from direct_spark_sql_spark.plans.base import sql_query

    return sql_query(
        spark,
        sf_dir,
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderstatus, o_orderpriority
        """,
    )


AGG_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY o_orderstatus, o_orderpriority
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    )


AGG_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


AGG_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


def agg_pivot_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot expressed as conditional aggregation (the portable form; Spark's
    df.pivot produces the same plan)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0)).alias("n_open"),
            F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias("n_filled"),
        )
        .orderBy("l_returnflag")
    )


AGG_PIVOT_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Window functions — ranking, offset, moving and range frames
# (reference: WindowDirectExecBase.scala:182-233 frame families).
# ---------------------------------------------------------------------------

def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number per partition — mirrors the reference's own window test
    (DirectExecSuite.scala:94-101)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rank_in_nation"),
        )
        .filter(F.col("rank_in_nation") <= 3)
        .orderBy("c_nationkey", "rank_in_nation")
    )


WINDOW_ROW_NUMBER_ORACLE = """
SELECT * FROM (
  SELECT c_custkey, c_nationkey, c_acctbal,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT)
           AS rank_in_nation
  FROM customer
) WHERE rank_in_nation <= 3
ORDER BY c_nationkey, rank_in_nation
"""


def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        p.select(
            "p_partkey",
            "p_brand",
            F.rank().over(w).cast("long").alias("price_rank"),
            F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
            F.ntile(4).over(w).cast("long").alias("price_quartile"),
        )
        .orderBy("p_brand", "price_rank", "p_partkey")
    )


WINDOW_RANK_ORACLE = """
SELECT p_partkey, p_brand,
       CAST(RANK()       OVER w AS BIGINT) AS price_rank,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS price_dense_rank,
       CAST(NTILE(4)     OVER w AS BIGINT) AS price_quartile
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
ORDER BY p_brand, price_rank, p_partkey
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset frames (reference: OffsetWindowFunction path,
    WindowDirectExecBase.scala:140-154)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.first("o_orderdate").over(w).alias("first_order_date"),
    ).orderBy("o_orderkey")


WINDOW_LAG_LEAD_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderdate,
       LAG(o_totalprice, 1)  OVER w AS prev_price,
       LEAD(o_totalprice, 1) OVER w AS next_price,
       FIRST_VALUE(o_orderdate) OVER w AS first_order_date
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_orderkey
"""


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving frame (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) — the
    reference's 'Moving' frame family (WindowDirectExecBase.scala:182-233).
    Exact-decimal sum / explicit count keeps the double deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        (
            F.sum(F.col("o_totalprice").cast(DEC_PRICE)).over(w).cast(DEC_OUT).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_price"),
    ).orderBy("o_orderkey")


WINDOW_MOVING_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w, 2) AS DECIMAL(24,2)) AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering — counts parts within ±5 of each
    part's size (reference: Range bounds, WindowDirectExecBase.scala:67-117)."""
    p = load_table(spark, sf_dir, "part")
    w = W.orderBy("p_size").rangeBetween(-5, 5)
    return p.select(
        "p_partkey",
        "p_size",
        F.count(F.lit(1)).over(w).alias("n_similar_size"),
    ).orderBy("p_partkey")


WINDOW_RANGE_ORACLE = """
SELECT p_partkey, p_size,
       COUNT(*) OVER (ORDER BY p_size RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)
         AS n_similar_size
FROM part ORDER BY p_partkey
"""


def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with an INTERVAL bound over a timestamp ordering —
    trailing 30-day order volume per customer (reference: date/timestamp
    range frames via DateAdd/TimeAdd, WindowDirectExecBase.scala:97-102).
    Interval frames are SQL-surface-only in Spark (DataFrame rangeBetween
    takes numerics), so this also exercises the spark.sql path."""
    from direct_spark_sql_spark.plans.base import sql_query

    return sql_query(
        spark, sf_dir,
        """
        SELECT o_orderkey, o_custkey,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER
                    (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                    AS DECIMAL(24,2)) AS DOUBLE) AS trailing_30d_volume
        FROM orders ORDER BY o_orderkey
        """,
    )


WINDOW_RANGE_INTERVAL_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2)
            AS DECIMAL(24,2)) AS DOUBLE) AS trailing_30d_volume
FROM orders ORDER BY o_orderkey
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growing frame (UNBOUNDED PRECEDING .. CURRENT ROW)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(DEC_PRICE)).over(w).cast(DEC_OUT).cast("double").alias("running_total"),
    ).orderBy("o_orderkey")


WINDOW_RUNNING_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DECIMAL(24,2)) AS DOUBLE) AS running_total
FROM orders ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (reference: SortDirectExec, directLimit.scala).
# ---------------------------------------------------------------------------

def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProjectExec (reference:
    TakeOrderedAndProjectDirectExec, directLimit.scala:33-64) — a bounded
    priority queue per partition then a driver merge; never a full sort."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .limit(10)
    )


SORT_TOPK_ORACLE = """
SELECT c_custkey, c_name, c_acctbal FROM customer
ORDER BY c_acctbal DESC, c_custkey LIMIT 10
"""


def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select("s_suppkey", "s_nationkey", "s_acctbal").orderBy(
        "s_nationkey", F.desc("s_acctbal"), "s_suppkey"
    )


SORT_MULTI_ORACLE = """
SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
ORDER BY s_nationkey, s_acctbal DESC, s_suppkey
"""


# ---------------------------------------------------------------------------
# Set operations (reference: UnionDirectExec; INTERSECT/EXCEPT via Catalyst
# rewrite to semi/anti joins — SURVEY.md §2.7).
# ---------------------------------------------------------------------------

def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


SET_UNION_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.union(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )


SET_UNION_ALL_ORACLE = """
SELECT nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier
) GROUP BY nationkey ORDER BY nationkey
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


SET_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


SET_EXCEPT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""


# ---------------------------------------------------------------------------
# Generators / lateral view (reference: GenerateDirectExec.scala:53-116,
# test: LATERAL VIEW explode(split(...)) DirectExecSuite.scala:46-58).
# ---------------------------------------------------------------------------

def lateral_view_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word frequency via explode(split()) — documents are space-separated
    lowercase words, so a single-space split is identical across engines."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


LATERAL_VIEW_ORACLE = """
SELECT word, COUNT(*) AS n FROM (
  SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents
) WHERE LENGTH(word) > 0
GROUP BY word ORDER BY n DESC, word LIMIT 20
"""


def explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode over the embedding arrays (ordinal-preserving generate)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select("vec_id", F.col("pos").cast("long").alias("pos"),
                F.round(F.col("val").cast("double"), 6).alias("val"))
        .orderBy("vec_id", "pos")
    )


POSEXPLODE_ORACLE = """
SELECT vec_id, CAST(pos - 1 AS BIGINT) AS pos, ROUND(CAST(val AS DOUBLE), 6) AS val
FROM (
  SELECT vec_id, UNNEST(embedding) AS val,
         GENERATE_SUBSCRIPTS(embedding, 1) AS pos
  FROM embeddings WHERE vec_id < 10
)
ORDER BY vec_id, pos
"""


# ---------------------------------------------------------------------------
# Scalar subquery (superset: the reference rejects these,
# DirectPlanConverter.scala:34-47) + one-row relation + CASE/COALESCE.
# ---------------------------------------------------------------------------

def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from direct_spark_sql_spark.plans.base import sql_query

    return sql_query(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE)
                                  / COUNT(*) FROM customer)
        ORDER BY c_custkey
        """,
    )


SCALAR_SUBQUERY_ORACLE = """
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE)
                          / COUNT(*) FROM customer)
ORDER BY c_custkey
"""


def one_row_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT without FROM (reference: RDDScanDirectExec / OneRowRelation,
    test DirectExecSuite.scala:152-157)."""
    return spark.sql("SELECT 1 AS m, 'a' AS n, CAST(2.5 AS DOUBLE) AS p")


ONE_ROW_ORACLE = "SELECT 1 AS m, 'a' AS n, CAST(2.5 AS DOUBLE) AS p"


def sql_parameterized_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with IDENTIFIER() indirection — the injection-
    safe templating surface (table AND column supplied as named
    parameters, a value parameter in the predicate) a multi-tenant SQL
    service builds on; the reference's string-in/sqlDirectly posture
    makes this its natural hardening.  The oracle is simply the resolved
    query text."""
    from direct_spark_sql_spark.plans.base import register_star_schema

    register_star_schema(spark, sf_dir)
    return spark.sql(
        """
        SELECT IDENTIFIER(:flagcol) AS flag,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
               CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
        FROM IDENTIFIER(:tbl)
        WHERE l_quantity >= :qmin
        GROUP BY flag ORDER BY flag
        """,
        args={"flagcol": "l_returnflag", "tbl": "lineitem", "qmin": 30},
    )


PARAM_IDENTIFIER_ORACLE = """
SELECT l_returnflag AS flag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem
WHERE l_quantity >= 30
GROUP BY flag ORDER BY flag
"""


def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 200000, "large")
            .when(F.col("o_totalprice") > 100000, "medium")
            .otherwise("small")
            .alias("size_class"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
                "status_label"
            ),
        )
        .groupBy("size_class", "status_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("size_class", "status_label")
    )


CONDITIONAL_ORACLE = """
SELECT CASE WHEN o_totalprice > 200000 THEN 'large'
            WHEN o_totalprice > 100000 THEN 'medium'
            ELSE 'small' END AS size_class,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
       COUNT(*) AS n
FROM orders GROUP BY size_class, status_label ORDER BY size_class, status_label
"""


# ---------------------------------------------------------------------------
# String / date expression surface (reference inherits the whole Spark
# FunctionRegistry — SURVEY.md §2.9; these pin the common subset).
# ---------------------------------------------------------------------------

def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.lower("c_mktsegment").alias("lower_seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.col("c_name").like("%1%").alias("has_one"),
    ).orderBy("c_custkey")


STRING_FN_ORACLE = """
SELECT c_custkey,
       UPPER(c_name) AS upper_name,
       LOWER(c_mktsegment) AS lower_seg,
       SUBSTRING(c_name, 1, 8) AS name_prefix,
       CAST(LENGTH(c_name) AS BIGINT) AS name_len,
       CONCAT_WS('-', c_mktsegment, c_name) AS seg_name,
       c_name LIKE '%1%' AS has_one
FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.to_date("o_orderdate").alias("order_date"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
    ).orderBy("o_orderkey")


DATE_FN_ORACLE = """
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS order_day,
       CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS order_quarter,
       CAST(o_orderdate AS DATE) AS order_date,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 30 DAY AS due_ts,
       CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_sec
FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Batch time-window aggregation over the events table (reference resolves
# TimeWindowing on batch data — SURVEY.md §2.11; streaming twin lives in
# direct_spark_sql_spark.streaming).
# ---------------------------------------------------------------------------

def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via F.window; window.start ≡ date_trunc."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC_PRICE)).cast(DEC_OUT).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


EVENTS_TUMBLING_ORACLE = """
SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) AS total_value
FROM events GROUP BY window_start, event_type ORDER BY window_start, event_type
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props column (get_json_object)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        )
        .filter(F.col("k_value") >= 50)
        .orderBy("event_id")
    )


EVENTS_JSON_ORACLE = """
SELECT event_id, CAST(props ->> 'k' AS BIGINT) AS k_value
FROM events WHERE CAST(props ->> 'k' AS BIGINT) >= 50
ORDER BY event_id
"""


#: Coarse time-chunk width for the two-phase sessionizer below.  Must be
#: >= the 1800 s session gap (a session break inside a chunk is decided
#: locally); 1 hour bounds a hot user's per-partition rows at
#: events-per-hour instead of events-per-user — the difference between a
#: bot user serializing one executor and spreading over 8760 chunks/year.
SESSION_CHUNK_SECONDS = 3600


def events_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (new session after a 30-minute gap), two-phase so a
    hot user never serializes into one window partition:

    1. LOCAL sessionize within (user_id, hour-chunk) — lag + cumsum, but
       the window partition is bounded by one hour of one user's events,
       not the user's lifetime; collapse to per-local-session summaries
       (n_events, first_ts, last_ts) on the same exchange;
    2. STITCH the summaries: one window per user over local sessions
       (<= events-per-hour-granularity rows — a dense bot collapses to
       ~1 row per chunk), where two adjacent local sessions merge iff
       the boundary gap is <= 1800 s.  In-chunk neighbours carry a
       >1800 s gap by construction, so the same lag test covers both
       cases with no special-casing; cumsum of the no-merge flag then
       reproduces the global session numbering exactly.

    Output is row-identical to the single-window lag+cumsum formulation
    (the oracle keeps that form); only the partitioning changed.  The r6
    skew probe measured the one-window plan at 4.52x under a 10%-hot-key
    zipf — this shape bounds any user's sort at one chunk's events, and
    the big table takes ONE exchange, same as the naive plan."""
    e = load_table(spark, sf_dir, "events")
    chunk = F.floor(F.unix_timestamp("ts") / SESSION_CHUNK_SECONDS)
    ev = e.select("user_id", "event_id", "ts", chunk.alias("chunk"))
    wc = W.partitionBy("user_id", "chunk").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(wc))
    loc_flag = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    loc = ev.withColumn(
        "loc_seq",
        F.sum(loc_flag).over(wc.rowsBetween(W.unboundedPreceding, 0)),
    )
    locsess = loc.groupBy("user_id", "chunk", "loc_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    ws = W.partitionBy("user_id").orderBy("chunk", "loc_seq")
    bgap = F.unix_timestamp("first_ts") - F.unix_timestamp(
        F.lag("last_ts", 1).over(ws)
    )
    new_flag = F.when(bgap.isNull() | (bgap > 1800), 1).otherwise(0)
    stitched = locsess.withColumn(
        "session_seq",
        F.sum(new_flag).over(ws.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    return (
        stitched.groupBy("user_id", "session_seq")
        .agg(F.sum("n_events").cast("long").alias("n_events"))
        .orderBy("user_id", "session_seq")
    )


EVENTS_SESSIONS_ORACLE = """
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN EPOCH(ts) - EPOCH(LAG(ts, 1) OVER w) > 1800
                OR LAG(ts, 1) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, event_id,
         CAST(SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM marked
)
SELECT user_id, session_seq, COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_seq ORDER BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# Nested types: array construction/manipulation and struct access (inside
# queries the reference inherits the full Catalyst type system — SURVEY.md
# §1.2; the rebuild exercises it explicitly).
# ---------------------------------------------------------------------------

def nested_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order sorted quantity array: size, first/last element, a joined
    string egress, and a (min,max) struct unpacked to columns."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    per_order = l.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(F.col("l_quantity").cast("int"))).alias("qtys")
    )
    return (
        per_order.select(
            "l_orderkey",
            F.size("qtys").cast("long").alias("n_items"),
            F.element_at("qtys", 1).alias("min_qty"),
            F.element_at("qtys", -1).alias("max_qty"),
            F.array_join(F.transform("qtys", lambda x: x.cast("string")), ",").alias("qty_list"),
            F.size(F.array_distinct("qtys")).cast("long").alias("n_distinct"),
            F.size(F.filter("qtys", lambda x: x >= 25)).cast("long").alias("n_high"),
        )
        .orderBy("l_orderkey")
    )


NESTED_ARRAY_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey,
         list_sort(array_agg(CAST(l_quantity AS INTEGER))) AS qtys
  FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(qtys) AS BIGINT) AS n_items,
       qtys[1] AS min_qty,
       qtys[-1] AS max_qty,
       array_to_string(qtys, ',') AS qty_list,
       CAST(len(list_distinct(qtys)) AS BIGINT) AS n_distinct,
       CAST(len(list_filter(qtys, x -> x >= 25)) AS BIGINT) AS n_high
FROM per_order ORDER BY l_orderkey
"""


def nested_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map built from grouped keys (status → count per priority) read back
    via element_at; struct round-trip."""
    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("o_orderpriority")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("o_orderstatus", "cnt")))
            ).alias("status_counts")
        )
    )
    return counts.select(
        "o_orderpriority",
        F.element_at("status_counts", "F").alias("n_f"),
        F.element_at("status_counts", "O").alias("n_o"),
        F.element_at("status_counts", "P").alias("n_p"),
    ).orderBy("o_orderpriority")


NESTED_MAP_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Statistical aggregates via exact-decimal moment sums.  Builtin stddev/corr
# accumulate in floating point (order-dependent, engine-dependent); the
# two-pass moment formulas below use exact decimal Σx, Σx², Σxy, so both
# engines compute identical doubles from identical operands.
# ---------------------------------------------------------------------------

def agg_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / mean from exact decimal moment sums.

    The variance NUMERATOR n·Σx² − (Σx)² is computed ENTIRELY IN DECIMAL
    and cast to double only for the final division (round 12): evaluated
    in doubles, `a*b - c*d` is exactly the shape compilers contract into
    a fused multiply-add, and DuckDB's compiled C++ fuses while the JVM
    does not — a 1-ULP divergence invisible at sf0.01 that the first
    sf0.1 sweep caught on this very query.  With an exact-integer-valued
    numerator, what remains in floating point is one divide and one sqrt
    — single IEEE operations, bit-identical on any engine.

    Digit budget (exact up to per-group n ≤ 1e8, |x| ≤ 1e4 with 2 dp):
    s1 ≤ 1e12 → DECIMAL(17,2): the square types as (35,4) — under Spark's 38 cap so no silent scale reduction, and product width 34 puts DuckDB on its INT128 multiply path (a 13-digit operand fits the value but DuckDB's int64 product overflows; 19 digits squares past Spark's cap and loses a scale digit); s2 ≤ 1e16 at 4 dp →
    (21,4), n·s2 → (31,4); numerator → (32,4) — all under 38 in both
    engines' width rules.  Beyond the envelope the decimals overflow
    LOUDLY (NULL/error, a differential mismatch) instead of silently
    drifting."""
    c = load_table(spark, sf_dir, "customer")
    x = F.col("c_acctbal").cast(DEC_PRICE)
    n = F.count(F.lit(1)).cast("double")
    nd = F.count(F.lit(1)).cast("decimal(9,0)")
    # cents egress (numeric lint, r13): Σx has exactly 2 dp, so the old
    # scale-6 funnel carried no extra precision but shrank the 2^53
    # bit-identical window 1e4× (to ~9e5 rows/group at |x| ≤ 1e4).
    s1 = F.sum(x).cast(DEC_OUT).cast("double")
    s1d = F.sum(x).cast("decimal(17,2)")
    s2d = F.sum((x * x).cast("decimal(28,4)")).cast("decimal(21,4)")
    # round the exact numerator to INTEGER units before the double
    # cast: at sf0.1 it carries 18 significant digits, past the
    # 15-digit window where decimal->double casts are bit-identical
    # across engines (plans/base.py); at scale 0 it stays under 2^53
    # for n*var <= 9e15 (n ~ 9e8 at acctbal variance), exact in both
    num = (nd * s2d - s1d * s1d).cast("decimal(20,0)").cast("double")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (num / (n * (n - F.lit(1.0)))).alias("var_samp"),
            F.sqrt(num / (n * (n - F.lit(1.0)))).alias("stddev_samp"),
            (s1 / n).alias("mean"),
        )
        .orderBy("c_mktsegment")
    )


AGG_MOMENT_ORACLE = """
WITH m AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS DOUBLE) AS n,
         COUNT(*) AS n_out,
         CAST(COUNT(*) AS DECIMAL(9,0)) AS nd,
         CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DECIMAL(17,2)) AS s1d,
         CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(14,2)) * CAST(c_acctbal AS DECIMAL(14,2)) AS DECIMAL(28,4))) AS DECIMAL(21,4)) AS s2d
  FROM customer GROUP BY c_mktsegment
),
m2 AS (
  SELECT *, CAST(CAST(ROUND(nd * s2d - CAST(s1d AS DECIMAL(19,2)) * CAST(s1d AS DECIMAL(19,2)), 0) AS DECIMAL(20,0)) AS DOUBLE) AS num FROM m
)
SELECT c_mktsegment, n_out AS n,
       num / (n * (n - 1.0)) AS var_samp,
       sqrt(num / (n * (n - 1.0))) AS stddev_samp,
       s1 / n AS mean
FROM m2 ORDER BY c_mktsegment
"""


def _corr_moment_cols():
    """Shared exact-decimal Pearson/regression moments (round 12, the
    FMA-divergence class the first sf0.1 sweep exposed on
    agg_moment_stats): every ``a·b − c·d`` numerator/denominator is
    computed ENTIRELY IN DECIMAL and cast to double only once — what
    remains in floating point is divisions, sqrts, and standalone
    multiplies, single IEEE operations no compiler can contract.

    The price column is rescaled to 1e-4 units FIRST (an exact decimal
    multiply by 0.0001, both engines): in raw units n·Σy² − (Σy)²
    reaches 3.6e19 at sf0.1 — past the 2^53 window where decimal→double
    casts are bit-identical across engines (plans/base.py), so the old
    form was one unlucky dataset from a 1-ULP hash mismatch even with
    integer moments.  The rescale cancels exactly in the dimensionless
    corr/r² and is multiplied back through slope/intercept with exact
    powers of ten.  Digit budget (hash-exact per group): all three
    centered second moments stay under 2^53 through ~30× the sf0.1
    group sizes (num ≈ 3.7e12 unscaled at sf0.1, ×~n² growth); beyond
    that, rescale x as well.

    Returns (n_double, n_long, num_s, dxx, dyy0) Spark columns where
    corr = num_s / (sqrt(dxx)·sqrt(dyy0)), slope = 1e4·num_s/dxx."""
    x = F.col("l_quantity").cast(DEC_QTY)
    y = F.col("l_extendedprice").cast(DEC_PRICE)
    ys = (y * F.lit("0.0001").cast("decimal(5,4)")).cast("decimal(8,6)")
    nd = F.count(F.lit(1)).cast("decimal(9,0)")
    sx = F.round(F.sum(x), 0).cast("decimal(14,0)")
    sy_s = F.round(F.sum(ys), 3).cast("decimal(14,3)")
    sxx = F.round(F.sum((x * x).cast("decimal(28,4)")), 0).cast("decimal(16,0)")
    syy_s = F.round(F.sum(ys * ys), 3).cast("decimal(16,3)")
    sxy_s = F.round(F.sum(x * ys), 3).cast("decimal(16,3)")
    num_s = (nd * sxy_s - sx * sy_s).cast("double")
    dxx = (nd * sxx - sx * sx).cast("double")
    dyy0 = F.round(nd * syy_s - sy_s * sy_s, 0).cast("decimal(20,0)").cast("double")
    return (
        F.count(F.lit(1)).cast("double"),
        F.count(F.lit(1)),
        num_s,
        dxx,
        dyy0,
        sx.cast("double"),
        sy_s.cast("double"),
    )


#: DuckDB twin of _corr_moment_cols — identical cast/round chain.
_CORR_MOMENT_CTE = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS n_out,
         CAST(COUNT(*) AS DECIMAL(9,0)) AS nd,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 0) AS DECIMAL(14,0)) AS sx,
         CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(0.0001 AS DECIMAL(5,4)) AS DECIMAL(8,6))), 3) AS DECIMAL(14,3)) AS sy_s,
         CAST(ROUND(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(28,4))), 0) AS DECIMAL(16,0)) AS sxx,
         CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(0.0001 AS DECIMAL(5,4)) AS DECIMAL(8,6)) * CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(0.0001 AS DECIMAL(5,4)) AS DECIMAL(8,6))), 3) AS DECIMAL(16,3)) AS syy_s,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(0.0001 AS DECIMAL(5,4)) AS DECIMAL(8,6))), 3) AS DECIMAL(16,3)) AS sxy_s
  FROM lineitem GROUP BY l_returnflag
),
m2 AS (
  -- every product casts one operand to width >= 19: DuckDB's int64
  -- multiply path caps the RESULT at DECIMAL(18) and overflow-errors,
  -- regardless of the algebraic width (seen at sf0.1, round 12)
  SELECT l_returnflag, n, n_out,
         CAST(CAST(nd AS DECIMAL(19,0)) * sxy_s
              - CAST(sx AS DECIMAL(19,0)) * sy_s AS DOUBLE) AS num_s,
         CAST(CAST(nd AS DECIMAL(19,0)) * sxx
              - CAST(sx AS DECIMAL(19,0)) * sx AS DOUBLE) AS dxx,
         CAST(CAST(ROUND(CAST(nd AS DECIMAL(19,0)) * syy_s
                         - CAST(sy_s AS DECIMAL(19,3)) * sy_s, 0)
              AS DECIMAL(20,0)) AS DOUBLE) AS dyy0,
         CAST(sx AS DOUBLE) AS sxd,
         CAST(sy_s AS DOUBLE) AS sy_sd
  FROM m
)
"""


def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity and extended price per return
    flag, from exact decimal moment sums (see _corr_moment_cols for the
    round-12 FMA/2^53 hardening; the 1e-4 price rescale cancels exactly
    in the dimensionless correlation)."""
    l = load_table(spark, sf_dir, "lineitem")
    n, n_out, num_s, dxx, dyy0, _, _ = _corr_moment_cols()
    corr = num_s / (F.sqrt(dxx) * F.sqrt(dyy0))
    return (
        l.groupBy("l_returnflag")
        .agg(n_out.alias("n"), corr.alias("qty_price_corr"))
        .orderBy("l_returnflag")
    )


AGG_CORR_ORACLE = _CORR_MOMENT_CTE + """
SELECT l_returnflag, n_out AS n,
       num_s / (sqrt(dxx) * sqrt(dyy0)) AS qty_price_corr
FROM m2 ORDER BY l_returnflag
"""


def events_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup reuse: daily totals computed FROM the hourly
    rollup (sum of sums), not from raw events.  The oracle aggregates the
    raw events directly, so the test proves the reuse is lossless — the
    property that lets a warehouse serve coarse queries from materialized
    fine-grained aggregates.  Sums stay in exact decimal between levels
    (rounding per level would break the equivalence)."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC_PRICE)).alias("value_dec"),
        )
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour_start").alias("day_start"), "event_type"
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_dec").cast(DEC_OUT).cast("double").alias("total_value"),
        )
        .orderBy("day_start", "event_type")
    )


EVENTS_ROLLUP_ORACLE = """
SELECT DATE_TRUNC('day', ts) AS day_start, event_type,
       COUNT(*) AS n_events,
       CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(14,2))), 2) AS DECIMAL(24,2)) AS DOUBLE) AS total_value
FROM events GROUP BY day_start, event_type ORDER BY day_start, event_type
"""


QUERIES = [
    Query("join_inner", join_inner, JOIN_INNER_ORACLE, ("join",)),
    Query("join_left_outer", join_left_outer, JOIN_LEFT_ORACLE, ("join",)),
    Query("join_right_outer", join_right_outer, JOIN_RIGHT_ORACLE, ("join",)),
    Query("join_full_outer", join_full_outer, JOIN_FULL_ORACLE, ("join",)),
    Query("join_semi", join_semi, JOIN_SEMI_ORACLE, ("join",)),
    Query("join_anti", join_anti, JOIN_ANTI_ORACLE, ("join",)),
    Query("join_existence_in", join_existence_in, JOIN_EXISTENCE_ORACLE, ("join", "subquery")),
    Query("join_nonequi_range", join_nonequi_range, JOIN_NONEQUI_ORACLE, ("join",)),
    Query("join_cross", join_cross, JOIN_CROSS_ORACLE, ("join",)),
    Query("agg_group_stats", agg_group_stats, AGG_GROUP_ORACLE, ("agg",)),
    Query("agg_count_distinct", agg_count_distinct, AGG_DISTINCT_ORACLE, ("agg",)),
    Query("agg_empty_input", agg_empty_input, AGG_EMPTY_ORACLE, ("agg",)),
    Query("agg_collect_sorted", agg_collect_sorted, AGG_COLLECT_ORACLE, ("agg",)),
    Query("agg_grouping_sets", agg_grouping_sets, AGG_GROUPING_SETS_ORACLE, ("agg",)),
    Query("agg_rollup", agg_rollup, AGG_ROLLUP_ORACLE, ("agg",)),
    Query("agg_cube", agg_cube, AGG_CUBE_ORACLE, ("agg",)),
    Query("agg_pivot_manual", agg_pivot_manual, AGG_PIVOT_ORACLE, ("agg",)),
    Query("window_row_number", window_row_number, WINDOW_ROW_NUMBER_ORACLE, ("window",)),
    Query("window_rank_dense", window_rank_dense, WINDOW_RANK_ORACLE, ("window",)),
    Query("window_lag_lead", window_lag_lead, WINDOW_LAG_LEAD_ORACLE, ("window",)),
    Query("window_moving_avg", window_moving_avg, WINDOW_MOVING_ORACLE, ("window",)),
    Query("window_range_frame", window_range_frame, WINDOW_RANGE_ORACLE, ("window",)),
    Query("window_range_interval", window_range_interval, WINDOW_RANGE_INTERVAL_ORACLE,
          ("window",), doc="interval RANGE frame on timestamp ordering"),
    Query("window_running_total", window_running_total, WINDOW_RUNNING_ORACLE, ("window",)),
    Query("sort_topk", sort_topk, SORT_TOPK_ORACLE, ("sort",)),
    Query("sort_multi_key", sort_multi_key, SORT_MULTI_ORACLE, ("sort",)),
    Query("set_union_distinct", set_union_distinct, SET_UNION_ORACLE, ("setop",)),
    Query("set_union_all", set_union_all, SET_UNION_ALL_ORACLE, ("setop",)),
    Query("set_intersect", set_intersect, SET_INTERSECT_ORACLE, ("setop",)),
    Query("set_except", set_except, SET_EXCEPT_ORACLE, ("setop",)),
    Query("lateral_view_explode", lateral_view_explode, LATERAL_VIEW_ORACLE, ("generate",)),
    Query("explode_posexplode", explode_posexplode, POSEXPLODE_ORACLE, ("generate",)),
    Query("scalar_subquery", scalar_subquery, SCALAR_SUBQUERY_ORACLE, ("subquery",)),
    Query("one_row_relation", one_row_relation, ONE_ROW_ORACLE, ("misc",)),
    Query("sql_parameterized_identifier", sql_parameterized_identifier,
          PARAM_IDENTIFIER_ORACLE, ("misc", "sql"),
          doc="parameterized SQL + IDENTIFIER() indirection: table and "
              "column as named parameters, value parameter in the "
              "predicate — the injection-safe templating surface"),
    Query("conditional_case", conditional_case, CONDITIONAL_ORACLE, ("expr",)),
    Query("string_functions", string_functions, STRING_FN_ORACLE, ("expr",)),
    Query("date_functions", date_functions, DATE_FN_ORACLE, ("expr",)),
    Query("events_tumbling_window", events_tumbling_window, EVENTS_TUMBLING_ORACLE,
          ("events", "window"), bench=True),
    Query("events_json_extract", events_json_extract, EVENTS_JSON_ORACLE, ("events",)),
    Query("events_user_sessions", events_user_sessions, EVENTS_SESSIONS_ORACLE,
          ("events", "window"), bench=True),
    Query("nested_array_ops", nested_array_ops, NESTED_ARRAY_ORACLE, ("nested",)),
    Query("nested_map_struct", nested_map_struct, NESTED_MAP_ORACLE, ("nested",)),
    Query("agg_moment_stats", agg_moment_stats, AGG_MOMENT_ORACLE, ("agg", "stats")),
    Query("agg_correlation", agg_correlation, AGG_CORR_ORACLE, ("agg", "stats")),
    Query("events_rollup_reuse", events_rollup_reuse, EVENTS_ROLLUP_ORACLE,
          ("events", "agg"), doc="daily from hourly rollup — lossless reuse"),
]
