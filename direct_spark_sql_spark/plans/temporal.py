"""Temporal-join conformance queries (as-of, range) over events ⋈ orders.

The DuckDB oracle uses its native ``ASOF JOIN`` — an independent
implementation of the same semantics — so this is a true differential
check of the union-marker/window as-of algorithm in operators/joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from direct_spark_sql_spark.operators.joins import (
    asof_join,
    interval_join_binned,
    overlap_join_binned,
    range_join,
)
from direct_spark_sql_spark.plans.base import Query
from direct_spark_sql_spark.sources.registry import load_table


def _dedup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One order per (custkey, orderdate) — keep max orderkey — so the
    as-of match is deterministic on both engines.

    r13: ``max(struct(...))`` forced a SortAggregate (struct aggregation
    buffers aren't UnsafeRow-mutable), paying a per-partition sort on
    both the partial and final stages.  ``max(o_orderkey)`` +
    ``max_by(o_totalprice, o_orderkey)`` computes the same row — the
    struct compared on o_orderkey first and orderkeys are globally
    unique, so the price tiebreak could never engage; max_by's tie case
    is equally unreachable — with flat long/double buffers that
    hash-aggregate (the canonical_min_rows min_by precedent).  This is
    literally the oracle's own arg_max form (_DEDUP_ORDERS_SQL)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    return (
        o.groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )


_DEDUP_ORDERS_SQL = """
  SELECT o_custkey, o_orderdate,
         MAX(o_orderkey) AS o_orderkey,
         arg_max(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY o_custkey, o_orderdate
"""


def asof_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event enriched with the user's most recent order at event time."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _dedup_orders(spark, sf_dir).withColumnRenamed("o_custkey", "user_id")
    return asof_join(
        e, o, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
    ).orderBy("event_id")


ASOF_ORACLE = f"""
WITH od AS ({_DEDUP_ORDERS_SQL})
SELECT e.event_id, e.user_id, e.ts,
       od.o_orderkey, od.o_orderdate, od.o_totalprice
FROM events e
ASOF LEFT JOIN od
  ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
ORDER BY e.event_id
"""


def asof_event_order_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a tolerance window: matches older than the window null out
    (pandas merge_asof semantics).  8400 days splits the generated data
    (events are 2024, orders 1995-2001) into kept and nulled matches."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _dedup_orders(spark, sf_dir).withColumnRenamed("o_custkey", "user_id")
    return asof_join(
        e, o, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"], tolerance="8400 DAYS",
    ).orderBy("event_id")


ASOF_TOL_ORACLE = f"""
WITH od AS ({_DEDUP_ORDERS_SQL}),
m AS (
  SELECT e.event_id, e.user_id, e.ts, od.o_orderkey, od.o_orderdate
  FROM events e
  ASOF LEFT JOIN od
    ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
)
SELECT event_id, user_id, ts,
       CASE WHEN o_orderdate >= ts - INTERVAL 8400 DAY THEN o_orderkey END AS o_orderkey,
       CASE WHEN o_orderdate >= ts - INTERVAL 8400 DAY THEN o_orderdate END AS o_orderdate
FROM m ORDER BY event_id
"""


def range_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, how many of the same user's events fell in the
    preceding hour — a self range join where the user_id equality drives
    the hash join and the time bounds are the residual."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    a = e.alias("a")
    b = e.select(F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
    joined = range_join(
        a, b,
        on=F.col("a.user_id") == F.col("b_user"),
        lower=F.col("b_ts") >= F.col("a.ts") - F.expr("INTERVAL 1 HOUR"),
        upper=F.col("b_ts") < F.col("a.ts"),
    )
    return (
        joined.groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_recent_events"))
        .orderBy("event_id")
    )


RANGE_ORACLE = """
SELECT a.event_id, COUNT(*) AS n_recent_events
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts - INTERVAL 1 HOUR
 AND b.ts < a.ts
GROUP BY a.event_id
ORDER BY a.event_id
"""


def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-equi-key point-in-interval join at scale: every event that falls
    inside a 30-minute attention window opened by a purchase event, joined
    via time-bin hashing (operators/joins.py:interval_join_binned) instead
    of the nested loop the raw BETWEEN predicate would plan.  The oracle is
    the naive BETWEEN theta-join — same semantics, independent plan."""
    e = load_table(spark, sf_dir, "events")
    points = e.select("event_id", "user_id", "ts")
    windows = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
        )
    )
    joined = interval_join_binned(
        points, windows, "ts", "start_ts", "end_ts", bin_width="30 minutes"
    )
    return (
        joined.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.min("event_id").cast("long").alias("first_event_id"),
        )
        .orderBy("window_id")
    )


INTERVAL_BINNED_ORACLE = """
SELECT w.window_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT p.user_id) AS n_users,
       MIN(p.event_id) AS first_event_id
FROM (
  SELECT event_id AS window_id, ts AS start_ts,
         ts + INTERVAL 30 MINUTE AS end_ts
  FROM events WHERE event_type = 'purchase'
) w
JOIN events p
  ON p.ts >= w.start_ts AND p.ts <= w.end_ts
GROUP BY w.window_id
ORDER BY w.window_id
"""


def join_overlap_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join without an equi-key: error-burst
    windows [ts, ts+20min] overlapping purchase windows [ts, ts+30min],
    deduped by the first-common-bin guard (a filter, not a distinct).
    The oracle is the naive overlap theta-join."""
    e = load_table(spark, sf_dir, "events")
    errors = (
        e.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("ts").alias("e_start"),
            (F.col("ts") + F.expr("INTERVAL 20 MINUTES")).alias("e_end"),
        )
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("b_start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("b_end"),
        )
    )
    joined = overlap_join_binned(
        errors, purchases, "e_start", "e_end", "b_start", "b_end",
        bin_width="30 minutes",
    )
    return (
        joined.groupBy("err_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_overlapping"),
            F.min("buy_id").cast("long").alias("first_buy_id"),
        )
        .orderBy("err_id")
    )


OVERLAP_BINNED_ORACLE = """
WITH err AS (
  SELECT event_id AS err_id, ts AS e_start, ts + INTERVAL 20 MINUTE AS e_end
  FROM events WHERE event_type = 'error'
), buy AS (
  SELECT event_id AS buy_id, ts AS b_start, ts + INTERVAL 30 MINUTE AS b_end
  FROM events WHERE event_type = 'purchase'
)
SELECT err_id,
       COUNT(*) AS n_overlapping,
       MIN(buy_id) AS first_buy_id
FROM err JOIN buy
  ON e_start <= b_end AND b_start <= e_end
GROUP BY err_id
ORDER BY err_id
"""


QUERIES = [
    Query("asof_event_order", asof_event_order, ASOF_ORACLE,
          ("join", "temporal"), bench=True,
          doc="as-of join via union-marker + window (vs DuckDB ASOF JOIN)"),
    Query("asof_event_order_tolerance", asof_event_order_tolerance, ASOF_TOL_ORACLE,
          ("join", "temporal"), doc="as-of join with tolerance window"),
    Query("range_event_order", range_event_order, RANGE_ORACLE,
          ("join", "temporal"), doc="equi+range join residual"),
    Query("join_interval_binned", join_interval_binned, INTERVAL_BINNED_ORACLE,
          ("join", "temporal"),
          doc="no-key point-in-interval join via time-bin hashing (vs naive BETWEEN)"),
    Query("join_overlap_binned", join_overlap_binned, OVERLAP_BINNED_ORACLE,
          ("join", "temporal"),
          doc="no-key interval-overlap join via time bins + first-common-bin dedup"),
]
