"""Bucketed-layout lifecycle: the three entry states of
operators/layout.py::bucketed_table must all yield a catalog-registered
bucketed table whose joins plan shuffle-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from direct_spark_sql_spark.operators import layout as lo
from direct_spark_sql_spark.plans.pipeline_ext import bucketed_order_lineitem
from tests.conftest import SF_DIR


def _no_exchange_join_plan(spark, o, l) -> str:
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(o, l.l_orderkey == o.o_orderkey)
        return joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_reregister_existing_files_keeps_bucket_layout(spark):
    """Drop the catalog entries (external files survive), re-enter via the
    DDL-over-existing-files branch, and confirm both the row counts and
    the zero-exchange join plan are intact — this is the path a FRESH
    driver session takes over a warehouse written by an earlier one."""
    o, l = bucketed_order_lineitem(spark, SF_DIR)
    n_o, n_l = o.count(), l.count()
    for t in spark.catalog.listTables():
        if t.name.startswith("bkt_"):
            spark.sql(f"DROP TABLE {t.name}")
    o2, l2 = bucketed_order_lineitem(spark, SF_DIR)
    assert (o2.count(), l2.count()) == (n_o, n_l)
    plan = _no_exchange_join_plan(spark, o2, l2)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan


def test_bucketed_groupby_on_bucket_key_has_no_exchange(spark):
    """Bucketing also pre-distributes aggregation: groupBy on the bucket
    key needs no shuffle (partial+final collapse onto the bucket scan)."""
    _, l = bucketed_order_lineitem(spark, SF_DIR)
    agg = l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "groupBy(bucket key) must not shuffle"
