"""Bucketed-table co-located join: the pre-shuffle strategy for repeated
big-table joins at scale (SURVEY.md build plan: "bucketing for co-located
joins").  Writing both sides bucketed by the join key lets Spark's
sort-merge join read buckets 1:1 with NO exchange on either side —
the shuffle is paid once at write time, then amortized over every
subsequent join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from direct_spark_sql_spark.sources.registry import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    l = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    for name, df, key in (("b_orders", o, "o_orderkey"), ("b_lineitem", l, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(base / name))
            .saveAsTable(name)
        )
    yield "b_orders", "b_lineitem"
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_t, lineitem_t = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(lineitem_t).join(
            spark.table(orders_t),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not shuffle either side:\n" + plan
        )
        # and it is still correct
        expected = (
            load_table(spark, SF_DIR, "lineitem")
            .join(
                load_table(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_pruning_point_lookup(spark):
    """A point filter on the bucket key must prune to ONE bucket at scan
    time (SelectedBucketsCount: 1 out of N) — the bucketed-layout
    point-lookup payoff: 1/N of the files opened, no shuffle, no sort."""
    from direct_spark_sql_spark.plans.pipeline_ext import bucketed_order_lineitem
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    o, _ = bucketed_order_lineitem(spark, SF_DIR)
    # autoBucketedScan turns bucketed reading off for filter-only scans
    # (no distribution needed); force it on so bucket PRUNING applies.
    old_conf = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = o.filter(F.col("o_orderkey") == 7)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old_conf
        )
    assert "SelectedBucketsCount: 1 out of" in plan, plan[:1500]
