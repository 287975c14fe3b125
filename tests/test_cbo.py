"""Catalyst cost-based optimization: statistics-driven join reordering.

At 100 TB join ORDER is the difference between a plan that runs and one
that doesn't: joining the two small relations first (178 rows) before
touching the fact table beats the syntactic order that starts from
lineitem.  Spark does this automatically once table/column statistics
exist (`ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`) and CBO +
join reorder are enabled — this suite proves the engine path end to end:
stats land in the catalog, the optimizer annotates plans with row counts,
the join tree is genuinely reordered against the syntactic order, and
results are invariant to the optimizer's choice (CBO on == CBO off).

Run on a conf-scoped `newSession()` clone (the repo's standard isolation
pattern) against saved catalog tables in the gitignored warehouse dir.
"""

from __future__ import annotations

import pytest

from direct_spark_sql_spark.sources.registry import load_table
from tests.conftest import SF_DIR

_TABLES = ("lineitem", "orders", "customer", "nation")

_Q = """
SELECT n.n_name, count(*) AS cnt
FROM cbo_lineitem l
JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
JOIN cbo_customer c ON o.o_custkey = c.c_custkey
JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
ORDER BY n.n_name
"""


@pytest.fixture(scope="module")
def cbo_spark(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.conf.set("spark.sql.statistics.histogram.enabled", "true")
    for t in _TABLES:
        load_table(s, SF_DIR, t).write.mode("overwrite").saveAsTable(f"cbo_{t}")
        s.sql(f"ANALYZE TABLE cbo_{t} COMPUTE STATISTICS FOR ALL COLUMNS")
    yield s
    for t in _TABLES:
        s.sql(f"DROP TABLE IF EXISTS cbo_{t}")


def test_stats_land_in_catalog(cbo_spark):
    row = (
        cbo_spark.sql("DESCRIBE EXTENDED cbo_lineitem")
        .filter("col_name = 'Statistics'")
        .collect()
    )
    assert row and "rows" in row[0].data_type


def test_optimized_plan_carries_row_counts(cbo_spark):
    plan = cbo_spark.sql(_Q)._jdf.queryExecution().stringWithStats()
    assert "rowCount" in plan


def test_join_reordered_small_relations_first(cbo_spark):
    """The syntactic order starts from lineitem; with stats the optimizer
    must join customer x nation (the two smallest) before the fact table,
    i.e. the innermost join in the optimized tree is on c_nationkey."""
    plan = cbo_spark.sql(_Q)._jdf.queryExecution().optimizedPlan().toString()
    joins = [
        line for line in plan.splitlines() if "Join Inner" in line
    ]
    assert len(joins) == 3
    # the DEEPEST (last-listed, innermost) join must be the dimension join
    assert "n_nationkey" in joins[-1], plan
    # and the orderkey (fact-table) join must sit at the TOP of the tree
    assert "l_orderkey" in joins[0], plan


def test_cbo_results_invariant(cbo_spark, spark):
    """The optimizer's join order must not change the answer: run the
    identical query with CBO off on the base session's temp-view path."""
    with_cbo = [tuple(r) for r in cbo_spark.sql(_Q).collect()]
    base = spark.newSession()
    base.conf.set("spark.sql.cbo.enabled", "false")
    for t in _TABLES:
        load_table(base, SF_DIR, t).createOrReplaceTempView(f"cbo_{t}")
    without_cbo = [tuple(r) for r in base.sql(_Q).collect()]
    assert with_cbo == without_cbo and len(with_cbo) > 0
