"""Numeric-hazard lint (VERDICT r12 #2): codify the cents/2^53 funnel
discipline so a new query can't silently reintroduce the class the
sf1-equivalent probe caught on Q1's sum_charge (decimal→double 1-ULP
divergence past 2^53).

Three planted-red cases prove each rule fires; the registry walks prove
both the DuckDB oracle texts and the analyzed Spark plans are clean.
Rule definitions and the exemption rationale live in
direct_spark_sql_spark/tools/numeric_lint.py.
"""

from __future__ import annotations

import pytest

from direct_spark_sql_spark.plans.registry import all_queries
from direct_spark_sql_spark.tools.numeric_lint import (
    ALLOWLIST,
    lint_oracle,
    lint_spark_plan,
    lint_text,
)
from tests.conftest import SF_DIR

QUERIES = all_queries()


# ---------------------------------------------------------------------------
# Planted hazards: each rule must go red on the exact pattern it exists for.
# ---------------------------------------------------------------------------

def test_red_on_sum_over_raw_double():
    sql = "SELECT l_returnflag, SUM(l_extendedprice) AS s FROM lineitem GROUP BY 1"
    f = lint_text(sql)
    assert any("(a)" in x for x in f), f


def test_red_on_scale6_money_egress():
    # the literal pre-r12 Q1 shape the cents fix removed
    sql = (
        "SELECT CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))"
        " * CAST(1 - CAST(l_discount AS DECIMAL(7,4)) AS DECIMAL(8,4))), 6)"
        " AS DECIMAL(24,6)) AS DOUBLE) AS sum_charge FROM lineitem"
    )
    f = lint_text(sql)
    assert any("(b)" in x and "scale 6" in x for x in f), f


def test_red_on_sum_over_double_cast():
    sql = "SELECT SUM(CAST(o_totalprice AS DOUBLE)) AS s FROM orders"
    f = lint_text(sql)
    assert any("(c)" in x for x in f), f
    # Spark analyzed-plan spelling of the same hazard
    plan = "Aggregate [sum(cast(o_totalprice#12 as double)) AS s#44]"
    f2 = lint_text(plan)
    assert any("(c)" in x for x in f2), f2


def test_green_on_house_funnels():
    """The canonical cents funnel and an exact-decimal intermediate at
    scale 4 (kept decimal, egressed at scale 0) must NOT flag."""
    ok1 = (
        "SELECT CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 2)"
        " AS DECIMAL(24,2)) AS DOUBLE) AS revenue FROM lineitem"
    )
    ok2 = (
        "SELECT CAST(CAST(ROUND(nd * s2d - s1d * s1d, 0) AS DECIMAL(20,0))"
        " AS DOUBLE) AS num FROM (SELECT CAST(SUM(CAST(c_acctbal AS"
        " DECIMAL(14,2)) * CAST(c_acctbal AS DECIMAL(14,2))) AS DECIMAL(21,4))"
        " AS s2d, 1 AS nd, 1 AS s1d)"
    )
    ok3 = "SELECT SUM(l_quantity) AS q FROM lineitem"  # integral-by-generation
    assert lint_text(ok1) == []
    assert lint_text(ok2) == []
    assert lint_text(ok3) == []


# ---------------------------------------------------------------------------
# Registry walks.
# ---------------------------------------------------------------------------

def test_registry_oracles_clean():
    bad = {}
    for q in QUERIES:
        if q.oracle is None:
            continue
        f = lint_oracle(q.name, q.oracle)
        if f:
            bad[q.name] = f
    assert not bad, bad


def test_allowlist_entries_reference_real_queries():
    names = {q.name for q in QUERIES}
    stale = set(ALLOWLIST) - names
    assert not stale, f"allowlist names no longer registered: {stale}"


@pytest.mark.parametrize("query", QUERIES, ids=[q.name for q in QUERIES])
def test_spark_analyzed_plan_clean(query, spark):
    """The Spark side of every registered query — analyzed (pre-optimizer)
    plan text, where aggregate expressions and casts are printed — must
    carry no hazard either: the oracle and the engine drift independently."""
    df = query.spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().analyzed().toString()
    f = lint_spark_plan(query.name, plan)
    assert not f, f
