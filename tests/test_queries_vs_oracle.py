"""Differential suite: every registered query with an oracle must match
DuckDB exactly (schema + row count + values).  This is the local twin of
the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from direct_spark_sql_spark.plans.registry import all_queries
from tests.conftest import SF_DIR, assert_matches_oracle

QUERIES = all_queries()


@pytest.mark.parametrize("query", QUERIES, ids=[q.name for q in QUERIES])
def test_query_matches_oracle(query, spark, oracle):
    df = query.spark_fn(spark, SF_DIR)
    if query.oracle is None:
        # rows-only check for non-SQL-expressible ops
        assert df.count() >= 0
        return
    assert_matches_oracle(df, oracle, query.oracle)
