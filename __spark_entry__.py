"""Driver contract for the spark-graft builder (PySpark target).

Everything is delegated to the package's central query registry
(``direct_spark_sql_spark.plans.registry``): one named entry per implemented
operator from SURVEY.md §2 plus the LLM-pipeline extensions, each paired
with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 shape: 6-way star join + agg) on sf0.001."""
    from direct_spark_sql_spark.plans.tpch import q5_local_supplier_volume

    return q5_local_supplier_volume(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + north-star ops).

    Iteration order rotates: the registry sorts entries so queries that have
    never appeared in a past ``CORRECTNESS_r*.json`` (or appeared longest
    ago) come first.  A driver that sweeps a bounded prefix per round will
    therefore cover the whole registry cumulatively across rounds instead of
    re-checking the same fixed subset.
    """
    from direct_spark_sql_spark.plans.registry import all_queries

    return {q.name: q.spark_fn for q in all_queries()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for the few
    non-SQL-expressible ops — driver records a rows-only check for those)."""
    from direct_spark_sql_spark.plans.registry import all_queries

    return {q.name: q.oracle for q in all_queries() if q.oracle is not None}
