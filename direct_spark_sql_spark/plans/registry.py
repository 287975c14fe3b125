"""Central query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract), ``tests/`` (differential suite)
and ``bench.py`` (headline set)."""

from __future__ import annotations

from direct_spark_sql_spark.plans.base import Query


def all_queries() -> list[Query]:
    # Imports are deferred so that a failure in one module (e.g. an optional
    # dependency) doesn't take down the whole registry.
    from direct_spark_sql_spark.plans import conformance, conformance_ext, tpch, tpch_extra

    queries: list[Query] = []
    queries += tpch.QUERIES
    queries += tpch_extra.QUERIES
    queries += conformance.QUERIES
    queries += conformance_ext.QUERIES

    from direct_spark_sql_spark.plans import temporal

    queries += temporal.QUERIES

    try:
        from direct_spark_sql_spark.plans import pipeline

        queries += pipeline.QUERIES
    except ImportError:  # pragma: no cover - optional module during build-out
        pass

    try:
        from direct_spark_sql_spark.plans import pipeline_ext

        queries += pipeline_ext.QUERIES
    except ImportError:  # pragma: no cover - optional module during build-out
        pass

    try:
        from direct_spark_sql_spark.plans import streaming

        queries += streaming.QUERIES
    except ImportError:  # pragma: no cover - optional module during build-out
        pass

    try:
        from direct_spark_sql_spark.plans import analytics

        queries += analytics.QUERIES
    except ImportError:  # pragma: no cover - optional module during build-out
        pass

    seen: set[str] = set()
    for q in queries:
        if q.name in seen:
            raise ValueError(f"duplicate query name: {q.name}")
        seen.add(q.name)
    return queries


QUERIES: dict[str, Query] = {q.name: q for q in all_queries()}
