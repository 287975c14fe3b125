from direct_spark_sql_spark.plans.registry import QUERIES, Query, all_queries

__all__ = ["QUERIES", "Query", "all_queries"]
