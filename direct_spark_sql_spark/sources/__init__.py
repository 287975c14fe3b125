from direct_spark_sql_spark.sources.registry import (
    TABLES,
    load_table,
    register_star_schema,
)

__all__ = ["TABLES", "load_table", "register_star_schema"]
