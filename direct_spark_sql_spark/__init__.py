"""direct_spark_sql_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capability surface of the reference
``direct-spark-sql`` engine (a single-node Scala/Catalyst iterator engine,
see SURVEY.md), re-expressed Spark-first: the logical plan is declared with
the DataFrame / SQL API and Catalyst + Tungsten + AQE pick the physical
strategy.  Designed for cluster scale (partitioned, shuffle-aware,
broadcast-hinted), tested on local mode.

Public surface:

- :class:`direct_spark_sql_spark.session.Engine` — session facade with the
  reference's API (``sql_directly``, ``register_table``, namespaced plan
  cache, db-qualified temp views; reference: DirectSparkSession.scala).
- :mod:`direct_spark_sql_spark.plans` — the query registry: every supported
  operator exposed as a named (spark_fn, oracle_sql) pair.
- :mod:`direct_spark_sql_spark.operators` — LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal) built on DataFrame
  primitives.
"""

from direct_spark_sql_spark.session import Engine, EngineBuilder
from direct_spark_sql_spark.datatable import DataTable

__all__ = ["Engine", "EngineBuilder", "DataTable"]
__version__ = "0.1.0"
