"""Engine function library.

Two tiers, mirroring the reference's function story (SURVEY.md §2.9/§2.10):

- **Native column functions** (:mod:`columns`): pure
  ``pyspark.sql.functions`` compositions — JVM-side, codegen'd, the hot
  path.  The reference's equivalent is the inherited Catalyst
  FunctionRegistry (DirectSessionStateBuilder.scala:49-109).
- **Registered UDFs** (:mod:`udf`): the user-extension surface — Python
  and Arrow-vectorized pandas UDFs registered into the session so SQL text
  can call them, the analogue of the reference's Hive
  UDF/UDAF/UDTF registration (DirectSessionCatalog.scala:62-112).
  UDFs are the *slow path* by design; everything the engine itself needs
  ships as a native column function.
"""

from direct_spark_sql_spark.functions.columns import (
    cosine_dec,
    fingerprint,
    h64,
    predicted_language,
    quality_features,
    shingles,
    token_count,
    tokens,
)
from direct_spark_sql_spark.functions.udf import register_udfs

__all__ = [
    "cosine_dec",
    "fingerprint",
    "h64",
    "predicted_language",
    "quality_features",
    "register_udfs",
    "shingles",
    "token_count",
    "tokens",
]
