"""Native column-function surface — one import point for the engine's
JVM-side functions.  Implementations live beside their operator families;
this module is the stable public name for each.
"""

from direct_spark_sql_spark.hashing import h64
from direct_spark_sql_spark.operators.dedup import shingles
from direct_spark_sql_spark.operators.similarity import cosine_dec
from direct_spark_sql_spark.operators.text import (
    fingerprint,
    predicted_language,
    quality_features,
    token_count,
    tokens,
)

__all__ = [
    "cosine_dec",
    "fingerprint",
    "h64",
    "predicted_language",
    "quality_features",
    "shingles",
    "token_count",
    "tokens",
]
