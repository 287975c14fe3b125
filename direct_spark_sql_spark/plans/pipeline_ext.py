"""Round-2 pipeline extensions: retrieval (chunking, BM25), CDC merge,
table profiling, skew-salted joins, embedding quantization.

Same contract as plans/pipeline.py: every query is a (Spark builder,
DuckDB oracle SQL) pair, bit-exact by construction — integer counts,
IEEE-identical double arithmetic, fixed-point snapping before any
order-dependent sum (see operators/retrieval.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from direct_spark_sql_spark.operators import retrieval as rt
from direct_spark_sql_spark.plans.base import Query
from direct_spark_sql_spark.plans.pipeline import TOKS_SQL
from direct_spark_sql_spark.sources.registry import load_table

# ---------------------------------------------------------------------------
# Document chunking
# ---------------------------------------------------------------------------

def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return rt.chunk_documents(d).orderBy("doc_id", "chunk_idx")


_C, _S = rt.CHUNK_TOKENS, rt.CHUNK_STRIDE

DOC_CHUNKING_ORACLE = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
d AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0)
SELECT doc_id,
       CAST(s // {_S} AS BIGINT) AS chunk_idx,
       CAST(s AS BIGINT) AS start_token,
       CAST(len(toks[s + 1 : s + {_C}]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[s + 1 : s + {_C}], ' ') AS chunk_text
FROM d, UNNEST(generate_series(0, n - 1, {_S})) AS u(s)
ORDER BY doc_id, chunk_idx
"""


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

BM25_TERMS = ("vector", "merge", "dup")


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return rt.bm25_topk(d, BM25_TERMS, k=10)


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    k1, b, units = rt.BM25_K1, rt.BM25_B, "100000000.0"
    return f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
base AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM t),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM base),
tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
       FROM base, UNNEST(toks) AS u(tok)
       WHERE tok IN ({terms})
       GROUP BY doc_id, tok),
dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         CAST(FLOOR(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE) * ({k1} + 1.0))
           / (CAST(tf AS DOUBLE)
              + {k1} * (1.0 - {b} + {b} * (CAST(dl AS DOUBLE)
                        / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
           * {units} + 0.5) AS BIGINT) AS units
  FROM tf
  JOIN base USING (doc_id)
  JOIN dft USING (term)
  CROSS JOIN stats
)
SELECT doc_id, CAST(SUM(units) AS DOUBLE) / {units} AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 10
"""


QUERIES = [
    Query("doc_chunking", doc_chunking, DOC_CHUNKING_ORACLE,
          ("text", "pipeline", "retrieval"), bench=True,
          doc="overlapping token-window chunks (32/24) with offsets, "
              "pure JVM generate — the RAG/pretraining chunker"),
    Query("bm25_search", bm25_search, _bm25_oracle(),
          ("text", "pipeline", "retrieval"), bench=True,
          doc="BM25 top-k keyword retrieval: filtered-explode tf, "
              "broadcast df/stats, fixed-point exact scores"),
]
