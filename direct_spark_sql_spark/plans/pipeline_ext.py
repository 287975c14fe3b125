"""Round-2 pipeline extensions: retrieval (chunking, BM25), CDC merge,
table profiling, skew-salted joins, embedding quantization.

Same contract as plans/pipeline.py: every query is a (Spark builder,
DuckDB oracle SQL) pair, bit-exact by construction — integer counts,
IEEE-identical double arithmetic, fixed-point snapping before any
order-dependent sum (see operators/retrieval.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from direct_spark_sql_spark.operators import joins as jn
from direct_spark_sql_spark.operators import merge as mg
from direct_spark_sql_spark.operators import profile as pf
from direct_spark_sql_spark.operators import retrieval as rt
from direct_spark_sql_spark.operators import similarity as sim
from direct_spark_sql_spark.plans.base import (
    DEC_OUT,
    Query,
    REVENUE_SQL,
    sql_query,
    sum_money_sql,
)
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


def bm25_oracle_ctes(
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """BM25 oracle as a reusable CTE chain ending in ``bm25(doc_id, score)``
    — shared by the standalone query, the hybrid-RRF fusion oracle, and
    (re-targeted at the chunk table) the RAG chunk-search oracle."""
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    k1, b, units = rt.BM25_K1, rt.BM25_B, "100000000.0"
    toks_sql = f"list_filter(string_split({text_col}, ' '), t -> length(t) > 0)"
    return f"""t AS (SELECT {id_col} AS doc_id, {toks_sql} AS toks FROM {table}),
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
),
bm25 AS (
  SELECT doc_id, CAST(SUM(units) AS DOUBLE) / {units} AS score
  FROM scored GROUP BY doc_id
  ORDER BY score DESC, doc_id LIMIT {k}
)"""


def _bm25_oracle() -> str:
    return f"""
WITH {bm25_oracle_ctes(10)}
SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id
"""


def rag_chunk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG retrieval unit done end-to-end as one lazy DAG: chunk the
    corpus into overlapping token windows, BM25-score the CHUNKS (not the
    documents), return the top-10 passages with their (doc_id, chunk_idx)
    provenance — retrieval granularity a context window can actually
    consume.  Chunking is a per-row JVM generate; scoring reuses the
    shared exact BM25 tail, so the whole pipeline stays oracle-checked."""
    d = load_table(spark, sf_dir, "documents")
    chunks = rt.chunk_documents(d).select(
        (F.col("doc_id") * 10000 + F.col("chunk_idx")).alias("chunk_id"),
        "doc_id",
        "chunk_idx",
        "chunk_text",
    )
    top = rt.bm25_topk(
        chunks, BM25_TERMS, k=10, text_col="chunk_text", id_col="chunk_id"
    )
    return (
        top.join(chunks.select("chunk_id", "doc_id", "chunk_idx"), "chunk_id")
        .select("doc_id", "chunk_idx", "score")
        .orderBy(F.desc("score"), "doc_id", "chunk_idx")
    )


def _rag_chunk_oracle() -> str:
    from direct_spark_sql_spark.plans.pipeline_ext import DOC_CHUNKING_ORACLE  # self-import safe

    chunk_body = DOC_CHUNKING_ORACLE.strip().rstrip()
    # strip the trailing ORDER BY of the standalone chunking oracle
    chunk_body = chunk_body[: chunk_body.rindex("ORDER BY")]
    return f"""
WITH chunks AS (
  SELECT doc_id * 10000 + chunk_idx AS chunk_id, doc_id, chunk_idx, chunk_text
  FROM ({chunk_body})
),
{bm25_oracle_ctes(10, table="chunks", id_col="chunk_id", text_col="chunk_text")}
SELECT c.doc_id, c.chunk_idx, b.score
FROM bm25 b JOIN chunks c ON b.doc_id = c.chunk_id
ORDER BY b.score DESC, c.doc_id, c.chunk_idx
"""


def ensure_bm25_index(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently materialize the BM25 inverted index; returns its root
    (shared by bm25_indexed_search and the hybrid-RRF sparse side)."""
    import os

    from direct_spark_sql_spark.sources.registry import dataset_tag, warehouse_path

    root = warehouse_path("bm25_index", dataset_tag(sf_dir))
    marker = os.path.join(root, "_INDEX_OK")
    if not os.path.exists(marker):
        rt.build_inverted_index(load_table(spark, sf_dir, "documents"), root)
        with open(marker, "w") as f:
            f.write("ok\n")
    return root


def bm25_indexed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from a materialized inverted index (build-once/query-
    many): term-range-clustered postings + doc lengths + corpus stats in
    the warehouse; the query's term IN-list prunes postings files via
    parquet footer stats and never re-tokenizes the corpus.  Same oracle
    as bm25_search — the index must be score-invisible."""
    return rt.bm25_indexed_topk(spark, ensure_bm25_index(spark, sf_dir), BM25_TERMS, k=10)


# ---------------------------------------------------------------------------
# CDC merge (latest-wins upsert) and SCD-2 history
#
# The changeset is derived deterministically from orders itself so the
# DuckDB oracle can replay it: updates for keys % 7 = 0 (reprice +10,
# status 'P', seq 1), deletes for keys % 11 = 3 (seq 2, outranks the
# update when both hit a key), inserts at key + 10_000_000 for keys
# % 13 = 1 (seq 1).
# ---------------------------------------------------------------------------

_PRICE_D = 'CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE)'
_PRICE_UP_D = 'CAST(CAST(o_totalprice AS DECIMAL(14,2)) + 10 AS DOUBLE)'


def _orders_base_and_changes(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(14,2)")
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        price.cast("double").alias("o_totalprice"),
    )
    upd = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("P").alias("o_orderstatus"),
        (price + F.lit(10)).cast("double").alias("o_totalprice"),
        F.lit("U").alias("op"),
        F.lit(1).cast("long").alias("change_seq"),
    )
    dele = orders.filter(F.col("o_orderkey") % 11 == 3).select(
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit("D").alias("op"),
        F.lit(2).cast("long").alias("change_seq"),
    )
    ins = orders.filter(F.col("o_orderkey") % 13 == 1).select(
        (F.col("o_orderkey") + F.lit(10000000)).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        price.cast("double").alias("o_totalprice"),
        F.lit("I").alias("op"),
        F.lit(1).cast("long").alias("change_seq"),
    )
    return base, upd.unionByName(dele).unionByName(ins)


_CDC_CTES = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, {_PRICE_D} AS o_totalprice,
         'B' AS op, CAST(0 AS BIGINT) AS change_seq
  FROM orders),
upd AS (
  SELECT o_orderkey, 'P' AS o_orderstatus, {_PRICE_UP_D} AS o_totalprice,
         'U' AS op, CAST(1 AS BIGINT) AS change_seq
  FROM orders WHERE o_orderkey % 7 = 0),
del AS (
  SELECT o_orderkey, CAST(NULL AS VARCHAR) AS o_orderstatus,
         CAST(NULL AS DOUBLE) AS o_totalprice,
         'D' AS op, CAST(2 AS BIGINT) AS change_seq
  FROM orders WHERE o_orderkey % 11 = 3),
ins AS (
  SELECT o_orderkey + 10000000 AS o_orderkey, 'N' AS o_orderstatus,
         {_PRICE_D} AS o_totalprice, 'I' AS op, CAST(1 AS BIGINT) AS change_seq
  FROM orders WHERE o_orderkey % 13 = 1),
combined AS (
  SELECT * FROM base UNION ALL SELECT * FROM upd
  UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins)
"""


def privacy_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation: a deletion-request set (stand-in:
    customers in the BUILDING segment with negative balance) anti-joins
    every downstream fact — orders, then lineitems through the order FK —
    and the audit reports retained/deleted counts per table.  Each hop is
    one broadcast/shuffle anti-join on the FK chain; no table is rewritten
    more than once regardless of request count — the compliant-deletion
    shape at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    requests = c.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") < 0)
    ).select("c_custkey")
    c_kept = c.join(requests, "c_custkey", "left_anti")
    o_del = o.join(
        requests.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi"
    ).select("o_orderkey")
    o_kept = o.join(o_del, "o_orderkey", "left_anti")
    l_kept = l.join(
        o_del.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti"
    )

    def audit(name: str, total, kept) -> DataFrame:
        return total.agg(F.count(F.lit(1)).alias("__t")).crossJoin(
            kept.agg(F.count(F.lit(1)).alias("__k"))
        ).select(
            F.lit(name).alias("table_name"),
            F.col("__t").cast("long").alias("n_total"),
            F.col("__k").cast("long").alias("n_kept"),
            (F.col("__t") - F.col("__k")).cast("long").alias("n_deleted"),
        )

    return (
        audit("customer", c, c_kept)
        .unionAll(audit("orders", o, o_kept))
        .unionAll(audit("lineitem", l, l_kept))
        .orderBy("table_name")
    )


PRIVACY_DELETE_ORACLE = """
WITH req AS (
  SELECT c_custkey FROM customer
  WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 0
),
o_del AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM req))
SELECT 'customer' AS table_name,
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_total,
       CAST((SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM req)) AS BIGINT) AS n_kept,
       CAST((SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM req)) AS BIGINT) AS n_deleted
UNION ALL
SELECT 'orders',
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM o_del)) AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM o_del)) AS BIGINT)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM o_del)) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem) - (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM o_del)) AS BIGINT)
ORDER BY table_name
"""


def privacy_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization that keeps the data useful: identifier columns are
    replaced by stable deterministic tokens (salted MD5-family hash), and
    because the SAME function pseudonymizes the FK on both tables, joins
    still work on tokens alone — analytics continue with zero raw
    identifiers in flight.  Map-only transform; the per-segment aggregate
    over the token-joined tables must equal the raw-key join."""
    from direct_spark_sql_spark.hashing import h64

    def token(col):
        return h64(F.concat_ws(":", F.lit("pseud"), col.cast("string")))

    c = load_table(spark, sf_dir, "customer").select(
        token(F.col("c_custkey")).alias("cust_token"),
        "c_mktsegment",
    )
    o = load_table(spark, sf_dir, "orders").select(
        token(F.col("o_custkey")).alias("cust_token"),
        "o_totalprice",
    )
    return (
        o.join(c, "cust_token")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("cust_token").cast("long").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


def _pseudonymize_oracle() -> str:
    from direct_spark_sql_spark.hashing import h64_sql

    tok_c = h64_sql("'pseud' || ':' || CAST(c_custkey AS VARCHAR)")
    tok_o = h64_sql("'pseud' || ':' || CAST(o_custkey AS VARCHAR)")
    return f"""
WITH c AS (SELECT {tok_c} AS cust_token, c_mktsegment FROM customer),
o AS (SELECT {tok_o} AS cust_token, o_totalprice FROM orders)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT c.cust_token) AS BIGINT) AS n_customers
FROM o JOIN c ON o.cust_token = c.cust_token
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
"""


#: k-anonymity audit parameters: minimum acceptable equivalence-class
#: size and the document-length bucketing width (a raw length is itself a
#: quasi-identifier; banding it is the standard generalization step).
K_ANON_K = 5
K_ANON_BUCKET = 256


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the corpus quasi-identifiers
    (source, lang, 256-char length band): every equivalence class with
    fewer than k members is a re-identification risk — the release-gate
    report a privacy review runs before publishing a dataset (Sweeney's
    k-anonymity, the measure behind GDPR-style aggregation thresholds).

    Scale shape: ONE hash aggregation on the QI tuple (map-side partial
    combine absorbs any hot class), then a bounded filter — no window, no
    self-join; the output is bounded by the distinct-class count, and the
    violating set SHRINKS as data grows (classes fill past k)."""
    d = load_table(spark, sf_dir, "documents")
    qi = d.select(
        "source",
        "lang",
        (F.floor(F.col("n_chars") / K_ANON_BUCKET) * K_ANON_BUCKET)
        .cast("long")
        .alias("len_bucket"),
    )
    return (
        qi.groupBy("source", "lang", "len_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
        .filter(F.col("class_size") < K_ANON_K)
        .orderBy("source", "lang", "len_bucket")
    )


_K_ANONYMITY_ORACLE = f"""
WITH qi AS (
  SELECT source, lang,
         CAST(FLOOR(n_chars / {K_ANON_BUCKET}) * {K_ANON_BUCKET} AS BIGINT)
           AS len_bucket
  FROM documents
)
SELECT source, lang, len_bucket, CAST(COUNT(*) AS BIGINT) AS class_size
FROM qi GROUP BY source, lang, len_bucket
HAVING COUNT(*) < {K_ANON_K}
ORDER BY source, lang, len_bucket
"""

#: l-diversity threshold: a QI class whose sensitive attribute takes
#: fewer than L distinct values is a homogeneity-attack risk even when
#: it is k-anonymous (Machanavajjhala et al.'s refinement of k-anonymity)
L_DIVERSITY_L = 3


def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the companion gate to privacy_k_anonymity: a
    k-anonymous class is still unsafe if everyone in it shares the same
    sensitive value (homogeneity attack).  QI here is (source, 256-char
    length band); the sensitive attribute is ``lang``; every class with
    fewer than L distinct sensitive values is reported with its size and
    its diversity.

    Scale shape: ONE hash aggregation on the QI tuple with a
    count-distinct (Spark's two-phase distinct-aggregate expand — still
    partial-combinable per (QI, lang) before the final count), bounded
    output, no window, no self-join."""
    d = load_table(spark, sf_dir, "documents")
    qi = d.select(
        "source",
        "lang",
        (F.floor(F.col("n_chars") / K_ANON_BUCKET) * K_ANON_BUCKET)
        .cast("long")
        .alias("len_bucket"),
    )
    return (
        qi.groupBy("source", "len_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            F.countDistinct("lang").cast("long").alias("l_diversity"),
        )
        .filter(F.col("l_diversity") < L_DIVERSITY_L)
        .orderBy("source", "len_bucket")
    )


_L_DIVERSITY_ORACLE = f"""
WITH qi AS (
  SELECT source, lang,
         CAST(FLOOR(n_chars / {K_ANON_BUCKET}) * {K_ANON_BUCKET} AS BIGINT)
           AS len_bucket
  FROM documents
)
SELECT source, len_bucket,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS l_diversity
FROM qi GROUP BY source, len_bucket
HAVING COUNT(DISTINCT lang) < {L_DIVERSITY_L}
ORDER BY source, len_bucket
"""

#: t-closeness threshold as a rational t = NUM/DEN (0.4): a QI class
#: whose sensitive-value distribution sits farther than t (total
#: variation) from the corpus-wide distribution leaks information even
#: when k-anonymous and l-diverse (Li et al.'s refinement).
T_CLOSE_NUM, T_CLOSE_DEN = 2, 5


def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third privacy gate after k-anonymity and
    l-diversity: per QI class (source, 256-char length band), the total
    variation distance between the class's ``lang`` distribution and the
    corpus-wide one; classes beyond t are flagged with the distance.

    Exactness: TV = 0.5 * Σ_v |cnt_v/size - CNT_v/N| is computed in
    EXACT units — ``tv_units = Σ_v |cnt_v * N - CNT_v * size|``
    (= TV * 2*size*N) — so the sum is order-independent, and the
    arithmetic runs in DECIMAL(38,0) (DuckDB HUGEINT) because cnt*N is
    O(N²) and would wrap int64 past ~3e9 rows — the 100 TB regime this
    operator targets (review r8 #2); the reported double is one exact
    division at the end.  Values of v absent from a class contribute
    their full global mass via the class × global-value cell join.

    Scale shape: ONE (QI, lang) hash agg scans the corpus; class sizes,
    the global distribution, and the 1-row total are all tiny re-aggs
    OF THAT RESULT (no second corpus scan, review r8 #4), broadcast
    back; the per-QI re-agg output is bounded by |classes| x |langs|."""
    d = load_table(spark, sf_dir, "documents")
    qi = d.select(
        "source",
        "lang",
        (F.floor(F.col("n_chars") / K_ANON_BUCKET) * K_ANON_BUCKET)
        .cast("long")
        .alias("len_bucket"),
    )
    cls_lang = qi.groupBy("source", "len_bucket", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cls = cls_lang.groupBy("source", "len_bucket").agg(
        F.sum("cnt").cast("long").alias("class_size")
    )
    glob = cls_lang.groupBy("lang").agg(F.sum("cnt").cast("long").alias("gcnt"))
    ntot = glob.agg(F.sum("gcnt").cast("long").alias("n_total"))  # 1 row, lazy
    # every (class x global lang) cell: absent langs count as cnt=0
    cells = (
        cls.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(ntot))
        .join(cls_lang, ["source", "len_bucket", "lang"], "left")
        .na.fill({"cnt": 0})
    )
    dec = "decimal(38,0)"
    units = F.abs(
        F.col("cnt").cast(dec) * F.col("n_total").cast(dec)
        - F.col("gcnt").cast(dec) * F.col("class_size").cast(dec)
    )
    agg = cells.groupBy("source", "len_bucket", "class_size", "n_total").agg(
        F.sum(units).cast(dec).alias("tv_units")
    )
    flagged = agg.filter(
        F.col("tv_units") * F.lit(T_CLOSE_DEN).cast(dec)
        > F.lit(2 * T_CLOSE_NUM).cast(dec)
        * F.col("n_total").cast(dec)
        * F.col("class_size").cast(dec)
    )
    tv = F.col("tv_units").cast("double") / (
        F.lit(2.0)
        * F.col("n_total").cast("double")
        * F.col("class_size").cast("double")
    )
    return flagged.select(
        "source", "len_bucket", "class_size", tv.alias("tv_distance")
    ).orderBy("source", "len_bucket")


def _t_closeness_oracle() -> str:
    return f"""
WITH qi AS (
  SELECT source, lang,
         CAST(FLOOR(n_chars / {K_ANON_BUCKET}) * {K_ANON_BUCKET} AS BIGINT)
           AS len_bucket
  FROM documents
),
cl AS (SELECT source, len_bucket, lang, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM qi GROUP BY 1, 2, 3),
cs AS (SELECT source, len_bucket, CAST(COUNT(*) AS BIGINT) AS class_size
       FROM qi GROUP BY 1, 2),
g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS gcnt FROM qi GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM qi),
cells AS (
  SELECT cs.source, cs.len_bucket, cs.class_size, g.gcnt,
         COALESCE(cl.cnt, 0) AS cnt, n.n_total
  FROM cs CROSS JOIN g CROSS JOIN n
  LEFT JOIN cl ON cl.source = cs.source AND cl.len_bucket = cs.len_bucket
             AND cl.lang = g.lang
),
agg AS (
  -- HUGEINT: cnt*n_total is O(N^2) and wraps int64 past ~3e9 rows,
  -- mirroring the Spark side's DECIMAL(38,0) (review r8 #2)
  SELECT source, len_bucket, class_size, n_total,
         SUM(ABS(CAST(cnt AS HUGEINT) * CAST(n_total AS HUGEINT)
                 - CAST(gcnt AS HUGEINT) * CAST(class_size AS HUGEINT)))
           AS tv_units
  FROM cells GROUP BY 1, 2, 3, 4
)
SELECT source, len_bucket, class_size,
       CAST(tv_units AS DOUBLE)
         / (2.0 * n_total * CAST(class_size AS DOUBLE)) AS tv_distance
FROM agg
WHERE tv_units * {T_CLOSE_DEN}
        > 2 * {T_CLOSE_NUM} * CAST(n_total AS HUGEINT) * class_size
ORDER BY source, len_bucket
"""


# --- differentially-private release (completes detect -> release for the
# privacy toolchain the way corpus_training_ready completed decontam;
# VERDICT r8 #4) -----------------------------------------------------------

#: DP budget for the released histogram.  Sensitivity is 1 (adding or
#: removing one document changes exactly one QI class count by 1), so the
#: two-sided-geometric mechanism with alpha = exp(-DP_EPSILON) is
#: epsilon-DP (Ghosh-Roughgarden-Sundararajan, "Universally utility-
#: maximizing privacy mechanisms", STOC'09 — the discrete analogue of
#: Laplace, and exactly integer-valued, which keeps the release
#: bit-exact across engines).
DP_EPSILON = 1.0

#: Noise support is truncated to [-DP_NOISE_BOUND, DP_NOISE_BOUND]; the
#: tails collapse onto the endpoints.  alpha^17 / (1 + alpha) ~ 3e-8 of
#: mass sits past +/-16 at epsilon = 1, so the truncation is practically
#: unobservable while keeping the inverse-CDF a fixed 32-term threshold
#: scan with literal breakpoints (no log() at runtime — both engines
#: only COMPARE doubles against identical literals, which is the whole
#: bit-exactness argument: ln/exp may differ in the last ulp between
#: libm implementations, a >= against the same literal cannot).
DP_NOISE_BOUND = 16

#: Release seed.  The noise is a pure function of (class key, DP_SEED),
#: so the seed is part of the SECRET state of the mechanism: publishing
#: it would let any consumer recompute and subtract the noise, recovering
#: exact counts and voiding the DP guarantee (ADVICE r9).  A production
#: release draws it fresh per release from a secure source and retains it
#: privately; only the epsilon / mechanism parameters are publishable.
#: The fixed value here exists so the DuckDB oracle — which plays the
#: role of the release pipeline's internal replica, not of a consumer —
#: can replay the identical draws for the differential check.
DP_SEED = 90210

#: Declared release domain — fixed BEFORE looking at the data, which is
#: what makes the histogram release epsilon-DP including row PRESENCE:
#: a release over only the observed classes emits a row exactly when a
#: class is non-empty, so neighboring datasets differing in a singleton
#: class's sole document are distinguished with certainty (ADVICE r9).
#: Releasing a noisy count for EVERY declared cell (empty ones included)
#: removes that signal; rows outside the declared domain contribute to
#: no released cell, so adding/removing one costs zero privacy.  The
#: testdata generator's source vocabulary is the fixed src0..src19 set
#: at every scale factor, and n_chars tops out at 577 across sf0.001-0.1
#: — the 0..768 bucket grid covers it with one bucket of headroom.
DP_DOMAIN_SOURCES: tuple[str, ...] = tuple(f"src{i}" for i in range(20))
DP_DOMAIN_LEN_BUCKETS: tuple[int, ...] = (0, 256, 512, 768)


def _dp_cdf_breakpoints() -> list[float]:
    """CDF breakpoints C(z) of the two-sided geometric distribution for
    z in [-B, B): noise(u) = -B + #{z : u >= C(z)}.  u below C(-B) lands
    at -B and u above C(B-1) at +B (tail collapse).  Pure python floats,
    interpolated as literals into BOTH engines' expressions."""
    import math

    a = math.exp(-DP_EPSILON)
    out = []
    for z in range(-DP_NOISE_BOUND, DP_NOISE_BOUND):
        if z < 0:
            out.append(a ** (-z) / (1.0 + a))
        else:
            out.append(1.0 - a ** (z + 1) / (1.0 + a))
    return out


#: 2^52: the uniform draw is (h64 % 2^52) / 2^52 — both the modulus
#: result and the quotient are exactly representable doubles, so u is
#: bit-identical in any engine.
_DP_U_DEN = 1 << 52


def privacy_dp_release(
    spark: SparkSession,
    sf_dir: str,
    domain_sources: tuple[str, ...] = DP_DOMAIN_SOURCES,
    domain_len_buckets: tuple[int, ...] = DP_DOMAIN_LEN_BUCKETS,
) -> DataFrame:
    """Differentially-private histogram release over the k-anonymity QI
    classes (source, 256-char length band), released over the FIXED,
    data-independent domain ``domain_sources x domain_len_buckets``:
    every declared cell — empty ones included — gets true count plus
    integer two-sided-geometric noise at epsilon = DP_EPSILON, clamped
    at zero (post-processing preserves DP).  The detect side of the
    toolchain (k-anonymity / l-diversity / t-closeness) says which
    aggregates are risky to publish raw; this is the release mechanism
    that publishes them anyway, safely.

    Why the fixed domain (ADVICE r9): a release over only the OBSERVED
    classes emits a row exactly when a class is non-empty, so
    neighboring datasets differing in a singleton class's sole document
    are distinguished with certainty — row presence itself leaks.  Here
    the released row set is a constant of the declared domain, an empty
    cell is indistinguishable from a singleton up to the same noise as
    any other count, and rows whose QI falls outside the declared
    domain contribute to no released cell (adding or removing one is
    privacy-free).  Per-cell epsilon-DP composes in PARALLEL across the
    disjoint cells, so the whole histogram costs DP_EPSILON per release
    (see privacy_dp_epsilon_ledger for the cumulative spend).

    Determinism: the noise for a cell is a pure function of
    (source, len_bucket, DP_SEED) — u = (h64(key) % 2^52) / 2^52 mapped
    through the literal CDF breakpoints of _dp_cdf_breakpoints(), so the
    DuckDB oracle replays the identical noise (the planted-data test
    pins exact noise values).  Per-class noise is what the DP guarantee
    requires — NOT a per-row perturbation.  DP_SEED stays secret (see
    its note); domain keys are literals so the noise key is never NULL,
    and concat_ws keeps the NULL behavior engine-identical regardless.

    Scale shape: ONE (QI) hash aggregation over the corpus (map-side
    combinable), its bounded output broadcast to a left join against
    the literal domain grid (|domain| rows, a LocalTableScan), then the
    map-only literal-threshold noise projection — no shuffle joins, no
    windows, no second scan of the corpus."""
    from direct_spark_sql_spark.hashing import h64

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(
            "source",
            (F.floor(F.col("n_chars") / K_ANON_BUCKET) * K_ANON_BUCKET)
            .cast("long")
            .alias("len_bucket"),
        )
        .groupBy("source", "len_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    )
    domain = spark.createDataFrame(
        [(s, b) for s in domain_sources for b in domain_len_buckets],
        "source string, len_bucket long",
    )
    cells = domain.join(
        F.broadcast(counts), ["source", "len_bucket"], "left"
    ).select(
        "source", "len_bucket", F.coalesce("__cnt", F.lit(0)).alias("__cnt")
    )
    key = F.concat_ws(
        ":", F.col("source"), F.col("len_bucket"), F.lit(str(DP_SEED))
    )
    u = (h64(key) % F.lit(_DP_U_DEN)).cast("double") / F.lit(float(_DP_U_DEN))
    noise = F.lit(-DP_NOISE_BOUND)
    for c in _dp_cdf_breakpoints():
        noise = noise + F.when(u >= F.lit(c), 1).otherwise(0)
    return cells.select(
        "source",
        "len_bucket",
        F.greatest(F.lit(0), (F.col("__cnt") + noise)).cast("long").alias(
            "noisy_count"
        ),
    ).orderBy("source", "len_bucket")


def _dp_domain_sql(
    domain_sources: tuple[str, ...] = DP_DOMAIN_SOURCES,
    domain_len_buckets: tuple[int, ...] = DP_DOMAIN_LEN_BUCKETS,
) -> str:
    """VALUES grid of the declared release domain (literal, data-free)."""
    srcs = ", ".join(f"('{s}')" for s in domain_sources)
    bkts = ", ".join(f"(CAST({b} AS BIGINT))" for b in domain_len_buckets)
    return (
        f"SELECT s.source, b.len_bucket FROM (VALUES {srcs}) s(source) "
        f"CROSS JOIN (VALUES {bkts}) b(len_bucket)"
    )


def _dp_release_oracle(
    domain_sources: tuple[str, ...] = DP_DOMAIN_SOURCES,
    domain_len_buckets: tuple[int, ...] = DP_DOMAIN_LEN_BUCKETS,
) -> str:
    from direct_spark_sql_spark.hashing import h64_sql

    # concat_ws in BOTH engines (not ||): both skip NULL arguments
    # identically.  Domain keys are literals (never NULL), so this is
    # belt-and-braces parity rather than a live hazard now.
    key = f"concat_ws(':', source, len_bucket, '{DP_SEED}')"
    u = f"(CAST({h64_sql(key)} % {_DP_U_DEN} AS DOUBLE) / {float(_DP_U_DEN)!r})"
    terms = " + ".join(
        f"(CASE WHEN u >= {c!r} THEN 1 ELSE 0 END)"
        for c in _dp_cdf_breakpoints()
    )
    return f"""
WITH dom AS ({_dp_domain_sql(domain_sources, domain_len_buckets)}),
qi AS (
  SELECT source,
         CAST(FLOOR(n_chars / {K_ANON_BUCKET}) * {K_ANON_BUCKET} AS BIGINT)
           AS len_bucket
  FROM documents
),
counts AS (
  SELECT source, len_bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM qi GROUP BY 1, 2
),
cells AS (
  SELECT dom.source, dom.len_bucket, COALESCE(counts.cnt, 0) AS cnt
  FROM dom LEFT JOIN counts USING (source, len_bucket)
),
withu AS (SELECT source, len_bucket, cnt, {u} AS u FROM cells)
SELECT source, len_bucket,
       CAST(GREATEST(0, cnt + (-{DP_NOISE_BOUND} + {terms})) AS BIGINT)
         AS noisy_count
FROM withu
ORDER BY source, len_bucket
"""


#: Release log the epsilon ledger aggregates — one row per registered
#: release of the documents QI histogram: (release_id, domain_kind,
#: epsilon).  domain_kind 'observed' = the round-9 release over only the
#: observed classes (kept on the books: its budget was genuinely spent
#: against this data even though the mechanism was superseded);
#: 'declared' = the fixed-domain release above.  An 'observed' release
#: touched a cell iff the cell was non-empty; a 'declared' release
#: touches every declared cell.
DP_RELEASE_LOG: tuple[tuple[str, str, float], ...] = (
    ("qi_histogram_r9", "observed", DP_EPSILON),
    ("qi_histogram_r10", "declared", DP_EPSILON),
)

_DP_EPS_DECLARED = sum(e for _, kind, e in DP_RELEASE_LOG if kind == "declared")
_DP_EPS_OBSERVED = sum(e for _, kind, e in DP_RELEASE_LOG if kind == "observed")
_DP_N_DECLARED = sum(1 for _, kind, _e in DP_RELEASE_LOG if kind == "declared")
_DP_N_OBSERVED = sum(1 for _, kind, _e in DP_RELEASE_LOG if kind == "observed")


def privacy_dp_epsilon_ledger(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cumulative differential-privacy budget per QI class across the
    releases in DP_RELEASE_LOG (VERDICT r9 #5) — pure bookkeeping, no
    new mechanism.

    Composition rule: WITHIN one histogram release the per-cell
    mechanisms act on disjoint row sets, so they compose in PARALLEL —
    the release costs its epsilon once per cell, not |cells| * epsilon.
    ACROSS releases the same rows are touched again, so budgets add by
    SEQUENTIAL composition (Dwork & Roth, Thm 3.14/3.20): a cell's
    cumulative spend is the sum of epsilon over the releases whose
    domain included it.  An 'observed'-domain release included a cell
    iff it was non-empty at release time; a 'declared'-domain release
    includes every declared cell.

    Scale shape: the same single QI hash aggregation as the release
    itself (only an EXISTS bit is needed, so count >= 1 stands in),
    broadcast-left-joined to the literal domain grid; map-only literal
    arithmetic after that."""
    d = load_table(spark, sf_dir, "documents")
    observed = (
        d.select(
            "source",
            (F.floor(F.col("n_chars") / K_ANON_BUCKET) * K_ANON_BUCKET)
            .cast("long")
            .alias("len_bucket"),
        )
        .groupBy("source", "len_bucket")
        .agg(F.lit(1).alias("__obs"))
    )
    domain = spark.createDataFrame(
        [(s, b) for s in DP_DOMAIN_SOURCES for b in DP_DOMAIN_LEN_BUCKETS],
        "source string, len_bucket long",
    )
    obs = F.col("__obs").isNotNull()
    return (
        domain.join(F.broadcast(observed), ["source", "len_bucket"], "left")
        .select(
            "source",
            "len_bucket",
            obs.cast("long").alias("observed"),
            (
                F.lit(_DP_N_DECLARED)
                + F.when(obs, F.lit(_DP_N_OBSERVED)).otherwise(F.lit(0))
            ).cast("long").alias("n_releases"),
            (
                F.lit(float(_DP_EPS_DECLARED))
                + F.when(obs, F.lit(float(_DP_EPS_OBSERVED))).otherwise(
                    F.lit(0.0)
                )
            ).alias("epsilon_total"),
        )
        .orderBy("source", "len_bucket")
    )


def _dp_epsilon_ledger_oracle() -> str:
    return f"""
WITH dom AS ({_dp_domain_sql()}),
qi AS (
  SELECT source,
         CAST(FLOOR(n_chars / {K_ANON_BUCKET}) * {K_ANON_BUCKET} AS BIGINT)
           AS len_bucket
  FROM documents
),
observed AS (SELECT source, len_bucket, 1 AS obs FROM qi GROUP BY 1, 2)
SELECT dom.source, dom.len_bucket,
       CAST(CASE WHEN obs IS NULL THEN 0 ELSE 1 END AS BIGINT) AS observed,
       CAST({_DP_N_DECLARED} + CASE WHEN obs IS NULL THEN 0
            ELSE {_DP_N_OBSERVED} END AS BIGINT) AS n_releases,
       CAST({float(_DP_EPS_DECLARED)!r} + CASE WHEN obs IS NULL THEN 0.0
            ELSE {float(_DP_EPS_OBSERVED)!r} END AS DOUBLE) AS epsilon_total
FROM dom LEFT JOIN observed USING (source, len_bucket)
ORDER BY dom.source, dom.len_bucket
"""


def merge_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, changes = _orders_base_and_changes(spark, sf_dir)
    return mg.apply_cdc(base, changes, ["o_orderkey"]).orderBy("o_orderkey")


MERGE_CDC_ORACLE = _CDC_CTES + """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                   ORDER BY change_seq DESC) AS rn
      FROM combined)
WHERE rn = 1 AND op <> 'D'
ORDER BY o_orderkey
"""


def merge_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, changes = _orders_base_and_changes(spark, sf_dir)
    return mg.scd2_history(base, changes, ["o_orderkey"]).orderBy(
        "o_orderkey", "valid_from"
    )


def merge_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between two synthetic orders snapshots: v2 drops
    every 101st key (-> removed), v1 lacks every 103rd (-> added in v2),
    and every 97th key gets a price bump (-> changed).  One full-outer
    join of (key, row_hash) projections — the shuffle never carries the
    wide rows."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 103 != 0)
    v2 = o.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice")),
    )
    cmp_cols = ["o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority"]
    return mg.snapshot_diff(v1, v2, ["o_orderkey"], cmp_cols).orderBy("o_orderkey")


def _snapshot_diff_oracle() -> str:
    nul = "chr(0) || 'null'"
    esc = ", ".join(
        f"COALESCE(replace(replace(CAST({c} AS VARCHAR), '\\', '\\\\'), "
        f"'|', '\\|'), {nul})"
        for c in ["o_custkey", "o_orderstatus", "o_totalprice",
                  "o_orderdate", "o_orderpriority"]
    )
    return f"""
WITH v1 AS (
  SELECT * FROM orders WHERE o_orderkey % 103 <> 0),
v2 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 101 <> 0),
h1 AS (SELECT o_orderkey, MD5(concat_ws('|', {esc})) AS h FROM v1),
h2 AS (SELECT o_orderkey, MD5(concat_ws('|', {esc})) AS h FROM v2)
SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.h IS NULL THEN 'added'
            WHEN b.h IS NULL THEN 'removed'
            WHEN a.h = b.h THEN 'unchanged'
            ELSE 'changed' END AS status
FROM h1 a FULL OUTER JOIN h2 b ON a.o_orderkey = b.o_orderkey
ORDER BY o_orderkey
"""


MERGE_SCD2_ORACLE = _CDC_CTES + """
SELECT o_orderkey, o_orderstatus, o_totalprice,
       change_seq AS valid_from, valid_to,
       (valid_to IS NULL) AS is_current
FROM (SELECT *, lead(change_seq) OVER (PARTITION BY o_orderkey
                                       ORDER BY change_seq ASC) AS valid_to
      FROM combined)
WHERE op <> 'D'
ORDER BY o_orderkey, valid_from
"""


# ---------------------------------------------------------------------------
# Table profiling
# ---------------------------------------------------------------------------

#: (column, SQL expr for numeric min/max or None) — shared spec for the
#: Spark builder and the generated oracle.
_PROFILE_SPEC: list[tuple[str, str | None]] = [
    ("o_orderkey", "CAST({c} AS DOUBLE)"),
    ("o_custkey", "CAST({c} AS DOUBLE)"),
    ("o_orderstatus", None),
    ("o_totalprice", "CAST({c} AS DOUBLE)"),
    ("o_orderdate", "CAST(epoch_us({c}) AS DOUBLE)"),
    ("o_orderpriority", None),
]


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    numeric: dict[str, F.Column | None] = {}
    for c, expr in _PROFILE_SPEC:
        if expr is None:
            numeric[c] = None
        elif c == "o_orderdate":
            # parquet timestamps load as NTZ; the session TZ is pinned UTC,
            # so the ltz hop is identity and unix_micros == DuckDB epoch_us.
            numeric[c] = F.unix_micros(F.col(c).cast("timestamp_ltz")).cast("double")
        else:
            numeric[c] = F.col(c).cast("double")
    return pf.profile_table(orders, numeric)


def _profile_oracle() -> str:
    aggs = ["CAST(count(*) AS BIGINT) AS n_rows"]
    rows = []
    for c, expr in _PROFILE_SPEC:
        aggs.append(f"CAST(count(*) - count({c}) AS BIGINT) AS null_{c}")
        aggs.append(f"CAST(count(DISTINCT {c}) AS BIGINT) AS dist_{c}")
        if expr is None:
            aggs.append(f"CAST(NULL AS DOUBLE) AS min_{c}")
            aggs.append(f"CAST(NULL AS DOUBLE) AS max_{c}")
        else:
            aggs.append(f"{expr.format(c=f'min({c})')} AS min_{c}")
            aggs.append(f"{expr.format(c=f'max({c})')} AS max_{c}")
        rows.append(
            f"SELECT '{c}' AS col_name, n_rows, null_{c} AS n_null, "
            f"dist_{c} AS n_distinct, min_{c} AS min_num, max_{c} AS max_num FROM s"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(aggs) + " FROM orders)\n"
        + "\nUNION ALL ".join(rows)
        + "\nORDER BY col_name"
    )


def quality_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations suite over orders: null / domain / range /
    uniqueness checks fold into ONE aggregate scan (map-side partials, one
    row per partition shuffled); the referential-integrity check is the one
    extra input — a LEFT ANTI join against customer — unioned in the same
    report shape.  The dbt-test / Deequ-style contract a 100 TB ingestion
    gate runs before publishing a partition."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    audit = pf.constraint_audit(
        orders,
        row_checks={
            "not_null_custkey": F.col("o_custkey").isNull(),
            "status_in_domain": ~F.col("o_orderstatus").isin("F", "O", "P"),
            "positive_totalprice": F.col("o_totalprice") <= 0,
        },
        unique_checks={"unique_orderkey": ["o_orderkey"]},
    )
    fk = pf.fk_violations(
        orders, customer, "o_custkey", "c_custkey", "fk_custkey_exists"
    )
    return audit.unionByName(fk).orderBy("check")


CONSTRAINT_AUDIT_ORACLE = """
WITH s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_nn,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_dom,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_pos,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_uni
  FROM orders
), fk AS (
  SELECT CAST(count(*) AS BIGINT) AS v
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT 'fk_custkey_exists' AS "check", fk.v AS violations, s.n_rows, fk.v = 0 AS passed FROM fk, s
UNION ALL SELECT 'not_null_custkey', v_nn, n_rows, v_nn = 0 FROM s
UNION ALL SELECT 'positive_totalprice', v_pos, n_rows, v_pos = 0 FROM s
UNION ALL SELECT 'status_in_domain', v_dom, n_rows, v_dom = 0 FROM s
UNION ALL SELECT 'unique_orderkey', v_uni, n_rows, v_uni = 0 FROM s
ORDER BY "check"
"""


# ---------------------------------------------------------------------------
# Skew-salted join (result == plain join; only partitioning differs, so
# the oracle is simply the unsalted join)
# ---------------------------------------------------------------------------

def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = jn.salted_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        orders,
        on="o_orderkey",
        salt_on=F.col("l_linenumber"),
        n_salt=8,
    )
    revenue = (
        F.col("l_extendedprice").cast("decimal(14,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(7,4)")).cast("decimal(8,4)")
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(revenue).cast("decimal(24,2)").cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


JOIN_SKEW_SALTED_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
             * CAST(1 - CAST(l_discount AS DECIMAL(7,4)) AS DECIMAL(8,4))), 2)
            AS DECIMAL(24,2)) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# int8 embedding quantization
# ---------------------------------------------------------------------------

def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = sim.quantize_int8(emb)
    # CSV-serialize the code vector for the differential compare (array
    # columns don't row-sort in the harness); values stay bit-exact.
    return q.select(
        "vec_id",
        F.array_join(F.col("codes").cast("array<string>"), ",").alias("codes_csv"),
        "scale_min",
        "scale_max",
    ).orderBy("vec_id")


QUANTIZE_ORACLE = """
SELECT vec_id,
       array_to_string(
         CASE WHEN rng = 0.0
              THEN list_transform(x, v -> 0)
              ELSE list_transform(x, v ->
                   CAST(FLOOR((v - mn) * 254.0 / rng + 0.5) - 127 AS INTEGER))
         END, ',') AS codes_csv,
       mn AS scale_min, mx AS scale_max
FROM (
  SELECT vec_id, x, list_min(x) AS mn, list_max(x) AS mx,
         list_max(x) - list_min(x) AS rng
  FROM (SELECT vec_id,
               list_transform(embedding, e -> CAST(e AS DOUBLE)) AS x
        FROM embeddings)
)
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Bounded approx-percentile (same contract as agg_approx_distinct_bounded:
# both engines agree on the exact value; Spark additionally asserts its
# sketch estimate lands within the bound)
# ---------------------------------------------------------------------------

_APPROX_PCT_SPARK = """
SELECT l_returnflag,
       CAST(ROUND(percentile(l_extendedprice, 0.5), 4) AS DOUBLE) AS exact_median,
       abs(percentile_approx(l_extendedprice, 0.5, 10000)
           - percentile(l_extendedprice, 0.5))
         <= 0.01 * percentile(l_extendedprice, 0.5) AS approx_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

_APPROX_PCT_ORACLE = """
SELECT l_returnflag,
       CAST(ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS DOUBLE) AS exact_median,
       TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_approx_percentile_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx's KLL-style sketch differs from any other engine's,
    so (as with HLL) the estimate itself can't hash-match; both engines
    agree on the exact interpolated median and Spark asserts the sketch
    lands within ±1%."""
    return sql_query(spark, sf_dir, _APPROX_PCT_SPARK)


# ---------------------------------------------------------------------------
# Bucketed co-located join (physical layout; see operators/layout.py)
# ---------------------------------------------------------------------------

def _bucket_root(sf_dir: str) -> tuple[str, str]:
    """(warehouse dir, catalog-safe tag) for this dataset's bucketed copies."""
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = (os.path.basename(os.path.normpath(sf_dir)) or "default").replace(".", "_")
    return os.path.join(repo_root, "spark-warehouse", "bucketed", tag), tag


def bucketed_order_lineitem(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Both join sides bucketed ×16 on the order key (projected to the
    joined columns — bucketed copies are layout for ONE recurring join,
    not a second copy of the table)."""
    from direct_spark_sql_spark.operators import layout as lo

    root, tag = _bucket_root(sf_dir)
    o = lo.bucketed_table(
        spark, f"bkt_orders_{tag}", f"{root}/orders",
        lambda: load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"),
        ["o_orderkey"], 16,
    )
    l = lo.bucketed_table(
        spark, f"bkt_lineitem_{tag}", f"{root}/lineitem",
        lambda: load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"),
        ["l_orderkey"], 16,
    )
    return o, l


def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority over the BUCKETED copies: the big-big
    join runs bucket-to-bucket with no shuffle exchange (plan pinned in
    tests/test_plan_shapes.py::test_bucketed_join_has_no_exchange); the
    oracle is the plain unbucketed join — layout must change the plan,
    never the result."""
    from direct_spark_sql_spark.plans.tpch import _revenue

    o, l = bucketed_order_lineitem(spark, sf_dir)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(_revenue()).cast(DEC_OUT).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


JOIN_BUCKETED_ORACLE = f"""
SELECT o_orderpriority,
       {sum_money_sql(REVENUE_SQL)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Data-recipe operators: fractional-epoch upsampling, cluster-canonical pick
# ---------------------------------------------------------------------------

from direct_spark_sql_spark.operators.sampling import SAMPLE_BUCKETS as _EPOCH_BUCKETS

#: lang -> (full epochs, fractional-epoch bucket threshold).  en 2.3x,
#: fr 1.5x, de 1.0x; everything else defaults to 0.5x.  Thresholds are
#: ``frac * _EPOCH_BUCKETS`` pinned as integers so both engines compare
#: the same literals.
_EPOCH_WEIGHTS = {"en": (2, 3000), "fr": (1, 5000), "de": (1, 0)}
_EPOCH_DEFAULT = (0, 5000)
#: max copies any doc can get — bounds the explode AND the oracle's
#: generate_series, so it must stay derived from the recipe
_EPOCH_MAX = max(fl for fl, _th in [*_EPOCH_WEIGHTS.values(), _EPOCH_DEFAULT]) + 1


def corpus_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch mixture repetition — the "see curated sources 2.3
    times per pass" step of a pretraining data recipe.

    Each doc is replicated ``floor(w)`` times for its language's weight
    ``w``, plus one extra epoch for a deterministic ``frac(w)`` hash slice
    (salted per doc+lang, so the fractional epoch is an independent draw
    from any other sampling in the pipeline).  Map-only expansion via
    ``explode(sequence(...))`` — the blow-up factor is bounded by the
    recipe's max weight, never data-dependent — then one aggregation
    shuffle for the per-(lang, epoch) manifest this query emits."""
    from direct_spark_sql_spark.hashing import h64

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    bkt = (
        h64(F.concat_ws(":", F.lit("epoch"), F.col("lang"), F.col("doc_id")))
        % _EPOCH_BUCKETS
    )
    full_expr = None
    thr_expr = None
    for lang, (fl, th) in sorted(_EPOCH_WEIGHTS.items()):
        cond = F.col("lang") == lang
        full_expr = F.when(cond, fl) if full_expr is None else full_expr.when(cond, fl)
        thr_expr = F.when(cond, th) if thr_expr is None else thr_expr.when(cond, th)
    full_expr = full_expr.otherwise(F.lit(_EPOCH_DEFAULT[0]))
    thr_expr = thr_expr.otherwise(F.lit(_EPOCH_DEFAULT[1]))
    n_copies = (full_expr + F.when(bkt < thr_expr, 1).otherwise(0)).cast("int")
    inst = (
        d.withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .select(
            "lang",
            "n_chars",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("epoch"),
        )
    )
    return (
        inst.groupBy("lang", "epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_instances"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("lang", "epoch")
    )


def _epoch_upsample_oracle() -> str:
    from direct_spark_sql_spark.hashing import h64_sql

    bkt = h64_sql("'epoch:' || lang || ':' || CAST(doc_id AS VARCHAR)")
    full_cases = " ".join(
        f"WHEN '{lang}' THEN {fl}" for lang, (fl, _th) in sorted(_EPOCH_WEIGHTS.items())
    )
    thr_cases = " ".join(
        f"WHEN '{lang}' THEN {th}" for lang, (_fl, th) in sorted(_EPOCH_WEIGHTS.items())
    )
    return f"""
WITH d AS (
  SELECT lang, n_chars, ({bkt}) % {_EPOCH_BUCKETS} AS bkt FROM documents
),
c AS (
  SELECT lang, n_chars,
         (CASE lang {full_cases} ELSE {_EPOCH_DEFAULT[0]} END)
         + (CASE WHEN bkt < (CASE lang {thr_cases} ELSE {_EPOCH_DEFAULT[1]} END)
                 THEN 1 ELSE 0 END) AS n_copies
  FROM d
),
e AS (
  SELECT c.lang, c.n_chars, gs.epoch
  FROM c JOIN generate_series(1, {_EPOCH_MAX}) gs(epoch) ON gs.epoch <= c.n_copies
)
SELECT lang, CAST(epoch AS INT) AS epoch,
       COUNT(*) AS n_instances,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM e GROUP BY lang, epoch ORDER BY lang, epoch
"""


def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-argmax canonical selection over near-duplicate *clusters*:
    MinHash-LSH pairs -> connected components -> keep the highest-quality
    member per cluster (ties broken by min doc_id).

    Extends ``corpus_curation`` (canonical = min id within exact
    fingerprint groups) to transitive near-dup clusters with a
    quality-based winner — "keep the best copy", not "keep the first".
    The argmax and the cluster size come from ONE groupBy(component)
    aggregate — ``max(struct(quality_score, -doc_id))`` orders
    lexicographically exactly like the old (quality DESC, doc_id ASC)
    rank window but combines map-side, so a giant boilerplate cluster
    can't serialize into a single window partition (VERDICT r7 #1),
    and the count-window shuffle disappears entirely."""
    from direct_spark_sql_spark.operators import dedup as dd
    from direct_spark_sql_spark.operators import text as tx
    from direct_spark_sql_spark.operators.graph import connected_components

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dd.minhash_near_duplicates(d, min_est_jaccard=0.5)
    cc = connected_components(pairs)  # (node, component)
    members = d.join(cc, d.doc_id == cc.node).select("doc_id", "text", "component")
    scored = tx.quality_features(members).select(
        "component", "doc_id", "quality_score"
    )
    best = scored.groupBy("component").agg(
        F.max(
            F.struct(
                F.col("quality_score"), (-F.col("doc_id")).alias("neg_id")
            )
        ).alias("b"),
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
    )
    return best.select(
        F.col("component").alias("cluster_id"),
        (-F.col("b.neg_id")).cast("long").alias("canonical_id"),
        "cluster_size",
        F.col("b.quality_score").alias("quality_score"),
    ).orderBy("cluster_id")


def _cluster_canonical_oracle() -> str:
    from direct_spark_sql_spark.plans.pipeline import _STOP_SQL, _minhash_pairs_ctes

    from direct_spark_sql_spark.plans.pipeline import _cc_min_label_ctes

    return f"""
WITH {_minhash_pairs_ctes()},
edges AS MATERIALIZED (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
{_cc_min_label_ctes()},
qt AS (
  SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents
  WHERE doc_id IN (SELECT node FROM comp)
),
qf AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
         CAST(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS BIGINT) AS n_stop
  FROM qt
),
q AS (
  SELECT doc_id,
         (CAST(n_unique_tokens AS DOUBLE) / n_tokens) * 0.5
           + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.2
           + LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3 AS quality_score
  FROM qf
),
ranked AS (
  SELECT comp.component AS cluster_id, comp.node AS doc_id, q.quality_score,
         ROW_NUMBER() OVER (PARTITION BY comp.component
                            ORDER BY q.quality_score DESC, comp.node) AS rk,
         COUNT(*) OVER (PARTITION BY comp.component) AS cluster_size
  FROM comp JOIN q ON q.doc_id = comp.node
)
SELECT cluster_id, doc_id AS canonical_id,
       CAST(cluster_size AS BIGINT) AS cluster_size, quality_score
FROM ranked WHERE rk = 1 ORDER BY cluster_id
"""


# ---------------------------------------------------------------------------
# Deterministic negative-pair sampling (contrastive training data)
# ---------------------------------------------------------------------------

_NEG_PER_ANCHOR = 4


def corpus_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor doc draws ``_NEG_PER_ANCHOR`` pseudo-random partner ids via a
    salted hash over the id space, keeps only draws that hit an existing,
    different document, and emits (anchor, draw index, negative).

    Hash-based draws (not ``rand()``) make the pairs replayable across
    engines, re-runs, and backfills — the same property the sampling
    family guarantees.  The id-space bound is a 1-row broadcast aggregate
    (the ``agg_histogram`` pattern); the existence check is an equi-join,
    so the whole op is two broadcasts + one hash join at any scale."""
    from direct_spark_sql_spark.hashing import h64

    d = load_table(spark, sf_dir, "documents")
    anchors = d.select("doc_id").filter(F.col("doc_id") < 200)
    bound = d.agg((F.max("doc_id") + 1).alias("id_space"))
    cands = (
        anchors.join(F.broadcast(bound))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.lit(_NEG_PER_ANCHOR))).alias("j"),
            F.col("id_space"),
        )
        .select(
            "doc_id",
            "j",
            (h64(F.concat_ws(":", F.lit("neg"), F.col("doc_id"), F.col("j")))
             % F.col("id_space")).alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("doc_id"))
    )
    # doc_id is the table's primary key (FIXTURES.md), so no distinct:
    # the existence check is a plain equi-join against the key column
    existing = d.select(F.col("doc_id").alias("neg_id"))
    return cands.join(existing, "neg_id").select(
        "doc_id", "j", "neg_id"
    ).orderBy("doc_id", "j")


def _negative_pairs_oracle() -> str:
    from direct_spark_sql_spark.hashing import h64_sql

    draw = h64_sql("'neg:' || CAST(a.doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)")
    return f"""
WITH s AS (SELECT MAX(doc_id) + 1 AS id_space FROM documents),
a AS (SELECT doc_id FROM documents WHERE doc_id < 200),
c AS (
  SELECT a.doc_id, j, ({draw}) % s.id_space AS neg_id
  FROM a CROSS JOIN s, generate_series(1, {_NEG_PER_ANCHOR}) g(j)
)
SELECT c.doc_id, CAST(c.j AS INT) AS j, c.neg_id
FROM c JOIN (SELECT doc_id AS neg_id FROM documents) e USING (neg_id)
WHERE c.neg_id <> c.doc_id
ORDER BY c.doc_id, c.j
"""


# ---------------------------------------------------------------------------
# Schema evolution: mergeSchema read across writer generations
# ---------------------------------------------------------------------------


def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift read: two writer "generations" of the same table — an
    old one without ``n_chars`` and a new one with it — read back as one
    dataset via ``mergeSchema``, with the missing column surfacing as NULL
    for old-generation rows.  At 100 TB schema drift across months of
    writer versions is the norm, not the exception; this pins Spark's
    merged-schema scan + NULL-fill semantics against an oracle that
    replays the union."""
    from direct_spark_sql_spark.sources.registry import dataset_tag, warehouse_path

    d = load_table(spark, sf_dir, "documents")
    root = warehouse_path("schema_evo", dataset_tag(sf_dir))
    d.select("doc_id", "lang").write.mode("overwrite").parquet(f"{root}/gen=1")
    d.select("doc_id", "lang", "n_chars").write.mode("overwrite").parquet(
        f"{root}/gen=2"
    )
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{root}/gen=1", f"{root}/gen=2"
    )
    return (
        merged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count("n_chars").cast("long").alias("n_with_chars"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("lang")
    )


SCHEMA_EVOLUTION_ORACLE = """
WITH merged AS (
  SELECT lang, CAST(NULL AS BIGINT) AS n_chars FROM documents
  UNION ALL
  SELECT lang, n_chars FROM documents
)
SELECT lang,
       COUNT(*) AS n_rows,
       COUNT(n_chars) AS n_with_chars,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM merged GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Partitioned sink + partition-pruned read-back
# ---------------------------------------------------------------------------


_SYNTH_N = 5000


def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 custom Python data source: a deterministic partitioned
    synthetic-corpus generator (sources/pysource.py) — rows materialize
    inside executors (16 index-range splits, no driver data, no files)
    and the full 5000-row output is content-checked against the DuckDB
    oracle regenerating the identical MD5 formula over generate_series."""
    from direct_spark_sql_spark.sources import pysource

    pysource.register(spark)
    return (
        spark.read.format("synthcorpus")
        .option("n", str(_SYNTH_N))
        .option("parts", "16")
        .load()
        .orderBy("doc_id")
    )


def _synth_source_oracle() -> str:
    from direct_spark_sql_spark.sources.pysource import synth_corpus_oracle_sql

    return synth_corpus_oracle_sql(_SYNTH_N)


def export_partitioned_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout partitioned export round-trip: write documents
    partitioned by ``lang`` (the 100 TB sink layout — one directory per
    partition value, so downstream readers skip whole directories), then
    read back with a partition filter and aggregate.  The oracle is the
    same aggregate over the source table, so a partition-column mixup,
    dropped rows, or type drift through the sink breaks the match.  The
    read-back filter prunes at the directory level (PartitionFilters, not
    data filters)."""
    from direct_spark_sql_spark.sources.registry import dataset_tag, warehouse_path

    d = load_table(spark, sf_dir, "documents")
    out = warehouse_path("export", f"docs_by_lang_{dataset_tag(sf_dir)}")
    d.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out).filter(F.col("lang").isin("en", "de"))
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("lang")
    )


EXPORT_PARTITIONED_ORACLE = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE lang IN ('en', 'de')
GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Content-defined chunking (rolling-hash boundaries) + shared-chunk dedup
# ---------------------------------------------------------------------------


def _cdc_boundary(i_expr: str = "i") -> str:
    """SQL predicate (identical text in Spark and DuckDB): position
    ``i_expr`` ends a chunk iff the gear hash of the 8-gram ending there
    is 0 mod 64 (expected chunk ~64 chars).  Stateless-divisor
    content-defined chunking: boundaries depend only on local content, so
    insertions shift chunk *positions* but not chunk *identities* —
    identical passages in different documents produce identical chunks.
    (No min-chunk-size clamp: that would chain each boundary on the
    previous one — sequential — where the divisor rule stays
    embarrassingly parallel per position.)  Coefficients are shared with
    the numpy implementation (operators/dedup.py:CDC_COEFFS)."""
    from direct_spark_sql_spark.operators.dedup import CDC_COEFFS, CDC_DIVISOR

    terms = " + ".join(
        f"{c} * ascii(substr(text, {i_expr} - {7 - k}, 1))"
        for k, c in enumerate(CDC_COEFFS)
    )
    return f"({terms}) % {CDC_DIVISOR} = 0"


def _cdc_tail(h64f) -> str:
    """Shared chunk-hash aggregation tail over a ``chunks`` CTE."""
    return f"""
SELECT ({h64f('chunk')}) AS chunk_hash,
       CAST(MIN(chunk_len) AS BIGINT) AS chunk_len,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM chunks
GROUP BY chunk_hash
HAVING COUNT(DISTINCT doc_id) > 1
ORDER BY n_docs DESC, chunk_hash
"""


def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking with cross-document shared-chunk detection
    — the passage-level dedup primitive robust to insertions/reordering
    (exact-substring span dedup catches aligned spans; CDC catches the
    same passage at *any* offset).

    Per-character boundary hashing is the one hot path in this repo where
    JVM expression trees lose: both the per-position-explode MD5 form and
    an array-HOF form (filter/transform lambdas evaluate interpreted)
    measured 6-8 s at sf0.1, vs well under 1 s for the Arrow-batched
    vectorized chunker (operators/dedup.py:cdc_chunk_table) — one int64
    windowed dot product per document, no per-character rows.  The only
    shuffle is the final chunk-hash aggregation."""
    from direct_spark_sql_spark.hashing import h64 as h64_col
    from direct_spark_sql_spark.operators import dedup as dd

    d = load_table(spark, sf_dir, "documents")
    ch = dd.cdc_chunk_table(d)
    return (
        ch.groupBy(h64_col(F.col("chunk")).alias("chunk_hash"))
        .agg(
            F.min("chunk_len").cast("long").alias("chunk_len"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), "chunk_hash")
    )


def _cdc_oracle() -> str:
    """DuckDB replay: same boundary predicate and chunk semantics, via the
    per-position generate_series shape (the oracle optimizes for clarity,
    not throughput)."""
    from direct_spark_sql_spark.hashing import h64_sql

    return f"""
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE length(text) >= 8 AND length(text) <= 1024),
pos AS (
  SELECT doc_id, text, i FROM d, generate_series(8, 1024) p(i)
  WHERE i <= length(text)
),
bounds AS (
  SELECT doc_id, i FROM pos WHERE {_cdc_boundary("i")}
  UNION
  SELECT doc_id, length(text) AS i FROM d
),
c AS (
  SELECT doc_id, i AS chunk_end,
         LAG(i, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) AS prev_end
  FROM bounds
),
chunks AS (
  SELECT c.doc_id, chunk_end - prev_end AS chunk_len,
         substr(d.text, prev_end + 1, chunk_end - prev_end) AS chunk
  FROM c JOIN d ON d.doc_id = c.doc_id
  WHERE chunk_end > prev_end
)
{_cdc_tail(h64_sql)}"""


# ---------------------------------------------------------------------------
# Greedy longest-match subword tokenization (BPE-style apply) via recursion
# ---------------------------------------------------------------------------

# Vocabulary derivation is part of the query: character n-grams (len 2-4)
# occurring at >= 3 (word, position) sites, full words excluded (forcing
# real subword splits), plus every single character as the guaranteed
# fallback.  Tokenization is the recursive longest-prefix strip: each step
# joins the remaining suffix to the vocab and keeps a match only if no
# longer match exists (anti-join via LEFT JOIN .. IS NULL — recursive terms
# allow joins but no aggregates/windows in either engine).  Termination is
# structural: every step consumes >= 1 char, so depth <= max word length;
# words are explicitly capped at 64 chars (matching the position series
# below) — longer "words" are runaway strings, not vocabulary.
_SUBWORD_SPARK = """
WITH RECURSIVE
t AS (
  SELECT explode(split(lower(text), '[^a-z]+')) AS word FROM documents
),
w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM t
      WHERE word <> '' AND length(word) <= 64 GROUP BY word),
grams AS (
  SELECT substr(w.word, i, len) AS tok, len
  FROM w
  LATERAL VIEW explode(sequence(2, 4)) l AS len
  LATERAL VIEW explode(sequence(1, 64)) p AS i
  WHERE i + len - 1 <= length(w.word)
),
vocab AS (
  SELECT tok, len FROM (
    SELECT tok, len, COUNT(*) AS cnt FROM grams GROUP BY tok, len
  ) g WHERE cnt >= 3 AND NOT EXISTS (SELECT 1 FROM w WHERE w.word = g.tok)
  UNION
  SELECT DISTINCT substr(word, i, 1) AS tok, 1 AS len
  FROM w LATERAL VIEW explode(sequence(1, 64)) p AS i WHERE i <= length(word)
),
r AS (
  SELECT word, word AS rest, CAST(NULL AS STRING) AS tok FROM w
  UNION ALL
  SELECT r.word, substr(r.rest, v.len + 1) AS rest, v.tok
  FROM r
  JOIN vocab v ON v.tok = substr(r.rest, 1, v.len)
  LEFT JOIN vocab v2 ON v2.len > v.len AND v2.tok = substr(r.rest, 1, v2.len)
  WHERE r.rest <> '' AND v2.tok IS NULL
)
SELECT r.tok AS token,
       CAST(COUNT(DISTINCT r.word) AS BIGINT) AS n_words,
       CAST(SUM(w.freq) AS BIGINT) AS n_occurrences
FROM r JOIN w ON w.word = r.word
WHERE r.tok IS NOT NULL
GROUP BY r.tok
ORDER BY n_occurrences DESC, token
"""

_SUBWORD_ORACLE = """
WITH RECURSIVE
t AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word FROM documents
),
w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM t
      WHERE word <> '' AND length(word) <= 64 GROUP BY word),
grams AS (
  SELECT substr(w.word, i, len) AS tok, len
  FROM w, generate_series(2, 4) l(len), generate_series(1, 64) p(i)
  WHERE i + len - 1 <= length(w.word)
),
vocab AS (
  SELECT tok, len FROM (
    SELECT tok, len, COUNT(*) AS cnt FROM grams GROUP BY tok, len
  ) g WHERE cnt >= 3 AND NOT EXISTS (SELECT 1 FROM w WHERE w.word = g.tok)
  UNION
  SELECT DISTINCT substr(word, i, 1) AS tok, 1 AS len
  FROM w, generate_series(1, 64) p(i) WHERE i <= length(word)
),
r AS (
  SELECT word, word AS rest, CAST(NULL AS VARCHAR) AS tok FROM w
  UNION ALL
  SELECT r.word, substr(r.rest, v.len + 1) AS rest, v.tok
  FROM r
  JOIN vocab v ON v.tok = substr(r.rest, 1, v.len)
  LEFT JOIN vocab v2 ON v2.len > v.len AND v2.tok = substr(r.rest, 1, v2.len)
  WHERE r.rest <> '' AND v2.tok IS NULL
)
SELECT r.tok AS token,
       CAST(COUNT(DISTINCT r.word) AS BIGINT) AS n_words,
       CAST(SUM(w.freq) AS BIGINT) AS n_occurrences
FROM r JOIN w ON w.word = r.word
WHERE r.tok IS NOT NULL
GROUP BY r.tok
ORDER BY n_occurrences DESC, token
"""


def text_subword_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match subword tokenization (the *apply* half of a
    BPE-style tokenizer) executed as one recursive SQL plan: vocabulary
    induction (frequent char n-grams, full words excluded, single-char
    fallback) and per-word longest-prefix stripping, ending in corpus
    token statistics.

    Tokenizes *distinct* words (freq-weighted join-back), so the recursion
    scales with vocabulary size, not corpus size — the standard trick that
    makes tokenizer application feasible at 100 TB: the heavy per-doc work
    is an equi-join from words to their precomputed token sequences."""
    return sql_query(spark, sf_dir, _SUBWORD_SPARK)


def graph_triangle_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the near-duplicate pair graph — the
    "how clique-like are my duplicate clusters" diagnostic (a triangle
    means three docs that are all pairwise near-dups, i.e. a true clique
    nucleus rather than a chain collapsed by connected components).

    Uses the standard orientation trick: edges are stored once with
    ``id_a < id_b``, so the two-hop join ``(a,b)+(b,c)`` closed by
    ``(a,c)`` counts each triangle exactly once and never materializes a
    direction-doubled edge list.  Both hops are hash equi-joins on edge
    endpoints; at 100 TB this is the degree-bounded edge-partitioned plan
    (no broadcast of the full edge set, no cartesian)."""
    from direct_spark_sql_spark.operators import dedup as dd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # localCheckpoint: the pair list is consumed three times below and
    # ReuseExchange does not unify the three aliased subtrees — without it
    # the whole MinHash pipeline executes once per alias (measured 3x).
    # Same precedent as the connected-components fixpoint (graph.py).
    p = dd.minhash_near_duplicates(d).select("id_a", "id_b").localCheckpoint()
    e1, e2, e3 = p.alias("e1"), p.alias("e2"), p.alias("e3")
    return (
        e1.join(e2, F.col("e2.id_a") == F.col("e1.id_b"))
        .join(
            e3,
            (F.col("e3.id_a") == F.col("e1.id_a"))
            & (F.col("e3.id_b") == F.col("e2.id_b")),
        )
        .select(
            F.col("e1.id_a").alias("id_a"),
            F.col("e1.id_b").alias("id_b"),
            F.col("e2.id_b").alias("id_c"),
        )
        .orderBy("id_a", "id_b", "id_c")
    )


#: PageRank fixed-point scale: ranks are integers in units of 1e-12, all
#: updates are integer floor arithmetic — bit-exact in any engine, unlike
#: double PageRank whose neighbor sums are order-dependent.
_PR_SCALE = 1_000_000_000_000
_PR_BASE = _PR_SCALE * 15 // 100  # (1 - damping) * SCALE, damping = 0.85
_PR_ITERS = 5


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the near-duplicate graph — ranks the most
    "central" documents of each duplicate neighborhood (highly-copied docs
    score high; peripheral variants low).

    All arithmetic is integer: contribution = rank DIV degree, update =
    BASE + (sum * 85) DIV 100, so five distributed iterations produce the
    identical BIGINT ranks in any engine (a double implementation would
    diverge in the last ulp depending on reduction order).  Each iteration
    is one join + one aggregation; lineage is truncated per iteration with
    localCheckpoint (the CC precedent) so the plan stays flat at any
    iteration count."""
    from direct_spark_sql_spark.operators import dedup as dd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dd.minhash_near_duplicates(d).select("id_a", "id_b").localCheckpoint()
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(_PR_SCALE).cast("long").alias("rank")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(F.col("dst"), F.expr("rank DIV deg").alias("c"))
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(_PR_BASE) + F.expr("s * 85 DIV 100")).cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.orderBy(F.desc("rank"), "node")


def _pagerank_oracle() -> str:
    from direct_spark_sql_spark.plans.pipeline import _minhash_pairs_ctes

    its = []
    prev = "r0"
    for n in range(1, _PR_ITERS + 1):
        its.append(f"""
it{n} AS (
  SELECT e.dst AS node,
         CAST({_PR_BASE} + (SUM(r.rank // d.deg) * 85) // 100 AS BIGINT) AS rank
  FROM edges e JOIN {prev} r ON r.node = e.src JOIN deg d ON d.node = e.src
  GROUP BY e.dst
)""")
        prev = f"it{n}"
    return f"""
WITH {_minhash_pairs_ctes()},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM deg),
{",".join(its)}
SELECT node, rank FROM {prev} ORDER BY rank DESC, node
"""


_BFS_MAX_DEPTH = 4


def graph_bfs_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hop BFS over the near-duplicate graph from its smallest node:
    (node, depth) for every node within {_BFS_MAX_DEPTH} hops, min-depth
    semantics.  Each hop is ONE frontier-to-edges equi-join + an anti-join
    against the visited set (lineage truncated per hop, the CC/PageRank
    precedent) — the traversal primitive the graph family lacked; the
    oracle is a depth-capped recursive CTE reduced to MIN(depth)."""
    from direct_spark_sql_spark.operators import dedup as dd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dd.minhash_near_duplicates(d).select("id_a", "id_b").localCheckpoint()
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    seed = edges.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("long").alias("depth")
    )
    visited = seed.localCheckpoint()
    frontier = visited
    for depth in range(1, _BFS_MAX_DEPTH + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(depth).cast("long").alias("depth"))
            .localCheckpoint()
        )
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt
    return visited.orderBy("depth", "node")


def _bfs_oracle() -> str:
    from direct_spark_sql_spark.plans.pipeline import _minhash_pairs_ctes

    return f"""
WITH RECURSIVE {_minhash_pairs_ctes()},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
seed AS (SELECT MIN(src) AS node FROM edges),
walk(node, depth) AS (
  SELECT node, 0 FROM seed
  UNION ALL
  SELECT e.dst, w.depth + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.depth < {_BFS_MAX_DEPTH}
)
SELECT node, CAST(MIN(depth) AS BIGINT) AS depth
FROM walk GROUP BY node ORDER BY depth, node
"""


_SSSP_ROUNDS = 6


def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (bounded Bellman-Ford) over
    the near-duplicate graph from its smallest node — the weighted
    completion of the graph family (CC / PageRank / BFS / triangles).
    Edges = near-dup pairs (chords) unioned with per-lang doc-id chains
    (lag window) so multiple routes exist; weights are deterministic
    integers 1..9 from the MD5 hash of the canonical pair, so both
    engines walk the identical graph.
    Each relaxation round is one frontier-to-edges equi-join + a min
    aggregation with lineage truncated per round (the CC precedent);
    {_SSSP_ROUNDS} rounds = exact shortest paths using at most
    {_SSSP_ROUNDS} edges, which the depth-capped recursive-CTE oracle
    reproduces with MIN(dist) over enumerated walks."""
    from pyspark.sql import Window

    from direct_spark_sql_spark.hashing import h64
    from direct_spark_sql_spark.operators import dedup as dd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pairs = dd.minhash_near_duplicates(
        d.select("doc_id", "text")
    ).select("id_a", "id_b").localCheckpoint()
    # densify with per-lang doc-id chains (lag window): long deterministic
    # paths whose near-dup chords create genuine alternative routes, so
    # the min-over-paths relaxation is actually exercised (the raw
    # near-dup graph alone is 2-3-node cliques)
    prev = F.lag("doc_id").over(Window.partitionBy("lang").orderBy("doc_id"))
    chain = (
        d.select("lang", "doc_id")
        .select(prev.alias("id_a"), F.col("doc_id").alias("id_b"))
        .filter(F.col("id_a").isNotNull())
    )
    allp = pairs.union(chain).distinct()
    w = (
        F.lit(1)
        + h64(F.concat_ws("-", F.col("id_a"), F.col("id_b"))) % 9
    ).cast("long")
    wp = allp.select("id_a", "id_b", w.alias("w"))
    edges = (
        wp.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "w")
        .union(wp.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "w"))
        .distinct()
        .localCheckpoint()
    )
    from direct_spark_sql_spark.operators.graph import bellman_ford

    seed = edges.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    return bellman_ford(edges, seed, _SSSP_ROUNDS).orderBy("dist", "node")


def _sssp_oracle() -> str:
    from direct_spark_sql_spark.hashing import h64_sql
    from direct_spark_sql_spark.plans.pipeline import _minhash_pairs_ctes

    pair_key = "CAST(id_a AS VARCHAR) || '-' || CAST(id_b AS VARCHAR)"
    return f"""
WITH RECURSIVE {_minhash_pairs_ctes()},
chain AS (
  SELECT LAG(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS id_a,
         doc_id AS id_b
  FROM documents
),
allp AS (
  SELECT id_a, id_b FROM pairs
  UNION
  SELECT id_a, id_b FROM chain WHERE id_a IS NOT NULL
),
wp AS (
  SELECT id_a, id_b,
         CAST(1 + {h64_sql(pair_key)} % 9 AS BIGINT) AS w
  FROM allp
),
edges AS (
  SELECT id_a AS src, id_b AS dst, w FROM wp
  UNION
  SELECT id_b, id_a, w FROM wp
),
seed AS (SELECT MIN(src) AS node FROM edges),
walk(node, dist, hops) AS (
  SELECT node, CAST(0 AS BIGINT), 0 FROM seed
  UNION ALL
  SELECT e.dst, w.dist + e.w, w.hops + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.hops < {_SSSP_ROUNDS}
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY dist, node
"""


def _triangle_oracle() -> str:
    from direct_spark_sql_spark.plans.pipeline import _minhash_pairs_ctes

    return f"""
WITH {_minhash_pairs_ctes()},
p AS (SELECT id_a, id_b FROM pairs)
SELECT e1.id_a AS id_a, e1.id_b AS id_b, e2.id_b AS id_c
FROM p e1
JOIN p e2 ON e2.id_a = e1.id_b
JOIN p e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
ORDER BY id_a, id_b, id_c
"""


#: Per-source absolute token budgets for corpus_token_budget_mix —
#: interpolated into BOTH the Spark CASE and the oracle SQL.  Values
#: chosen so rates are fractional at the driver scales (sf0.01 sources
#: hold ~1.1-1.6k tokens each) and clamp to keep-all at tiny scales,
#: exercising both sides of the least().
_TOKEN_BUDGETS = {"src1": 800, "src3": 500, "src7": 650}
_TOKEN_BUDGET_DEFAULT = 300


def corpus_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absolute token-budget corpus mixing — "take ~N tokens per source"
    (the Chinchilla-style assembly step), via
    operators/sampling.py:token_budget_sample: per-source keep-rates
    derived from measured token volume with all-integer arithmetic, a
    domain-salted deterministic hash draw, and a map-only keep filter
    (the only shuffle is the tiny per-source token SUM, broadcast back).
    Reports the realized per-source (docs, tokens) against the budget."""
    from direct_spark_sql_spark.operators import sampling as sp
    from direct_spark_sql_spark.operators import text as tx

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    # localCheckpoint (r13): token_budget_sample reads this frame twice —
    # the per-source rate aggregate and the keep-filter probe side — and
    # each reference re-ran the corpus scan+tokenize.  Materializing the
    # NARROW (doc_id, source, n_tokens) proxy (the bm25/dsir precedent)
    # tokenizes once; lineage-only, same rows.
    toks = d.select(
        "doc_id", "source", tx.token_count("text").alias("n_tokens")
    ).localCheckpoint()
    kept = sp.token_budget_sample(
        toks, key="doc_id", domain="source", token_col="n_tokens",
        budgets=_TOKEN_BUDGETS, default_budget=_TOKEN_BUDGET_DEFAULT,
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("kept_tokens"),
        )
        .orderBy("source")
    )


def _token_budget_oracle() -> str:
    from direct_spark_sql_spark.hashing import h64_sql
    from direct_spark_sql_spark.operators.sampling import SAMPLE_BUCKETS

    case = "CASE source " + " ".join(
        f"WHEN '{s}' THEN {b}" for s, b in sorted(_TOKEN_BUDGETS.items())
    ) + f" ELSE {_TOKEN_BUDGET_DEFAULT} END"
    bucket = h64_sql("source || ':' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH t AS (SELECT doc_id, source, {TOKS_SQL} AS toks FROM documents),
d AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
rates AS (
  SELECT source,
         LEAST({SAMPLE_BUCKETS},
               (CAST({case} AS BIGINT) * {SAMPLE_BUCKETS})
                 // GREATEST(SUM(n_tokens), 1)) AS rate_buckets
  FROM d GROUP BY source
),
kept AS (
  SELECT d.source, d.n_tokens
  FROM d JOIN rates USING (source)
  WHERE {bucket} % {SAMPLE_BUCKETS} < rate_buckets
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
FROM kept GROUP BY source ORDER BY source
"""


QUERIES = [
    Query("corpus_token_budget_mix", corpus_token_budget_mix,
          _token_budget_oracle(), ("sampling", "pipeline"), bench=True,
          doc="absolute per-source token-budget mixing: integer-exact "
              "rate = budget*buckets div measured token volume, broadcast "
              "rates + map-only salted-hash keep filter"),
    Query("corpus_negative_pairs", corpus_negative_pairs,
          _negative_pairs_oracle(), ("sampling", "pipeline"),
          doc="deterministic hash-draw negative sampling for contrastive "
              "pairs; 1-row broadcast bound + existence equi-join"),
    Query("source_schema_evolution", source_schema_evolution,
          SCHEMA_EVOLUTION_ORACLE, ("source", "pipeline"),
          doc="mergeSchema read across writer generations, NULL-fill for "
              "the drifted column pinned against a union replay"),
    Query("source_python_datasource", source_python_datasource,
          _synth_source_oracle(), ("source", "pipeline"),
          doc="Spark 4 Python DataSource: executor-side deterministic "
              "generator with an explicit split plan; full content "
              "regenerated bit-exactly by the oracle"),
    Query("export_partitioned_readback", export_partitioned_readback,
          EXPORT_PARTITIONED_ORACLE, ("sink", "layout", "pipeline"),
          doc="partitionBy(lang) parquet sink + partition-pruned read-back, "
              "values round-trip exactly"),
    Query("dedup_cdc_chunks", dedup_cdc_chunks, _cdc_oracle(),
          ("dedup", "text", "pipeline"), bench=True,
          doc="content-defined chunking (8-gram rolling hash, divisor 64) "
              "with cross-doc shared-chunk detection"),
    Query("text_subword_tokenize", text_subword_tokenize, _SUBWORD_ORACLE,
          ("text", "recursion", "pipeline"),
          doc="BPE-style longest-match subword tokenizer: vocab induction + "
              "recursive prefix strip + corpus token stats, one SQL plan"),
    Query("graph_pagerank", graph_pagerank, _pagerank_oracle(),
          ("graph", "pipeline"),
          doc="fixed-point integer PageRank (5 iterations) over the "
              "near-dup graph — bit-exact iterative algorithm"),
    Query("graph_bfs_khop", graph_bfs_khop, _bfs_oracle(),
          ("graph", "pipeline"),
          doc="k-hop BFS traversal (min-depth) from the smallest node of "
              "the near-dup graph; frontier joins + anti-join visited set"),
    Query("graph_sssp_weighted", graph_sssp_weighted, _sssp_oracle(),
          ("graph", "pipeline"),
          doc=f"bounded Bellman-Ford weighted SSSP ({_SSSP_ROUNDS} relaxation rounds) "
              "over the near-dup graph, deterministic hash weights; "
              "depth-capped recursive-CTE oracle"),
    Query("graph_triangle_enum", graph_triangle_enum, _triangle_oracle(),
          ("dedup", "graph", "pipeline"),
          doc="oriented-edge triangle enumeration over the near-dup graph "
              "(clique diagnostics), two hash joins, no broadcast blowup"),
    Query("corpus_epoch_upsample", corpus_epoch_upsample, _epoch_upsample_oracle(),
          ("sampling", "pipeline"), bench=True,
          doc="fractional-epoch mixture repetition (en 2.3x / fr 1.5x / de 1x / "
              "rest 0.5x), bounded explode + manifest agg"),
    Query("dedup_cluster_canonical", dedup_cluster_canonical,
          _cluster_canonical_oracle(), ("dedup", "pipeline"),
          doc="quality-argmax canonical per near-dup connected component"),
    Query("join_bucketed_colocated", join_bucketed_colocated, JOIN_BUCKETED_ORACLE,
          ("join", "layout", "pipeline"),
          doc="both sides pre-bucketed x16 on the order key: zero-exchange "
              "big-big join; result equals the unbucketed oracle"),
    Query("doc_chunking", doc_chunking, DOC_CHUNKING_ORACLE,
          ("text", "pipeline", "retrieval"), bench=True,
          doc="overlapping token-window chunks (32/24) with offsets, "
              "pure JVM generate — the RAG/pretraining chunker"),
    Query("bm25_search", bm25_search, _bm25_oracle(),
          ("text", "pipeline", "retrieval"), bench=True,
          doc="BM25 top-k keyword retrieval: filtered-explode tf, "
              "broadcast df/stats, fixed-point exact scores"),
    Query("bm25_indexed_search", bm25_indexed_search, _bm25_oracle(),
          ("text", "pipeline", "retrieval"), bench=True,
          doc="BM25 from a materialized term-clustered inverted index "
              "(build-once/query-many); identical scores to bm25_search"),
    Query("rag_chunk_search", rag_chunk_search, _rag_chunk_oracle(),
          ("text", "pipeline", "retrieval"),
          doc="RAG passage retrieval: chunk the corpus, BM25-score the "
              "chunks, return top passages with (doc, chunk) provenance"),
    Query("privacy_pseudonymize_join", privacy_pseudonymize_join,
          _pseudonymize_oracle(), ("pipeline", "privacy"),
          doc="stable salted-hash pseudonyms replace identifiers on both "
              "sides of an FK; token joins reproduce raw-key analytics"),
    Query("privacy_k_anonymity", privacy_k_anonymity, _K_ANONYMITY_ORACLE,
          ("privacy", "pipeline"), bench=True,
          doc="k-anonymity release audit: sub-k equivalence classes over "
              "(source, lang, 256-char length band) — one QI hash agg, "
              "no window/self-join"),
    Query("privacy_l_diversity", privacy_l_diversity, _L_DIVERSITY_ORACLE,
          ("privacy", "pipeline"),
          doc="l-diversity homogeneity-attack audit: QI classes whose "
              "sensitive attribute (lang) takes < L distinct values — one "
              "distinct-aggregate hash agg, bounded output"),
    Query("privacy_t_closeness", privacy_t_closeness, _t_closeness_oracle(),
          ("privacy", "pipeline"),
          doc="t-closeness audit: per-QI-class total-variation distance "
              "from the corpus lang distribution in exact integer units "
              "(order-independent), classes beyond t=0.4 flagged"),
    Query("privacy_dp_release", privacy_dp_release, _dp_release_oracle(),
          ("privacy", "pipeline"),
          doc="differentially-private histogram release over the FIXED "
              "declared QI domain (empty cells released too — row "
              "presence no longer leaks; ADVICE r9): seeded integer "
              "two-sided-geometric noise at epsilon=1 via literal "
              "CDF-breakpoint thresholds (bit-exact replayable), "
              "zero-clamped; completes detect -> release"),
    Query("privacy_dp_epsilon_ledger", privacy_dp_epsilon_ledger,
          _dp_epsilon_ledger_oracle(), ("privacy", "pipeline"),
          doc="cumulative DP budget per QI class across DP_RELEASE_LOG: "
              "parallel composition within a release, sequential across "
              "releases (epsilon adds); observed-domain releases touched "
              "only non-empty cells, declared-domain ones every cell"),
    Query("privacy_delete_propagation", privacy_delete_propagation,
          PRIVACY_DELETE_ORACLE, ("merge", "pipeline", "privacy"),
          doc="right-to-be-forgotten: deletion requests anti-join down "
              "the FK chain (customer -> orders -> lineitem), per-table "
              "retained/deleted audit"),
    Query("merge_cdc_upsert", merge_cdc_upsert, MERGE_CDC_ORACLE,
          ("merge", "pipeline"),
          doc="latest-wins CDC MERGE (insert/update/delete changeset), "
              "one shuffle on the key"),
    Query("merge_snapshot_diff", merge_snapshot_diff, _snapshot_diff_oracle(),
          ("merge", "pipeline"),
          doc="row-level table-version diff on (key, row-hash) projections: "
              "added/removed/changed/unchanged"),
    Query("merge_scd2_history", merge_scd2_history, MERGE_SCD2_ORACLE,
          ("merge", "pipeline"),
          doc="SCD-2 validity intervals via lead() over change sequence"),
    Query("quality_constraint_audit", quality_constraint_audit, CONSTRAINT_AUDIT_ORACLE,
          ("quality", "pipeline"),
          doc="declarative expectations: null/domain/range/unique in one scan + anti-join FK"),
    Query("table_profile", table_profile, _profile_oracle(),
          ("profile", "pipeline"),
          doc="per-column rowcount/nulls/exact-distinct/min/max in one "
              "scan, inline-fanned to rows"),
    Query("join_skew_salted", join_skew_salted, JOIN_SKEW_SALTED_ORACLE,
          ("join", "pipeline"),
          doc="pre-salted skew join (salt probe side, replicate build "
              "side x8); result equals the unsalted join"),
    Query("embedding_quantize_int8", embedding_quantize_int8, QUANTIZE_ORACLE,
          ("similarity", "pipeline"),
          doc="per-vector int8 scalar quantization (4x memory), "
              "bit-exact codes via IEEE-only arithmetic"),
    Query("agg_approx_percentile_bounded", agg_approx_percentile_bounded,
          _APPROX_PCT_ORACLE, ("agg", "sketch"),
          doc="percentile_approx within +-1% of exact (both engines agree "
              "on the exact interpolated median)"),
]
