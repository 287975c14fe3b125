"""ML-flavored pipeline queries: hybrid sparse+dense retrieval (RRF),
distributed PCA covariance, and gradient-descent logistic-regression
training — each with a bit-exact DuckDB oracle.

Same contract as plans/pipeline.py: Spark builder + oracle SQL pairs,
exact by construction (fixed-point snapped sums, decimal funnels,
identical textual order for IEEE double expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from direct_spark_sql_spark.operators import mltrain as ml
from direct_spark_sql_spark.operators import retrieval as rt
from direct_spark_sql_spark.operators import similarity as sim
from direct_spark_sql_spark.operators import text as tx
from direct_spark_sql_spark.plans.base import Query
from direct_spark_sql_spark.plans.pipeline import TOKS_SQL, _EX_SQL
from direct_spark_sql_spark.plans.pipeline_ext import BM25_TERMS, bm25_oracle_ctes
from direct_spark_sql_spark.sources.registry import load_table

# ---------------------------------------------------------------------------
# Hybrid search: BM25 + dense cosine fused with reciprocal-rank fusion
# ---------------------------------------------------------------------------

_RRF_POOL = 25  # candidate pool per retriever before fusion
_RRF_C = 60     # the canonical RRF constant
_RRF_K = 10


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 hybrid retrieval: BM25 over documents and cosine over the
    parallel embeddings table (doc_id ≡ vec_id), RRF-fused.  Both candidate
    pools are produced by the existing distributed retrievers; fusion is
    coordinator-scale work on two 25-row lists."""
    from direct_spark_sql_spark.plans.pipeline_ext import ensure_bm25_index

    emb = load_table(spark, sf_dir, "embeddings")
    # sparse side served from the materialized inverted index — scores
    # are bit-identical to the tokenize-at-query-time path (shared tail),
    # so the oracle is unchanged while the corpus is never re-tokenized.
    sparse = rt.bm25_indexed_topk(
        spark, ensure_bm25_index(spark, sf_dir), BM25_TERMS, k=_RRF_POOL
    )
    query = emb.filter(F.col("vec_id") == 0)
    dense = sim.cosine_topk(emb.filter(F.col("vec_id") != 0), query, k=_RRF_POOL).select(
        F.col("vec_id").alias("doc_id"), F.col("cosine").alias("score")
    )
    return rt.rrf_fuse(sparse, dense, c=_RRF_C, k=_RRF_K)


def _hybrid_rrf_ctes() -> str:
    """Hybrid-retrieval oracle CTE chain ending in ``fused(doc_id,
    bm25_rank, cosine_rank, rrf_score)`` (top-``_RRF_K``) — shared by the
    standalone query and the rerank stage built on top of it."""
    c = float(_RRF_C)
    return f"""{bm25_oracle_ctes(_RRF_POOL)},
{_EX_SQL.strip()},
q AS (SELECT i, a AS b FROM ex WHERE vec_id = 0),
cd AS (
  SELECT ex.vec_id,
         CAST(CAST(ROUND(SUM(ex.a * q.b), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot,
         CAST(CAST(ROUND(SUM(ex.a * ex.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS na,
         CAST(CAST(ROUND(SUM(q.b * q.b), 6) AS DECIMAL(24,6)) AS DOUBLE) AS nb
  FROM ex JOIN q ON ex.i = q.i
  WHERE ex.vec_id <> 0
  GROUP BY ex.vec_id
),
cos AS (
  SELECT vec_id AS doc_id, CASE WHEN na > 0 AND nb > 0
         THEN dot / (sqrt(na) * sqrt(nb)) ELSE -2.0 END AS score
  FROM cd ORDER BY score DESC, doc_id LIMIT {_RRF_POOL}
),
ra AS (SELECT doc_id,
              CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bm25_rank
       FROM bm25),
rb AS (SELECT doc_id,
              CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS cosine_rank
       FROM cos),
fused AS (
  SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id, bm25_rank, cosine_rank,
         COALESCE(1.0 / ({c} + CAST(bm25_rank AS DOUBLE)), 0.0)
         + COALESCE(1.0 / ({c} + CAST(cosine_rank AS DOUBLE)), 0.0) AS rrf_score
  FROM ra FULL JOIN rb ON ra.doc_id = rb.doc_id
  ORDER BY rrf_score DESC, doc_id LIMIT {_RRF_K}
)"""


def _hybrid_rrf_oracle() -> str:
    return f"""
WITH {_hybrid_rrf_ctes()}
SELECT doc_id, bm25_rank, cosine_rank, rrf_score FROM fused
ORDER BY rrf_score DESC, doc_id
"""


# ---------------------------------------------------------------------------
# Retrieve → rerank: cross-scoring the hybrid candidates
# ---------------------------------------------------------------------------

_RERANK_K = 5


def hybrid_rerank_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-stage rerank of the hybrid-RRF candidates: the Arrow-batched
    pandas-UDF scorer (the cross-encoder slot) runs only on the bounded
    top-10 list, broadcast-joined back to the corpus for text
    (operators/retrieval.py:cross_score_rerank)."""
    docs = load_table(spark, sf_dir, "documents")
    candidates = hybrid_search_rrf(spark, sf_dir)
    return rt.cross_score_rerank(candidates, docs, BM25_TERMS, k=_RERANK_K)


def _rerank_oracle() -> str:
    per_term = " + ".join(
        f"CASE WHEN len(list_filter(toks, x -> x = '{t}')) > 0"
        f" THEN CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT)"
        f" * (1000000 // CAST(list_position(toks, '{t}') AS BIGINT))"
        f" ELSE 0 END"
        for t in BM25_TERMS
    )
    return f"""
WITH {_hybrid_rrf_ctes()},
tokd AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
SELECT f.doc_id, CAST({per_term} AS BIGINT) AS cross_units
FROM fused f JOIN tokd USING (doc_id)
ORDER BY cross_units DESC, f.doc_id LIMIT {_RERANK_K}
"""


# ---------------------------------------------------------------------------
# Filtered vector search: metadata predicate + cosine top-k
# ---------------------------------------------------------------------------

def embedding_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN: top-10 by cosine among vectors whose metadata
    matches (label = 3) — the *pre-filter* strategy: the predicate is
    pushed into the scan BEFORE any distance computation, so recall is
    exact over the filtered set by construction (post-filtering a top-k
    can starve; pre-filtering cannot).  At scale the label predicate
    rides the same parquet pushdown as any column filter."""
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    base = emb.filter((F.col("vec_id") != 0) & (F.col("label") == 3))
    return sim.cosine_topk(base, query, k=10)


FILTERED_TOPK_ORACLE = f"""
WITH {_EX_SQL.strip()},
q AS (SELECT i, a AS b FROM ex WHERE vec_id = 0),
keep AS (SELECT vec_id FROM embeddings WHERE vec_id <> 0 AND label = 3),
d AS (
  SELECT ex.vec_id,
         CAST(CAST(ROUND(SUM(ex.a * q.b), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot,
         CAST(CAST(ROUND(SUM(ex.a * ex.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS na,
         CAST(CAST(ROUND(SUM(q.b * q.b), 6) AS DECIMAL(24,6)) AS DOUBLE) AS nb
  FROM ex JOIN q ON ex.i = q.i
  WHERE ex.vec_id IN (SELECT vec_id FROM keep)
  GROUP BY ex.vec_id
)
SELECT vec_id, CASE WHEN na > 0 AND nb > 0
       THEN dot / (sqrt(na) * sqrt(nb)) ELSE -2.0 END AS cosine
FROM d ORDER BY cosine DESC, vec_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# Distributed PCA: covariance accumulation
# ---------------------------------------------------------------------------

def embedding_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle 64×64 covariance of the embedding corpus: per-row
    JVM outer-product expansion, one d²-bounded hash agg, no joins on the
    data path (operators/similarity.py:covariance_entries)."""
    e = load_table(spark, sf_dir, "embeddings")
    return sim.covariance_entries(e).orderBy("i", "j")


# generate_subscripts in _EX_SQL is 1-based; the Spark side is 0-based.
PCA_COV_ORACLE = f"""
WITH {_EX_SQL.strip()},
p AS (
  SELECT x.i AS i1, y.i AS j1,
         CAST(CAST(ROUND(SUM(x.a * y.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS sxy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ex x JOIN ex y ON x.vec_id = y.vec_id AND x.i <= y.i
  GROUP BY x.i, y.i
),
m AS (
  SELECT i, CAST(CAST(ROUND(SUM(a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS sx
  FROM ex GROUP BY i
)
SELECT CAST(p.i1 - 1 AS BIGINT) AS i,
       CAST(p.j1 - 1 AS BIGINT) AS j,
       p.sxy / CAST(p.n AS DOUBLE)
       - (mi.sx / CAST(p.n AS DOUBLE)) * (mj.sx / CAST(p.n AS DOUBLE)) AS cov
FROM p
JOIN m mi ON mi.i = p.i1
JOIN m mj ON mj.i = p.j1
ORDER BY i, j
"""


# ---------------------------------------------------------------------------
# Nearest-centroid label evaluation (Rocchio confusion matrix)
# ---------------------------------------------------------------------------

def embedding_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid label audit over the labeled embedding corpus:
    per-label mean centroids (decimal element sums + one IEEE division),
    every vector re-assigned by cosine argmax (broadcast map-only,
    operators/similarity.py:label_centroid_classify), reported as the
    (label, pred_label) confusion matrix with per-label fractions —
    the label-quality / class-separability readout for a training set."""
    e = load_table(spark, sf_dir, "embeddings")
    return sim.label_centroid_classify(e)


_CENTROID_CLASSIFY_ORACLE = f"""
WITH {_EX_SQL.strip()},
nrm AS (
  SELECT vec_id, CAST(CAST(ROUND(SUM(a * a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS nn
  FROM ex GROUP BY vec_id
),
lc AS (
  SELECT e.label AS lbl, ex.i AS i,
         CAST(CAST(ROUND(SUM(ex.a), 6) AS DECIMAL(24,6)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS c
  FROM ex JOIN embeddings e USING (vec_id)
  GROUP BY e.label, ex.i
),
lcd AS (SELECT lbl, i, CAST(c AS DECIMAL(12,9)) AS a FROM lc),
cn AS (
  SELECT lbl, CAST(CAST(ROUND(SUM(a * a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS nn
  FROM lcd GROUP BY lbl
),
cc AS (
  SELECT x.vec_id, d.lbl,
         CAST(CAST(ROUND(SUM(x.a * d.a), 6) AS DECIMAL(24,6)) AS DOUBLE) AS dot
  FROM ex x JOIN lcd d ON d.i = x.i
  GROUP BY x.vec_id, d.lbl
),
cosc AS (
  -- nx.nn > 0 mirrors the engine's pred_label >= 0 filter: a zero-norm
  -- data vector (ivf_assign's -1 sentinel) is excluded from the audit
  SELECT cc.vec_id, cc.lbl, cc.dot / (sqrt(nx.nn) * sqrt(cn.nn)) AS cos
  FROM cc JOIN nrm nx ON nx.vec_id = cc.vec_id
          JOIN cn ON cn.lbl = cc.lbl
  WHERE cn.nn > 0 AND nx.nn > 0
),
assign AS (
  SELECT vec_id, lbl AS pred FROM (
    SELECT vec_id, lbl,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, lbl) AS rn
    FROM cosc
  ) WHERE rn = 1
),
conf AS (
  SELECT CAST(e.label AS BIGINT) AS label, CAST(a.pred AS BIGINT) AS pred_label,
         CAST(COUNT(*) AS BIGINT) AS n_vectors
  FROM assign a JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
)
SELECT label, pred_label, n_vectors,
       CAST(n_vectors AS DOUBLE)
         / CAST(SUM(n_vectors) OVER (PARTITION BY label) AS DOUBLE) AS frac
FROM conf ORDER BY label, pred_label
"""


# ---------------------------------------------------------------------------
# AdaBoost: two boosted stumps, exact weights
# ---------------------------------------------------------------------------

def quality_adaboost_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two AdaBoost rounds of threshold stumps on ``n_chars`` (h(x)=+1
    iff v ≤ t, label +1 = lang='en'), everything exact:

    - round 1 error counts are integers; t1 = argmin err (tie → smaller t);
      α1 = ½·ln((W−e)/e) — one libm call on identical operands;
    - round-2 weights take only TWO values (e^∓α1 for correct/wrong under
      h1), so weighted cumulative errors are cumulative INTEGER counts of
      the four (label × side-of-t1) classes times two scalar doubles —
      exact window sums, fixed-order arithmetic;
    - the ensemble sign(α1·h1 + α2·h2) has four possible scores
      (±α1±α2), so training accuracy is again pure integer counting.

    Each round is one bounded pass (hash agg + value-axis window + argmin)
    with a coordinator sync of two scalars — the boosting shape at any
    scale.  Output: one row (t1, err1, alpha1, t2, err2, alpha2,
    n_correct, n_docs), bit-identical to the unrolled SQL oracle."""
    import math

    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    per_v = (
        d.select(
            F.col("n_chars").cast("long").alias("v"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        )
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("y").cast("long").alias("pos"),
        )
        .withColumn("neg", F.col("cnt") - F.col("pos"))
        .localCheckpoint()
    )
    wcum = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wall = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)

    # round 1: err(t) = neg_le(t) + pos_gt(t), integer
    r1 = per_v.select(
        "v",
        (
            F.sum("neg").over(wcum)
            + (F.sum("pos").over(wall) - F.sum("pos").over(wcum))
        ).alias("err"),
        F.sum("cnt").over(wall).alias("n_all"),
    )
    best1 = r1.orderBy(F.col("err").asc(), F.col("v").asc()).limit(1).collect()[0]
    t1, e1, n_all = int(best1["v"]), int(best1["err"]), int(best1["n_all"])
    alpha1 = 0.5 * math.log((float(n_all) - float(e1)) / float(e1))
    wc, ww = math.exp(-alpha1), math.exp(alpha1)

    # round 2: 4 integer classes per value — (pos|neg) × (≤t1 | >t1)
    le1 = F.col("v") <= F.lit(t1)
    cls = per_v.select(
        "v",
        F.when(le1, F.col("pos")).otherwise(F.lit(0)).alias("pos_in"),
        F.when(le1, F.lit(0)).otherwise(F.col("pos")).alias("pos_out"),
        F.when(le1, F.col("neg")).otherwise(F.lit(0)).alias("neg_in"),
        F.when(le1, F.lit(0)).otherwise(F.col("neg")).alias("neg_out"),
    )
    cum = cls.select(
        "v",
        *[F.sum(c).over(wcum).alias(f"{c}_le") for c in
          ("pos_in", "pos_out", "neg_in", "neg_out")],
        *[F.sum(c).over(wall).alias(f"{c}_all") for c in
          ("pos_in", "pos_out", "neg_in", "neg_out")],
    )
    # under h1: pos_in & neg_out are CORRECT (weight wc); others wrong (ww).
    # err2(t) = weight(neg ≤ t) + weight(pos > t)
    dbl = lambda c: F.col(c).cast("double")
    err2 = (
        (dbl("neg_in_le") * F.lit(ww) + dbl("neg_out_le") * F.lit(wc))
        + ((dbl("pos_in_all") - dbl("pos_in_le")) * F.lit(wc)
           + (dbl("pos_out_all") - dbl("pos_out_le")) * F.lit(ww))
    )
    w_total = (
        (dbl("pos_in_all") + dbl("neg_out_all")) * F.lit(wc)
        + (dbl("pos_out_all") + dbl("neg_in_all")) * F.lit(ww)
    )
    best2 = (
        cum.select("v", err2.alias("err2"), w_total.alias("w_tot"))
        .orderBy(F.col("err2").asc(), F.col("v").asc())
        .limit(1)
        .collect()[0]
    )
    t2, e2, wt = int(best2["v"]), float(best2["err2"]), float(best2["w_tot"])
    alpha2 = 0.5 * math.log((wt - e2) / e2)

    # ensemble accuracy from the four (h1, h2) score combos
    def h(t: int):
        return F.when(F.col("v") <= F.lit(t), F.lit(1)).otherwise(F.lit(-1))

    s = F.lit(alpha1) * h(t1).cast("double") + F.lit(alpha2) * h(t2).cast("double")
    pred_pos = s >= F.lit(0.0)
    correct = per_v.select(
        F.sum(F.when(pred_pos, F.col("pos")).otherwise(F.col("neg"))).alias("ok")
    ).collect()[0]["ok"]

    return spark.createDataFrame(
        [(t1, e1, alpha1, t2, e2, alpha2, int(correct), n_all)],
        "t1 long, err1 long, alpha1 double, t2 long, err2 double, "
        "alpha2 double, n_correct long, n_docs long",
    )


def _adaboost_oracle() -> str:
    return """
WITH per_v AS (
  SELECT CAST(n_chars AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
  FROM documents GROUP BY n_chars
),
r1 AS (
  SELECT v,
         SUM(neg) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         + (SUM(pos) OVER () - SUM(pos) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS err,
         SUM(cnt) OVER () AS n_all
  FROM per_v
),
b1 AS (SELECT v AS t1, CAST(err AS BIGINT) AS e1, CAST(n_all AS BIGINT) AS n_all
       FROM r1 ORDER BY err ASC, v ASC LIMIT 1),
a1 AS (SELECT t1, e1, n_all,
              0.5 * ln((CAST(n_all AS DOUBLE) - CAST(e1 AS DOUBLE)) / CAST(e1 AS DOUBLE)) AS alpha1
       FROM b1),
wts AS (SELECT t1, e1, n_all, alpha1, exp(-alpha1) AS wc, exp(alpha1) AS ww FROM a1),
cls AS (
  SELECT p.v,
         CASE WHEN p.v <= w.t1 THEN p.pos ELSE 0 END AS pos_in,
         CASE WHEN p.v <= w.t1 THEN 0 ELSE p.pos END AS pos_out,
         CASE WHEN p.v <= w.t1 THEN p.neg ELSE 0 END AS neg_in,
         CASE WHEN p.v <= w.t1 THEN 0 ELSE p.neg END AS neg_out
  FROM per_v p, wts w
),
cum AS (
  SELECT v,
         SUM(pos_in)  OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pos_in_le,
         SUM(pos_out) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pos_out_le,
         SUM(neg_in)  OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS neg_in_le,
         SUM(neg_out) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS neg_out_le,
         SUM(pos_in) OVER () AS pos_in_all, SUM(pos_out) OVER () AS pos_out_all,
         SUM(neg_in) OVER () AS neg_in_all, SUM(neg_out) OVER () AS neg_out_all
  FROM cls
),
r2 AS (
  SELECT c.v,
         (CAST(c.neg_in_le AS DOUBLE) * w.ww + CAST(c.neg_out_le AS DOUBLE) * w.wc)
         + ((CAST(c.pos_in_all AS DOUBLE) - CAST(c.pos_in_le AS DOUBLE)) * w.wc
            + (CAST(c.pos_out_all AS DOUBLE) - CAST(c.pos_out_le AS DOUBLE)) * w.ww) AS err2,
         (CAST(c.pos_in_all AS DOUBLE) + CAST(c.neg_out_all AS DOUBLE)) * w.wc
         + (CAST(c.pos_out_all AS DOUBLE) + CAST(c.neg_in_all AS DOUBLE)) * w.ww AS w_tot
  FROM cum c, wts w
),
b2 AS (SELECT v AS t2, err2, w_tot FROM r2 ORDER BY err2 ASC, v ASC LIMIT 1),
a2 AS (SELECT t2, err2, 0.5 * ln((w_tot - err2) / err2) AS alpha2 FROM b2),
acc AS (
  SELECT CAST(SUM(CASE WHEN (w.alpha1 * (CASE WHEN p.v <= w.t1 THEN 1 ELSE -1 END)
                             + a2.alpha2 * (CASE WHEN p.v <= a2.t2 THEN 1 ELSE -1 END)) >= 0.0
                       THEN p.pos ELSE p.neg END) AS BIGINT) AS n_correct
  FROM per_v p, wts w, a2
)
SELECT w.t1, w.e1 AS err1, w.alpha1, a2.t2, a2.err2, a2.alpha2,
       acc.n_correct, w.n_all AS n_docs
FROM wts w, a2, acc
"""


# ---------------------------------------------------------------------------
# Model evaluation: exact AUC from rank statistics
# ---------------------------------------------------------------------------

def quality_lr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the trained LR classifier with an EXACT ROC-AUC: scores
    are the 1e-8-snapped probabilities (integers), so the Mann-Whitney
    formulation over tie-averaged ranks is pure rational arithmetic —
    AUC = (Σ ranks(pos) − n_pos(n_pos+1)/2) / (n_pos · n_neg) — and the
    one double division at the end is IEEE-identical in the oracle.
    Train → serve → evaluate, every stage oracle-checked."""
    from pyspark.sql import Window as W

    feats = _lr_features(spark, sf_dir)
    w, _ = ml.logreg_fit(feats, ["chars", "toks"])
    xs = [F.lit(1.0), F.col("chars"), F.col("toks")]
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-ml.lr_dot(w, xs)))
    units = F.floor(p * F.lit(1e8) + F.lit(0.5)).cast("long")
    scored = feats.select(units.alias("score"), F.col("y"))
    # tie-averaged rank = avg of row_number over ties = rank + (cnt-1)/2;
    # computed as SUM over the per-score group to stay integer for the sums.
    # Scale note: the rank pass is a global window over DISTINCT snapped
    # scores (bounded by the 1e8-unit score range, and in practice by the
    # model's distinct feature combinations) — not over the corpus rows.
    per_score = scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    wlo = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    ranked = per_score.select(
        "score", "cnt", "pos",
        F.coalesce(F.sum("cnt").over(wlo), F.lit(0)).cast("long").alias("n_below"),
    )
    # sum of tie-averaged ranks of the positives in this score group:
    # pos * (n_below + (cnt + 1)/2) — kept exact by scaling ×2
    two_rank_sum = F.col("pos") * (F.lit(2) * F.col("n_below") + F.col("cnt") + F.lit(1))
    agg = ranked.agg(
        F.sum(two_rank_sum).cast("long").alias("two_r_pos"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast("long").alias("n_neg"),
    )
    auc = (
        F.col("two_r_pos").cast("double") / F.lit(2.0)
        - F.col("n_pos").cast("double") * (F.col("n_pos").cast("double") + F.lit(1.0)) / F.lit(2.0)
    ) / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
    return agg.select("n_pos", "n_neg", auc.alias("auc"))


def _lr_auc_oracle() -> str:
    base = _lr_oracle(for_scoring=True)
    # reuse the scoring CTE chain: swap the final top-10 SELECT for the
    # full per-document (score, y) projection, then rank-sum in SQL
    head = base[: base.rindex("SELECT doc_id")].rstrip()
    return f"""{head},
scored AS (
  SELECT CAST(FLOOR((1.0 / (1.0 + exp(-(wb * 1.0 + wc * chars + wt * toks))))
                    * 100000000.0 + 0.5) AS BIGINT) AS score, y
  FROM f, w3
),
per_score AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CAST(y AS BIGINT)) AS BIGINT) AS pos
  FROM scored GROUP BY score
),
ranked AS (
  SELECT score, cnt, pos,
         CAST(COALESCE(SUM(cnt) OVER (ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_below
  FROM per_score
),
agg AS (
  SELECT CAST(SUM(pos * (2 * n_below + cnt + 1)) AS BIGINT) AS two_r_pos,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(cnt - pos) AS BIGINT) AS n_neg
  FROM ranked
)
SELECT n_pos, n_neg,
       (CAST(two_r_pos AS DOUBLE) / 2.0
        - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0) / 2.0)
       / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
FROM agg
"""


# ---------------------------------------------------------------------------
# Decision-stump training: exact best-split search
# ---------------------------------------------------------------------------

def quality_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a decision stump (best (feature, threshold) over n_chars AND
    token count, predicting lang='en') by EXACT split search: per-
    (feature, value) label counts in one hash agg over the unioned
    feature columns, cumulative sums along each feature's sorted value
    axis (one window pass over |distinct values| rows — bounded, not
    corpus-sized), weighted Gini per candidate from pure integer counts,
    argmin with a deterministic (gini, feature, threshold) tie-break.
    The per-node scan every histogram-based GBDT runs, including the
    across-features argmin, in three bounded relational steps."""
    d = load_table(spark, sf_dir, "documents")
    labeled = d.select(
        F.col("n_chars").cast("long").alias("f_chars"),
        tx.token_count("text").alias("f_toks"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    feats = labeled.select(
        F.lit("n_chars").alias("feature"), F.col("f_chars").alias("v"), "y"
    ).union(
        labeled.select(F.lit("n_tokens").alias("feature"), F.col("f_toks").alias("v"), "y")
    )
    per_v = feats.groupBy("feature", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("feature").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy("feature").orderBy("v").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = per_v.select(
        "feature",
        "v",
        F.sum("cnt").over(w).alias("n_le"),
        F.sum("pos").over(w).alias("pos_le"),
        F.sum("cnt").over(wall).alias("n_all"),
        F.sum("pos").over(wall).alias("pos_all"),
    ).filter(F.col("n_le") < F.col("n_all"))  # a split must leave both sides non-empty

    def gini_side(n: F.Column, p: F.Column) -> F.Column:
        # n * gini = n - (p^2 + (n-p)^2) / n ; weighted by n/n_all later —
        # computed as one double expression from exact integer operands
        nd, pd_ = n.cast("double"), p.cast("double")
        return nd - (pd_ * pd_ + (nd - pd_) * (nd - pd_)) / nd

    weighted = (
        gini_side(F.col("n_le"), F.col("pos_le"))
        + gini_side(
            F.col("n_all") - F.col("n_le"), F.col("pos_all") - F.col("pos_le")
        )
    ) / F.col("n_all").cast("double")
    scored = cum.select(
        "feature",
        F.col("v").cast("long").alias("threshold"),
        F.col("n_le").cast("long").alias("n_left"),
        F.col("pos_le").cast("long").alias("pos_left"),
        weighted.alias("gini"),
    )
    best = scored.orderBy(
        F.col("gini").asc(), F.col("feature").asc(), F.col("threshold").asc()
    ).limit(1)
    return best


STUMP_ORACLE = f"""
WITH labeled AS (
  SELECT CAST(n_chars AS BIGINT) AS f_chars,
         CAST(len({TOKS_SQL}) AS BIGINT) AS f_toks,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
feats AS (
  SELECT 'n_chars' AS feature, f_chars AS v, y FROM labeled
  UNION ALL
  SELECT 'n_tokens' AS feature, f_toks AS v, y FROM labeled
),
per_v AS (
  SELECT feature, v, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM feats GROUP BY feature, v
),
cum AS (
  SELECT feature, v,
         SUM(cnt) OVER (PARTITION BY feature ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_le,
         SUM(pos) OVER (PARTITION BY feature ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pos_le,
         SUM(cnt) OVER (PARTITION BY feature) AS n_all,
         SUM(pos) OVER (PARTITION BY feature) AS pos_all
  FROM per_v
),
scored AS (
  SELECT feature,
         CAST(v AS BIGINT) AS threshold,
         CAST(n_le AS BIGINT) AS n_left,
         CAST(pos_le AS BIGINT) AS pos_left,
         ((CAST(n_le AS DOUBLE)
            - (CAST(pos_le AS DOUBLE) * CAST(pos_le AS DOUBLE)
               + (CAST(n_le AS DOUBLE) - CAST(pos_le AS DOUBLE))
                 * (CAST(n_le AS DOUBLE) - CAST(pos_le AS DOUBLE))) / CAST(n_le AS DOUBLE))
          + (CAST(n_all - n_le AS DOUBLE)
            - (CAST(pos_all - pos_le AS DOUBLE) * CAST(pos_all - pos_le AS DOUBLE)
               + (CAST(n_all - n_le AS DOUBLE) - CAST(pos_all - pos_le AS DOUBLE))
                 * (CAST(n_all - n_le AS DOUBLE) - CAST(pos_all - pos_le AS DOUBLE)))
              / CAST(n_all - n_le AS DOUBLE)))
         / CAST(n_all AS DOUBLE) AS gini
  FROM cum WHERE n_le < n_all
)
SELECT feature, threshold, n_left, pos_left, gini
FROM scored ORDER BY gini ASC, feature ASC, threshold ASC LIMIT 1
"""


# ---------------------------------------------------------------------------
# Skip-gram negative-sampling: one exact word2vec SGD step
# ---------------------------------------------------------------------------

_SGNS_PAIRS = 200
_SGNS_WINDOW = 2


def embedding_sgns_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact word2vec (SGNS) SGD step over the corpus' top-200
    skip-gram pairs: hash-derived init embeddings, deterministic negative
    draws, fixed-point-snapped gradient accumulation — the updated
    center vectors are bit-identical to the unrolled SQL oracle
    (operators/mltrain.py:sgns_train_step)."""
    from direct_spark_sql_spark.operators.text import skipgram_cooccurrence

    d = load_table(spark, sf_dir, "documents")
    top = skipgram_cooccurrence(d, window=_SGNS_WINDOW, top_k=_SGNS_PAIRS)
    pairs = top.select(
        F.split("pair", " ").getItem(0).alias("center"),
        F.split("pair", " ").getItem(1).alias("context"),
        F.col("n_cooccur").alias("n"),
    )
    return ml.sgns_train_step(pairs)


def _sgns_oracle() -> str:
    from direct_spark_sql_spark.hashing import h64_sql
    from direct_spark_sql_spark.operators.mltrain import (
        SGNS_DIMS,
        SGNS_INIT_DIV,
        SGNS_INIT_MOD,
        SGNS_LR,
    )

    U = "100000000.0"

    def init(word: str, side: str, d: str) -> str:
        key = f"{word} || ':{side}:' || CAST({d} AS VARCHAR)"
        return (f"CAST(({h64_sql(key)} % {SGNS_INIT_MOD}) - 1000 AS DOUBLE)"
                f" / {SGNS_INIT_DIV}")

    def snap(x: str) -> str:
        return f"CAST(FLOOR(({x}) * {U} + 0.5) AS BIGINT)"

    def sig(z: str) -> str:
        return f"(1.0 / (1.0 + exp(-({z}))))"

    neg_key = "center || '|' || context || '|neg'"
    return f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
dd AS (SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) >= 2),
pp AS (
  SELECT toks[i + 1] || ' ' || toks[j + 1] AS pair
  FROM dd,
       UNNEST(generate_series(0, nt - 1)) u(i),
       UNNEST(generate_series(0, nt - 1)) v(j)
  WHERE j BETWEEN i - {_SGNS_WINDOW} AND i + {_SGNS_WINDOW} AND j <> i),
top AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM pp
        GROUP BY pair ORDER BY n DESC, pair LIMIT {_SGNS_PAIRS}),
pairs AS (SELECT string_split(pair, ' ')[1] AS center,
                 string_split(pair, ' ')[2] AS context, n FROM top),
words AS (SELECT DISTINCT w FROM (
  SELECT center AS w FROM pairs UNION ALL SELECT context FROM pairs)),
vocab AS (SELECT w, CAST(ROW_NUMBER() OVER (ORDER BY w) - 1 AS BIGINT) AS rank
          FROM words),
vsz AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
pneg AS (
  SELECT p.center, p.context, voc.w AS neg, p.n
  FROM pairs p, vsz
  JOIN vocab voc ON ({h64_sql(neg_key)} % vsz.v) = voc.rank),
dims AS (SELECT CAST(UNNEST(generate_series(0, {SGNS_DIMS - 1})) AS INT) AS d),
dots AS (
  SELECT center, context, neg, n,
         SUM({snap(f"({init('context', 'u', 'd')}) * ({init('center', 'v', 'd')})")}) AS s_pos_units,
         SUM({snap(f"({init('neg', 'u', 'd')}) * ({init('center', 'v', 'd')})")}) AS s_neg_units
  FROM pneg, dims GROUP BY center, context, neg, n),
scored AS (
  SELECT center, context, neg, n,
         {sig(f"CAST(s_pos_units AS DOUBLE) / {U}")} - 1.0 AS g_pos,
         {sig(f"CAST(s_neg_units AS DOUBLE) / {U}")} AS g_neg
  FROM dots),
grads AS (
  SELECT center AS word, d,
         SUM({snap(f"(CAST(n AS DOUBLE) * g_pos) * ({init('context', 'u', 'd')})")}
             + {snap(f"(CAST(n AS DOUBLE) * g_neg) * ({init('neg', 'u', 'd')})")}) AS grad_units
  FROM scored, dims GROUP BY center, d)
SELECT word, CAST(d AS BIGINT) AS d,
       ({init('word', 'v', 'd')}) - {SGNS_LR} * (CAST(grad_units AS DOUBLE) / {U}) AS new_v
FROM grads ORDER BY word, d
"""


# ---------------------------------------------------------------------------
# Multinomial naive Bayes language classifier (count-based training)
# ---------------------------------------------------------------------------

def quality_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a multinomial naive Bayes lang classifier on the corpus and
    classify every document, reporting the (actual, predicted) confusion
    matrix.

    Training IS aggregation — per-(lang, token) counts, per-lang totals,
    vocabulary size, doc priors — all map-side-combined hash aggs, the
    ideal distributed-training shape (no iterations, no coordinator
    state).  Inference joins each document's token tf to the 5-row-per-
    token model (langs broadcast), sums 1e-8-snapped add-one-smoothed log
    likelihoods exactly, and argmaxes with a deterministic tie-break —
    so the full train+classify pipeline is bit-exact against the oracle.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.col("lang").alias("actual"),
                    F.explode(tx.tokens("text")).alias("token"))
    doc_tok = toks.groupBy("doc_id", "actual", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    counts = toks.groupBy(F.col("actual").alias("lang"), "token").agg(
        F.count(F.lit(1)).cast("long").alias("c_lt")
    )
    totals = toks.groupBy(F.col("actual").alias("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_l")
    )
    vocab = toks.agg(F.countDistinct("token").cast("long").alias("v"))
    priors = d.groupBy(F.col("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_l")
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    model = (
        F.broadcast(priors.crossJoin(n_docs).crossJoin(vocab).join(totals, "lang"))
    )
    cand = doc_tok.crossJoin(model.select("lang", "n_l", "v", "n_docs_l", "n_docs"))
    lik = F.log(
        (F.coalesce(F.col("c_lt"), F.lit(0)).cast("double") + F.lit(1.0))
        / (F.col("n_l").cast("double") + F.col("v").cast("double"))
    )
    term_units = F.col("tf") * F.floor(lik * F.lit(1e8) + F.lit(0.5)).cast("long")
    scored = (
        cand.join(F.broadcast(counts), ["lang", "token"], "left")
        .groupBy("doc_id", "actual", "lang")
        .agg(F.sum(term_units).alias("lik_units"),
             F.min("n_docs_l").alias("n_docs_l"),
             F.min("n_docs").alias("n_docs"))
    )
    prior_units = F.floor(
        F.log(F.col("n_docs_l").cast("double") / F.col("n_docs").cast("double"))
        * F.lit(1e8) + F.lit(0.5)
    ).cast("long")
    ranked = scored.select(
        "doc_id", "actual", "lang",
        (F.col("lik_units") + prior_units).alias("units"),
    ).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.desc("units"), F.col("lang"))
        ),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .groupBy("actual", F.col("lang").alias("predicted"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("actual", "predicted")
    )


NB_CLASSIFY_ORACLE = f"""
WITH t AS (SELECT doc_id, lang AS actual, unnest({TOKS_SQL}) AS token FROM documents),
doc_tok AS (SELECT doc_id, actual, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM t GROUP BY doc_id, actual, token),
counts AS (SELECT actual AS lang, token, CAST(COUNT(*) AS BIGINT) AS c_lt
           FROM t GROUP BY actual, token),
totals AS (SELECT actual AS lang, CAST(COUNT(*) AS BIGINT) AS n_l
           FROM t GROUP BY actual),
vocab AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM t),
priors AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs_l FROM documents GROUP BY lang),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
model AS (SELECT p.lang, p.n_docs_l, nd.n_docs, vocab.v, totals.n_l
          FROM priors p, nd, vocab JOIN totals ON totals.lang = p.lang),
scored AS (
  SELECT dt.doc_id, dt.actual, m.lang,
         SUM(dt.tf * CAST(FLOOR(
           ln((CAST(COALESCE(c.c_lt, 0) AS DOUBLE) + 1.0)
              / (CAST(m.n_l AS DOUBLE) + CAST(m.v AS DOUBLE)))
           * 100000000.0 + 0.5) AS BIGINT)) AS lik_units,
         MIN(m.n_docs_l) AS n_docs_l, MIN(m.n_docs) AS n_docs
  FROM doc_tok dt
  CROSS JOIN model m
  LEFT JOIN counts c ON c.lang = m.lang AND c.token = dt.token
  GROUP BY dt.doc_id, dt.actual, m.lang
),
ranked AS (
  SELECT doc_id, actual, lang,
         lik_units + CAST(FLOOR(
           ln(CAST(n_docs_l AS DOUBLE) / CAST(n_docs AS DOUBLE))
           * 100000000.0 + 0.5) AS BIGINT) AS units
  FROM scored
),
pred AS (
  SELECT doc_id, actual, lang FROM (
    SELECT doc_id, actual, lang,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY units DESC, lang) AS rn
    FROM ranked
  ) WHERE rn = 1
)
SELECT actual, lang AS predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred GROUP BY actual, lang ORDER BY actual, predicted
"""


# ---------------------------------------------------------------------------
# Logistic-regression quality classifier (full-batch GD, 3 iterations)
# ---------------------------------------------------------------------------

def quality_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 2-feature + intercept logistic regression predicting
    lang='en' from document length features; one scan per GD iteration
    (operators/mltrain.py), bit-exact against the unrolled SQL oracle."""
    d = load_table(spark, sf_dir, "documents")
    feats = d.select(
        (F.col("n_chars").cast("double") / F.lit(1000.0)).alias("chars"),
        (tx.token_count("text").cast("double") / F.lit(100.0)).alias("toks"),
        F.when(F.col("lang") == F.lit("en"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    )
    return ml.logreg_train(feats, ["chars", "toks"])


def quality_lr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the quality classifier: every document's
    snapped probability lands in one of 10 deciles (integer-exact
    ``p_units * 10 div 1e8``, clamped to bin 9), and each bin reports
    count, positives, summed predicted units and the observed positive
    rate — the calibration readout that decides whether a score
    threshold means what it claims before it gates a corpus.  Inference
    stays the map-only literal-weights expression; the bin rollup is one
    10-group hash agg.  The oracle unrolls the identical training +
    scoring + binning chain."""
    feats = _lr_features(spark, sf_dir)
    w, _ = ml.logreg_fit(feats, ["chars", "toks"])
    xs = [F.lit(1.0), F.col("chars"), F.col("toks")]
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-ml.lr_dot(w, xs)))
    units = F.floor(p * F.lit(1e8) + F.lit(0.5)).cast("long")
    sc = feats.select(units.alias("p_units"), "y")
    # integer decile: (p_units * 10) div 1e8 — DIV keeps it exact where a
    # double divide could misbin an exactly-divisible boundary value
    binned = sc.select(
        F.least(F.expr("p_units * 10 DIV 100000000"), F.lit(9))
        .cast("long")
        .alias("bin"),
        "y",
        "p_units",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.sum("p_units").cast("long").alias("sum_p_units"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "sum_p_units",
            (F.col("n_pos").cast("double") / F.col("n").cast("double"))
            .alias("pos_rate"),
        )
        .orderBy("bin")
    )


def _lr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        (F.col("n_chars").cast("double") / F.lit(1000.0)).alias("chars"),
        (tx.token_count("text").cast("double") / F.lit(100.0)).alias("toks"),
        F.when(F.col("lang") == F.lit("en"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    )


def quality_lr_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-serve: fit the quality classifier (3 GD scans), then
    score every document JVM-side with the fitted weights as literals and
    return the 10 most-confident matches.  Inference is a map-only
    expression — the weights broadcast as plan literals, the serving
    shape at any scale.  Probabilities are snapped to 1e-8 units so the
    oracle (the same unrolled CTE chain ending in scoring) is exact."""
    feats = _lr_features(spark, sf_dir)
    w, _ = ml.logreg_fit(feats, ["chars", "toks"])
    xs = [F.lit(1.0), F.col("chars"), F.col("toks")]
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-ml.lr_dot(w, xs)))
    units = F.floor(p * F.lit(1e8) + F.lit(0.5)).cast("long")
    return (
        feats.select("doc_id", units.alias("p_units"))
        .orderBy(F.desc("p_units"), "doc_id")
        .limit(10)
    )


def _lr_oracle(for_scoring: bool = False, calibration: bool = False) -> str:
    """Unrolled 3-iteration GD in SQL: each g<k> CTE is the snapped exact
    gradient under the previous weights, each w<k> the IEEE update in the
    same textual order as the Python coordinator.  With ``for_scoring``
    the same CTE chain ends in per-document probability scoring instead
    of the weights/loss row; with ``calibration`` it ends in the decile
    reliability bins."""
    lr = ml.LR_LEARNING_RATE
    U = "100000000.0"

    def sig(z: str) -> str:
        return f"(1.0 / (1.0 + exp(-({z}))))"

    def grad_cte(name: str, z: str, extra_from: str) -> str:
        g = f"({sig(z)} - y)"
        def snap(x: str) -> str:
            return (f"CAST(SUM(CAST(FLOOR(({g} * {x}) * {U} + 0.5) AS BIGINT))"
                    f" AS DOUBLE) / {U}")
        return (f"{name} AS (SELECT {snap('1.0')} AS gb, {snap('chars')} AS gc, "
                f"{snap('toks')} AS gt, CAST(COUNT(*) AS BIGINT) AS n "
                f"FROM f{extra_from})")

    def w_cte(name: str, prev_w: str, prev_g: str) -> str:
        def upd(w: str, g: str) -> str:
            return f"{w} - {lr} * ({g} / CAST({prev_g}.n AS DOUBLE))"
        if prev_w is None:  # first update from w = 0
            return (f"{name} AS (SELECT {upd('0.0', 'gb')} AS wb, "
                    f"{upd('0.0', 'gc')} AS wc, {upd('0.0', 'gt')} AS wt "
                    f"FROM {prev_g})")
        return (f"{name} AS (SELECT {upd('wb', 'gb')} AS wb, "
                f"{upd('wc', 'gc')} AS wc, {upd('wt', 'gt')} AS wt "
                f"FROM {prev_g}, {prev_w})")

    z0 = "0.0 * 1.0 + 0.0 * chars + 0.0 * toks"
    zw = "wb * 1.0 + wc * chars + wt * toks"
    p = sig(zw)
    loss = f"-(y * ln({p}) + (1.0 - y) * ln(1.0 - {p}))"
    loss_snap = (f"CAST(SUM(CAST(FLOOR(({loss}) * {U} + 0.5) AS BIGINT)) AS DOUBLE)"
                 f" / {U}")
    ctes = f"""f AS (
  SELECT doc_id,
         CAST(n_chars AS DOUBLE) / 1000.0 AS chars,
         CAST(len({TOKS_SQL}) AS DOUBLE) / 100.0 AS toks,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
),
{grad_cte('g1', z0, '')},
{w_cte('w1', None, 'g1')},
{grad_cte('g2', zw, ', w1')},
{w_cte('w2', 'w1', 'g2')},
{grad_cte('g3', zw.replace('wb', 'w2.wb').replace('wc', 'w2.wc').replace('wt', 'w2.wt'), ', w2')},
{w_cte('w3', 'w2', 'g3')}"""
    if calibration:
        return f"""
WITH {ctes},
sc AS (SELECT f.y, CAST(FLOOR({p} * {U} + 0.5) AS BIGINT) AS p_units FROM f, w3),
b AS (SELECT LEAST(p_units * 10 // 100000000, 9) AS bin, y, p_units FROM sc)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(p_units) AS BIGINT) AS sum_p_units,
       CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS pos_rate
FROM b GROUP BY bin ORDER BY bin
"""
    if for_scoring:
        return f"""
WITH {ctes}
SELECT doc_id,
       CAST(FLOOR({p} * {U} + 0.5) AS BIGINT) AS p_units
FROM f, w3
ORDER BY p_units DESC, doc_id LIMIT 10
"""
    return f"""
WITH {ctes},
l AS (SELECT {loss_snap} AS loss_sum, CAST(COUNT(*) AS BIGINT) AS n
      FROM f, w3)
SELECT w3.wb AS w_bias, w3.wc AS w_chars, w3.wt AS w_toks,
       l.loss_sum / CAST(l.n AS DOUBLE) AS log_loss,
       l.n AS n_rows
FROM w3, l
"""


QUERIES: list[Query] = [
    Query("hybrid_search_rrf", hybrid_search_rrf, _hybrid_rrf_oracle(),
          ("retrieval", "pipeline", "mlops"), bench=True,
          doc="hybrid sparse+dense retrieval: BM25 and cosine top-25 pools "
              "fused by reciprocal-rank fusion (c=60), deterministic ties"),
    Query("hybrid_rerank_cross", hybrid_rerank_cross, _rerank_oracle(),
          ("retrieval", "mlops"),
          doc="retrieve-then-rerank: Arrow-batched cross-scorer over the "
              "bounded hybrid candidate list (the cross-encoder slot), "
              "deterministic stand-in model oracle-checked"),
    Query("embedding_filtered_topk", embedding_filtered_topk, FILTERED_TOPK_ORACLE,
          ("similarity", "mlops"),
          doc="filtered vector search: metadata predicate pre-filters the "
              "scan before distances (exact recall over the filtered set)"),
    Query("embedding_centroid_classify", embedding_centroid_classify,
          _CENTROID_CLASSIFY_ORACLE, ("embedding", "mlops", "quality"),
          bench=True,
          doc="nearest-centroid (Rocchio) label audit: per-label decimal-"
              "exact mean centroids, broadcast cosine argmax re-assignment, "
              "L² confusion matrix with per-label fractions"),
    Query("embedding_pca_covariance", embedding_pca_covariance, PCA_COV_ORACLE,
          ("similarity", "mlops"), bench=True,
          doc="distributed PCA stage 1: exact-decimal upper-triangle "
              "covariance via per-row JVM outer-product expansion + one "
              "d2-bounded agg (no joins on the data path)"),
    Query("quality_adaboost_train", quality_adaboost_train, _adaboost_oracle(),
          ("mlops", "pipeline"),
          doc="two exact AdaBoost rounds of threshold stumps: integer "
              "round-1 errors, two-valued round-2 weights over cumulative "
              "integer class counts, four-score ensemble accuracy — all "
              "bit-exact vs the unrolled oracle"),
    Query("quality_lr_auc", quality_lr_auc, _lr_auc_oracle(),
          ("mlops", "pipeline"),
          doc="exact ROC-AUC of the trained LR classifier via tie-averaged "
              "Mann-Whitney ranks over snapped integer scores — "
              "train/serve/evaluate all oracle-checked"),
    Query("quality_stump_train", quality_stump_train, STUMP_ORACLE,
          ("mlops", "pipeline"),
          doc="decision-stump training: exact best-Gini split search via "
              "per-value counts + cumulative window (the histogram-GBDT "
              "per-node primitive), deterministic tie-break"),
    Query("embedding_sgns_step", embedding_sgns_step, _sgns_oracle(),
          ("mlops", "similarity"),
          doc="one exact word2vec SGNS SGD step: hash-init embeddings, "
              "deterministic negatives, snapped gradient sums — updated "
              "vectors bit-identical to the unrolled SQL oracle"),
    Query("quality_nb_classify", quality_nb_classify, NB_CLASSIFY_ORACLE,
          ("mlops", "pipeline"),
          doc="multinomial naive Bayes lang classifier: training is pure "
              "map-side-combined aggregation, inference a broadcast-model "
              "join; confusion matrix bit-exact vs the oracle"),
    Query("quality_lr_train", quality_lr_train, _lr_oracle(),
          ("mlops", "pipeline"),
          doc="full-batch GD logistic regression (3 iters, lr=0.5) on "
              "document quality features; snapped exact gradients make "
              "every weight bit-identical to the unrolled SQL oracle"),
    Query("quality_lr_score", quality_lr_score, _lr_oracle(for_scoring=True),
          ("mlops", "pipeline"),
          doc="train-then-serve: fitted weights broadcast as plan "
              "literals, map-only JVM scoring, snapped probabilities "
              "oracle-checked end to end through training AND inference"),
    Query("quality_lr_calibration", quality_lr_calibration,
          _lr_oracle(calibration=True), ("mlops", "pipeline", "quality"),
          doc="reliability diagram of the quality classifier: integer-"
              "exact probability deciles with count / positives / "
              "observed rate per bin, oracle-checked through training, "
              "inference AND binning"),
]
