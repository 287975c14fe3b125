"""Tests for the ML-ops operators that aren't fully SQL-oracle-able:
PCA projection properties and RRF fusion edge cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from direct_spark_sql_spark.operators.retrieval import rrf_fuse
from direct_spark_sql_spark.operators.similarity import pca_project
from tests.conftest import SF_DIR


def test_pca_project_variance_ordering(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pr = pca_project(e, n_components=3)
    stats = pr.agg(
        F.var_pop("pc0").alias("v0"),
        F.var_pop("pc1").alias("v1"),
        F.var_pop("pc2").alias("v2"),
    ).collect()[0]
    assert stats.v0 >= stats.v1 >= stats.v2 > 0
    # projections onto distinct principal axes are uncorrelated
    cov01 = pr.agg(F.covar_pop("pc0", "pc1")).collect()[0][0]
    assert abs(cov01) < 1e-6 * math.sqrt(stats.v0 * stats.v1) + 1e-9


def test_pca_project_row_count_and_schema(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pr = pca_project(e, n_components=2)
    assert pr.columns == ["vec_id", "pc0", "pc1"]
    assert pr.count() == e.count()


def test_rrf_fuse_disjoint_and_overlap(spark):
    a = spark.createDataFrame(
        [(1, 3.0), (2, 2.0), (3, 1.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "doc_id long, score double"
    )
    rows = {r["doc_id"]: r for r in rrf_fuse(a, b, c=60, k=10).collect()}
    # doc 2 appears in both lists: rank 2 sparse, rank 1 dense
    assert rows[2]["bm25_rank"] == 2 and rows[2]["cosine_rank"] == 1
    assert abs(rows[2]["rrf_score"] - (1 / 62 + 1 / 61)) < 1e-12
    # doc 4 only dense; doc 1 only sparse (missing side contributes 0)
    assert rows[4]["bm25_rank"] is None
    assert abs(rows[4]["rrf_score"] - 1 / 62) < 1e-12
    assert rows[1]["cosine_rank"] is None
    assert abs(rows[1]["rrf_score"] - 1 / 61) < 1e-12
    # fused order: doc 2 (both lists) first
    top = rrf_fuse(a, b, c=60, k=1).collect()[0]
    assert top["doc_id"] == 2
