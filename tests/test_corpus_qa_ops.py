"""Semantics unit tests for the round-6 corpus-QA operators, on tiny
hand-built inputs with known answers (the oracle differential checks
cross-engine agreement; these pin the intended MEANING)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cross_source_duplication_matrix_semantics(spark):
    from direct_spark_sql_spark.operators.dedup import cross_source_duplication

    rows = [
        # fingerprint f1 appears in A (twice) and B (once)
        (1, "f1", "A"), (2, "f1", "A"), (3, "f1", "B"),
        # f2 appears in A, B and C once each
        (4, "f2", "A"), (5, "f2", "B"), (6, "f2", "C"),
        # f3 only in C — no cross-source pair
        (7, "f3", "C"), (8, "f3", "C"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, fp STRING, source STRING")
    out = {
        (r.source_a, r.source_b): (r.n_shared_groups, r.n_docs_a, r.n_docs_b)
        for r in cross_source_duplication(df, "fp", "source", "doc_id").collect()
    }
    # A-B share f1 (2 docs vs 1) and f2 (1 vs 1) -> 2 groups, 3 vs 2 docs
    assert out[("A", "B")] == (2, 3, 2)
    assert out[("A", "C")] == (1, 1, 1)
    assert out[("B", "C")] == (1, 1, 1)
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}


def test_label_centroid_classify_separable_labels(spark):
    from direct_spark_sql_spark.operators.similarity import label_centroid_classify

    # Two orthogonal clusters; one vector of label 1 deliberately points
    # along label 0's axis and must land in the off-diagonal cell.
    rows = [
        (1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (3, [1.0, 0.05], 0),
        (4, [0.0, 1.0], 1), (5, [0.1, 0.9], 1),
        (6, [1.0, 0.0], 1),  # mislabeled
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    conf = {
        (r.label, r.pred_label): r.n_vectors
        for r in label_centroid_classify(df).collect()
    }
    assert conf[(0, 0)] == 3
    assert conf[(1, 1)] == 2
    assert conf[(1, 0)] == 1  # the planted mislabel
    assert (0, 1) not in conf
    # fractions sum to 1 per label
    fr = label_centroid_classify(df).collect()
    by_label: dict[int, float] = {}
    for r in fr:
        by_label[r.label] = by_label.get(r.label, 0.0) + r.frac
    assert all(abs(v - 1.0) < 1e-12 for v in by_label.values())


def test_standardized_outliers_flags_planted_point(spark):
    from direct_spark_sql_spark.operators.similarity import standardized_outliers

    rows = [(i, [float((i % 7) - 3) / 10.0, float((i % 5) - 2) / 10.0])
            for i in range(1, 60)]
    rows.append((999, [25.0, -25.0]))  # far outlier
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    top = standardized_outliers(df, top_k=5).collect()
    assert top[0].vec_id == 999
    assert top[0].outlier_score > top[1].outlier_score * 5
    assert all(r.n_dims == 2 for r in top)
    # scores are non-negative and sorted descending
    scores = [r.outlier_score for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)


def test_k_anonymity_report_is_exactly_the_sub_k_classes(spark):
    from direct_spark_sql_spark.plans.pipeline_ext import (
        K_ANON_BUCKET, K_ANON_K, privacy_k_anonymity,
    )
    from direct_spark_sql_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    out = privacy_k_anonymity(spark, SF_DIR).collect()
    assert all(r.class_size < K_ANON_K for r in out)
    # complement check: every QI class NOT reported has size >= k
    d = load_table(spark, SF_DIR, "documents")
    all_classes = (
        d.groupBy(
            "source", "lang",
            (F.floor(F.col("n_chars") / K_ANON_BUCKET) * K_ANON_BUCKET)
            .cast("long").alias("len_bucket"),
        )
        .count()
        .collect()
    )
    reported = {(r.source, r.lang, r.len_bucket) for r in out}
    for r in all_classes:
        key = (r.source, r.lang, r.len_bucket)
        if key not in reported:
            assert r["count"] >= K_ANON_K
