"""IVF rebuild-at-same-path regression: coordinator caches must be evicted.

Round-2 verdict latent defect: ``ivf_build`` overwrote the on-disk index but
left ``_IVF_CENTROIDS[index_path]`` and the resolved ``_IVF_INDEX_DF`` entry
in place, so a rebuild with new data/centroids at the same path kept serving
stale centroid metadata and a DataFrame whose file listing referenced
deleted files.  These tests build → query → rebuild (shifted vectors, same
path) → query again, and require the second answer to match exact
brute-force search over the NEW corpus (nprobe == num cells ⇒ IVF must
equal exact search).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from direct_spark_sql_spark.operators import similarity as sim

DIM = 4


def _vectors(spark, n: int, shift: float):
    rows = [
        (i, [float((i * 7 + d * 3) % 11) + shift for d in range(DIM)])
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _centroids(spark, shift: float):
    # Two well-separated cells; shifted together with the corpus on rebuild.
    rows = [(1, [shift + 1.0] * DIM), (2, [shift + 10.0] * DIM)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _exact(df, query, k):
    return [
        (r["vec_id"], r["cosine"])
        for r in sim.cosine_topk(df, query, k=k).collect()
    ]


def _query_df(spark, qvec):
    return spark.createDataFrame([(0, qvec)], "vec_id long, embedding array<double>")


@pytest.mark.parametrize("api", ["vec", "df"])
def test_ivf_rebuild_same_path_serves_new_index(spark, tmp_path, api):
    index_path = str(tmp_path / "ivf_index")
    qvec = [2.0, 5.0, 8.0, 0.0]

    for shift in (0.0, 100.0):  # second iteration rebuilds at the SAME path
        corpus = _vectors(spark, 20, shift)
        cents = _centroids(spark, shift)
        sim.ivf_build(corpus, cents, index_path)
        if api == "vec":
            got = sim.ivf_topk_vec(
                spark, qvec, index_path, centroids=cents, k=5, nprobe=2
            ).collect()
        else:
            got = sim.ivf_topk(
                corpus,
                _query_df(spark, qvec),
                cents,
                k=5,
                nprobe=2,
                index_path=index_path,
            ).collect()
        expected = _exact(corpus, _query_df(spark, qvec), 5)
        assert [(r["vec_id"], r["cosine"]) for r in got] == expected, (
            f"stale index served after rebuild (shift={shift})"
        )


def test_ivf_build_evicts_coordinator_caches(spark, tmp_path):
    index_path = str(tmp_path / "ivf_evict")
    corpus = _vectors(spark, 10, 0.0)
    cents = _centroids(spark, 0.0)
    sim.ivf_build(corpus, cents, index_path)
    # Populate both caches via a served query.
    sim.ivf_topk_vec(
        spark, [1.0] * DIM, index_path, centroids=cents, k=3, nprobe=2
    ).collect()
    assert index_path in sim._IVF_CENTROIDS
    app = spark.sparkContext.applicationId
    assert (app, index_path) in sim._IVF_INDEX_DF
    sim.ivf_build(corpus, cents, index_path)
    assert index_path not in sim._IVF_CENTROIDS
    assert (app, index_path) not in sim._IVF_INDEX_DF
