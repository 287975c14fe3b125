"""Scale-up synthesis (sources/scale.py): key-shifted copies must preserve
per-copy join cardinalities, keep key spaces disjoint, and perturb document
text so duplicate clusters don't merge across copies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from direct_spark_sql_spark.sources.registry import load_table
from direct_spark_sql_spark.sources.scale import ensure_scaled_dataset

SRC = "/root/testdata/sf0.001"
FACTOR = 3


@pytest.fixture(scope="module")
def scaled(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scaled") / "x3")
    ensure_scaled_dataset(spark, SRC, dst, factor=FACTOR)
    return dst


def test_row_counts_scale(spark, scaled):
    for t in ["customer", "orders", "lineitem", "events", "documents", "embeddings"]:
        n_src = load_table(spark, SRC, t).count()
        n_dst = load_table(spark, scaled, t).count()
        assert n_dst == FACTOR * n_src, t
    for t in ["region", "nation"]:  # fixed-size dimensions: unscaled
        assert load_table(spark, scaled, t).count() == load_table(spark, SRC, t).count()


def test_key_spaces_disjoint(spark, scaled):
    o = load_table(spark, scaled, "orders")
    n_src = load_table(spark, SRC, "orders").count()
    assert o.select("o_orderkey").distinct().count() == FACTOR * n_src


def test_join_cardinality_preserved(spark, scaled):
    """Each copy's orders join each copy's customers — the orders⋈customer
    row count scales exactly linearly (no cross-copy fan-out)."""
    base = (
        load_table(spark, SRC, "orders")
        .join(load_table(spark, SRC, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .count()
    )
    scaled_n = (
        load_table(spark, scaled, "orders")
        .join(load_table(spark, scaled, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .count()
    )
    assert scaled_n == FACTOR * base


def test_documents_perturbed_across_copies(spark, scaled):
    """Cross-copy texts must differ (else pair-emitting dedup queries go
    quadratic in the factor): distinct text count scales with the factor."""
    d_src = load_table(spark, SRC, "documents")
    d_dst = load_table(spark, scaled, "documents")
    src_distinct = d_src.select("text").distinct().count()
    dst_distinct = d_dst.select("text").distinct().count()
    assert dst_distinct == FACTOR * src_distinct
    # copy 0 is byte-identical to the source corpus
    n_doc = d_src.count()
    copy0 = d_dst.filter(F.col("doc_id") < n_doc * 1000)  # doc ids shifted far
    assert (
        d_src.join(d_dst, ["doc_id", "text"], "left_anti").count() == 0
    ), "copy 0 must keep original doc_id/text pairs"


def test_generation_is_idempotent(spark, scaled, tmp_path):
    import os
    import time

    before = {
        t: os.path.getmtime(os.path.join(scaled, f"{t}.parquet"))
        for t in ["orders", "documents"]
    }
    time.sleep(0.05)
    ensure_scaled_dataset(spark, SRC, scaled, factor=FACTOR)  # cached: no rewrite
    for t, m in before.items():
        assert os.path.getmtime(os.path.join(scaled, f"{t}.parquet")) == m


# -- skewed variant (ensure_skewed_dataset) -----------------------------------

@pytest.fixture(scope="module")
def skewed(spark, tmp_path_factory):
    from direct_spark_sql_spark.sources.scale import ensure_skewed_dataset

    dst = str(tmp_path_factory.mktemp("skewed") / "hot")
    ensure_skewed_dataset(spark, SRC, dst, hot_frac_mod=10)
    return dst


def test_skewed_preserves_row_counts(spark, skewed):
    for t in ["events", "lineitem", "documents", "orders"]:
        assert (
            load_table(spark, skewed, t).count()
            == load_table(spark, SRC, t).count()
        ), t


def test_skewed_hot_keys_at_expected_fraction(spark, skewed):
    e = load_table(spark, skewed, "events")
    n = e.count()
    top = (
        e.groupBy("user_id").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    # hot user holds >= ~8% of rows (1/10 engineered + its organic share)
    assert top["count"] >= 0.08 * n, f"hot user only {top['count']}/{n}"

    li = load_table(spark, skewed, "lineitem")
    n_li = li.count()
    top_li = (
        li.groupBy("l_orderkey").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    assert top_li["count"] >= 0.08 * n_li
    # hot orderkey still joins: it must exist in orders (FK preserved)
    o = load_table(spark, skewed, "orders")
    assert o.filter(F.col("o_orderkey") == top_li["l_orderkey"]).count() == 1


def test_skewed_documents_share_boilerplate(spark, skewed):
    from direct_spark_sql_spark.sources.scale import _BOILERPLATE

    d = load_table(spark, skewed, "documents")
    n = d.count()
    hot = d.filter(F.col("text").startswith(_BOILERPLATE)).count()
    assert abs(hot - n / 10) <= n / 10 * 0.5 + 2
    # n_chars stays consistent with the rewritten text
    bad = d.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0


def test_skewed_documents_mass_duplicate_slice(spark, skewed):
    """The v2 mass-duplicate slice: ~10% of documents byte-identical
    (one hot fp_content), DISJOINT from the boilerplate-prefix slice, so
    both pathologies stress the probe independently (VERDICT r7 #1)."""
    from direct_spark_sql_spark.sources.scale import _BOILERPLATE, _MASS_DUP

    d = load_table(spark, skewed, "documents")
    n = d.count()
    dup = d.filter(F.col("text") == _MASS_DUP).count()
    assert abs(dup - n / 10) <= n / 10 * 0.5 + 2, f"mass-dup slice {dup}/{n}"
    # disjointness is a property of the doc_id PREDICATES, not the text
    # shapes (text conditions are mutually exclusive by construction and
    # would pass even if the slices overlapped - review r8 #9): the
    # boilerplate slice is pmod(doc_id,10)==0, the mass-dup slice ==1
    bp = d.filter(F.col("text").startswith(_BOILERPLATE))
    md = d.filter(F.col("text") == _MASS_DUP)
    assert bp.filter(F.pmod("doc_id", F.lit(10)) != 0).count() == 0
    assert md.filter(F.pmod("doc_id", F.lit(10)) != 1).count() == 0
    # the mass-dup group is the single largest exact-content group
    top = (
        d.groupBy("text").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    assert top["text"] == _MASS_DUP
