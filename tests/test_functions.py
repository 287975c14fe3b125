"""Function-library tests: the registered UDF surface must agree with the
native JVM column functions (exactly for integer/hash functions, to 1e-9
for float cosine), and be callable from SQL text through the Engine."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from direct_spark_sql_spark.functions import columns as C
from direct_spark_sql_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_udf_h64_matches_native(spark, engine):
    c = load_table(spark, SF_DIR, "customer").limit(200)
    got = (
        c.select(
            C.h64("c_name").alias("native"),
            F.expr("dss_h64(c_name)").alias("udf"),
        )
        .filter(F.col("native") != F.col("udf"))
        .count()
    )
    assert got == 0


def test_udf_token_count_matches_native(spark, engine):
    d = load_table(spark, SF_DIR, "documents").limit(200)
    got = (
        d.select(
            C.token_count("text").alias("native"),
            F.expr("dss_token_count(text)").alias("udf"),
        )
        .filter(F.col("native") != F.col("udf"))
        .count()
    )
    assert got == 0


def test_udf_cosine_close_to_exact(spark, engine):
    e = load_table(spark, SF_DIR, "embeddings").limit(50)
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    from direct_spark_sql_spark.operators.similarity import _dec_vec

    rows = (
        e.crossJoin(F.broadcast(q))
        .select(
            C.cosine_dec(_dec_vec("embedding"), _dec_vec("q")).alias("exact"),
            F.expr("dss_cosine(embedding, q)").alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.exact - r.approx) < 1e-6


def test_udaf_median_matches_builtin(spark, engine):
    o = load_table(spark, SF_DIR, "orders")
    # a grouped-agg pandas UDF cannot share an agg() with JVM aggregates —
    # compute separately and join
    udaf = o.groupBy("o_orderpriority").agg(
        F.expr("dss_median(o_totalprice)").alias("udaf")
    )
    builtin = o.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("builtin")
    )
    got = (
        udaf.join(builtin, "o_orderpriority")
        .filter(F.abs(F.col("udaf") - F.col("builtin")) > 1e-9)
        .count()
    )
    assert got == 0


def test_udtf_shape_char_ngrams(spark, engine):
    d = load_table(spark, SF_DIR, "documents").limit(5).select("doc_id", "text")
    exploded = d.select("doc_id", F.explode(F.expr("dss_char_ngrams(text)")).alias("g"))
    pdf = exploded.toPandas()
    assert len(pdf) > len(d.toPandas())
    assert (pdf["g"].str.len() <= 3).all()


def test_udfs_callable_via_engine_sql(engine):
    engine.register_table(
        "fn_people",
        [{"name": "alice smith", "age": 30}, {"name": "bob", "age": 40}],
        "name string, age int",
    )
    t = engine.sql_directly(
        "SELECT name, dss_token_count(name) AS n FROM fn_people ORDER BY name"
    )
    rows = t.to_list_of_dicts()
    assert rows == [
        {"name": "alice smith", "n": 2},
        {"name": "bob", "n": 1},
    ]


def test_iterator_udf_matches_jvm_quality_formula(spark, engine):
    """The iterator-form pandas UDF (per-executor init amortization) must
    produce the identical stopword-ratio per-mille as the pure-JVM
    expression it mirrors."""
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    got = d.select(
        "doc_id", F.expr("dss_quality_iter(text)").alias("q")
    )
    toks = F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
    stop = F.array(*[F.lit(w) for w in
                     ("the", "a", "of", "and", "to", "in", "is", "it")])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    jvm = d.select(
        "doc_id",
        F.when(F.size(toks) > 0, (F.lit(1000) * n_stop).cast("long") / F.size(toks))
        .otherwise(F.lit(0)).cast("long").alias("q"),
    )
    mismatch = (
        got.alias("g").join(jvm.alias("j"), "doc_id")
        .filter(F.col("g.q") != F.col("j.q")).count()
    )
    assert mismatch == 0


def test_arrow_optimized_udf_matches_jvm(spark, engine):
    """useArrow=True regular UDF must equal UPPER(SUBSTR(x,1,3)) and its
    plan must use the Arrow eval path, not pickled BatchEvalPython."""
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(200)
    got = d.select("doc_id", F.expr("dss_tag3(text)").alias("t"))
    jvm = d.select("doc_id", F.upper(F.substring("text", 1, 3)).alias("t"))
    assert got.exceptAll(jvm).count() == 0 and jvm.exceptAll(got).count() == 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan[:800]
