"""Distinct-count sketching: KMV (k-minimum-values).

Spark's ``approx_count_distinct`` is HLL++, whose estimate depends on the
engine's private hash — it can never be differentially checked.  KMV over
the engine's deterministic MD5-family hash gives the same O(k) memory /
single-pass profile with an estimate that is a pure function of the data,
so DuckDB replays it bit-exactly (Beyer et al., "On Synopses for Distinct-
Value Estimation Under Multiset Operations", SIGMOD'07).

Estimator: with U(k) = the k-th smallest distinct hash mapped into (0,1),
estimate = (k-1) / U(k).  The plan is a distinct (one shuffle, map-side
partial) followed by a global bounded top-k (TakeOrderedAndProject) —
never a full sort, never O(n) driver memory.

KMV sketches also union trivially (merge the k-min sets) — the property
that lets per-partition / per-day sketches roll up, which HLL shares but
engine-portable determinism makes auditable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from direct_spark_sql_spark.hashing import h64

#: hash space: h64 yields 60-bit ints (15 hex chars)
HASH_SPACE = float(1 << 60)


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame: (kth_hash, estimate) for the distinct count of
    ``col``.  Exact when the true distinct count is < k is NOT handled
    specially here — callers with tiny domains should just count."""
    kth = (
        df.select(h64(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.max("h").alias("kth_hash"), F.count(F.lit(1)).alias("n_kept"))
    )
    # if fewer than k distinct values exist, n_kept < k and the k-min set IS
    # the distinct set — the estimate degrades to the exact count.
    return kth.select(
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
            (F.lit(float(k - 1)) * F.lit(HASH_SPACE)) / F.col("kth_hash").cast("double")
        ).alias("estimate"),
    )


def kmv_estimate_sql(table_expr: str, col_expr: str, k: int = 256) -> str:
    """DuckDB twin of :func:`kmv_distinct_estimate`."""
    from direct_spark_sql_spark.hashing import h64_sql

    return f"""
WITH hs AS (SELECT DISTINCT {h64_sql(col_expr)} AS h FROM {table_expr}),
kmin AS (SELECT h FROM hs ORDER BY h LIMIT {k}),
kth AS (SELECT MAX(h) AS kth_hash, COUNT(*) AS n_kept FROM kmin)
SELECT kth_hash,
       CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
            ELSE (CAST({float(k - 1)} AS DOUBLE) * {HASH_SPACE}) / CAST(kth_hash AS DOUBLE)
       END AS estimate
FROM kth
"""
