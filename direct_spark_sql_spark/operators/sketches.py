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


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan, J.Algorithms'05): frequency
# estimation in d×w fixed memory, mergeable by cell-wise addition — the
# bounded-memory heavy-hitters story at 100 TB (per-partition sketches
# partial-aggregate map-side; the reduced sketch is ≤ d·w rows regardless
# of input size).  Hashing is the engine-portable MD5 family (hashing.py),
# so a DuckDB oracle replays estimates — including collisions — bit-exactly.
# ---------------------------------------------------------------------------


def cms_build(df: DataFrame, col: str, d: int = 4, w: int = 64) -> DataFrame:
    """Count-min sketch of ``col``'s value frequencies: one row per
    non-empty cell, ``(row_i, bucket, cnt)``, at most d·w rows.

    Each value increments one bucket per hash row; the groupBy partial-
    aggregates map-side, so the shuffle carries at most d·w rows per
    partition no matter how large the input."""
    cells = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row_i"),
                    F.pmod(
                        h64(F.concat(F.lit(f"cms{i}|"), F.col(col).cast("string"))),
                        F.lit(w),
                    ).cast("int").alias("bucket"),
                )
                for i in range(d)
            ])
        ).alias("c")
    )
    return (
        cells.groupBy(F.col("c.row_i").alias("row_i"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, d: int = 4, w: int = 64
) -> DataFrame:
    """Point-query the sketch for each key: est = min over hash rows of the
    key's bucket count (missing cell ⇒ 0).  ``keys`` is the small side —
    broadcast against the ≤ d·w-row sketch."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row_i"),
                    F.pmod(
                        h64(F.concat(F.lit(f"cms{i}|"), F.col(key_col).cast("string"))),
                        F.lit(w),
                    ).cast("int").alias("bucket"),
                )
                for i in range(d)
            ])
        ).alias("p"),
    ).select(key_col, F.col("p.row_i").alias("row_i"), F.col("p.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est"))
    )


def cms_sql(table_expr: str, val_expr: str, keys_expr: str, key_col: str,
            d: int = 4, w: int = 64) -> str:
    """DuckDB twin: build the identical sketch over ``val_expr`` drawn from
    ``table_expr`` and estimate each key produced by ``keys_expr``."""
    from direct_spark_sql_spark.hashing import h64_sql

    def bucket(expr: str, i: int) -> str:
        salted = "'cms" + str(i) + "|' || CAST(" + expr + " AS VARCHAR)"
        return f"({h64_sql(salted)} % {w})"

    cell_rows = " UNION ALL ".join(
        f"SELECT {i} AS row_i, {bucket(val_expr, i)} AS bucket FROM {table_expr}"
        for i in range(d)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {key_col}, {i} AS row_i, {bucket(key_col, i)} AS bucket FROM ks"
        for i in range(d)
    )
    return f"""
WITH cells AS ({cell_rows}),
sketch AS (SELECT row_i, bucket, COUNT(*) AS cnt FROM cells GROUP BY row_i, bucket),
ks AS ({keys_expr}),
probes AS ({probe_rows})
SELECT p.{key_col}, MIN(COALESCE(s.cnt, 0)) AS cms_est
FROM probes p LEFT JOIN sketch s USING (row_i, bucket)
GROUP BY p.{key_col}
"""


def kmv_set_estimates(
    df_a: "DataFrame", df_b: "DataFrame", col: str, k: int = 256
) -> DataFrame:
    """Union / intersection / Jaccard estimates for two keyed sets from
    their mergeable KMV sketches (Beyer et al., SIGMOD'07 §4: the k-min
    sketch of A∪B is computable from the two k-min sketches, and the
    fraction of that synopsis present in both sets estimates Jaccard).

    The 100 TB point: each side's sketch is a distinct + bounded top-k —
    one shuffle each, O(k) state — and set algebra then happens on ≤2k
    hashes, so per-segment sketches (per day / per source) roll up into
    cross-segment overlap estimates without ever re-scanning the data.
    Deterministic MD5-family hashing makes every estimate a pure function
    of the data, replayed bit-exactly by the DuckDB oracle.

    Output (one row): n_union_synopsis, kth_hash, union_est, inter_in_k,
    inter_est, jaccard_est.
    """
    ka = df_a.select(h64(F.col(col)).alias("h")).distinct().orderBy("h").limit(k)
    kb = df_b.select(h64(F.col(col)).alias("h")).distinct().orderBy("h").limit(k)
    ku = ka.union(kb).distinct().orderBy("h").limit(k)
    # membership of each union-synopsis hash in each side's k-min set:
    # exact within the synopsis because K(A∪B) ⊆ K(A) ∪ K(B).
    both = (
        ku.join(ka.withColumnRenamed("h", "ha"), ku.h == F.col("ha"), "left_semi")
        .join(kb.withColumnRenamed("h", "hb"), ku.h == F.col("hb"), "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("inter_in_k"))
    )
    stats = ku.agg(
        F.max("h").alias("kth_hash"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        (F.lit(float(k - 1)) * F.lit(HASH_SPACE)) / F.col("kth_hash").cast("double")
    )
    out = stats.crossJoin(both)
    jac = F.col("inter_in_k").cast("double") / F.col("n_kept").cast("double")
    return out.select(
        F.col("n_kept").cast("long").alias("n_union_synopsis"),
        F.col("kth_hash").cast("long").alias("kth_hash"),
        union_est.alias("union_est"),
        "inter_in_k",
        (jac * union_est).alias("inter_est"),
        jac.alias("jaccard_est"),
    )


def kmv_set_estimates_sql(
    table_a: str, table_b: str, col_expr: str, k: int = 256
) -> str:
    """DuckDB twin of :func:`kmv_set_estimates`."""
    from direct_spark_sql_spark.hashing import h64_sql

    return f"""
WITH ka AS (SELECT DISTINCT {h64_sql(col_expr)} AS h FROM {table_a} ORDER BY h LIMIT {k}),
kb AS (SELECT DISTINCT {h64_sql(col_expr)} AS h FROM {table_b} ORDER BY h LIMIT {k}),
ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb) ORDER BY h LIMIT {k}),
stats AS (SELECT MAX(h) AS kth_hash, CAST(COUNT(*) AS BIGINT) AS n_kept FROM ku),
ovl AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS inter_in_k
  FROM ku WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
)
SELECT CAST(n_kept AS BIGINT) AS n_union_synopsis,
       CAST(kth_hash AS BIGINT) AS kth_hash,
       CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
            ELSE (CAST({float(k - 1)} AS DOUBLE) * {HASH_SPACE}) / CAST(kth_hash AS DOUBLE)
       END AS union_est,
       inter_in_k,
       (CAST(inter_in_k AS DOUBLE) / CAST(n_kept AS DOUBLE))
         * CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                ELSE (CAST({float(k - 1)} AS DOUBLE) * {HASH_SPACE}) / CAST(kth_hash AS DOUBLE)
           END AS inter_est,
       CAST(inter_in_k AS DOUBLE) / CAST(n_kept AS DOUBLE) AS jaccard_est
FROM stats, ovl
"""


def kmv_distinct_per_group(
    df: DataFrame, group_col: str, col: str, k: int = 64
) -> DataFrame:
    """Per-group distinct-count estimates from per-group k-min synopses:
    one row per group ``(group, n_kept, estimate)``.

    The per-group sketch is the partition-friendly shape for GROUP BY
    cardinality profiling at 100 TB: distinct on (group, hash) — one
    map-side-combined shuffle — then a bounded rank window keeps k hashes
    per group, so downstream state is O(groups × k) however large the
    input.  Same deterministic estimator as `kmv_distinct_estimate`, so
    the DuckDB oracle replays every estimate bit-exactly.
    """
    from pyspark.sql import Window

    hs = df.select(F.col(group_col).alias("g"), h64(F.col(col)).alias("h")).distinct()
    w = Window.partitionBy("g").orderBy("h")
    kmin = hs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = kmin.groupBy("g").agg(
        F.max("h").alias("kth_hash"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        (F.lit(float(k - 1)) * F.lit(HASH_SPACE)) / F.col("kth_hash").cast("double")
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_kept",
        est.alias("estimate"),
    )


def kmv_per_group_sql(table_expr: str, group_expr: str, col_expr: str, k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_distinct_per_group`."""
    from direct_spark_sql_spark.hashing import h64_sql

    return f"""
WITH hs AS (SELECT DISTINCT {group_expr} AS g, {h64_sql(col_expr)} AS h FROM {table_expr}),
kmin AS (SELECT g, h FROM (
  SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn FROM hs
) WHERE rn <= {k}),
agg AS (SELECT g, MAX(h) AS kth_hash, CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM kmin GROUP BY g)
SELECT g AS {group_expr}, n_kept,
       CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
            ELSE (CAST({float(k - 1)} AS DOUBLE) * {HASH_SPACE}) / CAST(kth_hash AS DOUBLE)
       END AS estimate
FROM agg ORDER BY g
"""
