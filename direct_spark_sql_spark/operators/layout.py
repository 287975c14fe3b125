"""Physical data layout: bucketed tables for shuffle-free co-located joins.

The reference executes every join over in-memory temp views (hash build +
probe per query, DirectExecSuite.scala join coverage); it has no
persistent-layout layer because it never outlives a session.  At cluster
scale the dominant cost of a *recurring* big-big join is the shuffle
exchange on the join key — 100 TB re-hashed across the wire on every run.
Bucketing amortizes that exchange into the one-time write: both sides are
written hash-partitioned into the same number of buckets on the join key,
and every later join on that key plans with ZERO Exchange nodes (Spark
reads bucket i of each side on the same task).  The same property makes
bucketed `groupBy(bucket_key)` aggregation shuffle-free.

Verification: `tests/test_plan_shapes.py` pins the bucketed join plan to
SortMergeJoin with no ShuffleExchange on either side; the registry query
`join_bucketed_colocated` hash-matches the plain (unbucketed) oracle —
layout must change the plan, never the result.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def bucketed_table(
    spark: SparkSession,
    name: str,
    path: str,
    build: Callable[[], DataFrame],
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Idempotently materialize ``build()`` as a bucketed external table.

    Three entry states, cheapest first:

    1. table already in this session's catalog → reuse (no I/O);
    2. files exist from an earlier session but the (in-memory) catalog
       doesn't know them → register an external bucketed table over the
       existing files (DDL only — Spark recovers the bucket id of each
       file from its ``_0000N`` filename component);
    3. nothing exists → bucketed write via ``bucketBy().sortBy()``.

    The bucket spec lives in the catalog, not the files: reading the same
    parquet with a bare ``spark.read.parquet`` yields correct DATA but a
    shuffling PLAN.  That asymmetry is why this helper owns registration.
    """
    if spark.catalog.tableExists(name):
        return spark.table(name)
    sort_cols = list(sort_cols or bucket_cols)
    cluster = ", ".join(bucket_cols)
    sorted_by = ", ".join(sort_cols)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        schema_ddl = spark.read.parquet(path).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {name} ({schema_ddl}) USING PARQUET "
            f"CLUSTERED BY ({cluster}) SORTED BY ({sorted_by}) "
            f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
        )
        return spark.table(name)
    (
        build()
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .option("path", path)
        .saveAsTable(name)
    )
    return spark.table(name)


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering
# ---------------------------------------------------------------------------

#: Bits taken from each dimension for the interleave (16+16 → 32-bit code).
MORTON_BITS = 16

#: Bit-spread magic masks: insert one zero between consecutive bits of a
#: 16-bit value (the classic "Interleave bits by Binary Magic Numbers"
#: construction) — pure 64-bit integer arithmetic, identical in any engine.
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c):
    from pyspark.sql import functions as F

    # pin to 64-bit: a 32-bit input would overflow the shifts
    x = c.cast("long").bitwiseAND(F.lit((1 << MORTON_BITS) - 1))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton_code(a, b):
    """Interleaved 32-bit Z-order code of two 16-bit dimensions (a in the
    even bits, b in the odd): prefix ranges of the code are small
    axis-aligned rectangles in (a, b) space."""
    from pyspark.sql import functions as F

    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def _spread16_sql(expr: str) -> str:
    # CAST to BIGINT: engines that type bare literals as 32-bit INTEGER
    # (DuckDB) would overflow the shifts
    x = f"(CAST({expr} AS BIGINT) & {(1 << MORTON_BITS) - 1})"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def morton_code_sql(a: str, b: str) -> str:
    """SQL-text twin of :func:`morton_code` (valid in Spark SQL and DuckDB)."""
    return f"({_spread16_sql(a)} | ({_spread16_sql(b)} << 1))"


def zorder_layout(df: DataFrame, a: str, b: str, partitions: int | None = None) -> DataFrame:
    """Cluster rows by the Z-order code of two dimensions — the write-side
    layout that makes min/max file skipping effective for predicates on
    EITHER dimension (a linear sort is tight on one dimension and useless
    on the other; the Morton curve is near-tight on both).

    ``repartitionByRange`` on the code gives contiguous curve segments per
    output file; ``sortWithinPartitions`` tightens row-group stats inside
    each file.  Downstream: write to parquet and let pushdown + row-group
    stats prune — no index structure to maintain.
    """
    from pyspark.sql import functions as F

    coded = df.withColumn("zcode", morton_code(F.col(a), F.col(b)))
    parted = (
        coded.repartitionByRange(partitions, "zcode")
        if partitions
        else coded.repartitionByRange("zcode")
    )
    return parted.sortWithinPartitions("zcode")


def compact_table(
    spark: "SparkSession",
    table_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a fragmented parquet table into ~``target_file_bytes``
    files; returns the target file count.

    The small-files problem is the classic long-running-ingest pathology:
    every streaming micro-batch / incremental merge leaves a few KB-to-MB
    files, and at 100 TB a scan pays per-file open/footer/scheduling cost
    millions of times.  Compaction = size the output file count from the
    *actual* on-disk bytes (Hadoop FS listing — works on HDFS/S3A/local
    alike), then rewrite with ``coalesce`` — a narrow dependency that
    merges partitions without a shuffle, which is exactly right for
    bin-packing existing rows into fewer files.
    """
    import math

    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    (
        spark.read.parquet(table_path)
        .coalesce(n_files)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files
