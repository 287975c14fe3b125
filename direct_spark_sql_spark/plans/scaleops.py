"""Scale-layer queries: zone-map data skipping and dynamic partition
pruning — the two file-skipping mechanisms a 100 TB table needs beyond
plain predicate pushdown.

Both queries materialize their layout once into the warehouse scratch dir
(build-once/query-many, like the IVF index and the bucketed tables) and
are oracle-checked against the *unoptimized* equivalent over the source
table — so a pruning bug that drops or duplicates rows breaks the match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from direct_spark_sql_spark.plans.base import Query
from direct_spark_sql_spark.sources import zonemap as zm
from direct_spark_sql_spark.sources.registry import (
    dataset_tag,
    load_table,
    warehouse_path,
)

# ---------------------------------------------------------------------------
# Zone-map pruned range scan
# ---------------------------------------------------------------------------

#: query window: 2024-01-08 .. 2024-01-12 (µs since epoch, exact integers)
_ZM_LO_US = 1_704_672_000_000_000
_ZM_HI_US = 1_705_017_600_000_000
_ZM_FILES = 16


def _zonemap_paths(sf_dir: str) -> tuple[str, str]:
    tag = dataset_tag(sf_dir)
    return (
        warehouse_path("zonemap", f"events_by_ts_{tag}"),
        warehouse_path("zonemap", f"events_by_ts_{tag}_idx"),
    )


def ensure_events_clustered(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Idempotently lay events out range-clustered on ``ts`` (16 files)
    with a zone-map index; returns (table_path, index_path)."""
    table_path, index_path = _zonemap_paths(sf_dir)
    src = load_table(spark, sf_dir, "events")
    zm.ensure_clustered_table(spark, src, table_path, index_path, "ts", _ZM_FILES)
    return table_path, index_path


def zonemap_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range scan over the ts-clustered events table reading only the
    zone-map-surviving files (~1/6 of them for this window), then a
    per-type aggregate.  Row-level filter is re-applied, so the result —
    and the oracle over the raw table — is layout-independent."""
    table_path, index_path = ensure_events_clustered(spark, sf_dir)
    lo = F.timestamp_micros(F.lit(_ZM_LO_US))
    hi = F.timestamp_micros(F.lit(_ZM_HI_US))
    scan = zm.pruned_scan(spark, table_path, index_path, "ts", lo, hi)
    return (
        scan.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("event_id").cast("long").alias("min_event_id"),
            F.max("event_id").cast("long").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


ZONEMAP_ORACLE = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(event_id) AS BIGINT) AS min_event_id,
       CAST(MAX(event_id) AS BIGINT) AS max_event_id
FROM events
WHERE epoch_us(ts) >= {_ZM_LO_US} AND epoch_us(ts) <= {_ZM_HI_US}
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Dynamic partition pruning
# ---------------------------------------------------------------------------

def ensure_events_partitioned(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently write events hive-partitioned by ``event_type``."""
    import os

    path = warehouse_path("dpp", f"events_by_type_{dataset_tag(sf_dir)}")
    marker = os.path.join(path, "_DPP_OK")
    if not os.path.exists(marker):
        load_table(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(path)
        with open(marker, "w") as f:
            f.write("ok\n")
    return path


def join_partition_pruned_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim join where the fact side is hive-partitioned on the join
    key and the dim side carries a selective filter only known at plan
    time of the *dim*, not the fact: Spark's dynamic partition pruning
    turns the dim's filter into a runtime partition filter on the fact
    scan (`PartitionFilters: [dynamicpruning#...]`), so at 100 TB whole
    partition directories are never listed, let alone read.  Plan shape is
    pinned in tests/test_scaleops.py."""
    fact_path = ensure_events_partitioned(spark, sf_dir)
    fact = spark.read.parquet(fact_path)
    dim = (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .filter(F.col("event_type").like("%r%"))  # error, purchase
    )
    return (
        fact.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("user_id")).cast("long").alias("sum_users"),
        )
        .orderBy("event_type")
    )


DPP_ORACLE = """
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(e.user_id) AS BIGINT) AS sum_users
FROM events e
JOIN (SELECT DISTINCT event_type FROM events WHERE event_type LIKE '%r%') d
  ON e.event_type = d.event_type
GROUP BY e.event_type ORDER BY e.event_type
"""


# ---------------------------------------------------------------------------
# Runtime bloom-filter join pruning
# ---------------------------------------------------------------------------

def join_bloom_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big join with Spark's runtime bloom-filter pruning: the
    selective side (urgent orders) builds a `bloom_filter_agg` that is
    applied as `might_contain` on the probe side's scan *before* the
    shuffle — at 100 TB this drops ~4/5 of lineitem rows ahead of the
    exchange, the row-level analogue of dynamic partition pruning.
    Broadcast is disabled so the plan is the SortMergeJoin a cluster-scale
    run would use; the bloom filter is exactly what makes that shape
    cheap.  Plan pinned in tests/test_scaleops.py.

    The thresholds apply only to this query: the plan is derived on a
    cloned session (plans/base.py:derive_with_confs), so concurrent
    queries on the shared session never observe them.
    """
    from direct_spark_sql_spark.plans.base import derive_with_confs

    def build(ns: SparkSession) -> DataFrame:
        li = load_table(ns, sf_dir, "lineitem")
        o = load_table(ns, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_lines"),
                F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
            )
            .orderBy("l_returnflag")
        )

    return derive_with_confs(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
        build,
    )


BLOOM_JOIN_ORACLE = """
SELECT l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag ORDER BY l.l_returnflag
"""


# ---------------------------------------------------------------------------
# Small-file compaction
# ---------------------------------------------------------------------------

def ensure_fragmented_events(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently write events as 64 deliberately tiny files — the
    streaming-ingest fragmentation pathology compaction exists to fix."""
    import os

    path = warehouse_path("compact", f"events_fragmented_{dataset_tag(sf_dir)}")
    marker = os.path.join(path, "_FRAG_OK")
    if not os.path.exists(marker):
        load_table(spark, sf_dir, "events").repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
        with open(marker, "w") as f:
            f.write("ok\n")
    return path


def layout_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact a 64-file fragmented events table into size-targeted files
    (operators/layout.py:compact_table — FS-listing-sized ``coalesce``,
    no shuffle), then aggregate the compacted copy.  The oracle is the
    same aggregate over the source table, so compaction dropping or
    duplicating any row breaks the match; the file-count collapse itself
    is pinned in tests/test_scaleops.py."""
    from direct_spark_sql_spark.operators.layout import compact_table

    frag = ensure_fragmented_events(spark, sf_dir)
    out = warehouse_path("compact", f"events_compacted_{dataset_tag(sf_dir)}")
    compact_table(spark, frag, out, target_file_bytes=4 * 1024 * 1024)
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("event_id").cast("long").alias("sum_ids"),
        )
        .orderBy("event_type")
    )


COMPACTION_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_ids
FROM events GROUP BY event_type ORDER BY event_type
"""


_US_PER_DAY = 86_400_000_000
_Z2_FILES = 16
#: 2-D box: users 20..50 × days Jan 15..19 (epoch-day offsets +7..+11)
_Z2_USER = (20, 50)
_Z2_DAY = (19730 + 7, 19730 + 11)  # 2024-01-15 .. 2024-01-19 as epoch days


def ensure_events_zordered(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Idempotently materialize events Z-ordered on (user_id, epoch-day)
    into 16 files, with a two-column zone map — the layout whose per-file
    min/max stays tight on BOTH dimensions."""
    import os

    from direct_spark_sql_spark.operators.layout import zorder_layout

    tag = dataset_tag(sf_dir)
    table_path = warehouse_path("zonemap", f"events_zorder_{tag}")
    index_path = warehouse_path("zonemap", f"events_zorder_{tag}_idx")
    marker = os.path.join(table_path, "_ZORDER_OK")
    if not os.path.exists(marker):
        e = load_table(spark, sf_dir, "events").withColumn(
            # ts reads as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP (UTC
            # session tz makes the cast a no-op on the instant)
            "day", F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_US_PER_DAY}")
        )
        zorder_layout(e, "user_id", "day", _Z2_FILES).drop("zcode").write.mode(
            "overwrite"
        ).parquet(table_path)
        zm.write_zonemap(spark, table_path, index_path, ["user_id", "day"])
        with open(marker, "w") as f:
            f.write("ok\n")
    return table_path, index_path


def zorder_zonemap_2d_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D box query over the Z-ordered layout: the two-column zone map
    prunes on the CONJUNCTION of both ranges — the payoff of space-
    filling clustering, which a 1-D sort can't give (tight on one
    dimension, useless on the other).  Row filter re-applied; the oracle
    is the plain 2-predicate filter over the raw table."""
    table_path, index_path = ensure_events_zordered(spark, sf_dir)
    scan = zm.pruned_scan_multi(
        spark,
        table_path,
        index_path,
        [("user_id", _Z2_USER[0], _Z2_USER[1]), ("day", _Z2_DAY[0], _Z2_DAY[1])],
    )
    return (
        scan.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("event_type")
    )


ZORDER_2D_ORACLE = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE user_id BETWEEN {_Z2_USER[0]} AND {_Z2_USER[1]}
  AND (epoch_us(ts) // {_US_PER_DAY}) BETWEEN {_Z2_DAY[0]} AND {_Z2_DAY[1]}
GROUP BY event_type ORDER BY event_type
"""


def agg_footer_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation: COUNT/MIN/MAX pushed into the parquet
    scan itself (DSv2 ``PushedAggregation``), answered from footer
    statistics without decoding a single data page — at 100 TB the
    difference between touching every page and touching every footer.
    Confs apply only to this query's plan, derived on a cloned session
    (plans/base.py:derive_with_confs) so concurrent queries on the shared
    session never observe them; plan shape pinned in
    tests/test_scaleops.py."""
    from direct_spark_sql_spark.plans.base import derive_with_confs

    def build(ns: SparkSession) -> DataFrame:
        li = ns.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet")
        return li.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.min("l_shipdate").alias("min_shipdate"),
            F.max("l_shipdate").alias("max_shipdate"),
        )

    return derive_with_confs(
        spark,
        {
            "spark.sql.sources.useV1SourceList": "",
            "spark.sql.parquet.aggregatePushdown": "true",
        },
        build,
    )


FOOTER_PUSHDOWN_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       MIN(l_shipdate) AS min_shipdate,
       MAX(l_shipdate) AS max_shipdate
FROM lineitem
"""


def source_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden ``_metadata`` file-provenance columns over a layout this
    engine built (the 64-file fragmented events copy): per-row file
    lineage with zero stored columns — the provenance story lakehouse
    audits need.  The file count is a property of our own layout, so the
    oracle can pin it; row totals prove no file is double-counted."""
    frag = ensure_fragmented_events(spark, sf_dir)
    df = spark.read.parquet(frag)
    return df.agg(
        F.countDistinct(F.col("_metadata.file_name")).cast("long").alias("n_files"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(F.col("_metadata.file_size") > 0).alias("all_sizes_positive"),
    )


SOURCE_METADATA_ORACLE = """
SELECT CAST(64 AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS all_sizes_positive
FROM events
"""


QUERIES: list[Query] = [
    Query("zonemap_pruned_scan", zonemap_pruned_scan, ZONEMAP_ORACLE,
          ("source", "layout", "scale"), bench=True,
          doc="min/max-per-file zone-map index over a ts-clustered layout; "
              "range scans open only overlapping files (Iceberg/Delta-style "
              "data skipping), row filter re-applied for soundness"),
    Query("join_partition_pruned_dpp", join_partition_pruned_dpp, DPP_ORACLE,
          ("join", "source", "scale"),
          doc="dynamic partition pruning: selective dim filter becomes a "
              "runtime PartitionFilter on the hive-partitioned fact scan"),
    Query("join_bloom_filtered", join_bloom_filtered, BLOOM_JOIN_ORACLE,
          ("join", "scale"),
          doc="runtime bloom-filter join pruning: selective build side "
              "injects might_contain into the probe scan pre-shuffle "
              "(row-level DPP analogue for non-partition keys)"),
    Query("layout_compaction", layout_compaction, COMPACTION_ORACLE,
          ("layout", "source", "scale"),
          doc="small-file compaction: FS-listing-sized shuffle-free "
              "coalesce rewrite of a 64-file fragmented table; content "
              "equality oracle + file-count pin"),
    Query("source_metadata_columns", source_metadata_columns,
          SOURCE_METADATA_ORACLE, ("source",),
          doc="hidden _metadata file-provenance columns over an engine-"
              "built 64-file layout; file count + row totals pinned"),
    Query("agg_footer_pushdown", agg_footer_pushdown, FOOTER_PUSHDOWN_ORACLE,
          ("agg", "source", "scale"),
          doc="COUNT/MIN/MAX answered from parquet footer statistics "
              "(DSv2 PushedAggregation) — no data pages decoded"),
    Query("zorder_zonemap_2d_scan", zorder_zonemap_2d_scan, ZORDER_2D_ORACLE,
          ("layout", "source", "scale"),
          doc="2-D box query: Z-ordered layout + two-column zone map "
              "prunes on the conjunction of both ranges"),
]
