"""Plan/behavior pins for the scale-layer features: zone-map data
skipping must actually skip files, and dynamic partition pruning must
reach the fact scan's PartitionFilters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from direct_spark_sql_spark.plans.scaleops import (
    _ZM_HI_US,
    _ZM_LO_US,
    ensure_events_clustered,
    ensure_events_partitioned,
    join_partition_pruned_dpp,
    zonemap_pruned_scan,
)
from direct_spark_sql_spark.sources import zonemap as zm
from tests.conftest import SF_DIR


def test_zonemap_scan_skips_files(spark):
    table_path, index_path = ensure_events_clustered(spark, SF_DIR)
    total_files = len(spark.read.parquet(table_path).inputFiles())
    lo = F.timestamp_micros(F.lit(_ZM_LO_US))
    hi = F.timestamp_micros(F.lit(_ZM_HI_US))
    pruned = zm.pruned_scan(spark, table_path, index_path, "ts", lo, hi)
    kept_files = len(pruned.inputFiles())
    # 4-and-a-bit days of a 30-day clustered span → a small fraction of
    # the 16 files survives; the invariant is strict skipping.
    assert kept_files < total_files
    assert kept_files <= max(4, total_files // 2)
    # soundness: identical result to the unpruned filtered scan
    base = spark.read.parquet(table_path).filter(
        (F.col("ts") >= lo) & (F.col("ts") <= hi)
    )
    assert pruned.count() == base.count()


def test_zonemap_empty_range_returns_empty_with_schema(spark):
    table_path, index_path = ensure_events_clustered(spark, SF_DIR)
    lo = F.timestamp_micros(F.lit(0))  # 1970: before every zone
    hi = F.timestamp_micros(F.lit(1))
    out = zm.pruned_scan(spark, table_path, index_path, "ts", lo, hi)
    assert out.count() == 0
    assert "event_id" in out.columns and "ts" in out.columns


def test_dpp_reaches_fact_partition_filters(spark):
    ensure_events_partitioned(spark, SF_DIR)
    df = join_partition_pruned_dpp(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_zonemap_index_is_metadata_scale(spark):
    table_path, index_path = ensure_events_clustered(spark, SF_DIR)
    idx = spark.read.parquet(index_path)
    assert idx.count() == len(spark.read.parquet(table_path).inputFiles())
    assert set(idx.columns) == {"file", "n_rows", "ts_min", "ts_max"}


def test_bloom_filter_join_plan(spark):
    from direct_spark_sql_spark.plans.scaleops import join_bloom_filtered

    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    df = join_bloom_filtered(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan and "might_contain" in plan, plan[:1500]
    # confs were restored after plan derivation (compare against the
    # pre-call value — under the broadcast-disabled robustness axis the
    # session default is itself -1, which is not a leak)
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before


def test_compaction_collapses_files_preserving_rows(spark):
    from direct_spark_sql_spark.operators.layout import compact_table
    from direct_spark_sql_spark.plans.scaleops import ensure_fragmented_events
    from direct_spark_sql_spark.sources.registry import dataset_tag, warehouse_path

    frag = ensure_fragmented_events(spark, SF_DIR)
    n_frag_files = len(spark.read.parquet(frag).inputFiles())
    assert n_frag_files >= 32  # genuinely fragmented input
    out = warehouse_path("compact", f"events_compacted_test_{dataset_tag(SF_DIR)}")
    n_target = compact_table(spark, frag, out, target_file_bytes=64 * 1024 * 1024)
    got = spark.read.parquet(out)
    assert len(got.inputFiles()) == n_target < n_frag_files
    assert got.count() == spark.read.parquet(frag).count()


def test_aqe_skew_join_splits_hot_partition(spark):
    """Engine posture for skewed keys the *automatic* way (complementing
    the manual join_skew_salted operator): with AQE skew-join on, a 90%-
    hot key is split at runtime — SortMergeJoin(skew=true) over an
    AQEShuffleRead marked `skewed` — without any query rewrite.  Local
    thresholds are shrunk to make the tiny fixture exhibit what a 100 TB
    hot key does naturally."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 500000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").select(F.sum(F.col("v") + F.col("w")).alias("s"))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_streaming_zonemap_index_skips_files(spark):
    """The incrementally-built (streamed) zone map must actually skip:
    the Jan-8..12 window overlaps 2 of the 3 ingested chunk files."""
    import os

    from direct_spark_sql_spark.plans.scaleops import _ZM_HI_US, _ZM_LO_US
    from direct_spark_sql_spark.plans.streaming import streaming_zonemap_ingest
    from direct_spark_sql_spark.sources.registry import dataset_tag, warehouse_path

    streaming_zonemap_ingest(spark, SF_DIR).collect()  # ensure ingested
    root = warehouse_path("stream_zonemap", dataset_tag(SF_DIR))
    idx = spark.read.parquet(os.path.join(root, "index"))
    scan = zm.pruned_scan(
        spark, os.path.join(root, "table"), os.path.join(root, "index"), "ts",
        F.timestamp_micros(F.lit(_ZM_LO_US)), F.timestamp_micros(F.lit(_ZM_HI_US)),
    )
    assert idx.count() == 3  # one index row per micro-batch file
    assert len(scan.inputFiles()) < 3


def test_bm25_index_pushes_term_filter_to_scan(spark):
    """The inverted-index query must push the term IN-list into the
    postings parquet scan (PushedFilters: In(term,...)), and read only
    the postings/doclens/stats columns it needs."""
    from direct_spark_sql_spark.plans.pipeline_ext import bm25_indexed_search

    df = bm25_indexed_search(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(term" in plan, plan[:2000]


def test_zonemap_soundness_across_ranges(spark):
    """Zone-map skipping must be sound for ANY range, including ones
    aligned exactly on file boundaries, empty ranges, and full-table
    spans: pruned count == unpruned filtered count for a deterministic
    spread of windows derived from the actual zone boundaries."""
    table_path, index_path = ensure_events_clustered(spark, SF_DIR)
    idx = spark.read.parquet(index_path).orderBy("ts_min").collect()
    spans = [
        (idx[0]["ts_min"], idx[-1]["ts_max"]),              # full table
        (idx[1]["ts_min"], idx[1]["ts_max"]),               # one file exactly
        (idx[2]["ts_max"], idx[3]["ts_min"]),               # boundary straddle
        (idx[0]["ts_min"], idx[0]["ts_min"]),               # single instant
        (idx[-1]["ts_max"], idx[-1]["ts_max"]),             # last instant
    ]
    base = spark.read.parquet(table_path)
    for lo, hi in spans:
        pruned = zm.pruned_scan(spark, table_path, index_path, "ts", lo, hi).count()
        full = base.filter((F.col("ts") >= lo) & (F.col("ts") <= hi)).count()
        assert pruned == full, (lo, hi)


def test_footer_pushdown_plan(spark):
    from direct_spark_sql_spark.plans.scaleops import agg_footer_pushdown

    df = agg_footer_pushdown(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregation" in plan, plan[:1500]
    # confs restored after plan derivation
    assert spark.conf.get("spark.sql.parquet.aggregatePushdown") != "true"


def test_zorder_2d_zonemap_skips_files(spark):
    """The Z-ordered layout must make the two-column zone map effective:
    the 2-D box keeps a minority of the 16 files, and strictly fewer than
    pruning on the time dimension alone (what a 1-D sort would give)."""
    from direct_spark_sql_spark.plans.scaleops import (
        _Z2_DAY,
        _Z2_USER,
        ensure_events_zordered,
    )

    table_path, index_path = ensure_events_zordered(spark, SF_DIR)
    total = len(spark.read.parquet(table_path).inputFiles())
    both = zm.pruned_scan_multi(
        spark, table_path, index_path,
        [("user_id", *_Z2_USER), ("day", *_Z2_DAY)],
    )
    day_only = zm.pruned_scan_multi(
        spark, table_path, index_path, [("day", *_Z2_DAY)]
    )
    n_both = len(both.inputFiles())
    n_day = len(day_only.inputFiles())
    assert n_both < total
    assert n_both <= n_day
    assert n_both <= total // 2, (n_both, n_day, total)


def test_conf_scoped_derivation_is_concurrency_safe(spark):
    """The three conf-scoped queries derive their plans on cloned sessions
    (plans/base.py:derive_with_confs); a query deriving its plan on the
    SHARED session concurrently must never see bloom/pushdown/broadcast
    confs — under the old set/restore-globals pattern this exact soak
    could flake with a BroadcastHashJoin appearing in the disabled-
    broadcast query or vice versa."""
    import threading

    if spark.conf.get("spark.sql.autoBroadcastJoinThreshold") in ("-1", "-1b"):
        pytest.skip(
            "leak detector distinguishes leaked -1 from the default "
            "broadcast plan; under the broadcast-disabled robustness axis "
            "the session default is already -1 so the signal is undefined"
        )

    from direct_spark_sql_spark.plans.scaleops import (
        agg_footer_pushdown,
        join_bloom_filtered,
    )
    from direct_spark_sql_spark.sources.registry import load_table

    errors: list[str] = []
    stop = threading.Event()

    def conf_mutators():
        for _ in range(6):
            join_bloom_filtered(spark, SF_DIR)
            agg_footer_pushdown(spark, SF_DIR)
        stop.set()

    def bystander():
        # a small-dim join planned on the shared session: with default
        # confs it must ALWAYS broadcast; if a mutator's -1 threshold
        # leaked mid-derivation it would plan as SMJ/SHJ instead
        while not stop.is_set():
            c = load_table(spark, SF_DIR, "customer")
            n = load_table(spark, SF_DIR, "nation")
            df = c.join(n, c.c_nationkey == n.n_nationkey).groupBy("n_name").count()
            plan = df._jdf.queryExecution().executedPlan().toString()
            if "BroadcastHashJoin" not in plan:
                errors.append(plan[:800])
                return

    threads = [
        threading.Thread(target=conf_mutators),
        threading.Thread(target=bystander),
        threading.Thread(target=bystander),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, f"broadcast conf leaked into shared session: {errors[0]}"
