"""Streaming-specific tests beyond the registry's stream==oracle checks:
multi-micro-batch state carry-over, and stream/batch plan unification
(the same transformation function applied to a batch DataFrame).
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from direct_spark_sql_spark.sources.registry import load_table
from direct_spark_sql_spark.streaming import (
    read_events_stream,
    run_available_now,
    stream_tumbling_totals,
    stream_user_counts_stateful,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    """events split into 4 parquet files so maxFilesPerTrigger=1 yields
    multiple micro-batches (each file named events.parquet under its own
    glob-visible name would break the filter, so write a dedicated dir)."""
    out = tmp_path_factory.mktemp("events_split")
    ev = load_table(spark, SF_DIR, "events")
    # split by event_id ranges → deterministic, non-empty files
    ids = [r[0] for r in ev.select(F.max("event_id")).collect()]
    hi = ids[0]
    bounds = [0, hi // 4, hi // 2, 3 * hi // 4, hi + 1]
    for i in range(4):
        part = ev.filter(
            (F.col("event_id") >= bounds[i]) & (F.col("event_id") < bounds[i + 1])
        )
        part.coalesce(1).write.mode("overwrite").parquet(str(out / f"chunk{i}"))
    return str(out)


def test_stateful_counts_across_batches(spark, split_events_dir):
    """State must accumulate across micro-batches: stream the 4-file split
    with maxFilesPerTrigger=1 and check the final per-user totals equal the
    batch groupBy."""
    stream = (
        spark.readStream.schema(
            load_table(spark, SF_DIR, "events").schema
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(split_events_dir)
    )
    snapshots = run_available_now(
        stream_user_counts_stateful(stream), "split_user_counts", "update"
    )
    final = (
        snapshots.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100)) / 100.0).alias("total_value"),
        )
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(final, batch, check_dtype=False)
    # the run must actually have taken multiple micro-batches for this to
    # prove state carry-over: snapshots should exceed distinct users
    assert len(snapshots.toPandas()) > len(final)


def test_stream_batch_unification(spark):
    """The same transformation function runs on a batch DataFrame and must
    produce the identical result — the composability contract of the
    streaming module."""
    batch_events = load_table(spark, SF_DIR, "events")
    via_batch = (
        stream_tumbling_totals(batch_events)
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    stream_events = read_events_stream(spark, SF_DIR)
    via_stream = (
        run_available_now(stream_tumbling_totals(stream_events), "unify_check")
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(via_batch, via_stream, check_dtype=False)
