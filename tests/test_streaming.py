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


def test_late_data_dropped_past_watermark(spark, tmp_path):
    """Watermark contract, provable only across micro-batches: an event
    arriving after the watermark passed its window's end must be dropped,
    and append mode must emit exactly the finalized windows.

    Spark uses the two-watermark model (SPARK-40925): late-record
    filtering in batch N uses the watermark committed at the END of batch
    N-1, so a late event is provably dropped two batches after the data
    that advanced the watermark.  Batch A (10:15, 11:20, 12:30) → commit
    advances the watermark to 11:30; batch B (12:45) runs with eviction
    watermark 11:45 and emits window 10; batch C replays a late 10:45
    event — its window end 11:00 ≤ the 11:30 late-events watermark, so it
    is dropped — plus a 14:30 event whose window never finalizes."""
    import os
    import datetime as dt

    def ts(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    schema = "event_id long, ts timestamp, user_id long, value double"
    batches = {
        "a": [(1, ts(10, 15), 7, 1.0), (2, ts(11, 20), 7, 1.0),
              (3, ts(12, 30), 7, 1.0)],
        "b": [(9, ts(12, 45), 7, 1.0)],
        "c": [(4, ts(10, 45), 7, 1.0), (5, ts(14, 30), 7, 1.0)],
    }
    src = tmp_path / "late_src"
    # file-stream micro-batch order follows modification time: force a<b<c
    now = 1_700_000_000
    for i, (sub, rows) in enumerate(batches.items()):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / sub)
        )
        mtime = now - 120 * (len(batches) - i)
        for root, _dirs, files in os.walk(str(src / sub)):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "n")
    )
    query = (
        agg.writeStream.format("memory").queryName("late_drop")
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination()
    dropped = sum(
        so["numRowsDroppedByWatermark"]
        for p in query.recentProgress
        for so in p["stateOperators"]
    )
    got = {
        r.win_start.hour: r.n
        for r in spark.table("late_drop").collect()
    }
    assert dropped == 1  # the replayed 10:45
    # hour 10 excludes the late replay; 14:30's window never finalized
    assert got == {10: 1, 11: 1, 12: 2}


def test_stream_stream_join_horizon(spark):
    """stream_click_purchase_join unit semantics on a batch DataFrame (the
    unification contract): purchases inside [click, click+1h] match, a
    purchase 1h1m later and one 1m earlier do not."""
    import datetime as dt
    from direct_spark_sql_spark.streaming import stream_click_purchase_join

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (1, t0, 7, "click", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=59), 7, "purchase", 9.5, "{}"),
        (3, t0 + dt.timedelta(minutes=61), 7, "purchase", 1.0, "{}"),
        (4, t0 - dt.timedelta(minutes=1), 7, "purchase", 2.0, "{}"),
        (5, t0 + dt.timedelta(minutes=30), 8, "purchase", 3.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = stream_click_purchase_join(ev).collect()
    assert [(r.click_id, r.purchase_id, r.amount) for r in got] == [(1, 2, 9.5)]


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Restart semantics: a stopped query restarted with the same
    checkpoint must resume from the committed offset — the second run may
    read ONLY the files that arrived after the first run, and the file
    sink's commit log keeps the output exactly-once across the restart."""
    import datetime as dt

    schema = "event_id long, ts timestamp, user_id long, value double"
    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"

    def write_file(sub, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / sub)
        )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sum(p["numInputRows"] for p in q.recentProgress)

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    write_file("a", [(1, t0, 7, 1.0), (2, t0, 8, 2.0)])
    assert run_once() == 2

    write_file("b", [(3, t0, 9, 3.0)])
    # second run resumes from the checkpoint: only file b is read
    assert run_once() == 1

    got = sorted(r.event_id for r in spark.read.parquet(str(out)).collect())
    assert got == [1, 2, 3]  # no reprocessing, no duplicates


def test_foreachbatch_upsert_across_batches(spark, tmp_path):
    """The streaming MERGE accumulates across micro-batches: two source
    files processed one per trigger; a key updated in the second batch
    must end at its newest value, keys only in the first must survive."""
    import datetime as dt

    from direct_spark_sql_spark.streaming import run_foreach_batch_upsert

    schema = "event_id long, ts timestamp, user_id long, value double"
    src = tmp_path / "src"
    t = dt.datetime(2024, 1, 1, 12, 0)

    def write_file(sub, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / sub))

    write_file("a", [(1, t, 7, 1.0), (2, t, 8, 2.0)])
    write_file("b", [(3, t + dt.timedelta(hours=1), 7, 9.0)])

    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = run_foreach_batch_upsert(
        stream,
        ["user_id"],
        F.expr("unix_micros(ts) * 1024 + pmod(event_id, 1024)"),
        ["value"],
        name="test_upsert",
    )
    got = {r.user_id: r.value for r in state.collect()}
    assert got == {7: 9.0, 8: 2.0}


def test_foreachbatch_upsert_out_of_order_batches(spark, tmp_path):
    """Regression: latest-wins must hold ACROSS batches — an older event
    arriving in a later micro-batch must not clobber newer state (the
    state table persists each key's winning sequence)."""
    import datetime as dt

    from direct_spark_sql_spark.streaming import run_foreach_batch_upsert

    schema = "event_id long, ts timestamp, user_id long, value double"
    src = tmp_path / "src"
    t = dt.datetime(2024, 1, 1, 12, 0)

    def write_file(sub, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / sub))

    # file "a" (processed first) holds the NEWER event; "b" the older one
    write_file("a", [(1, t + dt.timedelta(hours=1), 7, 9.0)])
    write_file("b", [(2, t, 7, 1.0)])

    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    state = run_foreach_batch_upsert(
        stream,
        ["user_id"],
        F.expr("unix_micros(ts) * 1024 + pmod(event_id, 1024)"),
        ["value"],
        name="test_upsert_ooo",
    )
    assert {r.user_id: r.value for r in state.collect()} == {7: 9.0}


def test_foreach_batch_dedup_accumulates_across_batches(spark, tmp_path):
    """Dedup ingest state must fold across micro-batches: copies of the
    same text arriving in DIFFERENT batches form one group, the keep-id is
    the global min (even when it arrives in a later file), and the final
    state equals the single-batch answer."""
    from direct_spark_sql_spark.hashing import h64
    from direct_spark_sql_spark.streaming import run_foreach_batch_dedup

    schema = "doc_id long, text string"
    src = tmp_path / "docs"

    def write_file(sub, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / sub))

    # "aa" repeats across batches 1 and 2; its smallest id (1) arrives in
    # the SECOND file.  "bb" repeats only within one batch; "cc" is unique.
    write_file("f0", [(10, "aa"), (20, "bb"), (21, "bb")])
    write_file("f1", [(1, "aa"), (30, "cc")])

    def run(stream_or_batch):
        return run_foreach_batch_dedup(stream_or_batch, h64(F.col("text")), "doc_id")

    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = {
        r.dup_key: (r.keep_id, r.group_size)
        for r in run(stream).filter(F.col("group_size") > 1).collect()
    }
    aa = spark.createDataFrame([(0, "aa")], schema).select(h64(F.col("text"))).collect()[0][0]
    bb = spark.createDataFrame([(0, "bb")], schema).select(h64(F.col("text"))).collect()[0][0]
    assert got == {aa: (1, 2), bb: (20, 2)}
