from direct_spark_sql_spark.streaming.pipelines import (
    read_events_stream,
    run_available_now,
    run_foreach_batch_dedup,
    run_foreach_batch_upsert,
    run_foreach_batch_zonemap_ingest,
    stream_click_purchase_join,
    stream_dedup_hourly,
    stream_session_windows,
    stream_sliding_totals,
    stream_static_enrich,
    stream_tumbling_totals,
    stream_user_counts_stateful,
)

__all__ = [
    "read_events_stream",
    "run_available_now",
    "run_foreach_batch_dedup",
    "run_foreach_batch_upsert",
    "run_foreach_batch_zonemap_ingest",
    "stream_click_purchase_join",
    "stream_dedup_hourly",
    "stream_session_windows",
    "stream_sliding_totals",
    "stream_static_enrich",
    "stream_tumbling_totals",
    "stream_user_counts_stateful",
]
