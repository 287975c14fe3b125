"""Stateful streaming under the RocksDB state store provider.

The default local provider (HDFSBackedStateStoreProvider) keeps state in
executor memory — fine at test scale, but a 100 TB deployment runs
RocksDB state stores (the disk-backed, incremental-checkpoint backend
every large Structured Streaming fleet uses for windowed aggregation,
dedup, and stream-stream join state).  Results must be identical under
either provider: these tests re-run the registry's stateful streaming
pipelines on a cloned session pinned to RocksDB and hold them to the
SAME DuckDB oracle as the default-provider differential suite.

(The provider is a per-query runtime conf read at stream start, so a
``newSession()`` clone scopes it without mutating the shared session —
the repo's standard conf-isolation pattern.)
"""

from __future__ import annotations

import pytest

from direct_spark_sql_spark.plans.registry import QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

#: the registry's stateful streaming pipelines: windowed agg, session
#: windows, watermark dedup, stream-stream join, arbitrary Python state
STATEFUL = [
    "streaming_tumbling_window",
    "streaming_session_window",
    "streaming_dedup_watermark",
    "streaming_stream_stream_join",
    "streaming_user_counts",
]


@pytest.fixture(scope="module")
def rocksdb_spark(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    return s


@pytest.mark.parametrize("name", STATEFUL)
def test_stateful_pipeline_matches_oracle_under_rocksdb(name, rocksdb_spark, oracle):
    q = QUERIES[name]
    assert (
        rocksdb_spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == ROCKSDB_PROVIDER
    )
    df = q.spark_fn(rocksdb_spark, SF_DIR)
    assert q.oracle is not None
    assert_matches_oracle(df, oracle, q.oracle)
