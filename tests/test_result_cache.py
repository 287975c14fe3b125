"""Result cache + per-execution metric semantics (round 5).

The reference's warm path is a same-thread iterator over a cached
single-node plan (DirectPlan.scala:79-83) — microseconds per repeated
query.  Spark's distributed execution has a per-job floor two orders of
magnitude above that (measured: the plan-cache lookup itself is ~11 µs;
the rest of a warm ``sql_directly`` is stage scheduling), so the engine's
equivalent fast path is a *result* cache over deterministic, file-free
queries with the exact same invalidation hooks as the plan cache.  These
tests pin the semantics that make that safe.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.fixture()
def eng(engine):
    engine.result_cache_enabled = True
    yield engine
    engine.result_cache_enabled = True


def test_repeated_query_hits_result_cache(eng):
    eng.register_table("rc_t", [{"a": i} for i in range(10)], "a BIGINT")
    sql = "SELECT sum(a) AS s FROM rc_t"
    assert eng.sql_directly(sql).to_list_of_dicts() == [{"s": 45}]
    before = eng.cache_stats()
    assert eng.sql_directly(sql).to_list_of_dicts() == [{"s": 45}]
    after = eng.cache_stats()
    assert after["result_hits"] == before["result_hits"] + 1
    # plan-cache stats still tick (the df lookup happens first)
    assert after["hits"] == before["hits"] + 1


def test_reregister_invalidates_result(eng):
    eng.register_table("rc_fresh", [{"a": 1}], "a BIGINT")
    sql = "SELECT sum(a) AS s FROM rc_fresh"
    assert eng.sql_directly(sql).to_list_of_dicts() == [{"s": 1}]
    eng.register_table("rc_fresh", [{"a": 7}], "a BIGINT")
    assert eng.sql_directly(sql).to_list_of_dicts() == [{"s": 7}]


def test_view_ddl_invalidates_result(eng):
    eng.sql_directly("CREATE OR REPLACE TEMPORARY VIEW rc_v AS SELECT 5 AS a")
    sql = "SELECT a + 1 AS b FROM rc_v"
    assert eng.sql_directly(sql).to_list_of_dicts() == [{"b": 6}]
    eng.sql_directly("CREATE OR REPLACE TEMPORARY VIEW rc_v AS SELECT 8 AS a")
    assert eng.sql_directly(sql).to_list_of_dicts() == [{"b": 9}]
    eng.sql_directly("DROP VIEW rc_v")


def test_nondeterministic_statement_never_result_cached(eng):
    vals = {eng.sql_directly("SELECT rand() AS r").data[0].r for _ in range(3)}
    assert len(vals) == 3


def test_nondeterministic_view_body_never_result_cached(eng):
    """rand() hidden inside a view body is invisible to the statement
    regex — the analyzed-plan determinism gate must catch it."""
    eng.register_table(
        "rc_rand_src", eng.spark.sql("SELECT id, rand() AS r FROM range(100)")
    )
    sql = "SELECT sum(r) AS s FROM rc_rand_src"
    eng.sql_directly(sql)
    eng.sql_directly(sql)
    # the analyzed-plan gate must have refused to cache: second call is a
    # real execution, not a result-cache hit
    assert eng.last_metrics()["result_cache_hit"] is False
    assert eng._plan_result_cacheable(eng.dataframe(sql)) is False


def test_file_backed_query_never_result_cached(eng):
    eng.spark.read.parquet(f"{SF_DIR}/region.parquet").createOrReplaceTempView(
        "rc_file_v"
    )
    sql = "SELECT count(*) AS n FROM rc_file_v"
    eng.sql_directly(sql)
    eng.sql_directly(sql)
    assert eng.last_metrics()["result_cache_hit"] is False


def test_returned_table_is_mutation_isolated(eng):
    eng.register_table("rc_mut", [{"a": 1}, {"a": 2}], "a BIGINT")
    sql = "SELECT a FROM rc_mut ORDER BY a"
    t1 = eng.sql_directly(sql)
    t1.data.clear()  # caller mangles their copy
    t2 = eng.sql_directly(sql)
    assert [r.a for r in t2.data] == [1, 2]


def test_mixed_namespaces_do_not_cross_hit(eng):
    eng.register_table("rc_ns", [{"a": 1}], "a BIGINT")
    sql = "SELECT sum(a) AS s FROM rc_ns"
    eng.set_namespace("")
    assert eng.sql_directly(sql).to_list_of_dicts() == [{"s": 1}]
    eng.set_namespace("tenant_b")
    # same SQL, different namespace: must miss (and here fail to resolve
    # into a hit of tenant-a's rows); register different data to prove it
    eng.register_table("rc_ns", [{"a": 100}], "a BIGINT")
    assert eng.sql_directly(sql).to_list_of_dicts() == [{"s": 100}]
    eng.set_namespace("")


def test_per_call_metrics_not_doubled_on_reexecution(eng):
    """Reference resets its metric map per execution
    (DirectExecutionContext.scala:45).  A re-executed cached plan must
    report per-call shuffle values — never the doubled accumulator."""
    eng.spark.read.parquet(
        f"{SF_DIR}/lineitem.parquet"
    ).createOrReplaceTempView("rc_li")
    sql = (
        "SELECT l_returnflag, count(*) AS n FROM rc_li "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    eng.sql_directly(sql)
    first = eng.last_metrics()
    eng.sql_directly(sql)
    second = eng.last_metrics()
    assert first["shuffle_records_written"] > 0
    # AQE reuses materialized query stages across executions of one plan
    # object, so the honest per-call value for the re-run is either 0
    # (stage reused) or the first call's value — never the doubled sum.
    assert second["shuffle_records_written"] in (0, first["shuffle_records_written"])
    assert second["result_cache_hit"] is False
    assert second["partial"] is False


def test_result_cache_hit_reports_materializing_execution_metrics(eng):
    eng.register_table(
        "rc_m", [{"k": i % 5, "v": i} for i in range(1000)], "k INT, v INT"
    )
    sql = "SELECT k, sum(v) AS s FROM rc_m GROUP BY k ORDER BY k"
    eng.sql_directly(sql)
    miss = eng.last_metrics()
    eng.sql_directly(sql)
    hit = eng.last_metrics()
    assert hit["result_cache_hit"] is True and miss["result_cache_hit"] is False
    assert hit["output_rows"] == miss["output_rows"] == 5
    assert hit["shuffle_records_written"] == miss["shuffle_records_written"]


def test_small_ingress_scans_in_one_task(eng):
    """Driver-local lists must not shard across defaultParallelism — a
    5k-row reference table is one partition (one scan task per job)."""
    eng.register_table(
        "rc_small", [{"a": i} for i in range(5000)], "a BIGINT"
    )
    assert eng.spark.table("rc_small").rdd.getNumPartitions() == 1


def test_oversized_result_not_cached(eng):
    eng.result_cache_max_rows = 10
    try:
        eng.register_table(
            "rc_big", [{"a": i} for i in range(50)], "a BIGINT"
        )
        sql = "SELECT a FROM rc_big ORDER BY a"
        eng.sql_directly(sql)
        eng.sql_directly(sql)
        assert eng.last_metrics()["result_cache_hit"] is False
    finally:
        eng.result_cache_max_rows = 100_000


def test_soak_result_cache_vs_reregister(eng):
    """Readers hammer a result-cache-eligible query while a writer
    re-registers the referenced view with a new value every few
    iterations.  Every observed result must be a value that was
    registered at some point (never a torn row), and once the writer
    stops, readers must converge on the final value — i.e. an in-flight
    stale result can never poison the cache past an invalidation (the
    epoch guard in sql_directly)."""
    import threading
    import time

    registered: list[int] = [0]
    eng.register_table("rc_soak", [{"a": 0}], "a BIGINT")
    sql = "SELECT max(a) AS m FROM rc_soak"
    errors: list[str] = []
    stop = threading.Event()

    def writer():
        for v in range(1, 30):
            # append BEFORE register: a reader may legitimately observe
            # the new value the instant register_table returns (or even
            # mid-call, once the view swap lands) — observing a value
            # slightly "early" is harmless, observing one never in the
            # list is the actual torn/stale failure being tested
            registered.append(v)
            eng.register_table("rc_soak", [{"a": v}], "a BIGINT")
            time.sleep(0.02)
        stop.set()

    def reader():
        while not stop.is_set():
            m = eng.sql_directly(sql).data[0].m
            if m not in registered:
                errors.append(f"unregistered value observed: {m}")
                return

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(6)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    # after the writer settles, the cache must serve the FINAL value
    assert eng.sql_directly(sql).data[0].m == 29
    assert eng.sql_directly(sql).data[0].m == 29  # and again, from cache


def test_metrics_history_records_calls(eng):
    eng.register_table("rc_h", [{"a": 1}], "a BIGINT")
    sql = "SELECT sum(a) AS s FROM rc_h"
    start = len(eng.metrics_history(200))
    eng.sql_directly(sql)
    eng.sql_directly(sql)
    hist = eng.metrics_history(200)
    assert len(hist) >= start + 2 or len(hist) == 200
    last_two = hist[-2:]
    assert [h["result_cache_hit"] for h in last_two] == [False, True]
    assert all(h["rows"] == 1 and h["wall_sec"] >= 0 for h in last_two)
    assert all(sql.startswith(h["sql"][:20]) for h in last_two)


def test_result_cache_hit_metrics_frozen_at_put_time(eng):
    """A hit must reproduce the MATERIALIZING execution's metrics even
    when the same plan object executed again between put and hit (e.g.
    cache-bypassed calls, sql_iterator, a concurrent thread) — the
    snapshot is frozen at put time, never re-derived from the live
    accumulators."""
    eng.register_table(
        "rc_frozen", [{"k": i % 7, "v": i} for i in range(2000)], "k INT, v INT"
    )
    sql = "SELECT k, sum(v) AS s FROM rc_frozen GROUP BY k ORDER BY k"
    eng.sql_directly(sql)
    miss = eng.last_metrics()
    eng.result_cache_enabled = False
    try:
        for _ in range(3):  # intervening executions of the same plan object
            eng.sql_directly(sql)
    finally:
        eng.result_cache_enabled = True
    eng.sql_directly(sql)
    hit = eng.last_metrics()
    assert hit["result_cache_hit"] is True
    assert hit["output_rows"] == miss["output_rows"] == 7
    assert hit["shuffle_records_written"] == miss["shuffle_records_written"]
    assert hit["shuffle_bytes_written"] == miss["shuffle_bytes_written"]


def test_new_session_inherits_result_cache_config(engine):
    """An engine built with result caching disabled must not hand out
    child sessions that silently re-enable it."""
    from direct_spark_sql_spark.session import Engine

    parent = Engine(engine.spark, result_cache_size=0)
    assert parent.result_cache_enabled is False
    child = parent.new_session()
    assert child.result_cache_enabled is False
    assert child._result_cache.capacity == 0
    # and an enabled parent's sizing carries over too
    child2 = engine.new_session()
    assert child2.result_cache_enabled == engine.result_cache_enabled
    assert child2._result_cache.capacity == engine._result_cache.capacity
    assert child2.result_cache_max_rows == engine.result_cache_max_rows
