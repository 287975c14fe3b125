"""Session-facade conformance: the reference's own test-suite semantics
(DirectExecSuite.scala, RegisterTableTest.java — see FIXTURES.md Part A)
ported to the Engine API.  These exercise the full facade path
(register_table coercion → temp view → sql_directly → DataTable egress),
complementing the registry suite which exercises query semantics over the
star schema.
"""

from __future__ import annotations

import datetime as dt
import threading
import time
from decimal import Decimal

import pytest

#: reference fixture A1/A2 (DirectExecSuite.scala:31-38)
PEOPLE = [
    {"name": "a", "age": 2, "genda": 0},
    {"name": "bbb", "age": 2, "genda": 1},
    {"name": "c", "age": 3, "genda": 0},
    {"name": "ddd", "age": 4, "genda": 1},
    {"name": "e", "age": 5, "genda": 1},
]
PEOPLE2 = [
    {"name": "a", "age": 1, "genda": 0},
    {"name": "b", "age": 2, "genda": 1},
    {"name": "c", "age": 3, "genda": 0},
]
PEOPLE_SCHEMA = "name string, age int, genda int"


@pytest.fixture(scope="module")
def people_engine(engine):
    engine.register_table("people", PEOPLE, PEOPLE_SCHEMA)
    engine.register_table("people2", PEOPLE2, PEOPLE_SCHEMA)
    return engine


def _rows(table):
    return table.to_list_of_dicts()


# -- joins (DirectExecSuite.scala:84-150) ------------------------------------

def test_inner_join(people_engine):
    t = people_engine.sql_directly(
        "SELECT t1.name, t1.age, t2.age AS age2 FROM people t1 "
        "JOIN people2 t2 ON t1.name = t2.name ORDER BY t1.name"
    )
    assert _rows(t) == [
        {"name": "a", "age": 2, "age2": 1},
        {"name": "c", "age": 3, "age2": 3},
    ]


def test_left_and_right_join(people_engine):
    left = people_engine.sql_directly(
        "SELECT t1.name, t2.age AS age2 FROM people t1 "
        "LEFT JOIN people2 t2 ON t1.name = t2.name ORDER BY t1.name"
    )
    assert {r["name"]: r["age2"] for r in _rows(left)} == {
        "a": 1, "bbb": None, "c": 3, "ddd": None, "e": None,
    }
    right = people_engine.sql_directly(
        "SELECT t2.name, t1.age FROM people t1 "
        "RIGHT JOIN people2 t2 ON t1.name = t2.name ORDER BY t2.name"
    )
    assert {r["name"]: r["age"] for r in _rows(right)} == {"a": 2, "b": None, "c": 3}


def test_semi_and_anti_join(people_engine):
    semi = people_engine.sql_directly(
        "SELECT name FROM people WHERE name IN (SELECT name FROM people2) ORDER BY name"
    )
    assert [r["name"] for r in _rows(semi)] == ["a", "c"]
    anti = people_engine.sql_directly(
        "SELECT name FROM people WHERE name NOT IN (SELECT name FROM people2) ORDER BY name"
    )
    assert [r["name"] for r in _rows(anti)] == ["bbb", "ddd", "e"]


# -- aggregation (DirectExecSuite.scala:60-82, 180-189) ----------------------

def test_group_by_count_and_approx_distinct(people_engine):
    t = people_engine.sql_directly(
        "SELECT genda, COUNT(*) AS n, APPROX_COUNT_DISTINCT(age) AS nd "
        "FROM people GROUP BY genda ORDER BY genda"
    )
    assert _rows(t) == [
        {"genda": 0, "n": 2, "nd": 2},
        {"genda": 1, "n": 3, "nd": 3},
    ]


def test_grouping_sets(people_engine):
    t = people_engine.sql_directly(
        "SELECT genda, age, COUNT(*) AS n FROM people "
        "GROUP BY GROUPING SETS ((genda), (age)) ORDER BY genda, age"
    )
    rows = _rows(t)
    # 2 genda groups + 4 distinct ages
    assert len(rows) == 6


# -- window / union / generate (DirectExecSuite.scala:46-58, 94-110) ---------

def test_window_row_number(people_engine):
    t = people_engine.sql_directly(
        "SELECT name, ROW_NUMBER() OVER (PARTITION BY genda ORDER BY name) AS rn "
        "FROM people ORDER BY genda, rn"
    )
    assert [(r["name"], r["rn"]) for r in _rows(t)] == [
        ("a", 1), ("c", 2), ("bbb", 1), ("ddd", 2), ("e", 3),
    ]


def test_union_distinct(people_engine):
    t = people_engine.sql_directly(
        "SELECT name FROM people UNION SELECT name FROM people2 ORDER BY name"
    )
    assert [r["name"] for r in _rows(t)] == ["a", "b", "bbb", "c", "ddd", "e"]


def test_lateral_view_explode_split(people_engine):
    t = people_engine.sql_directly(
        "SELECT name, ch FROM people LATERAL VIEW explode(split(name, '')) t AS ch "
        "WHERE name = 'bbb'"
    )
    assert [r["ch"] for r in _rows(t)] == ["b", "b", "b"]


# -- misc corners (DirectExecSuite.scala:152-157, 205-225, 301-320, 376-382) -

def test_one_row_relation(people_engine):
    t = people_engine.sql_directly("SELECT 1 AS m, 'a' AS n")
    assert _rows(t) == [{"m": 1, "n": "a"}]


def test_limit_and_topk(people_engine):
    assert len(people_engine.sql_directly("SELECT * FROM people LIMIT 3")) == 3
    t = people_engine.sql_directly(
        "SELECT name FROM people ORDER BY age DESC, name LIMIT 2"
    )
    assert [r["name"] for r in _rows(t)] == ["e", "ddd"]


def test_empty_result(people_engine):
    t = people_engine.sql_directly("SELECT * FROM people WHERE 1 = 0")
    assert len(t) == 0
    assert [f.name for f in t.schema.fields] == ["name", "age", "genda"]


def test_empty_input_global_agg(people_engine):
    """Global aggregate over empty input emits exactly one row
    (HashAggregateDirectExec.scala:79-103 corner)."""
    t = people_engine.sql_directly(
        "SELECT COUNT(*) AS n, SUM(age) AS s FROM people WHERE 1 = 0"
    )
    assert _rows(t) == [{"n": 0, "s": None}]


# -- 11-type coercion round-trip (RegisterTableTest.java:17-65) --------------

WIDE_SCHEMA = (
    "a int, b bigint, c timestamp, d decimal(38,18), e float, f double, "
    "g boolean, h short, i byte, j date, k string"
)


def test_wide_type_coercion_roundtrip(engine):
    engine.register_table(
        "wide_types",
        [
            {"a": "10", "b": "10", "c": 1565748795542, "d": "23", "e": "2.3",
             "f": "24.03", "g": "true", "h": "1", "i": "12",
             "j": 1565748795542, "k": 2342.23},
            {"a": 200, "b": 10, "c": "1565748795542", "d": 900000, "e": 9.08,
             "f": 9.0008, "h": 12, "i": 23, "j": "1565748795542", "k": "plain"},
        ],
        WIDE_SCHEMA,
    )
    rows = _rows(engine.sql_directly("SELECT * FROM wide_types ORDER BY a"))
    r0, r1 = rows
    assert r0["a"] == 10 and r0["b"] == 10
    # epoch-millis → UTC timestamp (documented deviation: UTC, not local TZ)
    assert r0["c"] == dt.datetime(2019, 8, 14, 2, 13, 15, 542000)
    assert r0["d"] == Decimal("23").scaleb(0).quantize(Decimal(1).scaleb(-18))
    assert abs(r0["e"] - 2.3) < 1e-6 and r0["f"] == 24.03
    assert r0["g"] is True and r1["g"] is None
    assert r0["h"] == 1 and r0["i"] == 12
    assert r0["j"] == dt.date(2019, 8, 14)
    assert r0["k"] == "2342.23"
    assert r1["a"] == 200 and r1["k"] == "plain"


# -- view round-trip / execute-into-view (DirectExecSuite.scala:191-203) -----

def test_view_roundtrip_and_execute_into_view(people_engine):
    n = people_engine.execute_and_register_temp_view(
        "SELECT genda, COUNT(*) AS n FROM people GROUP BY genda", "genda_counts"
    )
    assert n == 2
    t = people_engine.sql_directly("SELECT * FROM genda_counts ORDER BY genda")
    assert _rows(t) == [{"genda": 0, "n": 2}, {"genda": 1, "n": 3}]
    back = people_engine.temp_view("genda_counts")
    assert sorted(_rows(back), key=lambda r: r["genda"]) == _rows(t)


def test_db_qualified_temp_view(people_engine):
    """db-qualified temp views (reference: DirectSessionCatalog.scala:130-145)."""
    people_engine.register_table("mm.test", PEOPLE2, PEOPLE_SCHEMA)
    t = people_engine.sql_directly("SELECT COUNT(*) AS n FROM mm.test")
    assert _rows(t) == [{"n": 3}]
    assert "mm.test" in people_engine.list_tables()


def test_qualified_rewrite_identifier_boundaries(people_engine):
    """Overlapping qualified names must not clobber each other, and names
    inside string literals must survive the rewrite untouched."""
    people_engine.register_table("db.tab", PEOPLE2, PEOPLE_SCHEMA)
    people_engine.register_table("db.table2", PEOPLE, PEOPLE_SCHEMA)
    t = people_engine.sql_directly(
        "SELECT (SELECT COUNT(*) FROM db.tab) AS a, "
        "(SELECT COUNT(*) FROM db.table2) AS b, 'db.tab' AS lit"
    )
    assert _rows(t) == [{"a": 3, "b": 5, "lit": "db.tab"}]
    # prefix name registered *after* the longer one still resolves both ways
    t2 = people_engine.sql_directly(
        "SELECT COUNT(*) AS n FROM db.table2 WHERE name <> 'db.tab'"
    )
    assert _rows(t2) == [{"n": 5}]


def test_uses_time_word_boundaries(engine):
    """Identifiers containing time-function substrings (``known``) must not
    bypass the plan cache; genuine time functions must."""
    assert not engine._uses_time("SELECT known FROM t WHERE renowned = 'nowhere'")
    assert not engine._uses_time("SELECT unix_timestamp(col) FROM t")
    assert engine._uses_time("SELECT now()")
    assert engine._uses_time("SELECT unix_timestamp( )")
    assert engine._uses_time("SELECT CURRENT_DATE")
    assert engine._uses_time("select current_timestamp() as ts")
    # end-to-end: a 'known'-containing statement is served from the cache
    engine.register_table("known_t", [{"known": 1}], "known int")
    sql = "SELECT known FROM known_t"
    df1 = engine.dataframe(sql)
    df2 = engine.dataframe(sql)
    assert df1 is df2


# -- plan cache semantics ----------------------------------------------------

def test_cached_plan_sees_fresh_view_data(engine):
    """The reference's core cache contract: plans cache by name, data is
    re-read at execution (NamedLocalRelation.scala:25-44).  Re-registering
    a view must be visible to the cached statement."""
    engine.register_table("fresh_t", [{"x": 1}], "x int")
    sql = "SELECT SUM(x) AS s FROM fresh_t"
    assert _rows(engine.sql_directly(sql)) == [{"s": 1}]
    engine.register_table("fresh_t", [{"x": 5}, {"x": 6}], "x int")
    assert _rows(engine.sql_directly(sql)) == [{"s": 11}]


def test_namespace_isolates_cache(engine):
    engine.register_table("ns_t", [{"x": 1}], "x int")
    engine.set_namespace("tenant-a")
    assert _rows(engine.sql_directly("SELECT COUNT(*) AS n FROM ns_t")) == [{"n": 1}]
    engine.set_namespace("tenant-b")
    assert _rows(engine.sql_directly("SELECT COUNT(*) AS n FROM ns_t")) == [{"n": 1}]
    engine.set_namespace("")


def test_new_session_isolated_views(people_engine):
    """Per-session catalogs over a shared context
    (DirectExecSuite.scala:259-299)."""
    other = people_engine.new_session()
    other.register_table("people", PEOPLE2, PEOPLE_SCHEMA)
    n_other = _rows(other.sql_directly("SELECT COUNT(*) AS n FROM people"))
    n_orig = _rows(people_engine.sql_directly("SELECT COUNT(*) AS n FROM people"))
    assert n_other == [{"n": 3}]
    assert n_orig == [{"n": 5}]


# -- time semantics (DirectExecSuite.scala:322-374) --------------------------

def test_time_changes_across_executions(engine):
    t1 = _rows(engine.sql_directly("SELECT unix_timestamp() AS ts"))[0]["ts"]
    time.sleep(1.1)
    t2 = _rows(engine.sql_directly("SELECT unix_timestamp() AS ts"))[0]["ts"]
    assert t2 > t1


def test_time_stable_within_execution(engine):
    r = _rows(
        engine.sql_directly(
            "SELECT current_timestamp() AS a, current_timestamp() AS b"
        )
    )[0]
    assert r["a"] == r["b"]


# -- concurrency smoke (DirectExecSuite.scala:227-257) -----------------------

def test_concurrent_shared_engine(people_engine):
    errors: list[Exception] = []

    def worker():
        try:
            for _ in range(5):
                t = people_engine.sql_directly(
                    "SELECT t1.name, t1.age FROM people t1 "
                    "JOIN people2 t2 ON t1.age = t2.age ORDER BY t1.name"
                )
                assert [r["name"] for r in _rows(t)] == ["a", "bbb", "c"]
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors


# -- concurrency soak (DirectExecSuite.scala:227-299 parity) ------------------

import os as _os

#: Reference parity is 10 threads × 30 s (DirectExecSuite.scala:227-299);
#: override for quick local iteration with SPARK_GRAFT_SOAK_SECS.
_SOAK_SECS = float(_os.environ.get("SPARK_GRAFT_SOAK_SECS", "30"))


def _run_soak(n_threads: int, secs: float, worker) -> list[Exception]:
    errors: list[Exception] = []
    deadline = time.monotonic() + secs

    def loop(idx: int):
        try:
            while time.monotonic() < deadline:
                worker(idx)
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=loop, args=(i,)) for i in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    return errors


def test_soak_shared_engine(people_engine):
    """10 threads hammering one shared engine (and its plan cache) with the
    reference's repeated join+agg shape for the full soak window
    (DirectExecSuite.scala:227-257): zero mismatches, zero exceptions."""

    def worker(_idx: int):
        t = people_engine.sql_directly(
            "SELECT t2.genda, COUNT(*) AS n, SUM(t1.age) AS total_age "
            "FROM people t1 JOIN people2 t2 ON t1.name = t2.name "
            "GROUP BY t2.genda ORDER BY t2.genda"
        )
        assert _rows(t) == [
            {"genda": 0, "n": 2, "total_age": 5},
        ]

    assert _run_soak(10, _SOAK_SECS, worker) == []


def test_soak_per_thread_sessions_same_named_views(people_engine):
    """10 threads, each on its own new_session() registering a *same-named*
    view with thread-specific data (DirectExecSuite.scala:259-299): catalog
    and plan-cache isolation must hold under sustained load."""
    sessions = [people_engine.new_session() for _ in range(10)]
    for i, s in enumerate(sessions):
        s.register_table(
            "soak_people",
            [{"name": f"t{i}", "age": i, "genda": i % 2}] * (i + 1),
            PEOPLE_SCHEMA,
        )

    def worker(idx: int):
        s = sessions[idx]
        t = s.sql_directly(
            "SELECT COUNT(*) AS n, MIN(name) AS who, SUM(age) AS total "
            "FROM soak_people"
        )
        assert _rows(t) == [
            {"n": idx + 1, "who": f"t{idx}", "total": idx * (idx + 1)}
        ]

    assert _run_soak(10, _SOAK_SECS, worker) == []


def test_cache_stats_and_explain(engine):
    engine.register_table(
        "cs_tab", [{"a": 1}, {"a": 2}], "a INT"
    )
    before = engine.cache_stats()
    engine.sql_directly("SELECT sum(a) AS s FROM cs_tab")
    engine.sql_directly("SELECT sum(a) AS s FROM cs_tab")
    after = engine.cache_stats()
    assert after["hits"] == before["hits"] + 1
    assert after["misses"] == before["misses"] + 1
    assert after["entries"] >= 1 and after["capacity"] >= after["entries"]
    plan = engine.explain("SELECT sum(a) AS s FROM cs_tab")
    assert "Physical Plan" in plan and "HashAggregate" in plan


def test_view_ddl_invalidates_cached_plans(engine):
    engine.sql_directly("CREATE OR REPLACE TEMPORARY VIEW v_ddl AS SELECT 5 AS a")
    assert engine.sql_directly("SELECT a FROM v_ddl").to_list_of_dicts() == [{"a": 5}]
    # redefining the view through SQL DDL must drop the cached SELECT plan
    engine.sql_directly("CREATE OR REPLACE TEMPORARY VIEW v_ddl AS SELECT 6 AS a")
    assert engine.sql_directly("SELECT a FROM v_ddl").to_list_of_dicts() == [{"a": 6}]
    engine.sql_directly("DROP VIEW v_ddl")
    engine.sql_directly("CREATE TEMPORARY VIEW v_ddl AS SELECT 'x' AS a")
    assert engine.sql_directly("SELECT a FROM v_ddl").to_list_of_dicts() == [{"a": "x"}]


def test_view_name_in_string_literal_does_not_evict(engine):
    """Round-2 advice: a view name appearing only inside a string literal
    of an unrelated cached query is data, not a reference — redefining the
    view must NOT evict that plan."""
    engine.register_table("lit_unrelated", [{"x": 1}], "x int")
    unrelated = "SELECT 'v_lit_probe' AS tag, SUM(x) AS s FROM lit_unrelated"
    engine.sql_directly(unrelated)  # populate cache
    before = engine.cache_stats()
    engine.sql_directly("CREATE OR REPLACE TEMPORARY VIEW v_lit_probe AS SELECT 1 AS a")
    engine.sql_directly(unrelated)  # must be a cache hit, not a re-analysis
    after = engine.cache_stats()
    assert after["hits"] == before["hits"] + 1
    assert after["misses"] == before["misses"]
    engine.sql_directly("DROP VIEW v_lit_probe")


def test_backtick_referenced_view_still_invalidated(engine):
    """The quoted-span skip must not under-invalidate: a cached query that
    references the view through a backtick-quoted identifier still drops."""
    engine.sql_directly("CREATE OR REPLACE TEMPORARY VIEW v_bt AS SELECT 5 AS a")
    q = "SELECT a FROM `v_bt`"
    assert engine.sql_directly(q).to_list_of_dicts() == [{"a": 5}]
    engine.sql_directly("CREATE OR REPLACE TEMPORARY VIEW v_bt AS SELECT 6 AS a")
    assert engine.sql_directly(q).to_list_of_dicts() == [{"a": 6}]
    engine.sql_directly("DROP VIEW v_bt")


def test_qualified_view_reregister_invalidates_cached_plans(engine):
    """Round-2 advice: invalidation must work for qualified ``db.view``
    spellings — re-registering the qualified view drops cached plans that
    reference it by its qualified name."""
    engine.register_table("cachedb.v_q", [{"x": 1}], "x int")
    q = "SELECT SUM(x) AS s FROM cachedb.v_q"
    assert _rows(engine.sql_directly(q)) == [{"s": 1}]
    engine.register_table("cachedb.v_q", [{"x": 7}, {"x": 8}], "x int")
    assert _rows(engine.sql_directly(q)) == [{"s": 15}]


def test_list_tables_merges_qualified_and_filters(engine):
    """Reference listTables override: db-qualified registry views appear
    alongside Spark catalog tables, with *-wildcard pattern filtering
    (DirectSessionCatalog.scala:185-201)."""
    engine.register_table("catdb.lt_q", [{"x": 1}], "x int")
    engine.register_table("lt_plain", [{"x": 1}], "x int")
    names = engine.list_tables()
    assert "catdb.lt_q" in names and "lt_plain" in names
    assert engine.list_tables("lt_*") == ["lt_plain"]
    assert engine.list_tables("catdb.*|lt_pl*") == ["catdb.lt_q", "lt_plain"]


def test_is_temporary_table(engine):
    """Reference isTemporaryTable override: true for Spark temp views and
    for db-qualified registry views (DirectSessionCatalog.scala:173-183)."""
    engine.register_table("catdb.itt_q", [{"x": 1}], "x int")
    engine.register_table("itt_plain", [{"x": 1}], "x int")
    assert engine.is_temporary_table("catdb.itt_q")
    assert engine.is_temporary_table("itt_plain")
    assert not engine.is_temporary_table("no_such_table")
    assert not engine.is_temporary_table("nodb.no_such_table")


def test_temp_view_java_list_of_dicts(engine):
    """Reference tempViewJava readout: a view's rows as list-of-dicts
    (DirectSparkSession.scala:156-179)."""
    engine.register_table(
        "tvj", [{"a": 1, "b": "x"}, {"a": 2, "b": None}], "a int, b string"
    )
    rows = sorted(engine.temp_view_java("tvj"), key=lambda r: r["a"])
    assert rows == [{"a": 1, "b": "x"}, {"a": 2, "b": None}]


def test_non_query_statements_bypass_plan_cache(engine):
    before = engine.cache_stats()
    engine.sql_directly("SET spark.sql.ansi.enabled")
    after = engine.cache_stats()
    # commands never touch the LRU (no get, no put)
    assert (after["hits"], after["misses"]) == (before["hits"], before["misses"])


def test_non_temp_view_ddl_invalidates_cached_plans(engine):
    # regression: CREATE OR REPLACE VIEW (no TEMPORARY) must also drop
    # cached plans referencing the view
    engine.sql_directly("CREATE OR REPLACE VIEW pv_ddl AS SELECT 5 AS a")
    assert engine.sql_directly("SELECT a FROM pv_ddl").to_list_of_dicts() == [{"a": 5}]
    engine.sql_directly("CREATE OR REPLACE VIEW pv_ddl AS SELECT 6 AS a")
    assert engine.sql_directly("SELECT a FROM pv_ddl").to_list_of_dicts() == [{"a": 6}]
    engine.sql_directly("DROP VIEW pv_ddl")


def test_concurrent_view_ddl_and_queries(engine):
    """The view-DDL invalidation path (drop_where under the LRU lock) must
    be safe under concurrent redefinition + cached reads: no exceptions,
    and after the dust settles every view reads its final definition."""
    import threading

    n_threads, n_iters = 6, 15
    errors: list[Exception] = []

    def worker(t: int) -> None:
        try:
            for i in range(n_iters):
                engine.sql_directly(
                    f"CREATE OR REPLACE TEMPORARY VIEW soak_v{t} AS SELECT {i} AS a"
                )
                engine.sql_directly(f"SELECT a FROM soak_v{t}")
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    for t in range(n_threads):
        got = engine.sql_directly(f"SELECT a FROM soak_v{t}").to_list_of_dicts()
        assert got == [{"a": n_iters - 1}], f"thread {t} view stale: {got}"


# -- round-4 surfaces ---------------------------------------------------------

def test_nondeterministic_statements_bypass_plan_cache(engine):
    """Seeded-random expressions must re-analyze per call — a cached
    analyzed plan fixes the seed at first analysis, so repeated calls
    would return identical "random" values (the randomness analogue of
    the DirectCurrentDate time bug, DirectSessionStateBuilder.scala:
    134-155)."""
    # unit level: the detector
    assert engine._is_nondeterministic("SELECT uuid() AS u")
    assert engine._is_nondeterministic("SELECT rand() AS r")
    assert engine._is_nondeterministic("SELECT randn(), x FROM t")
    assert engine._is_nondeterministic("SELECT shuffle(arr) FROM t")
    assert engine._is_nondeterministic("SELECT monotonically_increasing_id()")
    # identifiers that merely contain the substrings stay cacheable
    assert not engine._is_nondeterministic("SELECT operand, brand FROM t")
    assert not engine._is_nondeterministic("SELECT rand FROM strands")
    # end-to-end: two executions differ
    u1 = engine.sql_directly("SELECT uuid() AS u").to_list_of_dicts()[0]["u"]
    u2 = engine.sql_directly("SELECT uuid() AS u").to_list_of_dicts()[0]["u"]
    assert u1 != u2
    r1 = [
        r["r"]
        for r in engine.sql_directly(
            "SELECT rand() AS r FROM range(5)"
        ).to_list_of_dicts()
    ]
    r2 = [
        r["r"]
        for r in engine.sql_directly(
            "SELECT rand() AS r FROM range(5)"
        ).to_list_of_dicts()
    ]
    assert r1 != r2


def test_execute_and_register_unpersists_replaced_view(engine, spark):
    """Re-registering a materialized view name must not leak one cached
    RDD per call (service-loop pathology)."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()  # context-global: delta-based
    for i in range(5):
        n = engine.execute_and_register_temp_view(
            f"SELECT {i} AS gen, id FROM range(10)", "mat_view_leak_t"
        )
        assert n == 10
    # exactly one persisted RDD may remain for this view (the live one);
    # the four replaced ones must be gone
    grew = jsc.getPersistentRDDs().size() - before
    assert grew <= 1, f"{grew} new persistent RDDs after 5 re-registrations"
    got = engine.sql_directly(
        "SELECT DISTINCT gen FROM mat_view_leak_t"
    ).to_list_of_dicts()
    assert got == [{"gen": 4}]


def test_execute_and_register_invalidates_cached_plans(engine):
    """A cached statement referencing the materialized view must see the
    new data after re-registration."""
    engine.execute_and_register_temp_view("SELECT 1 AS v", "mat_inval_t")
    sql = "SELECT SUM(v) AS s FROM mat_inval_t"
    assert engine.sql_directly(sql).to_list_of_dicts() == [{"s": 1}]
    engine.execute_and_register_temp_view("SELECT 7 AS v", "mat_inval_t")
    assert engine.sql_directly(sql).to_list_of_dicts() == [{"s": 7}]


def test_last_metrics_readout(engine):
    """last_metrics() exposes the executed plan's SQLMetric map plus
    rollups (reference: DirectSQLMetrics.scala:21-72)."""
    engine.register_table(
        "metrics_t", [{"k": i % 3, "v": i} for i in range(100)], "k int, v int"
    )
    t = engine.sql_directly(
        "SELECT k, SUM(v) AS s FROM metrics_t GROUP BY k ORDER BY k"
    )
    assert len(t) == 3
    m = engine.last_metrics()
    assert m is not None
    assert m["wall_sec"] > 0
    assert m["output_rows"] >= 3
    ops = [n["operator"] for n in m["operators"]]
    assert any("HashAggregate" in o for o in ops), ops
    # every node entry carries a raw numeric metric dict
    assert all(isinstance(n["metrics"], dict) for n in m["operators"])
    agg_rows = [
        n["metrics"]["numOutputRows"]
        for n in m["operators"]
        if "HashAggregate" in n["operator"] and "numOutputRows" in n["metrics"]
    ]
    assert agg_rows and agg_rows[0] >= 3


def test_sql_iterator_streams_without_materializing(engine):
    """Pull-based egress (reference contract Iterator[InternalRow],
    DirectPlan.scala:81-83): 100k rows consumed incrementally."""
    import types

    it = engine.sql_iterator("SELECT id, id * 2 AS dbl FROM range(100000)")
    assert isinstance(it, types.GeneratorType)
    first = next(it)
    assert first == {"id": 0, "dbl": 0}
    count = 1 + sum(1 for _ in it)
    assert count == 100000


def test_datatable_to_local_iterator(engine):
    t = engine.sql_directly("SELECT id FROM range(5)")
    rows = list(t.to_local_iterator())
    assert rows == [{"id": i} for i in range(5)]


def test_reregister_same_sql_keeps_materialization(engine, spark):
    """CacheManager keys by canonicalized plan: re-registering the SAME
    statement must not unpersist the shared cache entry out from under
    the new view (the sameResult guard in execute_and_register)."""
    engine.execute_and_register_temp_view("SELECT id FROM range(20)", "mat_same_t")
    engine.execute_and_register_temp_view("SELECT id FROM range(20)", "mat_same_t")
    df = engine._materialized_views["mat_same_t"]
    assert df.storageLevel.useMemory, "shared cache entry was unpersisted"
    got = engine.sql_directly(
        "SELECT COUNT(*) AS n FROM mat_same_t"
    ).to_list_of_dicts()
    assert got == [{"n": 20}]


def test_reregister_same_sql_refreshes_snapshot(engine):
    """Re-registering the SAME statement is a refresh: the new
    materialization must read the source's current data, not serve the
    previously cached rows (unpersist-before-recache ordering)."""
    engine.register_table("snap_src_t", [{"v": 1}], "v int")
    engine.execute_and_register_temp_view(
        "SELECT SUM(v) AS s FROM snap_src_t", "snap_view_t"
    )
    assert engine.sql_directly(
        "SELECT s FROM snap_view_t"
    ).to_list_of_dicts() == [{"s": 1}]
    engine.register_table("snap_src_t", [{"v": 5}, {"v": 6}], "v int")
    engine.execute_and_register_temp_view(
        "SELECT SUM(v) AS s FROM snap_src_t", "snap_view_t"
    )
    assert engine.sql_directly(
        "SELECT s FROM snap_view_t"
    ).to_list_of_dicts() == [{"s": 11}]
