"""Oracle output-type lint (no Spark, no execution — pure DuckDB binding).

The driver's CORRECTNESS comparator value-hashes each cell *with its Arrow
type*: DuckDB ``SUM(BIGINT)`` silently widens to HUGEINT → Arrow
``decimal128(38,0)``, whose serialized cells (``Decimal(123)``) never hash
equal to Spark's int64 (``123``) even when every value matches.  That is
exactly how round 4's only red row (``text_fingerprints``, hash_match
false with rows+schema green) reached the driver unseen: the local
comparator compares values with ``check_dtype=False`` and is structurally
blind to this divergence class.

This lint closes the hole: it binds ALL registry oracles against DuckDB
(``con.sql(...).types`` — plans only, runs in ~2 s) and fails if any
output column is HUGEINT or DECIMAL.  No registry query legitimately
outputs either — every aggregate over integers must follow the repo-wide
``CAST(SUM(...) AS BIGINT)`` / ``AS DOUBLE`` convention, and money-ish
TPC-H measures are computed as DOUBLE on both engines.
"""

from __future__ import annotations

import duckdb
import pytest

from direct_spark_sql_spark.plans.registry import QUERIES
from tests.conftest import SF_DIR
from direct_spark_sql_spark.sources.registry import TABLES

_FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def bind_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_every_query_has_an_oracle():
    missing = [name for name, q in QUERIES.items() if not getattr(q, "oracle", None)]
    assert missing == [], f"queries without oracle SQL: {missing}"


#: columns where the oracle emits DATE and Spark a midnight TIMESTAMP
#: (date_trunc semantics differ across engines).  Both queries were
#: driver-checked fully green in round 3 (CORRECTNESS_r03: hash_match
#: true), so the driver's typed hasher demonstrably tolerates this pair —
#: new entries should align their types instead of growing this list.
_DATE_TS_TOLERATED = {
    ("date_functions", "month_start"),
    ("events_rollup_reuse", "day_start"),
}

_DUCK_FAMILY = {
    **dict.fromkeys(
        ["TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT", "UTINYINT",
         "USMALLINT", "UINTEGER", "UBIGINT"], "int"),
    "FLOAT": "float", "DOUBLE": "float", "VARCHAR": "str", "DATE": "date",
    "BOOLEAN": "bool", "BLOB": "bin",
}


def _fam_duck(t: str) -> str:
    if t in _DUCK_FAMILY:
        return _DUCK_FAMILY[t]
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t.endswith("[]"):
        return "list"
    return t


def _fam_spark(dt) -> str:
    s = dt.simpleString()
    for prefix, fam in [
        ("tinyint", "int"), ("smallint", "int"), ("bigint", "int"), ("int", "int"),
        ("float", "float"), ("double", "float"), ("decimal", "decimal"),
        ("string", "str"), ("date", "date"), ("timestamp", "ts"),
        ("boolean", "bool"), ("binary", "bin"), ("array", "list"),
        ("map", "map"), ("struct", "struct"),
    ]:
        if s.startswith(prefix):
            return fam
    return s


def test_output_type_families_match_across_engines(bind_con, spark):
    """Cross-engine output-TYPE parity for every registry query: the
    DuckDB oracle's bound output types and the Spark query's analyzed
    schema must agree column-by-column at the type-family level
    (int/float/str/date/ts/...).  The local value comparator normalizes
    dates to datetimes (``check_dtype=False``), so a date-vs-timestamp or
    int-vs-decimal divergence is invisible locally but fully visible to
    the driver's typed value-hash — this closes that blind spot for ALL
    families, not just the HUGEINT case above.  Spark side is
    analysis-only (``.schema`` never executes the plan)."""
    sf = SF_DIR
    offenders = []
    for name, q in QUERIES.items():
        rel = bind_con.sql(q.oracle)
        schema = q.spark_fn(spark, sf).schema
        duck = {c: _fam_duck(str(t)) for c, t in zip(rel.columns, rel.types)}
        spk = {f.name: _fam_spark(f.dataType) for f in schema.fields}
        if set(duck) != set(spk):
            offenders.append((name, "column-name mismatch", sorted(set(duck) ^ set(spk))))
            continue
        for col in duck:
            if duck[col] != spk[col] and (name, col) not in _DATE_TS_TOLERATED:
                offenders.append((name, col, duck[col], spk[col]))
    assert offenders == [], f"cross-engine output type divergence: {offenders}"


def test_no_oracle_outputs_hugeint_or_decimal(bind_con):
    offenders: list[tuple[str, str, str]] = []
    for name, q in QUERIES.items():
        rel = bind_con.sql(q.oracle)  # binder only; nothing is executed
        for col, ty in zip(rel.columns, rel.types):
            s = str(ty)
            if any(f in s for f in _FORBIDDEN):
                offenders.append((name, col, s))
    assert offenders == [], (
        "oracle output columns whose DuckDB type the driver's typed value-hash "
        "cannot match against Spark (wrap in CAST(... AS BIGINT/DOUBLE)): "
        f"{offenders}"
    )
