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
