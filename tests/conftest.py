"""Shared fixtures: one local SparkSession, one DuckDB oracle connection,
and the differential comparator used by every suite.

The oracle pattern mirrors the reference's differential testing against
vanilla Spark (TestBase.scala:28-36) with DuckDB as the second engine, per
BASELINE.md's t2 gate.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from direct_spark_sql_spark.sources.registry import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")


def parse_extra_conf(extra: str) -> list[tuple[str, str]]:
    """Parse the robustness-hook conf string: ';'-separated k=v pairs.

    The separator is ';' (NOT ',') because conf VALUES legitimately
    contain commas (spark.sql.optimizer.excludedRules=A,B,C).

    Separator-mistake guard (round 13): a comma-joined conf string
    parses as ONE pair whose value swallows the remaining "spark.x=1"
    pairs.  Spark accepts the malformed value without an error and the
    axis run silently measures a DIFFERENT hostile config (observed:
    every query ~100-300x slower, still passing — the worst kind of
    silent harness failure).  Fail fast instead of launching a
    mislabeled axis.
    """
    pairs: list[tuple[str, str]] = []
    for pair in filter(None, extra.split(";")):
        k, _, v = pair.partition("=")
        if "=" in v and "spark." in v:
            raise ValueError(
                "SPARK_GRAFT_TEST_EXTRA_CONF pairs must be ';'-separated; "
                f"value of {k!r} looks like swallowed pairs: {v!r}"
            )
        pairs.append((k.strip(), v.strip()))
    return pairs


@pytest.fixture(scope="session")
def spark():
    from direct_spark_sql_spark.session import Engine

    builder = (
        Engine.builder()
        .master(f"local[{CPUS}]")
        .app_name("direct_spark_sql_spark-tests")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    # Robustness matrix hook: ';'-separated k=v pairs, e.g.
    # SPARK_GRAFT_TEST_EXTRA_CONF="spark.sql.adaptive.enabled=false" runs
    # the whole differential suite under a hostile config — results must
    # not depend on AQE, partition counts, or codegen being on.
    # The separator is ';' (NOT ',') because conf VALUES legitimately
    # contain commas (spark.sql.optimizer.excludedRules=A,B,C).
    for k, v in parse_extra_conf(os.environ.get("SPARK_GRAFT_TEST_EXTRA_CONF", "")):
        builder = builder.config(k, v)
    engine = builder.get_or_create()
    engine.spark.sparkContext.setLogLevel("ERROR")
    yield engine.spark
    engine.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from direct_spark_sql_spark.session import Engine

    return Engine(spark)


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by value for order-insensitive compare;
    strip timezones (Spark's Arrow collect localizes to the session TZ,
    DuckDB returns naive timestamps)."""
    import datetime as dt

    out = df.copy()
    for col in out.columns:
        if isinstance(out[col].dtype, pd.DatetimeTZDtype):
            out[col] = out[col].dt.tz_convert("UTC").dt.tz_localize(None)
        # Spark collects DATE as python date objects; DuckDB returns
        # datetime64 — unify both to datetime64[us]
        if out[col].dtype == object:
            sample = out[col].dropna()
            if len(sample) > 0 and isinstance(sample.iloc[0], dt.date):
                out[col] = pd.to_datetime(out[col])
        # unify datetime resolutions (spark: us, duckdb: us/ns)
        if pd.api.types.is_datetime64_any_dtype(out[col]):
            out[col] = out[col].astype("datetime64[us]")
    out = out.reindex(sorted(out.columns), axis=1)
    if len(out) > 0:
        out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out.reset_index(drop=True)


def assert_matches_oracle(spark_df, oracle_con, oracle_sql: str, *, check_dtype=False):
    """Differential check: Spark result ≡ DuckDB result (schema-sorted,
    row-order-insensitive, exact values)."""
    got = normalize(spark_df.toPandas())
    want = normalize(oracle_con.execute(oracle_sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=check_dtype, check_exact=True, check_like=True
    )
