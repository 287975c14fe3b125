"""Verify harness: drive __spark_entry__.py like the driver does, at sf0.01."""
import importlib.util
import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

spec = importlib.util.spec_from_file_location("entrymod", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            import datetime
            if df[c].map(lambda v: isinstance(v, datetime.date) or v is None).all() and df[c].notna().any():
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), ignore_index=True)
    return df


# 1. entry()
edf = mod.entry(spark)
rows = edf.collect()
print(f"entry: {len(rows)} rows, schema ok", flush=True)
assert len(rows) >= 1

# 2. queries vs oracles
qs = mod.queries()
oracles = mod.oracle_sql()
only = sys.argv[1:] if len(sys.argv) > 1 else None
fail, ok, rows_only = [], 0, 0
t0 = time.time()
for name, fn in qs.items():
    if only and name not in only:
        continue
    try:
        sdf = fn(spark, SF_DIR).toPandas()
        if name not in oracles:
            rows_only += 1
            print(f"  {name}: rows-only ({len(sdf)} rows)", flush=True)
            continue
        odf = con.execute(oracles[name]).fetchdf()
        a, b = normalize(sdf), normalize(odf)
        pd.testing.assert_frame_equal(a, b, check_exact=True, check_dtype=False)
        ok += 1
    except Exception as e:
        fail.append((name, str(e)[:300]))
        print(f"  FAIL {name}: {str(e)[:200]}", flush=True)
print(f"queries: {ok} exact-match, {rows_only} rows-only, {len(fail)} FAIL "
      f"in {time.time()-t0:.0f}s", flush=True)
if fail:
    for n, e in fail:
        print("FAIL:", n, e)
    sys.exit(1)
print("VERIFY-QUERIES-OK")
