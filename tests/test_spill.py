"""Spill-path correctness: the reference inherits Tungsten's
spill-to-disk machinery (UnsafeExternalRowSorter in SortDirectExec.scala:
70-72, TungstenAggregationIterator fallback in HashAggregateDirectExec.
scala:84-100); on a cluster at 100 TB, sorts and aggregations WILL spill.
This suite runs representative sort/agg queries in a subprocess JVM with
executor memory squeezed far below the working set, asserts the results
still hash-match DuckDB, and asserts (via the executed plan's spillSize
metrics) that spilling genuinely happened — i.e. we verified the spill
path, not a lucky in-memory run.

Subprocess because memory confs are fixed at JVM launch; the shared test
session can't be resized.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import json, sys
from direct_spark_sql_spark.session import Engine
from direct_spark_sql_spark.session import _walk_plan_metrics

sf_dir = sys.argv[1]
e = (
    Engine.builder()
    .master("local[2]")
    .app_name("spill-test")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    # heap big enough to COLLECT the result (collect buffers on the
    # driver, outside the unified pool) but execution+storage squeezed to
    # ~52 MB total — far below the ~180 MB post-pruning sort working set
    .config("spark.driver.memory", "2g")
    .config("spark.memory.fraction", "0.03")
    .config("spark.buffer.pageSize", "1m")
    .get_or_create()
)
spark = e.spark
spark.sparkContext.setLogLevel("ERROR")

out = {}
from direct_spark_sql_spark.sources.registry import load_table
from pyspark.sql import functions as F

li = load_table(spark, sf_dir, "lineitem")

# full-table multi-key sort: forces UnsafeExternalRowSorter to spill
sorted_df = li.select("l_orderkey", "l_linenumber", "l_extendedprice").orderBy(
    "l_extendedprice", "l_orderkey", "l_linenumber"
)
rows = sorted_df.collect()
out["n_rows"] = len(rows)
out["first"] = [rows[0][0], rows[0][1], float(rows[0][2])]
out["last"] = [rows[-1][0], rows[-1][1], float(rows[-1][2])]

nodes = []
_walk_plan_metrics(sorted_df._jdf.queryExecution().executedPlan(), nodes)
out["sort_spill_bytes"] = sum(
    n["metrics"].get("spillSize", 0) for n in nodes
)

# high-cardinality aggregation (one group per orderkey) under the same
# squeeze: hash-agg falls back to sort-based aggregation and spills
agg = (
    li.groupBy("l_orderkey")
    .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
)
arows = agg.collect()
out["n_groups"] = len(arows)
out["sum_q"] = sum(r["q"] for r in arows)
nodes = []
_walk_plan_metrics(agg._jdf.queryExecution().executedPlan(), nodes)
out["agg_spill_bytes"] = sum(n["metrics"].get("spillSize", 0) for n in nodes)
out["agg_fallback_tasks"] = sum(
    n["metrics"].get("numTasksFallBacked", 0) for n in nodes
)

print("RESULT:" + json.dumps(out))
e.stop()
"""


def test_sort_and_agg_survive_memory_squeeze(tmp_path, spark):
    # 10x key-shifted copy of sf0.1 (~6M lineitem rows): after column
    # pruning the sort working set is ~10x the squeezed execution pool,
    # so the external sorter MUST spill (and the assert proves it did).
    from direct_spark_sql_spark.sources.scale import ensure_scaled_dataset

    sf_dir = os.path.join(REPO, "spark-warehouse", "scaledata", "sf0.1x10")
    ensure_scaled_dataset(spark, "/root/testdata/sf0.1", sf_dir, factor=10)
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, sf_dir],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, (
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-2000:]}"
    )
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT:"))
    out = json.loads(line[len("RESULT:"):])

    import duckdb

    con = duckdb.connect()
    exp_n, exp_groups, exp_sum = con.execute(
        f"""SELECT COUNT(*), COUNT(DISTINCT l_orderkey),
                   SUM(CAST(l_quantity AS BIGINT))
            FROM read_parquet('{sf_dir}/lineitem.parquet/*.parquet')"""
    ).fetchone()
    first = con.execute(
        f"""SELECT l_orderkey, l_linenumber, l_extendedprice
            FROM read_parquet('{sf_dir}/lineitem.parquet/*.parquet')
            ORDER BY l_extendedprice, l_orderkey, l_linenumber LIMIT 1"""
    ).fetchone()
    last = con.execute(
        f"""SELECT l_orderkey, l_linenumber, l_extendedprice
            FROM read_parquet('{sf_dir}/lineitem.parquet/*.parquet')
            ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC
            LIMIT 1"""
    ).fetchone()

    assert out["n_rows"] == exp_n
    assert out["first"] == [first[0], first[1], float(first[2])]
    assert out["last"] == [last[0], last[1], float(last[2])]
    assert out["n_groups"] == exp_groups
    assert out["sum_q"] == exp_sum
    # the point of the test: the squeeze genuinely forced the spill paths
    assert out["sort_spill_bytes"] > 0, "sort never spilled - squeeze harder"
    assert out["agg_spill_bytes"] > 0, "agg never spilled - squeeze harder"
    # hash-agg hit its memory cap and fell back to sort-based aggregation
    assert out["agg_fallback_tasks"] > 0
