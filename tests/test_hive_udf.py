"""Hive-API UDF opt-in: the reference registers classes written against
``org.apache.hadoop.hive.ql.exec.UDF`` via CREATE [TEMPORARY] FUNCTION
(DirectSessionCatalog.scala:72-91; tested DirectExecSuite.scala:159-178
temp, 385-393 permanent-across-newSession).  The engine's port needs a
Hive-enabled session state (``EngineBuilder.enable_hive_support()``), and
``spark.sql.catalogImplementation`` is a static conf frozen at the first
SparkSession in the JVM — so this suite drives a fresh interpreter via
subprocess instead of the shared session fixture.
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
from direct_spark_sql_spark.functions.jvm import ensure_udf_jar

jar = ensure_udf_jar()
tmp = sys.argv[1]
e = (
    Engine.builder()
    .master("local[2]")
    .app_name("hive-udf-test")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.warehouse.dir", tmp + "/wh")
    .config("spark.driver.extraJavaOptions", "-Dderby.system.home=" + tmp + "/derby")
    .enable_hive_support()
    .get_or_create()
)
e.spark.sparkContext.setLogLevel("ERROR")
out = {}

# Port of testHiveUdf (DirectExecSuite.scala:159-168): temporary Hive UDF,
# both evaluate overloads (string -> length, int -> input + 100), over a
# registered view.
e.register_table(
    "people",
    [{"name": "hyf_test", "age": 100}, {"name": "ab", "age": 1}],
    "name string, age int",
)
e.sql_directly(
    f"CREATE TEMPORARY FUNCTION hive_strlen AS 'org.dss.hive.StrLen' USING JAR '{jar}'"
)
out["temp"] = e.sql_directly(
    "SELECT hive_strlen(name) AS a, hive_strlen(age) AS b FROM people ORDER BY name"
).to_list_of_dicts()

# Port of testHiveUdf2 (DirectExecSuite.scala:385-393): PERMANENT function,
# resolvable from a brand-new session over the shared context.
e.sql_directly(
    f"CREATE FUNCTION hive_strlen2 AS 'org.dss.hive.StrLen' USING JAR '{jar}'"
)
s2 = e.new_session()
out["perm"] = s2.sql_directly(
    "SELECT hive_strlen2('hyf_test') AS a, hive_strlen2(100) AS b"
).to_list_of_dicts()

# GenericUDF protocol (initialize/DeferredObject/ObjectInspector).
e.sql_directly(
    f"CREATE TEMPORARY FUNCTION hive_shout AS 'org.dss.hive.ShoutGeneric' USING JAR '{jar}'"
)
out["generic"] = e.sql_directly("SELECT hive_shout('abc') AS s").to_list_of_dicts()

# Old-style UDAF (reflective iterate/merge/terminate dispatch,
# DirectSessionCatalog.scala:78-91).
e.sql_directly(
    f"CREATE TEMPORARY FUNCTION hive_maxlen AS 'org.dss.hive.MaxLenUdaf' USING JAR '{jar}'"
)
out["udaf"] = e.sql_directly(
    "SELECT age, hive_maxlen(name) AS maxlen FROM people GROUP BY age ORDER BY age"
).to_list_of_dicts()

# AbstractGenericUDAFResolver (full GenericUDAFEvaluator mode protocol;
# partial aggregation + merge across 2 shuffle partitions).
e.sql_directly(
    f"CREATE TEMPORARY FUNCTION hive_maxlen_g AS 'org.dss.hive.MaxLenResolver' USING JAR '{jar}'"
)
out["udaf_generic"] = e.sql_directly(
    "SELECT hive_maxlen_g(name) AS maxlen FROM people"
).to_list_of_dicts()

# GenericUDTF via LATERAL VIEW (initialize/process/forward protocol).
e.sql_directly(
    f"CREATE TEMPORARY FUNCTION hive_explode_csv AS 'org.dss.hive.ExplodeCsv' USING JAR '{jar}'"
)
out["udtf"] = e.sql_directly(
    "SELECT t.pos, t.token FROM (SELECT 'x,yy,zzz' AS csv) s "
    "LATERAL VIEW hive_explode_csv(csv) t AS pos, token ORDER BY t.pos"
).to_list_of_dicts()

print("RESULT:" + json.dumps(out))
e.stop()
"""


def test_hive_udf_temp_permanent_and_generic(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),  # derby/metastore litter stays in tmp
    )
    assert proc.returncode == 0, f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-2000:]}"
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT:"))
    out = json.loads(line[len("RESULT:"):])
    assert out["temp"] == [{"a": 2, "b": 101}, {"a": 8, "b": 200}]
    assert out["perm"] == [{"a": 8, "b": 200}]
    assert out["generic"] == [{"s": "ABC!"}]
    # people: age 1 -> 'ab' (len 2), age 100 -> 'hyf_test' (len 8)
    assert out["udaf"] == [
        {"age": 1, "maxlen": 2},
        {"age": 100, "maxlen": 8},
    ]
    assert out["udaf_generic"] == [{"maxlen": 8}]
    assert out["udtf"] == [
        {"pos": 0, "token": "x"},
        {"pos": 1, "token": "yy"},
        {"pos": 2, "token": "zzz"},
    ]
