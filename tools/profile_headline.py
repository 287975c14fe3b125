"""Round-13/14 measurement harness (guide §1): per-headline-query timing
breakdown + explain("formatted") capture.

For every bench-flagged registry query, records
- t_plan:  DataFrame construction time (Catalyst analysis happens lazily,
  so this is mostly Python-side plan building + parquet footer reads),
- t_cold:  first materialization (toPandas — the bench's sink),
- t_warm:  best of N warm materializations (bench methodology),
- t_noop:  best of N warm noop-sink writes (guide §1.4 — computation
  without the Arrow-collect tax, for diagnosis only),
- plan:    .explain("formatted") text, written to plans/<tier>/<name>_<tag>.txt,
- exchanges / pyevals / subqueries: counted off the plan text.

Usage: python tools/profile_headline.py [tag] [query ...]
  tag defaults to "before"; with no query names, profiles every bench query.
Output JSON: /tmp/r14_profile_<tag>.json
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("PROFILE_RUNS", "3"))

    from direct_spark_sql_spark.session import Engine

    engine = (
        Engine.builder()
        .master(f"local[{cpus}]")
        .app_name("r13-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .get_or_create()
    )
    spark = engine.spark
    spark.sparkContext.setLogLevel("ERROR")

    from direct_spark_sql_spark.plans.registry import all_queries

    qs = [q for q in all_queries() if q.bench and (not only or q.name in only)]
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PROFILE_PLAN_TIER", "r14"))
    os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for q in qs:
        spark.sparkContext.setJobDescription(f"profile:{q.name}")
        rec: dict = {}
        try:
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            rec["t_plan"] = round(time.perf_counter() - t0, 4)

            t0 = time.perf_counter()
            df.toPandas()
            rec["t_cold"] = round(time.perf_counter() - t0, 4)

            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                q.spark_fn(spark, sf_dir).toPandas()
                best = min(best, time.perf_counter() - t0)
            rec["t_warm"] = round(best, 4)

            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            rec["t_noop"] = round(best, 4)

            pdf = q.spark_fn(spark, sf_dir)
            plan = pdf._sc._jvm.PythonSQLUtils.explainString(
                pdf._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{q.name}_{tag}.txt"), "w") as f:
                f.write(plan)
            rec["exchanges"] = len(re.findall(r"\bExchange\b", plan))
            rec["pyevals"] = len(
                re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)
            )
            rec["subqueries"] = len(re.findall(r"Subquery:", plan))
            rec["smj"] = len(re.findall(r"SortMergeJoin", plan))
            rec["bhj"] = len(re.findall(r"BroadcastHashJoin", plan))
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        out[q.name] = rec
        print(json.dumps({q.name: rec}), flush=True)

    path = f"/tmp/r14_profile_{tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    total_warm = sum(r.get("t_warm", 0.0) for r in out.values())
    print(f"wrote {path}; total t_warm={total_warm:.2f}s over {len(out)} queries")


if __name__ == "__main__":
    main()
