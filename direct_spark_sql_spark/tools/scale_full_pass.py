"""Pre-seal scale gate (VERDICT r10 #3): run EVERY bench-headline query
once at the 10× probe dataset and the deep watch set (plus any names
passed on the CLI) once at 30×, outside the 530 s bench budget, so no
rotation state can leave a headline query scale-untested when the
driver's stateful cohort draws it.  Round 10 shipped exactly that
landmine: the builder's three bench runs never drew
``recursive_cte_tree_depth`` into a scale cohort, the driver's rotation
did, and the query hard-failed at 30× with zero prior in-house evidence.

    python -m direct_spark_sql_spark.tools.scale_full_pass \
        [--out baselines/scale_full_pass_rN.json] [extra_30x_name ...]

Per-query isolation throughout (the bench harness's guarded-runner
rule): a failure is recorded under ``errors`` and the pass continues.
The gate is green iff ``errors`` is empty and every headline name is
present in ``x10``.
"""

from __future__ import annotations

import json
import os
import sys
import time


def gate_green(errors: dict, x10_names: set, headline_names: set) -> tuple:
    """(green, x10_missing): zero errors AND full headline coverage in
    x10 — both halves of the docstring contract (ADVICE r11), factored
    out so the harness test can pin it without a scaled run."""
    missing = sorted(headline_names - x10_names)
    return (not errors and not missing), missing


def run_pass(extra_deep: list[str] | None = None) -> dict:
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if repo not in sys.path:  # bench.py lives at the repo root; make the
        sys.path.insert(0, repo)  # import cwd-independent

    from bench import DEEP_WATCH_NAMES
    from direct_spark_sql_spark.plans.registry import all_queries
    from direct_spark_sql_spark.session import Engine
    from direct_spark_sql_spark.sources.scale import ensure_scaled_dataset

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    engine = (
        Engine.builder()
        .master(f"local[{cpus}]")
        .app_name("scale-full-pass")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .get_or_create()
    )
    spark = engine.spark
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "sf": sf,
        "x10": {},
        "x30": {},
        "errors": {},
        "headline_count": 0,
    }

    def run_tier(tier: str, names: set | None, factor: int) -> None:
        data_dir = os.path.join(
            repo, "spark-warehouse", "scaledata", f"sf{sf}x{factor}"
        )
        ensure_scaled_dataset(spark, sf_dir, data_dir, factor=factor)
        qs = [
            q
            for q in all_queries()
            if (q.bench if names is None else q.name in names)
        ]
        for q in sorted(qs, key=lambda q: q.name):
            t0 = time.perf_counter()
            try:
                df = q.spark_fn(spark, data_dir)
                try:
                    df.toPandas()
                except Exception:
                    df.collect()
                out[tier][q.name] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001 — isolation is the point
                out["errors"][f"{tier}:{q.name}"] = (
                    f"{type(e).__name__}: {e}"[:400]
                )

    run_tier("x10", None, int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10")))
    out["headline_count"] = len(out["x10"]) + sum(
        1 for k in out["errors"] if k.startswith("x10:")
    )
    deep = set(DEEP_WATCH_NAMES) | set(extra_deep or [])
    run_tier(
        "x30", deep, int(os.environ.get("SPARK_GRAFT_DEEP_SCALE_FACTOR", "30"))
    )
    # Green is BOTH halves of the docstring contract (ADVICE r11): zero
    # errors AND every bench-flagged name actually present in x10 — so a
    # headline query that vanished upstream of the per-query try (e.g. a
    # registry import regression silently shrinking all_queries()) fails
    # the gate instead of passing by absence.
    headline_names = {q.name for q in all_queries() if q.bench}
    out["green"], out["x10_missing"] = gate_green(
        out["errors"], set(out["x10"]), headline_names
    )
    return out


def main() -> None:
    args = sys.argv[1:]
    out_path = "baselines/scale_full_pass.json"
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    result = run_pass(args)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(
        json.dumps(
            {
                "out": out_path,
                "green": result["green"],
                "x10_count": len(result["x10"]),
                "x30_count": len(result["x30"]),
                "errors": result["errors"],
            }
        )
    )


if __name__ == "__main__":
    main()
