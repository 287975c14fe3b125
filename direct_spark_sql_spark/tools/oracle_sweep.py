"""Full-registry DuckDB oracle sweep — the builder-side twin of the
driver's CORRECTNESS gate, runnable at any scale factor and for any
subset of queries:

    python -m direct_spark_sql_spark.tools.oracle_sweep \
        [--sf-dir /root/testdata/sf0.01] [--out baselines/oracle_sweep_rN.json] \
        [--rotate N [--cursor baselines/oracle_sweep_sf01_cursor.json]] \
        [name ...]

``--rotate N`` is the SCALED-correctness gate (VERDICT r11 #1): pick the
N oracle-bearing queries least recently checked at this tier (cursor
file persists a per-name sequence number, never-checked first, name
order as tie-break), run them, and advance the cursor for the ones that
passed — failures keep their stale stamp so they re-enter the next
cohort.  Run it at ``--sf-dir /root/testdata/sf0.1`` in the round-close
discipline: every other correctness check runs at sf0.01, so
cardinality-dependent wrongness (overflow, cap/df thresholds crossing,
AQE plan changes at real sizes) is invisible without this tier.

For every registered query with an oracle it runs BOTH engines and
compares schema-sorted, row-order-insensitive, exact values — STRICTLY,
including pandas dtypes (no integer-width normalization: the r8 sweep's
one dtype footnote was resolved at the operator source, VERDICT r8 #2,
and this tool exists so no future sweep needs a hand-rolled script or a
normalization caveat).  Queries without an oracle are recorded under
``rows_only`` with their row count.

The closing-commit discipline (VERDICT r7 #6): run this over the FULL
registry at sf0.01 as the last step before the round's final commit, so
``total`` equals the registry count at that commit.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback


DEFAULT_CURSOR = "baselines/oracle_sweep_sf01_cursor.json"


def load_cursor(path: str) -> dict:
    """{name: seq} last-checked sequence stamps; {} if absent/corrupt."""
    try:
        with open(path) as f:
            d = json.load(f)
        return {k: int(v) for k, v in d.get("checked", {}).items()}
    except (OSError, ValueError, KeyError):
        return {}


def pick_cohort(all_names: list[str], checked: dict, n: int) -> list[str]:
    """The n least-recently-checked names: never-checked first (stamp
    -1), then ascending stamp; name order breaks ties so the rotation
    is deterministic and provably cycles — every name is drawn within
    ceil(len/n) invocations."""
    return sorted(all_names, key=lambda x: (checked.get(x, -1), x))[:n]


def save_cursor(path: str, checked: dict) -> None:
    with open(path, "w") as f:
        json.dump({"checked": checked}, f, indent=1, sort_keys=True)


def run_sweep(
    sf_dir: str,
    names: list[str] | None = None,
    per_query_timeout_s: float = 0.0,
    verbose: bool = False,
) -> dict:
    import threading

    import duckdb
    import pandas as pd

    from direct_spark_sql_spark.plans.registry import all_queries
    from direct_spark_sql_spark.session import Engine
    from direct_spark_sql_spark.sources.registry import TABLES
    from tests.conftest import normalize

    # DSS_SWEEP_MASTER overrides the master URL — e.g.
    # 'local-cluster[2,2,2048]' runs the whole differential on a real
    # multi-JVM scheduler (separate executor JVMs + remote Python
    # workers + serialized exchanges, the paths local[n] shortcuts).
    master = os.environ.get(
        "DSS_SWEEP_MASTER",
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
    )
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    engine = (
        Engine.builder()
        .master(master)
        .app_name("oracle-sweep")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .get_or_create()
    )
    spark = engine.spark
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # Resource fences (r13 incident): one pathological oracle plan at a
    # scaled tier (an inequality join gone quadratic) spilled ~60 GB of
    # DuckDB temp in minutes and nearly filled the host disk.  Cap both
    # memory and spill so such a query FAILS AND IS RECORDED as bad —
    # triageable evidence — instead of taking the machine down.
    con.execute(
        f"SET memory_limit='{os.environ.get('DSS_SWEEP_MEMLIMIT', '24GB')}'"
    )
    con.execute("SET temp_directory='.tmp'")
    try:
        con.execute(
            "SET max_temp_directory_size="
            f"'{os.environ.get('DSS_SWEEP_TMPLIMIT', '16GB')}'"
        )
    except duckdb.Error:
        pass  # older DuckDB: memory_limit alone still bounds most plans
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written datasets (the bench's scaled/skewed probes) are
        # DIRECTORIES of part files; glob them so the oracle can run at
        # any tier's data, not just the driver's single-file testdata.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    queries = all_queries()
    if names:
        wanted = set(names)
        queries = [q for q in queries if q.name in wanted]
        missing = wanted - {q.name for q in queries}
        if missing:
            raise SystemExit(f"unknown query names: {sorted(missing)}")

    def _oracle_df(sql: str):
        """Run the oracle with an interrupt timer: a DuckDB plan that
        blows past the per-query budget is cancelled (raising here, so
        the query records as bad) rather than running unbounded."""
        if not per_query_timeout_s:
            return con.execute(sql).df()
        timer = threading.Timer(per_query_timeout_s, con.interrupt)
        timer.start()
        try:
            return con.execute(sql).df()
        finally:
            timer.cancel()

    ok: list[str] = []
    bad: dict[str, str] = {}
    rows_only: dict[str, int] = {}
    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    for i, q in enumerate(sorted(queries, key=lambda q: q.name)):
        tq = time.perf_counter()
        try:
            df = q.spark_fn(spark, sf_dir)
            if q.oracle is None:
                rows_only[q.name] = df.count()
                continue
            got = normalize(df.toPandas())
            want = normalize(_oracle_df(q.oracle))
            if list(got.columns) != list(want.columns):
                bad[q.name] = (
                    f"columns: spark={list(got.columns)} oracle={list(want.columns)}"
                )
                continue
            if len(got) != len(want):
                bad[q.name] = f"rows: spark={len(got)} oracle={len(want)}"
                continue
            # STRICT: values exact AND dtypes identical (the driver's
            # value-hash is dtype-sensitive through its serialization)
            pd.testing.assert_frame_equal(
                got, want, check_dtype=True, check_exact=True, check_like=True
            )
            ok.append(q.name)
        except AssertionError as e:
            bad[q.name] = str(e).split("\n")[0][:300]
        except Exception:
            bad[q.name] = traceback.format_exc().splitlines()[-1][:300]
        finally:
            timings[q.name] = round(time.perf_counter() - tq, 2)
            if verbose:
                status = (
                    "ok" if q.name in ok
                    else "BAD" if q.name in bad
                    else "rows_only"
                )
                print(
                    f"  {q.name}: {status} ({timings[q.name]}s)", flush=True
                )
        if (i + 1) % 25 == 0:
            print(
                f"  [{i + 1}/{len(queries)}] ok={len(ok)} bad={len(bad)} "
                f"rows_only={len(rows_only)} ({time.perf_counter() - t0:.0f}s)",
                flush=True,
            )
    return {
        "sf_dir": sf_dir,
        "total": len(queries),
        "ok": len(ok),
        "ok_names": sorted(ok),
        # always the dict — {} means clean; emitting [] when clean gave
        # downstream diff consumers an inconsistent type (ADVICE r9)
        "bad": bad,
        "rows_only": sorted(rows_only),
        "rows_only_counts": rows_only,
        "timings_s": timings,
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    out_path = None
    rotate = 0
    cursor_path = DEFAULT_CURSOR
    timeout_s = 0.0
    verbose = False
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--out":
            out_path = next(it)
        elif a == "--rotate":
            rotate = int(next(it))
        elif a == "--cursor":
            cursor_path = next(it)
        elif a == "--timeout":
            timeout_s = float(next(it))
        elif a == "--verbose":
            verbose = True
        else:
            names.append(a)
    if rotate:
        from direct_spark_sql_spark.plans.registry import all_queries

        oracle_names = [q.name for q in all_queries() if q.oracle is not None]
        checked = load_cursor(cursor_path)
        names = pick_cohort(oracle_names, checked, rotate)
    result = run_sweep(
        sf_dir, names or None, per_query_timeout_s=timeout_s, verbose=verbose
    )
    if rotate:
        # Advance only the names that PASSED: a failure keeps its stale
        # stamp and re-enters the next cohort until fixed.
        seq = max(checked.values(), default=0) + 1
        for n in result["ok_names"]:
            checked[n] = seq
        save_cursor(cursor_path, checked)
        result["cursor"] = cursor_path
        result["cohort"] = names
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
