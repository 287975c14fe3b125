"""Table profiling: per-column quality stats in one scan.

The data-quality primitive every ingestion pipeline runs first: row count,
null count, exact distinct count, and numeric min/max per column, emitted
as one row per column.

Shape at scale: a single pass — one aggregate over the table computes all
per-column stats (multi-distinct planned by Catalyst as an Expand +
partial/final agg), then a 1-row ``inline`` fans the struct out to
per-column rows driver-free.  For 100 TB runs swap ``countDistinct`` for
``approx_count_distinct`` (same plan shape, no Expand multiplication);
the exact form is kept here so the DuckDB oracle can hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def profile_table(
    df: DataFrame, numeric: dict[str, Column | None]
) -> DataFrame:
    """Profile every column of ``df``.

    ``numeric`` maps column name → a double-typed Column used for min/max
    (or None for non-orderable/categorical columns, which get NULL
    bounds).  Columns absent from ``numeric`` are skipped entirely.
    """
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for c in numeric:
        aggs.append(
            (F.count(F.lit(1)) - F.count(F.col(c))).cast("long").alias(f"_null_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"_dist_{c}"))
        num = numeric[c]
        aggs.append(
            (F.min(num) if num is not None else F.lit(None).cast("double")).alias(f"_min_{c}")
        )
        aggs.append(
            (F.max(num) if num is not None else F.lit(None).cast("double")).alias(f"_max_{c}")
        )
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_num"),
                F.col(f"_max_{c}").alias("max_num"),
            )
            for c in numeric
        ]
    )
    return one.select(F.inline(rows)).orderBy("col_name")


def constraint_audit(
    df: DataFrame,
    row_checks: dict[str, Column],
    unique_checks: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Declarative expectations over a table, evaluated in ONE scan.

    ``row_checks`` maps check name → a boolean Column that is true for a
    VIOLATING row (``col.isNull()``, ``~col.isin(...)``, ``col <= 0``);
    ``unique_checks`` maps check name → key columns that must be unique
    (violations = n_rows − n_distinct, computed in the same aggregate —
    Catalyst plans the multi-distinct as one Expand, still a single pass).

    Returns one row per check: (check, violations, n_rows, passed),
    ordered by check name.  Shape at scale: every conditional count
    partial-aggregates map-side; the shuffle is one row per partition.
    """
    unique_checks = unique_checks or {}
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for name, cond in row_checks.items():
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_v_{name}")
        )
    for name, cols in unique_checks.items():
        aggs.append(
            (F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols]))
            .cast("long")
            .alias(f"_v_{name}")
        )
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"_v_{name}").alias("violations"),
                F.col("_n_rows").alias("n_rows"),
                (F.col(f"_v_{name}") == 0).alias("passed"),
            )
            for name in [*row_checks, *unique_checks]
        ]
    )
    return one.select(F.inline(rows)).orderBy("check")


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str, name: str
) -> DataFrame:
    """Referential-integrity check as a LEFT ANTI join count — the only
    expectation that genuinely needs a second input.  The anti join
    shuffles on the key (or broadcasts a small parent); the count is the
    violation total, emitted in the same (check, violations, n_rows,
    passed) shape so it unions with :func:`constraint_audit` output."""
    n_rows = child.agg(F.count(F.lit(1)).cast("long").alias("n")).select("n")
    orphans = (
        child.join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    return orphans.crossJoin(n_rows).select(
        F.lit(name).alias("check"),
        "violations",
        F.col("n").alias("n_rows"),
        (F.col("violations") == 0).alias("passed"),
    )


def observed(df: DataFrame, name: str, metrics: dict[str, Column]):
    """Attach single-pass observability metrics to a DataFrame
    (``Dataset.observe``): the metric aggregates are computed *during*
    whatever action consumes ``df`` — ingest counts, null rates, domain
    violations — with ZERO extra scans or jobs.  At 100 TB that is the
    difference between monitored and unmonitored pipelines: a separate
    quality pass would double the read.

    Returns ``(df_observed, observation)``; call ``observation.get`` AFTER
    an action on the returned frame to read the metrics dict.

    Reference parity: the reference has no metrics surface; this wraps
    Spark's Observation API as the engine's quality-monitoring hook
    (pairs with the explicit `constraint_audit`, which is a checked scan).
    """
    from pyspark.sql import Observation

    if not metrics:
        raise ValueError("observed() needs at least one metric expression")
    obs = Observation(name)
    first, *rest = [v.alias(k) for k, v in metrics.items()]
    return df.observe(obs, first, *rest), obs
