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
