"""Temporal join operators: as-of join and range join.

The reference has neither (SURVEY.md §2.3 "range / as-of / interval joins:
absent") — these are north-star extensions for event-stream analytics,
built from DataFrame primitives so Catalyst plans them:

- :func:`asof_join` — for each left row, the latest right row with
  ``right_ts <= left_ts`` per key, via the union-marker + running
  ``last(ignorenulls)`` window trick: one shuffle on (key), one sort per
  partition, **no range expansion** — the shape that survives skewed keys
  and 100 TB inputs, unlike a naive ``t2.ts <= t1.ts`` theta-join whose
  intermediate is quadratic in events-per-key.
- :func:`range_join` — equi-key + interval-overlap join expressed so the
  equality conjunct drives a hash join and the range residual filters
  post-probe (Catalyst does exactly this for mixed predicates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: enrich each left row with the most recent right row
    at or before its timestamp, matched on ``key``.

    Implementation: tag both inputs, union them, and carry right-side
    values forward with ``last(x, ignorenulls=True)`` over
    (key ORDER BY ts, side) — right rows sort before left rows at equal
    timestamps, so an exactly-simultaneous right row IS visible to the
    left row (ASOF ``<=`` semantics, matching DuckDB's ASOF JOIN).

    If several right rows share (key, ts), the one latest in the union
    sort order wins; pre-deduplicate the right side if that order is not
    meaningful.  ``tolerance`` (e.g. ``"7 days"``) nulls out matches older
    than the window, like pandas ``merge_asof``.

    Skew posture: this is a per-key ordered window, so a hot key's whole
    timeline sorts in one task — inherent to as-of semantics (each fill
    depends on the key's full history).  Measured, not assumed: the
    bench skew probe runs ``asof_event_order`` on a 10%-hot-user events
    table at ratio_vs_unskewed 0.99 (pinned in baselines/skew_pins.json;
    a doubling re-flags).  If a corpus ever breaks that pin, the
    two-phase chunk-and-stitch rewrite used by events_user_sessions
    (plans/conformance.py) applies here unchanged: in-chunk forward fill
    + per-chunk last-right summaries prefix-carried across chunks.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]

    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__r_ts"),
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__side",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in right_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__c_ts"),
    ).filter(F.col("__side") == 1)
    if tolerance is not None:
        in_window = F.col("__c_ts") >= (
            F.col("__l").getField(left_ts) - F.expr(f"INTERVAL {tolerance}")
        )
        carried = carried.select(
            "__side",
            "__l",
            *[
                F.when(in_window, F.col(f"__c_{c}")).otherwise(F.lit(None)).alias(f"__c_{c}")
                for c in right_cols
            ],
            F.when(in_window, F.col("__c_ts")).otherwise(F.lit(None)).alias("__c_ts"),
        )
    return carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__c_{c}").alias(c) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-key + range join: ``on`` is the equality conjunct (drives the
    hash join / shuffle), ``lower``/``upper`` are the range bounds applied
    as the join residual.  Catalyst evaluates mixed predicates exactly this
    way when the condition is a conjunction — this helper just makes the
    contract explicit and keeps callers from writing a pure theta-join."""
    return left.join(right, on & lower & upper, how)


def _interval_micros(bin_width: str) -> Column:
    """Microseconds in a day-time interval literal, as a constant-folded
    column (``CAST(interval AS long)`` would yield the interval's natural
    unit — 30 for '30 minutes' — not micros)."""
    return F.expr(f"unix_micros(timestamp'1970-01-01 00:00:00Z' + INTERVAL {bin_width})")


def _epoch_us(col: str) -> Column:
    """Epoch microseconds of a timestamp column, NTZ-safe.

    ``unix_micros`` rejects TIMESTAMP_NTZ (what Spark 4 infers for
    parquet ``timestamp[us]`` without UTC adjustment); the engine pins
    ``spark.sql.session.timeZone=UTC`` (session.py:ENGINE_CONF), so the
    NTZ→LTZ cast is an identity on the underlying micros and the binning
    stays deterministic."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join WITHOUT an equi-key, as a binned equi-join.

    ``points.point_ts BETWEEN intervals.start_ts AND intervals.end_ts``
    has no equality conjunct, so Catalyst can only plan it as a broadcast
    nested loop — quadratic work and a single-executor bottleneck at
    100 TB.  The scale path quantizes time into fixed-width bins: each
    point lands in exactly one bin, each interval is exploded to one row
    per bin it touches (``sequence(floor(start/W), floor(end/W))``), and
    the join becomes a hash equi-join on ``bin`` with the BETWEEN residual
    applied post-probe.  Every qualifying pair matches exactly once (the
    point's bin is unique), so no dedup pass is needed.

    Cost model: the interval side is replicated ``len/W + 1``× — pick
    ``bin_width`` on the order of the typical interval length so the
    blow-up is ~2× while bins stay selective.  Shuffle is bounded by
    rows×replication, never |points|×|intervals|.
    """
    w_us = _interval_micros(bin_width)
    p = points.withColumn(
        "__bin", (_epoch_us(point_ts) / w_us).cast("long")
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (_epoch_us(start_ts) / w_us).cast("long"),
                (_epoch_us(end_ts) / w_us).cast("long"),
            )
        ),
    )
    cond = (
        (p["__bin"] == iv["__bin"])
        & (p[point_ts] >= iv[start_ts])
        & (p[point_ts] <= iv[end_ts])
    )
    return p.join(iv, cond, how).drop("__bin")


def overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: str = "30 minutes",
) -> DataFrame:
    """Interval-overlap join (``l_start <= r_end AND r_start <= l_end``)
    without an equi-key, as a binned equi-join.

    Both sides explode across the bins their interval touches and hash-
    join on ``bin``.  A pair whose intervals share several bins would
    match once per shared bin; the classic first-common-bin guard —
    keep only the match in ``bin == max(floor(l_start/W), floor(r_start/W))``
    — dedups with a filter instead of a shuffle-heavy ``distinct``.
    """
    w_us = _interval_micros(bin_width)

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    (_epoch_us(s) / w_us).cast("long"),
                    (_epoch_us(e) / w_us).cast("long"),
                )
            ),
        )

    lb, rb = binned(left, l_start, l_end), binned(right, r_start, r_end)
    first_common = F.greatest(
        (F.unix_micros(lb[l_start].cast("timestamp")) / w_us).cast("long"),
        (F.unix_micros(rb[r_start].cast("timestamp")) / w_us).cast("long"),
    )
    cond = (
        (lb["__bin"] == rb["__bin"])
        & (lb[l_start] <= rb[r_end])
        & (rb[r_start] <= lb[l_end])
        & (lb["__bin"] == first_common)
    )
    return lb.join(rb, cond, "inner").drop("__bin")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_on: Column,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Pre-salted equi-join for skewed keys.

    The probe side gets a deterministic salt in ``[0, n_salt)`` derived
    from ``salt_on`` (any column that varies within a hot key); the build
    side is replicated ``n_salt`` times via a tiny ``explode(sequence)``.
    Joining on ``(on, salt)`` splits each hot key's rows across ``n_salt``
    reducers, bounding the largest shuffle partition at ~1/n_salt of the
    hottest key — the classic remedy when AQE skew-join handling is
    unavailable (streaming joins, fixed partitioning contracts) or the
    skew exceeds what partition splitting can fix.  The result is
    identical to the unsalted join; only the partitioning changes.

    Cost model at 100 TB: replicating the smaller side ×n_salt is a
    deliberate trade — pick n_salt ≈ (hottest-key rows / target partition
    rows), keep the replicated side the smaller input.
    """
    l = left.withColumn("_salt", F.pmod(salt_on.cast("long"), F.lit(n_salt)).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l.join(r, [on, "_salt"], how).drop("_salt")
