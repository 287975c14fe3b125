"""Event-analytics operators: ordered funnels and cohort retention.

The classic product-analytics pair a warehouse engine is expected to
answer over an event stream, expressed in the engine's scale discipline:

- **Funnel**: per user, greedy earliest traversal of an ordered stage
  sequence (signup → view → click → purchase).  The naive formulation is
  k-1 self-joins on ``ts > prev_ts`` — k shuffles and a skew trap.  Here
  each user's qualifying events collapse to ONE ``collect_list`` of
  encoded longs (map-side combined, bounded by events-per-user), and a
  single ``aggregate`` higher-order walk over the sorted array runs the
  stage machine.  One shuffle total, no join.
- **Retention**: users bucketed by first-seen week (the cohort), counted
  by distinct activity in each subsequent week offset.  One window pass
  for the first-seen timestamp (shuffle by user), one hash aggregation.

Cross-engine determinism: events are totally ordered by an encoded
``epoch_micros * 8 + stage_rank`` BIGINT key, so the greedy walk has no
timestamp ties and matches the oracle's chained strict-min formulation
exactly; retention arithmetic is integer division on epoch micros.

Reference parity note: the reference engine (direct-spark-sql) has no
event-analytics operators; these extend the surface (SURVEY.md
north-star extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Microseconds in one week (retention bucket width).
WEEK_US = 7 * 24 * 3600 * 1_000_000


def _epoch_us(col: Column) -> Column:
    """NTZ-safe epoch micros (session TZ is pinned UTC, so the cast is an
    identity on the stored micros — see operators/joins.py:_epoch_us)."""
    return F.unix_micros(col.cast("timestamp"))


def funnel_counts(
    events: DataFrame,
    stages: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Users reaching each stage of an ordered funnel, greedy-earliest.

    A user "reaches" stage i when events matching stages[0..i] occur in
    order (strictly increasing encoded time).  Output: one row per stage —
    (stage_idx 1-based, stage_name, n_users) — including zero-user stages.
    """
    if len(stages) > 8:
        raise ValueError("at most 8 stages (rank packs into 3 bits)")
    stage_arr = F.array(*[F.lit(s) for s in stages])
    # encode (time, stage-rank) into one BIGINT: total order, no ties
    rank = F.array_position(stage_arr, F.col(type_col)) - 1
    k = _epoch_us(F.col(ts_col)) * 8 + rank

    per_user = (
        events.where(F.col(type_col).isin(*stages))
        .select(F.col(user_col).alias("user"), k.alias("k"))
        .groupBy("user")
        .agg(F.array_sort(F.collect_list("k")).alias("ks"))
    )
    # stage machine: advance when the element's rank is the next needed stage
    n = len(stages)
    reached = per_user.select(
        "user",
        F.aggregate(
            "ks",
            F.lit(0),
            lambda acc, kk: F.when(
                (acc < F.lit(n)) & (F.pmod(kk, F.lit(8)) == acc), acc + F.lit(1)
            ).otherwise(acc),
        ).alias("stage"),
    )
    counts = (
        # stage >= 1 filter is load-bearing: sequence(1, 0) is DESCENDING
        # [1, 0] in Spark, which would count stage-0 users as reaching
        # stage 1
        reached.filter(F.col("stage") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("stage"))).alias("stage_idx"))
        .groupBy("stage_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    spark = events.sparkSession
    stages_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(stages)], "stage_idx INT, stage_name STRING"
    )
    return (
        stages_df.join(counts, "stage_idx", "left")
        .select(
            F.col("stage_idx").cast("long").alias("stage_idx"),
            "stage_name",
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
        )
        .orderBy("stage_idx")
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    top_k: int = 15,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top event-type paths per session — the flow-analysis query behind
    "what do users actually do": sessionize by inactivity gap, render each
    session as its ordered event-type sequence, count identical paths.

    Shape: one shuffle by user for the session islands (lag + running
    flag-sum windows), one hash agg per session collecting the encoded
    events (map-side combined), one corpus-wide path count, bounded
    top-k.  Event order inside a session uses the encoded
    (micros, event_id mod 1024) key with event_type as the final
    tie-break (the struct sort is lexicographic), so paths stay
    deterministic even if two same-microsecond events collide on the
    key's 10 id bits.
    """
    from pyspark.sql import Window as W

    k = _epoch_us(F.col(ts_col)) * 1024 + F.pmod(F.col(id_col), F.lit(1024))
    gap_us = gap_minutes * 60 * 1_000_000
    w_user = W.partitionBy("user").orderBy("k")
    flagged = (
        events.select(
            F.col(user_col).alias("user"), k.alias("k"), F.col(type_col).alias("etype")
        )
        .withColumn("prev_k", F.lag("k").over(w_user))
        .withColumn(
            "new_session",
            # decode micros exactly with an arithmetic shift (floor
            # division even for pre-1970 negative micros, where `div`
            # truncates toward zero); float division would wobble on
            # exact-gap edges
            (F.col("prev_k").isNull())
            | (
                (F.shiftright("k", 10) - F.shiftright("prev_k", 10))
                >= F.lit(gap_us)
            ),
        )
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum(F.col("new_session").cast("long")).over(
            w_user.rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    paths = (
        sessions.groupBy("user", "session_seq")
        .agg(F.array_sort(F.collect_list(F.struct("k", "etype"))).alias("evs"))
        .select(
            F.array_join(
                F.transform("evs", lambda e: e["etype"]), ">"
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(top_k)
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix.

    Cohort = ISO week (Monday-truncated date) of the user's first event;
    week_offset = whole weeks elapsed since that first event.  Output:
    (cohort_week, week_offset, n_users, retention_pct) where
    retention_pct is relative to the cohort's week-0 distinct users.
    """
    w_user = Window.partitionBy(user_col)
    first_ts = F.min(ts_col).over(w_user)
    base = events.select(
        F.col(user_col).alias("user"),
        F.date_trunc("week", first_ts).cast("date").alias("cohort_week"),
        ((_epoch_us(F.col(ts_col)) - _epoch_us(first_ts)) / WEEK_US)
        .cast("long")
        .alias("week_offset"),
    )
    agg = base.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user").cast("long").alias("n_users")
    )
    w_cohort = Window.partitionBy("cohort_week")
    cohort_size = F.max(F.when(F.col("week_offset") == 0, F.col("n_users"))).over(w_cohort)
    return agg.select(
        "cohort_week",
        "week_offset",
        "n_users",
        (F.col("n_users").cast("double") * F.lit(100.0) / cohort_size.cast("double")).alias(
            "retention_pct"
        ),
    ).orderBy("cohort_week", "week_offset")
