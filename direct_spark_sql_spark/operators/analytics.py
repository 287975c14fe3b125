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

    Shape (two-phase, the same hot-user guard as
    plans/conformance.py:events_user_sessions): session islands are
    built LOCALLY inside (user, hour-chunk) windows — so a bot user's
    sort is bounded by one hour of its events, never its lifetime —
    then per-fragment summaries (bounded by chunks-per-user, tiny)
    stitch across chunk edges with one small window.  In-chunk fragment
    neighbours carry a >= gap separation by construction, so the same
    lag test covers both cases; the merged session's event array is the
    sorted flatten of its fragments, identical to the single-window
    formulation's array_sort(collect_list(...)) because the struct sort
    is a total order.  One big-table exchange, one hash agg per
    fragment (map-side combined), one corpus-wide path count, bounded
    top-k.  Event order inside a session uses the encoded
    (micros, event_id mod 1024) key with event_type as the final
    tie-break (the struct sort is lexicographic), so paths stay
    deterministic even if two same-microsecond events collide on the
    key's 10 id bits.
    """
    from pyspark.sql import Window as W

    k = _epoch_us(F.col(ts_col)) * 1024 + F.pmod(F.col(id_col), F.lit(1024))
    gap_us = gap_minutes * 60 * 1_000_000
    chunk_us = 3_600 * 1_000_000  # 1 h: bounds a hot user's window sort
    # decode micros exactly with an arithmetic shift (floor division
    # even for pre-1970 negative micros, where `div` truncates toward
    # zero); float division would wobble on exact-gap edges
    wc = W.partitionBy("user", "chunk").orderBy("k")
    flagged = (
        events.select(
            F.col(user_col).alias("user"), k.alias("k"), F.col(type_col).alias("etype")
        )
        .withColumn(
            "chunk", F.floor(F.shiftright("k", 10) / F.lit(chunk_us))
        )
        .withColumn("prev_k", F.lag("k").over(wc))
        .withColumn(
            "new_local",
            (F.col("prev_k").isNull())
            | (
                (F.shiftright("k", 10) - F.shiftright("prev_k", 10))
                >= F.lit(gap_us)
            ),
        )
    )
    fragments = (
        flagged.withColumn(
            "loc_seq",
            F.sum(F.col("new_local").cast("long")).over(
                wc.rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        .groupBy("user", "chunk", "loc_seq")
        .agg(
            F.array_sort(F.collect_list(F.struct("k", "etype"))).alias("evs"),
            F.min("k").alias("kmin"),
            F.max("k").alias("kmax"),
        )
    )
    ws = W.partitionBy("user").orderBy("chunk", "loc_seq")
    prev_kmax = F.lag("kmax").over(ws)
    stitched = fragments.withColumn(
        "session_seq",
        F.sum(
            F.when(
                prev_kmax.isNull()
                | (
                    (F.shiftright("kmin", 10) - F.shiftright(prev_kmax, 10))
                    >= F.lit(gap_us)
                ),
                1,
            )
            .otherwise(0)
            .cast("long")
        ).over(ws.rowsBetween(W.unboundedPreceding, 0)),
    )
    paths = (
        stitched.groupBy("user", "session_seq")
        .agg(F.array_sort(F.flatten(F.collect_list("evs"))).alias("evs"))
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


def basket_affinity(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_baskets: int = 2,
    top_k: int = 40,
) -> DataFrame:
    """Market-basket pair affinity: support and lift for item pairs.

    Classic association-rule statistics over (basket, item) rows — the
    co-occurrence shape behind "frequently bought together" and feature
    co-occurrence mining.  For every unordered item pair (a < b):

        support = n(a,b) / N           lift = n(a,b) * N / (n(a) * n(b))

    with N = distinct baskets.  All counts are exact BIGINTs; support and
    lift are single IEEE expressions over those counts, so both engines
    produce bit-identical doubles.

    Scale posture (round-13 shape): ONE shuffle keyed by basket_col builds
    the per-basket distinct-item set (``collect_set`` dedups map-side, so
    the exchange moves distinct pairs, not raw rows), and every downstream
    statistic derives from that single aggregate — unordered pairs expand
    *inside the row* (sorted set + nested ``transform``, the covariance
    pattern), item counts are one explode + bounded-key agg, the total is a
    1-row count.  This replaces the previous distinct + self-equi-join on
    basket_col: same exact BIGINT counts (the set expansion enumerates
    exactly the a.item < b.item join matches), minus the join's second
    shuffle and sort.  Per-basket expansion stays bounded by the distinct-
    item count per basket — identical to the join's per-key blowup — and
    the pair/item aggregates are bounded by the item vocabulary.  No
    all-pairs product anywhere.
    """
    # Round-13 (guide §7.2): the per-basket set aggregate below feeds FOUR
    # subtrees (pair expansion, both item-count broadcast sides, the
    # 1-row total), and each used to re-run the collect_set shuffle from
    # the raw rows.  Eagerly localCheckpoint the narrow (basket, sorted
    # item set) frame — the minhash/bm25 precedent — so the shuffle runs
    # once; the bounded item-count agg is likewise checkpointed so the two
    # broadcast sides share it.  Lineage-only: same rows, same values.
    arr = baskets.groupBy(F.col(basket_col).alias("bk")).agg(
        F.array_sort(F.collect_set(F.col(item_col))).alias("xs")
    ).localCheckpoint()
    n = F.size("xs")
    # null basket keys: the old self-join (a.bk = b.bk) never matched NULL,
    # so the NULL-key group contributes items but no pairs — keep that.
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n - F.lit(2)),
            lambda i: F.transform(
                F.sequence(i + F.lit(1), n - F.lit(1)),
                lambda j: F.struct(
                    F.get("xs", i.cast("int")).alias("item_a"),
                    F.get("xs", j.cast("int")).alias("item_b"),
                ),
            ),
        )
    )
    pair_counts = (
        arr.filter(F.col("bk").isNotNull() & (n >= 2))
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.item_a").alias("item_a"), F.col("p.item_b").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("pair_baskets"))
        .filter(F.col("pair_baskets") >= min_pair_baskets)
    )
    item_counts = (
        arr.select(F.explode("xs").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("item_baskets"))
        .localCheckpoint()
    )
    total = arr.agg(F.count(F.col("bk")).cast("long").alias("n_baskets"))
    ia = item_counts.alias("ia")
    ib = item_counts.alias("ib")
    joined = (
        pair_counts.join(F.broadcast(ia), F.col("item_a") == F.col("ia.item"))
        .join(F.broadcast(ib), F.col("item_b") == F.col("ib.item"))
        .crossJoin(F.broadcast(total))
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        joined.select(
            "item_a",
            "item_b",
            "pair_baskets",
            (dbl("pair_baskets") / dbl("n_baskets")).alias("support"),
            (
                dbl("pair_baskets") * dbl("n_baskets")
                / (dbl("ia.item_baskets") * dbl("ib.item_baskets"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
        .limit(top_k)
    )


#: fixed-point snap for PSI contributions (1e-8 units held as BIGINT so the
#: cross-bin total is an exact integer sum — order-independent)
PSI_SNAP = 100_000_000.0


def psi_drift(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    bin_col: str = "bin",
    count_col: str = "n",
) -> DataFrame:
    """Population-stability-index drift between two binned distributions.

    The standard training-data drift monitor: given per-bin counts for a
    reference slice and a current slice, computes Laplace-smoothed
    proportions and the per-bin PSI contribution

        (p_cur - p_ref) * ln(p_cur / p_ref)    (always >= 0)

    snapped to 1e-8 units as a BIGINT (ln() is not guaranteed identically
    rounded across libms, so the snap is the cross-engine contract), plus
    the distribution-wide PSI total as an exact integer sum of the snapped
    units.  PSI > 0.2 is the conventional "investigate" threshold.

    Scale posture: inputs are already bin-cardinality aggregates (the
    callers reduce raw rows map-side); everything here is a bounded
    full-outer join on bin id plus two 1-row broadcast totals.
    """
    r = ref_counts.select(F.col(bin_col).alias("bin"), F.col(count_col).alias("n_ref"))
    c = cur_counts.select(F.col(bin_col).alias("bin"), F.col(count_col).alias("n_cur"))
    merged = (
        r.join(c, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce(F.col("n_ref"), F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    return psi_from_merged(merged)


def psi_from_merged(merged: DataFrame) -> DataFrame:
    """PSI tail over an already-merged ``(bin, n_ref, n_cur)`` frame.

    Split out of :func:`psi_drift` (r13) so a caller whose two slices come
    from ONE source can build the merged frame in a single pass
    (conditional counts in one groupBy) instead of scanning the source
    twice and full-outer-joining — identical BIGINT inputs, identical
    arithmetic, one corpus scan instead of two.
    """
    tot = merged.agg(
        F.sum("n_ref").cast("long").alias("tot_ref"),
        F.sum("n_cur").cast("long").alias("tot_cur"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
    )
    m = merged.crossJoin(F.broadcast(tot))
    # Laplace-smoothed proportions: (n + 1) / (tot + n_bins); exact-long
    # numerators/denominators so the doubles agree bit-for-bit.
    p_ref = (F.col("n_ref").cast("double") + F.lit(1.0)) / (
        F.col("tot_ref").cast("double") + F.col("n_bins").cast("double")
    )
    p_cur = (F.col("n_cur").cast("double") + F.lit(1.0)) / (
        F.col("tot_cur").cast("double") + F.col("n_bins").cast("double")
    )
    units = F.floor((p_cur - p_ref) * F.log(p_cur / p_ref) * F.lit(PSI_SNAP) + F.lit(0.5)).cast(
        "long"
    )
    w_all = Window.partitionBy()
    return (
        m.select(
            "bin",
            "n_ref",
            "n_cur",
            units.alias("psi_units"),
        )
        .select(
            "bin",
            "n_ref",
            "n_cur",
            (F.col("psi_units").cast("double") / F.lit(PSI_SNAP)).alias("psi_contrib"),
            (F.sum("psi_units").over(w_all).cast("double") / F.lit(PSI_SNAP)).alias("psi_total"),
        )
        .orderBy("bin")
    )
