"""Change-data-capture operators: latest-wins upsert (MERGE INTO
semantics) and SCD-2 history materialization.

The lakehouse write path a training-data pipeline needs when the corpus is
maintained incrementally: a base snapshot plus a changeset of
inserts/updates/deletes keyed by primary key and ordered by a change
sequence number.

Shape at scale: one union (no shuffle) + one hash-shuffle on the key for
the per-key latest-version window — the same single-shuffle cost as the
join-based MERGE rewrite, but expressible without a mutable table format.
AQE handles key skew; there is no driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "change_seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Latest-wins MERGE: apply a keyed changeset to a snapshot.

    ``changes`` must carry the same payload columns as ``base`` plus
    ``op_col`` (e.g. 'U'/'D'/'I') and ``seq_col`` (monotone per key; every
    change outranks the base row).  Deleted keys drop out; the highest
    sequence number wins per key.
    """
    base_tagged = base.withColumn(op_col, F.lit("B")).withColumn(
        seq_col, F.lit(0).cast("long")
    )
    combined = base_tagged.unionByName(changes)
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    return (
        combined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("_rn", op_col, seq_col)
    )


def scd2_history(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "change_seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: every non-delete version
    of every key with its validity interval in sequence space.

    Output adds ``valid_from`` (the version's own sequence), ``valid_to``
    (the next version's sequence, NULL while current) and ``is_current``
    (open interval and not superseded by a delete).  One shuffle on the
    key, same as :func:`apply_cdc`.
    """
    base_tagged = base.withColumn(op_col, F.lit("B")).withColumn(
        seq_col, F.lit(0).cast("long")
    )
    combined = base_tagged.unionByName(changes)
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).asc())
    hist = combined.withColumn("valid_to", F.lead(seq_col).over(w)).withColumn(
        "valid_from", F.col(seq_col)
    )
    return (
        hist.filter(F.col(op_col) != delete_op)
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(op_col, seq_col)
    )


def merge_rollups(
    rollups: Sequence[DataFrame],
    key_cols: Sequence[str],
    measure_casts: dict[str, str],
) -> DataFrame:
    """Algebraic materialized-view maintenance: combine pre-aggregated
    rollups (a materialized base plus one or more delta batches) into the
    rollup of their union WITHOUT rescanning the base fact table.

    Works for any algebraic measure (counts, sums — incl. exact-decimal
    sums, whose addition is associative): merging partials is just
    re-aggregating them.  ``measure_casts`` maps each measure column to
    the type it's cast back to after the merge (summing widens decimals).

    Shape at scale: the delta is aggregated upstream at O(|delta|); this
    merge shuffles only O(|rollup keys|) rows — the whole point versus a
    full recompute.  Incremental refresh of a 100 TB fact's daily rollup
    costs one small shuffle per batch.
    """
    if not rollups:
        raise ValueError("need at least one rollup")
    combined = rollups[0]
    for r in rollups[1:]:
        combined = combined.unionByName(r)
    return combined.groupBy(*key_cols).agg(
        *[F.sum(c).cast(t).alias(c) for c, t in measure_casts.items()]
    )
