"""Training-sequence packing: concatenate a document corpus (in a
deterministic order) and chunk it into fixed-length training sequences —
the GPT-style concat-then-chunk packing step between curation and
tokenizer output.

The core primitive is a **distributed prefix sum**.  A naive global
running total (`Window.orderBy(...)` with no partition key) collapses to
ONE partition — the classic Spark scale trap.  The scale-correct shape:

1. range-repartition by the order key (partition i holds strictly
   smaller keys than partition i+1) and sort within partitions;
2. per-partition running totals (a window keyed by the partition id —
   parallel across partitions);
3. per-partition totals are a tiny aggregate, collected and turned into
   cumulative offsets broadcast back — O(#partitions) driver data, never
   row data;
4. each row's global prefix = partition offset + local running total.

Every step is deterministic, so the packing is reproducible run-to-run
and engine-to-engine (the oracle uses a plain SQL window cumsum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def token_prefix_sums(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    partitions: int = 8,
) -> DataFrame:
    """Adds ``start_tok``/``end_tok``: the exclusive/inclusive global
    prefix sums of ``weight_col`` in ``order_col`` order, computed with
    the distributed prefix-sum shape above (no single-partition window)."""
    parted = df.repartitionByRange(partitions, order_col).sortWithinPartitions(
        order_col
    )
    with_pid = parted.withColumn("__pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = with_pid.withColumn("__local_cum", F.sum(weight_col).over(w_local))
    # tiny per-partition totals -> cumulative offsets, broadcast back.
    # rangepartitioning guarantees pid order == key order.
    totals = (
        local.groupBy("__pid")
        .agg(F.max("__local_cum").alias("__ptotal"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__ptotal").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    return (
        local.join(F.broadcast(totals), "__pid")
        .withColumn("end_tok", (F.col("__local_cum") + F.col("__offset")).cast("long"))
        .withColumn("start_tok", (F.col("end_tok") - F.col(weight_col)).cast("long"))
        .drop("__pid", "__local_cum", "__offset")
    )


def pack_sequences(
    docs_with_tokens: DataFrame,
    seq_len: int,
    order_col: str = "doc_id",
    weight_col: str = "n_tokens",
) -> DataFrame:
    """Assign each document's token span to the fixed-length training
    sequences it overlaps (documents may straddle a boundary — the
    concat-then-chunk model).  Output one row per (sequence, doc)
    contribution: (seq_id, doc, tokens contributed, is_head).

    Shape: prefix sums (above) + a bounded explode — a document spans
    ``ceil(n/L) + 1`` sequences at most — then the caller aggregates
    per sequence.  No shuffle beyond the prefix sum's range partition
    and the final aggregation.
    """
    spans = token_prefix_sums(docs_with_tokens, order_col, weight_col)
    first_seq = (F.col("start_tok") / seq_len).cast("long")
    last_seq = ((F.col("end_tok") - 1) / seq_len).cast("long")
    exploded = spans.filter(F.col(weight_col) > 0).select(
        order_col,
        "start_tok",
        "end_tok",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * seq_len
    contributed = F.least(F.col("end_tok"), seq_start + seq_len) - F.greatest(
        F.col("start_tok"), seq_start
    )
    return exploded.select(
        "seq_id",
        order_col,
        contributed.cast("long").alias("n_contributed"),
        (F.col("start_tok") >= seq_start).alias("is_head"),
    )
