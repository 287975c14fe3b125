"""Training-sequence packing: concatenate a document corpus (in a
deterministic order) and chunk it into fixed-length training sequences —
the GPT-style concat-then-chunk packing step between curation and
tokenizer output.

The core primitive is a **distributed prefix sum**.  A naive global
running total (`Window.orderBy(...)` with no partition key) collapses to
ONE partition — the classic Spark scale trap.  The scale-correct shape:

1. assign each row a *data-derived* range-bucket id (split points are
   sampled once, driver-side, and inlined as literals — the bucket is a
   pure function of the order key, so any stage recompute or lost
   exchange reuse re-derives identical buckets; round-2 advice flagged
   the previous ``spark_partition_id()`` shape for tying correctness to
   physical partition placement);
2. per-bucket running totals (a window keyed by the bucket id —
   parallel across buckets);
3. per-bucket totals are a tiny aggregate, turned into cumulative
   offsets broadcast back — O(#buckets) driver data, never row data;
4. each row's global prefix = bucket offset + local running total.

Every step is deterministic, so the packing is reproducible run-to-run
and engine-to-engine (the oracle uses a plain SQL window cumsum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _range_bucket(df: DataFrame, order_col: str, partitions: int) -> Column:
    """A deterministic range-bucket id for ``order_col``: 0..n-1, bucket
    boundaries non-decreasing in key order.  Split points come from one
    seeded-sample job (bounded: ~64 values per target bucket) and are
    baked into the expression as literals, so the mapping key→bucket is
    stable across jobs, retries, and plan re-executions."""
    n = max(1, int(partitions))
    if n == 1:
        return F.lit(0)
    target = n * 64
    cnt = df.count()
    if cnt == 0:
        return F.lit(0)
    fraction = min(1.0, target / cnt)
    sampled = sorted(
        r[0]
        for r in df.select(order_col).sample(fraction=fraction, seed=42).collect()
        if r[0] is not None
    )
    if not sampled:
        return F.lit(0)
    # n-1 evenly spaced split points; dedup keeps buckets monotone.
    raw = [sampled[(len(sampled) * i) // n] for i in range(1, n)]
    splits = sorted(set(raw))
    bucket: Column = F.lit(0)
    for b in splits:
        bucket = bucket + F.when(F.col(order_col) >= F.lit(b), 1).otherwise(0)
    return bucket


def token_prefix_sums(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    partitions: int = 8,
) -> DataFrame:
    """Adds ``start_tok``/``end_tok``: the exclusive/inclusive global
    prefix sums of ``weight_col`` in ``order_col`` order, computed with
    the distributed prefix-sum shape above (no single-partition window)."""
    with_pid = df.withColumn("__pid", _range_bucket(df, order_col, partitions))
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = with_pid.withColumn("__local_cum", F.sum(weight_col).over(w_local))
    # tiny per-bucket totals -> cumulative offsets, broadcast back.
    # bucket ids are non-decreasing in key order by construction.
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


def global_shuffle_shards(
    df: DataFrame,
    key_col: str,
    shard_size: int,
    partitions: int = 8,
) -> DataFrame:
    """Deterministic global corpus shuffle + fixed-size shard assignment —
    the last-mile step that turns a curated corpus into training shards:
    rows are permuted by a keyed hash (reproducible run-to-run and
    engine-to-engine), globally ranked in hash order, and cut into
    consecutive ``shard_size``-row shards.

    Adds ``shuffle_key`` (the 60-bit hash), ``rank`` (1-based global
    position in the shuffled order), and ``shard_id``.

    100 TB shape: the rank is the distributed prefix sum above (TeraSort-
    style data-derived range buckets — never a single-partition window),
    so the only row-data shuffle is one range partition; shard assignment
    is then a pure per-row expression.  A ``hash|key`` composite gives a
    total order even under (astronomically unlikely) 60-bit hash
    collisions, keeping the permutation exactly reproducible: the
    tie-break compares the key's STRING form lexicographically — a
    deterministic total order for ANY key type with distinct string
    forms (a permutation needs determinism, not numeric order; a numeric
    ``%019d`` rendering would invert negative keys and collapse
    non-numeric ones to ``null``).  Oracles replicating the permutation
    must tie-break on ``CAST(key AS VARCHAR)`` the same way.
    """
    from direct_spark_sql_spark.hashing import h64

    keyed = df.withColumn("shuffle_key", h64(F.col(key_col)))
    ordered = keyed.withColumn(
        "__ord",
        F.format_string(
            "%019d|%s",
            F.col("shuffle_key"),
            F.coalesce(F.col(key_col).cast("string"), F.lit("")),
        ),
    ).withColumn("__one", F.lit(1))
    ranked = token_prefix_sums(ordered, "__ord", "__one", partitions)
    return (
        ranked.withColumn("rank", F.col("end_tok").cast("long"))
        .withColumn(
            "shard_id", F.expr(f"CAST((rank - 1) DIV {int(shard_size)} AS BIGINT)")
        )
        .drop("__ord", "__one", "start_tok", "end_tok")
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


def pack_bins_harmonic(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    capacity: int = 512,
    k_max: int = 8,
    partitions: int = 8,
) -> DataFrame:
    """Whole-document bin packing into fixed-capacity training contexts —
    the padding-free-batching step for pipelines that do NOT split
    documents across sequences (instruction tuning, long-context SFT),
    the sibling of :func:`pack_sequences`' concat-then-chunk model.

    Uses the HARMONIC packing rule (Lee & Lee, JACM 1985): an item of
    size s in (C/(k+1), C/k] belongs to class k and bins of class k hold
    exactly k items — k items of size <= C/k always fit, the waste is
    bounded (asymptotic ratio ~1.69x optimal), and unlike first-fit the
    assignment is a CLOSED FORM over (class, rank): no sequential bin
    state, so it distributes and an oracle can replay it with one
    ROW_NUMBER per class.  class_k = min(k_max, C div s); items larger
    than C are class 0 (one per bin, ``oversize`` = true — upstream
    chunking's job, flagged not dropped); items of size <= C/k_max pool
    into class k_max.

    100 TB shape: ONE distributed prefix-sum rank over the composite
    (class, id) order (token_prefix_sums' TeraSort-style range buckets —
    never a per-class single-partition window; a class here holds a
    corpus-scale fraction of all documents, exactly the hot-partition
    trap), then per-class rank = global rank − class offset where the
    offsets are a <= k_max+1-row broadcast.  Bin assignment is a pure
    per-row expression after that.

    Returns (id, token_col, class_k, bin_index, oversize) — bin_index is
    0-based within the class; (class_k, bin_index) is the global bin key.
    ``id_col`` must render zero-padded (non-negative ints), matching the
    shuffle-shard oracle discipline.

    Envelope (ADVICE r12): documents with ``n_tokens < 1`` are DROPPED —
    an empty document occupies no context slots, so it has no bin; unlike
    oversize docs (flagged, kept) they do not appear in the output, and a
    caller accounting for every input should diff ids against the input.
    ``k_max`` must be <= 99: the composite rank key renders the class as
    two digits ('%02d'), so a wider class id would sort wrongly — enforced
    loudly below rather than left as a silent edge.  Class division is
    integer DIV (exactly DuckDB's '//'), not floored double division."""
    if not (1 <= int(k_max) <= 99):
        raise ValueError(
            f"pack_bins_harmonic: k_max must be in [1, 99] (the '%02d' rank "
            f"key renders two class digits); got {k_max}"
        )
    cls = (
        F.when(F.col(token_col) > capacity, F.lit(0))
        .otherwise(
            F.least(
                F.lit(int(k_max)),
                F.expr(f"CAST({int(capacity)} AS BIGINT) DIV {token_col}"),
            )
        )
        .cast("int")
    )
    base = df.filter(F.col(token_col) >= 1).select(
        F.col(id_col), F.col(token_col).cast("long").alias(token_col)
    ).withColumn("class_k", cls)
    ordered = base.withColumn(
        "__ord", F.format_string("%02d|%019d", F.col("class_k"), F.col(id_col))
    ).withColumn("__one", F.lit(1))
    ranked = token_prefix_sums(ordered, "__ord", "__one", partitions)
    # class offsets from BASE, not from ranked: the counts are identical
    # (rank is a permutation within each class) and reading base keeps
    # the expensive prefix-sum window out of this tiny side branch —
    # the canonical_min_rows lesson (don't execute a heavy subtree twice
    # when a cheap projection answers the same question).
    offsets = (
        base.groupBy("class_k")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__class_off",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("class_k").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("class_k", "__class_off")
    )
    per_bin = F.when(F.col("class_k") == 0, F.lit(1)).otherwise(F.col("class_k"))
    return (
        ranked.join(F.broadcast(offsets), "class_k")
        .withColumn("__crank", F.col("end_tok") - F.col("__class_off"))
        .select(
            id_col,
            token_col,
            "class_k",
            F.floor((F.col("__crank") - F.lit(1)) / per_bin)
            .cast("long")
            .alias("bin_index"),
            (F.col("class_k") == 0).alias("oversize"),
        )
    )
