"""Distributed model training primitives: full-batch gradient-descent
logistic regression — the quality-classifier shape every LLM-data pipeline
eventually needs (fastText/logreg quality filters à la C4/CCNet).

Execution model (the canonical distributed-GD / MLlib shape): each
iteration is ONE map-side-combined aggregate over the corpus producing a
gradient of ``n_features`` scalars; the weight update is coordinator math
on that bounded vector, and the new weights re-enter the next job as
literals.  Nothing ever shuffles more than ``n_features`` values per
partition; at 100 TB each iteration is a single scan, embarrassingly
parallel.

Cross-engine exactness (so the whole training run is DuckDB-oracle-able,
not just "close"): per-row gradient contributions are snapped to integer
1e-8 units with ``floor(x*1e8 + 0.5)`` and summed as BIGINT — an
order-independent exact sum — then one IEEE division recovers the double.
``sigmoid`` is ``1/(1+exp(-z))`` on bit-identical doubles (same libm on
this host — the same assumption the BM25 ``ln`` scorer already relies
on); weight updates are evaluated in identical textual order in the
oracle SQL (plans/mlops.py), so every weight stays bit-identical across
engines through all iterations.

Reference parity: the reference engine has no training operators; this
extends the north-star LLM-pipeline surface (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: fixed-point snap for per-row gradient/loss contributions (1e-8 units).
_UNITS = 100000000.0

#: training hyperparameters: deliberately fixed, documented constants so
#: Spark builder and oracle SQL agree by construction.
LR_LEARNING_RATE = 0.5
LR_ITERATIONS = 3


def _snap_sum(expr: Column) -> Column:
    """Order-independent exact sum of a double expression: snap each row
    to integer 1e-8 units, BIGINT-sum, divide back once."""
    units = F.floor(expr * F.lit(_UNITS) + F.lit(0.5)).cast("long")
    return F.sum(units).cast("double") / F.lit(_UNITS)


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def lr_dot(weights: list[float], xs: list[Column]) -> Column:
    """w·x in fixed textual order (w0*x0 + w1*x1 + ...) — the shared
    expression shape both the trainer and the oracle SQL use."""
    z = F.lit(weights[0]) * xs[0]
    for wi, xi in zip(weights[1:], xs[1:]):
        z = z + F.lit(wi) * xi
    return z


def logreg_fit(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    lr: float = LR_LEARNING_RATE,
    iterations: int = LR_ITERATIONS,
) -> tuple[list[float], int]:
    """The GD training loop: returns (weights incl. bias, n_rows).

    The per-iteration ``collect()`` is the inherent GD sync point (a
    ``n_features``-value row, same justified-collect class as the IVF
    coordinator probe); all per-row math is JVM whole-stage codegen.
    """
    xs = [F.lit(1.0)] + [F.col(c) for c in feature_cols]
    w = [0.0] * len(xs)
    n_rows = 0
    for _ in range(iterations):
        g = _sigmoid(lr_dot(w, xs)) - F.col(label_col)
        aggs = [_snap_sum(g * xi).alias(f"g{j}") for j, xi in enumerate(xs)]
        aggs.append(F.count(F.lit(1)).cast("long").alias("n"))
        row = features.agg(*aggs).collect()[0]
        n_rows = int(row["n"])
        w = [
            wj - lr * (float(row[f"g{j}"]) / float(n_rows))
            for j, wj in enumerate(w)
        ]
    return w, n_rows


def logreg_train(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    lr: float = LR_LEARNING_RATE,
    iterations: int = LR_ITERATIONS,
) -> DataFrame:
    """Train logistic regression by full-batch gradient descent.

    ``features`` must carry double feature columns and a 0/1 double label.
    An intercept is always included as feature 0.  Returns a single-row
    DataFrame ``(w_bias, w_<f1>, ..., log_loss, n_rows)`` built on the
    same session (no data dependency — the weights are exact scalars).
    """
    spark = features.sparkSession
    xs = [F.lit(1.0)] + [F.col(c) for c in feature_cols]
    w, n_rows = logreg_fit(features, feature_cols, label_col, lr, iterations)

    def dot(weights: list[float]) -> Column:
        return lr_dot(weights, xs)

    p = _sigmoid(dot(w))
    loss_expr = -(
        F.col(label_col) * F.log(p)
        + (F.lit(1.0) - F.col(label_col)) * F.log(F.lit(1.0) - p)
    )
    loss_row = features.agg(
        _snap_sum(loss_expr).alias("loss_sum"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).collect()[0]
    log_loss = float(loss_row["loss_sum"]) / float(loss_row["n"])

    names = ["w_bias"] + [f"w_{c}" for c in feature_cols]
    out = spark.createDataFrame(
        [tuple(w) + (log_loss, n_rows)],
        ", ".join(f"{n} double" for n in names) + ", log_loss double, n_rows long",
    )
    return out


# ---------------------------------------------------------------------------
# Skip-gram negative-sampling (word2vec) — one exact SGD step
# ---------------------------------------------------------------------------

SGNS_DIMS = 8
SGNS_LR = 0.1
#: embedding init: ((h64(word:side:dim) % 2001) - 1000) / 10000 ∈ [-0.1, 0.1]
SGNS_INIT_MOD = 2001
SGNS_INIT_DIV = 10000.0


def _sgns_init(word: Column, side: str, d: Column) -> Column:
    """Deterministic hash-based embedding init — a pure function of
    (word, side, dim), so both engines materialize identical vectors
    without any stored model."""
    from direct_spark_sql_spark.hashing import h64

    key = F.concat_ws("", word, F.lit(f":{side}:"), d.cast("string"))
    return ((h64(key) % F.lit(SGNS_INIT_MOD)) - F.lit(1000)).cast("double") / F.lit(
        SGNS_INIT_DIV
    )


def sgns_train_step(
    pairs: DataFrame, dims: int = SGNS_DIMS, lr: float = SGNS_LR
) -> DataFrame:
    """One exact skip-gram negative-sampling SGD step over weighted
    (center, context, n) pairs; returns the UPDATED center-side vectors
    as ``(word, d, new_v)`` rows.

    The word2vec shape on Spark: embeddings are hash-derived expressions
    (no model table), the per-pair negative is a deterministic hash draw
    from the vocabulary, dot products and gradients are snapped to 1e-8
    units so the per-(word, dim) gradient accumulation is an exact BIGINT
    sum, and the update is one IEEE expression — every output value is
    bit-identical to the unrolled SQL oracle (plans/mlops.py).  All
    fan-outs are pairs × dims (bounded); the only coordinator scalar is
    the vocabulary size (the same bounded class as the IVF probe).
    """
    from pyspark.sql import Window as W

    spark = pairs.sparkSession
    words = (
        pairs.select(F.col("center").alias("w"))
        .union(pairs.select(F.col("context").alias("w")))
        .distinct()
    )
    # vocabulary is bounded by 2 × the pair budget — a tiny single-
    # partition rank window, same bounded class as the RRF fusion lists
    vocab = words.select(
        "w",
        (F.row_number().over(W.orderBy("w")) - 1).cast("long").alias("rank"),
    )
    v_size = vocab.count()

    neg_rank = ml_neg_rank(F.col("center"), F.col("context"), v_size)
    p = pairs.join(
        F.broadcast(vocab.select(F.col("rank"), F.col("w").alias("neg"))),
        neg_rank == F.col("rank"),
    ).select("center", "context", "neg", "n")

    d_df = spark.range(dims).select(F.col("id").cast("int").alias("d"))
    pd_ = p.crossJoin(F.broadcast(d_df))
    u_pos = _sgns_init(F.col("context"), "u", F.col("d"))
    u_neg = _sgns_init(F.col("neg"), "u", F.col("d"))
    v_c = _sgns_init(F.col("center"), "v", F.col("d"))
    snap = lambda x: F.floor(x * F.lit(_UNITS) + F.lit(0.5)).cast("long")
    dots = pd_.groupBy("center", "context", "neg", "n").agg(
        F.sum(snap(u_pos * v_c)).alias("s_pos_units"),
        F.sum(snap(u_neg * v_c)).alias("s_neg_units"),
    )
    g_pos = _sigmoid(F.col("s_pos_units").cast("double") / F.lit(_UNITS)) - F.lit(1.0)
    g_neg = _sigmoid(F.col("s_neg_units").cast("double") / F.lit(_UNITS))
    scored = dots.select("center", "context", "neg", "n",
                         g_pos.alias("g_pos"), g_neg.alias("g_neg"))
    sd = scored.crossJoin(F.broadcast(d_df))
    contrib = (
        snap(F.col("n").cast("double") * F.col("g_pos") * u_pos)
        + snap(F.col("n").cast("double") * F.col("g_neg") * u_neg)
    )
    grads = sd.groupBy(F.col("center").alias("word"), "d").agg(
        F.sum(contrib).alias("grad_units")
    )
    v0 = _sgns_init(F.col("word"), "v", F.col("d"))
    new_v = v0 - F.lit(lr) * (F.col("grad_units").cast("double") / F.lit(_UNITS))
    return grads.select(
        "word", F.col("d").cast("long").alias("d"), new_v.alias("new_v")
    ).orderBy("word", "d")


def ml_neg_rank(center: Column, context: Column, v_size: int) -> Column:
    """Deterministic negative-sample draw: hash the pair into a vocab rank."""
    from direct_spark_sql_spark.hashing import h64

    return h64(F.concat_ws("", center, F.lit("|"), context, F.lit("|neg"))) % F.lit(
        int(v_size)
    )
