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
