"""Distributed quality-classifier training: full-batch logistic
regression by gradient descent, the model-free stand-in for the
fastText/linear quality filters production curation pipelines train
(GPT-3 / CCNet style: label a reference domain positive, the crawl
negative, keep crawl documents the classifier scores as
reference-like).

Reference parity: none — the reference (yohplala/oups) has no ML
operators; this belongs to the beyond-reference LLM-pipeline layer.

Scale posture (the same shape as ``kmeans_lloyd``): model state is
``dim + 1`` floats on the driver, broadcast into each epoch's plan as
a LITERAL weight vector; one epoch = one map-side sigmoid/residual
projection plus ONE partial-combined hash aggregation whose shuffle
carries at most ``(dim + 1) × n_partitions`` cells regardless of
corpus size. The corpus is scanned once per epoch from a persisted
materialization and is never re-partitioned; nothing row-shaped
reaches the driver.

Cross-engine determinism (for the unrolled DuckDB oracle): weights
init at exactly zero; the per-row residual and every updated weight
cell are rounded to ``decimals`` (``round(x * 10^d) / 10^d`` — the
same IEEE sequence in Spark and DuckDB, see ``kmeans_lloyd``), so
``exp()`` ulp differences and gradient-average summation order cannot
accumulate across epochs; dot products fold products in index order
with the bias riding as a trailing constant-1 feature, matching the
oracle's ``list_sum(list_transform(...))`` evaluation. Weight updates
are rounded INSIDE the Spark aggregation (``F.round(x * 10^d) / 10^d``
on the agg output — the ``kmeans_lloyd`` idiom) rather than by
Python's ``round`` on the driver: Python rounds half-to-even while
Spark and DuckDB round half-away-from-zero, so a driver-side round
could diverge on exact .5 ties.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from oups_spark.operators.similarity import lit_vec


def _logit(vec_col: Column, weights: list[float]) -> Column:
    """w·[x, 1] as an index-ordered fold (bias = trailing weight)."""
    xa = F.concat(vec_col.cast("array<double>"), F.array(F.lit(1.0)))
    return F.aggregate(
        F.zip_with(xa, lit_vec(weights), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _round_fixed(col: Column, decimals: int) -> Column:
    """round(x * 10^d) / 10^d — bit-identical to DuckDB's same
    formula (F.round's BigDecimal path can differ by one ulp)."""
    factor = F.lit(float(10**decimals))
    return F.round(col * factor) / factor


def logreg_train_gd(
    df: DataFrame,
    *,
    vec_col: str = "features",
    label_col: str = "label",
    lr: float = 0.5,
    epochs: int = 4,
    decimals: int = 6,
    dim: int | None = None,
    materialize: str | None = "persist",
) -> list[float]:
    """Train logistic regression ``P(y=1 | x) = sigmoid(w·x + b)`` by
    full-batch gradient descent; returns ``dim + 1`` weights (bias
    last).

    Full-batch (not stochastic) is the deliberate choice: one
    deterministic bounded-shuffle aggregation per epoch, no sampling
    state, and an independent engine can replay the exact trajectory
    (see module docstring). Per epoch:

    1. map-side: ``r = round(sigmoid(w·[x,1]) - y, decimals)`` — a
       literal-weight expression inside whole-stage codegen;
    2. ``posexplode`` the bias-augmented vector and per dimension
       take ``sum(round(r·x_d·10^d)) / (10^d·n)`` — the gradient as
       an integer-grid sum, exactly order-independent (integer-valued
       doubles add exactly up to 2^53 ≈ 10^(15-d) unit-scale rows),
       where a plain ``avg`` would depend on partial-merge order;
       partial-combined map-side, so the shuffle is
       ``(dim+1) × n_partitions`` cells and exactly ``dim + 1``
       updated weights reach the driver;
    3. still JVM-side, on the agg output: ``w_d <- round((w_d -
       lr * g_d) * 10^d) / 10^d`` with the current ``w_d`` looked up
       from a literal weight vector — Spark's half-away ``round``
       matches DuckDB's exactly (see module docstring).

    ``lr`` should be exactly binary-representable (0.5, 0.25, ...)
    so ``lr * g`` is the same single IEEE multiply in both engines.

    ``materialize='persist'`` (default) caches the input
    MEMORY_AND_DISK once — callers usually pass a derived
    featurization that would otherwise re-run its corpus scan every
    epoch; lineage is kept so executor loss recomputes instead of
    failing (pass ``None`` when the caller already materialized).
    """
    if materialize == "persist":
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    elif materialize is not None:
        raise ValueError(
            f"materialize must be 'persist' or None, got {materialize!r}"
        )
    try:
        return _train_loop(
            df, vec_col, label_col, lr, epochs, decimals, dim
        )
    finally:
        # the final epoch's collect is the last job touching df —
        # release the cache here or every training run in a long
        # session leaks a CacheManager entry
        if materialize == "persist":
            df.unpersist()


def _train_loop(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    lr: float,
    epochs: int,
    decimals: int,
    dim: int | None,
) -> list[float]:
    if dim is None:
        # one limit(1) probe job; callers that know the feature width
        # pass dim= to skip it
        dim = df.select(F.size(F.col(vec_col)).alias("n")).limit(1).collect()[
            0
        ]["n"]
    w = [0.0] * (dim + 1)
    xa = F.concat(
        F.col(vec_col).cast("array<double>"), F.array(F.lit(1.0))
    )
    factor = F.lit(float(10**decimals))
    for _ in range(epochs):
        r = _round_fixed(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit(F.col(vec_col), w)))
            - F.col(label_col).cast("double"),
            decimals,
        )
        # updated weight computed on the agg output (still JVM-side):
        # round((w_d - lr * avg(r * x_d)) * 10^d) / 10^d — the driver
        # only receives the dim+1 already-rounded weights
        upd = (
            F.round(
                (
                    F.element_at(lit_vec(w), F.col("d") + 1)
                    - F.lit(lr) * F.col("g")
                )
                * factor
            )
            / factor
        )
        # residual in its OWN projection below the explode: fusing it
        # into the posexplode select makes Catalyst emit the sigmoid
        # fold in the Project ABOVE the Generate — i.e. once per
        # exploded element, (dim+1)x the work (caught by
        # tests/test_plans.py::test_classifier_epoch_agg_is_partial_combined)
        pre = df.select(r.alias("__r"), xa.alias("__xa"))
        # gradient as an EXACTLY order-independent aggregate: each
        # product is quantized to an integer grid (round(r·x·10^d) —
        # integer-valued doubles sum exactly in any order up to 2^53,
        # i.e. ~10^(15-d) rows of unit-scale features), then one
        # correctly-rounded division by (10^d · n). A plain avg() of
        # doubles depends on partial-merge order, and the 6-dp update
        # rounding cannot pin values that land on a rounding boundary
        # (hypothesis found such a case — test_logreg_twin_property).
        rows = (
            pre.select("__r", F.posexplode(F.col("__xa")).alias("d", "x"))
            .groupBy("d")
            .agg(
                F.sum(
                    F.round(F.col("__r") * F.col("x") * factor)
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                F.col("d"),
                (F.col("s") / (factor * F.col("n"))).alias("g"),
            )
            .select(F.col("d"), upd.alias("w"))
            .collect()
        )
        new_w = {row["d"]: row["w"] for row in rows}
        w = [new_w[d] for d in range(dim + 1)]
    return w


def logreg_score(
    df: DataFrame,
    weights: list[float],
    *,
    vec_col: str = "features",
    out_col: str = "score",
    decimals: int = 6,
) -> DataFrame:
    """Append ``sigmoid(w·[x,1])`` rounded to ``decimals`` — pure
    map-side literal-weight scoring, zero shuffle: the deployment
    half of the classifier (train once, score every corpus shard
    embarrassingly parallel)."""
    return df.withColumn(
        out_col,
        _round_fixed(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit(F.col(vec_col), weights))),
            decimals,
        ),
    )


def logreg_train_np(
    X,
    y,
    *,
    lr: float = 0.5,
    epochs: int = 4,
    decimals: int = 6,
) -> list[float]:
    """Sequential numpy twin of :func:`logreg_train_gd`: same
    zero-init, same index-order dot with trailing bias, same rounded
    residual, same half-away-from-zero rounded weight update (Spark's
    scale-0 ``F.round``; ``np.round``/Python ``round`` are
    half-to-even and would diverge on exact ties). Used by tests to
    pin the distributed trajectory bit-for-bit."""
    import math

    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, dim = X.shape
    xa = np.concatenate([X, np.ones((n, 1))], axis=1)
    fac = 10.0**decimals

    def rnd(v: float) -> float:
        return math.copysign(math.floor(abs(v) * fac + 0.5), v) / fac

    w = [0.0] * (dim + 1)
    for _ in range(epochs):
        r = np.empty(n)
        for i in range(n):
            # left-to-right fold, matching F.aggregate / list_sum
            acc = 0.0
            for d in range(dim + 1):
                acc += xa[i, d] * w[d]
            r[i] = rnd(1.0 / (1.0 + math.exp(-acc)) - y[i])
        # same order-independent integer-grid gradient as the Spark
        # path: sum of round(r·x·10^d) is exact, one final division
        w_new = []
        for d in range(dim + 1):
            s = 0.0
            for i in range(n):
                v = r[i] * xa[i, d] * fac
                s += math.copysign(math.floor(abs(v) + 0.5), v)
            g = s / (fac * n)
            w_new.append(rnd(w[d] - lr * g))
        w = w_new
    return w
