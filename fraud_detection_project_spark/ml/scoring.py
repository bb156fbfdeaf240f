"""Batch model scoring and leakage-safe target encoding.

The reference emits train matrices (`transform_data.py:150-161`) and
stops; this module adds the serving side — applying a fitted linear /
logistic model to a DataFrame — and the leakage-safe cousin of the
target encoder used during feature engineering.

- ``score_linear``       w·x + b over an ``array<float>`` column, with
                         optional logistic link — a pure columnar
                         expression (functions/vectors.py:dot), no UDF
- ``loo_target_encode``  leave-one-out target encoding
                         ``(Σ_group y − y) / (n_group − 1)``

Scale design
------------
``score_linear`` broadcasts nothing and shuffles nothing: the weight
vector is a literal array inside the plan, so scoring is map-only and
pipelines into whatever follows. The fold runs JVM-side via
``F.aggregate``; for very wide vectors (≥ several thousand dims) where
Catalyst's interpreted higher-order lambda becomes the bottleneck, swap
the dot for an Arrow-batched ``pandas_udf`` matmul (the
operators/similarity.py blocked-matmul kernel) — same contract.

``loo_target_encode`` is one window shuffle on the group key. The
leave-one-out form exists because naive target encoding leaks the row's
own label into its feature; LOO subtracts it, and singleton groups
(where LOO is undefined) fall back to the global mean — one extra 1-row
aggregate broadcast by crossJoin, never collected to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot


def score_linear(
    df: DataFrame,
    vec_col: str | Column,
    weights: Sequence[float],
    intercept: float = 0.0,
    link: str = "logistic",
    out_col: str = "score",
    precision: int | None = 6,
) -> DataFrame:
    """Append ``out_col = link(w·x + b)`` for a fixed weight vector.

    ``link`` is ``'logistic'`` (σ) or ``'identity'``. The weights are
    embedded as a literal array, so the expression is map-only and
    whole-stage-codegen eligible; rounding (default 6 dp) makes the
    output stable across engines despite summation-order differences.
    """
    w = F.array(*[F.lit(float(x)) for x in weights])
    z = dot(vec_col, w) + F.lit(float(intercept))
    if link == "logistic":
        scored = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    elif link == "identity":
        scored = z
    else:
        raise ValueError(f"unknown link: {link!r}")
    if precision is not None:
        scored = F.round(scored, precision)
    return df.withColumn(out_col, scored)


def loo_target_encode(
    df: DataFrame,
    keys: Sequence[str],
    target: str | Column,
    out_col: str = "loo_enc",
    precision: int | None = 6,
) -> DataFrame:
    """Leave-one-out target encoding: each row's key is encoded by the
    mean target of the OTHER rows sharing it —
    ``(Σ_group y − y) / (n_group − 1)`` — so the row's own label never
    leaks into its feature (the flaw of naive target encoding that
    inflates offline metrics). Groups of size 1 fall back to the global
    target mean; rows with a NULL target get a NULL encoding (they
    contribute nothing to any group sum either).

    One window shuffle on ``keys`` plus a 1-row global-mean aggregate
    joined in by broadcast crossJoin.
    """
    y = F.col(target) if isinstance(target, str) else target
    w = Window.partitionBy(*keys)
    gmean = df.agg(F.avg(y).alias("_global_mean"))
    loo = F.when(
        F.count(y).over(w) > 1,
        (F.sum(y).over(w) - y) / (F.count(y).over(w) - 1),
    ).otherwise(F.col("_global_mean"))
    loo = F.when(y.isNotNull(), loo)
    if precision is not None:
        loo = F.round(loo, precision)
    return (
        df.crossJoin(F.broadcast(gmean))
        .withColumn(out_col, loo)
        .drop("_global_mean")
    )
