"""Feature preprocessing (SURVEY.md §2 M2-M5, M8).

Reference: ``ColumnTransformer([('num', StandardScaler(), num),
('cat', OneHotEncoder(handle_unknown='ignore'), cat)])`` wrapped in a
Pipeline, fit on train only (``transform_data.py:84-87, 125-127``).

Spark shape: ``StringIndexer(handleInvalid='keep')`` + ``OneHotEncoder
(handleInvalid='keep', dropLast=False)`` per categorical, numeric
``VectorAssembler`` + ``StandardScaler``, final assembler → one
``features`` vector column. ``fit`` is the only action (two
tree-aggregates over train: indexer frequency scan + scaler moments).

Parity note (SURVEY hard-list #3): sklearn standardizes with population
std (ddof=0), MLlib with sample std (ddof=1). :func:`standardize` (the
pure-DataFrame scaler) exposes ``ddof`` so either contract is exact;
the MLlib pipeline keeps MLlib's own convention and documents it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    OneHotEncoder,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_feature_pipeline(
    num_cols: Sequence[str],
    cat_cols: Sequence[str],
    output_col: str = "features",
    with_mean: bool = True,
    with_std: bool = True,
) -> Pipeline:
    """M2+M3+M4 composed: numeric scaling + unknown-tolerant one-hot.

    ``handleInvalid='keep'`` on both indexer and encoder reproduces
    sklearn's ``handle_unknown='ignore'`` contract: categories unseen at
    fit time transform without error. ``dropLast=False`` matches
    sklearn's default of keeping every category level.
    """
    stages = []
    assembled_inputs: list[str] = []

    if num_cols:
        stages.append(
            VectorAssembler(
                inputCols=list(num_cols), outputCol="__num_vec", handleInvalid="keep"
            )
        )
        stages.append(
            StandardScaler(
                inputCol="__num_vec",
                outputCol="__num_scaled",
                withMean=with_mean,
                withStd=with_std,
            )
        )
        assembled_inputs.append("__num_scaled")

    for c in cat_cols:
        stages.append(
            StringIndexer(inputCol=c, outputCol=f"__{c}_idx", handleInvalid="keep")
        )
        stages.append(
            OneHotEncoder(
                inputCol=f"__{c}_idx",
                outputCol=f"__{c}_ohe",
                dropLast=False,
                handleInvalid="keep",
            )
        )
        assembled_inputs.append(f"__{c}_ohe")

    stages.append(VectorAssembler(inputCols=assembled_inputs, outputCol=output_col))
    return Pipeline(stages=stages)


def feature_names_out(model: PipelineModel, df: DataFrame, output_col: str = "features") -> list[str]:
    """M8 (``get_feature_names_out``, ``transform_data.py:128``): read the
    assembled vector's ``ml_attr`` metadata for per-slot feature names.
    """
    transformed = model.transform(df.limit(1))
    meta = transformed.schema[output_col].metadata
    attrs = meta.get("ml_attr", {}).get("attrs", {})
    named: list[tuple[int, str]] = []
    for group in attrs.values():
        for a in group:
            named.append((a["idx"], a["name"]))
    return [n for _, n in sorted(named)]


def standardize(
    df: DataFrame,
    cols: Sequence[str],
    ddof: int = 0,
    suffix: str = "_scaled",
    stats: DataFrame | None = None,
) -> DataFrame:
    """Pure-DataFrame z-scoring: ``(x - mean) / std``.

    ``ddof=0`` is sklearn's convention (``transform_data.py:85``),
    ``ddof=1`` MLlib's. Train-only-fit contract: pass ``stats`` computed
    on the train split (via :func:`standardize_stats`) to transform any
    other frame with the same moments. One tree-aggregate + a broadcast
    join — no per-column passes.
    """
    if stats is None:
        stats = standardize_stats(df, cols, ddof)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        out = out.withColumn(
            c + suffix,
            F.when(
                F.col(f"__std_{c}") > 0,
                (F.col(c) - F.col(f"__mean_{c}")) / F.col(f"__std_{c}"),
            ).otherwise(F.lit(0.0)),
        )
    return out.drop(*[f"__mean_{c}" for c in cols], *[f"__std_{c}" for c in cols])


def standardize_stats(df: DataFrame, cols: Sequence[str], ddof: int = 0) -> DataFrame:
    """Single-row frame of per-column mean/std (the scaler's fit step)."""
    std_fn = F.stddev_pop if ddof == 0 else F.stddev_samp
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"__mean_{c}"))
        aggs.append(std_fn(c).alias(f"__std_{c}"))
    return df.select(*aggs)


def one_hot_columns(
    df: DataFrame, col: str, categories: Sequence[str], prefix: str | None = None
) -> DataFrame:
    """Columnar one-hot with a fixed category list (oracle-expressible
    M3 variant): unseen values get all-zeros — sklearn
    ``handle_unknown='ignore'`` semantics, visible as plain columns.
    """
    p = prefix or col
    for cat in categories:
        safe = cat.replace(" ", "_")
        df = df.withColumn(
            f"{p}_{safe}", (F.col(col) == F.lit(cat)).cast("int")
        )
    return df
