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
from pyspark.sql.window import Window


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


class NativeFeaturePrep:
    """DataFrame-native twin of :func:`build_feature_pipeline` — same
    contract (M2+M3+M4: train-only fit, frequencyDesc string indexing,
    unknown-tolerant one-hot with ``dropLast=False``, sample-std
    scaling), built from first principles on DataFrame aggregates
    instead of MLlib estimators.

    Why it exists: MLlib's ``StandardScaler.fit`` and
    ``StringIndexer.fit`` each cost ~1 s of RDD-path overhead per call
    at bench scale even though both are one small aggregate. Here fit is
    exactly TWO jobs regardless of column count: one plain agg for all
    numeric moments, and one melted groupBy covering EVERY categorical
    column at once (explode a per-row array of (col, value) structs →
    count → per-column rank). Transform is pure whole-stage-codegen
    column arithmetic finished by ``array_to_vector`` (JVM, no Python).
    ``tests/test_ml.py`` asserts slot-for-slot equality with the MLlib
    pipeline's output vectors.

    Categorical values are indexed via their STRING form — the same
    cast MLlib's ``StringIndexer`` applies — so the melted vocab frame
    has one schema for all columns. Indexing uses a literal CASE chain
    (fine for low-cardinality dims); above ``max_case_categories`` the
    model falls back to a broadcast-joined mapping table so a
    high-cardinality vocab never builds a giant expression tree.

    ``max_categories`` bounds the driver-side vocab collection: only
    the top-``max_categories`` values per column (count desc, value
    asc — frequencyDesc order) are collected; overflow values index to
    the unseen bucket, the same slot ``handleInvalid='keep'`` already
    reserves. Without the cap an unexpectedly high-cardinality column
    is a driver OOM at scale (VERDICT r3).
    """

    def __init__(
        self,
        num_cols: Sequence[str],
        cat_cols: Sequence[str],
        output_col: str = "features",
        with_mean: bool = True,
        with_std: bool = True,
        max_case_categories: int = 64,
        max_categories: int = 10_000,
    ) -> None:
        self.num_cols = list(num_cols)
        self.cat_cols = list(cat_cols)
        self.output_col = output_col
        self.with_mean = with_mean
        self.with_std = with_std
        self.max_case_categories = max_case_categories
        self.max_categories = max_categories

    def fit(self, df: DataFrame) -> "NativeFeaturePrepModel":
        moments: dict = {}
        vocabs: dict[str, list] = {c: [] for c in self.cat_cols}
        num_aggs = []
        for c in self.num_cols:
            num_aggs.append(F.avg(c).alias(f"m_{c}"))
            num_aggs.append(F.stddev_samp(c).alias(f"s_{c}"))

        if not self.cat_cols:
            if self.num_cols:
                row = df.agg(*num_aggs).first()
                moments = {
                    c: (row[f"m_{c}"], row[f"s_{c}"]) for c in self.num_cols
                }
            return NativeFeaturePrepModel(self, moments, vocabs)

        # ONE job / one shuffle for the whole fit: GROUPING SETS over
        # (()) ∪ ((c) for each categorical). The global () row carries
        # the numeric moments; each (c) row carries one category's
        # count. grouping_id() tells the sets apart (bit=1 ⟺ column
        # aggregated-over), so a real null category value is not
        # confused with "column not in this set". StringIndexer
        # frequencyDesc order: count desc, string value asc; a
        # per-set rank caps the driver collect at max_categories rows
        # per column (overflow → unseen bucket).
        cats = [F.col(c).cast("string").alias(f"__cat_{c}") for c in self.cat_cols]
        cat_names = [f"__cat_{c}" for c in self.cat_cols]
        proj = df.select(*df.columns, *cats)
        all_mask = (1 << len(cat_names)) - 1
        masks = {
            c: all_mask & ~(1 << (len(cat_names) - 1 - i))
            for i, c in enumerate(self.cat_cols)
        }
        gs = proj.groupingSets(
            [[]] + [[n] for n in cat_names], *[F.col(n) for n in cat_names]
        ).agg(
            F.grouping_id().alias("__gid"),
            F.count(F.lit(1)).alias("__n"),
            *num_aggs,
        )
        val = F.lit(None).cast("string")
        for c in self.cat_cols:
            val = F.when(F.col("__gid") == F.lit(masks[c]), F.col(f"__cat_{c}")).otherwise(val)
        w = Window.partitionBy("__gid").orderBy(F.desc("__n"), F.asc("__v"))
        rows = (
            gs.withColumn("__v", val)
            .filter(
                (F.col("__gid") == F.lit(all_mask)) | F.col("__v").isNotNull()
            )
            .withColumn("__rk", F.row_number().over(w))
            .filter(
                (F.col("__gid") == F.lit(all_mask))
                | (F.col("__rk") <= F.lit(int(self.max_categories)))
            )
            .collect()
        )
        gid_to_col = {m: c for c, m in masks.items()}
        vocab_rows = {c: [] for c in self.cat_cols}
        for r in rows:
            if r["__gid"] == all_mask:
                moments = {
                    c: (r[f"m_{c}"], r[f"s_{c}"]) for c in self.num_cols
                }
            else:
                vocab_rows[gid_to_col[r["__gid"]]].append(
                    (-r["__n"], r["__v"], r["__rk"])
                )
        for c in self.cat_cols:
            vocabs[c] = [v for _, v, _ in sorted(vocab_rows[c])]
        return NativeFeaturePrepModel(self, moments, vocabs)


class NativeFeaturePrepModel:
    def __init__(self, prep: NativeFeaturePrep, moments: dict, vocabs: dict) -> None:
        self.prep = prep
        self.moments = moments
        self.vocabs = vocabs

    def _scaled(self, c: str):
        mean, std = self.moments[c]
        # VectorAssembler(handleInvalid="keep") turns null into NaN
        x = F.coalesce(F.col(c).cast("double"), F.lit(float("nan")))
        if self.prep.with_mean:
            x = x - F.lit(float(mean))
        if self.prep.with_std:
            # std==0/None zeroes only real inputs: MLlib emits NaN for a
            # null (NaN) value even under a 0.0 multiplier, so NaN must
            # stay NaN for slot parity on constant train columns
            x = F.when(
                F.lit(std is not None and std > 0),
                x / F.lit(float(std) if std else 1.0),
            ).otherwise(F.when(F.isnan(x), x).otherwise(F.lit(0.0)))
        return x

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.functions import array_to_vector

        slots = [self._scaled(c) for c in self.prep.num_cols]
        for c in self.prep.cat_cols:
            vocab = self.vocabs[c]
            k = len(vocab)
            # index on the STRING form — the StringIndexer cast — which
            # is also what fit() collected
            cs = F.col(c).cast("string")
            if k <= self.prep.max_case_categories:
                idx = F.lit(k)  # unseen / null / overflow -> keep bucket
                for j in range(k - 1, -1, -1):
                    idx = F.when(cs == F.lit(vocab[j]), F.lit(j)).otherwise(idx)
            else:
                mapping = df.sparkSession.createDataFrame(
                    [(v, j) for j, v in enumerate(vocab)],
                    f"__catval_{c} string, __idx_{c} int",
                )
                df = df.withColumn(f"__catval_{c}", cs).join(
                    F.broadcast(mapping), on=f"__catval_{c}", how="left"
                )
                idx = F.coalesce(F.col(f"__idx_{c}"), F.lit(k))
            # dropLast=False + handleInvalid=keep on BOTH stages: the
            # indexer reserves slot k for unseen, and the encoder adds
            # its own (never-reached) invalid slot k+1 — k+2 total,
            # matching the MLlib pipeline vector slot-for-slot
            slots.extend(
                [
                    F.when(idx == F.lit(j), F.lit(1.0)).otherwise(F.lit(0.0))
                    for j in range(k + 2)
                ]
            )
        out = df.withColumn(
            self.prep.output_col, array_to_vector(F.array(*slots))
        )
        return out.drop(
            *[
                c
                for c in out.columns
                if c.startswith("__idx_") or c.startswith("__catval_")
            ]
        )

    def feature_names_out(self) -> list[str]:
        names = [f"{c}_scaled" for c in self.prep.num_cols]
        for c in self.prep.cat_cols:
            names += [f"{c}_{v}" for v in self.vocabs[c]] + [
                f"{c}__unseen",
                f"{c}__invalid",
            ]
        return names


def winsorize(
    df: DataFrame,
    cols: Sequence[str],
    lower: float = 0.01,
    upper: float = 0.99,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Percentile clipping (winsorization): cap each column at its
    [lower, upper] exact interpolated percentiles, optionally per
    ``by``-group — the standard outlier guard before scaling (a single
    extreme value otherwise dominates a z-score's σ).

    Scale design: percentiles come from ONE aggregate over the input
    (per group when ``by`` is set — a |groups|-row frame), broadcast
    back; the clip itself is a codegen ``greatest(least(...))``. NULLs
    pass through untouched.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.percentile(c, F.lit(float(lower))).alias(f"__lo_{c}"),
            F.percentile(c, F.lit(float(upper))).alias(f"__hi_{c}"),
        ]
    if by:
        bounds = df.groupBy(*by).agg(*aggs)
        out = df.join(F.broadcast(bounds), list(by), "left")
    else:
        bounds = df.agg(*aggs)
        out = df.crossJoin(F.broadcast(bounds))
    for c in cols:
        clipped = F.greatest(
            F.least(F.col(c), F.col(f"__hi_{c}")), F.col(f"__lo_{c}")
        )
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), clipped))
    return out.drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])


def target_encode(
    train: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str | None = None,
    smoothing: float = 10.0,
):
    """Mean target encoding with additive smoothing, train-only fit:
    ``enc(c) = (sum_c + prior·m) / (n_c + m)`` where ``prior`` is the
    global target mean and ``m`` the smoothing mass — the standard
    high-cardinality categorical encoder (one-hot explodes at 10⁶
    categories; this is one double per category).

    Returns ``(encoder_df, transform)``: a |categories|-row mapping
    frame and a closure applying it to ANY frame via broadcast join
    (unseen categories fall back to the prior — the unknown-tolerant
    contract of the one-hot path). Fit is one groupBy over train; no
    driver collection.
    """
    out_col = out_col or f"{cat_col}_te"
    prior_df = train.agg(
        F.avg(target_col).alias("__prior"), F.count(target_col).alias("__n")
    )
    enc = (
        train.groupBy(cat_col)
        .agg(
            F.sum(target_col).alias("__sum"),
            F.count(target_col).alias("__cnt"),
        )
        .crossJoin(F.broadcast(prior_df.select("__prior")))
        .select(
            cat_col,
            (
                (F.col("__sum") + F.col("__prior") * F.lit(smoothing))
                / (F.col("__cnt") + F.lit(smoothing))
            ).alias(out_col),
            "__prior",
        )
    )

    def transform(df: DataFrame) -> DataFrame:
        joined = df.join(F.broadcast(enc.drop("__prior")), cat_col, "left")
        prior = F.broadcast(prior_df.select("__prior"))
        return (
            joined.crossJoin(prior)
            .withColumn(out_col, F.coalesce(F.col(out_col), F.col("__prior")))
            .drop("__prior")
        )

    return enc.drop("__prior"), transform


def robust_scale(
    df: DataFrame,
    cols: Sequence[str],
    stats: DataFrame | None = None,
) -> DataFrame:
    """Median/IQR scaling (sklearn ``RobustScaler`` parity):
    ``(x - median) / (q3 - q1)`` per column — the outlier-insensitive
    alternative to z-scoring (mean and σ are both unbounded under a
    single corrupt value; median and IQR are 25%-breakdown robust).

    ``stats`` carries a fitted one-row frame (from
    :func:`robust_scale_stats`) for the train-only-fit contract;
    omitted, it is fitted on ``df`` itself. Zero-IQR columns scale to
    0.0 (matching the zero-variance convention in :func:`standardize`).
    One aggregate pass; the clip is codegen arithmetic off a broadcast
    one-row join.
    """
    if stats is None:
        stats = robust_scale_stats(df, cols)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        iqr = F.col(f"__iqr_{c}")
        scaled = F.when(
            iqr > 0, (F.col(c) - F.col(f"__med_{c}")) / iqr
        ).otherwise(F.when(F.col(c).isNotNull(), F.lit(0.0)))
        out = out.withColumn(f"{c}_scaled", scaled)
    return out.drop(
        *[f"__med_{c}" for c in cols], *[f"__iqr_{c}" for c in cols]
    )


def robust_scale_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-row (median, IQR) frame per column — the fit half."""
    aggs = []
    for c in cols:
        aggs += [
            F.percentile(c, F.lit(0.5)).alias(f"__med_{c}"),
            (
                F.percentile(c, F.lit(0.75)) - F.percentile(c, F.lit(0.25))
            ).alias(f"__iqr_{c}"),
        ]
    return df.agg(*aggs)


def quantile_discretize(
    df: DataFrame,
    col: str,
    n_bins: int = 4,
    stats: DataFrame | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Equal-frequency binning (MLlib ``QuantileDiscretizer`` with
    EXACT boundaries instead of its approximate sketch): fit the
    ``n_bins - 1`` interior percentile boundaries, assign
    ``bin = #{boundaries < x}`` ∈ [0, n_bins). Fit is one aggregate; the
    assignment is a fold over the tiny boundary array off a broadcast
    one-row join — no per-row UDF, no window. ``stats`` (from
    :func:`quantile_discretize_stats`) carries a train-fitted boundary
    frame for the train-only-fit contract. NULLs pass through as NULL.
    """
    out_col = out_col or f"{col}_bin"
    if stats is None:
        stats = quantile_discretize_stats(df, col, n_bins)
    out = df.crossJoin(F.broadcast(stats))
    bnds = F.col(f"__bnds_{col}")
    bin_ = F.size(F.filter(bnds, lambda b: b < F.col(col)))
    return out.withColumn(
        out_col, F.when(F.col(col).isNotNull(), bin_).cast("int")
    ).drop(f"__bnds_{col}")


def quantile_discretize_stats(
    df: DataFrame, col: str, n_bins: int = 4
) -> DataFrame:
    """One-row frame with the interior exact-percentile boundaries."""
    fracs = [i / n_bins for i in range(1, n_bins)]
    return df.agg(
        F.array(
            *[F.percentile(col, F.lit(f)) for f in fracs]
        ).alias(f"__bnds_{col}")
    )
