"""Train/test splitting (SURVEY.md §2 M1).

Reference: ``train_test_split(test_size=0.2, random_state=42, stratify=y)``
(``transform_data.py:121-123``). sklearn's exact row assignment is an RNG
artifact; the engine preserves the *semantics* — disjoint, exhaustive,
~80/20 within every stratum — two ways:

- :func:`id_hash_split` — deterministic multiplicative-hash assignment on
  a key column. Reproducible across runs, engines, and cluster sizes
  (pure integer arithmetic — the same formula runs in any SQL dialect),
  and requires no second pass: each row knows its side. This is the
  scale-correct choice: at 100 TB a random split that must be re-derived
  (or persisted) to stay stable is a liability.
- :func:`stratified_split` — per-class Bernoulli sampling via
  ``sampleBy`` + anti-join, the closest structural analog of sklearn's
  stratified shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative hash constant (2^32 / φ), public domain folklore.
_KNUTH = 2654435761


def id_hash_split(
    df: DataFrame,
    id_col: str,
    train_fraction: float = 0.8,
    salt: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic split: ``(id*K + salt) mod 100 < train_pct``.

    Adds ``split_col`` ∈ {'train','test'}. Stratification is implicit:
    the hash is independent of any feature, so every stratum lands
    ~train_fraction in expectation.
    """
    pct = int(round(train_fraction * 100))
    bucket = F.pmod(F.col(id_col).cast("long") * F.lit(_KNUTH) + F.lit(salt), F.lit(100))
    return df.withColumn(
        split_col, F.when(bucket < pct, F.lit("train")).otherwise(F.lit("test"))
    )


def stratified_split(
    df: DataFrame,
    label_col: str,
    train_fraction: float = 0.8,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Per-class Bernoulli split (M1): ``sampleBy`` keeps ~train_fraction
    of every label value; test = the exact complement via exceptAll.

    Note exceptAll is a shuffle of the full frame — prefer
    :func:`id_hash_split` when an id column exists.
    """
    labels = [r[0] for r in df.select(label_col).distinct().collect()]
    fractions = {v: train_fraction for v in labels}
    train = df.stat.sampleBy(label_col, fractions, seed)
    test = df.exceptAll(train)
    return train, test


def kfold_assign(
    df: DataFrame,
    id_col: str,
    k: int = 5,
    seed: int = 42,
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: ``fold = pmod(xxhash64(id, seed), k)``.

    Folds are a pure function of (id, seed, k) — stable across runs,
    partitionings, and cluster layouts, so every worker agrees on the
    assignment without any coordination or shuffled sampling, and a
    fold's train split is just ``fold != i`` (no materialized copies of
    the dataset per fold — the property that matters when the dataset
    is 100 TB and sklearn's KFold would build k index arrays).
    """
    return df.withColumn(
        fold_col,
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(k)).cast("int"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_cols: Sequence[str],
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    exponential keys): each row draws ``u = hash-uniform(id, seed)`` and
    scores ``key = ln(u) / w``; the top-k keys are the sample, with
    inclusion probability proportional to weight — the distributed
    analogue of ``np.random.choice(..., replace=False, p=w)``.

    Scale: one narrow projection + TakeOrderedAndProject (k rows per
    partition cross the wire). Deterministic for a fixed (seed,
    ``id_cols``) — every executor derives the same keys, no RNG state.
    Rows with NULL or non-positive weight are excluded (standard
    contract). ``id_cols`` must uniquely identify rows.
    """
    # uniform in (0, 1]: 63-bit positive hash scaled; +1 avoids ln(0)
    h = F.abs(F.xxhash64(*[F.col(c) for c in id_cols], F.lit(seed)))
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(2**63))
    key = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__wkey", key)
        .orderBy(F.desc("__wkey"), *id_cols)
        .limit(k)
        .drop("__wkey")
    )
