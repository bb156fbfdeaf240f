"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two shapes still need explicit salting at 100 TB:

- a groupBy where one key holds a double-digit percentage of all rows
  (a single reducer gets that key no matter how AQE splits scans), and
- a shuffle join against a *hot* key set too large to broadcast whole
  but with a known/estimable hot-key head.

Both helpers keep the two-phase shape: per-(key, salt) partial
aggregation (parallel across ``salt_buckets`` reducers) → final merge
per key. For algebraic aggregates the result is exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Exact two-phase aggregation for skewed keys.

    ``aggs`` maps output column → (input column, fn) with fn in
    {'sum', 'count', 'min', 'max'} (the algebraic functions that merge
    exactly; avg = sum/count composed by the caller).

    Phase 1 groups by (keys…, random salt) — the hot key fans out over
    ``salt_buckets`` reducers; phase 2 merges the tiny per-salt partials
    by key alone. Cost: one extra (small) shuffle; benefit: no straggler
    reducer pinned to the hot key.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for _, (c, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"non-algebraic agg {fn!r} cannot be salted exactly")

    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[phase1_fn[fn](F.col(c)).alias(out) for out, (c, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge_fn[fn](F.col(out)).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_join_hot_keys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: Sequence,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where ``hot_keys`` of ``key`` are pathologically
    frequent on the fact side: hot fact rows get a random salt and the
    hot dim rows are replicated across every salt value, so the hot
    keys' rows spread over ``salt_buckets`` reducers instead of one.
    Cold keys join normally. Result = salted-hot ∪ cold.
    """
    hot_lit = F.array(*[F.lit(k) for k in hot_keys])
    is_hot = F.array_contains(hot_lit, F.col(key))

    fact_hot = fact.filter(is_hot).withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    fact_cold = fact.filter(~is_hot)

    dim_hot = (
        dim.filter(is_hot)
        .crossJoin(
            F.broadcast(
                fact.sparkSession.range(salt_buckets).select(
                    F.col("id").cast("int").alias("__salt")
                )
            )
        )
    )
    dim_cold = dim.filter(~is_hot)

    joined_hot = fact_hot.join(dim_hot, [key, "__salt"], how).drop("__salt")
    joined_cold = fact_cold.join(dim_cold, [key], how)
    return joined_hot.unionByName(joined_cold)


def skew_report(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key-distribution diagnostic — the measurement that decides
    between plain hash partitioning, salting (:func:`salted_agg` /
    :func:`salted_join_hot_keys`), and AQE skew handling: one row with
    the group-size distribution over ``keys``.

    ``skew_ratio`` = max group / mean group: ~1 is uniform; a ratio of
    N/10 means one key holds 10% of the data and its task runs that
    much longer than the average — the straggler signal. Two aggregates
    (per-key count → one-row stats); nothing collected beyond the
    summary row.
    """
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__n").alias("n_rows"),
        F.max("__n").alias("max_count"),
        F.percentile("__n", F.lit(0.5)).alias("p50_count"),
        F.percentile("__n", F.lit(0.99)).alias("p99_count"),
        F.round(
            F.max("__n") / (F.sum("__n") / F.count(F.lit(1))), 4
        ).alias("skew_ratio"),
    )


def advise_join_strategy(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    broadcast_threshold_rows: int = 100_000,
    skew_ratio_threshold: float = 20.0,
) -> DataFrame:
    """Measurement-driven join-strategy recommendation — the decision
    procedure this module's operators exist to feed:

    1. ``dim`` small enough → **broadcast** (no fact shuffle at all);
    2. else if the fact key distribution is skewed
       (:func:`skew_report` ratio >= threshold) → **shuffle+salt**
       (:func:`salted_join_hot_keys` / AQE skew join);
    3. else plain **shuffle** hash join.

    Returns ONE row: ``(fact_rows, dim_rows, skew_ratio,
    recommendation)`` — the evidence plus the verdict, so the choice is
    auditable. Cost: one count on the dim, one two-phase key-histogram
    on the fact (both single aggregates); nothing collected. For join-
    SIZE estimation (a different question: output volume, not
    strategy), see operators/sketches.py:count_min_inner_product.
    """
    dim_n = dim.agg(F.count(F.lit(1)).alias("dim_rows"))
    rep = skew_report(fact, [fact_key]).select(
        F.col("n_rows").alias("fact_rows"), "skew_ratio"
    )
    return (
        rep.crossJoin(F.broadcast(dim_n))
        .select(
            F.col("fact_rows").cast("long").alias("fact_rows"),
            F.col("dim_rows").cast("long").alias("dim_rows"),
            "skew_ratio",
            F.when(
                F.col("dim_rows") <= broadcast_threshold_rows,
                F.lit("broadcast"),
            )
            .when(
                F.col("skew_ratio") >= skew_ratio_threshold,
                F.lit("shuffle+salt"),
            )
            .otherwise(F.lit("shuffle"))
            .alias("recommendation"),
        )
    )
