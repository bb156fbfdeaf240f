"""Slowly-changing-dimension (Type 2) history building.

The reference joins transactions to a *static* IP→country dimension
(`transform_data.py:25-47`); real fraud dimensions (account standing,
device ownership, merchant category) change over time, and the
warehouse-standard representation is SCD Type 2: one row per version
with a ``[valid_from, valid_to)`` interval, ``valid_to IS NULL`` for
the current version. This module derives that history from a raw
change/observation stream.

Scale design: both window passes (change compression, then interval
stitching) partition on the SAME business key, so Catalyst plans ONE
shuffle — the second Window reuses the first's partitioning and sort.
No self-join, no collect. Point-in-time lookups against the result are
an as-of join (operators/joins.py:as_of_join) or an interval join on
``[valid_from, valid_to)`` — both already scale-shaped.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_scd2(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    attr_cols: Sequence[str],
    valid_from_col: str,
    out_from: str = "valid_from",
    out_to: str = "valid_to",
) -> DataFrame:
    """Collapse an observation stream into SCD Type-2 version rows.

    ``df`` holds one row per observation of ``key_cols``'s attributes,
    ordered within key by ``order_cols`` (include a unique tiebreaker —
    determinism requires a total order). Consecutive observations whose
    ``attr_cols`` are all unchanged compress into one version
    (NULL-safe comparison: NULL → NULL is "no change"). Each surviving
    version gets ``out_from`` = its ``valid_from_col`` and ``out_to`` =
    the next version's start (NULL for the open/current version) —
    half-open ``[from, to)`` intervals that tile each key's timeline
    with no gaps or overlaps.

    Output columns: ``*key_cols, *attr_cols, out_from, out_to``.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    first_row = F.lag(F.lit(1)).over(w).isNull()
    any_changed = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w)) for c in attr_cols],
    )
    versions = df.withColumn("_chg", first_row | any_changed).filter(
        F.col("_chg")
    )
    # same partitioning + prefix-compatible ordering -> no second shuffle
    return versions.select(
        *key_cols,
        *attr_cols,
        F.col(valid_from_col).alias(out_from),
        F.lead(F.col(valid_from_col)).over(w).alias(out_to),
    )
