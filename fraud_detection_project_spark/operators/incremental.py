"""Incremental aggregate maintenance — update a materialized aggregate
with a delta batch instead of rescanning history.

No reference equivalent. At 100 TB the difference between "recompute
daily revenue over all history" and "combine yesterday's state with
today's partials" is the whole batch budget; this is the batch twin of
what Structured Streaming's stateful aggregation does per micro-batch,
expressed as an explicit state ⋈ delta merge so it works on plain
parquet state tables.

Only algebraic/distributive aggregates combine losslessly:
count/sum/min/max merge directly; avg must be carried as (sum, count).
``merge_aggregate_state`` refuses anything else — a holistic aggregate
(median, distinct count) CANNOT be maintained this way (use sketches:
HLL for distinct, KLL/t-digest for quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COMBINERS = {
    "sum": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "count": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "min": F.least,   # least/greatest ignore nulls -> absent side is identity
    "max": F.greatest,
}


def aggregate_delta(
    batch: DataFrame, keys: list[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Partial aggregates of one delta batch; same shape as the state.
    ``specs``: out_col -> (in_col, fn) with fn in sum/count/min/max."""
    aggs = []
    for out, (col, fn) in specs.items():
        if fn not in _COMBINERS:
            raise ValueError(
                f"{fn} is not algebraic — cannot be incrementally maintained"
            )
        aggs.append(getattr(F, fn)(col).alias(out))
    return batch.groupBy(*keys).agg(*aggs)


def merge_aggregate_state(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
) -> DataFrame:
    """New state = state ⊕ aggregate_delta(delta): full-outer join on
    the group keys, per-column algebraic combine. Keys only in the
    delta appear (new groups); untouched keys pass through. One shuffle
    of the (small) delta partials + one join against state — if the
    state table is bucketed by the keys, its side never shuffles."""
    d = aggregate_delta(delta, keys, specs)
    s, dd = state.alias("s"), d.alias("d")
    merged = s.join(dd, on=keys, how="full_outer")
    cols = [
        _COMBINERS[fn](F.col(f"s.{out}"), F.col(f"d.{out}")).alias(out)
        for out, (_, fn) in specs.items()
    ]
    return merged.select(*keys, *cols)
