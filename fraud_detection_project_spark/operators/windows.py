"""Window / time-series operators (SURVEY.md §2 W1/W2).

Reference: ``src/preprocessing/transform_data.py:59-65`` — per-entity
trailing-24h transaction counts ("velocity" features) via pandas
``.rolling('24h', closed='right').count() - 1``.

Spark shape: one shuffle per distinct partition key; the frame is a
``rangeBetween`` over an integer epoch column, evaluated streaming within
each partition — no per-row re-scan, and at 100 TB the cost is the
shuffle, not the window.

Boundary semantics: pandas ``closed='right'`` counts events in
``(t-24h, t]`` — the event *exactly* 24h earlier is excluded. We match it
exactly by opening the lower bound one tick: ``rangeBetween(-(W-1), 0)``
in the epoch unit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_count_24h(
    df: DataFrame,
    key: str | Sequence[str],
    time_col: str | Column,
    out_col: str,
    window_seconds: int = 86400,
    tick: int = 1,
    closed: str = "right",
) -> DataFrame:
    """Trailing-window event count per key, excluding the current row.

    ``time_col`` must be (castable to) an integer epoch in units of
    ``tick``-per-second... i.e. pass seconds with tick=1, microseconds
    with tick=1_000_000. ``closed='right'`` reproduces the pandas
    semantics of the reference; ``closed='both'`` is the plain
    ``[t-W, t]`` frame.
    """
    keys = [key] if isinstance(key, str) else list(key)
    t = (F.col(time_col) if isinstance(time_col, str) else time_col).cast("long")
    width = window_seconds * tick
    low = -(width - 1) if closed == "right" else -width
    w = Window.partitionBy(*keys).orderBy(t).rangeBetween(low, 0)
    cnt = F.count(F.lit(1)).over(w) - F.lit(1)
    # the reference's fillna(0) (transform_data.py:65): unreachable for
    # non-null keys, but preserved for null-key rows.
    return df.withColumn(out_col, F.coalesce(cnt, F.lit(0)).cast("long"))


def velocity_features(
    df: DataFrame,
    time_col: str | Column,
    keys: dict[str, str],
    window_seconds: int = 86400,
    tick: int = 1,
) -> DataFrame:
    """The reference's three velocity features in one pass
    (``transform_data.py:59-65``): ``{out_col: key_col}`` e.g.
    ``{'user_transactions_24h': 'user_id', 'device_transactions_24h':
    'device_id', 'ip_transactions_24h': 'ip_address'}``.

    Each key is its own shuffle; they are independent, so AQE pipelines
    them. (The global pre-sort the reference does is unnecessary — each
    window spec carries its own ordering.)
    """
    for out_col, key in keys.items():
        df = rolling_count_24h(
            df, key, time_col, out_col, window_seconds=window_seconds, tick=tick
        )
    return df


def sessionize(
    df: DataFrame,
    key: str | Sequence[str],
    time_col: str | Column,
    gap_seconds: int,
    session_col: str = "session_id",
    tick: int = 1,
) -> DataFrame:
    """Gaps-and-islands sessionization: consecutive same-key events
    closer than ``gap_seconds`` share a session; a longer gap starts a
    new one. ``session_col`` is the 0-based per-key session ordinal.

    One window shuffle on the key (lag + running sum over the same
    ordering — a single Sort+Window stage). The streaming equivalent is
    ``F.session_window`` (see streaming/windows.py:session_event_counts);
    this batch form is its oracle.
    """
    keys = [key] if isinstance(key, str) else list(key)
    t = (F.col(time_col) if isinstance(time_col, str) else time_col).cast("long")
    w = Window.partitionBy(*keys).orderBy(t)
    gap = F.lit(gap_seconds * tick)
    new_session = (t - F.lag(t).over(w) > gap).cast("int")
    return df.withColumn(
        session_col,
        F.sum(F.coalesce(new_session, F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
