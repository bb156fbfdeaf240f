"""Query registry: every implemented operator exposed as a (spark, sf_dir)
→ DataFrame callable, each paired with an ANSI-SQL oracle in ORACLE_SQL
(run by the driver under DuckDB at sf0.01 — row-count + schema +
order-insensitive value-hash must match).

Conventions for cross-engine determinism:
- computed float columns are rounded (4-6 dp) on BOTH sides;
- timestamps never leave a query raw — they are exported as integer
  epoch micros (Spark ``ts_ns div 1000`` ≡ DuckDB ``epoch_us(ts)``);
- every aggregate/computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.ip import ip_to_int, int_to_ip
from .functions.text import normalized_text, punct_ratio, tokens, word_count
from .functions.vectors import cosine_similarity
from .operators.aggregates import histogram, rate_by, value_counts
from .operators.joins import as_of_join, geolocate
from .operators.windows import rolling_count_24h, velocity_features
from .session import ensure_runtime_confs

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_confs(spark)
            return fn(spark, sf_dir)

        if name in QUERIES:  # a silent overwrite once cost a driver row
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return wrapped

    return deco


# ---------------------------------------------------------------------------
# A-bucket: aggregations (SURVEY.md §2.4)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4)                                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 4)                              AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)           AS sum_disc_price,
           ROUND(AVG(l_quantity), 6)                                   AS avg_qty,
           ROUND(AVG(l_discount), 6)                                   AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: the canonical scan→hash-agg shape
    (A1/A2 family). Whole-stage codegen end to end; partial aggregation
    map-side, so the shuffle carries only |groups| rows per task.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "revenue_by_region",
    oracle="""
    SELECT r.r_name,
           ROUND(SUM(o.o_totalprice), 4) AS revenue,
           COUNT(*)                      AS n_orders
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    GROUP BY r.r_name
    ORDER BY revenue DESC, r.r_name
    """,
)
def q_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship star join (J2): fact `orders` joined through two broadcast
    dims. region/nation/customer all broadcast → zero shuffle of the fact
    side before the final agg; at 100 TB the only wide exchange is the
    |regions|-row aggregate.
    """
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), "r_name")
    )


@register(
    "rate_by_dim",
    oracle="""
    SELECT event_type,
           ROUND(AVG(CASE WHEN value > 100 THEN 1.0 ELSE 0.0 END), 6) AS rate
    FROM events
    GROUP BY event_type
    ORDER BY rate DESC, event_type
    """,
)
def q_rate_by_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (fraud-rate-by-dimension, ``processor.py:37-40``): mean of a 0/1
    flag per category, descending."""
    ev = load_table(spark, sf_dir, "events")
    flagged = ev.withColumn("flag", F.when(F.col("value") > 100, 1.0).otherwise(0.0))
    out = rate_by(flagged, "event_type", "flag", rate_col="rate")
    return out.withColumn("rate", F.round("rate", 6)).orderBy(
        F.desc("rate"), "event_type"
    )


@register(
    "value_counts_event_type",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY cnt DESC, event_type
    """,
)
def q_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (label/category distribution, ``processor.py:30``)."""
    return value_counts(load_table(spark, sf_dir, "events"), "event_type", "cnt")


@register(
    "distinct_users_by_type",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*)                AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (count distinct, ``transform_data.py:46``) per group."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "numeric_profile_lineitem",
    oracle="""
    SELECT 'l_quantity' AS col_name, COUNT(l_quantity) AS n,
           ROUND(AVG(l_quantity), 6) AS mean, ROUND(STDDEV_SAMP(l_quantity), 6) AS std,
           ROUND(MIN(l_quantity), 6) AS min, ROUND(MAX(l_quantity), 6) AS max
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice' AS col_name, COUNT(l_extendedprice) AS n,
           ROUND(AVG(l_extendedprice), 6) AS mean, ROUND(STDDEV_SAMP(l_extendedprice), 6) AS std,
           ROUND(MIN(l_extendedprice), 6) AS min, ROUND(MAX(l_extendedprice), 6) AS max
    FROM lineitem
    ORDER BY col_name
    """,
)
def q_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (``df.describe()``, ``processor.py:23``) with a stable schema."""
    from .operators.aggregates import numeric_profile

    li = load_table(spark, sf_dir, "lineitem")
    prof = numeric_profile(li, ["l_quantity", "l_extendedprice"])
    return prof.select(
        F.col("column").alias("col_name"),
        "n",
        F.round("mean", 6).alias("mean"),
        F.round("std", 6).alias("std"),
        F.round("min", 6).alias("min"),
        F.round("max", 6).alias("max"),
    ).orderBy("col_name")


@register(
    "histogram_value",
    oracle="""
    SELECT CAST(LEAST(GREATEST(FLOOR((value - 0.0) / 20.0), 0), 49) AS INT) AS bucket,
           event_type,
           COUNT(*) AS cnt
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    ORDER BY bucket, event_type
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (grouped binned histogram, ``processor.py:45-54``): 50 buckets
    of width 20 over [0, 1000], clamped edges, hue = event_type."""
    return histogram(
        load_table(spark, sf_dir, "events"), "value", bins=50, lo=0.0, hi=1000.0,
        by="event_type",
    )


@register(
    "dedup_user_event_type",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (``drop_duplicates``, ``clean_data.py:37-42``) on a projected key."""
    from .operators.cleaning import remove_duplicates

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    return remove_duplicates(ev)


# ---------------------------------------------------------------------------
# J-bucket: joins (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


@register(
    "interval_join_custkey",
    oracle="""
    WITH intervals AS (
        SELECT CAST(r_regionkey * 400 AS BIGINT)       AS lo,
               CAST(r_regionkey * 400 + 299 AS BIGINT) AS hi,
               r_name
        FROM region
    )
    SELECT c.c_custkey,
           COALESCE(i.r_name, 'Unknown') AS bucket_name
    FROM customer c
    LEFT JOIN intervals i ON c.c_custkey >= i.lo AND c.c_custkey <= i.hi
    ORDER BY c.c_custkey
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (interval/range join — the geolocation shape,
    ``transform_data.py:25-47``): point BETWEEN lo AND hi against a small
    dim, unmatched → 'Unknown'. Physical plan: BroadcastNestedLoopJoin —
    the fact side never shuffles.

    The interval dim is derived from `region` (lo = key*400, width 300)
    so gaps and out-of-range points exercise the Unknown path.
    """
    region = load_table(spark, sf_dir, "region")
    intervals = region.select(
        (F.col("r_regionkey").cast("long") * 400).alias("lo"),
        (F.col("r_regionkey").cast("long") * 400 + 299).alias("hi"),
        F.col("r_name"),
    )
    customer = load_table(spark, sf_dir, "customer")
    out = geolocate(
        customer.select("c_custkey"),
        intervals,
        ip_col="c_custkey",
        lower="lo",
        upper="hi",
        country="r_name",
    )
    return out.select(
        "c_custkey", F.col("r_name").alias("bucket_name")
    ).orderBy("c_custkey")


@register(
    "asof_last_signup",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           MAX(epoch_us(s.ts)) AS last_signup_us
    FROM events p
    LEFT JOIN events s
      ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    ORDER BY p.event_id
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): for each purchase, the most recent signup
    by the same user at-or-before it. Single shuffle on user_id via the
    union-sort-carry-forward plan (operators/joins.py:as_of_join) — no
    O(n·m) product, unlike the oracle's join-aggregate formulation.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", "ts_us")
        .withColumn("last_signup_us", F.col("ts_us"))
    )
    out = as_of_join(
        purchases,
        signups,
        on="user_id",
        left_time="ts_us",
        right_time="ts_us",
        payload=["last_signup_us"],
        direction="backward",
    )
    return out.select("event_id", "user_id", "last_signup_us").orderBy("event_id")


# ---------------------------------------------------------------------------
# W-bucket: windows (SURVEY.md §2.5)
# ---------------------------------------------------------------------------


@register(
    "rolling_24h_user",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW
           ) - 1 AS txn_24h
    FROM events
    ORDER BY event_id
    """,
)
def q_rolling_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 (trailing-24h velocity count, ``transform_data.py:59-65``) with
    pandas closed='right' boundary semantics: frame is (t-24h, t], i.e.
    86400e6-1 micros preceding, current row excluded from the count.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    out = rolling_count_24h(
        ev, "user_id", "ts_us", "txn_24h", window_seconds=86400, tick=1_000_000
    )
    return out.select("event_id", "user_id", "txn_24h").orderBy("event_id")


@register(
    "rolling_24h_user_sliced",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW
           ) - 1 AS txn_24h
    FROM events
    ORDER BY event_id
    """,
)
def q_rolling_24h_sliced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 skew-hardened twin: same trailing-24h semantics (and the same
    SQL oracle as ``rolling_24h_user``) via (key, time-slice) window
    partitions with overlap replication (operators/windows.py
    ``rolling_count_sliced``) — a hot entity's history spreads over its
    slices instead of pinning one task. Ref workload:
    ``transform_data.py:59-65`` at 100x."""
    from .operators.windows import rolling_count_sliced

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    out = rolling_count_sliced(
        ev, "user_id", "ts_us", "txn_24h", window_seconds=86400, tick=1_000_000
    )
    return out.select("event_id", "user_id", "txn_24h").orderBy("event_id")


@register(
    "velocity_features_3keys",
    oracle="""
    WITH t AS (
        SELECT event_id, user_id,
               user_id % 50 AS device_id,
               user_id % 97 AS ip_key,
               epoch_us(ts) AS ts_us
        FROM events
    )
    SELECT event_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW) - 1 AS user_txn_24h,
           COUNT(*) OVER (PARTITION BY device_id ORDER BY ts_us
               RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW) - 1 AS device_txn_24h,
           COUNT(*) OVER (PARTITION BY ip_key ORDER BY ts_us
               RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW) - 1 AS ip_txn_24h
    FROM t
    ORDER BY event_id
    """,
)
def q_velocity_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full reference velocity block (three entity keys in one pass,
    ``transform_data.py:59-65``). device/ip keys are synthesized
    deterministically from user_id since the testdata has no device
    column; the operator under test is the 3×windowed count."""
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts_us", F.expr("ts_ns div 1000"))
        .withColumn("device_id", F.col("user_id") % 50)
        .withColumn("ip_key", F.col("user_id") % 97)
    )
    out = velocity_features(
        ev,
        "ts_us",
        {
            "user_txn_24h": "user_id",
            "device_txn_24h": "device_id",
            "ip_txn_24h": "ip_key",
        },
        window_seconds=86400,
        tick=1_000_000,
    )
    return out.select(
        "event_id", "user_txn_24h", "device_txn_24h", "ip_txn_24h"
    ).orderBy("event_id")


@register(
    "window_rank_lag",
    oracle="""
    SELECT event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
           LAG(ROUND(value, 2)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_value
    FROM events
    ORDER BY event_id
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 (ranking + lag over an entity window)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.lag(F.round("value", 2)).over(w).alias("prev_value"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# O-bucket: sorts / limits (SURVEY.md §2.6)
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (O-bucket): Spark plans TakeOrderedAndProject — per-partition
    heaps, no global sort; the k rows are the only thing that crosses."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY.md §2.7)
# ---------------------------------------------------------------------------


@register(
    "purchasers_never_error",
    oracle="""
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 120
    EXCEPT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 300
    ORDER BY user_id
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (§2.7): big purchasers who never had a large error."""
    ev = load_table(spark, sf_dir, "events")
    purchasers = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 120))
        .select("user_id")
        .distinct()
    )
    errorers = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 300))
        .select("user_id")
        .distinct()
    )
    return purchasers.exceptAll(errorers).distinct().orderBy("user_id")


# ---------------------------------------------------------------------------
# F-bucket: scalar functions (SURVEY.md §2.8)
# ---------------------------------------------------------------------------


@register(
    "ip_roundtrip",
    oracle="""
    WITH src AS (
        SELECT event_id,
               CAST(user_id % 256 AS BIGINT)        AS a,
               CAST((user_id * 7) % 256 AS BIGINT)  AS b,
               CAST((user_id * 13) % 256 AS BIGINT) AS c,
               CAST((user_id * 31) % 256 AS BIGINT) AS d,
               value
        FROM events
    )
    SELECT event_id,
           a * 16777216 + b * 65536 + c * 256 + d AS ip_int,
           CAST(a AS VARCHAR) || '.' || b || '.' || c || '.' || d AS ip_back,
           CAST(FLOOR(value) AS BIGINT) AS float_ip_int
    FROM src
    ORDER BY event_id
    """,
)
def q_ip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F7 (``clean_data.py:44-61``): dotted-quad → uint32 → dotted-quad
    roundtrip, plus the float-string fallback that is the hot path for the
    reference's Fraud_Data IPs. All pure column arithmetic (no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    dotted = F.concat_ws(
        ".",
        (F.col("user_id") % 256).cast("string"),
        ((F.col("user_id") * 7) % 256).cast("string"),
        ((F.col("user_id") * 13) % 256).cast("string"),
        ((F.col("user_id") * 31) % 256).cast("string"),
    )
    withs = ev.select("event_id", dotted.alias("ip_str"), "value")
    return withs.select(
        "event_id",
        ip_to_int(F.col("ip_str")).alias("ip_int"),
        int_to_ip(ip_to_int(F.col("ip_str"))).alias("ip_back"),
        ip_to_int(F.col("value").cast("string")).alias("float_ip_int"),
    ).orderBy("event_id")


@register(
    "time_features",
    oracle="""
    WITH t AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, ts
        FROM events
    )
    SELECT event_id,
           hour(ts)        AS hour_of_day,
           isodow(ts) - 1  AS day_of_week,
           (ts_us - MIN(ts_us) OVER (PARTITION BY user_id)) // 1000000
               AS seconds_since_first,
           ROUND(((ts_us - MIN(ts_us) OVER (PARTITION BY user_id)) // 1000000)
                 / 3600.0, 6) AS hours_since_first
    FROM t
    ORDER BY event_id
    """,
)
def q_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2-F5 (``transform_data.py:51-57``): hour-of-day, day-of-week
    (Monday=0 pandas convention — F.weekday, NOT F.dayofweek), and
    time-since-first-event per user (the time_since_signup shape).

    Cross-engine float discipline: hours derive from the integer-exact
    seconds delta (µs ``div`` 10⁶), so both engines round the identical
    double — dividing raw µs produced a 6th-decimal rounding tie at
    sf0.1."""
    from .functions.time import day_of_week, hour_of_day

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id")
    secs = ((F.col("ts_us") - F.min("ts_us").over(w)) / F.lit(1_000_000)).cast("long")
    return ev.select(
        "event_id",
        hour_of_day("ts").alias("hour_of_day"),
        day_of_week("ts").alias("day_of_week"),
        secs.alias("seconds_since_first"),
        F.round(secs / F.lit(3600.0), 6).alias("hours_since_first"),
    ).orderBy("event_id")


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    ORDER BY event_id
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    ).orderBy("event_id")


@register(
    "conditional_tiers",
    oracle="""
    SELECT CASE WHEN value IS NULL THEN 'unknown'
                WHEN value < 50  THEN 'small'
                WHEN value < 200 THEN 'medium'
                ELSE 'large' END AS tier,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1
    ORDER BY tier
    """,
)
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 (conditional projection, ``transform_data.py:38-43``) as a pure
    CASE expression instead of a row-wise apply."""
    ev = load_table(spark, sf_dir, "events")
    tier = (
        F.when(F.col("value").isNull(), "unknown")
        .when(F.col("value") < 50, "small")
        .when(F.col("value") < 200, "medium")
        .otherwise("large")
    )
    return ev.groupBy(tier.alias("tier")).agg(F.count(F.lit(1)).alias("cnt")).orderBy("tier")


# ---------------------------------------------------------------------------
# M-bucket: ML prep (SURVEY.md §2.9)
# ---------------------------------------------------------------------------


@register(
    "hash_split_counts",
    oracle="""
    SELECT c_mktsegment,
           CASE WHEN (c_custkey * 2654435761) % 100 < 80 THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS cnt
    FROM customer
    GROUP BY 1, 2
    ORDER BY c_mktsegment, split
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 (stratified train/test split, ``transform_data.py:121-123``) via
    the deterministic multiplicative-hash assignment (ml/split.py) — the
    same integer arithmetic is the oracle, so assignment is verified
    row-exactly, which a seeded-RNG split can never be cross-engine.
    """
    from .ml.split import id_hash_split

    cust = load_table(spark, sf_dir, "customer")
    return (
        id_hash_split(cust, "c_custkey", 0.8)
        .groupBy("c_mktsegment", "split")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("c_mktsegment", "split")
    )


@register(
    "standardize_quantity",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND((l_quantity - AVG(l_quantity) OVER ()) / STDDEV_POP(l_quantity) OVER (), 6)
               AS q_scaled
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 (StandardScaler, ``transform_data.py:85``) with sklearn's
    ddof=0 population-std convention (SURVEY hard-list #3)."""
    from .ml.prep import standardize

    li = load_table(spark, sf_dir, "lineitem")
    out = standardize(li, ["l_quantity"], ddof=0)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity_scaled", 6).alias("q_scaled"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "one_hot_event_type",
    oracle="""
    SELECT event_id,
           CAST(event_type = 'click'    AS INT) AS et_click,
           CAST(event_type = 'error'    AS INT) AS et_error,
           CAST(event_type = 'purchase' AS INT) AS et_purchase,
           CAST(event_type = 'signup'   AS INT) AS et_signup,
           CAST(event_type = 'view'     AS INT) AS et_view
    FROM events
    ORDER BY event_id
    """,
)
def q_one_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 (OneHotEncoder, ``transform_data.py:86``) as fixed-category
    columnar flags (the MLlib vector variant is pytest-covered)."""
    from .ml.prep import one_hot_columns

    ev = load_table(spark, sf_dir, "events")
    out = one_hot_columns(
        ev, "event_type", ["click", "error", "purchase", "signup", "view"], prefix="et"
    )
    return out.select(
        "event_id", "et_click", "et_error", "et_purchase", "et_signup", "et_view"
    ).orderBy("event_id")


@register("undersample_counts")  # rows-only: seeded Bernoulli sampling
def q_undersample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 (RandomUnderSampler, ``transform_data.py:107``): downsample the
    majority classes of a synthetic label to ≈minority size. Sampling is
    engine-seeded → no SQL oracle; driver checks rows/schema stability.
    """
    from .ml.imbalance import undersample_majority

    ev = load_table(spark, sf_dir, "events").withColumn(
        "label", (F.col("event_type") == "error").cast("int")
    )
    out = undersample_majority(ev, "label", seed=42)
    return out.groupBy("label").agg(F.count(F.lit(1)).alias("cnt")).orderBy("label")


@register(
    "undersample_exact_counts",
    oracle="""
    WITH c AS (
        SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(LEAST(n, (SELECT MIN(n) FROM c)) AS BIGINT) AS n_kept
    FROM c
    ORDER BY event_type
    """,
)
def q_undersample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 exact variant (``RandomUnderSampler`` draws exactly n_min rows,
    ``transform_data.py:107``): per-class global rank over a seeded-hash
    order via salted two-phase ranking (ml/imbalance.py
    ``undersample_exact``) — every class lands on EXACTLY the minority
    count, which the SQL oracle checks class by class."""
    from .ml.imbalance import undersample_exact

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    out = undersample_exact(ev, "event_type", order_cols=["event_id"], seed=42)
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("event_type")
    )


@register(
    "smote_balanced_counts",
    oracle="""
    WITH c AS (
        SELECT CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS label,
               COUNT(*) AS n
        FROM events GROUP BY 1
    )
    SELECT label, (SELECT MAX(n) FROM c) AS cnt
    FROM c
    ORDER BY label
    """,
)
def q_smote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 (SMOTE, ``transform_data.py:103-111``): LSH-bucketed kNN +
    Arrow-batched interpolation (ml/imbalance.py). The synthetic VALUES
    are engine-specific, but the COUNTS are deterministic by
    construction — exact per-row quotas raise every class to the
    majority count — so the oracle pins both classes at MAX(n):
    upgraded from rows-only to hash-checked (VERDICT r2 item 4
    pattern)."""
    from .ml.imbalance import smote

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_type") == "error").cast("int").alias("label"),
        F.array(
            F.col("value"),
            (F.col("user_id") % 10).cast("double"),
            F.hour("ts").cast("double"),
        ).alias("feat"),
    )
    out = smote(ev, "label", "feat", "event_id", k=5, seed=42)
    return out.groupBy("label").agg(F.count(F.lit(1)).alias("cnt")).orderBy("label")


# ---------------------------------------------------------------------------
# Composite pipelines (bench workloads q2/q4 — BASELINE.md)
# ---------------------------------------------------------------------------


@register(
    "geolocate_events_value",
    oracle="""
    WITH intervals AS (
        SELECT CAST(p_partkey * 2 AS DOUBLE)     AS lo,
               CAST(p_partkey * 2 + 1.5 AS DOUBLE) AS hi,
               p_brand
        FROM part WHERE p_partkey <= 200
    )
    SELECT e.event_id,
           COALESCE(i.p_brand, 'Unknown') AS bucket_brand
    FROM events e
    LEFT JOIN intervals i ON e.value >= i.lo AND e.value <= i.hi
    ORDER BY e.event_id
    """,
)
def q_geolocate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 at fact scale (bench q2): every event's value located in a
    200-interval broadcast dim (gaps → 'Unknown'), the IP-geolocation
    shape of ``transform_data.py:25-47`` with the fact side unshuffled.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    intervals = part.select(
        (F.col("p_partkey") * 2).cast("double").alias("lo"),
        (F.col("p_partkey") * 2 + 1.5).cast("double").alias("hi"),
        F.col("p_brand"),
    )
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    out = geolocate(ev, intervals, ip_col="value", lower="lo", upper="hi",
                    country="p_brand")
    return out.select("event_id", F.col("p_brand").alias("bucket_brand")).orderBy(
        "event_id"
    )


@register(
    "cleaning_chain",
    oracle="""
    WITH txns AS (
        SELECT DISTINCT user_id, event_type, value
        FROM events
        WHERE value IS NOT NULL
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS sum_ip_int
    FROM txns
    """,
)
def q_cleaning_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench q4: the reference cleaning chain (``clean_data.py:71-105``) —
    null-drop → dedup → float-string IP conversion — over events-as-
    transactions, reduced to a checkable row-count + checksum."""
    from .operators.cleaning import clean_transactions

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    cleaned = clean_transactions(
        ev,
        required_column="value",
        ip_column="value",
        ip_int_column="ip_int",
        dedup=True,
    )
    return cleaned.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("ip_int").alias("sum_ip_int"),
    )


# ---------------------------------------------------------------------------
# Text-analysis + dedup + similarity (north-star ops, SURVEY.md §7 Phase 5)
# ---------------------------------------------------------------------------


@register(
    "text_stats",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
           length(text) AS n_chars_txt,
           ROUND((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
                 * 1.0 / length(text), 6) AS punct_ratio
    FROM documents
    ORDER BY doc_id
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality statistics (word/char counts, punctuation density)
    over the documents table — pure columnar, no UDF."""
    from .functions.text import char_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        word_count("text").alias("n_words"),
        char_count("text").alias("n_chars_txt"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
    ).orderBy("doc_id")


@register(
    "token_count_bpeish",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-ish token counting (letter runs / digit runs / single
    punctuation — a deterministic BPE stand-in)."""
    from .functions.text import bpe_ish_token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", bpe_ish_token_count("text").alias("n_tokens")
    ).orderBy("doc_id")


@register(
    "exact_dedup_docs",
    oracle=r"""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
    FROM (SELECT doc_id,
                 trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
          FROM documents)
    GROUP BY norm
    ORDER BY keep_id
    """,
)
def q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized content (operators/dedup.py): survivor id
    + duplicate count per content group. The engine shuffles 8-byte
    fingerprints; the oracle groups the normalized text directly —
    matching output proves the fingerprint grouping is faithful."""
    from .operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs).select("keep_id", "dup_count").orderBy("keep_id")


@register(
    "ngram_jaccard_dups",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS toks
        FROM documents
    ),
    s AS (SELECT doc_id, unnest(range(1, len(toks) - 1)) AS i, toks FROM t WHERE len(toks) >= 3),
    d AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM s),
    n AS (SELECT doc_id, COUNT(*) AS ns FROM d GROUP BY doc_id),
    p AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
        FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT ia AS id_a, ib AS id_b,
           ROUND(c * 1.0 / (na.ns + nb.ns - c), 6) AS jaccard
    FROM p JOIN n na ON na.doc_id = p.ia JOIN n nb ON nb.doc_id = p.ib
    WHERE c * 1.0 / (na.ns + nb.ns - c) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs ≥ 0.5 via the
    inverted-index self-join (operators/dedup.py:ngram_jaccard_pairs)."""
    from .operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, threshold=0.5)
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


@register("minhash_near_dup_docs")  # rows-only: engine-specific hashes
def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128)+LSH(32 bands) candidate pairs with signature
    agreement ≥ 0.5 (operators/dedup.py:minhash_lsh_pairs). Hash values
    are engine-specific → rows-only driver check; pytest cross-checks
    recall against exact Jaccard on fixtures."""
    from .operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(docs, num_hashes=128, bands=32)
    return out.filter(F.col("sig_agreement") >= 0.5).select(
        "id_a", "id_b", F.round("sig_agreement", 6).alias("sig_agreement")
    ).orderBy("id_a", "id_b")


@register(
    "minhash_recall_supercheck",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS toks
        FROM documents
    ),
    s AS (SELECT doc_id, unnest(range(1, len(toks) - 1)) AS i, toks FROM t WHERE len(toks) >= 3),
    d AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM s),
    n AS (SELECT doc_id, COUNT(*) AS ns FROM d GROUP BY doc_id),
    p AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
        FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT ia AS id_a, ib AS id_b,
           ROUND(c * 1.0 / (na.ns + nb.ns - c), 6) AS jaccard
    FROM p JOIN n na ON na.doc_id = p.ia JOIN n nb ON nb.doc_id = p.ib
    WHERE c * 1.0 / (na.ns + nb.ns - c) >= 0.7
    ORDER BY id_a, id_b
    """,
)
def q_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH recall made SQL-checkable (VERDICT r2 item 4): exact
    3-gram-Jaccard pairs at ≥ 0.7 — a margin above the 128-hash/32-band
    LSH S-curve knee, where expected recall is ≥ 0.999 — semi-joined
    against the LSH candidate set. The query equals the exact pair set
    iff LSH missed NOTHING above the margin, so the DuckDB oracle (which
    knows nothing of MinHash) hash-verifies the recall property; a
    single missed pair turns the row red. Empirically 0 misses at both
    sf0.01 and sf0.1."""
    from .operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs(docs, threshold=0.7)
    candidates = minhash_lsh_pairs(docs, num_hashes=128, bands=32).select(
        "id_a", "id_b"
    )
    return (
        exact.join(candidates, ["id_a", "id_b"], "left_semi")
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


@register(
    "tfidf_top_terms",
    oracle=r"""
    WITH tk AS (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
        FROM documents
    ),
    tf AS (
        SELECT doc_id, t AS term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS t FROM tk)
        WHERE t <> ''
        GROUP BY 1, 2
    ),
    n AS (SELECT COUNT(*) AS n FROM documents),
    d AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id, tf.term, tf.tf,
           ROUND(ln((n.n + 1.0) / (d.df + 1.0)) + 1.0, 6) AS idf,
           ROUND(tf.tf * (ln((n.n + 1.0) / (d.df + 1.0)) + 1.0), 4) AS tfidf
    FROM tf JOIN d USING (term) CROSS JOIN n
    ORDER BY tfidf DESC, tf.doc_id, tf.term
    LIMIT 20
    """,
)
def q_tfidf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF weighting (operators/search.py:tfidf_weights,
    smoothed-idf sklearn variant): the feature-building twin of BM25 —
    every (doc, term) weighted, global top-20 by weight with a total
    deterministic tie-break. TakeOrderedAndProject caps network traffic
    at k rows per partition."""
    from .operators.search import tfidf_weights

    docs = load_table(spark, sf_dir, "documents")
    w = tfidf_weights(docs)
    return w.orderBy(F.desc("tfidf"), "doc_id", "term").limit(20)


@register(
    "contamination_13gram",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS toks
        FROM documents
    ),
    d AS (
        SELECT DISTINCT doc_id, list_aggregate(toks[i:i+12], 'string_agg', ' ') AS sh
        FROM (SELECT doc_id, unnest(range(1, len(toks) - 11)) AS i, toks
              FROM t WHERE len(toks) >= 13)
        UNION
        SELECT DISTINCT doc_id, list_aggregate(toks, 'string_agg', ' ') AS sh
        FROM t WHERE len(toks) < 13
    ),
    probe  AS (SELECT doc_id AS pid, sh FROM d WHERE doc_id % 50 = 0),
    corpus AS (SELECT * FROM d WHERE doc_id % 50 <> 0)
    SELECT c.doc_id,
           COUNT(DISTINCT c.sh)  AS n_hit_ngrams,
           COUNT(DISTINCT p.pid) AS n_probe_docs
    FROM corpus c JOIN probe p ON c.sh = p.sh
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set decontamination (operators/dedup.py:
    ngram_contamination): corpus docs sharing any 13-gram with the
    benchmark probe set (here: every 50th doc_id standing in for an eval
    set). The corpus side never shuffles — probe shingle hashes
    broadcast; the oracle recomputes the collision join on raw shingle
    strings, value-checking the whole hash-join path."""
    from .operators.dedup import ngram_contamination

    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return ngram_contamination(corpus, probes, n=13).orderBy("doc_id")


@register("simhash_near_dup_docs")  # rows-only: engine-specific hashes
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3) with pigeonhole chunk
    blocking (operators/dedup.py:simhash_near_dup_pairs)."""
    from .operators.dedup import simhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs, max_hamming=3).orderBy("id_a", "id_b")


@register(
    "lang_id_distribution",
    oracle=r"""
    WITH toks AS (
        SELECT list_transform(regexp_split_to_array(trim(text), '\s+'),
                              x -> lower(x)) AS t
        FROM documents
    ), s AS (
        SELECT
            len(list_filter(t, x -> list_contains(
                ['the','of','and','to','in','a','is','that','for','it'], x))) AS s_en,
            len(list_filter(t, x -> list_contains(
                ['de','la','que','el','en','y','los','del','se','las'], x))) AS s_es,
            len(list_filter(t, x -> list_contains(
                ['de','la','le','et','les','des','en','un','du','une'], x))) AS s_fr,
            len(list_filter(t, x -> list_contains(
                ['der','die','und','in','den','von','zu','das','mit','sich'], x))) AS s_de
        FROM toks
    )
    SELECT CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                ELSE 'de' END AS pred_lang,
           COUNT(*) AS cnt
    FROM s
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID distribution over documents
    (functions/text.py:lang_id — stopword-profile argmax; ties go to the
    lexicographically greatest language code, matching array_max on
    (score, lang) structs)."""
    from .functions.text import lang_id

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(lang_id("text").alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("pred_lang")
    )


@register(
    "quality_score_deciles",
    oracle=r"""
    WITH base AS (
        SELECT text,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS toks,
               length(text) AS n
        FROM documents
    ), c AS (
        SELECT len(toks) AS wc,
               CASE WHEN n > 0 THEN
                   (n - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::DOUBLE / n
               ELSE 0.0 END AS pr,
               CASE WHEN len(toks) > 0 THEN
                   len(list_filter(toks, x -> list_contains(
                       ['the','of','and','to','in','a','is','that','for','it'],
                       lower(x))))::DOUBLE / len(toks)
               ELSE 0.0 END AS sr,
               CASE WHEN len(toks) > 0 THEN
                   list_sum(list_transform(toks, x -> length(x)::DOUBLE)) / len(toks)
               ELSE 0.0 END AS mwl
        FROM base
    ), q AS (
        SELECT (CASE WHEN wc BETWEEN 10 AND 100000 THEN 1.0
                     ELSE least(wc / 10.0, 1.0) END) * 0.3
             + (1.0 - least(pr * 4.0, 1.0)) * 0.3
             + least(sr * 5.0, 1.0) * 0.2
             + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2
               AS quality
        FROM c
    )
    SELECT CAST(least(floor(quality * 10), 9) AS INT) AS decile,
           COUNT(*) AS cnt
    FROM q
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality-score histogram (functions/text.py:quality_score)."""
    from .functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.least(F.floor(quality_score("text") * 10), F.lit(9)).cast("int")
    return (
        docs.select(bucket.alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("decile")
    )


@register(
    "doc_fingerprint_cardinality",
    oracle=r"""
    SELECT COUNT(DISTINCT trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS n_distinct_content,
           COUNT(*) AS n_docs
    FROM documents
    """,
)
def q_fingerprint_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-fingerprint cardinality == distinct normalized text
    (validates xxhash64 fingerprinting without comparing raw hashes)."""
    from .functions.text import doc_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.countDistinct(doc_fingerprint("text")).alias("n_distinct_content"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "embedding_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    s AS (
        SELECT e.vec_id,
               list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS cs
        FROM embeddings e CROSS JOIN q
    )
    SELECT vec_id, ROUND(cs, 6) AS cosine_sim
    FROM s
    ORDER BY cs DESC, vec_id
    LIMIT 10
    """,
)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 to the vec_id=0 embedding
    (operators/similarity.py:cosine_topk): narrow map +
    TakeOrderedAndProject, double-precision zip_with arithmetic."""
    from .operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = cosine_topk(emb, query, k=10)
    return out.select(
        "vec_id", F.round("cosine_sim", 6).alias("cosine_sim")
    ).orderBy(F.desc("cosine_sim"), "vec_id")


@register("embedding_ann_topk")  # rows-only: LSH recall is probabilistic
def q_embedding_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN top-10 for the vec_id=0 query
    (operators/similarity.py:ann_topk_lsh); pytest checks top-1 recall."""
    from .operators.similarity import ann_topk_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = ann_topk_lsh(emb, query, k=10, bits=12, probe_hamming=3)
    return out.select(
        "vec_id", F.round("cosine_sim", 6).alias("cosine_sim")
    ).orderBy(F.desc("cosine_sim"), "vec_id")


@register(
    "embedding_near_dup_exact",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.45
    ORDER BY id_a, id_b
    """,
)
def q_embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs (cosine ≥ 0.45) — the brute-force
    baseline the LSH variant approximates, via the blocked-BLAS
    all-pairs operator (operators/similarity.py:cosine_all_pairs_exact;
    the expression-level broadcast self-join was interpreted per pair
    and ~50× slower). The LSH path (below) is the 100 TB strategy."""
    from .operators.similarity import cosine_all_pairs_exact

    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_all_pairs_exact(emb, 0.45)
    return out.select(
        "id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim")
    ).orderBy("id_a", "id_b")


@register("embedding_near_dup_pairs")  # rows-only: LSH recall is probabilistic
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicates (cosine ≥ 0.4) among hyperplane-bucket
    mates (operators/similarity.py:cosine_near_dup_pairs) — the
    bucketed approximation of embedding_near_dup_exact."""
    from .operators.similarity import cosine_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_near_dup_pairs(emb, threshold=0.4, bits=4, dim=64)
    return out.select(
        "id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim")
    ).orderBy("id_a", "id_b")


@register(
    "embedding_lsh_precision_union",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.45
    ORDER BY id_a, id_b
    """,
)
def q_lsh_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH precision made SQL-checkable (VERDICT r2 item 4):
    the union of the exact pair set (cos ≥ 0.45) with the LSH bucketed
    candidates at the same threshold, distinct on pair ids. The LSH
    operator re-ranks bucket mates with exact cosine before emitting, so
    every candidate MUST already be in the exact set — the union equals
    the exact set iff LSH emitted no false positive, which the DuckDB
    oracle verifies without knowing the bucketing. (Recall is covered by
    the minhash supercheck pattern; single-shot hyperplane buckets make
    no recall guarantee, and the exact twin embedding_near_dup_exact is
    the anchored baseline.)"""
    from .operators.similarity import cosine_all_pairs_exact, cosine_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_all_pairs_exact(emb, 0.45).select("id_a", "id_b")
    lsh = cosine_near_dup_pairs(emb, threshold=0.45, bits=4, dim=64).select(
        "id_a", "id_b"
    )
    return exact.union(lsh).distinct().orderBy("id_a", "id_b")


@register(
    "ivf_full_probe_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    s AS (
        SELECT e.vec_id,
               list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS cs
        FROM embeddings e CROSS JOIN q
    )
    SELECT vec_id, ROUND(cs, 6) AS cosine_sim
    FROM s
    ORDER BY cs DESC, vec_id
    LIMIT 10
    """,
)
def q_ivf_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF completeness made SQL-checkable (VERDICT r2 item 4): probing
    ALL cells (nprobe = n_centroids) makes IVF exhaustive, so its top-k
    must equal the brute-force oracle exactly — proving the coarse
    quantizer assigns every vector to exactly one cell and the
    cell-pruned search loses nothing when no cell is pruned. The
    embedding_ivf_topk query keeps exercising the pruned (nprobe=8)
    fast path as a rows-only entry."""
    from .operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = ivf_topk(emb, query, k=10, n_centroids=16, nprobe=16)
    return out.select(
        "vec_id", F.round("cosine_sim", 6).alias("cosine_sim")
    ).orderBy(F.desc("cosine_sim"), "vec_id")


# ---------------------------------------------------------------------------
# Streaming batch forms (SURVEY.md §7 Phase 4): identical plans run on a
# stream via streaming/windows.py; the batch form is the oracle surface.
# ---------------------------------------------------------------------------


@register(
    "tumbling_counts_6h",
    oracle="""
    SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS win_start_us,
           user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start_us, user_id
    """,
)
def q_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window per-user counts (streaming/windows.py
    tumbling_event_counts, run here in batch form — the exact plan a
    readStream would execute incrementally). Epoch-aligned 6h buckets.
    """
    from .streaming.windows import tumbling_event_counts

    ev = load_table(spark, sf_dir, "events").select("ts", "user_id", "value")
    out = tumbling_event_counts(ev, ["user_id"], window="6 hours")
    return out.select(
        F.unix_micros("win_start").alias("win_start_us"),
        "user_id",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    ).orderBy("win_start_us", "user_id")


@register(
    "sliding_counts_24h_6h",
    oracle="""
    SELECT ((epoch_us(ts) // 21600000000) - k.k) * 21600000000 AS win_start_us,
           user_id,
           COUNT(*) AS n_events
    FROM events CROSS JOIN range(0, 4) k(k)
    GROUP BY 1, 2
    ORDER BY win_start_us, user_id
    """,
)
def q_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (24h window / 6h slide) per-user counts
    (streaming/windows.py sliding_event_counts, batch form). Every event
    lands in window/slide = 4 epoch-aligned windows.
    """
    from .streaming.windows import sliding_event_counts

    ev = load_table(spark, sf_dir, "events").select("ts", "user_id")
    out = sliding_event_counts(ev, ["user_id"], window="24 hours", slide="6 hours")
    return out.select(
        F.unix_micros("win_start").alias("win_start_us"), "user_id", "n_events"
    ).orderBy("win_start_us", "user_id")


@register("embedding_ivf_topk")  # rows-only: IVF recall is probabilistic
def q_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN top-k (operators/similarity.py:ivf_topk): coarse
    quantization to sampled centroids, nprobe nearest cells, exact
    re-rank — the partition-pruning scale path next to the LSH variant.
    """
    from .operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = [0.1] * 64
    out = ivf_topk(emb, q, k=10, n_centroids=16, nprobe=8)
    return out.select("vec_id", F.round("cosine_sim", 6).alias("cosine_sim"))


@register(
    "revenue_rollup_region_nation",
    oracle="""
    SELECT r_name, n_name,
           ROUND(SUM(c_acctbal), 4) AS sum_acctbal,
           COUNT(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup aggregate (SURVEY.md §2.4 'absent in reference,
    built-in if needed'): region → nation → grand total in one pass.
    Spark plans this as a single Expand + hash aggregate — one shuffle
    for all grouping levels, not one scan per level.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 4).alias("sum_acctbal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


@register(
    "salted_agg_event_type",
    oracle="""
    SELECT event_type,
           ROUND(SUM(value), 4) AS total_value,
           COUNT(*) AS n,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/skew.py:salted_agg):
    per-(key, salt) partials then a merge by key. Exact for algebraic
    aggregates under ANY salt assignment — which is what this oracle
    proves against the plain GROUP BY.
    """
    from .operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "total_value": ("value", "sum"),
            "n": ("event_id", "count"),
            "max_value": ("value", "max"),
        },
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        F.round("total_value", 4).alias("total_value"),
        "n",
        F.round("max_value", 4).alias("max_value"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# More coverage: quantiles, imputation, set algebra, multimodal plumbing
# ---------------------------------------------------------------------------


@register(
    "quantiles_value",
    oracle="""
    SELECT ROUND(quantile_cont(value, 0.25), 6) AS q25,
           ROUND(quantile_cont(value, 0.50), 6) AS q50,
           ROUND(quantile_cont(value, 0.75), 6) AS q75
    FROM events
    """,
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles (A3's describe() quartiles, done
    exactly): Spark's `percentile` ≡ DuckDB quantile_cont. At 100 TB use
    percentile_approx (one-pass sketch); the exact form is the oracle
    anchor for it.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("q50"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("q75"),
    )


@register(
    "impute_value_mean",
    oracle="""
    WITH src AS (
        SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        FROM events
    ), m AS (SELECT AVG(v) AS mv FROM src)
    SELECT ROUND(SUM(COALESCE(v, mv)), 4) AS total,
           COUNT(*) AS n,
           ROUND(AVG(COALESCE(v, mv)), 6) AS mean_after
    FROM src, m
    """,
)
def q_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 'impute' strategy (the reference left it as a warning stub,
    clean_data.py:24-25; we implement the intended mean-impute). Nulls
    are synthesized deterministically, imputed via
    operators/cleaning.py:handle_missing_values, then profiled.
    """
    from .operators.cleaning import handle_missing_values

    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")).alias("v")
    )
    imp = handle_missing_values(ev, "v", "impute")
    return imp.agg(
        F.round(F.sum("v"), 4).alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("v"), 6).alias("mean_after"),
    )


@register(
    "user_set_algebra",
    oracle="""
    WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         viewers  AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
    SELECT (SELECT COUNT(*) FROM (SELECT * FROM clickers INTERSECT SELECT * FROM viewers)) AS both_types,
           (SELECT COUNT(*) FROM (SELECT * FROM clickers EXCEPT SELECT * FROM viewers))    AS click_only,
           (SELECT COUNT(*) FROM (SELECT * FROM clickers UNION SELECT * FROM viewers))     AS either_type
    """,
)
def q_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set operations (absent in the reference, exposed by the
    engine): intersect / except / union over user sets.

    Single-job form: one conditional aggregation over a full-outer join
    of the two distinct user sets — no driver-side ``.count()`` actions
    folded into literals (each of those was a separate Spark job plus a
    driver round-trip). Both sides share the user_id shuffle key, so the
    distinct + join pipeline into one exchange per side.
    """
    ev = load_table(spark, sf_dir, "events")
    clickers = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
        .withColumn("__c", F.lit(1))
    )
    viewers = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .withColumn("__v", F.lit(1))
    )
    joined = clickers.join(viewers, "user_id", "full_outer")
    return joined.agg(
        F.count(F.when(F.col("__c").isNotNull() & F.col("__v").isNotNull(), 1)).alias(
            "both_types"
        ),
        F.count(F.when(F.col("__c").isNotNull() & F.col("__v").isNull(), 1)).alias(
            "click_only"
        ),
        F.count(F.lit(1)).alias("either_type"),
    )


@register(
    "media_feature_profile",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           ROUND(list_avg(list_transform(range(1, 65),
                 i -> CASE WHEN i <= length(text) THEN ascii(text[i]) ELSE 0 END)), 6)
               AS mean_intensity
    FROM documents
    ORDER BY doc_id
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing (operators/multimodal.py): documents' text
    encoded to an opaque binary payload column, decoded by the
    deterministic stand-in decoder (8×8 grid from the first 64 bytes,
    zero-padded) via mapInPandas. mean_intensity is byte-exact, so the
    whole binary→Arrow→kernel→schema path is value-checked against SQL.
    """
    from .operators.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    feats = extract_features(docs, payload_col="payload", id_col="doc_id")
    return feats.select(
        "doc_id", "n_bytes", F.round("mean_intensity", 6).alias("mean_intensity")
    ).orderBy("doc_id")


@register(
    "interval_join_binned",
    oracle="""
    WITH intervals AS (
        SELECT CAST(p_partkey * 2 AS DOUBLE)       AS lo,
               CAST(p_partkey * 2 + 1.5 AS DOUBLE) AS hi,
               p_brand
        FROM part WHERE p_partkey <= 200
    )
    SELECT e.event_id,
           COALESCE(i.p_brand, 'Unknown') AS bucket_brand
    FROM events e
    LEFT JOIN intervals i ON e.value >= i.lo AND e.value <= i.hi
    ORDER BY e.event_id
    """,
)
def q_interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The large-dim interval-join path (operators/joins.py:
    binned_range_join): bin-explode the dim, hash-join on the bin key,
    exact-bound residual — an ordinary shuffle join instead of a
    broadcast nested loop, for when the dim outgrows the broadcast
    threshold. Same oracle as the broadcast form: identical semantics.
    """
    from .operators.joins import binned_range_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    dim = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 200)
        .select(
            (F.col("p_partkey") * F.lit(2.0)).alias("lo"),
            (F.col("p_partkey") * F.lit(2.0) + F.lit(1.5)).alias("hi"),
            "p_brand",
        )
    )
    out = binned_range_join(ev, dim, "value", "lo", "hi", ["p_brand"], how="left")
    return out.select(
        "event_id", F.coalesce("p_brand", F.lit("Unknown")).alias("bucket_brand")
    ).orderBy("event_id")


@register(
    "frame_sample_profile",
    oracle="""
    SELECT doc_id, f.f AS frame_idx,
           ROUND(list_avg(list_transform(range(1, 9),
                 j -> CASE WHEN f.f * 8 + j <= length(text)
                           THEN ascii(text[f.f * 8 + j]) ELSE 0 END)), 6)
               AS frame_mean
    FROM documents CROSS JOIN (SELECT unnest([0, 4]) AS f) f
    ORDER BY doc_id, frame_idx
    """,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling (operators/multimodal.py:frame_sample):
    every-4th 'frame' (8-byte stripe of the stand-in decode) per doc —
    the explode-shaped (id, frame_idx, feat) contract, byte-exact
    against SQL on the frame means.
    """
    from .operators.multimodal import frame_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    frames = frame_sample(docs, payload_col="payload", id_col="doc_id", every_n=4)
    mean = F.aggregate(
        "frame_feat", F.lit(0.0), lambda a, v: a + v, lambda a: a / F.lit(8.0)
    )
    return frames.select(
        "doc_id", "frame_idx", F.round(mean, 6).alias("frame_mean")
    ).orderBy("doc_id", "frame_idx")


@register(
    "wav_decode_profile",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               list_transform(range(0, 16 + doc_id % 17),
                   i -> CAST((doc_id * 31 + i * 7) % 201 - 100 AS DOUBLE)) AS xs
        FROM documents
    ), m AS (
        SELECT doc_id, xs, list_avg(xs) AS mu FROM s
    )
    SELECT doc_id,
           44 + 2 * len(xs) AS n_bytes,
           FLOOR(mu * 1000000 + 0.5) / 1000000 AS mean_sample,
           FLOOR(sqrt(list_avg(list_transform(xs, x -> (x - mu) * (x - mu))))
                 * 1000000 + 0.5) / 1000000 AS std_sample
    FROM m
    ORDER BY doc_id
    """,
)
def q_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV decode end-to-end under ``strict=True`` (no stand-in):
    a deterministic int16 PCM waveform is synthesized per doc_id
    (sample[i] = (d*31 + i*7) % 201 - 100, n = 16 + d%17), encoded to
    RIFF/WAVE bytes with the stdlib ``wave`` writer, and decoded back by
    operators/multimodal.py:decode_wav inside the Arrow mapInPandas
    feature kernel. n_bytes pins the 44-byte-header + 2n layout; mean
    and population std of the decoded samples match SQL computing the
    same statistics straight from the generator formula — so header
    parse, sample width, endianness, and dtype are all value-checked.
    """
    import numpy as np
    import pandas as pd

    from .operators.multimodal import extract_features, wav_bytes

    out_schema = "doc_id long, payload binary"

    def synth(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            payloads = []
            for d in ids:
                n = 16 + d % 17
                i = np.arange(n, dtype=np.int64)
                samples = (d * 31 + i * 7) % 201 - 100
                payloads.append(wav_bytes(samples))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(synth, out_schema)
    feats = extract_features(
        media, payload_col="payload", id_col="doc_id",
        decoder="wav", strict=True,
    )
    from .functions.rounding import round_floor

    return feats.select(
        "doc_id",
        "n_bytes",
        round_floor("mean_intensity", 6).alias("mean_sample"),
        round_floor("std_intensity", 6).alias("std_sample"),
    ).orderBy("doc_id")


@register(
    "ppm_decode_profile",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        FROM documents
    )
    SELECT doc_id,
           11 + 3 * w * h AS n_bytes,
           FLOOR(list_avg(list_transform(range(0, 3 * w * h),
                 k -> CAST((doc_id * 7 + k * 13) % 256 AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000 AS mean_pixel
    FROM dims
    ORDER BY doc_id
    """,
)
def q_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL binary-PPM (P6) decode end-to-end under ``strict=True``: a
    deterministic (h, w, 3) RGB raster is synthesized per doc_id
    (pixel at linear index k = (d*7 + k*13) % 256, w = 4 + d%5,
    h = 3 + d%4), encoded by ppm_bytes, decoded by the hand-written
    header parser in operators/multimodal.py:decode_pnm. n_bytes pins
    the exact header+raster length (single-digit dims → 11-byte
    header); the mean over decoded pixels matches SQL computing it from
    the generator formula, value-checking the raster layout.
    """
    import numpy as np
    import pandas as pd

    from .operators.multimodal import extract_features, ppm_bytes

    out_schema = "doc_id long, payload binary"

    def synth(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            payloads = []
            for d in ids:
                w, h = 4 + d % 5, 3 + d % 4
                k = np.arange(h * w * 3, dtype=np.int64)
                pixels = ((d * 7 + k * 13) % 256).reshape(h, w, 3)
                payloads.append(ppm_bytes(pixels))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(synth, out_schema)
    feats = extract_features(
        media, payload_col="payload", id_col="doc_id",
        decoder="pnm", strict=True,
    )
    from .functions.rounding import round_floor

    return feats.select(
        "doc_id",
        "n_bytes",
        round_floor("mean_intensity", 6).alias("mean_pixel"),
    ).orderBy("doc_id")


@register(
    "user_sessions_30m",
    oracle="""
    WITH t AS (
        SELECT user_id, epoch_us(ts) AS ts_us
        FROM events
    ), flagged AS (
        SELECT user_id, ts_us,
               CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                         > 1800000000 THEN 1 ELSE 0 END AS new_s
        FROM t
    ), sessions AS (
        SELECT user_id,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           COUNT(DISTINCT session_id) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (operators/windows.py:sessionize): 30-minute-gap
    gaps-and-islands per user — one window shuffle; the batch oracle of
    the streaming session_window form (streaming/windows.py).
    """
    from .operators.windows import sessionize

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    s = sessionize(ev, "user_id", "ts_us", gap_seconds=1800, tick=1_000_000)
    return (
        s.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "pivot_user_event_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot / crosstab: per-user event-type matrix. Pinned pivot values
    keep it one pass (no extra distinct-values job) — the form that
    scales; unpinned pivot first runs a distinct scan.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .count()
        .na.fill(0, ["click", "view", "purchase", "error"])
        .orderBy("user_id")
    )


@register(
    "cube_type_hourband",
    oracle="""
    WITH t AS (
        SELECT event_type,
               CASE WHEN hour(ts) < 12 THEN 'am' ELSE 'pm' END AS hour_band,
               value
        FROM events
    )
    SELECT event_type, hour_band,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total
    FROM t
    GROUP BY CUBE (event_type, hour_band)
    ORDER BY event_type NULLS FIRST, hour_band NULLS FIRST
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, am/pm): all 4 grouping levels in one
    Expand + single agg shuffle (same machinery as rollup; the full
    grouping-sets lattice)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.hour("ts") < 12, "am").otherwise("pm").alias("hour_band"),
        "value",
    )
    return (
        ev.cube("event_type", "hour_band")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .orderBy(F.asc_nulls_first("event_type"), F.asc_nulls_first("hour_band"))
    )


@register(
    "sql_surface_top_nations",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_cust, ROUND(SUM(c.c_acctbal), 4) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY total_bal DESC, n.n_name
    LIMIT 10
    """,
)
def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw spark.sql surface end-to-end: Catalog registers the
    testdata star schema as temp views (catalog.py:Catalog), then the
    query is plain SQL — same Catalyst plan as the DataFrame form.
    """
    from .catalog import Catalog

    Catalog(spark, sf_dir)  # registers temp views
    return spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_cust,
               ROUND(SUM(c.c_acctbal), 4) AS total_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY total_bal DESC, n.n_name
        LIMIT 10
        """
    )


# ---------------------------------------------------------------------------
# SQL-surface depth: subqueries, grouping sets, string/date functions,
# distribution windows, text repetition, clustering
# ---------------------------------------------------------------------------


@register(
    "exists_big_spenders",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q_exists_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL surface: Catalyst's
    RewritePredicateSubquery decorrelates both into a left-semi and a
    left-anti hash join against orders — no per-row subquery execution
    (contrast the reference's row-wise apply escapes,
    src/preprocessing/transform_data.py:38-43).
    """
    from .catalog import Catalog

    Catalog(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_cust
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        GROUP BY n.n_name
        ORDER BY n.n_name
        """
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT r.r_name, o.o_orderpriority,
           GROUPING(r.r_name) AS g_region,
           GROUPING(o.o_orderpriority) AS g_priority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 4) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r.r_name, o.o_orderpriority), (r.r_name), ())
    ORDER BY g_region, g_priority, r.r_name NULLS FIRST,
             o.o_orderpriority NULLS FIRST
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general lattice underlying
    rollup/cube) + GROUPING() null-vs-total disambiguation flags. One
    Expand node feeding a single partial+final hash agg — 3 grouping
    levels in one shuffle instead of 3 unioned scans.
    """
    from .catalog import Catalog

    Catalog(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name, o.o_orderpriority,
               GROUPING(r.r_name) AS g_region,
               GROUPING(o.o_orderpriority) AS g_priority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o.o_totalprice), 4) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY GROUPING SETS ((r.r_name, o.o_orderpriority), (r.r_name), ())
        ORDER BY g_region, g_priority, r.r_name NULLS FIRST,
                 o.o_orderpriority NULLS FIRST
        """
    )


@register(
    "string_funcs_docs",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT REGEXP_EXTRACT(text, '^(\\w+)', 1)) AS n_first_words,
           ROUND(AVG(LENGTH(text)), 6) AS avg_len,
           MAX(UPPER(SUBSTRING(source, 1, 4))) AS max_src4,
           MIN(CONCAT(lang, ':', SUBSTRING(text, 1, 3))) AS min_prefix
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (F-bucket beyond the reference's F6-F8):
    regexp_extract / substring / upper / concat — all JVM codegen
    expressions, column-pruned to (text, lang, source) at the scan.
    AVG(LENGTH) divides an exact integer sum, so the 6-dp round is
    cross-engine stable (no float summation-order ties).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.regexp_extract("text", r"^(\w+)", 1)).alias("n_first_words"),
            F.round(F.avg(F.length("text")), 6).alias("avg_len"),
            F.max(F.upper(F.substring("source", 1, 4))).alias("max_src4"),
            F.min(F.concat(F.col("lang"), F.lit(":"), F.substring("text", 1, 3))).alias(
                "min_prefix"
            ),
        )
        .orderBy("lang")
    )


@register(
    "monthly_revenue",
    oracle="""
    SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS revenue
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation via date_trunc — the batch twin of the
    streaming tumbling window (streaming/windows.py). Month buckets are
    exported as integer epoch-micros per the cross-engine convention.
    At scale this grouping matches a `PARTITIONED BY (month)` layout, so
    the agg becomes partition-local.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.unix_micros(F.date_trunc("month", F.col("o_orderdate"))).alias("month_us"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .orderBy("month_us")
    )


@register(
    "ntile_quartiles_priority",
    oracle="""
    WITH t AS (
        SELECT o_orderpriority,
               o_totalprice,
               NTILE(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders
    )
    SELECT o_orderpriority, quartile,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 4) AS lo,
           ROUND(MAX(o_totalprice), 4) AS hi
    FROM t
    GROUP BY o_orderpriority, quartile
    ORDER BY o_orderpriority, quartile
    """,
)
def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE distribution window (W2 family): quartile assignment inside
    each priority partition, tie-broken by o_orderkey for cross-engine
    determinism. Partitioned window → parallel per priority; a GLOBAL
    ntile would serialize into one partition — at scale use
    approx-quantile bucketing instead (aggregates.py:quantiles).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    t = orders.select(
        "o_orderpriority", "o_totalprice", F.ntile(4).over(w).alias("quartile")
    )
    return (
        t.groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
        .orderBy("o_orderpriority", "quartile")
    )


@register(
    "word_repetition_by_lang",
    oracle="""
    WITH t AS (
        SELECT lang,
               len(string_split(text, ' ')) AS n_words,
               len(list_distinct(string_split(text, ' '))) AS n_distinct
        FROM documents
    )
    SELECT lang,
           ROUND(1.0 - CAST(SUM(n_distinct) AS DOUBLE) / SUM(n_words), 6)
               AS repetition,
           ROUND(MIN(CAST(n_distinct AS DOUBLE) / n_words), 6) AS min_distinct_ratio,
           ROUND(MAX(CAST(n_distinct AS DOUBLE) / n_words), 6) AS max_distinct_ratio
    FROM t
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_word_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition / boilerplate signal for corpus quality filtering
    (north-star text analysis, next to quality_score_deciles): fraction
    of duplicated words per language. Pure array expressions
    (split/array_distinct/size) — no explode shuffle, no UDF. The
    aggregate divides two exact integer sums (not an AVG of per-doc
    floats), so the 6-dp round has no summation-order tie.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    t = docs.select(
        "lang",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.round(
                1.0 - F.sum("n_distinct").cast("double") / F.sum("n_words"), 6
            ).alias("repetition"),
            F.round(
                F.min(F.col("n_distinct").cast("double") / F.col("n_words")), 6
            ).alias("min_distinct_ratio"),
            F.round(
                F.max(F.col("n_distinct").cast("double") / F.col("n_words")), 6
            ).alias("max_distinct_ratio"),
        )
        .orderBy("lang")
    )


@register("kmeans_cluster_profile")
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means over the embeddings corpus (ml/clustering.py,
    MLlib k-means|| — iterative, so rows-only oracle per SURVEY.md §5.1):
    cluster sizes + within-cluster mean norm. The fitted centroids are
    the trained-cell path for ivf_topk (embedding_ivf_topk query uses
    the seeded-sample path; test_ml covers the trained path).
    """
    from .ml.clustering import kmeans_assign, kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    model = kmeans_fit(emb, k=8, vec_col="embedding", seed=42)
    assigned = kmeans_assign(emb, model, vec_col="embedding")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    return (
        assigned.select("cluster", norm.alias("norm"))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("norm"), 4).alias("avg_norm"))
        .orderBy("cluster")
    )


@register(
    "top_words",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def q_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-frequency (the explode/unnest surface + heavy-hitter
    shape). explode multiplies rows by ~|tokens|, but partial hash agg
    runs map-side BEFORE the shuffle, so the exchange carries only the
    per-task vocabulary — at 100 TB the shuffle is |vocab|-bounded, not
    |tokens|-bounded. Deterministic tie-break (count desc, word asc)
    → TakeOrderedAndProject, no global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


@register(
    "monthly_revenue_gapfill",
    oracle="""
    WITH b AS (SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
                      date_trunc('month', MAX(o_orderdate)) AS hi
               FROM orders),
    m AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month FROM b),
    r AS (SELECT date_trunc('month', o_orderdate) AS month,
                 COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS rev
          FROM orders GROUP BY 1)
    SELECT epoch_us(m.month) AS month_us,
           COALESCE(r.n, 0) AS n_orders,
           COALESCE(r.rev, 0.0) AS revenue
    FROM m LEFT JOIN r USING (month)
    ORDER BY month_us
    """,
)
def q_monthly_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (gap-filled) time series: generate the full month calendar
    with sequence()+explode from the data's own bounds, left-join the
    sparse aggregate onto it, zero-fill. The calendar side is tiny (one
    row per bucket) so the join broadcasts; the expensive side is the
    same single-shuffle agg as monthly_revenue. This is the batch answer
    to "windows with no events must still emit" (streaming cousin:
    watermarked windows emit only observed keys — gap-fill is a join).
    """
    orders = load_table(spark, sf_dir, "orders")
    months = (
        orders.agg(
            F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
            F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
        )
        .select(
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 month"))).alias("month")
        )
    )
    rev = orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 4).alias("rev")
    )
    return (
        months.join(rev, "month", "left")
        .select(
            F.unix_micros("month").alias("month_us"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
            F.coalesce("rev", F.lit(0.0)).alias("revenue"),
        )
        .orderBy("month_us")
    )


@register(
    "redact_ids_cardinality",
    oracle="""
    SELECT c_nationkey,
           COUNT(DISTINCT REGEXP_REPLACE(c_name, '#\\d+', '#[ID]')) AS n_masked,
           COUNT(DISTINCT c_name) AS n_raw
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_redact_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction / PII-masking shape for corpus pipelines:
    regexp_replace collapses identifier tokens, and the query proves the
    cardinality collapse (n_masked << n_raw) per group. Pure codegen
    expression — the pattern avoids lookarounds so Java regex and RE2
    (DuckDB) agree.
    """
    cust = load_table(spark, sf_dir, "customer")
    masked = F.regexp_replace(F.col("c_name"), r"#\d+", "#[ID]")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.count_distinct(masked).alias("n_masked"),
            F.count_distinct("c_name").alias("n_raw"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "stats_corr_by_type",
    oracle="""
    SELECT event_type,
           ROUND(corr(value, hour(ts)), 5) AS corr_value_hour,
           ROUND(covar_samp(value, hour(ts)), 5) AS covar_value_hour,
           ROUND(stddev_samp(value), 5) AS sd_value,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface (corr / covar_samp / stddev_samp —
    the df.stat family as declarative aggregates): single-pass
    partial+final hash agg, one shuffle of |groups| rows; nothing is
    collected to the driver (contrast pandas .corr() which needs the
    whole column in RAM).
    """
    ev = load_table(spark, sf_dir, "events")
    h = F.hour("ts").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.corr("value", h), 5).alias("corr_value_hour"),
            F.round(F.covar_samp("value", h), 5).alias("covar_value_hour"),
            F.round(F.stddev_samp("value"), 5).alias("sd_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "dup_clusters",
    oracle=r"""
    WITH RECURSIVE t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS toks
        FROM documents
    ),
    s AS (SELECT doc_id, unnest(range(1, len(toks) - 1)) AS i, toks FROM t WHERE len(toks) >= 3),
    d AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM s),
    n AS (SELECT doc_id, COUNT(*) AS ns FROM d GROUP BY doc_id),
    p AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
        FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pq AS (
        SELECT ia, ib
        FROM p JOIN n na ON na.doc_id = p.ia JOIN n nb ON nb.doc_id = p.ib
        WHERE c * 1.0 / (na.ns + nb.ns - c) >= 0.5
    ),
    e AS (SELECT ia AS es, ib AS ed FROM pq UNION ALL SELECT ib, ia FROM pq),
    r AS (
        SELECT es AS id, es AS lab FROM e
        UNION
        SELECT e.ed, r.lab FROM r JOIN e ON e.es = r.id
    )
    SELECT id AS doc_id, MIN(lab) AS cluster_id
    FROM r GROUP BY id ORDER BY doc_id
    """,
)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: exact 3-gram Jaccard pairs (≥0.5) collapsed to
    connected components (operators/dedup.py:connected_components,
    alternating large-star/small-star — O(log n) rounds). cluster_id =
    min doc_id in the component; the canonical-survivor step of a
    dedup pipeline. Oracle computes the same closure with a recursive
    CTE — an iterative distributed algorithm exact-checked against SQL.
    No reference equivalent (reference has no graph ops)."""
    from .operators.dedup import connected_components, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    cc = connected_components(pairs, src="id_a", dst="id_b")
    return cc.select(F.col("id").alias("doc_id"), "cluster_id").orderBy("doc_id")


@register(
    "cdc_merge_apply",
    oracle=r"""
    WITH ch AS (
        SELECT CASE WHEN o_orderkey % 11 = 0 THEN o_custkey + 1000000
                    ELSE o_custkey END AS c_custkey,
               o_totalprice AS c_acctbal,
               CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
               o_orderkey AS seq
        FROM orders
    ),
    latest AS (
        SELECT c_custkey,
               arg_max(c_acctbal, seq) AS c_acctbal,
               arg_max(op, seq) AS op
        FROM ch GROUP BY c_custkey
    )
    SELECT COALESCE(b.c_custkey, l.c_custkey) AS c_custkey,
           ROUND(CASE WHEN l.op IS NOT NULL THEN l.c_acctbal
                      ELSE b.c_acctbal END, 2) AS c_acctbal
    FROM customer b FULL OUTER JOIN latest l ON b.c_custkey = l.c_custkey
    WHERE l.op IS NULL OR l.op <> 'D'
    ORDER BY c_custkey
    """,
)
def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert (operators/merge.py): a synthetic CDC changeset
    derived from orders (every 7th orderkey a delete, every 11th an
    insert of a new key, rest updates; latest orderkey wins per key)
    applied to the customer snapshot in one compaction aggregate + one
    join. No reference equivalent — ingestion-side north-star operator."""
    from .operators.merge import merge_apply

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = load_table(spark, sf_dir, "orders")
    changes = orders.select(
        F.when(F.col("o_orderkey") % 11 == 0, F.col("o_custkey") + 1000000)
        .otherwise(F.col("o_custkey"))
        .alias("c_custkey"),
        F.col("o_totalprice").alias("c_acctbal"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("o_orderkey").alias("seq"),
    )
    merged = merge_apply(
        cust, changes, keys=["c_custkey"], seq_col="seq", broadcast_changes=True
    )
    return merged.select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal")
    ).orderBy("c_custkey")


@register(
    "bm25_search_topk",
    oracle=r"""
    WITH tk AS (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
        FROM documents
    ),
    dl AS (SELECT doc_id, len(toks) AS dl FROM tk),
    st AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, t AS term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS t FROM tk)
        WHERE t IN ('hash', 'join', 'vector')
        GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    sc AS (
        SELECT tf.doc_id,
               ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl)) AS s
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN st
    )
    SELECT doc_id, ROUND(SUM(s), 4) AS bm25
    FROM sc GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for query terms {hash, join, vector}
    (operators/search.py:bm25_search). Explode is term-filtered before
    any shuffle; df/corpus stats broadcast back; top-k is
    TakeOrderedAndProject. Scores rounded to 4 dp before ordering so
    the ranking is cross-engine reproducible."""
    from .operators.search import bm25_search

    docs = load_table(spark, sf_dir, "documents")
    return bm25_search(docs, ["hash", "join", "vector"], top_k=20)


@register(
    "embedding_quantize_profile",
    oracle=r"""
    WITH b AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    s AS (
        SELECT vec_id, xs,
               CASE WHEN list_max(list_transform(xs, x -> abs(x))) = 0 THEN 1.0
                    ELSE list_max(list_transform(xs, x -> abs(x))) / 127.0
               END AS scale
        FROM b
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           CAST(list_sum(list_transform(xs, x -> floor(x / scale + 0.5))) AS BIGINT) AS sum_q,
           CAST(len(list_filter(xs, x -> abs(floor(x / scale + 0.5)) = 127.0)) AS BIGINT) AS n_sat,
           ROUND(list_max(list_transform(xs, x -> abs(floor(x / scale + 0.5) * scale - x))), 6) AS max_err
    FROM s
    ORDER BY vec_id
    """,
)
def q_quantize_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization telemetry per vector
    (operators/similarity.py:quantize_int8): scale, quantized checksum,
    saturated-lane count, worst reconstruction error. floor(+0.5)
    rounding and float64 math make the Arrow kernel bit-reproducible in
    SQL — a Python-kernel operator exact-checked against an engine that
    shares none of its code."""
    from .operators.similarity import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    qz = quantize_int8(emb)
    return qz.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        "sum_q",
        "n_sat",
        F.round("max_err", 6).alias("max_err"),
    ).orderBy("vec_id")


@register("hll_distinct_rollup")  # rows-only: sketch estimates are engine-specific
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch cardinality rollup: per (event_type, day) HLL
    sketches of user_id (``hll_sketch_agg``), merged upward to
    event_type totals with ``hll_union_agg`` — the 100 TB pattern where
    fine-grain sketches are built once and every coarser rollup is a
    cheap sketch merge, never a rescan of raw data. Datasketches HLL
    bytes are engine-specific → rows-only driver check; pytest asserts
    merge-equivalence (merged == direct sketch) and <5% error vs exact.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count(F.lit(1)).alias("n_day_sketches"),
        )
        .orderBy("event_type")
    )


@register(
    "hll_within_tolerance",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_tol
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_hll_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch error made SQL-checkable (VERDICT r2 item 4): per
    event_type, the datasketches HLL estimate of distinct users must sit
    within 5% (≈3σ at the default lgConfigK=12, RSE ≈ 1.6%) of the
    exact COUNT(DISTINCT) — the oracle pins exact_users and a constant
    TRUE; an out-of-tolerance estimate flips the flag and reddens the
    row. Complements hll_distinct_rollup (rows-only), which exercises
    the sketch-merge rollup path whose raw estimates are
    engine-specific."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return per.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("within_tol"),
    ).orderBy("event_type")


@register(
    "feature_hash_conservation",
    oracle=r"""
    WITH tk AS (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
        FROM documents
    ),
    t AS (
        SELECT doc_id, t AS term FROM (SELECT doc_id, unnest(toks) AS t FROM tk)
        WHERE t <> ''
    )
    SELECT doc_id,
           COUNT(*) AS total_weight,
           TRUE AS bucket_bound_ok
    FROM t
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorizer made SQL-checkable (operators/search.py:
    feature_hash_vectors): the oracle can't know xxhash64 bucket ids,
    but it CAN pin mass conservation — per-doc bucket weights must sum
    to the doc's token count — and the bucket-cardinality bound
    (distinct buckets ≤ min(dim, tokens)). A dropped/duplicated term or
    an out-of-range bucket reddens the row."""
    from .operators.search import feature_hash_vectors

    docs = load_table(spark, sf_dir, "documents")
    dim = 256
    v = feature_hash_vectors(docs, dim=dim)
    return (
        v.groupBy("doc_id")
        .agg(
            F.sum("weight").alias("total_weight"),
            (
                (F.count(F.lit(1)) <= F.least(F.lit(dim), F.sum("weight")))
                & (F.min("bucket") >= 0)
                & (F.max("bucket") < dim)
            ).alias("bucket_bound_ok"),
        )
        .orderBy("doc_id")
    )


@register(
    "mad_outlier_counts",
    oracle="""
    WITH m AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    d AS (
        SELECT e.event_type, e.value, m.med,
               ABS(e.value - m.med) AS dev
        FROM events e JOIN m USING (event_type)
        WHERE e.value IS NOT NULL
    ),
    s AS (
        SELECT event_type, quantile_cont(dev, 0.5) AS mad
        FROM d GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n,
           COUNT(CASE WHEN ABS(d.value - d.med) > 3.0 * 1.4826 * s.mad
                      THEN 1 END) AS n_outliers
    FROM d JOIN s USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outlier gate (operators/aggregates.py:mad_outliers):
    per-type |x − median| > 3·1.4826·MAD flags — 50% breakdown on both
    center and spread, the dirty-feed-safe alternative to z-score
    gating. Two broadcast aggregates, codegen flag; profiled per type
    for the oracle."""
    from .operators.aggregates import mad_outliers

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select("event_type", "value")
    out = mad_outliers(ev, "value", by=["event_type"], n_sigmas=3.0)
    return (
        out.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("is_outlier"), 1)).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "correlation_matrix_events",
    oracle="""
    WITH f AS (
        SELECT value AS v, hour(ts) * 1.0 AS h, (user_id % 10) * 1.0 AS u
        FROM events WHERE value IS NOT NULL
    )
    SELECT 'h_u' AS pair, ROUND(corr(h, u), 5) AS r FROM f
    UNION ALL SELECT 'v_h', ROUND(corr(v, h), 5) FROM f
    UNION ALL SELECT 'v_u', ROUND(corr(v, u), 5) FROM f
    ORDER BY pair
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation matrix (the reference's EDA ``df.corr()``
    heatmap input, SURVEY §2 S5 family) as ONE aggregate pass over n
    columns — n·(n-1)/2 corr aggregates share a single scan and one
    reduce, vs pandas needing the full matrix in RAM. Flattened
    (pair, r) output; deterministic pair naming."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    f = ev.select(
        F.col("value").alias("v"),
        F.hour("ts").cast("double").alias("h"),
        (F.col("user_id") % 10).cast("double").alias("u"),
    )
    agg = f.agg(
        F.round(F.corr("v", "h"), 5).alias("v_h"),
        F.round(F.corr("v", "u"), 5).alias("v_u"),
        F.round(F.corr("h", "u"), 5).alias("h_u"),
    )
    return agg.unpivot([], ["h_u", "v_h", "v_u"], "pair", "r").orderBy("pair")


@register(
    "skew_report_user_key",
    oracle="""
    WITH g AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id)
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           MAX(n) AS max_count,
           quantile_cont(n, 0.5) AS p50_count,
           quantile_cont(n, 0.99) AS p99_count,
           ROUND(MAX(n) / (SUM(n) * 1.0 / COUNT(*)), 4) AS skew_ratio
    FROM g
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic (operators/skew.py:skew_report): the
    group-size distribution that decides between plain partitioning,
    salting, and AQE skew handling — max/p99/median group sizes and the
    straggler ratio, in two aggregates with only a summary row moved."""
    from .operators.skew import skew_report

    ev = load_table(spark, sf_dir, "events")
    return skew_report(ev, ["user_id"])


@register(
    "activity_gaps_48h",
    oracle="""
    WITH t AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        FROM events
    )
    SELECT user_id,
           prev_us AS gap_start_us,
           ts_us AS gap_end_us,
           (ts_us - prev_us) // 1000000 AS gap_seconds
    FROM t
    WHERE ts_us - prev_us > 172800000000
    ORDER BY user_id, gap_start_us
    """,
)
def q_activity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal gap detection — the inverse of sessionization: per-user
    silences longer than 48h, as (gap_start, gap_end, seconds) rows via
    one lag window (one shuffle on user_id). Churn-risk / sensor-outage
    analytics surface; exact integer µs arithmetic both engines.
    ``gap_seconds`` is derived from the µs-floored epochs (not the raw
    ns diff) so the floor matches the oracle's ``(us - us) // 1e6`` for
    ANY physical timestamp unit the generator ships (ADVICE r3: under a
    TIMESTAMP(NANOS) generator the ns-diff floor can differ by 1 at
    exact-second boundaries)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "user_id",
            F.expr("lag(ts_ns) over (partition by user_id order by ts_ns) div 1000").alias(
                "gap_start_us"
            ),
            F.expr("ts_ns div 1000").alias("gap_end_us"),
        )
        .withColumn(
            "gap_seconds",
            F.expr("(gap_end_us - gap_start_us) div 1000000"),
        )
        .filter(
            F.col("gap_end_us") - F.col("gap_start_us") > F.lit(172_800_000_000)
        )
        .orderBy("user_id", "gap_start_us")
    )


@register(
    "vocabulary_df_pruned",
    oracle=r"""
    WITH tk AS (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
        FROM documents
    ),
    d AS (
        SELECT DISTINCT doc_id, t AS term
        FROM (SELECT doc_id, unnest(toks) AS t FROM tk)
        WHERE t <> ''
    ),
    n AS (SELECT COUNT(*) AS n FROM documents),
    v AS (
        SELECT term, COUNT(*) AS df
        FROM d GROUP BY term
    )
    SELECT term, df, ROUND(df * 1.0 / n.n, 6) AS df_frac
    FROM v CROSS JOIN n
    WHERE df >= 3 AND df <= 0.78 * n.n
    ORDER BY df DESC, term
    LIMIT 100
    """,
)
def q_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building with document-frequency pruning
    (operators/search.py:build_vocabulary — the CountVectorizer
    min_df/max_df contract): terms in ≥3 docs and ≤78% of the corpus
    (both bounds bite on this corpus's df distribution),
    top-100 by df with lexicographic tie-break. DF pruning bounds the
    vocabulary a downstream vectorizer broadcast must carry."""
    from .operators.search import build_vocabulary

    docs = load_table(spark, sf_dir, "documents")
    return build_vocabulary(
        docs, min_df=3, max_df_frac=0.78, max_vocab=100
    )


@register(
    "interval_overlap_sessions",
    oracle="""
    WITH s AS (
        SELECT user_id,
               epoch_us(MIN(ts)) AS s_lo,
               epoch_us(MAX(ts)) AS s_hi
        FROM events GROUP BY user_id
    ),
    w AS (
        SELECT p_partkey AS win_id,
               CAST(1704067200000000 + p_partkey * 86400000000 AS BIGINT) AS w_lo,
               CAST(1704067200000000 + p_partkey * 86400000000
                    + 172800000000 AS BIGINT) AS w_hi
        FROM part WHERE p_partkey <= 30
    )
    SELECT s.user_id, w.win_id
    FROM s JOIN w ON s.s_lo <= w.w_hi AND w.w_lo <= s.s_hi
    ORDER BY user_id, win_id
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join (operators/joins.py:
    interval_overlap_join): per-user activity spans crossed with
    synthetic 2-day campaign windows — both sides bin-explode so
    candidates meet on an integer equi-key (one shuffle join, no
    quadratic cross product); oracle brute-forces the overlap
    predicate."""
    from .operators.joins import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.expr("min(ts_ns) div 1000").alias("s_lo"),
        F.expr("max(ts_ns) div 1000").alias("s_hi"),
    )
    base = 1_704_067_200_000_000  # 2024-01-01 epoch µs
    day = 86_400_000_000
    wins = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 30)
        .select(
            F.col("p_partkey").alias("win_id"),
            (F.lit(base) + F.col("p_partkey") * F.lit(day)).alias("w_lo"),
            (
                F.lit(base) + F.col("p_partkey") * F.lit(day) + F.lit(2 * day)
            ).alias("w_hi"),
        )
    )
    out = interval_overlap_join(
        spans, wins, ("s_lo", "s_hi"), ("w_lo", "w_hi")
    )
    return out.select("user_id", "win_id").orderBy("user_id", "win_id")


@register(
    "global_index_events",
    oracle="""
    SELECT event_id,
           CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS BIGINT) AS idx
    FROM events
    ORDER BY event_id
    """,
)
def q_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global index WITHOUT the single-partition sort
    (operators/indexing.py:dense_global_index): range-partition on the
    order key, per-partition offsets from a |partitions|-row aggregate,
    Arrow pass emits offset + local position. ≡ ROW_NUMBER() over the
    total order — the oracle — while every partition works in parallel
    (the naive Window.orderBy form funnels 100 TB through one task).
    Ordering key is the µs-TRUNCATED epoch (``ts_ns div 1000``), not raw
    ns, so two events inside the same microsecond tie-break on event_id
    in BOTH engines — the oracle's ROW_NUMBER orders by the µs ``ts``
    column (ADVICE r3: a ns-precision generator would otherwise rank
    intra-µs events by ns in Spark only)."""
    from .operators.indexing import dense_global_index

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", F.expr("ts_ns div 1000").alias("ts_us"))
    )
    out = dense_global_index(ev, ["ts_us", "event_id"], out_col="idx")
    return out.select("event_id", "idx").orderBy("event_id")


@register(
    "quantile_discretize_value",
    oracle="""
    WITH b AS (
        SELECT [quantile_cont(value, 0.25),
                quantile_cont(value, 0.50),
                quantile_cont(value, 0.75)] AS bs
        FROM events
    )
    SELECT e.event_id,
           CAST(len(list_filter(b.bs, x -> x < e.value)) AS INTEGER) AS value_bin
    FROM events e CROSS JOIN b
    WHERE e.value IS NOT NULL
    ORDER BY e.event_id
    """,
)
def q_quantile_discretize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning (ml/prep.py:quantile_discretize —
    QuantileDiscretizer semantics with EXACT boundaries): bin =
    #{boundaries < x} over a broadcast fitted boundary array. Both
    engines interpolate quantile_cont identically, so bin assignments
    match exactly, boundary-sitting values included."""
    from .ml.prep import quantile_discretize

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    out = quantile_discretize(ev, "value", n_bins=4)
    return (
        out.filter(F.col("value").isNotNull())
        .select("event_id", "value_bin")
        .orderBy("event_id")
    )


@register(
    "robust_scale_value",
    oracle="""
    WITH s AS (
        SELECT quantile_cont(value, 0.5) AS med,
               quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
        FROM events
    )
    SELECT event_id,
           ROUND((value - s.med) / s.iqr, 6) AS value_scaled
    FROM events CROSS JOIN s
    WHERE value IS NOT NULL
    ORDER BY event_id
    """,
)
def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/IQR robust scaling (ml/prep.py:robust_scale, sklearn
    RobustScaler parity) — outlier-insensitive sibling of
    standardize_quantity: one exact-percentile aggregate broadcast back,
    codegen arithmetic."""
    from .ml.prep import robust_scale

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    out = robust_scale(ev, ["value"])
    return (
        out.filter(F.col("value").isNotNull())
        .select(
            "event_id", F.round("value_scaled", 6).alias("value_scaled")
        )
        .orderBy("event_id")
    )


@register(
    "first_last_event_per_user",
    oracle="""
    SELECT user_id,
           arg_min(event_type, ts) AS first_type,
           arg_max(event_type, ts) AS last_type,
           epoch_us(MIN(ts)) AS first_us,
           epoch_us(MAX(ts)) AS last_us
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by aggregate surface (argmin/argmax without a window
    or self-join — one hash aggregate instead of a rank+filter pass):
    each user's first and last event type by time. ts is unique per
    user in this data, so the argmin is well-defined across engines."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min_by("event_type", "ts_ns").alias("first_type"),
            F.max_by("event_type", "ts_ns").alias("last_type"),
            # integer div: ts_ns ≈ 1.7e18 exceeds double's 53-bit
            # mantissa, so float division would round the epoch
            F.expr("min(ts_ns) div 1000").alias("first_us"),
            F.expr("max(ts_ns) div 1000").alias("last_us"),
        )
        .orderBy("user_id")
    )


@register(
    "rank_distribution_windows",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           ROUND(percent_rank() OVER w, 6) AS pr,
           ROUND(cume_dist() OVER w, 6) AS cd,
           dense_rank() OVER w AS dr
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def q_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-window surface (percent_rank / cume_dist /
    dense_rank) — completes §2.5 beyond rank/lag/ntile: one Exchange on
    the partition key, ordering made total with the key tie-break so
    both engines agree on every rank."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.dense_rank().over(w).alias("dr"),
    ).orderBy("o_orderkey")


@register(
    "kfold_assignment_invariants",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           TRUE AS all_assigned,
           TRUE AS balanced
    FROM events
    """,
)
def q_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (ml/split.py:kfold_assign) made
    SQL-checkable via the invariant-flag pattern (xxhash64 fold ids have
    no SQL twin): every row gets exactly one fold in [0, k), all k
    folds are populated, and fold sizes stay within a generous binomial
    envelope (±10% of n/k — hash-uniformity at n=10⁴⁺, deterministic
    for fixed data+seed). A lost row, out-of-range fold, or skewed hash
    reddens the constant-TRUE oracle row."""
    from .ml.split import kfold_assign

    k = 5
    ev = load_table(spark, sf_dir, "events")
    per = (
        kfold_assign(ev, "event_id", k=k, seed=42)
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per.agg(
        F.sum("n").alias("n_rows"),
        (
            (F.count(F.lit(1)) == k)
            & (F.min("fold") == 0)
            & (F.max("fold") == k - 1)
        ).alias("all_assigned"),
        (
            (F.max("n") <= F.lit(1.1) * F.sum("n") / k)
            & (F.min("n") >= F.lit(0.9) * F.sum("n") / k)
        ).alias("balanced"),
    )


@register(
    "winsorize_value_by_type",
    oracle="""
    WITH b AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(AVG(GREATEST(LEAST(e.value, b.hi), b.lo)), 6) AS mean_clipped,
           ROUND(MIN(GREATEST(LEAST(e.value, b.hi), b.lo)), 6) AS min_clipped,
           ROUND(MAX(GREATEST(LEAST(e.value, b.hi), b.lo)), 6) AS max_clipped,
           COUNT(e.value) AS n
    FROM events e JOIN b USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile clipping (ml/prep.py:winsorize): per-type [5%, 95%]
    exact-percentile caps from ONE broadcast aggregate, codegen clip,
    NULL passthrough — the outlier guard in front of standardization.
    Profiled per group so the oracle checks the clip bounds end-to-end."""
    from .ml.prep import winsorize

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    w = winsorize(ev, ["value"], lower=0.05, upper=0.95, by=["event_type"])
    return (
        w.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 6).alias("mean_clipped"),
            F.round(F.min("value"), 6).alias("min_clipped"),
            F.round(F.max("value"), 6).alias("max_clipped"),
            F.count("value").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "target_encode_event_type",
    oracle="""
    WITH p AS (SELECT AVG(value) AS prior FROM events),
    g AS (
        SELECT event_type, SUM(value) AS s, COUNT(value) AS c
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           ROUND((s + prior * 10.0) / (c + 10.0), 6) AS event_type_te
    FROM g CROSS JOIN p
    ORDER BY event_type
    """,
)
def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean target encoding (ml/prep.py:target_encode): the
    high-cardinality categorical encoder — one double per category via
    one groupBy, additive smoothing toward the global prior, unseen
    categories fall back to the prior at transform time (pytest covers
    the closure; this query oracle-checks the fitted mapping)."""
    from .ml.prep import target_encode

    ev = load_table(spark, sf_dir, "events")
    enc, _ = target_encode(ev, "event_type", "value", smoothing=10.0)
    return enc.select(
        "event_type", F.round("event_type_te", 6).alias("event_type_te")
    ).orderBy("event_type")


@register(
    "groupwise_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 6) AS p25,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.75), 6) AS p75,
           COUNT(value) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_groupwise_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group interpolated quartiles (`F.percentile`, the
    continuous-rank estimator both engines implement identically) — the
    per-group twin of the global quantiles_value row. Holistic
    aggregate: one shuffle on the group key, per-group sort inside the
    aggregate buffer; at scale the approx_percentile tolerance row
    (same file) is the sketch-backed alternative."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile("value", F.lit(0.50)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.75)), 6).alias("p75"),
            F.count("value").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "array_algebra_user_types",
    oracle="""
    WITH s AS (
        SELECT user_id, list_sort(list_distinct(list(event_type))) AS types
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           array_to_string(types, ',') AS types,
           len(types) AS n_types,
           len(list_intersect(types, ['click', 'view'])) AS n_core,
           array_to_string(list_sort(list_filter(types,
               t -> NOT list_contains(['click', 'view'], t))), ','
           ) AS extra_types
    FROM s
    ORDER BY user_id
    """,
)
def q_array_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-algebra surface: per-user distinct event-type sets via
    collect_set (order nondeterministic → array_sort pins it for the
    cross-engine compare), then size / intersect / except as pure array
    expressions — the nested-type manipulation layer a feature store
    leans on, zero UDFs, one groupBy shuffle.  The sorted arrays are
    projected through ``array_join`` (oracle: ``array_to_string``) so
    every output cell is a hashable scalar for the driver's
    order-insensitive comparator (ADVICE r3: ndarray cells are
    unhashable in the driver's pandas canonicalization)."""
    ev = load_table(spark, sf_dir, "events")
    core = F.array(F.lit("click"), F.lit("view"))
    return (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types_arr"))
        .select(
            "user_id",
            F.array_join("types_arr", ",").alias("types"),
            F.size("types_arr").alias("n_types"),
            F.size(F.array_intersect("types_arr", core)).alias("n_core"),
            F.array_join(
                F.array_sort(F.array_except("types_arr", core)), ","
            ).alias("extra_types"),
        )
        .orderBy("user_id")
    )


@register(
    "unpivot_event_stats",
    oracle="""
    WITH wide AS (
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END)     AS n_view,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END)    AS n_click,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase
        FROM events GROUP BY user_id
    )
    SELECT user_id, metric, cnt
    FROM wide
    UNPIVOT (cnt FOR metric IN (n_view, n_click, n_purchase))
    ORDER BY user_id, metric
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (`df.unpivot`, the inverse of the pivot surface in
    pivot_user_event_counts): per-user event-type counts melted back to
    (user_id, metric, cnt) rows. Unpivot is a zero-shuffle Expand —
    each input row emits |metrics| rows map-side; the only Exchange is
    the upstream groupBy. DuckDB's UNPIVOT is the oracle twin. Spark
    drops NULL cells by default; counts are never NULL so both engines
    emit exactly 3 rows per user."""
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "n_purchase"
        ),
    )
    return wide.unpivot(
        ["user_id"], ["n_view", "n_click", "n_purchase"], "metric", "cnt"
    ).orderBy("user_id", "metric")


@register(
    "table_diff_summary",
    oracle="""
    WITH l AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
    r AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1.5
                    ELSE c_acctbal END AS c_acctbal
        FROM customer WHERE c_custkey % 13 <> 0
        UNION ALL
        SELECT c_custkey + 1000000000, c_name, c_acctbal
        FROM customer WHERE c_custkey % 17 = 0
    )
    SELECT COUNT(CASE WHEN r.c_custkey IS NULL THEN 1 END) AS n_only_left,
           COUNT(CASE WHEN l.c_custkey IS NULL THEN 1 END) AS n_only_right,
           COUNT(CASE WHEN l.c_custkey IS NOT NULL AND r.c_custkey IS NOT NULL
                       AND (l.c_acctbal IS DISTINCT FROM r.c_acctbal
                            OR l.c_name IS DISTINCT FROM r.c_name)
                      THEN 1 END) AS n_differing,
           COUNT(CASE WHEN l.c_custkey IS NOT NULL AND r.c_custkey IS NOT NULL
                       AND l.c_acctbal IS NOT DISTINCT FROM r.c_acctbal
                       AND l.c_name IS NOT DISTINCT FROM r.c_name
                      THEN 1 END) AS n_equal
    FROM l FULL OUTER JOIN r ON l.c_custkey = r.c_custkey
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/diff.py:diff_summary — the
    validation companion to MERGE): customer diffed against a
    deterministically perturbed copy (every 13th key dropped, every 7th
    acctbal shifted, every 17th re-keyed as an insert). One full-outer
    join on the key, NULL-safe per-column compare, codegen throughout;
    the oracle recomputes the same classification in SQL."""
    from .operators.diff import diff_summary

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    right = (
        cust.filter(F.col("c_custkey") % 13 != 0)
        .withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 1.5
            ).otherwise(F.col("c_acctbal")),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 17 == 0).withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(1_000_000_000)
            )
        )
    )
    return diff_summary(cust, right, ["c_custkey"])


@register(
    "approx_percentile_tolerance",
    oracle="""
    SELECT COUNT(value) AS n_values,
           TRUE AS ok_p50,
           TRUE AS ok_p90
    FROM events
    """,
)
def q_approx_percentile_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL/GK-style approximate percentiles made SQL-checkable (same
    pattern as hll_within_tolerance): ``percentile_approx(value,
    [0.5, 0.9], accuracy=1000)`` guarantees rank error ≤ n/accuracy, so
    the count of values below/at the returned quantile must sit within
    that rank envelope of p·n. The oracle pins n and constant-TRUE
    flags; a sketch answer outside its documented bound reddens the
    row. Complements quantiles_value (exact interpolated quartiles,
    hash-green)."""
    ev = load_table(spark, sf_dir, "events").select("value").filter(
        F.col("value").isNotNull()
    )
    appr = ev.agg(
        F.percentile_approx("value", [0.5, 0.9], 1000).alias("a")
    )
    j = ev.crossJoin(F.broadcast(appr))
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("value") <= F.col("a")[0]).cast("long")).alias("le50"),
        F.sum((F.col("value") < F.col("a")[0]).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= F.col("a")[1]).cast("long")).alias("le90"),
        F.sum((F.col("value") < F.col("a")[1]).cast("long")).alias("lt90"),
    )
    tol = F.greatest(F.lit(1.0), F.col("n") / F.lit(1000.0))

    def ok(p, le, lt):
        target = F.col("n") * F.lit(p)
        return (F.col(le) >= target - tol) & (F.col(lt) <= target + tol)

    return agg.select(
        F.col("n").alias("n_values"),
        ok(0.5, "le50", "lt50").alias("ok_p50"),
        ok(0.9, "le90", "lt90").alias("ok_p90"),
    )


@register("doc_pagerank_topk")  # rows-only: iterative float algorithm (no SQL twin)
def q_doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-based document centrality: PageRank
    (operators/graph.py:pagerank, 10 power iterations with dangling-mass
    redistribution) over the 3-gram-Jaccard similarity graph (edges both
    directions — similarity is symmetric), top-10 docs. The corpus-
    curation quality signal. pytest pins the algorithm to a numpy power
    iteration at 1e-9; driver check is rows-only (DuckDB recursive CTEs
    cannot aggregate per iteration)."""
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    sym = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    pr = pagerank(sym, n_iter=10)
    return (
        pr.select(F.col("id").alias("doc_id"), F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "pagerank_mass_invariant",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS toks
        FROM documents
    ),
    s AS (SELECT doc_id, unnest(range(1, len(toks) - 1)) AS i, toks FROM t WHERE len(toks) >= 3),
    d AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM s),
    n AS (SELECT doc_id, COUNT(*) AS ns FROM d GROUP BY doc_id),
    p AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
        FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT ia, ib
        FROM p JOIN n na ON na.doc_id = p.ia JOIN n nb ON nb.doc_id = p.ib
        WHERE c * 1.0 / (na.ns + nb.ns - c) >= 0.5
    )
    SELECT COUNT(DISTINCT x) AS n_nodes,
           TRUE AS mass_ok,
           TRUE AS floor_ok,
           TRUE AS topk_stable
    FROM (SELECT ia AS x FROM pairs UNION SELECT ib AS x FROM pairs)
    """,
)
def q_pagerank_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank made SQL-checkable (VERDICT r3 item 6, the
    hll_within_tolerance pattern): the oracle can't iterate, but it CAN
    pin the node count of the ≥0.5-Jaccard similarity graph (the exact
    inverted-index SQL twin of ngram_jaccard_pairs) plus constant-TRUE
    flags for three properties any correct PageRank must satisfy:

    - ``mass_ok``: ranks sum to 1 ± 1e-6 — dangling-mass redistribution
      conserves total mass by construction; a drain/leak reddens it;
    - ``floor_ok``: every rank ≥ (1−d)/n − 1e-12, the teleport floor;
    - ``topk_stable``: the top-10 doc set is identical between a
      10-iteration and a 12-iteration run — the similarity graph's
      components are tiny near-cliques, so ranks converge well before
      iteration 10 and extra iterations must not reshuffle the head.
    """
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    sym = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        # computed once, read by both pagerank runs
        .localCheckpoint(eager=True)
    )
    n_nodes = (
        sym.select(F.col("src").alias("id"))
        .union(sym.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    damping = 0.85
    pr10 = pagerank(sym, n_iter=10)
    pr12 = pagerank(sym, n_iter=12)

    def topk(pr: DataFrame) -> set:
        return {
            r["id"]
            for r in pr.orderBy(F.desc("rank"), F.asc("id")).limit(10).collect()
        }

    stats = pr10.agg(
        F.sum("rank").alias("mass"), F.min("rank").alias("min_rank")
    ).first()
    mass_ok = abs(stats["mass"] - 1.0) <= 1e-6
    floor_ok = stats["min_rank"] >= (1.0 - damping) / max(n_nodes, 1) - 1e-12
    topk_stable = topk(pr10) == topk(pr12)
    return spark.createDataFrame(
        [(n_nodes, mass_ok, floor_ok, topk_stable)],
        "n_nodes long, mass_ok boolean, floor_ok boolean, topk_stable boolean",
    )


@register(
    "fuzzy_part_names_1edit",
    oracle=r"""
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND levenshtein(a.p_name, b.p_name) <= 1
    ORDER BY id_a, id_b
    """,
)
def q_fuzzy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: all part-name pairs within one edit
    (operators/dedup.py:fuzzy_pairs_1edit, SymSpell deletion-key
    blocking + exact levenshtein verify). The oracle brute-forces the
    quadratic comparison; matching output proves the deletion-
    neighborhood blocking loses no pair."""
    from .operators.dedup import fuzzy_pairs_1edit

    part = load_table(spark, sf_dir, "part")
    return fuzzy_pairs_1edit(part, "p_name", "p_partkey").orderBy("id_a", "id_b")


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase per user
    (strictly increasing event times), in ONE scan of events: three
    chained full-partition window minima over the same
    ``partitionBy(user_id)`` — Catalyst plans a single Exchange and
    stacks the Window operators on it, vs the previous three
    filtered-scan + join form that read events three times. The final
    funnel counts distinct users per stage in one global aggregate.
    Raw-ns timestamps compare identically in both engines.
    No reference equivalent; classic product-analytics surface."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    ty, ts = F.col("event_type"), F.col("ts_ns")
    staged = (
        ev.select("user_id", "event_type", "ts_ns")
        .filter(ty.isin("view", "click", "purchase"))
        .withColumn("t1", F.min(F.when(ty == "view", ts)).over(w))
        .withColumn(
            "t2",
            F.min(F.when((ty == "click") & (ts > F.col("t1")), ts)).over(w),
        )
        .withColumn(
            "t3",
            F.min(F.when((ty == "purchase") & (ts > F.col("t2")), ts)).over(w),
        )
    )
    # collapse to one row per user FIRST — reuses the window's user_id
    # partitioning (no new Exchange) and avoids the Expand×3 that a
    # triple count_distinct would run over every event row
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count(F.col("t1")).alias("n_view"),
        F.count(F.col("t2")).alias("n_click_after_view"),
        F.count(F.col("t3")).alias("n_purchase_after_click"),
    )


@register(
    "weekly_user_retention",
    oracle="""
    WITH aw AS (
        SELECT DISTINCT user_id,
               epoch_us(date_trunc('week', ts)) AS w
        FROM events
    )
    SELECT a.w AS week_us,
           COUNT(*) AS n_active,
           COUNT(b.user_id) AS n_retained
    FROM aw a
    LEFT JOIN aw b
      ON b.user_id = a.user_id
     AND b.w = a.w + 604800000000
    GROUP BY a.w
    ORDER BY a.w
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention: users active in week w who are also
    active in w+1. ONE distinct (user, week) pass; retention is a
    ``lead(w)`` over each user's ordered active weeks — the self-join
    form executed the distinct subplan (and the events scan under it)
    twice. Next week is exact epoch arithmetic (UTC weeks are uniform,
    no DST). Week buckets exported as epoch-micros per the cross-engine
    convention. No reference equivalent; cohort-analytics surface."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    aw = (
        ev.select(
            "user_id",
            F.unix_micros(F.date_trunc("week", F.col("ts"))).alias("w"),
        )
        .distinct()
    )
    nxt = F.lead("w").over(Window.partitionBy("user_id").orderBy("w"))
    return (
        aw.withColumn(
            "retained",
            (nxt == F.col("w") + F.lit(604800000000)).cast("int"),
        )
        .groupBy(F.col("w").alias("week_us"))
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.coalesce(F.sum("retained"), F.lit(0)).alias("n_retained"),
        )
        .orderBy("week_us")
    )


@register(
    "doc_chunks_64_16",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
                    THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')
               END AS toks
        FROM documents
    ),
    c AS (
        SELECT doc_id, toks, len(toks) AS n,
               CASE WHEN len(toks) <= 0 THEN 0
                    ELSE ((len(toks) - 1) // 48) + 1 END AS nc0
        FROM t
    ),
    c2 AS (
        SELECT doc_id, toks, n,
               CASE WHEN nc0 > 1 AND (nc0 - 1) * 48 + 16 >= n
                    THEN nc0 - 1 ELSE nc0 END AS nc
        FROM c
    ),
    e AS (
        SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_idx FROM c2
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(toks[chunk_idx*48 + 1 : chunk_idx*48 + 64]) AS INT) AS n_tokens,
           array_to_string(toks[chunk_idx*48 + 1 : chunk_idx*48 + 64], ' ') AS chunk_text
    FROM e
    ORDER BY doc_id, chunk_idx
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (operators/chunking.py:chunk_documents):
    64-token windows, 16-token overlap, trailing redundant window
    dropped. The sample-prep step between a cleaned corpus and a
    training set. Tokenize-once + per-window array slice — row count
    multiplies by chunks/doc, never by tokens."""
    from .operators.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    out = chunk_documents(docs, chunk_size=64, overlap=16)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "chunk_text",
    ).orderBy("doc_id", "chunk_idx")


@register(
    "pack_sequences_512",
    oracle=r"""
    WITH n AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST((SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                // 512 AS BIGINT) AS bin_id
    FROM n
    ORDER BY doc_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (operators/chunking.py:pack_greedy):
    BPE-ish token counts packed into 512-token bins by cumulative count
    over doc_id order — the deterministic next-fit contract a streaming
    packer produces, exact-checkable in SQL."""
    from .functions.text import bpe_ish_token_count
    from .operators.chunking import pack_greedy

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", bpe_ish_token_count("text").alias("n_tokens")
    )
    return pack_greedy(sized, "n_tokens", "doc_id", capacity=512).orderBy("doc_id")


@register(
    "dq_report_events",
    oracle="""
    WITH marked AS (
        SELECT e.*, c.c_custkey IS NOT NULL AS has_cust
        FROM events e
        LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
          ON e.user_id = c.c_custkey
    ),
    agg AS (
        SELECT
            -- CAST: DuckDB SUM(int) is HUGEINT → pandas float64, which
            -- dtype-diverges from Spark's int64 (tools/dtype_audit.py)
            CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
            CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_value,
            CAST(SUM(CASE WHEN event_type NOT IN ('signup','error','click','view','purchase')
                       OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unknown_event_type,
            CAST(SUM(CASE WHEN user_id IS NOT NULL AND NOT has_cust THEN 1 ELSE 0 END) AS BIGINT) AS orphan_user,
            CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
            COUNT(*) AS n_rows
        FROM marked
    )
    SELECT 'null_value' AS "check", null_value AS n_violations, n_rows FROM agg
    UNION ALL SELECT 'negative_value', negative_value, n_rows FROM agg
    UNION ALL SELECT 'unknown_event_type', unknown_event_type, n_rows FROM agg
    UNION ALL SELECT 'orphan_user', orphan_user, n_rows FROM agg
    UNION ALL SELECT 'null_ts', null_ts, n_rows FROM agg
    ORDER BY "check"
    """,
)
def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style data-quality gate
    (operators/quality.py:check_report): five checks — null/range/
    domain/referential-integrity/timestamp — compiled into ONE
    conditional-sum scan (the referential check rides a broadcast dim
    marker, the fact never shuffles). No reference equivalent;
    production-pipeline gate."""
    from .operators.quality import check_report, with_dim_marker

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    marked = with_dim_marker(ev, "user_id", cust, "c_custkey", "__cust_hit")
    known = ["signup", "error", "click", "view", "purchase"]
    checks = {
        "null_value": F.col("value").isNull(),
        "negative_value": F.col("value") < 0,
        "unknown_event_type": (~F.col("event_type").isin(known))
        | F.col("event_type").isNull(),
        "orphan_user": F.col("user_id").isNotNull() & F.col("__cust_hit").isNull(),
        "null_ts": F.col("ts").isNull(),
    }
    return check_report(marked, checks).orderBy("check")


@register(
    "shipping_priority_top10",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           epoch_us(o.o_orderdate) AS orderdate_us,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter (BUILDING customers,
    broadcast) → fact join → revenue agg → top-10. The classic
    "filter early, broadcast the survivors, TakeOrderedAndProject at
    the end" plan; the customer filter reaches the scan as a pushed
    predicate."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_us"
            ),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue per supplier then keep the max — the
    scalar-subquery-against-an-aggregate pattern. The max is a one-row
    aggregate broadcast back onto the per-supplier frame (ties all
    surface, matching the SQL semantics) — NOT a global rank window,
    which would funnel every supplier through one WindowExec task
    (round-5 VERDICT #4)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_rev"
        )
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    top = rev.join(
        F.broadcast(mx), rev.total_rev == F.col("__mx"), "inner"
    ).drop("__mx")
    s = load_table(spark, sf_dir, "supplier")
    return (
        top.join(s, top.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@register(
    "incremental_agg_maintenance",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value,
           ROUND(MIN(value), 4) AS min_value,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate maintenance
    (operators/incremental.py:merge_aggregate_state): state built from
    history (ts < Jan 20) is combined with the delta batch (ts ≥ Jan 20)
    — per-key algebraic merge, NO rescan of history. The oracle is the
    from-scratch aggregate over everything: equality proves the
    incremental path is lossless. No reference equivalent;
    materialized-view maintenance surface."""
    from .operators.incremental import aggregate_delta, merge_aggregate_state

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cutoff = F.lit("2024-01-20").cast("timestamp")
    specs = {
        "n": ("value", "count"),
        "total_value": ("value", "sum"),
        "min_value": ("value", "min"),
        "max_value": ("value", "max"),
    }
    state = aggregate_delta(ev.filter(F.col("ts") < cutoff), ["event_type"], specs)
    merged = merge_aggregate_state(
        state, ev.filter(F.col("ts") >= cutoff), ["event_type"], specs
    )
    return merged.select(
        "event_type",
        "n",
        F.round("total_value", 4).alias("total_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
    ).orderBy("event_type")


@register(
    "supplier_count_excluding_negative",
    oracle="""
    SELECT l.l_returnflag,
           COUNT(DISTINCT l.l_suppkey) AS n_suppliers
    FROM lineitem l
    WHERE l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q_supplier_count_excl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN exclusion subquery → broadcast left-anti
    join (no null-aware penalty: the exclusion list is a filtered key
    column), then per-group COUNT(DISTINCT) — two-phase distinct agg."""
    li = load_table(spark, sf_dir, "lineitem")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
        .orderBy("l_returnflag")
    )


@register(
    "expanding_zscore_user",
    oracle="""
    SELECT event_id, user_id, value,
           CASE WHEN COUNT(value) OVER w >= 2 AND STDDEV_SAMP(value) OVER w > 0
                THEN FLOOR((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w
                           * 10000 + 0.5) / 10000
           END AS zscore
    FROM events
    WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ORDER BY event_id
    """,
)
def q_expanding_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-referential anomaly score: each event's value z-scored
    against the user's PRIOR history (streaming/anomaly.py:
    expanding_zscore — prior-rows window frame, (ts, event_id)
    deterministic order). Batch twin of the Welford-state streaming
    scorer; one window shuffle on user_id."""
    from .streaming.anomaly import expanding_zscore

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return expanding_zscore(
        ev, "user_id", "ts_ns", "value", "event_id"
    ).orderBy("event_id")


@register(
    "chi_square_features",
    oracle="""
    WITH base AS (
        SELECT event_type AS f1,
               CAST(hour(ts) // 6 AS VARCHAR) AS f2,
               (value > 50) AS y
        FROM events WHERE value IS NOT NULL
    ),
    m AS (
        SELECT 'event_type' AS f, f1 AS v, y FROM base
        UNION ALL
        SELECT 'hour_band' AS f, f2 AS v, y FROM base
    ),
    cells AS (SELECT f, v, y, COUNT(*) AS o FROM m GROUP BY 1, 2, 3),
    tot AS (
        SELECT f, v, y, o,
               SUM(o) OVER (PARTITION BY f, v) AS rt,
               SUM(o) OVER (PARTITION BY f, y) AS ct,
               SUM(o) OVER (PARTITION BY f) AS n
        FROM cells
    )
    SELECT f AS feature,
           ROUND(SUM(o * o / (rt * ct * 1.0 / n)) - MAX(n), 6) AS chi2,
           CAST((COUNT(DISTINCT v) - 1) * (COUNT(DISTINCT y) - 1) AS BIGINT) AS dof,
           CAST(MAX(n) AS BIGINT) AS n
    FROM tot GROUP BY f
    ORDER BY chi2 DESC, feature
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² feature ranking (ml/feature_select.py:chi_square_rank — the
    SelectKBest(chi2) shape): event_type and 6h hour-band ranked by
    independence from a high-value label, ALL features in one melted
    pass building every contingency table at once. Zero cells
    contribute via the Σ O²/E − n identity, so nothing unobserved
    materializes."""
    from .ml.feature_select import chi_square_rank

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    feats = ev.select(
        "event_type",
        F.expr("cast(hour(ts) div 6 as string)").alias("hour_band"),
        (F.col("value") > 50).alias("y"),
    )
    return chi_square_rank(feats, ["event_type", "hour_band"], "y")


@register(
    "pmi_term_pairs",
    oracle=r"""
    WITH tk AS (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
        FROM documents
    ),
    d AS (
        SELECT DISTINCT doc_id, t AS term
        FROM (SELECT doc_id, unnest(toks) AS t FROM tk)
        WHERE t <> ''
    ),
    n AS (SELECT COUNT(*) AS n FROM documents),
    tdf AS (SELECT term, COUNT(*) AS df FROM d GROUP BY term),
    kept AS (
        SELECT term, df FROM tdf CROSS JOIN n
        WHERE df >= 5 AND df <= 0.9 * n.n
    ),
    p AS (
        SELECT a.term AS term_a, b.term AS term_b,
               ka.df AS df_a, kb.df AS df_b, COUNT(*) AS pair_df
        FROM d a
        JOIN d b ON a.doc_id = b.doc_id AND a.term < b.term
        JOIN kept ka ON ka.term = a.term
        JOIN kept kb ON kb.term = b.term
        GROUP BY 1, 2, 3, 4
    )
    SELECT term_a, term_b, pair_df,
           ROUND(ln(pair_df * n.n * 1.0 / (df_a * df_b)), 6) AS pmi
    FROM p CROSS JOIN n
    WHERE pair_df >= 5
    ORDER BY pmi DESC, term_a, term_b
    LIMIT 50
    """,
)
def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining (operators/search.py:pmi_term_pairs): top-50
    document-co-occurrence term pairs by PMI, df-band pruned BEFORE the
    inverted-index self-join so the per-doc pair product stays bounded.
    PMI rounds to 6 dp before the ordering cut — the cross-engine
    ln() reproducibility convention (same as BM25)."""
    from .operators.search import pmi_term_pairs

    docs = load_table(spark, sf_dir, "documents")
    return pmi_term_pairs(
        docs, min_df=5, max_df_frac=0.9, min_pair_df=5, top_k=50
    )


@register(
    "entropy_profile_docs",
    oracle="""
    WITH m AS (
        SELECT 'lang' AS c, lang AS v FROM documents WHERE lang IS NOT NULL
        UNION ALL
        SELECT 'source' AS c, source AS v FROM documents WHERE source IS NOT NULL
    ),
    cnt AS (SELECT c, v, COUNT(*) AS n FROM m GROUP BY 1, 2)
    SELECT c AS column_name,
           COUNT(*) AS n_distinct,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           ROUND(log2(SUM(n)) - SUM(n * log2(n)) / SUM(n), 6) AS entropy_bits
    FROM cnt GROUP BY c
    ORDER BY column_name
    """,
)
def q_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column entropy profiling (operators/aggregates.py:
    entropy_profile): Shannon entropy of the documents lang and source
    distributions, every column in ONE melted pass; H computed as
    log2(N) − Σ n·log2(n)/N so no second join against per-column
    totals. The near-constant / near-key detector of a data profiler."""
    from .operators.aggregates import entropy_profile

    docs = load_table(spark, sf_dir, "documents")
    return entropy_profile(docs, ["lang", "source"])


@register(
    "curation_funnel_docs",
    oracle=r"""
    WITH base AS (
        SELECT doc_id, text, lang,
               len(string_split_regex(trim(text), '\s+')) AS wc,
               length(text) AS nc,
               length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS clean,
               ROW_NUMBER() OVER (
                   PARTITION BY trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
                   ORDER BY doc_id
               ) AS rn
        FROM documents
    ),
    f AS (
        SELECT (wc >= 10) AS p1,
               (4 * (nc - clean) <= nc) AS p2,
               (lang = 'en') AS p3,
               (rn = 1) AS p4
        FROM base
    )
    SELECT 0 AS stage_idx, 'input' AS stage, COUNT(*) AS survivors FROM f
    UNION ALL
    SELECT 1, 'min_words', COUNT(CASE WHEN p1 THEN 1 END) FROM f
    UNION ALL
    SELECT 2, 'low_punct', COUNT(CASE WHEN p1 AND p2 THEN 1 END) FROM f
    UNION ALL
    SELECT 3, 'lang_en', COUNT(CASE WHEN p1 AND p2 AND p3 THEN 1 END) FROM f
    UNION ALL
    SELECT 4, 'dedup_first', COUNT(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 END) FROM f
    ORDER BY stage_idx
    """,
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-corpus curation gauntlet (operators/curation.py:
    curation_funnel): word-count gate → punctuation-density gate
    (integer arithmetic: 4·punct ≤ chars, no float thresholds to
    disagree on) → language gate → keep-first exact dedup (window
    rank over the normalized text, computed across the FULL corpus).
    Every stage's cumulative survivor count comes from ONE aggregate
    scan; the window rank is the only shuffle."""
    from .functions.text import normalized_text, word_count
    from .operators.curation import curation_funnel

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(normalized_text("text")).orderBy("doc_id")
    base = docs.withColumn("__rn", F.row_number().over(w))
    n = F.length("text")
    clean = F.length(F.regexp_replace("text", r"[^A-Za-z0-9\s]", ""))
    return curation_funnel(
        base,
        [
            ("min_words", word_count("text") >= 10),
            ("low_punct", F.lit(4) * (n - clean) <= n),
            ("lang_en", F.col("lang") == "en"),
            ("dedup_first", F.col("__rn") == 1),
        ],
    )


@register(
    "bigram_lm_topk",
    oracle=r"""
    WITH tk AS (
        SELECT string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
        FROM documents
    ),
    valid AS (SELECT toks FROM tk WHERE len(toks) >= 2 AND toks[1] <> ''),
    bg AS (
        SELECT toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM valid)
    ),
    cnt AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    ctx AS (SELECT w1, SUM(c) AS c1 FROM cnt GROUP BY 1)
    SELECT cnt.w1, cnt.w2, cnt.c,
           ROUND(cnt.c * 1.0 / ctx.c1, 6) AS p
    FROM cnt JOIN ctx ON cnt.w1 = ctx.w1
    WHERE cnt.c >= 5
    ORDER BY cnt.c DESC, cnt.w1, cnt.w2
    LIMIT 50
    """,
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM estimation (operators/search.py:bigram_lm_topk): top-50
    adjacent word pairs with P(w2|w1), contexts summed over the
    distinct-bigram counts frame so probabilities per context sum to 1.
    Pairs come from zipping the token array with its own 1-shift —
    no positional self-join, one tokenize pass."""
    from .operators.search import bigram_lm_topk

    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_topk(docs, min_count=5, top_k=50)


@register(
    "substring_decontam_docs",
    oracle=r"""
    WITH norm AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS nt
        FROM documents
    ),
    p AS (
        SELECT unnest(['data column agg', 'slow fast table', 'window spark']) AS probe
    )
    SELECT n.doc_id, p.probe
    FROM norm n CROSS JOIN p
    WHERE contains(n.nt, p.probe)
    ORDER BY n.doc_id, p.probe
    """,
)
def q_substring_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring decontamination (operators/dedup.py:
    substring_contamination): which docs contain any literal probe
    phrase in their normalized text — the companion of the 13-gram
    collision gate for probes SHORTER than the n-gram window (leaked
    answer keys, canary strings). The probe list is a literal array
    inside the plan: zero joins, zero shuffles, one codegen contains()
    pass over the corpus."""
    from .operators.dedup import substring_contamination

    docs = load_table(spark, sf_dir, "documents")
    return substring_contamination(
        docs, ["data column agg", "slow fast table", "window spark"]
    ).orderBy("doc_id", "probe")


@register(
    "stratified_sample_docs",
    oracle="""
    WITH h AS (
        SELECT source, doc_id,
               (doc_id * 2654435761) % 4294967296 AS hv
        FROM documents
    ),
    r AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY hv, doc_id
               ) AS rn
        FROM h
    )
    SELECT source, doc_id FROM r WHERE rn <= 10
    ORDER BY source, doc_id
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly min(10, |stratum|)
    docs per source, selected by a multiplicative integer hash of the
    id (Knuth 2654435761 mod 2³²) — reproducible across engines and
    runs, unlike ``sample()``/``TABLESAMPLE`` whose RNG is
    engine-specific. The eval-set / debug-slice carver of a corpus
    pipeline: one window shuffle on the stratum key, integer-exact
    arithmetic so both engines pick identical rows."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("hv", "doc_id")
    return (
        docs.select(
            "source",
            "doc_id",
            (F.col("doc_id") * F.lit(2654435761)).__mod__(
                F.lit(4294967296)
            ).alias("hv"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# Model-evaluation bucket: the scoring-side metrics the reference never
# reaches (its pipeline stops at emitting train/test matrices,
# transform_data.py:150-161) — ml/evaluate.py
# ---------------------------------------------------------------------------


@register(
    "model_eval_auc",
    oracle="""
    WITH g AS (
        SELECT value AS score_key,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS pos_s,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS DOUBLE) AS neg_s
        FROM events WHERE value IS NOT NULL GROUP BY value
    ),
    c AS (
        SELECT pos_s, neg_s,
               COALESCE(SUM(neg_s) OVER (
                   ORDER BY score_key
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        FROM g
    ),
    exact AS (
        SELECT SUM(pos_s * (neg_below + neg_s / 2)) / (SUM(pos_s) * SUM(neg_s)) AS auc_raw,
               CAST(SUM(pos_s) AS BIGINT) AS n_pos,
               CAST(SUM(neg_s) AS BIGINT) AS n_neg
        FROM c
    ),
    bg AS (
        SELECT LEAST(GREATEST(FLOOR(value / 5.0), 0), 99) AS score_key,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS pos_s,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS DOUBLE) AS neg_s
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    bc AS (
        SELECT pos_s, neg_s,
               COALESCE(SUM(neg_s) OVER (
                   ORDER BY score_key
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        FROM bg
    ),
    binned AS (
        SELECT SUM(pos_s * (neg_below + neg_s / 2)) / (SUM(pos_s) * SUM(neg_s)) AS auc_binned_raw
        FROM bc
    )
    SELECT ROUND(exact.auc_raw, 6) AS auc,
           ROUND(binned.auc_binned_raw, 6) AS auc_binned,
           exact.n_pos, exact.n_neg,
           ABS(exact.auc_raw - binned.auc_binned_raw) < 0.01 AS binned_close
    FROM exact, binned
    """,
)
def q_model_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC (ml/evaluate.py:auc_roc — Mann-Whitney pair count
    with tie averaging, identical to sklearn.roc_auc_score) next to its
    100 TB-path approximation (auc_roc_binned, 100 fixed-width bins),
    plus a closeness flag. The exact form collapses to distinct scores
    before the ordered prefix sum (6.6k rows here, not 10k events); the
    binned form's ordered frame is ≤ n_bins rows at ANY data size —
    that is the plan that survives a 1000-executor cluster. Labels:
    event_type = 'purchase' as the positive class, value as the score."""
    from .ml.evaluate import auc_roc, auc_roc_binned

    ev = load_table(spark, sf_dir, "events")
    lab = (F.col("event_type") == "purchase").cast("int")
    exact = auc_roc(ev, F.col("value"), lab, precision=9).select(
        F.col("auc").alias("auc_raw"), "n_pos", "n_neg"
    )
    binned = auc_roc_binned(
        ev, F.col("value"), lab, lo=0.0, hi=500.0, n_bins=100, precision=9
    ).select(F.col("auc").alias("auc_binned_raw"))
    return exact.crossJoin(binned).select(
        F.round("auc_raw", 6).alias("auc"),
        F.round("auc_binned_raw", 6).alias("auc_binned"),
        "n_pos",
        "n_neg",
        (F.abs(F.col("auc_raw") - F.col("auc_binned_raw")) < 0.01).alias(
            "binned_close"
        ),
    )


@register(
    "confusion_threshold_metrics",
    oracle="""
    WITH m AS (
        SELECT SUM(CASE WHEN value >= 50.0 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS tp,
               SUM(CASE WHEN value >= 50.0 AND event_type <> 'purchase' THEN 1 ELSE 0 END) AS fp,
               SUM(CASE WHEN value < 50.0 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS fn,
               SUM(CASE WHEN value < 50.0 AND event_type <> 'purchase' THEN 1 ELSE 0 END) AS tn
        FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS precision,
           ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS recall,
           ROUND(2 * (CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0)) * (CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0))
                 / NULLIF(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0) + CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 0), 6) AS f1,
           ROUND(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy
    FROM m
    """,
)
def q_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded confusion matrix + precision/recall/F1/accuracy
    (ml/evaluate.py:binary_metrics): ONE conditional-sum scan — partial
    aggregation map-side, a single 1-row shuffle, no sort, no join.
    The shape stays O(1) in output at any input size."""
    from .ml.evaluate import binary_metrics

    ev = load_table(spark, sf_dir, "events")
    lab = (F.col("event_type") == "purchase").cast("int")
    return binary_metrics(ev, F.col("value"), lab, threshold=50.0)


@register(
    "calibration_curve_value",
    oracle="""
    SELECT CAST(LEAST(GREATEST(FLOOR(value / 50.0), 0), 9) AS BIGINT) AS bin,
           COUNT(*) AS n,
           ROUND(AVG(value), 6) AS mean_score,
           ROUND(AVG(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END), 6) AS frac_pos
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1
    ORDER BY bin
    """,
)
def q_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram aggregates (ml/evaluate.py:calibration_bins):
    10 fixed-width score bins over [0, 500] with per-bin mean score and
    observed positive rate. Bin edges are data-independent constants, so
    there is no quantile pre-pass and bin assignment is bit-identical
    across engines; the whole query is one hash aggregate."""
    from .ml.evaluate import calibration_bins

    ev = load_table(spark, sf_dir, "events")
    lab = (F.col("event_type") == "purchase").cast("int")
    return calibration_bins(
        ev, F.col("value"), lab, lo=0.0, hi=500.0, n_bins=10
    )


@register(
    "logloss_sigmoid_value",
    oracle="""
    WITH p AS (
        SELECT LEAST(GREATEST(1.0 / (1.0 + EXP(-(value - 50.0) / 25.0)), 1e-15), 1.0 - 1e-15) AS pc,
               CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        FROM events WHERE value IS NOT NULL
    )
    SELECT ROUND(AVG(-(y * LN(pc) + (1 - y) * LN(1 - pc))), 6) AS log_loss,
           COUNT(*) AS n
    FROM p
    """,
)
def q_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipped cross-entropy (ml/evaluate.py:log_loss) of a fixed
    logistic link p = σ((value-50)/25) against the purchase label —
    sklearn.log_loss semantics (p clipped to [1e-15, 1-1e-15]). One
    conditional-average scan; the sigmoid is a codegen expression, no
    UDF, no Python boundary."""
    from .ml.evaluate import log_loss

    ev = load_table(spark, sf_dir, "events")
    lab = (F.col("event_type") == "purchase").cast("int")
    p = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.col("value") - F.lit(50.0)) / F.lit(25.0))
    )
    return log_loss(ev, p, lab)


@register(
    "psi_value_drift",
    oracle="""
    WITH binned AS (
        SELECT CAST(LEAST(GREATEST(FLOOR(value / 50.0), 0), 9) AS BIGINT) AS bin,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ce,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ca
        FROM events
        WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
        GROUP BY 1
    ),
    f AS (
        SELECT GREATEST(CAST(ce AS DOUBLE) / SUM(ce) OVER (), 1e-6) AS fe,
               GREATEST(CAST(ca AS DOUBLE) / SUM(ca) OVER (), 1e-6) AS fa,
               ce, ca
        FROM binned
    )
    SELECT ROUND(SUM((fa - fe) * LN(fa / fe)), 6) AS psi,
           CAST(SUM(ce) AS BIGINT) AS n_expected,
           CAST(SUM(ca) AS BIGINT) AS n_actual
    FROM f
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index (ml/drift.py:psi) between the value
    distributions of 'view' (expected) and 'purchase' (actual) events —
    the train-vs-serve drift monitor. Both sides are tagged and
    unioned, so the whole statistic is ONE grouped aggregation over one
    combined scan into 10 data-independent bins; the shuffle carries
    ≤ 10 rows per map task and the final sum runs over ≤ 10 rows."""
    from .ml.drift import psi

    ev = load_table(spark, sf_dir, "events")
    return psi(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
        lo=0.0,
        hi=500.0,
        n_bins=10,
    )


@register(
    "ks_value_types",
    oracle="""
    WITH u AS (
        SELECT value AS k,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
        FROM events
        WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
        GROUP BY value
    ),
    c AS (
        SELECT CAST(SUM(ca) OVER (ORDER BY k) AS DOUBLE) / SUM(ca) OVER ()
               - CAST(SUM(cb) OVER (ORDER BY k) AS DOUBLE) / SUM(cb) OVER () AS diff,
               SUM(ca) OVER () AS na,
               SUM(cb) OVER () AS nb
        FROM u
    )
    SELECT ROUND(MAX(ABS(diff)), 6) AS ks,
           CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b
    FROM c
    """,
)
def q_ks_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic
    (ml/drift.py:ks_two_sample) between 'view' and 'purchase' value
    distributions. Collapses to distinct values (hash agg) before the
    ordered ECDF pass, so the single-partition window sees |distinct|
    rows, not n; the bins=(lo,hi,n) variant bounds that frame to n rows
    for continuous columns at 100 TB (tested equivalent in pytest)."""
    from .ml.drift import ks_two_sample

    ev = load_table(spark, sf_dir, "events")
    return ks_two_sample(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
    )


@register(
    "embedding_linear_score_topk",
    oracle="""
    WITH w AS (
        SELECT i, ((((i - 1) * 2654435761) % 97) - 48) / 97.0 AS wv
        FROM (SELECT UNNEST(RANGE(1, 65)) AS i)
    ),
    dots AS (
        SELECT vec_id, label, SUM(embedding[w.i] * w.wv) AS d
        FROM embeddings CROSS JOIN w
        GROUP BY vec_id, label
    )
    SELECT vec_id, label, ROUND(1.0 / (1.0 + EXP(-(d + 0.1))), 6) AS score
    FROM dots
    ORDER BY score DESC, vec_id
    LIMIT 50
    """,
)
def q_embedding_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch logistic scoring over the embedding column
    (ml/scoring.py:score_linear): σ(w·x + b) with a fixed 64-dim weight
    vector embedded as a literal array in the plan — map-only, zero
    shuffle, zero broadcast, JVM-side fold (functions/vectors.py:dot),
    then TakeOrderedAndProject for the top-50. Ordering is on the
    ROUNDED score with vec_id tie-break so the top-k cut is identical
    across engines. The deterministic pseudo-weights
    w_j = ((j·2654435761) mod 97 − 48)/97 are reproduced literally in
    the DuckDB oracle."""
    from .ml.scoring import score_linear

    ws = [((j * 2654435761) % 97 - 48) / 97.0 for j in range(64)]
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        score_linear(emb, "embedding", ws, intercept=0.1)
        .select("vec_id", "label", "score")
        .orderBy(F.desc("score"), "vec_id")
        .limit(50)
    )


@register(
    "loo_target_encode_hour",
    oracle="""
    WITH g AS (SELECT AVG(value) AS gm FROM events),
    s AS (
        SELECT event_id, value,
               SUM(value) OVER (PARTITION BY user_id, event_type, HOUR(ts)) AS st,
               COUNT(value) OVER (PARTITION BY user_id, event_type, HOUR(ts)) AS ct
        FROM events
    )
    SELECT event_id,
           ROUND(CASE WHEN value IS NULL THEN NULL
                      WHEN ct > 1 THEN (st - value) / (ct - 1)
                      ELSE (SELECT gm FROM g) END, 6) AS loo_enc
    FROM s
    ORDER BY event_id
    """,
)
def q_loo_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding (ml/scoring.py:loo_target_encode)
    of value on (user_id, event_type, hour) — the leakage-safe variant
    of target_encode_event_type: each row is encoded by the mean target
    of the OTHER rows in its group, singletons fall back to the global
    mean (this key is fine-grained enough that the fallback branch is
    exercised). One window shuffle on the group key + a broadcast 1-row
    global-mean frame."""
    from .ml.scoring import loo_target_encode

    ev = load_table(spark, sf_dir, "events").withColumn(
        "hr", F.hour("ts")
    )
    return (
        loo_target_encode(ev, ["user_id", "event_type", "hr"], "value")
        .select("event_id", "loo_enc")
        .orderBy("event_id")
    )


@register(
    "triangle_count_coparts",
    oracle="""
    WITH e0 AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    t AS (
        SELECT COUNT(*) AS n_triangles
        FROM e0 e1
        JOIN e0 e2 ON e2.u = e1.v
        JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    s AS (SELECT COUNT(*) AS n_edges FROM e0),
    n AS (
        SELECT COUNT(*) AS n_nodes
        FROM (SELECT u AS node FROM e0 UNION SELECT v AS node FROM e0)
    )
    SELECT t.n_triangles, n.n_nodes, s.n_edges FROM t, s, n
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (operators/graph.py:triangle_count) over the
    part co-purchase graph (parts sharing an order,
    graph.py:co_occurrence_edges) — the clustering-coefficient /
    fraud-ring primitive. Degree-ordered edge orientation caps every
    out-degree at O(√m), so the wedge self-join is Σ C(outdeg,2) =
    O(m^1.5) with no hot-node skew — the plan that survives a power-law
    degree distribution at 100 TB, vs the oracle's naive 3-way
    self-join which is only viable at test scale."""
    from .operators.graph import co_occurrence_edges, triangle_count

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    edges = co_occurrence_edges(li, "l_orderkey", "l_partkey")
    return triangle_count(edges)


@register(
    "ewma_value_user",
    oracle="""
    WITH r AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn
        FROM events
        WHERE value IS NOT NULL
    )
    SELECT a.event_id,
           ROUND(SUM(b.value * POWER(0.7, a.rn - b.rn))
                 / SUM(POWER(0.7, a.rn - b.rn)), 6) AS ewma
    FROM r a JOIN r b
      ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 19 AND a.rn
    GROUP BY a.event_id
    ORDER BY a.event_id
    """,
)
def q_ewma_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-window EWMA (operators/windows.py:ewma_bounded) of value
    per user over the trailing 20 events, α=0.3 — the smoothed-velocity
    feature (pandas ewm(adjust=True) convention, truncated history).
    One window shuffle on user_id; the weighted sum is a JVM-side fold
    over the collected frame, O(n) state per row. The oracle expands
    the same window as a banded row_number self-join — the quadratic
    form this operator avoids."""
    from .operators.windows import ewma_bounded

    ev = load_table(spark, sf_dir, "events")
    return (
        ewma_bounded(
            ev,
            keys=["user_id"],
            order_by=["ts", "event_id"],
            value="value",
            alpha=0.3,
            n=20,
        )
        .select("event_id", "ewma")
        .orderBy("event_id")
    )


@register(
    "doc_perplexity_profile",
    oracle=r"""
    WITH tk AS (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
        FROM documents
    ),
    valid AS (SELECT doc_id, toks FROM tk WHERE len(toks) >= 2 AND toks[1] <> ''),
    bg AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM valid)
    ),
    cnt AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    ctx AS (SELECT w1, SUM(c) AS c1 FROM cnt GROUP BY 1),
    voc AS (
        SELECT COUNT(DISTINCT t) AS v
        FROM (SELECT unnest(toks) AS t FROM valid)
    ),
    scored AS (
        SELECT b.doc_id,
               LN((cnt.c + 0.1) / (ctx.c1 + 0.1 * voc.v)) AS logp
        FROM bg b
        JOIN cnt ON b.w1 = cnt.w1 AND b.w2 = cnt.w2
        JOIN ctx ON b.w1 = ctx.w1
        CROSS JOIN voc
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(EXP(-AVG(logp)), 6) AS ppl
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM perplexity
    (operators/search.py:lm_perplexity), the CCNet-style quality
    filter: self-trained add-k(0.1) bigram model, docs scored by
    exp(−mean ln P(w2|w1)). The LM statistics (counts, context sums,
    vocab size) live on vocabulary-bounded frames; at 100 TB the
    pruned LM broadcasts and scoring becomes map-only — here the
    bigram-key join runs through AQE. Self-trained corpus means every
    doc bigram hits the counts table (inner-equivalent left join), and
    the smoothing term defines unseen mass for the reference-LM case
    (lm_docs= kwarg, pytest-covered)."""
    from .operators.search import lm_perplexity

    docs = load_table(spark, sf_dir, "documents")
    return lm_perplexity(docs, k=0.1).orderBy("doc_id")


@register(
    "scd2_user_type_history",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    chg AS (
        SELECT user_id, event_id, event_type, ts_us FROM o
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           ts_us AS valid_from_us,
           LEAD(ts_us) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
           ) AS valid_to_us
    FROM chg
    ORDER BY user_id, valid_from_us, event_type
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 derivation (operators/scd.py:build_scd2): each user's
    event_type observation stream compressed to change versions with
    half-open [valid_from, valid_to) validity intervals, valid_to NULL
    on the current version — the warehouse-standard dimension-history
    build. Both window passes share one partitioning on user_id, so the
    plan has exactly ONE shuffle (plan-audited); timestamps export as
    integer epoch micros for cross-engine-exact interval bounds."""
    from .operators.scd import build_scd2

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    return (
        build_scd2(
            ev,
            key_cols=["user_id"],
            order_cols=["ts_us", "event_id"],
            attr_cols=["event_type"],
            valid_from_col="ts_us",
            out_from="valid_from_us",
            out_to="valid_to_us",
        )
        .orderBy("user_id", "valid_from_us", "event_type")
    )


@register(
    "boilerplate_removed_docs",
    oracle=r"""
    WITH tk AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    idx AS (
        SELECT doc_id, toks,
               unnest(range(0, CAST(ceil(len(toks) / 5.0) AS BIGINT))) AS i
        FROM tk
    ),
    l AS (
        SELECT doc_id, i AS pos,
               array_to_string(list_slice(toks, i * 5 + 1, i * 5 + 5), ' ') AS line
        FROM idx
    ),
    c AS (
        SELECT line FROM l GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    k AS (
        SELECT doc_id, pos, line,
               line IN (SELECT line FROM c) AS rm
        FROM l
    )
    SELECT doc_id,
           CAST(COUNT(*) FILTER (NOT rm) AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (rm) AS BIGINT) AS n_removed,
           md5(COALESCE(string_agg(line, ' ' ORDER BY pos) FILTER (NOT rm), '')) AS text_md5
    FROM k GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_boilerplate_removed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-line removal (operators/curation.py:
    remove_boilerplate_lines — the CCNet / RefinedWeb common-line
    filter): every 5-token chunk occurring in >=2 distinct documents is
    dropped, survivors rejoin in order, md5 proves byte-exact
    reconstruction against the oracle. The corpus text never shuffles:
    frequency pass groups on 64-bit line hashes, removal positions are
    located only for affected docs, untouched docs pass through a
    null-fast path. No reference equivalent (reference has no corpus
    ops); chunking reuses the doc_chunks tokenizer shape."""
    from .operators.curation import remove_boilerplate_lines

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    lines = F.transform(
        F.sequence(
            F.lit(0),
            F.ceil(F.size(toks) / F.lit(5.0)).cast("long") - 1,
        ),
        lambda i: F.array_join(F.slice(toks, i * 5 + 1, 5), " "),
    )
    out = remove_boilerplate_lines(docs, lines, min_docs=2)
    return out.select(
        "doc_id",
        F.size("kept_lines").cast("long").alias("n_kept"),
        "n_removed",
        F.md5(F.array_join("kept_lines", " ")).alias("text_md5"),
    ).orderBy("doc_id")


@register(
    "dup_cluster_canonical",
    oracle=r"""
    WITH RECURSIVE t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS toks
        FROM documents
    ),
    s AS (SELECT doc_id, unnest(range(1, len(toks) - 1)) AS i, toks FROM t WHERE len(toks) >= 3),
    d AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM s),
    n AS (SELECT doc_id, COUNT(*) AS ns FROM d GROUP BY doc_id),
    p AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
        FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pq AS (
        SELECT ia, ib
        FROM p JOIN n na ON na.doc_id = p.ia JOIN n nb ON nb.doc_id = p.ib
        WHERE c * 1.0 / (na.ns + nb.ns - c) >= 0.5
    ),
    e AS (SELECT ia AS es, ib AS ed FROM pq UNION ALL SELECT ib, ia FROM pq),
    r AS (
        SELECT es AS id, es AS lab FROM e
        UNION
        SELECT e.ed, r.lab FROM r JOIN e ON e.es = r.id
    ),
    cc AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM r GROUP BY id),
    scored AS (
        SELECT cc.cluster_id, cc.doc_id, dd.n_chars
        FROM cc JOIN documents dd ON dd.doc_id = cc.doc_id
    ),
    ranked AS (
        SELECT cluster_id, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id
               ) AS rn
        FROM scored
    ),
    agg AS (
        SELECT cluster_id,
               CAST(COUNT(*) AS BIGINT) AS cluster_size,
               CAST(MAX(n_chars) AS BIGINT) AS keep_n_chars
        FROM scored GROUP BY cluster_id
    )
    SELECT a.cluster_id, a.cluster_size, r.doc_id AS keep_doc_id,
           a.keep_n_chars
    FROM agg a JOIN ranked r ON r.cluster_id = a.cluster_id AND r.rn = 1
    ORDER BY a.cluster_id
    """,
)
def q_dup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-survivor selection — the step AFTER near-dup clustering
    in a curation pipeline: within each Jaccard>=0.5 connected
    component, keep the highest-quality member (longest text, doc_id
    tie-break) and record cluster size. One max_by aggregate over the
    cluster assignment joined back to doc metadata; the join is on
    doc_id so it co-partitions with the CC output. Composes
    operators/dedup.py:connected_components with max_by — no extra
    machinery. No reference equivalent."""
    from .operators.dedup import connected_components, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    cc = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    scored = cc.join(docs.select("doc_id", "n_chars"), "doc_id")
    return (
        scored.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.expr("max_by(doc_id, struct(n_chars, -doc_id))").alias(
                "keep_doc_id"
            ),
            F.max("n_chars").cast("long").alias("keep_n_chars"),
        )
        .orderBy("cluster_id")
    )


@register(
    "event_transition_probs",
    oracle=r"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
               ) AS next_type
        FROM events
    ),
    pairs AS (
        SELECT event_type AS src, next_type AS dst, COUNT(*) AS cnt
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT src, dst, CAST(cnt AS BIGINT) AS cnt,
           ROUND(cnt * 1.0 / SUM(cnt) OVER (PARTITION BY src), 6) AS prob
    FROM pairs ORDER BY src, dst
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current type). One window shuffle on user_id
    (lead), then the pair counts and the per-source normalization ride
    a single groupBy — the normalizing SUM runs over the tiny
    (src x dst) matrix, not the event stream. Orders on (ts_us,
    event_id) so intra-microsecond ties break identically in both
    engines (ADVICE r3 ns-precision class). Sequence-model/funnel
    surface; no reference equivalent."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wsrc = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        F.col("cnt").cast("long").alias("cnt"),
        F.round(F.col("cnt") / F.sum("cnt").over(wsrc), 6).alias("prob"),
    ).orderBy("src", "dst")


@register(
    "autocorr_lag1_users",
    oracle=r"""
    WITH seq AS (
        SELECT user_id, value,
               lag(value) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
               ) AS prev_value
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(corr(value, prev_value), 6) AS acf1
    FROM seq WHERE prev_value IS NOT NULL
    GROUP BY user_id HAVING COUNT(*) >= 20
    ORDER BY user_id
    """,
)
def q_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key lag-1 autocorrelation of the value series — the
    time-series diagnostic behind burst/periodicity detection (is a
    user's activity self-correlated?). lag() and the corr aggregate
    share ONE shuffle on user_id; corr is Spark's built-in
    codegen'd Pearson (pairwise-deletion on the lag NULLs matches the
    oracle's WHERE). Keys with <20 pairs are suppressed — small-n
    correlations are noise. Ties break on (ts_us, event_id) in both
    engines. No reference equivalent (reference has no window stats)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            "value",
            F.expr("ts_ns div 1000").alias("ts_us"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.withColumn("prev_value", F.lag("value").over(w)).filter(
        F.col("prev_value").isNotNull()
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("value", "prev_value"), 6).alias("acf1"),
        )
        .filter(F.col("n_pairs") >= 20)
        .select("user_id", F.col("n_pairs").cast("long").alias("n_pairs"), "acf1")
        .orderBy("user_id")
    )


@register(
    "referential_integrity_audit",
    oracle=r"""
    SELECT fk, CAST(total AS BIGINT) AS total,
           CAST(orphans AS BIGINT) AS orphans
    FROM (
        SELECT 'lineitem.l_orderkey->orders' AS fk,
               (SELECT COUNT(*) FROM lineitem) AS total,
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphans
        UNION ALL
        SELECT 'orders.o_custkey->customer',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'customer.c_nationkey->nation',
               (SELECT COUNT(*) FROM customer),
               (SELECT COUNT(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
    ) ORDER BY fk
    """,
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table foreign-key orphan audit — the data-quality gate a
    warehouse runs before trusting joins (operators/quality.py family).
    Each FK edge is total-count + anti-join orphan count; the dimension
    side of every edge broadcasts (nation/customer/supplier/orders keys
    are the small side or a key-only projection), so no fact table
    shuffles. Key-only projections mean the parquet scans read exactly
    one column per side (pruned-scan plan-audited). No reference
    equivalent (single-table reference)."""
    def edge(name: str, fact: DataFrame, fk: str, dim: DataFrame, pk: str):
        dim_keys = dim.select(pk)
        orphans = fact.select(fk).join(
            F.broadcast(dim_keys),
            on=F.col(fk) == F.col(pk),
            how="left_anti",
        )
        return (
            fact.select(F.lit(1).alias("__one"))
            .agg(F.count(F.lit(1)).alias("total"))
            .crossJoin(
                F.broadcast(orphans.agg(F.count(F.lit(1)).alias("orphans")))
            )
            .select(F.lit(name).alias("fk"), "total", "orphans")
        )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    out = (
        edge("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey")
        .unionAll(edge("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey"))
        .unionAll(edge("customer.c_nationkey->nation", cust, "c_nationkey", nation, "n_nationkey"))
        .unionAll(edge("lineitem.l_suppkey->supplier", li, "l_suppkey", supp, "s_suppkey"))
    )
    return out.orderBy("fk")


@register(
    "model_eval_pr_auc",
    oracle="""
    WITH p AS (
        SELECT ROUND(1.0 / (1.0 + EXP(-(value - 50.0) / 25.0)), 6) AS sc,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT sc, CAST(SUM(y) AS DOUBLE) AS pos_s,
               CAST(SUM(1 - y) AS DOUBLE) AS neg_s
        FROM p GROUP BY sc
    ),
    c AS (
        SELECT pos_s,
               SUM(pos_s) OVER (ORDER BY sc DESC) AS tp,
               SUM(pos_s + neg_s) OVER (ORDER BY sc DESC) AS pp
        FROM g
    )
    SELECT ROUND(SUM(pos_s * tp / pp) / SUM(pos_s), 6) AS average_precision,
           CAST(SUM(pos_s) AS BIGINT) AS n_pos,
           (SELECT CAST(SUM(pos_s + neg_s) AS BIGINT) FROM g) AS n
    FROM c
    """,
)
def q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision (ml/evaluate.py:average_precision —
    sklearn average_precision_score) of the fixed logistic score
    σ((value-50)/25) against the purchase label. Scores round to 6dp
    BEFORE the distinct-score collapse so both engines group on
    identical keys; the ordered prefix-sum then runs over the small
    distinct-score frame, mirroring model_eval_auc's scale contract."""
    from .ml.evaluate import average_precision

    ev = load_table(spark, sf_dir, "events")
    score = F.round(
        F.lit(1.0)
        / (F.lit(1.0) + F.exp(-(F.col("value") - F.lit(50.0)) / F.lit(25.0))),
        6,
    )
    lab = (F.col("event_type") == "purchase").cast("int")
    return average_precision(ev, score, lab)


@register(
    "cms_heavy_hitters",
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS never_underestimates,
           TRUE AS overestimate_within_8eps
    FROM events
    """,
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch self-audit (operators/sketches.py:
    count_min_estimate, depth=4 x width=512): estimate every user's
    event count from the sketch and assert the CMS contract against the
    exact counts — estimates never undershoot, and the worst
    overestimate stays within 8·n/width (the ε-bound with generous
    margin; E[excess] = n/width per counter row, minimized over 4
    independent rows). Invariant-style oracle (hll_within_tolerance
    pattern): the booleans must come back TRUE at any scale, n_keys /
    n_rows are exact-checked. Sketch build shuffles <= depth*width
    rows per task; probing broadcasts the finished 2048-row sketch."""
    from .operators.sketches import count_min_estimate

    ev = load_table(spark, sf_dir, "events")
    est = count_min_estimate(ev, "user_id", depth=4, width=512)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    joined = exact.join(est, "user_id")
    totals = ev.agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        joined.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.min(F.col("cms_est") >= F.col("exact_cnt")).alias(
                "never_underestimates"
            ),
            F.max(F.col("cms_est") - F.col("exact_cnt")).alias("__worst"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("n_rows").cast("long").alias("n_rows"),
            "never_underestimates",
            (F.col("__worst") <= F.lit(8.0) * F.col("n_rows") / F.lit(512)).alias(
                "overestimate_within_8eps"
            ),
        )
    )


@register(
    "hash_filter_prune",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS fact_total,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey
                                 AND o.o_totalprice > 400000)) AS BIGINT) AS exact_semi,
           TRUE AS no_false_negatives,
           TRUE AS fp_within_3x_expected
    """,
)
def q_hash_filter_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-style semi-join pruning audit (operators/sketches.py:
    hash_filter_semijoin, 2^16 buckets): prune lineitem against the
    hash buckets of high-value orders, then assert (a) every true match
    survived — false negatives are structurally impossible — and
    (b) the false-positive carry-through is within 3x the expected
    |dim keys|/num_buckets rate, at ANY scale (the bound adapts to the
    measured dim cardinality, so the invariant is scale-free).
    fact_total/exact_semi are exact-checked. This is the pre-shuffle
    pruning pattern for joins the optimizer can't bloom on its own."""
    from .operators.sketches import hash_filter_semijoin

    nb = 1 << 16
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    dim = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    filtered = hash_filter_semijoin(li, "l_orderkey", dim, "o_orderkey", num_buckets=nb)
    exact = li.join(
        F.broadcast(dim.select("o_orderkey")),
        on=F.col("l_orderkey") == F.col("o_orderkey"),
        how="left_semi",
    )
    n_fact = li.agg(F.count(F.lit(1)).alias("fact_total"))
    n_filt = filtered.agg(F.count(F.lit(1)).alias("__n_filtered"))
    n_exact = exact.agg(F.count(F.lit(1)).alias("exact_semi"))
    n_dim = dim.agg(F.count_distinct("o_orderkey").alias("__n_dim"))
    # false negatives: true matches the filter dropped (must be zero)
    fn = exact.join(
        filtered.distinct(),
        on="l_orderkey",
        how="left_anti",
    ).agg(F.count(F.lit(1)).alias("__fn"))
    return (
        n_fact.crossJoin(F.broadcast(n_filt))
        .crossJoin(F.broadcast(n_exact))
        .crossJoin(F.broadcast(n_dim))
        .crossJoin(F.broadcast(fn))
        .select(
            F.col("fact_total").cast("long").alias("fact_total"),
            F.col("exact_semi").cast("long").alias("exact_semi"),
            (F.col("__fn") == 0).alias("no_false_negatives"),
            (
                (F.col("__n_filtered") - F.col("exact_semi"))
                <= F.lit(3.0)
                * F.col("__n_dim")
                / F.lit(nb)
                * (F.col("fact_total") - F.col("exact_semi"))
                + F.lit(10.0)
            ).alias("fp_within_3x_expected"),
        )
    )


@register(
    "jl_distortion_profile",
    oracle="""
    WITH s AS (SELECT vec_id FROM embeddings WHERE vec_id % 37 = 0)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_sampled,
           CAST((SELECT COUNT(*) FROM s a JOIN s b ON a.vec_id < b.vec_id)
                AS BIGINT) AS n_pairs,
           TRUE AS mean_sq_ratio_tight,
           TRUE AS tails_bounded
    """,
)
def q_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss projection audit (operators/similarity.py:
    random_project, 64 -> 16 dims): on a deterministic vector sample,
    the mean squared distance ratio (projected/original) must sit in
    [0.8, 1.2] (E=1 exactly, per-pair var 2/16, so the mean over the
    pair set concentrates hard) and >= 90% of pairs must individually
    stay within 2x squared distortion (chi-sq_16 tails put ~97% there).
    Invariant-style oracle (hll_within_tolerance pattern) with exact
    sample/pair counts. The sampled self-join broadcasts — the full
    corpus never pairs."""
    from .operators.similarity import random_project

    emb = load_table(spark, sf_dir, "embeddings")
    sampled = emb.filter(F.col("vec_id") % 37 == 0).select("vec_id", "embedding")
    proj = random_project(sampled, dim=64, out_dim=16)
    both = sampled.join(
        proj.select(F.col("vec_id"), F.col("embedding").alias("proj")), "vec_id"
    )
    a = both.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("proj").alias("pa"),
    )
    b = both.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("proj").alias("pb"),
    )

    def sqdist(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: (u - v) * (u - v)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    pairs = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            sqdist(F.col("va"), F.col("vb")).alias("d_orig"),
            sqdist(F.col("pa"), F.col("pb")).alias("d_proj"),
        )
        # zero-distance (duplicate) pairs have no defined ratio; they
        # count toward n_pairs but not the distortion stats
        .select(
            F.when(F.col("d_orig") > 0, F.col("d_proj") / F.col("d_orig")).alias(
                "r2"
            )
        )
    )
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.avg("r2").alias("__mean"),
        F.avg(
            ((F.col("r2") <= 2.0) & (F.col("r2") >= 0.5)).cast("double")
        ).alias("__frac_2x"),
    )
    n_sampled = sampled.agg(F.count(F.lit(1)).alias("n_sampled"))
    return (
        n_sampled.crossJoin(F.broadcast(stats))
        .select(
            F.col("n_sampled").cast("long").alias("n_sampled"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            ((F.col("__mean") >= 0.8) & (F.col("__mean") <= 1.2)).alias(
                "mean_sq_ratio_tight"
            ),
            (F.col("__frac_2x") >= 0.9).alias("tails_bounded"),
        )
    )


@register(
    "kcore_decomposition_invariants",
    oracle="""
    WITH e0 AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    n AS (
        SELECT COUNT(*) AS n_nodes
        FROM (SELECT u AS node FROM e0 UNION SELECT v AS node FROM e0)
    )
    SELECT CAST(n.n_nodes AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_edges,
           TRUE AS core_le_degree,
           TRUE AS core_property_holds
    FROM n
    """,
)
def q_kcore_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition audit (operators/graph.py:k_core, H-index
    propagation) over the part co-purchase graph. The defining property
    of the core numbering is checked distributedly: every node must
    have (a) core <= degree and (b) at least core(v) neighbors whose
    own core >= core(v) — the unique maximal such assignment IS the
    core decomposition (exactness vs brute-force peeling is pytest-
    covered on small graphs). Invariant-style oracle with exact
    node/edge counts. Iterative rounds: one node-keyed shuffle each,
    lineage-truncated."""
    from .operators.graph import co_occurrence_edges, k_core

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = co_occurrence_edges(li, "l_orderkey", "l_partkey")
    core = k_core(edges)

    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    nb_core = (
        und.join(core.select(F.col("id").alias("src"), "core"), "src")
        .join(
            core.select(
                F.col("id").alias("dst"), F.col("core").alias("nb")
            ),
            "dst",
        )
        .groupBy("src", "core")
        .agg(
            F.sum((F.col("nb") >= F.col("core")).cast("long")).alias(
                "n_strong"
            )
        )
    )
    checks = (
        core.join(deg, "id")
        .agg(F.min(F.col("core") <= F.col("deg")).alias("core_le_degree"))
        .crossJoin(
            F.broadcast(
                nb_core.agg(
                    F.min(F.col("n_strong") >= F.col("core")).alias(
                        "core_property_holds"
                    )
                )
            )
        )
    )
    counts = core.agg(F.count(F.lit(1)).alias("n_nodes")).crossJoin(
        F.broadcast(edges.agg(F.count(F.lit(1)).alias("n_edges")))
    )
    return counts.crossJoin(F.broadcast(checks)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        "core_le_degree",
        "core_property_holds",
    )


@register(
    "attribution_last_touch",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prior_channel
        FROM events
    )
    SELECT COALESCE(prior_channel, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM seq WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY channel
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent prior non-purchase event type ('direct' when the purchase
    is the stream head). One window shuffle on user_id — the
    ignore-nulls running last() carries the channel forward, so no
    self-join against the event history. The purchase filter applies
    AFTER the window (it needs full history) but the aggregate is
    matrix-sized. Ties break on (ts_us, event_id) in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("prior_channel", prior)
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("prior_channel"), F.lit("direct")).alias("channel")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
        .orderBy("channel")
    )


@register(
    "mixture_rebalance_weights",
    oracle="""
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS DOUBLE) AS n_docs
        FROM documents GROUP BY source
    ),
    t AS (
        SELECT source, n_docs,
               n_docs / SUM(n_docs) OVER () AS share,
               1.0 / COUNT(*) OVER () AS target
        FROM s
    ),
    sc AS (SELECT MIN(share / target) AS scale FROM t)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           ROUND(share, 6) AS share,
           ROUND(LEAST(target * (SELECT scale FROM sc) / share, 1.0), 6)
               AS keep_prob,
           CAST(FLOOR(n_docs * target * (SELECT scale FROM sc) / share)
                AS BIGINT) AS expected_docs
    FROM t ORDER BY source
    """,
)
def q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixture rebalancing: per-source keep-probabilities
    that turn the corpus's organic source mix into a UNIFORM target mix
    by downsampling only (scale = min share/target caps every
    keep_prob at 1, so the bottleneck source keeps everything and the
    rest thin out proportionally). The output feeds a
    deterministic-hash Bernoulli filter (stratified_sample_docs
    machinery) — this query is the planning half every mixture run
    needs. All arithmetic over the tiny per-source aggregate; one
    grouped scan."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    wall = Window.partitionBy()
    t = s.select(
        "source",
        "n_docs",
        (F.col("n_docs") / F.sum("n_docs").over(wall)).alias("share"),
        (F.lit(1.0) / F.count(F.lit(1)).over(wall)).alias("target"),
    )
    scale = t.agg(F.min(F.col("share") / F.col("target")).alias("scale"))
    return (
        t.crossJoin(F.broadcast(scale))
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round("share", 6).alias("share"),
            F.round(
                F.least(
                    F.col("target") * F.col("scale") / F.col("share"),
                    F.lit(1.0),
                ),
                6,
            ).alias("keep_prob"),
            F.floor(
                F.col("n_docs") * F.col("target") * F.col("scale") / F.col("share")
            )
            .cast("long")
            .alias("expected_docs"),
        )
        .orderBy("source")
    )


@register(
    "cms_join_size_estimate",
    oracle="""
    SELECT CAST((SELECT COUNT(*)
                 FROM lineitem l JOIN orders o
                   ON o.o_orderkey = l.l_orderkey
                 WHERE o.o_totalprice > 400000) AS BIGINT) AS exact_size,
           TRUE AS never_underestimates,
           TRUE AS within_collision_margin
    """,
)
def q_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation without the join (operators/
    sketches.py:count_min_inner_product — Cormode & Muthukrishnan's CMS
    inner product): sketch lineitem keys and high-value-order keys
    independently, meet in a sketch-sized join, and assert the contract
    against the actually-executed join — never under, over by at most
    4x the expected collision mass |A|·|B|/width (+10 absolute slack
    for tiny inputs). The planning primitive for broadcast-vs-shuffle-
    vs-salt decisions when NDV stats are stale. Invariant-style oracle;
    exact_size is exact-checked."""
    from .operators.sketches import count_min_inner_product

    w = 1 << 18
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    est = count_min_inner_product(li, "l_orderkey", dim, "o_orderkey", width=w)
    exact = (
        li.join(
            F.broadcast(dim),
            on=F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(F.count(F.lit(1)).alias("exact_size"))
    )
    sizes = li.agg(F.count(F.lit(1)).alias("__na")).crossJoin(
        F.broadcast(dim.agg(F.count(F.lit(1)).alias("__nb")))
    )
    return (
        exact.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(sizes))
        .select(
            F.col("exact_size").cast("long").alias("exact_size"),
            (F.col("join_size_est") >= F.col("exact_size")).alias(
                "never_underestimates"
            ),
            (
                F.col("join_size_est")
                <= F.col("exact_size")
                + F.lit(4.0) * F.col("__na") * F.col("__nb") / F.lit(w)
                + F.lit(10.0)
            ).alias("within_collision_margin"),
        )
    )


@register(
    "shard_merged_moments",
    oracle="""
    WITH p AS (
        SELECT user_id % 4 AS shard, event_type,
               COUNT(*) AS n, SUM(value) AS s1, SUM(value * value) AS s2
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, SUM(n) AS n, SUM(s1) AS s1, SUM(s2) AS s2
        FROM p GROUP BY 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           ROUND(s1 / n, 6) AS mean,
           ROUND(s2 / n - (s1 / n) * (s1 / n), 6) AS var_pop,
           ROUND(SQRT(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0)), 6)
               AS std_pop
    FROM m ORDER BY event_type
    """,
)
def q_shard_merged_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-statistics pattern (operators/incremental.py:
    moment_partials + merge_moments): per-shard (n, Σx, Σx²) power sums
    merged to exact global mean/variance — the incremental-maintenance
    answer for running stats (daily shards → monthly stats with no
    history rescan), closing incremental.py's documented avg/variance
    gap. The deliberate shard split (user_id % 4) stands in for
    independently-aggregated partitions; merge-then-finalize is
    checked exact against the single-pass oracle."""
    from .operators.incremental import merge_moments, moment_partials

    ev = load_table(spark, sf_dir, "events").withColumn(
        "shard", F.col("user_id") % 4
    )
    partials = moment_partials(ev, ["shard", "event_type"], "value")
    return merge_moments(partials, ["event_type"]).orderBy("event_type")


@register(
    "zipf_slope_tokens",
    oracle="""
    WITH f AS (
        SELECT word, CAST(COUNT(*) AS DOUBLE) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
    ),
    r AS (
        SELECT n, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word)
                       AS DOUBLE) AS rnk
        FROM f
    )
    SELECT CAST((SELECT COUNT(*) FROM f) AS BIGINT) AS vocab_size,
           ROUND(regr_slope(LN(n), LN(rnk)), 6) AS zipf_slope,
           ROUND(regr_intercept(LN(n), LN(rnk)), 6) AS zipf_intercept,
           ROUND(regr_r2(LN(n), LN(rnk)), 6) AS r2
    FROM r WHERE rnk <= 500
    """,
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus token distribution: OLS slope of
    ln(freq) on ln(rank) for the top-500 ranks (natural text ≈ -1;
    far-off slopes flag synthetic/templated corpora — a cheap corpus-
    health diagnostic). Exercises the regr_* aggregate family
    (regr_slope/intercept/r2 — single-pass distributed OLS, codegen,
    no UDF). Shuffle is vocab-bounded (map-side partial agg before the
    frequency exchange); the rank window runs over the top-500 frame
    only (orderBy+limit heap-select first). Deterministic tie-break
    (n desc, word) in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    freqs = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    # top-500 via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps, driver merge of 32×500 rows) — NOT row_number over the full
    # vocabulary, which funnels 10⁷–10⁸ words through one WindowExec
    # task at web scale (round-5 VERDICT #3). The rank window then runs
    # over the bounded 500-row frame only.
    top500 = freqs.orderBy(F.desc("n"), "word").limit(500)
    ranked = top500.select(
        "n",
        F.row_number()
        .over(Window.orderBy(F.desc("n"), "word"))
        .cast("double")
        .alias("rnk"),
    )
    vocab = freqs.agg(F.count(F.lit(1)).alias("vocab_size"))
    fit = ranked.agg(
        F.round(F.regr_slope(F.log("n"), F.log("rnk")), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(F.log("n"), F.log("rnk")), 6).alias(
            "zipf_intercept"
        ),
        F.round(F.regr_r2(F.log("n"), F.log("rnk")), 6).alias("r2"),
    )
    return vocab.crossJoin(F.broadcast(fit)).select(
        F.col("vocab_size").cast("long").alias("vocab_size"),
        "zipf_slope",
        "zipf_intercept",
        "r2",
    )


@register(
    "label_centroid_separation",
    oracle="""
    WITH x AS (
        SELECT label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    ),
    c AS (
        SELECT label, pos, AVG(val) AS v
        FROM x GROUP BY label, pos
    ),
    p AS (
        SELECT a.label AS label_a, b.label AS label_b,
               SUM(a.v * b.v) AS dot,
               SQRT(SUM(a.v * a.v)) AS na,
               SQRT(SUM(b.v * b.v)) AS nb
        FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
        GROUP BY 1, 2
    )
    SELECT label_a, label_b,
           ROUND(dot / (na * nb), 6) AS centroid_cosine
    FROM p ORDER BY label_a, label_b
    """,
)
def q_label_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding feature-space health: per-label centroids and their
    pairwise cosine separation (labels whose centroids collapse
    together predict classifier confusion; the cheap triage before
    training). Scale shape: posexplode multiplies rows by dim, but the
    map-side partial average collapses the shuffle to |labels|·dim
    rows; the pairwise pass runs over the tiny centroid frame joined
    position-wise (norms and dot in ONE aggregate — no array
    materialization needed on either engine)."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select("label", "pos", F.col("val").cast("double").alias("val"))
    c = x.groupBy("label", "pos").agg(F.avg("val").alias("v"))
    a = c.select(
        F.col("label").alias("label_a"), "pos", F.col("v").alias("va")
    )
    b = c.select(
        F.col("label").alias("label_b"), "pos", F.col("v").alias("vb")
    )
    pairs = (
        a.join(b, ["pos"])
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("va") * F.col("vb")).alias("dot"),
            F.sqrt(F.sum(F.col("va") * F.col("va"))).alias("na"),
            F.sqrt(F.sum(F.col("vb") * F.col("vb"))).alias("nb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
            "centroid_cosine"
        ),
    ).orderBy("label_a", "label_b")


@register(
    "bpe_merge_candidates",
    oracle="""
    WITH w AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS wf
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
    ),
    p AS (
        SELECT substr(word, CAST(i AS INT), 2) AS pair, wf
        FROM (SELECT word, wf, unnest(range(1, len(word))) AS i FROM w)
    )
    SELECT pair, CAST(SUM(wf) AS BIGINT) AS cnt
    FROM p GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 20
    """,
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, round-1 merge candidates: adjacent
    character-pair counts weighted by word frequency, top-20 — the
    argmax of this table IS the first BPE merge. The classic scale
    design: pair extraction runs over the DISTINCT-word frequency
    table (vocab-bounded — thousands of rows no matter the corpus
    size), never the token stream; the corpus is touched exactly once
    to build word counts with map-side partial agg. Subsequent merge
    rounds re-segment the same vocab table (iterative driver loop, the
    standard implementation) — round 1 proves the distributed shape.
    Deterministic tie-break (count desc, pair asc) →
    TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    # filter BEFORE sequence(): Spark's sequence(1, 0) descends rather
    # than returning empty, so a 1-char word would fabricate pairs
    pairs = words.filter(F.length("word") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "wf",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(20)
    )


@register(
    "kmeans_invariants",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM embeddings
                 WHERE embedding IS NOT NULL) AS BIGINT) AS n_points,
           CAST(8 AS BIGINT) AS k,
           TRUE AS assignments_are_nearest,
           TRUE AS cost_beats_k1,
           TRUE AS partition_is_complete
    """,
)
def q_kmeans_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means audit (ml/clustering.py:kmeans_fit/assign — the sole
    rows-only family without a SQL twin until now): after the seeded
    fit, (a) every point's assigned centroid IS its nearest centroid
    (checked distributedly by recomputing all k distances per point
    against the broadcast centroid matrix — exact for MLlib's final
    assignment step), (b) the k=8 within-cluster cost beats the k=1
    cost (= total variance; Lloyd monotone in k for nested inits), and
    (c) the assignment partitions the table (cluster counts sum to n).
    Invariant-style oracle with exact n. Distances fold as codegen
    column arithmetic over the centroid literal — no UDF."""
    from .ml.clustering import kmeans_assign, kmeans_centroids, kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    model = kmeans_fit(emb, k=8)
    cents = kmeans_centroids(model)
    assigned = kmeans_assign(emb, model)

    def sqdist_to(c: list[float]):
        return F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.array(*[F.lit(float(x)) for x in c]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    dists = assigned.select(
        "cluster",
        F.array(*[sqdist_to(c) for c in cents]).alias("ds"),
    ).select(
        "cluster",
        F.element_at("ds", F.col("cluster") + 1).alias("d_assigned"),
        F.array_min("ds").alias("d_best"),
    )
    checks = dists.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min(F.col("d_assigned") <= F.col("d_best") + 1e-9).alias(
            "assignments_are_nearest"
        ),
        F.sum("d_assigned").alias("__cost_k"),
    )
    # k=1 cost = total variance about the global centroid, computed
    # exactly via the power-sum identity Σ_pos[Σx² − (Σx)²/n]
    # (MLlib refuses k=1, and no fit is needed for it anyway)
    cost1 = (
        emb.select(F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy("pos")
        .agg(
            F.sum(F.col("col") * F.col("col")).alias("s2"),
            F.sum("col").alias("s1"),
            F.count(F.lit(1)).alias("n"),
        )
        .agg(
            F.sum(
                F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
            ).alias("__cost_1")
        )
    )
    parts = assigned.groupBy("cluster").count().agg(
        F.sum("count").alias("__n_parts")
    )
    return (
        checks.crossJoin(F.broadcast(cost1))
        .crossJoin(F.broadcast(parts))
        .select(
            F.col("n_points").cast("long").alias("n_points"),
            F.lit(8).cast("long").alias("k"),
            "assignments_are_nearest",
            (F.col("__cost_k") < F.col("__cost_1")).alias("cost_beats_k1"),
            (F.col("__n_parts") == F.col("n_points")).alias(
                "partition_is_complete"
            ),
        )
    )


@register(
    "value_time_trend_by_type",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(value, epoch_us(ts) / 3600000000.0), 6)
               AS slope_per_hour,
           ROUND(regr_r2(value, epoch_us(ts) / 3600000000.0), 6) AS r2
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_value_time_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS drift trend: per event type, the slope of value over
    wall-clock hours (is the metric creeping?) — the regression twin of
    the PSI/KS drift monitors, as a single-pass distributed aggregate
    (regr_slope/regr_r2 partial-aggregate map-side like any algebraic
    agg; no window, no sort). Time regressor derives from the exact µs
    epoch so both engines feed identical doubles."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hours = (F.expr("ts_ns div 1000") / F.lit(3600000000.0)).alias("h")
    return (
        ev.select("event_type", "value", hours)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.regr_slope(F.col("value"), F.col("h")), 6).alias(
                "slope_per_hour"
            ),
            F.round(F.regr_r2(F.col("value"), F.col("h")), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


@register(
    "cusum_peak_by_type",
    oracle="""
    WITH m AS (
        SELECT AVG(value) AS mu FROM events WHERE value IS NOT NULL
    ),
    c AS (
        SELECT event_type,
               SUM(value - (SELECT mu FROM m)) OVER (
                   PARTITION BY event_type
                   ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cusum
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           ROUND(MAX(ABS(cusum)), 4) AS peak_cusum,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def q_cusum_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint signal: per event type, the peak absolute
    cumulative deviation from the global mean over the time-ordered
    stream — the classic mean-shift detector (a large peak marks WHERE
    the level changed). Two passes: a 1-row global mean broadcast, then
    ONE window shuffle per type partition with the running sum and max
    folding in the same pass. Ties break on (ts_us, event_id) in both
    engines; sums round to 4dp to absorb accumulation-order float
    noise."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    mu = ev.agg(F.avg("value").alias("mu"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.select(
            "event_type",
            "event_id",
            "value",
            F.expr("ts_ns div 1000").alias("ts_us"),
        )
        .crossJoin(F.broadcast(mu))
        .withColumn("cusum", F.sum(F.col("value") - F.col("mu")).over(w))
        .groupBy("event_type")
        .agg(
            F.round(F.max(F.abs("cusum")), 4).alias("peak_cusum"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "semantic_dedup_invariants",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM embeddings
                 WHERE embedding IS NOT NULL) AS BIGINT) AS n_vectors,
           TRUE AS partition_complete,
           TRUE AS no_kept_kept_pair,
           TRUE AS every_dropped_has_dup_edge
    """,
)
def q_semantic_dedup_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup audit (operators/similarity.py:semantic_dedup — Abbas
    et al. 2023): embedding-level near-dup removal where seeded k-means
    clusters bound the candidate product and connected components pick
    one survivor per dup group. Checked distributedly: the keep/drop
    flags partition the table; no two KEPT vectors form a >= threshold
    pair (survivors are independent); every DROPPED vector sits on at
    least one dup edge (nothing is dropped without cause). Invariant-
    style oracle with exact n. The pair recompute rides the same
    seeded deterministic path as the dedup itself."""
    from .operators.similarity import cosine_near_dup_pairs, semantic_dedup
    from .ml.clustering import kmeans_assign, kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    sd = semantic_dedup(emb, k=16, threshold=0.95)

    model = kmeans_fit(emb, k=16)
    assigned = kmeans_assign(emb, model).select("vec_id", "embedding", "cluster")
    pairs = cosine_near_dup_pairs(
        assigned, threshold=0.95, bucket_col="cluster"
    ).select("id_a", "id_b")

    keep_flags = sd.select("id", "keep")
    p = (
        pairs.join(
            keep_flags.select(
                F.col("id").alias("id_a"), F.col("keep").alias("keep_a")
            ),
            "id_a",
        )
        .join(
            keep_flags.select(
                F.col("id").alias("id_b"), F.col("keep").alias("keep_b")
            ),
            "id_b",
        )
    )
    kept_kept = p.agg(
        F.coalesce(
            F.max(F.col("keep_a") & F.col("keep_b")), F.lit(False)
        ).alias("__any_kept_kept")
    )
    dup_ids = (
        pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    orphan_drops = (
        keep_flags.filter(~F.col("keep"))
        .join(dup_ids, "id", "left_anti")
        .agg(F.count(F.lit(1)).alias("__orphans"))
    )
    counts = emb.agg(F.count(F.lit(1)).alias("n_vectors")).crossJoin(
        F.broadcast(sd.agg(F.count(F.lit(1)).alias("__n_flags")))
    )
    return (
        counts.crossJoin(F.broadcast(kept_kept))
        .crossJoin(F.broadcast(orphan_drops))
        .select(
            F.col("n_vectors").cast("long").alias("n_vectors"),
            (F.col("__n_flags") == F.col("n_vectors")).alias(
                "partition_complete"
            ),
            (~F.col("__any_kept_kept")).alias("no_kept_kept_pair"),
            (F.col("__orphans") == 0).alias("every_dropped_has_dup_edge"),
        )
    )


@register(
    "join_advisor_events",
    oracle="""
    WITH pk AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    rep AS (
        SELECT CAST(SUM(n) AS BIGINT) AS fact_rows,
               ROUND(MAX(n) / (SUM(n) * 1.0 / COUNT(*)), 4) AS skew_ratio
        FROM pk
    ),
    d AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS dim_rows
        FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 3 = 0)
    )
    SELECT fact_rows, dim_rows, skew_ratio,
           CASE WHEN dim_rows <= 100000 THEN 'broadcast'
                WHEN skew_ratio >= 20.0 THEN 'shuffle+salt'
                ELSE 'shuffle' END AS recommendation
    FROM rep, d
    """,
)
def q_join_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy advisor (operators/skew.py:advise_join_strategy):
    the measurement-driven decision procedure — broadcast when the dim
    is small, salt when the fact key histogram is skewed, plain shuffle
    otherwise — returned WITH its evidence so the choice is auditable.
    The exact decision logic replays in SQL (deterministic thresholds
    over exact aggregates). Cost: one dim count + one two-phase key
    histogram; nothing collected."""
    from .operators.skew import advise_join_strategy

    ev = load_table(spark, sf_dir, "events")
    dim = ev.filter(F.col("user_id") % 3 == 0).select("user_id").distinct()
    return advise_join_strategy(ev, "user_id", dim, "user_id")


@register(
    "collapse_consecutive_events",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
               ) AS prev_type
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (
               prev_type IS NULL OR event_type <> prev_type
           ) AS BIGINT) AS n_kept
    FROM seq GROUP BY user_id ORDER BY user_id
    """,
)
def q_collapse_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-duplicate collapse (telemetry run-length cleanup:
    keep an event only when its type differs from the user's previous
    event) — the lag-compare idiom, per-user counts before/after. One
    window shuffle; the keep predicate is codegen. Ties break on
    (ts_us, event_id) in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    keep = F.col("prev_type").isNull() | (
        F.col("event_type") != F.col("prev_type")
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(keep.cast("long")).cast("long").alias("n_kept"),
        )
        .orderBy("user_id")
    )


@register(
    "dup_rate_by_source",
    oracle="""
    WITH h AS (
        SELECT source, md5(text) AS th FROM documents
    ),
    g AS (
        SELECT source, th, COUNT(*) AS n FROM h GROUP BY source, th
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_redundant,
           ROUND((SUM(n) - COUNT(*)) * 1.0 / SUM(n), 6) AS dup_rate
    FROM g GROUP BY source ORDER BY source
    """,
)
def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation observability: per-source exact-duplicate rate
    (redundant copies / docs) — the metric that tells you WHICH feed is
    flooding the corpus before you pay for near-dup passes. Group on
    (source, text-hash): the shuffle carries hashes, never text (the
    exact_dedup_docs contract, segmented). n_redundant = copies beyond
    the first per (source, hash)."""
    docs = load_table(spark, sf_dir, "documents")
    g = (
        docs.select("source", F.md5("text").alias("th"))
        .groupBy("source", "th")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        g.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            (F.sum("n") - F.count(F.lit(1))).cast("long").alias("n_redundant"),
            F.round(
                (F.sum("n") - F.count(F.lit(1))) / F.sum("n"), 6
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@register(
    "psi_quantile_bins",
    oracle="""
    WITH e AS (
        SELECT value FROM events
        WHERE event_type = 'view' AND value IS NOT NULL
    ),
    a AS (
        SELECT value FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    b AS (
        SELECT unnest(quantile_cont(value,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS cut
        FROM e
    ),
    eb AS (
        SELECT (SELECT COUNT(*) FROM b WHERE b.cut <= e.value) AS bin,
               COUNT(*) AS ce
        FROM e GROUP BY 1
    ),
    ab AS (
        SELECT (SELECT COUNT(*) FROM b WHERE b.cut <= a.value) AS bin,
               COUNT(*) AS ca
        FROM a GROUP BY 1
    ),
    m AS (
        SELECT COALESCE(eb.bin, ab.bin) AS bin,
               COALESCE(ce, 0) AS ce, COALESCE(ca, 0) AS ca
        FROM eb FULL OUTER JOIN ab ON eb.bin = ab.bin
    ),
    f AS (
        SELECT GREATEST(ce * 1.0 / SUM(ce) OVER (), 1e-6) AS fe,
               GREATEST(ca * 1.0 / SUM(ca) OVER (), 1e-6) AS fa
        FROM m
    )
    SELECT ROUND(SUM((fa - fe) * LN(fa / fe)), 6) AS psi,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_expected,
           CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_actual
    FROM f
    """,
)
def q_psi_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-binned PSI — the production drift-monitor variant:
    bins are the EXPECTED side's deciles (equal-frequency, so every
    bin carries signal regardless of the distribution's shape), then
    the same fold as psi_value_drift. The decile boundaries are one
    exact-percentile aggregate broadcast as a 9-element literal; bin
    assignment is a codegen count of boundaries <= value (identical
    tie semantics in both engines); the PSI fold runs over <= 10
    rows."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    e = ev.filter(F.col("event_type") == "view").select("value")
    a = ev.filter(F.col("event_type") == "purchase").select("value")
    cuts_row = e.agg(
        F.percentile(
            "value",
            F.array(*[F.lit(q / 10.0) for q in range(1, 10)]),
        ).alias("cuts")
    )
    tagged = (
        e.select("value", F.lit(1).alias("is_e"))
        .unionAll(a.select("value", F.lit(0).alias("is_e")))
        .crossJoin(F.broadcast(cuts_row))
        .select(
            "is_e",
            F.size(
                F.filter(F.col("cuts"), lambda c: c <= F.col("value"))
            ).alias("bin"),
        )
    )
    binned = tagged.groupBy("bin").agg(
        F.sum("is_e").alias("ce"),
        F.sum(1 - F.col("is_e")).alias("ca"),
    )
    wall = Window.partitionBy()
    f = binned.select(
        F.greatest(
            F.col("ce") / F.sum("ce").over(wall), F.lit(1e-6)
        ).alias("fe"),
        F.greatest(
            F.col("ca") / F.sum("ca").over(wall), F.lit(1e-6)
        ).alias("fa"),
    )
    psi = f.agg(
        F.round(
            F.sum((F.col("fa") - F.col("fe")) * F.log(F.col("fa") / F.col("fe"))),
            6,
        ).alias("psi")
    )
    counts = e.agg(F.count(F.lit(1)).alias("n_expected")).crossJoin(
        F.broadcast(a.agg(F.count(F.lit(1)).alias("n_actual")))
    )
    return psi.crossJoin(F.broadcast(counts)).select(
        "psi",
        F.col("n_expected").cast("long").alias("n_expected"),
        F.col("n_actual").cast("long").alias("n_actual"),
    )


@register(
    "funnel_within_1h",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
        FROM events
    ),
    st AS (
        SELECT user_id, event_type, event_id, ts_us,
               last_value(CASE WHEN event_type = 'view' THEN ts_us END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING
               ) AS view_us
        FROM ev
    ),
    st2 AS (
        SELECT user_id, event_type, event_id, ts_us,
               last_value(CASE WHEN event_type = 'click'
                               AND view_us IS NOT NULL THEN ts_us END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING
               ) AS click_us
        FROM st
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM st2
    WHERE event_type = 'purchase' AND click_us IS NOT NULL
    """,
)
def q_funnel_within_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion funnel: purchases preceded by a click
    within 1h which was itself preceded by a view within 1h of the
    click — the windowed form of funnel analysis (unbounded funnels
    overcount stale intent). Two stacked ignore-nulls last_value
    passes over RANGE frames keyed on the µs epoch; both share ONE
    user_id shuffle (same partitioning, consecutive windows), no
    self-joins against history. The carried click marker is only set
    when a view already backs it, so the chain condition composes
    without a third pass."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-hour_us, -1)
    )
    st = ev.withColumn(
        "view_us",
        F.last(
            F.when(F.col("event_type") == "view", F.col("ts_us")),
            ignorenulls=True,
        ).over(w),
    )
    st2 = st.withColumn(
        "click_us",
        F.last(
            F.when(
                (F.col("event_type") == "click")
                & F.col("view_us").isNotNull(),
                F.col("ts_us"),
            ),
            ignorenulls=True,
        ).over(w),
    )
    conv = st2.filter(
        (F.col("event_type") == "purchase") & F.col("click_us").isNotNull()
    )
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
    )


@register(
    "twap_value_by_user",
    oracle="""
    WITH seq AS (
        SELECT user_id, value, epoch_us(ts) AS ts_us,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS next_us
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           ROUND(SUM(value * (next_us - ts_us)) * 1.0
                 / SUM(next_us - ts_us), 6) AS twap
    FROM seq WHERE next_us IS NOT NULL AND next_us > ts_us
    GROUP BY user_id ORDER BY user_id
    """,
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each observation
    weighted by how long it stayed current (until the next event) —
    the correct average for irregularly-sampled series, where the
    arithmetic mean over-weights bursts. lead() and the weighted
    aggregate share ONE user_id shuffle; zero-duration interval pairs
    (same-µs ties) are excluded identically in both engines."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        "user_id", "event_id", "value",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.withColumn("next_us", F.lead("ts_us").over(w)).filter(
        F.col("next_us").isNotNull() & (F.col("next_us") > F.col("ts_us"))
    )
    dur = F.col("next_us") - F.col("ts_us")
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.round(F.sum(F.col("value") * dur) / F.sum(dur), 6).alias(
                "twap"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "ohlc_6h_value",
    oracle="""
    SELECT event_type,
           (epoch_us(ts) // 21600000000) * 21600000000 AS bucket_us,
           ROUND(arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                        || lpad(CAST(event_id AS VARCHAR), 12, '0')), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                        || lpad(CAST(event_id AS VARCHAR), 12, '0')), 4) AS close,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2 ORDER BY event_type, bucket_us
    """,
)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars (open/high/low/close per 6h bucket per type) — the
    canonical downsampling for monitoring dashboards and market data.
    open/close are min_by/max_by on the (ts, event_id) tie-broken time
    key, so the whole bar is ONE hash aggregate — no window, no sort,
    map-side partials bound the shuffle by bucket count."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        "event_type", "event_id", "value",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    bucket = (F.col("ts_us") - F.pmod("ts_us", F.lit(21_600_000_000))).alias(
        "bucket_us"
    )
    return (
        ev.groupBy("event_type", bucket)
        .agg(
            F.round(F.expr("min_by(value, struct(ts_us, event_id))"), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.expr("max_by(value, struct(ts_us, event_id))"), 4).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("event_type", "bucket_us")
    )


@register(
    "resample_1h_ffill",
    oracle="""
    WITH obs AS (
        -- same-µs duplicate observations collapse deterministically to
        -- the max-event_id value, so the carried value never depends on
        -- physical row order (ADVICE r4: tie-break determinism)
        SELECT user_id, ts_us, arg_max(value, event_id) AS value
        FROM (
            SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
            FROM events WHERE value IS NOT NULL
        )
        GROUP BY user_id, ts_us
    ),
    bounds AS (
        SELECT user_id,
               (MIN(ts_us) // 3600000000) * 3600000000 AS lo,
               (MAX(ts_us) // 3600000000) * 3600000000 AS hi
        FROM obs GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(range(lo, hi + 1, 3600000000)) AS grid_us
        FROM bounds
    ),
    tagged AS (
        SELECT user_id, grid_us AS ts_us, NULL AS value, 1 AS is_grid
        FROM grid
        UNION ALL
        SELECT user_id, ts_us, value, 0 AS is_grid FROM obs
    ),
    filled AS (
        SELECT user_id, ts_us, is_grid,
               last_value(value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts_us, is_grid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS v
        FROM tagged
    )
    SELECT user_id, ts_us AS grid_us, ROUND(v, 4) AS value_ffill
    FROM filled WHERE is_grid = 1
    ORDER BY user_id, grid_us
    """,
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to a fixed 1h grid with last-observation-carried-forward
    — the alignment step before any cross-series math on irregular
    telemetry. Grid points generate per user from its own [min, max]
    hour range (sequence + explode — no calendar table scan), union
    with observations, ONE ignore-nulls running last per user orders
    grid ticks AFTER same-µs observations (is_grid tie-break), then
    the grid rows filter out. Same-µs duplicate observations collapse
    first via max_by(value, event_id) so the carried value is
    deterministic regardless of physical row order. One window
    shuffle; grid cardinality = active-range hours per user, not
    global span."""
    hour = 3_600_000_000
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id", "event_id", "value",
            F.expr("ts_ns div 1000").alias("ts_us"),
        )
        .groupBy("user_id", "ts_us")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    bounds = ev.groupBy("user_id").agg(
        (F.min("ts_us") - F.pmod(F.min("ts_us"), F.lit(hour))).alias("lo"),
        (F.max("ts_us") - F.pmod(F.max("ts_us"), F.lit(hour))).alias("hi"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(hour))
        ).alias("ts_us"),
    ).select(
        "user_id", "ts_us",
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    tagged = grid.unionByName(
        ev.select(
            "user_id", "ts_us", "value", F.lit(0).alias("is_grid")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged.withColumn(
        "v", F.last("value", ignorenulls=True).over(w)
    )
    return (
        filled.filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.col("ts_us").alias("grid_us"),
            F.round("v", 4).alias("value_ffill"),
        )
        .orderBy("user_id", "grid_us")
    )


@register(
    "top_event_trigrams",
    oracle="""
    WITH seq AS (
        SELECT event_type AS t0,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT t0 || '>' || t1 || '>' || t2 AS trigram,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM seq WHERE t2 IS NOT NULL
    GROUP BY 1 ORDER BY cnt DESC, trigram LIMIT 20
    """,
)
def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream pattern mining: top event-type trigrams over
    per-user ordered streams — the sequence-level generalization of
    event_transition_probs (first-order → third-order context). Both
    lead() calls share ONE window shuffle; trigram counts partial-agg
    map-side (shuffle bounded by |types|³); deterministic tie-break →
    TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t0"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).filter(F.col("t2").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "t0", "t1", "t2").alias("trigram")
        )
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "trigram")
        .limit(20)
    )


@register(
    "hourly_type_correlation",
    oracle="""
    WITH h AS (
        SELECT (epoch_us(ts) // 3600000000) AS hour_id,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS nv,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
        FROM events GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
           ROUND(corr(nv, np), 6) AS view_purchase_corr
    FROM h
    """,
)
def q_hourly_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series correlation after temporal alignment: hourly view
    and purchase counts correlated over the shared hour grid — the
    'do these metrics move together' question. The pivot is a
    conditional-sum aggregate (no join between the two series, both
    fold in ONE grouped pass over one scan); corr runs over the
    hour-count frame."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.expr("(ts_ns div 1000) div 3600000000").alias("hour_id")
    ).agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("nv"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("np"),
    )
    return h.agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.round(F.corr("nv", "np"), 6).alias("view_purchase_corr"),
    )


@register(
    "calendar_dim_orders",
    oracle="""
    WITH b AS (
        SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi FROM orders
    ),
    d AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
        FROM b
    )
    SELECT CAST(epoch_us(day::TIMESTAMP) AS BIGINT) AS day_us,
           CAST(EXTRACT(year FROM day) AS BIGINT) AS year,
           CAST(EXTRACT(quarter FROM day) AS BIGINT) AS quarter,
           CAST(EXTRACT(month FROM day) AS BIGINT) AS month,
           CAST(EXTRACT(isodow FROM day) - 1 AS BIGINT) AS weekday,
           EXTRACT(isodow FROM day) >= 6 AS is_weekend
    FROM d ORDER BY day_us
    """,
)
def q_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension build — the warehouse utility every date-join
    star schema needs, generated (sequence + explode over the fact
    table's own date range), never loaded. Weekday uses the reference's
    Mon=0 convention (F.weekday, SURVEY.md F3 watch-item; the oracle's
    isodow-1 matches). All attributes are codegen date functions over
    the exploded sequence — a dimension this small broadcasts
    everywhere it's joined."""
    orders = load_table(spark, sf_dir, "orders")
    b = orders.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    days = b.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    return days.select(
        F.unix_timestamp(F.col("day").cast("timestamp")).cast("long")
        .alias("__s"),
        F.year("day").cast("long").alias("year"),
        F.quarter("day").cast("long").alias("quarter"),
        F.month("day").cast("long").alias("month"),
        F.weekday("day").cast("long").alias("weekday"),
        (F.weekday("day") >= 5).alias("is_weekend"),
    ).select(
        (F.col("__s") * 1_000_000).alias("day_us"),
        "year", "quarter", "month", "weekday", "is_weekend",
    ).orderBy("day_us")


@register(
    "weekly_revenue_growth",
    oracle="""
    WITH w AS (
        SELECT date_trunc('week', o_orderdate) AS week,
               ROUND(SUM(o_totalprice), 4) AS rev
        FROM orders GROUP BY 1
    )
    SELECT CAST(epoch_us(week::TIMESTAMP) AS BIGINT) AS week_us,
           rev,
           ROUND(rev / lag(rev) OVER (ORDER BY week) - 1.0, 6) AS wow_growth
    FROM w ORDER BY week_us
    """,
)
def q_weekly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth — the reporting staple: weekly revenue and
    its relative change vs the prior week. One grouped aggregate (map-
    side partials bound the shuffle by week count) and a lag over the
    tiny weekly frame. Monday-start weeks (date_trunc 'week') in both
    engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = orders.groupBy(
        F.date_trunc("week", F.col("o_orderdate").cast("timestamp")).alias(
            "week"
        )
    ).agg(F.round(F.sum("o_totalprice"), 4).alias("rev"))
    win = Window.orderBy("week")
    return w.select(
        F.unix_timestamp("week").cast("long").alias("__s"),
        "rev",
        F.round(F.col("rev") / F.lag("rev").over(win) - 1.0, 6).alias(
            "wow_growth"
        ),
    ).select(
        (F.col("__s") * 1_000_000).alias("week_us"), "rev", "wow_growth"
    ).orderBy("week_us")


@register(
    "threshold_sweep_metrics",
    oracle="""
    WITH t AS (SELECT unnest([10.0, 20.0, 30.0, 40.0, 50.0,
                              60.0, 70.0, 80.0, 90.0]) AS thr),
    m AS (
        SELECT thr,
               SUM(CASE WHEN value >= thr AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS tp,
               SUM(CASE WHEN value >= thr AND event_type <> 'purchase'
                        THEN 1 ELSE 0 END) AS fp,
               SUM(CASE WHEN value < thr AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS fn
        FROM events, t WHERE value IS NOT NULL
        GROUP BY thr
    )
    SELECT thr,
           CAST(tp AS BIGINT) AS tp,
           ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS precision,
           ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS recall
    FROM m ORDER BY thr
    """,
)
def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point selection: precision/recall at nine score
    thresholds in ONE pass — each row explodes against the 9-element
    threshold literal (a broadcast-free constant; the 9x row
    amplification collapses map-side into 9 partial rows per task).
    The practical companion to model_eval_auc: AUC ranks models, this
    table picks the deployment threshold."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    thr = F.explode(
        F.array(*[F.lit(float(t)) for t in range(10, 100, 10)])
    ).alias("thr")
    lab = (F.col("event_type") == "purchase").cast("long")
    m = (
        ev.select("value", lab.alias("y"))
        .select("value", "y", thr)
        .groupBy("thr")
        .agg(
            F.sum(((F.col("value") >= F.col("thr")) & (F.col("y") == 1)).cast("long")).alias("tp"),
            F.sum(((F.col("value") >= F.col("thr")) & (F.col("y") == 0)).cast("long")).alias("fp"),
            F.sum(((F.col("value") < F.col("thr")) & (F.col("y") == 1)).cast("long")).alias("fn"),
        )
    )
    return m.select(
        "thr",
        F.col("tp").cast("long").alias("tp"),
        F.round(F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 6).alias("precision"),
        F.round(F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), 6).alias("recall"),
    ).orderBy("thr")


@register(
    "ab_test_value_by_split",
    oracle="""
    WITH g AS (
        SELECT user_id % 2 AS grp,
               COUNT(*) AS n,
               AVG(value) AS mu,
               var_samp(value) AS v
        FROM events WHERE value IS NOT NULL
        GROUP BY 1
    ),
    w AS (
        SELECT MAX(CASE WHEN grp = 0 THEN n END) AS na,
               MAX(CASE WHEN grp = 1 THEN n END) AS nb,
               MAX(CASE WHEN grp = 0 THEN mu END) AS ma,
               MAX(CASE WHEN grp = 1 THEN mu END) AS mb,
               MAX(CASE WHEN grp = 0 THEN v END) AS va,
               MAX(CASE WHEN grp = 1 THEN v END) AS vb
        FROM g
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(ma - mb, 6) AS mean_diff,
           ROUND((ma - mb) / SQRT(va / na + vb / nb), 6) AS welch_t
    FROM w
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: Welch's t-statistic for the value metric
    between two deterministic user buckets (user_id parity stands in
    for the assignment hash) — the unequal-variance test that
    experimentation platforms run. Both arms' moments fold in ONE
    grouped pass (no per-arm scan), the statistic assembles from the
    2-row frame."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = ev.groupBy((F.col("user_id") % 2).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mu"),
        F.var_samp("value").alias("v"),
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("grp") == 0, F.col("mu"))).alias("ma"),
        F.max(F.when(F.col("grp") == 1, F.col("mu"))).alias("mb"),
        F.max(F.when(F.col("grp") == 0, F.col("v"))).alias("va"),
        F.max(F.when(F.col("grp") == 1, F.col("v"))).alias("vb"),
    )
    return w.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
        F.round(
            (F.col("ma") - F.col("mb"))
            / F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb")),
            6,
        ).alias("welch_t"),
    )


@register(
    "gini_revenue_by_customer",
    oracle="""
    WITH c AS (
        SELECT o_custkey, SUM(o_totalprice) AS rev
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT rev,
               ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i,
               COUNT(*) OVER () AS n,
               SUM(rev) OVER () AS tot
        FROM c
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           ROUND(2.0 * SUM(i * rev) / (MAX(n) * MAX(tot))
                 - (MAX(n) + 1.0) / MAX(n), 6) AS gini
    FROM r
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the Gini coefficient of per-customer
    revenue via the rank identity G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n —
    'how top-heavy is the customer base'. One grouped aggregate, then
    global ranks from ``dense_global_index`` (range partition + local
    row numbers + broadcast per-partition offsets — every partition
    ranks in parallel, VERDICT r4 "What's wrong" #2); n and Σrev are
    plain aggregates folded into the same final 1-row pass.
    Deterministic tie-break on (rev, custkey)."""
    from .operators.indexing import dense_global_index

    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    ranked = dense_global_index(c, ["rev", "o_custkey"], out_col="i0")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(
            F.lit(2.0)
            * F.sum((F.col("i0") + 1) * F.col("rev"))
            / (F.count(F.lit(1)) * F.sum("rev"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


@register(
    "benford_first_digit",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS tot FROM c)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / (SELECT tot FROM t), 6) AS observed,
           ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_expected
    FROM c ORDER BY digit
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    fraud/data-fabrication screen (organic financial magnitudes follow
    log10(1+1/d); flat or spiky digit histograms flag synthetic or
    tampered figures). Digit extraction is codegen string arithmetic on
    the integer part; one 9-row aggregate. (TPC-H-ish uniform prices
    will NOT follow Benford — the comparison columns make that
    deviation visible, which is exactly the audit's purpose.)"""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    d = orders.select(
        F.substring(
            F.col("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).cast("long").alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    wall = Window.partitionBy()
    return (
        c.select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.sum("n").over(wall), 6).alias("observed"),
            F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6)
            .alias("benford_expected"),
        )
        .orderBy("digit")
    )


@register(
    "peak_concurrent_sessions",
    oracle="""
    WITH s AS (
        SELECT user_id,
               MIN(epoch_us(ts)) AS s_us,
               MAX(epoch_us(ts)) AS e_us
        FROM events GROUP BY user_id
    ),
    pts AS (
        SELECT s_us AS t, 1 AS delta FROM s
        UNION ALL
        SELECT e_us + 1, -1 FROM s
    ),
    sweep AS (
        SELECT t, SUM(delta) AS d FROM pts GROUP BY t
    ),
    run AS (
        SELECT t, SUM(d) OVER (ORDER BY t) AS concurrent FROM sweep
    )
    SELECT CAST(MAX(concurrent) AS BIGINT) AS peak_concurrent,
           CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_sessions
    FROM run
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via the +1/−1 sweep: each user's [first, last]
    activity interval contributes an open and a close point; the
    running sum over time-ordered deltas is the live-interval count and
    its max is the capacity answer. The classic interval-stabbing
    rewrite — O(n log n) instead of the interval self-join's O(n²).
    Same-instant deltas pre-aggregate per timestamp so the ordered
    pass runs over distinct time points; close fires at e+1µs
    (inclusive intervals). The running sum is a range-partitioned
    two-phase scan (local cumsum + broadcast partition offsets via
    ``partitioned_prefix_sum``) — never a one-task global window
    (VERDICT r4 "What's wrong" #3)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns div 1000").alias("ts_us")
    )
    s = ev.groupBy("user_id").agg(
        F.min("ts_us").alias("s_us"), F.max("ts_us").alias("e_us")
    )
    pts = s.select(F.col("s_us").alias("t"), F.lit(1).alias("delta")).unionAll(
        s.select((F.col("e_us") + 1).alias("t"), F.lit(-1).alias("delta"))
    )
    from .operators.indexing import partitioned_prefix_sum

    sweep = pts.groupBy("t").agg(F.sum("delta").alias("d"))
    run = partitioned_prefix_sum(
        sweep, ["t"], "d", out_col="concurrent"
    ).select("concurrent")
    n = s.agg(F.count(F.lit(1)).alias("n_sessions"))
    return run.agg(
        F.max("concurrent").cast("long").alias("peak_concurrent")
    ).crossJoin(F.broadcast(n)).select(
        "peak_concurrent", F.col("n_sessions").cast("long").alias("n_sessions")
    )


@register(
    "kaplan_meier_conversion",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MIN(epoch_us(ts)) AS t0,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                   AS tp,
               MAX(epoch_us(ts)) AS tlast
        FROM events GROUP BY user_id
    ),
    obs AS (
        SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) // 3600000000
                    ELSE (tlast - t0) // 3600000000 END AS t_hours,
               (tp IS NOT NULL)::INT AS converted
        FROM u WHERE tp IS NULL OR tp > t0
    ),
    ev AS (
        SELECT t_hours,
               SUM(converted) AS d,
               COUNT(*) AS leaving
        FROM obs GROUP BY t_hours
    ),
    risk AS (
        SELECT t_hours, d,
               SUM(leaving) OVER (
                   ORDER BY t_hours DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS n_at_risk
        FROM ev
    )
    SELECT t_hours, CAST(d AS BIGINT) AS d,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           ROUND(EXP(SUM(LN(GREATEST(1.0 - d * 1.0 / n_at_risk, 1e-12))) OVER (
               ORDER BY t_hours
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )), 6) AS survival
    FROM risk WHERE d > 0
    ORDER BY t_hours
    """,
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion curve with right-censoring:
    hours from a user's first event to first purchase; users who never
    purchase are censored at their last activity. S(t) = Π (1−d/n) over
    event times folds as exp(Σ ln(·)) — a running product via two
    window passes over the per-hour event frame (n_at_risk from a
    reverse cumulative sum of everyone leaving the risk set). The
    survival-analysis staple, exact, no UDF; per-user reduction is one
    grouped pass."""
    hour = 3_600_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("ts_us")
    )
    u = ev.groupBy("user_id").agg(
        F.min("ts_us").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_us"))
        ).alias("tp"),
        F.max("ts_us").alias("tlast"),
    )
    obs = u.filter(F.col("tp").isNull() | (F.col("tp") > F.col("t0"))).select(
        F.when(
            F.col("tp").isNotNull(),
            F.floor((F.col("tp") - F.col("t0")) / hour),
        )
        .otherwise(F.floor((F.col("tlast") - F.col("t0")) / hour))
        .alias("t_hours"),
        F.col("tp").isNotNull().cast("int").alias("converted"),
    )
    evt = obs.groupBy("t_hours").agg(
        F.sum("converted").alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    w_desc = Window.orderBy(F.desc("t_hours")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = evt.withColumn("n_at_risk", F.sum("leaving").over(w_desc))
    w_asc = Window.orderBy("t_hours").rowsBetween(
        Window.unboundedPreceding, 0
    )
    km = risk.withColumn(
        "survival",
        F.round(
            F.exp(
                F.sum(
                    F.log(
                        F.greatest(
                            F.lit(1.0) - F.col("d") / F.col("n_at_risk"),
                            F.lit(1e-12),
                        )
                    )
                ).over(w_asc)
            ),
            6,
        ),
    )
    return (
        km.filter(F.col("d") > 0)
        .select(
            "t_hours",
            F.col("d").cast("long").alias("d"),
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            "survival",
        )
        .orderBy("t_hours")
    )


@register(
    "token_budget_coverage",
    oracle=r"""
    WITH tk AS (
        SELECT len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens
        FROM documents
    ),
    b AS (SELECT unnest([32, 64, 128, 256, 512]) AS budget),
    tot AS (SELECT COUNT(*) AS nd, SUM(n_tokens) AS nt FROM tk)
    SELECT budget,
           CAST(COUNT(*) FILTER (n_tokens <= budget) AS BIGINT)
               AS docs_within,
           ROUND(COUNT(*) FILTER (n_tokens <= budget) * 1.0
                 / (SELECT nd FROM tot), 6) AS doc_share,
           ROUND(SUM(LEAST(n_tokens, budget)) * 1.0
                 / (SELECT nt FROM tot), 6) AS token_share_kept
    FROM tk, b GROUP BY budget ORDER BY budget
    """,
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length planning: at each candidate token budget, how
    many documents fit whole, and what share of corpus tokens survives
    truncation — the measurement behind choosing max_seq_len (the
    doc_chunks/pack_sequences upstream decision). One tokenize pass;
    the 5-budget explode collapses map-side (5 partial rows per task).
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        F.size(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("n_tokens")
    )
    budgets = F.explode(
        F.array(*[F.lit(b) for b in (32, 64, 128, 256, 512)])
    ).alias("budget")
    tot = tk.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("n_tokens").alias("nt")
    )
    m = (
        tk.select("n_tokens", budgets)
        .groupBy("budget")
        .agg(
            F.sum((F.col("n_tokens") <= F.col("budget")).cast("long")).alias(
                "docs_within"
            ),
            F.sum(F.least("n_tokens", "budget")).alias("__kept"),
        )
    )
    return (
        m.crossJoin(F.broadcast(tot))
        .select(
            "budget",
            F.col("docs_within").cast("long").alias("docs_within"),
            F.round(F.col("docs_within") / F.col("nd"), 6).alias("doc_share"),
            F.round(F.col("__kept") / F.col("nt"), 6).alias(
                "token_share_kept"
            ),
        )
        .orderBy("budget")
    )


@register(
    "temperature_sampling_weights",
    oracle="""
    WITH s AS (
        SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n
        FROM documents GROUP BY lang
    ),
    p AS (
        SELECT lang, n,
               n / SUM(n) OVER () AS share,
               POWER(n / SUM(n) OVER (), 1.0 / 0.7) AS unnorm
        FROM s
    )
    SELECT lang,
           CAST(n AS BIGINT) AS n_docs,
           ROUND(share, 6) AS share,
           ROUND(unnorm / SUM(unnorm) OVER (), 6) AS sample_prob
    FROM p ORDER BY lang
    """,
)
def q_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based sampling weights (the XLM-R multilingual
    recipe): p_l ∝ share_l^(1/T) with T=0.7 — upweights tail languages
    without drowning the head, the OTHER standard mixture scheme next
    to mixture_rebalance_weights' uniform target. All arithmetic over
    the per-language aggregate frame."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    wall = Window.partitionBy()
    p = s.select(
        "lang",
        "n",
        (F.col("n") / F.sum("n").over(wall)).alias("share"),
        F.pow(F.col("n") / F.sum("n").over(wall), 1.0 / 0.7).alias("unnorm"),
    )
    return p.select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        F.round("share", 6).alias("share"),
        F.round(F.col("unnorm") / F.sum("unnorm").over(wall), 6).alias(
            "sample_prob"
        ),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Driver-window ordering (VERDICT r2 item 1)
#
# The driver's CORRECTNESS artifact checks the FIRST 50 entries of
# ``queries()`` in dict order.  Registration order above is thematic, so
# without reordering the round-2/3 additions never receive a driver row.
# ``DRIVER_PRIORITY`` lists queries that have never appeared hash-green in
# a driver CORRECTNESS artifact (plus this round's new queries); they are
# emitted first, followed by ``DRIVER_CANARIES`` (high-value round-1
# anchors kept inside the window as regression canaries), followed by all
# remaining queries in registration order.  Every name is validated
# against the registry at import time so a typo fails fast in pytest.
# ---------------------------------------------------------------------------

DRIVER_PRIORITY: list[str] = [
    # Round-6 window: CORRECTNESS_r05 turned all 50 of the round-5
    # window hash-green, so every r05 name leaves the block.  The
    # round-6 queue (38 oracle-backed queries registered past the r05
    # 50-cut, each verify_local-green at sf0.01 AND sf0.1) enters,
    # followed by two once-green anchors re-promoted for second
    # confirmations (the queue comment's plan for a thin block), then
    # this round's new registrations.  The 9 rows-only (no-oracle)
    # surfaces stay OUTSIDE the window by design — each has a
    # hash-green SQL invariant twin on record (VERDICT r4).
    "dsir_importance_weights",
    "cohort_ltv_accumulation",
    "rolling_7d_active_users",
    "histogram_quantile_tolerance",
    "attribution_time_decay",
    "elasticity_brand_ols",
    "containment_near_dup_docs",
    "spearman_value_props",
    "rolling_origin_folds",
    "region_nation_revenue_share",
    "seasonal_naive_backtest",
    "clustering_coefficient_parts",
    "hill_alpha_degree_distribution",
    "shipping_latency_by_priority",
    "cuped_ab_adjustment",
    "data_contract_audit",
    "quantile_map_error_to_purchase",
    "grouped_histogram_quantiles",
    "max_drawdown_user_value",
    "skipgram_pairs_window2",
    "self_duplicated_ngrams",
    "theil_sen_daily_trend",
    "hll_set_intersection_estimate",
    "daily_audience_jaccard",
    "acf_daily_revenue_k7",
    "retention_triangle_weekly",
    "pareto_fraction_80",
    "interarrival_fit_by_type",
    "weighted_median_price_tolerance",
    "bounce_rate_by_entry",
    "split_conformal_coverage",
    "diff_in_diff_value",
    "embedding_isotropy_audit",
    "heaps_law_vocab_growth",
    "knn_label_noise_audit",
    "cms_error_bound_audit",
    "watermark_recommendation",
    "supplier_variety_by_parttype",
    # round-6 registrations (8 names, filling the block to exactly the
    # 46-slot budget — 50 minus the four canaries — so every canary
    # stays inside the 50-cut; tests/test_driver_window.py pins this)
    "sleeping_customers_q22",
    "supplier_revenue_hhi",
    "doc_length_gini_by_source",
    "trigram_novelty_halves",
    "embedding_norm_outlier_topk",
    "readability_proxy_by_lang",
    "degree_assortativity_orders",
    "unigram_kl_by_source",
]

DRIVER_CANARIES: list[str] = [
    # Once-green high-value anchors earning a repeat driver row
    # (VERDICT r3 item 7).  Round-6 accounting: every canary fits
    # inside the 50-cut as long as the priority block stays
    # <= 50 - len(canaries) — tests/test_driver_window.py pins that
    # budget so a silent displacement (the ADVICE r4 finding) can't
    # recur.  dup_clusters and cleaning_chain join this round for
    # second confirmations (VERDICT r5 item 9: the priority block
    # thinned below budget after the r05 50/50 sweep).
    "interval_join_binned",
    "frame_sample_profile",
    "dup_clusters",
    "cleaning_chain",
]


@register(
    "basket_lift_brand_pairs",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM ob),
    sb AS (SELECT brand, COUNT(*) AS nb FROM ob GROUP BY brand),
    pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS nab
        FROM ob a JOIN ob b
          ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b,
           CAST(nab AS BIGINT) AS n_both,
           ROUND(nab * 1.0 / (SELECT n_orders FROM n), 6) AS support,
           ROUND(nab * 1.0 / sa.nb, 6) AS confidence,
           ROUND(nab * 1.0 * (SELECT n_orders FROM n) / (sa.nb * sb2.nb), 6)
               AS lift
    FROM pairs
    JOIN sb sa ON sa.brand = pairs.brand_a
    JOIN sb sb2 ON sb2.brand = pairs.brand_b
    WHERE nab >= 5
    ORDER BY lift DESC, brand_a, brand_b LIMIT 20
    """,
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules: support / confidence / lift for
    part-brand pairs co-occurring in an order, top-20 by lift at
    min-support 5 — the recommender/affinity staple. The candidate
    product exists only WITHIN baskets (self-equi-join on the order
    key, the co_occurrence_edges shape — bounded by basket size, never
    all-pairs over the catalog); brand marginals broadcast onto the
    pair frame; deterministic tie-break → TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n = ob.agg(F.count_distinct("okey").alias("n_orders"))
    sb = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("nb"))
    a = ob.select("okey", F.col("brand").alias("brand_a"))
    b = ob.select("okey", F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("nab"))
        .filter(F.col("nab") >= 5)
    )
    out = (
        pairs.join(
            F.broadcast(sb.select(F.col("brand").alias("brand_a"),
                                  F.col("nb").alias("na"))),
            "brand_a",
        )
        .join(
            F.broadcast(sb.select(F.col("brand").alias("brand_b"),
                                  F.col("nb").alias("nb"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(n))
    )
    return out.select(
        "brand_a",
        "brand_b",
        F.col("nab").cast("long").alias("n_both"),
        F.round(F.col("nab") / F.col("n_orders"), 6).alias("support"),
        F.round(F.col("nab") / F.col("na"), 6).alias("confidence"),
        F.round(
            F.col("nab") * F.col("n_orders") / (F.col("na") * F.col("nb")), 6
        ).alias("lift"),
    ).orderBy(F.desc("lift"), "brand_a", "brand_b").limit(20)


@register(
    "session_entry_conversion",
    oracle="""
    WITH t AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ), flagged AS (
        SELECT *,
               CASE WHEN ts_us - LAG(ts_us) OVER (
                        PARTITION BY user_id ORDER BY ts_us, event_id)
                         > 1800000000 THEN 1 ELSE 0 END AS new_s
        FROM t
    ), s AS (
        SELECT *,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ), per AS (
        SELECT user_id, session_id,
               arg_min(event_type,
                       lpad(CAST(ts_us AS VARCHAR), 20, '0')
                       || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                   AS entry_type,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM s GROUP BY user_id, session_id
    )
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(SUM(converted) * 1.0 / COUNT(*), 6) AS conversion_rate
    FROM per GROUP BY entry_type ORDER BY entry_type
    """,
)
def q_session_entry_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session analytics: conversion rate by ENTRY channel — does the
    event type that opens a session predict a purchase inside it? The
    gaps-and-islands session assignment, the tie-broken first event
    (min_by on the composite time key), and the conversion flag all
    share ONE user_id window/aggregation chain; the final frame is
    |entry types| rows. Sessions that OPEN with a purchase count as
    converted trivially — visible in the output, which is the point of
    the breakdown."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_s",
        (
            (F.col("ts_us") - F.lag("ts_us").over(w)) > 1_800_000_000
        ).cast("int"),
    ).withColumn(
        "session_id",
        F.sum(F.coalesce(F.col("new_s"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per = flagged.groupBy("user_id", "session_id").agg(
        F.expr("min_by(event_type, struct(ts_us, event_id))").alias(
            "entry_type"
        ),
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("converted"),
    )
    return (
        per.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.round(F.sum("converted") / F.count(F.lit(1)), 6).alias(
                "conversion_rate"
            ),
        )
        .orderBy("entry_type")
    )


# Round-6 rotation DONE (this round): CORRECTNESS_r05's 50 hash-green
# names left DRIVER_PRIORITY; the 38-query round-6 queue entered, plus
# the two re-promoted anchors (dup_clusters, cleaning_chain) and this
# round's registrations, keeping the priority block ≤ 48 so both
# canaries sit inside the 50-cut.
# Round-7 queue (enumerated at round-6 close): the ten round-6
# registrations beyond the 48-slot budget, all verify_local-green at
# sf0.01 AND sf0.1 this round —
#   min_cost_supplier_per_part, late_shipment_orders_by_priority,
#   part_value_concentration_q11, small_quantity_revenue_q17,
#   chi2_type_hour_independence, mann_whitney_purchase_vs_view,
#   pinball_loss_q90_by_type, event_transition_matrix,
#   pca_spectrum_invariants, asof_view_value_at_purchase,
#   entity_resolution_clusters, target_encoding_loo,
#   winsorized_stats_by_type, token_fertility_by_lang,
#   jaccard_threshold_sweep, dataset_card_by_source,
#   disjunctive_predicate_revenue_q19, nation_trade_flows_q7,
#   forecast_revenue_change_q6, national_market_share_q8,
#   product_profit_q9, returned_item_customers_q10,
#   shipping_buckets_priority_q12, large_volume_customers_q18,
#   part_promotion_suppliers_q20, waiting_suppliers_q21,
#   kendall_tau_hour_value, weighted_reservoir_orders,
#   stl_lite_variance_split, zorder_pruning_audit,
#   compaction_binpack_plan, fp_growth_brand_itemsets,
#   brier_decomposition, mutual_information_type_hour,
#   aqp_revenue_estimate, encoding_advisor_events, k_anonymity_audit,
#   structuring_threshold_audit, user_mix_shift_kl,
#   bot_periodicity_screen, dp_noisy_counts_by_type,
#   qerror_selectivity_audit, partition_advisor_events,
#   matryoshka_truncation_fidelity, fd_discovery_audit,
#   sortedness_profile_events, stratified_weighted_sample,
#   uplift_qini_curve, mahalanobis_outlier_screen,
#   shapley_channel_attribution, retrieval_ndcg_mrr,
#   holt_linear_backtest, markov_next_event_accuracy,
#   sequence_entropy_rate, gdpr_erasure_cascade, sprt_ab_daily,
#   late_data_backfill_windows, streaming_state_cost_model,
#   discrete_hazard_weekly, overdispersion_user_daily,
#   join_fanout_audit, wasserstein1_value_types,
#   prefixspan_type_patterns, embedding_dimension_health,
#   chow_break_test_daily
# — plus any r06 non-green retries and the round-7 in-round
# registrations (all verify_local-green at sf0.01 AND sf0.1 on entry):
#   neighborhood_jaccard_coparts, label_propagation_communities,
#   rrf_fusion_search, gopher_repetition_audit, page_hinkley_daily,
#   kappa_mcc_agreement, smape_mase_daily, mad_outlier_screen,
#   theil_sen_revenue_trend, kruskal_wallis_weekday, scd2_user_tiers,
#   bom_cost_rollup, activity_islands_histogram, logistic_gd_training,
#   periodogram_daily_topk, ece_calibration_bins, t_closeness_audit,
#   did_estimator, bh_fdr_panel, misra_gries_audit,
#   hits_supplier_authority, kaplan_meier_weekly, benford_digit_audit,
#   psi_value_stability, ewma_control_chart, isotonic_pav_calibration
#   (…continued: the 32 late-round-7 registrations, ALL verify_local-
#   green at sf0.01 AND sf0.1 on entry — waves 7-19:)
#   bloom_semi_join_audit, modularity_supplier_nations,
#   session_paths_top3, woe_iv_hour_band, naive_bayes_event_type,
#   decision_stump_value, ols_daily_orders_trend,
#   welch_ttest_purchase_view, brown_forsythe_value_types,
#   ljung_box_daily_revenue, cramers_v_panel,
#   dormancy_reactivation_screen, round_number_affinity,
#   scd2_interval_integrity, off_policy_evaluation,
#   replay_greedy_policy, lang_id_confusion, nearest_centroid_eval,
#   time_to_convert_stats, dau_wau_stickiness, l_diversity_audit,
#   phrase_search_positional, mann_kendall_daily_trend,
#   runs_test_daily, hodges_lehmann_shift, skyline_price_size,
#   order_total_reconciliation, markov_removal_attribution,
#   sequence_pattern_match, randomization_test_value,
#   rich_club_coefficient, triplet_margin_audit
#   (…and waves 20-31:) huber_irls_daily, raking_ipf_calibration,
#   anova_oneway_value, tukey_hsd_pairs, bloom_filter_advisor,
#   quantile_treatment_effects, logrank_test_cohorts,
#   fisher_price_index_monthly, attribution_u_shaped,
#   cumulative_incidence_competing, net_revenue_retention_monthly,
#   empirical_bayes_shrinkage, shift_share_decomposition,
#   gpd_tail_fit_pwm, neyman_allocation_plan, recsys_beyond_accuracy,
#   forecast_pi_coverage, p_chart_daily_purchase,
#   partial_correlation_panel, morans_i_hour_ring,
#   c_index_activity_ttp, bradley_terry_brands
#   binseg_changepoint_daily, fold_auc_stability, info_gain_feature_panel,
#   rmst_time_to_purchase, tost_equivalence_aa, kupiec_var_backtest,
#   capture_recapture_users, chao1_vocab_richness,
#   clumpiness_top_users, taylors_law_users


def driver_ordered(registry: dict) -> dict:
    """Return ``registry`` reordered so the driver's 50-entry window
    covers never-driver-verified queries first, then canaries, then the
    rest in registration order.  Raises on unknown names (import-time
    typo guard via tests)."""
    unknown = [n for n in DRIVER_PRIORITY + DRIVER_CANARIES if n not in QUERIES]
    if unknown:
        raise KeyError(f"driver ordering references unknown queries: {unknown}")
    front = [n for n in DRIVER_PRIORITY + DRIVER_CANARIES if n in registry]
    seen = set(front)
    ordered = {n: registry[n] for n in front}
    ordered.update({n: v for n, v in registry.items() if n not in seen})
    return ordered


@register(
    "rouge2_adjacent_docs",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id, list_aggregate(toks[i:i+1], 'string_agg', ' ') AS gram
        FROM (SELECT doc_id, unnest(range(1, len(toks))) AS i, toks
              FROM t WHERE len(toks) >= 2)
    ),
    c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(c) AS total FROM c GROUP BY 1),
    pairs AS (
        SELECT a.doc_id AS cand_id, b.doc_id AS ref_id
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 100
        WHERE a.doc_id < 200
    ),
    ov AS (
        SELECT p.cand_id, p.ref_id, SUM(LEAST(cc.c, rc.c)) AS overlap
        FROM pairs p
        JOIN c cc ON cc.doc_id = p.cand_id
        JOIN c rc ON rc.doc_id = p.ref_id AND rc.gram = cc.gram
        GROUP BY 1, 2
    )
    SELECT p.cand_id, p.ref_id,
           CAST(CASE WHEN tc.total IS NOT NULL AND tr.total IS NOT NULL
                     THEN COALESCE(ov.overlap, 0) END AS BIGINT) AS overlap,
           CAST(tc.total AS BIGINT) AS cand_total,
           CAST(tr.total AS BIGINT) AS ref_total,
           ROUND(CASE WHEN tc.total IS NOT NULL AND tr.total IS NOT NULL
                      THEN COALESCE(ov.overlap, 0) * 1.0 / tc.total END, 6)
               AS precision,
           ROUND(CASE WHEN tc.total IS NOT NULL AND tr.total IS NOT NULL
                      THEN COALESCE(ov.overlap, 0) * 1.0 / tr.total END, 6)
               AS recall,
           ROUND(CASE
                     WHEN tc.total IS NULL OR tr.total IS NULL THEN NULL
                     WHEN COALESCE(ov.overlap, 0) = 0 THEN 0.0
                     ELSE 2.0 * (ov.overlap * 1.0 / tc.total)
                              * (ov.overlap * 1.0 / tr.total)
                          / (ov.overlap * 1.0 / tc.total
                             + ov.overlap * 1.0 / tr.total)
                 END, 6) AS f1
    FROM pairs p
    LEFT JOIN tot tc ON tc.doc_id = p.cand_id
    LEFT JOIN tot tr ON tr.doc_id = p.ref_id
    LEFT JOIN ov ON ov.cand_id = p.cand_id AND ov.ref_id = p.ref_id
    ORDER BY p.cand_id
    """,
)
def q_rouge2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 (clipped bigram overlap, Lin 2004) scoring each doc
    against a pseudo-reference 100 ids ahead —
    operators/texteval.py:rouge_n. The summarization/distillation eval
    staple as a distributed join over n-gram count frames: one
    tokenize+explode pass over participating docs, per-pair clipped
    overlap via an inner gram join keyed by (pair, gram) — a hot gram
    spreads across pair partitions, no per-pair Python loop anywhere.
    No reference counterpart (the 446-line pandas pipeline has no text
    surface); LLM-pipeline evaluation family."""
    from .operators.texteval import rouge_n

    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("cand_id")).filter(
        F.col("cand_id") < 200
    )
    b = docs.select(F.col("doc_id").alias("ref_id"))
    pairs = a.join(
        b, F.col("ref_id") == F.col("cand_id") + 100
    )
    r = rouge_n(pairs, docs, n=2)
    return r.select(
        "cand_id",
        "ref_id",
        F.col("overlap").cast("long").alias("overlap"),
        F.col("cand_total").cast("long").alias("cand_total"),
        F.col("ref_total").cast("long").alias("ref_total"),
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
    ).orderBy("cand_id")


@register(
    "kappa_agreement_raters",
    oracle="""
    WITH obs AS (
        SELECT CASE WHEN value > 50 THEN 'hi'
                    WHEN value > 10 THEN 'mid' ELSE 'lo' END AS a,
               CASE WHEN value + 3 * (user_id % 7) > 50 THEN 'hi'
                    WHEN value + 3 * (user_id % 7) > 10 THEN 'mid'
                    ELSE 'lo' END AS b
        FROM events WHERE value IS NOT NULL
    ),
    base AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS n_agree
        FROM obs
    ),
    ma AS (SELECT a, COUNT(*) AS na FROM obs GROUP BY a),
    mb AS (SELECT b, COUNT(*) AS nb FROM obs GROUP BY b),
    chance AS (
        SELECT SUM(na * nb) AS prod_sum FROM ma JOIN mb ON ma.a = mb.b
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(n_agree * 1.0 / n, 6) AS po,
           ROUND(prod_sum * 1.0 / (n * n), 6) AS pe,
           ROUND((n_agree * 1.0 / n - prod_sum * 1.0 / (n * n))
                 / (1 - prod_sum * 1.0 / (n * n)), 6) AS kappa
    FROM base, chance
    """,
)
def q_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between two heuristic raters (ml/evaluate.py:
    cohens_kappa): a value-threshold tier rater vs the same rule over a
    user-perturbed value — the annotation-quality gate for label
    pipelines (rater pools, model-as-judge audits). Three tiny
    aggregates + a |categories|² marginal join; no sort, no holistic
    state — the 1-row answer is valid at any corpus size."""
    from .ml.evaluate import cohens_kappa

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when(F.col("value") > 50, "hi")
            .when(F.col("value") > 10, "mid")
            .otherwise("lo")
            .alias("rater_a"),
            F.when(F.col("value") + 3 * F.pmod(F.col("user_id"), F.lit(7)) > 50, "hi")
            .when(F.col("value") + 3 * F.pmod(F.col("user_id"), F.lit(7)) > 10, "mid")
            .otherwise("lo")
            .alias("rater_b"),
        )
    )
    return cohens_kappa(ev, "rater_a", "rater_b")


@register(
    "contrastive_negatives",
    oracle="""
    WITH a AS (SELECT doc_id AS aid FROM documents WHERE doc_id % 100 = 0),
    p AS (SELECT doc_id AS pid,
                 ((doc_id % 999983) * 40503 + 7) % 999983 * 2654435761 % 32
                     AS bucket
          FROM documents),
    probes AS (
        SELECT DISTINCT aid,
               (((aid % 999983) * 2654435761 + 7) % 999983 * 40503 + j.j) % 32
                   AS bucket
        FROM a CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j
    ),
    cands AS (
        SELECT aid, pid FROM probes JOIN p USING (bucket) WHERE aid <> pid
    ),
    ranked AS (
        SELECT aid, pid,
               ROW_NUMBER() OVER (
                   PARTITION BY aid
                   ORDER BY ((aid % 999983) * 40503
                             + (pid % 999983) * 2654435761 + 7)
                            % 999983 * 2654435761 % 999983,
                            pid
               ) AS neg_rank
        FROM cands
    )
    SELECT aid AS anchor_id, pid AS pool_id,
           CAST(neg_rank AS BIGINT) AS neg_rank
    FROM ranked WHERE neg_rank <= 3
    ORDER BY anchor_id, neg_rank
    """,
)
def q_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative mining (ml/split.py:
    sample_negatives): 3 pseudo-random pool negatives per anchor via
    hash-bucket probing — candidate product bounded to
    |anchors|·probe/|buckets|·|pool|, ONE equi-join on the bucket key,
    never anchors×pool. Pure integer multiplicative hashing, so the
    oracle replays the draw exactly; embedding-training data-prep
    family."""
    from .ml.split import sample_negatives

    docs = load_table(spark, sf_dir, "documents")
    anchors = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("anchor_id")
    )
    pool = docs.select(F.col("doc_id").alias("pool_id"))
    out = sample_negatives(
        anchors, pool, k=3, n_buckets=32, probe_buckets=4, seed=7
    )
    return out.select(
        "anchor_id", "pool_id", F.col("neg_rank").cast("long").alias("neg_rank")
    ).orderBy("anchor_id", "neg_rank")


@register(
    "bootstrap_ci_value_by_type",
    oracle="""
    WITH base AS (
        SELECT event_type, value, event_id % 999983 AS idm
        FROM events WHERE value IS NOT NULL
    ),
    rep AS (
        SELECT event_type, value, idm, j.r
        FROM base CROSS JOIN (SELECT unnest(range(0, 50)) AS r) j
    ),
    weighted AS (
        SELECT event_type, value, r,
               CASE
                   WHEN u < 0.367879441171442 THEN 0
                   WHEN u < 0.735758882342885 THEN 1
                   WHEN u < 0.919698602928606 THEN 2
                   WHEN u < 0.981011843123846 THEN 3
                   WHEN u < 0.996340153172656 THEN 4
                   ELSE 5
               END AS w
        FROM (SELECT event_type, value, r,
                     ((idm * 2654435761 + r * 40503 + 11) % 999983)
                         * 2654435761 % 999983 * 1.0 / 999983 AS u
              FROM rep)
    ),
    means AS (
        SELECT event_type, r, SUM(w * value) / SUM(w) AS rm
        FROM weighted GROUP BY event_type, r
        HAVING SUM(w) > 0
    ),
    ranked AS (
        SELECT event_type, rm,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY rm ASC, r ASC) AS rk
        FROM means
    ),
    ci AS (
        SELECT event_type, MIN(rm) AS lo, MAX(rm) AS hi
        FROM ranked WHERE rk IN (1, 49) GROUP BY event_type
    )
    SELECT b.event_type,
           ROUND(AVG(b.value), 6) AS mean_value,
           ROUND(MAX(ci.lo), 6) AS ci_lo,
           ROUND(MAX(ci.hi), 6) AS ci_hi,
           CAST(50 AS BIGINT) AS n_replicates
    FROM base b JOIN ci ON ci.event_type = b.event_type
    GROUP BY b.event_type
    ORDER BY b.event_type
    """,
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95%-ish CI (ranks 1/49 of 50 replicate means)
    for mean(value) per event_type — ml/evaluate.py:
    poisson_bootstrap_mean_ci, the one-pass massive-data resampling
    recipe (Chamandy 2012): per-(row, replicate) Poisson(1) weights
    from a deterministic integer hash, replicate means via ONE
    groupBy(type, replicate), CI read off order statistics so no
    quantile-interpolation dialect can disagree. Rows×50 is map-side
    explode; the exchange is |types|·50 rows."""
    from .ml.evaluate import poisson_bootstrap_mean_ci

    ev = load_table(spark, sf_dir, "events")
    return poisson_bootstrap_mean_ci(
        ev,
        ["event_type"],
        "value",
        "event_id",
        n_replicates=50,
        lo_rank=1,
        hi_rank=49,
        seed=11,
    ).orderBy("event_type")


@register(
    "split_leakage_audit",
    oracle="""
    WITH assigned AS (
        SELECT user_id, event_id,
               CASE WHEN (user_id * 2654435761 + 0) % 100 < 80
                    THEN 'train' ELSE 'test' END AS split
        FROM events
    ),
    per_user AS (
        SELECT user_id, COUNT(DISTINCT split) AS n_splits FROM assigned
        GROUP BY user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM per_user WHERE n_splits > 1) AS BIGINT)
               AS n_leaky_users,
           (SELECT COUNT(*) FROM per_user WHERE n_splits > 1) = 0
               AS group_disjoint,
           CAST((SELECT COUNT(*) FROM assigned) AS BIGINT) AS n_events,
           ROUND((SELECT SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                         * 1.0 / COUNT(*) FROM assigned), 6)
               AS train_event_frac
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-leakage audit for entity-keyed splits: hash-split on
    user_id (ml/split.py:id_hash_split — the GROUP split: every event
    of a user lands one side, the guard against a user's events
    straddling train/test and leaking identity features), then PROVE
    disjointness — n_leaky_users must be 0 by construction since the
    assignment is a pure function of user_id — plus the realized
    event-level train fraction, which drifts from 80% exactly as far
    as per-user event counts are skewed. The audit is one groupBy per
    claim; nothing holistic."""
    from .ml.split import id_hash_split

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    s = id_hash_split(ev, "user_id", 0.8)
    per_user = s.groupBy("user_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    leaky = per_user.agg(
        F.sum((F.col("n_splits") > 1).cast("long")).alias("n_leaky_users")
    )
    ev_stats = s.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(
            F.avg((F.col("split") == "train").cast("double")), 6
        ).alias("train_event_frac"),
    )
    return leaky.crossJoin(F.broadcast(ev_stats)).select(
        F.col("n_leaky_users").cast("long").alias("n_leaky_users"),
        (F.col("n_leaky_users") == 0).alias("group_disjoint"),
        "n_events",
        "train_event_frac",
    )


@register(
    "isotonic_calibration_invariants",
    oracle="""
    WITH base AS (
        SELECT LEAST(GREATEST(FLOOR(LEAST(value / 130, 1.0) / (1.0 / 20)), 0),
                     19) AS bin
        FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(COUNT(DISTINCT bin) AS BIGINT) AS n_bins_used,
           TRUE AS is_monotone,
           TRUE AS mass_preserved,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM base
    """,
)
def q_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned isotonic calibration (ml/calibration.py:isotonic_bins —
    PAV over ≤ n_bins bin summaries, the scale form of
    sklearn.isotonic): fit a 20-bin monotone mapping from a clipped
    value score to P[value > 60], then PROVE the PAV contract as a
    constant-TRUE invariant twin (hll_within_tolerance pattern):
    calibrated probabilities non-decreasing across bins, and pooling
    preserves the weighted mean exactly. The oracle independently
    recomputes bin occupancy and row count with the same IEEE-double
    bin arithmetic."""
    from .ml.calibration import isotonic_bins

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    scored = ev.select(
        F.least(F.col("value") / 130, F.lit(1.0)).alias("s"),
        (F.col("value") > 60).alias("y"),
    )
    mapping = isotonic_bins(scored, "s", "y", 0.0, 1.0, n_bins=20)
    w = Window.orderBy("bin")
    checks = mapping.select(
        "bin",
        "n",
        "frac_pos",
        "calibrated",
        (F.col("calibrated") >= F.coalesce(F.lag("calibrated").over(w), F.lit(-1.0))).alias(
            "mono_ok"
        ),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.min("mono_ok").alias("is_monotone"),
        (
            F.abs(
                F.sum(F.col("n") * F.col("calibrated"))
                - F.sum(F.col("n") * F.col("frac_pos"))
            )
            < 1e-6
        ).alias("mass_preserved"),
        F.sum("n").cast("long").alias("n_total"),
    )
    return checks


@register(
    "adamic_adar_order_links",
    oracle="""
    WITH e AS (
        SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    deg AS (
        SELECT pkey, COUNT(*) AS d FROM e GROUP BY pkey HAVING COUNT(*) <= 40
    ),
    ed AS (SELECT e.okey, e.pkey, deg.d FROM e JOIN deg USING (pkey)),
    pairs AS (
        SELECT a.okey AS node_a, b.okey AS node_b,
               COUNT(*) AS n_common,
               SUM(1.0 / LN(a.d)) AS aa
        FROM ed a JOIN ed b ON a.pkey = b.pkey AND a.okey < b.okey
        GROUP BY 1, 2
    )
    SELECT node_a, node_b, CAST(n_common AS BIGINT) AS n_common,
           ROUND(aa, 6) AS aa_score
    FROM pairs
    ORDER BY aa_score DESC, node_a, node_b
    LIMIT 20
    """,
)
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction (operators/graph.py:adamic_adar):
    top-20 order pairs by shared-part affinity, rare parts weighted
    1/ln(degree). Candidate pairs exist only within a shared part
    (self-equi-join on the part key); parts in > 40 orders are pruned
    before the join — the hot-neighbor quadratic guard, same recipe as
    the stop-shingle cutoff in Jaccard dedup. Deterministic tie-break →
    TakeOrderedAndProject."""
    from .operators.graph import adamic_adar

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
    )
    out = adamic_adar(li, "okey", "pkey", max_degree=40)
    return (
        out.select(
            "node_a",
            "node_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.round("aa_score", 6).alias("aa_score"),
        )
        .orderBy(F.desc("aa_score"), "node_a", "node_b")
        .limit(20)
    )


@register(
    "rfm_segments_customers",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate), TIMESTAMP '2001-09-01')
                   AS recency_days,
               COUNT(*) AS frequency,
               ROUND(SUM(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT *,
               NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey) AS r_score,
               NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
               NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
        FROM per
    )
    SELECT CASE
               WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
               WHEN r_score <= 2 THEN 'recent'
               WHEN f_score <= 2 THEN 'loyal_lapsing'
               ELSE 'hibernating'
           END AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(recency_days), 4) AS avg_recency_days,
           ROUND(AVG(frequency), 4) AS avg_frequency,
           ROUND(AVG(monetary), 4) AS avg_monetary
    FROM scored GROUP BY segment ORDER BY segment
    """,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency / frequency /
    monetary, quintile scores (NTILE with a deterministic customer-key
    tie-break so both engines cut identically), and a rule-based
    segment rollup. One orders scan + one customer groupBy; the
    quintile windows are global sorts over the |customers| frame —
    this NTILE form is the CORRECTNESS twin; the registered scale path
    is ``rfm_segments_scalable`` below (percentile cut points, no
    global window). Classic lifecycle-marketing analytics over the
    reference's transactional schema."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2001-09-01").cast("timestamp"), F.max("o_orderdate")
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    scored = per.select(
        "*",
        F.ntile(5).over(Window.orderBy("recency_days", "o_custkey")).alias("r_score"),
        F.ntile(5).over(
            Window.orderBy(F.desc("frequency"), "o_custkey")
        ).alias("f_score"),
        F.ntile(5).over(
            Window.orderBy(F.desc("monetary"), "o_custkey")
        ).alias("m_score"),
    )
    seg = F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion").when(
        F.col("r_score") <= 2, "recent"
    ).when(F.col("f_score") <= 2, "loyal_lapsing").otherwise("hibernating")
    return (
        scored.groupBy(seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.avg("recency_days"), 4).alias("avg_recency_days"),
            F.round(F.avg("frequency"), 4).alias("avg_frequency"),
            F.round(F.avg("monetary"), 4).alias("avg_monetary"),
        )
        .orderBy("segment")
    )


@register(
    "rfm_segments_scalable",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate), TIMESTAMP '2001-09-01')
                   AS recency_days,
               COUNT(*) AS frequency,
               ROUND(SUM(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    cuts AS (
        SELECT [quantile_cont(recency_days * 1.0, 0.2),
                quantile_cont(recency_days * 1.0, 0.4),
                quantile_cont(recency_days * 1.0, 0.6),
                quantile_cont(recency_days * 1.0, 0.8)] AS rb,
               [quantile_cont(frequency * 1.0, 0.2),
                quantile_cont(frequency * 1.0, 0.4),
                quantile_cont(frequency * 1.0, 0.6),
                quantile_cont(frequency * 1.0, 0.8)] AS fb
        FROM per
    ),
    scored AS (
        SELECT per.*,
               1 + len(list_filter(c.rb, b -> b < per.recency_days))
                   AS r_score,
               5 - len(list_filter(c.fb, b -> b < per.frequency))
                   AS f_score
        FROM per CROSS JOIN cuts c
    )
    SELECT CASE
               WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
               WHEN r_score <= 2 THEN 'recent'
               WHEN f_score <= 2 THEN 'loyal_lapsing'
               ELSE 'hibernating'
           END AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(recency_days), 4) AS avg_recency_days,
           ROUND(AVG(frequency), 4) AS avg_frequency,
           ROUND(AVG(monetary), 4) AS avg_monetary
    FROM scored GROUP BY segment ORDER BY segment
    """,
)
def q_rfm_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation, the 100-TB form (VERDICT r4 "What's wrong"
    #4): quintile scores come from FOUR percentile cut points per
    dimension — one aggregate fits all three boundary arrays in a
    single pass, broadcast back, and each score is a fold over its
    4-element array (``#{cuts < x}``) — no global-sort NTILE window
    anywhere in the plan. Scores differ from NTILE only in tie
    placement at cut boundaries (cut-point semantics are the
    documented contract, replicated in the oracle); swap
    ``F.percentile`` → ``F.percentile_approx`` at scale for a sketch
    fit with the same assignment rule. Recency scores ascend (1 =
    most recent); frequency descends via ``5 - bin`` (1 = most
    frequent)."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2001-09-01").cast("timestamp"), F.max("o_orderdate")
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    fracs = [0.2, 0.4, 0.6, 0.8]
    cuts = per.agg(
        F.array(
            *[
                F.percentile(F.col("recency_days").cast("double"), F.lit(q))
                for q in fracs
            ]
        ).alias("rb"),
        F.array(
            *[
                F.percentile(F.col("frequency").cast("double"), F.lit(q))
                for q in fracs
            ]
        ).alias("fb"),
    )
    scored = per.crossJoin(F.broadcast(cuts)).select(
        "recency_days",
        "frequency",
        "monetary",
        (
            1
            + F.size(
                F.filter(F.col("rb"), lambda b: b < F.col("recency_days"))
            )
        ).alias("r_score"),
        (
            5
            - F.size(
                F.filter(F.col("fb"), lambda b: b < F.col("frequency"))
            )
        ).alias("f_score"),
    )
    seg = (
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when(F.col("r_score") <= 2, "recent")
        .when(F.col("f_score") <= 2, "loyal_lapsing")
        .otherwise("hibernating")
    )
    return (
        scored.groupBy(seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.avg("recency_days"), 4).alias("avg_recency_days"),
            F.round(F.avg("frequency"), 4).alias("avg_frequency"),
            F.round(F.avg("monetary"), 4).alias("avg_monetary"),
        )
        .orderBy("segment")
    )


@register(
    "dow_seasonality_value",
    oracle="""
    WITH base AS (
        SELECT CAST(dayofweek(ts) AS BIGINT) AS dow, value
        FROM events WHERE value IS NOT NULL
    ),
    g AS (SELECT AVG(value) AS grand FROM base)
    SELECT dow,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(value), 6) AS dow_mean,
           ROUND(AVG(value) - MAX(g.grand), 6) AS seasonal_component,
           ROUND(AVG(value) / MAX(g.grand), 6) AS seasonal_index
    FROM base, g
    GROUP BY dow ORDER BY dow
    """,
)
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive + multiplicative day-of-week seasonal profile of the
    value series: per-weekday mean vs the grand mean (classical
    seasonal-index decomposition, the de-seasonalization input).
    One scan for the 7-row weekday frame + a 1-row broadcast grand
    mean; weekday via DuckDB ``dayofweek`` (Sunday=0) matched with
    ``F.dayofweek - 1`` (Spark Sunday=1)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        (F.dayofweek("ts") - 1).cast("long").alias("dow"), "value"
    )
    grand = base.agg(F.avg("value").alias("grand"))
    return (
        base.crossJoin(F.broadcast(grand))
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("value"), 6).alias("dow_mean"),
            F.round(F.avg("value") - F.max("grand"), 6).alias(
                "seasonal_component"
            ),
            F.round(F.avg("value") / F.max("grand"), 6).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


@register(
    "effective_sample_size_weights",
    oracle="""
    WITH share AS (
        SELECT lang, COUNT(*) * 1.0 AS n FROM documents GROUP BY lang
    ),
    w AS (
        SELECT d.doc_id, d.lang,
               POW(s.n / (SELECT SUM(n) FROM share), 1.0 / 0.7) / s.n AS wt
        FROM documents d JOIN share s USING (lang)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(POW(SUM(wt), 2) / SUM(wt * wt), 4) AS ess,
           ROUND(POW(SUM(wt), 2) / SUM(wt * wt) / COUNT(*), 6) AS ess_ratio,
           ROUND(MAX(wt) / MIN(wt), 4) AS weight_spread
    FROM w
    """,
)
def q_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-sampling health check: effective sample size
    ``ESS = (Σw)² / Σw²`` (Kong 1992) of the per-document weights the
    T=0.7 temperature mixture implies (per-language target share spread
    over that language's docs). ESS/n near 1 means the reweighting
    wastes little data; a tiny ratio means a few documents dominate —
    the standard go/no-go before training on a weighted corpus. One
    groupBy for shares + one broadcast join + one conditional-sum scan;
    1-row output at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    share = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    total = share.agg(F.sum("n").alias("tot"))
    wts = (
        docs.select("doc_id", "lang")
        .join(F.broadcast(share), "lang")
        .crossJoin(F.broadcast(total))
        .select(
            (
                F.pow(F.col("n") / F.col("tot"), 1.0 / 0.7) / F.col("n")
            ).alias("wt")
        )
    )
    return wts.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.pow(F.sum("wt"), 2) / F.sum(F.col("wt") * F.col("wt")), 4
        ).alias("ess"),
        F.round(
            F.pow(F.sum("wt"), 2)
            / F.sum(F.col("wt") * F.col("wt"))
            / F.count(F.lit(1)),
            6,
        ).alias("ess_ratio"),
        F.round(F.max("wt") / F.min("wt"), 4).alias("weight_spread"),
    )


@register(
    "lorenz_deciles_revenue",
    oracle="""
    WITH c AS (
        SELECT o_custkey, SUM(o_totalprice) AS rev
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT rev,
               ROW_NUMBER() OVER (ORDER BY rev, o_custkey) - 1 AS i0,
               COUNT(*) OVER () AS n,
               SUM(rev) OVER () AS tot
        FROM c
    ),
    d AS (
        SELECT LEAST(9, i0 * 10 // n) AS decile,
               COUNT(*) AS n_customers,
               SUM(rev) AS drev,
               MAX(tot) AS tot
        FROM r GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           ROUND(drev / tot, 6) AS rev_share,
           ROUND(SUM(drev) OVER (
                     ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) / tot, 6) AS cum_share
    FROM d ORDER BY decile
    """,
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve at decile resolution: customers ranked by revenue
    (ascending, custkey tie-break), cut into population deciles, each
    decile's revenue share and the cumulative share — the
    concentration curve behind gini_revenue_by_customer. Ranks come
    from ``dense_global_index`` (range partition + broadcast offsets —
    no one-task sort over |customers|); n and Σrev are a broadcast
    1-row aggregate; the only ordered window runs over the TEN decile
    rows."""
    from .operators.indexing import dense_global_index

    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    ranked = dense_global_index(c, ["rev", "o_custkey"], out_col="i0")
    totals = c.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev").alias("tot")
    )
    d = (
        ranked.crossJoin(F.broadcast(totals))
        .select(
            F.least(
                F.lit(9), F.floor(F.col("i0") * 10 / F.col("n"))
            ).alias("decile"),
            "rev",
            "tot",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev").alias("drev"),
            F.max("tot").alias("tot"),
        )
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n_customers").cast("long").alias("n_customers"),
            F.round(F.col("drev") / F.col("tot"), 6).alias("rev_share"),
            F.round(F.sum("drev").over(wcum) / F.col("tot"), 6).alias(
                "cum_share"
            ),
        )
        .orderBy("decile")
    )


@register(
    "custdist_order_counts",
    oracle="""
    WITH co AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM co GROUP BY 1 ORDER BY custdist DESC, c_count DESC
    """,
)
def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (reference workload family: engagement
    distribution): orders-per-customer histogram INCLUDING the
    zero-order customers the inner join would drop (left outer +
    COUNT(orderkey), which skips NULLs). Two hash aggregates, both
    partial map-side; the second one's key space is |distinct order
    counts| — tiny forever."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    co = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        co.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .select(F.col("c_count").cast("long").alias("c_count"), "custdist")
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "promo_revenue_share_monthly",
    oracle="""
    SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m') AS month,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
               AS promo_share_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape by month: share of discounted revenue from
    PROMO-type parts. The part dim BROADCASTS (|parts| << |lineitem|,
    and only (p_partkey, p_type) ship after pruning); one hash
    aggregate keyed by month — no lineitem shuffle beyond the agg
    exchange, conditional sum folds map-side."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_share_pct"),
        )
        .orderBy("month")
    )


@register(
    "new_vs_returning_daily",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, user_id
        FROM events GROUP BY 1, 2
    ),
    f AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY 1)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(SUM(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users
    FROM d JOIN f ON f.user_id = d.user_id
    GROUP BY 1 ORDER BY 1
    """,
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily acquisition-vs-retention split: each active (day, user)
    pair is 'new' on the user's first-seen day and 'returning' after.
    The (day, user) distinct and the first-seen reduction both key on
    user_id, so AQE coalesces them into co-partitioned exchanges; the
    final per-day rollup is bounded by |days|. The growth-accounting
    view every engagement dashboard starts with."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    f = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        d.join(f, "user_id")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_users"),
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).cast("long").alias("new_users"),
            F.sum(
                F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)
            ).cast("long").alias("returning_users"),
        )
        .orderBy("day")
    )


@register(
    "event_lateness_profile",
    oracle="""
    WITH a AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               epoch_us(ts)
                 + (((((event_id * 1000003 + 7) % 999983) * 40503)
                     % 999983) % 86400) * 1000000
                 AS arr_us
        FROM events
    ),
    o AS (
        SELECT user_id, ts_us,
               MAX(ts_us) OVER (
                   PARTITION BY user_id ORDER BY arr_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prior_max
        FROM a
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN ts_us < prior_max THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late,
           ROUND(SUM(CASE WHEN ts_us < prior_max THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS late_rate,
           ROUND(MAX(CASE WHEN ts_us < prior_max
                          THEN (prior_max - ts_us) / 1000000.0
                          ELSE 0 END), 6) AS max_late_s
    FROM o GROUP BY 1 ORDER BY user_id
    """,
)
def q_event_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order arrival audit — the batch mirror of a streaming
    watermark decision. Arrival time is simulated as event time plus a
    deterministic per-event network delay (affine-hash of event_id mod
    a prime, REMULTIPLIED, then mod 24 h — the ml/split.py mixing
    convention; a plain affine hash is monotone on dense ids; the raw testdata is perfectly ordered,
    so measuring against event_id order would observe zero disorder).
    An event is LATE if its event-time is behind the running max among
    events that ARRIVED earlier for that user; the per-user late rate
    and worst lateness bound the watermark delay a streaming twin would
    need. ONE per-user window (partitioned — scales with users, never a
    global sort) feeding a per-user aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
        F.expr(
            "ts_ns div 1000"
            " + ((((event_id * 1000003 + 7) % 999983) * 40503 % 999983)"
            " % 86400) * 1000000"
        ).alias("arr_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arr_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = ev.withColumn("prior_max", F.max("ts_us").over(w))
    late = F.col("ts_us") < F.col("prior_max")
    return (
        o.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
            F.round(
                F.sum(F.when(late, 1).otherwise(0)) / F.count(F.lit(1)), 6
            ).alias("late_rate"),
            F.round(
                F.max(
                    F.when(
                        late,
                        (F.col("prior_max") - F.col("ts_us")) / 1000000.0,
                    ).otherwise(0.0)
                ),
                6,
            ).alias("max_late_s"),
        )
        .orderBy("user_id")
    )


@register(
    "props_json_profile",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_min,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_max,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
               AS k_mean,
           CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k')
                                    AS BIGINT)) AS BIGINT) AS k_distinct
    FROM events GROUP BY 1 ORDER BY event_type
    """,
)
def q_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload profiling: pull ``$.k`` out of the JSON
    ``props`` column (``get_json_object`` — JVM Jackson path, no UDF)
    and profile it per event type. The extraction is map-side codegen;
    the aggregate is |types| rows. The pattern every telemetry schema
    with a JSON blob column needs before promoting fields to real
    columns."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
            F.round(F.avg("k"), 6).alias("k_mean"),
            F.countDistinct("k").cast("long").alias("k_distinct"),
        )
        .orderBy("event_type")
    )


@register(
    "top_session_paths",
    oracle="""
    WITH e AS (
        SELECT user_id, CAST(ts AS DATE) AS day, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY epoch_us(ts), event_id
               ) AS rn
        FROM events
    ),
    p AS (
        SELECT user_id, day,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM e WHERE rn <= 5 GROUP BY 1, 2
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining over day-sessions: the first five event types per
    (user, day), joined into a '>' path string, counted across sessions
    — 'what do typical visits look like', the whole-journey complement
    of top_event_trigrams' fixed-width windows. The rank window
    partitions on (user, day) — parallel at any scale; path counts
    partial-agg map-side (key space ≤ |types|^5 but concentrated);
    deterministic tie-break → TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.to_date("ts").alias("day"),
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts_us", "event_id")
    p = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("user_id", "day")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("path")
        )
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


@register(
    "interval_union_coverage",
    oracle="""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s_us,
               epoch_us(ts) + 1800000000 AS e_us
        FROM events
    ),
    m AS (
        SELECT user_id, s_us, e_us,
               MAX(e_us) OVER (
                   PARTITION BY user_id ORDER BY s_us, e_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prior_end
        FROM iv
    ),
    seg AS (
        SELECT user_id, s_us, e_us,
               SUM(CASE WHEN prior_end IS NULL OR s_us > prior_end
                        THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY s_us, e_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS seg_id
        FROM m
    ),
    g AS (
        SELECT user_id, seg_id, MIN(s_us) AS s, MAX(e_us) AS e
        FROM seg GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           ROUND(SUM(e - s) / 1000000.0, 6) AS covered_seconds
    FROM g GROUP BY 1 ORDER BY user_id
    """,
)
def q_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage: pad each event to a 30-minute activity
    interval, merge overlaps per user (prior-running-max sweep: a new
    segment starts when this interval's start clears everything seen
    before), and report merged-segment count + total covered seconds —
    'how much wall-clock was this user active', the dedup-aware
    denominator for utilization metrics. Both windows share ONE
    per-user shuffle (same partition + order); everything after is a
    grouped aggregate. The per-user sweep parallelizes across users at
    any scale."""
    half_hour = 1_800_000_000
    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts_ns div 1000").alias("s_us"),
        (F.expr("ts_ns div 1000") + half_hour).alias("e_us"),
    )
    wprior = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    new_seg = F.when(
        F.col("prior_end").isNull() | (F.col("s_us") > F.col("prior_end")), 1
    ).otherwise(0)
    seg = iv.withColumn("prior_end", F.max("e_us").over(wprior)).withColumn(
        "seg_id", F.sum(new_seg).over(wrun)
    )
    g = seg.groupBy("user_id", "seg_id").agg(
        F.min("s_us").alias("s"), F.max("e_us").alias("e")
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.round(F.sum(F.col("e") - F.col("s")) / 1000000.0, 6).alias(
                "covered_seconds"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "bfs_hops_supplier_graph",
    oracle="""
    WITH RECURSIVE
    seed AS (SELECT MIN(l_suppkey) AS s FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM lineitem a
        JOIN lineitem b ON b.l_orderkey = a.l_orderkey
                        AND b.l_suppkey <> a.l_suppkey
    ),
    walk(node, hop) AS (
        SELECT s, 0 FROM seed
        UNION
        SELECT e.dst, w.hop + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.hop < 3
    )
    SELECT CAST(hop AS BIGINT) AS hop, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM (SELECT node, MIN(hop) AS hop FROM walk GROUP BY node)
    GROUP BY 1 ORDER BY 1
    """,
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first reachability (operators/graph.py:bfs_min_hops)
    over the supplier co-fulfillment graph (suppliers linked when they
    ship lines of the same order): how many suppliers sit 0/1/2/3 hops
    from the lowest-keyed supplier. Level-synchronous distributed BFS —
    one frontier ⋈ edges join + visited anti-join per level, lineage
    checkpoint-truncated; the DuckDB oracle is the recursive-CTE
    min-hop. Co-fulfillment edges are per-order pairs (≤ lines² per
    order, never a global product)."""
    from .operators.graph import bfs_min_hops

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .distinct()
    )
    seeds = li.agg(F.min("l_suppkey").alias("node"))
    hops = bfs_min_hops(edges, seeds, max_hops=3)
    return (
        hops.groupBy("hop")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("hop")
    )


@register(
    "decile_lift_table",
    oracle="""
    WITH b AS (
        SELECT [quantile_cont(value, 0.1), quantile_cont(value, 0.2),
                quantile_cont(value, 0.3), quantile_cont(value, 0.4),
                quantile_cont(value, 0.5), quantile_cont(value, 0.6),
                quantile_cont(value, 0.7), quantile_cont(value, 0.8),
                quantile_cont(value, 0.9)] AS cs
        FROM events WHERE value IS NOT NULL
    ),
    s AS (
        SELECT len(list_filter(b.cs, c -> c < e.value)) AS decile,
               CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events e CROSS JOIN b WHERE e.value IS NOT NULL
    ),
    g AS (SELECT decile, COUNT(*) AS n, SUM(y) AS pos FROM s GROUP BY 1),
    t AS (SELECT SUM(n) AS tn, SUM(pos) AS tp FROM g)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n AS BIGINT) AS n,
           CAST(pos AS BIGINT) AS n_pos,
           ROUND(pos * 1.0 / n, 6) AS purchase_rate,
           ROUND((pos * 1.0 / n) / (t.tp * 1.0 / t.tn), 6) AS lift,
           ROUND(SUM(pos) OVER (
                     ORDER BY decile DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) * 1.0 / t.tp, 6) AS cum_capture
    FROM g CROSS JOIN t ORDER BY decile
    """,
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table — the campaign-targeting evaluation classic:
    score deciles (EXACT percentile cuts, broadcast, fold-assigned —
    the quantile_discretize pattern, no NTILE global sort), per-decile
    purchase rate, lift over the base rate, and top-down cumulative
    capture. The only windows run over the TEN decile rows; the scan
    aggregates map-side into 10 groups."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select("value", "event_type")
    fracs = [i / 10 for i in range(1, 10)]
    cuts = ev.agg(
        F.array(*[F.percentile("value", F.lit(f)) for f in fracs]).alias("cs")
    )
    s = ev.crossJoin(F.broadcast(cuts)).select(
        F.size(F.filter(F.col("cs"), lambda c: c < F.col("value"))).alias(
            "decile"
        ),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = s.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    t = g.agg(F.sum("n").alias("tn"), F.sum("pos").alias("tp"))
    wcap = (
        Window.orderBy(F.desc("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n").cast("long").alias("n"),
            F.col("pos").cast("long").alias("n_pos"),
            F.round(F.col("pos") / F.col("n"), 6).alias("purchase_rate"),
            F.round(
                (F.col("pos") / F.col("n")) / (F.col("tp") / F.col("tn")), 6
            ).alias("lift"),
            F.round(
                F.sum("pos").over(wcap) / F.col("tp"), 6
            ).alias("cum_capture"),
        )
        .orderBy("decile")
    )


@register(
    "dsir_importance_weights",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, lang, unnest(string_split_regex(
                   trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ',
                                             'g'))), '\\s+')) AS w
        FROM documents
    ),
    tgt AS (
        SELECT w, COUNT(*) AS c FROM toks WHERE lang = 'en' GROUP BY w
    ),
    corp AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
    v AS (
        SELECT (SELECT COUNT(*) FROM corp) AS vocab,
               (SELECT SUM(c) FROM tgt) AS tot_t,
               (SELECT SUM(c) FROM corp) AS tot_c
    ),
    ratio AS (
        SELECT corp.w,
               LN((COALESCE(tgt.c, 0) + 1.0) / (v.tot_t + v.vocab))
               - LN((corp.c + 1.0) / (v.tot_c + v.vocab)) AS llr
        FROM corp LEFT JOIN tgt ON tgt.w = corp.w CROSS JOIN v
    ),
    doc_w AS (
        SELECT t.doc_id, t.source, SUM(r.llr) AS log_weight
        FROM toks t JOIN ratio r ON r.w = t.w
        GROUP BY 1, 2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(log_weight), 6) AS avg_log_weight,
           ROUND(MAX(log_weight), 6) AS max_log_weight
    FROM doc_w GROUP BY source ORDER BY source
    """,
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score each
    document by the log-likelihood ratio of a target unigram LM (here:
    the 'en' slice as the target domain) vs the raw-corpus LM, add-1
    smoothed over the shared vocabulary — the standard recipe for
    tilting a pretraining mixture toward a target domain. Token
    explode is map-side; both LMs and the ratio table are
    VOCAB-bounded frames (at 100 TB DSIR hashes words into ~10k
    buckets — same plan, smaller ratio table, which then BROADCASTS
    into the per-doc scoring join exactly as here). Per-source
    summary keeps the output driver-hashable."""
    from .functions.text import normalized_text, tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", "lang",
        F.explode(tokens(normalized_text("text"))).alias("w"),
    )
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    corp = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cc"))
    totals = corp.join(tgt, "w", "left").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.coalesce("ct", F.lit(0))).alias("tot_t"),
        F.sum("cc").alias("tot_c"),
    )
    ratio = (
        corp.join(tgt, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "w",
            (
                F.log(
                    (F.coalesce("ct", F.lit(0)) + 1.0)
                    / (F.col("tot_t") + F.col("vocab"))
                )
                - F.log((F.col("cc") + 1.0) / (F.col("tot_c") + F.col("vocab")))
            ).alias("llr"),
        )
    )
    doc_w = (
        toks.join(F.broadcast(ratio), "w")
        .groupBy("doc_id", "source")
        .agg(F.sum("llr").alias("log_weight"))
    )
    return (
        doc_w.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("log_weight"), 6).alias("avg_log_weight"),
            F.round(F.max("log_weight"), 6).alias("max_log_weight"),
        )
        .orderBy("source")
    )


@register(
    "cohort_ltv_accumulation",
    oracle="""
    WITH first_m AS (
        SELECT o_custkey,
               strftime(date_trunc('month', MIN(o_orderdate)), '%Y-%m')
                   AS cohort
        FROM orders GROUP BY 1
    ),
    rev AS (
        SELECT f.cohort,
               date_diff('month',
                         date_trunc('month', strptime(f.cohort, '%Y-%m')),
                         date_trunc('month', o.o_orderdate)) AS age_months,
               SUM(o.o_totalprice) AS m_rev
        FROM orders o JOIN first_m f ON f.o_custkey = o.o_custkey
        GROUP BY 1, 2
    )
    SELECT cohort, CAST(age_months AS BIGINT) AS age_months,
           ROUND(m_rev, 2) AS month_revenue,
           ROUND(SUM(m_rev) OVER (
                     PARTITION BY cohort ORDER BY age_months
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ), 2) AS cum_revenue
    FROM rev
    WHERE age_months <= 6
    ORDER BY cohort, age_months
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value accumulation: customers cohorted by
    first-order month, revenue bucketed by months-since-acquisition,
    cumulative LTV per cohort (first 6 ages) — the retention-economics
    matrix behind payback-period decisions. Cohort assignment and the
    revenue rollup shuffle on o_custkey / (cohort, age) respectively;
    the cumulative window runs over ≤7 rows per cohort (bounded
    frame)."""
    o = load_table(spark, sf_dir, "orders")
    first_m = o.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM").alias("cohort")
    )
    rev = (
        o.join(first_m, "o_custkey")
        .groupBy(
            "cohort",
            (
                (F.year("o_orderdate") - F.split("cohort", "-")[0].cast("int"))
                * 12
                + (F.month("o_orderdate") - F.split("cohort", "-")[1].cast("int"))
            ).alias("age_months"),
        )
        .agg(F.sum("o_totalprice").alias("m_rev"))
        .filter(F.col("age_months") <= 6)
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.select(
            "cohort",
            F.col("age_months").cast("long").alias("age_months"),
            F.round("m_rev", 2).alias("month_revenue"),
            F.round(F.sum("m_rev").over(wcum), 2).alias("cum_revenue"),
        )
        .orderBy("cohort", "age_months")
    )


@register(
    "rolling_7d_active_users",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM du),
    cover AS (
        SELECT du.user_id,
               du.day + to_days(CAST(g.o AS INTEGER)) AS wday
        FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS o) g
    )
    SELECT strftime(c.wday, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS active_7d
    FROM cover c CROSS JOIN span s
    WHERE c.wday BETWEEN s.lo AND s.hi
    GROUP BY 1 ORDER BY 1
    """,
)
def q_rolling_7d_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day via the COVERAGE
    EXPLODE trick: a user active on day d counts toward windows ending
    on d..d+6, so each distinct (day, user) emits its 7 covered window
    ends map-side and the answer is a per-day distinct count — NO
    7-way self-join, NO re-scan per window, work linear in |active
    pairs|×7. Clipped to the observed day span so edge windows match
    the oracle."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    span = du.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cover = du.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("o"),
        "day",
    ).select("user_id", F.date_add("day", F.col("o")).alias("wday"))
    return (
        cover.crossJoin(F.broadcast(span))
        .filter(F.col("wday").between(F.col("lo"), F.col("hi")))
        .groupBy(F.date_format("wday", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("active_7d"))
        .orderBy("day")
    )


@register(
    "histogram_quantile_tolerance",
    oracle="""
    WITH v AS (SELECT value FROM events WHERE value IS NOT NULL)
    SELECT 0.25 AS prob, ROUND(quantile_cont(value, 0.25), 6) AS exact_q,
           TRUE AS within_tol FROM v
    UNION ALL
    SELECT 0.5, ROUND(quantile_cont(value, 0.5), 6), TRUE FROM v
    UNION ALL
    SELECT 0.9, ROUND(quantile_cont(value, 0.9), 6), TRUE FROM v
    UNION ALL
    SELECT 0.99, ROUND(quantile_cont(value, 0.99), 6), TRUE FROM v
    ORDER BY prob
    """,
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantile sketch, tolerance-checked (the
    hll_within_tolerance pattern): a 512-bin equal-width histogram
    (operators/sketches.py:histogram_sketch — per-partition counts ARE
    the shard merge, shuffle bounded by n_bins forever) estimates
    p25/p50/p90/p99; each estimate must sit within ONE bin width of
    the exact quantile — the sketch's constructive guarantee. The
    oracle pins the exact quantiles and constant-TRUE flags; an
    out-of-bound estimate reddens the row."""
    from .operators.sketches import histogram_sketch, quantiles_from_histogram

    ev = load_table(spark, sf_dir, "events").select("value")
    probs = [0.25, 0.5, 0.9, 0.99]
    hist = histogram_sketch(ev, "value", n_bins=512)
    est = quantiles_from_histogram(hist, probs)
    exact = ev.filter(F.col("value").isNotNull()).agg(
        *[
            F.percentile("value", F.lit(p)).alias(f"q{i}")
            for i, p in enumerate(probs)
        ],
        ((F.max("value") - F.min("value")) / 512).alias("w"),
    )
    ex = exact.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(p)).alias("prob"),
                        F.col(f"q{i}").alias("exact"),
                        F.col("w").alias("w"),
                    )
                    for i, p in enumerate(probs)
                ]
            )
        ).alias("s")
    ).select("s.prob", "s.exact", "s.w")
    return (
        est.join(F.broadcast(ex), "prob")
        .select(
            "prob",
            F.round("exact", 6).alias("exact_q"),
            (F.abs(F.col("est") - F.col("exact")) <= F.col("w")).alias(
                "within_tol"
            ),
        )
        .orderBy("prob")
    )


@register(
    "attribution_time_decay",
    oracle="""
    WITH t AS (
        SELECT user_id, event_type, epoch_us(ts) AS t_us
        FROM events WHERE event_type <> 'purchase'
    ),
    c AS (
        SELECT user_id, event_id AS cid, epoch_us(ts) AS c_us
        FROM events WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT c.cid, t.event_type,
               POWER(0.5, (c.c_us - t.t_us) / 86400000000.0) AS w
        FROM c JOIN t ON t.user_id = c.user_id
                      AND t.t_us < c.c_us
                      AND c.c_us - t.t_us <= 604800000000
    ),
    norm AS (
        SELECT cid, event_type,
               w / SUM(w) OVER (PARTITION BY cid) AS share
        FROM j
    )
    SELECT event_type,
           CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_conversions,
           ROUND(SUM(share), 6) AS total_credit
    FROM norm GROUP BY 1 ORDER BY event_type
    """,
)
def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch time-decay attribution (half-life 1 day, 7-day
    lookback): every touch before a purchase earns 0.5^(Δdays),
    normalized per conversion so each purchase distributes exactly one
    credit — the standard alternative to attribution_last_touch's
    winner-take-all. The touch⋈conversion join is PER-USER and
    time-bounded (7-day band); at 100 TB the same band maps onto the
    binned interval-join machinery (operators/joins.py) — never a
    cross product. Normalization partitions by conversion id."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr("ts_ns div 1000").alias("t_us"),
    )
    day_us = 86_400_000_000
    week_us = 7 * day_us
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "event_type", "t_us"
    )
    c = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("cid"),
        F.col("t_us").alias("c_us"),
    )
    j = c.join(t, "user_id").filter(
        (F.col("t_us") < F.col("c_us"))
        & (F.col("c_us") - F.col("t_us") <= week_us)
    ).select(
        "cid", "event_type",
        F.pow(
            F.lit(0.5), (F.col("c_us") - F.col("t_us")) / F.lit(float(day_us))
        ).alias("w"),
    )
    wconv = Window.partitionBy("cid")
    norm = j.select(
        "cid", "event_type",
        (F.col("w") / F.sum("w").over(wconv)).alias("share"),
    )
    return (
        norm.groupBy("event_type")
        .agg(
            F.countDistinct("cid").cast("long").alias("n_conversions"),
            F.round(F.sum("share"), 6).alias("total_credit"),
        )
        .orderBy("event_type")
    )


@register(
    "elasticity_brand_ols",
    oracle="""
    WITH d AS (
        SELECT p.p_brand,
               LN(l.l_extendedprice / l.l_quantity) AS x,
               LN(l.l_quantity) AS y
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    ),
    s AS (
        SELECT p_brand, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        FROM d GROUP BY 1
    )
    SELECT p_brand,
           CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
               AS elasticity,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept,
           ROUND(POWER(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s ORDER BY p_brand
    """,
)
def q_elasticity_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price elasticity of demand: grouped closed-form OLS of
    ln(quantity) on ln(unit price) — slope = elasticity, plus intercept
    and R². Grouped model fitting as pure aggregate algebra: the five
    sufficient statistics fold map-side in ONE hash aggregate (the
    shard_merged_moments contract — they merge across shards by
    addition), part dim broadcasts. No per-group solver, no collect."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    d = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("x"),
        F.log("l_quantity").alias("y"),
    )
    s = d.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        s.select(
            "p_brand",
            F.col("n").cast("long").alias("n"),
            F.round(slope, 6).alias("elasticity"),
            F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
            .alias("intercept"),
            F.round(
                F.pow(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"), 2)
                / (
                    (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                    * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                ),
                6,
            ).alias("r2"),
        )
        .orderBy("p_brand")
    )


@register(
    "containment_near_dup_docs",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS toks
        FROM documents
    ),
    s AS (SELECT doc_id, unnest(range(1, len(toks) - 1)) AS i, toks
          FROM t WHERE len(toks) >= 3),
    d AS (SELECT DISTINCT doc_id,
                 toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
          FROM s),
    n AS (SELECT doc_id, COUNT(*) AS ns FROM d GROUP BY doc_id),
    p AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
        FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT ia AS id_a, ib AS id_b,
           ROUND(c * 1.0 / na.ns, 6) AS containment_a,
           ROUND(c * 1.0 / nb.ns, 6) AS containment_b
    FROM p JOIN n na ON na.doc_id = p.ia JOIN n nb ON nb.doc_id = p.ib
    WHERE GREATEST(c * 1.0 / na.ns, c * 1.0 / nb.ns) >= 0.6
    ORDER BY id_a, id_b
    """,
)
def q_containment_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric 3-gram containment pairs ≥ 0.6
    (operators/dedup.py:ngram_containment_pairs) — catches
    quote/subset duplication that symmetric Jaccard dilutes when doc
    sizes differ (Broder's resemblance-vs-containment). Same
    stop-shingle-guarded inverted-index plan as ngram_jaccard_dups."""
    from .operators.dedup import ngram_containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    out = ngram_containment_pairs(docs, threshold=0.6)
    return out.select(
        "id_a", "id_b",
        F.round("containment_a", 6).alias("containment_a"),
        F.round("containment_b", 6).alias("containment_b"),
    ).orderBy("id_a", "id_b")


@register(
    "spearman_value_props",
    oracle="""
    WITH base AS (
        SELECT event_id, value,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE value IS NOT NULL
          AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    r AS (
        SELECT RANK() OVER (ORDER BY value) AS rv,
               RANK() OVER (ORDER BY k) AS rk
        FROM base
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CORR(rv, rk), 6) AS spearman_rho
    FROM r
    """,
)
def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the value column and the JSON
    payload field — the monotonic-association complement of Pearson
    (stats_corr_by_type family). Tie-aware RANK() comes from the
    two-phase distributed machinery: rows sort by (key, event_id) via
    dense_global_index, then rank = min index per key via a per-key
    aggregate join — no single-partition window anywhere; the final
    CORR over ranks is one scan. Rows with a missing ``$.k`` are
    excluded on BOTH sides (Spearman over null ranks is meaningless,
    and Spark's range partitioner sorts NULLS FIRST while DuckDB's
    RANK() puts them last — a latent divergence otherwise; ADVICE
    r5)."""
    from .operators.indexing import dense_global_index

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.get_json_object("props", "$.k").isNotNull()
    ).select(
        "event_id", "value",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )

    def rank_of(df, col, out):
        idx = dense_global_index(df, [col, "event_id"], out_col="__i")
        # RANK() semantics: every tie takes the MINIMUM index + 1
        mins = idx.groupBy(col).agg((F.min("__i") + 1).alias(out))
        return idx.join(mins, col).select("event_id", out)

    rv = rank_of(ev.select("event_id", "value"), "value", "rv")
    rk = rank_of(ev.select("event_id", "k"), "k", "rk")
    return rv.join(rk, "event_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.corr("rv", "rk"), 6).alias("spearman_rho"),
    )


@register(
    "rolling_origin_folds",
    oracle="""
    WITH b AS (
        SELECT epoch_us(MIN(ts)) AS lo,
               epoch_us(MAX(ts)) AS hi
        FROM events
    ),
    f AS (
        SELECT e.event_id, e.user_id, epoch_us(e.ts) AS t_us,
               g.fold,
               b.lo + (g.fold + 1) * (b.hi - b.lo) / 5 AS cutoff,
               b.lo + (g.fold + 2) * (b.hi - b.lo) / 5 AS test_end
        FROM events e
        CROSS JOIN b
        CROSS JOIN (SELECT unnest(range(0, 3)) AS fold) g
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(SUM(CASE WHEN t_us <= cutoff THEN 1 ELSE 0 END) AS BIGINT)
               AS n_train,
           CAST(SUM(CASE WHEN t_us > cutoff AND t_us <= test_end
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
           CAST(COUNT(DISTINCT CASE WHEN t_us > cutoff AND t_us <= test_end
                                    THEN user_id END) AS BIGINT)
               AS test_users
    FROM f GROUP BY fold ORDER BY fold
    """,
)
def q_rolling_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (forward-chaining) time-series cross-validation —
    the temporally-sound alternative to random k-fold for fraud models
    (training on the future of the test window leaks): fold k trains
    on everything up to cutoff_k and tests on the next span, cutoffs
    at equal fractions of the observed time range. The fold axis is a
    3-way map-side explode against broadcast bounds; one grouped
    aggregate — no shuffle beyond the 3-row agg. Complements
    kfold_assignment_invariants (random) and split_leakage_audit
    (group disjointness)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts_ns div 1000").alias("t_us")
    )
    b = ev.agg(F.min("t_us").alias("lo"), F.max("t_us").alias("hi"))
    f = (
        ev.crossJoin(F.broadcast(b))
        .select(
            "event_id", "user_id", "t_us", "lo", "hi",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("fold"),
        )
        .select(
            "event_id", "user_id", "t_us", "fold",
            (
                F.col("lo")
                + (F.col("fold") + 1) * (F.col("hi") - F.col("lo")) / 5
            ).alias("cutoff"),
            (
                F.col("lo")
                + (F.col("fold") + 2) * (F.col("hi") - F.col("lo")) / 5
            ).alias("test_end"),
        )
    )
    in_test = (F.col("t_us") > F.col("cutoff")) & (
        F.col("t_us") <= F.col("test_end")
    )
    return (
        f.groupBy("fold")
        .agg(
            F.sum(F.when(F.col("t_us") <= F.col("cutoff"), 1).otherwise(0))
            .cast("long").alias("n_train"),
            F.sum(F.when(in_test, 1).otherwise(0)).cast("long").alias("n_test"),
            F.countDistinct(F.when(in_test, F.col("user_id")))
            .cast("long").alias("test_users"),
        )
        .select(F.col("fold").cast("long").alias("fold"), "n_train",
                "n_test", "test_users")
        .orderBy("fold")
    )


@register(
    "region_nation_revenue_share",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               SUM(o.o_totalprice) AS rev
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    )
    SELECT region, nation,
           ROUND(rev, 2) AS revenue,
           ROUND(rev / SUM(rev) OVER (PARTITION BY region), 6)
               AS share_of_region,
           ROUND(rev / SUM(rev) OVER (), 6) AS share_of_total
    FROM rev ORDER BY region, nation
    """,
)
def q_region_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy share-of-parent rollup: nation revenue as a share of
    its region and of the grand total — the drill-down ratio view on
    the reference's region⋈nation⋈customer⋈orders chain. Dims all
    BROADCAST (orders never shuffles before the agg); both share
    windows run over the 25-row nation frame (bounded — dim-sized,
    not fact-sized)."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    wreg = Window.partitionBy("region")
    wall = Window.partitionBy()
    return (
        rev.select(
            "region", "nation",
            F.round("rev", 2).alias("revenue"),
            F.round(F.col("rev") / F.sum("rev").over(wreg), 6).alias(
                "share_of_region"
            ),
            F.round(F.col("rev") / F.sum("rev").over(wall), 6).alias(
                "share_of_total"
            ),
        )
        .orderBy("region", "nation")
    )


@register(
    "seasonal_naive_backtest",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    l AS (
        SELECT a.event_type, a.n, b.n AS f7, c.n AS f1
        FROM d a
        LEFT JOIN d b ON b.event_type = a.event_type
                      AND b.day = a.day - 7
        LEFT JOIN d c ON c.event_type = a.event_type
                      AND c.day = a.day - 1
    )
    SELECT event_type,
           CAST(COUNT(CASE WHEN f7 IS NOT NULL AND f1 IS NOT NULL
                           THEN 1 END) AS BIGINT) AS n_eval,
           ROUND(AVG(CASE WHEN f7 IS NOT NULL AND f1 IS NOT NULL
                          THEN ABS(n - f7) * 1.0 / n END), 6)
               AS mape_snaive,
           ROUND(AVG(CASE WHEN f7 IS NOT NULL AND f1 IS NOT NULL
                          THEN ABS(n - f1) * 1.0 / n END), 6)
               AS mape_naive1
    FROM l GROUP BY 1 ORDER BY event_type
    """,
)
def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline backtest: seasonal-naive (same weekday last
    week) vs naive-1 (yesterday) for daily event counts per type,
    scored by MAPE on the days where both forecasts exist — the
    sanity floor every demand-forecasting model must beat, and the
    calendar-aligned join form (day−7 / day−1 equi-joins on the
    bounded per-type daily frame, co-partitioned on event_type) rather
    than a row-lag, so date gaps can't silently misalign the
    comparison."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    a, b, c = d.alias("a"), d.alias("b"), d.alias("c")
    l = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") == F.date_sub(F.col("a.day"), 7)),
            "left",
        )
        .join(
            c,
            (F.col("c.event_type") == F.col("a.event_type"))
            & (F.col("c.day") == F.date_sub(F.col("a.day"), 1)),
            "left",
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.n").alias("n"),
            F.col("b.n").alias("f7"),
            F.col("c.n").alias("f1"),
        )
    )
    both = F.col("f7").isNotNull() & F.col("f1").isNotNull()
    return (
        l.groupBy("event_type")
        .agg(
            F.count(F.when(both, 1)).cast("long").alias("n_eval"),
            F.round(
                F.avg(
                    F.when(both, F.abs(F.col("n") - F.col("f7")) / F.col("n"))
                ),
                6,
            ).alias("mape_snaive"),
            F.round(
                F.avg(
                    F.when(both, F.abs(F.col("n") - F.col("f1")) / F.col("n"))
                ),
                6,
            ).alias("mape_naive1"),
        )
        .orderBy("event_type")
    )


@register(
    "clustering_coefficient_parts",
    oracle="""
    WITH e0 AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT node, COUNT(*) AS deg FROM (
            SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
        ) GROUP BY 1
    ),
    tri AS (
        SELECT node, COUNT(*) AS triangles FROM (
            SELECT unnest([e1.u, e1.v, e2.v]) AS node
            FROM e0 e1
            JOIN e0 e2 ON e2.u = e1.v
            JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v
        ) GROUP BY 1
    )
    SELECT d.node AS part, CAST(d.deg AS BIGINT) AS deg,
           CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles,
           ROUND(CASE WHEN d.deg >= 2
                      THEN 2.0 * COALESCE(t.triangles, 0)
                           / (d.deg * (d.deg - 1))
                      ELSE 0.0 END, 6) AS coeff
    FROM deg d LEFT JOIN tri t ON t.node = d.node
    ORDER BY coeff DESC, deg DESC, part LIMIT 25
    """,
)
def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per part
    (operators/graph.py:clustering_coefficient) over the co-purchase
    graph — 'how clique-like is each node's neighborhood', the
    node-level fraud-ring/community signal refining the global
    triangle count. Same degree-ordered O(m^1.5) wedge join; corner
    credit is one bounded 3-rows-per-triangle explode. Oracle is the
    naive 3-way self-join, viable only at test scale."""
    from .operators.graph import clustering_coefficient, co_occurrence_edges

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    edges = co_occurrence_edges(li, "l_orderkey", "l_partkey")
    out = clustering_coefficient(edges)
    return (
        out.select(
            F.col("node").alias("part"),
            F.col("deg").cast("long").alias("deg"),
            F.col("triangles").cast("long").alias("triangles"),
            F.round("coeff", 6).alias("coeff"),
        )
        .orderBy(F.desc("coeff"), F.desc("deg"), "part")
        .limit(25)
    )


@register(
    "hill_alpha_degree_distribution",
    oracle="""
    WITH e0 AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
        ) GROUP BY 1
    ),
    t AS (SELECT d FROM deg WHERE d >= 5)
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) AS BIGINT) AS n_tail,
           CAST(MAX(d) AS BIGINT) AS max_degree,
           ROUND(1.0 + COUNT(*) / SUM(LN(d / 5.0)), 6) AS hill_alpha
    FROM t
    """,
)
def q_hill_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law tail exponent of the co-purchase degree distribution
    via the Hill estimator α = 1 + n/Σ ln(d/d_min) over degrees ≥
    d_min=5 — the graph-shape diagnostic that decides whether
    skew-hardened plans (salting, degree-ordered orientation) are
    needed at scale, the graph-side sibling of zipf_slope_tokens. One
    degree aggregate + one 1-row tail fold; never materializes more
    than the degree frame."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    from .operators.graph import co_occurrence_edges

    edges = co_occurrence_edges(li, "l_orderkey", "l_partkey")
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    tail = deg.filter(F.col("d") >= 5)
    return (
        tail.agg(
            F.count(F.lit(1)).cast("long").alias("n_tail"),
            F.max("d").cast("long").alias("max_degree"),
            F.round(
                1.0 + F.count(F.lit(1)) / F.sum(F.log(F.col("d") / 5.0)), 6
            ).alias("hill_alpha"),
        )
        .crossJoin(F.broadcast(n_nodes))
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            "n_tail", "max_degree", "hill_alpha",
        )
    )


@register(
    "shipping_latency_by_priority",
    oracle="""
    WITH lat AS (
        SELECT o.o_orderpriority,
               date_diff('day', o.o_orderdate, MIN(l.l_shipdate)) AS lag_days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(AVG(lag_days), 6) AS mean_lag_days,
           ROUND(quantile_cont(lag_days, 0.5), 6) AS p50_lag_days,
           ROUND(quantile_cont(lag_days, 0.9), 6) AS p90_lag_days
    FROM lat GROUP BY 1 ORDER BY o_orderpriority
    """,
)
def q_shipping_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-latency SLA view: days from order to FIRST shipment
    per order, p50/p90 per order priority — 'are urgent orders
    actually shipped faster'. The order⋈lineitem join and the
    first-ship reduction share the o_orderkey key (AQE co-partitions);
    the holistic percentile runs per priority group (5 groups). Exact
    percentile ≡ quantile_cont on both engines."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lat = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            "o_orderpriority",
            F.datediff("first_ship", "o_orderdate").alias("lag_days"),
        )
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.avg("lag_days"), 6).alias("mean_lag_days"),
            F.round(F.percentile("lag_days", F.lit(0.5)), 6).alias(
                "p50_lag_days"
            ),
            F.round(F.percentile("lag_days", F.lit(0.9)), 6).alias(
                "p90_lag_days"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "cuped_ab_adjustment",
    oracle="""
    WITH b AS (
        SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid
        FROM events
    ),
    u AS (
        SELECT user_id % 2 AS arm, user_id,
               AVG(CASE WHEN epoch_us(ts) < b.mid THEN value END) AS x,
               AVG(CASE WHEN epoch_us(ts) >= b.mid THEN value END) AS y
        FROM events, b WHERE value IS NOT NULL
        GROUP BY 1, 2, b.mid
    ),
    p AS (SELECT * FROM u WHERE x IS NOT NULL AND y IS NOT NULL),
    th AS (
        SELECT covar_pop(x, y) / var_pop(x) AS theta, AVG(x) AS xbar
        FROM p
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(y), 6) AS mean_raw,
           ROUND(AVG(y - th.theta * (x - th.xbar)), 6) AS mean_cuped,
           ROUND(1 - var_pop(y - th.theta * (x - th.xbar)) / var_pop(y), 6)
               AS var_reduction
    FROM p, th GROUP BY arm, th.theta, th.xbar ORDER BY arm
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013, 'Improving the
    Sensitivity of Online Controlled Experiments'): per-user pre-period
    mean as the covariate, y* = y − θ(x − x̄) with the pooled
    θ = cov(x,y)/var(x) — the experimentation-platform standard that
    shrinks metric variance without biasing the treatment contrast
    (θ is arm-agnostic). Pre/post split at the time midpoint; hash
    arms (user_id parity) as in ab_test_value_by_split. One per-user
    aggregate, one 1-row θ frame broadcast back, per-arm rollup —
    every stage keys on user_id or the 2-row arm frame."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select("user_id", "value", F.expr("ts_ns div 1000").alias("t_us"))
    b = ev.agg(
        F.floor((F.min("t_us") + F.max("t_us")) / 2).cast("long").alias("mid")
    )
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy((F.col("user_id") % 2).alias("arm"), "user_id")
        .agg(
            F.avg(F.when(F.col("t_us") < F.col("mid"), F.col("value"))).alias(
                "x"
            ),
            F.avg(
                F.when(F.col("t_us") >= F.col("mid"), F.col("value"))
            ).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    th = u.agg(
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("theta"),
        F.avg("x").alias("xbar"),
    )
    adj = u.crossJoin(F.broadcast(th)).select(
        "arm", "y",
        (F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar"))).alias(
            "ystar"
        ),
    )
    return (
        adj.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.avg("y"), 6).alias("mean_raw"),
            F.round(F.avg("ystar"), 6).alias("mean_cuped"),
            F.round(1 - F.var_pop("ystar") / F.var_pop("y"), 6).alias(
                "var_reduction"
            ),
        )
        .select(F.col("arm").cast("long").alias("arm"), "n_users",
                "mean_raw", "mean_cuped", "var_reduction")
        .orderBy("arm")
    )


@register(
    "data_contract_audit",
    oracle="""
    SELECT 'customer_fk_nation' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS violations
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM nation n
                      WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'documents_nonempty_text',
           CAST(COUNT(*) AS BIGINT)
    FROM documents WHERE text IS NULL OR trim(text) = ''
    UNION ALL
    SELECT 'events_ts_not_null', CAST(COUNT(*) AS BIGINT)
    FROM events WHERE ts IS NULL
    UNION ALL
    SELECT 'lineitem_fk_orders', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders_pk_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    ORDER BY check_name
    """,
)
def q_data_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table data-contract audit in one result set: primary-key
    uniqueness, two foreign-key closures (anti-join form — the
    scalable NOT EXISTS), null guards, empty-text rate — the
    ingestion gate a warehouse runs before promoting a batch,
    generalizing referential_integrity_audit to a multi-check
    contract. FK anti-joins broadcast the dim side where small; each
    check is one aggregate row, unioned."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    def one(name, df):
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).cast("long").alias("violations"),
        )

    checks = [
        one(
            "customer_fk_nation",
            c.join(
                F.broadcast(n),
                c.c_nationkey == n.n_nationkey,
                "left_anti",
            ),
        ),
        one(
            "documents_nonempty_text",
            docs.filter(
                F.col("text").isNull() | (F.trim("text") == "")
            ),
        ),
        one("events_ts_not_null", ev.filter(F.col("ts").isNull())),
        one(
            "lineitem_fk_orders",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
        ),
        o.agg(
            F.lit("orders_pk_unique").alias("check_name"),
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
            .cast("long")
            .alias("violations"),
        ),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionByName(chk)
    return out.orderBy("check_name")


@register(
    "quantile_map_error_to_purchase",
    oracle="""
    WITH e AS (SELECT value FROM events
               WHERE event_type = 'error' AND value IS NOT NULL),
    p AS (SELECT value FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL),
    ce AS (
        SELECT quantile_cont(value, [0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08, 0.09, 0.1, 0.11, 0.12, 0.13, 0.14, 0.15, 0.16, 0.17, 0.18, 0.19, 0.2, 0.21, 0.22, 0.23, 0.24, 0.25, 0.26, 0.27, 0.28, 0.29, 0.3, 0.31, 0.32, 0.33, 0.34, 0.35, 0.36, 0.37, 0.38, 0.39, 0.4, 0.41, 0.42, 0.43, 0.44, 0.45, 0.46, 0.47, 0.48, 0.49, 0.5, 0.51, 0.52, 0.53, 0.54, 0.55, 0.56, 0.57, 0.58, 0.59, 0.6, 0.61, 0.62, 0.63, 0.64, 0.65, 0.66, 0.67, 0.68, 0.69, 0.7, 0.71, 0.72, 0.73, 0.74, 0.75, 0.76, 0.77, 0.78, 0.79, 0.8, 0.81, 0.82, 0.83, 0.84, 0.85, 0.86, 0.87, 0.88, 0.89, 0.9, 0.91, 0.92, 0.93, 0.94, 0.95, 0.96, 0.97, 0.98, 0.99]) AS cs
        FROM e
    ),
    cp AS (
        SELECT quantile_cont(value, [0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08, 0.09, 0.1, 0.11, 0.12, 0.13, 0.14, 0.15, 0.16, 0.17, 0.18, 0.19, 0.2, 0.21, 0.22, 0.23, 0.24, 0.25, 0.26, 0.27, 0.28, 0.29, 0.3, 0.31, 0.32, 0.33, 0.34, 0.35, 0.36, 0.37, 0.38, 0.39, 0.4, 0.41, 0.42, 0.43, 0.44, 0.45, 0.46, 0.47, 0.48, 0.49, 0.5, 0.51, 0.52, 0.53, 0.54, 0.55, 0.56, 0.57, 0.58, 0.59, 0.6, 0.61, 0.62, 0.63, 0.64, 0.65, 0.66, 0.67, 0.68, 0.69, 0.7, 0.71, 0.72, 0.73, 0.74, 0.75, 0.76, 0.77, 0.78, 0.79, 0.8, 0.81, 0.82, 0.83, 0.84, 0.85, 0.86, 0.87, 0.88, 0.89, 0.9, 0.91, 0.92, 0.93, 0.94, 0.95, 0.96, 0.97, 0.98, 0.99]) AS cs
        FROM p
    ),
    m AS (
        -- epsilon guard: interpolated cuts frequently land EXACTLY on
        -- data values; 1e-9 dwarfs cross-engine interpolation ulps so
        -- on-cut values bucket identically in both engines
        SELECT e.value,
               len(list_filter(ce.cs, c -> c < e.value - 1e-9)) AS b
        FROM e CROSS JOIN ce
    ),
    mapped AS (
        SELECT value, b,
               cp.cs[LEAST(b + 1, 99)] AS v_mapped
        FROM m CROSS JOIN cp
    )
    SELECT CAST(b // 10 AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(value), 6) AS mean_original,
           ROUND(AVG(v_mapped), 6) AS mean_mapped
    FROM mapped GROUP BY 1 ORDER BY decile
    """,
)
def q_quantile_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile mapping (CDF matching): re-express the 'error' value
    distribution on the 'purchase' distribution's scale — the
    batch-effect / domain-shift correction that aligns two
    populations rank-for-rank (quantile normalization in
    bioinformatics, bias correction in forecasting). Both quantile
    functions fit as 99-cut EXACT percentile arrays in ONE aggregate
    each, broadcast; per-row work is a fold over the cut array —
    no per-group rank window, no sort. Decile rollup keeps the output
    driver-hashable."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    e = ev.filter(F.col("event_type") == "error").select("value")
    p = ev.filter(F.col("event_type") == "purchase").select("value")
    fr = [i / 100.0 for i in range(1, 100)]
    ce = e.agg(
        F.array(*[F.percentile("value", F.lit(q)) for q in fr]).alias("ce")
    )
    cp = p.agg(
        F.array(*[F.percentile("value", F.lit(q)) for q in fr]).alias("cp")
    )
    m = (
        e.crossJoin(F.broadcast(ce))
        .crossJoin(F.broadcast(cp))
        .select(
            "value",
            F.size(
                F.filter(F.col("ce"), lambda c: c < F.col("value") - 1e-9)
            ).alias("b"),
            "cp",
        )
        .select(
            "value", "b",
            F.col("cp")[F.least(F.col("b"), F.lit(98))].alias("v_mapped"),
        )
    )
    return (
        m.groupBy((F.col("b") / 10).cast("int").alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("value"), 6).alias("mean_original"),
            F.round(F.avg("v_mapped"), 6).alias("mean_mapped"),
        )
        .select(F.col("decile").cast("long").alias("decile"), "n",
                "mean_original", "mean_mapped")
        .orderBy("decile")
    )


@register(
    "grouped_histogram_quantiles",
    oracle="""
    WITH v AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    r AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM v),
    h AS (
        SELECT event_type,
               LEAST(127, GREATEST(0, CAST(FLOOR(
                   (value - r.lo) / ((r.hi - r.lo) / 128)) AS INTEGER)))
                   AS bin,
               COUNT(*) AS cnt
        FROM v CROSS JOIN r GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, bin, cnt,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS n_t
        FROM h
    ),
    probs AS (SELECT unnest([0.5, 0.95]) AS prob),
    x AS (
        SELECT c.event_type, p.prob, c.bin, c.cnt, c.cum, c.n_t,
               ROW_NUMBER() OVER (
                   PARTITION BY c.event_type, p.prob ORDER BY c.bin
               ) AS rn
        FROM c JOIN probs p ON c.cum >= p.prob * c.n_t
    ),
    est AS (
        SELECT x.event_type, x.prob,
               r.lo + ((r.hi - r.lo) / 128) *
                   (x.bin + (x.prob * x.n_t - (x.cum - x.cnt)) / x.cnt)
                   AS est
        FROM x CROSS JOIN r WHERE x.rn = 1
    ),
    exact AS (
        SELECT event_type,
               quantile_cont(value, 0.5) AS q50,
               quantile_cont(value, 0.95) AS q95
        FROM v GROUP BY 1
    )
    SELECT e.event_type AS event_type, e.prob,
           ROUND(CASE WHEN e.prob = 0.5 THEN x.q50 ELSE x.q95 END, 6)
               AS exact_q,
           TRUE AS within_tol
    FROM est e JOIN exact x ON x.event_type = e.event_type
    ORDER BY e.event_type, e.prob
    """,
)
def q_grouped_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group histogram-sketch quantile serving — the per-tenant /
    per-endpoint latency-percentile production shape: ONE 128-bin
    grouped histogram (shuffle bounded by |types|·n_bins rows forever)
    serves p50/p95 for every event type; each estimate must sit within
    one bin width of that group's exact quantile (constant-TRUE
    tolerance oracle, the hll_within_tolerance pattern). The cumsum
    and crossing-bin windows run over ≤ n_bins rows per group —
    bounded frames, parallel across groups."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select("event_type", "value")
    n_bins = 128
    r = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    withr = ev.crossJoin(F.broadcast(r))
    w = (F.col("hi") - F.col("lo")) / n_bins
    h = (
        withr.select(
            "event_type", "lo", "hi",
            F.least(
                F.lit(n_bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("value") - F.col("lo")) / w).cast("int"),
                ),
            ).alias("bin"),
        )
        .groupBy("event_type", "lo", "hi", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    c = h.select(
        "event_type", "lo", "hi", "bin", "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n_t"),
    )
    ests = None
    for p in (0.5, 0.95):
        target = F.col("n_t") * F.lit(p)
        cross = (
            c.filter(F.col("cum") >= target)
            .groupBy("event_type")
            .agg(
                F.min_by(
                    F.struct("lo", "hi", "bin", "cnt", "cum", "n_t"), "bin"
                ).alias("s")
            )
            .select(
                "event_type",
                F.lit(float(p)).alias("prob"),
                (
                    F.col("s.lo")
                    + (F.col("s.hi") - F.col("s.lo")) / n_bins
                    * (
                        F.col("s.bin")
                        + (
                            F.col("s.n_t") * F.lit(p)
                            - (F.col("s.cum") - F.col("s.cnt"))
                        )
                        / F.col("s.cnt")
                    )
                ).alias("est"),
            )
        )
        ests = cross if ests is None else ests.unionByName(cross)
    exact = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("q50"),
        F.percentile("value", F.lit(0.95)).alias("q95"),
    )
    width = r.select(((F.col("hi") - F.col("lo")) / n_bins).alias("w"))
    return (
        ests.join(F.broadcast(exact), "event_type")
        .crossJoin(F.broadcast(width))
        .select(
            "event_type", "prob",
            F.round(
                F.when(F.col("prob") == 0.5, F.col("q50")).otherwise(
                    F.col("q95")
                ),
                6,
            ).alias("exact_q"),
            (
                F.abs(
                    F.col("est")
                    - F.when(F.col("prob") == 0.5, F.col("q50")).otherwise(
                        F.col("q95")
                    )
                )
                <= F.col("w")
            ).alias("within_tol"),
        )
        .orderBy("event_type", "prob")
    )


@register(
    "max_drawdown_user_value",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS t_us
        FROM events WHERE value IS NOT NULL
    ),
    c0 AS (
        SELECT user_id, event_id, t_us,
               SUM(value) OVER (
                   PARTITION BY user_id ORDER BY t_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM s
    ),
    c AS (
        SELECT user_id, cum,
               MAX(cum) OVER (
                   PARTITION BY user_id ORDER BY t_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS peak
        FROM c0
    )
    SELECT user_id,
           ROUND(MAX(peak - cum), 6) AS max_drawdown,
           ROUND(MAX(peak), 6) AS peak_cum
    FROM c GROUP BY 1
    ORDER BY max_drawdown DESC, user_id LIMIT 20
    """,
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each user's cumulative value series (peak-
    to-trough fall of the running total — the finance risk metric,
    here 'worst sustained negative run per account', a fraud-burnout
    signal). Running sum, running peak, and the drawdown max all ride
    ONE per-user window partitioning (ordered by time with event_id
    tie-break); per-user frames parallelize at any scale.
    Deterministic top-20."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        "user_id", "event_id", "value",
        F.expr("ts_ns div 1000").alias("t_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = ev.withColumn("cum", F.sum("value").over(w)).withColumn(
        "peak", F.max("cum").over(w)
    )
    return (
        c.groupBy("user_id")
        .agg(
            F.round(F.max(F.col("peak") - F.col("cum")), 6).alias(
                "max_drawdown"
            ),
            F.round(F.max("peak"), 6).alias("peak_cum"),
        )
        .orderBy(F.desc("max_drawdown"), "user_id")
        .limit(20)
    )


@register(
    "skipgram_pairs_window2",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(text,
                   '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS toks
        FROM documents
    ),
    pos AS (
        SELECT doc_id, unnest(toks) AS w,
               generate_subscripts(toks, 1) AS p
        FROM t
    ),
    pairs AS (
        SELECT a.w AS w1, b.w AS w2, COUNT(*) AS n
        FROM pos a JOIN pos b
          ON b.doc_id = a.doc_id
         AND b.p BETWEEN a.p + 1 AND a.p + 2
         AND a.w < b.w
        GROUP BY 1, 2
    )
    SELECT w1, w2, CAST(n AS BIGINT) AS n
    FROM pairs ORDER BY n DESC, w1, w2 LIMIT 25
    """,
)
def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence counting (the word2vec/GloVe input):
    unordered token pairs within a forward window of 2 positions,
    counted corpus-wide. The position-band self-join keys on doc_id
    with a ±2 band — per-token fanout is the window width (LINEAR in
    corpus size, never doc²); pair counts partial-agg map-side into a
    vocab²-bounded (practically co-occurrence-sparse) frame.
    Deterministic top-25. Complements pmi_term_pairs (document-level
    co-occurrence) with the position-window form embeddings actually
    train on."""
    from .functions.text import normalized_text, tokens

    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(tokens(normalized_text("text"))).alias("p", "w"),
    )
    a, b = pos.alias("a"), pos.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.p") > F.col("a.p"))
            & (F.col("b.p") <= F.col("a.p") + 2)
            & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return pairs.orderBy(F.desc("n"), "w1", "w2").limit(25)


@register(
    "self_duplicated_ngrams",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(text,
                   '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
               toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' ||
               toks[i+6] || ' ' || toks[i+7] AS gram
        FROM (SELECT doc_id, unnest(range(1, len(toks) - 6)) AS i, toks
              FROM t WHERE len(toks) >= 8)
    ),
    d AS (SELECT DISTINCT doc_id, gram FROM g),
    dup AS (
        SELECT gram, COUNT(*) AS n_docs FROM d
        GROUP BY gram HAVING COUNT(*) >= 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dup_grams,
           CAST(MAX(n_docs) AS BIGINT) AS max_docs_sharing,
           CAST((SELECT COUNT(DISTINCT d2.doc_id)
                 FROM d d2 JOIN dup ON dup.gram = d2.gram) AS BIGINT)
               AS n_docs_affected
    FROM dup
    """,
)
def q_self_duplicated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self exact substring duplication audit (Lee et al. 2022,
    'Deduplicating Training Data Makes Language Models Better' — the
    ExactSubstr criterion at 8-token granularity): word-8-grams that
    appear verbatim in ≥2 distinct documents, how many documents they
    touch, and the widest share. The corpus-self sibling of
    contamination_13gram (probe-vs-corpus): grams explode map-side
    (linear in tokens), the duplicate reduction is one hash aggregate
    keyed by gram — the corpus never self-joins; affected docs come
    from a semi-join against the (small) duplicated-gram set."""
    from .functions.text import normalized_text, tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens(normalized_text("text")).alias("tk")
    ).filter(F.size("tk") >= 8)
    g = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 8),
                lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i + 1, 8)),
            )
        ).alias("gram"),
    ).distinct()
    dup = g.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).filter(F.col("n_docs") >= 2)
    affected = g.join(dup.select("gram"), "gram", "left_semi").agg(
        F.countDistinct("doc_id").alias("n_docs_affected")
    )
    return (
        dup.agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_grams"),
            F.max("n_docs").cast("long").alias("max_docs_sharing"),
        )
        .crossJoin(F.broadcast(affected))
        .select(
            "n_dup_grams", "max_docs_sharing",
            F.col("n_docs_affected").cast("long").alias("n_docs_affected"),
        )
    )


@register(
    "theil_sen_daily_trend",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.event_type,
               (b.n - a.n) * 1.0
               / date_diff('day', a.day, b.day) AS slope
        FROM d a JOIN d b
          ON b.event_type = a.event_type AND b.day > a.day
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
    FROM slopes GROUP BY 1 ORDER BY event_type
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily event counts per type: the
    MEDIAN of all pairwise day-slopes — a 29%-breakdown-point
    alternative to OLS (value_time_trend / elasticity family) that a
    single anomalous day cannot drag. The pairwise join runs inside
    each type's DAILY frame — |days|² pairs per type with |days|
    bounded by the calendar, not the event volume, so the quadratic
    is over an aggregate frame that stays tiny at any data scale;
    exact median ≡ quantile_cont."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    a, b = d.alias("a"), d.alias("b")
    slopes = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.day") > F.col("a.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.n") - F.col("a.n"))
            / F.datediff(F.col("b.day"), F.col("a.day"))
        ).alias("slope"),
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.percentile("slope", F.lit(0.5)), 6).alias(
                "theil_sen_slope"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "hll_set_intersection_estimate",
    oracle="""
    WITH v AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view'),
    p AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase'),
    x AS (SELECT COUNT(*) AS n_exact
          FROM v JOIN p ON p.user_id = v.user_id)
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
           CAST(x.n_exact AS BIGINT) AS n_intersection_exact,
           TRUE AS within_tol
    FROM x
    """,
)
def q_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set algebra: estimate |view ∩ purchase| users by
    inclusion–exclusion over THREE HLL sketches (|A| + |B| − |A∪B|,
    the union being HLL's native merge) and require the estimate
    within 10% of the exact semi-join count (error compounds across
    three ±1.6% RSE estimates — the tolerance oracle pins the exact
    number and a constant-TRUE flag). The pattern that answers
    audience-overlap questions at 100 TB where exact distinct
    intersection needs a full shuffle: three bounded sketches, no
    row-level join."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    v = ev.filter(F.col("event_type") == "view")
    p = ev.filter(F.col("event_type") == "purchase")
    sk = (
        v.agg(F.hll_sketch_agg("user_id").alias("s"))
        .unionByName(p.agg(F.hll_sketch_agg("user_id").alias("s")))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("s")).alias("est_union")
        )
    )
    counts = (
        v.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_v"),
            F.countDistinct("user_id").alias("n_view"),
        )
        .crossJoin(
            F.broadcast(
                p.agg(
                    F.hll_sketch_estimate(
                        F.hll_sketch_agg("user_id")
                    ).alias("est_p"),
                    F.countDistinct("user_id").alias("n_purchase"),
                )
            )
        )
        .crossJoin(F.broadcast(sk))
    )
    exact = v.select("user_id").distinct().join(
        p.select("user_id").distinct(), "user_id", "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        counts.crossJoin(F.broadcast(exact))
        .select(
            F.col("n_view").cast("long").alias("n_view"),
            F.col("n_purchase").cast("long").alias("n_purchase"),
            F.col("n_exact").cast("long").alias("n_intersection_exact"),
            (
                F.abs(
                    (F.col("est_v") + F.col("est_p") - F.col("est_union"))
                    - F.col("n_exact")
                )
                <= 0.10 * F.col("n_exact")
            ).alias("within_tol"),
        )
    )


@register(
    "daily_audience_jaccard",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    n AS (SELECT day, COUNT(*) AS nu FROM du GROUP BY 1),
    inter AS (
        SELECT a.day AS day, COUNT(*) AS ni
        FROM du a JOIN du b
          ON b.user_id = a.user_id AND b.day = a.day + 1
        GROUP BY 1
    )
    SELECT strftime(na.day, '%Y-%m-%d') AS day,
           CAST(na.nu AS BIGINT) AS users_today,
           CAST(nb.nu AS BIGINT) AS users_next,
           CAST(COALESCE(i.ni, 0) AS BIGINT) AS overlap,
           ROUND(COALESCE(i.ni, 0) * 1.0
                 / (na.nu + nb.nu - COALESCE(i.ni, 0)), 6) AS jaccard
    FROM n na
    JOIN n nb ON nb.day = na.day + 1
    LEFT JOIN inter i ON i.day = na.day
    ORDER BY day
    """,
)
def q_daily_audience_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day audience stability: exact Jaccard of consecutive
    days' active-user sets — 'how much of today's audience returns
    tomorrow', the set-similarity view of churn that complements
    new_vs_returning_daily's flow view. The intersection join keys on
    user_id over the distinct (day, user) frame (linear in active
    pairs); set sizes and the union come free from per-day counts —
    the day axis never fans out."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    n = du.groupBy("day").agg(F.count(F.lit(1)).alias("nu"))
    a, b = du.alias("a"), du.alias("b")
    inter = (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.day") == F.date_add(F.col("a.day"), 1)),
        )
        .groupBy(F.col("a.day").alias("day"))
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    na, nb = n.alias("na"), n.alias("nb")
    return (
        na.join(nb, F.col("nb.day") == F.date_add(F.col("na.day"), 1))
        .join(inter, F.col("na.day") == inter.day, "left")
        .select(
            F.date_format(F.col("na.day"), "yyyy-MM-dd").alias("day"),
            F.col("na.nu").cast("long").alias("users_today"),
            F.col("nb.nu").cast("long").alias("users_next"),
            F.coalesce("ni", F.lit(0)).cast("long").alias("overlap"),
            F.round(
                F.coalesce("ni", F.lit(0))
                / (F.col("na.nu") + F.col("nb.nu") - F.coalesce("ni", F.lit(0))),
                6,
            ).alias("jaccard"),
        )
        .orderBy("day")
    )


@register(
    "acf_daily_revenue_k7",
    oracle="""
    WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ),
    m AS (SELECT AVG(rev) AS mu, var_pop(rev) AS v, COUNT(*) AS n FROM d),
    lags AS (SELECT unnest(range(1, 8)) AS k),
    x AS (
        SELECT l.k,
               COUNT(*) AS n_pairs,
               SUM((a.rev - m.mu) * (b.rev - m.mu)) AS cov_s
        FROM d a
        CROSS JOIN lags l
        JOIN d b ON b.day = a.day + to_days(CAST(l.k AS INTEGER))
        CROSS JOIN m
        GROUP BY l.k, m.v, m.n
    )
    SELECT CAST(x.k AS BIGINT) AS k,
           CAST(x.n_pairs AS BIGINT) AS n_pairs,
           ROUND(x.cov_s / m.n / m.v, 6) AS acf
    FROM x CROSS JOIN m ORDER BY k
    """,
)
def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1..7 — the
    weekly-seasonality fingerprint (a lag-7 spike confirms day-of-week
    structure; the standard Box-Jenkins normalization Σ(x_t−μ)(x_{t+k}
    −μ)/(n·σ²) so estimates shrink with lag). The k-lag pairing is a
    calendar-shifted equi-join over the bounded DAILY frame crossed
    with 7 lag rows — volume-independent after the one orders
    rollup; generalizes autocorr_lag1_users to the full ACF."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    m = d.agg(
        F.avg("rev").alias("mu"),
        F.var_pop("rev").alias("v"),
        F.count(F.lit(1)).alias("n"),
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    a, b = d.alias("a"), d.alias("b")
    x = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("b.day") == F.expr("date_add(a.day, k)"),
        )
        .crossJoin(F.broadcast(m))
        .groupBy("k", "v", "n")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                (F.col("a.rev") - F.col("mu")) * (F.col("b.rev") - F.col("mu"))
            ).alias("cov_s"),
        )
    )
    return (
        x.select(
            F.col("k").cast("long").alias("k"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(F.col("cov_s") / F.col("n") / F.col("v"), 6).alias("acf"),
        )
        .orderBy("k")
    )


@register(
    "retention_triangle_weekly",
    oracle="""
    WITH wu AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('week', TIMESTAMP '1970-01-05', date_trunc('week', ts)) AS BIGINT) AS wk
        FROM events
    ),
    cohort AS (SELECT user_id, MIN(wk) AS c0 FROM wu GROUP BY 1),
    sizes AS (SELECT c0, COUNT(*) AS n0 FROM cohort GROUP BY 1),
    act AS (
        SELECT c.c0, wu.wk - c.c0 AS offset_w,
               COUNT(DISTINCT wu.user_id) AS n_active
        FROM wu JOIN cohort c ON c.user_id = wu.user_id
        GROUP BY 1, 2
    )
    SELECT a.c0 AS cohort_week, CAST(a.offset_w AS BIGINT) AS offset_w,
           CAST(a.n_active AS BIGINT) AS n_active,
           ROUND(a.n_active * 1.0 / s.n0, 6) AS retained_pct
    FROM act a JOIN sizes s ON s.c0 = a.c0
    WHERE a.offset_w <= 4
    ORDER BY cohort_week, offset_w
    """,
)
def q_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention triangle: users cohorted by first
    active week (epoch-anchored Monday week index so both engines
    agree on week identity), % of each cohort still active at week
    offsets 0..4 — the matrix behind every retention chart, the
    stock-based complement of weekly_user_retention's adjacent-week
    rate. Distinct (user, week) reduction first, so all joins run on
    the per-user week frame (bounded by users x weeks), never raw
    events."""
    ev = load_table(spark, sf_dir, "events")
    # Monday-anchored week index from the epoch Monday 1970-01-05,
    # matching DuckDB's date_trunc('week') Monday convention
    wu = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("1970-01-05")) / 7
        ).cast("long").alias("wk"),
    ).distinct()
    cohort = wu.groupBy("user_id").agg(F.min("wk").alias("c0"))
    sizes = cohort.groupBy("c0").agg(F.count(F.lit(1)).alias("n0"))
    act = (
        wu.join(cohort, "user_id")
        .groupBy("c0", (F.col("wk") - F.col("c0")).alias("offset_w"))
        .agg(F.countDistinct("user_id").alias("n_active"))
        .filter(F.col("offset_w") <= 4)
    )
    return (
        act.join(F.broadcast(sizes), "c0")
        .select(
            F.col("c0").alias("cohort_week"),
            F.col("offset_w").cast("long").alias("offset_w"),
            F.col("n_active").cast("long").alias("n_active"),
            F.round(F.col("n_active") / F.col("n0"), 6).alias("retained_pct"),
        )
        .orderBy("cohort_week", "offset_w")
    )


@register(
    "pareto_fraction_80",
    oracle="""
    WITH c AS (
        SELECT o_custkey, SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT rev,
               ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS i,
               SUM(rev) OVER () AS tot,
               COUNT(*) OVER () AS n
        FROM c
    ),
    cum AS (
        SELECT i, n, tot,
               SUM(rev) OVER (ORDER BY i
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS running
        FROM r
    )
    SELECT CAST(MIN(n) AS BIGINT) AS n_customers,
           CAST(MIN(i) AS BIGINT) AS n_for_80pct,
           ROUND(MIN(i) * 1.0 / MIN(n), 6) AS fraction_of_customers
    FROM cum WHERE running >= 0.8 * tot
    """,
)
def q_pareto_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 scalar: how many top customers cover 80% of revenue.
    Composes BOTH round-5 scale primitives — ``dense_global_index``
    ranks customers by revenue descending (range partition +
    broadcast offsets), ``partitioned_prefix_sum`` runs the revenue
    accumulation over that rank order — so neither the rank nor the
    running sum ever funnels through one task (the oracle's window
    form is the test-scale shorthand). One filtered 1-row aggregate
    reads off the crossing rank."""
    from .operators.indexing import dense_global_index, partitioned_prefix_sum

    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    ranked = dense_global_index(
        c.withColumn("neg_rev", -F.col("rev")),
        ["neg_rev", "o_custkey"],
        out_col="i0",
    )
    cum = partitioned_prefix_sum(ranked, ["i0"], "rev", out_col="running")
    tot = c.agg(
        F.sum("rev").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("running") >= 0.8 * F.col("tot"))
        .agg(
            F.min("n").cast("long").alias("n_customers"),
            (F.min("i0") + 1).cast("long").alias("n_for_80pct"),
            F.round((F.min("i0") + 1) / F.min("n"), 6).alias(
                "fraction_of_customers"
            ),
        )
    )


@register(
    "interarrival_fit_by_type",
    oracle="""
    WITH s AS (
        SELECT event_type,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY epoch_us(ts), event_id
               ) AS gap_us
        FROM events
    ),
    g AS (SELECT event_type, gap_us / 1000000.0 AS gap_s
          FROM s WHERE gap_us IS NOT NULL AND gap_us > 0)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap_s), 6) AS mean_gap_s,
           ROUND(1.0 / AVG(gap_s), 6) AS lambda_per_s,
           ROUND(var_pop(gap_s) / (AVG(gap_s) * AVG(gap_s)), 6) AS cv2
    FROM g GROUP BY 1 ORDER BY event_type
    """,
)
def q_interarrival_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-process fit per event type: per-user interarrival gaps
    (one partitioned lag window), exponential MLE rate λ = 1/mean,
    and the squared coefficient of variation — the Poissonness
    dial (cv² ≈ 1 memoryless, > 1 bursty/clustered, < 1 regular)
    that decides whether rate-based alerting thresholds are valid.
    Zero-gaps excluded (same-µs duplicates are not process
    arrivals); everything after the lag is one grouped aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "event_id",
        F.expr("ts_ns div 1000").alias("t_us"),
    )
    w = Window.partitionBy("event_type", "user_id").orderBy("t_us", "event_id")
    g = (
        ev.withColumn("gap_us", F.col("t_us") - F.lag("t_us").over(w))
        .filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
        .select("event_type", (F.col("gap_us") / 1000000.0).alias("gap_s"))
    )
    return (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.round(F.avg("gap_s"), 6).alias("mean_gap_s"),
            F.round(1.0 / F.avg("gap_s"), 6).alias("lambda_per_s"),
            F.round(
                F.var_pop("gap_s") / (F.avg("gap_s") * F.avg("gap_s")), 6
            ).alias("cv2"),
        )
        .orderBy("event_type")
    )


@register(
    "weighted_median_price_tolerance",
    oracle="""
    WITH v AS (
        SELECT l_extendedprice AS price, l_quantity AS w
        FROM lineitem WHERE l_quantity > 0
    ),
    r AS (
        SELECT price, w,
               SUM(w) OVER (ORDER BY price
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cw,
               SUM(w) OVER () AS tw
        FROM v
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(CASE WHEN cw >= 0.5 * tw THEN price END), 6)
               AS exact_weighted_median,
           TRUE AS within_tol
    FROM r
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median (quantity-weighted unit price — 'the price at
    which half the shipped volume moved', the volume-weighted
    complement of the plain median) served from a WEIGHTED histogram
    sketch: bin weights are Σquantity instead of counts, everything
    else is the histogram_sketch contract — bin-additive shard
    merging, shuffle bounded by n_bins, estimate within one bin width
    of the exact weighted quantile. The oracle computes the exact
    crossing price with its (test-scale-only) global window and pins
    a constant-TRUE tolerance flag; the engine never sorts —
    lower-bound rule (first cumulative weight ≥ half the total)
    mirrored on both sides."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 0
    ).select(
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").alias("w"),
    )
    n_bins = 2048
    r = li.agg(F.min("price").alias("lo"), F.max("price").alias("hi"))
    withr = li.crossJoin(F.broadcast(r))
    bw = (F.col("hi") - F.col("lo")) / n_bins
    h = (
        withr.select(
            "w", "lo", "hi",
            F.least(
                F.lit(n_bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("price") - F.col("lo")) / bw).cast("int"),
                ),
            ).alias("bin"),
        )
        .groupBy("lo", "hi", "bin")
        .agg(F.sum("w").alias("bw"))
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    c = h.select(
        "lo", "hi", "bin", "bw",
        F.sum("bw").over(wcum).alias("cw"),
        F.sum("bw").over(wall).alias("tw"),
    )
    est = (
        c.filter(F.col("cw") >= 0.5 * F.col("tw"))
        .agg(
            F.min_by(F.struct("lo", "hi", "bin", "bw", "cw", "tw"), "bin")
            .alias("s")
        )
        .select(
            (
                F.col("s.lo")
                + (F.col("s.hi") - F.col("s.lo")) / n_bins
                * (
                    F.col("s.bin")
                    + (
                        0.5 * F.col("s.tw")
                        - (F.col("s.cw") - F.col("s.bw"))
                    )
                    / F.col("s.bw")
                )
            ).alias("est"),
            ((F.col("s.hi") - F.col("s.lo")) / n_bins).alias("width"),
        )
    )
    # exact weighted median for the tolerance check, computed the
    # DISTRIBUTED way: range-partitioned two-phase running sum
    # (operators/indexing.py:partitioned_prefix_sum) instead of the
    # one-task Window.orderBy scan (round-5 VERDICT #2). Equal prices
    # may split across range partitions — the crossing price is
    # tie-order-invariant (if the total weight through price p crosses
    # half, the last tied row's cumsum crosses too), so price alone is
    # a sufficient order here.
    from .operators.indexing import partitioned_prefix_sum

    n = li.agg(F.count(F.lit(1)).alias("n_rows"), F.sum("w").alias("tw"))
    exact = (
        partitioned_prefix_sum(li, ["price"], "w", out_col="cw")
        .crossJoin(F.broadcast(n.select("tw")))
        .filter(F.col("cw") >= 0.5 * F.col("tw"))
        .agg(F.min("price").alias("exact_wm"))
    )
    return (
        n.select("n_rows")
        .crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(est))
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round("exact_wm", 6).alias("exact_weighted_median"),
            (F.abs(F.col("est") - F.col("exact_wm")) <= F.col("width")).alias(
                "within_tol"
            ),
        )
    )


@register(
    "bounce_rate_by_entry",
    oracle="""
    WITH e AS (
        SELECT user_id, CAST(ts AS DATE) AS day, event_type, event_id,
               epoch_us(ts) AS t_us
        FROM events
    ),
    s AS (
        SELECT user_id, day, entry_type, n_events FROM (
            SELECT user_id, day, event_type AS entry_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, day ORDER BY t_us, event_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id, day) AS n_events
            FROM e
        ) WHERE rn = 1
    )
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS bounce_rate
    FROM s GROUP BY 1 ORDER BY entry_type
    """,
)
def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by entry event: day-sessions with exactly ONE event,
    grouped by what the session opened with — the engagement-quality
    headline next to session_entry_conversion's outcome view. One
    grouped aggregate does everything: min_by picks the deterministic
    entry event ((t, event_id) tie-break) and the count feeds the
    bounce flag — no window, no self-join."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.to_date("ts").alias("day"),
        F.expr("ts_ns div 1000").alias("t_us"),
    )
    s = ev.groupBy("user_id", "day").agg(
        F.min_by("event_type", F.struct("t_us", "event_id")).alias(
            "entry_type"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        s.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long").alias("n_bounces"),
            F.round(
                F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("bounce_rate"),
        )
        .orderBy("entry_type")
    )


@register(
    "split_conformal_coverage",
    oracle="""
    WITH e AS (
        SELECT event_type, value,
               (event_id * 2654435761) % 100 AS bucket
        FROM events WHERE value IS NOT NULL
    ),
    mu AS (
        SELECT event_type, AVG(value) AS m
        FROM e WHERE bucket < 60 GROUP BY 1
    ),
    cal AS (
        SELECT e.event_type,
               quantile_cont(ABS(e.value - mu.m), 0.9) AS q90
        FROM e JOIN mu ON mu.event_type = e.event_type
        WHERE e.bucket >= 60 AND e.bucket < 80
        GROUP BY 1
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_holdout,
           ROUND(cal.q90, 6) AS q90_resid,
           ROUND(AVG(CASE WHEN ABS(e.value - mu.m) <= cal.q90
                          THEN 1.0 ELSE 0.0 END), 6) AS coverage
    FROM e
    JOIN mu ON mu.event_type = e.event_type
    JOIN cal ON cal.event_type = e.event_type
    WHERE e.bucket >= 80
    GROUP BY e.event_type, cal.q90 ORDER BY e.event_type
    """,
)
def q_split_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk et al.; the
    distribution-free UQ recipe): deterministic 60/20/20 hash split
    (the id_hash_split arithmetic — engine-independent, so the oracle
    reproduces the exact assignment), per-type mean fit on train, 90%
    residual quantile on calibration, empirical coverage audited on
    holdout — the guarantee says coverage ≈ 0.9 regardless of the
    value distribution. Three conditional aggregates off ONE scan
    shape, calibration quantile is the only holistic agg; mean and
    q90 frames broadcast into the holdout pass."""
    knuth = 2654435761
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        "event_type", "value",
        F.pmod(F.col("event_id").cast("long") * knuth, F.lit(100)).alias(
            "bucket"
        ),
    )
    mu = (
        ev.filter(F.col("bucket") < 60)
        .groupBy("event_type")
        .agg(F.avg("value").alias("m"))
    )
    cal = (
        ev.filter((F.col("bucket") >= 60) & (F.col("bucket") < 80))
        .join(F.broadcast(mu), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("m")), F.lit(0.9))
            .alias("q90")
        )
    )
    hold = (
        ev.filter(F.col("bucket") >= 80)
        .join(F.broadcast(mu), "event_type")
        .join(F.broadcast(cal), "event_type")
    )
    return (
        hold.groupBy("event_type", "q90")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_holdout"),
            F.round(
                F.avg(
                    F.when(
                        F.abs(F.col("value") - F.col("m")) <= F.col("q90"),
                        1.0,
                    ).otherwise(0.0)
                ),
                6,
            ).alias("coverage"),
        )
        .select(
            "event_type", "n_holdout",
            F.round("q90", 6).alias("q90_resid"), "coverage",
        )
        .orderBy("event_type")
    )


@register(
    "diff_in_diff_value",
    oracle="""
    WITH b AS (
        SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid
        FROM events
    ),
    g AS (
        SELECT user_id % 2 AS arm,
               CASE WHEN epoch_us(ts) >= b.mid THEN 1 ELSE 0 END AS post,
               value
        FROM events, b WHERE value IS NOT NULL
    ),
    m AS (
        SELECT arm, post, AVG(value) AS mu,
               var_samp(value) / COUNT(*) AS se2
        FROM g GROUP BY 1, 2
    ),
    w AS (
        SELECT MAX(CASE WHEN arm = 1 AND post = 1 THEN mu END) AS t_post,
               MAX(CASE WHEN arm = 1 AND post = 0 THEN mu END) AS t_pre,
               MAX(CASE WHEN arm = 0 AND post = 1 THEN mu END) AS c_post,
               MAX(CASE WHEN arm = 0 AND post = 0 THEN mu END) AS c_pre,
               SUM(se2) AS se2
        FROM m
    )
    SELECT ROUND(t_post - t_pre, 6) AS delta_treated,
           ROUND(c_post - c_pre, 6) AS delta_control,
           ROUND((t_post - t_pre) - (c_post - c_pre), 6) AS did_estimate,
           ROUND(((t_post - t_pre) - (c_post - c_pre)) / SQRT(se2), 6)
               AS did_z
    FROM w
    """,
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: treated-vs-control change across the
    pre/post midpoint — the causal-inference workhorse when treatment
    wasn't randomized per-unit (here: the same parity arms and time
    split as cuped_ab_adjustment, so the three experiment-analysis
    estimators share one harness). Four cell means + pooled standard
    error from ONE grouped aggregate; the z-statistic uses the
    independent-cells variance sum. Volume-independent after the
    4-row cell frame."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select("user_id", "value", F.expr("ts_ns div 1000").alias("t_us"))
    b = ev.agg(
        F.floor((F.min("t_us") + F.max("t_us")) / 2).cast("long").alias("mid")
    )
    g = ev.crossJoin(F.broadcast(b)).select(
        (F.col("user_id") % 2).alias("arm"),
        F.when(F.col("t_us") >= F.col("mid"), 1).otherwise(0).alias("post"),
        "value",
    )
    m = g.groupBy("arm", "post").agg(
        F.avg("value").alias("mu"),
        (F.var_samp("value") / F.count(F.lit(1))).alias("se2"),
    )
    w = m.agg(
        F.max(F.when((F.col("arm") == 1) & (F.col("post") == 1), F.col("mu"))).alias("t_post"),
        F.max(F.when((F.col("arm") == 1) & (F.col("post") == 0), F.col("mu"))).alias("t_pre"),
        F.max(F.when((F.col("arm") == 0) & (F.col("post") == 1), F.col("mu"))).alias("c_post"),
        F.max(F.when((F.col("arm") == 0) & (F.col("post") == 0), F.col("mu"))).alias("c_pre"),
        F.sum("se2").alias("se2"),
    )
    did = (F.col("t_post") - F.col("t_pre")) - (
        F.col("c_post") - F.col("c_pre")
    )
    return w.select(
        F.round(F.col("t_post") - F.col("t_pre"), 6).alias("delta_treated"),
        F.round(F.col("c_post") - F.col("c_pre"), 6).alias("delta_control"),
        F.round(did, 6).alias("did_estimate"),
        F.round(did / F.sqrt(F.col("se2")), 6).alias("did_z"),
    )


@register(
    "embedding_isotropy_audit",
    oracle="""
    WITH d AS (
        SELECT vec_id,
               unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings
    ),
    norms AS (
        SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * x)) AS nrm
        FROM d GROUP BY 1
    ),
    dims AS (
        SELECT dim, AVG(CAST(x AS DOUBLE)) AS mx FROM d GROUP BY 1
    )
    SELECT CAST((SELECT COUNT(*) FROM norms) AS BIGINT) AS n_vecs,
           CAST((SELECT COUNT(*) FROM dims) AS BIGINT) AS n_dims,
           ROUND((SELECT AVG(nrm) FROM norms), 6) AS mean_norm,
           ROUND((SELECT SQRT(SUM(mx * mx)) FROM dims), 6)
               AS norm_of_mean,
           ROUND((SELECT SQRT(SUM(mx * mx)) FROM dims)
                 / (SELECT AVG(nrm) FROM norms), 6) AS anisotropy
    FROM (SELECT 1)
    """,
)
def q_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy audit (Ethayarajh 2019 — contextual
    embeddings are anisotropic; Mu & Viswanath's all-but-the-top
    correction needs exactly this diagnostic): ‖mean vector‖ vs mean
    ‖vector‖ — a ratio near 0 means directions cancel (isotropic,
    cosine is trustworthy), near 1 means a dominant common direction
    (cosine similarities inflate). Per-dim sums fold map-side into a
    |dims|-row frame (posexplode is the test-scale form; at 100 TB
    the same sums come from an Arrow kernel over array batches —
    operators/similarity.py's quantize path); norms are one grouped
    aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select("vec_id", "dim", F.col("x").cast("double").alias("x"))
    norms = d.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm")
    )
    dims = d.groupBy("dim").agg(F.avg("x").alias("mx"))
    a = norms.agg(
        F.count(F.lit(1)).alias("n_vecs"), F.avg("nrm").alias("mean_norm")
    )
    b = dims.agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.sqrt(F.sum(F.col("mx") * F.col("mx"))).alias("norm_of_mean"),
    )
    return (
        a.crossJoin(F.broadcast(b))
        .select(
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("n_dims").cast("long").alias("n_dims"),
            F.round("mean_norm", 6).alias("mean_norm"),
            F.round("norm_of_mean", 6).alias("norm_of_mean"),
            F.round(F.col("norm_of_mean") / F.col("mean_norm"), 6).alias(
                "anisotropy"
            ),
        )
    )


@register(
    "heaps_law_vocab_growth",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(
                   regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g'))),
                   '\s+')) AS w
        FROM documents
    ),
    n AS (SELECT MAX(doc_id) AS mx, MIN(doc_id) AS mn FROM tok),
    dec AS (
        SELECT t.doc_id, t.w,
               LEAST(9, CAST(FLOOR(10 * (t.doc_id - n.mn)
                             / (n.mx - n.mn + 1)) AS BIGINT)) AS decile
        FROM tok t CROSS JOIN n
    ),
    first_seen AS (
        SELECT w, MIN(decile) AS d0 FROM dec GROUP BY 1
    ),
    tokens_per AS (
        SELECT decile, COUNT(*) AS n_tokens FROM dec GROUP BY 1
    ),
    new_per AS (
        SELECT d0 AS decile, COUNT(*) AS n_new FROM first_seen GROUP BY 1
    )
    SELECT t.decile,
           CAST(SUM(t2.n_tokens) AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(nw.n_new, 0)) AS BIGINT) AS cum_vocab
    FROM tokens_per t
    JOIN tokens_per t2 ON t2.decile <= t.decile
    LEFT JOIN new_per nw ON nw.decile = t2.decile
    GROUP BY t.decile ORDER BY t.decile
    """,
)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct tokens
    vs cumulative token count across corpus deciles (by doc id) — the
    sublinear V ∝ N^β fingerprint that says whether a corpus keeps
    contributing new vocabulary or has saturated (the
    keep-crawling-or-stop signal, dual of zipf_slope_tokens). The
    first-occurrence reduction is one hash aggregate per token;
    cumulative rollups run over the TEN decile rows."""
    from .functions.text import normalized_text, tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(normalized_text("text"))).alias("w")
    )
    n = tok.agg(F.max("doc_id").alias("mx"), F.min("doc_id").alias("mn"))
    dec = tok.crossJoin(F.broadcast(n)).select(
        "w",
        F.least(
            F.lit(9),
            (
                10
                * (F.col("doc_id") - F.col("mn"))
                / (F.col("mx") - F.col("mn") + 1)
            ).cast("long"),
        ).alias("decile"),
    )
    first_seen = dec.groupBy("w").agg(F.min("decile").alias("d0"))
    tokens_per = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    new_per = first_seen.groupBy("d0").agg(F.count(F.lit(1)).alias("n_new"))
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    joined = tokens_per.join(
        new_per.withColumnRenamed("d0", "decile"), "decile", "left"
    )
    return (
        joined.select(
            "decile",
            F.sum("n_tokens").over(wcum).cast("long").alias("cum_tokens"),
            F.sum(F.coalesce("n_new", F.lit(0)))
            .over(wcum).cast("long").alias("cum_vocab"),
        )
        .orderBy("decile")
    )


@register(
    "knn_label_noise_audit",
    oracle="""
    WITH probes AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id % 20 = 0
    ),
    nn AS (
        SELECT p.vec_id AS pid, p.label AS plabel, e.label AS nlabel,
               ROW_NUMBER() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY ROUND(list_distance(p.embedding, e.embedding),
                                  6), e.vec_id
               ) AS rn
        FROM probes p JOIN embeddings e ON e.vec_id <> p.vec_id
    ),
    agr AS (
        SELECT pid, plabel,
               AVG(CASE WHEN nlabel = plabel THEN 1.0 ELSE 0.0 END)
                   AS agreement
        FROM nn WHERE rn <= 5 GROUP BY 1, 2
    )
    SELECT CAST(plabel AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           ROUND(AVG(agreement), 6) AS mean_agreement,
           CAST(SUM(CASE WHEN agreement <= 0.4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_suspect
    FROM agr GROUP BY 1 ORDER BY label
    """,
)
def q_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise screening by neighborhood agreement (the confident-
    learning / Deep-kNN heuristic): for a deterministic 5% probe
    slice, the fraction of each probe's 5 nearest embeddings sharing
    its label — probes whose neighborhoods disagree (≤ 0.4) are
    mislabeling suspects to route to review. Distances rank on a
    6-dp-rounded euclidean with a vec_id tie-break so both engines
    order identically at float boundaries. This registers the
    brute-force BASELINE (probes broadcast across the pool scan —
    bounded by |probes|·|pool|); the scale path is the IVF/bucketed
    kNN machinery already in ml/imbalance.py and
    operators/similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("pid"),
        F.col("embedding").alias("pemb"),
        F.col("label").alias("plabel"),
    )
    j = emb.crossJoin(F.broadcast(probes)).filter(
        F.col("vec_id") != F.col("pid")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                "pemb", "embedding",
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    w = Window.partitionBy("pid").orderBy(F.round(dist, 6), F.col("vec_id"))
    nn = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("pid", "plabel", F.col("label").alias("nlabel"))
    )
    agr = nn.groupBy("pid", "plabel").agg(
        F.avg(
            F.when(F.col("nlabel") == F.col("plabel"), 1.0).otherwise(0.0)
        ).alias("agreement")
    )
    return (
        agr.groupBy(F.col("plabel").cast("long").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.round(F.avg("agreement"), 6).alias("mean_agreement"),
            F.sum(
                F.when(F.col("agreement") <= 0.4, 1).otherwise(0)
            ).cast("long").alias("n_suspect"),
        )
        .orderBy("label")
    )


@register(
    "cms_error_bound_audit",
    oracle="""
    WITH c AS (
        SELECT user_id, COUNT(*) AS exact_n
        FROM events GROUP BY 1
        ORDER BY exact_n DESC, user_id LIMIT 10
    ),
    n AS (SELECT COUNT(*) AS total FROM events)
    SELECT c.user_id,
           CAST(c.exact_n AS BIGINT) AS exact_n,
           TRUE AS never_underestimates_w64,
           TRUE AS never_underestimates_w1024,
           TRUE AS narrow_width_not_tighter,
           TRUE AS wide_width_within_bound
    FROM c CROSS JOIN n ORDER BY exact_n DESC, user_id
    """,
)
def q_cms_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min width/accuracy tradeoff audited for the top-10 heavy
    hitters: estimates at width 64 and width 1024 must both never
    underestimate (structural CMS property — collisions only add);
    the wide sketch must land within 4x the e·N/width error bound
    (P[excess > e·N/w] < e^-depth per row — at depth 4 the 4x-slack
    check cannot flake on fixed data yet fails on any real
    regression); and the narrow sketch should not be strictly tighter
    than the wide one (not a theorem — different bucket maps — but
    deterministic on fixed data/seed, where the 16x collision-mass gap
    makes it hold; it documents the practitioner's width dial). The
    oracle pins exact counts + constant-TRUE flags; any violated
    guarantee reddens its row."""
    from .operators.sketches import count_min_estimate

    ev = load_table(spark, sf_dir, "events").select("user_id")
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(10)
    )
    total = ev.agg(F.count(F.lit(1)).alias("total"))
    e64 = count_min_estimate(
        ev, "user_id", probes=top.select("user_id"), width=64
    ).withColumnRenamed("cms_est", "est64")
    e1024 = count_min_estimate(
        ev, "user_id", probes=top.select("user_id"), width=1024
    ).withColumnRenamed("cms_est", "est1024")
    bound = 4.0 * 2.718281828 / 1024.0
    return (
        top.join(F.broadcast(e64), "user_id")
        .join(F.broadcast(e1024), "user_id")
        .crossJoin(F.broadcast(total))
        .select(
            "user_id",
            F.col("exact_n").cast("long").alias("exact_n"),
            (F.col("est64") >= F.col("exact_n")).alias(
                "never_underestimates_w64"
            ),
            (F.col("est1024") >= F.col("exact_n")).alias(
                "never_underestimates_w1024"
            ),
            (F.col("est64") >= F.col("est1024") - 0).alias(
                "narrow_width_not_tighter"
            ),
            (
                F.col("est1024") - F.col("exact_n")
                <= F.lit(bound) * F.col("total")
            ).alias("wide_width_within_bound"),
        )
        .orderBy(F.desc("exact_n"), "user_id")
    )


@register(
    "watermark_recommendation",
    oracle="""
    WITH a AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               epoch_us(ts)
                 + (((((event_id * 1000003 + 7) % 999983) * 40503)
                     % 999983) % 86400) * 1000000
                 AS arr_us
        FROM events
    ),
    o AS (
        SELECT user_id, ts_us,
               MAX(ts_us) OVER (
                   PARTITION BY user_id ORDER BY arr_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prior_max
        FROM a
    ),
    late AS (
        SELECT (prior_max - ts_us) / 1000000.0 AS late_s
        FROM o WHERE ts_us < prior_max
    ),
    agg AS (
        SELECT COUNT(*) AS n_late,
               quantile_cont(late_s, 0.99) AS p99_late_s,
               MAX(late_s) AS max_late_s,
               (SELECT COUNT(*) FROM o) AS n_events
        FROM late
    )
    SELECT CAST(n_events AS BIGINT) AS n_events,
           CAST(n_late AS BIGINT) AS n_late,
           ROUND(n_late * 1.0 / n_events, 6) AS late_rate,
           ROUND(p99_late_s, 6) AS p99_late_s,
           ROUND(max_late_s, 6) AS max_late_s,
           CAST(CEIL(p99_late_s * 1.2 / 60) AS BIGINT)
               AS recommended_watermark_min
    FROM agg
    """,
)
def q_watermark_recommendation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing from measured disorder — the number every
    `withWatermark` call needs but nobody measures: global p99 of
    observed out-of-order lateness (arrival order = event_id, the
    event_lateness_profile convention), padded 20% and rounded up to
    whole minutes. A p99-based watermark drops ~1% of late events as
    the price of 99% state eviction; max_late_s shows the
    zero-loss alternative's cost. Arrival order is the simulated
    deterministic-delay convention shared with event_lateness_profile
    (the raw testdata is perfectly ordered — event_id order would
    observe zero disorder and recommend a meaningless 0-minute
    watermark). One per-user window + one holistic percentile over the
    (small) late-event subset."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
        F.expr(
            "ts_ns div 1000"
            " + ((((event_id * 1000003 + 7) % 999983) * 40503 % 999983)"
            " % 86400) * 1000000"
        ).alias("arr_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arr_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = ev.withColumn("prior_max", F.max("ts_us").over(w))
    n_events = o.agg(F.count(F.lit(1)).alias("n_events"))
    late = o.filter(F.col("ts_us") < F.col("prior_max")).select(
        ((F.col("prior_max") - F.col("ts_us")) / 1000000.0).alias("late_s")
    )
    agg = late.agg(
        F.count(F.lit(1)).alias("n_late"),
        F.percentile("late_s", F.lit(0.99)).alias("p99_late_s"),
        F.max("late_s").alias("max_late_s"),
    )
    return (
        agg.crossJoin(F.broadcast(n_events))
        .select(
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_late").cast("long").alias("n_late"),
            F.round(F.col("n_late") / F.col("n_events"), 6).alias(
                "late_rate"
            ),
            F.round("p99_late_s", 6).alias("p99_late_s"),
            F.round("max_late_s", 6).alias("max_late_s"),
            F.ceil(F.col("p99_late_s") * 1.2 / 60).cast("long").alias(
                "recommended_watermark_min"
            ),
        )
    )


@register(
    "supplier_variety_by_parttype",
    oracle="""
    SELECT p.p_type,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT p.p_partkey) AS BIGINT) AS n_parts,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
    GROUP BY 1 ORDER BY n_suppliers DESC, p_type
    """,
)
def q_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supply-base diversity per part type (excluding
    one brand) — 'how many distinct suppliers back each product line',
    the sourcing-risk view. Part dim BROADCASTS with the brand filter
    pushed into its scan; the two COUNT(DISTINCT)s expand into one
    grouped aggregate pass (Spark's expand-based multi-distinct —
    shuffle keyed on type × distinct-source, no join reshuffle)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != "Brand#1"
    ).select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
            F.countDistinct("p_partkey").cast("long").alias("n_parts"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy(F.desc("n_suppliers"), "p_type")
    )


# ---------------------------------------------------------------------------
# Round-6 registrations
# ---------------------------------------------------------------------------


@register(
    "sleeping_customers_q22",
    oracle="""
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT ab FROM avg_bal)
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY 1 ORDER BY n_name
    """,
)
def q_sleeping_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone dormant (no order
    since 2000-01-01) — the scalar-aggregate subquery (avg positive
    balance, one row, broadcast) combined with a date-filtered
    anti-join against the fact table. The date predicate pushes into
    the orders scan before the anti-join shuffles both sides on
    custkey (orders is far too big to broadcast at scale); the nation
    dim broadcasts onto the surviving handful."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    ab = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    rich = c.crossJoin(F.broadcast(ab)).filter(F.col("c_acctbal") > F.col("ab"))
    sleeping = rich.join(
        o, rich.c_custkey == o.o_custkey, "left_anti"
    )
    return (
        sleeping.join(
            F.broadcast(nation), sleeping.c_nationkey == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "supplier_revenue_hhi",
    oracle="""
    WITH rs AS (
        SELECT s.s_nationkey, l.l_suppkey,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ),
    tot AS (SELECT s_nationkey, SUM(rev) AS t FROM rs GROUP BY 1)
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM(POWER(rs.rev / tot.t, 2)), 6) AS hhi
    FROM rs JOIN tot USING (s_nationkey)
    JOIN nation n ON n.n_nationkey = rs.s_nationkey
    GROUP BY 1 ORDER BY n_name
    """,
)
def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration audit: Herfindahl-Hirschman index of
    supplier revenue shares within each nation (1/n = perfect
    competition, 1.0 = monopoly). Supplier dim broadcasts onto the
    fact scan; the share denominator is a |nations|-row aggregate
    broadcast back — no window, two grouped passes, shuffle bounded by
    |suppliers|."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    rs = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            )
        )
    )
    tot = rs.groupBy("s_nationkey").agg(F.sum("rev").alias("t"))
    return (
        rs.join(F.broadcast(tot), "s_nationkey")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.round(F.sum(F.pow(F.col("rev") / F.col("t"), 2)), 6).alias(
                "hhi"
            ),
        )
        .orderBy("n_name")
    )


@register(
    "doc_length_gini_by_source",
    oracle="""
    WITH r AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id) AS i,
               COUNT(*) OVER (PARTITION BY source) AS n,
               SUM(n_chars) OVER (PARTITION BY source) AS s
        FROM documents
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           ROUND(2.0 * SUM(CAST(i * n_chars AS DOUBLE))
                     / (CAST(MAX(n) AS DOUBLE) * MAX(s))
                 - (MAX(n) + 1.0) / MAX(n), 6) AS gini
    FROM r GROUP BY source ORDER BY source
    """,
)
def q_doc_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-balance audit: Gini coefficient of document lengths per
    source (0 = uniform lengths; → 1 = a few giant docs dominate the
    token budget — the classic web-crawl pathology that skews training
    mixes). The rank formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n runs on a
    window PARTITIONED by source, so no task ever holds more than one
    source's docs; Σ(i·x) accumulates exactly in int64 before the one
    double division (tie order over equal lengths provably cancels)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ws = Window.partitionBy("source")
    r = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(ws).alias("n"),
        F.sum("n_chars").over(ws).alias("s"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.round(
                2.0
                * F.sum((F.col("i") * F.col("n_chars")).cast("double"))
                / (F.max("n").cast("double") * F.max("s"))
                - (F.max("n") + 1.0) / F.max("n"),
                6,
            ).alias("gini"),
        )
        .orderBy("source")
    )


@register(
    "trigram_novelty_halves",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(text,
                   '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id % 2 AS half,
               list_aggregate(toks[i:i+2], 'string_agg', ' ') AS gram
        FROM (SELECT doc_id, unnest(range(1, len(toks) - 1)) AS i, toks
              FROM t WHERE len(toks) >= 3)
    ),
    train AS (SELECT DISTINCT gram FROM g WHERE half = 0),
    test AS (SELECT DISTINCT gram FROM g WHERE half = 1)
    SELECT CAST((SELECT COUNT(*) FROM test) AS BIGINT) AS n_test_grams,
           CAST(COUNT(*) AS BIGINT) AS n_novel,
           ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM test), 6)
               AS novelty_rate
    FROM test WHERE gram NOT IN (SELECT gram FROM train)
    """,
)
def q_trigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit, inverted: what fraction of the
    held-out half's distinct word trigrams never occur in the training
    half? (Low novelty → the split leaks heavily templated text; the
    complement of the 13-gram decontamination check.) Tokenization is
    the corpus-wide convention (texteval.ngram_counts). Both gram sets
    are distinct-collapsed BEFORE the anti-join, so the join carries
    vocabulary-bounded frames, never raw text positions."""
    from .operators.texteval import ngram_counts

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "half", F.col("doc_id") % 2
    )
    grams = ngram_counts(docs, "half", "text", n=3)
    train = grams.filter(F.col("half") == 0).select("gram").distinct()
    test = grams.filter(F.col("half") == 1).select("gram").distinct()
    n_test = test.agg(F.count(F.lit(1)).alias("n_test_grams"))
    novel = test.join(train, "gram", "left_anti").agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    return (
        n_test.crossJoin(F.broadcast(novel))
        .select(
            F.col("n_test_grams").cast("long").alias("n_test_grams"),
            F.col("n_novel").cast("long").alias("n_novel"),
            F.round(F.col("n_novel") / F.col("n_test_grams"), 6).alias(
                "novelty_rate"
            ),
        )
    )


@register(
    "embedding_norm_outlier_topk",
    oracle="""
    WITH n AS (
        SELECT vec_id,
               SQRT(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2
        FROM embeddings
    ),
    s AS (SELECT AVG(l2) AS mu, stddev_pop(l2) AS sd FROM n)
    SELECT vec_id,
           ROUND(l2, 6) AS l2_norm,
           ROUND(ABS((l2 - s.mu) / s.sd), 6) AS z_abs
    FROM n, s
    ORDER BY z_abs DESC, vec_id LIMIT 20
    """,
)
def q_embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health: the 20 vectors whose L2 norm deviates
    most from the population (|z-score|) — norm outliers predict
    degenerate/corrupt embeddings and poison cosine ANN buckets. The
    norm folds JVM-side (aggregate over the array, no Python); the
    (mu, sd) frame is one broadcast row; top-k is
    TakeOrderedAndProject on the rounded key with a vec_id tie-break
    so the cut is cross-engine deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.select(
        "vec_id",
        F.sqrt(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ).alias("l2"),
    )
    s = n.agg(F.avg("l2").alias("mu"), F.stddev_pop("l2").alias("sd"))
    return (
        n.crossJoin(F.broadcast(s))
        .select(
            "vec_id",
            F.round("l2", 6).alias("l2_norm"),
            F.round(F.abs((F.col("l2") - F.col("mu")) / F.col("sd")), 6).alias(
                "z_abs"
            ),
        )
        .orderBy(F.desc("z_abs"), "vec_id")
        .limit(20)
    )


@register(
    "readability_proxy_by_lang",
    oracle=r"""
    WITH d AS (
        SELECT lang,
               len(string_split_regex(trim(lower(regexp_replace(text,
                   '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+')) AS n_words,
               GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS n_sents,
               len(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))
                   AS n_alpha
        FROM documents
        WHERE trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')))
              <> ''
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_words * 1.0 / n_sents), 6) AS words_per_sentence,
           ROUND(AVG(n_alpha * 1.0 / n_words), 6) AS chars_per_word,
           ROUND(AVG(206.835 - 1.015 * (n_words * 1.0 / n_sents)
                     - 84.6 * (n_alpha * 1.0 / n_words) / 4.7), 6)
               AS readability
    FROM d GROUP BY lang ORDER BY lang
    """,
)
def q_readability_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality scoring: per-language Flesch-style readability
    proxy (chars-per-word / 4.7 stands in for syllables-per-word —
    the standard ASCII approximation). Every per-doc statistic is an
    integer count, so the per-doc ratios are bit-identical across
    engines before the one averaging pass; everything is codegen
    regexp/length expressions, one scan, one grouped aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[^a-zA-Z0-9]+", " ")
    )
    d = docs.select(
        "lang",
        F.size(F.split(norm, r"\s+")).alias("n_words"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        ).alias("n_sents"),
        F.length(F.regexp_replace("text", "[^a-zA-Z0-9]", "")).alias(
            "n_alpha"
        ),
    ).where(norm != "")
    wps = F.col("n_words") / F.col("n_sents")
    cpw = F.col("n_alpha") / F.col("n_words")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg(wps), 6).alias("words_per_sentence"),
            F.round(F.avg(cpw), 6).alias("chars_per_word"),
            F.round(
                F.avg(206.835 - 1.015 * wps - 84.6 * cpw / 4.7), 6
            ).alias("readability"),
        )
        .orderBy("lang")
    )


@register(
    "degree_assortativity_orders",
    oracle="""
    WITH ob AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    deg AS (SELECT u AS node, CAST(COUNT(*) AS DOUBLE) AS d
            FROM und GROUP BY 1)
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           ROUND(corr(du.d, dv.d), 6) AS assortativity
    FROM und
    JOIN deg du ON du.node = und.u
    JOIN deg dv ON dv.node = und.v
    """,
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-structure metric: degree assortativity of the part
    co-purchase graph — Pearson correlation of endpoint degrees over
    directed edge copies (positive = hubs link hubs; heavy-tailed
    retail graphs are typically disassortative). The candidate product
    exists only WITHIN an order (basket-bounded self-join, the
    basket_lift shape — never all-pairs over the catalog); degrees are
    a node-bounded aggregate joined back onto edges co-keyed on the
    endpoint; the correlation is one single-pass co-moment aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    ob = li.distinct()
    a = ob.select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("u"))
    b = ob.select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "okey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("double").alias("d")
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    joined = (
        und.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    )
    r = joined.agg(F.round(F.corr("du", "dv"), 6).alias("assortativity"))
    return n_edges.crossJoin(F.broadcast(r)).select(
        F.col("n_edges").cast("long").alias("n_edges"), "assortativity"
    )


@register(
    "unigram_kl_by_source",
    oracle=r"""
    WITH w AS (
        SELECT source, word FROM (
            SELECT source,
                   unnest(string_split_regex(trim(lower(regexp_replace(
                       text, '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+')) AS word
            FROM documents)
        WHERE word <> ''
    ),
    sc AS (SELECT source, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
    st AS (SELECT source, SUM(c) AS t FROM sc GROUP BY 1),
    cc AS (SELECT word, SUM(c) AS c FROM sc GROUP BY 1),
    ct AS (SELECT SUM(c) AS t FROM cc)
    SELECT sc.source,
           CAST(MAX(st.t) AS BIGINT) AS n_tokens,
           ROUND(SUM((sc.c * 1.0 / st.t)
                     * LN((sc.c * 1.0 / st.t)
                          / (cc.c * 1.0 / (SELECT t FROM ct)))), 6)
               AS kl_vs_corpus
    FROM sc JOIN st USING (source) JOIN cc USING (word)
    GROUP BY sc.source ORDER BY sc.source
    """,
)
def q_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-shift audit: KL divergence of each source's unigram
    distribution from the whole-corpus distribution — the standard
    mixture-weighting diagnostic before blending training sources
    (DSIR's denominator view). The corpus tokenizes ONCE into
    per-(source, word) counts; everything downstream is
    vocabulary-bounded: totals broadcast, the corpus LM is a second
    grouped pass over the count frame, the join is co-keyed on word.
    KL ≥ 0 and finite by construction (corpus support ⊇ source
    support)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-zA-Z0-9]+", " ")),
        r"\s+",
    )
    w = docs.select("source", F.explode(toks).alias("word")).filter(
        F.col("word") != ""
    )
    sc = w.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c"))
    sc = sc.localCheckpoint(eager=False)
    st = sc.groupBy("source").agg(F.sum("c").alias("t"))
    cc = sc.groupBy("word").agg(F.sum("c").alias("cw"))
    ct = cc.agg(F.sum("cw").alias("tc"))
    return (
        sc.join(F.broadcast(st), "source")
        .join(cc, "word")
        .crossJoin(F.broadcast(ct))
        .groupBy("source")
        .agg(
            F.max("t").cast("long").alias("n_tokens"),
            F.round(
                F.sum(
                    (F.col("c") / F.col("t"))
                    * F.log(
                        (F.col("c") / F.col("t"))
                        / (F.col("cw") / F.col("tc"))
                    )
                ),
                6,
            ).alias("kl_vs_corpus"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-6 second wave: TPC-H decorrelation shapes the corpus still lacked
# (Q2 min-cost-supplier argmin, Q4 EXISTS with a cross-table predicate,
# Q11 share-threshold regroup, Q17 correlated per-group average).  The
# testdata schema has no partsupp/commitdate, so each keeps the REFERENCE
# SHAPE (the decorrelation pattern Catalyst must plan) over the columns
# that exist.
# ---------------------------------------------------------------------------


@register(
    "min_cost_supplier_per_part",
    oracle="""
    WITH pairs AS (
        SELECT l_partkey, l_suppkey,
               ROUND(SUM(l_extendedprice) / SUM(l_quantity), 6) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ),
    small AS (SELECT p_partkey, p_name FROM part WHERE p_size < 10),
    best AS (
        SELECT p.l_partkey, MIN(p.unit_cost) AS best_cost
        FROM pairs p JOIN small s ON s.p_partkey = p.l_partkey
        GROUP BY 1
    ),
    winner AS (
        SELECT b.l_partkey, b.best_cost,
               MIN(p.l_suppkey) AS best_suppkey
        FROM best b
        JOIN pairs p ON p.l_partkey = b.l_partkey
                    AND p.unit_cost = b.best_cost
        GROUP BY 1, 2
    )
    SELECT w.l_partkey AS p_partkey, s.p_name,
           CAST(w.best_suppkey AS BIGINT) AS best_suppkey,
           w.best_cost, su.s_name, n.n_name
    FROM winner w
    JOIN small s ON s.p_partkey = w.l_partkey
    JOIN supplier su ON su.s_suppkey = w.best_suppkey
    JOIN nation n ON n.n_nationkey = su.s_nationkey
    ORDER BY p_partkey
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per (small) part — the
    correlated-MIN subquery decorrelated into aggregate + equality
    join, with a deterministic MIN(suppkey) tie-break among suppliers
    hitting the same rounded unit cost (same arg-min convention as
    ``top_supplier_revenue``). Unit cost is SUM/SUM (ratio of sums —
    integer-exact quantities keep the threshold stable), rounded
    identically on both engines BEFORE the min so the argmin compares
    the same values. Part dim filters on p_size at the scan and
    broadcasts; the per-part best-cost frame is part-bounded and joins
    back on partkey (map-side after AQE broadcasts it at test scale;
    co-partitioned shuffle at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    small = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") < 10)
        .select("p_partkey", "p_name")
    )
    pairs = (
        li.join(F.broadcast(small), li.l_partkey == small.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(
                F.sum("l_extendedprice") / F.sum("l_quantity"), 6
            ).alias("unit_cost")
        )
    )
    best = pairs.groupBy("l_partkey").agg(
        F.min("unit_cost").alias("best_cost")
    )
    winner = (
        pairs.join(best, "l_partkey")
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .groupBy("l_partkey", "best_cost")
        .agg(F.min("l_suppkey").cast("long").alias("best_suppkey"))
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        winner.join(
            F.broadcast(small), winner.l_partkey == small.p_partkey
        )
        .join(F.broadcast(sup), winner.best_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "best_suppkey",
            "best_cost",
            "s_name",
            "n_name",
        )
        .orderBy("p_partkey")
    )


@register(
    "late_shipment_orders_by_priority",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_late_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY 1 ORDER BY o_orderpriority
    """,
)
def q_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one lineitem shipped > 60
    days after order date, counted per priority. The EXISTS predicate
    references BOTH tables (l_shipdate vs o_orderdate), so it cannot
    push to either scan alone — Catalyst decorrelates it into a
    LEFT SEMI join on orderkey with the cross-table filter evaluated
    in the join; the semi-join deduplicates per order without a
    distinct pass. Both sides shuffle on orderkey at scale (orders is
    a fact — no broadcast)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "part_value_concentration_q11",
    oracle="""
    WITH nv AS (
        SELECT n.n_name, l.l_partkey,
               SUM(l.l_extendedprice) AS val
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT n_name, SUM(val) AS t, COUNT(*) AS np FROM nv GROUP BY 1
    )
    SELECT nv.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_major_parts,
           ROUND(SUM(nv.val), 2) AS major_value
    FROM nv JOIN tot USING (n_name)
    WHERE ROUND(nv.val * tot.np / tot.t, 6) > 3.0
    GROUP BY 1 ORDER BY n_name
    """,
)
def q_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding an outsized share of a nation's
    supply value — the group-total-threshold regroup (HAVING against a
    scalar aggregate of the same frame, per group). The threshold is
    SCALE-FREE — 3× the nation's average per-part value, ≈ the
    measured p99 of that ratio at sf0.01 AND sf0.1 — so the query
    stays non-degenerate as the part universe grows (a fixed share
    fraction like Q11's 0.01% empties out once parts outnumber its
    reciprocal); the ratio is rounded identically on both engines
    before the strict compare. Supplier and nation dims broadcast onto the fact;
    the per-(nation, part) frame regroups to nation totals (a frame
    25 rows wide — broadcast back) and the threshold filter runs
    map-side before the final regroup. Two shuffles total at any
    scale: fact→(nation, part), then (nation, part)→nation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_extendedprice"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    nv = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(F.sum("l_extendedprice").alias("val"))
    )
    tot = nv.groupBy("n_name").agg(
        F.sum("val").alias("t"), F.count(F.lit(1)).alias("np")
    )
    return (
        nv.join(F.broadcast(tot), "n_name")
        .filter(
            F.round(F.col("val") * F.col("np") / F.col("t"), 6) > 3.0
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_major_parts"),
            F.round(F.sum("val"), 2).alias("major_value"),
        )
        .orderBy("n_name")
    )


@register(
    "small_quantity_revenue_q17",
    oracle="""
    WITH pa AS (
        SELECT l.l_partkey, ROUND(0.5 * AVG(l.l_quantity), 6) AS half_avg
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#2'
        GROUP BY 1
    )
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < pa.half_avg
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — lineitems of one
    brand's parts whose quantity is under half that part's average
    quantity. The correlated per-part AVG subquery decorrelates into a
    part-keyed aggregate joined back to the fact. Quantities are
    integer-valued doubles, so SUM/COUNT (and 0.5×) are EXACT in both
    engines — the strict threshold comparison cannot flip on summation
    order. Brand filter pushes into the broadcast part dim; the
    per-part average frame is part-bounded (joined on partkey,
    AQE-broadcast at test scale)."""
    part2 = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#2")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li2 = li.join(F.broadcast(part2), li.l_partkey == part2.p_partkey)
    pa = li2.groupBy("l_partkey").agg(
        F.round(0.5 * F.avg("l_quantity"), 6).alias("half_avg")
    )
    return (
        li2.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Round-6 third wave: classical test statistics the corpus lacked —
# chi-square independence, Mann-Whitney U (rank-sum with tie
# correction), pinball loss at an exact quantile, and a Markov
# transition matrix over per-user event sequences.
# ---------------------------------------------------------------------------


@register(
    "chi2_type_hour_independence",
    oracle="""
    WITH obs AS (
        SELECT event_type, hour(ts) AS hr, CAST(COUNT(*) AS DOUBLE) AS o
        FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY 1),
    ct AS (SELECT hr, SUM(o) AS c FROM obs GROUP BY 1),
    n AS (SELECT SUM(o) AS n FROM obs),
    cells AS (
        SELECT rt.event_type, ct.hr, rt.r * ct.c / n.n AS e,
               COALESCE(obs.o, 0.0) AS o
        FROM rt CROSS JOIN ct CROSS JOIN n
        LEFT JOIN obs ON obs.event_type = rt.event_type
                     AND obs.hr = ct.hr
    )
    SELECT ROUND(SUM((o - e) * (o - e) / e), 4) AS chi2,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT hr) - 1) AS BIGINT) AS dof,
           CAST(SUM(o) AS BIGINT) AS n
    FROM cells
    """,
)
def q_chi2_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test of the event_type ×
    hour-of-day contingency table — 'does activity mix shift across
    the day'. One fact shuffle builds the observed cells; margins are
    tiny aggregates of the cell frame (|types| and 24 rows) that CROSS
    into the full r×c expected grid BROADCAST-side, so zero-observed
    cells contribute their expectation exactly as scipy would. Scale:
    everything after the first groupBy is margin-bounded."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    obs = (
        ev.select("event_type", F.hour("ts").alias("hr"))
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
    )
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("hr").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(n))
        .join(F.broadcast(obs), ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            (F.col("r") * F.col("c") / F.col("n")).alias("e"),
            F.coalesce(F.col("o"), F.lit(0.0)).alias("o"),
        )
    )
    return cells.agg(
        F.round(
            F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e")), 4
        ).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("hr") - 1)
        )
        .cast("long")
        .alias("dof"),
        F.sum("o").cast("long").alias("n"),
    )


@register(
    "mann_whitney_purchase_vs_view",
    oracle="""
    WITH base AS (
        SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END a
        FROM events
        WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
    ),
    vals AS (
        SELECT value, SUM(a) AS ca, COUNT(*) - SUM(a) AS cb,
               COUNT(*) AS cnt
        FROM base GROUP BY 1
    ),
    ranked AS (
        SELECT *, SUM(cnt) OVER (ORDER BY value) AS cum FROM vals
    ),
    agg AS (
        SELECT SUM(ca * (cum - (cnt - 1) / 2.0)) AS ra,
               SUM(ca) AS na, SUM(cb) AS nb,
               SUM(CAST(cnt AS DOUBLE) * cnt * cnt - cnt) AS ties
        FROM ranked
    )
    SELECT ROUND(ra - na * (na + 1) / 2.0, 4) AS u_stat,
           ROUND((ra - na * (na + 1) / 2.0 - na * nb / 2.0)
                 / SQRT(na * nb / 12.0
                        * ((na + nb + 1.0)
                           - ties / ((na + nb) * (na + nb - 1.0)))),
                 4) AS z_score,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
    FROM agg
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (purchase vs view event values),
    with average ranks for ties and the tie-corrected normal
    approximation — the nonparametric 'are these two distributions
    shifted' workhorse. Scale path: ranks are NEVER materialized
    per row — the distinct-value frame carries (count_a, count_b) per
    value and the average rank falls out of a DISTRIBUTED running sum
    (``partitioned_prefix_sum``, range-partitioned on value; the
    unique-value frame makes it a total order), so no single-task
    WindowExec anywhere (the repo-wide plan lint enforces it)."""
    from .operators.indexing import partitioned_prefix_sum

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
        & F.col("value").isNotNull()
    )
    vals = (
        ev.select(
            "value",
            (F.col("event_type") == "purchase").cast("long").alias("a"),
        )
        .groupBy("value")
        .agg(
            F.sum("a").alias("ca"),
            (F.count(F.lit(1)) - F.sum("a")).alias("cb"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    ranked = partitioned_prefix_sum(vals, ["value"], "cnt", out_col="cum")
    agg = ranked.agg(
        F.sum(
            F.col("ca") * (F.col("cum") - (F.col("cnt") - 1) / 2.0)
        ).alias("ra"),
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            F.col("cnt").cast("double") * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        ).alias("ties"),
    )
    na, nb = F.col("na"), F.col("nb")
    u = F.col("ra") - na * (na + 1) / 2.0
    sigma = F.sqrt(
        na * nb / 12.0
        * ((na + nb + 1.0) - F.col("ties") / ((na + nb) * (na + nb - 1.0)))
    )
    return agg.select(
        F.round(u, 4).alias("u_stat"),
        F.round((u - na * nb / 2.0) / sigma, 4).alias("z_score"),
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
    )


@register(
    "pinball_loss_q90_by_type",
    oracle="""
    WITH q AS (
        SELECT event_type, quantile_cont(value, 0.9) AS q90
        FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT e.event_type, ROUND(q.q90, 6) AS q90,
           ROUND(AVG(CASE WHEN e.value >= q.q90
                          THEN 0.9 * (e.value - q.q90)
                          ELSE 0.1 * (q.q90 - e.value) END), 6)
               AS pinball
    FROM events e JOIN q USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY 1, 2 ORDER BY event_type
    """,
)
def q_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of the per-type exact q90 as a constant
    forecaster — the quantile-regression evaluation metric; by
    construction the true quantile minimizes it, so this doubles as a
    quantile-correctness audit. Spark's exact ``F.percentile`` ≡
    DuckDB ``quantile_cont`` (same linear interpolation). Two passes
    over the fact: per-type quantile (type-bounded frame, broadcast
    back), then one loss aggregation — no per-row rank, no window."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.9)).alias("q90")
    )
    j = ev.join(F.broadcast(q), "event_type")
    loss = F.when(
        F.col("value") >= F.col("q90"),
        0.9 * (F.col("value") - F.col("q90")),
    ).otherwise(0.1 * (F.col("q90") - F.col("value")))
    return (
        j.groupBy("event_type", F.round("q90", 6).alias("q90"))
        .agg(F.round(F.avg(loss), 6).alias("pinball"))
        .orderBy("event_type")
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ),
    t AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY from_type)
                          AS DOUBLE), 6) AS p
    FROM t ORDER BY from_type, to_type
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — P(next event type | current type), the session-model /
    next-action-prediction baseline. The LEAD window is partitioned by
    user (parallel, no global sort); ordering ties on (ts, event_id)
    per the repo's same-microsecond determinism convention. The
    transition frame is |types|² rows, so the per-row normalization
    window is bounded."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(tot).cast("double"), 6
        ).alias("p"),
    ).orderBy("from_type", "to_type")


@register(
    "pca_spectrum_invariants",
    oracle="""
    WITH x AS (
        SELECT generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    pv AS (SELECT i, AVG(v * v) - AVG(v) * AVG(v) AS var FROM x GROUP BY 1)
    SELECT CAST((SELECT COUNT(*) FROM embeddings
                 WHERE embedding IS NOT NULL) AS BIGINT) AS n_points,
           CAST(COUNT(*) AS BIGINT) AS dim,
           ROUND(SUM(var), 4) AS trace,
           TRUE AS spectrum_sums_to_trace,
           TRUE AS shares_nonincreasing,
           TRUE AS eigvals_nonnegative
    FROM pv
    """,
)
def q_pca_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA spectrum audit (ml/pca.py:covariance_spectrum): the
    population-covariance eigenvalues of the embedding column,
    accumulated GEMM-style from per-partition ``(n, Σx, ΣxxT)``
    Arrow partials (raw vectors never shuffle; driver work is the
    64×64 eigendecomposition). The SQL twin recomputes the TRACE
    independently (per-dim population variances via unnest — trace ==
    Σ eigenvalues is the exact linear-algebra invariant), and the
    Spark side asserts the spectrum's defining properties: sums to the
    trace, nonincreasing shares, PSD up to float tolerance."""
    from .ml.pca import covariance_spectrum

    emb = load_table(spark, sf_dir, "embeddings")
    n, trace, eig = covariance_spectrum(emb, "embedding")
    if eig is None:
        sums_ok = dec_ok = psd_ok = False
        dim = 0
    else:
        dim = len(eig)
        sums_ok = bool(abs(float(eig.sum()) - trace) <= 1e-9 * max(1.0, abs(trace)))
        dec_ok = bool((eig[:-1] >= eig[1:] - 1e-12).all())
        psd_ok = bool((eig >= -1e-9).all())
    return spark.createDataFrame(
        [(n, dim, round(trace, 4), sums_ok, dec_ok, psd_ok)],
        "n_points long, dim long, trace double, "
        "spectrum_sums_to_trace boolean, shares_nonincreasing boolean, "
        "eigvals_nonnegative boolean",
    )


@register(
    "asof_view_value_at_purchase",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    views AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'view'
    ),
    latest AS (
        SELECT p.event_id, p.user_id, MAX(v.ts) AS vt
        FROM purchases p
        LEFT JOIN views v
          ON v.user_id = p.user_id AND v.ts <= p.ts
        GROUP BY 1, 2
    )
    SELECT l.event_id, l.user_id,
           MAX(v2.value) AS view_value
    FROM latest l
    LEFT JOIN views v2
      ON v2.user_id = l.user_id AND v2.ts = l.vt
    GROUP BY 1, 2 ORDER BY event_id
    """,
)
def q_asof_view_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward) carrying a NON-timestamp payload: each
    purchase picks up the most recent prior 'view' event's VALUE for
    the same user. Unlike ``asof_last_signup`` (whose payload IS the
    timestamp, so duplicate-(key,ts) ties carry equal values and can't
    expose ordering), this row pins the round-6 tie-break fix in the
    driver artifact: at equal view timestamps the operator carries the
    MAX payload tuple, mirrored by the oracle's max-over-latest-ts
    two-step. Same single user-keyed shuffle union-carry plan — no
    O(n·m) product, unlike the oracle's join-aggregate formulation."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    out = as_of_join(
        purchases,
        views,
        on="user_id",
        left_time="ts",
        right_time="ts",
        payload=["view_value"],
        direction="backward",
    )
    return out.select("event_id", "user_id", "view_value").orderBy(
        "event_id"
    )


# ---------------------------------------------------------------------------
# Round-6 fourth wave: entity-resolution end-to-end, and two
# training-data feature transforms (leave-one-out target encoding,
# winsorization) the ML-prep surface lacked.
# ---------------------------------------------------------------------------


@register(
    "entity_resolution_clusters",
    oracle=r"""
    WITH RECURSIVE pq AS (
        SELECT a.p_partkey AS ia, b.p_partkey AS ib
        FROM part a JOIN part b
          ON a.p_partkey < b.p_partkey
         AND levenshtein(a.p_name, b.p_name) <= 1
    ),
    e AS (SELECT ia AS es, ib AS ed FROM pq
          UNION ALL SELECT ib, ia FROM pq),
    r AS (
        SELECT es AS id, es AS lab FROM e
        UNION
        SELECT e.ed, r.lab FROM r JOIN e ON e.es = r.id
    ),
    comp AS (SELECT id, MIN(lab) AS root FROM r GROUP BY 1),
    sizes AS (SELECT root, COUNT(*) AS sz FROM comp GROUP BY 1)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY 1 ORDER BY cluster_size
    """,
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution END-TO-END: 1-edit part-name pairs (SymSpell
    deletion-key blocking, ``fuzzy_pairs_1edit``) collapsed into
    entity clusters by ``connected_components``, reported as the
    cluster-size histogram — the dedupe-then-canonicalize shape every
    record-linkage pipeline ends with. The oracle recomputes the pair
    relation by brute-force levenshtein and the components by
    recursive min-label CTE (same harness as ``dup_clusters``), so
    blocking losslessness AND clustering correctness are both
    checked. Scale: pairs only materialize inside deletion-key
    buckets; the cluster step is the hybrid CC (single-task kernel at
    test scale, star rounds at 100 TB)."""
    from .operators.dedup import connected_components, fuzzy_pairs_1edit

    part = load_table(spark, sf_dir, "part")
    pairs = fuzzy_pairs_1edit(part, "p_name", "p_partkey")
    cc = connected_components(pairs, src="id_a", dst="id_b")
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        sizes.groupBy(F.col("sz").cast("long").alias("cluster_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .orderBy("cluster_size")
    )


@register(
    "target_encoding_loo",
    oracle="""
    WITH g AS (SELECT AVG(l_extendedprice) AS gm FROM lineitem),
    cat AS (
        SELECT l_returnflag, COUNT(*) AS n, SUM(l_extendedprice) AS s
        FROM lineitem GROUP BY 1
    ),
    enc AS (
        SELECT l.l_returnflag,
               ((c.s - l.l_extendedprice) + 10.0 * g.gm)
                   / (c.n - 1 + 10.0) AS e
        FROM lineitem l
        JOIN cat c ON c.l_returnflag = l.l_returnflag
        CROSS JOIN g
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(e), 4) AS avg_encoded,
           ROUND(MIN(e), 4) AS min_encoded,
           ROUND(MAX(e), 4) AS max_encoded
    FROM enc GROUP BY 1 ORDER BY l_returnflag
    """,
)
def q_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing (m=10
    pseudo-observations of the global mean) — the standard
    high-cardinality categorical feature for GBDT/linear models,
    computed leakage-free: each row's own target is excluded from its
    category mean. One category-keyed aggregate (category-bounded
    frame, broadcast back) + one map-side arithmetic pass — per-row
    encodings never shuffle. Audited per category (count, avg, min,
    max of the encoded value)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    g = li.agg(F.avg("l_extendedprice").alias("gm"))
    cat = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("s")
    )
    enc = (
        li.join(F.broadcast(cat), "l_returnflag")
        .crossJoin(F.broadcast(g))
        .select(
            "l_returnflag",
            (
                (F.col("s") - F.col("l_extendedprice") + 10.0 * F.col("gm"))
                / (F.col("n") - 1 + 10.0)
            ).alias("e"),
        )
    )
    return (
        enc.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("e"), 4).alias("avg_encoded"),
            F.round(F.min("e"), 4).alias("min_encoded"),
            F.round(F.max("e"), 4).alias("max_encoded"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "winsorized_stats_by_type",
    oracle="""
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.01) AS p01,
               quantile_cont(value, 0.99) AS p99
        FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT e.event_type,
           ROUND(AVG(e.value), 6) AS mean_raw,
           ROUND(AVG(LEAST(GREATEST(e.value, q.p01), q.p99)), 6)
               AS mean_winsor,
           ROUND(STDDEV_POP(e.value), 6) AS std_raw,
           ROUND(STDDEV_POP(LEAST(GREATEST(e.value, q.p01), q.p99)), 6)
               AS std_winsor
    FROM events e JOIN q USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY 1 ORDER BY event_type
    """,
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each type's values at its exact [p1, p99]
    and report mean/std before vs after — the robust-preprocessing
    step that tames heavy tails before standardization (pairs with
    ml/prep.py's ddof=0 scaler, hence STDDEV_POP). Exact percentiles
    via ``F.percentile`` ≡ ``quantile_cont``; the per-type cut frame
    broadcasts back and clipping is map-side codegen arithmetic — two
    fact passes, no window, no per-row shuffle."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("p01"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )
    w = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 6).alias("mean_raw"),
            F.round(F.avg(w), 6).alias("mean_winsor"),
            F.round(F.stddev_pop("value"), 6).alias("std_raw"),
            F.round(F.stddev_pop(w), 6).alias("std_winsor"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round-6 fifth wave: corpus-curation reporting — subword fertility,
# the near-dup threshold tuning curve, and the one-stop per-source
# dataset card.
# ---------------------------------------------------------------------------


@register(
    "token_fertility_by_lang",
    oracle=r"""
    WITH d AS (
        SELECT lang,
               len(string_split_regex(trim(text), '\s+')) AS words,
               len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS subwords
        FROM documents WHERE length(trim(text)) > 0
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS total_words,
           CAST(SUM(subwords) AS BIGINT) AS total_subwords,
           ROUND(SUM(subwords) * 1.0 / SUM(words), 6) AS fertility
    FROM d GROUP BY 1 ORDER BY lang
    """,
)
def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — subword-ish tokens per
    whitespace word (functions/text.py:bpe_ish_token_count over
    word_count), THE multilingual-curation dial: high-fertility
    languages pay more sequence budget per word, so mixture weights
    and packing budgets must correct for it. One map-side pass (two
    codegen regex counts per doc, text never shuffles) + a
    |langs|-bounded aggregate."""
    from .functions.text import bpe_ish_token_count, word_count

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    per = docs.select(
        "lang",
        word_count("text").alias("words"),
        bpe_ish_token_count("text").alias("subwords"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("words").cast("long").alias("total_words"),
            F.sum("subwords").cast("long").alias("total_subwords"),
            F.round(
                F.sum("subwords") * 1.0 / F.sum("words"), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


@register(
    "jaccard_threshold_sweep",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(
                   text, '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS toks
        FROM documents
    ),
    s AS (SELECT doc_id, unnest(range(1, len(toks) - 1)) AS i, toks
          FROM t WHERE len(toks) >= 3),
    d AS (SELECT DISTINCT doc_id,
                 toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
          FROM s),
    n AS (SELECT doc_id, COUNT(*) AS ns FROM d GROUP BY doc_id),
    p AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
        FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    j AS (
        SELECT c * 1.0 / (na.ns + nb.ns - c) AS jac
        FROM p JOIN n na ON na.doc_id = p.ia JOIN n nb ON nb.doc_id = p.ib
    ),
    th AS (SELECT unnest([0.5, 0.7, 0.9]) AS threshold)
    SELECT th.threshold,
           CAST(COUNT(j.jac) AS BIGINT) AS n_pairs
    FROM th LEFT JOIN j ON j.jac >= th.threshold
    GROUP BY 1 ORDER BY threshold
    """,
)
def q_jaccard_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold tuning curve: candidate-pair volume at
    Jaccard ≥ 0.5 / 0.7 / 0.9 — the dial every dedup rollout sweeps
    before committing a cutoff. One inverted-index pair pass
    (operators/dedup.py:ngram_jaccard_pairs at the loosest threshold)
    feeds all three counts via a 3-row threshold explode; the Jaccard
    value is a single division of exact integer counts, so the
    threshold compare is bit-identical across engines."""
    from .operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5)
    th = spark.createDataFrame(
        [(0.5,), (0.7,), (0.9,)], "threshold double"
    )
    return (
        F.broadcast(th)
        .join(pairs, pairs.jaccard >= th.threshold, "left")
        .groupBy("threshold")
        .agg(F.count("jaccard").cast("long").alias("n_pairs"))
        .orderBy("threshold")
    )


@register(
    "dataset_card_by_source",
    oracle=r"""
    WITH base AS (
        SELECT source, lang,
               len(string_split_regex(trim(text), '\s+')) AS words,
               length(text) AS chars,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
                   AS norm
        FROM documents WHERE length(trim(text)) > 0
    ),
    stats AS (
        SELECT source,
               COUNT(*) AS n_docs,
               SUM(words) AS total_words,
               AVG(chars) AS avg_chars,
               COUNT(DISTINCT norm) AS n_distinct
        FROM base GROUP BY 1
    ),
    lc AS (SELECT source, lang, COUNT(*) AS c FROM base GROUP BY 1, 2),
    ent AS (
        SELECT lc.source,
               -SUM((lc.c * 1.0 / s.n_docs)
                    * LN(lc.c * 1.0 / s.n_docs)) AS h
        FROM lc JOIN stats s USING (source) GROUP BY 1
    )
    SELECT s.source,
           CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(s.total_words AS BIGINT) AS total_words,
           ROUND(s.avg_chars, 4) AS avg_chars,
           ROUND(1.0 - s.n_distinct * 1.0 / s.n_docs, 6)
               AS exact_dup_rate,
           ROUND(ent.h, 6) AS lang_entropy
    FROM stats s JOIN ent USING (source)
    ORDER BY source
    """,
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card — the one-stop curation report: volume
    (docs, words, avg chars), exact-duplicate rate (distinct
    normalized text over docs, the canonical-form dedup criterion),
    and language-mix entropy. Two aggregates over one map-side
    normalize/count pass; the distinct-count shuffles the 64-bit
    normalized-text hash space, never the text itself (Spark's
    count_distinct partial aggregation), and the entropy frame is
    |source × lang|-bounded."""
    from .functions.text import normalized_text, word_count

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    base = docs.select(
        "source",
        "lang",
        word_count("text").alias("words"),
        F.length("text").alias("chars"),
        normalized_text("text").alias("norm"),
    )
    stats = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").alias("total_words"),
        F.avg("chars").alias("avg_chars"),
        F.countDistinct("norm").alias("n_distinct"),
    )
    lc = base.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    ent = (
        lc.join(F.broadcast(stats.select("source", "n_docs")), "source")
        .groupBy("source")
        .agg(
            (
                -F.sum(
                    (F.col("c") / F.col("n_docs"))
                    * F.log(F.col("c") / F.col("n_docs"))
                )
            ).alias("h")
        )
    )
    return (
        stats.join(F.broadcast(ent), "source")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_words").cast("long").alias("total_words"),
            F.round("avg_chars", 4).alias("avg_chars"),
            F.round(
                1.0 - F.col("n_distinct") / F.col("n_docs"), 6
            ).alias("exact_dup_rate"),
            F.round("h", 6).alias("lang_entropy"),
        )
        .orderBy("source")
    )


@register(
    "disjunctive_predicate_revenue_q19",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 40
           AND l.l_quantity BETWEEN 20 AND 45)
    """,
)
def q_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing
    both tables' columns — the disjunctive-pushdown stress test.
    Catalyst factors the part-only conjuncts of the disjunction into a
    scan-level filter on the broadcast dim (brand ∈ {1,2,3} with the
    size bands), leaving only the mixed brand×quantity residual for
    the join filter — the scan never materializes non-candidate parts.
    One broadcast join, one scalar aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(20, 45)
        )
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
    )


@register(
    "nation_trade_flows_q7",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    WHERE ns.n_nationkey <> nc.n_nationkey
    GROUP BY 1, 2 ORDER BY supp_nation, cust_nation
    """,
)
def q_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border trade volume by (supplier nation,
    customer nation) — the ROLE-PLAYING dimension pattern: the same
    nation dim joins twice under different roles (via the customer
    chain and the supplier chain), both broadcast. The only fact-fact
    shuffle is lineitem ⋈ orders on orderkey; customer/supplier/nation
    chain onto it broadcast-side, and the 25×25 flow matrix aggregates
    map-side first. Revenue accumulates in DECIMAL(18,2) — the 2-dp
    money values are exact there, so the per-cell sum is order-
    independent and identical across engines (a double sum of ~4M
    flipped a cent boundary under ROUND; exactness beats rounding)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    nc = nation.select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("ck"))
        .join(F.broadcast(ns), s.s_nationkey == F.col("sk"))
        .filter(F.col("sk") != F.col("ck"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(4,2)"))
            )
            .cast("double")
            .alias("volume"),
        )
        .orderBy("supp_nation", "cust_nation")
    )


# ---------------------------------------------------------------------------
# Round-6 TPC-H completion wave: the eight canonical shapes the corpus
# still lacked — Q6 (pure scan-filter aggregate), Q8 (market share,
# conditional numerator over a two-chain star), Q9 (profit by role-
# playing year/nation), Q10 (returned-item top-k), Q12 (dual
# conditional-count buckets), Q18 (HAVING over a fact self-aggregate),
# Q20 (nested semi-join with a correlated share threshold), Q21
# (EXISTS + NOT-EXISTS multi-supplier blame assignment).  The testdata
# schema is reduced TPC-H (no partsupp/shipmode/commitdate), so each
# query keeps the reference shape with documented column adaptations.
# ---------------------------------------------------------------------------


@register(
    "forecast_revenue_change_q6",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue_delta,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue that would have been gained by eliminating
    small discounts — the purest predicate-pushdown benchmark: every
    conjunct is a single-column comparison, so ALL of them reach the
    parquet scan (PushedFilters) and row groups outside the shipdate
    year are skipped on statistics alone; no join, no shuffle beyond
    one scalar partial-agg exchange. The discount band is widened a
    hair (±1e-9 via BETWEEN on exact 2-dp doubles — the testdata
    discounts are exact binary-representable multiples read identically
    by both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue_delta"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )


@register(
    "national_market_share_q8",
    oracle="""
    WITH vol AS (
        SELECT year(o.o_orderdate) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume,
               ns.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = nc.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
        JOIN part p     ON p.p_partkey = l.l_partkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
    )
    SELECT o_year,
           CAST(SUM(volume) AS DOUBLE) AS total_volume,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                         THEN volume ELSE 0 END) AS DOUBLE) AS nation_volume,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                              THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY 1 ORDER BY o_year
    """,
)
def q_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3 suppliers' share of the AMERICA-region
    STANDARD-part market by order year — the conditional-numerator
    share pattern (SUM(CASE)/SUM over one pass, never two scans). The
    part/customer/supplier/nation/region chain is ALL broadcast; the
    one big exchange is lineitem ⋈ orders on orderkey. Volume
    accumulates in DECIMAL(18,2)×(4,2) — exact, order-independent —
    and only the final share divides as double (the nation_trade_flows
    convention)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nc = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("ck"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = nation.select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("ck"), "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("sk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(4,2)"))
            ).alias("volume"),
            "supp_nation",
        )
    )
    tgt = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0).cast(vol.schema["volume"].dataType)
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.sum("volume").cast("double").alias("total_volume"),
            F.sum(tgt).cast("double").alias("nation_volume"),
        )
        .select(
            "o_year",
            "total_volume",
            "nation_volume",
            F.round(F.col("nation_volume") / F.col("total_volume"), 6).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )


@register(
    "product_profit_q9",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           year(o.o_orderdate) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                    - CAST(l.l_quantity AS DECIMAL(18,2))
                      * CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(0.6 AS DECIMAL(3,1)))
                AS DOUBLE) AS profit,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE contains(p.p_name, 'green') OR contains(p.p_name, 'red')
    GROUP BY 1, 2 ORDER BY supp_nation, o_year
    """,
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on color-named product lines by supplier
    nation and order year. The reference's ps_supplycost column does
    not exist in the reduced schema, so unit cost is modeled as 60% of
    p_retailprice (documented adaptation — the SHAPE under test is the
    name-substring dim filter + two-fact join + role-playing
    nation/year rollup, not the cost constant). Profit accumulates in
    DECIMAL — both terms are exact 2-dp money × exact small factors —
    so per-cell sums are order-independent across engines. part/
    supplier/nation broadcast; lineitem ⋈ orders on orderkey is the
    only big shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            F.col("p_name").contains("green") | F.col("p_name").contains("red")
        )
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    profit_term = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(4,2)")
    ) - F.col("l_quantity").cast("decimal(18,2)") * F.col(
        "p_retailprice"
    ).cast("decimal(18,2)") * F.lit(0.6).cast("decimal(3,1)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("sk"))
        .groupBy(
            "supp_nation", F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.sum(profit_term).cast("double").alias("profit"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
        .orderBy("supp_nation", "o_year")
    )


@register(
    "returned_item_customers_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_returned
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most value in a half-year
    window — the returned-item reporting top-k. Both date conjuncts
    push into the orders scan and the returnflag into lineitem's
    BEFORE the orderkey shuffle; customer/nation broadcast onto the
    aggregate. Revenue in exact DECIMAL then double; deterministic
    (revenue DESC, custkey) top-20 → TakeOrderedAndProject, never a
    global sort."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(4,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_returned"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "shipping_buckets_priority_q12",
    oracle="""
    WITH lat AS (
        SELECT CASE
                   WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
                       THEN 'FAST'
                   WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
                       THEN 'NORMAL'
                   ELSE 'SLOW'
               END AS ship_bucket,
               o.o_orderpriority AS pri
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT ship_bucket,
           CAST(SUM(CASE WHEN pri IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN pri NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lat GROUP BY 1 ORDER BY ship_bucket
    """,
)
def q_shipping_buckets_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: were urgent orders actually shipped faster? The
    reduced schema has no l_shipmode, so the grouping key is a derived
    ship-latency bucket (FAST ≤30d / NORMAL ≤60d / SLOW — the same
    cross-table date arithmetic Q12 applies to commit/receipt dates),
    keeping the signature dual conditional counts (urgent-vs-not CASE
    sums in one pass). One orderkey shuffle; 3-row result."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    bucket = (
        F.when(
            F.col("l_shipdate")
            <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            "FAST",
        )
        .when(
            F.col("l_shipdate")
            <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
            "NORMAL",
        )
        .otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.select(bucket.alias("ship_bucket"), "o_orderpriority")
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("ship_bucket")
    )


@register(
    "large_volume_customers_q18",
    oracle="""
    WITH oq AS (
        SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY 1
    ),
    thr AS (SELECT 2.0 * AVG(sum_qty) AS t FROM oq)
    SELECT c.c_custkey, o.o_orderkey,
           epoch_us(o.o_orderdate) AS orderdate_us,
           ROUND(o.o_totalprice, 4) AS o_totalprice,
           ROUND(oq.sum_qty, 4) AS sum_qty
    FROM oq
    JOIN orders o   ON o.o_orderkey = oq.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE oq.sum_qty > (SELECT t FROM thr)
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: the biggest single orders by total quantity — the
    HAVING-over-a-fact-self-aggregate shape. The reference's fixed
    `> 300` cutoff is replaced by a SCALE-FREE threshold (2× the mean
    per-order quantity ≈ p95 at every SF — the memory'd rule that
    fixed cutoffs go degenerate as cardinality grows). Quantities are
    integer-valued doubles so the per-order SUM is exact in both
    engines and the strict threshold cannot flip. One orderkey
    aggregate, the scalar threshold broadcasts, customers broadcast,
    deterministic top-100 → TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    oq = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sum_qty"))
    thr = oq.agg((2.0 * F.avg("sum_qty")).alias("t"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        oq.crossJoin(F.broadcast(thr))
        .filter(F.col("sum_qty") > F.col("t"))
        .join(o, oq.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_us"
            ),
            F.round("o_totalprice", 4).alias("o_totalprice"),
            F.round("sum_qty", 4).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "part_promotion_suppliers_q20",
    oracle="""
    WITH red_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    shipped AS (
        SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS qty
        FROM lineitem l
        JOIN red_parts rp ON rp.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    ),
    part_tot AS (
        SELECT l_partkey, SUM(qty) AS tot FROM shipped GROUP BY 1
    ),
    dominant AS (
        SELECT DISTINCT s.l_suppkey
        FROM shipped s JOIN part_tot pt ON pt.l_partkey = s.l_partkey
        WHERE s.qty > 0.5 * pt.tot
    )
    SELECT sp.s_suppkey, sp.s_name, n.n_name
    FROM supplier sp
    JOIN dominant d ON d.l_suppkey = sp.s_suppkey
    JOIN nation n ON n.n_nationkey = sp.s_nationkey
    ORDER BY s_suppkey
    """,
)
def q_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers positioned for a 'red'-part promotion
    — the nested-IN-subquery chain (parts by name prefix → per-
    (part, supplier) shipped quantity vs a correlated per-part
    aggregate → distinct suppliers → dim join). The reference's
    partsupp.ps_availqty does not exist, so the correlated `availqty >
    0.5 × shipped` test becomes `supplier's shipped share > 0.5 of the
    part's 1996 total` — same decorrelation: aggregate twice on the
    same frame, join back, semi-reduce. Name-prefix filter pushes to
    the part scan as a StartsWith; quantities integer-exact so the
    share comparison cannot flip."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_tot = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("tot"))
    dominant = (
        shipped.join(part_tot, "l_partkey")
        .filter(F.col("qty") > 0.5 * F.col("tot"))
        .select("l_suppkey")
        .distinct()
    )
    sp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        sp.join(dominant, sp.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), sp.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "waiting_suppliers_q21",
    oracle="""
    WITH late AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    ),
    all_supp AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    )
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM all_supp l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
    )
    GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the SOLE late shipper on finished
    multi-supplier orders — the EXISTS + NOT-EXISTS blame-assignment
    shape (the hardest decorrelation in the suite: one semi-join for
    'another supplier participated', one anti-join for 'no other
    supplier was late'). 'Late' is shipdate > orderdate + 60 days (the
    reduced schema has no commit/receipt dates — same cross-table
    lateness predicate as the Q4 twin). The late set is computed ONCE
    and reused for both the probe and the anti side; order status
    pushes into the orders scan. Both correlations key on orderkey —
    three co-partitioned shuffles, supplier dim broadcast, top-20
    deterministic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_supp = li.select("l_orderkey", "l_suppkey").distinct()
    l1 = late
    other_participant = all_supp.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    blamed = (
        l1.join(
            other_participant,
            (l1.l_orderkey == F.col("ok2")) & (l1.l_suppkey != F.col("sk2")),
            "left_semi",
        ).join(
            other_late,
            (l1.l_orderkey == F.col("ok3")) & (l1.l_suppkey != F.col("sk3")),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Round-6 fifth wave: rank-correlation on contingency margins, weighted
# reservoir sampling, an STL-lite variance decomposition, physical-layout
# analytics (z-order zone-map pruning, compaction bin-packing), and
# MLlib parallel FP-growth — each with a DuckDB twin.
# ---------------------------------------------------------------------------


@register(
    "kendall_tau_hour_value",
    oracle="""
    WITH cells AS (
        SELECT hour(ts) AS x,
               LEAST(9, CAST(FLOOR(value / 50.0) AS INT)) AS y,
               CAST(COUNT(*) AS DOUBLE) AS n
        FROM events GROUP BY 1, 2
    ),
    cd AS (
        SELECT
            SUM(CASE WHEN c2.x > c1.x AND c2.y > c1.y
                     THEN c1.n * c2.n ELSE 0 END) AS conc,
            SUM(CASE WHEN c2.x > c1.x AND c2.y < c1.y
                     THEN c1.n * c2.n ELSE 0 END) AS disc
        FROM cells c1 CROSS JOIN cells c2
    ),
    margins AS (
        SELECT SUM(n) AS n,
               SUM(n) * (SUM(n) - 1) / 2 AS n0,
               (SELECT SUM(r * (r - 1) / 2) FROM (
                   SELECT SUM(n) AS r FROM cells GROUP BY x)) AS n1,
               (SELECT SUM(c * (c - 1) / 2) FROM (
                   SELECT SUM(n) AS c FROM cells GROUP BY y)) AS n2
        FROM cells
    )
    SELECT ROUND((conc - disc) / SQRT((n0 - n1) * (n0 - n2)), 6) AS tau_b,
           CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           CAST(n AS BIGINT) AS n
    FROM cd CROSS JOIN margins
    """,
)
def q_kendall_tau_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between hour-of-day and event
    value, computed on the BINNED contingency table (24 x 10 cells):
    concordant/discordant mass comes from a broadcast self-join of the
    240-cell frame (57k weighted cell pairs, never the O(n^2) row
    pairs), tie corrections from the margins.  The only fact-sized
    stage is one groupBy; at 100 TB the pair arithmetic is still 240
    rows.  Binning makes tau exactly reproducible cross-engine (no
    float rank ties)."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    cells = (
        ev.select(
            F.hour("ts").alias("x"),
            F.least(F.lit(9), F.floor(F.col("value") / 50.0).cast("int")).alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    c2 = cells.select(
        F.col("x").alias("x2"), F.col("y").alias("y2"), F.col("n").alias("n2")
    )
    cd = (
        cells.crossJoin(F.broadcast(c2))
        .agg(
            F.sum(
                F.when(
                    (F.col("x2") > F.col("x")) & (F.col("y2") > F.col("y")),
                    F.col("n") * F.col("n2"),
                ).otherwise(F.lit(0.0))
            ).alias("conc"),
            F.sum(
                F.when(
                    (F.col("x2") > F.col("x")) & (F.col("y2") < F.col("y")),
                    F.col("n") * F.col("n2"),
                ).otherwise(F.lit(0.0))
            ).alias("disc"),
        )
    )
    rx = cells.groupBy("x").agg(F.sum("n").alias("r")).agg(
        F.sum(F.col("r") * (F.col("r") - 1) / 2).alias("n1")
    )
    cy = cells.groupBy("y").agg(F.sum("n").alias("c")).agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("n2m")
    )
    tot = cells.agg(
        F.sum("n").alias("n"),
        (F.sum("n") * (F.sum("n") - 1) / 2).alias("n0"),
    )
    return (
        cd.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(rx))
        .crossJoin(F.broadcast(cy))
        .select(
            F.round(
                (F.col("conc") - F.col("disc"))
                / F.sqrt((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n2m"))),
                6,
            ).alias("tau_b"),
            F.col("conc").cast("long").alias("concordant"),
            F.col("disc").cast("long").alias("discordant"),
            F.col("n").cast("long").alias("n"),
        )
    )


@register(
    "weighted_reservoir_orders",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS weight,
           ROUND(LN((((o_orderkey * 1000003 + 7) % 999983) + 1.0) / 999984.0)
                 / o_totalprice, 9) AS es_key
    FROM orders
    ORDER BY LN((((o_orderkey * 1000003 + 7) % 999983) + 1.0) / 999984.0)
             / o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q_weighted_reservoir_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis): each row gets key u^(1/w) — equivalently
    ln(u)/w, monotone and overflow-safe — with u a deterministic
    affine-hash uniform (the engine-independent seed convention from
    ml/split.py) and w = o_totalprice; the k largest keys ARE an exact
    weighted sample.  One TakeOrderedAndProject top-k per partition +
    driver merge of 20-row heads — no global sort, no collect; the
    same plan samples 20 of 10^11 rows.  This is the scalable primitive
    behind quality-weighted corpus subsampling."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    u = (((F.col("o_orderkey") * 1000003 + 7) % 999983) + 1.0) / 999984.0
    key = F.log(u) / F.col("o_totalprice")
    return (
        o.select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("weight"),
            key.alias("__k"),
        )
        .orderBy(F.desc("__k"), "o_orderkey")
        .limit(20)
        .select("o_orderkey", "weight", F.round("__k", 9).alias("es_key"))
    )


@register(
    "stl_lite_variance_split",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               isodow(o_orderdate) - 1 AS dow,
               SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1, 2
    ),
    tr AS (
        SELECT d, dow, rev,
               AVG(rev) OVER (ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
        FROM daily
    ),
    se AS (
        SELECT tr.*, AVG(rev - trend) OVER (PARTITION BY dow) AS seasonal
        FROM tr
    ),
    comp AS (
        SELECT var_pop(trend) AS v_trend,
               var_pop(seasonal) AS v_seasonal,
               var_pop(rev - trend - seasonal) AS v_remainder,
               var_pop(rev) AS v_total
        FROM se
    )
    SELECT component, ROUND(SQRT(v), 2) AS stddev,
           ROUND(v / v_total, 6) AS share
    FROM (
        SELECT 'trend' AS component, v_trend AS v, v_total FROM comp
        UNION ALL
        SELECT 'seasonal', v_seasonal, v_total FROM comp
        UNION ALL
        SELECT 'remainder', v_remainder, v_total FROM comp
    )
    ORDER BY component
    """,
)
def q_stl_lite_variance_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite decomposition of daily revenue — trend via a centered
    7-day moving average, seasonality as the day-of-week mean of the
    detrended series, remainder as what's left — reported as a variance
    split (how much of daily variance is trend vs weekly cycle vs
    noise).  The fact table collapses to one row per DAY first; every
    window after that runs on the bounded daily frame (365 rows per
    year regardless of SF), which the plan lint recognizes as
    aggregate-bounded."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = (
        o.groupBy(
            F.to_date("o_orderdate").alias("d"),
            F.weekday("o_orderdate").alias("dow"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w_ma = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.withColumn("trend", F.avg("rev").over(w_ma))
    se = tr.withColumn(
        "seasonal",
        F.avg(F.col("rev") - F.col("trend")).over(Window.partitionBy("dow")),
    )
    comp = se.agg(
        F.var_pop("trend").alias("v_trend"),
        F.var_pop("seasonal").alias("v_seasonal"),
        F.var_pop(F.col("rev") - F.col("trend") - F.col("seasonal")).alias(
            "v_remainder"
        ),
        F.var_pop("rev").alias("v_total"),
    )
    parts = []
    for name, col in [
        ("trend", "v_trend"),
        ("seasonal", "v_seasonal"),
        ("remainder", "v_remainder"),
    ]:
        parts.append(
            comp.select(
                F.lit(name).alias("component"),
                # stddev, not raw variance: ROUND(v, 2) on a ~1e12
                # variance sits within double noise of the half-cent
                # boundary (observed flaking once in the sf0.1 sweep);
                # the sqrt restores 6 orders of rounding headroom.
                F.round(F.sqrt(F.col(col)), 2).alias("stddev"),
                F.round(F.col(col) / F.col("v_total"), 6).alias("share"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("component")


@register(
    "zorder_pruning_audit",
    oracle="""
    WITH mx AS (SELECT MAX(event_id) AS m FROM events),
    b AS (
        SELECT event_id,
               LEAST(15, CAST(FLOOR(value / 31.0) AS INT)) AS bx,
               CAST(FLOOR(hour(ts) * 2 / 3.0) AS INT) AS by
        FROM events
    ),
    z AS (
        SELECT event_id, bx, by,
               (((bx >> 0) & 1) << 1) | (((by >> 0) & 1) << 0)
             | (((bx >> 1) & 1) << 3) | (((by >> 1) & 1) << 2)
             | (((bx >> 2) & 1) << 5) | (((by >> 2) & 1) << 4)
             | (((bx >> 3) & 1) << 7) | (((by >> 3) & 1) << 6) AS zv
        FROM b
    ),
    sharded AS (
        SELECT bx, by,
               CAST(FLOOR(event_id * 64.0 / (mx.m + 1)) AS INT) AS nat_shard,
               zv // 4 AS z_shard
        FROM z CROSS JOIN mx
    ),
    audit AS (
        SELECT 'natural' AS layout, nat_shard AS shard,
               MIN(bx) AS lo_x, MAX(bx) AS hi_x,
               MIN(by) AS lo_y, MAX(by) AS hi_y,
               COUNT(*) AS rows_in
        FROM sharded GROUP BY 1, 2
        UNION ALL
        SELECT 'zorder', z_shard,
               MIN(bx), MAX(bx), MIN(by), MAX(by), COUNT(*)
        FROM sharded GROUP BY 1, 2
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(SUM(CASE WHEN hi_x < 3 OR lo_x > 6
                          OR hi_y < 5 OR lo_y > 8
                    THEN 1 ELSE 0 END) AS BIGINT) AS shards_pruned,
           CAST(SUM(CASE WHEN hi_x < 3 OR lo_x > 6
                          OR hi_y < 5 OR lo_y > 8
                    THEN 0 ELSE rows_in END) AS BIGINT) AS rows_scanned,
           ROUND(SUM(CASE WHEN hi_x < 3 OR lo_x > 6
                           OR hi_y < 5 OR lo_y > 8
                     THEN 0 ELSE rows_in END) * 1.0 / SUM(rows_in), 6)
               AS scan_frac
    FROM audit GROUP BY layout ORDER BY layout
    """,
)
def q_zorder_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-layout advisor: would Z-ORDERING this table beat its
    natural (ingest-order) layout for 2-D predicates?  Each event gets
    a 4-bit value bin and a 4-bit hour bin; the 8-bit Morton interleave
    defines 64 z-range shards vs 64 ingest-range shards.  Per shard we
    keep parquet-style zone maps (min/max of both bins) and replay the
    rectangle predicate value in [100,200) x hour in [8,14): a shard is
    skipped iff its zone map is disjoint from the rectangle.  Output =
    shards pruned + rows actually scanned per layout — the measured
    case for a z-order rewrite.  Pure scan + two groupBys; the shard
    assignment needs only a broadcast MAX scalar, never a global
    sort."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    b = ev.select(
        "event_id",
        F.least(F.lit(15), F.floor(F.col("value") / 31.0).cast("int")).alias("bx"),
        F.floor(F.hour("ts") * 2 / 3.0).cast("int").alias("by"),
    )
    z = b.withColumn(
        "zv",
        F.expr(
            "(((bx >> 0) & 1) << 1) | (((by >> 0) & 1) << 0)"
            " | (((bx >> 1) & 1) << 3) | (((by >> 1) & 1) << 2)"
            " | (((bx >> 2) & 1) << 5) | (((by >> 2) & 1) << 4)"
            " | (((bx >> 3) & 1) << 7) | (((by >> 3) & 1) << 6)"
        ),
    )
    mx = ev.agg(F.max("event_id").alias("m"))
    sharded = z.crossJoin(F.broadcast(mx)).select(
        "bx",
        "by",
        F.floor(F.col("event_id") * 64.0 / (F.col("m") + 1)).cast("int").alias(
            "nat_shard"
        ),
        (F.col("zv") / F.lit(4)).cast("int").alias("z_shard"),
    )
    def zone_maps(df: DataFrame, layout: str, shard_col: str) -> DataFrame:
        return (
            df.groupBy(F.col(shard_col).alias("shard"))
            .agg(
                F.min("bx").alias("lo_x"),
                F.max("bx").alias("hi_x"),
                F.min("by").alias("lo_y"),
                F.max("by").alias("hi_y"),
                F.count(F.lit(1)).alias("rows_in"),
            )
            .withColumn("layout", F.lit(layout))
        )
    audit = zone_maps(sharded, "natural", "nat_shard").unionByName(
        zone_maps(sharded, "zorder", "z_shard")
    )
    pruned = (
        (F.col("hi_x") < 3)
        | (F.col("lo_x") > 6)
        | (F.col("hi_y") < 5)
        | (F.col("lo_y") > 8)
    )
    return (
        audit.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shards"),
            F.sum(F.when(pruned, 1).otherwise(0)).cast("long").alias(
                "shards_pruned"
            ),
            F.sum(F.when(pruned, 0).otherwise(F.col("rows_in")))
            .cast("long")
            .alias("rows_scanned"),
            F.round(
                F.sum(F.when(pruned, 0).otherwise(F.col("rows_in")))
                / F.sum("rows_in"),
                6,
            ).alias("scan_frac"),
        )
        .orderBy("layout")
    )


@register(
    "compaction_binpack_plan",
    oracle="""
    WITH tot AS (
        SELECT source, CEIL(SUM(n_chars) / 8.0) AS target
        FROM documents GROUP BY source
    ),
    offs AS (
        SELECT d.source, d.n_chars, t.target,
               COALESCE(SUM(d.n_chars) OVER (
                   PARTITION BY d.source ORDER BY d.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS off
        FROM documents d JOIN tot t USING (source)
    ),
    files AS (
        SELECT source, target,
               CAST(FLOOR(off / target) AS INT) AS file_id,
               SUM(n_chars) AS file_chars,
               COUNT(*) AS n_docs
        FROM offs GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(MAX(n_docs) AS BIGINT) AS max_docs_per_file,
           CAST(MAX(file_chars) AS BIGINT) AS max_file_chars,
           ROUND(AVG(file_chars / target), 6) AS avg_fill
    FROM files GROUP BY source ORDER BY source
    """,
)
def q_compaction_binpack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction planner: pack each source's documents
    into ~equal byte-budget output files by STREAMING next-fit — a doc
    goes to file floor(start_offset / target) where the start offset is
    a per-source prefix sum in doc_id order.  The plan reports files
    produced, worst doc count, worst overshoot and mean fill per
    source.  The prefix sum is per-source PARTITIONED (no global
    window); target is scale-free (total/8) so the plan stays
    non-degenerate at every SF — exactly the maintenance job an
    iceberg/delta compactor runs over 100 TB of write-amplified
    shards."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    tot = docs.groupBy("source").agg(
        F.ceil(F.sum("n_chars") / 8.0).alias("target")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        docs.join(F.broadcast(tot), "source")
        .withColumn("off", F.coalesce(F.sum("n_chars").over(w), F.lit(0)))
    )
    files = (
        offs.groupBy(
            "source",
            "target",
            F.floor(F.col("off") / F.col("target")).cast("int").alias("file_id"),
        )
        .agg(
            F.sum("n_chars").alias("file_chars"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    return (
        files.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.max("n_docs").cast("long").alias("max_docs_per_file"),
            F.max("file_chars").cast("long").alias("max_file_chars"),
            F.round(F.avg(F.col("file_chars") / F.col("target")), 6).alias(
                "avg_fill"
            ),
        )
        .orderBy("source")
    )


@register(
    "fp_growth_brand_itemsets",
    oracle="""
    WITH basket AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    nb AS (SELECT COUNT(DISTINCT okey) AS n FROM basket),
    singles AS (
        SELECT brand AS itemset, COUNT(*) AS freq FROM basket GROUP BY 1
    ),
    pairs AS (
        SELECT b1.brand || ',' || b2.brand AS itemset, COUNT(*) AS freq
        FROM basket b1 JOIN basket b2
          ON b1.okey = b2.okey AND b1.brand < b2.brand
        GROUP BY 1
    ),
    uni AS (
        SELECT * FROM singles UNION ALL SELECT * FROM pairs
    )
    SELECT itemset, CAST(freq AS BIGINT) AS freq
    FROM uni CROSS JOIN nb
    WHERE freq >= CEIL(0.01 * n)
    ORDER BY itemset
    """,
)
def q_fp_growth_brand_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent brand itemsets per order via MLlib's PARALLEL FP-growth
    (PFP: group-dependent transaction projection, one conditional
    FP-tree per partition — no candidate generation, scales to
    billions of baskets).  minSupport=1%; at that support and ~4 items
    per basket no itemset of size >= 3 survives (pairwise co-occurrence
    tops out ~2%), so the k<=2 filter makes the frame complete AND
    exactly enumerable by the SQL twin (singles + a self-join for
    pairs).  Items are array_sort-ed then joined so the itemset label
    is deterministic."""
    from pyspark.ml.fpm import FPGrowth

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    basket = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("items"))
    )
    model = FPGrowth(
        itemsCol="items", minSupport=0.01, minConfidence=0.5
    ).fit(basket)
    return (
        model.freqItemsets.filter(F.size("items") <= 2)
        .select(
            F.array_join(F.array_sort("items"), ",").alias("itemset"),
            F.col("freq").cast("long").alias("freq"),
        )
        .orderBy("itemset")
    )


# ---------------------------------------------------------------------------
# Round-6 sixth wave: forecast-quality decomposition, information theory,
# approximate query processing with error bars, a storage-encoding
# advisor, and a k-anonymity / l-diversity governance audit.
# ---------------------------------------------------------------------------


@register(
    "brier_decomposition",
    oracle="""
    WITH p AS (
        SELECT LEAST(9, CAST(FLOOR(
                   10.0 / (1.0 + EXP(-(value - 50.0) / 25.0))) AS INT)) AS b,
               CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    bins AS (
        SELECT b, COUNT(*) AS nk, AVG(y) AS ok FROM p GROUP BY b
    ),
    tot AS (SELECT SUM(nk) AS n, SUM(nk * ok) / SUM(nk) AS obar FROM bins),
    binpred AS (
        SELECT SUM(nk * ok * (1 - ok)) / MAX(n) AS withinvar,
               SUM(nk * (ok - obar) * (ok - obar)) / MAX(n) AS res,
               MAX(obar) * (1 - MAX(obar)) AS unc,
               MAX(n) AS n
        FROM bins CROSS JOIN tot
    )
    SELECT ROUND(withinvar, 6) AS brier_binned,
           ROUND(res, 6) AS resolution,
           ROUND(unc, 6) AS uncertainty,
           ROUND(unc - res, 6) AS brier_check,
           CAST(n AS BIGINT) AS n
    FROM binpred
    """,
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the binned logistic
    forecast p = sigma((value-50)/25) of the purchase label.  Using the
    bin-mean event rate as the (recalibrated) forecast, reliability is
    exactly 0 and Brier = uncertainty - resolution = the within-bin
    Bernoulli variance — both identities reported so the oracle checks
    the algebra, not just one number.  One scan to 10 bin rows; all
    decomposition arithmetic happens on the 10-row frame."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    p = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.col("value") - F.lit(50.0)) / F.lit(25.0))
    )
    rows = ev.select(
        F.least(F.lit(9), F.floor(p * 10.0).cast("int")).alias("b"),
        (F.col("event_type") == "purchase").cast("double").alias("y"),
    )
    bins = rows.groupBy("b").agg(
        F.count(F.lit(1)).alias("nk"), F.avg("y").alias("ok")
    )
    tot = bins.agg(
        F.sum("nk").alias("n"),
        (F.sum(F.col("nk") * F.col("ok")) / F.sum("nk")).alias("obar"),
    )
    out = bins.crossJoin(F.broadcast(tot)).agg(
        (F.sum(F.col("nk") * F.col("ok") * (1 - F.col("ok"))) / F.max("n")).alias(
            "withinvar"
        ),
        (
            F.sum(F.col("nk") * (F.col("ok") - F.col("obar")) ** 2) / F.max("n")
        ).alias("res"),
        (F.max("obar") * (1 - F.max("obar"))).alias("unc"),
        F.max("n").alias("n"),
    )
    return out.select(
        F.round("withinvar", 6).alias("brier_binned"),
        F.round("res", 6).alias("resolution"),
        F.round("unc", 6).alias("uncertainty"),
        F.round(F.col("unc") - F.col("res"), 6).alias("brier_check"),
        F.col("n").cast("long").alias("n"),
    )


@register(
    "mutual_information_type_hour",
    oracle="""
    WITH joint AS (
        SELECT event_type AS x, hour(ts) AS y,
               CAST(COUNT(*) AS DOUBLE) AS nxy
        FROM events GROUP BY 1, 2
    ),
    n AS (SELECT SUM(nxy) AS n FROM joint),
    mx AS (SELECT x, SUM(nxy) AS nx FROM joint GROUP BY x),
    my AS (SELECT y, SUM(nxy) AS ny FROM joint GROUP BY y),
    mi AS (
        SELECT SUM(nxy / n.n * LN(nxy * n.n / (nx * ny))) AS mi
        FROM joint JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n
    ),
    hx AS (SELECT -SUM(nx / n.n * LN(nx / n.n)) AS hx FROM mx CROSS JOIN n),
    hy AS (SELECT -SUM(ny / n.n * LN(ny / n.n)) AS hy FROM my CROSS JOIN n)
    SELECT ROUND(mi, 6) AS mi_nats,
           ROUND(mi / SQRT(hx * hy), 6) AS nmi,
           ROUND(hx, 6) AS h_type,
           ROUND(hy, 6) AS h_hour,
           CAST((SELECT n FROM n) AS BIGINT) AS n
    FROM mi CROSS JOIN hx CROSS JOIN hy
    """,
)
def q_mutual_information_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) and normalized MI between event_type
    and hour-of-day — the model-free dependence measure feature
    selection ranks by.  One fact groupBy builds the joint; margins and
    entropies are aggregates OF the cell frame (|types| x 24 rows), so
    everything after the first shuffle is contingency-bounded no matter
    the fact size."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    joint = (
        ev.select(F.col("event_type").alias("x"), F.hour("ts").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("double").alias("nxy"))
    )
    n = joint.agg(F.sum("nxy").alias("n"))
    mx = joint.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("y").agg(F.sum("nxy").alias("ny"))
    cells = (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(n))
    )
    mi = cells.agg(
        F.sum(
            F.col("nxy") / F.col("n") * F.log(F.col("nxy") * F.col("n") / (F.col("nx") * F.col("ny")))
        ).alias("mi")
    )
    hx = mx.crossJoin(F.broadcast(n)).agg(
        (-F.sum(F.col("nx") / F.col("n") * F.log(F.col("nx") / F.col("n")))).alias("hx")
    )
    hy = my.crossJoin(F.broadcast(n)).agg(
        (-F.sum(F.col("ny") / F.col("n") * F.log(F.col("ny") / F.col("n")))).alias("hy")
    )
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(n))
        .select(
            F.round("mi", 6).alias("mi_nats"),
            F.round(F.col("mi") / F.sqrt(F.col("hx") * F.col("hy")), 6).alias("nmi"),
            F.round("hx", 6).alias("h_type"),
            F.round("hy", 6).alias("h_hour"),
            F.col("n").cast("long").alias("n"),
        )
    )


@register(
    "aqp_revenue_estimate",
    oracle="""
    WITH t AS (
        SELECT l_returnflag,
               l_extendedprice * (1 - l_discount) AS x,
               ((((l_orderkey * 8 + l_linenumber) * 1000003 + 7) % 999983)
                * 40503) % 999983 AS h
        FROM lineitem
    ),
    exact AS (
        SELECT l_returnflag, SUM(x) AS exact_sum FROM t GROUP BY 1
    ),
    samp AS (
        SELECT l_returnflag,
               10.0 * SUM(x) AS est_sum,
               SQRT(90.0 * SUM(x * x)) AS se,
               COUNT(*) AS n_samp
        FROM t WHERE h % 10 = 0 GROUP BY 1
    )
    SELECT l_returnflag,
           ROUND(exact_sum, 2) AS exact_sum,
           ROUND(est_sum, 2) AS est_sum,
           ROUND(ABS(est_sum - exact_sum) / exact_sum, 6) AS rel_err,
           ROUND(se, 2) AS se,
           CAST(n_samp AS BIGINT) AS n_samp,
           CASE WHEN ABS(est_sum - exact_sum) <= 3 * se
                THEN 'ok' ELSE 'outside_3se' END AS audit
    FROM exact JOIN samp USING (l_returnflag)
    ORDER BY l_returnflag
    """,
)
def q_aqp_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing with error bars: a deterministic
    10% Bernoulli sample (affine-mod-prime-then-remultiplied row hash,
    the ml/split.py convention — a purely affine hash leaves the low
    digit constant on dense ids; every engine draws the SAME sample)
    estimates revenue per returnflag by Horvitz-Thompson
    scale-up (1/f), with the HT standard error sqrt((1-f)/f^2 * sum
    x^2) estimated FROM the sample, then audits the estimate against
    the exact answer (|err| <= 3*se).  The pattern that answers a
    100 TB dashboard query from a 10 TB sample with a guarantee; here
    both passes share one scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("x"),
        (
            (
                ((F.col("l_orderkey") * 8 + F.col("l_linenumber")) * 1000003 + 7)
                % 999983
            )
            * 40503
            % 999983
        ).alias("h"),
    )
    exact = li.groupBy("l_returnflag").agg(F.sum("x").alias("exact_sum"))
    samp = (
        li.filter(F.col("h") % 10 == 0)
        .groupBy("l_returnflag")
        .agg(
            (10.0 * F.sum("x")).alias("est_sum"),
            F.sqrt(90.0 * F.sum(F.col("x") * F.col("x"))).alias("se"),
            F.count(F.lit(1)).alias("n_samp"),
        )
    )
    return (
        exact.join(samp, "l_returnflag")
        .select(
            "l_returnflag",
            F.round("exact_sum", 2).alias("exact_sum"),
            F.round("est_sum", 2).alias("est_sum"),
            F.round(
                F.abs(F.col("est_sum") - F.col("exact_sum")) / F.col("exact_sum"), 6
            ).alias("rel_err"),
            F.round("se", 2).alias("se"),
            F.col("n_samp").cast("long").alias("n_samp"),
            F.when(
                F.abs(F.col("est_sum") - F.col("exact_sum")) <= 3 * F.col("se"),
                F.lit("ok"),
            )
            .otherwise(F.lit("outside_3se"))
            .alias("audit"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "encoding_advisor_events",
    oracle="""
    WITH cols AS (
        SELECT user_id, event_id, event_type AS c, 'event_type' AS col_name
        FROM events
        UNION ALL
        SELECT user_id, event_id, CAST(hour(ts) AS VARCHAR), 'hour'
        FROM events
        UNION ALL
        SELECT user_id, event_id,
               CAST(CAST(FLOOR(value / 10.0) AS INT) AS VARCHAR), 'value_bin'
        FROM events WHERE value IS NOT NULL
    ),
    adj AS (
        SELECT col_name, c,
               LAG(c) OVER (PARTITION BY col_name, user_id
                            ORDER BY event_id) AS prev
        FROM cols
    ),
    stats AS (
        SELECT col_name,
               COUNT(*) AS n,
               COUNT(DISTINCT c) AS ndv,
               SUM(CASE WHEN c = prev THEN 1 ELSE 0 END) * 1.0
                   / SUM(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END)
                   AS adj_repeat
        FROM adj GROUP BY 1
    ),
    top1 AS (
        SELECT col_name, MAX(cnt) * 1.0 / SUM(cnt) AS top1_share
        FROM (SELECT col_name, c, COUNT(*) AS cnt FROM cols GROUP BY 1, 2)
        GROUP BY 1
    )
    SELECT s.col_name,
           CAST(ndv AS BIGINT) AS ndv,
           ROUND(top1_share, 6) AS top1_share,
           ROUND(adj_repeat, 6) AS adj_repeat,
           CASE WHEN adj_repeat >= 0.3 THEN 'rle'
                WHEN ndv <= 100 THEN 'dictionary'
                ELSE 'plain' END AS encoding
    FROM stats s JOIN top1 USING (col_name)
    ORDER BY col_name
    """,
)
def q_encoding_advisor_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-encoding advisor: for each candidate column, measure the
    three quantities a parquet writer's encoder cares about — NDV
    (dictionary viability), the heaviest value's share (skew), and the
    adjacent-repeat rate in write order (RLE viability, computed
    per-user-PARTITIONED so no global sort) — and emit a
    dictionary/RLE/plain recommendation.  At 100 TB this audit is the
    difference between a 3x and a 10x compression ratio; every stage is
    one shuffle on (col, value) or (col, user)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    cols = (
        ev.select(
            "user_id",
            "event_id",
            F.col("event_type").alias("c"),
            F.lit("event_type").alias("col_name"),
        )
        .unionByName(
            ev.select(
                "user_id",
                "event_id",
                F.hour("ts").cast("string").alias("c"),
                F.lit("hour").alias("col_name"),
            )
        )
        .unionByName(
            ev.filter(F.col("value").isNotNull()).select(
                "user_id",
                "event_id",
                F.floor(F.col("value") / 10.0).cast("int").cast("string").alias("c"),
                F.lit("value_bin").alias("col_name"),
            )
        )
    )
    w = Window.partitionBy("col_name", "user_id").orderBy("event_id")
    adj = cols.withColumn("prev", F.lag("c").over(w))
    stats = adj.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("c").alias("ndv"),
        (
            F.sum(F.when(F.col("c") == F.col("prev"), 1).otherwise(0))
            / F.sum(F.when(F.col("prev").isNotNull(), 1).otherwise(0))
        ).alias("adj_repeat"),
    )
    top1 = (
        cols.groupBy("col_name", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("col_name")
        .agg((F.max("cnt") / F.sum("cnt")).alias("top1_share"))
    )
    return (
        stats.join(top1, "col_name")
        .select(
            "col_name",
            F.col("ndv").cast("long").alias("ndv"),
            F.round("top1_share", 6).alias("top1_share"),
            F.round("adj_repeat", 6).alias("adj_repeat"),
            F.when(F.col("adj_repeat") >= 0.3, F.lit("rle"))
            .when(F.col("ndv") <= 100, F.lit("dictionary"))
            .otherwise(F.lit("plain"))
            .alias("encoding"),
        )
        .orderBy("col_name")
    )


@register(
    "k_anonymity_audit",
    oracle="""
    WITH qi AS (
        SELECT event_type, hour(ts) AS hr,
               LEAST(9, CAST(FLOOR(value / 50.0) AS INT)) AS vb,
               user_id
        FROM events WHERE value IS NOT NULL
    ),
    grp AS (
        SELECT event_type, hr, vb,
               COUNT(*) AS k, COUNT(DISTINCT user_id) AS l
        FROM qi GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           ROUND(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) * 1.0 / SUM(k), 6)
               AS frac_rows_k_lt_5,
           CAST(MIN(l) AS BIGINT) AS min_l,
           ROUND(SUM(CASE WHEN l < 3 THEN k ELSE 0 END) * 1.0 / SUM(k), 6)
               AS frac_rows_l_lt_3
    FROM grp
    """,
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance audit before a data release: treating
    (event_type, hour, value-bin) as the quasi-identifier, report
    k-anonymity (smallest equivalence class, share of rows in classes
    with k<5) and l-diversity of user_id within each class (share of
    rows whose class exposes fewer than 3 distinct users).  One
    groupBy to the class frame, one aggregate of it — the standard
    re-identification risk screen, at any scale."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    grp = (
        ev.select(
            "event_type",
            F.hour("ts").alias("hr"),
            F.least(F.lit(9), F.floor(F.col("value") / 50.0).cast("int")).alias(
                "vb"
            ),
            "user_id",
        )
        .groupBy("event_type", "hr", "vb")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("user_id").alias("l"),
        )
    )
    return grp.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("k").cast("long").alias("min_k"),
        F.sum("k").cast("long").alias("n_rows"),
        F.round(
            F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0)) / F.sum("k"), 6
        ).alias("frac_rows_k_lt_5"),
        F.min("l").cast("long").alias("min_l"),
        F.round(
            F.sum(F.when(F.col("l") < 3, F.col("k")).otherwise(0)) / F.sum("k"), 6
        ).alias("frac_rows_l_lt_3"),
    )


# ---------------------------------------------------------------------------
# Round-6 seventh wave: fraud-domain screens (the reference repo's home
# turf — metasebiya/fraud-detection-project engineers velocity/time
# fraud features; these add the classic rule-based screens it stops
# short of) plus a differential-privacy release audit.
# ---------------------------------------------------------------------------


@register(
    "structuring_threshold_audit",
    oracle="""
    WITH th AS (SELECT * FROM (VALUES (100000.0), (200000.0),
                                      (300000.0), (400000.0)) t(thr)),
    nearby AS (
        SELECT thr,
               SUM(CASE WHEN o_totalprice <  thr THEN 1 ELSE 0 END) AS below,
               SUM(CASE WHEN o_totalprice >= thr THEN 1 ELSE 0 END) AS above
        FROM orders CROSS JOIN th
        WHERE o_totalprice >= thr - 2000 AND o_totalprice < thr + 2000
        GROUP BY thr
    )
    SELECT CAST(thr AS BIGINT) AS threshold,
           CAST(below AS BIGINT) AS just_below,
           CAST(above AS BIGINT) AS just_above,
           ROUND(below * 1.0 / above, 6) AS asymmetry
    FROM nearby ORDER BY threshold
    """,
)
def q_structuring_threshold_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structuring (smurfing) screen: transactions engineered to dodge
    a reporting threshold pile up JUST BELOW it, so for each round
    threshold we compare the +/-2000 bands on either side — an
    asymmetry well above 1 is the classic AML tell (on this organic
    testdata it sits near 1, which is the audit's null reading).  The
    threshold list is a 4-row broadcast; one filtered scan, one 4-row
    aggregate."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    th = spark.createDataFrame(
        [(100000.0,), (200000.0,), (300000.0,), (400000.0,)], ["thr"]
    )
    return (
        o.crossJoin(F.broadcast(th))
        .filter(
            (F.col("o_totalprice") >= F.col("thr") - 2000)
            & (F.col("o_totalprice") < F.col("thr") + 2000)
        )
        .groupBy("thr")
        .agg(
            F.sum(F.when(F.col("o_totalprice") < F.col("thr"), 1).otherwise(0)).alias(
                "below"
            ),
            F.sum(
                F.when(F.col("o_totalprice") >= F.col("thr"), 1).otherwise(0)
            ).alias("above"),
        )
        .select(
            F.col("thr").cast("long").alias("threshold"),
            F.col("below").cast("long").alias("just_below"),
            F.col("above").cast("long").alias("just_above"),
            F.round(F.col("below") / F.col("above"), 6).alias("asymmetry"),
        )
        .orderBy("threshold")
    )


@register(
    "user_mix_shift_kl",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS cnt
        FROM events
    ),
    halves AS (
        SELECT user_id, event_type,
               CASE WHEN rn * 2 <= cnt THEN 0 ELSE 1 END AS half,
               COUNT(*) AS c
        FROM seq GROUP BY 1, 2, 3
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    users AS (
        SELECT user_id,
               SUM(CASE WHEN half = 0 THEN c ELSE 0 END) AS n0,
               SUM(CASE WHEN half = 1 THEN c ELSE 0 END) AS n1
        FROM halves GROUP BY 1
    ),
    k AS (SELECT COUNT(*) AS k FROM types),
    grid AS (
        SELECT u.user_id, t.event_type, u.n0, u.n1, k.k,
               COALESCE(h0.c, 0) AS c0, COALESCE(h1.c, 0) AS c1
        FROM users u CROSS JOIN types t CROSS JOIN k
        LEFT JOIN halves h0 ON h0.user_id = u.user_id
             AND h0.event_type = t.event_type AND h0.half = 0
        LEFT JOIN halves h1 ON h1.user_id = u.user_id
             AND h1.event_type = t.event_type AND h1.half = 1
    ),
    kl AS (
        SELECT user_id,
               SUM((c0 + 1.0) / (n0 + k)
                   * LN(((c0 + 1.0) / (n0 + k))
                        / ((c1 + 1.0) / (n1 + k)))) AS kl
        FROM grid GROUP BY 1
    )
    SELECT LEAST(20, CAST(FLOOR(kl * 10) AS INT)) AS kl_bin,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM kl GROUP BY 1 ORDER BY 1
    """,
)
def q_user_mix_shift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-takeover signal: how far does each user's event-type
    mix DRIFT between the first and second half of their history?
    Laplace-smoothed KL(first || second) over the global type alphabet,
    reported as a 0.1-wide histogram (an abrupt regime change — a
    hijacked account — lands in the fat tail).  The per-user split is
    a partitioned row_number; the user x type grid joins a broadcast
    type list, so nothing exceeds |users| x |types| rows."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    halves = (
        seq.select(
            "user_id",
            "event_type",
            F.when(F.col("rn") * 2 <= F.col("cnt"), 0).otherwise(1).alias("half"),
        )
        .groupBy("user_id", "event_type", "half")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    types = ev.select("event_type").distinct()
    users = halves.groupBy("user_id").agg(
        F.sum(F.when(F.col("half") == 0, F.col("c")).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("half") == 1, F.col("c")).otherwise(0)).alias("n1"),
    )
    k = types.agg(F.count(F.lit(1)).alias("k"))
    h0 = halves.filter(F.col("half") == 0).select(
        "user_id", "event_type", F.col("c").alias("c0")
    )
    h1 = halves.filter(F.col("half") == 1).select(
        "user_id", "event_type", F.col("c").alias("c1")
    )
    grid = (
        users.crossJoin(F.broadcast(types))
        .crossJoin(F.broadcast(k))
        .join(h0, ["user_id", "event_type"], "left")
        .join(h1, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "n0",
            "n1",
            "k",
            F.coalesce("c0", F.lit(0)).alias("c0"),
            F.coalesce("c1", F.lit(0)).alias("c1"),
        )
    )
    p0 = (F.col("c0") + 1.0) / (F.col("n0") + F.col("k"))
    p1 = (F.col("c1") + 1.0) / (F.col("n1") + F.col("k"))
    kl = grid.groupBy("user_id").agg(F.sum(p0 * F.log(p0 / p1)).alias("kl"))
    return (
        kl.groupBy(
            F.least(F.lit(20), F.floor(F.col("kl") * 10).cast("int")).alias("kl_bin")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("kl_bin")
    )


@register(
    "bot_periodicity_screen",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
    ),
    per_user AS (
        SELECT user_id, COUNT(gap) AS n_gaps,
               AVG(gap) AS mean_gap,
               stddev_pop(gap) AS sd_gap,
               stddev_pop(gap) / AVG(gap) AS cv
        FROM gaps WHERE gap IS NOT NULL
        GROUP BY 1 HAVING COUNT(gap) >= 10
    ),
    cut AS (SELECT quantile_cont(cv, 0.05) AS c5 FROM per_user)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(MAX(c5), 6) AS cv_p05,
           CAST(SUM(CASE WHEN cv <= c5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
           ROUND(AVG(cv), 6) AS avg_cv,
           ROUND(MIN(cv), 6) AS min_cv
    FROM per_user CROSS JOIN cut
    """,
)
def q_bot_periodicity_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot / scripted-traffic screen: humans are bursty, cron jobs are
    metronomes.  Per user (>= 10 interarrival gaps) compute the
    coefficient of variation of the gaps; users in the bottom 5% of CV
    — the most clock-like — are flagged.  The cutoff is a measured
    percentile, not a magic constant, so the screen stays
    non-degenerate at every scale (memory'd scale-free-threshold
    convention).  One partitioned lag, one per-user aggregate, one
    exact percentile of the (user-sized) frame."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns div 1000").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.select(
        "user_id", (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    per_user = (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.avg("gap").alias("mean_gap"),
            F.stddev_pop("gap").alias("sd_gap"),
        )
        .filter(F.col("n_gaps") >= 10)
        .withColumn("cv", F.col("sd_gap") / F.col("mean_gap"))
    )
    cut = per_user.agg(F.percentile("cv", 0.05).alias("c5"))
    return per_user.crossJoin(F.broadcast(cut)).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.max("c5"), 6).alias("cv_p05"),
        F.sum(F.when(F.col("cv") <= F.col("c5"), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.round(F.avg("cv"), 6).alias("avg_cv"),
        F.round(F.min("cv"), 6).alias("min_cv"),
    )


@register(
    "dp_noisy_counts_by_type",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS true_n
        FROM events GROUP BY 1
    ),
    u AS (
        SELECT event_type, true_n,
               (((((ascii(substr(event_type, 1, 1)) * 131
                    + ascii(substr(event_type, 2, 1)) * 31
                    + length(event_type)) * 1000003 + 7) % 999983)
                 * 40503) % 999983 + 0.5) / 999983.0 AS u
        FROM c
    )
    SELECT event_type,
           CAST(true_n AS BIGINT) AS true_count,
           ROUND(true_n + (CASE WHEN u < 0.5 THEN 1 ELSE -1 END)
                 * LN(1 - 2 * ABS(u - 0.5)), 4) AS noisy_count,
           ROUND(ABS((CASE WHEN u < 0.5 THEN 1 ELSE -1 END)
                 * LN(1 - 2 * ABS(u - 0.5))), 4) AS abs_noise
    FROM u ORDER BY event_type
    """,
)
def q_dp_noisy_counts_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of per-type counts: Laplace(1/eps)
    noise at eps=1 (count sensitivity 1) drawn by INVERSE CDF from a
    deterministic per-key uniform (char-hash -> affine-mod-prime ->
    remultiply), so the 'draw' is reproducible across engines and the
    oracle can check the exact noisy values plus the utility column
    |noise|.  In production the uniform comes from a real RNG; the
    pipeline shape — aggregate, then noise the SMALL released frame,
    never the fact rows — is the part that scales."""
    ev = load_table(spark, sf_dir, "events").select("event_type")
    c = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("true_n")
    )
    # ascii() yields a 32-bit int — widen BEFORE the prime multiply or
    # the product wraps (silently with ANSI off, an error with it on).
    charmix = (
        F.ascii(F.substring("event_type", 1, 1)).cast("long") * 131
        + F.ascii(F.substring("event_type", 2, 1)).cast("long") * 31
        + F.length("event_type")
    )
    h = (charmix * 1000003 + 7) % 999983 * 40503 % 999983
    u = (h + 0.5) / 999983.0
    noise = F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0)) * F.log(
        1 - 2 * F.abs(u - 0.5)
    )
    return c.select(
        "event_type",
        F.col("true_n").cast("long").alias("true_count"),
        F.round(F.col("true_n") + noise, 4).alias("noisy_count"),
        F.round(F.abs(noise), 4).alias("abs_noise"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Round-6 eighth wave: optimizer-facing audits (cardinality-estimation
# q-error, partition-key advisor) and matryoshka embedding truncation.
# ---------------------------------------------------------------------------


@register(
    "qerror_selectivity_audit",
    oracle="""
    WITH preds AS (
        SELECT * FROM (VALUES (2.0, 18.0), (10.0, 60.0), (75.0, 130.0),
                              (140.0, 230.0), (210.0, 320.0)) p(lo, hi)
    ),
    stats AS (
        SELECT COUNT(value) AS n, MIN(value) AS mn, MAX(value) AS mx
        FROM events WHERE value IS NOT NULL
    ),
    hist AS (
        SELECT LEAST(19, CAST(FLOOR(value / 25.0) AS INT)) AS b,
               CAST(COUNT(*) AS DOUBLE) AS cnt
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    actual AS (
        SELECT lo, hi, GREATEST(CAST(COUNT(value) AS DOUBLE), 1.0) AS act
        FROM preds LEFT JOIN events
          ON value >= lo AND value < hi
        GROUP BY lo, hi
    ),
    est AS (
        SELECT p.lo, p.hi,
               s.n * (p.hi - p.lo) / (s.mx - s.mn) AS est_uniform,
               (SELECT SUM(h.cnt * GREATEST(0,
                       LEAST(p.hi, (h.b + 1) * 25.0)
                       - GREATEST(p.lo, h.b * 25.0)) / 25.0)
                FROM hist h) AS est_hist
        FROM preds p CROSS JOIN stats s
    )
    SELECT CAST(a.lo AS BIGINT) AS lo, CAST(a.hi AS BIGINT) AS hi,
           CAST(act AS BIGINT) AS actual,
           ROUND(est_uniform, 2) AS est_uniform,
           ROUND(est_hist, 2) AS est_hist,
           ROUND(GREATEST(est_uniform / act, act / est_uniform), 4)
               AS qerr_uniform,
           ROUND(GREATEST(est_hist / act, act / est_hist), 4) AS qerr_hist
    FROM actual a JOIN est e ON a.lo = e.lo AND a.hi = e.hi
    ORDER BY lo
    """,
)
def q_qerror_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality-estimation audit, the metric optimizer papers report
    as q-error: for five range predicates on value, compare the naive
    uniform-assumption estimate against a 20-bucket equi-width
    histogram estimate (partial buckets pro-rated), each vs the true
    count.  The histogram is built ONCE from one scan and both
    estimators run on the 20-row sketch — exactly how a catalog keeps
    stats cheap at 100 TB while the audit quantifies how much plan
    quality the histogram buys (qerr_hist << qerr_uniform on any
    non-uniform column)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    preds = spark.createDataFrame(
        [(2.0, 18.0), (10.0, 60.0), (75.0, 130.0), (140.0, 230.0),
         (210.0, 320.0)],
        ["lo", "hi"],
    )
    stats = ev.agg(
        F.count("value").cast("double").alias("n"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    hist = (
        ev.groupBy(
            F.least(F.lit(19), F.floor(F.col("value") / 25.0).cast("int")).alias("b")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    actual = (
        preds.join(
            ev.select("value"),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
            "left",
        )
        .groupBy("lo", "hi")
        .agg(F.greatest(F.count("value").cast("double"), F.lit(1.0)).alias("act"))
    )
    overlap = (
        F.greatest(
            F.lit(0.0),
            F.least(F.col("hi"), (F.col("b") + 1) * 25.0)
            - F.greatest(F.col("lo"), F.col("b") * 25.0),
        )
        / 25.0
    )
    est = (
        preds.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(hist))
        .groupBy("lo", "hi")
        .agg(
            F.max(
                F.col("n") * (F.col("hi") - F.col("lo")) / (F.col("mx") - F.col("mn"))
            ).alias("est_uniform"),
            F.sum(F.col("cnt") * overlap).alias("est_hist"),
        )
    )
    return (
        actual.join(est, ["lo", "hi"])
        .select(
            F.col("lo").cast("long").alias("lo"),
            F.col("hi").cast("long").alias("hi"),
            F.col("act").cast("long").alias("actual"),
            F.round("est_uniform", 2).alias("est_uniform"),
            F.round("est_hist", 2).alias("est_hist"),
            F.round(
                F.greatest(
                    F.col("est_uniform") / F.col("act"),
                    F.col("act") / F.col("est_uniform"),
                ),
                4,
            ).alias("qerr_uniform"),
            F.round(
                F.greatest(
                    F.col("est_hist") / F.col("act"),
                    F.col("act") / F.col("est_hist"),
                ),
                4,
            ).alias("qerr_hist"),
        )
        .orderBy("lo")
    )


@register(
    "partition_advisor_events",
    oracle="""
    WITH cand AS (
        SELECT 'date' AS cand, CAST(CAST(ts AS DATE) AS VARCHAR) AS k
        FROM events
        UNION ALL
        SELECT 'event_type', event_type FROM events
        UNION ALL
        SELECT 'user_bucket', CAST(user_id % 64 AS VARCHAR) FROM events
    ),
    parts AS (
        SELECT cand, k, COUNT(*) AS rows_in FROM cand GROUP BY 1, 2
    )
    SELECT cand,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(MAX(rows_in) AS BIGINT) AS max_rows,
           CAST(MIN(rows_in) AS BIGINT) AS min_rows,
           ROUND(MAX(rows_in) * 1.0 / AVG(rows_in), 4) AS skew,
           CASE WHEN COUNT(*) > 10000 THEN 'too_many_partitions'
                WHEN MAX(rows_in) * 1.0 / AVG(rows_in) > 4.0 THEN 'skewed'
                ELSE 'ok' END AS verdict
    FROM parts GROUP BY cand ORDER BY cand
    """,
)
def q_partition_advisor_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key advisor: for each candidate partitioning of the
    fact table (ingest date, event_type, a 64-way user-id bucket)
    measure partition count, the largest partition's skew over the
    mean, and issue the verdict a table-format maintainer needs —
    too-many-partitions (small-file explosion), skewed (straggler
    tasks), or ok.  One groupBy per candidate over a union'd scan;
    the advisor output is |candidates| rows regardless of scale."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "user_id")
    cand = (
        ev.select(
            F.lit("date").alias("cand"),
            F.to_date("ts").cast("string").alias("k"),
        )
        .unionByName(
            ev.select(
                F.lit("event_type").alias("cand"), F.col("event_type").alias("k")
            )
        )
        .unionByName(
            ev.select(
                F.lit("user_bucket").alias("cand"),
                (F.col("user_id") % 64).cast("string").alias("k"),
            )
        )
    )
    parts = cand.groupBy("cand", "k").agg(F.count(F.lit(1)).alias("rows_in"))
    return (
        parts.groupBy("cand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_partitions"),
            F.max("rows_in").cast("long").alias("max_rows"),
            F.min("rows_in").cast("long").alias("min_rows"),
            F.round(F.max("rows_in") / F.avg("rows_in"), 4).alias("skew"),
        )
        .withColumn(
            "verdict",
            F.when(F.col("n_partitions") > 10000, F.lit("too_many_partitions"))
            .when(F.col("skew") > 4.0, F.lit("skewed"))
            .otherwise(F.lit("ok")),
        )
        .orderBy("cand")
    )


@register(
    "matryoshka_truncation_fidelity",
    oracle="""
    WITH s AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE vec_id % 37 = 0
    ),
    dims AS (SELECT * FROM (VALUES (8), (16), (32)) d(dim)),
    pairs AS (
        SELECT d.dim,
               list_cosine_similarity(a.v, b.v) AS full_cos,
               list_cosine_similarity(a.v[1:d.dim], b.v[1:d.dim]) AS pre_cos
        FROM s a JOIN s b ON a.vec_id < b.vec_id
        CROSS JOIN dims d
    )
    SELECT dim,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(ABS(full_cos - pre_cos)), 6) AS mean_abs_err,
           ROUND(MAX(ABS(full_cos - pre_cos)), 6) AS max_abs_err,
           ROUND(corr(full_cos, pre_cos), 6) AS cos_corr
    FROM pairs GROUP BY dim ORDER BY dim
    """,
)
def q_matryoshka_truncation_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: how faithfully do the first
    8/16/32 dims of the 64-dim embedding preserve pairwise cosine?
    Reports mean/max absolute cosine error and the full-vs-prefix
    correlation per prefix length — the measurement that decides
    whether a 4x cheaper ANN index is safe.  Pairs come from the same
    deterministic vec_id sample the JL audit uses (the corpus itself
    never self-joins); all dot products are zip_with/aggregate codegen
    expressions."""
    from .functions.vectors import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    s = emb.filter(F.col("vec_id") % 37 == 0).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    b = s.select(F.col("vec_id").alias("vec_id_b"), F.col("v").alias("vb"))
    pairs = s.join(F.broadcast(b), F.col("vec_id") < F.col("vec_id_b"))
    dims = spark.createDataFrame([(8,), (16,), (32,)], ["dim"])
    full_cos = dot("v", "vb") / (l2_norm("v") * l2_norm("vb"))
    pa = F.slice("v", 1, F.col("dim"))
    pb = F.slice("vb", 1, F.col("dim"))
    pre_cos = dot(pa, pb) / (l2_norm(pa) * l2_norm(pb))
    scored = pairs.crossJoin(F.broadcast(dims)).select(
        "dim", full_cos.alias("full_cos"), pre_cos.alias("pre_cos")
    )
    return (
        scored.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.avg(F.abs(F.col("full_cos") - F.col("pre_cos"))), 6).alias(
                "mean_abs_err"
            ),
            F.round(F.max(F.abs(F.col("full_cos") - F.col("pre_cos"))), 6).alias(
                "max_abs_err"
            ),
            F.round(F.corr("full_cos", "pre_cos"), 6).alias("cos_corr"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# Round-6 ninth wave: data-profiling classics — functional-dependency
# discovery (g3 error), sortedness profiling for layout/encoding
# decisions, and per-stratum weighted sampling.
# ---------------------------------------------------------------------------


@register(
    "fd_discovery_audit",
    oracle="""
    WITH pairs AS (
        SELECT 'part.brand->type' AS fd, p_brand AS lhs, p_type AS rhs
        FROM part
        UNION ALL
        SELECT 'part.type->brand', p_type, p_brand FROM part
        UNION ALL
        SELECT 'customer.nation->segment', CAST(c_nationkey AS VARCHAR),
               c_mktsegment FROM customer
        UNION ALL
        SELECT 'orders.orderkey->priority', CAST(o_orderkey AS VARCHAR),
               o_orderpriority FROM orders
    ),
    cnt AS (
        SELECT fd, lhs, rhs, COUNT(*) AS c FROM pairs GROUP BY 1, 2, 3
    ),
    keep AS (
        SELECT fd, lhs, MAX(c) AS kept, SUM(c) AS n_lhs_rows,
               COUNT(*) AS n_rhs
        FROM cnt GROUP BY 1, 2
    )
    SELECT fd,
           CAST(SUM(n_lhs_rows) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_lhs,
           CAST(SUM(n_rhs) AS BIGINT) AS n_pairs,
           ROUND(1.0 - SUM(kept) * 1.0 / SUM(n_lhs_rows), 6) AS g3_error,
           SUM(n_rhs) = COUNT(*) AS holds
    FROM keep GROUP BY fd ORDER BY fd
    """,
)
def q_fd_discovery_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (Metanome/TANE-style profiling):
    for each candidate FD, the g3 error — the minimum fraction of rows
    you'd have to delete for lhs -> rhs to hold exactly (0 means the FD
    holds).  Computed as two cascaded aggregates: (lhs, rhs) counts,
    then keep-the-majority per lhs — each a hash shuffle bounded by the
    attribute cardinalities, never a self-join.  The candidate set
    spans a true key FD, a plausible-but-violated dimension FD, and
    its reverse."""
    p = load_table(spark, sf_dir, "part").select("p_brand", "p_type")
    c = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    pairs = (
        p.select(
            F.lit("part.brand->type").alias("fd"),
            F.col("p_brand").alias("lhs"),
            F.col("p_type").alias("rhs"),
        )
        .unionByName(
            p.select(
                F.lit("part.type->brand").alias("fd"),
                F.col("p_type").alias("lhs"),
                F.col("p_brand").alias("rhs"),
            )
        )
        .unionByName(
            c.select(
                F.lit("customer.nation->segment").alias("fd"),
                F.col("c_nationkey").cast("string").alias("lhs"),
                F.col("c_mktsegment").alias("rhs"),
            )
        )
        .unionByName(
            o.select(
                F.lit("orders.orderkey->priority").alias("fd"),
                F.col("o_orderkey").cast("string").alias("lhs"),
                F.col("o_orderpriority").alias("rhs"),
            )
        )
    )
    cnt = pairs.groupBy("fd", "lhs", "rhs").agg(F.count(F.lit(1)).alias("c"))
    keep = cnt.groupBy("fd", "lhs").agg(
        F.max("c").alias("kept"),
        F.sum("c").alias("n_lhs_rows"),
        F.count(F.lit(1)).alias("n_rhs"),
    )
    return (
        keep.groupBy("fd")
        .agg(
            F.sum("n_lhs_rows").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_lhs"),
            F.sum("n_rhs").cast("long").alias("n_pairs"),
            F.round(1.0 - F.sum("kept") / F.sum("n_lhs_rows"), 6).alias("g3_error"),
            (F.sum("n_rhs") == F.count(F.lit(1))).alias("holds"),
        )
        .orderBy("fd")
    )


@register(
    "sortedness_profile_events",
    oracle="""
    WITH cols AS (
        SELECT 'ts' AS col_name, event_id, event_id // 1000 AS blk,
               CAST(epoch_us(ts) AS DOUBLE) AS v
        FROM events
        UNION ALL
        SELECT 'user_id', event_id, event_id // 1000,
               CAST(user_id AS DOUBLE) FROM events
        UNION ALL
        SELECT 'value', event_id, event_id // 1000, value
        FROM events WHERE value IS NOT NULL
    ),
    adj AS (
        SELECT col_name, v,
               LAG(v) OVER (PARTITION BY col_name, blk
                            ORDER BY event_id) AS prev
        FROM cols
    )
    SELECT col_name,
           CAST(COUNT(prev) AS BIGINT) AS n_pairs,
           ROUND(SUM(CASE WHEN v >= prev THEN 1 ELSE 0 END) * 1.0
                 / COUNT(prev), 6) AS frac_nondecreasing,
           CAST(SUM(CASE WHEN v < prev THEN 1 ELSE 0 END) + 1 AS BIGINT)
               AS est_runs
    FROM adj WHERE prev IS NOT NULL GROUP BY col_name
    ORDER BY col_name
    """,
)
def q_sortedness_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sortedness profiling in ingest (event_id) order — the measurement
    behind 'is this column already clustered enough that a sort/RLE/
    delta encoding is free?'.  Adjacency is evaluated inside 1000-row
    ingest blocks (PARTITIONED lag; the <=0.1% of pairs straddling
    block boundaries are excluded identically on both engines), so the
    profile never needs a global sort — the same trick a parquet writer
    uses, since row groups bound its visibility anyway.  ts should
    profile ~sorted (append order), user_id/value ~random."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.expr("ts_ns div 1000").cast("double").alias("ts_v"),
        F.col("user_id").cast("double").alias("uid_v"),
        "value",
    )
    cols = (
        ev.select(
            F.lit("ts").alias("col_name"),
            "event_id",
            (F.col("event_id") / 1000).cast("long").alias("blk"),
            F.col("ts_v").alias("v"),
        )
        .unionByName(
            ev.select(
                F.lit("user_id").alias("col_name"),
                "event_id",
                (F.col("event_id") / 1000).cast("long").alias("blk"),
                F.col("uid_v").alias("v"),
            )
        )
        .unionByName(
            ev.filter(F.col("value").isNotNull()).select(
                F.lit("value").alias("col_name"),
                "event_id",
                (F.col("event_id") / 1000).cast("long").alias("blk"),
                F.col("value").alias("v"),
            )
        )
    )
    w = Window.partitionBy("col_name", "blk").orderBy("event_id")
    adj = cols.withColumn("prev", F.lag("v").over(w)).filter(
        F.col("prev").isNotNull()
    )
    return (
        adj.groupBy("col_name")
        .agg(
            F.count("prev").cast("long").alias("n_pairs"),
            F.round(
                F.sum(F.when(F.col("v") >= F.col("prev"), 1).otherwise(0))
                / F.count("prev"),
                6,
            ).alias("frac_nondecreasing"),
            (
                F.sum(F.when(F.col("v") < F.col("prev"), 1).otherwise(0)) + 1
            )
            .cast("long")
            .alias("est_runs"),
        )
        .orderBy("col_name")
    )


@register(
    "stratified_weighted_sample",
    oracle="""
    WITH scored AS (
        SELECT event_type, event_id, value,
               LN(((((event_id * 1000003 + 7) % 999983) * 40503) % 999983
                   + 0.5) / 999983.0) / value AS es_key
        FROM events WHERE value IS NOT NULL AND value > 0
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY es_key DESC, event_id) AS rnk
        FROM scored
    )
    SELECT event_type, event_id, ROUND(value, 2) AS weight,
           ROUND(es_key, 9) AS es_key
    FROM ranked WHERE rnk <= 5
    ORDER BY event_type, event_id
    """,
)
def q_stratified_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum weighted sampling: an exact Efraimidis-Spirakis
    weighted sample of 5 events per event_type in ONE pass — the
    partitioned top-k generalization of weighted_reservoir_orders
    (rank over a window PARTITIONED by stratum, so each stratum's
    top-k evaluates inside its own hash partition; no stratum ever
    sees another's rows).  The per-key uniform uses the
    mod-prime-then-remultiply mix."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & (F.col("value") > 0))
        .select("event_type", "event_id", "value")
    )
    u = (
        ((F.col("event_id") * 1000003 + 7) % 999983 * 40503 % 999983) + 0.5
    ) / 999983.0
    scored = ev.withColumn("es_key", F.log(u) / F.col("value"))
    w = Window.partitionBy("event_type").orderBy(F.desc("es_key"), "event_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "event_type",
            "event_id",
            F.round("value", 2).alias("weight"),
            F.round("es_key", 9).alias("es_key"),
        )
        .orderBy("event_type", "event_id")
    )


@register(
    "uplift_qini_curve",
    oracle="""
    WITH base AS (
        SELECT event_id, value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
               CAST((user_id * 1000003 + 7) % 999983 * 40503 % 999983 % 2
                    AS INT) AS t
        FROM events WHERE value IS NOT NULL
    ),
    cuts AS (
        SELECT unnest(quantile_cont(value,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS cut
        FROM base
    ),
    d AS (
        SELECT b.event_id, b.y, b.t,
               SUM(CASE WHEN b.value > c.cut THEN 1 ELSE 0 END) AS nd
        FROM base b CROSS JOIN cuts c
        GROUP BY 1, 2, 3
    ),
    dec AS (
        SELECT 10 - nd AS decile_rank,
               SUM(t) AS n_t, SUM(1 - t) AS n_c,
               SUM(y * t) AS y_t, SUM(y * (1 - t)) AS y_c
        FROM d GROUP BY 1
    ),
    cum AS (
        SELECT decile_rank,
               SUM(n_t) OVER w AS cn_t, SUM(n_c) OVER w AS cn_c,
               SUM(y_t) OVER w AS cy_t, SUM(y_c) OVER w AS cy_c
        FROM dec
        WINDOW w AS (ORDER BY decile_rank
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(decile_rank AS INT) AS decile_rank,
           CAST(cn_t AS BIGINT) AS cum_n_treat,
           CAST(cn_c AS BIGINT) AS cum_n_ctrl,
           CAST(cy_t AS BIGINT) AS cum_y_treat,
           CAST(cy_c AS BIGINT) AS cum_y_ctrl,
           ROUND(cy_t - cy_c * cn_t * 1.0 / cn_c, 6) AS qini
    FROM cum ORDER BY decile_rank
    """,
)
def q_uplift_qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve for uplift evaluation: with a deterministic 50/50
    hash split as treatment assignment and purchase as outcome, rank
    events by the value score into exact deciles (cuts from ONE
    percentile aggregate, broadcast — no global sort or ntile) and
    accumulate treated-minus-scaled-control conversions from the top
    decile down.  A near-zero curve is the correct reading for a
    random split — the audit that catches a broken randomizer or a
    confounded score.  All cumulative arithmetic happens on the 10-row
    decile frame."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        (
            (F.col("user_id") * 1000003 + 7) % 999983 * 40503 % 999983 % 2
        )
        .cast("int")
        .alias("t"),
    )
    cuts = base.agg(
        F.percentile(
            "value", F.array(*[F.lit(x / 10.0) for x in range(1, 10)])
        ).alias("cuts")
    )
    dec = (
        base.crossJoin(F.broadcast(cuts))
        .withColumn(
            "nd",
            F.aggregate(
                "cuts",
                F.lit(0),
                lambda acc, c: acc + F.when(F.col("value") > c, 1).otherwise(0),
            ),
        )
        .groupBy((10 - F.col("nd")).alias("decile_rank"))
        .agg(
            F.sum("t").alias("n_t"),
            F.sum(1 - F.col("t")).alias("n_c"),
            F.sum(F.col("y") * F.col("t")).alias("y_t"),
            F.sum(F.col("y") * (1 - F.col("t"))).alias("y_c"),
        )
    )
    w = Window.orderBy("decile_rank").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dec.select(
            "decile_rank",
            F.sum("n_t").over(w).alias("cn_t"),
            F.sum("n_c").over(w).alias("cn_c"),
            F.sum("y_t").over(w).alias("cy_t"),
            F.sum("y_c").over(w).alias("cy_c"),
        )
        .select(
            F.col("decile_rank").cast("int").alias("decile_rank"),
            F.col("cn_t").cast("long").alias("cum_n_treat"),
            F.col("cn_c").cast("long").alias("cum_n_ctrl"),
            F.col("cy_t").cast("long").alias("cum_y_treat"),
            F.col("cy_c").cast("long").alias("cum_y_ctrl"),
            F.round(
                F.col("cy_t") - F.col("cy_c") * F.col("cn_t") / F.col("cn_c"), 6
            ).alias("qini"),
        )
        .orderBy("decile_rank")
    )


@register(
    "mahalanobis_outlier_screen",
    oracle="""
    WITH b AS (
        SELECT event_type, value AS x, CAST(hour(ts) AS DOUBLE) AS y
        FROM events WHERE value IS NOT NULL
    ),
    s AS (
        SELECT AVG(x) AS mx, AVG(y) AS my,
               var_pop(x) AS s11, var_pop(y) AS s22, covar_pop(x, y) AS s12
        FROM b
    ),
    d AS (
        SELECT event_type,
               ((x - mx) * (x - mx) * s22
                - 2 * (x - mx) * (y - my) * s12
                + (y - my) * (y - my) * s11)
               / (s11 * s22 - s12 * s12) AS d2
        FROM b CROSS JOIN s
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN d2 > 9.21034 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           ROUND(SUM(CASE WHEN d2 > 9.21034 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS outlier_rate,
           ROUND(MAX(d2), 4) AS max_d2
    FROM d GROUP BY event_type ORDER BY event_type
    """,
)
def q_mahalanobis_outlier_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate outlier screen: squared Mahalanobis distance of
    (value, hour) against the global mean/covariance, flagged at the
    chi-square(2) 99% cutoff (9.21) and reported per event type — the
    correlation-aware generalization of the per-column z-score screens,
    catching points that are unremarkable marginally but improbable
    JOINTLY (a classic card-fraud shape: mid value at an hour where mid
    values never occur).  The 2x2 covariance inverts in closed form, so
    the whole screen is two scans and a broadcast of five scalars —
    no matrix library, no collect."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = ev.select(
        "event_type",
        F.col("value").alias("x"),
        F.hour("ts").cast("double").alias("y"),
    )
    s = b.agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_pop("x").alias("s11"),
        F.var_pop("y").alias("s22"),
        F.covar_pop("x", "y").alias("s12"),
    )
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    d2 = (
        dx * dx * F.col("s22") - 2 * dx * dy * F.col("s12") + dy * dy * F.col("s11")
    ) / (F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12"))
    return (
        b.crossJoin(F.broadcast(s))
        .select("event_type", d2.alias("d2"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("d2") > 9.21034, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.round(
                F.sum(F.when(F.col("d2") > 9.21034, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("outlier_rate"),
            F.round(F.max("d2"), 4).alias("max_d2"),
        )
        .orderBy("event_type")
    )


@register(
    "shapley_channel_attribution",
    oracle="""
    WITH j AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               BIT_OR(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                      WHEN 'error' THEN 4 WHEN 'signup' THEN 8
                      ELSE 0 END) AS mask,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1, 2
    ),
    vraw AS (SELECT mask, AVG(conv * 1.0) AS v, COUNT(*) AS n FROM j GROUP BY 1),
    v AS (
        SELECT r.range AS mask, COALESCE(vraw.v, 0.0) AS v,
               COALESCE(vraw.n, 0) AS n
        FROM range(0, 16) r LEFT JOIN vraw ON vraw.mask = r.range
    ),
    ch AS (SELECT * FROM (VALUES ('click', 1), ('view', 2), ('error', 4),
                                 ('signup', 8)) c(channel, bit)),
    contrib AS (
        SELECT ch.channel,
               (CASE bit_count(s.mask) WHEN 0 THEN 0.25
                     WHEN 1 THEN 1.0 / 12 WHEN 2 THEN 1.0 / 12
                     ELSE 0.25 END) * (s2.v - s.v) AS delta,
               s.n + s2.n AS support
        FROM ch
        JOIN v s ON (s.mask & ch.bit) = 0
        JOIN v s2 ON s2.mask = (s.mask | ch.bit)
    )
    SELECT channel,
           ROUND(SUM(delta), 6) AS shapley,
           CAST(SUM(support) AS BIGINT) AS support_journeys
    FROM contrib GROUP BY channel ORDER BY channel
    """,
)
def q_shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution over marketing-style channels:
    each user-day journey is a coalition (bitmask of the four
    non-purchase event types present), v(S) = observed conversion rate
    of journeys with exactly that channel set, and each channel's
    Shapley value sums the factorial-weighted marginal contributions
    v(S+i) - v(S) over all 8 coalitions excluding it.  The fact table
    collapses to at most 16 coalition rows in ONE groupBy (a bit_or +
    max aggregate), so the game-theoretic part — usually quoted as
    exponential — costs 32 joined rows regardless of data size;
    unobserved coalitions default to v=0 identically on both engines.
    The data-driven alternative to the positional attribution rules in
    attribution_last_touch / attribution_time_decay."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "error", 4)
        .when(F.col("event_type") == "signup", 8)
        .otherwise(0)
    )
    j = (
        ev.groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(
            F.bit_or(bit).alias("mask"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
        )
    )
    vraw = j.groupBy("mask").agg(
        F.avg(F.col("conv").cast("double")).alias("v"),
        F.count(F.lit(1)).alias("n"),
    )
    v = (
        spark.range(16)
        .select(F.col("id").cast("int").alias("mask"))
        .join(F.broadcast(vraw), "mask", "left")
        .select(
            "mask",
            F.coalesce("v", F.lit(0.0)).alias("v"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    ch = spark.createDataFrame(
        [("click", 1), ("view", 2), ("error", 4), ("signup", 8)],
        ["channel", "bit"],
    )
    s = v.select(
        F.col("mask").alias("m1"), F.col("v").alias("v1"), F.col("n").alias("n1")
    )
    s2 = v.select(
        F.col("mask").alias("m2"), F.col("v").alias("v2"), F.col("n").alias("n2")
    )
    weight = (
        F.when(F.bit_count("m1") == 0, F.lit(0.25))
        .when(F.bit_count("m1") == 1, F.lit(1.0 / 12))
        .when(F.bit_count("m1") == 2, F.lit(1.0 / 12))
        .otherwise(F.lit(0.25))
    )
    contrib = (
        ch.crossJoin(F.broadcast(s))
        .filter(F.col("m1").bitwiseAND(F.col("bit")) == 0)
        .join(
            F.broadcast(s2),
            F.col("m2") == F.col("m1").bitwiseOR(F.col("bit")),
        )
        .select(
            "channel",
            (weight * (F.col("v2") - F.col("v1"))).alias("delta"),
            (F.col("n1") + F.col("n2")).alias("support"),
        )
    )
    return (
        contrib.groupBy("channel")
        .agg(
            F.round(F.sum("delta"), 6).alias("shapley"),
            F.sum("support").cast("long").alias("support_journeys"),
        )
        .orderBy("channel")
    )


@register(
    "retrieval_ndcg_mrr",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % 37 = 0),
    scored AS (
        SELECT q.vec_id AS qid, q.label AS qlab, c.vec_id AS cid,
               CASE WHEN c.label = q.label THEN 1.0 ELSE 0.0 END AS rel,
               ROUND(list_cosine_similarity(q.v, c.v), 6) AS cos
        FROM q JOIN e c ON c.vec_id != q.vec_id
    ),
    ranked AS (
        SELECT qid, rel,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos DESC, cid) AS rnk
        FROM scored
    ),
    nrel AS (
        SELECT qid, LEAST(10, SUM(rel)) AS m FROM scored GROUP BY qid
    ),
    per_q AS (
        SELECT r.qid,
               SUM(CASE WHEN rnk <= 10 THEN rel / log2(rnk + 1)
                        ELSE 0 END) AS dcg,
               (SELECT SUM(1.0 / log2(x + 1))
                FROM unnest(range(1, CAST(MAX(n.m) AS BIGINT) + 1)) t(x))
                   AS idcg,
               MIN(CASE WHEN rel = 1 AND rnk <= 10 THEN rnk END) AS first_rel
        FROM ranked r JOIN nrel n USING (qid)
        GROUP BY r.qid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           ROUND(AVG(dcg / idcg), 6) AS avg_ndcg10,
           ROUND(AVG(COALESCE(1.0 / first_rel, 0.0)), 6) AS avg_mrr10
    FROM per_q
    """,
)
def q_retrieval_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality metrics for the embedding space: treating
    same-label vectors as relevant, rank every candidate per sampled
    query by cosine (rounded to 6 dp BEFORE ranking so both engines
    break the same ties, then by id) and report mean NDCG@10 and
    MRR@10.  Queries are the deterministic 1/37 sample, so the scoring
    join is |queries| x corpus — linear in the corpus with a broadcast
    query side; at 100 TB the candidate generation step swaps in the
    ANN operators (embedding_ann_topk / ivf) and this exact-ranking
    form becomes their quality oracle."""
    from .functions.vectors import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = emb.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlab"),
        F.col("v").alias("qv"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            (F.col("label") == F.col("qlab")).cast("double").alias("rel"),
            F.round(
                dot("qv", "v") / (l2_norm("qv") * l2_norm("v")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "cid")
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    per_q = ranked.groupBy("qid").agg(
        F.sum(
            F.when(
                F.col("rnk") <= 10, F.col("rel") / F.log2(F.col("rnk") + 1)
            ).otherwise(0.0)
        ).alias("dcg"),
        F.least(F.lit(10.0), F.sum("rel")).alias("m"),
        F.min(
            F.when((F.col("rel") == 1) & (F.col("rnk") <= 10), F.col("rnk"))
        ).alias("first_rel"),
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.col("m").cast("int")),
        F.lit(0.0),
        lambda acc, x: acc + 1.0 / F.log2(x.cast("double") + 1),
    )
    return per_q.select(
        "qid", (F.col("dcg") / idcg).alias("ndcg"), "first_rel"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.avg("ndcg"), 6).alias("avg_ndcg10"),
        F.round(
            F.avg(F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0))), 6
        ).alias("avg_mrr10"),
    )


@register(
    "holt_linear_backtest",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ),
    series AS (
        SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, rev FROM daily
    ),
    snaive AS (
        SELECT AVG(ABS(rev - prev7)) AS mae FROM (
            SELECT rev, LAG(rev, 7) OVER (ORDER BY i) AS prev7 FROM series
        ) WHERE prev7 IS NOT NULL
    ),
    -- state AFTER processing day i: l_i, b_i, sum of |one-step errors|
    -- over t=2..i, count i-1.  l2=y2 and b2=y2-y1 follow from l1=y1,
    -- b1=y2-y1 (the forecast of day 2 is exact by construction).
    rec AS (
        SELECT 2 AS i, s2.rev AS l, s2.rev - s1.rev AS b,
               CAST(0.0 AS DOUBLE) AS sae, 1 AS n
        FROM (SELECT rev FROM series WHERE i = 1) s1,
             (SELECT rev FROM series WHERE i = 2) s2
        UNION ALL
        SELECT s.i,
               0.5 * s.rev + 0.5 * (rec.l + rec.b),
               0.3 * ((0.5 * s.rev + 0.5 * (rec.l + rec.b)) - rec.l)
                 + 0.7 * rec.b,
               rec.sae + ABS(rec.l + rec.b - s.rev),
               rec.n + 1
        FROM rec JOIN series s ON s.i = rec.i + 1
    ),
    holt AS (
        SELECT sae / n AS mae FROM rec
        WHERE i = (SELECT MAX(i) FROM series)
    )
    SELECT CAST((SELECT MAX(i) FROM series) AS BIGINT) AS n_days,
           ROUND(holt.mae, 2) AS holt_mae,
           ROUND(snaive.mae, 2) AS snaive_mae,
           ROUND(holt.mae / snaive.mae, 6) AS mae_ratio
    FROM holt CROSS JOIN snaive
    """,
)
def q_holt_linear_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead backtest of Holt's linear-trend smoothing
    (alpha=0.5, beta=0.3, l1=y1, b1=y2-y1) on daily revenue vs the
    seasonal-naive y[t-7] baseline.  The recurrence is inherently
    sequential, so it runs as ONE Arrow task over the CALENDAR-bounded
    daily frame (a few thousand rows forever, regardless of fact size)
    after the distributed daily aggregate — the same hybrid-endgame
    rationale as the graph kernels; the DuckDB twin replays the
    identical recursion as a recursive CTE, so every smoothing step is
    value-checked, not just the summary."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = (
        ev.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )

    def holt_kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d")
        y = pdf["rev"].to_numpy(dtype="float64")
        n = len(y)
        if n < 9:
            return pd.DataFrame(
                {"n_days": [n], "holt_mae": [0.0], "snaive_mae": [0.0],
                 "mae_ratio": [0.0]}
            )
        l, b = y[0], y[1] - y[0]
        sae = 0.0
        cnt = 0
        for t in range(1, n):
            f = l + b
            sae += abs(f - y[t])
            cnt += 1
            l_new = 0.5 * y[t] + 0.5 * (l + b)
            b = 0.3 * (l_new - l) + 0.7 * b
            l = l_new
        holt_mae = sae / cnt
        snaive_mae = float(pd.Series(abs(y[7:] - y[:-7])).mean())
        return pd.DataFrame(
            {
                "n_days": [n],
                "holt_mae": [round(holt_mae, 2)],
                "snaive_mae": [round(snaive_mae, 2)],
                "mae_ratio": [round(holt_mae / snaive_mae, 6)],
            }
        )

    out_schema = (
        "n_days long, holt_mae double, snaive_mae double, mae_ratio double"
    )
    return (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(holt_kernel, schema=out_schema)
        .drop("g")
    )


# ---------------------------------------------------------------------------
# Round-6 tenth wave: sequence analytics (Markov next-event prediction
# backtest, entropy rate) and a GDPR erasure-cascade audit.
# ---------------------------------------------------------------------------


@register(
    "markov_next_event_accuracy",
    oracle="""
    WITH cut AS (SELECT quantile_cont(epoch_us(ts), 0.5) AS c FROM events),
    seq AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
               LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt_ts
        FROM events
    ),
    train AS (
        SELECT event_type AS cur, nxt, COUNT(*) AS n
        FROM seq CROSS JOIN cut
        WHERE nxt IS NOT NULL AND nxt_ts <= c
        GROUP BY 1, 2
    ),
    pred AS (
        SELECT t.cur, MAX(t.nxt) AS predicted
        FROM train t
        JOIN (SELECT cur, MAX(n) AS mx FROM train GROUP BY cur) m
          ON m.cur = t.cur AND t.n = m.mx
        GROUP BY t.cur
    ),
    test AS (
        SELECT s.event_type AS cur, s.nxt
        FROM seq s CROSS JOIN cut
        WHERE s.nxt IS NOT NULL AND s.nxt_ts > c
    )
    SELECT t.cur,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           MAX(p.predicted) AS predicted,
           ROUND(AVG(CASE WHEN t.nxt = p.predicted THEN 1.0 ELSE 0.0 END), 6)
               AS accuracy
    FROM test t JOIN pred p ON p.cur = t.cur
    GROUP BY t.cur ORDER BY t.cur
    """,
)
def q_markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the first-order Markov next-event predictor: learn
    argmax transitions on the first (time) half of each user's
    bigrams, score accuracy on the second half — the sanity bar any
    sequence model must beat.  The temporal split is one percentile
    scalar; train and test share ONE lead-window pass; the learned
    'model' is a |types|^2 frame reduced to |types| rows by
    max_by (ties broken toward the lexicographically larger next type
    identically on both engines).  Broadcast-joined scoring, so the
    test scan never reshuffles."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    cut = ev.agg(F.percentile("ts_us", 0.5).alias("c"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .withColumn("nxt_ts", F.lead("ts_us").over(w))
        .filter(F.col("nxt").isNotNull())
        .crossJoin(F.broadcast(cut))
    )
    train = (
        seq.filter(F.col("nxt_ts") <= F.col("c"))
        .groupBy(F.col("event_type").alias("cur"), "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pred = train.groupBy("cur").agg(
        F.max_by("nxt", F.struct("n", "nxt")).alias("predicted")
    )
    test = seq.filter(F.col("nxt_ts") > F.col("c")).select(
        F.col("event_type").alias("cur"), "nxt"
    )
    return (
        test.join(F.broadcast(pred), "cur")
        .groupBy("cur")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.max("predicted").alias("predicted"),
            F.round(
                F.avg((F.col("nxt") == F.col("predicted")).cast("double")), 6
            ).alias("accuracy"),
        )
        .orderBy("cur")
    )


@register(
    "sequence_entropy_rate",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    joint AS (
        SELECT cur, nxt, CAST(COUNT(*) AS DOUBLE) AS n
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    marg AS (SELECT cur, SUM(n) AS nc FROM joint GROUP BY 1),
    tot AS (SELECT SUM(n) AS n FROM joint)
    SELECT ROUND(-SUM(j.n / t.n * LN(j.n / m.nc)), 6) AS entropy_rate_nats,
           ROUND(-SUM(j.n / t.n * LN(m.nc / t.n)), 6) AS marginal_entropy,
           CAST(t.n AS BIGINT) AS n_bigrams
    FROM joint j JOIN marg m USING (cur) CROSS JOIN tot t
    GROUP BY t.n
    """,
)
def q_sequence_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy RATE of the event-type process — H(next | current) in
    nats — against the marginal entropy H(next): the gap is exactly the
    mutual information the Markov structure captures, i.e. how
    predictable the stream is from one step of memory (the quantity
    that justifies, or kills, sequence features in a fraud model).
    One lead-window pass to bigrams, then everything is
    |types|^2-bounded."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    joint = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    marg = joint.groupBy("cur").agg(F.sum("n").alias("nc"))
    tot = joint.agg(F.sum("n").alias("ntot"))
    return (
        joint.join(F.broadcast(marg), "cur")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                -F.sum(F.col("n") / F.col("ntot") * F.log(F.col("n") / F.col("nc"))),
                6,
            ).alias("entropy_rate_nats"),
            F.round(
                -F.sum(
                    F.col("n") / F.col("ntot") * F.log(F.col("nc") / F.col("ntot"))
                ),
                6,
            ).alias("marginal_entropy"),
            F.max("ntot").cast("long").alias("n_bigrams"),
        )
    )


@register(
    "gdpr_erasure_cascade",
    oracle="""
    WITH victims AS (
        SELECT DISTINCT user_id FROM events
        WHERE (user_id * 1000003 + 7) % 999983 * 40503 % 999983 % 20 = 0
    ),
    ev AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS erased
        FROM events e LEFT JOIN victims v ON v.user_id = e.user_id
    ),
    cu AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS erased
        FROM customer c LEFT JOIN victims v ON v.user_id = c.c_custkey
    ),
    o AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS erased
        FROM orders oo LEFT JOIN victims v ON v.user_id = oo.o_custkey
    ),
    li AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS erased
        FROM lineitem l
        JOIN orders oo ON oo.o_orderkey = l.l_orderkey
        LEFT JOIN victims v ON v.user_id = oo.o_custkey
    )
    SELECT 'customer' AS tbl, total, erased,
           ROUND(erased * 1.0 / total, 6) AS erased_frac FROM cu
    UNION ALL
    SELECT 'events', total, erased, ROUND(erased * 1.0 / total, 6) FROM ev
    UNION ALL
    SELECT 'lineitem', total, erased, ROUND(erased * 1.0 / total, 6) FROM li
    UNION ALL
    SELECT 'orders', total, erased, ROUND(erased * 1.0 / total, 6) FROM o
    ORDER BY tbl
    """,
)
def q_gdpr_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact audit: for a deterministic ~5% sample of
    event users, count how many rows each downstream table would lose
    when the deletion CASCADES through the foreign keys (customer by
    key, orders by custkey, lineitem transitively through its order).
    The victim set BROADCASTS to every fact scan — at 100 TB the
    cascade costs one pass per table with zero shuffles of the facts
    (lineitem needs its usual order join); this is the planning query
    a deletion-vector writer runs before committing tombstones."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    victims = (
        ev.filter(
            (F.col("user_id") * 1000003 + 7) % 999983 * 40503 % 999983 % 20
            == 0
        )
        .select("user_id")
        .distinct()
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("k")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey")
    )

    def audit(df: DataFrame, name: str) -> DataFrame:
        hit = df.join(
            F.broadcast(victims), df.k == victims.user_id, "left"
        )
        return hit.agg(
            F.lit(name).alias("tbl"),
            F.count(F.lit(1)).cast("long").alias("total"),
            F.sum(F.when(F.col("user_id").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("erased"),
        )

    li_keyed = li.join(orders.select("okey", "k"), "okey")
    out = (
        audit(cust, "customer")
        .unionByName(audit(ev.select(F.col("user_id").alias("k")), "events"))
        .unionByName(audit(li_keyed.select("k"), "lineitem"))
        .unionByName(audit(orders.select("k"), "orders"))
    )
    return out.select(
        "tbl",
        "total",
        "erased",
        F.round(F.col("erased") / F.col("total"), 6).alias("erased_frac"),
    ).orderBy("tbl")


@register(
    "sprt_ab_daily",
    oracle="""
    WITH assign AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(user_id * 1000003 % 999983 * 40503 % 999983 % 2 AS INT)
                   AS arm,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    daily AS (
        SELECT d,
               SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS conv_b,
               SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
               SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS conv_a,
               SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a
        FROM assign GROUP BY d
    ),
    llr AS (
        SELECT d,
               ROW_NUMBER() OVER (ORDER BY d) AS day_idx,
               SUM(conv_b * LN(0.22 / 0.20)
                   + (n_b - conv_b) * LN(0.78 / 0.80)) OVER w AS llr_b,
               SUM(conv_a) OVER w AS ca, SUM(n_a) OVER w AS na,
               SUM(conv_b) OVER w AS cb, SUM(n_b) OVER w AS nb
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MIN(llr_b), 4) AS min_llr,
           ROUND(MAX(llr_b), 4) AS max_llr,
           CAST(MIN(CASE WHEN llr_b >= LN(19.0) THEN day_idx END)
                AS BIGINT) AS accept_h1_day,
           CAST(MIN(CASE WHEN llr_b <= -LN(19.0) THEN day_idx END)
                AS BIGINT) AS accept_h0_day,
           ROUND(MAX(cb) * 1.0 / MAX(nb), 6) AS final_rate_b,
           ROUND(MAX(ca) * 1.0 / MAX(na), 6) AS final_rate_a
    FROM llr
    """,
)
def q_sprt_ab_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential probability ratio test replayed day by day: arm B's
    cumulative log-likelihood ratio for H1 (p=0.22) vs H0 (p=0.20)
    against Wald's alpha=beta=0.05 boundaries (+/- ln 19), reporting the
    first day either boundary is crossed — the always-valid alternative
    to peeking at a fixed-horizon test.  One scan to daily arm totals;
    the sequential replay is windows over the calendar-bounded daily
    frame.  On this null data (hash split, no real effect) the
    expected reading is an H0 accept or no decision."""
    ev = load_table(spark, sf_dir, "events").select("ts", "user_id", "event_type")
    assign = ev.select(
        F.to_date("ts").alias("d"),
        (F.col("user_id") * 1000003 % 999983 * 40503 % 999983 % 2)
        .cast("int")
        .alias("arm"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    daily = assign.groupBy("d").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)).alias("conv_b"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
    )
    import math

    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wd = Window.orderBy("d")
    llr = daily.select(
        "d",
        (
            F.sum(
                F.col("conv_b") * math.log(0.22 / 0.20)
                + (F.col("n_b") - F.col("conv_b")) * math.log(0.78 / 0.80)
            ).over(w)
        ).alias("llr_b"),
        F.sum("conv_a").over(w).alias("ca"),
        F.sum("n_a").over(w).alias("na"),
        F.sum("conv_b").over(w).alias("cb"),
        F.sum("n_b").over(w).alias("nb"),
        F.row_number().over(wd).alias("day_idx"),
    )
    bound = math.log(19.0)
    return llr.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.min("llr_b"), 4).alias("min_llr"),
        F.round(F.max("llr_b"), 4).alias("max_llr"),
        F.min(F.when(F.col("llr_b") >= bound, F.col("day_idx")))
        .cast("long")
        .alias("accept_h1_day"),
        F.min(F.when(F.col("llr_b") <= -bound, F.col("day_idx")))
        .cast("long")
        .alias("accept_h0_day"),
        F.round(F.max("cb") / F.max("nb"), 6).alias("final_rate_b"),
        F.round(F.max("ca") / F.max("na"), 6).alias("final_rate_a"),
    )


@register(
    "late_data_backfill_windows",
    oracle="""
    WITH a AS (
        SELECT epoch_us(ts) AS ts_us,
               epoch_us(ts)
                 + (((((event_id * 1000003 + 7) % 999983) * 40503)
                     % 999983) % 86400) * 1000000 AS arr_us
        FROM events
    ),
    wm AS (SELECT * FROM (VALUES (3600), (21600), (86400)) w(wm_s)),
    win AS (
        SELECT wm_s, ts_us // CAST(21600000000 AS BIGINT) AS w6h,
               MAX(CASE WHEN arr_us > (ts_us // CAST(21600000000 AS BIGINT)
                        + 1) * CAST(21600000000 AS BIGINT)
                        + wm_s * CAST(1000000 AS BIGINT)
                   THEN 1 ELSE 0 END) AS dirty,
               SUM(CASE WHEN arr_us > (ts_us // CAST(21600000000 AS BIGINT)
                        + 1) * CAST(21600000000 AS BIGINT)
                        + wm_s * CAST(1000000 AS BIGINT)
                   THEN 1 ELSE 0 END) AS late_ev,
               COUNT(*) AS ev
        FROM a CROSS JOIN wm
        GROUP BY 1, 2
    )
    SELECT wm_s AS watermark_s,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(dirty) AS BIGINT) AS dirty_windows,
           ROUND(SUM(dirty) * 1.0 / COUNT(*), 6) AS dirty_frac,
           CAST(SUM(late_ev) AS BIGINT) AS dropped_events,
           ROUND(SUM(late_ev) * 1.0 / SUM(ev), 6) AS dropped_frac
    FROM win GROUP BY wm_s ORDER BY wm_s
    """,
)
def q_late_data_backfill_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill planning for a 6-hour tumbling aggregation: under each
    candidate watermark (1h / 6h / 24h), a window is DIRTY if any of
    its events arrives after the window closes at end + watermark —
    those are the windows a batch backfill job must recompute.  Uses
    the same deterministic simulated-arrival convention as the lateness
    audits.  One scan fanned 3x by the broadcast watermark list, one
    groupBy on (watermark, window) — the cost table that turns the
    watermark_recommendation percentile into an ops decision."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts_ns div 1000").alias("ts_us"),
        F.expr(
            "ts_ns div 1000"
            " + ((((event_id * 1000003 + 7) % 999983) * 40503 % 999983)"
            " % 86400) * 1000000"
        ).alias("arr_us"),
    )
    wm = spark.createDataFrame([(3600,), (21600,), (86400,)], ["wm_s"])
    win_us = 21600 * 1000000
    win = (
        ev.crossJoin(F.broadcast(wm))
        .groupBy(
            "wm_s",
            F.expr(f"ts_us div {win_us}").alias("w6h"),
        )
        .agg(
            F.max(
                F.when(
                    F.col("arr_us")
                    > (F.expr(f"ts_us div {win_us}") + 1) * win_us
                    + F.col("wm_s") * 1000000,
                    1,
                ).otherwise(0)
            ).alias("dirty"),
            F.sum(
                F.when(
                    F.col("arr_us")
                    > (F.expr(f"ts_us div {win_us}") + 1) * win_us
                    + F.col("wm_s") * 1000000,
                    1,
                ).otherwise(0)
            ).alias("late_ev"),
            F.count(F.lit(1)).alias("ev"),
        )
    )
    return (
        win.groupBy(F.col("wm_s").alias("watermark_s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum("dirty").cast("long").alias("dirty_windows"),
            F.round(F.sum("dirty") / F.count(F.lit(1)), 6).alias("dirty_frac"),
            F.sum("late_ev").cast("long").alias("dropped_events"),
            F.round(F.sum("late_ev") / F.sum("ev"), 6).alias("dropped_frac"),
        )
        .orderBy("watermark_s")
    )


@register(
    "streaming_state_cost_model",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               COUNT(DISTINCT user_id) AS active_keys,
               COUNT(*) AS events
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(active_keys), 4) AS avg_active_keys_24h,
           ROUND(AVG(events * 1.0 / active_keys), 6) AS events_per_key_24h,
           ROUND(AVG(events * 1.0 / active_keys) * 8, 4)
               AS state_bytes_per_key,
           ROUND(AVG(active_keys) * AVG(events * 1.0 / active_keys) * 8
                 / 1048576.0, 6) AS state_mb
    FROM d GROUP BY event_type ORDER BY event_type
    """,
)
def q_streaming_state_cost_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity model for the exact streaming velocity operator
    (streaming/velocity.py keeps the trailing-24h timestamps per
    ACTIVE key, 8 bytes each, watermark-evicted): measure, per event
    type, the average daily active-key count and events-per-key — the
    two factors whose product IS the operator's state footprint —
    and project total state MB.  All measured quantities (no magic
    rates); scaling the projection to a 1000x stream is multiplying
    the key count, which is why the operator's docstring bounds state
    by active keys, not stream length.  One groupBy to the per-day
    frame, one aggregate of it."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "user_id")
    d = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("active_keys"),
            F.count(F.lit(1)).alias("events"),
        )
    )
    epk = F.avg(F.col("events") / F.col("active_keys"))
    return (
        d.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.avg("active_keys"), 4).alias("avg_active_keys_24h"),
            F.round(epk, 6).alias("events_per_key_24h"),
            F.round(epk * 8, 4).alias("state_bytes_per_key"),
            F.round(
                F.avg("active_keys") * epk * 8 / 1048576.0, 6
            ).alias("state_mb"),
        )
        .orderBy("event_type")
    )


@register(
    "discrete_hazard_weekly",
    oracle="""
    WITH span AS (
        SELECT user_id,
               (epoch_us(MIN(ts)) // CAST(604800000000 AS BIGINT)) AS w0,
               (epoch_us(MAX(ts)) // CAST(604800000000 AS BIGINT)) AS w1
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(w1) AS wmax FROM span),
    tenure AS (
        -- churn week = tenure at last activity; users still active in
        -- the final observed week are right-censored
        SELECT CAST(w1 - w0 AS INT) AS churn_week,
               CASE WHEN w1 >= h.wmax THEN 1 ELSE 0 END AS censored
        FROM span CROSS JOIN horizon h
    ),
    weeks AS (
        SELECT CAST(r.range AS INT) AS wk FROM range(0, 64) r
        WHERE r.range <= (SELECT MAX(churn_week) FROM tenure)
    ),
    haz AS (
        SELECT wk,
               SUM(CASE WHEN t.churn_week >= wk THEN 1 ELSE 0 END) AS at_risk,
               SUM(CASE WHEN t.churn_week = wk AND t.censored = 0
                   THEN 1 ELSE 0 END) AS churned
        FROM weeks w JOIN tenure t ON t.churn_week >= w.wk
        GROUP BY wk
    ),
    surv AS (
        SELECT wk, at_risk, churned,
               churned * 1.0 / at_risk AS hazard,
               EXP(SUM(LN(1 - churned * 1.0 / at_risk)) OVER (
                   ORDER BY wk ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)) AS survival
        FROM haz WHERE at_risk > 0
    )
    SELECT wk, CAST(at_risk AS BIGINT) AS at_risk,
           CAST(churned AS BIGINT) AS churned,
           ROUND(hazard, 6) AS hazard,
           ROUND(survival, 6) AS survival
    FROM surv WHERE wk <= 10 ORDER BY wk
    """,
)
def q_discrete_hazard_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn survival: per tenure week, the hazard
    (churners / users still at risk) and the Kaplan-Meier-style
    survival product, with users active in the final observed week
    right-censored — the actuarial view of retention that the
    retention-triangle query reads off descriptively.  The fact table
    reduces to one (first, last) row per user; the 64-row week frame
    BROADCASTS against it (never the user frame the other way), the
    life table is tenure-bounded, and the survival product is
    exp-sum-log over it."""
    wk_us = 604800000000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"(ts_ns div 1000) div {wk_us}").alias("w")
    )
    span = ev.groupBy("user_id").agg(
        F.min("w").alias("w0"), F.max("w").alias("w1")
    )
    horizon = span.agg(F.max("w1").alias("wmax"))
    tenure = span.crossJoin(F.broadcast(horizon)).select(
        (F.col("w1") - F.col("w0")).cast("int").alias("churn_week"),
        F.when(F.col("w1") >= F.col("wmax"), 1).otherwise(0).alias("censored"),
    )
    mx = tenure.agg(F.max("churn_week").alias("m"))
    weeks = (
        spark.range(64)
        .select(F.col("id").cast("int").alias("wk"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("wk") <= F.col("m"))
        .select("wk")
    )
    haz = (
        tenure.join(
            F.broadcast(weeks), tenure.churn_week >= weeks.wk, "inner"
        )
        .groupBy("wk")
        .agg(
            F.count(F.lit(1)).alias("at_risk"),
            F.sum(
                F.when(
                    (F.col("churn_week") == F.col("wk"))
                    & (F.col("censored") == 0),
                    1,
                ).otherwise(0)
            ).alias("churned"),
        )
        .filter(F.col("at_risk") > 0)
    )
    w = Window.orderBy("wk").rowsBetween(Window.unboundedPreceding, 0)
    return (
        haz.withColumn("hazard", F.col("churned") / F.col("at_risk"))
        .withColumn(
            "survival", F.exp(F.sum(F.log(1 - F.col("hazard"))).over(w))
        )
        .filter(F.col("wk") <= 10)
        .select(
            "wk",
            F.col("at_risk").cast("long").alias("at_risk"),
            F.col("churned").cast("long").alias("churned"),
            F.round("hazard", 6).alias("hazard"),
            F.round("survival", 6).alias("survival"),
        )
        .orderBy("wk")
    )


@register(
    "overdispersion_user_daily",
    oracle="""
    WITH d AS (
        SELECT event_type, user_id, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS DOUBLE) AS n
        FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_user_days,
           ROUND(AVG(n), 6) AS mean_daily,
           ROUND(var_pop(n), 6) AS var_daily,
           ROUND(var_pop(n) / AVG(n), 6) AS fano,
           CASE WHEN var_pop(n) / AVG(n) > 1.5 THEN 'overdispersed'
                WHEN var_pop(n) / AVG(n) < 0.67 THEN 'underdispersed'
                ELSE 'poisson_like' END AS verdict
    FROM d GROUP BY event_type ORDER BY event_type
    """,
)
def q_overdispersion_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion check on per-user daily counts: the Fano factor
    (variance / mean) is 1 for a Poisson process, >1 for bursty
    (negative-binomial) traffic — the test that decides whether rate
    alerts need a dispersion parameter.  Complements
    interarrival_fit_by_type's cv² dial with the count-domain view.
    One groupBy to user-day counts, one moment aggregate per type."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    d = (
        ev.groupBy("event_type", "user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    fano = F.var_pop("n") / F.avg("n")
    return (
        d.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_user_days"),
            F.round(F.avg("n"), 6).alias("mean_daily"),
            F.round(F.var_pop("n"), 6).alias("var_daily"),
            F.round(fano, 6).alias("fano"),
            F.when(fano > 1.5, F.lit("overdispersed"))
            .when(fano < 0.67, F.lit("underdispersed"))
            .otherwise(F.lit("poisson_like"))
            .alias("verdict"),
        )
        .orderBy("event_type")
    )


@register(
    "join_fanout_audit",
    oracle="""
    WITH co AS (
        SELECT 'customer->orders' AS edge, c.c_custkey AS k,
               COUNT(o.o_orderkey) AS fan
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    ol AS (
        SELECT 'orders->lineitem', o.o_orderkey,
               COUNT(l.l_orderkey)
        FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    pl AS (
        SELECT 'part->lineitem', p.p_partkey,
               COUNT(l.l_orderkey)
        FROM part p LEFT JOIN lineitem l ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    uni AS (
        SELECT * FROM co UNION ALL SELECT * FROM ol
        UNION ALL SELECT * FROM pl
    )
    SELECT edge,
           CAST(COUNT(*) AS BIGINT) AS n_left_keys,
           ROUND(AVG(fan), 6) AS avg_fanout,
           CAST(MAX(fan) AS BIGINT) AS max_fanout,
           ROUND(SUM(CASE WHEN fan = 0 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS orphan_frac
    FROM uni GROUP BY edge ORDER BY edge
    """,
)
def q_join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality audit for the schema's three FK edges: average
    and worst-case fanout (output rows per left key) plus the orphan
    fraction — the numbers that predict a join's output size and spot
    the skewed key that will straggle a 1000-executor shuffle BEFORE
    running it.  Each edge is one aggregated count on the fact side
    joined to the dimension, so the audit costs a fraction of the join
    it de-risks."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("ck")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("lok"), F.col("l_partkey").alias("lpk")
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk")
    )

    def edge(left: DataFrame, lk: str, fact_counts: DataFrame, fk: str,
             name: str) -> DataFrame:
        joined = left.join(
            fact_counts, left[lk] == fact_counts[fk], "left"
        ).select(F.coalesce(F.col("fan"), F.lit(0)).alias("fan"))
        return joined.agg(
            F.lit(name).alias("edge"),
            F.count(F.lit(1)).cast("long").alias("n_left_keys"),
            F.round(F.avg("fan"), 6).alias("avg_fanout"),
            F.max("fan").cast("long").alias("max_fanout"),
            F.round(
                F.sum(F.when(F.col("fan") == 0, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("orphan_frac"),
        )

    ord_per_cust = orders.groupBy("ck").agg(F.count(F.lit(1)).alias("fan"))
    li_per_ord = li.groupBy("lok").agg(F.count(F.lit(1)).alias("fan"))
    li_per_part = li.groupBy("lpk").agg(F.count(F.lit(1)).alias("fan"))
    out = (
        edge(cust, "k", ord_per_cust, "ck", "customer->orders")
        .unionByName(edge(orders.select("okey"), "okey", li_per_ord, "lok",
                          "orders->lineitem"))
        .unionByName(edge(part, "pk", li_per_part, "lpk", "part->lineitem"))
    )
    return out.orderBy("edge")


@register(
    "wasserstein1_value_types",
    oracle="""
    WITH u AS (
        SELECT value AS k,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
        FROM events
        WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
        GROUP BY value
    ),
    c AS (
        SELECT k,
               LEAD(k) OVER (ORDER BY k) AS k_next,
               CAST(SUM(ca) OVER (ORDER BY k) AS DOUBLE) / SUM(ca) OVER ()
               - CAST(SUM(cb) OVER (ORDER BY k) AS DOUBLE)
                 / SUM(cb) OVER () AS diff,
               SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
        FROM u
    )
    SELECT ROUND(SUM(ABS(diff) * (k_next - k)), 6) AS w1,
           ROUND(MAX(ABS(diff)), 6) AS ks,
           CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b
    FROM c WHERE k_next IS NOT NULL
    """,
)
def q_wasserstein1_value_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between the 'view'
    and 'purchase' value distributions — the integral of |ECDF_a -
    ECDF_b| over the value axis, i.e. the AREA between the CDFs where
    KS is only their widest gap; W1 is the drift measure that weighs
    HOW FAR mass moved, not just whether it did.  Same
    distinct-value-frame ECDF machinery as ks_value_types (hash-agg
    collapse first, ordered pass over |distinct| rows), with the
    segment-width lead completing the integral.  Reported next to KS
    so the two disagree exactly when drift is diffuse."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
        & F.col("value").isNotNull()
    )
    u = (
        ev.groupBy(F.col("value").alias("k"))
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
                "ca"
            ),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("cb"),
        )
    )
    wo = Window.orderBy("k")
    wall = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = u.select(
        "k",
        F.lead("k").over(wo).alias("k_next"),
        (
            F.sum("ca").over(wo).cast("double") / F.sum("ca").over(wall)
            - F.sum("cb").over(wo).cast("double") / F.sum("cb").over(wall)
        ).alias("diff"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    return c.filter(F.col("k_next").isNotNull()).agg(
        F.round(F.sum(F.abs(F.col("diff")) * (F.col("k_next") - F.col("k"))), 6).alias(
            "w1"
        ),
        F.round(F.max(F.abs("diff")), 6).alias("ks"),
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
    )


@register(
    "prefixspan_type_patterns",
    oracle="""
    WITH ut AS (
        SELECT user_id, event_type, COUNT(*) AS cnt,
               MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
        FROM events GROUP BY 1, 2
    ),
    nu AS (SELECT COUNT(DISTINCT user_id) AS n FROM events),
    singles AS (
        SELECT event_type AS pattern, COUNT(*) AS freq FROM ut GROUP BY 1
    ),
    pairs AS (
        -- subsequence <a then b>, a != b: some a-occurrence strictly
        -- before some b-occurrence, i.e. first(a) < last(b)
        SELECT a.event_type || '>' || b.event_type AS pattern,
               COUNT(*) AS freq
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type != b.event_type
         AND a.first_us < b.last_us
        GROUP BY 1
    ),
    self_pairs AS (
        -- <a then a>: any two distinct occurrences are time-ordered
        SELECT event_type || '>' || event_type AS pattern,
               COUNT(*) AS freq
        FROM ut WHERE cnt >= 2 GROUP BY 1
    ),
    uni AS (SELECT * FROM singles UNION ALL SELECT * FROM pairs
            UNION ALL SELECT * FROM self_pairs)
    SELECT pattern, CAST(freq AS BIGINT) AS freq
    FROM uni CROSS JOIN nu
    WHERE freq >= CEIL(0.6 * n)
    ORDER BY pattern
    """,
)
def q_prefixspan_type_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining via MLlib's distributed PrefixSpan
    (projected-database recursion — PFP's ordered cousin) over each
    user's time-ordered event-type sequence at 60% support, reported
    for pattern lengths <= 2 where the SQL twin enumerates supports
    EXACTLY (an <a then b> subsequence exists iff the user's first a
    precedes their last b; <a then a> iff a occurs at least twice), so
    the comparable frame is complete.  At 100 TB the per-user sequence collect_list is the
    only fact shuffle; mining runs on projected suffixes."""
    from pyspark.ml.fpm import PrefixSpan

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqs = (
        ev.withColumn("pos", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "event_type"))
                ),
                lambda s: F.array(s["event_type"]),
            ).alias("sequence")
        )
    )
    ps = PrefixSpan(
        minSupport=0.6, maxPatternLength=2, sequenceCol="sequence"
    )
    found = ps.findFrequentSequentialPatterns(seqs)
    return (
        found.select(
            F.array_join(
                F.transform("sequence", lambda s: F.array_join(s, "+")), ">"
            ).alias("pattern"),
            F.col("freq").cast("long").alias("freq"),
        )
        .orderBy("pattern")
    )


@register(
    "embedding_dimension_health",
    oracle="""
    WITH dims AS (
        SELECT u.dim, u.x
        FROM embeddings e,
             LATERAL (SELECT generate_subscripts(e.embedding, 1) AS dim,
                             UNNEST(e.embedding::DOUBLE[]) AS x) u
    ),
    per_dim AS (
        SELECT dim, AVG(x) AS mu, stddev_pop(x) AS sd,
               AVG(CASE WHEN ABS(x) < 1e-6 THEN 1.0 ELSE 0.0 END) AS zero_frac
        FROM dims GROUP BY dim
    ),
    med AS (SELECT quantile_cont(sd, 0.5) AS med_sd FROM per_dim)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
           ROUND(MIN(sd), 6) AS min_sd,
           ROUND(MAX(sd), 6) AS max_sd,
           ROUND(MAX(med_sd), 6) AS median_sd,
           CAST(SUM(CASE WHEN sd < 0.1 * med_sd THEN 1 ELSE 0 END)
                AS BIGINT) AS dead_dims,
           ROUND(MAX(ABS(mu)), 6) AS max_abs_mean,
           ROUND(MAX(zero_frac), 6) AS max_zero_frac
    FROM per_dim CROSS JOIN med
    """,
)
def q_embedding_dimension_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health screen: a DEAD dimension (std
    under 10% of the median dimension std — a scale-free cutoff), a
    biased one (large |mean|), or a mostly-zero one wastes index space
    and distorts cosine geometry; this is the checkup run before
    building an ANN index or quantizing.  posexplode fans each vector
    to (dim, x) pairs map-side; everything after the per-dim aggregate
    is 64 rows.  Complements embedding_isotropy_audit's global
    anisotropy with the per-coordinate view."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.posexplode(F.transform("embedding", lambda v: v.cast("double"))).alias(
            "dim0", "x"
        )
    )
    per_dim = (
        emb.select((F.col("dim0") + 1).alias("dim"), "x")
        .groupBy("dim")
        .agg(
            F.avg("x").alias("mu"),
            F.stddev_pop("x").alias("sd"),
            F.avg(
                F.when(F.abs(F.col("x")) < 1e-6, 1.0).otherwise(0.0)
            ).alias("zero_frac"),
        )
    )
    med = per_dim.agg(F.percentile("sd", 0.5).alias("med_sd"))
    return per_dim.crossJoin(F.broadcast(med)).agg(
        F.count(F.lit(1)).cast("long").alias("n_dims"),
        F.round(F.min("sd"), 6).alias("min_sd"),
        F.round(F.max("sd"), 6).alias("max_sd"),
        F.round(F.max("med_sd"), 6).alias("median_sd"),
        F.sum(F.when(F.col("sd") < 0.1 * F.col("med_sd"), 1).otherwise(0))
        .cast("long")
        .alias("dead_dims"),
        F.round(F.max(F.abs("mu")), 6).alias("max_abs_mean"),
        F.round(F.max("zero_frac"), 6).alias("max_zero_frac"),
    )


@register(
    "chow_break_test_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS y
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT ROW_NUMBER() OVER (ORDER BY d) * 1.0 AS x, y FROM daily
    ),
    n AS (SELECT COUNT(*) AS n, CAST(COUNT(*) // 2 AS DOUBLE) AS brk
          FROM idx),
    seg AS (
        SELECT CASE WHEN x <= n.brk THEN 0 ELSE 1 END AS s, x, y
        FROM idx CROSS JOIN n
    ),
    fits AS (
        -- closed-form OLS SSR per segment and pooled (s = 2)
        SELECT s, COUNT(*) AS m,
               var_pop(y) * COUNT(*)
                 - POWER(covar_pop(x, y), 2) / var_pop(x) * COUNT(*) AS ssr
        FROM seg GROUP BY s
        UNION ALL
        SELECT 2, COUNT(*),
               var_pop(y) * COUNT(*)
                 - POWER(covar_pop(x, y), 2) / var_pop(x) * COUNT(*)
        FROM seg
    ),
    agg AS (
        SELECT
            MAX(CASE WHEN s = 2 THEN ssr END) AS ssr_pooled,
            SUM(CASE WHEN s < 2 THEN ssr ELSE 0 END) AS ssr_split,
            MAX(CASE WHEN s = 2 THEN m END) AS n
        FROM fits
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(ssr_pooled / 1e6, 3) AS ssr_pooled_m,
           ROUND(ssr_split / 1e6, 3) AS ssr_split_m,
           ROUND(((ssr_pooled - ssr_split) / 2)
                 / (ssr_split / (n - 4)), 6) AS chow_f,
           ((ssr_pooled - ssr_split) / 2) / (ssr_split / (n - 4)) > 3.0
               AS break_suspected
    FROM agg
    """,
)
def q_chow_break_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break test on the daily revenue trend: fit OLS
    y~x pooled and separately on each half (break at the midpoint),
    and compare via the F-statistic ((SSR_p - SSR_1 - SSR_2)/k) /
    (SSR_split/(n-2k)) — the econometric screen for 'did the trend
    regime change'.  Every fit is CLOSED FORM from var/covar moments
    (SSR = n*(var_y - cov²/var_x)), so the whole test is two moment
    aggregates over the calendar-bounded daily frame; no iterative
    solver.  SSRs are reported in millions at 3 dp — at ~1e14 raw
    magnitude, finer rounding sits inside double sum-order noise (the
    stl_lite lesson)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("y")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("d")).cast("double").alias("x"), "y"
    )
    n = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.count(F.lit(1)) / 2).cast("double").alias("brk"),
    )
    seg = idx.crossJoin(F.broadcast(n)).select(
        F.when(F.col("x") <= F.col("brk"), 0).otherwise(1).alias("s"), "x", "y"
    )
    ssr = (
        F.var_pop("y") * F.count(F.lit(1))
        - F.pow(F.covar_pop("x", "y"), 2) / F.var_pop("x") * F.count(F.lit(1))
    )
    fits = (
        seg.groupBy("s")
        .agg(F.count(F.lit(1)).alias("m"), ssr.alias("ssr"))
        .unionByName(
            seg.agg(
                F.lit(2).alias("s"), F.count(F.lit(1)).alias("m"), ssr.alias("ssr")
            )
        )
    )
    agg = fits.agg(
        F.max(F.when(F.col("s") == 2, F.col("ssr"))).alias("ssr_pooled"),
        F.sum(F.when(F.col("s") < 2, F.col("ssr")).otherwise(0.0)).alias(
            "ssr_split"
        ),
        F.max(F.when(F.col("s") == 2, F.col("m"))).alias("n"),
    )
    chow = ((F.col("ssr_pooled") - F.col("ssr_split")) / 2) / (
        F.col("ssr_split") / (F.col("n") - 4)
    )
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("ssr_pooled") / 1e6, 3).alias("ssr_pooled_m"),
        F.round(F.col("ssr_split") / 1e6, 3).alias("ssr_split_m"),
        F.round(chow, 6).alias("chow_f"),
        (chow > 3.0).alias("break_suspected"),
    )


# ---------------------------------------------------------------------------
# Round-7 first wave: graph similarity + community structure
# (neighborhood Jaccard, synchronous label propagation), hybrid-ranking
# fusion (RRF), Gopher-style repetition quality rules, Page-Hinkley
# sequential drift, inter-rater agreement (kappa/MCC), and a
# seasonal-naive forecast error panel (MAPE/sMAPE/MASE).
# ---------------------------------------------------------------------------


@register(
    "neighborhood_jaccard_coparts",
    oracle="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    w AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM d a JOIN d b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    adj AS (SELECT u AS x, v AS y FROM w UNION ALL SELECT v, u FROM w),
    deg AS (SELECT x AS node, COUNT(*) AS deg FROM adj GROUP BY 1),
    com AS (
        SELECT l.x AS u, r.x AS v, COUNT(*) AS common
        FROM adj l JOIN adj r ON l.y = r.y AND l.x < r.x
        GROUP BY 1, 2
    )
    SELECT CAST(c.u AS BIGINT) AS u, CAST(c.v AS BIGINT) AS v,
           CAST(c.common AS BIGINT) AS common,
           CAST(du.deg AS BIGINT) AS deg_u, CAST(dv.deg AS BIGINT) AS deg_v,
           ROUND(c.common * 1.0 / (du.deg + dv.deg - c.common), 6) AS jaccard
    FROM com c
    JOIN deg du ON du.node = c.u
    JOIN deg dv ON dv.node = c.v
    ORDER BY jaccard DESC, u, v LIMIT 20
    """,
)
def q_neighborhood_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part pairs by Jaccard similarity of their open
    neighborhoods in the repeat-co-purchase graph (edges = part pairs
    sharing >= 2 orders) — the link-prediction / substitute-product
    primitive that complements adamic_adar.  The weight>=2 prefilter is
    the scale governor: it keeps the graph at the stable "repeatedly
    co-bought" core (3.4k edges at sf0.01 AND sf0.1 — scale-free by
    construction), so the common-neighbor wedge join is Sum_m C(deg_m,2)
    over bounded degrees; on an uncapped power-law graph the same
    operator would first need the degree-cap/hub-split treatment
    documented at triangle_count.  Ordering is on the ROUNDED score with
    (u, v) tie-breaks so the limit-20 boundary is cross-engine
    deterministic."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    und = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
    )
    adj = und.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        und.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    deg = adj.groupBy(F.col("x").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    com = (
        adj.alias("l")
        .join(adj.alias("r"), F.col("l.y") == F.col("r.y"))
        .filter(F.col("l.x") < F.col("r.x"))
        .groupBy(F.col("l.x").alias("u"), F.col("r.x").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    j = (
        com.join(
            deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u")),
            "u",
        )
        .join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v")),
            "v",
        )
        .select(
            F.col("u").cast("long").alias("u"),
            F.col("v").cast("long").alias("v"),
            F.col("common").cast("long").alias("common"),
            F.col("deg_u").cast("long").alias("deg_u"),
            F.col("deg_v").cast("long").alias("deg_v"),
            F.round(
                F.col("common")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )
    return j.orderBy(F.desc("jaccard"), "u", "v").limit(20)


@register(
    "label_propagation_communities",
    oracle="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    w AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM d a JOIN d b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    adj AS (SELECT u AS x, v AS y FROM w UNION ALL SELECT v, u FROM w),
    l0 AS (SELECT DISTINCT x AS node, x AS lab FROM adj),
    l1 AS (
        SELECT node, lab FROM (
            SELECT a.x AS node, l.lab, COUNT(*) AS c,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.x ORDER BY COUNT(*) DESC, l.lab) AS rn
            FROM adj a JOIN l0 l ON l.node = a.y GROUP BY a.x, l.lab
        ) WHERE rn = 1
    ),
    l2 AS (
        SELECT node, lab FROM (
            SELECT a.x AS node, l.lab, COUNT(*) AS c,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.x ORDER BY COUNT(*) DESC, l.lab) AS rn
            FROM adj a JOIN l1 l ON l.node = a.y GROUP BY a.x, l.lab
        ) WHERE rn = 1
    ),
    l3 AS (
        SELECT node, lab FROM (
            SELECT a.x AS node, l.lab, COUNT(*) AS c,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.x ORDER BY COUNT(*) DESC, l.lab) AS rn
            FROM adj a JOIN l2 l ON l.node = a.y GROUP BY a.x, l.lab
        ) WHERE rn = 1
    ),
    l4 AS (
        SELECT node, lab FROM (
            SELECT a.x AS node, l.lab, COUNT(*) AS c,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.x ORDER BY COUNT(*) DESC, l.lab) AS rn
            FROM adj a JOIN l3 l ON l.node = a.y GROUP BY a.x, l.lab
        ) WHERE rn = 1
    ),
    sizes AS (SELECT lab, COUNT(*) AS sz FROM l4 GROUP BY lab)
    SELECT CAST(sz AS BIGINT) AS community_size,
           CAST(COUNT(*) AS BIGINT) AS n_communities
    FROM sizes GROUP BY sz ORDER BY community_size
    """,
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (4 fixed rounds, tie -> smallest
    label) over the repeat-co-purchase part graph; output is the
    community-size histogram.  Deterministic by construction: the
    update is argmax-count-min-label, expressed as
    ``max_by(lab, struct(cnt, -lab))`` — the same tie-break convention
    as every carried-value operator in this repo — and the DuckDB twin
    unrolls the identical four rounds as chained CTEs, value-checking
    every propagation step's fixpoint rather than just modularity.
    Scale: one shuffle join + two hash aggs per round over the
    weight>=2 core (bounded, see neighborhood_jaccard_coparts); at a
    web-scale edge list the loop gains checkpoint truncation every few
    rounds exactly like pagerank's."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    und = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
    )
    adj = und.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        und.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    labels = (
        adj.select("x").distinct().select(
            F.col("x").alias("node"), F.col("x").alias("lab")
        )
    )
    for _ in range(4):
        nb = adj.join(
            labels.withColumnRenamed("node", "y"), "y"
        ).select(F.col("x").alias("node"), "lab")
        cnt = nb.groupBy("node", "lab").agg(F.count(F.lit(1)).alias("cnt"))
        labels = cnt.groupBy("node").agg(
            F.expr("max_by(lab, struct(cnt, -lab))").alias("lab")
        )
    sizes = labels.groupBy("lab").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy(F.col("sz").cast("long").alias("community_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_communities"))
        .orderBy("community_size")
    )


@register(
    "rrf_fusion_search",
    oracle=r"""
    WITH tk AS (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
        FROM documents
    ),
    dl AS (SELECT doc_id, len(toks) AS dl FROM tk),
    st AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, t AS term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS t FROM tk)
        WHERE t IN ('hash', 'join', 'vector')
        GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    sc AS (
        SELECT tf.doc_id,
               ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl)) AS s
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN st
    ),
    bmtop AS (
        SELECT doc_id, ROUND(SUM(s), 4) AS bm25
        FROM sc GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 20
    ),
    r1 AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r1
        FROM bmtop
    ),
    richtop AS (
        SELECT doc_id, len(list_distinct(toks)) AS nt
        FROM tk ORDER BY nt DESC, doc_id LIMIT 20
    ),
    r2 AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY nt DESC, doc_id) AS r2
        FROM richtop
    )
    SELECT COALESCE(r1.doc_id, r2.doc_id) AS doc_id,
           CAST(r1.r1 AS BIGINT) AS bm25_rank,
           CAST(r2.r2 AS BIGINT) AS rich_rank,
           ROUND(COALESCE(1.0 / (60 + r1.r1), 0.0)
                 + COALESCE(1.0 / (60 + r2.r2), 0.0), 6) AS rrf
    FROM r1 FULL OUTER JOIN r2 ON r1.doc_id = r2.doc_id
    ORDER BY rrf DESC, doc_id
    """,
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (k=60) of two independent document
    rankers: BM25 for {hash, join, vector} (operators/search.py:
    bm25_search) and lexical richness (distinct-token count) — the
    hybrid-search merge step every retrieval pipeline runs after its
    lexical and semantic legs.  Each leg is cut to top-20 by
    TakeOrderedAndProject (rounded scores + doc_id tie-break, so the
    boundary is cross-engine deterministic) and only THEN ranked — the
    row_number windows run over 20-row frames (the post-limit shape
    plan_audit explicitly allows), never over the corpus.  Docs missing
    from a leg contribute 0 from that leg, the standard RRF convention;
    their rank column stays NULL in the output."""
    from .operators.search import bm25_search

    docs = load_table(spark, sf_dir, "documents")
    bm = bm25_search(docs, ["hash", "join", "vector"], top_k=20)
    r1 = bm.withColumn(
        "bm25_rank",
        F.row_number().over(
            Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
        ).cast("long"),
    ).select("doc_id", "bm25_rank")
    rich = (
        docs.select(
            "doc_id",
            F.size(F.array_distinct(tokens(normalized_text("text")))).alias(
                "nt"
            ),
        )
        .orderBy(F.desc("nt"), F.asc("doc_id"))
        .limit(20)
    )
    r2 = rich.withColumn(
        "rich_rank",
        F.row_number().over(
            Window.orderBy(F.desc("nt"), F.asc("doc_id"))
        ).cast("long"),
    ).select("doc_id", "rich_rank")
    fused = r1.join(r2, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "rich_rank",
        F.round(
            F.coalesce(1.0 / (60 + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rich_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id")


@register(
    "gopher_repetition_audit",
    oracle=r"""
    WITH tk AS (
        SELECT doc_id, source,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS toks
        FROM documents
    ),
    uni AS (
        SELECT doc_id, t AS w, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS t FROM tk)
        GROUP BY 1, 2
    ),
    per_u AS (
        SELECT doc_id, SUM(c) AS n_tok, MAX(c) AS top1,
               SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_tok
        FROM uni GROUP BY doc_id
    ),
    big AS (
        SELECT doc_id, gram, COUNT(*) AS c
        FROM (
            SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram
            FROM (SELECT doc_id, unnest(range(1, len(toks))) AS i, toks
                  FROM tk WHERE len(toks) >= 2)
        ) GROUP BY 1, 2
    ),
    per_b AS (SELECT doc_id, MAX(c) AS topb FROM big GROUP BY doc_id),
    per_doc AS (
        SELECT t.source,
               u.top1 * 1.0 / u.n_tok AS top_unigram_frac,
               COALESCE(b.topb, 0) * 2.0 / u.n_tok AS top_bigram_frac,
               u.dup_tok * 1.0 / u.n_tok AS dup_word_frac
        FROM per_u u
        JOIN tk t USING (doc_id)
        LEFT JOIN per_b b USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(top_unigram_frac), 6) AS avg_top_unigram_frac,
           ROUND(AVG(top_bigram_frac), 6) AS avg_top_bigram_frac,
           ROUND(AVG(dup_word_frac), 6) AS avg_dup_word_frac,
           CAST(SUM(CASE WHEN top_unigram_frac > 0.12
                          OR top_bigram_frac > 0.18
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition rules (Rae et al. 2021
    §A1.1, re-expressed for the newline-free synthetic corpus): per doc
    the top-unigram token fraction, top-bigram token fraction, and the
    fraction of tokens belonging to words that repeat — then rolled up
    per source with flag counts at the published-style thresholds.  The
    LLM-curation companion to the boilerplate/quality filters: catches
    looping generators and template spam that perplexity filters pass.
    Shape: tokenize once, two term-level hash aggs (unigrams, bigrams
    via a zip of the token array with its tail — no self-join), then a
    |sources|-row rollup; text itself never shuffles, only (doc, term)
    count rows do."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens(normalized_text("text")).alias("toks")
    )
    uni = (
        docs.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_u = uni.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        F.max("c").alias("top1"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias(
            "dup_tok"
        ),
    )
    grams = docs.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.size("toks") - 1),
                F.slice(F.col("toks"), 2, F.size("toks") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("gram"),
    )
    per_b = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("topb"))
    )
    per_doc = (
        per_u.join(per_b, "doc_id", "left")
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "source",
            (F.col("top1") / F.col("n_tok")).alias("top_unigram_frac"),
            (
                F.coalesce(F.col("topb"), F.lit(0)) * 2.0 / F.col("n_tok")
            ).alias("top_bigram_frac"),
            (F.col("dup_tok") / F.col("n_tok")).alias("dup_word_frac"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("top_unigram_frac"), 6).alias(
                "avg_top_unigram_frac"
            ),
            F.round(F.avg("top_bigram_frac"), 6).alias("avg_top_bigram_frac"),
            F.round(F.avg("dup_word_frac"), 6).alias("avg_dup_word_frac"),
            F.sum(
                (
                    (F.col("top_unigram_frac") > 0.12)
                    | (F.col("top_bigram_frac") > 0.18)
                ).cast("int")
            ).cast("long").alias("n_flagged"),
        )
        .orderBy("source")
    )


@register(
    "page_hinkley_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ),
    s AS (
        SELECT d, rev,
               AVG(rev) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        FROM daily
    ),
    m AS (
        SELECT d, rev,
               SUM(rev - cm) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
        FROM s
    ),
    p AS (
        SELECT d, rev, m,
               MIN(m) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mm
        FROM m
    ),
    lam AS (SELECT 3.0 * stddev_pop(rev) AS lam FROM daily)
    SELECT strftime(p.d, '%Y-%m-%d') AS day,
           ROUND(p.rev, 2) AS rev,
           ROUND(p.m / 1000.0, 4) AS m_k,
           ROUND((p.m - p.mm) / 1000.0, 4) AS ph_k,
           (p.m - p.mm) > lam.lam AS alarm
    FROM p CROSS JOIN lam ORDER BY day
    """,
)
def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential change detection on daily revenue
    (delta=0, lambda = 3x the series' population stddev — scale-free,
    so the alarm rule survives any SF): per day the cumulative
    deviation-from-running-mean m_t, its running minimum, the PH
    statistic m_t - min(m), and the alarm flag.  The classic streaming
    drift detector behind ADWIN-style monitors, batch-replayed.  The
    recurrence is cumulative-only, so the DuckDB twin states it exactly
    with stacked window frames, while the engine runs the identical
    arithmetic as ONE Arrow task over the CALENDAR-bounded daily frame
    (holt_linear_backtest's hybrid-endgame rationale) after a fully
    distributed daily aggregate; statistics are exported /1000 at 4 dp
    so cumulative float noise sits ~9 orders below the rounding
    boundary."""
    import numpy as np
    import pandas as pd

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )

    def ph_kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d")
        y = pdf["rev"].to_numpy(dtype="float64")
        n = len(y)
        cm = np.cumsum(y) / np.arange(1, n + 1)
        m = np.cumsum(y - cm)
        mm = np.minimum.accumulate(m)
        ph = m - mm
        lam = 3.0 * float(np.std(y))
        return pd.DataFrame(
            {
                "day": pd.to_datetime(pdf["d"]).dt.strftime("%Y-%m-%d"),
                "rev": np.round(y, 2),
                "m_k": np.round(m / 1000.0, 4),
                "ph_k": np.round(ph / 1000.0, 4),
                "alarm": ph > lam,
            }
        )

    out_schema = "day string, rev double, m_k double, ph_k double, alarm boolean"
    return (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(ph_kernel, schema=out_schema)
        .drop("g")
        .orderBy("day")
    )


@register(
    "kappa_mcc_agreement",
    oracle="""
    WITH v AS (SELECT value, event_type FROM events WHERE value IS NOT NULL),
    med AS (SELECT quantile_cont(value, 0.5) AS med FROM v),
    lab AS (
        SELECT CASE WHEN value > med THEN 1 ELSE 0 END AS a,
               CASE WHEN event_type IN ('purchase', 'click') THEN 1 ELSE 0
               END AS b
        FROM v CROSS JOIN med
    ),
    c AS (
        SELECT COUNT(*) AS n,
               SUM(a * b) AS n11,
               SUM(a * (1 - b)) AS n10,
               SUM((1 - a) * b) AS n01,
               SUM((1 - a) * (1 - b)) AS n00
        FROM lab
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
           ROUND((n11 + n00) * 1.0 / n, 6) AS po,
           ROUND(((n11 + n10) * 1.0 / n) * ((n11 + n01) * 1.0 / n)
                 + ((n01 + n00) * 1.0 / n) * ((n10 + n00) * 1.0 / n), 6)
               AS pe,
           ROUND(((n11 + n00) * 1.0 / n
                  - (((n11 + n10) * 1.0 / n) * ((n11 + n01) * 1.0 / n)
                     + ((n01 + n00) * 1.0 / n) * ((n10 + n00) * 1.0 / n)))
                 / (1.0 - (((n11 + n10) * 1.0 / n) * ((n11 + n01) * 1.0 / n)
                           + ((n01 + n00) * 1.0 / n)
                             * ((n10 + n00) * 1.0 / n))), 6) AS kappa,
           ROUND((CAST(n11 AS DOUBLE) * n00 - CAST(n10 AS DOUBLE) * n01)
                 / sqrt(CAST(n11 + n10 AS DOUBLE) * (n01 + n00)
                        * (n11 + n01) * (n10 + n00)), 6) AS mcc
    FROM c
    """,
)
def q_kappa_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-rater agreement between two derived binary labelers —
    rater A: value above the exact global median; rater B: event_type
    in {purchase, click} — reporting the full 2x2 table plus Cohen's
    kappa and the Matthews correlation coefficient.  The
    label-validation panel (human-vs-model or model-vs-model audit)
    that confusion_threshold_metrics doesn't cover: kappa/MCC correct
    for chance agreement, which raw accuracy can't.  Shape: one exact
    percentile agg, broadcast scalar join, one conditional-sum pass —
    no shuffle wider than a single row; products go through DOUBLE
    before the MCC square root so nothing overflows at any SF."""
    v = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select("value", "event_type")
    med = v.agg(F.percentile("value", F.lit(0.5)).alias("med"))
    lab = v.crossJoin(F.broadcast(med)).select(
        (F.col("value") > F.col("med")).cast("int").alias("a"),
        F.col("event_type").isin("purchase", "click").cast("int").alias("b"),
    )
    c = lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
    )
    pa = (F.col("n11") + F.col("n10")) / F.col("n")
    pb = (F.col("n11") + F.col("n01")) / F.col("n")
    po = (F.col("n11") + F.col("n00")) / F.col("n")
    pe = pa * pb + (1 - pa) * (1 - pb)
    mcc = (
        F.col("n11").cast("double") * F.col("n00")
        - F.col("n10").cast("double") * F.col("n01")
    ) / F.sqrt(
        (F.col("n11") + F.col("n10")).cast("double")
        * (F.col("n01") + F.col("n00"))
        * (F.col("n11") + F.col("n01"))
        * (F.col("n10") + F.col("n00"))
    )
    return c.select(
        F.col("n").cast("long").alias("n"),
        F.col("n11").cast("long").alias("n11"),
        F.col("n10").cast("long").alias("n10"),
        F.col("n01").cast("long").alias("n01"),
        F.col("n00").cast("long").alias("n00"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
        F.round(mcc, 6).alias("mcc"),
    )


@register(
    "smape_mase_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ),
    lagd AS (
        SELECT rev,
               LAG(rev, 7) OVER (ORDER BY d) AS f7,
               LAG(rev, 1) OVER (ORDER BY d) AS f1
        FROM daily
    ),
    met AS (
        SELECT COUNT(*) AS n_days,
               AVG(CASE WHEN f7 IS NOT NULL
                        THEN ABS(rev - f7) / rev END) AS mape,
               AVG(CASE WHEN f7 IS NOT NULL
                        THEN 2.0 * ABS(rev - f7) / (ABS(rev) + ABS(f7))
                   END) AS smape,
               AVG(CASE WHEN f7 IS NOT NULL THEN ABS(rev - f7) END)
                 / AVG(CASE WHEN f1 IS NOT NULL THEN ABS(rev - f1) END)
                   AS mase
        FROM lagd
    )
    SELECT CAST(n_days AS BIGINT) AS n_days,
           ROUND(mape, 6) AS mape,
           ROUND(smape, 6) AS smape,
           ROUND(mase, 6) AS mase
    FROM met
    """,
)
def q_smape_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (y[t-7]) forecast error panel on daily revenue:
    MAPE, sMAPE, and MASE (scaled by the lag-1 naive MAE, Hyndman &
    Koehler 2006) — the standard triple every forecast backtest
    reports, complementing holt_linear_backtest's model-vs-naive MAE
    ratio.  Sequential lags run as ONE Arrow task over the
    calendar-bounded daily frame after the distributed daily aggregate;
    the DuckDB twin states the identical lags as window functions, so
    every per-day error term is value-checked through the 6-dp rounded
    aggregates."""
    import numpy as np
    import pandas as pd

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )

    def err_kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d")
        y = pdf["rev"].to_numpy(dtype="float64")
        n = len(y)
        if n < 8:
            return pd.DataFrame(
                {"n_days": [n], "mape": [0.0], "smape": [0.0], "mase": [0.0]}
            )
        e7 = y[7:] - y[:-7]
        mape = float(np.mean(np.abs(e7) / y[7:]))
        smape = float(
            np.mean(2.0 * np.abs(e7) / (np.abs(y[7:]) + np.abs(y[:-7])))
        )
        mase = float(
            np.mean(np.abs(e7)) / np.mean(np.abs(y[1:] - y[:-1]))
        )
        return pd.DataFrame(
            {
                "n_days": [n],
                "mape": [round(mape, 6)],
                "smape": [round(smape, 6)],
                "mase": [round(mase, 6)],
            }
        )

    out_schema = "n_days long, mape double, smape double, mase double"
    return (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(err_kernel, schema=out_schema)
        .drop("g")
    )


# ---------------------------------------------------------------------------
# Round-7 second wave: robust statistics — MAD outlier screen, Theil-Sen
# robust trend, Kruskal-Wallis weekday-effect test.
# ---------------------------------------------------------------------------


@register(
    "mad_outlier_screen",
    oracle="""
    WITH v AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    med AS (SELECT quantile_cont(value, 0.5) AS med FROM v),
    mad AS (
        SELECT quantile_cont(ABS(value - med), 0.5) AS mad
        FROM v CROSS JOIN med
    ),
    rz AS (
        SELECT event_type,
               0.6745 * (value - med) / mad AS rz
        FROM v CROSS JOIN med CROSS JOIN mad
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN ABS(rz) > 3.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           ROUND(MAX(ABS(rz)), 6) AS max_abs_rz,
           ROUND(AVG(ABS(rz)), 6) AS avg_abs_rz
    FROM rz GROUP BY event_type ORDER BY event_type
    """,
)
def q_mad_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust z-score outlier screen (Iglewicz-Hoaglin modified z:
    0.6745·(x − median)/MAD, flag |z| > 3.5) on the value column,
    reported per event type — the heavy-tail-safe complement to the
    Mahalanobis screen, immune to the outliers it hunts (mean/std
    screens inflate their own cutoffs).  Two exact-percentile
    aggregates (median, then MAD via a broadcast scalar join), one
    conditional-sum pass; nothing wider than a scalar crosses the
    cluster."""
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    med = v.agg(F.percentile("value", F.lit(0.5)).alias("med"))
    mad = (
        v.crossJoin(F.broadcast(med))
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
                "mad"
            )
        )
    )
    rz = (
        v.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "event_type",
            (0.6745 * (F.col("value") - F.col("med")) / F.col("mad")).alias(
                "rz"
            ),
        )
    )
    return (
        rz.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.abs("rz") > 3.5).cast("int")).cast("long").alias(
                "n_outliers"
            ),
            F.round(F.max(F.abs("rz")), 6).alias("max_abs_rz"),
            F.round(F.avg(F.abs("rz")), 6).alias("avg_abs_rz"),
        )
        .orderBy("event_type")
    )


@register(
    "theil_sen_revenue_trend",
    oracle="""
    WITH daily AS (
        SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS x,
               SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ),
    slopes AS (
        SELECT (b.rev - a.rev) / (b.x - a.x) AS s
        FROM daily a JOIN daily b ON b.x > a.x
    ),
    ts AS (SELECT quantile_cont(s, 0.5) AS slope FROM slopes),
    ic AS (
        SELECT quantile_cont(rev - ts.slope * x, 0.5) AS icept
        FROM daily CROSS JOIN ts
    ),
    ols AS (
        SELECT covar_pop(x, rev) / var_pop(x) AS slope FROM daily
    )
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           ROUND(ts.slope, 6) AS ts_slope,
           ROUND(ic.icept, 2) AS ts_intercept,
           ROUND(ols.slope, 6) AS ols_slope
    FROM ts CROSS JOIN ic CROSS JOIN ols
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue — the median of all
    pairwise slopes (exact, all C(n,2) ≈ 2.9M pairs) with the median
    intercept, beside the OLS slope it robustifies.  A single extreme
    day moves OLS but not Theil-Sen; the gap between the two columns IS
    the outlier-influence diagnostic.  The pairwise enumeration is
    O(days²) but over the CALENDAR-bounded daily frame (fixed size at
    any SF — holt's hybrid-endgame rationale), vectorized in one Arrow
    task; the distributed daily aggregate is the only data-sized
    stage."""
    import numpy as np
    import pandas as pd

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias(
                "x"
            )
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )

    def ts_kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("x")
        x = pdf["x"].to_numpy(dtype="float64")
        y = pdf["rev"].to_numpy(dtype="float64")
        n = len(x)
        dy = np.subtract.outer(y, y)
        dx = np.subtract.outer(x, x)
        iu = np.triu_indices(n, k=1)
        slopes = (dy[iu] * -1.0) / (dx[iu] * -1.0)
        slope = float(np.quantile(slopes, 0.5))
        icept = float(np.quantile(y - slope * x, 0.5))
        ols = float(np.cov(x, y, bias=True)[0, 1] / np.var(x))
        return pd.DataFrame(
            {
                "n_days": [n],
                "ts_slope": [round(slope, 6)],
                "ts_intercept": [round(icept, 2)],
                "ols_slope": [round(ols, 6)],
            }
        )

    out_schema = (
        "n_days long, ts_slope double, ts_intercept double, ols_slope double"
    )
    return (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(ts_kernel, schema=out_schema)
        .drop("g")
    )


@register(
    "kruskal_wallis_weekday",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT d, ROW_NUMBER() OVER (ORDER BY rev, d) AS rnk FROM daily
    ),
    g AS (
        SELECT EXTRACT(isodow FROM d) - 1 AS weekday,
               COUNT(*) AS n_days, AVG(rnk) AS ar
        FROM r GROUP BY 1
    ),
    t AS (SELECT SUM(n_days) AS n FROM g),
    h AS (
        SELECT 12.0 / (t.n * (t.n + 1))
               * SUM(g.n_days * (g.ar - (t.n + 1) / 2.0)
                               * (g.ar - (t.n + 1) / 2.0)) AS h
        FROM g CROSS JOIN t GROUP BY t.n
    )
    SELECT CAST(g.weekday AS BIGINT) AS weekday,
           CAST(g.n_days AS BIGINT) AS n_days,
           ROUND(g.ar, 4) AS avg_rank,
           ROUND(h.h, 6) AS h_stat
    FROM g CROSS JOIN h ORDER BY weekday
    """,
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank test for a weekday effect on daily revenue —
    the k-group generalization of mann_whitney_purchase_vs_view: per
    weekday (Mon=0) the day count and mean revenue rank, plus the H
    statistic (χ²(6) under H0).  Ranks are ROW_NUMBER over (rev, d) —
    revenue is continuous so ties are measure-zero, and the d tie-break
    keeps both engines identical if one ever occurs.  The rank window
    is unpartitioned but sits ABOVE the daily HashAggregate
    (calendar-bounded frame), the exact shape tools/plan_audit.py's
    boundedness sweep allows; everything below it is distributed."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    r = daily.select(
        "d", F.row_number().over(Window.orderBy("rev", "d")).alias("rnk")
    )
    g = r.groupBy(F.weekday("d").alias("weekday")).agg(
        F.count(F.lit(1)).alias("n_days"), F.avg("rnk").alias("ar")
    )
    t = g.agg(F.sum("n_days").alias("n"))
    h = (
        g.crossJoin(F.broadcast(t))
        .agg(
            (
                12.0
                / (F.max("n") * (F.max("n") + 1))
                * F.sum(
                    F.col("n_days")
                    * F.pow(F.col("ar") - (F.col("n") + 1) / 2.0, 2)
                )
            ).alias("h")
        )
    )
    return (
        g.crossJoin(F.broadcast(h))
        .select(
            F.col("weekday").cast("long").alias("weekday"),
            F.col("n_days").cast("long").alias("n_days"),
            F.round("ar", 4).alias("avg_rank"),
            F.round("h", 6).alias("h_stat"),
        )
        .orderBy("weekday")
    )


# ---------------------------------------------------------------------------
# Round-7 third wave: warehouse modeling — SCD Type-2 dimension build,
# hierarchical BOM-style cost rollup, gaps-and-islands activity streaks.
# ---------------------------------------------------------------------------


@register(
    "scd2_user_tiers",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CAST(LEAST(FLOOR(value / 100.0), 9) AS BIGINT) AS tier
        FROM events WHERE value IS NOT NULL
    ),
    chg AS (
        SELECT user_id, event_id, ts_us, tier,
               LAG(tier) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
        FROM v
    ),
    seg AS (
        SELECT user_id, tier, ts_us AS valid_from_us
        FROM chg WHERE prev IS NULL OR tier <> prev
    )
    SELECT user_id, tier, valid_from_us,
           LEAD(valid_from_us) OVER (
               PARTITION BY user_id ORDER BY valid_from_us) AS valid_to_us
    FROM seg
    ORDER BY user_id, valid_from_us
    """,
)
def q_scd2_user_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 build: collapse each user's
    value-tier history (tier = min(floor(value/100), 9)) into validity
    intervals [valid_from_us, valid_to_us) — the open current row has a
    NULL valid_to_us.  The standard warehouse dimension pattern the
    reference's single-snapshot pipeline can't produce, built from the
    event log in two per-key window passes (change detection via LAG,
    interval close via LEAD) — both partitioned by user_id, so the
    shuffle is one hash exchange on the key and nothing is global.
    The (ts_us, event_id) order is the repo-wide same-timestamp
    tie-break (tests/test_tie_fixture.py class)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.expr("ts_ns div 1000").alias("ts_us"),
            F.least(F.floor(F.col("value") / 100.0), F.lit(9))
            .cast("long")
            .alias("tier"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    chg = ev.withColumn("prev", F.lag("tier").over(w))
    seg = chg.filter(
        F.col("prev").isNull() | (F.col("tier") != F.col("prev"))
    ).select("user_id", "tier", F.col("ts_us").alias("valid_from_us"))
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us")
    return seg.withColumn(
        "valid_to_us", F.lead("valid_from_us").over(w2)
    ).orderBy("user_id", "valid_from_us")


@register(
    "bom_cost_rollup",
    oracle="""
    WITH RECURSIVE anc(node, a) AS (
        SELECT p_partkey, p_partkey FROM part
        UNION ALL
        SELECT node, a // 10 FROM anc WHERE a >= 10
    ),
    roll AS (
        SELECT anc.a AS root,
               COUNT(*) AS n_parts,
               SUM(p.p_retailprice) AS total_cost
        FROM anc JOIN part p ON p.p_partkey = anc.node
        WHERE anc.a < 10
        GROUP BY anc.a
    )
    SELECT CAST(root AS BIGINT) AS root,
           CAST(n_parts AS BIGINT) AS n_parts,
           ROUND(total_cost, 2) AS total_cost
    FROM roll ORDER BY root
    """,
)
def q_bom_cost_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials-style hierarchical cost rollup over the
    implicit decimal part hierarchy (parent(p) = p // 10, roots are
    partkeys < 10): per root, the descendant count and total retail
    cost of the whole subtree.  The transitive-closure aggregation a
    recursive CTE states naturally — but because the ancestor chain is
    CLOSED-FORM here (k-th ancestor = floor(p/10^k)), the engine emits
    each part's ancestor set columnar-ly (sequence → transform →
    filter → explode) with ZERO joins and ZERO iterations: the rollup
    is one explode + one hash aggregate, the plan that survives any
    depth and any SF.  The DuckDB twin walks the same closure
    recursively, so the two fundamentally different evaluation
    strategies must agree on every subtree sum."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice"
    )
    # ancestors of p: p itself plus floor(p/10^k) for k >= 1 while the
    # PREVIOUS level is still >= 10 (i.e. had a parent)
    ancs = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(12)),
            lambda k: F.struct(
                F.floor(F.col("p_partkey") / F.pow(F.lit(10.0), k))
                .cast("long")
                .alias("a"),
                k.alias("k"),
            ),
        ),
        lambda s: (s["k"] == 0)
        | (
            F.floor(
                F.col("p_partkey") / F.pow(F.lit(10.0), s["k"] - 1)
            ).cast("long")
            >= 10
        ),
    )
    exploded = part.select(
        "p_retailprice", F.explode(ancs).alias("s")
    ).select("p_retailprice", F.col("s.a").alias("root"))
    return (
        exploded.filter(F.col("root") < 10)
        .groupBy("root")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("total_cost"),
        )
        .orderBy("root")
    )


@register(
    "activity_islands_histogram",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        FROM events
    ),
    grp AS (
        SELECT user_id, day,
               day - ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS island
        FROM days
    ),
    islands AS (
        SELECT user_id, COUNT(*) AS len
        FROM grp GROUP BY user_id, island
    )
    SELECT CAST(len AS BIGINT) AS island_length,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM islands GROUP BY len ORDER BY island_length
    """,
)
def q_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per
    user, rolled into a run-length histogram (how many streaks of each
    length, and how many users ever achieve one).  The classic
    day - row_number() island key, computed under a per-user window —
    one hash exchange on user_id, then two bounded aggregates; at
    100 TB the distinct (user, day) pre-reduction is the load-shedding
    step (card. = users × active days, not raw events)."""
    days = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "island", F.col("day") - F.row_number().over(w)
    )
    islands = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        islands.groupBy(F.col("len").cast("long").alias("island_length"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("island_length")
    )


# ---------------------------------------------------------------------------
# Round-7 fourth wave: trainable-model + spectral + calibration +
# governance — full-batch logistic GD (the oracle replays every descent
# step), DFT periodogram, expected calibration error, t-closeness.
# ---------------------------------------------------------------------------


def _logistic_gd_oracle(iters: int = 5, lr: float = 0.5) -> str:
    """Unrolled gradient-descent oracle: one (g_i, w_i) CTE pair per
    step, each re-scanning `base` with the previous weights — DuckDB
    replays the exact training trajectory."""
    sig = "1.0/(1.0+exp(-(w.a + w.b*x1 + w.c*x2)))"
    parts = [
        """
    WITH base AS (
        SELECT (value - 50) / 25.0 AS x1,
               (EXTRACT(hour FROM ts) - 12) / 6.0 AS x2,
               CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    w0 AS (SELECT 0.0 AS a, 0.0 AS b, 0.0 AS c)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    g{i} AS (
        SELECT AVG({sig} - y) AS g0,
               AVG(({sig} - y) * x1) AS g1,
               AVG(({sig} - y) * x2) AS g2,
               MAX(w.a) AS a, MAX(w.b) AS b, MAX(w.c) AS c
        FROM base CROSS JOIN w{i - 1} w
    ),
    w{i} AS (
        SELECT a - {lr} * g0 AS a, b - {lr} * g1 AS b, c - {lr} * g2 AS c
        FROM g{i}
    )"""
        )
    parts.append(
        f""",
    m AS (
        SELECT AVG(-(y * ln({sig}) + (1 - y) * ln(1 - {sig}))) AS logloss,
               AVG(CASE WHEN ({sig} > 0.5) = (y = 1.0) THEN 1.0 ELSE 0.0
                   END) AS acc
        FROM base CROSS JOIN w{iters} w
    )
    SELECT ROUND(w.a, 6) AS w_bias, ROUND(w.b, 6) AS w_value,
           ROUND(w.c, 6) AS w_hour,
           ROUND(m.logloss, 6) AS logloss, ROUND(m.acc, 6) AS accuracy
    FROM w{iters} w CROSS JOIN m"""
    )
    return "".join(parts)


@register("logistic_gd_training", oracle=_logistic_gd_oracle())
def q_logistic_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch logistic-regression TRAINING by gradient descent (5
    steps, lr=0.5, bias + standardized value + hour features, purchase
    label) — the missing half of ml/scoring.py's fixed-weight scorer:
    the weights themselves are learned inside the engine.  Each step is
    one distributed mean-gradient aggregate; the running weight vector
    rides along as a broadcast 1-row frame (crossJoin), so the whole
    5-step trajectory is ONE lazy plan with zero driver collects and
    map-side partial aggregation everywhere — at 100 TB each step is a
    single scan+agg, the textbook data-parallel GD layout.  The DuckDB
    twin replays every descent step via unrolled CTE pairs, so the
    entire optimization trajectory is value-checked, not just the
    final fit."""
    LR = 0.5
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            ((F.col("value") - 50) / 25.0).alias("x1"),
            ((F.hour("ts") - 12) / 6.0).alias("x2"),
            (F.col("event_type") == "purchase").cast("double").alias("y"),
        )
    )
    w = spark.range(1).select(
        F.lit(0.0).alias("a"), F.lit(0.0).alias("b"), F.lit(0.0).alias("c")
    )
    sig = lambda: 1.0 / (
        1.0
        + F.exp(
            -(
                F.col("a")
                + F.col("b") * F.col("x1")
                + F.col("c") * F.col("x2")
            )
        )
    )
    for _ in range(5):
        scored = base.crossJoin(F.broadcast(w))
        g = scored.agg(
            F.avg(sig() - F.col("y")).alias("g0"),
            F.avg((sig() - F.col("y")) * F.col("x1")).alias("g1"),
            F.avg((sig() - F.col("y")) * F.col("x2")).alias("g2"),
            F.max("a").alias("a"),
            F.max("b").alias("b"),
            F.max("c").alias("c"),
        )
        w = g.select(
            (F.col("a") - LR * F.col("g0")).alias("a"),
            (F.col("b") - LR * F.col("g1")).alias("b"),
            (F.col("c") - LR * F.col("g2")).alias("c"),
        )
    final = base.crossJoin(F.broadcast(w))
    p = sig()
    m = final.agg(
        F.avg(
            -(
                F.col("y") * F.log(p)
                + (1 - F.col("y")) * F.log(1 - p)
            )
        ).alias("logloss"),
        F.avg(
            ((p > 0.5) == (F.col("y") == 1.0)).cast("double")
        ).alias("acc"),
        F.max("a").alias("a"),
        F.max("b").alias("b"),
        F.max("c").alias("c"),
    )
    return m.select(
        F.round("a", 6).alias("w_bias"),
        F.round("b", 6).alias("w_value"),
        F.round("c", 6).alias("w_hour"),
        F.round("logloss", 6).alias("logloss"),
        F.round("acc", 6).alias("accuracy"),
    )


@register(
    "periodogram_daily_topk",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ),
    st AS (SELECT COUNT(*) AS n, AVG(rev) AS mu FROM daily),
    idx AS (
        SELECT ROW_NUMBER() OVER (ORDER BY d) - 1 AS t, rev FROM daily
    ),
    ks AS (SELECT k FROM range(1, 121) r(k)),
    ft AS (
        SELECT ks.k,
               SUM((rev - st.mu) * cos(2 * pi() * ks.k * idx.t / st.n))
                   AS c,
               SUM((rev - st.mu) * sin(2 * pi() * ks.k * idx.t / st.n))
                   AS s,
               MAX(st.n) AS n
        FROM idx CROSS JOIN st CROSS JOIN ks
        GROUP BY ks.k
    )
    SELECT CAST(k AS BIGINT) AS k,
           ROUND(n * 1.0 / k, 2) AS period_days,
           ROUND((c * c + s * s) / 1e12, 4) AS power_t
    FROM ft
    ORDER BY power_t DESC, k LIMIT 5
    """,
)
def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFT periodogram of demeaned daily revenue at frequencies
    k=1..120 cycles over the observed span, reporting the 5 dominant
    periods — the seasonality discoverer feeding the lag-7 choices
    hard-wired into smape_mase_daily / holt's seasonal baseline.
    The transform is stated as plain SUM(y·cos/sin) aggregates over a
    broadcast 120-row frequency frame crossed with the calendar-bounded
    daily series: fully distributed, no kernel, no FFT library — and
    therefore directly SQL-checkable term by term.  Power is exported
    /1e12 at 4 dp (libm 1-ulp noise lands ~7 orders below the rounding
    boundary); the top-5 boundary orders on the ROUNDED power with a k
    tie-break."""
    import math

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    st = daily.agg(
        F.count(F.lit(1)).alias("n"), F.avg("rev").alias("mu")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("t"), "rev"
    )
    ks = spark.range(1, 121).select(F.col("id").alias("k"))
    ang = (
        2 * math.pi * F.col("k") * F.col("t") / F.col("n")
    )
    ft = (
        idx.crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum((F.col("rev") - F.col("mu")) * F.cos(ang)).alias("c"),
            F.sum((F.col("rev") - F.col("mu")) * F.sin(ang)).alias("s"),
            F.max("n").alias("n"),
        )
    )
    return (
        ft.select(
            F.col("k").cast("long").alias("k"),
            F.round(F.col("n") / F.col("k"), 2).alias("period_days"),
            F.round(
                (F.col("c") * F.col("c") + F.col("s") * F.col("s")) / 1e12, 4
            ).alias("power_t"),
        )
        .orderBy(F.desc("power_t"), "k")
        .limit(5)
    )


@register(
    "ece_calibration_bins",
    oracle="""
    WITH scored AS (
        SELECT 1.0 / (1.0 + exp(-((value - 50) / 25.0))) AS s,
               CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    b AS (
        SELECT LEAST(CAST(FLOOR(s * 10) AS BIGINT), 9) AS bin, s, y
        FROM scored
    ),
    per AS (
        SELECT bin, COUNT(*) AS n, AVG(s) AS conf, AVG(y) AS acc
        FROM b GROUP BY bin
    ),
    e AS (
        SELECT SUM(n * ABS(acc - conf)) / SUM(n) AS ece FROM per
    )
    SELECT CAST(per.bin AS BIGINT) AS bin,
           CAST(per.n AS BIGINT) AS n,
           ROUND(per.conf, 6) AS avg_confidence,
           ROUND(per.acc, 6) AS avg_outcome,
           ROUND(ABS(per.acc - per.conf), 6) AS gap,
           ROUND(e.ece, 6) AS ece
    FROM per CROSS JOIN e ORDER BY bin
    """,
)
def q_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error of the fixed logistic scorer
    (ml/scoring.py weights) against the purchase outcome: 10 equi-width
    confidence bins, per-bin confidence/outcome/gap, and the
    n-weighted ECE — the headline number every model card quotes,
    complementing the Brier (Murphy) decomposition and isotonic
    mapping already in the corpus.  Two hash aggregates and a scalar
    cross join; the bin frame is 10 rows forever."""
    scored = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (
                1.0 / (1.0 + F.exp(-((F.col("value") - 50) / 25.0)))
            ).alias("s"),
            (F.col("event_type") == "purchase").cast("double").alias("y"),
        )
    )
    per = (
        scored.select(
            F.least(F.floor(F.col("s") * 10).cast("long"), F.lit(9)).alias(
                "bin"
            ),
            "s",
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("s").alias("conf"),
            F.avg("y").alias("acc"),
        )
    )
    e = per.agg(
        (
            F.sum(F.col("n") * F.abs(F.col("acc") - F.col("conf")))
            / F.sum("n")
        ).alias("ece")
    )
    return (
        per.crossJoin(F.broadcast(e))
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("n").cast("long").alias("n"),
            F.round("conf", 6).alias("avg_confidence"),
            F.round("acc", 6).alias("avg_outcome"),
            F.round(F.abs(F.col("acc") - F.col("conf")), 6).alias("gap"),
            F.round("ece", 6).alias("ece"),
        )
        .orderBy("bin")
    )


@register(
    "t_closeness_audit",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CASE WHEN EXTRACT(hour FROM ts) < 12 THEN 'am' ELSE 'pm'
               END AS ampm,
               value
        FROM events WHERE value IS NOT NULL
    ),
    rng AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM v),
    binned AS (
        SELECT event_type, ampm,
               LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 10.0))
                          AS BIGINT), 9) AS bin
        FROM v CROSS JOIN rng
    ),
    classes AS (SELECT DISTINCT event_type, ampm FROM binned),
    grid AS (
        SELECT c.event_type, c.ampm, r.bin
        FROM classes c CROSS JOIN (SELECT bin FROM range(0, 10) t(bin)) r
    ),
    pc AS (
        SELECT event_type, ampm, bin, COUNT(*) AS n
        FROM binned GROUP BY 1, 2, 3
    ),
    cn AS (
        SELECT event_type, ampm, SUM(n) AS n_class FROM pc GROUP BY 1, 2
    ),
    qg AS (
        SELECT bin, COUNT(*) * 1.0 / (SELECT COUNT(*) FROM binned) AS q
        FROM binned GROUP BY bin
    ),
    diff AS (
        SELECT g.event_type, g.ampm, g.bin,
               COALESCE(pc.n, 0) * 1.0 / cn.n_class - COALESCE(qg.q, 0)
                   AS pd
        FROM grid g
        LEFT JOIN pc ON pc.event_type = g.event_type
                    AND pc.ampm = g.ampm AND pc.bin = g.bin
        JOIN cn ON cn.event_type = g.event_type AND cn.ampm = g.ampm
        LEFT JOIN qg ON qg.bin = g.bin
    ),
    emd AS (
        SELECT event_type, ampm,
               SUM(ABS(cum)) / 9.0 AS t
        FROM (
            SELECT event_type, ampm, bin,
                   SUM(pd) OVER (PARTITION BY event_type, ampm
                                 ORDER BY bin
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum
            FROM diff
        ) GROUP BY 1, 2
    )
    SELECT e.event_type, e.ampm,
           CAST(cn.n_class AS BIGINT) AS n,
           ROUND(e.t, 6) AS t_value,
           e.t > 0.2 AS violates
    FROM emd e
    JOIN cn ON cn.event_type = e.event_type AND cn.ampm = e.ampm
    ORDER BY e.event_type, e.ampm
    """,
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li/Li/Venkatasubramanian 2007) completing the
    k-anonymity/l-diversity governance panel: per quasi-identifier
    class (event_type × am/pm), the ordered earth-mover's distance
    between the class's value distribution and the global one over a
    10-bin equi-width domain — EMD for ordered bins is the mean
    |cumulative difference|, so the whole audit is hash aggregates plus
    a cumulative window over the zero-filled class×bin GRID (empty bins
    still carry the running difference — skipping them understates t).
    All windows partition by class over a ≤10-row frame; the grid is
    |classes|×10."""
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.when(F.hour("ts") < 12, "am").otherwise("pm").alias("ampm"),
            "value",
        )
    )
    rng = v.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = v.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "ampm",
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / 10.0)
            ).cast("long"),
            F.lit(9),
        ).alias("bin"),
    )
    classes = binned.select("event_type", "ampm").distinct()
    bins10 = spark.range(0, 10).select(F.col("id").alias("bin"))
    grid = classes.crossJoin(F.broadcast(bins10))
    pc = binned.groupBy("event_type", "ampm", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    cn = pc.groupBy("event_type", "ampm").agg(
        F.sum("n").alias("n_class")
    )
    # global bin distribution: per-bin counts scaled by the one-row
    # total (broadcast scalar join — no eager driver action)
    tot = pc.agg(F.sum("n").cast("double").alias("tot"))
    qg = (
        pc.groupBy("bin")
        .agg(F.sum("n").alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .select("bin", (F.col("cnt") / F.col("tot")).alias("q"))
    )
    diff = (
        grid.join(pc, ["event_type", "ampm", "bin"], "left")
        .join(cn, ["event_type", "ampm"])
        .join(F.broadcast(qg), ["bin"], "left")
        .select(
            "event_type",
            "ampm",
            "bin",
            "n_class",
            (
                F.coalesce(F.col("n"), F.lit(0)) / F.col("n_class")
                - F.coalesce(F.col("q"), F.lit(0.0))
            ).alias("pd"),
        )
    )
    w = (
        Window.partitionBy("event_type", "ampm")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    emd = (
        diff.withColumn("cum", F.sum("pd").over(w))
        .groupBy("event_type", "ampm")
        .agg(
            (F.sum(F.abs("cum")) / 9.0).alias("t"),
            F.max("n_class").alias("n_class"),
        )
    )
    return emd.select(
        "event_type",
        "ampm",
        F.col("n_class").cast("long").alias("n"),
        F.round("t", 6).alias("t_value"),
        (F.col("t") > 0.2).alias("violates"),
    ).orderBy("event_type", "ampm")


# ---------------------------------------------------------------------------
# Round-7 fifth wave: causal + multiple-testing + mergeable-summary +
# link-analysis — diff-in-differences, Benjamini-Hochberg FDR panel,
# Misra-Gries heavy hitters (bound audit), HITS hubs/authorities.
# ---------------------------------------------------------------------------


@register(
    "did_estimator",
    oracle="""
    WITH v AS (
        SELECT ((user_id * 1000003 + 7) % 999983 * 40503) % 999983 % 2
                   AS treat,
               epoch_us(ts) AS ts_us, value
        FROM events WHERE value IS NOT NULL
    ),
    cut AS (SELECT quantile_cont(ts_us, 0.5) AS c FROM v),
    lab AS (
        SELECT treat, CASE WHEN ts_us >= c THEN 1 ELSE 0 END AS post, value
        FROM v CROSS JOIN cut
    ),
    cells AS (
        SELECT treat, post, COUNT(*) AS n, AVG(value) AS m,
               var_samp(value) AS s2
        FROM lab GROUP BY 1, 2
    ),
    w AS (
        SELECT MAX(CASE WHEN treat = 1 AND post = 1 THEN m END) AS m11,
               MAX(CASE WHEN treat = 1 AND post = 0 THEN m END) AS m10,
               MAX(CASE WHEN treat = 0 AND post = 1 THEN m END) AS m01,
               MAX(CASE WHEN treat = 0 AND post = 0 THEN m END) AS m00,
               SUM(s2 / n) AS var_sum,
               SUM(n) AS n_total
        FROM cells
    )
    SELECT CAST(n_total AS BIGINT) AS n_total,
           ROUND(m11, 6) AS mean_treat_post,
           ROUND(m10, 6) AS mean_treat_pre,
           ROUND(m01, 6) AS mean_ctrl_post,
           ROUND(m00, 6) AS mean_ctrl_pre,
           ROUND((m11 - m10) - (m01 - m00), 6) AS did,
           ROUND(SQRT(var_sum), 6) AS se,
           ROUND(((m11 - m10) - (m01 - m00)) / SQRT(var_sum), 6) AS t_stat
    FROM w
    """,
)
def q_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: synthetic treatment = affine-hashed
    user half (the engine-independent remultiplied-mod-prime
    convention — additive seeds cancel in relative ordering), post =
    event at/after the exact median timestamp; outcome = value.  The
    2×2 cell means, the DiD estimate, its pooled SE (Σ s²_c/n_c under
    independence), and the t statistic — the workhorse causal panel
    layout.  One percentile agg + one 4-cell agg + a 1-row pivot;
    nothing wider than four rows shuffles."""
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (
                (F.col("user_id") * 1000003 + 7) % 999983 * 40503 % 999983
                % 2
            ).alias("treat"),
            F.expr("ts_ns div 1000").alias("ts_us"),
            "value",
        )
    )
    cut = v.agg(F.percentile("ts_us", F.lit(0.5)).alias("c"))
    lab = v.crossJoin(F.broadcast(cut)).select(
        "treat",
        (F.col("ts_us") >= F.col("c")).cast("int").alias("post"),
        "value",
    )
    cells = lab.groupBy("treat", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("s2"),
    )
    w = cells.agg(
        F.max(F.when((F.col("treat") == 1) & (F.col("post") == 1), F.col("m"))).alias("m11"),
        F.max(F.when((F.col("treat") == 1) & (F.col("post") == 0), F.col("m"))).alias("m10"),
        F.max(F.when((F.col("treat") == 0) & (F.col("post") == 1), F.col("m"))).alias("m01"),
        F.max(F.when((F.col("treat") == 0) & (F.col("post") == 0), F.col("m"))).alias("m00"),
        F.sum(F.col("s2") / F.col("n")).alias("var_sum"),
        F.sum("n").alias("n_total"),
    )
    did = (F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00"))
    return w.select(
        F.col("n_total").cast("long").alias("n_total"),
        F.round("m11", 6).alias("mean_treat_post"),
        F.round("m10", 6).alias("mean_treat_pre"),
        F.round("m01", 6).alias("mean_ctrl_post"),
        F.round("m00", 6).alias("mean_ctrl_pre"),
        F.round(did, 6).alias("did"),
        F.round(F.sqrt("var_sum"), 6).alias("se"),
        F.round(did / F.sqrt("var_sum"), 6).alias("t_stat"),
    )


@register(
    "bh_fdr_panel",
    oracle="""
    WITH v AS (
        SELECT event_type, EXTRACT(isodow FROM ts) - 1 AS weekday, value
        FROM events WHERE value IS NOT NULL
    ),
    g AS (SELECT AVG(value) AS mu, stddev_pop(value) AS sd FROM v),
    cells AS (
        SELECT event_type, weekday, COUNT(*) AS n, AVG(value) AS m
        FROM v GROUP BY 1, 2
    ),
    z AS (
        SELECT event_type, weekday, n,
               (m - g.mu) / (g.sd / SQRT(n)) AS z
        FROM cells CROSS JOIN g
    ),
    p AS (
        SELECT event_type, weekday, n, z,
               2.0 * (0.39894228040143267794 * exp(-ABS(z) * ABS(z) / 2)
                      * (0.319381530 * (1.0 / (1.0 + 0.2316419 * ABS(z)))
                         - 0.356563782 * POWER(1.0 / (1.0 + 0.2316419 * ABS(z)), 2)
                         + 1.781477937 * POWER(1.0 / (1.0 + 0.2316419 * ABS(z)), 3)
                         - 1.821255978 * POWER(1.0 / (1.0 + 0.2316419 * ABS(z)), 4)
                         + 1.330274429 * POWER(1.0 / (1.0 + 0.2316419 * ABS(z)), 5)))
                   AS pval
        FROM z
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY pval, event_type, weekday) AS rnk,
               COUNT(*) OVER () AS m_tests
        FROM p
    ),
    cutoff AS (
        SELECT MAX(CASE WHEN pval <= 0.05 * rnk / m_tests THEN pval END)
                   AS cut
        FROM r
    )
    SELECT r.event_type, CAST(r.weekday AS BIGINT) AS weekday,
           CAST(r.n AS BIGINT) AS n,
           ROUND(r.z, 4) AS z,
           ROUND(r.pval, 6) AS pval,
           ROUND(0.05 * r.rnk / r.m_tests, 6) AS bh_threshold,
           COALESCE(r.pval <= cutoff.cut, FALSE) AS rejected
    FROM r CROSS JOIN cutoff
    ORDER BY r.event_type, r.weekday
    """,
)
def q_bh_fdr_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a 35-hypothesis panel (one
    one-sample z test per event_type × weekday cell against the global
    mean): per cell the z, the two-sided p via the Abramowitz-Stegun
    26.2.17 Φ polynomial (stated IDENTICALLY in Spark and the oracle —
    no library CDF on either side), the BH step-up threshold
    α·rank/m, and the rejection flag from the step-up cutoff.  The
    multiple-testing layer every screening panel in this corpus
    (chi², MW, Fano, Chow) feeds at scale.  Cell stats are one hash
    agg; the BH sort is a window over the 35-row panel (bounded frame
    above the aggregate, the plan_audit-sanctioned shape)."""
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.weekday("ts").alias("weekday"), "value")
    )
    g = v.agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sd")
    )
    cells = v.groupBy("event_type", "weekday").agg(
        F.count(F.lit(1)).alias("n"), F.avg("value").alias("m")
    )
    z = cells.crossJoin(F.broadcast(g)).select(
        "event_type",
        "weekday",
        "n",
        ((F.col("m") - F.col("mu")) / (F.col("sd") / F.sqrt("n"))).alias(
            "z"
        ),
    )
    az = F.abs(F.col("z"))
    t = 1.0 / (1.0 + 0.2316419 * az)
    phi_tail = (
        0.39894228040143267794
        * F.exp(-az * az / 2)
        * (
            0.319381530 * t
            - 0.356563782 * F.pow(t, 2)
            + 1.781477937 * F.pow(t, 3)
            - 1.821255978 * F.pow(t, 4)
            + 1.330274429 * F.pow(t, 5)
        )
    )
    p = z.withColumn("pval", 2.0 * phi_tail)
    wr = Window.orderBy("pval", "event_type", "weekday")
    r = p.withColumn("rnk", F.row_number().over(wr)).withColumn(
        "m_tests", F.count(F.lit(1)).over(Window.partitionBy())
    )
    cutoff = r.agg(
        F.max(
            F.when(
                F.col("pval") <= 0.05 * F.col("rnk") / F.col("m_tests"),
                F.col("pval"),
            )
        ).alias("cut")
    )
    return (
        r.crossJoin(F.broadcast(cutoff))
        .select(
            "event_type",
            F.col("weekday").cast("long").alias("weekday"),
            F.col("n").cast("long").alias("n"),
            F.round("z", 4).alias("z"),
            F.round("pval", 6).alias("pval"),
            F.round(0.05 * F.col("rnk") / F.col("m_tests"), 6).alias(
                "bh_threshold"
            ),
            F.coalesce(F.col("pval") <= F.col("cut"), F.lit(False)).alias(
                "rejected"
            ),
        )
        .orderBy("event_type", "weekday")
    )


@register(
    "misra_gries_audit",
    oracle="""
    WITH st AS (
        SELECT COUNT(*) AS n, COUNT(DISTINCT o_orderstatus) AS d
        FROM orders
    ),
    ec AS (SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1),
    et AS (
        SELECT SUM(cnt) AS n, COUNT(*) AS d,
               COUNT(CASE WHEN cnt > (SELECT SUM(cnt) FROM ec) / 3.0
                     THEN 1 END) AS heavy
        FROM ec
    )
    SELECT 'exact_k3_orderstatus' AS audit_case, 3 AS k,
           CAST(st.n AS BIGINT) AS n_total,
           CAST(st.d AS BIGINT) AS n_distinct,
           CAST(st.d AS BIGINT) AS n_true_heavy,
           TRUE AS within_bound, TRUE AS heavy_found, TRUE AS le_k
    FROM st
    UNION ALL
    SELECT 'bounded_k2_event_type', 2,
           CAST(et.n AS BIGINT), CAST(et.d AS BIGINT),
           CAST(et.heavy AS BIGINT),
           TRUE, TRUE, TRUE
    FROM et
    ORDER BY audit_case
    """,
)
def q_misra_gries_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries frequent-items audit
    (operators/sketches.py:misra_gries) in the cms_error_bound_audit
    tolerance-oracle style: the candidate SET is partition-dependent,
    so the exported columns are only the partition-INDEPENDENT
    guarantees — every estimate underestimates by ≤ n/(k+1), every
    true heavy item survives, and ≤ k candidates return.  Two cases:
    k=3 over o_orderstatus (distinct ≤ k ⇒ the sketch never evicts and
    is EXACT — underestimate must be zero), and k=2 over event_type
    (distinct > k ⇒ eviction path exercised, bound must hold).  The
    oracle recomputes n/distinct/heavy exactly and pins every
    guarantee column to TRUE."""
    from .operators.sketches import misra_gries

    def audit(df, col, k, case):
        exact = df.groupBy(F.col(col).alias("item")).agg(
            F.count(F.lit(1)).alias("exact")
        )
        st = exact.agg(
            F.sum("exact").alias("n"),
            F.count(F.lit(1)).alias("d"),
        )
        mg = misra_gries(df, col, k)
        joined = (
            exact.join(mg, "item", "left")
            .crossJoin(F.broadcast(st))
            .select(
                "item",
                "exact",
                "est",
                "n",
                "d",
                (F.col("exact") > F.col("n") / (k + 1.0)).alias("heavy"),
            )
        )
        exact_when_no_evict = F.when(
            F.col("d") <= k, F.col("est") == F.col("exact")
        ).otherwise(F.lit(True))
        return joined.agg(
            F.lit(case).alias("audit_case"),
            F.lit(k).alias("k"),
            F.max("n").cast("long").alias("n_total"),
            F.max("d").cast("long").alias("n_distinct"),
            F.sum(F.col("heavy").cast("int")).cast("long").alias(
                "n_true_heavy"
            ),
            F.bool_and(
                F.when(
                    F.col("est").isNotNull(),
                    (F.col("est") <= F.col("exact"))
                    & (F.col("exact") - F.col("est") <= F.col("n") / (k + 1.0))
                    & exact_when_no_evict,
                ).otherwise(F.lit(True))
            ).alias("within_bound"),
            F.bool_and(
                F.when(F.col("heavy"), F.col("est").isNotNull()).otherwise(
                    F.lit(True)
                )
            ).alias("heavy_found"),
            (F.count("est") <= k).alias("le_k"),
        )

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    return (
        audit(orders, "o_orderstatus", 3, "exact_k3_orderstatus")
        .unionByName(audit(ev, "event_type", 2, "bounded_k2_event_type"))
        .orderBy("audit_case")
    )


def _hits_oracle(iters: int = 5) -> str:
    """Unrolled HITS oracle: (hub-normalize, authority-normalize) CTE
    quadruple per iteration — DuckDB replays every power step.  Every
    CTE is MATERIALIZED: each step is referenced twice (aggregate +
    norm subquery), so inlining would double the expression tree per
    step and the unrolled plan would blow up exponentially (observed:
    the inlined 5-iteration plan never finished at sf0.01)."""
    parts = [
        """
    WITH e AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    an0 AS MATERIALIZED (SELECT DISTINCT s, 1.0 AS a FROM e)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    h{i} AS MATERIALIZED (
        SELECT c, SUM(a) AS h FROM e JOIN an{i - 1} USING (s) GROUP BY c
    ),
    hn{i} AS MATERIALIZED (
        SELECT c, h / (SELECT SQRT(SUM(h * h)) FROM h{i}) AS h FROM h{i}
    ),
    a{i} AS MATERIALIZED (
        SELECT s, SUM(h) AS a FROM e JOIN hn{i} USING (c) GROUP BY s
    ),
    an{i} AS MATERIALIZED (
        SELECT s, a / (SELECT SQRT(SUM(a * a)) FROM a{i}) AS a FROM a{i}
    )"""
        )
    parts.append(
        f"""
    SELECT CAST(s AS BIGINT) AS s_suppkey, ROUND(a, 6) AS authority
    FROM an{iters}
    ORDER BY ROUND(a, 6) DESC, s LIMIT 10"""
    )
    return "".join(parts)


@register("hits_supplier_authority", oracle=_hits_oracle())
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg) on the bipartite
    customer→supplier purchase graph (distinct (custkey, suppkey) via
    orders ⋈ lineitem): 5 L2-normalized power iterations, top-10
    supplier authority scores — the link-analysis complement to
    PageRank's random-surfer centrality.  Each half-step is one
    edge-join + hash agg with the L2 norm as a broadcast scalar; at a
    web-scale edge list the loop gains checkpoint truncation every few
    rounds exactly like pagerank's.  The oracle unrolls all five
    iterations, value-checking every normalized power step; the top-10
    boundary orders on the ROUNDED score with a supplier tie-break."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
    )
    e = e.localCheckpoint(eager=True)
    a = e.select("s").distinct().withColumn("a", F.lit(1.0))
    for _ in range(5):
        # each half-step's frame is referenced twice (aggregate + its
        # own L2 norm), so truncate lineage once per half-step — same
        # contract as pagerank's (operators/graph.py:122); without it
        # the recompute set triples per iteration.
        h = (
            e.join(a, "s")
            .groupBy("c")
            .agg(F.sum("a").alias("h"))
            .localCheckpoint(eager=True)
        )
        hnorm = h.agg(F.sqrt(F.sum(F.col("h") * F.col("h"))).alias("nm"))
        hn = h.crossJoin(F.broadcast(hnorm)).select(
            "c", (F.col("h") / F.col("nm")).alias("h")
        )
        a_raw = (
            e.join(hn, "c")
            .groupBy("s")
            .agg(F.sum("h").alias("a"))
            .localCheckpoint(eager=True)
        )
        anorm = a_raw.agg(
            F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("nm")
        )
        a = a_raw.crossJoin(F.broadcast(anorm)).select(
            "s", (F.col("a") / F.col("nm")).alias("a")
        )
    return (
        a.select(
            F.col("s").cast("long").alias("s_suppkey"),
            F.round("a", 6).alias("authority"),
        )
        .orderBy(F.desc("authority"), "s_suppkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Round-7 sixth wave: reliability / fraud-ops — Kaplan-Meier survival,
# Benford first-digit audit, PSI population stability, EWMA control
# chart, isotonic (PAV) calibration.
# ---------------------------------------------------------------------------


@register(
    "kaplan_meier_weekly",
    oracle="""
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS mx_us FROM events),
    users AS (
        SELECT user_id, MIN(epoch_us(ts)) AS first_us,
               MAX(epoch_us(ts)) AS last_us
        FROM events GROUP BY user_id
    ),
    subj AS (
        SELECT CAST(FLOOR((last_us - first_us) / 604800000000.0)
                    AS BIGINT) AS week,
               CASE WHEN last_us < mx.mx_us - 604800000000 THEN 1 ELSE 0
               END AS died
        FROM users CROSS JOIN mx
    ),
    lt AS (
        SELECT week, SUM(died) AS d, SUM(1 - died) AS c
        FROM subj GROUP BY week
    ),
    risk AS (
        SELECT week, d, c,
               SUM(d + c) OVER (ORDER BY week
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS n_risk
        FROM lt
    ),
    km AS (
        SELECT week, d, c, n_risk,
               MIN(1.0 - d * 1.0 / n_risk) OVER (ORDER BY week
                   ROWS UNBOUNDED PRECEDING) AS min_factor,
               SUM(CASE WHEN d * 1.0 / n_risk < 1.0
                        THEN ln(1.0 - d * 1.0 / n_risk)
                        ELSE 0.0 END) OVER (ORDER BY week
                   ROWS UNBOUNDED PRECEDING) AS lnsum
        FROM risk
    )
    SELECT CAST(week AS BIGINT) AS week,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_churned,
           CAST(c AS BIGINT) AS n_censored,
           CASE WHEN min_factor <= 0.0 THEN 0.0
                ELSE ROUND(exp(lnsum), 6) END AS survival
    FROM km ORDER BY week
    """,
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival of user tenure in weeks
    (first event → last event), right-censored for users still active
    in the final observed week.  The life table is per-week deaths /
    censorings with at-risk counts from a reverse cumulative sum; the
    survival product runs as exp(Σ ln(1−d/n)) with a cumulative-min
    guard for a zero factor (ln(0) is NULL in Spark, −inf in DuckDB —
    the guard keeps both engines off that value entirely).  All
    windows sit above the per-week aggregate: the frame is
    calendar-bounded (≤ observation span / 7 rows) at any SF."""
    us = 604_800_000_000  # µs per week
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns div 1000").alias("ts_us")
    )
    mx = ev.agg(F.max("ts_us").alias("mx_us"))
    users = ev.groupBy("user_id").agg(
        F.min("ts_us").alias("first_us"), F.max("ts_us").alias("last_us")
    )
    subj = users.crossJoin(F.broadcast(mx)).select(
        F.floor((F.col("last_us") - F.col("first_us")) / float(us))
        .cast("long")
        .alias("week"),
        (F.col("last_us") < F.col("mx_us") - us).cast("int").alias("died"),
    )
    lt = subj.groupBy("week").agg(
        F.sum("died").alias("d"), F.sum(1 - F.col("died")).alias("c")
    )
    w_after = Window.orderBy("week").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_upto = Window.orderBy("week").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = lt.withColumn("n_risk", F.sum(F.col("d") + F.col("c")).over(w_after))
    frac = F.col("d") / F.col("n_risk")
    km = risk.withColumn(
        "min_factor", F.min(1.0 - frac).over(w_upto)
    ).withColumn(
        "lnsum",
        F.sum(
            F.when(frac < 1.0, F.log(1.0 - frac)).otherwise(F.lit(0.0))
        ).over(w_upto),
    )
    return km.select(
        F.col("week").cast("long").alias("week"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_churned"),
        F.col("c").cast("long").alias("n_censored"),
        F.when(F.col("min_factor") <= 0.0, F.lit(0.0))
        .otherwise(F.round(F.exp("lnsum"), 6))
        .alias("survival"),
    ).orderBy("week")


@register(
    "benford_digit_audit",
    oracle="""
    WITH vals AS (
        SELECT 'orders_totalprice' AS src, o_totalprice AS v FROM orders
        WHERE o_totalprice > 0
        UNION ALL
        SELECT 'events_value', value FROM events
        WHERE value IS NOT NULL AND value > 0
    ),
    digits AS (
        SELECT src,
               GREATEST(1, LEAST(9, CAST(FLOOR(
                   v / POWER(10, FLOOR(LOG10(v)))) AS BIGINT))) AS digit
        FROM vals
    ),
    per AS (
        SELECT src, digit, COUNT(*) AS n FROM digits GROUP BY 1, 2
    ),
    grid AS (
        SELECT s.src, g.digit, COALESCE(per.n, 0) AS n
        FROM (SELECT DISTINCT src FROM per) s
        CROSS JOIN (SELECT digit FROM range(1, 10) t(digit)) g
        LEFT JOIN per ON per.src = s.src AND per.digit = g.digit
    ),
    tot AS (SELECT src, SUM(n) AS n_src FROM grid GROUP BY src),
    scored AS (
        SELECT grid.src, grid.digit, grid.n, tot.n_src,
               grid.n * 1.0 / tot.n_src AS obs_p,
               LOG10(1.0 + 1.0 / grid.digit) AS exp_p
        FROM grid JOIN tot ON tot.src = grid.src
    ),
    roll AS (
        SELECT src,
               SUM(POWER(obs_p - exp_p, 2) / exp_p) * MAX(n_src) AS chi2,
               AVG(ABS(obs_p - exp_p)) AS mad
        FROM scored GROUP BY src
    )
    SELECT scored.src, CAST(scored.digit AS BIGINT) AS digit,
           CAST(scored.n AS BIGINT) AS n,
           ROUND(scored.obs_p, 6) AS obs_p,
           ROUND(scored.exp_p, 6) AS benford_p,
           ROUND(roll.chi2, 4) AS chi2,
           ROUND(roll.mad, 6) AS mad,
           roll.mad > 0.015 AS nonconforming
    FROM scored JOIN roll ON roll.src = scored.src
    ORDER BY scored.src, scored.digit
    """,
)
def q_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit over order totals and
    event values — the classic fabricated-numbers fraud screen.  Digit
    extraction is pure JVM math (floor/log10/power, GREATEST/LEAST
    clamped identically on both engines so a 1-ulp log10 disagreement
    at an exact power of ten cannot split the digit), the per-source
    digit histogram is one hash aggregate against a zero-filled 9-digit
    grid, and the chi-square distance plus the Nigrini mean-absolute-
    deviation verdict (MAD > 0.015 = nonconforming for this panel
    size) broadcast back onto the 18-row frame."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.lit("orders_totalprice").alias("src"),
            F.col("o_totalprice").alias("v"),
        )
    )
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & (F.col("value") > 0))
        .select(F.lit("events_value").alias("src"), F.col("value").alias("v"))
    )
    vals = orders.unionByName(events)
    digit = F.greatest(
        F.lit(1),
        F.least(
            F.lit(9),
            F.floor(
                F.col("v") / F.pow(F.lit(10.0), F.floor(F.log10("v")))
            ).cast("long"),
        ),
    )
    per = (
        vals.select("src", digit.alias("digit"))
        .groupBy("src", "digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = (
        per.select("src")
        .distinct()
        .crossJoin(F.broadcast(spark.range(1, 10).select(F.col("id").alias("digit"))))
        .join(per, ["src", "digit"], "left")
        .select("src", "digit", F.coalesce("n", F.lit(0)).alias("n"))
    )
    tot = grid.groupBy("src").agg(F.sum("n").alias("n_src"))
    scored = grid.join(F.broadcast(tot), "src").select(
        "src",
        "digit",
        "n",
        "n_src",
        (F.col("n") / F.col("n_src")).alias("obs_p"),
        F.log10(1.0 + 1.0 / F.col("digit")).alias("exp_p"),
    )
    roll = scored.groupBy("src").agg(
        (
            F.sum(F.pow(F.col("obs_p") - F.col("exp_p"), 2) / F.col("exp_p"))
            * F.max("n_src")
        ).alias("chi2"),
        F.avg(F.abs(F.col("obs_p") - F.col("exp_p"))).alias("mad"),
    )
    return (
        scored.join(F.broadcast(roll), "src")
        .select(
            "src",
            F.col("digit").cast("long").alias("digit"),
            F.col("n").cast("long").alias("n"),
            F.round("obs_p", 6).alias("obs_p"),
            F.round("exp_p", 6).alias("benford_p"),
            F.round("chi2", 4).alias("chi2"),
            F.round("mad", 6).alias("mad"),
            (F.col("mad") > 0.015).alias("nonconforming"),
        )
        .orderBy("src", "digit")
    )


@register(
    "psi_value_stability",
    oracle="""
    WITH v AS (
        SELECT event_type, epoch_us(ts) AS ts_us, value
        FROM events WHERE value IS NOT NULL
    ),
    cut AS (SELECT quantile_cont(ts_us, 0.5) AS c FROM v),
    edges AS (
        SELECT quantile_cont(value,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e FROM v
    ),
    binned AS (
        SELECT v.event_type,
               CASE WHEN v.ts_us >= cut.c THEN 1 ELSE 0 END AS half,
               len(list_filter(edges.e, x -> v.value > x)) AS bin
        FROM v CROSS JOIN cut CROSS JOIN edges
    ),
    grid AS (
        SELECT t.event_type, h.half, b.bin, COALESCE(cnt.n, 0) AS n
        FROM (SELECT DISTINCT event_type FROM binned) t
        CROSS JOIN (SELECT UNNEST([0, 1]) AS half) h
        CROSS JOIN (SELECT bin FROM range(0, 10) r(bin)) b
        LEFT JOIN (
            SELECT event_type, half, bin, COUNT(*) AS n
            FROM binned GROUP BY 1, 2, 3
        ) cnt ON cnt.event_type = t.event_type AND cnt.half = h.half
             AND cnt.bin = b.bin
    ),
    tot AS (
        SELECT event_type, half, SUM(n) AS n_half
        FROM grid GROUP BY 1, 2
    ),
    props AS (
        SELECT grid.event_type, grid.bin,
               MAX(CASE WHEN grid.half = 0
                   THEN GREATEST(grid.n * 1.0 / tot.n_half, 1e-6) END) AS p,
               MAX(CASE WHEN grid.half = 1
                   THEN GREATEST(grid.n * 1.0 / tot.n_half, 1e-6) END) AS q
        FROM grid JOIN tot ON tot.event_type = grid.event_type
                          AND tot.half = grid.half
        GROUP BY 1, 2
    ),
    psi AS (
        SELECT event_type, SUM((p - q) * ln(p / q)) AS psi
        FROM props GROUP BY event_type
    )
    SELECT psi.event_type,
           CAST(t0.n_half AS BIGINT) AS n_first,
           CAST(t1.n_half AS BIGINT) AS n_second,
           ROUND(psi.psi, 6) AS psi,
           psi.psi > 0.2 AS unstable
    FROM psi
    JOIN tot t0 ON t0.event_type = psi.event_type AND t0.half = 0
    JOIN tot t1 ON t1.event_type = psi.event_type AND t1.half = 1
    ORDER BY psi.event_type
    """,
)
def q_psi_value_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the value distribution per event
    type between the first and second time halves (exact-median cut) —
    THE production drift gate in fraud scoring, complementing the KL
    mix-shift and Wasserstein screens with the banker's binned Σ(p−q)
    ln(p/q).  Bins are GLOBAL value deciles (so every SF keeps all ten
    bins populated overall), assigned by filtering the broadcast 9-edge
    array — no row explosion; zero cells clamp to 1e-6 identically on
    both engines.  Two hash aggregates over a zero-filled type×half×bin
    grid; the widest shuffled frame is |types|·20 rows."""
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type", F.expr("ts_ns div 1000").alias("ts_us"), "value"
        )
    )
    cut = v.agg(F.percentile("ts_us", F.lit(0.5)).alias("c"))
    edges = v.agg(
        F.percentile(
            "value",
            F.array(*[F.lit(k / 10.0) for k in range(1, 10)]),
        ).alias("e")
    )
    binned = (
        v.crossJoin(F.broadcast(cut))
        .crossJoin(F.broadcast(edges))
        .select(
            "event_type",
            (F.col("ts_us") >= F.col("c")).cast("int").alias("half"),
            F.size(
                F.filter("e", lambda x: F.col("value") > x)
            ).alias("bin"),
        )
    )
    cnt = binned.groupBy("event_type", "half", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    grid = (
        cnt.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(spark.range(0, 2).select(F.col("id").alias("half"))))
        .crossJoin(F.broadcast(spark.range(0, 10).select(F.col("id").alias("bin"))))
        .join(cnt, ["event_type", "half", "bin"], "left")
        .select(
            "event_type", "half", "bin", F.coalesce("n", F.lit(0)).alias("n")
        )
    )
    tot = grid.groupBy("event_type", "half").agg(F.sum("n").alias("n_half"))
    share = F.greatest(F.col("n") / F.col("n_half"), F.lit(1e-6))
    props = (
        grid.join(F.broadcast(tot), ["event_type", "half"])
        .groupBy("event_type", "bin")
        .agg(
            F.max(F.when(F.col("half") == 0, share)).alias("p"),
            F.max(F.when(F.col("half") == 1, share)).alias("q"),
        )
    )
    psi = props.groupBy("event_type").agg(
        F.sum(
            (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
        ).alias("psi")
    )
    t0 = tot.filter(F.col("half") == 0).select(
        "event_type", F.col("n_half").alias("n_first")
    )
    t1 = tot.filter(F.col("half") == 1).select(
        "event_type", F.col("n_half").alias("n_second")
    )
    return (
        psi.join(F.broadcast(t0), "event_type")
        .join(F.broadcast(t1), "event_type")
        .select(
            "event_type",
            F.col("n_first").cast("long").alias("n_first"),
            F.col("n_second").cast("long").alias("n_second"),
            F.round("psi", 6).alias("psi"),
            (F.col("psi") > 0.2).alias("unstable"),
        )
        .orderBy("event_type")
    )


@register(
    "ewma_control_chart",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ),
    series AS (
        SELECT ROW_NUMBER() OVER (ORDER BY d) AS t, d, rev FROM daily
    ),
    st AS (
        SELECT AVG(rev) AS mu, stddev_pop(rev) AS sigma,
               MAX(t) AS n FROM series
    ),
    rec AS (
        SELECT 0 AS t, st.mu AS z FROM st
        UNION ALL
        SELECT s.t, 0.8 * rec.z + 0.2 * s.rev
        FROM rec JOIN series s ON s.t = rec.t + 1
    )
    SELECT CAST(s.t AS BIGINT) AS t, STRFTIME(s.d, '%Y-%m-%d') AS d,
           ROUND(s.rev, 2) AS rev,
           ROUND(rec.z, 2) AS ewma,
           ROUND(st.mu + 3 * st.sigma *
                 SQRT(0.2 / 1.8 * (1 - POWER(0.64, s.t))), 2) AS ucl,
           ROUND(st.mu - 3 * st.sigma *
                 SQRT(0.2 / 1.8 * (1 - POWER(0.64, s.t))), 2) AS lcl,
           (rec.z > st.mu + 3 * st.sigma *
                 SQRT(0.2 / 1.8 * (1 - POWER(0.64, s.t))))
            OR (rec.z < st.mu - 3 * st.sigma *
                 SQRT(0.2 / 1.8 * (1 - POWER(0.64, s.t)))) AS breach
    FROM series s JOIN rec ON rec.t = s.t CROSS JOIN st
    ORDER BY s.t
    """,
)
def q_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (λ=0.2, L=3) over daily revenue — the SPC
    small-shift monitor beside the corpus's CUSUM and Page-Hinkley
    screens.  z_0 is the series mean; limits use the exact
    finite-horizon variance factor √(λ/(2−λ)·(1−(1−λ)^{2t})).  The
    recursion is inherently sequential, so it runs as ONE Arrow task
    over the CALENDAR-bounded daily frame after the distributed daily
    aggregate (holt_linear_backtest's hybrid-endgame rationale); the
    DuckDB twin replays the identical recursion step-for-step as a
    recursive CTE, value-checking every smoothing step."""
    import math

    import pandas as pd

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )

    def ewma_kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d").reset_index(drop=True)
        y = pdf["rev"].to_numpy(dtype="float64")
        n = len(y)
        mu = float(y.sum() / n)
        sigma = math.sqrt(float(((y - mu) ** 2).sum() / n))
        rows = []
        z = mu
        for t in range(1, n + 1):
            z = 0.8 * z + 0.2 * y[t - 1]
            half = 3 * sigma * math.sqrt(0.2 / 1.8 * (1 - 0.64**t))
            rows.append(
                (
                    t,
                    pdf["d"][t - 1].strftime("%Y-%m-%d"),
                    round(y[t - 1], 2),
                    round(z, 2),
                    round(mu + half, 2),
                    round(mu - half, 2),
                    z > mu + half or z < mu - half,
                )
            )
        return pd.DataFrame(
            rows, columns=["t", "d", "rev", "ewma", "ucl", "lcl", "breach"]
        )

    out_schema = (
        "t long, d string, rev double, ewma double, ucl double, lcl double,"
        " breach boolean"
    )
    return (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(ewma_kernel, schema=out_schema)
        .drop("g")
        .orderBy("t")
    )


@register(
    "isotonic_pav_calibration",
    oracle="""
    WITH scored AS (
        SELECT 1.0 / (1.0 + exp(-((value - 50) / 25.0))) AS s,
               CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    per AS (
        SELECT LEAST(CAST(FLOOR(s * 20) AS BIGINT), 19) AS bin,
               COUNT(*) AS n, AVG(s) AS conf, AVG(y) AS raw_rate
        FROM scored GROUP BY 1
    ),
    idx AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY bin) AS r FROM per
    ),
    iv AS (
        SELECT a.r AS j, b.r AS k,
               SUM(c.n * c.raw_rate) / SUM(c.n) AS avg_jk
        FROM idx a JOIN idx b ON b.r >= a.r
        JOIN idx c ON c.r BETWEEN a.r AND b.r
        GROUP BY 1, 2
    ),
    minq AS (
        SELECT iv.j, i.r AS i, MIN(iv.avg_jk) AS mn
        FROM iv JOIN idx i ON iv.j <= i.r AND iv.k >= i.r
        GROUP BY 1, 2
    ),
    fit AS (SELECT i, MAX(mn) AS iso FROM minq GROUP BY i)
    SELECT CAST(idx.bin AS BIGINT) AS bin, CAST(idx.n AS BIGINT) AS n,
           ROUND(idx.conf, 6) AS avg_score,
           ROUND(idx.raw_rate, 6) AS raw_rate,
           ROUND(fit.iso, 6) AS iso_rate
    FROM idx JOIN fit ON fit.i = idx.r
    ORDER BY idx.bin
    """,
)
def q_isotonic_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the fixed logistic scorer against
    the purchase outcome, over 20 equi-width score bins — the
    monotone-regression companion to ece_calibration_bins.  Instead of
    the sequential pool-adjacent-violators stack, the fit uses the
    minimax identity iso_i = max_{j≤i} min_{k≥i} avg(y̅ weighted over
    bins j..k), which is pure relational algebra over the ≤ 20-row bin
    frame (O(B³) interval enumeration — trivial at B=20, broadcast
    joins throughout); the sequential-PAV equivalence is pinned by the
    pytest brute force.  Only the bin aggregate touches fact-sized
    data."""
    scored = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (
                1.0 / (1.0 + F.exp(-((F.col("value") - 50) / 25.0)))
            ).alias("s"),
            (F.col("event_type") == "purchase").cast("double").alias("y"),
        )
    )
    per = (
        scored.select(
            F.least(F.floor(F.col("s") * 20).cast("long"), F.lit(19)).alias(
                "bin"
            ),
            "s",
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("s").alias("conf"),
            F.avg("y").alias("raw_rate"),
        )
    )
    idx = per.withColumn("r", F.row_number().over(Window.orderBy("bin")))
    a = idx.select(F.col("r").alias("j"))
    b = idx.select(F.col("r").alias("k"))
    c = idx.select(
        F.col("r").alias("rc"), F.col("n").alias("nc"),
        F.col("raw_rate").alias("yc"),
    )
    iv = (
        a.join(b, F.col("k") >= F.col("j"))
        .join(
            F.broadcast(c),
            (F.col("rc") >= F.col("j")) & (F.col("rc") <= F.col("k")),
        )
        .groupBy("j", "k")
        .agg(
            (F.sum(F.col("nc") * F.col("yc")) / F.sum("nc")).alias("avg_jk")
        )
    )
    minq = (
        iv.join(
            F.broadcast(idx.select(F.col("r").alias("i"))),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("j", "i")
        .agg(F.min("avg_jk").alias("mn"))
    )
    fit = minq.groupBy("i").agg(F.max("mn").alias("iso"))
    return (
        idx.join(F.broadcast(fit), idx.r == fit.i)
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("n").cast("long").alias("n"),
            F.round("conf", 6).alias("avg_score"),
            F.round("raw_rate", 6).alias("raw_rate"),
            F.round("iso", 6).alias("iso_rate"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Round-7 seventh wave: Bloom semi-join with a bit-exact SQL-replicated
# filter, graph modularity of a labeled partition, top session paths.
# ---------------------------------------------------------------------------


@register(
    "bloom_semi_join_audit",
    oracle="""
    WITH b AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    prm AS (SELECT 32 * COUNT(*) AS m FROM b),
    setpos AS (
        SELECT DISTINCT UNNEST([
            ((user_id * 1000003 + 7) % 999983 * 40503) % 999983 % m,
            ((user_id * 1012003 + 11) % 999983 * 40503) % 999983 % m,
            ((user_id * 1030003 + 13) % 999983 * 40503) % 999983 % m
        ]) AS pos
        FROM b CROSS JOIN prm
    ),
    u AS (SELECT DISTINCT user_id FROM events),
    ppos AS (
        SELECT DISTINCT user_id, UNNEST([
            ((user_id * 1000003 + 7) % 999983 * 40503) % 999983 % m,
            ((user_id * 1012003 + 11) % 999983 * 40503) % 999983 % m,
            ((user_id * 1030003 + 13) % 999983 * 40503) % 999983 % m
        ]) AS pos
        FROM u CROSS JOIN prm
    ),
    hit AS (
        SELECT ppos.user_id,
               COUNT(*) = COUNT(setpos.pos) AS pass
        FROM ppos LEFT JOIN setpos ON setpos.pos = ppos.pos
        GROUP BY ppos.user_id
    ),
    lab AS (
        SELECT hit.user_id, hit.pass,
               b.user_id IS NOT NULL AS member
        FROM hit LEFT JOIN b ON b.user_id = hit.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_build,
           CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_probe,
           CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
               AS n_members,
           CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           bool_and(CASE WHEN member THEN pass ELSE TRUE END)
               AS no_false_negatives,
           ROUND(SUM(CASE WHEN pass AND NOT member THEN 1.0 ELSE 0 END)
                 / GREATEST(SUM(CASE WHEN NOT member THEN 1 ELSE 0 END), 1),
                 6) AS fp_rate,
           ROUND(POWER(1.0 - exp(-3.0 / 32.0), 3), 6) AS fp_bound
    FROM lab
    """,
)
def q_bloom_semi_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join audit (operators/sketches.py:bloom_semi_join):
    build on purchasing users, probe every distinct event user, and
    compare against the exact membership — the shuffle-avoidance
    primitive for 100 TB semi-joins (ship 3·n positions instead of the
    fact table).  The affine hash family is SQL-replicable, so the
    DuckDB twin rebuilds the filter BIT-FOR-BIT and every count
    (passes, false positives, rate) matches exactly — stronger than a
    tolerance oracle.  m = 32·n_build keeps the design rate
    (1−e^{−3/32})³ ≈ 7e-4 scale-free; no-false-negatives is pinned as
    a hard boolean."""
    from .operators.sketches import _bloom_positions

    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    prm = b.agg((F.count(F.lit(1)) * 32).cast("long").alias("m"))
    setpos = (
        b.crossJoin(F.broadcast(prm))
        .select(
            F.explode(
                _bloom_positions(F.col("user_id"), F.col("m"))
            ).alias("pos")
        )
        .distinct()
    )
    u = ev.select("user_id").distinct()
    ppos = (
        u.crossJoin(F.broadcast(prm))
        .select(
            "user_id",
            F.explode(
                _bloom_positions(F.col("user_id"), F.col("m"))
            ).alias("pos"),
        )
        .distinct()
    )
    hit = (
        ppos.join(setpos.withColumn("__hit", F.lit(1)), "pos", "left")
        .groupBy("user_id")
        .agg((F.count(F.lit(1)) == F.count("__hit")).alias("pass"))
    )
    lab = hit.join(
        b.withColumn("__member", F.lit(1)), "user_id", "left"
    ).select("pass", F.col("__member").isNotNull().alias("member"))
    nb = b.agg(F.count(F.lit(1)).alias("n_build"))
    nu = u.agg(F.count(F.lit(1)).alias("n_probe"))
    return (
        lab.agg(
            F.sum(F.col("member").cast("int")).cast("long").alias("n_members"),
            F.sum(F.col("pass").cast("int")).cast("long").alias("n_pass"),
            F.sum((F.col("pass") & ~F.col("member")).cast("int"))
            .cast("long")
            .alias("n_false_pos"),
            F.bool_and(F.when(F.col("member"), F.col("pass")).otherwise(F.lit(True)))
            .alias("no_false_negatives"),
            F.round(
                F.sum((F.col("pass") & ~F.col("member")).cast("double"))
                / F.greatest(
                    F.sum((~F.col("member")).cast("int")), F.lit(1)
                ),
                6,
            ).alias("fp_rate"),
        )
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .select(
            F.col("n_build").cast("long").alias("n_build"),
            F.col("n_probe").cast("long").alias("n_probe"),
            "n_members",
            "n_pass",
            "n_false_pos",
            "no_false_negatives",
            "fp_rate",
            F.round(
                F.pow(1.0 - F.exp(F.lit(-3.0 / 32.0)), 3), 6
            ).alias("fp_bound"),
        )
    )


@register(
    "modularity_supplier_nations",
    oracle="""
    WITH os AS (
        SELECT DISTINCT l_orderkey AS okey, l_suppkey AS s FROM lineitem
    ),
    pairs AS (
        SELECT a.s AS u, b.s AS v, COUNT(*) AS w
        FROM os a JOIN os b ON a.okey = b.okey AND a.s < b.s
        GROUP BY 1, 2
    ),
    e AS (SELECT u, v FROM pairs WHERE w >= 2),
    m AS (SELECT COUNT(*) AS m_edges FROM e),
    deg AS (
        SELECT node, COUNT(*) AS k FROM (
            SELECT u AS node FROM e UNION ALL SELECT v FROM e
        ) GROUP BY node
    ),
    com AS (
        SELECT s_suppkey AS node, n_name FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
    ),
    within AS (
        SELECT cu.n_name, COUNT(*) AS e_within
        FROM e JOIN com cu ON cu.node = e.u
               JOIN com cv ON cv.node = e.v
        WHERE cu.n_name = cv.n_name
        GROUP BY 1
    ),
    ksum AS (
        SELECT com.n_name, COUNT(*) AS n_nodes, SUM(deg.k) AS k_c
        FROM deg JOIN com ON com.node = deg.node
        GROUP BY 1
    ),
    per AS (
        SELECT ksum.n_name, ksum.n_nodes, ksum.k_c,
               COALESCE(within.e_within, 0) AS e_within,
               COALESCE(within.e_within, 0) * 1.0 / m.m_edges
                 - POWER(ksum.k_c * 1.0 / (2 * m.m_edges), 2) AS contrib
        FROM ksum LEFT JOIN within ON within.n_name = ksum.n_name
        CROSS JOIN m
    )
    SELECT n_name,
           CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(k_c AS BIGINT) AS degree_sum,
           CAST(e_within AS BIGINT) AS e_within,
           ROUND(contrib, 6) AS q_contrib,
           ROUND(SUM(contrib) OVER (), 6) AS q_total
    FROM per ORDER BY n_name
    """,
)
def q_modularity_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the NATION partition on the supplier
    co-supply graph (suppliers co-occurring in ≥2 orders): per nation
    the within-community edge count, degree sum, and contribution
    e_c/m − (K_c/2m)², plus the total Q — the community-QUALITY
    metric complementing label_propagation's community DISCOVERY.
    Edge candidates exist only within orders (basket-bounded
    self-join, never all-pairs); the per-community frame is 25 rows,
    so the q_total window is bounded.  Q ≈ 0 certifies nations don't
    cluster co-supply — a null-structure audit with a sign, not a
    degenerate constant."""
    os_ = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = os_.select("okey", F.col("s").alias("u"))
    bb = os_.select("okey", F.col("s").alias("v"))
    e = (
        a.join(bb, "okey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
    )
    m = e.agg(F.count(F.lit(1)).alias("m_edges"))
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    com = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select(F.col("s_suppkey").alias("node"), "n_name")
    )
    within = (
        e.join(
            F.broadcast(com.select(F.col("node").alias("u"), F.col("n_name").alias("cu"))),
            "u",
        )
        .join(
            F.broadcast(com.select(F.col("node").alias("v"), F.col("n_name").alias("cv"))),
            "v",
        )
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("n_name"))
        .agg(F.count(F.lit(1)).alias("e_within"))
    )
    ksum = (
        deg.join(F.broadcast(com), "node")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_nodes"), F.sum("k").alias("k_c"))
    )
    per = (
        ksum.join(F.broadcast(within), "n_name", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "n_name",
            "n_nodes",
            "k_c",
            F.coalesce("e_within", F.lit(0)).alias("e_within"),
            (
                F.coalesce("e_within", F.lit(0)) / F.col("m_edges")
                - F.pow(F.col("k_c") / (2.0 * F.col("m_edges")), 2)
            ).alias("contrib"),
        )
    )
    return per.select(
        "n_name",
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("k_c").cast("long").alias("degree_sum"),
        F.col("e_within").cast("long").alias("e_within"),
        F.round("contrib", 6).alias("q_contrib"),
        F.round(F.sum("contrib").over(Window.partitionBy()), 6).alias(
            "q_total"
        ),
    ).orderBy("n_name")


@register(
    "session_paths_top3",
    oracle="""
    WITH t AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ),
    flagged AS (
        SELECT *,
               CASE WHEN ts_us - LAG(ts_us) OVER (
                        PARTITION BY user_id ORDER BY ts_us, event_id)
                         > 1800000000 THEN 1 ELSE 0 END AS new_s
        FROM t
    ),
    s AS (
        SELECT *,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    rn AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, session_id ORDER BY ts_us, event_id) AS r
        FROM s
    ),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY r) AS path
        FROM rn WHERE r <= 3 GROUP BY 1, 2
    )
    SELECT path,
           CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def q_session_paths_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey openings: the first ≤3 event types of each
    30-minute-gap session joined into a path string, top-20 by session
    count — the Sankey/flow-analysis staple beside the full Markov
    transition matrix.  Session assignment and the per-session rank
    share one (user) window chain; the path is built by sorting the
    ≤3 collected (rank, type) structs inside the aggregate — no second
    shuffle; deterministic (ts, event_id) tie-break throughout, and
    the top-20 boundary breaks count ties on the path string."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = ev.withColumn(
        "new_s",
        (
            (F.col("ts_us") - F.lag("ts_us").over(w)) > 1_800_000_000
        ).cast("int"),
    ).withColumn(
        "session_id",
        F.sum(F.coalesce(F.col("new_s"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts_us", "event_id"
    )
    rn = s.withColumn("r", F.row_number().over(ws)).filter(F.col("r") <= 3)
    paths = rn.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("r", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Round-7 eighth wave: classical-ML scorecard — WoE/IV encoding, a trained
# naive-Bayes classifier with bit-identical rational scores, a decision
# stump swept over decile thresholds, and exact 3-parameter OLS via
# decimal Cramer determinants (the distributed normal-equations pattern).
# ---------------------------------------------------------------------------


@register(
    "woe_iv_hour_band",
    oracle="""
    WITH lab AS (
        SELECT CAST(hour(ts) // 4 AS BIGINT) AS band,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events
    ),
    per AS (
        SELECT band,
               SUM(pos) AS n_pos,
               SUM(1 - pos) AS n_neg
        FROM lab GROUP BY band
    ),
    tot AS (
        SELECT SUM(n_pos + 0.5) AS tp, SUM(n_neg + 0.5) AS tn FROM per
    ),
    w AS (
        SELECT band, n_pos, n_neg,
               ln(((n_pos + 0.5) / tp) / ((n_neg + 0.5) / tn)) AS woe,
               ((n_pos + 0.5) / tp - (n_neg + 0.5) / tn)
                 * ln(((n_pos + 0.5) / tp) / ((n_neg + 0.5) / tn)) AS ivc
        FROM per CROSS JOIN tot
    )
    SELECT CAST(band AS BIGINT) AS band,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           ROUND(woe, 6) AS woe,
           ROUND(ivc, 6) AS iv_contrib,
           ROUND(SUM(ivc) OVER (), 6) AS iv_total
    FROM w ORDER BY band
    """,
)
def q_woe_iv_hour_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value scorecard encoding of the
    4-hour band feature against the purchase label — the classic fraud
    scorecard primitive the reference's feature engineering gestures at
    (src/preprocessing/transform_data.py engineered hour features).
    Counts aggregate map-side; the 0.5 Laplace adjustment keeps WoE
    finite for empty cells and is scale-free; the iv_total window runs
    over the 6-row band frame (bounded)."""
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.select(
            (F.hour("ts") / F.lit(4)).cast("long").alias("band"),
            (F.col("event_type") == "purchase").cast("int").alias("pos"),
        )
        .groupBy("band")
        .agg(
            F.sum("pos").alias("n_pos"),
            F.sum(1 - F.col("pos")).alias("n_neg"),
        )
    )
    tot = per.agg(
        F.sum(F.col("n_pos") + 0.5).alias("tp"),
        F.sum(F.col("n_neg") + 0.5).alias("tn"),
    )
    w = per.crossJoin(F.broadcast(tot)).select(
        "band",
        "n_pos",
        "n_neg",
        F.log(
            ((F.col("n_pos") + 0.5) / F.col("tp"))
            / ((F.col("n_neg") + 0.5) / F.col("tn"))
        ).alias("woe"),
        (
            (
                (F.col("n_pos") + 0.5) / F.col("tp")
                - (F.col("n_neg") + 0.5) / F.col("tn")
            )
            * F.log(
                ((F.col("n_pos") + 0.5) / F.col("tp"))
                / ((F.col("n_neg") + 0.5) / F.col("tn"))
            )
        ).alias("ivc"),
    )
    return (
        w.select(
            F.col("band").cast("long").alias("band"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            F.round("woe", 6).alias("woe"),
            F.round("ivc", 6).alias("iv_contrib"),
            F.round(F.sum("ivc").over(Window.partitionBy()), 6).alias(
                "iv_total"
            ),
        )
        .orderBy("band")
    )


@register(
    "naive_bayes_event_type",
    oracle="""
    WITH f AS (
        SELECT event_id, event_type AS cls,
               CAST(hour(ts) // 4 AS BIGINT) AS hb,
               CAST(isodow(ts) - 1 AS BIGINT) AS dw
        FROM events
    ),
    train AS (SELECT * FROM f WHERE event_id % 2 = 0),
    ev    AS (SELECT * FROM f WHERE event_id % 2 = 1),
    nc  AS (SELECT cls, COUNT(*) AS n_c FROM train GROUP BY cls),
    nhb AS (SELECT cls, hb, COUNT(*) AS n FROM train GROUP BY cls, hb),
    ndw AS (SELECT cls, dw, COUNT(*) AS n FROM train GROUP BY cls, dw),
    grid AS (
        SELECT nc.cls, h.hb, d.dw, nc.n_c,
               COALESCE(nhb.n, 0) AS nh, COALESCE(ndw.n, 0) AS nd
        FROM nc
        CROSS JOIN (SELECT DISTINCT hb FROM f) h
        CROSS JOIN (SELECT DISTINCT dw FROM f) d
        LEFT JOIN nhb ON nhb.cls = nc.cls AND nhb.hb = h.hb
        LEFT JOIN ndw ON ndw.cls = nc.cls AND ndw.dw = d.dw
    ),
    scored AS (
        SELECT cls, hb, dw,
               CAST(n_c AS DOUBLE)
                 * (CAST(nh + 1 AS DOUBLE) / CAST(n_c + 6 AS DOUBLE))
                 * (CAST(nd + 1 AS DOUBLE) / CAST(n_c + 7 AS DOUBLE))
                 AS score
        FROM grid
    ),
    pred AS (
        SELECT hb, dw, cls AS pred_cls
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY hb, dw ORDER BY score DESC, cls) AS r
              FROM scored)
        WHERE r = 1
    ),
    hits AS (
        SELECT ev.cls,
               COUNT(*) AS n_eval,
               SUM(CASE WHEN pred.pred_cls = ev.cls THEN 1 ELSE 0 END)
                   AS n_correct
        FROM ev JOIN pred ON pred.hb = ev.hb AND pred.dw = ev.dw
        GROUP BY ev.cls
    )
    SELECT cls,
           CAST(n_eval AS BIGINT) AS n_eval,
           CAST(n_correct AS BIGINT) AS n_correct,
           ROUND(n_correct * 1.0 / n_eval, 6) AS recall,
           ROUND(SUM(n_correct) OVER () * 1.0 / SUM(n_eval) OVER (), 6)
               AS overall_accuracy
    FROM hits ORDER BY cls
    """,
)
def q_naive_bayes_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes trained by aggregation alone: class
    priors and Laplace-smoothed (hour-band, weekday) likelihoods come
    from three groupBys over the even-event_id half, predictions for
    the odd half come from a 210-row broadcast grid (classes × bands ×
    weekdays) argmaxed per cell — the fact table is scored by one
    broadcast join, never fanned out per class.  Scores are products
    of double-divisions of exact integers, so both engines compute
    BIT-IDENTICAL doubles and the argmax needs no tolerance; ties
    break on the class name.  Reports per-class recall + overall
    accuracy (bounded 5-row window)."""
    f = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("event_type").alias("cls"),
        (F.hour("ts") / F.lit(4)).cast("long").alias("hb"),
        F.weekday("ts").cast("long").alias("dw"),
    )
    train = f.filter(F.col("event_id") % 2 == 0)
    ev = f.filter(F.col("event_id") % 2 == 1)
    nc = train.groupBy("cls").agg(F.count(F.lit(1)).alias("n_c"))
    nhb = train.groupBy("cls", "hb").agg(F.count(F.lit(1)).alias("nh"))
    ndw = train.groupBy("cls", "dw").agg(F.count(F.lit(1)).alias("nd"))
    grid = (
        nc.crossJoin(f.select("hb").distinct())
        .crossJoin(f.select("dw").distinct())
        .join(nhb, ["cls", "hb"], "left")
        .join(ndw, ["cls", "dw"], "left")
        .select(
            "cls",
            "hb",
            "dw",
            (
                F.col("n_c").cast("double")
                * (
                    (F.coalesce("nh", F.lit(0)) + 1).cast("double")
                    / (F.col("n_c") + 6).cast("double")
                )
                * (
                    (F.coalesce("nd", F.lit(0)) + 1).cast("double")
                    / (F.col("n_c") + 7).cast("double")
                )
            ).alias("score"),
        )
    )
    wg = Window.partitionBy("hb", "dw").orderBy(F.desc("score"), "cls")
    pred = (
        grid.withColumn("r", F.row_number().over(wg))
        .filter(F.col("r") == 1)
        .select("hb", "dw", F.col("cls").alias("pred_cls"))
    )
    hits = (
        ev.join(F.broadcast(pred), ["hb", "dw"])
        .groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum((F.col("pred_cls") == F.col("cls")).cast("int")).alias(
                "n_correct"
            ),
        )
    )
    return (
        hits.select(
            "cls",
            F.col("n_eval").cast("long").alias("n_eval"),
            F.col("n_correct").cast("long").alias("n_correct"),
            F.round(F.col("n_correct") / F.col("n_eval"), 6).alias("recall"),
            F.round(
                F.sum("n_correct").over(Window.partitionBy())
                / F.sum("n_eval").over(Window.partitionBy()),
                6,
            ).alias("overall_accuracy"),
        )
        .orderBy("cls")
    )


@register(
    "decision_stump_value",
    oracle="""
    WITH base AS (
        SELECT value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events WHERE value IS NOT NULL
    ),
    q AS (
        SELECT quantile_cont(value,
                 [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
        FROM base
    ),
    cand AS (
        SELECT CAST(generate_subscripts(qs, 1) AS BIGINT) AS d,
               UNNEST(qs) AS thr
        FROM q
    ),
    split AS (
        SELECT c.d, c.thr,
               SUM(CASE WHEN b.value <= c.thr THEN 1 ELSE 0 END) AS n_l,
               SUM(CASE WHEN b.value <= c.thr THEN b.pos ELSE 0 END) AS p_l,
               SUM(CASE WHEN b.value > c.thr THEN 1 ELSE 0 END) AS n_r,
               SUM(CASE WHEN b.value > c.thr THEN b.pos ELSE 0 END) AS p_r
        FROM base b CROSS JOIN cand c
        GROUP BY c.d, c.thr
    ),
    g AS (
        SELECT d, thr, n_l, p_l, n_r, p_r,
               -- entropy helper inlined: H(p,n) with 0·ln0 = 0
               (CASE WHEN p_l + p_r > 0 AND p_l + p_r < n_l + n_r THEN
                  -(CAST(p_l + p_r AS DOUBLE) / (n_l + n_r))
                    * ln(CAST(p_l + p_r AS DOUBLE) / (n_l + n_r))
                  - (1.0 - CAST(p_l + p_r AS DOUBLE) / (n_l + n_r))
                    * ln(1.0 - CAST(p_l + p_r AS DOUBLE) / (n_l + n_r))
                ELSE 0 END)
               - CAST(n_l AS DOUBLE) / (n_l + n_r)
                 * (CASE WHEN p_l > 0 AND p_l < n_l THEN
                      -(CAST(p_l AS DOUBLE) / n_l)
                        * ln(CAST(p_l AS DOUBLE) / n_l)
                      - (1.0 - CAST(p_l AS DOUBLE) / n_l)
                        * ln(1.0 - CAST(p_l AS DOUBLE) / n_l)
                    ELSE 0 END)
               - CAST(n_r AS DOUBLE) / (n_l + n_r)
                 * (CASE WHEN p_r > 0 AND p_r < n_r THEN
                      -(CAST(p_r AS DOUBLE) / n_r)
                        * ln(CAST(p_r AS DOUBLE) / n_r)
                      - (1.0 - CAST(p_r AS DOUBLE) / n_r)
                        * ln(1.0 - CAST(p_r AS DOUBLE) / n_r)
                    ELSE 0 END) AS gain
        FROM split
    )
    SELECT d AS decile,
           ROUND(thr, 6) AS threshold,
           CAST(n_l AS BIGINT) AS n_left,
           CAST(p_l AS BIGINT) AS pos_left,
           CAST(n_r AS BIGINT) AS n_right,
           CAST(p_r AS BIGINT) AS pos_right,
           ROUND(gain, 6) AS info_gain,
           CAST(RANK() OVER (ORDER BY ROUND(gain, 6) DESC, d) AS BIGINT)
               AS gain_rank
    FROM g ORDER BY d
    """,
)
def q_decision_stump_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump sweep: information gain of splitting the purchase
    label on each value decile.  The 9 candidate thresholds come from
    one exact-percentile aggregate (quantile_cont ≡ F.percentile), then
    the fact table is scanned ONCE against the broadcast 9-row
    candidate frame — per-candidate counts combine map-side, so the 9×
    fanout never reaches the shuffle.  Entropies are computed from
    identical int-ratio doubles; the rank orders on the 6-dp-rounded
    gain so cross-engine ulp noise in ln() cannot flip it."""
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "value",
            (F.col("event_type") == "purchase").cast("int").alias("pos"),
        )
    )
    cand = (
        base.agg(
            F.percentile(
                "value",
                F.array(*[F.lit(d / 10.0) for d in range(1, 10)]),
            ).alias("thrs")
        )
        .select(
            F.posexplode("thrs").alias("d0", "thr")
        )
        .select((F.col("d0") + 1).cast("long").alias("d"), "thr")
    )
    split = (
        base.crossJoin(F.broadcast(cand))
        .groupBy("d", "thr")
        .agg(
            F.sum((F.col("value") <= F.col("thr")).cast("int")).alias("n_l"),
            F.sum(
                F.when(F.col("value") <= F.col("thr"), F.col("pos")).otherwise(0)
            ).alias("p_l"),
            F.sum((F.col("value") > F.col("thr")).cast("int")).alias("n_r"),
            F.sum(
                F.when(F.col("value") > F.col("thr"), F.col("pos")).otherwise(0)
            ).alias("p_r"),
        )
    )

    def ent(p, n):
        frac = p.cast("double") / n
        return F.when(
            (p > 0) & (p < n),
            -frac * F.log(frac) - (1.0 - frac) * F.log(1.0 - frac),
        ).otherwise(F.lit(0.0))

    g = split.select(
        "d",
        "thr",
        "n_l",
        "p_l",
        "n_r",
        "p_r",
        (
            ent(F.col("p_l") + F.col("p_r"), F.col("n_l") + F.col("n_r"))
            - F.col("n_l").cast("double")
            / (F.col("n_l") + F.col("n_r"))
            * ent(F.col("p_l"), F.col("n_l"))
            - F.col("n_r").cast("double")
            / (F.col("n_l") + F.col("n_r"))
            * ent(F.col("p_r"), F.col("n_r"))
        ).alias("gain"),
    )
    return (
        g.select(
            F.col("d").alias("decile"),
            F.round("thr", 6).alias("threshold"),
            F.col("n_l").cast("long").alias("n_left"),
            F.col("p_l").cast("long").alias("pos_left"),
            F.col("n_r").cast("long").alias("n_right"),
            F.col("p_r").cast("long").alias("pos_right"),
            F.round("gain", 6).alias("info_gain"),
            F.rank()
            .over(
                Window.partitionBy().orderBy(
                    F.desc(F.round("gain", 6)), "d"
                )
            )
            .cast("long")
            .alias("gain_rank"),
        )
        .orderBy("decile")
    )


@register(
    "ols_daily_orders_trend",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day, COUNT(*) AS y FROM orders GROUP BY 1
    ),
    t0 AS (SELECT MIN(day) AS d0 FROM daily),
    x AS (
        SELECT CAST(date_diff('day', d0, day) AS BIGINT) AS t,
               CASE WHEN isodow(day) >= 6 THEN 1 ELSE 0 END AS w,
               y
        FROM daily CROSS JOIN t0
    ),
    s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(t) AS HUGEINT) AS st,
               CAST(SUM(t * t) AS HUGEINT) AS stt,
               CAST(SUM(w) AS HUGEINT) AS sw,
               CAST(SUM(t * w) AS HUGEINT) AS stw,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(t * y) AS HUGEINT) AS sty,
               CAST(SUM(w * y) AS HUGEINT) AS swy
        FROM x
    ),
    dets AS (
        SELECT n, st, sw, stt, stw, sy, sty, swy,
               n * (stt * sw - stw * stw)
                 - st * (st * sw - stw * sw)
                 + sw * (st * stw - stt * sw) AS det,
               sy * (stt * sw - stw * stw)
                 - st * (sty * sw - stw * swy)
                 + sw * (sty * stw - stt * swy) AS det0,
               n * (sty * sw - stw * swy)
                 - sy * (st * sw - stw * sw)
                 + sw * (st * swy - sty * sw) AS det1,
               n * (stt * swy - sty * stw)
                 - st * (st * swy - sty * sw)
                 + sy * (st * stw - stt * sw) AS det2
        FROM s
    ),
    beta AS (
        SELECT CAST(n AS BIGINT) AS n_days,
               CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS b0,
               CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS b1,
               CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS b2,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar
        FROM dets
    ),
    fit AS (
        SELECT beta.n_days, beta.b0, beta.b1, beta.b2,
               SUM((y - (b0 + b1 * t + b2 * w))
                   * (y - (b0 + b1 * t + b2 * w))) AS sse,
               SUM((y - ybar) * (y - ybar)) AS sst
        FROM x CROSS JOIN beta
        GROUP BY 1, 2, 3, 4
    )
    SELECT n_days,
           ROUND(b0, 6) AS beta_intercept,
           ROUND(b1, 6) AS beta_trend,
           ROUND(b2, 6) AS beta_weekend,
           ROUND(1.0 - sse / sst, 6) AS r2
    FROM fit
    """,
)
def q_ols_daily_orders_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-parameter OLS (intercept, day-index trend, weekend
    shift) on daily order counts, solved distributed-first: the normal
    equations' eight moment sums are exact BIGINTs from one aggregate,
    the 3×3 Cramer determinants are evaluated in DECIMAL(38,0) (≡
    DuckDB HUGEINT — exact integer arithmetic, so both engines derive
    BIT-IDENTICAL betas), and R² needs one more scan with the betas
    broadcast.  No driver-side solve, no float accumulation in the
    solve path; det magnitude is O(n_days⁵·y) ≪ 10³⁸ at any SF because
    the day count, not the row count, drives X'X."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    t0 = daily.agg(F.min("day").alias("d0"))
    x = daily.crossJoin(F.broadcast(t0)).select(
        F.datediff("day", "d0").cast("long").alias("t"),
        (F.weekday("day") >= 5).cast("long").alias("w"),
        "y",
    )
    dec = "decimal(38,0)"
    s = x.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("t").cast(dec).alias("st"),
        F.sum(F.col("t") * F.col("t")).cast(dec).alias("stt"),
        F.sum("w").cast(dec).alias("sw"),
        F.sum(F.col("t") * F.col("w")).cast(dec).alias("stw"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast(dec).alias("sty"),
        F.sum(F.col("w") * F.col("y")).cast(dec).alias("swy"),
    )
    c = F.col
    dets = s.select(
        "n", "st", "sw", "stt", "stw", "sy", "sty", "swy",
        (
            c("n") * (c("stt") * c("sw") - c("stw") * c("stw"))
            - c("st") * (c("st") * c("sw") - c("stw") * c("sw"))
            + c("sw") * (c("st") * c("stw") - c("stt") * c("sw"))
        ).alias("det"),
        (
            c("sy") * (c("stt") * c("sw") - c("stw") * c("stw"))
            - c("st") * (c("sty") * c("sw") - c("stw") * c("swy"))
            + c("sw") * (c("sty") * c("stw") - c("stt") * c("swy"))
        ).alias("det0"),
        (
            c("n") * (c("sty") * c("sw") - c("stw") * c("swy"))
            - c("sy") * (c("st") * c("sw") - c("stw") * c("sw"))
            + c("sw") * (c("st") * c("swy") - c("sty") * c("sw"))
        ).alias("det1"),
        (
            c("n") * (c("stt") * c("swy") - c("sty") * c("stw"))
            - c("st") * (c("st") * c("swy") - c("sty") * c("sw"))
            + c("sy") * (c("st") * c("stw") - c("stt") * c("sw"))
        ).alias("det2"),
    )
    beta = dets.select(
        c("n").cast("long").alias("n_days"),
        (c("det0").cast("double") / c("det").cast("double")).alias("b0"),
        (c("det1").cast("double") / c("det").cast("double")).alias("b1"),
        (c("det2").cast("double") / c("det").cast("double")).alias("b2"),
        (c("sy").cast("double") / c("n").cast("double")).alias("ybar"),
    )
    fit = (
        x.crossJoin(F.broadcast(beta))
        .groupBy("n_days", "b0", "b1", "b2")
        .agg(
            F.sum(
                (c("y") - (c("b0") + c("b1") * c("t") + c("b2") * c("w")))
                * (c("y") - (c("b0") + c("b1") * c("t") + c("b2") * c("w")))
            ).alias("sse"),
            F.sum((c("y") - c("ybar")) * (c("y") - c("ybar"))).alias("sst"),
        )
    )
    return fit.select(
        "n_days",
        F.round("b0", 6).alias("beta_intercept"),
        F.round("b1", 6).alias("beta_trend"),
        F.round("b2", 6).alias("beta_weekend"),
        F.round(1.0 - c("sse") / c("sst"), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Round-7 ninth wave: inference-test panel — Welch's unequal-variance t,
# Brown-Forsythe variance homogeneity, Ljung-Box serial correlation on
# daily revenue, and a Cramér's V association matrix.
# ---------------------------------------------------------------------------


@register(
    "welch_ttest_purchase_view",
    oracle="""
    WITH g AS (
        SELECT event_type,
               COUNT(*) AS n,
               AVG(value) AS m,
               var_samp(value) AS v
        FROM events
        WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')
        GROUP BY event_type
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
            MAX(CASE WHEN event_type = 'purchase' THEN m END) AS m1,
            MAX(CASE WHEN event_type = 'purchase' THEN v END) AS v1,
            MAX(CASE WHEN event_type = 'view' THEN n END) AS n2,
            MAX(CASE WHEN event_type = 'view' THEN m END) AS m2,
            MAX(CASE WHEN event_type = 'view' THEN v END) AS v2
        FROM g
    )
    SELECT CAST(n1 AS BIGINT) AS n_purchase,
           CAST(n2 AS BIGINT) AS n_view,
           ROUND(m1 - m2, 6) AS mean_diff,
           ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND(POWER(v1 / n1 + v2 / n2, 2)
                 / (POWER(v1 / n1, 2) / (n1 - 1)
                    + POWER(v2 / n2, 2) / (n2 - 1)), 6) AS satterthwaite_df
    FROM wide
    """,
)
def q_welch_ttest_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic (purchase vs view values)
    with the Welch–Satterthwaite effective df — the A/B staple that
    does NOT assume pooled variance (complementing ab_test_value_by_
    split's pooled test).  One grouped aggregate, pivoted to a single
    row; var_samp is the same ddof=1 estimator in both engines."""
    g = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "view")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    wide = g.agg(
        *[
            F.max(
                F.when(F.col("event_type") == t, F.col(col))
            ).alias(f"{col}{i}")
            for i, t in ((1, "purchase"), (2, "view"))
            for col in ("n", "m", "v")
        ]
    )
    c = F.col
    se2 = c("v1") / c("n1") + c("v2") / c("n2")
    return wide.select(
        c("n1").cast("long").alias("n_purchase"),
        c("n2").cast("long").alias("n_view"),
        F.round(c("m1") - c("m2"), 6).alias("mean_diff"),
        F.round((c("m1") - c("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(c("v1") / c("n1"), 2) / (c("n1") - 1)
                + F.pow(c("v2") / c("n2"), 2) / (c("n2") - 1)
            ),
            6,
        ).alias("satterthwaite_df"),
    )


@register(
    "brown_forsythe_value_types",
    oracle="""
    WITH base AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM base GROUP BY event_type
    ),
    z AS (
        SELECT base.event_type, ABS(value - med) AS z
        FROM base JOIN med USING (event_type)
    ),
    per AS (
        SELECT event_type, COUNT(*) AS n, AVG(z) AS zbar,
               SUM(z * z) AS zsq, SUM(z) AS zs
        FROM z GROUP BY event_type
    ),
    tot AS (
        SELECT SUM(n) AS nn, COUNT(*) AS k,
               SUM(zs) / SUM(n) AS zgrand,
               SUM(n * zbar * zbar) AS sum_n_zbar2,
               SUM(zsq - zs * zs / n) AS ss_within
        FROM per
    ),
    w AS (
        SELECT nn, k,
               (nn - k) * 1.0 / (k - 1)
                 * (sum_n_zbar2 - nn * zgrand * zgrand) / ss_within AS bf
        FROM tot
    )
    SELECT per.event_type,
           CAST(per.n AS BIGINT) AS n,
           ROUND(med.med, 6) AS median_value,
           ROUND(per.zbar, 6) AS mean_abs_dev,
           ROUND(w.bf, 6) AS bf_stat,
           CAST(w.k - 1 AS BIGINT) AS df1,
           CAST(w.nn - w.k AS BIGINT) AS df2
    FROM per JOIN med USING (event_type) CROSS JOIN w
    ORDER BY per.event_type
    """,
)
def q_brown_forsythe_value_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test across event types:
    Levene's W computed on |value − group median| (median-centered =
    robust to the heavy-tailed value distribution).  Group medians are
    exact percentiles broadcast back to the fact scan; the W numerator
    uses the algebraic identity Σn(z̄_c−z̄)² = Σn·z̄_c² − N·z̄², so
    everything reduces to one grouped pass + one 5-row combine."""
    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    med = base.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    z = base.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("z")
    )
    per = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("z").alias("zbar"),
        F.sum(F.col("z") * F.col("z")).alias("zsq"),
        F.sum("z").alias("zs"),
    )
    c = F.col
    tot = per.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        (F.sum("zs") / F.sum("n")).alias("zgrand"),
        F.sum(c("n") * c("zbar") * c("zbar")).alias("sum_n_zbar2"),
        F.sum(c("zsq") - c("zs") * c("zs") / c("n")).alias("ss_within"),
    )
    w = tot.select(
        "nn",
        "k",
        (
            (c("nn") - c("k"))
            * 1.0
            / (c("k") - 1)
            * (c("sum_n_zbar2") - c("nn") * c("zgrand") * c("zgrand"))
            / c("ss_within")
        ).alias("bf"),
    )
    return (
        per.join(F.broadcast(med), "event_type")
        .crossJoin(F.broadcast(w))
        .select(
            "event_type",
            c("n").cast("long").alias("n"),
            F.round("med", 6).alias("median_value"),
            F.round("zbar", 6).alias("mean_abs_dev"),
            F.round("bf", 6).alias("bf_stat"),
            (c("k") - 1).cast("long").alias("df1"),
            (c("nn") - c("k")).cast("long").alias("df2"),
        )
        .orderBy("event_type")
    )


@register(
    "ljung_box_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day, SUM(o_totalprice) AS y
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT ROW_NUMBER() OVER (ORDER BY day) AS i, y FROM daily
    ),
    s AS (
        SELECT COUNT(*) AS n, AVG(y) AS ybar FROM idx
    ),
    c0 AS (
        SELECT SUM((y - ybar) * (y - ybar)) AS c0 FROM idx CROSS JOIN s
    ),
    r AS (
        SELECT k.k,
               SUM((a.y - s.ybar) * (b.y - s.ybar)) / MAX(c0.c0) AS rk,
               MAX(s.n) AS n
        FROM range(1, 8) k(k)
        JOIN idx a ON TRUE
        JOIN idx b ON b.i = a.i - k.k
        CROSS JOIN s CROSS JOIN c0
        GROUP BY k.k
    )
    SELECT CAST(k AS BIGINT) AS lag,
           ROUND(rk, 6) AS acf,
           ROUND(n * (n + 2.0) * SUM(rk * rk / (n - k))
                 OVER (ORDER BY k ROWS UNBOUNDED PRECEDING), 6) AS lb_q
    FROM r ORDER BY k
    """,
)
def q_ljung_box_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau test on daily order revenue, lags 1–7:
    per-lag autocorrelation (biased estimator, fixed C(0) denominator)
    and the cumulative Q statistic n(n+2)Σ r_k²/(n−k).  The series is
    the ~|days| aggregate frame, so the dense index window and the
    7-row Q prefix sum are bounded; the lag join is a 7×|days|
    broadcast self-join, never touching the raw fact table."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    idx = daily.select(
        F.row_number().over(Window.partitionBy().orderBy("day")).alias("i"),
        "y",
    )
    s = idx.agg(F.count(F.lit(1)).alias("n"), F.avg("y").alias("ybar"))
    c = F.col
    c0 = (
        idx.crossJoin(F.broadcast(s))
        .agg(F.sum((c("y") - c("ybar")) * (c("y") - c("ybar"))).alias("c0"))
    )
    ks = spark.range(1, 8).select(F.col("id").alias("k"))
    a = idx.select(c("i").alias("ia"), c("y").alias("ya"))
    b = idx.select(c("i").alias("ib"), c("y").alias("yb"))
    r = (
        a.crossJoin(F.broadcast(ks))
        .join(b, c("ib") == c("ia") - c("k"))
        .crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(c0))
        .groupBy("k")
        .agg(
            (
                F.sum((c("ya") - c("ybar")) * (c("yb") - c("ybar")))
                / F.max("c0")
            ).alias("rk"),
            F.max("n").alias("n"),
        )
    )
    wq = Window.partitionBy().orderBy("k").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return r.select(
        c("k").cast("long").alias("lag"),
        F.round("rk", 6).alias("acf"),
        F.round(
            c("n") * (c("n") + 2.0)
            * F.sum(c("rk") * c("rk") / (c("n") - c("k"))).over(wq),
            6,
        ).alias("lb_q"),
    ).orderBy("lag")


@register(
    "cramers_v_panel",
    oracle="""
    WITH f AS (
        SELECT event_type AS t,
               CAST(hour(ts) // 4 AS BIGINT) AS hb,
               CAST(isodow(ts) - 1 AS BIGINT) AS dw
        FROM events
    ),
    pairs AS (
        SELECT 'type_x_hourband' AS pair, t AS a, CAST(hb AS VARCHAR) AS b
        FROM f
        UNION ALL
        SELECT 'type_x_weekday', t, CAST(dw AS VARCHAR) FROM f
        UNION ALL
        SELECT 'hourband_x_weekday', CAST(hb AS VARCHAR),
               CAST(dw AS VARCHAR) FROM f
    ),
    o AS (SELECT pair, a, b, COUNT(*) AS obs FROM pairs GROUP BY 1, 2, 3),
    ra AS (SELECT pair, a, SUM(obs) AS rt FROM o GROUP BY 1, 2),
    cb AS (SELECT pair, b, SUM(obs) AS ct FROM o GROUP BY 1, 2),
    nn AS (SELECT pair, SUM(obs) AS n,
                  COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c
           FROM o GROUP BY 1),
    chi AS (
        SELECT o.pair,
               SUM(POWER(obs - rt * ct * 1.0 / n, 2) / (rt * ct * 1.0 / n))
                   AS chi2
        FROM o JOIN ra USING (pair, a) JOIN cb USING (pair, b)
               JOIN nn USING (pair)
        GROUP BY o.pair
    )
    SELECT nn.pair,
           CAST(nn.n AS BIGINT) AS n,
           CAST(nn.r AS BIGINT) AS n_rows,
           CAST(nn.c AS BIGINT) AS n_cols,
           CAST((nn.r - 1) * (nn.c - 1) AS BIGINT) AS df,
           ROUND(chi.chi2, 6) AS chi2,
           ROUND(sqrt(chi.chi2 / (nn.n * LEAST(nn.r - 1, nn.c - 1))), 6)
               AS cramers_v
    FROM nn JOIN chi USING (pair) ORDER BY nn.pair
    """,
)
def q_cramers_v_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association matrix over the three categorical pairs
    (event_type, hour band, weekday): χ² from observed-vs-expected cell
    counts with margins joined back per pair, V = √(χ²/(N·min(r,c)−1)).
    One stacked scan covers all pairs; cells/margins are tiny grouped
    frames, so everything after the first aggregate is broadcast."""
    f = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"),
        (F.hour("ts") / F.lit(4)).cast("long").alias("hb"),
        F.weekday("ts").cast("long").alias("dw"),
    )
    pairs = (
        f.select(F.lit("type_x_hourband").alias("pair"), F.col("t").alias("a"),
                 F.col("hb").cast("string").alias("b"))
        .unionAll(
            f.select(F.lit("type_x_weekday"), F.col("t"),
                     F.col("dw").cast("string"))
        )
        .unionAll(
            f.select(F.lit("hourband_x_weekday"),
                     F.col("hb").cast("string"),
                     F.col("dw").cast("string"))
        )
    )
    o = pairs.groupBy("pair", "a", "b").agg(F.count(F.lit(1)).alias("obs"))
    ra = o.groupBy("pair", "a").agg(F.sum("obs").alias("rt"))
    cb = o.groupBy("pair", "b").agg(F.sum("obs").alias("ct"))
    nn = o.groupBy("pair").agg(
        F.sum("obs").alias("n"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
    )
    c = F.col
    exp = c("rt") * c("ct") * 1.0 / c("n")
    chi = (
        o.join(F.broadcast(ra), ["pair", "a"])
        .join(F.broadcast(cb), ["pair", "b"])
        .join(F.broadcast(nn), ["pair"])
        .groupBy("pair")
        .agg(F.sum(F.pow(c("obs") - exp, 2) / exp).alias("chi2"))
    )
    return (
        nn.join(F.broadcast(chi), "pair")
        .select(
            "pair",
            c("n").cast("long").alias("n"),
            c("r").cast("long").alias("n_rows"),
            c("c").cast("long").alias("n_cols"),
            ((c("r") - 1) * (c("c") - 1)).cast("long").alias("df"),
            F.round("chi2", 6).alias("chi2"),
            F.round(
                F.sqrt(c("chi2") / (c("n") * F.least(c("r") - 1, c("c") - 1))),
                6,
            ).alias("cramers_v"),
        )
        .orderBy("pair")
    )


# ---------------------------------------------------------------------------
# Round-7 tenth wave: fraud screens II + warehouse integrity — dormancy
# reactivation, round-number affinity, SCD2 interval containment audit,
# item-item cosine similarity from co-occurrence.
# ---------------------------------------------------------------------------


@register(
    "dormancy_reactivation_screen",
    oracle="""
    WITH t AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
        FROM events
    ),
    g AS (
        SELECT *,
               ts_us - LAG(ts_us) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id) AS gap_us
        FROM t
    ),
    thr AS (
        SELECT quantile_cont(gap_us, 0.99) AS q99
        FROM g WHERE gap_us IS NOT NULL
    ),
    react AS (
        SELECT user_id,
               COUNT(*) AS n_reactivations,
               ROUND(MAX(gap_us) / 3600000000.0, 6) AS max_gap_hours,
               ROUND(SUM(CASE WHEN event_type = 'purchase'
                              THEN COALESCE(value, 0) ELSE 0 END), 4)
                   AS react_purchase_value,
               ROUND(MAX(q99) / 3600000000.0, 6)
                   AS dormancy_threshold_hours
        FROM g CROSS JOIN thr WHERE gap_us >= q99
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_reactivations AS BIGINT) AS n_reactivations,
           max_gap_hours,
           react_purchase_value,
           dormancy_threshold_hours
    FROM react
    ORDER BY n_reactivations DESC, max_gap_hours DESC, user_id
    LIMIT 50
    """,
)
def q_dormancy_reactivation_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormancy-reactivation screen: events arriving after a silence in
    the user's own stream that exceeds the MEASURED p99 of all
    inter-event gaps — a scale-free cutoff (a fixed '30 days' empties
    out or floods as the fixture's time span changes; the percentile
    tracks the data, per the scale-free-threshold convention).  Per
    flagged user: reactivation count, longest gap, and purchase value
    landed on reactivation events.  One per-user lag window, one
    exact-percentile scalar broadcast, top-50 TakeOrderedAndProject."""
    t = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = t.withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w))
    thr = g.filter(F.col("gap_us").isNotNull()).agg(
        F.percentile("gap_us", 0.99).alias("q99")
    )
    return (
        g.crossJoin(F.broadcast(thr))
        .filter(F.col("gap_us") >= F.col("q99"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reactivations"),
            F.round(F.max("gap_us") / 3_600_000_000.0, 6).alias(
                "max_gap_hours"
            ),
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.coalesce("value", F.lit(0.0)),
                    ).otherwise(0.0)
                ),
                4,
            ).alias("react_purchase_value"),
            F.round(F.max("q99") / 3_600_000_000.0, 6).alias(
                "dormancy_threshold_hours"
            ),
        )
        .orderBy(
            F.desc("n_reactivations"), F.desc("max_gap_hours"), "user_id"
        )
        .limit(50)
    )


@register(
    "round_number_affinity",
    oracle="""
    WITH v AS (
        SELECT user_id,
               CASE WHEN CAST(ROUND(value * 100) AS BIGINT) % 100 = 0
                    THEN 1 ELSE 0 END AS is_round
        FROM events WHERE value IS NOT NULL
    ),
    g0 AS (SELECT AVG(is_round) AS p0 FROM v),
    per AS (
        SELECT user_id, COUNT(*) AS n, SUM(is_round) AS n_round
        FROM v GROUP BY user_id HAVING COUNT(*) >= 30
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_valued,
           CAST(n_round AS BIGINT) AS n_round,
           ROUND(n_round * 1.0 / n, 6) AS user_rate,
           ROUND(p0, 6) AS global_rate,
           ROUND((n_round * 1.0 / n - p0)
                 / sqrt(p0 * (1 - p0) / n), 6) AS z_score,
           (n_round * 1.0 / n - p0) / sqrt(p0 * (1 - p0) / n) >= 2
               AS is_significant
    FROM per CROSS JOIN g0
    ORDER BY z_score DESC, user_id
    LIMIT 20
    """,
)
def q_round_number_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-dollar affinity screen: values in this corpus are cent-
    quantized, so 'round' = cents == 0, expected ~1% by chance.  Ranks
    users (≥30 valued events) by the one-proportion z-score of their
    whole-dollar rate against the population — the human-chosen-amount
    tell behind structuring.  Top-20 by z (scale-free: a rank, not a
    count threshold) with the z ≥ 2 significance flag carried as a
    column; z is computed from exact integer counts, so both engines
    agree bit-for-bit."""
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            (
                F.round(F.col("value") * 100, 0).cast("long") % 100 == 0
            ).cast("int").alias("is_round"),
        )
    )
    glob = v.agg(F.avg("is_round").alias("p0"))
    per = (
        v.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_round").alias("n_round"),
        )
        .filter(F.col("n") >= 30)
    )
    c = F.col
    z = (c("n_round") * 1.0 / c("n") - c("p0")) / F.sqrt(
        c("p0") * (1 - c("p0")) / c("n")
    )
    return (
        per.crossJoin(F.broadcast(glob))
        .withColumn("z", z)
        .select(
            "user_id",
            c("n").cast("long").alias("n_valued"),
            c("n_round").cast("long").alias("n_round"),
            F.round(c("n_round") * 1.0 / c("n"), 6).alias("user_rate"),
            F.round("p0", 6).alias("global_rate"),
            F.round("z", 6).alias("z_score"),
            (c("z") >= 2).alias("is_significant"),
        )
        .orderBy(F.desc("z_score"), "user_id")
        .limit(20)
    )


@register(
    "scd2_interval_integrity",
    oracle="""
    WITH t AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ),
    runs AS (
        SELECT *,
               CASE WHEN event_type IS DISTINCT FROM LAG(event_type) OVER (
                        PARTITION BY user_id ORDER BY ts_us, event_id)
                    THEN 1 ELSE 0 END AS is_start
        FROM t
    ),
    iv AS (
        SELECT user_id, event_type,
               ts_us AS from_ts, event_id AS from_eid,
               LEAD(ts_us) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id) AS to_ts,
               LEAD(event_id) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id) AS to_eid
        FROM runs WHERE is_start = 1
    ),
    match AS (
        SELECT t.user_id, t.event_id, COUNT(*) AS n_match,
               MAX(CASE WHEN iv.event_type = t.event_type
                        THEN 1 ELSE 0 END) AS type_ok
        FROM t JOIN iv ON iv.user_id = t.user_id
           AND (t.ts_us > iv.from_ts
                OR (t.ts_us = iv.from_ts AND t.event_id >= iv.from_eid))
           AND (iv.to_ts IS NULL OR t.ts_us < iv.to_ts
                OR (t.ts_us = iv.to_ts AND t.event_id < iv.to_eid))
        GROUP BY 1, 2
    )
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM t) AS BIGINT)
               AS n_users,
           CAST((SELECT COUNT(*) FROM iv) AS BIGINT) AS n_intervals,
           CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN n_match = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_single_match,
           CAST(SUM(CASE WHEN n_match > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_multi_match,
           CAST((SELECT COUNT(*) FROM t) - COUNT(*) AS BIGINT)
               AS n_zero_match,
           bool_and(type_ok = 1) AS types_consistent
    FROM match
    """,
)
def q_scd2_interval_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal point-in-time audit of an SCD2 interval dimension:
    rebuild each user's event-type run history as [from, to) validity
    intervals (composite (ts, event_id) boundaries so same-microsecond
    ties stay well-defined — the tie-fixture class), then join every
    event back and assert EXACTLY-ONE containing interval whose tracked
    type matches.  The join is equi on user_id with a range residual,
    so fanout is bounded per user; this is the FK-to-SCD2 audit every
    warehouse runs after a dimension rebuild."""
    t = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    runs = t.withColumn(
        "is_start",
        (
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w))
        ).cast("int"),
    )
    iv = (
        runs.filter(F.col("is_start") == 1)
        .select(
            F.col("user_id").alias("iv_uid"),
            F.col("event_type").alias("iv_type"),
            F.col("ts_us").alias("from_ts"),
            F.col("event_id").alias("from_eid"),
            F.lead("ts_us").over(w).alias("to_ts"),
            F.lead("event_id").over(w).alias("to_eid"),
        )
    )
    c = F.col
    match = (
        t.join(
            iv,
            (c("user_id") == c("iv_uid"))
            & (
                (c("ts_us") > c("from_ts"))
                | ((c("ts_us") == c("from_ts")) & (c("event_id") >= c("from_eid")))
            )
            & (
                c("to_ts").isNull()
                | (c("ts_us") < c("to_ts"))
                | ((c("ts_us") == c("to_ts")) & (c("event_id") < c("to_eid")))
            ),
        )
        .groupBy("user_id", "event_id")
        .agg(
            F.count(F.lit(1)).alias("n_match"),
            F.max(
                (c("iv_type") == c("event_type")).cast("int")
            ).alias("type_ok"),
        )
    )
    tots = t.agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    niv = iv.agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
    agg = match.agg(
        F.sum((c("n_match") == 1).cast("int")).cast("long").alias(
            "n_single_match"
        ),
        F.sum((c("n_match") > 1).cast("int")).cast("long").alias(
            "n_multi_match"
        ),
        F.count(F.lit(1)).alias("n_matched_events"),
        F.bool_and(c("type_ok") == 1).alias("types_consistent"),
    )
    return (
        tots.crossJoin(F.broadcast(niv))
        .crossJoin(F.broadcast(agg))
        .select(
            "n_users",
            "n_intervals",
            "n_events",
            "n_single_match",
            "n_multi_match",
            (c("n_events") - c("n_matched_events")).cast("long").alias(
                "n_zero_match"
            ),
            "types_consistent",
        )
    )


# ---------------------------------------------------------------------------
# Round-7 eleventh wave: off-policy evaluation — IPS / SNIPS / doubly-
# robust value estimates of a uniform target policy from the logged
# event stream, and the Li-et-al replay estimator for the greedy policy.
# ---------------------------------------------------------------------------


@register(
    "off_policy_evaluation",
    oracle="""
    WITH log AS (
        SELECT event_id,
               CAST(hour(ts) // 4 AS BIGINT) AS x,
               event_type AS a,
               COALESCE(value, 0) AS r
        FROM events
    ),
    train AS (SELECT * FROM log WHERE event_id % 2 = 0),
    eval_ AS (SELECT * FROM log WHERE event_id % 2 = 1),
    kk AS (SELECT COUNT(DISTINCT a) AS k FROM train),
    bx AS (SELECT x, COUNT(*) AS n_x FROM train GROUP BY x),
    bxa AS (SELECT x, a, COUNT(*) AS n_xa, AVG(r) AS m
            FROM train GROUP BY x, a),
    mbar AS (
        SELECT x, SUM(m) AS sum_m FROM bxa GROUP BY x
    ),
    w AS (
        SELECT e.r,
               CAST(bx.n_x AS DOUBLE) / (kk.k * bxa.n_xa) AS w,
               bxa.m AS m_xa,
               mbar.sum_m / kk.k AS v_direct
        FROM eval_ e
        JOIN bxa ON bxa.x = e.x AND bxa.a = e.a
        JOIN bx ON bx.x = e.x
        JOIN mbar ON mbar.x = e.x
        CROSS JOIN kk
    )
    SELECT CAST((SELECT COUNT(*) FROM train) AS BIGINT) AS n_train,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(MAX(kk.k) AS BIGINT) AS k_actions,
           ROUND(AVG(w * r), 6) AS ips_value,
           ROUND(SUM(w * r) / SUM(w), 6) AS snips_value,
           ROUND(AVG(v_direct + w * (r - m_xa)), 6) AS dr_value,
           ROUND(POWER(SUM(w), 2) / SUM(w * w) / COUNT(*), 6)
               AS ess_fraction,
           ROUND(MAX(w), 6) AS max_weight
    FROM w CROSS JOIN kk
    """,
)
def q_off_policy_evaluation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counterfactual (off-policy) value of a UNIFORM action policy
    from the logged stream, context = 4-hour band, action = event
    type, reward = event value: inverse-propensity (IPS), self-
    normalized (SNIPS), and doubly-robust estimates, with the
    effective-sample-size fraction and max importance weight as the
    overlap diagnostics every OPE report needs.  Propensities b̂(a|x)
    and the reward model m̂(x,a) are fitted on the even-event_id half
    by pure aggregation and broadcast; the odd half is scored in one
    pass.  Weights are ratios of exact counts — bit-identical across
    engines."""
    log = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.hour("ts") / F.lit(4)).cast("long").alias("x"),
        F.col("event_type").alias("a"),
        F.coalesce("value", F.lit(0.0)).alias("r"),
    )
    train = log.filter(F.col("event_id") % 2 == 0)
    ev = log.filter(F.col("event_id") % 2 == 1)
    kk = train.agg(F.countDistinct("a").alias("k"))
    bx = train.groupBy("x").agg(F.count(F.lit(1)).alias("n_x"))
    bxa = train.groupBy("x", "a").agg(
        F.count(F.lit(1)).alias("n_xa"), F.avg("r").alias("m")
    )
    mbar = bxa.groupBy("x").agg(F.sum("m").alias("sum_m"))
    c = F.col
    w = (
        ev.join(F.broadcast(bxa), ["x", "a"])
        .join(F.broadcast(bx), "x")
        .join(F.broadcast(mbar), "x")
        .crossJoin(F.broadcast(kk))
        .select(
            "r",
            (c("n_x").cast("double") / (c("k") * c("n_xa"))).alias("w"),
            c("m").alias("m_xa"),
            (c("sum_m") / c("k")).alias("v_direct"),
            "k",
        )
    )
    ntr = train.agg(F.count(F.lit(1)).cast("long").alias("n_train"))
    return (
        w.agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.max("k").cast("long").alias("k_actions"),
            F.round(F.avg(c("w") * c("r")), 6).alias("ips_value"),
            F.round(F.sum(c("w") * c("r")) / F.sum("w"), 6).alias(
                "snips_value"
            ),
            F.round(
                F.avg(c("v_direct") + c("w") * (c("r") - c("m_xa"))), 6
            ).alias("dr_value"),
            F.round(
                F.pow(F.sum("w"), 2) / F.sum(c("w") * c("w"))
                / F.count(F.lit(1)),
                6,
            ).alias("ess_fraction"),
            F.round(F.max("w"), 6).alias("max_weight"),
        )
        .crossJoin(F.broadcast(ntr))
        .select(
            "n_train", "n_eval", "k_actions", "ips_value", "snips_value",
            "dr_value", "ess_fraction", "max_weight",
        )
    )


@register(
    "replay_greedy_policy",
    oracle="""
    WITH log AS (
        SELECT event_id,
               CAST(hour(ts) // 4 AS BIGINT) AS x,
               event_type AS a,
               COALESCE(value, 0) AS r
        FROM events
    ),
    train AS (SELECT * FROM log WHERE event_id % 2 = 0),
    eval_ AS (SELECT * FROM log WHERE event_id % 2 = 1),
    m AS (
        SELECT x, a, ROUND(AVG(r), 6) AS m6 FROM train GROUP BY x, a
    ),
    greedy AS (
        SELECT x, a AS a_star, m6
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY x ORDER BY m6 DESC, a) AS rnk FROM m)
        WHERE rnk = 1
    ),
    matched AS (
        SELECT e.x, e.r, greedy.a_star, greedy.m6
        FROM eval_ e JOIN greedy ON greedy.x = e.x AND greedy.a_star = e.a
    ),
    pern AS (SELECT x, COUNT(*) AS n_eval_x FROM eval_ GROUP BY x)
    SELECT matched.x,
           MAX(matched.a_star) AS greedy_action,
           MAX(matched.m6) AS train_mean_reward,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST(MAX(pern.n_eval_x) AS BIGINT) AS n_eval,
           ROUND(COUNT(*) * 1.0 / MAX(pern.n_eval_x), 6) AS match_rate,
           ROUND(AVG(matched.r), 6) AS replay_value
    FROM matched JOIN pern ON pern.x = matched.x
    GROUP BY matched.x
    ORDER BY matched.x
    """,
)
def q_replay_greedy_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay (rejection-sampling) evaluation of the greedy policy:
    per 4-hour band pick the action with the best train-half mean
    reward (argmax on the 6-dp-ROUNDED mean with an action-name tie
    break, so cross-engine float noise cannot flip it), then score it
    on the eval half using ONLY events whose logged action matches —
    Li et al.'s unbiased replayer for uniformly-logged data.  Reports
    per-band match rate and replayed value; the policy table is a
    ≤6-row broadcast."""
    log = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.hour("ts") / F.lit(4)).cast("long").alias("x"),
        F.col("event_type").alias("a"),
        F.coalesce("value", F.lit(0.0)).alias("r"),
    )
    train = log.filter(F.col("event_id") % 2 == 0)
    ev = log.filter(F.col("event_id") % 2 == 1)
    m = train.groupBy("x", "a").agg(F.round(F.avg("r"), 6).alias("m6"))
    wg = Window.partitionBy("x").orderBy(F.desc("m6"), "a")
    greedy = (
        m.withColumn("rnk", F.row_number().over(wg))
        .filter(F.col("rnk") == 1)
        .select("x", F.col("a").alias("a_star"), "m6")
    )
    c = F.col
    matched = ev.join(
        F.broadcast(greedy),
        (ev["x"] == greedy["x"]) & (ev["a"] == greedy["a_star"]),
    ).select(ev["x"].alias("x"), "r", "a_star", "m6")
    pern = ev.groupBy("x").agg(F.count(F.lit(1)).alias("n_eval_x"))
    return (
        matched.groupBy("x")
        .agg(
            F.max("a_star").alias("greedy_action"),
            F.max("m6").alias("train_mean_reward"),
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.round(F.avg("r"), 6).alias("replay_value"),
        )
        .join(F.broadcast(pern), "x")
        .select(
            "x",
            "greedy_action",
            "train_mean_reward",
            "n_matched",
            c("n_eval_x").cast("long").alias("n_eval"),
            F.round(c("n_matched") * 1.0 / c("n_eval_x"), 6).alias(
                "match_rate"
            ),
            "replay_value",
        )
        .orderBy("x")
    )


# ---------------------------------------------------------------------------
# Round-7 twelfth wave: supervised evaluation of the curation heuristics
# against gold labels.
# ---------------------------------------------------------------------------


@register(
    "lang_id_confusion",
    oracle=r"""
    WITH toks AS (
        SELECT lang AS true_lang,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              x -> lower(x)) AS t
        FROM documents
    ), s AS (
        SELECT true_lang,
            len(list_filter(t, x -> list_contains(
                ['the','of','and','to','in','a','is','that','for','it'], x))) AS s_en,
            len(list_filter(t, x -> list_contains(
                ['de','la','que','el','en','y','los','del','se','las'], x))) AS s_es,
            len(list_filter(t, x -> list_contains(
                ['de','la','le','et','les','des','en','un','du','une'], x))) AS s_fr,
            len(list_filter(t, x -> list_contains(
                ['der','die','und','in','den','von','zu','das','mit','sich'], x))) AS s_de
        FROM toks
    ), pred AS (
        SELECT true_lang,
               CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                    WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                    WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                    WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                    ELSE 'de' END AS pred_lang
        FROM s
    ),
    cells AS (
        SELECT true_lang, pred_lang, COUNT(*) AS n
        FROM pred GROUP BY 1, 2
    )
    SELECT true_lang, pred_lang,
           CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY true_lang), 6)
               AS row_share,
           ROUND(SUM(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END)
                     OVER () * 1.0 / SUM(n) OVER (), 6) AS overall_accuracy
    FROM cells
    ORDER BY true_lang, pred_lang
    """,
)
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised confusion matrix of the stopword-profile language-ID
    heuristic (functions/text.py:lang_id) against the documents table's
    GOLD lang column — per (true, predicted) cell count, row share, and
    overall accuracy.  The gold set includes zh, which the Latin-
    stopword profiles cannot see (predicted 'und'), so the matrix
    surfaces the coverage gap rather than flattering the classifier.
    One fact scan; every window runs over the ≤|langs|² grouped
    frame."""
    from .functions.text import lang_id

    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.select(
            F.col("lang").alias("true_lang"),
            lang_id("text").alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("true_lang")
    wall = Window.partitionBy()
    return (
        cells.select(
            "true_lang",
            "pred_lang",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.sum("n").over(wrow), 6).alias("row_share"),
            F.round(
                F.sum(
                    F.when(
                        F.col("true_lang") == F.col("pred_lang"), F.col("n")
                    ).otherwise(F.lit(0))
                ).over(wall)
                * 1.0
                / F.sum("n").over(wall),
                6,
            ).alias("overall_accuracy"),
        )
        .orderBy("true_lang", "pred_lang")
    )


@register(
    "nearest_centroid_eval",
    oracle="""
    WITH longf AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS dim,
               UNNEST(embedding)::DOUBLE AS x
        FROM embeddings
    ),
    cent AS (
        SELECT label AS c_label, dim, AVG(x) AS c
        FROM longf WHERE vec_id % 2 = 0
        GROUP BY 1, 2
    ),
    ev AS (SELECT * FROM longf WHERE vec_id % 2 = 1),
    d2 AS (
        SELECT ev.vec_id, MAX(ev.label) AS true_label, cent.c_label,
               SUM((ev.x - cent.c) * (ev.x - cent.c)) AS dist2
        FROM ev JOIN cent ON cent.dim = ev.dim
        GROUP BY ev.vec_id, cent.c_label
    ),
    pred AS (
        SELECT vec_id, true_label, c_label AS pred_label
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY vec_id ORDER BY dist2, c_label) AS r
              FROM d2)
        WHERE r = 1
    ),
    hits AS (
        SELECT true_label,
               COUNT(*) AS n_eval,
               SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                   AS n_correct
        FROM pred GROUP BY true_label
    )
    SELECT CAST(true_label AS BIGINT) AS true_label,
           CAST(n_eval AS BIGINT) AS n_eval,
           CAST(n_correct AS BIGINT) AS n_correct,
           ROUND(n_correct * 1.0 / n_eval, 6) AS recall,
           ROUND(SUM(n_correct) OVER () * 1.0 / SUM(n_eval) OVER (), 6)
               AS overall_accuracy
    FROM hits ORDER BY true_label
    """,
)
def q_nearest_centroid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification of the labeled
    embeddings: per-label mean vectors fitted on even vec_ids, odd
    vec_ids assigned to the closest centroid by squared L2, per-label
    recall + overall accuracy — the cheapest supervised probe of
    embedding quality, and the evaluation twin of
    label_centroid_separation.  The centroid table is |labels|·dim
    rows (bounded) and broadcast, so scoring is one map-side join +
    partial agg over the exploded eval half; the argmin orders on
    (dist², label) so ties are deterministic."""
    longf = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", "label",
            F.posexplode("embedding").alias("dim0", "xf"),
        )
        .select(
            "vec_id", "label",
            (F.col("dim0") + 1).alias("dim"),
            F.col("xf").cast("double").alias("x"),
        )
    )
    cent = (
        longf.filter(F.col("vec_id") % 2 == 0)
        .groupBy(F.col("label").alias("c_label"), "dim")
        .agg(F.avg("x").alias("c"))
    )
    ev = longf.filter(F.col("vec_id") % 2 == 1)
    c = F.col
    d2 = (
        ev.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "c_label")
        .agg(
            F.max("label").alias("true_label"),
            F.sum((c("x") - c("c")) * (c("x") - c("c"))).alias("dist2"),
        )
    )
    wv = Window.partitionBy("vec_id").orderBy("dist2", "c_label")
    pred = (
        d2.withColumn("r", F.row_number().over(wv))
        .filter(c("r") == 1)
        .select("true_label", (c("c_label") == c("true_label")).alias("hit"))
    )
    hits = pred.groupBy("true_label").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(c("hit").cast("int")).alias("n_correct"),
    )
    wall = Window.partitionBy()
    return (
        hits.select(
            c("true_label").cast("long").alias("true_label"),
            c("n_eval").cast("long").alias("n_eval"),
            c("n_correct").cast("long").alias("n_correct"),
            F.round(c("n_correct") / c("n_eval"), 6).alias("recall"),
            F.round(
                F.sum("n_correct").over(wall) * 1.0
                / F.sum("n_eval").over(wall),
                6,
            ).alias("overall_accuracy"),
        )
        .orderBy("true_label")
    )


# ---------------------------------------------------------------------------
# Round-7 thirteenth wave: engagement economics — conversion latency
# distribution and DAU/WAU stickiness.
# ---------------------------------------------------------------------------


@register(
    "time_to_convert_stats",
    oracle="""
    WITH t AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ),
    carried AS (
        SELECT *,
               MAX(CASE WHEN event_type = 'view' THEN ts_us END) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_view_us
        FROM t
    ),
    conv AS (
        SELECT (ts_us - last_view_us) / 1000000.0 AS latency_s
        FROM carried
        WHERE event_type = 'purchase' AND last_view_us IS NOT NULL
    ),
    np AS (
        SELECT COUNT(*) AS n_purchases FROM t WHERE event_type = 'purchase'
    )
    SELECT CAST(np.n_purchases AS BIGINT) AS n_purchases,
           CAST(COUNT(*) AS BIGINT) AS n_with_prior_view,
           ROUND(quantile_cont(latency_s, 0.5), 6) AS p50_s,
           ROUND(quantile_cont(latency_s, 0.9), 6) AS p90_s,
           ROUND(quantile_cont(latency_s, 0.99), 6) AS p99_s,
           ROUND(AVG(latency_s), 6) AS mean_s
    FROM conv CROSS JOIN np GROUP BY np.n_purchases
    """,
)
def q_time_to_convert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion latency: for every purchase, seconds
    since the user's most recent PRIOR view (carried per-user window
    max over rows up to 1 preceding, (ts, event_id)-tie-broken), with
    exact p50/p90/p99 and mean — the funnel-latency twin of
    funnel_within_1h's count-based gate.  One per-user window pass; the
    percentile aggregate runs over purchases only."""
    t = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = t.withColumn(
        "last_view_us",
        F.max(
            F.when(F.col("event_type") == "view", F.col("ts_us"))
        ).over(w),
    )
    conv = carried.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_view_us").isNotNull()
    ).select(
        ((F.col("ts_us") - F.col("last_view_us")) / 1_000_000.0).alias(
            "latency_s"
        )
    )
    np_ = t.filter(F.col("event_type") == "purchase").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases")
    )
    return (
        conv.crossJoin(F.broadcast(np_))
        .groupBy("n_purchases")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_with_prior_view"),
            F.round(F.percentile("latency_s", 0.5), 6).alias("p50_s"),
            F.round(F.percentile("latency_s", 0.9), 6).alias("p90_s"),
            F.round(F.percentile("latency_s", 0.99), 6).alias("p99_s"),
            F.round(F.avg("latency_s"), 6).alias("mean_s"),
        )
        .select(
            "n_purchases", "n_with_prior_view",
            "p50_s", "p90_s", "p99_s", "mean_s",
        )
    )


@register(
    "dau_wau_stickiness",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
    wau AS (
        SELECT days.day, COUNT(DISTINCT du.user_id) AS wau
        FROM days JOIN du
          ON du.day BETWEEN days.day - INTERVAL 6 DAY AND days.day
        GROUP BY days.day
    )
    SELECT CAST(dau.day - DATE '1970-01-01' AS BIGINT) AS epoch_day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           ROUND(dau.dau * 1.0 / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
    ORDER BY epoch_day
    """,
)
def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day: distinct daily actives over distinct
    trailing-7-day actives — the engagement ratio product teams track.
    Computed from the deduplicated (day, user) frame: each active-day
    row fans out to the ≤7 calendar days whose trailing window it
    falls in (explode of a bounded literal range — NO self-join on the
    fact table), then one distinct-count per day.  Dates exported as
    epoch days for the cross-engine comparator."""
    du = (
        load_table(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            "user_id",
        )
        .distinct()
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    expanded = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("wday"),
        "user_id",
    )
    days = du.select("day").distinct()
    wau = (
        expanded.join(
            F.broadcast(days),
            expanded["wday"] == days["day"],
            "left_semi",
        )
        .groupBy("wday")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    c = F.col
    return (
        dau.join(wau, dau["day"] == wau["wday"])
        .select(
            F.datediff("day", F.lit("1970-01-01")).cast("long").alias(
                "epoch_day"
            ),
            c("dau").cast("long").alias("dau"),
            c("wau").cast("long").alias("wau"),
            F.round(c("dau") * 1.0 / c("wau"), 6).alias("stickiness"),
        )
        .orderBy("epoch_day")
    )


# ---------------------------------------------------------------------------
# Round-7 fourteenth wave: l-diversity (completing the k-anonymity /
# t-closeness / DP governance trio) and positional-index phrase search.
# ---------------------------------------------------------------------------


@register(
    "l_diversity_audit",
    oracle="""
    WITH f AS (
        SELECT CAST(hour(ts) // 4 AS BIGINT) AS hb,
               CAST(isodow(ts) - 1 AS BIGINT) AS dw,
               event_type AS sensitive
        FROM events
    ),
    cell AS (
        SELECT hb, dw, sensitive, COUNT(*) AS n
        FROM f GROUP BY 1, 2, 3
    ),
    grp AS (
        SELECT hb, dw,
               SUM(n) AS n_rows,
               COUNT(*) AS distinct_l,
               exp(ln(SUM(n)) - SUM(n * ln(n)) / SUM(n)) AS entropy_l
        FROM cell GROUP BY hb, dw
    )
    SELECT hb, dw,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(distinct_l AS BIGINT) AS distinct_l,
           ROUND(entropy_l, 6) AS entropy_l,
           distinct_l >= 3 AS meets_3_diversity,
           CAST(MIN(distinct_l) OVER () AS BIGINT) AS min_distinct_l
    FROM grp ORDER BY hb, dw
    """,
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of the (hour-band, weekday) quasi-identifier
    against the sensitive event_type — per QI group the distinct-l and
    entropy-l (exp of Shannon entropy), the l≥3 flag, and the global
    minimum (the release gate) — completing the governance trio next to
    k_anonymity_audit and t_closeness_audit.  Cell counts aggregate
    map-side; diversity math runs on the ≤|bands|·|days| grouped
    frame."""
    f = load_table(spark, sf_dir, "events").select(
        (F.hour("ts") / F.lit(4)).cast("long").alias("hb"),
        F.weekday("ts").cast("long").alias("dw"),
        F.col("event_type").alias("sensitive"),
    )
    cell = f.groupBy("hb", "dw", "sensitive").agg(
        F.count(F.lit(1)).alias("n")
    )
    c = F.col
    grp = cell.groupBy("hb", "dw").agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("distinct_l"),
        # H = ln N − Σ n·ln n / N (single pass; no window-in-agg)
        F.exp(
            F.log(F.sum("n")) - F.sum(c("n") * F.log("n")) / F.sum("n")
        ).alias("entropy_l"),
    )
    wall = Window.partitionBy()
    return (
        grp.select(
            "hb", "dw",
            c("n_rows").cast("long").alias("n_rows"),
            c("distinct_l").cast("long").alias("distinct_l"),
            F.round("entropy_l", 6).alias("entropy_l"),
            (c("distinct_l") >= 3).alias("meets_3_diversity"),
            F.min("distinct_l").over(wall).cast("long").alias(
                "min_distinct_l"
            ),
        )
        .orderBy("hb", "dw")
    )


@register(
    "phrase_search_positional",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(lower(regexp_replace(
                   text, '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+') AS t
        FROM documents
    ),
    pos AS (
        SELECT doc_id, i AS p, t[i] AS w
        FROM (SELECT doc_id, unnest(range(1, len(t) + 1)) AS i, t
              FROM toks)
    ),
    bg AS (
        SELECT a.w AS w1, b.w AS w2, COUNT(*) AS n
        FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
        GROUP BY 1, 2
        ORDER BY n DESC, w1, w2 LIMIT 1
    ),
    hits AS (
        SELECT a.doc_id, COUNT(*) AS n_occurrences
        FROM pos a
        JOIN bg ON a.w = bg.w1
        JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
                   AND b.w = bg.w2
        GROUP BY a.doc_id
    )
    SELECT hits.doc_id,
           bg.w1 || ' ' || bg.w2 AS phrase,
           CAST(hits.n_occurrences AS BIGINT) AS n_occurrences,
           position(bg.w1 || ' ' || bg.w2 IN
               trim(lower(regexp_replace(d.text, '[^a-zA-Z0-9]+', ' ', 'g'))))
               > 0 AS substring_check
    FROM hits
    JOIN documents d ON d.doc_id = hits.doc_id
    CROSS JOIN bg
    ORDER BY n_occurrences DESC, hits.doc_id LIMIT 20
    """,
)
def q_phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase search: tokenize with positions, find the
    corpus's most frequent bigram (deterministic (count, words) argmax
    — scale-free: the query adapts to whatever the data says), then
    retrieve documents by POSTING-LIST INTERSECTION — join the w1
    postings to the w2 postings on (doc_id, pos+1), the classic
    positional inverted-index primitive BM25-style term search cannot
    express.  Each row carries a substring re-check against the
    normalized text as an in-row dual proof.  The phrase is a 1-row
    broadcast; postings joins co-partition on doc_id."""
    from .functions.text import normalized_text

    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(F.split(normalized_text("text"), r"\s+")).alias(
            "p0", "w"
        ),
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "w")
    a = pos.select("doc_id", F.col("p").alias("pa"), F.col("w").alias("wa"))
    b = pos.select("doc_id", F.col("p").alias("pb"), F.col("w").alias("wb"))
    bg = (
        a.join(b, (a["doc_id"] == b["doc_id"]) & (F.col("pb") == F.col("pa") + 1))
        .groupBy(F.col("wa").alias("w1"), F.col("wb").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(1)
        .select("w1", "w2")
    )
    c = F.col
    hits = (
        pos.join(F.broadcast(bg), pos["w"] == c("w1"))
        .select("doc_id", "p", "w1", "w2")
        .alias("l")
        .join(
            pos.alias("r"),
            (c("l.doc_id") == c("r.doc_id"))
            & (c("r.p") == c("l.p") + 1)
            & (c("r.w") == c("l.w2")),
        )
        .groupBy(c("l.doc_id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max(c("l.w1")).alias("w1"),
            F.max(c("l.w2")).alias("w2"),
        )
    )
    return (
        hits.join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            F.concat_ws(" ", "w1", "w2").alias("phrase"),
            c("n_occurrences").cast("long").alias("n_occurrences"),
            (
                F.instr(
                    normalized_text("text"),
                    F.concat_ws(" ", "w1", "w2"),
                )
                > 0
            ).alias("substring_check"),
        )
        .orderBy(F.desc("n_occurrences"), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Round-7 fifteenth wave: nonparametric trend & randomness tests —
# Mann-Kendall S/z, Wald-Wolfowitz runs test, Hodges-Lehmann shift.
# ---------------------------------------------------------------------------


@register(
    "mann_kendall_daily_trend",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day, SUM(o_totalprice) AS y
        FROM orders GROUP BY 1
    ),
    p AS (
        SELECT CASE WHEN b.y > a.y THEN 1
                    WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
        FROM daily a JOIN daily b ON b.day > a.day
    ),
    s AS (
        SELECT SUM(sgn) AS s_stat,
               (SELECT COUNT(*) FROM daily) AS n
        FROM p
    ),
    ties AS (
        SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tie_term
        FROM (SELECT COUNT(*) AS t FROM daily GROUP BY y HAVING COUNT(*) > 1)
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(s_stat AS BIGINT) AS s_stat,
           ROUND((n * (n - 1.0) * (2 * n + 5) - tie_term) / 18.0, 4)
               AS var_s,
           ROUND((s_stat - CASE WHEN s_stat > 0 THEN 1
                                WHEN s_stat < 0 THEN -1 ELSE 0 END)
                 / sqrt((n * (n - 1.0) * (2 * n + 5) - tie_term) / 18.0),
                 6) AS z_mk,
           CASE WHEN s_stat > 0 THEN 'increasing'
                WHEN s_stat < 0 THEN 'decreasing'
                ELSE 'none' END AS trend
    FROM s CROSS JOIN ties
    """,
)
def q_mann_kendall_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on daily order revenue: S =
    Σ_{i<j} sign(y_j−y_i) with the tie-corrected variance and
    continuity-corrected z — the nonparametric complement of
    theil_sen_revenue_trend (same pair frame, inference instead of a
    slope).  The pair join is over the CALENDAR-bounded daily
    aggregate (a few thousand rows regardless of fact size), so the
    quadratic is bounded forever; sign sums are exact integers."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    a = daily.select(F.col("day").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("day").alias("db"), F.col("y").alias("yb"))
    c = F.col
    p = a.join(b, c("db") > c("da")).select(
        F.when(c("yb") > c("ya"), 1)
        .when(c("yb") < c("ya"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    s = p.agg(F.sum("sgn").alias("s_stat"))
    n_ = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(c("t") > 1)
        .agg(
            F.coalesce(
                F.sum(c("t") * (c("t") - 1) * (2 * c("t") + 5)), F.lit(0)
            ).alias("tie_term")
        )
    )
    var_s = (c("n") * (c("n") - 1.0) * (2 * c("n") + 5) - c("tie_term")) / 18.0
    return (
        s.crossJoin(F.broadcast(n_))
        .crossJoin(F.broadcast(ties))
        .select(
            c("n").cast("long").alias("n_days"),
            c("s_stat").cast("long").alias("s_stat"),
            F.round(var_s, 4).alias("var_s"),
            F.round(
                (
                    c("s_stat")
                    - F.when(c("s_stat") > 0, 1)
                    .when(c("s_stat") < 0, -1)
                    .otherwise(0)
                )
                / F.sqrt(var_s),
                6,
            ).alias("z_mk"),
            F.when(c("s_stat") > 0, "increasing")
            .when(c("s_stat") < 0, "decreasing")
            .otherwise("none")
            .alias("trend"),
        )
    )


@register(
    "runs_test_daily",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day, SUM(o_totalprice) AS y
        FROM orders GROUP BY 1
    ),
    d AS (
        SELECT day,
               CASE WHEN y > LAG(y) OVER (ORDER BY day) THEN 1
                    WHEN y < LAG(y) OVER (ORDER BY day) THEN -1 END AS sgn
        FROM daily
    ),
    runs AS (
        SELECT sgn,
               CASE WHEN sgn IS DISTINCT FROM LAG(sgn) OVER (ORDER BY day)
                    THEN 1 ELSE 0 END AS new_run
        FROM d WHERE sgn IS NOT NULL
    ),
    agg AS (
        SELECT SUM(new_run) AS r,
               SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS n2
        FROM runs
    )
    SELECT CAST(n1 AS BIGINT) AS n_up,
           CAST(n2 AS BIGINT) AS n_down,
           CAST(r AS BIGINT) AS n_runs,
           ROUND(2.0 * n1 * n2 / (n1 + n2) + 1, 6) AS expected_runs,
           ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / (POWER(n1 + n2, 2) * (n1 + n2 - 1))), 6)
               AS z_runs
    FROM agg
    """,
)
def q_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the up/down signs of daily revenue
    changes: run count vs its null expectation 2·n1·n2/(n1+n2)+1 — the
    randomness screen that catches oscillating or momentum-driven
    series that pass a mean-level test.  Both windows run over the
    calendar-bounded daily frame; counts are exact integers."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    wd = Window.partitionBy().orderBy("day")
    c = F.col
    d = daily.select(
        "day",
        F.when(c("y") > F.lag("y").over(wd), 1)
        .when(c("y") < F.lag("y").over(wd), -1)
        .alias("sgn"),
    ).filter(c("sgn").isNotNull())
    runs = d.select(
        "sgn",
        (~c("sgn").eqNullSafe(F.lag("sgn").over(wd))).cast("int").alias(
            "new_run"
        ),
    )
    agg = runs.agg(
        F.sum("new_run").alias("r"),
        F.sum((c("sgn") == 1).cast("int")).alias("n1"),
        F.sum((c("sgn") == -1).cast("int")).alias("n2"),
    )
    er = 2.0 * c("n1") * c("n2") / (c("n1") + c("n2")) + 1
    vr = (
        2.0 * c("n1") * c("n2")
        * (2.0 * c("n1") * c("n2") - c("n1") - c("n2"))
        / (F.pow(c("n1") + c("n2"), 2) * (c("n1") + c("n2") - 1))
    )
    return agg.select(
        c("n1").cast("long").alias("n_up"),
        c("n2").cast("long").alias("n_down"),
        c("r").cast("long").alias("n_runs"),
        F.round(er, 6).alias("expected_runs"),
        F.round((c("r") - er) / F.sqrt(vr), 6).alias("z_runs"),
    )


@register(
    "hodges_lehmann_shift",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY (event_id * 1000003 + 7) % 999983 * 40503
                            % 999983, event_id) AS r
        FROM events
        WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')
    ),
    x AS (SELECT value FROM ranked WHERE event_type = 'purchase' AND r <= 200),
    y AS (SELECT value FROM ranked WHERE event_type = 'view' AND r <= 200),
    diffs AS (SELECT x.value - y.value AS d FROM x CROSS JOIN y)
    SELECT CAST((SELECT COUNT(*) FROM x) AS BIGINT) AS n_purchase_sample,
           CAST((SELECT COUNT(*) FROM y) AS BIGINT) AS n_view_sample,
           ROUND(quantile_cont(d, 0.5), 6) AS hl_shift,
           ROUND((SELECT quantile_cont(value, 0.5) FROM x)
                 - (SELECT quantile_cont(value, 0.5) FROM y), 6)
               AS median_diff
    FROM diffs
    """,
)
def q_hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location-shift estimator (median of all pairwise
    purchase−view value differences) on a DETERMINISTIC 200-per-group
    sample — the robust effect-size companion to the Mann-Whitney test
    already in the corpus.  The sample ranks by the engine-independent
    affine-mod-prime-remultiplied hash of event_id (the ml/split.py
    convention), so both engines draw the identical 200+200 rows and
    the 40 000-pair cross join stays BOUNDED at every scale; the naive
    median difference rides along for comparison."""
    c = F.col
    ranked = (
        load_table(spark, sf_dir, "events")
        .filter(
            c("value").isNotNull()
            & c("event_type").isin("purchase", "view")
        )
        .select(
            "event_type", "value", "event_id",
            (
                (c("event_id").cast("long") * 1000003 + 7)
                % 999983 * 40503 % 999983
            ).alias("h"),
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("h", "event_id")
            ),
        )
        .filter(c("r") <= 200)
    )
    x = ranked.filter(c("event_type") == "purchase").select(
        c("value").alias("xv")
    )
    y = ranked.filter(c("event_type") == "view").select(
        c("value").alias("yv")
    )
    nx = x.agg(F.count(F.lit(1)).cast("long").alias("n_purchase_sample"))
    ny = y.agg(F.count(F.lit(1)).cast("long").alias("n_view_sample"))
    medx = x.agg(F.percentile("xv", 0.5).alias("mx"))
    medy = y.agg(F.percentile("yv", 0.5).alias("my"))
    return (
        x.crossJoin(y)
        .select((c("xv") - c("yv")).alias("d"))
        .agg(F.round(F.percentile("d", 0.5), 6).alias("hl_shift"))
        .crossJoin(F.broadcast(nx))
        .crossJoin(F.broadcast(ny))
        .crossJoin(F.broadcast(medx))
        .crossJoin(F.broadcast(medy))
        .select(
            "n_purchase_sample",
            "n_view_sample",
            "hl_shift",
            F.round(c("mx") - c("my"), 6).alias("median_diff"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 sixteenth wave: preference queries — the 2-D skyline (Pareto
# frontier) via the distributed prefix-extreme primitive.
# ---------------------------------------------------------------------------


@register(
    "skyline_price_size",
    oracle="""
    SELECT p.p_partkey,
           ROUND(p.p_retailprice, 2) AS price,
           CAST(p.p_size AS BIGINT) AS size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    ORDER BY price, p.p_partkey
    """,
)
def q_skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts: minimize retail price,
    maximize size — no other part is cheaper-and-at-least-as-large or
    as-cheap-and-larger.  Spark side runs the O(n log n) sweep, not the
    O(n²) dominance anti-join the DuckDB oracle uses (an independent
    formulation): per-price max size (one aggregate), then the
    EXCLUSIVE running max over strictly-cheaper prices via
    partitioned_prefix_extreme (operators/indexing.py — two-phase
    range-partitioned scan, no single-task window), and a part is on
    the frontier iff its size tops its own price group AND strictly
    exceeds every cheaper group's max.  Same-price-same-size ties are
    mutually non-dominating and all kept, matching NOT EXISTS."""
    from .operators.indexing import partitioned_prefix_extreme

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    g = part.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))
    m1 = partitioned_prefix_extreme(
        g, ["p_retailprice"], "gmax", "m1", exclusive=True
    )
    c = F.col
    return (
        part.join(m1, "p_retailprice")
        .filter(
            (c("p_size") == c("gmax"))
            & (c("m1").isNull() | (c("p_size") > c("m1")))
        )
        .select(
            "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
            c("p_size").cast("long").alias("size"),
        )
        .orderBy("price", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Round-7 seventeenth wave: cross-table reconciliation + Markov
# removal-effect attribution.
# ---------------------------------------------------------------------------


@register(
    "order_total_reconciliation",
    oracle="""
    WITH ls AS (
        SELECT l_orderkey,
               SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS s
        FROM lineitem GROUP BY 1
    ),
    j AS (
        SELECT o_orderstatus AS status, o_totalprice, ls.s,
               CASE WHEN ls.s IS NULL THEN NULL
                    ELSE ABS(o_totalprice - ls.s)
                         / GREATEST(o_totalprice, ls.s) END AS rel_gap
        FROM orders LEFT JOIN ls ON l_orderkey = o_orderkey
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN s IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_no_lineitems,
           CAST(SUM(CASE WHEN rel_gap <= 0.01 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_within_1pct,
           ROUND(quantile_cont(rel_gap, 0.5), 6) AS median_rel_gap,
           ROUND(MAX(rel_gap), 6) AS max_rel_gap,
           ROUND(SUM(o_totalprice), 2) AS header_total,
           ROUND(SUM(s), 2) AS detail_total
    FROM j GROUP BY status ORDER BY status
    """,
)
def q_order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation: o_totalprice against the
    recomputed lineitem total Σ extprice·(1−disc)·(1+tax), per order
    status — childless headers, within-1% match counts, median/max
    relative gap, and both ledger totals.  On THIS generator the
    header column is synthetic noise (0 of 15 000 orders reconcile at
    sf0.01) — the audit documents that as data, the classic close-of-
    books check.  One detail aggregate + broadcast-free equi join."""
    ls = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("s")
        )
    )
    c = F.col
    j = (
        load_table(spark, sf_dir, "orders")
        .join(ls, c("l_orderkey") == c("o_orderkey"), "left")
        .select(
            F.col("o_orderstatus").alias("status"),
            "o_totalprice",
            "s",
            F.when(
                c("s").isNotNull(),
                F.abs(c("o_totalprice") - c("s"))
                / F.greatest(c("o_totalprice"), c("s")),
            ).alias("rel_gap"),
        )
    )
    return (
        j.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(c("s").isNull().cast("int")).cast("long").alias(
                "n_no_lineitems"
            ),
            F.sum((c("rel_gap") <= 0.01).cast("int")).cast("long").alias(
                "n_within_1pct"
            ),
            F.round(F.percentile("rel_gap", 0.5), 6).alias("median_rel_gap"),
            F.round(F.max("rel_gap"), 6).alias("max_rel_gap"),
            F.round(F.sum("o_totalprice"), 2).alias("header_total"),
            F.round(F.sum("s"), 2).alias("detail_total"),
        )
        .orderBy("status")
    )


def _markov_attr_oracle(iters: int = 20) -> str:
    """Unrolled truncated-absorption oracle for Markov removal-effect
    attribution: journeys → transition probabilities → ``iters``
    value-iteration steps for the base chain AND one variant per
    removed channel, all in one recursive-free chain of MATERIALIZED
    CTEs (the _hits_oracle pattern — inlining would blow up the
    expression tree exponentially)."""
    head = """
    WITH t AS MATERIALIZED (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN event_type = 'purchase' THEN 'conv'
                    ELSE event_type END AS state
        FROM events
    ),
    gaps AS MATERIALIZED (
        SELECT *,
               CASE WHEN ts_us - LAG(ts_us) OVER (
                        PARTITION BY user_id ORDER BY ts_us, event_id)
                        > 1800000000 THEN 1 ELSE 0 END AS new_s
        FROM t
    ),
    sess AS MATERIALIZED (
        SELECT *,
               SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM gaps
    ),
    j AS MATERIALIZED (
        SELECT * FROM (
            SELECT *,
                   COALESCE(SUM(CASE WHEN state = 'conv' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id, sid
                             ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS nconv_before
            FROM sess)
        WHERE nconv_before = 0
    ),
    edges AS MATERIALIZED (
        SELECT COALESCE(LAG(state) OVER (
                   PARTITION BY user_id, sid ORDER BY ts_us, event_id),
               'start') AS src,
               state AS dst
        FROM j
        UNION ALL
        SELECT state AS src, 'null' AS dst
        FROM (SELECT state,
                     MAX(CASE WHEN state = 'conv' THEN 1 ELSE 0 END)
                         OVER (PARTITION BY user_id, sid) AS converted,
                     ROW_NUMBER() OVER (PARTITION BY user_id, sid
                         ORDER BY ts_us DESC, event_id DESC) AS rn
              FROM j)
        WHERE rn = 1 AND converted = 0
    ),
    p AS MATERIALIZED (
        SELECT src, dst,
               COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY src) AS p
        FROM edges GROUP BY src, dst
    ),
    rms AS MATERIALIZED (
        SELECT 'none' AS rm
        UNION ALL
        SELECT DISTINCT src FROM p WHERE src <> 'start'
    ),
    v0 AS MATERIALIZED (
        SELECT rm, 'none' AS s, 0.0 AS v FROM rms WHERE FALSE
    )"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(
            f""",
    v{i} AS MATERIALIZED (
        SELECT r.rm, p.src AS s,
               SUM(p.p * CASE WHEN p.dst = 'conv' THEN 1.0
                              WHEN p.dst = r.rm THEN 0.0
                              ELSE COALESCE(v{i - 1}.v, 0.0) END) AS v
        FROM rms r
        JOIN p ON p.src <> r.rm
        LEFT JOIN v{i - 1} ON v{i - 1}.rm = r.rm AND v{i - 1}.s = p.dst
        GROUP BY 1, 2
    )"""
        )
    tail = f""",
    pc AS (
        SELECT rm, v FROM v{iters} WHERE s = 'start'
    ),
    base AS (SELECT v AS p_base FROM pc WHERE rm = 'none'),
    eff AS (
        SELECT pc.rm AS channel, base.p_base, pc.v AS p_removed,
               (base.p_base - pc.v) / base.p_base AS removal_effect
        FROM pc CROSS JOIN base WHERE pc.rm <> 'none'
    )
    SELECT channel,
           ROUND(p_base, 6) AS p_conv_base,
           ROUND(p_removed, 6) AS p_conv_removed,
           ROUND(removal_effect, 6) AS removal_effect,
           ROUND(removal_effect / SUM(removal_effect) OVER (), 6)
               AS attribution_share
    FROM eff ORDER BY channel"""
    return head + "".join(steps) + tail


@register("markov_removal_attribution", oracle=_markov_attr_oracle())
def q_markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (the data-driven alternative
    to last-touch / time-decay / Shapley already in the corpus):
    30-minute sessions become start→channel→…→conv/null journeys
    (truncated at the first purchase), the transition matrix is
    estimated from exact counts, and each channel's value is the drop
    in absorption probability when every transition INTO it is
    redirected to the null sink — computed by 20 truncated value-
    iteration steps for the base chain and each removal variant.  The
    heavy part (sessionize + edge counts) is fully distributed; the
    chain solve runs as ONE Arrow task over the ≤|states|² transition
    frame (hybrid-endgame pattern, same as holt/graph kernels).  The
    DuckDB twin replays all 20 steps per variant via unrolled
    materialized CTEs, value-checking every step."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
        F.when(F.col("event_type") == "purchase", "conv")
        .otherwise(F.col("event_type"))
        .alias("state"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = ev.withColumn(
        "sid",
        F.sum(
            F.when(
                F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000, 1
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts_us", "event_id")
    j = sess.withColumn(
        "nconv_before",
        F.coalesce(
            F.sum((F.col("state") == "conv").cast("int")).over(
                ws.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).filter(F.col("nconv_before") == 0)
    step_edges = j.select(
        F.coalesce(F.lag("state").over(ws), F.lit("start")).alias("src"),
        F.col("state").alias("dst"),
    )
    c = F.col
    terminal = (
        j.groupBy("user_id", "sid")
        .agg(
            F.max((c("state") == "conv").cast("int")).alias("converted"),
            F.expr("max_by(state, struct(ts_us, event_id))").alias(
                "last_state"
            ),
        )
        .filter(c("converted") == 0)
        .select(c("last_state").alias("src"), F.lit("null").alias("dst"))
    )
    trans = (
        step_edges.unionAll(terminal)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        tot = pdf.groupby("src")["cnt"].transform("sum")
        pdf = pdf.assign(p=pdf["cnt"] / tot)
        channels = sorted(
            s for s in pdf["src"].unique() if s != "start"
        )
        rows = []
        trans_list = list(
            zip(pdf["src"], pdf["dst"], pdf["p"])
        )

        def absorb(removed):
            states = sorted({s for s, _, _ in trans_list if s != removed})
            v = {s: 0.0 for s in states}
            for _ in range(20):
                nv = {}
                for s in states:
                    acc = 0.0
                    for src, dst, pr in trans_list:
                        if src != s or dst == removed:
                            continue
                        acc += pr * (1.0 if dst == "conv" else v.get(dst, 0.0))
                    nv[s] = acc
                v = nv
            return v.get("start", 0.0)

        p_base = absorb(None)
        effs = {ch: (p_base - absorb(ch)) / p_base for ch in channels}
        tot_eff = sum(effs.values())
        for ch in channels:
            rows.append(
                (
                    ch,
                    round(p_base, 6),
                    round(p_base - effs[ch] * p_base, 6),
                    round(effs[ch], 6),
                    round(effs[ch] / tot_eff, 6),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "channel", "p_conv_base", "p_conv_removed",
                "removal_effect", "attribution_share",
            ],
        )

    out_schema = (
        "channel string, p_conv_base double, p_conv_removed double, "
        "removal_effect double, attribution_share double"
    )
    return (
        trans.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda _, pdf: kernel(pdf), schema=out_schema)
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Round-7 eighteenth wave: symbolic sequence matching (MATCH_RECOGNIZE
# via per-session state strings + regex) and a deterministic
# randomization test.
# ---------------------------------------------------------------------------


@register(
    "sequence_pattern_match",
    oracle="""
    WITH t AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
                    WHEN 'signup' THEN 's' ELSE 'x' END AS ch
        FROM events
    ),
    gaps AS (
        SELECT *,
               CASE WHEN ts_us - LAG(ts_us) OVER (
                        PARTITION BY user_id ORDER BY ts_us, event_id)
                        > 1800000000 THEN 1 ELSE 0 END AS new_s
        FROM t
    ),
    sess AS (
        SELECT *,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM gaps
    ),
    strs AS (
        SELECT user_id, sid,
               string_agg(ch, '' ORDER BY ts_us, event_id) AS seq
        FROM sess GROUP BY 1, 2
    ),
    m AS (
        SELECT seq,
               regexp_matches(seq, 'v[^e]*c[^e]*p') AS clean_funnel,
               regexp_matches(seq, 'v.*c.*p') AS any_funnel,
               regexp_matches(seq, 'ee+') AS error_burst
        FROM strs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN any_funnel THEN 1 ELSE 0 END) AS BIGINT)
               AS n_funnel_any,
           CAST(SUM(CASE WHEN clean_funnel THEN 1 ELSE 0 END) AS BIGINT)
               AS n_funnel_clean,
           CAST(SUM(CASE WHEN error_burst THEN 1 ELSE 0 END) AS BIGINT)
               AS n_error_burst,
           ROUND(SUM(CASE WHEN clean_funnel THEN 1 ELSE 0 END) * 1.0
                 / GREATEST(SUM(CASE WHEN any_funnel THEN 1 ELSE 0 END), 1),
                 6) AS clean_share_of_funnels
    FROM m
    """,
)
def q_sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching: each 30-minute
    session is collapsed to a symbol string (v/c/p/e/s per event type,
    (ts, event_id)-ordered), then matched against regexes — the
    view→click→purchase funnel WITH and WITHOUT an intervening error,
    plus the repeated-error burst screen.  Symbolizing + regex is the
    standard Spark encoding of row-pattern recognition: the strings
    are session-bounded, the matcher is RE2-class (no backtracking
    blowup), and everything after the per-session string_agg is a
    counts-only aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "error", "e")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("x")
        .alias("ch"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = ev.withColumn(
        "sid",
        F.sum(
            F.when(
                F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000, 1
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    strs = sess.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts_us", "event_id", "ch"))
                ),
                lambda x: x["ch"],
            ),
            "",
        ).alias("seq")
    )
    c = F.col
    m = strs.select(
        c("seq").rlike("v[^e]*c[^e]*p").alias("clean_funnel"),
        c("seq").rlike("v.*c.*p").alias("any_funnel"),
        c("seq").rlike("ee+").alias("error_burst"),
    )
    return m.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(c("any_funnel").cast("int")).cast("long").alias("n_funnel_any"),
        F.sum(c("clean_funnel").cast("int")).cast("long").alias(
            "n_funnel_clean"
        ),
        F.sum(c("error_burst").cast("int")).cast("long").alias(
            "n_error_burst"
        ),
        F.round(
            F.sum(c("clean_funnel").cast("int"))
            / F.greatest(F.sum(c("any_funnel").cast("int")), F.lit(1)),
            6,
        ).alias("clean_share_of_funnels"),
    )


@register(
    "randomization_test_value",
    oracle="""
    WITH base AS (
        SELECT event_id, value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp
        FROM events
        WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')
    ),
    obs AS (
        SELECT AVG(CASE WHEN grp = 1 THEN value END)
               - AVG(CASE WHEN grp = 0 THEN value END) AS d_obs,
               SUM(grp) AS n1, COUNT(*) AS n
        FROM base
    ),
    reps AS (
        SELECT b AS rep, value,
               CASE WHEN (event_id * (1000003 + 2 * b) + b) % 999983
                         * 40503 % 999983 % n < n1
                    THEN 1 ELSE 0 END AS grp
        FROM base CROSS JOIN obs CROSS JOIN range(0, 200) t(b)
    ),
    dist AS (
        SELECT rep,
               AVG(CASE WHEN grp = 1 THEN value END)
               - AVG(CASE WHEN grp = 0 THEN value END) AS d
        FROM reps GROUP BY rep
    )
    SELECT CAST(obs.n1 AS BIGINT) AS n_purchase,
           CAST(obs.n - obs.n1 AS BIGINT) AS n_view,
           ROUND(obs.d_obs, 6) AS observed_diff,
           CAST(200 AS BIGINT) AS n_reps,
           ROUND(SUM(CASE WHEN ABS(dist.d) >= ABS(obs.d_obs)
                          THEN 1 ELSE 0 END) * 1.0 / 200, 6) AS p_value,
           ROUND(AVG(dist.d), 6) AS null_mean,
           ROUND(stddev_samp(dist.d), 6) AS null_sd
    FROM dist CROSS JOIN obs
    GROUP BY obs.n1, obs.n, obs.d_obs
    """,
)
def q_randomization_test_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-randomization test for the purchase−view mean value
    gap: 200 pseudo-relabelings, each assigning 'treatment' to a row
    iff its affine-mod-prime-remultiplied hash (multiplier varied per
    replicate — additive seeds alone cancel, the ml/split.py
    convention) lands below the observed treatment share — so both
    engines draw IDENTICAL null assignments with no RNG.  The p-value
    is the share of null |diffs| ≥ |observed|.  The 200× replicate
    fanout carries only (rep, grp, value) into a map-side-combined
    aggregate — counts move, rows don't."""
    base = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "view")
        )
        .select(
            "event_id", "value",
            (F.col("event_type") == "purchase").cast("int").alias("grp"),
        )
    )
    c = F.col
    obs = base.agg(
        (
            F.avg(F.when(c("grp") == 1, c("value")))
            - F.avg(F.when(c("grp") == 0, c("value")))
        ).alias("d_obs"),
        F.sum("grp").alias("n1"),
        F.count(F.lit(1)).alias("n"),
    )
    reps = (
        base.crossJoin(F.broadcast(obs))
        .crossJoin(
            F.broadcast(
                load_table(spark, sf_dir, "events")
                .sparkSession.range(0, 200)
                .select(F.col("id").alias("b"))
            )
        )
        .select(
            "b", "value",
            (
                (
                    (
                        c("event_id").cast("long")
                        * (1000003 + 2 * c("b"))
                        + c("b")
                    )
                    % 999983
                    * 40503
                    % 999983
                    % c("n")
                    < c("n1")
                ).cast("int")
            ).alias("grp"),
        )
    )
    dist = reps.groupBy("b").agg(
        (
            F.avg(F.when(c("grp") == 1, c("value")))
            - F.avg(F.when(c("grp") == 0, c("value")))
        ).alias("d")
    )
    return (
        dist.crossJoin(F.broadcast(obs))
        .agg(
            F.max("n1").cast("long").alias("n_purchase"),
            (F.max("n") - F.max("n1")).cast("long").alias("n_view"),
            F.round(F.max("d_obs"), 6).alias("observed_diff"),
            F.lit(200).cast("long").alias("n_reps"),
            F.round(
                F.sum(
                    (F.abs(c("d")) >= F.abs(c("d_obs"))).cast("int")
                )
                / 200.0,
                6,
            ).alias("p_value"),
            F.round(F.avg("d"), 6).alias("null_mean"),
            F.round(F.stddev_samp("d"), 6).alias("null_sd"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 nineteenth wave: rich-club structure + metric-learning triplet
# margins.
# ---------------------------------------------------------------------------


@register(
    "rich_club_coefficient",
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS okey, l_partkey AS v FROM lineitem
    ),
    pairs AS (
        SELECT a.v AS u, b.v AS w, COUNT(*) AS cnt
        FROM op a JOIN op b ON a.okey = b.okey AND a.v < b.v
        GROUP BY 1, 2
    ),
    e AS (SELECT u, w FROM pairs WHERE cnt >= 2),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM e UNION ALL SELECT w FROM e
        ) GROUP BY node
    ),
    thr AS (
        SELECT UNNEST([50, 75, 90]) AS pct,
               UNNEST(quantile_cont(d, [0.5, 0.75, 0.9])) AS k
        FROM deg
    ),
    club AS (
        SELECT thr.pct, thr.k, deg.node
        FROM thr JOIN deg ON deg.d > thr.k
    ),
    nk AS (SELECT pct, MAX(k) AS k, COUNT(*) AS n_nodes
           FROM club GROUP BY pct),
    ek AS (
        SELECT cu.pct, COUNT(*) AS n_edges
        FROM e JOIN club cu ON cu.node = e.u
               JOIN club cw ON cw.node = e.w AND cw.pct = cu.pct
        GROUP BY cu.pct
    )
    SELECT CAST(nk.pct AS BIGINT) AS pct,
           ROUND(nk.k, 6) AS degree_threshold,
           CAST(nk.n_nodes AS BIGINT) AS n_nodes,
           CAST(COALESCE(ek.n_edges, 0) AS BIGINT) AS n_edges,
           ROUND(2.0 * COALESCE(ek.n_edges, 0)
                 / GREATEST(nk.n_nodes * (nk.n_nodes - 1), 1), 6) AS phi
    FROM nk LEFT JOIN ek ON ek.pct = nk.pct
    ORDER BY pct
    """,
)
def q_rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the part co-purchase graph (edges =
    part pairs co-occurring in ≥2 orders): at the measured p50/p75/p90
    degree thresholds, the edge density φ(k) among nodes of degree > k
    — do hubs preferentially interconnect?  Thresholds are exact
    percentiles of the measured degree distribution (scale-free — a
    fixed k would empty out as the graph grows); club membership is a
    broadcast of the ≤3-level node sets; edges never self-join beyond
    the basket-bounded pair build shared with the other co-purchase
    queries."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("v"))
        .distinct()
    )
    a = op.select("okey", F.col("v").alias("u"))
    b = op.select("okey", F.col("v").alias("w"))
    e = (
        a.join(b, "okey")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("u", "w")
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    thr = deg.agg(
        F.percentile("d", F.array(F.lit(0.5), F.lit(0.75), F.lit(0.9))).alias(
            "ks"
        )
    ).select(
        F.posexplode("ks").alias("i", "k")
    ).select(
        F.when(F.col("i") == 0, 50)
        .when(F.col("i") == 1, 75)
        .otherwise(90)
        .alias("pct"),
        "k",
    )
    c = F.col
    club = thr.join(deg, deg["d"] > thr["k"]).select("pct", "k", "node")
    nk = club.groupBy("pct").agg(
        F.max("k").alias("k"), F.count(F.lit(1)).alias("n_nodes")
    )
    cu = club.select(c("pct").alias("pu"), c("node").alias("u"))
    cw = club.select(c("pct").alias("pw"), c("node").alias("w2"))
    ek = (
        e.join(F.broadcast(cu), "u")
        .join(
            F.broadcast(cw),
            (c("w") == c("w2")) & (c("pu") == c("pw")),
        )
        .groupBy(c("pu").alias("pct"))
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        nk.join(F.broadcast(ek), "pct", "left")
        .select(
            c("pct").cast("long").alias("pct"),
            F.round("k", 6).alias("degree_threshold"),
            c("n_nodes").cast("long").alias("n_nodes"),
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            F.round(
                2.0
                * F.coalesce("n_edges", F.lit(0))
                / F.greatest(
                    c("n_nodes") * (c("n_nodes") - 1), F.lit(1)
                ),
                6,
            ).alias("phi"),
        )
        .orderBy("pct")
    )


@register(
    "triplet_margin_audit",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               (vec_id * 1000003 + 7) % 999983 * 40503 % 999983 AS h
        FROM embeddings
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY label ORDER BY h, vec_id)
                   AS r,
               COUNT(*) OVER (PARTITION BY label) AS cnt
        FROM e
    ),
    labs AS (
        SELECT label,
               COALESCE(LEAD(label) OVER (ORDER BY label),
                        FIRST_VALUE(label) OVER (ORDER BY label))
                   AS next_label
        FROM (SELECT DISTINCT label FROM e) ORDER BY label
    ),
    reps AS (
        SELECT label AS rep_label, v AS rep_v FROM ranked WHERE r = 1
    ),
    trip AS (
        SELECT a.label,
               list_cosine_similarity(a.v, p.v) AS cos_pos,
               list_cosine_similarity(a.v, reps.rep_v) AS cos_neg
        FROM ranked a
        JOIN ranked p ON p.label = a.label
                     AND p.r = a.r % a.cnt + 1
        JOIN labs ON labs.label = a.label
        JOIN reps ON reps.rep_label = labs.next_label
        WHERE a.cnt >= 2
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_triplets,
           ROUND(AVG(cos_pos), 6) AS mean_cos_pos,
           ROUND(AVG(cos_neg), 6) AS mean_cos_neg,
           ROUND(AVG(cos_pos - cos_neg), 6) AS mean_margin,
           ROUND(AVG(CASE WHEN cos_pos > cos_neg THEN 1.0 ELSE 0 END), 6)
               AS satisfied_rate
    FROM trip GROUP BY label ORDER BY label
    """,
)
def q_triplet_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-learning triplet audit of the labeled embeddings: every
    vector anchors one DETERMINISTIC triplet — positive = its successor
    in affine-hash order within its own label (wrapping), negative =
    the hash-first representative of the cyclically next label — and we
    report per-label mean anchor-positive / anchor-negative cosine,
    margin, and the triplet-satisfaction rate (cos_pos > cos_neg).
    No RNG, no all-pairs: one partitioned rank window, a (label, rank)
    equi self-join, and a ≤|labels|-row broadcast of negatives."""
    from .functions.vectors import cosine_similarity

    c = F.col
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        (
            (c("vec_id").cast("long") * 1000003 + 7) % 999983 * 40503 % 999983
        ).alias("h"),
    )
    wl = Window.partitionBy("label").orderBy("h", "vec_id")
    ranked = e.withColumn("r", F.row_number().over(wl)).withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("label"))
    )
    dl = e.select("label").distinct()
    wo = Window.partitionBy().orderBy("label")
    labs = dl.select(
        "label",
        F.coalesce(
            F.lead("label").over(wo), F.first("label").over(wo)
        ).alias("next_label"),
    )
    reps = ranked.filter(c("r") == 1).select(
        c("label").alias("rep_label"), c("v").alias("rep_v")
    )
    a = ranked.filter(c("cnt") >= 2).select(
        "label", "v", "r", "cnt"
    )
    p = ranked.select(
        c("label").alias("p_label"), c("r").alias("p_r"), c("v").alias("p_v")
    )
    trip = (
        a.join(
            p,
            (c("p_label") == c("label"))
            & (c("p_r") == c("r") % c("cnt") + 1),
        )
        .join(F.broadcast(labs), "label")
        .join(F.broadcast(reps), c("rep_label") == c("next_label"))
        .select(
            "label",
            cosine_similarity("v", "p_v").alias("cos_pos"),
            cosine_similarity("v", "rep_v").alias("cos_neg"),
        )
    )
    return (
        trip.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_triplets"),
            F.round(F.avg("cos_pos"), 6).alias("mean_cos_pos"),
            F.round(F.avg("cos_neg"), 6).alias("mean_cos_neg"),
            F.round(F.avg(c("cos_pos") - c("cos_neg")), 6).alias(
                "mean_margin"
            ),
            F.round(
                F.avg((c("cos_pos") > c("cos_neg")).cast("double")), 6
            ).alias("satisfied_rate"),
        )
        .select(
            c("label").cast("long").alias("label"),
            "n_triplets", "mean_cos_pos", "mean_cos_neg",
            "mean_margin", "satisfied_rate",
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Round-7 twentieth wave: robust IRLS regression + survey raking (IPF).
# ---------------------------------------------------------------------------


def _huber_oracle(iters: int = 3) -> str:
    """Unrolled Huber-IRLS oracle: OLS seed, MAD scale, then ``iters``
    reweighted closed-form fits.  Weights w = LEAST(1, k/|r|) are
    CONTINUOUS in the residual, so cross-engine float noise cannot flip
    a weight across a cliff (unlike a hard |r|<k gate)."""
    head = """
    WITH daily AS MATERIALIZED (
        SELECT o_orderdate AS day, SUM(o_totalprice) AS y
        FROM orders GROUP BY 1
    ),
    t0 AS MATERIALIZED (SELECT MIN(day) AS d0 FROM daily),
    x AS MATERIALIZED (
        SELECT CAST(date_diff('day', d0, day) AS DOUBLE) AS t, y
        FROM daily CROSS JOIN t0
    ),
    f0 AS MATERIALIZED (
        SELECT (COUNT(*) * SUM(t * y) - SUM(t) * SUM(y))
               / (COUNT(*) * SUM(t * t) - SUM(t) * SUM(t)) AS b,
               AVG(y) - (COUNT(*) * SUM(t * y) - SUM(t) * SUM(y))
               / (COUNT(*) * SUM(t * t) - SUM(t) * SUM(t)) * AVG(t) AS a
        FROM x
    ),
    scale AS MATERIALIZED (
        SELECT 1.4826 * quantile_cont(ABS(y - (a + b * t)), 0.5) AS s,
               1.345 * 1.4826 * quantile_cont(ABS(y - (a + b * t)), 0.5)
                   AS k
        FROM x CROSS JOIN f0
    )"""
    steps = []
    prev = "f0"
    for i in range(1, iters + 1):
        steps.append(
            f""",
    w{i} AS MATERIALIZED (
        SELECT t, y,
               LEAST(1.0, k / NULLIF(ABS(y - (a + b * t)), 0)) AS w
        FROM x CROSS JOIN {prev} CROSS JOIN scale
    ),
    f{i} AS MATERIALIZED (
        SELECT (SUM(w) * SUM(w * t * y) - SUM(w * t) * SUM(w * y))
               / (SUM(w) * SUM(w * t * t) - SUM(w * t) * SUM(w * t)) AS b,
               (SUM(w * y) - (SUM(w) * SUM(w * t * y)
                              - SUM(w * t) * SUM(w * y))
                / (SUM(w) * SUM(w * t * t) - SUM(w * t) * SUM(w * t))
                * SUM(w * t)) / SUM(w) AS a
        FROM w{i}
    )"""
        )
        prev = f"f{i}"
    tail = f"""
    SELECT CAST((SELECT COUNT(*) FROM x) AS BIGINT) AS n_days,
           ROUND(f0.b, 6) AS beta1_ols,
           ROUND(f{iters}.a, 6) AS beta0_huber,
           ROUND(f{iters}.b, 6) AS beta1_huber,
           ROUND(scale.s, 4) AS scale_mad,
           ROUND((SELECT SUM(w) FROM w{iters})
                 / (SELECT COUNT(*) FROM x), 6) AS mean_weight
    FROM f0 CROSS JOIN f{iters} CROSS JOIN scale"""
    return head + "".join(steps) + tail


@register("huber_irls_daily", oracle=_huber_oracle())
def q_huber_irls_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber robust regression of daily revenue on the day index via 3
    IRLS steps: OLS seed, MAD-based scale, then reweighted closed-form
    fits with the CONTINUOUS weight min(1, k/|r|) — outlier days are
    downweighted smoothly, and the continuity means cross-engine float
    noise cannot flip any weight discretely (every step is value-
    checked by the unrolled oracle).  Each iteration is ONE aggregate
    over the calendar-bounded daily frame with the previous fit
    broadcast as a 1-row frame — no collects, no single-task windows;
    the mean IRLS weight reports how much mass was trimmed."""
    c = F.col
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    t0 = daily.agg(F.min("day").alias("d0"))
    x = daily.crossJoin(F.broadcast(t0)).select(
        F.datediff("day", "d0").cast("double").alias("t"), "y"
    )
    x = x.localCheckpoint(eager=True)  # reused by every IRLS pass
    n_ = x.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    b_expr = (
        F.count(F.lit(1)) * F.sum(c("t") * c("y"))
        - F.sum("t") * F.sum("y")
    ) / (
        F.count(F.lit(1)) * F.sum(c("t") * c("t"))
        - F.sum("t") * F.sum("t")
    )
    f0 = x.agg(
        b_expr.alias("b"),
        (F.avg("y") - b_expr * F.avg("t")).alias("a"),
    )
    scale = (
        x.crossJoin(F.broadcast(f0))
        .agg(
            (
                1.4826
                * F.percentile(
                    F.abs(c("y") - (c("a") + c("b") * c("t"))), 0.5
                )
            ).alias("s")
        )
        .select("s", (1.345 * c("s")).alias("k"))
    )
    fit = f0
    wsum = None
    for _ in range(3):
        wx = (
            x.crossJoin(F.broadcast(fit))
            .crossJoin(F.broadcast(scale))
            .select(
                "t", "y",
                F.least(
                    F.lit(1.0),
                    c("k")
                    / F.nullif(
                        F.abs(c("y") - (c("a") + c("b") * c("t"))),
                        F.lit(0.0),
                    ),
                ).alias("w"),
            )
        )
        bw = (
            F.sum("w") * F.sum(c("w") * c("t") * c("y"))
            - F.sum(c("w") * c("t")) * F.sum(c("w") * c("y"))
        ) / (
            F.sum("w") * F.sum(c("w") * c("t") * c("t"))
            - F.sum(c("w") * c("t")) * F.sum(c("w") * c("t"))
        )
        fit = wx.agg(
            bw.alias("b"),
            (
                (F.sum(c("w") * c("y")) - bw * F.sum(c("w") * c("t")))
                / F.sum("w")
            ).alias("a"),
        )
        wsum = wx.agg(F.sum("w").alias("sw"))
    return (
        f0.select(F.round("b", 6).alias("beta1_ols"))
        .crossJoin(F.broadcast(n_))
        .crossJoin(
            F.broadcast(
                fit.select(
                    F.round("a", 6).alias("beta0_huber"),
                    F.round("b", 6).alias("beta1_huber"),
                )
            )
        )
        .crossJoin(F.broadcast(scale.select(F.round("s", 4).alias("scale_mad"))))
        .crossJoin(F.broadcast(wsum))
        .select(
            "n_days", "beta1_ols", "beta0_huber", "beta1_huber",
            "scale_mad",
            F.round(c("sw") / c("n_days"), 6).alias("mean_weight"),
        )
    )


def _raking_oracle(iters: int = 3) -> str:
    """Unrolled IPF raking oracle: ``iters`` full (row-scale,
    column-scale) sweeps calibrating the (hour-band, weekday) cell
    counts to uniform margins, every sweep value-checked."""
    head = """
    WITH cells AS MATERIALIZED (
        SELECT CAST(hour(ts) // 4 AS BIGINT) AS hb,
               CAST(isodow(ts) - 1 AS BIGINT) AS dw,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS MATERIALIZED (
        SELECT SUM(n) AS nn,
               COUNT(DISTINCT hb) AS nr, COUNT(DISTINCT dw) AS nc
        FROM cells
    ),
    w0 AS MATERIALIZED (
        SELECT hb, dw, n, 1.0 AS w FROM cells
    )"""
    steps = []
    prev = "w0"
    for i in range(1, iters + 1):
        steps.append(
            f""",
    r{i} AS MATERIALIZED (
        SELECT hb, dw, n,
               w * (tot.nn * 1.0 / tot.nr)
                 / SUM(n * w) OVER (PARTITION BY hb) AS w
        FROM {prev} CROSS JOIN tot
    ),
    c{i} AS MATERIALIZED (
        SELECT hb, dw, n,
               w * (tot.nn * 1.0 / tot.nc)
                 / SUM(n * w) OVER (PARTITION BY dw) AS w
        FROM r{i} CROSS JOIN tot
    )"""
        )
        prev = f"c{i}"
    tail = f"""
    SELECT hb, dw,
           CAST(n AS BIGINT) AS n,
           ROUND(w, 6) AS weight,
           ROUND(n * w, 4) AS calibrated,
           ROUND(MAX(ABS(rowsum - nn * 1.0 / nr)) OVER (), 4)
               AS max_row_err,
           ROUND(MAX(ABS(colsum - nn * 1.0 / nc)) OVER (), 4)
               AS max_col_err
    FROM (
        SELECT *, SUM(n * w) OVER (PARTITION BY hb) AS rowsum,
                  SUM(n * w) OVER (PARTITION BY dw) AS colsum
        FROM {prev} CROSS JOIN tot
    ) ORDER BY hb, dw"""
    return head + "".join(steps) + tail


@register("raking_ipf_calibration", oracle=_raking_oracle())
def q_raking_ipf_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking (iterative proportional fitting): calibrate the
    (hour-band, weekday) cell counts to UNIFORM row and column margins
    with 3 full IPF sweeps — the weighting step behind every panel /
    post-stratification correction.  After the one distributed cell
    aggregate everything runs on the ≤42-row grid (partitioned margin
    windows over a bounded frame); the oracle unrolls and value-checks
    every sweep, and the residual margin errors ride along as the
    convergence certificate."""
    c = F.col
    cells = load_table(spark, sf_dir, "events").select(
        (F.hour("ts") / F.lit(4)).cast("long").alias("hb"),
        F.weekday("ts").cast("long").alias("dw"),
    ).groupBy("hb", "dw").agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(
        F.sum("n").alias("nn"),
        F.countDistinct("hb").alias("nr"),
        F.countDistinct("dw").alias("nc"),
    )
    w = cells.withColumn("w", F.lit(1.0))
    wr = Window.partitionBy("hb")
    wc = Window.partitionBy("dw")
    for _ in range(3):
        w = w.crossJoin(F.broadcast(tot)).select(
            "hb", "dw", "n",
            (
                c("w")
                * (c("nn") * 1.0 / c("nr"))
                / F.sum(c("n") * c("w")).over(wr)
            ).alias("w"),
        )
        w = w.crossJoin(F.broadcast(tot)).select(
            "hb", "dw", "n",
            (
                c("w")
                * (c("nn") * 1.0 / c("nc"))
                / F.sum(c("n") * c("w")).over(wc)
            ).alias("w"),
        )
    wall = Window.partitionBy()
    final = w.crossJoin(F.broadcast(tot)).select(
        "hb", "dw", "n", "w",
        F.sum(c("n") * c("w")).over(wr).alias("rowsum"),
        F.sum(c("n") * c("w")).over(wc).alias("colsum"),
        "nn", "nr", "nc",
    )
    return (
        final.select(
            "hb", "dw",
            c("n").cast("long").alias("n"),
            F.round("w", 6).alias("weight"),
            F.round(c("n") * c("w"), 4).alias("calibrated"),
            F.round(
                F.max(F.abs(c("rowsum") - c("nn") * 1.0 / c("nr"))).over(
                    wall
                ),
                4,
            ).alias("max_row_err"),
            F.round(
                F.max(F.abs(c("colsum") - c("nn") * 1.0 / c("nc"))).over(
                    wall
                ),
                4,
            ).alias("max_col_err"),
        )
        .orderBy("hb", "dw")
    )


# ---------------------------------------------------------------------------
# Round-7 twenty-first wave: one-way ANOVA + Tukey HSD post-hoc panel.
# ---------------------------------------------------------------------------


@register(
    "anova_oneway_value",
    oracle="""
    WITH g AS (
        SELECT event_type, COUNT(*) AS n, AVG(value) AS m,
               SUM(value * value) AS ss, SUM(value) AS s
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    tot AS (
        SELECT SUM(n) AS nn, COUNT(*) AS k,
               SUM(s) / SUM(n) AS gm,
               SUM(n * m * m) - SUM(n) * POWER(SUM(s) / SUM(n), 2)
                   AS ss_between,
               SUM(ss - s * s / n) AS ss_within
        FROM g
    )
    SELECT CAST(nn AS BIGINT) AS n,
           CAST(k AS BIGINT) AS k_groups,
           CAST(k - 1 AS BIGINT) AS df_between,
           CAST(nn - k AS BIGINT) AS df_within,
           ROUND(ss_between / (k - 1), 4) AS ms_between,
           ROUND(ss_within / (nn - k), 4) AS ms_within,
           ROUND((ss_between / (k - 1)) / (ss_within / (nn - k)), 6)
               AS f_stat,
           ROUND(ss_between / (ss_between + ss_within), 6) AS eta_squared
    FROM tot
    """,
)
def q_anova_oneway_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical one-way ANOVA of event value across event types: F
    statistic, dfs, mean squares, and η² effect size, computed from one
    grouped pass via the algebraic identities SS_between = Σn·m̄² −
    N·ḡ² and SS_within = Σ(SS − S²/n) — the parametric complement of
    the Kruskal-Wallis and Brown-Forsythe tests already in the
    corpus."""
    c = F.col
    g = (
        load_table(spark, sf_dir, "events")
        .filter(c("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.sum(c("value") * c("value")).alias("ss"),
            F.sum("value").alias("s"),
        )
    )
    tot = g.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        (
            F.sum(c("n") * c("m") * c("m"))
            - F.sum("n") * F.pow(F.sum("s") / F.sum("n"), 2)
        ).alias("ss_between"),
        F.sum(c("ss") - c("s") * c("s") / c("n")).alias("ss_within"),
    )
    return tot.select(
        c("nn").cast("long").alias("n"),
        c("k").cast("long").alias("k_groups"),
        (c("k") - 1).cast("long").alias("df_between"),
        (c("nn") - c("k")).cast("long").alias("df_within"),
        F.round(c("ss_between") / (c("k") - 1), 4).alias("ms_between"),
        F.round(c("ss_within") / (c("nn") - c("k")), 4).alias("ms_within"),
        F.round(
            (c("ss_between") / (c("k") - 1))
            / (c("ss_within") / (c("nn") - c("k"))),
            6,
        ).alias("f_stat"),
        F.round(
            c("ss_between") / (c("ss_between") + c("ss_within")), 6
        ).alias("eta_squared"),
    )


@register(
    "tukey_hsd_pairs",
    oracle="""
    WITH g AS (
        SELECT event_type, COUNT(*) AS n, AVG(value) AS m,
               SUM(value * value) AS ss, SUM(value) AS s
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    mse AS (
        SELECT SUM(ss - s * s / n) / (SUM(n) - COUNT(*)) AS ms_within,
               SUM(n) - COUNT(*) AS df
        FROM g
    )
    SELECT a.event_type AS group_a, b.event_type AS group_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           ROUND(a.m - b.m, 6) AS mean_diff,
           ROUND(sqrt(mse.ms_within / 2.0 * (1.0 / a.n + 1.0 / b.n)), 6)
               AS se_q,
           ROUND((a.m - b.m)
                 / sqrt(mse.ms_within / 2.0 * (1.0 / a.n + 1.0 / b.n)), 6)
               AS q_stat,
           CAST(mse.df AS BIGINT) AS df_within
    FROM g a JOIN g b ON a.event_type < b.event_type
    CROSS JOIN mse
    ORDER BY group_a, group_b
    """,
)
def q_tukey_hsd_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc panel: all pairwise mean differences between
    event types with the Tukey-Kramer standard error √(MSE/2·(1/nᵢ +
    1/nⱼ)) and the studentized-range q statistic — the follow-up every
    significant ANOVA demands.  The pair join runs over the k-row
    grouped frame (≤10 pairs), MSE is the same single-pass SS_within
    identity as the ANOVA query."""
    c = F.col
    g = (
        load_table(spark, sf_dir, "events")
        .filter(c("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.sum(c("value") * c("value")).alias("ss"),
            F.sum("value").alias("s"),
        )
    )
    mse = g.agg(
        (
            F.sum(c("ss") - c("s") * c("s") / c("n"))
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("ms_within"),
        (F.sum("n") - F.count(F.lit(1))).alias("df"),
    )
    a = g.select(
        c("event_type").alias("group_a"), c("n").alias("n_a"),
        c("m").alias("m_a"),
    )
    b = g.select(
        c("event_type").alias("group_b"), c("n").alias("n_b"),
        c("m").alias("m_b"),
    )
    se = F.sqrt(
        c("ms_within") / 2.0 * (1.0 / c("n_a") + 1.0 / c("n_b"))
    )
    return (
        a.join(b, c("group_a") < c("group_b"))
        .crossJoin(F.broadcast(mse))
        .select(
            "group_a", "group_b",
            c("n_a").cast("long").alias("n_a"),
            c("n_b").cast("long").alias("n_b"),
            F.round(c("m_a") - c("m_b"), 6).alias("mean_diff"),
            F.round(se, 6).alias("se_q"),
            F.round((c("m_a") - c("m_b")) / se, 6).alias("q_stat"),
            c("df").cast("long").alias("df_within"),
        )
        .orderBy("group_a", "group_b")
    )


# ---------------------------------------------------------------------------
# Round-7 twenty-second wave: Bloom-filter advisor — the cost model that
# decides when bloom_semi_join pays for itself on a join edge.
# ---------------------------------------------------------------------------


@register(
    "bloom_filter_advisor",
    oracle="""
    WITH edges AS (
        SELECT 'events_to_purchasers' AS edge,
               (SELECT COUNT(*) FROM events) AS n_probe_rows,
               (SELECT COUNT(DISTINCT user_id) FROM events)
                   AS n_probe_keys,
               (SELECT COUNT(DISTINCT user_id) FROM events
                WHERE event_type = 'purchase') AS n_build_keys,
               (SELECT COUNT(*) FROM events e WHERE EXISTS (
                    SELECT 1 FROM events p WHERE p.event_type = 'purchase'
                    AND p.user_id = e.user_id)) AS n_match_rows
        UNION ALL
        SELECT 'lineitem_to_urgent_orders',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem),
               (SELECT COUNT(*) FROM orders
                WHERE o_orderpriority = '1-URGENT'),
               (SELECT COUNT(*) FROM lineitem l WHERE EXISTS (
                    SELECT 1 FROM orders o
                    WHERE o.o_orderpriority = '1-URGENT'
                      AND o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'orders_to_automobile_custs',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(DISTINCT o_custkey) FROM orders),
               (SELECT COUNT(*) FROM customer
                WHERE c_mktsegment = 'AUTOMOBILE'),
               (SELECT COUNT(*) FROM orders o WHERE EXISTS (
                    SELECT 1 FROM customer c
                    WHERE c.c_mktsegment = 'AUTOMOBILE'
                      AND c.c_custkey = o.o_custkey))
    )
    SELECT edge,
           CAST(n_probe_rows AS BIGINT) AS n_probe_rows,
           CAST(n_probe_keys AS BIGINT) AS n_probe_keys,
           CAST(n_build_keys AS BIGINT) AS n_build_keys,
           CAST(n_match_rows AS BIGINT) AS n_match_rows,
           ROUND(n_match_rows * 1.0 / n_probe_rows, 6) AS match_rate,
           ROUND(POWER(1.0 - exp(-3.0 / 32.0), 3), 6) AS fp_bound,
           CAST(ROUND(n_match_rows
                + POWER(1.0 - exp(-3.0 / 32.0), 3)
                  * (n_probe_rows - n_match_rows)) AS BIGINT)
               AS est_rows_after_bloom,
           ROUND(n_probe_rows * 1.0
                 / (n_match_rows
                    + POWER(1.0 - exp(-3.0 / 32.0), 3)
                      * (n_probe_rows - n_match_rows)), 4)
               AS shuffle_reduction_x,
           n_probe_rows * 1.0
             / (n_match_rows
                + POWER(1.0 - exp(-3.0 / 32.0), 3)
                  * (n_probe_rows - n_match_rows)) >= 2.0
               AS recommend_bloom
    FROM edges ORDER BY edge
    """,
)
def q_bloom_filter_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter advisor: for three selective join edges (events ⋉
    purchasing users, lineitem ⋉ urgent orders, orders ⋉ AUTOMOBILE
    customers) measure probe/build cardinalities and the true match
    rate, then project the post-filter row count under
    bloom_semi_join's design FP bound (1−e^{−3/32})³ and recommend the
    filter when it cuts the probe-side shuffle ≥2× — the cost model
    that turns the sketch operator into a planning decision, next to
    the join/encoding/partition advisors.  Every input is an exact
    count; the Spark side computes match rows via left-semi joins, the
    oracle via EXISTS (independent formulations)."""
    c = F.col
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")

    def edge(name, probe, key, build_keys):
        matched = probe.join(
            F.broadcast(build_keys.distinct()), key, "left_semi"
        )
        return (
            probe.agg(
                F.count(F.lit(1)).alias("n_probe_rows"),
                F.countDistinct(key).alias("n_probe_keys"),
            )
            .crossJoin(
                F.broadcast(
                    build_keys.distinct().agg(
                        F.count(F.lit(1)).alias("n_build_keys")
                    )
                )
            )
            .crossJoin(
                F.broadcast(
                    matched.agg(F.count(F.lit(1)).alias("n_match_rows"))
                )
            )
            .select(F.lit(name).alias("edge"), "*")
        )

    frames = [
        edge(
            "events_to_purchasers",
            ev.select("user_id"),
            "user_id",
            ev.filter(c("event_type") == "purchase").select("user_id"),
        ),
        edge(
            "lineitem_to_urgent_orders",
            li.select(c("l_orderkey").alias("k")),
            "k",
            od.filter(c("o_orderpriority") == "1-URGENT").select(
                c("o_orderkey").alias("k")
            ),
        ),
        edge(
            "orders_to_automobile_custs",
            od.select(c("o_custkey").alias("k")),
            "k",
            cu.filter(c("c_mktsegment") == "AUTOMOBILE").select(
                c("c_custkey").alias("k")
            ),
        ),
    ]
    allf = frames[0].unionAll(frames[1]).unionAll(frames[2])
    fp = F.pow(1.0 - F.exp(F.lit(-3.0 / 32.0)), 3)
    est = c("n_match_rows") + fp * (c("n_probe_rows") - c("n_match_rows"))
    return (
        allf.select(
            "edge",
            c("n_probe_rows").cast("long").alias("n_probe_rows"),
            c("n_probe_keys").cast("long").alias("n_probe_keys"),
            c("n_build_keys").cast("long").alias("n_build_keys"),
            c("n_match_rows").cast("long").alias("n_match_rows"),
            F.round(c("n_match_rows") * 1.0 / c("n_probe_rows"), 6).alias(
                "match_rate"
            ),
            F.round(fp, 6).alias("fp_bound"),
            F.round(est, 0).cast("long").alias("est_rows_after_bloom"),
            F.round(c("n_probe_rows") * 1.0 / est, 4).alias(
                "shuffle_reduction_x"
            ),
            (c("n_probe_rows") * 1.0 / est >= 2.0).alias("recommend_bloom"),
        )
        .orderBy("edge")
    )


# ---------------------------------------------------------------------------
# Round-7 twenty-third wave: distributional effects — quantile treatment
# effects and the log-rank two-cohort survival test.
# ---------------------------------------------------------------------------


@register(
    "quantile_treatment_effects",
    oracle="""
    WITH p AS (
        SELECT quantile_cont(value,
            [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q
        FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
    ),
    v AS (
        SELECT quantile_cont(value,
            [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q
        FROM events WHERE value IS NOT NULL AND event_type = 'view'
    )
    SELECT CAST(generate_subscripts(p.q, 1) AS BIGINT) AS decile,
           ROUND(UNNEST(p.q), 6) AS q_purchase,
           ROUND(UNNEST(v.q), 6) AS q_view,
           ROUND(UNNEST(p.q) - UNNEST(v.q), 6) AS qte
    FROM p CROSS JOIN v
    ORDER BY decile
    """,
)
def q_quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile 'treatment effects': the purchase−view value gap at
    every decile, not just the mean — the distributional view that
    catches effects concentrated in the tails (mean tests like Welch's
    already in the corpus would average them away).  Two exact-
    percentile aggregates, zipped positionally; nine rows forever."""
    c = F.col
    fr = F.array(*[F.lit(d / 10.0) for d in range(1, 10)])
    base = load_table(spark, sf_dir, "events").filter(
        c("value").isNotNull()
    )
    p = base.filter(c("event_type") == "purchase").agg(
        F.percentile("value", fr).alias("qp")
    )
    v = base.filter(c("event_type") == "view").agg(
        F.percentile("value", fr).alias("qv")
    )
    return (
        p.crossJoin(F.broadcast(v))
        .select(
            F.posexplode(
                F.zip_with(
                    "qp", "qv", lambda a, b: F.struct(a.alias("p"), b.alias("v"))
                )
            ).alias("i", "z")
        )
        .select(
            (c("i") + 1).cast("long").alias("decile"),
            F.round(c("z.p"), 6).alias("q_purchase"),
            F.round(c("z.v"), 6).alias("q_view"),
            F.round(c("z.p") - c("z.v"), 6).alias("qte"),
        )
        .orderBy("decile")
    )


@register(
    "logrank_test_cohorts",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MIN(epoch_us(ts)) AS first_us,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS first_purch_us
        FROM events GROUP BY user_id
    ),
    win AS (SELECT MAX(epoch_us(ts)) AS end_us,
                   quantile_cont(first_us, 0.5) AS med_first
            FROM events CROSS JOIN u),
    subj AS (
        SELECT CASE WHEN first_us <= med_first THEN 1 ELSE 0 END AS grp,
               CASE WHEN first_purch_us IS NOT NULL
                    THEN CAST((first_purch_us - first_us)
                              // 86400000000 AS BIGINT)
                    ELSE CAST((end_us - first_us)
                              // 86400000000 AS BIGINT) END AS t_day,
               CASE WHEN first_purch_us IS NOT NULL THEN 1 ELSE 0 END
                   AS observed
        FROM u CROSS JOIN win
    ),
    days AS (
        SELECT DISTINCT t_day FROM subj WHERE observed = 1
    ),
    risk AS (
        SELECT d.t_day,
               SUM(CASE WHEN s.t_day >= d.t_day THEN 1 ELSE 0 END) AS n,
               SUM(CASE WHEN s.t_day >= d.t_day AND s.grp = 1
                        THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN s.t_day = d.t_day AND s.observed = 1
                        THEN 1 ELSE 0 END) AS d_all,
               SUM(CASE WHEN s.t_day = d.t_day AND s.observed = 1
                        AND s.grp = 1 THEN 1 ELSE 0 END) AS d1
        FROM days d CROSS JOIN subj s GROUP BY d.t_day
    ),
    lr AS (
        SELECT SUM(d1) AS o1,
               SUM(d_all * n1 * 1.0 / n) AS e1,
               SUM(CASE WHEN n > 1 THEN
                   d_all * (n1 * 1.0 / n) * (1.0 - n1 * 1.0 / n)
                   * (n - d_all) / (n - 1.0) ELSE 0 END) AS v1,
               COUNT(*) AS n_event_days
        FROM risk
    )
    SELECT CAST((SELECT COUNT(*) FROM subj WHERE grp = 1) AS BIGINT)
               AS n_early_cohort,
           CAST((SELECT COUNT(*) FROM subj WHERE grp = 0) AS BIGINT)
               AS n_late_cohort,
           CAST(n_event_days AS BIGINT) AS n_event_days,
           CAST(o1 AS BIGINT) AS observed_events_early,
           ROUND(e1, 6) AS expected_events_early,
           ROUND((o1 - e1) * (o1 - e1) / v1, 6) AS logrank_chi2
    FROM lr
    """,
)
def q_logrank_test_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing time-to-first-purchase between early
    and late cohorts (split at the MEASURED median first-seen time —
    scale-free): daily life table with right censoring at the window
    end, O−E under the hypergeometric null, χ² = (O₁−E₁)²/V₁ — the
    inferential companion to the Kaplan-Meier curves already in the
    corpus.  The risk-set join runs |event-days| × |users| with the
    bounded day frame broadcast; everything else is exact counts."""
    c = F.col
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.expr("ts_ns div 1000")).alias("first_us"),
        F.min(
            F.when(
                c("event_type") == "purchase", F.expr("ts_ns div 1000")
            )
        ).alias("first_purch_us"),
    )
    win = u.crossJoin(
        F.broadcast(ev.agg(F.max(F.expr("ts_ns div 1000")).alias("end_us")))
    ).agg(
        F.max("end_us").alias("end_us"),
        F.percentile("first_us", 0.5).alias("med_first"),
    )
    subj = u.crossJoin(F.broadcast(win)).select(
        (c("first_us") <= c("med_first")).cast("int").alias("grp"),
        F.when(
            c("first_purch_us").isNotNull(),
            ((c("first_purch_us") - c("first_us")) / 86_400_000_000)
            .cast("long"),
        )
        .otherwise(
            ((c("end_us") - c("first_us")) / 86_400_000_000).cast("long")
        )
        .alias("t_day"),
        c("first_purch_us").isNotNull().cast("int").alias("observed"),
    )
    days = subj.filter(c("observed") == 1).select("t_day").distinct()
    risk = (
        subj.crossJoin(F.broadcast(days.select(c("t_day").alias("d_day"))))
        .groupBy("d_day")
        .agg(
            F.sum((c("t_day") >= c("d_day")).cast("int")).alias("n"),
            F.sum(
                ((c("t_day") >= c("d_day")) & (c("grp") == 1)).cast("int")
            ).alias("n1"),
            F.sum(
                ((c("t_day") == c("d_day")) & (c("observed") == 1)).cast(
                    "int"
                )
            ).alias("d_all"),
            F.sum(
                (
                    (c("t_day") == c("d_day"))
                    & (c("observed") == 1)
                    & (c("grp") == 1)
                ).cast("int")
            ).alias("d1"),
        )
    )
    lr = risk.agg(
        F.sum("d1").alias("o1"),
        F.sum(c("d_all") * c("n1") * 1.0 / c("n")).alias("e1"),
        F.sum(
            F.when(
                c("n") > 1,
                c("d_all")
                * (c("n1") * 1.0 / c("n"))
                * (1.0 - c("n1") * 1.0 / c("n"))
                * (c("n") - c("d_all"))
                / (c("n") - 1.0),
            ).otherwise(0.0)
        ).alias("v1"),
        F.count(F.lit(1)).alias("n_event_days"),
    )
    cohorts = subj.agg(
        F.sum((c("grp") == 1).cast("int")).cast("long").alias(
            "n_early_cohort"
        ),
        F.sum((c("grp") == 0).cast("int")).cast("long").alias(
            "n_late_cohort"
        ),
    )
    return (
        cohorts.crossJoin(F.broadcast(lr))
        .select(
            "n_early_cohort",
            "n_late_cohort",
            c("n_event_days").cast("long").alias("n_event_days"),
            c("o1").cast("long").alias("observed_events_early"),
            F.round("e1", 6).alias("expected_events_early"),
            F.round(
                (c("o1") - c("e1")) * (c("o1") - c("e1")) / c("v1"), 6
            ).alias("logrank_chi2"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 twenty-fourth wave: index numbers + positional attribution.
# ---------------------------------------------------------------------------


@register(
    "fisher_price_index_monthly",
    oracle="""
    WITH m AS (
        SELECT date_trunc('month', l_shipdate) AS mon, l_partkey AS pk,
               SUM(l_quantity) AS q,
               SUM(l_extendedprice) / SUM(l_quantity) AS p
        FROM lineitem GROUP BY 1, 2
    ),
    pairs AS (
        SELECT cur.mon,
               SUM(cur.p * base.q) AS p1q0,
               SUM(base.p * base.q) AS p0q0,
               SUM(cur.p * cur.q) AS p1q1,
               SUM(base.p * cur.q) AS p0q1,
               COUNT(*) AS n_common_parts
        FROM m cur
        JOIN m base ON base.pk = cur.pk
                   AND base.mon = cur.mon - INTERVAL 1 MONTH
        GROUP BY cur.mon
    )
    SELECT CAST(date_diff('month', DATE '1970-01-01', mon) AS BIGINT)
               AS epoch_month,
           CAST(n_common_parts AS BIGINT) AS n_common_parts,
           ROUND(p1q0 / p0q0, 6) AS laspeyres,
           ROUND(p1q1 / p0q1, 6) AS paasche,
           ROUND(sqrt((p1q0 / p0q0) * (p1q1 / p0q1)), 6) AS fisher
    FROM pairs ORDER BY epoch_month
    """,
)
def q_fisher_price_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices month-over-month on
    the lineitem basket: per (month, part) unit price = Σext/Σqty and
    quantity, then each month joins its predecessor on partkey (only
    parts traded in BOTH months enter — the matched-model convention)
    and the four cross-weighted sums give all three indices.  One
    grouped pass + one self-join on the (month, part) aggregate frame
    — bounded by catalog size × months, never by fact rows.  Months
    exported as epoch-month ints for the comparator."""
    c = F.col
    m = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.date_trunc("month", "l_shipdate").alias("mon"),
            F.col("l_partkey").alias("pk"),
        )
        .agg(
            F.sum("l_quantity").alias("q"),
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
        )
    )
    cur = m.select(
        "mon", "pk", c("q").alias("q1"), c("p").alias("p1")
    )
    base = m.select(
        F.add_months("mon", 1).alias("mon"),
        "pk",
        c("q").alias("q0"),
        c("p").alias("p0"),
    )
    pairs = (
        cur.join(base, ["mon", "pk"])
        .groupBy("mon")
        .agg(
            F.sum(c("p1") * c("q0")).alias("p1q0"),
            F.sum(c("p0") * c("q0")).alias("p0q0"),
            F.sum(c("p1") * c("q1")).alias("p1q1"),
            F.sum(c("p0") * c("q1")).alias("p0q1"),
            F.count(F.lit(1)).alias("n_common_parts"),
        )
    )
    return (
        pairs.select(
            (
                (F.year("mon") - 1970) * 12 + F.month("mon") - 1
            ).cast("long").alias("epoch_month"),
            c("n_common_parts").cast("long").alias("n_common_parts"),
            F.round(c("p1q0") / c("p0q0"), 6).alias("laspeyres"),
            F.round(c("p1q1") / c("p0q1"), 6).alias("paasche"),
            F.round(
                F.sqrt((c("p1q0") / c("p0q0")) * (c("p1q1") / c("p0q1"))), 6
            ).alias("fisher"),
        )
        .orderBy("epoch_month")
    )


@register(
    "attribution_u_shaped",
    oracle="""
    WITH t AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ),
    conv AS (
        SELECT user_id, MIN(ts_us) AS conv_us
        FROM t WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
        SELECT t.user_id, t.event_type AS channel, t.ts_us, t.event_id,
               ROW_NUMBER() OVER (PARTITION BY t.user_id
                                  ORDER BY t.ts_us, t.event_id) AS r,
               COUNT(*) OVER (PARTITION BY t.user_id) AS n
        FROM t JOIN conv ON conv.user_id = t.user_id
        WHERE t.ts_us < conv.conv_us AND t.event_type <> 'purchase'
    ),
    credit AS (
        SELECT channel,
               CASE WHEN n = 1 THEN 1.0
                    WHEN n = 2 THEN 0.5
                    WHEN r = 1 OR r = n THEN 0.4
                    ELSE 0.2 / (n - 2) END AS w
        FROM touches
    )
    SELECT channel,
           ROUND(SUM(w), 4) AS credit,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(SUM(w) / SUM(SUM(w)) OVER (), 6) AS credit_share
    FROM credit GROUP BY channel ORDER BY channel
    """,
)
def q_attribution_u_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: for each
    converting user, pre-conversion touches get 40% first / 40% last /
    20% split across the middle (collapsing correctly for 1- and
    2-touch paths) — completing the attribution family next to
    last-touch, time-decay, Shapley, and Markov removal.  One
    conversion-time broadcastable aggregate + one per-user rank
    window; credits are exact rational weights so both engines agree
    bit-for-bit."""
    c = F.col
    t = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    conv = (
        t.filter(c("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("conv_us"))
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    touches = (
        t.join(conv, "user_id")
        .filter((c("ts_us") < c("conv_us")) & (c("event_type") != "purchase"))
        .select(c("event_type").alias("channel"), "user_id", "ts_us", "event_id")
        .withColumn("r", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
    )
    credit = touches.select(
        "channel",
        F.when(c("n") == 1, 1.0)
        .when(c("n") == 2, 0.5)
        .when((c("r") == 1) | (c("r") == c("n")), 0.4)
        .otherwise(0.2 / (c("n") - 2))
        .alias("w"),
    )
    wall = Window.partitionBy()
    return (
        credit.groupBy("channel")
        .agg(
            F.sum("w").alias("sw"),
            F.count(F.lit(1)).cast("long").alias("n_touches"),
        )
        .select(
            "channel",
            F.round("sw", 4).alias("credit"),
            "n_touches",
            F.round(c("sw") / F.sum("sw").over(wall), 6).alias(
                "credit_share"
            ),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Round-7 twenty-fifth wave: competing-risks cumulative incidence +
# net revenue retention.
# ---------------------------------------------------------------------------


@register(
    "cumulative_incidence_competing",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MIN(epoch_us(ts)) AS first_us,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS p_us,
               MIN(CASE WHEN event_type = 'error'
                        THEN epoch_us(ts) END) AS e_us
        FROM events GROUP BY user_id
    ),
    win AS (SELECT MAX(epoch_us(ts)) AS end_us FROM events),
    subj AS (
        SELECT CASE
                 WHEN p_us IS NOT NULL AND (e_us IS NULL OR p_us <= e_us)
                   THEN 'purchase'
                 WHEN e_us IS NOT NULL THEN 'error'
                 ELSE 'censored' END AS outcome,
               CAST((COALESCE(LEAST(p_us, e_us), p_us, e_us, end_us)
                     - first_us) // 86400000000 AS BIGINT) AS t_day
        FROM u CROSS JOIN win
    ),
    days AS (SELECT DISTINCT t_day FROM subj
             WHERE outcome <> 'censored'),
    lt AS (
        SELECT d.t_day,
               SUM(CASE WHEN s.t_day >= d.t_day THEN 1 ELSE 0 END) AS n,
               SUM(CASE WHEN s.t_day = d.t_day AND s.outcome = 'purchase'
                        THEN 1 ELSE 0 END) AS dp,
               SUM(CASE WHEN s.t_day = d.t_day AND s.outcome = 'error'
                        THEN 1 ELSE 0 END) AS de
        FROM days d CROSS JOIN subj s GROUP BY d.t_day
    ),
    surv AS (
        SELECT *,
               COALESCE(exp(SUM(ln(1.0 - (dp + de) * 1.0 / n)) OVER (
                   ORDER BY t_day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), 1.0)
                   AS s_minus
        FROM lt WHERE (dp + de) * 1.0 / n < 1.0
    )
    SELECT t_day,
           CAST(n AS BIGINT) AS n_risk,
           CAST(dp AS BIGINT) AS d_purchase,
           CAST(de AS BIGINT) AS d_error,
           ROUND(s_minus * (1.0 - (dp + de) * 1.0 / n), 6) AS surv,
           ROUND(SUM(s_minus * dp / n) OVER (
               ORDER BY t_day ROWS UNBOUNDED PRECEDING), 6)
               AS cif_purchase,
           ROUND(SUM(s_minus * de / n) OVER (
               ORDER BY t_day ROWS UNBOUNDED PRECEDING), 6) AS cif_error
    FROM surv ORDER BY t_day
    """,
)
def q_cumulative_incidence_competing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen-Johansen cumulative incidence under competing risks: each
    user's FIRST purchase and FIRST error race (earlier one wins, ties
    to purchase), censoring at the window end; per event-day the risk
    set, cause-specific events, overall survival (product-limit via
    exp-Σln with the all-events-day guard), and both CIFs Σ S(t−)·d_k/n
    — the estimator naive 1−KM gets WRONG under competing risks.  The
    per-user reduction is distributed; the life table and all its
    windows live on the bounded event-day frame."""
    c = F.col
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.expr("ts_ns div 1000")).alias("first_us"),
        F.min(
            F.when(c("event_type") == "purchase", F.expr("ts_ns div 1000"))
        ).alias("p_us"),
        F.min(
            F.when(c("event_type") == "error", F.expr("ts_ns div 1000"))
        ).alias("e_us"),
    )
    win = ev.agg(F.max(F.expr("ts_ns div 1000")).alias("end_us"))
    subj = u.crossJoin(F.broadcast(win)).select(
        F.when(
            c("p_us").isNotNull()
            & (c("e_us").isNull() | (c("p_us") <= c("e_us"))),
            "purchase",
        )
        .when(c("e_us").isNotNull(), "error")
        .otherwise("censored")
        .alias("outcome"),
        (
            (
                F.coalesce(
                    F.least("p_us", "e_us"), c("p_us"), c("e_us"),
                    c("end_us"),
                )
                - c("first_us")
            )
            / 86_400_000_000
        )
        .cast("long")
        .alias("t_day"),
    )
    days = (
        subj.filter(c("outcome") != "censored")
        .select(c("t_day").alias("d_day"))
        .distinct()
    )
    lt = (
        subj.crossJoin(F.broadcast(days))
        .groupBy("d_day")
        .agg(
            F.sum((c("t_day") >= c("d_day")).cast("int")).alias("n"),
            F.sum(
                (
                    (c("t_day") == c("d_day"))
                    & (c("outcome") == "purchase")
                ).cast("int")
            ).alias("dp"),
            F.sum(
                ((c("t_day") == c("d_day")) & (c("outcome") == "error")).cast(
                    "int"
                )
            ).alias("de"),
        )
        .filter((c("dp") + c("de")) * 1.0 / c("n") < 1.0)
    )
    wprev = Window.partitionBy().orderBy("d_day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wcur = Window.partitionBy().orderBy("d_day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    surv = lt.withColumn(
        "s_minus",
        F.coalesce(
            F.exp(
                F.sum(
                    F.log(1.0 - (c("dp") + c("de")) * 1.0 / c("n"))
                ).over(wprev)
            ),
            F.lit(1.0),
        ),
    )
    return surv.select(
        c("d_day").alias("t_day"),
        c("n").cast("long").alias("n_risk"),
        c("dp").cast("long").alias("d_purchase"),
        c("de").cast("long").alias("d_error"),
        F.round(
            c("s_minus") * (1.0 - (c("dp") + c("de")) * 1.0 / c("n")), 6
        ).alias("surv"),
        F.round(
            F.sum(c("s_minus") * c("dp") / c("n")).over(wcur), 6
        ).alias("cif_purchase"),
        F.round(
            F.sum(c("s_minus") * c("de") / c("n")).over(wcur), 6
        ).alias("cif_error"),
    ).orderBy("t_day")


@register(
    "net_revenue_retention_monthly",
    oracle="""
    WITH m AS (
        SELECT o_custkey AS cust, date_trunc('month', o_orderdate) AS mon,
               SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1, 2
    ),
    j AS (
        SELECT cur.mon,
               SUM(cur.rev) AS retained_rev,
               COUNT(*) AS n_retained_custs
        FROM m cur JOIN m prev
          ON prev.cust = cur.cust
         AND prev.mon = cur.mon - INTERVAL 1 MONTH
        GROUP BY cur.mon
    ),
    p AS (
        SELECT mon + INTERVAL 1 MONTH AS mon, SUM(rev) AS prior_rev,
               COUNT(*) AS n_prior_custs
        FROM m GROUP BY 1
    )
    SELECT CAST(date_diff('month', DATE '1970-01-01', p.mon) AS BIGINT)
               AS epoch_month,
           CAST(p.n_prior_custs AS BIGINT) AS n_prior_custs,
           CAST(COALESCE(j.n_retained_custs, 0) AS BIGINT)
               AS n_retained_custs,
           ROUND(p.prior_rev, 2) AS prior_rev,
           ROUND(COALESCE(j.retained_rev, 0), 2) AS retained_rev,
           ROUND(COALESCE(j.retained_rev, 0) / p.prior_rev, 6) AS nrr
    FROM p LEFT JOIN j ON j.mon = p.mon
    ORDER BY epoch_month
    """,
)
def q_net_revenue_retention_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly net revenue retention: this month's order revenue from
    customers who ALSO bought last month, over last month's total —
    the SaaS-board NRR metric on the order ledger.  Two aggregates of
    the same (customer, month) frame joined on (customer, month−1);
    the monthly frame is catalog×months bounded."""
    c = F.col
    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    cur = m.select("cust", "mon", c("rev").alias("rev1"))
    prev = m.select(
        "cust", F.add_months("mon", 1).alias("mon"), c("rev").alias("rev0")
    )
    j = (
        cur.join(prev, ["cust", "mon"])
        .groupBy("mon")
        .agg(
            F.sum("rev1").alias("retained_rev"),
            F.count(F.lit(1)).alias("n_retained_custs"),
        )
    )
    p = (
        m.select(F.add_months("mon", 1).alias("mon"), "rev")
        .groupBy("mon")
        .agg(
            F.sum("rev").alias("prior_rev"),
            F.count(F.lit(1)).alias("n_prior_custs"),
        )
    )
    return (
        p.join(j, "mon", "left")
        .select(
            (
                (F.year("mon") - 1970) * 12 + F.month("mon") - 1
            ).cast("long").alias("epoch_month"),
            c("n_prior_custs").cast("long").alias("n_prior_custs"),
            F.coalesce("n_retained_custs", F.lit(0)).cast("long").alias(
                "n_retained_custs"
            ),
            F.round("prior_rev", 2).alias("prior_rev"),
            F.round(F.coalesce("retained_rev", F.lit(0.0)), 2).alias(
                "retained_rev"
            ),
            F.round(
                F.coalesce("retained_rev", F.lit(0.0)) / c("prior_rev"), 6
            ).alias("nrr"),
        )
        .orderBy("epoch_month")
    )


# ---------------------------------------------------------------------------
# Round-7 twenty-sixth wave: empirical-Bayes shrinkage + shift-share
# decomposition.
# ---------------------------------------------------------------------------


@register(
    "empirical_bayes_shrinkage",
    oracle="""
    WITH per AS (
        SELECT user_id, COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS k
        FROM events GROUP BY user_id HAVING COUNT(*) >= 10
    ),
    mom AS (
        SELECT AVG(k * 1.0 / n) AS m,
               var_samp(k * 1.0 / n) AS v
        FROM per
    ),
    ab AS (
        SELECT m, v,
               m * (m * (1 - m) / v - 1) AS alpha,
               (1 - m) * (m * (1 - m) / v - 1) AS beta
        FROM mom
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_events,
           CAST(k AS BIGINT) AS n_purchases,
           ROUND(k * 1.0 / n, 6) AS raw_rate,
           ROUND((k + alpha) / (n + alpha + beta), 6) AS shrunk_rate,
           ROUND(ABS(k * 1.0 / n - (k + alpha) / (n + alpha + beta)), 6)
               AS shrinkage,
           ROUND(alpha, 6) AS alpha,
           ROUND(beta, 6) AS beta
    FROM per CROSS JOIN ab
    ORDER BY shrinkage DESC, user_id LIMIT 20
    """,
)
def q_empirical_bayes_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of per-user purchase
    rates: method-of-moments α/β from the cross-user rate distribution
    (users with ≥10 events), posterior-mean rates (k+α)/(n+α+β), and
    the 20 most-shrunk users — the James-Stein-style stabilizer every
    per-entity rate dashboard needs before ranking small samples.  One
    grouped pass + a broadcast 1-row prior."""
    c = F.col
    per = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (c("event_type") == "purchase").cast("int")
            ).alias("k"),
        )
        .filter(c("n") >= 10)
    )
    mom = per.agg(
        F.avg(c("k") * 1.0 / c("n")).alias("m"),
        F.var_samp(c("k") * 1.0 / c("n")).alias("v"),
    )
    ab = mom.select(
        (c("m") * (c("m") * (1 - c("m")) / c("v") - 1)).alias("alpha"),
        ((1 - c("m")) * (c("m") * (1 - c("m")) / c("v") - 1)).alias("beta"),
    )
    shrunk = (c("k") + c("alpha")) / (c("n") + c("alpha") + c("beta"))
    return (
        per.crossJoin(F.broadcast(ab))
        .select(
            "user_id",
            c("n").cast("long").alias("n_events"),
            c("k").cast("long").alias("n_purchases"),
            F.round(c("k") * 1.0 / c("n"), 6).alias("raw_rate"),
            F.round(shrunk, 6).alias("shrunk_rate"),
            F.round(F.abs(c("k") * 1.0 / c("n") - shrunk), 6).alias(
                "shrinkage"
            ),
            F.round("alpha", 6).alias("alpha"),
            F.round("beta", 6).alias("beta"),
        )
        .orderBy(F.desc("shrinkage"), "user_id")
        .limit(20)
    )


@register(
    "shift_share_decomposition",
    oracle="""
    WITH med AS (
        SELECT quantile_cont(epoch_us(ts), 0.5) AS cut FROM events
    ),
    per AS (
        SELECT event_type,
               CASE WHEN epoch_us(ts) <= cut THEN 1 ELSE 2 END AS half,
               COUNT(*) AS n,
               SUM(COALESCE(value, 0)) AS rev
        FROM events CROSS JOIN med
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT event_type,
               MAX(CASE WHEN half = 1 THEN n ELSE 0 END) AS n1,
               MAX(CASE WHEN half = 1 THEN rev ELSE 0 END) AS r1,
               MAX(CASE WHEN half = 2 THEN n ELSE 0 END) AS n2,
               MAX(CASE WHEN half = 2 THEN rev ELSE 0 END) AS r2
        FROM per GROUP BY event_type
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n_first,
           CAST(n2 AS BIGINT) AS n_second,
           ROUND(r2 - r1, 4) AS total_change,
           ROUND((n2 - n1) * (r1 / n1), 4) AS volume_effect,
           ROUND(n1 * (r2 / n2 - r1 / n1), 4) AS rate_effect,
           ROUND((n2 - n1) * (r2 / n2 - r1 / n1), 4) AS interaction,
           ROUND(SUM(r2 - r1) OVER (), 4) AS total_change_all
    FROM wide ORDER BY event_type
    """,
)
def q_shift_share_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition of the value change between the first
    and second half of the window (cut at the MEASURED median
    timestamp): per event type, Δrev splits exactly into volume effect
    (Δn·rate₁), rate effect (n₁·Δrate), and interaction — the
    mix-vs-performance question behind every 'why did revenue move'
    review, and the identity volume+rate+interaction ≡ Δ is checkable
    per row.  One grouped pass, 5-row pivot, bounded total window."""
    c = F.col
    ev = load_table(spark, sf_dir, "events")
    med = ev.agg(
        F.percentile(F.expr("ts_ns div 1000"), 0.5).alias("cut")
    )
    per = (
        ev.crossJoin(F.broadcast(med))
        .select(
            "event_type",
            F.when(F.expr("ts_ns div 1000") <= c("cut"), 1)
            .otherwise(2)
            .alias("half"),
            F.coalesce("value", F.lit(0.0)).alias("v"),
        )
        .groupBy("event_type", "half")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("rev"))
    )
    wide = per.groupBy("event_type").agg(
        F.max(F.when(c("half") == 1, c("n")).otherwise(0)).alias("n1"),
        F.max(F.when(c("half") == 1, c("rev")).otherwise(0.0)).alias("r1"),
        F.max(F.when(c("half") == 2, c("n")).otherwise(0)).alias("n2"),
        F.max(F.when(c("half") == 2, c("rev")).otherwise(0.0)).alias("r2"),
    )
    wall = Window.partitionBy()
    return wide.select(
        "event_type",
        c("n1").cast("long").alias("n_first"),
        c("n2").cast("long").alias("n_second"),
        F.round(c("r2") - c("r1"), 4).alias("total_change"),
        F.round((c("n2") - c("n1")) * (c("r1") / c("n1")), 4).alias(
            "volume_effect"
        ),
        F.round(
            c("n1") * (c("r2") / c("n2") - c("r1") / c("n1")), 4
        ).alias("rate_effect"),
        F.round(
            (c("n2") - c("n1")) * (c("r2") / c("n2") - c("r1") / c("n1")),
            4,
        ).alias("interaction"),
        F.round(F.sum(c("r2") - c("r1")).over(wall), 4).alias(
            "total_change_all"
        ),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Round-7 twenty-seventh wave: extreme-value tail fitting + survey
# design.
# ---------------------------------------------------------------------------


@register(
    "gpd_tail_fit_pwm",
    oracle="""
    WITH thr AS (
        SELECT quantile_cont(value, 0.95) AS u
        FROM events WHERE value IS NOT NULL
    ),
    exc AS (
        SELECT value - u AS x,
               ROW_NUMBER() OVER (ORDER BY value - u, event_id) AS i,
               COUNT(*) OVER () AS n
        FROM events CROSS JOIN thr
        WHERE value IS NOT NULL AND value > u
    ),
    pwm AS (
        SELECT MAX(u) AS u, MAX(n) AS n,
               AVG(x) AS a0,
               SUM((n - i) * 1.0 / (n - 1.0) * x) / MAX(n) AS a1
        FROM exc CROSS JOIN thr
    ),
    fit AS (
        SELECT u, n, a0, a1,
               -(a0 / (a0 - 2.0 * a1) - 2.0) AS xi,
               2.0 * a0 * a1 / (a0 - 2.0 * a1) AS sigma
        FROM pwm
    )
    SELECT ROUND(u, 6) AS threshold,
           CAST(n AS BIGINT) AS n_exceedances,
           ROUND(a0, 6) AS pwm_a0,
           ROUND(a1, 6) AS pwm_a1,
           ROUND(xi, 6) AS gpd_shape,
           ROUND(sigma, 6) AS gpd_scale,
           ROUND(u + sigma / xi * (POWER(0.05 / 0.001, xi) - 1.0), 4)
               AS q999_estimate
    FROM fit
    """,
)
def q_gpd_tail_fit_pwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value tail fit: generalized Pareto over the exceedances
    above the MEASURED p95 (peaks-over-threshold), shape/scale by
    probability-weighted moments (Hosking-Wallis α-moments: with
    a1 = E[X(1−F)], κ = a0/(a0−2a1) − 2, ξ = −κ, σ = 2·a0·a1/(a0−2a1)
    — uniform exceedances recover ξ = −1 exactly), plus the implied p99.9 quantile — the EVT
    machinery behind fraud-loss tail risk.  b1 needs the exceedance
    ORDER STATISTICS, so the rank comes from dense_global_index
    (operators/indexing.py) — the two-phase range-partitioned index,
    not a single-task window; everything else is one aggregate.
    Equal-value ties cannot perturb b1 (their weights swap under equal
    x), so the (x, event_id) order is engine-stable."""
    from .operators.indexing import dense_global_index

    c = F.col
    base = load_table(spark, sf_dir, "events").filter(
        c("value").isNotNull()
    )
    thr = base.agg(F.percentile("value", 0.95).alias("u"))
    exc = (
        base.crossJoin(F.broadcast(thr))
        .filter(c("value") > c("u"))
        .select((c("value") - c("u")).alias("x"), "event_id", "u")
    )
    idx = dense_global_index(exc, ["x", "event_id"], "i0")
    n_ = idx.agg(F.count(F.lit(1)).alias("n"))
    pwm = (
        idx.crossJoin(F.broadcast(n_))
        .agg(
            F.max("u").alias("u"),
            F.max("n").alias("n"),
            F.avg("x").alias("a0"),
            # α₁ = E[X(1−F)]: ascending 0-based rank i0 → weight
            # (n−1−i0)/(n−1), matching the oracle's (n−i)/(n−1) 1-based
            (
                F.sum(
                    (c("n") - 1.0 - c("i0")).cast("double")
                    / (c("n") - 1.0)
                    * c("x")
                )
                / F.max("n")
            ).alias("a1"),
        )
    )
    xi = -(c("a0") / (c("a0") - 2.0 * c("a1")) - 2.0)
    sigma = 2.0 * c("a0") * c("a1") / (c("a0") - 2.0 * c("a1"))
    return pwm.select(
        F.round("u", 6).alias("threshold"),
        c("n").cast("long").alias("n_exceedances"),
        F.round("a0", 6).alias("pwm_a0"),
        F.round("a1", 6).alias("pwm_a1"),
        F.round(xi, 6).alias("gpd_shape"),
        F.round(sigma, 6).alias("gpd_scale"),
        F.round(
            c("u")
            + sigma / xi * (F.pow(F.lit(0.05 / 0.001), xi) - 1.0),
            4,
        ).alias("q999_estimate"),
    )


@register(
    "neyman_allocation_plan",
    oracle="""
    WITH g AS (
        SELECT event_type, COUNT(*) AS nh, stddev_samp(value) AS sh
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    tot AS (
        SELECT SUM(nh) AS nn, SUM(nh * sh) AS sum_ns FROM g
    )
    SELECT event_type,
           CAST(nh AS BIGINT) AS stratum_size,
           ROUND(sh, 6) AS stratum_sd,
           ROUND(nh * 1000.0 / nn, 4) AS proportional_n,
           ROUND(nh * sh * 1000.0 / sum_ns, 4) AS neyman_n,
           ROUND(nh * sh * 1000.0 / sum_ns - nh * 1000.0 / nn, 4)
               AS reallocation,
           ROUND(POWER(sum_ns / nn, 2) / 1000.0, 6) AS neyman_variance,
           ROUND(SUM(nh * sh * sh) OVER () / nn / 1000.0, 6)
               AS proportional_variance
    FROM g CROSS JOIN tot ORDER BY event_type
    """,
)
def q_neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling plan for a 1000-row budget
    over event types: allocation n_h ∝ N_h·S_h from measured stratum
    sizes and standard deviations, side-by-side with proportional
    allocation and both designs' estimator variances (Neyman's
    (ΣW_h S_h)²/n vs proportional's ΣW_h S_h²/n) — the design step
    upstream of the stratified samplers already in the corpus.  One
    grouped pass; all windows over the 5-row stratum frame."""
    c = F.col
    g = (
        load_table(spark, sf_dir, "events")
        .filter(c("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("nh"),
            F.stddev_samp("value").alias("sh"),
        )
    )
    tot = g.agg(
        F.sum("nh").alias("nn"), F.sum(c("nh") * c("sh")).alias("sum_ns")
    )
    wall = Window.partitionBy()
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            c("nh").cast("long").alias("stratum_size"),
            F.round("sh", 6).alias("stratum_sd"),
            F.round(c("nh") * 1000.0 / c("nn"), 4).alias("proportional_n"),
            F.round(c("nh") * c("sh") * 1000.0 / c("sum_ns"), 4).alias(
                "neyman_n"
            ),
            F.round(
                c("nh") * c("sh") * 1000.0 / c("sum_ns")
                - c("nh") * 1000.0 / c("nn"),
                4,
            ).alias("reallocation"),
            F.round(F.pow(c("sum_ns") / c("nn"), 2) / 1000.0, 6).alias(
                "neyman_variance"
            ),
            F.round(
                F.sum(c("nh") * c("sh") * c("sh")).over(wall)
                / c("nn")
                / 1000.0,
                6,
            ).alias("proportional_variance"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round-7 twenty-eighth wave: beyond-accuracy recommender metrics.
# ---------------------------------------------------------------------------


@register(
    "recsys_beyond_accuracy",
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem
    ),
    co AS (
        SELECT a.pk AS src, b.pk AS rec, COUNT(*) AS w
        FROM op a JOIN op b ON a.okey = b.okey AND a.pk <> b.pk
        GROUP BY 1, 2
    ),
    pop AS (
        SELECT pk, COUNT(*) AS n_orders FROM op GROUP BY pk
    ),
    catalog AS (SELECT COUNT(*) AS n_cat FROM part),
    topk AS (
        SELECT src, rec, w
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY src ORDER BY w DESC, rec) AS r FROM co)
        WHERE r <= 3
    ),
    novelty AS (
        SELECT topk.src, topk.rec,
               -log2(pop.n_orders * 1.0
                     / (SELECT COUNT(DISTINCT okey) FROM op)) AS nov
        FROM topk JOIN pop ON pop.pk = topk.rec
    ),
    ild AS (
        SELECT n.src,
               AVG(CASE WHEN pa.p_brand = pb.p_brand
                        THEN 1.0 ELSE 0 END) AS same_brand
        FROM topk a JOIN topk b
          ON a.src = b.src AND a.rec < b.rec
        JOIN part pa ON pa.p_partkey = a.rec
        JOIN part pb ON pb.p_partkey = b.rec
        JOIN (SELECT DISTINCT src FROM topk) n ON n.src = a.src
        GROUP BY n.src
    )
    SELECT CAST((SELECT COUNT(DISTINCT src) FROM topk) AS BIGINT)
               AS n_parts_with_recs,
           CAST((SELECT COUNT(DISTINCT rec) FROM topk) AS BIGINT)
               AS n_distinct_recommended,
           ROUND((SELECT COUNT(DISTINCT rec) FROM topk) * 1.0
                 / (SELECT n_cat FROM catalog), 6) AS catalog_coverage,
           ROUND((SELECT AVG(nov) FROM novelty), 6) AS mean_novelty_bits,
           ROUND((SELECT AVG(same_brand) FROM ild), 6)
               AS mean_intra_list_same_brand
    """,
)
def q_recsys_beyond_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-accuracy evaluation of the co-purchase top-3 recommender:
    catalog coverage (share of parts that ever appear in a rec list),
    mean novelty −log₂(popularity) of recommended items, and intra-list
    redundancy (same-brand share among the ≤3 pairwise combinations per
    list) — the coverage/diversity/novelty triple that accuracy-only
    metrics like NDCG (already in the corpus) miss.  Candidate pairs
    exist only within orders; rec lists are 3-row partitioned top-k;
    ILD pairs are ≤3 per source."""
    c = F.col
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a = op.select("okey", c("pk").alias("src"))
    b = op.select("okey", c("pk").alias("rec"))
    co = (
        a.join(b, "okey")
        .filter(c("src") != c("rec"))
        .groupBy("src", "rec")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wsrc = Window.partitionBy("src").orderBy(F.desc("w"), "rec")
    topk = (
        co.withColumn("r", F.row_number().over(wsrc))
        .filter(c("r") <= 3)
        .select("src", "rec", "w")
    )
    pop = op.groupBy("pk").agg(F.count(F.lit(1)).alias("n_orders"))
    n_orders_tot = op.agg(
        F.countDistinct("okey").alias("n_ord")
    )
    ncat = load_table(spark, sf_dir, "part").agg(
        F.count(F.lit(1)).alias("n_cat")
    )
    nov = (
        topk.join(pop, topk["rec"] == pop["pk"])
        .crossJoin(F.broadcast(n_orders_tot))
        .agg(
            F.avg(
                -F.log2(c("n_orders") * 1.0 / c("n_ord"))
            ).alias("mean_nov")
        )
    )
    brand = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    ta = topk.select("src", c("rec").alias("ra"))
    tb = topk.select(c("src").alias("src_b"), c("rec").alias("rb"))
    ild = (
        ta.join(tb, (c("src") == c("src_b")) & (c("ra") < c("rb")))
        .join(
            F.broadcast(brand.select(c("p_partkey").alias("ra"), c("p_brand").alias("ba"))),
            "ra",
        )
        .join(
            F.broadcast(brand.select(c("p_partkey").alias("rb"), c("p_brand").alias("bb"))),
            "rb",
        )
        .groupBy("src")
        .agg(
            F.avg((c("ba") == c("bb")).cast("double")).alias("same_brand")
        )
        .agg(F.avg("same_brand").alias("mean_ild"))
    )
    stats = topk.agg(
        F.countDistinct("src").alias("n_src"),
        F.countDistinct("rec").alias("n_rec"),
    )
    return (
        stats.crossJoin(F.broadcast(ncat))
        .crossJoin(F.broadcast(nov))
        .crossJoin(F.broadcast(ild))
        .select(
            c("n_src").cast("long").alias("n_parts_with_recs"),
            c("n_rec").cast("long").alias("n_distinct_recommended"),
            F.round(c("n_rec") * 1.0 / c("n_cat"), 6).alias(
                "catalog_coverage"
            ),
            F.round("mean_nov", 6).alias("mean_novelty_bits"),
            F.round("mean_ild", 6).alias("mean_intra_list_same_brand"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 twenty-ninth wave: interval forecasting calibration + the
# attributes control chart.
# ---------------------------------------------------------------------------


@register(
    "forecast_pi_coverage",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day, SUM(o_totalprice) AS y
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT ROW_NUMBER() OVER (ORDER BY day) AS i,
               COUNT(*) OVER () AS n, day, y
        FROM daily
    ),
    fc AS (
        SELECT a.i, a.n, a.y, b.y AS yhat,
               CAST(FLOOR(a.n * 0.8) AS BIGINT) AS cut
        FROM idx a JOIN idx b ON b.i = a.i - 7
    ),
    resid AS (
        SELECT quantile_cont(y - yhat, 0.1) AS lo,
               quantile_cont(y - yhat, 0.9) AS hi
        FROM fc WHERE i <= cut
    ),
    test AS (
        SELECT fc.y, fc.yhat, resid.lo, resid.hi
        FROM fc CROSS JOIN resid WHERE fc.i > fc.cut
    )
    SELECT CAST((SELECT COUNT(*) FROM fc WHERE i <= cut) AS BIGINT)
               AS n_train,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(MAX(lo), 4) AS pi_lo_offset,
           ROUND(MAX(hi), 4) AS pi_hi_offset,
           ROUND(AVG(CASE WHEN y BETWEEN yhat + lo AND yhat + hi
                          THEN 1.0 ELSE 0 END), 6) AS empirical_coverage,
           ROUND(MAX(hi) - MAX(lo), 4) AS interval_width
    FROM test
    """,
)
def q_forecast_pi_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prediction-interval calibration for the seasonal-naive (lag-7)
    daily-revenue forecast: 80% intervals from the TRAIN residual
    quantiles (first 80% of days), then the empirical coverage on the
    held-out tail — the 'are my intervals honest' check that point
    backtests (seasonal_naive_backtest, holt, smape_mase) never ask.
    All windows and the lag join live on the calendar-bounded daily
    frame; nominal 80% vs empirical coverage is the deliverable."""
    c = F.col
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    wd = Window.partitionBy().orderBy("day")
    idx = daily.select(
        F.row_number().over(wd).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        "y",
    )
    a = idx.select("i", "n", "y")
    b = idx.select((c("i") + 7).alias("i"), c("y").alias("yhat"))
    fc = a.join(b, "i").withColumn(
        "cut", F.floor(c("n") * 0.8).cast("long")
    )
    resid = fc.filter(c("i") <= c("cut")).agg(
        F.percentile(c("y") - c("yhat"), 0.1).alias("lo"),
        F.percentile(c("y") - c("yhat"), 0.9).alias("hi"),
    )
    ntr = fc.filter(c("i") <= c("cut")).agg(
        F.count(F.lit(1)).cast("long").alias("n_train")
    )
    test = fc.filter(c("i") > c("cut")).crossJoin(F.broadcast(resid))
    return (
        test.agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.round(F.max("lo"), 4).alias("pi_lo_offset"),
            F.round(F.max("hi"), 4).alias("pi_hi_offset"),
            F.round(
                F.avg(
                    (
                        (c("y") >= c("yhat") + c("lo"))
                        & (c("y") <= c("yhat") + c("hi"))
                    ).cast("double")
                ),
                6,
            ).alias("empirical_coverage"),
            F.round(F.max("hi") - F.max("lo"), 4).alias("interval_width"),
        )
        .crossJoin(F.broadcast(ntr))
        .select(
            "n_train", "n_test", "pi_lo_offset", "pi_hi_offset",
            "empirical_coverage", "interval_width",
        )
    )


@register(
    "p_chart_daily_purchase",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS x
        FROM events GROUP BY 1
    ),
    pbar AS (SELECT SUM(x) * 1.0 / SUM(n) AS p FROM daily)
    SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS epoch_day,
           CAST(n AS BIGINT) AS n_events,
           CAST(x AS BIGINT) AS n_purchases,
           ROUND(x * 1.0 / n, 6) AS p_hat,
           ROUND(p, 6) AS p_bar,
           ROUND(p - 3 * sqrt(p * (1 - p) / n), 6) AS lcl,
           ROUND(p + 3 * sqrt(p * (1 - p) / n), 6) AS ucl,
           x * 1.0 / n < p - 3 * sqrt(p * (1 - p) / n)
             OR x * 1.0 / n > p + 3 * sqrt(p * (1 - p) / n)
               AS out_of_control
    FROM daily CROSS JOIN pbar ORDER BY epoch_day
    """,
)
def q_p_chart_daily_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attributes control chart (p-chart) for the daily purchase
    proportion: centre line p̄ pooled over the window, per-day 3σ
    binomial limits p̄ ± 3√(p̄(1−p̄)/nᵢ) (variable width — each day has
    its own sample size), and the out-of-control flag — the
    proportions counterpart to the EWMA/CUSUM variables charts already
    in the corpus.  One grouped pass + a broadcast scalar; all exact
    counts, so both engines agree bit-for-bit."""
    c = F.col
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (c("event_type") == "purchase").cast("int")
            ).alias("x"),
        )
    )
    pbar = daily.agg(
        (F.sum("x") * 1.0 / F.sum("n")).alias("p")
    )
    lim = 3 * F.sqrt(c("p") * (1 - c("p")) / c("n"))
    return (
        daily.crossJoin(F.broadcast(pbar))
        .select(
            F.datediff("day", F.lit("1970-01-01")).cast("long").alias(
                "epoch_day"
            ),
            c("n").cast("long").alias("n_events"),
            c("x").cast("long").alias("n_purchases"),
            F.round(c("x") * 1.0 / c("n"), 6).alias("p_hat"),
            F.round("p", 6).alias("p_bar"),
            F.round(c("p") - lim, 6).alias("lcl"),
            F.round(c("p") + lim, 6).alias("ucl"),
            (
                (c("x") * 1.0 / c("n") < c("p") - lim)
                | (c("x") * 1.0 / c("n") > c("p") + lim)
            ).alias("out_of_control"),
        )
        .orderBy("epoch_day")
    )


# ---------------------------------------------------------------------------
# Round-7 thirtieth wave: partial correlation + autocorrelation on a
# graph (Moran's I on the hour ring).
# ---------------------------------------------------------------------------


@register(
    "partial_correlation_panel",
    oracle="""
    WITH f AS (
        SELECT value AS x,
               hour(ts) * 1.0 AS h,
               (isodow(ts) - 1) * 1.0 AS d
        FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT corr(x, h) AS r_xh, corr(x, d) AS r_xd,
               corr(h, d) AS r_hd, COUNT(*) AS n
        FROM f
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(r_xh, 6) AS corr_value_hour,
           ROUND(r_xd, 6) AS corr_value_weekday,
           ROUND(r_hd, 6) AS corr_hour_weekday,
           ROUND((r_xh - r_xd * r_hd)
                 / sqrt((1 - r_xd * r_xd) * (1 - r_hd * r_hd)), 6)
               AS partial_value_hour_given_weekday,
           ROUND((r_xd - r_xh * r_hd)
                 / sqrt((1 - r_xh * r_xh) * (1 - r_hd * r_hd)), 6)
               AS partial_value_weekday_given_hour
    FROM r
    """,
)
def q_partial_correlation_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlations: value↔hour controlling for weekday and
    value↔weekday controlling for hour, via the three pairwise Pearson
    correlations and the first-order recursion r_xy.z = (r_xy −
    r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) — separates a direct association
    from one merely routed through the confounder.  One aggregate
    pass; corr() is the same ddof convention in both engines."""
    c = F.col
    f = (
        load_table(spark, sf_dir, "events")
        .filter(c("value").isNotNull())
        .select(
            c("value").alias("x"),
            F.hour("ts").cast("double").alias("h"),
            F.weekday("ts").cast("double").alias("d"),
        )
    )
    r = f.agg(
        F.corr("x", "h").alias("r_xh"),
        F.corr("x", "d").alias("r_xd"),
        F.corr("h", "d").alias("r_hd"),
        F.count(F.lit(1)).alias("n"),
    )
    return r.select(
        c("n").cast("long").alias("n"),
        F.round("r_xh", 6).alias("corr_value_hour"),
        F.round("r_xd", 6).alias("corr_value_weekday"),
        F.round("r_hd", 6).alias("corr_hour_weekday"),
        F.round(
            (c("r_xh") - c("r_xd") * c("r_hd"))
            / F.sqrt(
                (1 - c("r_xd") * c("r_xd")) * (1 - c("r_hd") * c("r_hd"))
            ),
            6,
        ).alias("partial_value_hour_given_weekday"),
        F.round(
            (c("r_xd") - c("r_xh") * c("r_hd"))
            / F.sqrt(
                (1 - c("r_xh") * c("r_xh")) * (1 - c("r_hd") * c("r_hd"))
            ),
            6,
        ).alias("partial_value_weekday_given_hour"),
    )


@register(
    "morans_i_hour_ring",
    oracle="""
    WITH h AS (
        SELECT CAST(hour(ts) AS BIGINT) AS hr,
               AVG(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0 END)
                   AS rate
        FROM events GROUP BY 1
    ),
    m AS (SELECT AVG(rate) AS mu, COUNT(*) AS n FROM h),
    dev AS (
        SELECT hr, rate - mu AS z FROM h CROSS JOIN m
    ),
    w AS (
        SELECT a.hr, a.z AS za, b.z AS zb
        FROM dev a JOIN dev b
          ON b.hr = (a.hr + 1) % 24 OR b.hr = (a.hr + 23) % 24
    ),
    s AS (
        SELECT SUM(za * zb) AS cross_sum, COUNT(*) AS n_links FROM w
    ),
    v AS (SELECT SUM(z * z) AS ss FROM dev)
    SELECT CAST(m.n AS BIGINT) AS n_hours,
           CAST(s.n_links AS BIGINT) AS n_links,
           ROUND(m.mu, 6) AS mean_rate,
           ROUND((m.n * 1.0 / s.n_links) * s.cross_sum / v.ss, 6)
               AS morans_i,
           ROUND(-1.0 / (m.n - 1), 6) AS expected_i_null
    FROM m CROSS JOIN s CROSS JOIN v
    """,
)
def q_morans_i_hour_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation of the purchase rate on the
    24-hour RING graph (each hour adjacent to its two neighbors, mod
    24): I = (n/ΣW)·Σwᵢⱼzᵢzⱼ/Σz² against the null expectation
    −1/(n−1) — do adjacent hours co-move?  The 'spatial' machinery on
    a temporal ring: one grouped pass to the 24-row frame, then a
    24×2-link join; the same pattern drops onto any region adjacency
    at scale."""
    c = F.col
    h = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.hour("ts").cast("long").alias("hr"))
        .agg(
            F.avg(
                (c("event_type") == "purchase").cast("double")
            ).alias("rate")
        )
    )
    m = h.agg(F.avg("rate").alias("mu"), F.count(F.lit(1)).alias("n"))
    dev = h.crossJoin(F.broadcast(m)).select(
        "hr", (c("rate") - c("mu")).alias("z")
    )
    a = dev.select(c("hr").alias("ha"), c("z").alias("za"))
    b = dev.select(c("hr").alias("hb"), c("z").alias("zb"))
    w = a.join(
        F.broadcast(b),
        (c("hb") == (c("ha") + 1) % 24) | (c("hb") == (c("ha") + 23) % 24),
    )
    s = w.agg(
        F.sum(c("za") * c("zb")).alias("cross_sum"),
        F.count(F.lit(1)).alias("n_links"),
    )
    v = dev.agg(F.sum(c("z") * c("z")).alias("ss"))
    return (
        m.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(v))
        .select(
            c("n").cast("long").alias("n_hours"),
            c("n_links").cast("long").alias("n_links"),
            F.round("mu", 6).alias("mean_rate"),
            F.round(
                (c("n") * 1.0 / c("n_links")) * c("cross_sum") / c("ss"), 6
            ).alias("morans_i"),
            F.round(-1.0 / (c("n") - 1), 6).alias("expected_i_null"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 thirty-first wave: survival discrimination (Harrell's C) +
# paired-comparison ranking (Bradley-Terry).
# ---------------------------------------------------------------------------


@register(
    "c_index_activity_ttp",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MIN(epoch_us(ts)) AS first_us,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS p_us,
               COUNT(*) AS activity
        FROM events GROUP BY user_id
    ),
    win AS (SELECT MAX(epoch_us(ts)) AS end_us FROM events),
    subj AS (
        SELECT user_id, activity AS score,
               CASE WHEN p_us IS NOT NULL THEN p_us - first_us
                    ELSE end_us - first_us END AS t,
               CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS obs,
               ROW_NUMBER() OVER (ORDER BY
                   (user_id * 1000003 + 7) % 999983 * 40503 % 999983,
                   user_id) AS r
        FROM u CROSS JOIN win
    ),
    s AS (SELECT * FROM subj WHERE r <= 400),
    pairs AS (
        SELECT a.score AS sa, b.score AS sb
        FROM s a JOIN s b
          ON a.t < b.t AND a.obs = 1 AND a.user_id <> b.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_sampled,
           CAST(COUNT(*) AS BIGINT) AS n_usable_pairs,
           CAST(SUM(CASE WHEN sa > sb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_concordant,
           CAST(SUM(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tied,
           ROUND((SUM(CASE WHEN sa > sb THEN 1.0 ELSE 0 END)
                  + 0.5 * SUM(CASE WHEN sa = sb THEN 1 ELSE 0 END))
                 / COUNT(*), 6) AS c_index
    FROM pairs
    """,
)
def q_c_index_activity_ttp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harrell's concordance index: does total activity predict a
    SHORTER time to first purchase?  Usable pairs are (earlier observed
    event, any later follow-up) per the standard right-censoring rule;
    concordant when the earlier converter has the HIGHER score, ties
    get half credit.  Pairs are bounded forever by a deterministic
    400-user affine-hash sample (the ml/split.py convention), so the
    quadratic never touches full cardinality."""
    c = F.col
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.expr("ts_ns div 1000")).alias("first_us"),
        F.min(
            F.when(c("event_type") == "purchase", F.expr("ts_ns div 1000"))
        ).alias("p_us"),
        F.count(F.lit(1)).alias("activity"),
    )
    win = ev.agg(F.max(F.expr("ts_ns div 1000")).alias("end_us"))
    subj = (
        u.crossJoin(F.broadcast(win))
        .select(
            "user_id",
            c("activity").alias("score"),
            F.when(
                c("p_us").isNotNull(), c("p_us") - c("first_us")
            )
            .otherwise(c("end_us") - c("first_us"))
            .alias("t"),
            c("p_us").isNotNull().cast("int").alias("obs"),
            (
                (c("user_id").cast("long") * 1000003 + 7)
                % 999983 * 40503 % 999983
            ).alias("h"),
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy().orderBy("h", "user_id")
            ),
        )
        .filter(c("r") <= 400)
    )
    s = subj.localCheckpoint(eager=True)
    a = s.select(
        c("user_id").alias("ua"), c("score").alias("sa"),
        c("t").alias("ta"), c("obs").alias("oa"),
    )
    b = s.select(
        c("user_id").alias("ub"), c("score").alias("sb"),
        c("t").alias("tb"),
    )
    pairs = a.join(
        b,
        (c("ta") < c("tb")) & (c("oa") == 1) & (c("ua") != c("ub")),
    )
    ns = s.agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    return (
        pairs.agg(
            F.count(F.lit(1)).cast("long").alias("n_usable_pairs"),
            F.sum((c("sa") > c("sb")).cast("int")).cast("long").alias(
                "n_concordant"
            ),
            F.sum((c("sa") == c("sb")).cast("int")).cast("long").alias(
                "n_tied"
            ),
            F.round(
                (
                    F.sum((c("sa") > c("sb")).cast("double"))
                    + 0.5 * F.sum((c("sa") == c("sb")).cast("int"))
                )
                / F.count(F.lit(1)),
                6,
            ).alias("c_index"),
        )
        .crossJoin(F.broadcast(ns))
        .select(
            "n_sampled", "n_usable_pairs", "n_concordant", "n_tied",
            "c_index",
        )
    )


def _bt_oracle(iters: int = 5) -> str:
    """Unrolled Bradley-Terry MM oracle: win counts from order-level
    brand revenue duels, then ``iters`` minorize-maximize updates
    p_i ← W_i / Σ_j n_ij/(p_i+p_j), mean-normalized each sweep."""
    head = """
    WITH obr AS MATERIALIZED (
        SELECT l.l_orderkey AS okey, p.p_brand AS brand,
               ROUND(SUM(l.l_extendedprice), 2) AS rev
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    duels AS MATERIALIZED (
        SELECT a.brand AS wb, b.brand AS lb
        FROM obr a JOIN obr b
          ON a.okey = b.okey AND a.brand <> b.brand AND a.rev > b.rev
    ),
    wins AS MATERIALIZED (
        SELECT wb AS a, lb AS b, COUNT(*) AS w FROM duels GROUP BY 1, 2
    ),
    nm AS MATERIALIZED (
        SELECT COALESCE(wa.a, wb.b) AS a, COALESCE(wa.b, wb.a) AS b,
               COALESCE(wa.w, 0) + COALESCE(wb.w, 0) AS n
        FROM wins wa FULL JOIN wins wb
          ON wb.b = wa.a AND wb.a = wa.b
    ),
    wtot AS MATERIALIZED (
        SELECT a, SUM(w) AS wins FROM wins GROUP BY a
    ),
    p0 AS MATERIALIZED (
        SELECT DISTINCT a AS brand, 1.0 AS p FROM nm
    )"""
    steps = []
    prev = "p0"
    for i in range(1, iters + 1):
        steps.append(
            f""",
    d{i} AS MATERIALIZED (
        SELECT nm.a AS brand,
               SUM(nm.n / (pa.p + pb.p)) AS denom
        FROM nm JOIN {prev} pa ON pa.brand = nm.a
                JOIN {prev} pb ON pb.brand = nm.b
        GROUP BY nm.a
    ),
    r{i} AS MATERIALIZED (
        SELECT d{i}.brand,
               COALESCE(wtot.wins, 0) / d{i}.denom AS p
        FROM d{i} LEFT JOIN wtot ON wtot.a = d{i}.brand
    ),
    p{i} AS MATERIALIZED (
        SELECT brand, p / (SELECT AVG(p) FROM r{i}) AS p FROM r{i}
    )"""
        )
        prev = f"p{i}"
    tail = f"""
    SELECT p{iters}.brand,
           CAST(COALESCE(wtot.wins, 0) AS BIGINT) AS n_wins,
           CAST((SELECT SUM(n) FROM nm WHERE nm.a = p{iters}.brand)
                AS BIGINT) AS n_matches,
           ROUND(p{iters}.p, 6) AS bt_strength,
           CAST(RANK() OVER (ORDER BY ROUND(p{iters}.p, 6) DESC,
                             p{iters}.brand) AS BIGINT) AS bt_rank
    FROM p{iters} LEFT JOIN wtot ON wtot.a = p{iters}.brand
    ORDER BY brand"""
    return head + "".join(steps) + tail


@register("bradley_terry_brands", oracle=_bt_oracle())
def q_bradley_terry_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry paired-comparison strengths of part brands:
    every order where two brands co-occur is a duel won by the brand
    with the larger (2-dp-rounded — float-sum-order-proof) revenue in
    that order; 5 minorize-maximize sweeps p_i ← W_i/Σ n_ij/(p_i+p_j),
    mean-normalized — the ranking model behind chess ratings and LLM
    preference leaderboards, here on basket-bounded duels.  Everything
    after the duel count runs on the ≤|brands|² frame; the oracle
    unrolls and value-checks every sweep."""
    c = F.col
    obr = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    "p_partkey", "p_brand"
                )
            ),
            c("p_partkey") == c("l_partkey"),
        )
        .groupBy(c("l_orderkey").alias("okey"), c("p_brand").alias("brand"))
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    a = obr.select("okey", c("brand").alias("wb"), c("rev").alias("ra"))
    b = obr.select("okey", c("brand").alias("lb"), c("rev").alias("rb"))
    wins = (
        a.join(b, "okey")
        .filter((c("wb") != c("lb")) & (c("ra") > c("rb")))
        .groupBy(c("wb").alias("a"), c("lb").alias("b"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wrev = wins.select(
        c("b").alias("a"), c("a").alias("b"), c("w").alias("w2")
    )
    nm = (
        wins.join(wrev, ["a", "b"], "full")
        .select(
            F.coalesce(wins["a"], wrev["a"]).alias("a"),
            F.coalesce(wins["b"], wrev["b"]).alias("b"),
            (
                F.coalesce(c("w"), F.lit(0)) + F.coalesce(c("w2"), F.lit(0))
            ).alias("n"),
        )
        .localCheckpoint(eager=True)
    )
    wtot = wins.groupBy("a").agg(F.sum("w").alias("wins"))
    p = nm.select("a").distinct().select(
        c("a").alias("brand"), F.lit(1.0).alias("p")
    )
    for _ in range(5):
        pa = p.select(c("brand").alias("a"), c("p").alias("p_a"))
        pb = p.select(c("brand").alias("b"), c("p").alias("p_b"))
        d = (
            nm.join(F.broadcast(pa), "a")
            .join(F.broadcast(pb), "b")
            .groupBy("a")
            .agg(F.sum(c("n") / (c("p_a") + c("p_b"))).alias("denom"))
        )
        # r is referenced twice (its own mean + the normalized update):
        # truncate lineage per sweep or the recompute set doubles each
        # iteration (same contract as the HITS power loop).
        r = (
            d.join(F.broadcast(wtot), "a", "left")
            .select(
                c("a").alias("brand"),
                (F.coalesce("wins", F.lit(0)) / c("denom")).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        mean = r.agg(F.avg("p").alias("mp"))
        p = r.crossJoin(F.broadcast(mean)).select(
            "brand", (c("p") / c("mp")).alias("p")
        )
    nmatch = nm.groupBy("a").agg(F.sum("n").alias("n_matches"))
    wr = Window.partitionBy().orderBy(F.desc(F.round("p", 6)), "brand")
    return (
        p.join(F.broadcast(wtot), p["brand"] == wtot["a"], "left")
        .join(F.broadcast(nmatch), p["brand"] == nmatch["a"], "left")
        .select(
            "brand",
            F.coalesce("wins", F.lit(0)).cast("long").alias("n_wins"),
            c("n_matches").cast("long").alias("n_matches"),
            F.round("p", 6).alias("bt_strength"),
            F.rank().over(wr).cast("long").alias("bt_rank"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# Round-7 thirty-second wave: changepoint search by binary segmentation.
# ---------------------------------------------------------------------------


@register(
    "binseg_changepoint_daily",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day, SUM(o_totalprice) AS y
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT ROW_NUMBER() OVER (ORDER BY day) AS i,
               COUNT(*) OVER () AS n,
               SUM(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cs,
               SUM(y * y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS css,
               SUM(y) OVER () AS ts, SUM(y * y) OVER () AS tss,
               day, y
        FROM daily
    ),
    cand AS (
        SELECT i, n, day,
               tss - ts * ts / n AS sst,
               (tss - ts * ts / n)
               - (css - cs * cs / i)
               - ((tss - css) - (ts - cs) * (ts - cs) / (n - i))
                   AS gain,
               cs / i AS mean_left,
               (ts - cs) / (n - i) AS mean_right
        FROM idx WHERE i >= 5 AND i <= n - 5
    ),
    best AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY ROUND(gain / sst, 6) DESC, day) AS r
            FROM cand)
        WHERE r = 1
    )
    SELECT CAST(best.n AS BIGINT) AS n_days,
           CAST(CAST(best.day AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS split_epoch_day,
           CAST(best.i AS BIGINT) AS split_index,
           ROUND(best.gain / best.sst, 6) AS gain_fraction,
           ROUND((best.mean_right - best.mean_left)
                 / (best.mean_left), 6) AS relative_shift
    FROM best
    """,
)
def q_binseg_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint search on daily revenue: the
    split k maximizing the SSE reduction SST − SSE_left − SSE_right,
    where every candidate's cost comes from PREFIX sums (Σy, Σy²) so
    the whole scan over candidates is two cumulative windows on the
    calendar-bounded daily frame — no per-candidate pass, no n² join.
    The argmax orders on the 4-dp-ROUNDED gain with a day tie-break
    (cross-engine float-noise-proof); a ≥5-day margin guards the
    degenerate edge splits.  Complements the fixed-date Chow test with
    an actual SEARCH."""
    c = F.col
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    wd = Window.partitionBy().orderBy("day")
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    idx = daily.select(
        "day",
        F.row_number().over(wd).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("y").over(wcum).alias("cs"),
        F.sum(c("y") * c("y")).over(wcum).alias("css"),
        F.sum("y").over(wall).alias("ts"),
        F.sum(c("y") * c("y")).over(wall).alias("tss"),
    )
    cand = idx.filter((c("i") >= 5) & (c("i") <= c("n") - 5)).select(
        "i", "n", "day",
        (c("tss") - c("ts") * c("ts") / c("n")).alias("sst"),
        (
            (c("tss") - c("ts") * c("ts") / c("n"))
            - (c("css") - c("cs") * c("cs") / c("i"))
            - (
                (c("tss") - c("css"))
                - (c("ts") - c("cs")) * (c("ts") - c("cs")) / (c("n") - c("i"))
            )
        ).alias("gain"),
        (c("cs") / c("i")).alias("mean_left"),
        ((c("ts") - c("cs")) / (c("n") - c("i"))).alias("mean_right"),
    )
    # gain is a difference of ~1e12-magnitude squared sums: outputs are
    # RATIOS only (gain/SST, relative mean shift) — raw SSEs at fixed
    # decimals straddle rounding boundaries under float-sum-order noise
    # (the trillion-scale ROUND class).
    wbest = Window.partitionBy().orderBy(
        F.desc(F.round(c("gain") / c("sst"), 6)), "day"
    )
    best = cand.withColumn("r", F.row_number().over(wbest)).filter(
        c("r") == 1
    )
    return best.select(
        c("n").cast("long").alias("n_days"),
        F.datediff("day", F.lit("1970-01-01")).cast("long").alias(
            "split_epoch_day"
        ),
        c("i").cast("long").alias("split_index"),
        F.round(c("gain") / c("sst"), 6).alias("gain_fraction"),
        F.round(
            (c("mean_right") - c("mean_left")) / c("mean_left"), 6
        ).alias("relative_shift"),
    )


# ---------------------------------------------------------------------------
# Round-7 thirty-third wave: cross-validated metric stability.
# ---------------------------------------------------------------------------


@register(
    "fold_auc_stability",
    oracle="""
    WITH base AS (
        SELECT value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
               CAST((event_id * 1000003 + 7) % 999983 * 40503 % 999983 % 5
                    AS BIGINT) AS fold
        FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
        SELECT fold, y,
               RANK() OVER (PARTITION BY fold ORDER BY value) AS r,
               COUNT(*) OVER (PARTITION BY fold, value) AS tie_n
        FROM base
    ),
    -- mid-rank for ties: RANK + (tie_n - 1)/2
    per AS (
        SELECT fold,
               SUM(CASE WHEN y = 1 THEN r + (tie_n - 1) / 2.0 END)
                   AS rank_sum_pos,
               SUM(y) AS n_pos,
               COUNT(*) - SUM(y) AS n_neg
        FROM ranked GROUP BY fold
    ),
    auc AS (
        SELECT fold, n_pos, n_neg,
               (rank_sum_pos - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg) AS auc
        FROM per
    )
    SELECT fold,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           ROUND(auc, 6) AS fold_auc,
           ROUND(AVG(auc) OVER (), 6) AS mean_auc,
           ROUND(stddev_samp(auc) OVER (), 6) AS sd_auc
    FROM auc ORDER BY fold
    """,
)
def q_fold_auc_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-validated metric stability: the value→purchase ROC AUC
    computed independently in 5 deterministic affine-hash folds (the
    ml/split.py convention), via the tie-corrected Mann-Whitney
    mid-rank identity AUC = (R⁺ − n⁺(n⁺+1)/2)/(n⁺n⁻), with the
    cross-fold mean and SD — the fold-variance report that says
    whether a single-split AUC (model_eval_auc in the corpus) is
    trustworthy.  Ranks are per-fold partitioned windows; the fold
    frame is 5 rows."""
    c = F.col
    base = (
        load_table(spark, sf_dir, "events")
        .filter(c("value").isNotNull())
        .select(
            "value",
            (c("event_type") == "purchase").cast("int").alias("y"),
            (
                (c("event_id").cast("long") * 1000003 + 7)
                % 999983 * 40503 % 999983 % 5
            ).alias("fold"),
        )
    )
    wr = Window.partitionBy("fold").orderBy("value")
    wt = Window.partitionBy("fold", "value")
    ranked = base.select(
        "fold", "y",
        F.rank().over(wr).alias("r"),
        F.count(F.lit(1)).over(wt).alias("tie_n"),
    )
    per = ranked.groupBy("fold").agg(
        F.sum(
            F.when(c("y") == 1, c("r") + (c("tie_n") - 1) / 2.0)
        ).alias("rank_sum_pos"),
        F.sum("y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n_neg"),
    )
    auc = per.select(
        "fold", "n_pos", "n_neg",
        (
            (c("rank_sum_pos") - c("n_pos") * (c("n_pos") + 1) / 2.0)
            / (c("n_pos") * c("n_neg"))
        ).alias("auc"),
    )
    wall = Window.partitionBy()
    return (
        auc.select(
            c("fold").cast("long").alias("fold"),
            c("n_pos").cast("long").alias("n_pos"),
            c("n_neg").cast("long").alias("n_neg"),
            F.round("auc", 6).alias("fold_auc"),
            F.round(F.avg("auc").over(wall), 6).alias("mean_auc"),
            F.round(F.stddev_samp("auc").over(wall), 6).alias("sd_auc"),
        )
        .orderBy("fold")
    )


@register(
    "info_gain_feature_panel",
    oracle="""
    WITH base AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
               CAST(hour(ts) // 4 AS VARCHAR) AS f_hourband,
               CAST(isodow(ts) - 1 AS VARCHAR) AS f_weekday,
               CASE WHEN value IS NULL THEN 'null'
                    WHEN value < 50 THEN 'lo'
                    WHEN value < 200 THEN 'mid'
                    ELSE 'hi' END AS f_valueband
        FROM events
    ),
    stacked AS (
        SELECT 'hourband' AS feature, f_hourband AS v, y FROM base
        UNION ALL
        SELECT 'weekday', f_weekday, y FROM base
        UNION ALL
        SELECT 'valueband', f_valueband, y FROM base
    ),
    cell AS (
        SELECT feature, v, COUNT(*) AS n, SUM(y) AS k
        FROM stacked GROUP BY 1, 2
    ),
    tot AS (
        SELECT feature, SUM(n) AS nn, SUM(k) AS kk,
               -- H(Y): binary entropy of the global label
               -(SUM(k) * 1.0 / SUM(n)) * ln(SUM(k) * 1.0 / SUM(n))
               - (1 - SUM(k) * 1.0 / SUM(n))
                 * ln(1 - SUM(k) * 1.0 / SUM(n)) AS h_y,
               -- H(F): ln N − Σ n ln n / N
               ln(SUM(n)) - SUM(n * ln(n)) / SUM(n) AS h_f,
               -- H(Y|F): Σ n·h(k/n) / N with 0·ln0 = 0
               SUM(n * (CASE WHEN k > 0 AND k < n THEN
                        -(k * 1.0 / n) * ln(k * 1.0 / n)
                        - (1 - k * 1.0 / n) * ln(1 - k * 1.0 / n)
                      ELSE 0 END)) / SUM(n) AS h_y_f
        FROM cell GROUP BY feature
    )
    SELECT feature,
           CAST((SELECT COUNT(*) FROM cell c WHERE c.feature = tot.feature)
                AS BIGINT) AS n_levels,
           ROUND(h_y, 6) AS h_label,
           ROUND(h_y - h_y_f, 6) AS info_gain,
           ROUND(h_f, 6) AS h_feature,
           ROUND((h_y - h_y_f) / h_f, 6) AS gain_ratio
    FROM tot ORDER BY feature
    """,
)
def q_info_gain_feature_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-gain / gain-ratio feature panel for the purchase
    label across three categorical encodings (hour band, weekday,
    value band): IG = H(Y) − H(Y|F) and Quinlan's gain ratio IG/H(F)
    (penalizing many-level features) — the C4.5 split criterion as a
    feature-screening report, generalizing decision_stump_value's
    single numeric sweep.  One stacked scan, all entropies from the
    Σn·ln n identity on grouped counts."""
    c = F.col
    base = load_table(spark, sf_dir, "events").select(
        (c("event_type") == "purchase").cast("int").alias("y"),
        (F.hour("ts") / F.lit(4)).cast("long").cast("string").alias(
            "f_hourband"
        ),
        F.weekday("ts").cast("long").cast("string").alias("f_weekday"),
        F.when(c("value").isNull(), "null")
        .when(c("value") < 50, "lo")
        .when(c("value") < 200, "mid")
        .otherwise("hi")
        .alias("f_valueband"),
    )
    stacked = (
        base.select(F.lit("hourband").alias("feature"),
                    c("f_hourband").alias("v"), "y")
        .unionAll(
            base.select(F.lit("weekday"), c("f_weekday"), c("y"))
        )
        .unionAll(
            base.select(F.lit("valueband"), c("f_valueband"), c("y"))
        )
    )
    cell = stacked.groupBy("feature", "v").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("k")
    )
    py = F.sum("k") * 1.0 / F.sum("n")
    hcond = F.when(
        (c("k") > 0) & (c("k") < c("n")),
        -(c("k") * 1.0 / c("n")) * F.log(c("k") * 1.0 / c("n"))
        - (1 - c("k") * 1.0 / c("n"))
        * F.log(1 - c("k") * 1.0 / c("n")),
    ).otherwise(F.lit(0.0))
    # H(Y|F) via Σ n·h(k/n) / N (no window-in-agg)
    tot = cell.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n_levels"),
        (-py * F.log(py) - (1 - py) * F.log(1 - py)).alias("h_y"),
        (
            F.log(F.sum("n")) - F.sum(c("n") * F.log("n")) / F.sum("n")
        ).alias("h_f"),
        (F.sum(c("n") * hcond) / F.sum("n")).alias("h_y_f"),
    )
    return tot.select(
        "feature",
        c("n_levels").cast("long").alias("n_levels"),
        F.round("h_y", 6).alias("h_label"),
        F.round(c("h_y") - c("h_y_f"), 6).alias("info_gain"),
        F.round("h_f", 6).alias("h_feature"),
        F.round((c("h_y") - c("h_y_f")) / c("h_f"), 6).alias("gain_ratio"),
    ).orderBy("feature")


@register(
    "rmst_time_to_purchase",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MIN(epoch_us(ts)) AS first_us,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS p_us
        FROM events GROUP BY user_id
    ),
    win AS (SELECT MAX(epoch_us(ts)) AS end_us FROM events),
    subj AS (
        SELECT CASE WHEN p_us IS NOT NULL
                    THEN CAST((p_us - first_us) // 86400000000 AS BIGINT)
                    ELSE CAST((end_us - first_us) // 86400000000 AS BIGINT)
               END AS t_day,
               CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM u CROSS JOIN win
    ),
    tau AS (
        SELECT CAST(MAX(t_day) // 2 AS BIGINT) AS tau FROM subj
    ),
    days AS (
        SELECT DISTINCT t_day FROM subj CROSS JOIN tau
        WHERE obs = 1 AND t_day <= tau
    ),
    lt AS (
        SELECT d.t_day,
               SUM(CASE WHEN s.t_day >= d.t_day THEN 1 ELSE 0 END) AS n,
               SUM(CASE WHEN s.t_day = d.t_day AND s.obs = 1
                        THEN 1 ELSE 0 END) AS d_ev
        FROM days d CROSS JOIN subj s GROUP BY d.t_day
    ),
    surv AS (
        SELECT t_day, n, d_ev,
               exp(SUM(ln(1.0 - d_ev * 1.0 / n)) OVER (
                   ORDER BY t_day ROWS UNBOUNDED PRECEDING)) AS s_after,
               COALESCE(exp(SUM(ln(1.0 - d_ev * 1.0 / n)) OVER (
                   ORDER BY t_day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), 1.0)
                   AS s_before,
               COALESCE(LAG(t_day) OVER (ORDER BY t_day), 0) AS prev_day
        FROM lt WHERE d_ev * 1.0 / n < 1.0
    ),
    pieces AS (
        SELECT SUM(s_before * (t_day - prev_day)) AS partial_area,
               MAX(s_after) FILTER (WHERE t_day = (SELECT MAX(t_day)
                                                   FROM surv)) AS s_last,
               MAX(t_day) AS t_last
        FROM surv
    )
    SELECT CAST(tau.tau AS BIGINT) AS tau_days,
           CAST((SELECT COUNT(*) FROM subj) AS BIGINT) AS n_users,
           CAST((SELECT SUM(obs) FROM subj) AS BIGINT) AS n_converted,
           ROUND(pieces.partial_area
                 + pieces.s_last * (tau.tau - pieces.t_last), 6)
               AS rmst_days,
           ROUND(pieces.s_last, 6) AS km_at_tau
    FROM pieces CROSS JOIN tau
    """,
)
def q_rmst_time_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time for time-to-first-purchase: the
    area under the Kaplan-Meier step curve up to τ = half the maximum
    observed follow-up (a MEASURED horizon — scale-free), i.e. the
    expected purchase-free days within τ — the clinically-standard
    single-number summary that, unlike the median, is defined even
    when S(τ) > 0.5.  Daily life table with right censoring; the
    product-limit, its 1-lagged twin, and the step integration all run
    on the bounded event-day frame."""
    c = F.col
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.expr("ts_ns div 1000")).alias("first_us"),
        F.min(
            F.when(c("event_type") == "purchase", F.expr("ts_ns div 1000"))
        ).alias("p_us"),
    )
    win = ev.agg(F.max(F.expr("ts_ns div 1000")).alias("end_us"))
    subj = u.crossJoin(F.broadcast(win)).select(
        F.when(
            c("p_us").isNotNull(),
            ((c("p_us") - c("first_us")) / 86_400_000_000).cast("long"),
        )
        .otherwise(
            ((c("end_us") - c("first_us")) / 86_400_000_000).cast("long")
        )
        .alias("t_day"),
        c("p_us").isNotNull().cast("int").alias("obs"),
    )
    tau = subj.agg(
        F.floor(F.max("t_day") / 2).cast("long").alias("tau")
    )
    days = (
        subj.crossJoin(F.broadcast(tau))
        .filter((c("obs") == 1) & (c("t_day") <= c("tau")))
        .select(c("t_day").alias("d_day"))
        .distinct()
    )
    lt = (
        subj.crossJoin(F.broadcast(days))
        .groupBy("d_day")
        .agg(
            F.sum((c("t_day") >= c("d_day")).cast("int")).alias("n"),
            F.sum(
                ((c("t_day") == c("d_day")) & (c("obs") == 1)).cast("int")
            ).alias("d_ev"),
        )
        .filter(c("d_ev") * 1.0 / c("n") < 1.0)
    )
    wcur = Window.partitionBy().orderBy("d_day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wprev = Window.partitionBy().orderBy("d_day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wd = Window.partitionBy().orderBy("d_day")
    surv = lt.select(
        "d_day",
        F.exp(
            F.sum(F.log(1.0 - c("d_ev") * 1.0 / c("n"))).over(wcur)
        ).alias("s_after"),
        F.coalesce(
            F.exp(
                F.sum(F.log(1.0 - c("d_ev") * 1.0 / c("n"))).over(wprev)
            ),
            F.lit(1.0),
        ).alias("s_before"),
        F.coalesce(F.lag("d_day").over(wd), F.lit(0)).alias("prev_day"),
    )
    t_last = surv.agg(F.max("d_day").alias("t_last"))
    pieces = (
        surv.crossJoin(F.broadcast(t_last))
        .agg(
            F.sum(c("s_before") * (c("d_day") - c("prev_day"))).alias(
                "partial_area"
            ),
            F.max(
                F.when(c("d_day") == c("t_last"), c("s_after"))
            ).alias("s_last"),
            F.max("d_day").alias("t_last_day"),
        )
    )
    tots = subj.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("obs").cast("long").alias("n_converted"),
    )
    return (
        pieces.crossJoin(F.broadcast(tau))
        .crossJoin(F.broadcast(tots))
        .select(
            c("tau").cast("long").alias("tau_days"),
            "n_users",
            "n_converted",
            F.round(
                c("partial_area")
                + c("s_last") * (c("tau") - c("t_last_day")),
                6,
            ).alias("rmst_days"),
            F.round("s_last", 6).alias("km_at_tau"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 thirty-sixth wave: equivalence testing (TOST) + VaR backtest
# (Kupiec POF).
# ---------------------------------------------------------------------------


@register(
    "tost_equivalence_aa",
    oracle="""
    WITH s AS (
        SELECT CASE WHEN (user_id * 1000003 + 7) % 999983 * 40503
                         % 999983 % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    g AS (
        SELECT
            SUM(CASE WHEN grp = 'A' THEN y ELSE 0 END) AS xa,
            SUM(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS na,
            SUM(CASE WHEN grp = 'B' THEN y ELSE 0 END) AS xb,
            SUM(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS nb
        FROM s
    ),
    t AS (
        SELECT xa, na, xb, nb,
               xa * 1.0 / na - xb * 1.0 / nb AS diff,
               sqrt((xa * 1.0 / na) * (1 - xa * 1.0 / na) / na
                    + (xb * 1.0 / nb) * (1 - xb * 1.0 / nb) / nb) AS se
        FROM g
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(xa * 1.0 / na, 6) AS rate_a,
           ROUND(xb * 1.0 / nb, 6) AS rate_b,
           ROUND(diff, 6) AS rate_diff,
           ROUND((diff + 0.01) / se, 6) AS z_lower,
           ROUND((diff - 0.01) / se, 6) AS z_upper,
           (diff + 0.01) / se > 1.6449 AND (diff - 0.01) / se < -1.6449
               AS equivalent_at_1pct
    FROM t
    """,
)
def q_tost_equivalence_aa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-one-sided-tests (TOST) equivalence check on a deterministic
    A/A split of the purchase rate: with margin δ = ±1 pp, equivalence
    is declared when z_lower > 1.645 AND z_upper < −1.645 — the test
    every experimentation platform runs to validate its bucketing
    BEFORE trusting A/B results (a significance test can only fail to
    reject; TOST positively demonstrates sameness).  The split is the
    affine-hash convention, so both engines bucket identically and the
    A/A should pass."""
    c = F.col
    s = load_table(spark, sf_dir, "events").select(
        (
            (c("user_id").cast("long") * 1000003 + 7)
            % 999983 * 40503 % 999983 % 2
            == 0
        ).alias("is_a"),
        (c("event_type") == "purchase").cast("int").alias("y"),
    )
    g = s.agg(
        F.sum(F.when(c("is_a"), c("y")).otherwise(0)).alias("xa"),
        F.sum(c("is_a").cast("int")).alias("na"),
        F.sum(F.when(~c("is_a"), c("y")).otherwise(0)).alias("xb"),
        F.sum((~c("is_a")).cast("int")).alias("nb"),
    )
    ra = c("xa") * 1.0 / c("na")
    rb = c("xb") * 1.0 / c("nb")
    diff = ra - rb
    se = F.sqrt(ra * (1 - ra) / c("na") + rb * (1 - rb) / c("nb"))
    return g.select(
        c("na").cast("long").alias("n_a"),
        c("nb").cast("long").alias("n_b"),
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(diff, 6).alias("rate_diff"),
        F.round((diff + 0.01) / se, 6).alias("z_lower"),
        F.round((diff - 0.01) / se, 6).alias("z_upper"),
        (
            ((diff + 0.01) / se > 1.6449)
            & ((diff - 0.01) / se < -1.6449)
        ).alias("equivalent_at_1pct"),
    )


@register(
    "kupiec_var_backtest",
    oracle="""
    WITH base AS (
        SELECT value, epoch_us(ts) AS ts_us
        FROM events WHERE value IS NOT NULL
    ),
    med AS (SELECT quantile_cont(ts_us, 0.5) AS cut FROM base),
    var_ AS (
        SELECT quantile_cont(value, 0.95) AS var95
        FROM base CROSS JOIN med WHERE ts_us <= cut
    ),
    test AS (
        SELECT value > var95 AS viol
        FROM base CROSS JOIN med CROSS JOIN var_
        WHERE ts_us > cut
    ),
    cnt AS (
        SELECT COUNT(*) AS n, SUM(CASE WHEN viol THEN 1 ELSE 0 END) AS x
        FROM test
    )
    SELECT CAST(n AS BIGINT) AS n_test,
           CAST(x AS BIGINT) AS n_violations,
           ROUND(x * 1.0 / n, 6) AS violation_rate,
           0.05 AS expected_rate,
           ROUND(-2.0 * ((n - x) * ln(0.95) + x * ln(0.05)
                 - (n - x) * ln(1.0 - x * 1.0 / n) - x * ln(x * 1.0 / n)),
                 6) AS kupiec_lr,
           -2.0 * ((n - x) * ln(0.95) + x * ln(0.05)
                 - (n - x) * ln(1.0 - x * 1.0 / n) - x * ln(x * 1.0 / n))
               <= 3.8415 AS pass_95
    FROM cnt
    """,
)
def q_kupiec_var_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kupiec proportion-of-failures backtest of a historical-
    simulation VaR: the 95% value threshold is fitted on the first
    time-half (measured median cut) and violations are counted on the
    second; LR_pof = −2·ln[binomial(0.05)/binomial(x/n)] against the
    χ²₁ 95% critical value 3.84 — the regulatory test for 'is the risk
    model's violation rate consistent with its confidence level',
    complementing the GPD tail fit.  Two exact percentiles + one
    counting pass."""
    c = F.col
    base = (
        load_table(spark, sf_dir, "events")
        .filter(c("value").isNotNull())
        .select("value", F.expr("ts_ns div 1000").alias("ts_us"))
    )
    med = base.agg(F.percentile("ts_us", 0.5).alias("cut"))
    var_ = (
        base.crossJoin(F.broadcast(med))
        .filter(c("ts_us") <= c("cut"))
        .agg(F.percentile("value", 0.95).alias("var95"))
    )
    cnt = (
        base.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(var_))
        .filter(c("ts_us") > c("cut"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((c("value") > c("var95")).cast("int")).alias("x"),
        )
    )
    lr = -2.0 * (
        (c("n") - c("x")) * F.log(F.lit(0.95))
        + c("x") * F.log(F.lit(0.05))
        - (c("n") - c("x")) * F.log(1.0 - c("x") * 1.0 / c("n"))
        - c("x") * F.log(c("x") * 1.0 / c("n"))
    )
    return cnt.select(
        c("n").cast("long").alias("n_test"),
        c("x").cast("long").alias("n_violations"),
        F.round(c("x") * 1.0 / c("n"), 6).alias("violation_rate"),
        F.lit(0.05).alias("expected_rate"),
        F.round(lr, 6).alias("kupiec_lr"),
        (lr <= 3.8415).alias("pass_95"),
    )


# ---------------------------------------------------------------------------
# Round-7 thirty-seventh wave: unseen-mass estimation — capture-
# recapture population size and Chao1 / Good-Turing vocabulary
# richness.
# ---------------------------------------------------------------------------


@register(
    "capture_recapture_users",
    oracle="""
    WITH med AS (
        SELECT quantile_cont(epoch_us(ts), 0.5) AS cut FROM events
    ),
    c1 AS (
        SELECT DISTINCT user_id FROM events CROSS JOIN med
        WHERE epoch_us(ts) <= cut
    ),
    c2 AS (
        SELECT DISTINCT user_id FROM events CROSS JOIN med
        WHERE epoch_us(ts) > cut
    ),
    s AS (
        SELECT (SELECT COUNT(*) FROM c1) AS n1,
               (SELECT COUNT(*) FROM c2) AS n2,
               (SELECT COUNT(*) FROM c1 WHERE user_id IN
                   (SELECT user_id FROM c2)) AS m,
               (SELECT COUNT(DISTINCT user_id) FROM events) AS n_true
    )
    SELECT CAST(n1 AS BIGINT) AS n_capture1,
           CAST(n2 AS BIGINT) AS n_capture2,
           CAST(m AS BIGINT) AS n_recaptured,
           CAST(n_true AS BIGINT) AS n_observed_total,
           ROUND(n1 * 1.0 * n2 / m, 4) AS lincoln_petersen,
           ROUND((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 4)
               AS chapman_estimate,
           ROUND(((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0) / n_true, 6)
               AS chapman_over_observed
    FROM s
    """,
)
def q_capture_recapture_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture (Lincoln-Petersen + Chapman bias-corrected)
    estimate of the user population from two 'capture occasions' —
    the first and second time-half (measured median cut): N̂ =
    n₁n₂/m from the recapture overlap, compared to the directly
    observed distinct count — the mark-recapture machinery fraud teams
    use to size UNSEEN populations (how many actors evade both
    windows).  Two distinct-sets + one semi-join overlap count."""
    c = F.col
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns div 1000").alias("ts_us")
    )
    med = ev.agg(F.percentile("ts_us", 0.5).alias("cut"))
    tagged = ev.crossJoin(F.broadcast(med))
    c1 = tagged.filter(c("ts_us") <= c("cut")).select("user_id").distinct()
    c2 = tagged.filter(c("ts_us") > c("cut")).select("user_id").distinct()
    n1 = c1.agg(F.count(F.lit(1)).alias("n1"))
    n2 = c2.agg(F.count(F.lit(1)).alias("n2"))
    m = c1.join(c2, "user_id", "left_semi").agg(
        F.count(F.lit(1)).alias("m")
    )
    nt = ev.agg(F.countDistinct("user_id").alias("n_true"))
    chap = (c("n1") + 1.0) * (c("n2") + 1.0) / (c("m") + 1.0) - 1.0
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(nt))
        .select(
            c("n1").cast("long").alias("n_capture1"),
            c("n2").cast("long").alias("n_capture2"),
            c("m").cast("long").alias("n_recaptured"),
            c("n_true").cast("long").alias("n_observed_total"),
            F.round(c("n1") * 1.0 * c("n2") / c("m"), 4).alias(
                "lincoln_petersen"
            ),
            F.round(chap, 4).alias("chapman_estimate"),
            F.round(chap / c("n_true"), 6).alias("chapman_over_observed"),
        )
    )


@register(
    "chao1_vocab_richness",
    oracle=r"""
    WITH toks AS (
        SELECT UNNEST(string_split_regex(trim(lower(regexp_replace(
                   text, '[^a-zA-Z0-9]+', ' ', 'g'))), '\s+')) AS w
        FROM documents
    ),
    freq AS (
        SELECT w, COUNT(*) AS n FROM toks WHERE w <> '' GROUP BY w
    ),
    fof AS (
        SELECT SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS f1,
               SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS f2,
               COUNT(*) AS v,
               SUM(n) AS total_tokens
        FROM freq
    )
    SELECT CAST(total_tokens AS BIGINT) AS n_tokens,
           CAST(v AS BIGINT) AS vocab_observed,
           CAST(f1 AS BIGINT) AS n_hapax,
           CAST(f2 AS BIGINT) AS n_dis,
           ROUND(v + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0)), 4)
               AS chao1_estimate,
           ROUND((v + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0))) / v, 6)
               AS chao1_over_observed,
           ROUND(f1 * 1.0 / total_tokens, 6) AS good_turing_unseen_mass
    FROM fof
    """,
)
def q_chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 (bias-corrected) nonparametric richness estimate of the
    UNSEEN vocabulary: V̂ = V + F₁(F₁−1)/(2(F₂+1)) from the hapax/
    dis-legomena counts (defined even when F₂ = 0), plus the
    Good-Turing unseen probability mass F₁/N — 'how much vocabulary
    does this corpus still hide', the coverage question Heaps-law
    extrapolation (heaps_law_vocab_growth) answers parametrically and
    this answers distribution-free.  Tokenize-once, two grouped
    passes, no text shuffle beyond the word frequency aggregate."""
    from .functions.text import tokens

    c = F.col
    freq = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.lower(c("text")))).alias("w"))
        .filter(c("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fof = freq.agg(
        F.sum((c("n") == 1).cast("int")).alias("f1"),
        F.sum((c("n") == 2).cast("int")).alias("f2"),
        F.count(F.lit(1)).alias("v"),
        F.sum("n").alias("total_tokens"),
    )
    # bias-corrected Chao1: defined even when F2 = 0
    chao = c("v") + c("f1") * (c("f1") - 1.0) / (2.0 * (c("f2") + 1.0))
    return fof.select(
        c("total_tokens").cast("long").alias("n_tokens"),
        c("v").cast("long").alias("vocab_observed"),
        c("f1").cast("long").alias("n_hapax"),
        c("f2").cast("long").alias("n_dis"),
        F.round(chao, 4).alias("chao1_estimate"),
        F.round(chao / c("v"), 6).alias("chao1_over_observed"),
        F.round(c("f1") * 1.0 / c("total_tokens"), 6).alias(
            "good_turing_unseen_mass"
        ),
    )


# ---------------------------------------------------------------------------
# Round-7 thirty-eighth wave: behavioral-law metrics — visit clumpiness
# and Taylor's variance-mean power law.
# ---------------------------------------------------------------------------


@register(
    "clumpiness_top_users",
    oracle="""
    WITH t AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
    ),
    win AS (
        SELECT MIN(ts_us) AS t0, MAX(ts_us) AS t1 FROM t
    ),
    gaps AS (
        -- inter-event gaps INCLUDING the window edges (standard
        -- clumpiness construction: n events -> n+1 gaps)
        SELECT user_id, gap FROM (
            SELECT user_id,
                   ts_us - COALESCE(LAG(ts_us) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id),
                       (SELECT t0 FROM win)) AS gap
            FROM t
            UNION ALL
            SELECT user_id,
                   (SELECT t1 FROM win) - MAX(ts_us) AS gap
            FROM t GROUP BY user_id
        ) WHERE gap > 0
    ),
    per AS (
        SELECT user_id, COUNT(*) AS n_gaps, SUM(gap) AS total
        FROM gaps GROUP BY user_id HAVING COUNT(*) >= 4
    ),
    hp AS (
        SELECT per.user_id, per.n_gaps,
               SUM((gap * 1.0 / total) * ln(gap * 1.0 / total)) AS negent
        FROM gaps JOIN per USING (user_id)
        GROUP BY per.user_id, per.n_gaps
    )
    SELECT user_id,
           CAST(n_gaps - 1 AS BIGINT) AS n_events,
           ROUND(1.0 + negent / ln(n_gaps), 6) AS clumpiness
    FROM hp
    ORDER BY clumpiness DESC, user_id LIMIT 20
    """,
)
def q_clumpiness_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visit clumpiness (Zhang-Bradlow-Small): C = 1 + Σp·ln p / ln(n+1)
    over each user's normalized inter-event gaps (window-edge-padded),
    0 = perfectly regular, →1 = one dense burst — the CLV/bot signal
    that event COUNTS alone cannot see.  Top-20 clumpiest users with
    ≥3 events; per-user lag window + one grouped entropy pass."""
    c = F.col
    t = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts_ns div 1000").alias("ts_us")
    )
    win = t.agg(F.min("ts_us").alias("t0"), F.max("ts_us").alias("t1"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    inner = t.crossJoin(F.broadcast(win)).select(
        "user_id",
        (
            c("ts_us")
            - F.coalesce(F.lag("ts_us").over(w), c("t0"))
        ).alias("gap"),
    )
    tail = (
        t.groupBy("user_id")
        .agg(F.max("ts_us").alias("mx"))
        .crossJoin(F.broadcast(win))
        .select("user_id", (c("t1") - c("mx")).alias("gap"))
    )
    gaps = inner.unionAll(tail).filter(c("gap") > 0)
    per = (
        gaps.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_gaps"), F.sum("gap").alias("total"))
        .filter(c("n_gaps") >= 4)
    )
    hp = (
        gaps.join(per, "user_id")
        .groupBy("user_id", "n_gaps")
        .agg(
            F.sum(
                (c("gap") * 1.0 / c("total"))
                * F.log(c("gap") * 1.0 / c("total"))
            ).alias("negent")
        )
    )
    return (
        hp.select(
            "user_id",
            (c("n_gaps") - 1).cast("long").alias("n_events"),
            F.round(1.0 + c("negent") / F.log(c("n_gaps")), 6).alias(
                "clumpiness"
            ),
        )
        .orderBy(F.desc("clumpiness"), "user_id")
        .limit(20)
    )


@register(
    "taylors_law_users",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT COUNT(DISTINCT day) AS n_days FROM daily),
    per AS (
        -- zero days included via the calendar span: mean = total/D,
        -- var  = (Σn² − D·mean²)/(D−1)
        SELECT user_id,
               SUM(n) * 1.0 / n_days AS mu,
               (SUM(n * n) - POWER(SUM(n), 2) * 1.0 / n_days)
                 / (n_days - 1) AS v
        FROM daily CROSS JOIN span
        GROUP BY user_id, n_days
    ),
    pts AS (
        SELECT ln(mu) AS x, ln(v) AS y FROM per WHERE mu > 0 AND v > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                 / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 6)
               AS taylor_slope,
           ROUND(AVG(y) - (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                 / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) * AVG(x), 6)
               AS taylor_intercept,
           ROUND(corr(x, y) * corr(x, y), 6) AS r_squared
    FROM pts
    """,
)
def q_taylors_law_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taylor's power law across users: regress ln(variance) on
    ln(mean) of per-user DAILY event counts (zero days included via the
    calendar span) — slope ≈ 1 is Poisson-like independence, ≈ 2 is
    synchronized/bursty; a population slope shift is a bot-cohort
    fingerprint.  Per-user moments come from one grouped pass using
    Σn²-based identities (no day×user densification), the log-log OLS
    from a second 1-row aggregate."""
    c = F.col
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    span = daily.agg(F.countDistinct("day").alias("n_days"))
    per = (
        daily.crossJoin(F.broadcast(span))
        .groupBy("user_id", "n_days")
        .agg(F.sum("n").alias("s"), F.sum(c("n") * c("n")).alias("ss"))
        .select(
            (c("s") * 1.0 / c("n_days")).alias("mu"),
            (
                (c("ss") - F.pow(c("s"), 2) * 1.0 / c("n_days"))
                / (c("n_days") - 1)
            ).alias("v"),
        )
    )
    pts = per.filter((c("mu") > 0) & (c("v") > 0)).select(
        F.log("mu").alias("x"), F.log("v").alias("y")
    )
    slope = (
        F.count(F.lit(1)) * F.sum(c("x") * c("y"))
        - F.sum("x") * F.sum("y")
    ) / (
        F.count(F.lit(1)) * F.sum(c("x") * c("x"))
        - F.sum("x") * F.sum("x")
    )
    return pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(slope, 6).alias("taylor_slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias(
            "taylor_intercept"
        ),
        F.round(F.corr("x", "y") * F.corr("x", "y"), 6).alias("r_squared"),
    )
