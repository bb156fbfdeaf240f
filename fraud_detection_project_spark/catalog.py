"""Catalog: explicit-schema table loading + temp-view registry.

Reference parity (SURVEY.md §2.1): the reference's ``DataLoader.load_data``
(``src/ingestion/load_data.py:19-55``) loops a name→path dict of CSVs with
inferred dtypes and returns a dict of in-memory frames, silently recording
``None`` for missing files. This engine makes both contracts explicit:

- :func:`load_csv_datasets` — the S1/S3 equivalent (dict of CSV paths →
  dict of lazy DataFrames; missing file → ``None`` entry, not error).
- :class:`Catalog` — the testdata star schema with pinned ``StructType``
  per table (schema-on-read contract; no dtype probing, SURVEY.md §1.3)
  registered as temp views for ``spark.sql``.

Scale note: every load is a lazy scan; nothing is collected. Explicit
schemas skip the file-listing+footer-sampling inference job entirely —
at 100 TB, schema inference is itself a large job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .session import ensure_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Pinned logical schemas for the testdata star schema (TESTDATA.md).
# timestamp[ms]/[ns] physical types are normalized in load_table.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    # events.ts physical type varies by generator version: TIMESTAMP(NANOS)
    # (read as raw ns long via spark.sql.legacy.parquet.nanosAsLong) or
    # plain timestamp[us]. Either way it's one INT64 column on disk, so we
    # pin LongType here, sniff the unit from the parquet footer in
    # load_table, and derive a µs TimestampType `ts` plus the exact
    # nanosecond epoch long `ts_ns`.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def _path_stamp(path: str) -> tuple[int, int]:
    """(mtime_ns, size) of a data path — the freshness key for the
    driver-side memos below. Spark parquet writes recreate the target
    directory (or file), so any rewrite moves the stamp."""
    st = os.stat(path)
    return (st.st_mtime_ns, st.st_size)


# footer-probe memo: (resolved path, stamp) → unit. The probe is a
# ~3 ms driver-side pyarrow footer read repeated on EVERY events load;
# the file's physical unit cannot change without the stamp changing.
_TS_UNIT_MEMO: dict[tuple, str] = {}


def _parquet_ts_unit(path: str, col: str = "ts") -> str:
    """Physical time unit of ``col`` from the parquet footer: 'ns', 'us',
    'ms', 's'. One driver-side footer read (bytes, not data) — the
    generator has shipped both TIMESTAMP(NANOS) and timestamp[us] across
    rounds, and silently mis-scaling an epoch is a 1000× corruption."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    key = (os.path.realpath(path), _path_stamp(path))
    hit = _TS_UNIT_MEMO.get(key)
    if hit is not None:
        return hit
    p = path
    if os.path.isdir(p):
        parts = [f for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
        if parts:
            p = os.path.join(p, parts[0])
    t = pq.read_schema(p).field(col).type
    unit = t.unit if pa.types.is_timestamp(t) else "ns"
    # legacy INT64 TIMESTAMP(NANOS) surfaces as int64 → 'ns'
    _TS_UNIT_MEMO[key] = unit
    return unit


# per-session plan memo for load_table: SparkSession → {(path, stamp):
# DataFrame}. Building the events frame costs ~0.5-1 s of pure
# driver-side work per call (file-listing/InMemoryFileIndex in
# spark.read.parquet ≈ 200 ms + four analysis round-trips for the
# withColumn chain ≈ 250 ms, measured on local[32]) and the bench/verify
# harnesses rebuild every query from scratch — dozens of identical
# loads per run, all inside the timed region (guide §5 driver work,
# §7.3 planning overhead). A DataFrame is an immutable lazy plan, so
# returning the same object is semantically identical: every action
# still scans parquet; nothing is materialized by the memo. Keyed on
# the session object (weak — a stopped session's plans die with it)
# and the path stamp (a rewrite invalidates).
_TABLE_MEMO = None  # lazily a weakref.WeakKeyDictionary


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one testdata table with normalized schema.

    ``events`` comes back with:
      - ``ts``     TimestampType at µs precision (matches what DuckDB and
                   pandas see for the same file),
      - ``ts_ns``  the nanosecond epoch LongType (exact arithmetic for
                   range windows — integer ``div``, no double rounding),
    regardless of whether the file stores ns or µs on disk.

    Repeated loads of an unchanged path on the same session return the
    SAME lazy DataFrame (see ``_TABLE_MEMO`` above) — plan reuse, not
    data caching.
    """
    global _TABLE_MEMO
    ensure_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if _TABLE_MEMO is None:
        import weakref

        _TABLE_MEMO = weakref.WeakKeyDictionary()
    try:
        memo = _TABLE_MEMO.setdefault(spark, {})
        key = (os.path.realpath(path), _path_stamp(path))
    except (TypeError, OSError):
        memo, key = None, None  # non-weakref-able stub / vanished path
    if memo is not None:
        hit = memo.get(key)
        if hit is not None:
            return hit
    df = spark.read.schema(SCHEMAS[name]).parquet(path)
    if name == "events":
        unit = _parquet_ts_unit(path)
        raw = F.col("_ts_raw")
        to_ns = {
            "ns": raw,
            "us": raw * F.lit(1_000),
            "ms": raw * F.lit(1_000_000),
            "s": raw * F.lit(1_000_000_000),
        }[unit]
        df = (
            df.withColumnRenamed("ts", "_ts_raw")
            .withColumn("ts_ns", to_ns)
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
            .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
        )
    if memo is not None:
        memo[key] = df
    return df


class Catalog:
    """Name→DataFrame registry over one scale-factor directory.

    Equivalent of the reference's ``dict[str, pd.DataFrame]`` carried
    between pipeline stages (``load_data.py:39-55``), but lazy and
    queryable through ``spark.sql`` via temp views.
    """

    def __init__(self, spark: SparkSession, sf_dir: str, register_views: bool = True):
        self.spark = ensure_runtime_confs(spark)
        self.sf_dir = sf_dir
        self._tables: dict[str, DataFrame] = {}
        for name in TABLES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                df = load_table(spark, sf_dir, name)
                self._tables[name] = df
                if register_views:
                    df.createOrReplaceTempView(name)

    def table(self, name: str) -> DataFrame:
        return self._tables[name]

    def __getitem__(self, name: str) -> DataFrame:
        return self._tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self._tables

    def names(self) -> list[str]:
        return list(self._tables)


def load_csv_datasets(
    spark: SparkSession,
    dataset_paths: dict[str, str],
    schemas: dict[str, T.StructType] | None = None,
) -> dict[str, DataFrame | None]:
    """Multi-dataset CSV loader (reference S1/S3, ``load_data.py:19-55``).

    Iterates the *passed* dict (the reference's intended-but-buggy
    behavior — it iterated a nonexistent global instead, SURVEY.md
    defects). Missing file → ``None`` entry, matching ``load_data.py:50-53``.
    Explicit schema per dataset when provided; header inference otherwise.
    """
    ensure_runtime_confs(spark)
    out: dict[str, DataFrame | None] = {}
    for name, path in dataset_paths.items():
        if not os.path.exists(path):
            out[name] = None
            continue
        reader = spark.read.option("header", True)
        if schemas and name in schemas:
            reader = reader.schema(schemas[name])
        else:
            reader = reader.option("inferSchema", True)
        out[name] = reader.csv(path)
    return out


def read_json_robust(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
):
    """JSON-lines ingestion that survives bad input: PERMISSIVE mode
    parses what it can, routes unparseable lines into ``corrupt_col``
    whole, and never fails the job — the only viable contract for
    100 TB of third-party feed data (FAILFAST dies on byte one,
    DROPMALFORMED silently loses data; quarantining keeps evidence).

    Returns (clean_df, corrupt_df): clean rows without the quarantine
    column, and quarantined raw lines for the dead-letter sink. Schema
    is explicit (never inferSchema — an extra full scan at scale, and
    feed drift would silently change types).
    """
    from pyspark.sql import functions as F

    full_schema = f"{schema}, {corrupt_col} STRING"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        # Spark refuses to answer queries that touch ONLY the corrupt
        # column straight off the scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
        # — cache the parsed frame so both outputs read one parse
        .cache()
    )
    corrupt = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    return clean, corrupt
