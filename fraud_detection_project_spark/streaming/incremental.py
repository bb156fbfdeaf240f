"""Streaming maintenance of algebraic grouped aggregates.

The batch operator (operators/incremental.py:merge_aggregate_state)
already proves state ⊕ delta = recompute for algebraic aggregates;
this module runs that merge inside ``foreachBatch`` so a materialized
aggregate table stays current over a stream with NO state store and
NO watermark — the aggregate table IS the state, bounded by group
cardinality, not stream length. Same atomic versioned-manifest commit
as streaming/sketches.py and streaming/upsert.py: each micro-batch
writes a fresh version directory and flips MANIFEST.json last, so
readers never observe a torn table.

Stream ≡ batch exactness is the pytest oracle
(tests/test_streaming.py::TestStreamingAggMaintenance): any micro-
batch slicing of the input produces byte-identical state to one batch
aggregation — the defining property of algebraic aggregates.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from ..operators.incremental import aggregate_delta, merge_aggregate_state


def read_state(spark, path: str, schema: str) -> DataFrame:
    """Current aggregate table (empty frame with ``schema`` before the
    first commit)."""
    manifest = os.path.join(path, "MANIFEST.json")
    if not os.path.exists(manifest):
        return spark.createDataFrame([], schema)
    with open(manifest) as f:
        version = json.load(f)["version"]
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def _commit(df: DataFrame, path: str) -> None:
    manifest = os.path.join(path, "MANIFEST.json")
    version = 0
    if os.path.exists(manifest):
        with open(manifest) as f:
            version = json.load(f)["version"] + 1
    df.write.mode("overwrite").parquet(os.path.join(path, f"v={version}"))
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version}, f)
    os.replace(tmp, manifest)


def streaming_aggregate(
    stream: DataFrame,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    path: str,
    checkpoint: str,
    state_schema: str,
):
    """Maintain ``groupBy(keys).agg(specs)`` over a stream; returns the
    StreamingQuery. ``specs``: out_col -> (in_col, fn) with fn in
    sum/count/min/max (merge_aggregate_state's algebraic contract —
    avg rides as (sum, count); holistic aggregates need sketches).
    ``state_schema`` is the DDL of the state table (keys + out cols),
    needed to type the empty frame before the first commit."""
    spark = stream.sparkSession

    def _merge(batch: DataFrame, _epoch: int) -> None:
        state = read_state(spark, path, state_schema)
        _commit(merge_aggregate_state(state, batch, keys, specs), path)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )
