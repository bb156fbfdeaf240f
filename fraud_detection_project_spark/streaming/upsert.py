"""Streaming CDC upsert sink — continuously MERGE a change stream into
a base snapshot.

North-star composition: ``operators/merge.py`` gives batch MERGE
semantics; this wires it into Structured Streaming via
``foreachBatch``, the standard Spark pattern for upsert sinks (the
built-in file sink is append-only). Each micro-batch:

1. compacts the batch's changes to latest-per-key (map-side ``max_by``),
2. merges them into the current snapshot with
   :func:`~..operators.merge.merge_apply`,
3. atomically swaps the snapshot directory (write to ``.tmp``, rename).

Exactly-once story: ``foreachBatch`` re-delivers a batch after failure.
Seed the snapshot WITH the ``seq_col`` so every row records the change
that produced it: ``merge_apply``'s seq guard then makes a replayed or
out-of-order batch a no-op past the recorded seq — any delivery order
converges to the same snapshot. At cluster scale the snapshot would live in a table format
with transactional commit (the rename here stands in for that commit —
single-filesystem atomic).

Scale: the snapshot rewrite is proportional to the snapshot, not the
stream; with a partitioned base only partitions containing changed keys
need rewriting (dynamic overwrite) — the batch operator's broadcast
path already avoids shuffling the base.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import merge_apply


def apply_cdc_stream(
    spark: SparkSession,
    changes_stream: DataFrame,
    snapshot_path: str,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Run the change stream into the snapshot at ``snapshot_path``.

    Returns the StreamingQuery. The snapshot parquet must exist (seed it
    with the initial base). ``available_now=True`` drains what's there
    and stops — the batch-parity test mode; ``False`` runs continuously.
    """

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        base = spark.read.parquet(snapshot_path)
        merged = merge_apply(
            base, batch, keys=keys, seq_col=seq_col, op_col=op_col,
            delete_op=delete_op, broadcast_changes=True,
        )
        tmp = snapshot_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(snapshot_path)
        # the double write stands in for an atomic table-format commit;
        # local filesystems can't rename over a non-empty dir portably
        shutil.rmtree(tmp, ignore_errors=True)

    writer = changes_stream.writeStream.foreachBatch(merge_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
