"""Streaming CDC upsert sink — continuously MERGE a change stream into
a base snapshot.

North-star composition: ``operators/merge.py`` gives batch MERGE
semantics; this wires it into Structured Streaming via
``foreachBatch``, the standard Spark pattern for upsert sinks (the
built-in file sink is append-only). Each micro-batch:

1. compacts the batch's changes to latest-per-key (map-side ``max_by``),
2. merges them into the current snapshot with
   :func:`~..operators.merge.merge_apply`,
3. commits the result ATOMICALLY: the merged frame is written to a
   fresh versioned directory (``v00000042/``) and the ``_MANIFEST``
   pointer file is flipped to it with ``os.replace`` — a single-syscall
   atomic rename on POSIX. A crash at ANY point leaves the manifest
   pointing at the previous complete version; a half-written version
   directory is unreferenced garbage, never a corrupt snapshot. This is
   exactly the miniature of a table format's commit protocol (Iceberg /
   Delta flip a metadata pointer over immutable data files), so the
   local layout upgrades 1:1 to a cluster object store.

Exactly-once story: ``foreachBatch`` re-delivers a batch after failure.
Seed the snapshot WITH the ``seq_col`` so every row records the change
that produced it: ``merge_apply``'s seq guard then makes a replayed
batch a no-op past the recorded seq (and with ``keep_tombstones=True``
in the batch operator, arbitrary-order redelivery also converges).

Scale: the snapshot rewrite is proportional to the snapshot, not the
stream; with a partitioned base only partitions containing changed keys
need rewriting (dynamic overwrite) — the batch operator's broadcast
path already avoids shuffling the base. Old versions are garbage
collected after commit, keeping ``keep_versions`` behind for readers
in flight (time travel is the same dial turned up).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import merge_apply

MANIFEST = "_MANIFEST"
_VERSION_PREFIX = "v"
_VERSION_DIGITS = 8


def _manifest_path(root: str) -> str:
    return os.path.join(root, MANIFEST)


def current_version(root: str) -> str | None:
    """Name of the committed version directory, or None if uninitialized."""
    try:
        with open(_manifest_path(root)) as f:
            v = f.read().strip()
        return v or None
    except FileNotFoundError:
        return None


def _commit(root: str, version: str) -> None:
    """Atomically point the manifest at ``version``: write a unique temp
    file, fsync it, ``os.replace`` over the manifest (atomic on POSIX —
    readers see either the old or the new pointer, never a partial
    write), then fsync the parent DIRECTORY so the rename itself is
    durable — without it a power loss could persist a later GC unlink
    but not this rename, leaving the manifest pointing at a deleted
    version."""
    tmp = _manifest_path(root) + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        f.write(version + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(root))
    dfd = os.open(root, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _gc(root: str, keep_versions: int) -> None:
    """Drop version directories older than the newest ``keep_versions``.
    Only unreferenced history is removed; the committed version is always
    within the kept suffix because version numbers are monotonic."""
    versions = sorted(
        d
        for d in os.listdir(root)
        if d.startswith(_VERSION_PREFIX)
        and d[len(_VERSION_PREFIX) :].isdigit()
        and os.path.isdir(os.path.join(root, d))
    )
    for d in versions[: max(0, len(versions) - keep_versions)]:
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)


def init_snapshot(df: DataFrame, root: str) -> str:
    """Seed a versioned snapshot root with ``df`` as version 0."""
    os.makedirs(root, exist_ok=True)
    v = f"{_VERSION_PREFIX}{0:0{_VERSION_DIGITS}d}"
    df.write.mode("overwrite").parquet(os.path.join(root, v))
    _commit(root, v)
    return v


def list_versions(root: str) -> list[str]:
    """Version directories still on disk, oldest first (the committed
    one plus up to ``keep_versions - 1`` predecessors)."""
    return sorted(
        d
        for d in os.listdir(root)
        if d.startswith(_VERSION_PREFIX)
        and d[len(_VERSION_PREFIX) :].isdigit()
        and os.path.isdir(os.path.join(root, d))
    )


def read_snapshot(
    spark: SparkSession, root: str, version: int | str | None = None
) -> DataFrame:
    """The committed snapshot (resolves the manifest pointer), or —
    time travel — a retained historical ``version`` (int number or
    directory name). History depth is the sink's ``keep_versions``
    dial; asking for a GC'd version raises with what IS available."""
    if version is None:
        v = current_version(root)
        if v is None:
            raise FileNotFoundError(
                f"no committed snapshot at {root!r} — seed with init_snapshot()"
            )
    else:
        v = (
            f"{_VERSION_PREFIX}{int(version):0{_VERSION_DIGITS}d}"
            if not isinstance(version, str)
            else version
        )
        if not os.path.isdir(os.path.join(root, v)):
            raise FileNotFoundError(
                f"version {v!r} not retained at {root!r} "
                f"(available: {list_versions(root)}; raise keep_versions "
                "on apply_cdc_stream for deeper history)"
            )
    return spark.read.parquet(os.path.join(root, v))


def plan_batch_merge(
    base: DataFrame,
    batch: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    broadcast_threshold_rows: int = 2_000_000,
) -> DataFrame:
    """The merged snapshot for one micro-batch, with the join shape
    picked from the MEASURED batch size.

    ``merge_apply``'s broadcast path (base payload never shuffles) is
    only safe while the changeset actually fits executor memory. A
    steady-state CDC trigger satisfies that by construction, but
    ``availableNow=True`` drains the WHOLE backlog as micro-batches
    whose size the trigger does not bound — after an outage or on first
    catch-up, one batch can be months of history, and an unconditional
    ``F.broadcast`` there is the same data-proportional forced
    broadcast the plan-audit census retires from batch queries (it
    cannot see this path: ``foreachBatch`` plans are never registered).
    So the sink probes the batch size and uses the broadcast split
    shape only under ``broadcast_threshold_rows`` (default 2M rows ≈
    low hundreds of MB packed — inside executor broadcast budgets);
    above it, the full-outer sort-merge shape shuffles the base once
    instead of OOMing the driver.

    Probe cost (ADVICE r11 → ADVICE r12 → measured, round 13): the
    probe went through three designs. A bounded
    ``limit(threshold+1).count()`` looked cheaper than a full
    ``count()`` (foreachBatch does not persist the batch, so any probe
    recomputes it from source), but its physical plan is per-partition
    LocalLimit + a single-partition shuffle for GlobalLimit — each
    partition can emit up to threshold+1 ROWS, so the probe work is
    O(partitions × threshold) in materialized rows (ADVICE r12). A
    plain ``count()`` instead prunes to ZERO columns (parquet serves
    it near-metadata-speed) and shuffles only one partial count per
    partition. Measured on local[32], warm best-of-3 (round 13):
    100k-row batch — count 0.19s vs limit-probe 0.22s; 2.1M-row
    backlog — count 0.48s vs limit-probe 1.31s; end-to-end
    (probe + one aggregate pass standing in for the merge) —
    count 0.80s vs limit-probe 1.33s vs a persist()/unpersist()
    bracket 1.98s (materializing the batch costs more than the
    second zero-column scan it saves, at BOTH sizes). So: plain
    ``count()``, no persist."""
    probe = batch.count()
    small = probe <= broadcast_threshold_rows
    return merge_apply(
        base, batch, keys=keys, seq_col=seq_col, op_col=op_col,
        delete_op=delete_op, broadcast_changes=small,
    )


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
    keep_versions: int = 2,
    broadcast_threshold_rows: int = 2_000_000,
):
    """Run the change stream into the versioned snapshot at
    ``snapshot_path`` (a root seeded by :func:`init_snapshot`).

    Returns the StreamingQuery. ``available_now=True`` drains what's
    there and stops — the batch-parity test mode; ``False`` runs
    continuously. ``keep_versions`` controls how much history survives
    GC (min 2: current + previous for in-flight readers).
    ``broadcast_threshold_rows`` bounds the batch size that may take
    the broadcast merge shape — see :func:`plan_batch_merge`.
    """

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        cur = current_version(snapshot_path)
        if cur is None:
            raise FileNotFoundError(
                f"no committed snapshot at {snapshot_path!r} — "
                "seed with init_snapshot()"
            )
        base = spark.read.parquet(os.path.join(snapshot_path, cur))
        merged = plan_batch_merge(
            base, batch, keys=keys, seq_col=seq_col, op_col=op_col,
            delete_op=delete_op,
            broadcast_threshold_rows=broadcast_threshold_rows,
        )
        nxt = f"{_VERSION_PREFIX}{int(cur[len(_VERSION_PREFIX):]) + 1:0{_VERSION_DIGITS}d}"
        # overwrite handles a replayed batch whose version dir half-exists
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_path, nxt)
        )
        _commit(snapshot_path, nxt)
        _gc(snapshot_path, max(2, keep_versions))

    writer = changes_stream.writeStream.foreachBatch(merge_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
