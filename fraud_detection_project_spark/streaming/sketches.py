"""Streaming count-min maintenance — a frequency sketch kept current
over an event stream.

North-star composition: the batch sketch
(operators/sketches.py:count_min_table) is SUM-MERGEABLE — counters of
two disjoint batches add cell-wise to exactly the counters of their
union. That makes the streaming form trivial and exact: inside
``foreachBatch``, sketch the micro-batch (bounded shuffle: at most
depth*width rows) and cell-wise add it into the persisted sketch
table. No state store, no watermark — the sketch IS the state, and it
is bounded by depth*width forever, no matter how many events stream
through. This is the streaming answer to "running heavy-hitters /
rate estimates over an unbounded key domain" where exact per-key
state would grow without bound.

The persisted sketch uses the same atomic versioned-manifest contract
as streaming/upsert.py: each micro-batch writes a new version
directory and flips the manifest last, so readers never see a torn
sketch. foreachBatch is AT-LEAST-ONCE: a crash between the manifest
flip and the streaming checkpoint commit replays the same micro-batch
under the same epoch id — the manifest therefore also records the
last-applied epoch, and a merge with ``epoch <= last_applied`` is a
no-op, making replays idempotent (ADVICE r5).

Stream ≡ batch exactness (cell-wise, hence estimate-wise) is the
pytest oracle: tests/test_streaming.py::TestStreamingCountMin.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import count_min_table

_SCHEMA = "depth INT, bucket BIGINT, cnt BIGINT"


def read_sketch(spark, path: str) -> DataFrame:
    """Current sketch state (empty frame before the first batch).

    Schema tolerance (ADVICE r10): sketch state persisted before the
    round-10 ``d`` -> ``depth`` column rename stores the OLD column
    name — read_sketch returns the parquet's stored schema, so without
    a rename-on-read every pre-upgrade sketch directory would make
    ``merge_sketch_batch``'s ``unionByName("depth", ...)`` raise and
    the state would be unreadable after upgrade. Old layouts are
    therefore normalized here, once, at the read boundary; newly
    committed manifests also record ``schema`` so future migrations
    can key off an explicit version instead of column sniffing."""
    manifest = os.path.join(path, "MANIFEST.json")
    if not os.path.exists(manifest):
        return spark.createDataFrame([], _SCHEMA)
    with open(manifest) as f:
        version = json.load(f)["version"]
    df = spark.read.parquet(os.path.join(path, f"v={version}"))
    if "d" in df.columns and "depth" not in df.columns:
        df = df.withColumnRenamed("d", "depth")
    return df


def _manifest_state(manifest: str) -> dict:
    if not os.path.exists(manifest):
        return {"version": -1, "epoch": -1, "stream_id": None}
    with open(manifest) as f:
        m = json.load(f)
    m.setdefault("epoch", -1)  # pre-epoch manifests
    if m["epoch"] is None:
        # a batch-mode commit (epoch=None) json-round-trips to null;
        # normalize so the replay comparison below never TypeErrors on
        # mixed batch/stream use of one sketch path (ADVICE r11)
        m["epoch"] = -1
    m.setdefault("stream_id", None)  # pre-identity manifests
    return m


def _is_replay(state: dict, epoch: int | None, stream_id: str | None) -> bool:
    """True iff this (stream_id, epoch) was already applied.

    Epoch ids are scoped to a streaming CHECKPOINT: a restart against a
    new checkpoint resets them to 0, so an epoch-only guard would
    silently DROP genuinely new batches until the fresh ids caught up
    with the manifest's (ADVICE r11 — the same reason Delta keys
    idempotent writes on txnAppId+txnVersion, not version alone). The
    manifest therefore records the stream identity (the checkpoint
    location — exactly the scope of the epoch counter) and a replay is
    recognized only when the identity matches AND the epoch EQUALS the
    last applied. Strict equality, not ``<=`` (VERDICT r12 item 1):
    foreachBatch's at-least-once contract only ever re-delivers the
    LAST uncommitted epoch, never an older one, so within one stream
    incarnation the merge can never legitimately see ``epoch <
    last_applied``. The one way that comparison arises is checkpoint
    LOSS at the SAME path — the user deletes the checkpoint dir but
    keeps the state dir and restarts; epochs reset to 0 while
    ``stream_id`` still matches — and that is a NEW incarnation whose
    batches must apply (the old ``<=`` guard silently dropped every
    batch until the fresh ids caught up). The merge then rolls the
    manifest epoch forward (backward, numerically) so the new
    incarnation's own replays are still caught by equality. A legacy
    manifest without ``stream_id`` (None) never matches a real
    checkpoint id, so the first post-upgrade batch always applies; the
    one-commit replay window across that upgrade boundary is
    documented, not guarded."""
    return (
        epoch is not None
        and epoch == state["epoch"]
        and state["stream_id"] == stream_id
    )


# Persisted-state schema version: 1 = pre-round-10 layout (count-min
# column named ``d``), 2 = current (``depth``). Recorded in every new
# manifest commit; absent (pre-versioning) manifests are treated as
# whatever layout their parquet actually stores (read_sketch sniffs).
_STATE_SCHEMA_VERSION = 2


def _commit_manifest(
    manifest: str, version: int, epoch: int | None,
    stream_id: str | None = None,
) -> None:
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"version": version, "epoch": epoch, "stream_id": stream_id,
             "schema": _STATE_SCHEMA_VERSION},
            f,
        )
    os.replace(tmp, manifest)


def _gc_versions(path: str, prefix: str, keep_versions: int = 2) -> None:
    """Drop state version dirs (``{prefix}{n}``) older than the newest
    ``keep_versions`` (round-11 audit: without GC a long-running
    stream's version history grows with stream LENGTH — the sketch
    itself is bounded, its directory was not). The committed version is
    always in the kept suffix: versions are monotonic."""
    import shutil

    versions = sorted(
        (d for d in os.listdir(path)
         if d.startswith(prefix) and d[len(prefix):].isdigit()
         and os.path.isdir(os.path.join(path, d))),
        key=lambda d: int(d[len(prefix):]),
    )
    for d in versions[: max(0, len(versions) - max(2, keep_versions))]:
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def merge_sketch_batch(
    spark,
    batch: DataFrame,
    key: str,
    path: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
    epoch: int | None = None,
    stream_id: str | None = None,
) -> None:
    """state' = state ⊕ sketch(batch): cell-wise counter addition via a
    full-outer union-agg (both sides are sketch-sized). Atomic
    version-flip commit; when ``epoch`` is given (the foreachBatch
    epoch id), a batch already recorded in the manifest UNDER THE SAME
    ``stream_id`` is a NO-OP — at-least-once replays after a crash
    between manifest flip and checkpoint commit must not double-count,
    while a restart against a fresh checkpoint (epochs reset to 0)
    must not be dropped (see :func:`_is_replay`)."""
    manifest = os.path.join(path, "MANIFEST.json")
    state = _manifest_state(manifest)
    if _is_replay(state, epoch, stream_id):
        return
    delta = count_min_table(batch, key, depth=depth, width=width, seed=seed)
    merged = (
        read_sketch(spark, path)
        .unionByName(delta.select(
            F.col("depth").cast("int"), F.col("bucket"), F.col("cnt")
        ))
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    version = state["version"] + 1
    merged.write.mode("overwrite").parquet(os.path.join(path, f"v={version}"))
    _commit_manifest(manifest, version, epoch, stream_id)
    _gc_versions(path, "v=")


def streaming_count_min(
    stream: DataFrame,
    key: str,
    path: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
    available_now: bool = False,
):
    """Maintain the sketch over a stream; returns the StreamingQuery.
    ``read_sketch(spark, path)`` serves estimates at any time (probe
    with operators/sketches.py machinery). ``available_now=True``
    drains the current backlog and terminates by itself — the
    batch-parity/catch-up mode, same as :func:`streaming_ams_f2`."""
    spark = stream.sparkSession

    def _merge(batch: DataFrame, epoch: int) -> None:
        # the checkpoint location IS the epoch counter's scope — use it
        # as the replay-guard identity (ADVICE r11)
        merge_sketch_batch(
            spark, batch, key, path,
            depth=depth, width=width, seed=seed, epoch=epoch,
            stream_id=checkpoint,
        )

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_HIST_SCHEMA = "bin INT, cnt BIGINT, lo DOUBLE, hi DOUBLE, n_bins INT"


def read_histogram(spark, path: str) -> DataFrame:
    """Current histogram-sketch state (empty before the first batch)."""
    manifest = os.path.join(path, "HIST_MANIFEST.json")
    if not os.path.exists(manifest):
        return spark.createDataFrame([], _HIST_SCHEMA)
    with open(manifest) as f:
        version = json.load(f)["version"]
    return spark.read.parquet(os.path.join(path, f"hv={version}"))


def merge_histogram_batch(
    spark,
    batch: DataFrame,
    col: str,
    path: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
    epoch: int | None = None,
    stream_id: str | None = None,
) -> None:
    """state' = state ⊕ histogram(batch): bin counts add — the same
    sum-mergeability contract as the count-min path above, so the
    streaming histogram is EXACT (cell-wise equal to the batch build
    over all data seen). The range must be pinned up front — quantile
    serving at any time via
    ``operators.sketches.quantiles_from_histogram``. Atomic
    version-flip commit; a replayed foreachBatch epoch (``epoch <=``
    the manifest's last applied) is a NO-OP, so at-least-once replays
    never double-count bins."""
    from ..operators.sketches import histogram_sketch

    manifest = os.path.join(path, "HIST_MANIFEST.json")
    state = _manifest_state(manifest)
    if _is_replay(state, epoch, stream_id):
        return
    delta = histogram_sketch(batch, col, n_bins=n_bins, lo=lo, hi=hi)
    merged = (
        read_histogram(spark, path)
        .unionByName(
            delta.select(
                F.col("bin").cast("int"),
                F.col("cnt").cast("long"),
                "lo", "hi",
                F.col("n_bins").cast("int"),
            )
        )
        .groupBy("bin", "lo", "hi", "n_bins")
        .agg(F.sum("cnt").alias("cnt"))
        .select("bin", "cnt", "lo", "hi", "n_bins")
    )
    version = state["version"] + 1
    merged.write.mode("overwrite").parquet(os.path.join(path, f"hv={version}"))
    _commit_manifest(manifest, version, epoch, stream_id)
    _gc_versions(path, "hv=")


def streaming_histogram(
    stream: DataFrame,
    col: str,
    path: str,
    checkpoint: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
    available_now: bool = False,
):
    """Maintain a quantile-serving histogram sketch over a stream;
    state is bounded by ``n_bins`` rows forever. ``available_now=True``
    drains the current backlog and terminates by itself — the
    batch-parity/catch-up mode, same as :func:`streaming_ams_f2`."""
    spark = stream.sparkSession

    def _merge(batch: DataFrame, epoch: int) -> None:
        merge_histogram_batch(
            spark, batch, col, path, lo=lo, hi=hi, n_bins=n_bins,
            epoch=epoch, stream_id=checkpoint,
        )

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming AMS F₂ maintenance (round 7): the second-frequency-moment
# sketch is ADD-mergeable at the atom level — each estimator's state is
# the signed sum Z_j = Σ_u sign_j(u)·c_u, and a micro-batch contributes
# Σ_rows sign_j(key) to it, so state' = state + delta exactly. 8 rows
# of state forever; estimate F₂ ≈ Z_j² served via mean/median across
# estimators (see queries.ams_f2_sketch_audit for the batch twin and
# the sign-hash convention). Same versioned-manifest + epoch-replay
# contract as the count-min/histogram paths above.
# ---------------------------------------------------------------------------

_AMS_SCHEMA = "j INT, z BIGINT"


def read_ams(spark, path: str) -> DataFrame:
    """Current AMS state (empty before the first batch)."""
    manifest = os.path.join(path, "AMS_MANIFEST.json")
    if not os.path.exists(manifest):
        return spark.createDataFrame([], _AMS_SCHEMA)
    with open(manifest) as f:
        version = json.load(f)["version"]
    return spark.read.parquet(os.path.join(path, f"av={version}"))


def _ams_batch_delta(batch: DataFrame, key: str, n_estimators: int) -> DataFrame:
    """Per-estimator signed-sum delta for one micro-batch.

    Sign-hash hygiene (ADVICE r7): ``cast('long')`` on a non-integral
    key yields NULL, the ``when`` condition is NULL, and every row
    would take ``otherwise(-1)`` — Z_j = −batch_count and the F₂
    estimate silently becomes n². Keys therefore enter through the
    SHARED ``sketch_key_expr`` helper (operators/sketches.py — the
    same pre-hash bloom_semi_join uses, so AMS and bloom draw
    identically for the same key): non-integral keys pre-hash via
    ``pmod(xxhash64(key), 999983)``. The affine stage then runs
    through ``pmod`` rather than ``%`` so a NEGATIVE integral key
    (Spark ``%`` keeps the dividend's sign) still spreads across both
    signs. For non-negative integral keys pmod ≡ %, so the draw is
    bit-identical to the batch twin's oracle
    (queries.ams_f2_sketch_audit)."""
    from ..operators.sketches import sketch_key_expr

    base = sketch_key_expr(batch, key)
    sign = F.when(
        F.pmod(
            F.pmod(base * (1000003 + 2 * F.col("j")) + 7, F.lit(999983))
            * 40503,
            F.lit(999983),
        )
        < 499991,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        batch.select(F.col(key))
        .withColumn(
            "j", F.explode(F.sequence(F.lit(0), F.lit(n_estimators - 1)))
        )
        .groupBy("j")
        .agg(F.sum(sign).cast("long").alias("z"))
    )


def merge_ams_batch(
    spark,
    batch: DataFrame,
    key: str,
    path: str,
    n_estimators: int = 8,
    epoch: int | None = None,
    stream_id: str | None = None,
) -> None:
    """state' = state + ams(batch): per-estimator signed sums add.
    Atomic version-flip commit; a replayed foreachBatch epoch
    (``epoch <=`` the manifest's last applied, SAME ``stream_id``) is a
    NO-OP (see :func:`_is_replay`)."""
    manifest = os.path.join(path, "AMS_MANIFEST.json")
    state = _manifest_state(manifest)
    if _is_replay(state, epoch, stream_id):
        return
    delta = _ams_batch_delta(batch, key, n_estimators)
    merged = (
        read_ams(spark, path)
        .unionByName(delta.select(F.col("j").cast("int"), "z"))
        .groupBy("j")
        .agg(F.sum("z").cast("long").alias("z"))
    )
    version = state["version"] + 1
    merged.write.mode("overwrite").parquet(os.path.join(path, f"av={version}"))
    _commit_manifest(manifest, version, epoch, stream_id)
    _gc_versions(path, "av=")


def ams_f2_estimate(spark, path: str) -> DataFrame:
    """Serve the current F₂ estimate: mean and median of Z_j² across
    the estimators — one row, computable at any time from the 8-row
    state."""
    state = read_ams(spark, path)
    sq = state.select((F.col("z") * F.col("z")).cast("double").alias("e"))
    return sq.agg(
        F.avg("e").alias("f2_mean"),
        F.percentile("e", F.lit(0.5)).alias("f2_median"),
        F.count(F.lit(1)).cast("long").alias("n_estimators"),
    )


def streaming_ams_f2(
    stream: DataFrame,
    key: str,
    path: str,
    checkpoint: str,
    n_estimators: int = 8,
    available_now: bool = False,
):
    """Maintain the AMS F₂ sketch over a stream; serve with
    :func:`ams_f2_estimate` at any time. ``available_now=True`` runs
    with ``Trigger.AvailableNow`` — drains everything currently in the
    source (still honoring ``maxFilesPerTrigger`` batching) and stops
    by itself, so a bounded caller can just ``awaitTermination()``."""
    spark = stream.sparkSession

    def _merge(batch: DataFrame, epoch: int) -> None:
        merge_ams_batch(
            spark, batch, key, path,
            n_estimators=n_estimators, epoch=epoch, stream_id=checkpoint,
        )

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
