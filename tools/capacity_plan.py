"""Spill-aware capacity planner: size shuffle partitioning for a target
scale factor BEFORE running the job.

The brief's scale contract: `spark.sql.shuffle.partitions` and
`spark.sql.files.maxPartitionBytes` must be sized so every partition
fits in executor memory at the target SF — a partition that outgrows
the per-task memory share spills to disk (sort/aggregate) or OOMs
(hash join build side).

Method (all from parquet footers — no Spark job, no data read):

1. measure on-disk bytes + row counts per table at a reference SF;
2. extrapolate linearly to the target SF multiplier (facts scale with
   rows; TPC-H-ish dims scale sublinearly, flagged but extrapolated
   conservatively as linear);
3. estimate in-memory/shuffle width as ``bytes_on_disk x INFLATION``
   (parquet's encoding+compression typically deflates 3-6x vs row-wire
   shuffle pages; 4x is the planning default — the safe direction is
   up);
4. recommend:
   - ``shuffle.partitions`` = ceil(total shuffle bytes of the LARGEST
     single-table shuffle / TARGET_PARTITION_BYTES), floored at the
     cluster's task slots (below that, cores idle) and snapped up so
     AQE can only coalesce (splitting is the expensive direction);
   - ``maxPartitionBytes`` left at 128 MiB unless rows are so wide
     that a scan partition would exceed the task memory share;
   - per-table rows/bytes table so skew-prone keys can be cross-read
     against ``operators/skew.py:skew_report``.

Usage:
    python tools/capacity_plan.py [sf_dir] [--target-mult 1000]
        [--executors 1000] [--cores 4] [--task-mem-mb 1024]

Prints one JSON document. AQE remains the runtime corrector
(coalescing small partitions, splitting skewed joins); this tool sets
the STARTING grid so AQE corrects at the margin instead of rescuing a
wrong order of magnitude.
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os

import pyarrow.parquet as pq

TARGET_PARTITION_BYTES = 128 * 1024 * 1024  # the canonical 128 MiB
INFLATION = 4.0  # parquet-on-disk -> shuffle-page width planning factor

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
DIMS = {"region", "nation", "customer", "supplier", "part"}


def table_stats(sf_dir: str) -> dict[str, dict]:
    out = {}
    for t in TABLES:
        paths = sorted(
            glob.glob(os.path.join(sf_dir, f"{t}.parquet"))
            + glob.glob(os.path.join(sf_dir, t, "*.parquet"))
        )
        if not paths:
            continue
        rows, disk = 0, 0
        for p in paths:
            md = pq.ParquetFile(p).metadata
            rows += md.num_rows
            disk += os.path.getsize(p)
        out[t] = {
            "rows": rows,
            "bytes_on_disk": disk,
            "bytes_per_row": disk / rows if rows else 0.0,
            "is_dim": t in DIMS,
        }
    return out


def plan(
    sf_dir: str,
    target_mult: float,
    executors: int,
    cores: int,
    task_mem_mb: int,
) -> dict:
    stats = table_stats(sf_dir)
    slots = executors * cores
    task_mem = task_mem_mb * 1024 * 1024
    per_table = {}
    worst_shuffle = 0
    for t, s in stats.items():
        target_disk = s["bytes_on_disk"] * target_mult
        shuffle_bytes = target_disk * INFLATION
        per_table[t] = {
            **s,
            "target_bytes_on_disk": int(target_disk),
            "target_shuffle_bytes": int(shuffle_bytes),
        }
        if not s["is_dim"]:
            worst_shuffle = max(worst_shuffle, shuffle_bytes)

    # partitions sized so the WIDEST single-table shuffle lands at the
    # target page size, then floored at task slots and snapped to the
    # next power of two (AQE coalesces down cheaply; splitting up is
    # the expensive direction)
    by_bytes = math.ceil(worst_shuffle / TARGET_PARTITION_BYTES)
    floor = max(by_bytes, slots)
    shuffle_partitions = 1 << max(0, math.ceil(math.log2(max(1, floor))))

    spill_guard = worst_shuffle / max(1, shuffle_partitions)
    widest_row = max(
        (s["bytes_per_row"] * INFLATION for s in stats.values()), default=0
    )
    scan_rows_per_128mb = (
        int(TARGET_PARTITION_BYTES / widest_row) if widest_row else 0
    )
    # Wide-row adjustment (the docstring's maxPartitionBytes promise,
    # ADVICE r5): a 128 MiB scan partition decodes to ~INFLATION x that
    # in memory. If that inflated width exceeds the task memory share,
    # lower maxPartitionBytes so the decoded partition still fits,
    # snapped down to a power-of-two MiB (min 8 MiB) so splits stay
    # row-group-aligned in practice.
    max_partition_bytes = TARGET_PARTITION_BYTES
    inflated_scan = TARGET_PARTITION_BYTES * INFLATION
    if inflated_scan > task_mem:
        fit = int(task_mem / INFLATION)
        mib = max(8, 1 << int(math.log2(max(1, fit // (1024 * 1024)))))
        max_partition_bytes = mib * 1024 * 1024
    return {
        "reference_sf_dir": sf_dir,
        "target_multiplier": target_mult,
        "cluster": {
            "executors": executors,
            "cores_per_executor": cores,
            "task_slots": slots,
            "task_mem_mb": task_mem_mb,
        },
        "recommendations": {
            "spark.sql.shuffle.partitions": shuffle_partitions,
            "spark.sql.files.maxPartitionBytes": max_partition_bytes,
            "spark.sql.adaptive.enabled": True,
            "spark.sql.adaptive.advisoryPartitionSizeInBytes":
                min(TARGET_PARTITION_BYTES, max_partition_bytes),
        },
        "scan_width_check": {
            "widest_inflated_bytes_per_row": round(widest_row, 2),
            "scan_rows_per_128mb_partition": scan_rows_per_128mb,
            "decoded_128mb_scan_bytes": int(TARGET_PARTITION_BYTES
                                            * INFLATION),
            "max_partition_bytes_lowered": bool(
                max_partition_bytes < TARGET_PARTITION_BYTES
            ),
        },
        "spill_check": {
            "worst_single_table_shuffle_bytes": int(worst_shuffle),
            "bytes_per_partition_at_recommendation": int(spill_guard),
            "fits_task_memory": bool(spill_guard <= task_mem),
            "note": (
                "partition share exceeds task memory — raise "
                "shuffle.partitions or executor memory"
                if spill_guard > task_mem
                else "largest per-partition shuffle share fits the "
                "task memory budget"
            ),
        },
        "tables": per_table,
        "assumptions": {
            "disk_to_shuffle_inflation": INFLATION,
            "dims_extrapolated_linearly": sorted(DIMS),
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--target-mult", type=float, default=1000.0)
    ap.add_argument("--executors", type=int, default=1000)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--task-mem-mb", type=int, default=1024)
    a = ap.parse_args()
    print(
        json.dumps(
            plan(a.sf_dir, a.target_mult, a.executors, a.cores, a.task_mem_mb),
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
