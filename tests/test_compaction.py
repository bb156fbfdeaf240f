"""Small-file compaction (sources/compaction.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fraud_detection_project_spark.catalog import load_table
from fraud_detection_project_spark.sources.compaction import (
    compact_parquet,
    dataset_file_stats,
)
from tests.conftest import SF_SMOKE


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    src, dst = str(tmp_path / "small"), str(tmp_path / "compact")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.repartition(64).write.parquet(src)          # thousands-of-small-files shape
    assert dataset_file_stats(src)["n_files"] == 64

    report = compact_parquet(
        spark, src, dst, target_file_bytes=32 * 1024 * 1024
    )
    assert report["n_files_before"] == 64
    assert report["n_files_after"] < 8             # ~sf0.001 events ≪ 32MB
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert b.count() == a.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_range_compaction_layout_prunes(spark, tmp_path):
    """Range-partitioned compaction yields min/max-pruned scans: a
    tight user_id filter should skip most compacted files."""
    src, dst = str(tmp_path / "small"), str(tmp_path / "ranged")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.repartition(32).write.parquet(src)
    compact_parquet(
        spark, src, dst, target_file_bytes=64 * 1024, range_cols=["user_id"]
    )
    df = spark.read.parquet(dst).filter(F.col("user_id") == 3)
    got = {r["event_id"] for r in df.collect()}
    want = {r["event_id"] for r in ev.filter(F.col("user_id") == 3).collect()}
    assert got == want


def test_compaction_refuses_overlapping_paths(spark, tmp_path):
    """dst == src / nested either way must fail fast BEFORE the
    overwrite truncates the source (ADVICE r3)."""
    import pytest

    src = str(tmp_path / "data")
    load_table(spark, SF_SMOKE, "region").write.parquet(src)
    for dst in (src, src + "/sub", str(tmp_path)):
        with pytest.raises(ValueError, match="overlaps"):
            compact_parquet(spark, src, dst)
    # source untouched
    assert spark.read.parquet(src).count() == 5
