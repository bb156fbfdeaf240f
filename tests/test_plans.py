"""Plan-shape regression tests (VERDICT r1 #7): lock the physical-plan
properties the 100x story depends on, so a Spark/AQE upgrade or a query
edit can't silently regress them.

The assertions live in tools/plan_audit.py (also runnable standalone
against any sf); here they run in CI against sf0.001.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(ROOT, "tools") not in sys.path:
    sys.path.insert(0, os.path.join(ROOT, "tools"))

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_plan_shapes(spark):
    from plan_audit import audit

    failures = audit(spark, SF_DIR)
    assert failures == []


def test_runtime_bloom_filter_injection(spark):
    """Runtime row-level bloom filter: with a selective build side, the
    probe-side scan gains a might_contain() pre-filter so non-joining
    rows die before the shuffle — the 100 TB fact⋈selective-dim shape.
    Locally the 10 GB application-side threshold gates it off; the test
    lowers the thresholds to prove the mechanism wires through.
    """
    from fraud_detection_project_spark.catalog import load_table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        li = load_table(spark, SF_SMOKE, "lineitem")
        orders = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt
        # and the filtered result is still correct
        (row,) = j.collect()
        want = (
            li.join(orders.hint("broadcast"), li.l_orderkey == orders.o_orderkey)
            .count()
        )
        assert row["count"] == want
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
