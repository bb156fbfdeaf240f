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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(ROOT, "tools") not in sys.path:
    sys.path.insert(0, os.path.join(ROOT, "tools"))

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_plan_shapes(spark):
    from plan_audit import audit

    failures = audit(spark, SF_DIR)
    assert failures == []
