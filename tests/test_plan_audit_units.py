"""Pure-python unit tests for plan_audit's boundedness-detector
internals (no SparkSession): the plan-text parsing helpers are regex/
bracket machinery that plan-format drift or a refactor could silently
break — the in-audit self-tests catch end-to-end vacuity, these pin
the unit semantics (key extraction, AS-binding resolution, the
full-identifier rule for generic tokens from ADVICE r7)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import plan_audit as pa  # noqa: E402


class TestAggGroupKeys:
    def test_simple_keys(self):
        op = "HashAggregate(keys=[event_type#12, user_id#3L], functions=[count(1)])"
        assert pa._agg_group_keys(op) == ["event_type#12", "user_id#3L"]

    def test_nested_brackets_do_not_split(self):
        op = "HashAggregate(keys=[knownfloatingpointnormalized(normalizenanandzero(v#9)), b#2], functions=[])"
        assert pa._agg_group_keys(op) == [
            "knownfloatingpointnormalized(normalizenanandzero(v#9))",
            "b#2",
        ]

    def test_keyless_global_aggregate(self):
        op = "HashAggregate(keys=[], functions=[sum(x#1)])"
        assert pa._agg_group_keys(op) == []

    def test_no_keys_group_returns_none(self):
        assert pa._agg_group_keys("Project [a#1]") is None


class TestAggBounds:
    def test_bounded_word_token(self):
        op = "HashAggregate(keys=[event_type#12], functions=[count(1)])"
        assert pa._agg_bounds(op)

    def test_entity_key_not_bounded(self):
        op = "HashAggregate(keys=[user_id#3L], functions=[count(1)])"
        assert not pa._agg_bounds(op)

    def test_generic_word_requires_full_identifier(self):
        # ADVICE r7: user_group must NOT pass via the 'group' word
        op = "HashAggregate(keys=[user_group#5L], functions=[count(1)])"
        assert not pa._agg_bounds(op)
        # ...but a column literally named 'group' does
        op2 = "HashAggregate(keys=[group#5], functions=[count(1)])"
        assert pa._agg_bounds(op2)

    def test_cluster_label_not_bounded(self):
        op = "HashAggregate(keys=[cluster_label#7L], functions=[count(1)])"
        assert not pa._agg_bounds(op)

    def test_keyless_is_bounded(self):
        assert pa._agg_bounds("HashAggregate(keys=[], functions=[sum(x#1)])")

    def test_as_binding_resolves_domain_reducing_fn(self):
        # the key is an opaque alias; its defining Project binding uses
        # a calendar truncation -> bounded
        plan = (
            "Project [to_date(ts#3) AS d#9]\n"
            "HashAggregate(keys=[d#9], functions=[count(1)])"
        )
        op = "HashAggregate(keys=[d#9], functions=[count(1)])"
        assert pa._agg_bounds(op, plan)

    def test_as_binding_entity_projection_stays_unbounded(self):
        plan = (
            "Project [user_id#3L AS d#9L]\n"
            "HashAggregate(keys=[d#9L], functions=[count(1)])"
        )
        op = "HashAggregate(keys=[d#9L], functions=[count(1)])"
        assert not pa._agg_bounds(op, plan)

    def test_literal_case_key_is_bounded(self):
        op = (
            "HashAggregate(keys=[CASE WHEN (v#1 > 5.0) THEN 1 "
            "ELSE 0 END], functions=[count(1)])"
        )
        assert pa._agg_bounds(op)


class TestWindowPartitionDetection:
    def test_unpartitioned_ordered_window_detected(self):
        op = "Window [row_number() windowspecdefinition(x#1 ASC NULLS FIRST, ...) AS rn#9], [x#1 ASC NULLS FIRST]"
        assert pa._is_unpartitioned(op)

    def test_partitioned_window_ok(self):
        op = "Window [sum(v#2) ...], [k#1], [x#3 ASC NULLS FIRST]"
        assert not pa._is_unpartitioned(op)

    def test_partition_only_window_ok(self):
        op = "Window [sum(v#2) ...], [k#1]"
        assert not pa._is_unpartitioned(op)


class TestUnboundedGlobalWindows:
    PLAN_FLAGGED = """AdaptiveSparkPlan isFinalPlan=false
+- Window [row_number() ... AS rn#20], [c#5L DESC NULLS LAST]
   +- Sort [c#5L DESC NULLS LAST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS
         +- HashAggregate(keys=[user_id#1L], functions=[count(1)])
            +- FileScan parquet [user_id#1L]"""

    PLAN_BOUNDED = """AdaptiveSparkPlan isFinalPlan=false
+- Window [row_number() ... AS rn#20], [c#5L DESC NULLS LAST]
   +- Sort [c#5L DESC NULLS LAST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS
         +- HashAggregate(keys=[event_type#1], functions=[count(1)])
            +- FileScan parquet [event_type#1]"""

    def test_entity_agg_flagged(self):
        assert pa.unbounded_global_windows(self.PLAN_FLAGGED)

    def test_bounded_agg_clean(self):
        assert not pa.unbounded_global_windows(self.PLAN_BOUNDED)
