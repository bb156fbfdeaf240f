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


class TestImmediateDefinitions:
    """ADVICE r8: the generic fullname-token test must see only the
    key's own name and its IMMEDIATE defining expression — neighbouring
    bindings in the same Project list must not leak in."""

    def test_neighbour_binding_does_not_rescue_entity_key(self):
        # a column literally named `label` sits just before the
        # entity key's binding in the same Project list
        plan = (
            "Project [x#2 AS label#3, user_id#1L AS ukey#7L]\n"
            "HashAggregate(keys=[ukey#7L], functions=[count(1)])"
        )
        defn = pa._immediate_definitions(plan, "ukey#7L")
        assert "label" not in defn
        assert "user_id" in defn
        op = "HashAggregate(keys=[ukey#7L], functions=[count(1)])"
        assert not pa._agg_bounds(op, plan)

    def test_own_definition_with_generic_token_still_bounds(self):
        # the key IS a renamed column literally named `group`
        plan = (
            "Project [group#2 AS g2#7]\n"
            "HashAggregate(keys=[g2#7], functions=[count(1)])"
        )
        assert "group" in pa._immediate_definitions(plan, "g2#7")
        op = "HashAggregate(keys=[g2#7], functions=[count(1)])"
        assert pa._agg_bounds(op, plan)

    def test_mode_aggregate_call_does_not_rescue(self):
        # mode(entity) is the MODE AGGREGATE over an entity column,
        # not a column named `mode` — must stay unbounded
        plan = (
            "HashAggregate(keys=[k#9L], functions=[])\n"
            "Project [mode(user_id#1L) AS k#9L]"
        )
        op = "HashAggregate(keys=[k#9L], functions=[])"
        assert not pa._agg_bounds(op, plan)

    def test_unmatched_open_bracket_trims(self):
        # binding inside a bracketed list: the '[' just before the
        # expression must end the backward scan
        plan = "Project [user_id#1L AS ukey#7L]"
        assert pa._immediate_definitions(plan, "ukey#7L").strip() == "user_id#1L"

    def test_nested_call_kept_whole(self):
        plan = "Project [floor((v#1 / 10.0)) AS b#5]"
        d = pa._immediate_definitions(plan, "b#5")
        assert "floor" in d and "v#1" in d

    def test_non_attribute_key_returns_empty(self):
        assert pa._immediate_definitions("Project [x#1]", "CASE WHEN") == ""

    def test_neighbour_to_date_does_not_rescue_entity_key(self):
        # round-9 hardening: the domain-reducing-fn rule is also scoped
        # to the immediate definition — a calendar truncation bound to
        # a NEIGHBOURING column must not bound an entity key
        plan = (
            "Project [to_date(ts#2) AS d#3, user_id#1L AS ukey#7L]\n"
            "HashAggregate(keys=[ukey#7L], functions=[count(1)])"
        )
        op = "HashAggregate(keys=[ukey#7L], functions=[count(1)])"
        assert not pa._agg_bounds(op, plan)

    def test_neighbour_literal_case_does_not_rescue_entity_key(self):
        plan = (
            "Project [CASE WHEN (v#2 > 5.0) THEN 1 ELSE 0 END AS flag#3, "
            "user_id#1L AS ukey#7L]\n"
            "HashAggregate(keys=[ukey#7L], functions=[count(1)])"
        )
        op = "HashAggregate(keys=[ukey#7L], functions=[count(1)])"
        assert not pa._agg_bounds(op, plan)

    def test_neighbour_bounded_word_does_not_rescue_entity_key(self):
        # even the broad word-token rule is definition-scoped now
        plan = (
            "Project [event_type#2, user_id#1L AS ukey#7L]\n"
            "HashAggregate(keys=[ukey#7L], functions=[count(1)])"
        )
        op = "HashAggregate(keys=[ukey#7L], functions=[count(1)])"
        assert not pa._agg_bounds(op, plan)


class TestBroadcastSubtreeScans:
    """VERDICT r8 item 2: detector for an explicit broadcast of a frame
    derived from a named table (the gdpr victim-set hazard class)."""

    FORCED = """AdaptiveSparkPlan isFinalPlan=false
+- HashAggregate(keys=[], functions=[count(1)])
   +- BroadcastHashJoin [k#3L], [user_id#1L], LeftOuter, BuildRight, false
      :- FileScan parquet [c_custkey#3L] ... customer.parquet
      +- BroadcastExchange HashedRelationBroadcastMode
         +- HashAggregate(keys=[user_id#1L], functions=[])
            +- FileScan parquet [user_id#1L] ... events.parquet"""

    CLEAN = """AdaptiveSparkPlan isFinalPlan=false
+- HashAggregate(keys=[], functions=[count(1)])
   +- SortMergeJoin [k#3L], [user_id#1L], LeftOuter
      :- FileScan parquet [c_custkey#3L] ... customer.parquet
      +- HashAggregate(keys=[user_id#1L], functions=[])
         +- FileScan parquet [user_id#1L] ... events.parquet"""

    DIM_BROADCAST = """AdaptiveSparkPlan isFinalPlan=false
+- BroadcastHashJoin [l_orderkey#2L], [o_orderkey#4L], Inner, BuildRight
   :- FileScan parquet [l_orderkey#2L] ... lineitem.parquet
   +- BroadcastExchange HashedRelationBroadcastMode
      +- FileScan parquet [o_orderkey#4L] ... orders.parquet"""

    def test_forced_broadcast_of_events_frame_detected(self):
        assert pa._broadcast_subtree_scans(self.FORCED, "events")

    def test_shuffle_join_clean(self):
        assert not pa._broadcast_subtree_scans(self.CLEAN, "events")

    def test_other_table_broadcast_ignored(self):
        # an orders dim broadcast must not trip the events check
        assert not pa._broadcast_subtree_scans(self.DIM_BROADCAST, "events")
        assert pa._broadcast_subtree_scans(self.DIM_BROADCAST, "orders")


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
