"""Round-10 fix pins (VERDICT r9 item 4 + the five ADVICE r9 items):

- the fact-derived forced-broadcast census parser (plan-text units; the
  Spark-side end-to-end probes live in plan_audit's own self-tests),
- _scan_table location-token matching (ADVICE: bare substring over the
  whole FileScan line false-flags column names containing a table name),
- _immediate_definitions failing CLOSED when the defining expression
  overruns the truncated context window (ADVICE: residual fail-open),
- the determinism probe's diff printer surviving a cols-only mismatch
  (ADVICE: bare next() raised StopIteration),
- query-result cache eviction across SparkSession restarts (ADVICE:
  dead sessions pinned forever),
- the simhash recall oracle mirroring normalized_text's operation order
  (ADVICE: lower-then-strip vs strip-then-lower diverge off-ASCII).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import plan_audit as pa  # noqa: E402


def _plan(*lines: str) -> str:
    return "\n".join(lines)


SCAN_EVENTS = (
    "FileScan parquet [user_id#1L] Batched: true, Format: Parquet, "
    "Location: InMemoryFileIndex(1 paths)"
    "[file:/root/testdata/sf0.01/events.parquet]"
)
SCAN_NATION = (
    "FileScan parquet [n_nationkey#5L] Batched: true, Format: Parquet, "
    "Location: InMemoryFileIndex(1 paths)"
    "[file:/root/testdata/sf0.01/nation.parquet]"
)


class TestScanTable:
    def test_location_token_wins(self):
        assert pa._scan_table(SCAN_EVENTS) == "events"
        assert pa._scan_table(SCAN_NATION) == "nation"

    def test_column_named_like_table_is_not_matched(self):
        # ADVICE r9: a column/alias containing "events" must not match
        op = (
            "FileScan parquet [events_total#3L] Batched: true, "
            "Location: InMemoryFileIndex(1 paths)"
            "[file:/data/daily_rollup.parquet]"
        )
        assert pa._scan_table(op) == "daily_rollup"

    def test_no_parquet_location(self):
        assert pa._scan_table("Scan ExistingRDD[id#1L]") == ""


class TestBroadcastSubtreeScans:
    def test_flags_scan_inside_exchange(self):
        plan = _plan(
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- HashAggregate(keys=[user_id#1L], functions=[])",
            "   +- " + SCAN_EVENTS,
        )
        assert pa._broadcast_subtree_scans(plan, "events")

    def test_token_match_not_substring(self):
        # an events-NAMED column over a different table must not flag
        plan = _plan(
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- FileScan parquet [n_events#2L] Location: "
            "InMemoryFileIndex[file:/d/nation.parquet]",
        )
        assert not pa._broadcast_subtree_scans(plan, "events")

    def test_scan_outside_exchange_not_flagged(self):
        plan = _plan(
            SCAN_EVENTS,
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- " + SCAN_NATION,
        )
        assert not pa._broadcast_subtree_scans(plan, "events")


class TestFactForcedBroadcasts:
    def test_unbounded_fact_scan_is_flagged(self):
        plan = _plan(
            "BroadcastHashJoin [user_id#1L], [user_id#9L], Inner",
            ":- " + SCAN_EVENTS,
            "+- BroadcastExchange HashedRelationBroadcastMode",
            "   +- HashAggregate(keys=[user_id#9L], functions=[])",
            "      +- " + SCAN_EVENTS,
        )
        offs = pa.fact_forced_broadcasts(plan)
        assert len(offs) == 1 and offs[0].startswith("events via")

    def test_dim_scan_is_not_flagged(self):
        plan = _plan(
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- " + SCAN_NATION,
        )
        assert pa.fact_forced_broadcasts(plan) == []

    def test_keyless_global_agg_bounds(self):
        plan = _plan(
            "BroadcastExchange IdentityBroadcastMode",
            "+- HashAggregate(keys=[], functions=[max(ts_ns#2L)])",
            "   +- " + SCAN_EVENTS,
        )
        assert pa.fact_forced_broadcasts(plan) == []

    def test_enum_key_agg_bounds(self):
        plan = _plan(
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- HashAggregate(keys=[event_type#4], functions=[count(1)])",
            "   +- " + SCAN_EVENTS,
        )
        assert pa.fact_forced_broadcasts(plan) == []

    def test_literal_label_key_bounds(self):
        # benford shape: a union'd panel keyed on lit() source labels —
        # constant codomain, bounded regardless of fact input
        plan = _plan(
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- HashAggregate(keys=[src#7], functions=[sum(n#3L)])",
            "   +- Project [orders_totalprice AS src#7, v#2]",
            "      +- " + SCAN_EVENTS,
        )
        assert pa.fact_forced_broadcasts(plan) == []

    def test_inline_literal_key_bounds(self):
        # Catalyst collapse can inline the literal into keys= itself
        plan = _plan(
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- HashAggregate(keys=[events_value AS src#7],"
            " functions=[count(1)])",
            "   +- " + SCAN_EVENTS,
        )
        assert pa.fact_forced_broadcasts(plan) == []

    def test_zero_arg_generator_key_does_not_bound(self):
        # monotonically_increasing_id() has no attribute refs but is
        # row-cardinality — the `(` guard must keep it unbounded
        plan = _plan(
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- HashAggregate(keys=[mid#7L], functions=[count(1)])",
            "   +- Project [monotonically_increasing_id() AS mid#7L]",
            "      +- " + SCAN_EVENTS,
        )
        assert len(pa.fact_forced_broadcasts(plan)) == 1

    def test_entity_key_agg_does_not_bound(self):
        plan = _plan(
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- HashAggregate(keys=[user_id#1L], functions=[count(1)])",
            "   +- " + SCAN_EVENTS,
        )
        assert len(pa.fact_forced_broadcasts(plan)) == 1

    def test_limit_bounds(self):
        plan = _plan(
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- TakeOrderedAndProject(limit=10, orderBy=[cnt#3L DESC])",
            "   +- " + SCAN_EVENTS,
        )
        assert pa.fact_forced_broadcasts(plan) == []

    def test_fact_scan_outside_exchange_not_flagged(self):
        # the STREAM side of the join scans the fact — fine
        plan = _plan(
            "BroadcastHashJoin [k#1L], [n_nationkey#5L], Inner",
            ":- " + SCAN_EVENTS,
            "+- BroadcastExchange HashedRelationBroadcastMode",
            "   +- " + SCAN_NATION,
        )
        assert pa.fact_forced_broadcasts(plan) == []

    def test_bounding_op_outside_ancestor_path_does_not_rescue(self):
        # a bounded SIBLING branch inside the exchange must not bound
        # the unbounded fact branch next to it
        plan = _plan(
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- BroadcastHashJoin [a#1L], [b#2L], Inner",
            "   :- HashAggregate(keys=[], functions=[count(1)])",
            "   :  +- " + SCAN_NATION,
            "   +- " + SCAN_EVENTS,
        )
        assert len(pa.fact_forced_broadcasts(plan)) == 1


class TestKeyBoundedAggOutputRules:
    def test_functional_dependence_via_bounded_agg_output(self):
        # theil shape: ng is a count OUTPUT of an event_type-keyed agg,
        # so a later groupBy(event_type, ng) frame is |event_type| rows
        plan = _plan(
            "HashAggregate(keys=[event_type#86, ng#92L],"
            " functions=[sum(x#1)], output=[event_type#86, tw#99])",
            "HashAggregate(keys=[event_type#69], functions=[count(1)],"
            " output=[event_type#69, ng#92L])",
        )
        op = ("HashAggregate(keys=[event_type#86, ng#92L],"
              " functions=[sum(x#1)], output=[event_type#86, tw#99])")
        assert pa._agg_bounds(op, plan)

    def test_positional_output_rename_resolves(self):
        # bradley shape: wb#241 is output[1] of an agg whose key[1] is
        # p_brand (bounded), so wins keyed on wb's downstream rename
        # resolves through two hops
        plan = _plan(
            "HashAggregate(keys=[a#267], functions=[sum(w#2L)],"
            " output=[a#267, wins#3L])",
            "HashAggregate(keys=[wb#241, lb#243], functions=[count(1)],"
            " output=[a#267, w#2L])",
            "HashAggregate(keys=[l_orderkey#205L, p_brand#218],"
            " functions=[sum(p#9)], output=[okey#224L, wb#241, ra#242])",
            "Project [p_brand#210 AS lb#243]",
        )
        op = ("HashAggregate(keys=[a#267], functions=[sum(w#2L)],"
              " output=[a#267, wins#3L])")
        assert pa._agg_bounds(op, plan)

    def test_entity_agg_output_does_not_bound(self):
        # a column of a user_id-keyed agg's output is |users|-valued
        plan = _plan(
            "HashAggregate(keys=[c0#631L], functions=[count(1)],"
            " output=[c0#631L, n0#600L])",
            "HashAggregate(keys=[user_id#623L], functions=[min(x#3L)],"
            " output=[c0#631L])",
        )
        op = ("HashAggregate(keys=[c0#631L], functions=[count(1)],"
              " output=[c0#631L, n0#600L])")
        assert not pa._agg_bounds(op, plan)

    def test_pmod_definition_bounds(self):
        plan = ("Project [cast(pmod(xxhash64(event_id#1L, 42), 32) as int)"
                " AS __salt#2]")
        assert pa._key_bounded("__salt#2", plan)

    def test_window_group_limit_bounds_on_bounded_partition(self):
        plan = _plan(
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- WindowGroupLimit [label#916], [h#918L ASC NULLS FIRST],"
            " row_number(), 1, Final",
            "   +- " + SCAN_EVENTS.replace("events", "embeddings"),
        )
        assert pa.fact_forced_broadcasts(plan) == []

    def test_window_group_limit_entity_partition_does_not_bound(self):
        plan = _plan(
            "BroadcastExchange HashedRelationBroadcastMode",
            "+- WindowGroupLimit [user_id#3L], [h#918L ASC NULLS FIRST],"
            " row_number(), 1, Final",
            "   +- " + SCAN_EVENTS,
        )
        assert len(pa.fact_forced_broadcasts(plan)) == 1

    def test_split_top_nested(self):
        assert pa._split_top("a#1, f(b#2, c#3), d#4") == [
            "a#1", "f(b#2, c#3)", "d#4"
        ]

    def test_bracket_list(self):
        op = "HashAggregate(keys=[a#1], functions=[], output=[a#1, b#2L])"
        assert pa._bracket_list(op, "output=") == ["a#1", "b#2L"]
        assert pa._bracket_list(op, "missing=") is None


class TestImmediateDefinitionsFailClosed:
    def test_overlong_definition_contributes_nothing(self):
        # the defining expression exceeds the 500-char window and the
        # backward scan finds no top-level boundary -> definition
        # unknown, NOT the raw window (which here carries a bounded
        # neighbour token that must not rescue the key)
        filler = "x" * 600
        plan = f"Project [to_date(ts#1) AS d#2, fn({filler}) AS k#9L]"
        assert pa._immediate_definitions(plan, "k#9L") == ""

    def test_short_definition_still_resolves(self):
        plan = "Project [to_date(ts#1) AS d#2, user_id#3L AS k#9L]"
        out = pa._immediate_definitions(plan, "k#9L")
        assert "user_id" in out and "to_date" not in out

    def test_window_reaching_plan_start_is_legitimate(self):
        # ctx starts at the plan's own start: start=0 is the real
        # expression head, not a truncation — must still resolve
        plan = "abs(v#1) AS k#9L]"
        assert "abs" in pa._immediate_definitions(plan, "k#9L")


class TestDeterminismProbeDiff:
    def test_cols_only_mismatch_does_not_raise(self):
        # ADVICE r9: rows equal + equal-length but column names differ
        # -> the old bare next() raised StopIteration. ADVICE r10: the
        # fixed logic now lives in the pure fingerprint_diff(), so this
        # test EXECUTES the fixed code path instead of restating the
        # tuple invariant around it.
        from determinism_probe import fingerprint_diff

        a = (("x",), (("1",),))
        b = (("y",), (("1",),))
        kind, detail = fingerprint_diff(a, b)
        assert kind == "cols" and "x" in detail and "y" in detail

    def test_fingerprint_shape(self):
        # (cols, rows) tuple contract the diff printer relies on
        import pandas as pd

        from determinism_probe import frame_fingerprint

        class _FakeDF:
            def toPandas(self):
                return pd.DataFrame({"b": [2, 1], "a": [3, 4]})

        cols, rows = frame_fingerprint(_FakeDF())
        assert cols == ("a", "b")
        assert rows == (("3", "2"), ("4", "1"))


class TestCacheEviction:
    def test_other_app_entries_evicted(self):
        from fraud_detection_project_spark.queries import _evict_other_apps

        cache = {("app-1", "/a"): 1, ("app-1", "/b"): 2, ("app-2", "/a"): 3}
        _evict_other_apps(cache, "app-2")
        assert cache == {("app-2", "/a"): 3}

    def test_current_app_entries_kept(self):
        from fraud_detection_project_spark.queries import _evict_other_apps

        cache = {("app-2", "/a"): 3, ("app-2", "/b"): 4}
        _evict_other_apps(cache, "app-2")
        assert len(cache) == 2


SF = "/root/testdata/sf0.001"


class TestRound10RecallTwins:
    """The two round-10 registrations (VERDICT r9 item 6): hash-green
    invariant twins for the last rows-only near-dup/ANN families."""

    def test_ann_exact_dup_recall(self, spark):
        from fraud_detection_project_spark.queries import QUERIES

        rows = QUERIES["ann_exact_dup_recall"](spark, SF).collect()
        assert len(rows) == 1
        r = rows[0]
        # vec_id 0 itself + the 3 planted duplicates
        assert r["n_exact_matches"] >= 4
        assert r["n_exact_in_topk"] == min(r["n_exact_matches"], 10)
        assert r["exact_all_cosine_one"]

    def test_embedding_dup_pair_recall(self, spark):
        from fraud_detection_project_spark.queries import QUERIES

        rows = QUERIES["embedding_dup_pair_recall"](spark, SF).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_exact_dup_pairs"] >= 1
        assert r["all_dups_paired"] and r["all_pairs_above_threshold"]

    def test_lsh_recall_law_catches_planted_duplicate(self, spark):
        """The FN law has teeth standalone: an index vector IDENTICAL
        to the query must head the LSH top-k at cosine 1.0 on a tiny
        synthetic index (bucket is a pure function of the vector)."""
        from pyspark.sql import functions as F

        from fraud_detection_project_spark.operators.similarity import (
            ann_topk_lsh,
        )

        dim = 8
        query = [1.0] + [0.0] * (dim - 1)
        rows = [(0, query)] + [
            (i, [0.0] * (i % dim) + [1.0] + [0.0] * (dim - 1 - i % dim))
            for i in range(1, 30)
        ] + [(99, list(query))]  # planted exact duplicate
        idx = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
        top = ann_topk_lsh(idx, query, k=5, bits=8, probe_hamming=2)
        got = {r["vec_id"]: r["cosine_sim"] for r in top.collect()}
        assert 99 in got and round(got[99], 6) == 1.0


class TestSimhashOracleNormalizationOrder:
    def test_oracle_mirrors_lower_then_strip(self):
        # ADVICE r9: the oracle must apply lower() BEFORE the
        # [^a-z0-9] strip, exactly like functions.text.normalized_text
        from fraud_detection_project_spark.queries import ORACLE_SQL

        sql = ORACLE_SQL["simhash_exact_dup_recall"]
        assert "regexp_replace(lower(text), '[^a-z0-9]+'" in sql
        assert "[^a-zA-Z0-9]" not in sql

    def test_duckdb_and_spark_agree_on_mixed_case(self):
        import duckdb

        # the exact oracle expression, on strings whose equality under
        # strip-then-lower vs lower-then-strip differs off-ASCII
        rows = duckdb.sql(
            "SELECT trim(regexp_replace(lower(s), '[^a-z0-9]+', ' ', 'g')) "
            "FROM (VALUES ('Hello, World!'), ('HELLO world')) t(s)"
        ).fetchall()
        assert rows == [("hello world",), ("hello world",)]
