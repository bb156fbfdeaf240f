"""Round-9 fix pins.

- hyperplane_bucket ragged-width guard (ADVICE r8): a worker that
  lazily derived its plane matrix from one batch must FAIL LOUDLY when
  a later batch carries a different vector width, instead of silently
  emitting buckets from a mismatched matrix.
- gdpr_erasure_cascade no-forced-broadcast (VERDICT r8 item 2): the
  static plan must not broadcast the data-proportional victim set.
- ams_f2_stream_equivalence build cache (ADVICE r8): rebuilding the
  query in the same session must NOT re-run the structured-streaming
  job.
- the two round-9 invariant-twin registrations smoke-run at sf0.001
  with their invariants actually holding.
"""

from __future__ import annotations

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

SF = "/root/testdata/sf0.001"


class TestHyperplaneRaggedGuard:
    def test_cross_batch_width_change_raises(self, spark):
        from fraud_detection_project_spark.operators.similarity import (
            hyperplane_bucket,
        )

        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        try:
            rows = [(i, [1.0] * 4) for i in range(2)] + [
                (i, [1.0] * 6) for i in range(2, 4)
            ]
            df = spark.createDataFrame(rows, "id long, v array<double>").coalesce(1)
            with pytest.raises(Exception, match="ragged|vector width|homogeneous"):
                df.select(hyperplane_bucket("v", None, bits=8).alias("b")).collect()
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    def test_explicit_dim_mismatch_raises(self, spark):
        from fraud_detection_project_spark.operators.similarity import (
            hyperplane_bucket,
        )

        df = spark.createDataFrame(
            [(i, [1.0] * 6) for i in range(4)], "id long, v array<double>"
        )
        with pytest.raises(Exception, match="ragged|vector width|shapes"):
            df.select(hyperplane_bucket("v", 4, bits=8).alias("b")).collect()


class TestGdprNoForcedBroadcast:
    def test_victims_not_broadcast_in_static_plan(self, spark):
        """With auto-broadcast disabled, only a HINT can produce a
        broadcast — so any events-derived BroadcastExchange in this
        plan is the forced-broadcast regression. (Stats-driven
        broadcasts at tiny SF are fine and vanish under the conf.)"""
        import plan_audit as pa
        from fraud_detection_project_spark.queries import QUERIES

        df = QUERIES["gdpr_erasure_cascade"](spark, SF)
        # save/restore the SESSION's value — unset() reverts to Spark's
        # built-in 10 MB, not the session builder's configured
        # threshold, leaking a changed conf to every later test
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = pa.plan_of(df)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert not pa._broadcast_subtree_scans(plan, "events"), plan[:600]


class TestAmsEquivalenceCache:
    def test_rebuild_hits_cache(self, spark):
        """Second build in the same session returns the cached frame —
        no second stream run (the first build pays it once)."""
        from fraud_detection_project_spark.queries import QUERIES

        a = QUERIES["ams_f2_stream_equivalence"](spark, SF)
        b = QUERIES["ams_f2_stream_equivalence"](spark, SF)
        assert a is b
        rows = {r["j"]: r["z"] for r in b.collect()}
        assert len(rows) == 8


class TestRound9Registrations:
    def test_undersample_tolerance_audit(self, spark):
        from fraud_detection_project_spark.queries import QUERIES

        rows = QUERIES["undersample_tolerance_audit"](spark, SF).collect()
        assert [r["label"] for r in rows] == [0, 1]
        assert all(r["within_band"] for r in rows)
        assert all(r["n_target"] <= r["n_class"] for r in rows)

    def test_undersample_audit_rebuild_hits_cache(self, spark):
        """The operator's build-time class-count collect must run once
        per (session, sf_dir) — plan-only rebuilds return the cached
        frame and launch zero jobs."""
        from fraud_detection_project_spark.queries import QUERIES

        a = QUERIES["undersample_tolerance_audit"](spark, SF)
        before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        b = QUERIES["undersample_tolerance_audit"](spark, SF)
        after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        assert a is b
        assert max(after, default=-1) == max(before, default=-1)

    def test_simhash_exact_dup_recall(self, spark):
        from fraud_detection_project_spark.queries import QUERIES

        rows = QUERIES["simhash_exact_dup_recall"](spark, SF).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_docs"] > 0
        assert r["exact_dups_all_reported"] and r["pairs_within_budget"]

    def test_simhash_recall_catches_planted_duplicate(self, spark):
        """The FN law has teeth: plant an exact duplicate pair in a tiny
        corpus and confirm the recall check machinery reports it found
        (n_exact_dup_pairs ≥ 1, all reported)."""
        from fraud_detection_project_spark.functions.text import doc_fingerprint
        from fraud_detection_project_spark.operators.dedup import (
            simhash_near_dup_pairs,
        )
        from pyspark.sql import functions as F

        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "The quick  brown FOX jumps over the lazy dog!"),  # dup of 1
            (3, "a completely different document about spark engines"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        keyed = df.select(
            F.col("doc_id").alias("id"),
            doc_fingerprint(F.col("text")).alias("tkey"),
        )
        x, y = keyed.alias("x"), keyed.alias("y")
        dup_pairs = x.join(
            y,
            (F.col("x.tkey") == F.col("y.tkey")) & (F.col("x.id") < F.col("y.id")),
        ).select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        assert dup_pairs.collect() == [(1, 2)]
        sim = simhash_near_dup_pairs(df, max_hamming=3)
        missing = dup_pairs.join(sim.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
        assert missing.count() == 0
