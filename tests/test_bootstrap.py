"""Poisson-bootstrap CI and group-split leakage audit."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fraud_detection_project_spark.ml.evaluate import poisson_bootstrap_mean_ci
from fraud_detection_project_spark.ml.split import id_hash_split


def _frame(spark, n, scale=1.0):
    # deterministic pseudo-data: value = sin-ish spread around 10
    return spark.range(n).select(
        F.col("id").alias("rid"),
        F.lit("g").alias("grp"),
        (10 + scale * F.sin(F.col("id").cast("double"))).alias("v"),
    )


class TestPoissonBootstrap:
    def test_deterministic(self, spark):
        df = _frame(spark, 400)
        a = sorted(
            map(
                tuple,
                poisson_bootstrap_mean_ci(
                    df, ["grp"], "v", "rid", n_replicates=30, seed=5
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                poisson_bootstrap_mean_ci(
                    df, ["grp"], "v", "rid", n_replicates=30, seed=5
                ).collect(),
            )
        )
        assert a == b

    def test_default_ranks_not_extreme_order_stats(self, spark):
        # ADVICE r4: with R=50 the old default upper rank was R itself
        # (the max replicate). Defaults must match explicit
        # floor(0.025R)/ceil(0.975R) ranks: 1 and 49 for R=50.
        df = _frame(spark, 300)
        dflt = poisson_bootstrap_mean_ci(
            df, ["grp"], "v", "rid", n_replicates=50, seed=7
        ).collect()[0]
        explicit = poisson_bootstrap_mean_ci(
            df, ["grp"], "v", "rid", n_replicates=50, seed=7,
            lo_rank=1, hi_rank=49,
        ).collect()[0]
        assert (dflt["ci_lo"], dflt["ci_hi"]) == (
            explicit["ci_lo"], explicit["ci_hi"],
        )

    def test_ci_brackets_mean(self, spark):
        df = _frame(spark, 500)
        row = poisson_bootstrap_mean_ci(
            df, ["grp"], "v", "rid", n_replicates=50, seed=1
        ).collect()[0]
        assert row.ci_lo <= row.ci_hi
        assert row.ci_lo <= row.mean_value <= row.ci_hi
        assert row.n_replicates == 50

    def test_width_shrinks_with_n(self, spark):
        small = poisson_bootstrap_mean_ci(
            _frame(spark, 100), ["grp"], "v", "rid", n_replicates=40, seed=2
        ).collect()[0]
        big = poisson_bootstrap_mean_ci(
            _frame(spark, 6400), ["grp"], "v", "rid", n_replicates=40, seed=2
        ).collect()[0]
        w_small = small.ci_hi - small.ci_lo
        w_big = big.ci_hi - big.ci_lo
        # 64x data → ~8x narrower; allow generous slack
        assert w_big < w_small / 3

    def test_width_magnitude_matches_clt(self, spark):
        n = 2000
        df = _frame(spark, n)
        row = poisson_bootstrap_mean_ci(
            df, ["grp"], "v", "rid", n_replicates=50, seed=3
        ).collect()[0]
        sd = df.agg(F.stddev_pop("v")).collect()[0][0]
        clt = 2 * 1.96 * sd / math.sqrt(n)
        width = row.ci_hi - row.ci_lo
        assert clt / 3 < width < clt * 3

    def test_groups_independent(self, spark):
        df = spark.range(600).select(
            F.col("id").alias("rid"),
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("grp"),
            F.when(F.col("id") % 2 == 0, F.lit(5.0))
            .otherwise(F.lit(50.0) + F.col("id").cast("double") / 100)
            .alias("v"),
        )
        rows = {
            r.grp: r
            for r in poisson_bootstrap_mean_ci(
                df, ["grp"], "v", "rid", n_replicates=40, seed=4
            ).collect()
        }
        assert rows["a"].ci_hi < rows["b"].ci_lo  # clearly separated


class TestGroupSplitLeakage:
    def test_entity_split_is_group_disjoint(self, spark):
        # 50 users x 20 events: every user's events land on ONE side
        df = spark.range(1000).select(
            (F.col("id") % 50).alias("user_id"), F.col("id").alias("event_id")
        )
        s = id_hash_split(df, "user_id", 0.8)
        per = s.groupBy("user_id").agg(
            F.countDistinct("split").alias("k")
        )
        assert per.filter(F.col("k") > 1).count() == 0

    def test_event_split_would_leak(self, spark):
        # control: splitting on event_id DOES straddle users — the audit
        # distinguishes the two keys
        df = spark.range(1000).select(
            (F.col("id") % 50).alias("user_id"), F.col("id").alias("event_id")
        )
        s = id_hash_split(df, "event_id", 0.8)
        per = s.groupBy("user_id").agg(
            F.countDistinct("split").alias("k")
        )
        assert per.filter(F.col("k") > 1).count() > 0
