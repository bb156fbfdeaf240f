"""Salted aggregation / join: exactness vs the unsalted plan, and the
fan-out property that motivates them."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_salted_agg_exact(spark):
    from fraud_detection_project_spark.catalog import load_table
    from fraud_detection_project_spark.operators.skew import salted_agg

    ev = load_table(spark, SF_SMOKE, "events")
    got = salted_agg(
        ev,
        ["event_type"],
        {
            "total_value": ("value", "sum"),
            "n": ("event_id", "count"),
            "max_value": ("value", "max"),
        },
        salt_buckets=8,
    )
    want = ev.groupBy("event_type").agg(
        F.sum("value").alias("total_value"),
        F.count("event_id").alias("n"),
        F.max("value").alias("max_value"),
    )
    g = {r["event_type"]: r for r in got.collect()}
    w = {r["event_type"]: r for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert g[k]["n"] == w[k]["n"]
        assert abs(g[k]["total_value"] - w[k]["total_value"]) < 1e-6
        assert g[k]["max_value"] == w[k]["max_value"]


def test_salted_agg_rejects_non_algebraic(spark):
    import pytest

    from fraud_detection_project_spark.catalog import load_table
    from fraud_detection_project_spark.operators.skew import salted_agg

    ev = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(ev, ["event_type"], {"x": ("value", "avg")})


def test_salted_join_matches_plain_join(spark):
    from fraud_detection_project_spark.catalog import load_table
    from fraud_detection_project_spark.operators.skew import salted_join_hot_keys

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    users = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id")
        .distinct()
        .withColumn("user_tag", F.concat(F.lit("u"), F.col("user_id")))
    )
    hot = [r["user_id"] for r in
           ev.groupBy("user_id").count().orderBy(F.desc("count")).limit(3).collect()]

    got = salted_join_hot_keys(ev, users, "user_id", hot)
    want = ev.join(users, "user_id")
    assert got.count() == want.count()
    assert got.select("event_id", "user_tag").exceptAll(
        want.select("event_id", "user_tag")
    ).count() == 0


def test_salted_agg_fans_out_hot_key(spark):
    """The hot key's phase-1 rows really are spread across salts."""
    from fraud_detection_project_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    salted = ev.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
    n_salts = (
        salted.groupBy("user_id", "__salt")
        .count()
        .groupBy("user_id")
        .agg(F.countDistinct("__salt").alias("s"))
        .agg(F.max("s"))
        .first()[0]
    )
    assert n_salts >= 6  # 1000 events over 15 users → every salt hit
