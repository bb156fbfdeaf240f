"""ML-layer tests (M1-M8): split partition invariants, scaler ddof,
unknown-category tolerance, imbalance invariants (SURVEY.md §5.4)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fraud_detection_project_spark.ml.imbalance import (
    class_counts,
    oversample_minority_naive,
    smote,
    undersample_majority,
)
from fraud_detection_project_spark.ml.prep import (
    build_feature_pipeline,
    feature_names_out,
    one_hot_columns,
    standardize,
    standardize_stats,
)
from fraud_detection_project_spark.ml.split import id_hash_split, stratified_split


@pytest.fixture(scope="module")
def labeled(spark):
    # 1000 rows, 10% minority, 2-dim features
    rows = [
        Row(
            id=i,
            label=1 if i % 10 == 0 else 0,
            f=[float(i % 7), float((i * 3) % 11)],
            cat="a" if i % 3 == 0 else "b",
            num=float(i % 100),
        )
        for i in range(1000)
    ]
    return spark.createDataFrame(rows)


class TestSplit:
    def test_id_hash_split_partitions(self, labeled):
        out = id_hash_split(labeled, "id", 0.8)
        counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
        assert counts["train"] + counts["test"] == 1000
        assert 700 < counts["train"] < 900  # ~80%

    def test_id_hash_split_deterministic(self, labeled):
        a = {r["id"]: r["split"] for r in id_hash_split(labeled, "id").collect()}
        b = {r["id"]: r["split"] for r in id_hash_split(labeled, "id").collect()}
        assert a == b

    def test_stratified_split_disjoint_exhaustive(self, labeled):
        train, test = stratified_split(labeled, "label", 0.8, seed=42)
        nt, ns = train.count(), test.count()
        assert nt + ns == 1000
        # per-class ratio ≈ 0.8
        tc = class_counts(train, "label")
        ac = class_counts(labeled, "label")
        for lbl in ac:
            assert 0.6 < tc.get(lbl, 0) / ac[lbl] < 0.95


class TestStandardize:
    def test_ddof0_matches_population(self, spark):
        df = spark.createDataFrame([Row(x=1.0), Row(x=2.0), Row(x=3.0)])
        out = standardize(df, ["x"], ddof=0).collect()
        vals = sorted(r["x_scaled"] for r in out)
        sd = math.sqrt(2.0 / 3.0)  # population std of [1,2,3]
        assert abs(vals[0] + 1.0 / sd) < 1e-9
        assert abs(vals[1]) < 1e-9

    def test_train_only_fit(self, spark):
        train = spark.createDataFrame([Row(x=0.0), Row(x=10.0)])
        test = spark.createDataFrame([Row(x=5.0), Row(x=20.0)])
        stats = standardize_stats(train, ["x"], ddof=0)
        out = sorted(
            r["x_scaled"] for r in standardize(test, ["x"], stats=stats).collect()
        )
        assert abs(out[0] - 0.0) < 1e-9  # 5 == train mean
        assert abs(out[1] - 3.0) < 1e-9  # (20-5)/5

    def test_zero_variance_column(self, spark):
        df = spark.createDataFrame([Row(x=4.0), Row(x=4.0)])
        out = [r["x_scaled"] for r in standardize(df, ["x"]).collect()]
        assert out == [0.0, 0.0]


class TestPipeline:
    def test_fit_transform_and_names(self, labeled):
        pipe = build_feature_pipeline(["num"], ["cat"])
        model = pipe.fit(labeled)
        out = model.transform(labeled)
        vec = out.select("features").first()[0]
        # 1 numeric + 4 cat slots: {a, b} + StringIndexer 'keep' slot for
        # unseen values + OneHotEncoder's own 'keep' slot
        assert vec.size == 5
        names = feature_names_out(model, labeled)
        assert len(names) == 5
        assert any("num" in n for n in names)

    def test_unknown_category_tolerated(self, labeled, spark):
        pipe = build_feature_pipeline(["num"], ["cat"])
        model = pipe.fit(labeled)
        unseen = spark.createDataFrame([Row(id=1, label=0, f=[0.0], cat="ZZZ", num=1.0)])
        row = model.transform(unseen).select("features").first()[0]
        assert row is not None  # no exception — sklearn handle_unknown='ignore'

    def test_one_hot_columns(self, spark):
        df = spark.createDataFrame([Row(c="x"), Row(c="y"), Row(c="zzz")])
        out = one_hot_columns(df, "c", ["x", "y"])
        got = [(r["c_x"], r["c_y"]) for r in out.orderBy("c").collect()]
        assert got == [(1, 0), (0, 1), (0, 0)]


class TestImbalance:
    def test_undersample_balances(self, labeled):
        out = undersample_majority(labeled, "label", seed=42)
        c = class_counts(out, "label")
        # majority downsampled to ≈ minority (Bernoulli, so approximate)
        assert c[1] == 100
        assert 60 <= c[0] <= 140

    def test_undersample_exact_counts(self, labeled):
        from fraud_detection_project_spark.ml.imbalance import undersample_exact

        out = undersample_exact(labeled, "label", order_cols=["id"], seed=42)
        c = class_counts(out, "label")
        # exactly the minority count for every class — not Bernoulli
        assert c == {0: 100, 1: 100}

    def test_undersample_exact_deterministic_subset(self, labeled):
        from fraud_detection_project_spark.ml.imbalance import undersample_exact

        a = undersample_exact(labeled, "label", order_cols=["id"], seed=42)
        b = undersample_exact(
            labeled.repartition(7), "label", order_cols=["id"], seed=42
        )
        ids_a = sorted(r["id"] for r in a.select("id").collect())
        ids_b = sorted(r["id"] for r in b.select("id").collect())
        assert ids_a == ids_b  # partition-layout independent
        assert len(ids_a) == len(set(ids_a))  # no duplicates
        all_ids = {r["id"] for r in labeled.select("id").collect()}
        assert set(ids_a) <= all_ids  # strict subset of the input
        # a different seed picks a different subset
        c = undersample_exact(labeled, "label", order_cols=["id"], seed=7)
        ids_c = sorted(r["id"] for r in c.select("id").collect())
        assert ids_c != ids_a

    def test_undersample_exact_n_target(self, labeled):
        from fraud_detection_project_spark.ml.imbalance import undersample_exact

        out = undersample_exact(
            labeled, "label", order_cols=["id"], seed=42, n_target=50
        )
        assert class_counts(out, "label") == {0: 50, 1: 50}

    def test_oversample_naive(self, labeled):
        out = oversample_minority_naive(labeled, "label", seed=42)
        c = class_counts(out, "label")
        assert c[0] == 900
        assert 700 <= c[1] <= 1100

    def test_smote_balances_exactly(self, labeled):
        out = smote(labeled, "label", "f", "id", k=3, seed=42)
        c = class_counts(out, "label")
        assert c[0] == 900
        assert c[1] == 900  # exact: deterministic quotas
        # synthetic rows flagged with id == -1
        assert out.filter((F.col("label") == 1) & (F.col("id") == -1)).count() == 800

    def test_smote_deterministic(self, labeled):
        a = smote(labeled, "label", "f", "id", k=3, seed=42)
        b = smote(labeled, "label", "f", "id", k=3, seed=42)
        sa = sorted(tuple(r["f"]) for r in a.filter(F.col("id") == -1).collect())
        sb = sorted(tuple(r["f"]) for r in b.filter(F.col("id") == -1).collect())
        assert sa == sb

    def test_smote_highdim_arrow_projection(self, spark):
        """dim=512 routes _projection through the Arrow gemm kernel
        (VERDICT r2 item 5): counts stay exact, synthesis deterministic,
        and the kernel agrees with the unrolled-expression form run on
        the same vectors."""
        import numpy as np

        from fraud_detection_project_spark.ml.imbalance import _projection

        dim, rng = 512, np.random.default_rng(3)
        rows = [
            (i, int(i < 40), rng.normal(size=dim).tolist()) for i in range(200)
        ]
        df = spark.createDataFrame(rows, "id long, label int, f array<double>")

        out = smote(df, "label", "f", "id", k=3, seed=42)
        c = class_counts(out, "label")
        assert c == {0: 160, 1: 160}
        syn_a = sorted(
            tuple(r["f"]) for r in out.filter(F.col("id") == -1).collect()
        )
        out_b = smote(df, "label", "f", "id", k=3, seed=42)
        syn_b = sorted(
            tuple(r["f"]) for r in out_b.filter(F.col("id") == -1).collect()
        )
        assert syn_a == syn_b  # deterministic across runs

        # Arrow kernel ≡ numpy ground truth at dim=512 (the unrolled
        # expression form StackOverflows Catalyst at this width — the
        # reason the Arrow path exists)
        got_arrow = {
            r["id"]: r["p"]
            for r in df.select(
                "id", _projection(df, "f", dim, seed=42).alias("p")
            ).collect()
        }
        plane_rng = np.random.RandomState(42)
        r_plane = plane_rng.normal(size=dim)
        r_plane = r_plane / np.linalg.norm(r_plane)
        for i, _, f in rows:
            assert abs(got_arrow[i] - float(np.dot(f, r_plane))) < 1e-9

    def test_projection_arrow_matches_expression_lowdim(self, spark):
        """The two _projection forms agree bit-for-bit-ish (1e-9) on the
        same seeded plane — checked at dim=32 where both are viable, by
        forcing the Arrow path against the default expression path."""
        import numpy as np

        import fraud_detection_project_spark.ml.imbalance as imb
        from fraud_detection_project_spark.ml.imbalance import _projection

        dim, rng = 32, np.random.default_rng(5)
        rows = [(i, rng.normal(size=dim).tolist()) for i in range(50)]
        df = spark.createDataFrame(rows, "id long, f array<double>")

        expr = {
            r["id"]: r["p"]
            for r in df.select(
                "id", _projection(df, "f", dim, seed=42).alias("p")
            ).collect()
        }
        old_max = imb._PROJ_EXPR_MAX_DIM
        imb._PROJ_EXPR_MAX_DIM = 0  # force Arrow kernel
        try:
            arrow = {
                r["id"]: r["p"]
                for r in df.select(
                    "id", _projection(df, "f", dim, seed=42).alias("p")
                ).collect()
            }
        finally:
            imb._PROJ_EXPR_MAX_DIM = old_max
        assert expr.keys() == arrow.keys()
        for i in expr:
            assert abs(expr[i] - arrow[i]) < 1e-9

    def test_smote_interpolates_within_hull(self, labeled):
        # all synthetic points must lie on a segment between two minority
        # points → every coordinate within the minority min/max box
        out = smote(labeled, "label", "f", "id", k=3, seed=42)
        syn = [r["f"] for r in out.filter(F.col("id") == -1).collect()]
        minority = [r["f"] for r in labeled.filter(F.col("label") == 1).collect()]
        lo0, hi0 = min(f[0] for f in minority), max(f[0] for f in minority)
        lo1, hi1 = min(f[1] for f in minority), max(f[1] for f in minority)
        for f in syn:
            assert lo0 - 1e-9 <= f[0] <= hi0 + 1e-9
            assert lo1 - 1e-9 <= f[1] <= hi1 + 1e-9


class TestClustering:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        # 3 well-separated blobs in 4-d, 60 rows each
        import numpy as np

        rng = np.random.default_rng(7)
        rows = []
        for c, center in enumerate([(10, 0, 0, 0), (0, 10, 0, 0), (0, 0, 10, 0)]):
            for i in range(60):
                v = rng.normal(0, 0.3, 4) + np.asarray(center, dtype=float)
                rows.append(Row(vec_id=c * 60 + i, embedding=[float(x) for x in v]))
        return spark.createDataFrame(rows).repartition(4).cache()

    def test_kmeans_recovers_blobs(self, emb):
        from fraud_detection_project_spark.ml.clustering import (
            kmeans_assign,
            kmeans_centroids,
            kmeans_fit,
        )

        model = kmeans_fit(emb, k=3, vec_col="embedding", seed=42)
        assigned = kmeans_assign(emb, model)
        # every ground-truth blob maps to exactly one learned cluster
        purity = (
            assigned.withColumn("truth", (F.col("vec_id") / 60).cast("int"))
            .groupBy("truth")
            .agg(F.count_distinct("cluster").alias("k"))
            .agg(F.max("k"))
            .first()[0]
        )
        assert purity == 1
        sizes = sorted(r["n"] for r in assigned.groupBy("cluster").count().withColumnRenamed("count", "n").collect())
        assert sizes == [60, 60, 60]
        cents = kmeans_centroids(model)
        assert len(cents) == 3 and len(cents[0]) == 4

    def test_kmeans_deterministic(self, emb):
        from fraud_detection_project_spark.ml.clustering import kmeans_centroids, kmeans_fit

        a = kmeans_centroids(kmeans_fit(emb, k=3, seed=42))
        b = kmeans_centroids(kmeans_fit(emb, k=3, seed=42))
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_ivf_with_trained_centroids(self, emb):
        from fraud_detection_project_spark.ml.clustering import kmeans_centroids, kmeans_fit
        from fraud_detection_project_spark.operators.similarity import cosine_topk, ivf_topk

        model = kmeans_fit(emb, k=3, seed=42)
        query = [10.0, 0.0, 0.0, 0.0]
        exact = [r["vec_id"] for r in cosine_topk(emb, query, 10).collect()]
        approx = [
            r["vec_id"]
            for r in ivf_topk(
                emb, query, 10, nprobe=1, centroids=kmeans_centroids(model)
            ).collect()
        ]
        # probing the single trained cell containing the blob → full recall
        assert set(approx) == set(exact)


class TestNativeFeaturePrep:
    def test_matches_mllib_pipeline_slot_for_slot(self, spark):
        from fraud_detection_project_spark.ml.prep import (
            NativeFeaturePrep,
            build_feature_pipeline,
        )

        train = spark.createDataFrame(
            [
                (1, 10.0, "a"), (2, 12.0, "b"), (3, 14.0, "a"), (4, 9.0, "c"),
                (5, 11.0, "b"), (6, 13.0, "a"), (7, 8.5, "c"), (8, 10.5, "a"),
            ],
            "id long, x double, cat string",
        )
        # test split carries an UNSEEN category and a null numeric
        test = spark.createDataFrame(
            [(9, 20.0, "zz"), (10, None, "a"), (11, 7.0, None)],
            "id long, x double, cat string",
        )

        mllib = build_feature_pipeline(["x"], ["cat"]).fit(train)
        native = NativeFeaturePrep(["x"], ["cat"]).fit(train)

        for df in (train, test):
            got = {
                r["id"]: list(r["features"].toArray())
                for r in native.transform(df).select("id", "features").collect()
            }
            want = {
                r["id"]: list(r["features"].toArray())
                for r in mllib.transform(df).select("id", "features").collect()
            }
            assert got.keys() == want.keys()
            for k in want:
                assert len(got[k]) == len(want[k]), (k, got[k], want[k])
                for a, b in zip(got[k], want[k]):
                    if b != b:  # NaN slot
                        assert a != a
                    else:
                        assert abs(a - b) <= 1e-9 * max(1.0, abs(b)), (k, got[k], want[k])

    def test_constant_train_column_null_test_parity(self, spark):
        """std==0 edge: a constant train column must zero real values but
        keep null-as-NaN test values NaN, exactly as MLlib's NaN·0.0
        multiplier does (ADVICE r2: prep.py std==0 branch)."""
        from fraud_detection_project_spark.ml.prep import (
            NativeFeaturePrep,
            build_feature_pipeline,
        )

        train = spark.createDataFrame(
            [(1, 5.0, "a"), (2, 5.0, "b"), (3, 5.0, "a")],
            "id long, x double, cat string",
        )
        test = spark.createDataFrame(
            [(4, 5.0, "a"), (5, None, "b"), (6, 7.0, None)],
            "id long, x double, cat string",
        )
        mllib = build_feature_pipeline(["x"], ["cat"]).fit(train)
        native = NativeFeaturePrep(["x"], ["cat"]).fit(train)
        for df in (train, test):
            got = {
                r["id"]: list(r["features"].toArray())
                for r in native.transform(df).select("id", "features").collect()
            }
            want = {
                r["id"]: list(r["features"].toArray())
                for r in mllib.transform(df).select("id", "features").collect()
            }
            assert got.keys() == want.keys()
            for k in want:
                for a, b in zip(got[k], want[k]):
                    if b != b:
                        assert a != a, (k, got[k], want[k])
                    else:
                        assert abs(a - b) <= 1e-12, (k, got[k], want[k])

    def test_feature_names_match_mllib_metadata(self, spark):
        from fraud_detection_project_spark.ml.prep import (
            NativeFeaturePrep,
            build_feature_pipeline,
            feature_names_out,
        )

        train = spark.createDataFrame(
            [(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, "a")],
            "id long, x double, cat string",
        )
        native = NativeFeaturePrep(["x"], ["cat"]).fit(train)
        assert len(native.feature_names_out()) == len(
            feature_names_out(build_feature_pipeline(["x"], ["cat"]).fit(train), train)
        )

    def test_high_cardinality_broadcast_path(self, spark):
        from fraud_detection_project_spark.ml.prep import NativeFeaturePrep

        rows = [(i, float(i % 7), f"c{i % 100}") for i in range(400)]
        df = spark.createDataFrame(rows, "id long, x double, cat string")
        prep = NativeFeaturePrep(["x"], ["cat"], max_case_categories=16)
        out = prep.fit(df).transform(df)
        vec = out.select("features").first()["features"].toArray()
        assert len(vec) == 1 + 100 + 2  # scaled x + 100 cats + unseen + invalid slots
        assert abs(sum(vec[1:]) - 1.0) < 1e-12  # exactly one indicator fires

    def test_max_categories_cap_overflow_to_unseen(self, spark):
        """max_categories bounds the driver vocab collect (VERDICT r3):
        values past the cap (frequencyDesc order) index to the unseen
        bucket, the handleInvalid='keep' slot."""
        from fraud_detection_project_spark.ml.prep import NativeFeaturePrep

        # freq: a x4, b x3, c x2, d x1 — cap at 2 keeps [a, b]
        rows = (
            [(i, 1.0, "a") for i in range(4)]
            + [(10 + i, 1.0, "b") for i in range(3)]
            + [(20 + i, 1.0, "c") for i in range(2)]
            + [(30, 1.0, "d")]
        )
        df = spark.createDataFrame(rows, "id long, x double, cat string")
        m = NativeFeaturePrep([], ["cat"], max_categories=2).fit(df)
        assert m.vocabs["cat"] == ["a", "b"]
        got = {
            r["id"]: list(r["features"].toArray())
            for r in m.transform(df).select("id", "features").collect()
        }
        # slots: [a, b, unseen(k=2), invalid] — c/d rows fire unseen
        assert got[0] == [1.0, 0.0, 0.0, 0.0]
        assert got[10] == [0.0, 1.0, 0.0, 0.0]
        assert got[20] == [0.0, 0.0, 1.0, 0.0]
        assert got[30] == [0.0, 0.0, 1.0, 0.0]

    def test_fit_is_single_vocab_job_multi_column(self, spark):
        """Two categorical columns fit in ONE melted pass and match the
        per-column frequencyDesc order."""
        from fraud_detection_project_spark.ml.prep import NativeFeaturePrep

        df = spark.createDataFrame(
            [(1, "a", "x"), (2, "a", "y"), (3, "b", "y"), (4, "b", "y"), (5, "b", "z")],
            "id long, c1 string, c2 string",
        )
        m = NativeFeaturePrep([], ["c1", "c2"]).fit(df)
        assert m.vocabs["c1"] == ["b", "a"]
        assert m.vocabs["c2"] == ["y", "x", "z"]


class TestPrepEncoders:
    def test_winsorize_clips_and_passes_nulls(self, spark):
        from fraud_detection_project_spark.ml.prep import winsorize

        df = spark.createDataFrame(
            [(float(i),) for i in range(1, 100)] + [(None,), (1000.0,)],
            "v double",
        )
        out = winsorize(df, ["v"], lower=0.05, upper=0.95)
        rows = [r["v"] for r in out.collect()]
        assert sum(x is None for x in rows) == 1          # NULL passthrough
        vals = [x for x in rows if x is not None]
        import numpy as np

        data = [float(i) for i in range(1, 100)] + [1000.0]
        lo, hi = np.percentile(data, [5, 95])
        assert abs(min(vals) - lo) < 1e-9
        assert abs(max(vals) - hi) < 1e-9                 # 1000.0 capped
        assert len(vals) == len(data)

    def test_target_encode_unseen_falls_back_to_prior(self, spark):
        from fraud_detection_project_spark.ml.prep import target_encode

        train = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("b", 10.0)], "c string, y double"
        )
        enc, transform = target_encode(train, "c", "y", smoothing=0.0)
        m = {r["c"]: r["c_te"] for r in enc.collect()}
        assert abs(m["a"] - 2.0) < 1e-9 and abs(m["b"] - 10.0) < 1e-9

        test = spark.createDataFrame([("a",), ("zzz",)], "c string")
        got = {r["c"]: r["c_te"] for r in transform(test).collect()}
        assert abs(got["a"] - 2.0) < 1e-9
        prior = (1.0 + 3.0 + 10.0) / 3
        assert abs(got["zzz"] - prior) < 1e-9             # unseen → prior

    def test_target_encode_smoothing_shrinks_to_prior(self, spark):
        from fraud_detection_project_spark.ml.prep import target_encode

        train = spark.createDataFrame(
            [("a", 0.0)] * 2 + [("b", 1.0)] * 100, "c string, y double"
        )
        enc_hard, _ = target_encode(train, "c", "y", smoothing=1000.0)
        enc_none, _ = target_encode(train, "c", "y", smoothing=0.0)
        hard = {r["c"]: r["c_te"] for r in enc_hard.collect()}
        none = {r["c"]: r["c_te"] for r in enc_none.collect()}
        prior = 100.0 / 102.0
        # heavy smoothing pulls the rare category near the prior
        assert abs(hard["a"] - prior) < abs(none["a"] - prior)


class TestRobustScale:
    def test_robust_scale_train_only_fit_and_zero_iqr(self, spark):
        from fraud_detection_project_spark.ml.prep import (
            robust_scale,
            robust_scale_stats,
        )

        train = spark.createDataFrame(
            [(float(v),) for v in range(1, 101)], "x double"
        )
        stats = robust_scale_stats(train, ["x"])
        test = spark.createDataFrame([(50.5,), (100.5,), (None,)], "x double")
        got = [r["x_scaled"] for r in robust_scale(test, ["x"], stats=stats).collect()]
        # median 50.5, IQR = 75.25 - 25.75 = 49.5
        assert abs(got[0] - 0.0) < 1e-9
        assert abs(got[1] - (50.0 / 49.5)) < 1e-9
        assert got[2] is None  # NULL passthrough

        const = spark.createDataFrame([(7.0,), (7.0,), (None,)], "x double")
        out = [r["x_scaled"] for r in robust_scale(const, ["x"]).collect()]
        assert out[:2] == [0.0, 0.0] and out[2] is None  # zero-IQR → 0.0


class TestKFold:
    def test_assignment_deterministic_and_partition_independent(self, spark):
        from fraud_detection_project_spark.ml.split import kfold_assign

        df = spark.range(0, 2000).withColumnRenamed("id", "rid")
        a = {r["rid"]: r["fold"] for r in kfold_assign(df, "rid", k=5).collect()}
        b = {
            r["rid"]: r["fold"]
            for r in kfold_assign(df.repartition(13), "rid", k=5).collect()
        }
        assert a == b                              # layout-independent
        assert set(a.values()) == {0, 1, 2, 3, 4}  # all folds populated
        # different seed reshuffles
        c = {r["rid"]: r["fold"] for r in kfold_assign(df, "rid", k=5, seed=7).collect()}
        assert c != a
        # train/test per fold partitions the data with no copies
        from pyspark.sql import functions as F

        tagged = kfold_assign(df, "rid", k=5)
        n = df.count()
        for i in range(5):
            tr = tagged.filter(F.col("fold") != i).count()
            te = tagged.filter(F.col("fold") == i).count()
            assert tr + te == n and te > 0


class TestQuantileDiscretize:
    def test_balanced_bins_train_only_fit_nulls(self, spark):
        from fraud_detection_project_spark.ml.prep import (
            quantile_discretize,
            quantile_discretize_stats,
        )

        train = spark.createDataFrame(
            [(float(v),) for v in range(1000)], "x double"
        )
        out = quantile_discretize(train, "x", n_bins=4)
        sizes = {
            r["x_bin"]: r["count"]
            for r in out.groupBy("x_bin").count().collect()
        }
        assert set(sizes) == {0, 1, 2, 3}
        assert all(200 <= n <= 300 for n in sizes.values())  # ~250 each

        # train-fitted boundaries applied to unseen data + NULLs
        stats = quantile_discretize_stats(train, "x", 4)
        test = spark.createDataFrame(
            [(-5.0,), (999999.0,), (None,)], "x double"
        )
        got = [
            r["x_bin"]
            for r in quantile_discretize(test, "x", 4, stats=stats).collect()
        ]
        assert got[0] == 0 and got[1] == 3 and got[2] is None


class TestWeightedSample:
    def test_exact_k_subset_deterministic(self, spark):
        from fraud_detection_project_spark.ml.split import weighted_sample

        df = spark.createDataFrame(
            [(i, float(1 + i % 5)) for i in range(500)], "id long, w double"
        )
        a = sorted(r["id"] for r in weighted_sample(df, "w", 50, ["id"]).collect())
        b = sorted(
            r["id"]
            for r in weighted_sample(df.repartition(7), "w", 50, ["id"]).collect()
        )
        assert a == b and len(a) == 50          # layout-independent, exact k
        assert len(set(a)) == 50                 # without replacement
        c = sorted(
            r["id"] for r in weighted_sample(df, "w", 50, ["id"], seed=7).collect()
        )
        assert c != a                            # seed moves the sample

    def test_weight_bias(self, spark):
        """Across many seeds, heavy items are sampled ~proportionally
        more often than light ones (deterministic per seed, so this
        loop is reproducible, not flaky)."""
        from fraud_detection_project_spark.ml.split import weighted_sample

        rows = [(i, 10.0 if i < 10 else 1.0) for i in range(110)]
        df = spark.createDataFrame(rows, "id long, w double")
        heavy_hits = 0
        trials, k = 20, 10
        for s in range(trials):
            got = {r["id"] for r in weighted_sample(df, "w", k, ["id"], seed=s).collect()}
            heavy_hits += sum(1 for i in got if i < 10)
        # heavy items are 10/110 of rows but 100/200 of mass; with k=10
        # draws they should dominate clearly over the uniform baseline
        assert heavy_hits > trials * k * 0.25    # ≫ uniform's ~0.09

    def test_zero_and_null_weights_excluded(self, spark):
        from fraud_detection_project_spark.ml.split import weighted_sample

        df = spark.createDataFrame(
            [(1, 0.0), (2, None), (3, 2.0)], "id long, w double"
        )
        got = [r["id"] for r in weighted_sample(df, "w", 3, ["id"]).collect()]
        assert got == [3]
