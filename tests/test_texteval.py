"""ROUGE-N, Cohen's kappa, and contrastive negative sampling."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from fraud_detection_project_spark.ml.evaluate import cohens_kappa
from fraud_detection_project_spark.ml.split import sample_negatives
from fraud_detection_project_spark.operators.texteval import ngram_counts, rouge_n


def _tok(s):
    import re

    return re.sub(r"[^a-zA-Z0-9]+", " ", s.lower()).strip().split()


def _brute_rouge(cand, ref, n):
    def grams(s):
        t = _tok(s)
        return Counter(
            " ".join(t[i : i + n]) for i in range(len(t) - n + 1)
        )
    cg, rg = grams(cand), grams(ref)
    if not cg or not rg:
        return None
    ov = sum(min(c, rg[g]) for g, c in cg.items())
    p = ov / sum(cg.values())
    r = ov / sum(rg.values())
    f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return ov, p, r, f1


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the hat"),
    (3, "a dog barked at the cat"),
    (4, "completely different words entirely here now"),
    (5, "x"),  # single token: no bigrams
]


class TestRouge:
    def test_matches_brute_force(self, spark):
        docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3)], ["cand_id", "ref_id"]
        )
        for n in (1, 2):
            got = {
                (r.cand_id, r.ref_id): r
                for r in rouge_n(pairs, docs, n=n).collect()
            }
            txt = dict(DOCS)
            for (c, rf), row in got.items():
                exp = _brute_rouge(txt[c], txt[rf], n)
                assert exp is not None
                assert row.overlap == exp[0]
                assert math.isclose(row.precision, exp[1], rel_tol=1e-9)
                assert math.isclose(row.recall, exp[2], rel_tol=1e-9)
                assert math.isclose(row.f1, exp[3], rel_tol=1e-9)

    def test_duplicate_pairs_do_not_inflate(self, spark):
        # a duplicated (cand, ref) input row must not change the metric
        # (the gram join would otherwise fan out quadratically per
        # duplicate — ADVICE r4)
        docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
        once = rouge_n(
            spark.createDataFrame([(1, 2)], ["cand_id", "ref_id"]), docs, n=1
        ).collect()
        dup = rouge_n(
            spark.createDataFrame(
                [(1, 2), (1, 2), (1, 2)], ["cand_id", "ref_id"]
            ),
            docs,
            n=1,
        ).collect()
        assert len(dup) == 1
        assert tuple(dup[0]) == tuple(once[0])

    def test_identical_docs_give_f1_one(self, spark):
        docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
        pairs = spark.createDataFrame([(1, 1)], ["cand_id", "ref_id"])
        row = rouge_n(pairs, docs, n=2).collect()[0]
        assert row.f1 == 1.0 and row.precision == 1.0 and row.recall == 1.0

    def test_short_doc_yields_null_metrics(self, spark):
        docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
        pairs = spark.createDataFrame([(1, 5)], ["cand_id", "ref_id"])
        row = rouge_n(pairs, docs, n=2).collect()[0]
        assert row.overlap is None and row.f1 is None
        assert row.ref_total is None and row.cand_total == 5

    def test_swap_transposes_precision_recall(self, spark):
        # ROUGE is direction-sensitive: swapping cand/ref must swap
        # P and R exactly and preserve F1 (harmonic mean is symmetric)
        docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
        fwd = rouge_n(
            spark.createDataFrame([(1, 3)], ["cand_id", "ref_id"]), docs, n=1
        ).collect()[0]
        rev = rouge_n(
            spark.createDataFrame([(3, 1)], ["cand_id", "ref_id"]), docs, n=1
        ).collect()[0]
        assert fwd.precision == rev.recall and fwd.recall == rev.precision
        assert math.isclose(fwd.f1, rev.f1, rel_tol=1e-12)
        assert fwd.overlap == rev.overlap

    def test_ngram_counts_clip_basis(self, spark):
        docs = spark.createDataFrame(DOCS[:1], ["doc_id", "text"])
        got = {
            r.gram: r.c
            for r in ngram_counts(docs, "doc_id", "text", n=1).collect()
        }
        assert got == {"the": 2, "cat": 1, "sat": 1, "on": 1, "mat": 1}


class TestKappa:
    def _py_kappa(self, a, b):
        n = len(a)
        po = sum(x == y for x, y in zip(a, b)) / n
        ca, cb = Counter(a), Counter(b)
        pe = sum(ca[k] * cb.get(k, 0) for k in ca) / n / n
        return po, pe, (po - pe) / (1 - pe)

    def test_matches_reference_formula(self, spark):
        a = ["hi", "hi", "lo", "mid", "lo", "hi", "mid", "lo"]
        b = ["hi", "lo", "lo", "mid", "lo", "mid", "mid", "hi"]
        df = spark.createDataFrame(list(zip(a, b)), ["a", "b"])
        row = cohens_kappa(df, "a", "b").collect()[0]
        po, pe, k = self._py_kappa(a, b)
        assert math.isclose(row.po, round(po, 6))
        assert math.isclose(row.pe, round(pe, 6))
        assert math.isclose(row.kappa, round(k, 6))
        assert row.n == 8

    def test_perfect_agreement_is_one(self, spark):
        df = spark.createDataFrame(
            [("x", "x"), ("y", "y"), ("x", "x")], ["a", "b"]
        )
        assert cohens_kappa(df, "a", "b").collect()[0].kappa == 1.0

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [("x", "x"), (None, "y"), ("y", None), ("y", "x")], ["a", "b"]
        )
        row = cohens_kappa(df, "a", "b").collect()[0]
        assert row.n == 2 and row.po == 0.5

    def test_rater_swap_symmetric(self, spark):
        a = ["x", "y", "x", "z", "y", "x", "z", "z", "y"]
        b = ["y", "y", "x", "x", "y", "z", "z", "x", "x"]
        df = spark.createDataFrame(list(zip(a, b)), ["a", "b"])
        fwd = cohens_kappa(df, "a", "b").collect()[0]
        rev = cohens_kappa(df, "b", "a").collect()[0]
        assert fwd == rev  # kappa is symmetric in the raters

    def test_single_category_degenerate(self, spark):
        # pe == 1 → kappa defined as 1.0 (agreement is forced)
        df = spark.createDataFrame([("x", "x"), ("x", "x")], ["a", "b"])
        assert cohens_kappa(df, "a", "b").collect()[0].kappa == 1.0


class TestSampleNegatives:
    def _frames(self, spark, n_pool=200, n_anchor=10):
        anchors = spark.createDataFrame(
            [(i * 17,) for i in range(n_anchor)], ["anchor_id"]
        )
        pool = spark.createDataFrame(
            [(i,) for i in range(n_pool)], ["pool_id"]
        )
        return anchors, pool

    def test_k_bound_and_no_self_pairs(self, spark):
        anchors, pool = self._frames(spark)
        out = sample_negatives(anchors, pool, k=5, seed=3).collect()
        per = Counter(r.anchor_id for r in out)
        assert all(c <= 5 for c in per.values())
        assert all(r.anchor_id != r.pool_id for r in out)
        assert all(1 <= r.neg_rank <= 5 for r in out)

    def test_deterministic_across_runs(self, spark):
        anchors, pool = self._frames(spark)
        a = sorted(map(tuple, sample_negatives(anchors, pool, k=4, seed=9).collect()))
        b = sorted(map(tuple, sample_negatives(anchors, pool, k=4, seed=9).collect()))
        assert a == b

    def test_seed_changes_draw(self, spark):
        anchors, pool = self._frames(spark)
        a = sorted(map(tuple, sample_negatives(anchors, pool, k=4, seed=1).collect()))
        b = sorted(map(tuple, sample_negatives(anchors, pool, k=4, seed=2).collect()))
        assert a != b

    def test_auto_sizing_holds_k_across_pool_scales(self, spark):
        # auto-sized n_buckets keeps per-anchor candidates ~constant:
        # 10x the pool must still fill k for every anchor (and not
        # blow up the candidate product — the SCALING.md q23 quadratic)
        for n_pool in (300, 3000):
            anchors, pool = self._frames(spark, n_pool=n_pool)
            out = sample_negatives(anchors, pool, k=5, seed=3).collect()
            per = Counter(r.anchor_id for r in out)
            assert len(per) == 10 and all(c == 5 for c in per.values())

    def test_candidates_bounded_by_probed_buckets(self, spark):
        # every sampled negative must come from a bucket the anchor probes
        anchors, pool = self._frames(spark)
        nb, pbk, seed = 64, 8, 3
        out = sample_negatives(
            anchors, pool, k=50, n_buckets=nb, probe_buckets=pbk, seed=seed
        ).collect()
        K, M, P = 2654435761, 40503, 999983
        for r in out:
            probed = {
                ((r.anchor_id % P * K + seed) % P * M + j) % nb
                for j in range(pbk)
            }
            assert (r.pool_id % P * M + seed) % P * K % nb in probed
