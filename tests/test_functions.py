"""Unit tests for the columnar scalar functions — the semantic edge cases
recorded in SURVEY.md §2/§5: F6 float-IP fallback, F3 weekday convention,
F1 coerce-to-null, text stats."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from fraud_detection_project_spark.functions.ip import int_to_ip, ip_to_int
from fraud_detection_project_spark.functions.text import (
    lang_id,
    normalized_text,
    punct_ratio,
    word_count,
)
from fraud_detection_project_spark.functions.time import (
    day_of_week,
    hour_of_day,
    time_since_hours,
    to_timestamp_coerce,
)


def _one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


class TestIpToInt:
    def test_dotted_quad(self, spark):
        df = spark.createDataFrame([Row(ip="192.168.1.1")])
        assert _one(df, ip_to_int("ip")) == 3232235777

    def test_zero_and_max(self, spark):
        df = spark.createDataFrame([Row(ip="0.0.0.0"), Row(ip="255.255.255.255")])
        vals = [r["v"] for r in df.select(ip_to_int("ip").alias("v")).collect()]
        assert sorted(vals) == [0, 4294967295]

    def test_float_string_fallback(self, spark):
        # Fraud_Data stores IPs as floats (clean_data.py:51): int(float(s))
        df = spark.createDataFrame([Row(ip="732758368.79972")])
        assert _one(df, ip_to_int("ip")) == 732758368

    def test_octet_over_255_falls_through_to_null(self, spark):
        # inet_aton rejects '10.0.0.999'; float('10.0.0.999') raises → NaN
        df = spark.createDataFrame([Row(ip="10.0.0.999")])
        assert _one(df, ip_to_int("ip")) is None

    def test_garbage_is_null(self, spark):
        df = spark.createDataFrame([Row(ip="not-an-ip")])
        assert _one(df, ip_to_int("ip")) is None

    def test_null_is_null(self, spark):
        df = spark.createDataFrame([Row(ip=None)], "ip string")
        assert _one(df, ip_to_int("ip")) is None

    def test_roundtrip(self, spark):
        df = spark.createDataFrame([Row(ip="10.42.7.255")])
        assert _one(df, int_to_ip(ip_to_int("ip"))) == "10.42.7.255"

    def test_int_to_ip_out_of_range(self, spark):
        df = spark.createDataFrame([Row(v=-1), Row(v=4294967296)], "v long")
        vals = [r["v"] for r in df.select(int_to_ip("v").alias("v")).collect()]
        assert vals == [None, None]


class TestTimeFunctions:
    def test_weekday_monday_is_zero(self, spark):
        # 2024-01-01 was a Monday; pandas .dt.dayofweek == 0 (SURVEY F3)
        df = spark.createDataFrame(
            [Row(t=datetime.datetime(2024, 1, 1, 5)), Row(t=datetime.datetime(2024, 1, 7, 5))]
        )
        vals = [r["v"] for r in df.select(day_of_week("t").alias("v")).collect()]
        assert sorted(vals) == [0, 6]

    def test_hour(self, spark):
        df = spark.createDataFrame([Row(t=datetime.datetime(2024, 3, 5, 23, 59))])
        assert _one(df, hour_of_day("t")) == 23

    def test_coerce_invalid_to_null(self, spark):
        df = spark.createDataFrame([Row(s="2024-01-02 03:04:05"), Row(s="garbage")])
        vals = df.select(to_timestamp_coerce("s").alias("v")).collect()
        got = {r["v"] for r in vals}
        assert None in got
        assert datetime.datetime(2024, 1, 2, 3, 4, 5) in got

    def test_time_since_hours(self, spark):
        df = spark.createDataFrame(
            [
                Row(
                    a=datetime.datetime(2024, 1, 1, 12, 0, 0),
                    b=datetime.datetime(2024, 1, 1, 0, 0, 0),
                )
            ]
        )
        assert abs(_one(df, time_since_hours("a", "b")) - 12.0) < 1e-9


class TestTextFunctions:
    def test_word_count(self, spark):
        df = spark.createDataFrame([Row(t="one two  three"), Row(t="   "), Row(t="x")])
        vals = sorted(r["v"] for r in df.select(word_count("t").alias("v")).collect())
        assert vals == [0, 1, 3]

    def test_punct_ratio(self, spark):
        df = spark.createDataFrame([Row(t="ab.,")])
        assert abs(_one(df, punct_ratio("t")) - 0.5) < 1e-9

    def test_normalized_text(self, spark):
        df = spark.createDataFrame([Row(t="  Hello,   WORLD!! 42 ")])
        assert _one(df, normalized_text("t")) == "hello world 42"

    def test_lang_id(self, spark):
        df = spark.createDataFrame(
            [
                Row(t="the cat sat on the mat and it is that for it"),
                Row(t="la casa de la playa que el en y los del se las"),
                Row(t="zzz qqq www"),
            ]
        )
        vals = [r["v"] for r in df.select(lang_id("t").alias("v")).collect()]
        assert vals[0] == "en"
        assert vals[1] == "es"
        assert vals[2] == "und"


class TestBM25Search:
    def test_matches_pure_python(self, spark):
        import math

        from fraud_detection_project_spark.operators.search import bm25_search

        corpus = [
            (1, "spark join hash join"),
            (2, "hash table scan"),
            (3, "vector vector vector index"),
            (4, "unrelated words only here"),
            (5, ""),
        ]
        terms = ["join", "hash", "vector"]
        k1, b = 1.2, 0.75

        toks = {i: t.lower().split() for i, t in corpus}
        dls = {i: len(t) for i, t in toks.items()}
        n = len(corpus)
        avgdl = sum(dls.values()) / n
        df = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
        expect = {}
        for i, tk in toks.items():
            s = 0.0
            for t in terms:
                tf = tk.count(t)
                if tf == 0 or df[t] == 0:
                    continue
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dls[i] / avgdl))
            if s > 0:
                expect[i] = round(s, 4)

        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {r["doc_id"]: r["bm25"] for r in bm25_search(docs, terms).collect()}
        assert got == expect

    def test_topk_is_take_ordered(self, spark):
        from fraud_detection_project_spark.operators.search import bm25_search

        docs = spark.createDataFrame(
            [(i, "hash join" if i % 2 else "scan") for i in range(100)],
            "doc_id long, text string",
        )
        q = bm25_search(docs, ["hash"], top_k=5)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert len(q.collect()) == 5


class TestChunking:
    def test_chunk_windows_and_overlap(self, spark):
        from fraud_detection_project_spark.operators.chunking import chunk_documents

        text = " ".join(f"w{i}" for i in range(100))
        df = spark.createDataFrame(
            [(1, text), (2, "a b c"), (3, ""), (4, "   ")],
            "doc_id long, text string",
        )
        out = chunk_documents(df, chunk_size=64, overlap=16).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 1: 100 tokens, stride 48 -> starts 0,48,96; start 96 covers
        # [96,100) ⊂ [48,112) overlap zone? 96+? previous covers 48..111
        # incl overlap -> last window [96:100) inside [48:112): dropped
        # iff 2*48+16 >= 100 -> 112 >= 100 -> dropped => 2 chunks
        c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
        assert [r["n_tokens"] for r in c1] == [64, 52]
        assert c1[0]["chunk_text"].split()[:2] == ["w0", "w1"]
        assert c1[1]["chunk_text"].split()[0] == "w48"  # overlap carried
        assert c1[0]["chunk_text"].split()[-16:] == c1[1]["chunk_text"].split()[:16]
        # doc 2: single short chunk; docs 3/4: no chunks
        assert [r["n_tokens"] for r in by_doc[2]] == [3]
        assert 3 not in by_doc and 4 not in by_doc

    def test_pack_respects_capacity_contract(self, spark):
        from fraud_detection_project_spark.operators.chunking import pack_greedy

        rows = [(i, (i * 37) % 90 + 10) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, n long")
        out = sorted(
            pack_greedy(df, "n", "doc_id", capacity=128).collect(),
            key=lambda r: r["doc_id"],
        )
        # bin ids are the cumsum contract, non-decreasing; every bin's
        # content starts before the capacity boundary it closes on
        cum = 0
        for r in out:
            assert r["bin_id"] == cum // 128
            cum += r["n"]
