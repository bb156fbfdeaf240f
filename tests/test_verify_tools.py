"""Unit tests for the verification tooling's comparator internals.

Every driver row is gated by ``tools/verify_local.py``'s
``norm_cell``/``frame_key`` comparison and (since round 9) by
``tools/determinism_probe.py``'s bit-exact ``frame_fingerprint`` —
pure-python machinery that a refactor could silently weaken (a
comparator that treats everything as equal still prints PASS). These
pin the value-normalization semantics without a SparkSession.
"""

from __future__ import annotations

import math
import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import determinism_probe as dp  # noqa: E402
import verify_local as vl  # noqa: E402


class TestNormCell:
    def test_none_normalizes_distinctly(self):
        assert vl.norm_cell(None) == ("null",)
        assert vl.norm_cell(None) != vl.norm_cell(0)
        assert vl.norm_cell(None) != vl.norm_cell("")

    def test_nan_equals_nan(self):
        assert vl.norm_cell(float("nan")) == vl.norm_cell(float("nan"))
        assert vl.norm_cell(float("nan")) != vl.norm_cell(0.0)

    def test_float_rounded_to_9dp(self):
        # sub-1e-9 noise is tolerated, 1e-8 differences are not
        assert vl.norm_cell(1.0000000001) == vl.norm_cell(1.0)
        assert vl.norm_cell(1.00000002) != vl.norm_cell(1.0)

    def test_small_int_unifies_with_float(self):
        # DuckDB BIGINT vs Spark double for the same value must agree
        assert vl.norm_cell(5) == vl.norm_cell(5.0)

    def test_big_int_stays_exact(self):
        # beyond 2^52 a float round-trip would lose ulps — kept integral
        big = 2**60 + 1
        assert vl.norm_cell(big) == ("i", big)
        assert vl.norm_cell(big) != vl.norm_cell(big + 1)

    def test_bool_distinct_from_int(self):
        # a boolean column must not hash-match an int 0/1 column
        assert vl.norm_cell(True) != vl.norm_cell(1)
        assert vl.norm_cell(False) != vl.norm_cell(0)
        assert vl.norm_cell(True) == vl.norm_cell(True)

    def test_string_fallback(self):
        assert vl.norm_cell("x") == ("s", "x")
        assert vl.norm_cell("1") != vl.norm_cell(1)


class TestFrameKey:
    def test_column_order_insensitive(self):
        a = pd.DataFrame({"b": [1, 2], "a": ["x", "y"]})
        b = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
        assert vl.frame_key(a) == vl.frame_key(b)

    def test_row_order_insensitive(self):
        a = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
        b = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
        assert vl.frame_key(a) == vl.frame_key(b)

    def test_value_difference_detected(self):
        a = pd.DataFrame({"a": [1.0]})
        b = pd.DataFrame({"a": [1.00000002]})
        assert vl.frame_key(a) != vl.frame_key(b)

    def test_column_name_difference_detected(self):
        a = pd.DataFrame({"a": [1]})
        b = pd.DataFrame({"b": [1]})
        assert vl.frame_key(a) != vl.frame_key(b)


class _StubDF:
    """Duck-typed stand-in for a Spark DataFrame: only toPandas()."""

    def __init__(self, pdf):
        self._pdf = pdf

    def toPandas(self):
        return self._pdf


class TestFrameFingerprint:
    def test_bit_exact_no_float_tolerance(self):
        # the probe must NOT tolerate sub-1e-9 drift — that is its point
        a = dp.frame_fingerprint(_StubDF(pd.DataFrame({"m": [1.0]})))
        b = dp.frame_fingerprint(_StubDF(pd.DataFrame({"m": [1.0 + 1e-12]})))
        assert a != b

    def test_order_insensitive_but_exact(self):
        a = dp.frame_fingerprint(
            _StubDF(pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}))
        )
        b = dp.frame_fingerprint(
            _StubDF(pd.DataFrame({"b": ["y", "x"], "a": [2, 1]}))
        )
        assert a == b

    def test_nan_stable(self):
        a = dp.frame_fingerprint(_StubDF(pd.DataFrame({"m": [float("nan")]})))
        b = dp.frame_fingerprint(_StubDF(pd.DataFrame({"m": [float("nan")]})))
        assert a == b


def test_norm_cell_is_not_degenerate():
    """Guard against a refactor collapsing norm_cell into an
    everything-equal function: distinct values must map to distinct
    keys across the type lattice."""
    vals = [None, float("nan"), 0.0, 1.0, 1, 2, True, False, "x", "1", 2**60]
    keys = [vl.norm_cell(v) for v in vals]
    # None/nan/0.0 distinct; 1 == 1.0 by design is the only unification
    assert len(set(keys)) == len(vals) - 1
