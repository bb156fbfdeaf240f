"""Triangle counting and co-occurrence edge building (operators/graph.py)."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fraud_detection_project_spark.operators.graph import (
    co_occurrence_edges,
    triangle_count,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _brute_triangles(pairs):
    adj = set()
    nodes = set()
    for a, b in pairs:
        if a != b:
            adj.add((min(a, b), max(a, b)))
            nodes.update((a, b))
    return sum(
        1
        for x, y, z in combinations(sorted(nodes), 3)
        if (x, y) in adj and (y, z) in adj and (x, z) in adj
    )


class TestTriangleCount:
    def test_known_small_graphs(self, spark):
        k4 = list(combinations(range(4), 2))
        got = triangle_count(_edges_df(spark, k4)).collect()[0]
        assert (got["n_triangles"], got["n_nodes"], got["n_edges"]) == (4, 4, 6)
        cycle5 = [(i, (i + 1) % 5) for i in range(5)]
        got = triangle_count(_edges_df(spark, cycle5)).collect()[0]
        assert got["n_triangles"] == 0
        k5 = list(combinations(range(5), 2))
        assert triangle_count(_edges_df(spark, k5)).collect()[0][
            "n_triangles"
        ] == 10

    def test_normalizes_duplicates_loops_direction(self, spark):
        pairs = [(0, 1), (1, 0), (0, 1), (1, 2), (0, 2), (3, 3)]
        got = triangle_count(_edges_df(spark, pairs)).collect()[0]
        # (3,3) self-loop drops entirely, reversed/dup edges collapse
        assert (got["n_triangles"], got["n_nodes"], got["n_edges"]) == (1, 3, 3)

    def test_random_graph_matches_brute_force(self, spark):
        rng = np.random.RandomState(21)
        pairs = {
            (int(a), int(b))
            for a, b in rng.randint(0, 30, size=(200, 2))
            if a != b
        }
        got = triangle_count(_edges_df(spark, sorted(pairs))).collect()[0]
        assert got["n_triangles"] == _brute_triangles(pairs)

    def test_skewed_hub_graph(self, spark):
        """A star hub (degree 50) plus a rim path: orientation must not
        explode wedges at the hub, and counts stay exact."""
        star = [(0, i) for i in range(1, 51)]
        rim = [(i, i + 1) for i in range(1, 50)]
        got = triangle_count(_edges_df(spark, star + rim)).collect()[0]
        # each rim edge closes a triangle with the hub
        assert got["n_triangles"] == 49


class TestCoOccurrenceEdges:
    def test_pairs_within_groups(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "z")],
            "g long, item string",
        )
        got = {
            (r["src"], r["dst"])
            for r in co_occurrence_edges(df, "g", "item").collect()
        }
        assert got == {("a", "b"), ("a", "c"), ("b", "c")}

    def test_duplicate_rows_do_not_duplicate_edges(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "b")], "g long, item string"
        )
        assert co_occurrence_edges(df, "g", "item").count() == 1
