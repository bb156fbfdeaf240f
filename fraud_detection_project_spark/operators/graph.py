"""Graph operators over edge-list DataFrames.

No reference equivalent (the reference has no graph ops). Companions to
``operators/dedup.py:connected_components``; used for corpus curation
(link-based quality scoring) and entity analysis (fraud rings are
subgraphs).

Everything is edge-list DataFrame algebra: one shuffle keyed on node id
per iteration, ``localCheckpoint`` truncating lineage so plans stay
O(1) across iterations. No adjacency matrices, no driver-side graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list → (id, rank), ranks summing to
    ~1. Fixed ``n_iter`` power iterations (the production norm — rank
    ordering stabilizes long before values converge).

    Dangling nodes (no out-edges) redistribute their mass uniformly, the
    standard correction — without it rank mass drains and totals drift.

    Per iteration: one shuffle (groupBy dst of contribution messages) +
    a broadcast of the dangling-mass scalar. Contributions flow over the
    edge list joined to the current rank vector — at 100 TB the join is
    rank ⋈ edges on src, both shuffle-partitioned on the same key, so
    AQE reuses the partitioning across iterations.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
        )
        .distinct()
        # materialize: the edge list is re-read every iteration; an
        # expensive upstream plan must not re-execute per iteration
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(outdeg, "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            ranks.join(outdeg.withColumnRenamed("src", "id"), "id", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "id", "left_outer")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def co_occurrence_edges(
    df: DataFrame, group: str, item: str
) -> DataFrame:
    """Undirected co-occurrence edge list: one (src, dst) row with
    src < dst for every pair of distinct items sharing a group (parts
    in the same order, entities in the same session).

    Shape: distinct → self-equi-join on the group key → distinct. The
    join is per-group, so work is Σ_g |g|² — bounded when group sizes
    are (orders hold ≤ 7 lineitems; sessions are capped). A pathological
    hot group would need the same salting treatment as any skewed
    equi-join; groups that large usually warrant a cap/filter first,
    which is the curation-layer call, not this operator's.
    """
    d = df.select(group, item).distinct()
    return (
        d.alias("l")
        .join(d.alias("r"), F.col(f"l.{group}") == F.col(f"r.{group}"))
        .filter(F.col(f"l.{item}") < F.col(f"r.{item}"))
        .select(
            F.col(f"l.{item}").alias("src"),
            F.col(f"r.{item}").alias("dst"),
        )
        .distinct()
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Count triangles in an undirected graph given as an edge list
    (direction, duplicates, and self-loops are normalized away first).
    Returns one row: ``n_triangles, n_nodes, n_edges``.

    Degree-ordered orientation (Suri & Vassilvitskii's MR-friendly
    scheme): each edge is directed from its lower-(degree, id) endpoint
    to the higher one, so every out-degree is O(√m) even at a
    power-law hub — the wedge join generates Σ C(outdeg, 2) = O(m^1.5)
    candidates total, the optimal join-based bound, with NO skew blowup
    on hot nodes (a node with degree d has out-degree ≤ √(2m) after
    orientation). Each triangle is produced by exactly one wedge (at
    its lowest-rank vertex), so the final semi-check is a plain count:
    wedges ⋈ oriented-edges on the closing pair.

    Three shuffles total: degree agg, wedge self-join on the apex, and
    the closing-edge hash join.
    """
    u, v = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    und = (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        und.join(
            deg.select(F.col("node").alias("u"), F.col("deg").alias("ud")),
            "u",
        )
        .join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("vd")),
            "v",
        )
    )
    low_first = (F.col("ud") < F.col("vd")) | (
        (F.col("ud") == F.col("vd")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(low_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(low_first, F.col("v")).otherwise(F.col("u")).alias("d"),
        F.when(low_first, F.col("vd")).otherwise(F.col("ud")).alias("dd"),
    )
    rank_lt = (F.col("e1.dd") < F.col("e2.dd")) | (
        (F.col("e1.dd") == F.col("e2.dd")) & (F.col("e1.d") < F.col("e2.d"))
    )
    wedges = (
        oriented.alias("e1")
        .join(
            oriented.alias("e2"),
            (F.col("e1.s") == F.col("e2.s")) & rank_lt,
        )
        .select(F.col("e1.d").alias("a"), F.col("e2.d").alias("b"))
    )
    closing = oriented.select(
        F.col("s").alias("a"), F.col("d").alias("b")
    )
    tri = wedges.join(closing, ["a", "b"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return (
        tri.crossJoin(deg.agg(F.count(F.lit(1)).alias("n_nodes")))
        .crossJoin(und.agg(F.count(F.lit(1)).alias("n_edges")))
    )
