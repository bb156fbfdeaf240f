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
