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


def k_core(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """Exact k-core decomposition → ``(id, core)`` per node, via
    distributed H-index propagation (Montresor et al., "Distributed
    k-core decomposition"): initialize every estimate to the degree,
    then repeatedly set ``c(v) = H-index of neighbors' estimates``
    (the largest h such that >= h neighbors have estimate >= h).
    Estimates only decrease and the fixpoint is exactly the core
    number; rounds needed are bounded by the longest chain of
    dependent decrements (small for real graphs — power-law graphs
    converge in tens of rounds).

    Per round: ONE shuffle keyed on node id (neighbor-estimate gather),
    the H-index computed as a codegen HOF over the gathered estimate
    array, convergence detected by a 1-row changed-count fingerprint,
    ``localCheckpoint`` truncating lineage (same contract as pagerank /
    connected_components). After the first full round, only the
    FRONTIER recomputes — nodes adjacent to an estimate that just
    dropped (a node's H-index can only fall when a neighbor's estimate
    fell, so this is exact, per Montresor's async-correctness
    argument). Convergence telemetry on the co-purchase graph at ~sf1:
    the frontier collapses from ~20k to <100 nodes within a dozen
    rounds and the remaining ~25 rounds each touch a vanishing slice —
    full recompute there costs edge-count work per round; frontier
    recompute costs only the active neighborhoods. The gathered array
    per node is its degree — a hyper-hot node at 100 TB makes a wide
    row; cap or pre-filter such nodes upstream (same call as
    co_occurrence_edges documents).
    """
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = (
        fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    core = und.groupBy("u").agg(F.count(F.lit(1)).cast("int").alias("c"))
    frontier = None  # None = first round, recompute everyone
    for _ in range(max_iter):
        if frontier is None:
            base = und
        else:
            affected = (
                und.join(
                    frontier.select(F.col("u").alias("v")), "v", "left_semi"
                )
                .select("u")
                .distinct()
            )
            base = und.join(affected, "u", "left_semi")
        nbc = base.join(
            core.select(F.col("u").alias("v"), F.col("c").alias("cv")), "v"
        )
        # H-index: with estimates sorted desc, the indicator
        # cs[i] >= i+1 is a prefix; its length is the H-index
        upd = (
            nbc.groupBy("u")
            .agg(F.sort_array(F.collect_list("cv"), asc=False).alias("cs"))
            .select(
                "u",
                F.size(
                    F.filter(
                        F.transform("cs", lambda x, i: x >= i + F.lit(1)),
                        lambda b: b,
                    )
                ).alias("h"),
            )
        )
        merged = (
            core.join(upd, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("c"), F.coalesce(F.col("h"), F.col("c"))
                ).alias("c"),
                (F.coalesce(F.col("h"), F.col("c")) < F.col("c")).alias(
                    "chg"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = merged.agg(F.sum(F.col("chg").cast("long"))).first()[0]
        frontier = merged.filter(F.col("chg")).select("u")
        core = merged.select("u", "c")
        if not changed:
            break
    return core.select(F.col("u").alias("id"), F.col("c").alias("core"))


def adamic_adar(
    edges: DataFrame,
    left: str = "src",
    right: str = "dst",
    max_degree: int | None = None,
) -> DataFrame:
    """Adamic–Adar link prediction over a bipartite edge list: score
    every left-node pair sharing ≥ 1 right-neighbor by
    ``Σ_shared 1 / ln(degree(neighbor))`` (Adamic & Adar 2003,
    "Friends and neighbors on the Web") — rare shared neighbors weigh
    more than ubiquitous ones. The link-prediction /
    candidate-generation staple (who-to-connect, related-items).

    Scale design: candidate pairs materialize only WITHIN a shared
    neighbor (self-equi-join keyed on the right node — the
    ``co_occurrence_edges`` shape), so work is Σ_n deg(n)², never an
    all-pairs product. That sum is exactly where a hot neighbor
    explodes quadratically, so ``max_degree`` prunes right-nodes with
    more than that many neighbors BEFORE the join — the standard recipe
    (a neighbor shared by thousands contributes ~1/ln(deg) ≈ nothing to
    ranking while dominating the join; dropping it trades negligible
    score mass for a hard quadratic bound, mirroring the stop-shingle
    document-frequency cutoff in the Jaccard dedup operator). Degrees
    are computed with one ``groupBy(right)``; a shared neighbor always
    has degree ≥ 2, so ``ln`` never sees 1.

    Returns ``(node_a, node_b, n_common, aa_score)`` with
    ``node_a < node_b``.
    """
    e = edges.select(left, right).distinct()
    deg = e.groupBy(right).agg(F.count(F.lit(1)).alias("__deg"))
    if max_degree is not None:
        deg = deg.filter(F.col("__deg") <= max_degree)
    ed = e.join(deg, right)  # inner join drops pruned hot neighbors
    pairs = (
        ed.select(F.col(left).alias("node_a"), F.col(right).alias("__n"),
                  "__deg")
        .join(
            ed.select(F.col(left).alias("node_b"), F.col(right).alias("__n")),
            "__n",
        )
        .filter(F.col("node_a") < F.col("node_b"))
    )
    return pairs.groupBy("node_a", "node_b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum(F.lit(1.0) / F.log(F.col("__deg"))).alias("aa_score"),
    )


def bfs_min_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Multi-source breadth-first search → ``(node, hop)`` with ``hop``
    = the MINIMUM number of edges from any seed, limited to
    ``max_hops``. Seeds get hop 0; unreachable nodes are absent.

    Level-synchronous frontier expansion — the scalable BFS shape: each
    level is ONE distributed join (frontier ⋈ edges on src, both
    shuffle-partitioned on the node key) plus an anti-join against the
    visited set to keep the frontier minimal (a node is expanded exactly
    once, at its first — i.e. minimum — hop). ``localCheckpoint``
    truncates lineage each level so plan depth stays O(1); the loop is
    driver-side but bounded by ``max_hops`` levels, and the early-exit
    ``isEmpty`` probe touches only the (already materialized) frontier.
    """
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    frontier = (
        seeds.select(F.col(node).alias(node)).distinct().localCheckpoint()
    )
    visited = frontier.withColumn("hop", F.lit(0)).localCheckpoint()
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier[node] == e["__s"])
            .select(F.col("__d").alias(node))
            .distinct()
            .join(visited.select(node), node, "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.withColumn("hop", F.lit(h))
        ).localCheckpoint()
        frontier = nxt
    return visited.select(node, F.col("hop").cast("long").alias("hop"))


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation and local clustering coefficient
    ``2·T(v) / (deg(v)·(deg(v)−1))`` — the node-level refinement of
    :func:`triangle_count` (same degree-ordered orientation, so the
    wedge join stays O(m^1.5) with no hub blowup). Each closed wedge
    credits ALL THREE corners via a 3-way explode of the triangle's
    node array — one extra bounded shuffle (3 rows per triangle) over
    the global count. Degree-1 nodes report coefficient 0.0.

    Returns ``(node, deg, triangles, coeff)``.
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
        .select(
            F.col("e1.s").alias("apex"),
            F.col("e1.d").alias("a"),
            F.col("e2.d").alias("b"),
        )
    )
    closing = oriented.select(F.col("s").alias("a"), F.col("d").alias("b"))
    tri_nodes = (
        wedges.join(closing, ["a", "b"])
        .select(
            F.explode(F.array("apex", "a", "b")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(tri_nodes, "node", "left").select(
        "node",
        "deg",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.when(
            F.col("deg") >= 2,
            2.0
            * F.coalesce("triangles", F.lit(0))
            / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(0.0)
        .alias("coeff"),
    )
