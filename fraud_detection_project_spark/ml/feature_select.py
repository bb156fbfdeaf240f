"""Feature selection statistics — χ² independence ranking.

No reference equivalent (the reference trains on all features);
north-star ML-prep surface: rank categorical candidate features by
their χ² statistic against a binary label before committing to an
encoding — the sklearn ``SelectKBest(chi2)`` shape re-expressed as
DataFrame algebra.

Scale design: ALL features fit in ONE pass — each row melts into
|features| (feature, value) structs, one grouped count builds every
contingency table at once, and the χ² arithmetic runs over the tiny
cells frame with window sums. No per-feature job loop, no driver-side
contingency matrices.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def chi_square_rank(
    df: DataFrame,
    features: Sequence[str],
    label: Column | str,
) -> DataFrame:
    """Per-feature χ² statistic of independence against a binary (or
    low-cardinality) label → ``(feature, chi2, dof, n)`` ranked by
    ``chi2`` descending.

    Cells: observed count O(v, y) per feature value × label;
    E(v, y) = rowtot(v) · coltot(y) / n; χ² = Σ (O−E)²/E over the FULL
    table including never-observed cells — computed via the algebraic
    identity Σ(O−E)²/E = Σ_observed O²/E − n, so zero cells (absent
    from the grouped counts) contribute their E without being
    materialized. dof = (|values|−1)(|labels|−1) over observed
    categories. Feature values compare via their string form; null
    feature values form their own category (the label must be
    non-null).
    """
    lab = F.col(label) if isinstance(label, str) else label
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("f"), F.col(f).cast("string").alias("v")
                    )
                    for f in features
                ]
            )
        ).alias("p"),
        lab.cast("string").alias("y"),
    ).filter(F.col("y").isNotNull())
    cells = (
        melted.select("p.f", "p.v", "y")
        .groupBy("f", "v", "y")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    by_f = Window.partitionBy("f")
    rowtot = F.sum("o").over(Window.partitionBy("f", "v"))
    coltot = F.sum("o").over(Window.partitionBy("f", "y"))
    n = F.sum("o").over(by_f)
    e = rowtot * coltot / n
    enriched = cells.select(
        "f",
        "v",
        "y",
        "o",
        e.alias("e"),
        n.alias("n"),
    )
    # dof needs distinct value/label counts per feature; the cells frame
    # is |values|x|labels| per feature — tiny — so two more window-free
    # aggregates over it are cheap
    return (
        enriched.groupBy("f")
        .agg(
            F.round(
                F.sum(F.col("o") * F.col("o") / F.col("e")) - F.max("n"), 6
            ).alias("chi2"),
            (
                (F.count_distinct("v") - 1) * (F.count_distinct("y") - 1)
            ).cast("long").alias("dof"),
            F.max("n").alias("n"),
        )
        .select(F.col("f").alias("feature"), "chi2", "dof", "n")
        .orderBy(F.desc("chi2"), F.asc("feature"))
    )
