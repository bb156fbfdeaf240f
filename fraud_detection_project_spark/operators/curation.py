"""Corpus curation funnel — staged filters with per-stage accounting.

No reference equivalent; north-star LLM-data surface: a pretraining
corpus goes through an ordered gauntlet (length gate → punctuation
gate → language gate → dedup …) and the operative question at 100 TB
is "how many documents survive each stage" — both for yield tracking
and for spotting a filter that suddenly eats the corpus.

Scale design: the naive form runs one filter+count job per stage; here
ALL stage predicates evaluate in a single scan — each stage's survivor
count is ``sum(case when p1 and … and pk then 1 end)`` in ONE
aggregate, then the one-row wide result unpivots to (stage, survivors)
rows. Predicates that need a window (e.g. keep-first dedup) are
computed as columns before the aggregate; everything else is codegen
arithmetic. One shuffle when a window predicate is present, zero
otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def curation_funnel(
    df: DataFrame,
    stages: list[tuple[str, Column]],
) -> DataFrame:
    """Cumulative survivor counts through ordered filter ``stages`` →
    ``(stage_idx, stage, survivors)``, where row 0 is the unfiltered
    input and stage k counts rows passing predicates 1..k (AND-chained
    in order).

    ``stages`` is a list of (name, boolean Column); predicates may
    reference window-derived columns the caller attached beforehand.
    A null predicate value counts as not passing (SQL three-valued
    logic under ``coalesce(p, false)``).
    """
    aggs = [F.count(F.lit(1)).alias("__s0")]
    cum = F.lit(True)
    for i, (_, pred) in enumerate(stages, start=1):
        cum = cum & F.coalesce(pred, F.lit(False))
        aggs.append(F.sum(cum.cast("long")).alias(f"__s{i}"))
    wide = df.agg(*aggs)
    names = ["input"] + [name for name, _ in stages]
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(n).alias("stage"),
                F.col(f"__s{i}").alias("survivors"),
            )
            for i, n in enumerate(names)
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("r"))
        .select("r.stage_idx", "r.stage", "r.survivors")
        .orderBy("stage_idx")
    )
