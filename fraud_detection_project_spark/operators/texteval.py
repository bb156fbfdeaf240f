"""Pairwise text-overlap evaluation (ROUGE-N).

The reference pipeline has no text surface at all (446-line tabular
pandas, ``src/preprocessing/transform_data.py``); this module belongs to
the LLM-data-pipeline extension families: scoring generated/candidate
text against references is the evaluation staple (summarization eval,
dedup explanation, distillation QA), and at corpus scale it must run as
a distributed join over n-gram count frames — never a per-pair Python
loop.

ROUGE-N (Lin 2004, "ROUGE: A Package for Automatic Evaluation of
Summaries") with *clipped* counts: for a (candidate, reference) pair the
overlap of an n-gram is ``min(count_cand, count_ref)``;

    recall    = overlap_total / ref_total
    precision = overlap_total / cand_total
    f1        = 2PR / (P + R)

Scale design
------------
One tokenize+explode pass builds the per-document n-gram count frame
``(doc_id, gram, c)`` — a single ``groupBy(doc_id, gram)`` shuffle over
docs that actually participate in a pair (semi-join pruned). The pair
table then joins that frame twice (keyed on the candidate id, then the
reference id) and the clipped overlap is an inner join on
``(pair_id, gram)`` — the n-gram frames are partitioned by pair id
before the gram match, so a globally hot gram ("the") never concentrates
on one task: its rows are already spread across pair-id partitions.
Totals are plain per-doc sums reusing the same count frame. No UDFs;
everything is codegen ``split``/``slice``/``explode`` + joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_counts", "rouge_n"]

_TOKEN_CLEAN = "[^a-zA-Z0-9]+"


def ngram_counts(
    docs: DataFrame, id_col: str, text_col: str, n: int = 1,
    hashed: bool = False,
) -> DataFrame:
    """Per-document n-gram multiset: ``(id_col, gram, c)``.

    Tokenization: lowercase, non-alphanumeric runs → single space, trim,
    whitespace split — byte-identical to the DuckDB oracle expression
    ``string_split_regex(trim(lower(regexp_replace(text,
    '[^a-zA-Z0-9]+', ' ', 'g'))), '\\s+')`` used throughout the query
    corpus (e.g. the 13-gram decontamination oracle). Documents shorter
    than ``n`` tokens contribute no grams.

    ``hashed=True`` folds each gram to ``xxhash64`` BEFORE the count
    aggregation, so the shuffle carries 8-byte longs instead of gram
    strings — the right mode when grams are only ever compared for
    EQUALITY downstream (the ROUGE overlap join); a 2⁻⁶⁴ per-pair
    collision is accepted, as in exact_dedup / ngram_contamination.
    """
    # single-regex-pass tokenize (round 13, see functions/text.py
    # alnum_tokens: 10× over the regexp_replace pipeline, provably
    # token-identical). One convention difference vs alnum_tokens: the
    # oracle expression split(trim(...), '\s+') yields [''] — not [] —
    # for all-separator text. That case is observable ONLY at n == 1
    # (for n ≥ 2 both [''] and [] fail the size >= n gate identically),
    # so the when() branch is gated on n: a conditional referencing the
    # token array twice defeats codegen subexpression elimination and
    # measured ~2× on the n=2 gram pass at ~sf1 (11.3 s vs 5.6 s for
    # the plain array; the old two-pass pipeline sat at 5.9-6.4 s).
    toks = F.array_remove(
        F.split(F.lower(F.col(text_col)), _TOKEN_CLEAN), ""
    )
    if n == 1:
        toks = F.when(F.size(toks) == 0, F.array(F.lit(""))).otherwise(toks)
    d = docs.select(F.col(id_col), toks.alias("toks")).filter(
        F.size("toks") >= n
    )
    if n == 1:
        gram = F.explode("toks").alias("gram")
        exploded = d.select(id_col, gram)
        if hashed:
            exploded = exploded.select(
                id_col, F.xxhash64("gram").alias("gram")
            )
    else:
        # slice is 1-indexed; i ∈ [1, len-n+1]
        idx = F.explode(
            F.sequence(F.lit(1), F.size("toks") - F.lit(n - 1))
        ).alias("i")
        if hashed:
            # hash the token SLICE directly — xxhash64 folds arrays
            # natively, so no per-gram string is ever materialized
            exploded = d.select(id_col, "toks", idx).select(
                id_col,
                F.xxhash64(F.slice("toks", F.col("i"), n)).alias("gram"),
            )
        else:
            exploded = d.select(id_col, "toks", idx).select(
                id_col,
                F.array_join(
                    F.slice("toks", F.col("i"), n), " "
                ).alias("gram"),
            )
    return exploded.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("c")
    )


def rouge_n(
    pairs: DataFrame,
    docs: DataFrame,
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    cand_col: str = "cand_id",
    ref_col: str = "ref_id",
) -> DataFrame:
    """Clipped-count ROUGE-N for every row of ``pairs``.

    Returns ``(cand_col, ref_col, overlap, cand_total, ref_total,
    precision, recall, f1)`` — one row per input pair, metrics NULL when
    the corresponding side has no n-grams (doc shorter than ``n``).
    """
    participant = (
        pairs.select(F.col(cand_col).alias(id_col))
        .union(pairs.select(F.col(ref_col).alias(id_col)))
        .distinct()
    )
    # grams only ever meet an EQUALITY join below — hash them to longs
    # before the count shuffle (≈2-5× narrower shuffle rows for word
    # bigrams; 2⁻⁶⁴ per-pair collision accepted, oracle-checked by
    # rouge2_adjacent_docs)
    # counts feeds THREE consumers (cand grams, ref grams, totals) and
    # the pair key two — checkpoint both so the corpus tokenizes ONCE
    # (the bm25/tfidf compacted-relation precedent; un-checkpointed,
    # the tokenize+hash+agg pipeline re-executed per consumer and
    # dominated the sf1 decade at 3× cost)
    counts = ngram_counts(
        docs.join(participant, id_col, "left_semi"), id_col, text_col, n,
        hashed=True,
    ).localCheckpoint(eager=False)
    totals = counts.groupBy(id_col).agg(F.sum("c").alias("total"))

    # a duplicated (cand, ref) row would fan out BOTH gram frames, so
    # the clipped overlap join inflates quadratically per duplicate
    # while the totals join inflates linearly — silently wrong metrics;
    # dedup the pair key up front (ADVICE r4)
    p = pairs.select(cand_col, ref_col).distinct().localCheckpoint(
        eager=False
    )
    # Overlap-join shape (VERDICT r11 item 5 — the suite's largest
    # decade exponent lived here): pair keys are attached to ONE gram
    # frame only. The old plan built a second pair-expanded frame
    # (rgrams = p ⋈ counts on ref) and joined the two on
    # (cand, ref, gram), so the big shuffle carried the corpus' grams
    # pair-expanded TWICE plus paid an extra join stage to build
    # rgrams. Joining the pair-tagged cand grams straight against the
    # compact per-doc counts on (ref, gram) is result-identical —
    # counts is unique per (doc, gram), so the ref-side lookup yields
    # exactly rgrams' rows — while the ref side of the shuffle now
    # carries each doc's grams ONCE regardless of how many pairs share
    # the doc, and one whole shuffle stage disappears.
    cgrams = p.join(
        counts.withColumnRenamed(id_col, cand_col), cand_col
    ).select(cand_col, ref_col, "gram", F.col("c").alias("c_cand"))
    overlap = (
        cgrams.join(
            counts.select(
                F.col(id_col).alias(ref_col),
                "gram",
                F.col("c").alias("c_ref"),
            ),
            [ref_col, "gram"],
        )
        .groupBy(cand_col, ref_col)
        .agg(F.sum(F.least("c_cand", "c_ref")).alias("overlap"))
    )
    out = (
        p.join(
            totals.withColumnRenamed(id_col, cand_col).withColumnRenamed(
                "total", "cand_total"
            ),
            cand_col,
            "left",
        )
        .join(
            totals.withColumnRenamed(id_col, ref_col).withColumnRenamed(
                "total", "ref_total"
            ),
            ref_col,
            "left",
        )
        .join(overlap, [cand_col, ref_col], "left")
        .withColumn(
            "overlap",
            F.when(
                F.col("cand_total").isNotNull()
                & F.col("ref_total").isNotNull(),
                F.coalesce("overlap", F.lit(0)),
            ),
        )
    )
    prec = F.col("overlap") / F.col("cand_total")
    rec = F.col("overlap") / F.col("ref_total")
    f1 = F.when(
        (prec + rec) > 0, 2 * prec * rec / (prec + rec)
    ).otherwise(
        F.when(prec.isNotNull() & rec.isNotNull(), F.lit(0.0))
    )
    return out.select(
        cand_col,
        ref_col,
        "overlap",
        "cand_total",
        "ref_total",
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
    )
