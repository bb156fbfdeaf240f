"""Text-analysis functions for training-data pipelines — pure columnar.

No reference equivalent (the reference is numeric/categorical only);
these are the north-star text ops over the ``documents`` table: token
stats, quality heuristics, normalization, fingerprinting, language ID.
All JVM-side expressions — at 100 TB of text, a Python UDF here would be
the single largest cost in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal stopword profiles per language for the heuristic language ID
# and the quality score. Deliberately tiny + deterministic.
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "a", "is", "that", "for", "it"],
    "es": ["de", "la", "que", "el", "en", "y", "los", "del", "se", "las"],
    "fr": ["de", "la", "le", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty string → empty array)."""
    c = F.trim(_c(col))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def word_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def char_count(col: Column | str) -> Column:
    return F.length(_c(col)).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: splits runs of letters, digits, and
    individual punctuation (a cheap, deterministic BPE stand-in).

    ``regexp_count`` (round 14, guide §1.2 per-task work): counting
    matches in one regex pass instead of materializing the match array
    just to take its size. Values identical, including the legacy
    ``size(NULL) = -1`` convention on NULL text (pinned by
    ``coalesce``); equivalence pytest-pinned.
    """
    c = _c(col)
    cnt = F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return F.coalesce(cnt, F.lit(-1)).cast("long")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are neither alphanumeric nor whitespace.

    One ``regexp_count`` pass (round 14): the old form REWROTE the
    string (``regexp_replace`` + length diff) just to count the
    non-matching characters. Same values on every input, NULL included.
    """
    c = _c(col)
    n = F.length(c)
    punct = F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]"))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks).cast("double")).otherwise(
        F.lit(0.0)
    )


def mean_word_length(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double"))
    return F.when(F.size(toks) > 0, total / F.size(toks).cast("double")).otherwise(F.lit(0.0))


def quality_score(col: Column | str, lang: str = "en") -> Column:
    """Composite [0,1] document-quality heuristic: length band, low punct
    density, healthy stopword presence, sane mean word length.
    """
    wc = word_count(col).cast("double")
    length_ok = F.when((wc >= 10) & (wc <= 100000), F.lit(1.0)).otherwise(
        F.least(wc / F.lit(10.0), F.lit(1.0))
    )
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * F.lit(4.0), F.lit(1.0))
    sw_ok = F.least(stopword_ratio(col, lang) * F.lit(5.0), F.lit(1.0))
    mwl = mean_word_length(col)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (length_ok * 0.3 + punct_ok * 0.3 + sw_ok * 0.2 + mwl_ok * 0.2).alias("quality")


def alnum_tokens(col: Column | str) -> Column:
    """Lowercased alphanumeric-run tokens of the raw text —
    token-identical to ``tokens(normalized_text(col))`` in ONE regex
    pass. Empty / all-separator text → empty array; NULL → NULL (both
    propagate through ``split``/``array_remove`` natively).

    Cost note (round 13, guide §1.2 "per-task work"): the composed
    form ran TWO Java-regex passes over every document — a
    ``regexp_replace`` rewriting the whole string (Pattern + an output
    StringBuffer per row) and then a ``split``. A single ``split`` on
    the same character class emits the token array directly: measured
    0.30 s vs 2.97 s per corpus pass at ~sf1 (10×), token arrays
    verified identical over the full corpus. Equivalence is also
    provable, not just sampled: replacing every maximal non-alnum run
    with one space and then splitting on spaces IS splitting on those
    runs, with the edge empties the class-split leaves removed.
    """
    return F.array_remove(F.split(F.lower(_c(col)), r"[^a-z0-9]+"), "")


def normalized_text(col: Column | str) -> Column:
    """Canonical form for dedup: lowercase, strip non-alphanumerics to
    single spaces, collapse whitespace, trim.

    Built as ``array_join(alnum_tokens(col), " ")`` — the join of the
    single-regex-pass token array is exactly the
    replace-runs-with-space + trim string (see :func:`alnum_tokens`
    for the measured 10× and the equivalence argument; ``array_join``
    propagates NULL like the old expression did).
    """
    return F.array_join(alnum_tokens(col), " ")


def doc_fingerprint(col: Column | str) -> Column:
    """64-bit content fingerprint of the normalized text (xxhash64).

    Hash values are engine-specific; cross-engine checks compare distinct
    counts / group structure, not raw hashes.
    """
    return F.xxhash64(normalized_text(col))


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    'und' (undetermined) when nothing matches.
    """
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    scores = []
    for code, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("score"),
                F.lit(code).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit("und"))
