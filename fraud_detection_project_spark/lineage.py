"""Checkpoint source-lineage registry (VERDICT r10 item 3).

``localCheckpoint`` materializes a frame and truncates its lineage: the
physical plan afterwards shows only ``Scan ExistingRDD[...]`` with no
table name, so the forced-broadcast census cannot classify the frame's
growth law from the plan. That was the census's one documented blind
spot — a data-proportional checkpoint put under an ``F.broadcast`` hint
would classify bounded and OOM the driver at the 100 TB design point.

The census now FAILS CLOSED on checkpoint scans under a forced
exchange. This module is the explicit, creation-time escape hatch:
engine code that checkpoints a frame whose row count is bounded BY
CONSTRUCTION (an enum-keyed aggregate, a literal-pruned term set, a
≤|brands|² duel frame) tags it with :func:`bounded_checkpoint`, which
records the materialized scan's exact output signature (attribute
names + expr-ids — session-unique, so no cross-frame collisions) plus
a human-readable reason. ``tools/plan_audit.py`` consults the registry
when it walks a BroadcastExchange subtree: a registered scan is
bounded, an unregistered one is an offence.

The tag is an ASSERTION the author makes; the census verifies the hint
sits over a tagged frame, and the reason string is the audit trail. A
tag on a genuinely data-proportional frame is a bug in the tagging
call site — reviewable by grepping the (few) call sites, which is the
point: the claim lives next to the construction that justifies it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# materialized-scan signature -> reason the frame is bounded
_BOUNDED_CKPT_SIGS: dict[str, str] = {}

_SCAN_RE = re.compile(r"Scan ExistingRDD[^\[]*\[([^\]]*)\]")


_ID_RE = re.compile(r"#\d+L?")


def _normalize_sig(bracket: str) -> str:
    """Attribute-NAME signature of a scan bracket: expr-ids stripped.

    Catalyst REWRITES expr-ids when the same frame is referenced more
    than once in a plan (attribute dedup on self-joins), so an id-exact
    signature fails to match the second and later uses of a registered
    frame. Name-keying matches every use; the trade-off, documented: an
    UNREGISTERED ExistingRDD scan whose column names coincide exactly
    with a registered frame's would also pass. Call sites therefore
    give engine-internal bounded frames distinctive column names (e.g.
    bm25's query-term frame carries ``qdf``, not the generic ``df``
    that the UNBOUNDED tfidf vocabulary frame also uses)."""
    return _ID_RE.sub("", bracket).replace(" ", "")


def _scan_signature(df: DataFrame) -> str:
    """The normalized ``Scan ExistingRDD[...]`` signature of a
    materialized frame's own plan — the attribute-name list every
    consuming plan prints for this scan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = _SCAN_RE.search(plan)
    return _normalize_sig(m.group(1)) if m else ""


def bounded_checkpoint(
    df: DataFrame, reason: str, eager: bool = True
) -> DataFrame:
    """``localCheckpoint`` a frame whose row count is bounded by
    construction, registering the materialized scan so the
    forced-broadcast census can verify hints above it.

    ``reason`` must say WHY the frame is bounded (the growth-law
    argument), e.g. "≤ |query terms| rows: tf is literal-IN-pruned
    upstream". Empty reasons are rejected — the registry is an audit
    trail, not a mute allowlist.
    """
    if not reason or not reason.strip():
        raise ValueError("bounded_checkpoint requires a non-empty reason")
    out = df.localCheckpoint(eager=eager)
    sig = _scan_signature(out)
    if sig:
        _BOUNDED_CKPT_SIGS[sig] = reason
    return out


def register_bounded(df: DataFrame, reason: str) -> DataFrame:
    """Register an ALREADY-materialized bounded frame without
    checkpointing it — the ``spark.createDataFrame(literal_rows)``
    case: PySpark parallelizes Python lists through an RDD, so literal
    grids (threshold sweeps, banding configs, predicate lists) print as
    ``Scan ExistingRDD`` exactly like a checkpoint and would otherwise
    fail the census's fail-closed checkpoint rule despite being bounded
    by their own source text. Returns ``df`` unchanged."""
    if not reason or not reason.strip():
        raise ValueError("register_bounded requires a non-empty reason")
    sig = _scan_signature(df)
    if sig:
        _BOUNDED_CKPT_SIGS[sig] = reason
    return df


def is_bounded_ckpt_scan(plan_line: str) -> bool:
    """True when a physical-plan ``Scan ExistingRDD`` line belongs to a
    frame registered via :func:`bounded_checkpoint` /
    :func:`register_bounded` in this session (name-signature match —
    see :func:`_normalize_sig` for the rewrite rationale)."""
    m = _SCAN_RE.search(plan_line)
    return bool(m) and _normalize_sig(m.group(1)) in _BOUNDED_CKPT_SIGS


def registered() -> dict[str, str]:
    """Snapshot of the registry (signature -> reason), for tests."""
    return dict(_BOUNDED_CKPT_SIGS)
