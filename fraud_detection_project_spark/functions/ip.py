"""IPv4 ↔ uint32 conversion as pure column expressions (SURVEY.md §2 F6/F7).

Reference semantics (``src/preprocessing/clean_data.py:44-61``):
``ip_to_int`` parses a dotted quad via ``inet_aton`` and falls back to
``int(float(s))`` for numeric strings (the Fraud_Data hot path stores IPs
as floats); anything else → null. ``int_to_ip`` is the inverse.

Both are expressed JVM-side (regex + arithmetic / bit ops) — no UDF, so
they stay inside whole-stage codegen and cost ~nothing at 100 TB scan
scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# strict dotted quad: 4 octets, each 0-255 (inet_aton also rejects >255).
_DOTTED = (
    r"^(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
    r"(\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}$"
)


def ip_to_int(col: Column | str) -> Column:
    """Dotted-quad or float-encoded IPv4 string → uint32 as LongType.

    Fallback order mirrors ``clean_data.py:44-53``: dotted quad first,
    then numeric-string truncation (``int(float(s))``), else NULL.
    """
    c = F.col(col).cast("string") if isinstance(col, str) else col.cast("string")
    parts = F.split(c, r"\.")
    quad_val = (
        parts.getItem(0).cast("long") * F.lit(16777216)
        + parts.getItem(1).cast("long") * F.lit(65536)
        + parts.getItem(2).cast("long") * F.lit(256)
        + parts.getItem(3).cast("long")
    )
    as_double = c.cast("double")
    return (
        F.when(c.rlike(_DOTTED), quad_val)
        .when(as_double.isNotNull(), F.floor(as_double).cast("long"))
        .otherwise(F.lit(None).cast("long"))
    )


def int_to_ip(col: Column | str) -> Column:
    """uint32 → dotted-quad string (``clean_data.py:55-61`` inverse)."""
    c = F.col(col).cast("long") if isinstance(col, str) else col.cast("long")
    octets = [
        F.shiftright(c, 24).bitwiseAND(F.lit(255)),
        F.shiftright(c, 16).bitwiseAND(F.lit(255)),
        F.shiftright(c, 8).bitwiseAND(F.lit(255)),
        c.bitwiseAND(F.lit(255)),
    ]
    return F.when(
        c.isNotNull() & (c >= 0) & (c <= 4294967295),
        F.concat_ws(".", *[o.cast("string") for o in octets]),
    ).otherwise(F.lit(None).cast("string"))
