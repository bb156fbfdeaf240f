"""Relational + data-pipeline operators (SURVEY.md §2)."""

from .cleaning import (
    handle_missing_values,
    convert_time_columns,
    remove_duplicates,
    convert_ip_to_int_column,
    clean_transactions,
)
from .joins import range_join, geolocate, as_of_join
from .windows import rolling_count_24h, velocity_features
from .aggregates import (
    rate_by,
    value_counts,
    count_distinct,
    numeric_profile,
    histogram,
)

__all__ = [
    "handle_missing_values",
    "convert_time_columns",
    "remove_duplicates",
    "convert_ip_to_int_column",
    "clean_transactions",
    "range_join",
    "geolocate",
    "as_of_join",
    "rolling_count_24h",
    "velocity_features",
    "rate_by",
    "value_counts",
    "count_distinct",
    "numeric_profile",
    "histogram",
]
