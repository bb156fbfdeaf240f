"""Source/sink strategies beyond plain scans (SURVEY.md §2.1, §4).

The reference reads three CSVs into RAM; this package adds the
storage-layout tools a 100 TB deployment needs: bucketed tables for
shuffle-free co-located joins and partitioned writes for partition
pruning.
"""

from .bucketing import write_bucketed, write_partitioned  # noqa: F401
