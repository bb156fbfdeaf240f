"""Driver CORRECTNESS-window ordering invariants (VERDICT r2 item 1).

The driver checks the first 50 entries of ``queries()``; these tests pin
that window to cover every query that has never received a driver row,
and fail fast on typos in the priority lists.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fraud_detection_project_spark import queries as q  # noqa: E402

WINDOW = 50


def _window_names():
    return list(q.driver_ordered(dict(q.QUERIES)))[:WINDOW]


def test_priority_names_exist():
    # driver_ordered raises KeyError on unknown names
    q.driver_ordered(dict(q.QUERIES))


def test_never_driver_verified_queries_fit_in_window():
    covered = set()
    for art in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        p = os.path.join(REPO, art)
        if os.path.exists(p):
            covered |= set(json.load(open(p)))
    window = set(_window_names())
    rowless = [n for n in q.QUERIES if n not in covered and n not in window]
    assert rowless == [], f"driver-rowless queries outside 50-row window: {rowless}"


def test_oracle_ordering_is_subset_of_query_ordering():
    qs = list(q.driver_ordered(dict(q.QUERIES)))
    os_ = list(q.driver_ordered(dict(q.ORACLE_SQL)))
    pos = {n: i for i, n in enumerate(qs)}
    assert all(n in pos for n in os_)
    assert os_ == sorted(os_, key=pos.__getitem__)


def test_entry_module_uses_ordering():
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    assert list(entry.queries())[:WINDOW] == _window_names()
