"""External-coverage vintage gate (VERDICT r13 item 6).

At 235+ registered queries and a 50-slot driver window, the refresh
cycle is ~5 rounds even with perfect rotation — in round 13 a 36-query
tail silently aged to r6/r7 vintage because nothing failed when it
happened.  This gate makes the tail structurally impossible to ignore:
every query whose NEWEST external driver row is older than
``MAX_VINTAGE_ROUNDS`` rounds (relative to the newest recorded round)
must be scheduled in the live ``_PRIORITY_WINDOW``, i.e. the very next
driver run will refresh it.  If the stale tail ever exceeds the
window's free capacity, this fails and the round must drain it (slim
the fixed core, cap new-query slots) before anything else ships.
"""

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

import rotation  # noqa: E402

from _big_data_analytics_and_visualization_tracking_student_progress__spark.registry import (  # noqa: E402,E501
    _PRIORITY_WINDOW,
    all_queries,
)


def test_stale_vintage_queries_are_scheduled():
    status = rotation.query_status()
    history = rotation.load_history()
    assert history, "no CORRECTNESS_r*.json recorded"
    latest = max(history)
    window = set(_PRIORITY_WINDOW)
    stale = sorted(
        n
        for n, row in status.items()
        if row["checked_rounds"]
        and max(row["checked_rounds"]) < latest - rotation.MAX_VINTAGE_ROUNDS
    )
    unscheduled = [n for n in stale if n not in window]
    assert not unscheduled, (
        f"{len(unscheduled)} queries' newest external row is older than "
        f"{rotation.MAX_VINTAGE_ROUNDS} rounds (latest recorded round "
        f"r{latest}) and they are NOT in the live window: {unscheduled}"
    )


def test_never_checked_queries_are_scheduled():
    """A newly registered query must earn its first external row on the
    very next driver run — never-checked names may not sit outside the
    window (rows-only names are exempt after their one crash-gate row;
    before it they must be windowed like everything else)."""
    status = rotation.query_status()
    window = set(_PRIORITY_WINDOW)
    never = [
        n
        for n, row in status.items()
        if not row["checked_rounds"] and n not in window
    ]
    assert not never, f"never-externally-checked and unscheduled: {never}"


def test_window_names_are_registered():
    qs = set(all_queries())
    unknown = [n for n in _PRIORITY_WINDOW if n not in qs]
    assert not unknown, f"window names missing from registry: {unknown}"
