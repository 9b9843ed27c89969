"""The §8.3 rotation ledger, made mechanical (r10 verdict task 2).

`tools/rotation_check.py` parses every CORRECTNESS_r*.json, computes
each registered query's newest green driver row, and fails if the
CURRENT first-50 registry window would let any query's evidence exceed
the 3-round staleness ceiling.  Running it under pytest means a badly
rotated window breaks the suite BEFORE the driver spends a round on it
— the failure mode that orphaned 24 queries at r7 evidence (and,
earlier, skipped the r7 rotation entirely) can no longer pass silently.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from rotation_check import audit, check_window  # noqa: E402


def test_current_window_satisfies_staleness_ceiling():
    violations, due, upcoming, window = audit(REPO)
    assert len(window) == 50
    assert violations == [], (
        f"upcoming round r{upcoming}: these queries would exceed the "
        f"3-round staleness ceiling outside the first-50 window: "
        f"{violations}"
    )


def test_every_at_ceiling_query_leads_the_window():
    # not just "no violations": the due set must be non-degenerate
    # (an empty due set would mean the files weren't parsed at all)
    _violations, due, _upcoming, window = audit(REPO)
    assert due, "no at-ceiling queries found — CORRECTNESS files unread?"
    for key, _newest in due:
        assert key in window


# --- pure-core behavior on synthetic ledgers -------------------------


def test_check_window_flags_parked_stale_query():
    latest = {"qA": 8, "qB": 9, "qC": 7}
    registry = ["qA", "qB", "qC"]
    violations, due = check_window(latest, registry, 11, window_size=2)
    # qC (r7 <= 11-3) is due but parked outside the 2-slot window
    assert ("qC", 7) in violations
    assert ("qA", 8) in due  # r8 hits the ceiling at r11 — in window, ok
    assert all(k != "qB" for k, _ in due)  # r9 is 2 rounds old: parked ok


def test_check_window_requires_never_evidenced_in_window():
    latest = {"qA": 10}
    registry = ["qA", "qNEW"]
    violations, _due = check_window(latest, registry, 11, window_size=1)
    assert ("qNEW", None) in violations
    violations, _due = check_window(latest, ["qNEW", "qA"], 11, window_size=1)
    assert violations == []


def test_check_window_ceiling_boundary():
    # newest green exactly R-3 => at ceiling, must be in window;
    # R-2 => one round of slack left, may park
    latest = {"qX": 8, "qY": 9}
    violations, due = check_window(latest, ["qY", "qX"], 11, window_size=1)
    assert ("qX", 8) in violations
    violations, due = check_window(latest, ["qX", "qY"], 11, window_size=1)
    assert violations == []


def test_simulated_next_round_is_not_overcommitted():
    # verdict r10 task 5: the r12 window must be solvable GIVEN the
    # r11 window — assume the current first-50 goes green and check
    # the round-after's at-ceiling set fits in 50 slots
    from rotation_check import simulate_next

    due_next, rnd = simulate_next(REPO)
    assert len(due_next) <= 50, (rnd, len(due_next))
    assert due_next, "simulation found nothing due — files unread?"
