#!/usr/bin/env python
"""Mechanical staleness audit for the SURVEY.md §8.3 rotation ledger.

The driver records correctness rows for exactly the FIRST 50 queries
registered in ``__spark_entry__.queries()`` each round; the contract is
that no registered query's newest green row may go more than 3 rounds
stale.  Twice (the r7 non-rotation, the r10 ledger's 24 orphaned
r7-evidenced queries) the hand-maintained ledger violated that rule
without anything failing.  This tool makes the rule mechanical:

  * parse every ``CORRECTNESS_r*.json`` at the repo root,
  * compute each registered query's newest GREEN round (green =
    rows/schema/hash all match with no error; rows-only registrations —
    those without an ``oracle_sql()`` entry — are exempt by design,
    their signal lives in hash-exact companions),
  * derive the upcoming round R = newest recorded round + 1, and
  * FAIL (non-zero exit, named keys) if the CURRENT first-50 window
    would leave any query at or beyond the ceiling: a query whose
    newest green row is <= R-3 (or which has no green row at all) MUST
    be inside the window, because parking it makes its evidence more
    than 3 rounds old the moment round R records.

``--due`` prints the computed at-ceiling set (the list that must lead
the upcoming window) without judging the registry, so a round can be
planned from the files alone.  ``tests/test_rotation.py`` runs the
audit under pytest, so a bad window breaks the suite before the driver
spends the round on it.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

WINDOW_SIZE = 50
CEILING = 3  # max rounds a green row may age before it must be re-driven


def load_latest_green(repo_root: str) -> tuple[dict[str, int], int]:
    """(newest-green-round per query, newest recorded round) from the
    CORRECTNESS_r*.json files."""
    latest: dict[str, int] = {}
    newest_round = 0
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        newest_round = max(newest_round, rnd)
        with open(path) as f:
            rows = json.load(f)
        for key, row in rows.items():
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                latest[key] = max(latest.get(key, 0), rnd)
    return latest, newest_round


def check_window(
    latest_green: dict[str, int],
    oracled: list[str],
    upcoming_round: int,
    window_size: int = WINDOW_SIZE,
) -> tuple[list[tuple[str, int | None]], list[tuple[str, int | None]]]:
    """Pure core: (violations, due) for the upcoming round.

    ``oracled`` is the registry's oracle-backed keys IN REGISTRATION
    ORDER (rows-only keys already excluded); the window is its first
    ``window_size`` entries as the driver sees them interleaved with
    any rows-only keys — callers pass the first-50 slice of the FULL
    registry filtered to oracled keys, which is identical while the
    rows-only keys sit in the tail.

    due        = oracled keys whose newest green row is <= R-3 (or
                 absent): they MUST be inside the window.
    violations = the subset of due that the window parks.
    """
    window = set(oracled[:window_size])
    due: list[tuple[str, int | None]] = []
    violations: list[tuple[str, int | None]] = []
    for key in oracled:
        newest = latest_green.get(key)
        if newest is None or newest <= upcoming_round - CEILING:
            due.append((key, newest))
            if key not in window:
                violations.append((key, newest))
    return violations, due


def audit(repo_root: str) -> tuple[list, list, int, list[str]]:
    sys.path.insert(0, repo_root)
    import __spark_entry__ as entry  # noqa: PLC0415

    registry = list(entry.queries().keys())
    oracle_keys = set(entry.oracle_sql().keys())
    # rows-only registrations are exempt (no hash gate exists for them);
    # keep the remaining keys in registration order so the first-50
    # window slice matches what the driver records
    oracled = [k for k in registry if k in oracle_keys]
    window = registry[:WINDOW_SIZE]
    # a rows-only key inside the first 50 would waste a recorded slot
    # on a weaker check — flag it as a violation too
    rows_only_in_window = [k for k in window if k not in oracle_keys]
    latest, newest_round = load_latest_green(repo_root)
    upcoming = newest_round + 1
    violations, due = check_window(latest, oracled, upcoming)
    violations += [(k, None) for k in rows_only_in_window]
    return violations, due, upcoming, window


def simulate_next(repo_root: str) -> tuple[list[tuple[str, int | None]], int]:
    """Feasibility of the round AFTER the upcoming one: assume the
    current first-50 window all records green in round R, then return
    (the at-ceiling set for round R+1, R+1).  If that set exceeds 50
    keys the CURRENT window is over-committed — some query would be
    unrescuable next round no matter how r(R+1) rotates."""
    sys.path.insert(0, repo_root)
    import __spark_entry__ as entry  # noqa: PLC0415

    registry = list(entry.queries().keys())
    oracle_keys = set(entry.oracle_sql().keys())
    oracled = [k for k in registry if k in oracle_keys]
    latest, newest_round = load_latest_green(repo_root)
    upcoming = newest_round + 1
    simulated = dict(latest)
    for k in registry[:WINDOW_SIZE]:
        if k in oracle_keys:
            simulated[k] = upcoming
    due_next: list[tuple[str, int | None]] = []
    for key in oracled:
        newest = simulated.get(key)
        if newest is None or newest <= (upcoming + 1) - CEILING:
            due_next.append((key, newest))
    return due_next, upcoming + 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument(
        "--due",
        action="store_true",
        help="print the at-ceiling set for the upcoming round and exit 0",
    )
    ap.add_argument(
        "--simulate-next",
        action="store_true",
        help="assume the current window goes green this round and "
        "print the round-after's at-ceiling set; fails if it exceeds "
        "the 50-slot window",
    )
    args = ap.parse_args()
    if args.simulate_next:
        due_next, rnd = simulate_next(args.repo)
        print(
            f"round r{rnd} (simulated: current window green at r{rnd - 1}): "
            f"{len(due_next)} queries at the ceiling / {WINDOW_SIZE} slots"
        )
        for key, newest in due_next:
            print(f"  {key}  (newest green: {'never' if newest is None else f'r{newest}'})")
        if len(due_next) > WINDOW_SIZE:
            print(
                f"OVER-COMMITTED: {len(due_next)} > {WINDOW_SIZE} — the "
                "current window strands evidence no r-next rotation can save",
                file=sys.stderr,
            )
            return 1
        return 0
    violations, due, upcoming, _window = audit(args.repo)
    if args.due:
        print(f"round r{upcoming}: {len(due)} queries at the staleness ceiling (MUST be in the first-50 window):")
        for key, newest in due:
            print(f"  {key}  (newest green: {'never' if newest is None else f'r{newest}'})")
        return 0
    if violations:
        print(
            f"ROTATION VIOLATION for upcoming round r{upcoming}: "
            f"{len(violations)} quer{'y' if len(violations) == 1 else 'ies'} "
            "would exceed the 3-round staleness ceiling outside the "
            "first-50 window:",
            file=sys.stderr,
        )
        for key, newest in violations:
            print(
                f"  {key}  (newest green: {'never/rows-only' if newest is None else f'r{newest}'})",
                file=sys.stderr,
            )
        return 1
    print(
        f"rotation OK for upcoming round r{upcoming}: "
        f"all {len(due)} at-ceiling queries are inside the first-50 window"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
