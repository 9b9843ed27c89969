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
  * FAIL (non-zero exit, named keys) if the round-R window would leave
    any query at or beyond the ceiling: a query whose newest green row
    is <= R-3 (or which has no green row at all) MUST be inside the
    window, because parking it makes its evidence more than 3 rounds
    old the moment round R records.

WHICH window gets judged depends on where we are in the round cycle
(r11 verdict "what's wrong" #1 — the audit used to pretend the spent
window would run again the moment the driver wrote the round's file):

  * mid-round (the newest CORRECTNESS file does NOT cover the current
    first-50, i.e. the registry has been rotated past it): judge the
    CURRENT first-50 — the window the driver will actually record.
  * post-driver (the newest CORRECTNESS file covers exactly the
    current first-50 and every row is green — the round just completed
    and the registry hasn't been rotated yet): judge the PRE-COMMITTED
    next window in ``tools/next_window.json``.  A missing or
    stale-round plan file in this state is itself a violation — the
    rotation commit must write the plan before the driver spends the
    window (the ledger's pre-commitment, now enforced).

``--due`` prints the computed at-ceiling set (the list that must lead
the upcoming window) without judging the registry, so a round can be
planned from the files alone.  ``--simulate-next`` assumes the
effective round-R window goes green and checks that round R+1's
at-ceiling set fits in 50 slots AND (when a plan file for R+1 exists)
that the plan covers it.  ``tests/test_rotation.py`` runs the audit
under pytest, so a bad window breaks the suite before the driver
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
PLAN_FILE = "next_window.json"  # under tools/, written by the rotation commit


def load_rounds(repo_root: str) -> dict[int, dict]:
    """round -> raw row dict from every CORRECTNESS_r*.json."""
    rounds: dict[int, dict] = {}
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def _row_green(row: dict) -> bool:
    return bool(
        row.get("err") is None
        and row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def latest_green_from_rounds(rounds: dict[int, dict]) -> tuple[dict[str, int], int]:
    """(newest-green-round per query, newest recorded round)."""
    latest: dict[str, int] = {}
    newest_round = 0
    for rnd, rows in rounds.items():
        newest_round = max(newest_round, rnd)
        for key, row in rows.items():
            if _row_green(row):
                latest[key] = max(latest.get(key, 0), rnd)
    return latest, newest_round


def load_latest_green(repo_root: str) -> tuple[dict[str, int], int]:
    return latest_green_from_rounds(load_rounds(repo_root))


def load_plan(repo_root: str) -> dict | None:
    path = os.path.join(repo_root, "tools", PLAN_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def check_window(
    latest_green: dict[str, int],
    oracled: list[str],
    upcoming_round: int,
    window_size: int = WINDOW_SIZE,
    window: list[str] | None = None,
) -> tuple[list[tuple[str, int | None]], list[tuple[str, int | None]]]:
    """Pure core: (violations, due) for the upcoming round.

    ``oracled`` is the registry's oracle-backed keys IN REGISTRATION
    ORDER (rows-only keys already excluded).  ``window`` is the set of
    keys the round will actually record; when omitted it defaults to
    ``oracled[:window_size]`` — callers that may have rows-only keys
    inside the first 50 MUST pass the explicit ``registry[:50]`` slice
    instead (a rows-only key in the window shifts which oracled keys
    the driver records; ADVICE r11).

    due        = oracled keys whose newest green row is <= R-3 (or
                 absent): they MUST be inside the window.
    violations = the subset of due that the window parks.
    """
    win = set(oracled[:window_size] if window is None else window)
    due: list[tuple[str, int | None]] = []
    violations: list[tuple[str, int | None]] = []
    for key in oracled:
        newest = latest_green.get(key)
        if newest is None or newest <= upcoming_round - CEILING:
            due.append((key, newest))
            if key not in win:
                violations.append((key, newest))
    return violations, due


def resolve_window(
    registry: list[str],
    newest_rows: dict | None,
    plan: dict | None,
    upcoming_round: int,
    window_size: int = WINDOW_SIZE,
) -> tuple[list[str], bool, list[tuple[str, int | None]]]:
    """Pure core: which window does round ``upcoming_round`` record?

    Returns (window_keys, post_driver, plan_violations).

    post_driver is True when the newest CORRECTNESS file covers exactly
    the current first-50 with every row green — the just-finished round
    spent the current registry order, so the upcoming round runs the
    PRE-COMMITTED plan window instead.  In that state a missing plan
    file, or a plan pinned to a different round, is a violation (named
    with a ``<plan:...>`` pseudo-key so the failure is self-describing).
    """
    current = registry[:window_size]
    post_driver = bool(
        newest_rows is not None
        and set(newest_rows.keys()) == set(current)
        and all(_row_green(r) for r in newest_rows.values())
    )
    if not post_driver:
        return current, False, []
    if plan is None:
        return current, True, [
            ("<plan:tools/next_window.json missing in post-driver state>", None)
        ]
    if plan.get("for_round") != upcoming_round:
        return current, True, [
            (
                f"<plan:tools/next_window.json is for r{plan.get('for_round')}, "
                f"not upcoming r{upcoming_round}>",
                None,
            )
        ]
    window = list(plan["window"])
    # a malformed plan window would otherwise be judged without
    # complaint: short/long plans cannot be executed as a first-50
    # reorder, and a duplicate key silently wastes a slot
    if len(window) != window_size or len(set(window)) != len(window):
        return current, True, [
            (
                f"<plan:window malformed — {len(window)} keys, "
                f"{len(window) - len(set(window))} duplicate(s); "
                f"must be exactly {window_size} distinct>",
                None,
            )
        ]
    return window, True, []


def audit_core(
    registry: list[str],
    oracle_keys: set[str],
    rounds: dict[int, dict],
    plan: dict | None,
    window_size: int = WINDOW_SIZE,
) -> tuple[list, list, int, list[str], bool]:
    """(violations, due, upcoming_round, window, post_driver)."""
    latest, newest_round = latest_green_from_rounds(rounds)
    upcoming = newest_round + 1
    oracled = [k for k in registry if k in oracle_keys]
    window, post_driver, plan_violations = resolve_window(
        registry, rounds.get(newest_round), plan, upcoming, window_size
    )
    # a rows-only key inside the recorded window wastes a slot on a
    # weaker check — flag it (only REGISTERED keys can be judged
    # rows-only; a planned key that isn't registered yet is a planned
    # registration and exempt until it lands with an oracle)
    registered = set(registry)
    rows_only_in_window = [
        k for k in window if k in registered and k not in oracle_keys
    ]
    violations, due = check_window(
        latest, oracled, upcoming, window_size, window=window
    )
    violations += [(k, None) for k in rows_only_in_window]
    violations += plan_violations
    return violations, due, upcoming, window, post_driver


def _load_registry(repo_root: str) -> tuple[list[str], set[str]]:
    sys.path.insert(0, repo_root)
    import __spark_entry__ as entry  # noqa: PLC0415

    return list(entry.queries().keys()), set(entry.oracle_sql().keys())


def audit(repo_root: str) -> tuple[list, list, int, list[str]]:
    registry, oracle_keys = _load_registry(repo_root)
    violations, due, upcoming, window, _post = audit_core(
        registry, oracle_keys, load_rounds(repo_root), load_plan(repo_root)
    )
    return violations, due, upcoming, window


def simulate_next(
    repo_root: str,
) -> tuple[list[tuple[str, int | None]], int, list[str]]:
    """Feasibility of the round AFTER the upcoming one: assume the
    upcoming round's EFFECTIVE window (current first-50, or the plan
    window in post-driver state) records green in round R, then return
    (the at-ceiling set for round R+1, R+1, plan-coverage misses).  If
    that set exceeds 50 keys the window is over-committed — some query
    would be unrescuable next round no matter how r(R+1) rotates.  When
    a committed plan targets R+1, every due key must be inside it."""
    registry, oracle_keys = _load_registry(repo_root)
    rounds = load_rounds(repo_root)
    plan = load_plan(repo_root)
    latest, newest_round = latest_green_from_rounds(rounds)
    upcoming = newest_round + 1
    oracled = [k for k in registry if k in oracle_keys]
    window, _post, plan_violations = resolve_window(
        registry, rounds.get(newest_round), plan, upcoming
    )
    if plan_violations:  # post-driver with no usable plan: nothing to simulate
        return [(k, None) for k, _ in plan_violations], upcoming + 1, []
    simulated = dict(latest)
    for k in window:
        if k in oracle_keys:
            simulated[k] = upcoming
    due_next: list[tuple[str, int | None]] = []
    for key in oracled:
        newest = simulated.get(key)
        if newest is None or newest <= (upcoming + 1) - CEILING:
            due_next.append((key, newest))
    plan_misses: list[str] = []
    if plan is not None and plan.get("for_round") == upcoming + 1:
        planned = set(plan["window"])
        plan_misses = [k for k, _ in due_next if k not in planned]
    return due_next, upcoming + 1, plan_misses


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
        help="assume the upcoming round's effective window goes green and "
        "print the round-after's at-ceiling set; fails if it exceeds "
        "the 50-slot window or escapes a committed plan for that round",
    )
    args = ap.parse_args()
    if args.simulate_next:
        due_next, rnd, plan_misses = simulate_next(args.repo)
        print(
            f"round r{rnd} (simulated: effective window green at r{rnd - 1}): "
            f"{len(due_next)} queries at the ceiling / {WINDOW_SIZE} slots"
        )
        for key, newest in due_next:
            print(f"  {key}  (newest green: {'never' if newest is None else f'r{newest}'})")
        if len(due_next) > WINDOW_SIZE:
            print(
                f"OVER-COMMITTED: {len(due_next)} > {WINDOW_SIZE} — the "
                "effective window strands evidence no r-next rotation can save",
                file=sys.stderr,
            )
            return 1
        if plan_misses:
            print(
                f"PLAN GAP: tools/{PLAN_FILE} targets r{rnd} but parks "
                f"{len(plan_misses)} at-ceiling quer"
                f"{'y' if len(plan_misses) == 1 else 'ies'}: {plan_misses}",
                file=sys.stderr,
            )
            return 1
        if any(k.startswith("<plan:") for k, _ in due_next):
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
            "recorded window (or the window/plan is malformed):",
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
        f"all {len(due)} at-ceiling queries are inside the effective window"
    )
    # surface the plan's not-yet-registered keys: they are exempt from
    # the rows-only check ONLY on the assumption they land with the
    # next rotation — a typo'd key is indistinguishable from a planned
    # registration mechanically, so make the assumed set visible for
    # the human/judge to eyeball (the staleness ceiling remains the
    # mechanical backstop: a typo that parks a DUE key still fails)
    plan = load_plan(args.repo)
    if plan is not None:
        registry, _ = _load_registry(args.repo)
        registered = set(registry)
        planned = [k for k in plan.get("window", []) if k not in registered]
        if planned:
            print(
                f"  plan r{plan.get('for_round')} assumes "
                f"{len(planned)} registration(s) will land with the "
                f"rotation (verify spelling): {planned}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
