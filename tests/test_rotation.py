"""The §8.3 rotation ledger, made mechanical (r10 verdict task 2;
post-driver semantics per r11 verdict task 2).

`tools/rotation_check.py` parses every CORRECTNESS_r*.json, computes
each registered query's newest green driver row, and fails if the
round's EFFECTIVE window would let any query's evidence exceed the
3-round staleness ceiling.  Mid-round the effective window is the
current first-50; the moment the driver writes a round's file covering
exactly that window all-green ("post-driver" state), the audit judges
the PRE-COMMITTED next window in tools/next_window.json instead — the
r11 defect was evaluating the spent window as if it would run again,
turning the suite red by construction at every round handoff.
Running it under pytest means a badly rotated window (or a missing /
stale plan file) breaks the suite BEFORE the driver spends a round.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from rotation_check import (  # noqa: E402
    WINDOW_SIZE,
    _row_green,
    audit,
    audit_core,
    check_window,
    load_plan,
    load_rounds,
    simulate_next,
)


def _green(keys):
    return {
        k: {
            "err": None,
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
        }
        for k in keys
    }


def _registry():
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    return list(entry.queries().keys()), set(entry.oracle_sql().keys())


def test_current_window_satisfies_staleness_ceiling():
    violations, due, upcoming, window = audit(REPO)
    assert len(window) == 50
    assert violations == [], (
        f"upcoming round r{upcoming}: these queries would exceed the "
        f"3-round staleness ceiling outside the effective window: "
        f"{violations}"
    )


def test_every_at_ceiling_query_leads_the_window():
    # not just "no violations": the due set must be non-degenerate
    # (an empty due set would mean the files weren't parsed at all)
    _violations, due, _upcoming, window = audit(REPO)
    assert due, "no at-ceiling queries found — CORRECTNESS files unread?"
    for key, _newest in due:
        assert key in window


# --- post-driver semantics on the REAL registry + plan ----------------
# Simulate "the driver just wrote this round's file, registry not yet
# rotated": the audit must judge the committed next_window.json plan,
# not the spent window — the state that failed 3 tests at the r11
# handoff.  The r12 verdict's find, one level up: these fixtures used
# to hard-code "the on-disk ledger is pre-driver", so the moment the
# driver wrote the round's real CORRECTNESS file they synthesized a
# phantom extra round.  Both simulation fixtures therefore derive
# their state from the PRE-DRIVER PREFIX of the live ledger — the
# same post-driver detection audit_core performs, applied in reverse:
# drop trailing rounds whose keyset is exactly the current first-50
# with every row green.  The prefix is mid-round by construction, in
# BOTH halves of a round (before and after the driver's file lands).


def _pre_driver_prefix(registry, rounds):
    current = set(registry[:WINDOW_SIZE])
    rounds = dict(rounds)
    # strip AT MOST one trailing round: only one post-driver round can
    # exist mid-handoff, and an unbounded loop would silently drop a
    # genuine pre-driver historical round that coincidentally matches
    # the current window — or empty the dict entirely and crash
    # _post_driver_rounds' max() (ADVICE r13)
    if rounds and len(rounds) > 1:
        newest = rounds[max(rounds)]
        if set(newest.keys()) == current and all(
            _row_green(r) for r in newest.values()
        ):
            del rounds[max(rounds)]
    assert rounds, "pre-driver prefix stripped every ledger round"
    return rounds


def _post_driver_rounds():
    registry, oracle_keys = _registry()
    rounds = _pre_driver_prefix(registry, load_rounds(REPO))
    spent_round = max(rounds) + 1
    rounds[spent_round] = _green(registry[:WINDOW_SIZE])
    return registry, oracle_keys, rounds, spent_round


def test_post_driver_state_judges_committed_plan():
    registry, oracle_keys, rounds, spent = _post_driver_rounds()
    plan = load_plan(REPO)
    assert plan is not None, "rotation commit must write tools/next_window.json"
    assert plan["for_round"] == spent + 1
    violations, due, upcoming, window, post_driver = audit_core(
        registry, oracle_keys, rounds, plan
    )
    assert post_driver
    assert upcoming == spent + 1
    assert window == list(plan["window"])
    assert due, "post-driver simulation found nothing due — inputs broken?"
    assert violations == [], (
        f"the committed r{upcoming} plan parks at-ceiling queries: {violations}"
    )


def test_post_driver_state_without_plan_is_a_violation():
    registry, oracle_keys, rounds, _spent = _post_driver_rounds()
    violations, _due, _upcoming, _window, post_driver = audit_core(
        registry, oracle_keys, rounds, plan=None
    )
    assert post_driver
    assert any(k.startswith("<plan:") and "missing" in k for k, _ in violations)


def test_post_driver_state_with_stale_plan_is_a_violation():
    registry, oracle_keys, rounds, spent = _post_driver_rounds()
    stale = {"for_round": spent, "window": registry[:WINDOW_SIZE]}
    violations, _due, _upcoming, _window, post_driver = audit_core(
        registry, oracle_keys, rounds, stale
    )
    assert post_driver
    assert any(k.startswith("<plan:") for k, _ in violations)


def test_mid_round_state_ignores_plan_and_judges_registry():
    # newest round covers a DIFFERENT keyset than the current first-50
    # (registry already rotated) -> normal path, even with a plan file.
    # Built from the pre-driver prefix so it holds in both handoff
    # states (the live newest round, when post-driver, IS the current
    # first-50 — the opposite of what this test exercises).
    registry, oracle_keys = _registry()
    rounds = _pre_driver_prefix(registry, load_rounds(REPO))
    bogus_plan = {"for_round": max(rounds) + 1, "window": ["qZZ_not_real"]}
    violations, _due, _upcoming, window, post_driver = audit_core(
        registry, oracle_keys, rounds, bogus_plan
    )
    assert not post_driver
    assert window == registry[:WINDOW_SIZE]
    assert violations == []


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


def test_rows_only_key_in_window_shifts_oracled_slice():
    # ADVICE r11: the recorded window is registry[:N], NOT oracled[:N].
    # With a rows-only key in slot 2 of a 2-slot window, the oracled
    # slice [qA, qB] would wrongly treat qB as recorded — qB is due and
    # actually parked, so it MUST be a violation.
    registry = ["qA", "qROWS", "qB"]
    oracle_keys = {"qA", "qB"}
    rounds = {10: _green(["qA", "qB"]), 12: _green(["qA", "qROWS"])}
    # note: r12 covers registry[:2] but qROWS can't be hash-green in a
    # real file; force mid-round by making a row non-green
    rounds[12]["qROWS"]["hash_match"] = False
    violations, due, upcoming, window, post_driver = audit_core(
        registry, oracle_keys, rounds, plan=None, window_size=2
    )
    assert not post_driver
    assert upcoming == 13
    assert ("qB", 10) in due
    assert ("qB", 10) in violations  # parked outside registry[:2]
    assert ("qROWS", None) in violations  # rows-only wasting a slot


def test_simulated_next_round_is_not_overcommitted():
    # verdict r10 task 5 / r11 task 4: the round-after must be solvable
    # GIVEN the effective window — assume it goes green and check the
    # at-ceiling set fits in 50 slots; when a committed plan targets
    # that round, it must cover every due key
    due_next, rnd, plan_misses = simulate_next(REPO)
    assert len(due_next) <= 50, (rnd, len(due_next))
    assert due_next, "simulation found nothing due — files unread?"
    assert plan_misses == [], (
        f"tools/next_window.json targets r{rnd} but parks {plan_misses}"
    )


def test_post_driver_state_with_malformed_plan_window_is_a_violation():
    # wrong-size and duplicate-key plan windows cannot be executed as
    # a first-50 reorder — both must be named violations, not judged
    registry, oracle_keys, rounds, spent = _post_driver_rounds()
    short = {"for_round": spent + 1, "window": registry[: WINDOW_SIZE - 1]}
    violations, _due, _up, _win, post_driver = audit_core(
        registry, oracle_keys, rounds, short
    )
    assert post_driver
    assert any("malformed" in k for k, _ in violations)
    dup = {
        "for_round": spent + 1,
        "window": registry[: WINDOW_SIZE - 1] + [registry[0]],
    }
    violations, _due, _up, _win, _pd = audit_core(
        registry, oracle_keys, rounds, dup
    )
    assert any("malformed" in k and "1 duplicate" in k for k, _ in violations)
