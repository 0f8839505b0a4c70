"""Unit tests for bench.py's steal-aware timing loop (VERDICT r7 item 1).

The r07 driver bench ran inside a sustained ~7.5%-steal co-tenant window
and read 2.45x the anchor while the clean-window record was 1.80x —
min-of-2 cannot filter SUSTAINED contention. ``time_with_escalation``
must (a) stop at the base repeat count on clean windows, (b) keep
re-running a query while every kept run was timed under contention,
(c) stop early once a clean repeat lands, and (d) degrade gracefully
when /proc/stat is unreadable.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bench import time_with_escalation  # noqa: E402


def _mk_run(times):
    it = iter(times)

    def run_once():
        return next(it)

    return run_once


def _mk_steal(deltas):
    """steal_fn returning cumulative jiffies: one delta consumed per
    (before, after) sample pair."""
    state = {"v": 0, "half": False}
    it = iter(deltas)

    def steal_fn():
        if state["half"]:
            state["v"] += next(it)
        state["half"] = not state["half"]
        return state["v"]

    return steal_fn


def test_clean_window_stops_at_base_repeats():
    run = _mk_run([1.0, 0.9, 99.0, 99.0])
    steal = _mk_steal([0, 1, 0, 0])  # ~0-1 jiffies/sec: clean
    best, rate, esc = time_with_escalation(run, 2, 4, 25.0, steal_fn=steal)
    assert best == 0.9
    assert rate is not None and rate <= 25.0
    assert esc is False


def test_sustained_contention_escalates_to_max():
    # every repeat contended (100 jiffies over ~1s = 100/s > 25/s)
    run = _mk_run([2.0, 2.1, 1.9, 1.8])
    steal = _mk_steal([200, 210, 190, 180])
    best, rate, esc = time_with_escalation(run, 2, 4, 25.0, steal_fn=steal)
    assert best == 1.8  # min over ALL 4 repeats, not just the base 2
    assert esc is True
    assert rate > 25.0  # the record is honest: kept run was contended


def test_escalation_stops_once_a_clean_repeat_wins():
    # repeats 1-2 contended and slow; repeat 3 clean and fastest -> stop
    # at 3, never take the 4th
    run = _mk_run([2.0, 2.1, 1.0])
    steal = _mk_steal([200, 210, 5])
    best, rate, esc = time_with_escalation(run, 2, 4, 25.0, steal_fn=steal)
    assert best == 1.0
    assert rate == 5.0
    assert esc is True


def test_clean_but_slower_extra_repeat_does_not_replace_best():
    # a contended fast run stays best if the clean repeat is slower; the
    # loop must still terminate (kept run stays contended through max)
    run = _mk_run([1.0, 1.05, 3.0, 3.1])
    steal = _mk_steal([100, 100, 0, 0])
    best, rate, esc = time_with_escalation(run, 2, 4, 25.0, steal_fn=steal)
    assert best == 1.0
    assert rate == 100.0
    assert esc is True


def test_unreadable_steal_degrades_to_plain_min_of_n():
    run = _mk_run([1.2, 1.1, 99.0])
    best, rate, esc = time_with_escalation(
        run, 2, 4, 25.0, steal_fn=lambda: None
    )
    assert best == 1.1
    assert rate is None
    assert esc is False


def test_before_attempt_hook_runs_per_repeat():
    calls = []
    run = _mk_run([1.0, 1.0])
    steal = _mk_steal([0, 0])
    time_with_escalation(
        run, 2, 4, 25.0, steal_fn=steal,
        before_attempt=lambda: calls.append(1),
    )
    assert len(calls) == 2


def test_no_false_escalation_when_max_equals_base():
    """Review finding r8: with max_repeats == repeats no extra attempt
    can run, so a contended kept run must NOT be flagged escalated —
    the record would otherwise claim an escalation that never
    happened."""
    run = _mk_run([1.0, 1.1])
    steal = _mk_steal([200, 210])  # contended throughout
    best, rate, esc = time_with_escalation(run, 2, 2, 25.0, steal_fn=steal)
    assert best == 1.0
    assert rate > 25.0  # honesty: kept run was contended
    assert esc is False  # but no escalation ever ran
