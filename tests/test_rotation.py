"""Verification-rotation integrity.

Round 3's verdict found 5 queries whose only green driver row was from
round 1 while their defining files had churned since — the hand-rotated
``_VERIFY_FIRST`` under-shot the driver's ~50-row window. These tests
make that failure mode structural instead of vigilance-dependent:

- the committed list must match ``tools/rotate_verify_first.py`` output
  (so rotation is mechanical, derived from the recorded evidence);
- every registry query must either have a green row within the last two
  recorded rounds or sit inside the next driver window, so no query's
  evidence can silently age out.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "rotate_verify_first", os.path.join(REPO, "tools", "rotate_verify_first.py")
)
rotate = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rotate)


@pytest.fixture(scope="module")
def registry():
    from kafka2clickhouse_py_streamer_spark.operators.base import all_queries

    return all_queries()


def test_verify_first_matches_tool(registry):
    from kafka2clickhouse_py_streamer_spark.operators.base import _VERIFY_FIRST

    order, _ = rotate.rotation()
    assert list(_VERIFY_FIRST) == order, (
        "base.py's _VERIFY_FIRST is stale — run "
        "`python tools/rotate_verify_first.py --write`"
    )


def test_verify_first_covers_registry(registry):
    from kafka2clickhouse_py_streamer_spark.operators.base import _VERIFY_FIRST

    assert sorted(_VERIFY_FIRST) == sorted(registry)


def test_no_query_ages_out_of_window(registry):
    """Every query: green within the last 2 rounds, or in the next window.

    The driver records ~WINDOW rows per round from the head of the
    registry ordering, so anything in the head of ``_VERIFY_FIRST`` gets
    fresh evidence next round; anything outside it must already be
    recent.

    OVER-SUBSCRIPTION: a round that adds many operators can have more
    verification-needing queries (never-green + stale) than window
    slots — then some MUST wait a round, and the invariant becomes:
    the window is packed exclusively with needy queries (no fresh
    green occupies a slot while a needy one waits), and the spill is
    exactly the over-subscription, never more. When the need fits the
    window, this degenerates to the original strict no-aging-out
    check."""
    from kafka2clickhouse_py_streamer_spark.operators.base import _VERIFY_FIRST

    last_green, _, latest = rotate.evidence()
    if latest == 0:
        pytest.skip("no CORRECTNESS files recorded yet")
    next_window = set(_VERIFY_FIRST[: rotate.WINDOW])
    needy = {
        n for n in registry if last_green.get(n, 0) < latest - 1
    }
    spilled = sorted(needy - next_window)
    overflow = max(0, len(needy) - rotate.WINDOW)
    assert len(spilled) <= overflow, (
        f"evidence aging out of driver window: {spilled} "
        f"(need={len(needy)}, window={rotate.WINDOW})"
    )
    if overflow:
        # every window slot must be spent on a needy query
        assert next_window <= needy, sorted(next_window - needy)


def test_stale_spill_is_mirror_green(registry):
    """Capacity backstop: any query that is BOTH outside the staleness
    horizon and outside the next driver window (the 153 > 50x3 overflow
    round 5's verdict flagged) must be green in a committed local
    oracle mirror recorded for the round in progress
    (``LOCAL_ORACLE_r{N}.json``, written by
    ``tools/local_oracle_mirror.py``). Driver evidence stays primary;
    the mirror is the recorded answer for what the window can't hold."""
    import importlib.util as _ilu

    spec2 = _ilu.spec_from_file_location(
        "local_oracle_mirror",
        os.path.join(REPO, "tools", "local_oracle_mirror.py"),
    )
    mirror_mod = _ilu.module_from_spec(spec2)
    spec2.loader.exec_module(mirror_mod)

    from kafka2clickhouse_py_streamer_spark.operators.base import _VERIFY_FIRST

    last_green, _, latest = rotate.evidence()
    if latest == 0:
        pytest.skip("no CORRECTNESS files recorded yet")
    next_window = set(_VERIFY_FIRST[: rotate.WINDOW])
    needy = {n for n in registry if last_green.get(n, 0) < latest - 1}
    spilled = sorted(needy - next_window)
    if not spilled:
        pytest.skip("registry fits the driver window — no spill")
    mround, art = mirror_mod.latest_mirror()
    assert art is not None and mround > latest, (
        f"{len(spilled)} queries spill past the driver window but no "
        f"current-round LOCAL_ORACLE_r{latest + 1:02d}.json exists — run "
        "`python tools/local_oracle_mirror.py`"
    )
    not_green = [
        n for n in spilled
        if not art["results"].get(n, {}).get("ok", False)
    ]
    assert not not_green, (
        f"spilled queries lack mirror evidence: {not_green}"
    )


def test_churned_greens_rank_before_unchurned(registry):
    """A green whose defining file changed outranks an unchurned green
    of the same round — the exact pattern that hid the round-2 q28
    regression (code refactored after its row was recorded)."""
    order, reasons = rotate.rotation()
    seen_unchurned_round: dict[int, int] = {}
    for i, name in enumerate(order):
        r = reasons[name]
        if r.startswith("green-r") and "churned" not in r:
            rnd = int(r.split("green-r")[1][:2])
            seen_unchurned_round.setdefault(rnd, i)
    for i, name in enumerate(order):
        r = reasons[name]
        if "churned" in r:
            rnd = int(r.split("green-r")[1][:2])
            first_unchurned = seen_unchurned_round.get(rnd)
            if first_unchurned is not None:
                assert i < first_unchurned, (name, r)
