"""Pins for the driver-gate rotation schedule (VERDICT r6 #1).

The driver's CORRECTNESS gate samples the FIRST 50 registered queries,
so registration order decides which queries ever get a driver row.
rotation.py holds the per-round window; these tests keep it honest:
every scheduled name must exist, the round-7 window must consist
entirely of queries that never had a driver row in rounds 2-6, and
the schedule (window + round-8 remainder + already-sampled) must
cover the whole registry so nothing silently falls out of rotation.
"""

from __future__ import annotations

import json
import os

from file_scraper_spark import registry, rotation

registry._ensure_loaded()
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sampled_rounds_2_to_6() -> set[str]:
    seen: set[str] = set()
    for n in range(2, 7):
        path = os.path.join(REPO, f"CORRECTNESS_r{n:02d}.json")
        if os.path.exists(path):
            with open(path) as f:
                seen |= set(json.load(f))
    return seen


def test_rotation_names_exist_and_unique():
    names = set(registry.REGISTRY)
    for lst in (rotation.DRIVER_WINDOW_PRIORITY, rotation.ROUND8_REMAINDER):
        assert len(lst) == len(set(lst)), "duplicate in rotation list"
        missing = [n for n in lst if n not in names]
        assert not missing, f"rotation names not in registry: {missing}"
    overlap = set(rotation.DRIVER_WINDOW_PRIORITY) & set(
        rotation.ROUND8_REMAINDER
    )
    assert not overlap, f"name in both rotation lists: {overlap}"


def test_window_is_first_50_and_all_previously_unsampled():
    order = list(registry.REGISTRY)
    assert order[: len(rotation.DRIVER_WINDOW_PRIORITY)] == list(
        rotation.DRIVER_WINDOW_PRIORITY
    )
    assert len(rotation.DRIVER_WINDOW_PRIORITY) == 50
    seen = _sampled_rounds_2_to_6()
    if seen:  # artifact files present in a full checkout
        stale = [n for n in rotation.DRIVER_WINDOW_PRIORITY if n in seen]
        assert not stale, (
            f"window wastes slots on already-sampled queries: {stale}"
        )


def test_schedule_covers_entire_registry():
    seen = _sampled_rounds_2_to_6()
    scheduled = (
        set(rotation.DRIVER_WINDOW_PRIORITY)
        | set(rotation.ROUND8_REMAINDER)
        | seen
    )
    uncovered = set(registry.REGISTRY) - scheduled
    assert not uncovered, (
        "queries outside the rotation schedule would never get a "
        f"driver CORRECTNESS row: {sorted(uncovered)}"
    )
