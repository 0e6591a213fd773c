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


def test_window_prioritizes_unsampled_queries():
    """The self-advancing invariant: the registry's head must be every
    still-unsampled scheduled name in schedule order, and the driver's
    50-row window must never waste a slot on an already-sampled query
    while unsampled ones remain. Written against the artifacts on
    disk, so it keeps holding after each round's CORRECTNESS file
    lands (the window rotates, the invariant doesn't)."""
    seen = rotation.sampled_in_prior_rounds()
    order = list(registry.REGISTRY)
    expected_head = [
        n
        for n in (
            list(rotation.DRIVER_WINDOW_PRIORITY)
            + list(rotation.ROUND8_REMAINDER)
        )
        if n in registry.REGISTRY and n not in seen
    ]
    assert order[: len(expected_head)] == expected_head
    n_unsampled = sum(1 for n in order if n not in seen)
    window = order[:50]
    stale = [n for n in window if n in seen]
    if n_unsampled >= 50:
        assert not stale, (
            f"window wastes slots on already-sampled queries: {stale}"
        )
    assert len(rotation.DRIVER_WINDOW_PRIORITY) == 50


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
