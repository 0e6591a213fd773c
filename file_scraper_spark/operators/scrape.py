"""Scrape-merge semantics (reference core, SURVEY §2.A A8-A10).

Placeholder — filled in with merge_upsert / antijoin_deleted /
union_seen over the two-snapshot events fixture (FIXTURES.md §3).
"""
